"""Correctness vs numpy ground truth: tree contraction == direct einsum
over a matrix of random equations including hyper edges, repeated indices,
slicing and exponent stripping (mirrors reference ``tests/test_compute.py``).
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import cotengra_tpu as ctg
from cotengra_tpu.utils.symbols import inds_to_eq


def ref_einsum(inputs, output, arrays):
    eq = inds_to_eq(inputs, output)
    return np.einsum(eq, *[np.asarray(a) for a in arrays], optimize=True)


def make_arrays(shapes, seed, dtype="float64"):
    rng = np.random.default_rng(seed)
    return [rng.normal(size=s).astype(dtype) for s in shapes]


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize(
    "n,reg,n_out,n_hyper_in,n_hyper_out",
    [
        (5, 3, 0, 0, 0),
        (6, 3, 2, 0, 0),
        (6, 3, 0, 1, 0),
        (6, 3, 1, 1, 1),
        (8, 3, 2, 2, 1),
    ],
)
def test_contract_matches_numpy(seed, n, reg, n_out, n_hyper_in, n_hyper_out):
    inputs, output, shapes, size_dict = ctg.rand_equation(
        n, reg, n_out=n_out, n_hyper_in=n_hyper_in,
        n_hyper_out=n_hyper_out, seed=seed,
    )
    arrays = make_arrays(shapes, seed)
    expected = ref_einsum(inputs, output, arrays)

    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    got = tree.contract(arrays)
    assert_allclose(np.asarray(got), expected, rtol=1e-8)


@pytest.mark.parametrize("seed", range(10))
def test_perverse_equations(seed):
    inputs, output, shapes, size_dict = ctg.perverse_equation(
        8, n_inputs=5, seed=seed
    )
    arrays = make_arrays(shapes, seed)
    expected = ref_einsum(inputs, output, arrays)
    got = ctg.array_contract(
        arrays, inputs, output, optimize="greedy", cache_expression=False
    )
    assert_allclose(np.asarray(got), expected, rtol=1e-8)


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("n_out", [0, 2])
def test_sliced_contract_matches(seed, n_out):
    inputs, output, shapes, size_dict = ctg.rand_equation(
        8, 3, n_out=n_out, seed=seed
    )
    arrays = make_arrays(shapes, seed)
    expected = ref_einsum(inputs, output, arrays)

    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    # force some slicing, including possibly output indices
    tree.slice_(target_slices=4)
    assert tree.multiplicity >= 4
    got = tree.contract(arrays)
    assert_allclose(np.asarray(got), expected, rtol=1e-8)


@pytest.mark.parametrize("seed", range(3))
def test_sliced_by_hand_gather(seed):
    inputs, output, shapes, size_dict = ctg.rand_equation(
        8, 3, n_out=2, seed=seed + 50
    )
    arrays = make_arrays(shapes, seed)
    expected = ref_einsum(inputs, output, arrays)

    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    tree.slice_(target_slices=4)
    slices = [
        tree.contract_slice(arrays, i) for i in range(tree.multiplicity)
    ]
    got = tree.gather_slices(slices)
    assert_allclose(np.asarray(got), expected, rtol=1e-8)


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("sliced", [False, True])
def test_strip_exponent(seed, sliced):
    inputs, output, shapes, size_dict = ctg.rand_equation(
        7, 3, n_out=1, seed=seed
    )
    arrays = make_arrays(shapes, seed)
    # scale to stress the exponent
    arrays = [a * 10.0 for a in arrays]
    expected = ref_einsum(inputs, output, arrays)

    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    if sliced:
        tree.slice_(target_slices=4)
    m, e = tree.contract(arrays, strip_exponent=True)
    got = np.asarray(m) * 10.0 ** np.asarray(e)
    assert_allclose(got, expected, rtol=1e-8)


def test_zero_array_strip_exponent():
    inputs = [("a", "b"), ("b", "c")]
    output = ("a", "c")
    arrays = [np.zeros((3, 3)), np.ones((3, 3))]
    tree = ctg.array_contract_tree(
        inputs, output, shapes=[(3, 3), (3, 3)], optimize="greedy"
    )
    m, e = tree.contract(arrays, strip_exponent=True)
    assert_allclose(np.asarray(m) * 10.0 ** np.asarray(e), np.zeros((3, 3)))


def test_einsum_interface():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 5))
    y = rng.normal(size=(5, 6))
    z = rng.normal(size=(6, 4))
    got = ctg.einsum("ab,bc,ca->", x, y, z)
    assert_allclose(
        np.asarray(got), np.einsum("ab,bc,ca->", x, y, z), rtol=1e-8
    )


def test_einsum_implicit_output():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 5))
    y = rng.normal(size=(5, 6))
    got = ctg.einsum("ab,bc", x, y)
    assert_allclose(np.asarray(got), np.einsum("ab,bc", x, y), rtol=1e-8)


def test_einsum_ellipsis():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 4, 5))
    y = rng.normal(size=(5, 6))
    got = ctg.einsum("...ab,bc->...ac", x, y)
    assert_allclose(
        np.asarray(got), np.einsum("...ab,bc->...ac", x, y), rtol=1e-8
    )


def test_einsum_interleaved():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 5))
    y = rng.normal(size=(5, 6))
    got = ctg.einsum(x, ("a", "b"), y, ("b", "c"), ("a", "c"))
    assert_allclose(np.asarray(got), x @ y, rtol=1e-8)


def test_ncon():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 5))
    y = rng.normal(size=(5, 6))
    got = ctg.ncon([x, y], [(-1, 1), (1, -2)])
    assert_allclose(np.asarray(got), x @ y, rtol=1e-8)


def test_array_contract_general_labels():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(4, 5))
    y = rng.normal(size=(5, 4))
    got = ctg.array_contract(
        [x, y],
        inputs=[("virt_0", "phys"), ("phys", "virt_1")],
        output=("virt_0", "virt_1"),
    )
    assert_allclose(np.asarray(got), x @ y, rtol=1e-8)


def test_expression_reuse():
    rng = np.random.default_rng(5)
    expr = ctg.einsum_expression(
        "ab,bc->ac", (3, 4), (4, 5), optimize="greedy"
    )
    for _ in range(2):
        x = rng.normal(size=(3, 4))
        y = rng.normal(size=(4, 5))
        assert_allclose(np.asarray(expr(x, y)), x @ y, rtol=1e-8)


def test_scalar_only():
    x = np.array(3.0)
    y = np.array(4.0)
    got = ctg.einsum(",->", x, y)
    assert_allclose(np.asarray(got), 12.0)
