"""Forest reconfigure, vmap slice batching, constants folding."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import cotengra_tpu as ctg
from cotengra_tpu.tree import ContractionTree
from cotengra_tpu.utils.symbols import inds_to_eq


def ref_einsum(inputs, output, arrays):
    eq = inds_to_eq(inputs, output)
    return np.einsum(eq, *[np.asarray(a) for a in arrays], optimize=True)


def test_subtree_reconfigure_forest():
    inputs, output, shapes, size_dict = ctg.rand_equation(30, 3, seed=3)
    path = ctg.optimize_random(inputs, output, size_dict, seed=3)
    tree = ContractionTree.from_path(inputs, output, size_dict, path=path)
    f0 = tree.total_flops()
    t2 = tree.subtree_reconfigure_forest(
        num_trees=4, num_restarts=3, seed=0
    )
    assert t2.total_flops() <= f0


def test_subtree_reconfigure_forest_parallel():
    inputs, output, shapes, size_dict = ctg.rand_equation(20, 3, seed=4)
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    t2 = tree.subtree_reconfigure_forest(
        num_trees=4, num_restarts=2, seed=0, parallel="threads:2"
    )
    assert t2.total_flops() <= tree.total_flops()


def test_slice_and_reconfigure_forest():
    inputs, output, shapes, size_dict = ctg.rand_equation(
        20, 3, d_min=2, d_max=2, seed=5
    )
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    target = max(tree.max_size() // 8, 2)
    t2 = tree.slice_and_reconfigure_forest(
        target, num_trees=4, seed=0
    )
    assert t2.max_size() <= target


@pytest.mark.parametrize("strip", [False, True])
@pytest.mark.parametrize("batch", [2, 4])
def test_slice_batch_vmap(strip, batch):
    inputs, output, shapes, size_dict = ctg.rand_equation(
        9, 3, n_out=1, seed=6
    )
    rng = np.random.default_rng(0)
    arrays = [rng.normal(size=s) for s in shapes]
    expected = ref_einsum(inputs, output, arrays)

    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    tree.slice_(target_slices=6)  # deliberately not a multiple of batch

    got = tree.contract(arrays, strip_exponent=strip, slice_batch=batch)
    if strip:
        m, e = got
        got = np.asarray(m) * 10.0 ** np.asarray(e)
    assert_allclose(np.asarray(got), expected, rtol=1e-8)


def test_constants_folding_array_contract():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 5))
    y = rng.normal(size=(5, 6))
    z = rng.normal(size=(6, 3))
    expr = ctg.array_contract_expression(
        inputs=[("a", "b"), ("b", "c"), ("c", "d")],
        output=("a", "d"),
        shapes=[(4, 5), (5, 6), (6, 3)],
        constants={1: y, 2: z},
        optimize="greedy",
    )
    got = expr(x)
    assert_allclose(np.asarray(got), x @ y @ z, rtol=1e-8)
    # again with new variable input (compiled fn reuse)
    x2 = rng.normal(size=(4, 5))
    assert_allclose(np.asarray(expr(x2)), x2 @ y @ z, rtol=1e-8)


@pytest.mark.parametrize("num_stages", [2, 4])
@pytest.mark.parametrize("strip", [False, True])
def test_staged_contractor(num_stages, strip):
    from cotengra_tpu.ops.executor import make_staged_contractor

    inputs, output, shapes, size_dict = ctg.rand_equation(
        12, 3, n_out=1, n_hyper_in=1, seed=9
    )
    rng = np.random.default_rng(0)
    arrays = [rng.normal(size=s) for s in shapes]
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    expected = ref_einsum(inputs, output, arrays)
    fn = make_staged_contractor(
        tree, num_stages=num_stages, strip_exponent=strip
    )
    got = fn(*arrays)
    if strip:
        m, e = got
        got = np.asarray(m) * 10.0 ** np.asarray(e)
    assert_allclose(np.asarray(got), expected, rtol=1e-8)


def test_constants_folding_einsum_expression():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 5))
    y = rng.normal(size=(5, 6))
    expr = ctg.einsum_expression(
        "ab,bc->ac", (4, 5), y, constants=[1], optimize="greedy"
    )
    got = expr(x)
    assert_allclose(np.asarray(got), x @ y, rtol=1e-8)
