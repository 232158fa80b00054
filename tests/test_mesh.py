"""Sharded (multi-device) sliced contraction on a virtual 8-device CPU
mesh: must agree with numpy ground truth.
"""

import jax
import numpy as np
import pytest
from numpy.testing import assert_allclose

import cotengra_tpu as ctg
from cotengra_tpu.parallel.mesh import (
    contract_sharded,
    get_default_mesh,
    make_sharded_contractor,
)
from cotengra_tpu.utils.symbols import inds_to_eq


def ref_einsum(inputs, output, arrays):
    eq = inds_to_eq(inputs, output)
    return np.einsum(eq, *[np.asarray(a) for a in arrays], optimize=True)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest should force 8 cpu devices"
    return get_default_mesh(8)


@pytest.mark.parametrize("seed", range(3))
def test_sharded_inner_sliced(mesh8, seed):
    inputs, output, shapes, size_dict = ctg.rand_equation(
        10, 3, seed=seed, d_min=2, d_max=3
    )
    rng = np.random.default_rng(seed)
    arrays = [rng.normal(size=s) for s in shapes]
    expected = ref_einsum(inputs, output, arrays)

    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    tree.slice_(target_slices=8)
    assert tree.multiplicity >= 8
    got = contract_sharded(tree, arrays, mesh=mesh8)
    assert_allclose(np.asarray(got), expected, rtol=1e-8)


def test_sharded_with_output_chunks(mesh8):
    inputs, output, shapes, size_dict = ctg.rand_equation(
        10, 3, n_out=2, seed=42, d_min=2, d_max=3
    )
    rng = np.random.default_rng(0)
    arrays = [rng.normal(size=s) for s in shapes]
    expected = ref_einsum(inputs, output, arrays)

    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    # slice both output and inner indices
    tree.slice_(target_slices=4, allow_outer="only")
    tree.slice_(target_slices=4 * tree.multiplicity)
    got = contract_sharded(tree, arrays, mesh=mesh8)
    assert_allclose(np.asarray(got), expected, rtol=1e-8)


def test_sharded_strip_exponent(mesh8):
    inputs, output, shapes, size_dict = ctg.rand_equation(
        9, 3, seed=5, d_min=2, d_max=3
    )
    rng = np.random.default_rng(1)
    arrays = [10.0 * rng.normal(size=s) for s in shapes]
    expected = ref_einsum(inputs, output, arrays)

    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    tree.slice_(target_slices=8)
    m, e = contract_sharded(
        tree, arrays, mesh=mesh8, strip_exponent=True
    )
    assert_allclose(
        np.asarray(m) * 10.0 ** np.asarray(e), expected, rtol=1e-8
    )


def test_sharded_nslices_not_multiple_of_devices(mesh8):
    # 3 slices of size 3 -> 27 inner slices over 8 devices
    inputs, output, shapes, size_dict = ctg.rand_equation(
        10, 3, seed=8, d_min=3, d_max=3
    )
    rng = np.random.default_rng(2)
    arrays = [rng.normal(size=s) for s in shapes]
    expected = ref_einsum(inputs, output, arrays)

    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    tree.slice_(target_slices=27)
    got = contract_sharded(tree, arrays, mesh=mesh8)
    assert_allclose(np.asarray(got), expected, rtol=1e-8)
