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


def _chunked_tree(seed=11, min_chunks=8):
    inputs, output, shapes, size_dict = ctg.rand_equation(
        12, 3, n_out=3, seed=seed, d_min=2, d_max=3
    )
    rng = np.random.default_rng(seed)
    arrays = [rng.normal(size=s) for s in shapes]
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    tree.slice_(target_slices=min_chunks, allow_outer="only")
    tree.slice_(target_slices=2 * tree.multiplicity)
    return tree, arrays, ref_einsum(inputs, output, arrays)


def test_sharded_chunk_axis(mesh8):
    """>= 1 chunk per device: the chunk axis itself is sharded."""
    from cotengra_tpu.ops.executor import _chunk_structure

    tree, arrays, expected = _chunked_tree()
    n_inner, n_chunks, _ = _chunk_structure(tree)
    assert n_chunks >= 8  # auto-triggers the chunk-sharded regime
    got = contract_sharded(tree, arrays, mesh=mesh8)
    assert_allclose(np.asarray(got), expected, rtol=1e-8)


def test_sharded_chunk_axis_strip(mesh8):
    tree, arrays, expected = _chunked_tree(seed=13)
    m, e = contract_sharded(
        tree, arrays, mesh=mesh8, strip_exponent=True
    )
    assert_allclose(
        np.asarray(m) * 10.0 ** float(np.asarray(e)),
        expected,
        rtol=1e-8,
    )


def test_sharded_chunk_axis_unassembled_output_is_sharded(mesh8):
    """reassemble=False: the stacked chunk output stays distributed,
    carrying the mesh axis in its sharding."""
    from cotengra_tpu.ops.executor import _chunk_structure

    tree, arrays, expected = _chunked_tree(seed=17)
    n_inner, n_chunks, _ = _chunk_structure(tree)
    fn = make_sharded_contractor(
        tree, mesh8, reassemble=False, shard_chunks=True
    )
    stacked = fn(*arrays)
    # padded block distribution: >= n_chunks rows, zero beyond
    assert stacked.shape[0] >= n_chunks
    # the leading (chunk) axis must be sharded over the mesh axis
    spec = stacked.sharding.spec
    assert len(spec) >= 1 and spec[0] == "slices"
    # and the values must reassemble to the ground truth
    from cotengra_tpu.ops.executor import _reassemble
    from cotengra_tpu.ops.lowering import extract_contractions

    ir = extract_contractions(tree)
    got = _reassemble(
        tree, np.asarray(stacked)[:n_chunks], ir.output_legs
    )
    assert_allclose(np.asarray(got), expected, rtol=1e-8)


def test_gen_output_chunks_strip_exponent():
    """gen_output_chunks composes the inner sum with exponent stripping
    (VERDICT Weak #5)."""
    from cotengra_tpu.ops.executor import (
        _chunk_structure,
        gen_output_chunks,
    )

    tree, arrays, expected = _chunked_tree(seed=19)
    n_inner, n_chunks, _ = _chunk_structure(tree)
    assert n_inner > 1 and n_chunks > 1
    seen = 0
    for key, (m, e) in gen_output_chunks(
        tree, arrays, strip_exponent=True
    ):
        ref_key, ref_chunk = next(
            (k, c)
            for k, c in [
                x
                for x in gen_output_chunks(
                    tree, arrays
                )
            ]
            if k == key
        )
        assert_allclose(
            np.asarray(m) * 10.0 ** float(np.asarray(e)),
            np.asarray(ref_chunk),
            rtol=1e-8,
        )
        seen += 1
    assert seen == n_chunks


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
