"""Executor extras: output-chunk streaming, tree.benchmark, config
defaults plumbed into contract."""

import numpy as np
from numpy.testing import assert_allclose

import cotengra_tpu as ctg
from cotengra_tpu.ops.executor import gen_output_chunks


def test_gen_output_chunks_reassembles():
    inputs, output, shapes, size_dict = ctg.rand_equation(
        8, 3, n_out=2, seed=3
    )
    rng = np.random.default_rng(0)
    arrays = [rng.normal(size=s) for s in shapes]
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    tree.slice_(target_slices=4, allow_outer="only")
    expected = np.einsum(
        ctg.utils.inds_to_eq(inputs, output), *arrays, optimize=True
    )
    seen = 0
    for key, chunk in gen_output_chunks(tree, arrays):
        seen += 1
        idx = [slice(None)] * expected.ndim
        for ix, v in key.items():
            idx[list(tree.output).index(ix)] = v
        assert_allclose(
            np.asarray(chunk).ravel(),
            expected[tuple(idx)].ravel(),
            rtol=1e-8,
        )
    assert seen == tree.nchunks


def test_tree_benchmark():
    inputs, output, shapes, size_dict = ctg.rand_equation(8, 3, seed=1)
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    stats = tree.benchmark(repeats=1)
    assert stats["time"] > 0
    assert stats["gflops_per_sec"] > 0


def test_contraction_is_differentiable():
    """The whole (sliced) contraction is jax-differentiable - a
    first-class capability of the jax-native execution path."""
    import jax
    import jax.numpy as jnp

    inputs, output, shapes, size_dict = ctg.rand_equation(
        7, 3, seed=4
    )
    rng = np.random.default_rng(0)
    arrays = [jnp.asarray(rng.normal(size=s)) for s in shapes]
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    tree.slice_(target_slices=2)

    def loss(a0):
        return tree.contract([a0, *arrays[1:]]) ** 2

    g = jax.grad(loss)(arrays[0])
    assert g.shape == arrays[0].shape
    # finite-difference check on one element
    eps = 1e-6
    bumped = arrays[0].at[(0,) * arrays[0].ndim].add(eps)
    fd = (loss(bumped) - loss(arrays[0])) / eps
    assert np.isclose(float(g[(0,) * g.ndim]), float(fd), rtol=1e-3)


def test_config_defaults_used():
    inputs, output, shapes, size_dict = ctg.rand_equation(6, 3, seed=2)
    rng = np.random.default_rng(0)
    arrays = [rng.normal(size=s) for s in shapes]
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    expected = np.einsum(
        ctg.utils.inds_to_eq(inputs, output), *arrays, optimize=True
    )
    with ctg.default_options(slice_batch=2):
        got = tree.contract(arrays)
    assert_allclose(np.asarray(got), expected, rtol=1e-8)
