"""The README quickstart must stay executable."""

import numpy as np
from numpy.testing import assert_allclose

import cotengra_tpu as ctg


def test_quickstart_einsum():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(4, 5))
    B = rng.normal(size=(5, 6))
    C = rng.normal(size=(6, 7))
    D = rng.normal(size=(7, 4))
    z = ctg.einsum("ab,bc,cd,da->", A, B, C, D)
    assert_allclose(
        np.asarray(z),
        np.einsum("ab,bc,cd,da->", A, B, C, D),
        rtol=1e-8,
    )


def test_quickstart_full_control():
    import jax

    inputs, output, shapes, size_dict = ctg.rand_equation(
        14, 3, d_min=2, d_max=2, seed=0
    )
    rng = np.random.default_rng(1)
    arrays = [rng.normal(size=s) for s in shapes]

    tree = ctg.array_contract_tree(
        inputs,
        output,
        size_dict=size_dict,
        optimize=ctg.HyperOptimizer(max_repeats=8, seed=0),
    )
    tree.slice_and_reconfigure_(max(tree.max_size() // 4, 4))
    result = tree.contract(arrays)

    from cotengra_tpu.parallel.mesh import contract_sharded

    sharded = contract_sharded(tree, arrays)
    assert_allclose(
        np.asarray(sharded), np.asarray(result), rtol=1e-8
    )
