"""Pallas fused matmul+absmax kernel: interpret-mode correctness and the
executor's implementation='pallas' path.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import cotengra_tpu as ctg


def test_bmm_absmax_kernel():
    import jax.numpy as jnp

    from cotengra_tpu.ops.pallas_bmm import bmm_absmax

    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 70, 90)).astype("float32")
    y = rng.normal(size=(3, 90, 50)).astype("float32")
    out, amax = bmm_absmax(
        jnp.asarray(x), jnp.asarray(y), bm=32, bn=128, bk=128,
        interpret=True,
    )
    ref = np.einsum("bmk,bkn->bmn", x, y)
    assert_allclose(np.asarray(out), ref, atol=1e-4)
    assert np.isclose(float(amax), np.abs(ref).max(), rtol=1e-5)


def test_pairwise_bmm_layouts():
    import jax.numpy as jnp

    from cotengra_tpu.ops.pallas_bmm import pairwise_bmm_absmax

    rng = np.random.default_rng(1)
    a = rng.normal(size=(4, 5, 6)).astype("float32")
    b = rng.normal(size=(6, 4, 7)).astype("float32")
    got, am = pairwise_bmm_absmax(
        jnp.asarray(a), jnp.asarray(b),
        ("b", "i", "k"), ("k", "b", "j"), ("j", "b", "i"),
        interpret=True,
    )
    ref = np.einsum("bik,kbj->jbi", a, b)
    assert_allclose(np.asarray(got), ref, atol=1e-4)
    assert np.isclose(float(am), np.abs(ref).max(), rtol=1e-5)


def test_executor_pallas_implementation():
    inputs, output, shapes, size_dict = ctg.rand_equation(
        6, 4, d_min=8, d_max=8, seed=0
    )
    rng = np.random.default_rng(0)
    arrays = [rng.normal(size=s).astype("float32") for s in shapes]
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    exp = np.einsum(
        ctg.utils.inds_to_eq(inputs, output),
        *[a.astype("float64") for a in arrays],
        optimize=True,
    )
    m, e = tree.contract(
        arrays, strip_exponent=True, implementation="pallas"
    )
    got = np.asarray(m) * 10.0 ** np.asarray(e)
    assert_allclose(got, exp, rtol=1e-3)
