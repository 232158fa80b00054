"""Split-complex (stacked real/imag plane) execution parity.

The split path must be bit-comparable (same real arithmetic, different
op order) to the complex executor on every lowering mode: mac / matvec /
mm / bmm, fallback small steps, single-term steps, and fused gate
chains. Reference behavioral contract: the complex results themselves
(reference cotengra executes complex64 directly; TPU has no native
complex arithmetic so we decompose - see ops/grouped.py).
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import cotengra_tpu as ctg
from cotengra_tpu.ops.grouped import (
    build_grouped_core_fn,
    make_grouped_staged_contractor,
    plan_grouped,
)
from cotengra_tpu.ops.lowering import (
    extract_contractions,
    sliced_input_legs,
)


def _rand_complex_arrays(shapes, seed=0, dtype=np.complex128):
    rng = np.random.default_rng(seed)
    return [
        (rng.normal(size=s) + 1j * rng.normal(size=s)).astype(dtype)
        for s in shapes
    ]


def _tree_for(inputs, output, size_dict, seed=0):
    ssa, _ = ctg.optimize_random_greedy_track_flops(
        inputs, output, size_dict, ntrials=16, seed=seed, use_ssa=True
    )
    return ctg.ContractionTree.from_path(
        inputs, output, size_dict, ssa_path=ssa
    )


def _build_pair(tree, **kwargs):
    ir = extract_contractions(tree)
    input_orders = [sliced_input_legs(tree, i) for i in range(tree.N)]
    return build_grouped_core_fn(
        ir,
        size_dict=tree.size_dict,
        input_orders=input_orders,
        **kwargs,
    )


def _circuit_case(n_qubits=26, depth=14, seed=2):
    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.preprocess import absorb_simple_tensors

    inputs, output, shapes, size_dict, arrays = rand_circuit_tn(
        n_qubits=n_qubits, depth=depth, seed=seed
    )
    inputs, arrays = absorb_simple_tensors(inputs, arrays, output)
    size_dict = {
        ix: int(d)
        for t, a in zip(inputs, arrays)
        for ix, d in zip(t, a.shape)
    }
    tree = _tree_for(inputs, output, size_dict)
    return tree, [np.asarray(a) for a in arrays]


@pytest.mark.parametrize("strip", [False, True])
@pytest.mark.parametrize("fuse", [False, True])
def test_split_circuit_parity(strip, fuse):
    """Circuit TN exercises mac/matvec/mm, fallbacks and (with fuse)
    fused gate chains."""
    tree, arrays = _circuit_case()
    ref_fn = _build_pair(
        tree, split_complex=False, strip_exponent=strip, fuse_gates=fuse
    )
    got_fn = _build_pair(
        tree, split_complex=True, strip_exponent=strip, fuse_gates=fuse
    )
    if strip:
        rm, re = ref_fn(*arrays)
        gm, ge = got_fn(*arrays)
        ref = complex(np.asarray(rm)) * 10.0 ** float(np.asarray(re))
        got = complex(np.asarray(gm)) * 10.0 ** float(np.asarray(ge))
        assert np.isclose(got, ref, rtol=2e-6)
    else:
        assert_allclose(
            np.asarray(got_fn(*arrays)),
            np.asarray(ref_fn(*arrays)),
            rtol=2e-6,
        )


def test_split_mode_coverage_circuit():
    """The circuit plan actually contains the modes we claim to test."""
    tree, arrays = _circuit_case()
    ir = extract_contractions(tree)
    input_orders = [sliced_input_legs(tree, i) for i in range(tree.N)]
    plans, *_ = plan_grouped(ir, tree.size_dict, input_orders)
    modes = {
        info.mode for kind, info in plans if kind == "pair"
    }
    kinds = {kind for kind, _ in plans}
    assert "mac" in modes or "matvec" in modes
    assert "fallback" in kinds


@pytest.mark.parametrize("dims", [(8, 16), (2, 3)])
def test_split_dense_random_eq(dims):
    """Random dense eqs with larger bond dims: mm and bmm modes."""
    lo, hi = dims
    inputs, output, shapes, size_dict = ctg.rand_equation(
        8, 3, seed=7, d_min=lo, d_max=hi
    )
    arrays = _rand_complex_arrays(shapes, seed=1)
    tree = _tree_for(inputs, output, size_dict)
    ref_fn = _build_pair(tree, split_complex=False)
    got_fn = _build_pair(tree, split_complex=True)
    assert_allclose(
        np.asarray(got_fn(*arrays)),
        np.asarray(ref_fn(*arrays)),
        rtol=1e-8,
    )


def test_split_bmm_mode():
    """Batch (hyper-kept) index forces bmm mode; check plane mixing."""
    # shared index 'b' kept in output -> batch
    inputs = [("b", "i", "k"), ("b", "k", "j")]
    output = ("b", "i", "j")
    size_dict = {"b": 4, "i": 64, "k": 64, "j": 64}
    shapes = [
        tuple(size_dict[ix] for ix in t) for t in inputs
    ]
    arrays = _rand_complex_arrays(shapes, seed=2)
    tree = ctg.ContractionTree.from_path(
        inputs, output, size_dict, path=[(0, 1)]
    )
    ir = extract_contractions(tree)
    input_orders = [sliced_input_legs(tree, i) for i in range(tree.N)]
    plans, *_ = plan_grouped(ir, tree.size_dict, input_orders)
    assert any(
        kind == "pair" and info.mode == "bmm" for kind, info in plans
    )
    ref_fn = _build_pair(tree, split_complex=False)
    got_fn = _build_pair(tree, split_complex=True)
    assert_allclose(
        np.asarray(got_fn(*arrays)),
        np.asarray(ref_fn(*arrays)),
        rtol=1e-8,
    )


def test_split_single_steps():
    """Traces/sums/diagonals (single-term preprocessing) on planes."""
    inputs = [("a", "a", "i", "s"), ("i", "j")]
    output = ("j",)
    size_dict = {"a": 3, "i": 64, "s": 2, "j": 64}
    shapes = [tuple(size_dict[ix] for ix in t) for t in inputs]
    arrays = _rand_complex_arrays(shapes, seed=3)
    tree = ctg.ContractionTree.from_path(
        inputs, output, size_dict, path=[(0, 1)]
    )
    eq = "aais,ij->j"
    expect = np.einsum(eq, *arrays)
    got_fn = _build_pair(tree, split_complex=True)
    assert_allclose(np.asarray(got_fn(*arrays)), expect, rtol=1e-8)


@pytest.mark.parametrize("strip", [False, True])
def test_split_staged_parity(strip):
    tree, arrays = _circuit_case(n_qubits=16, depth=8, seed=5)
    ref = tree.contract(arrays)
    fn = make_grouped_staged_contractor(
        tree, stage_size=7, strip_exponent=strip, split_complex=True
    )
    if strip:
        m, e = fn(*arrays)
        got = complex(np.asarray(m)) * 10.0 ** float(np.asarray(e))
    else:
        got = complex(np.asarray(fn(*arrays)))
    assert np.isclose(got, complex(np.asarray(ref)), rtol=2e-6)


def test_split_real_inputs_promoted():
    """split_complex=True on real inputs: zero imag plane, right answer."""
    inputs, output, shapes, size_dict = ctg.rand_equation(6, 3, seed=11)
    rng = np.random.default_rng(0)
    arrays = [rng.normal(size=s) for s in shapes]
    tree = _tree_for(inputs, output, size_dict)
    ref_fn = _build_pair(tree, split_complex=False)
    got_fn = _build_pair(tree, split_complex=True)
    got = np.asarray(got_fn(*arrays))
    assert np.iscomplexobj(got)
    assert_allclose(got.real, np.asarray(ref_fn(*arrays)), rtol=1e-8)
    assert_allclose(got.imag, 0, atol=1e-12)


def test_split_auto_detection():
    """split_complex=None routes complex inputs to the split path."""
    tree, arrays = _circuit_case(n_qubits=12, depth=6, seed=9)
    auto_fn = _build_pair(tree, split_complex=None)
    ref_fn = _build_pair(tree, split_complex=False)
    assert_allclose(
        np.asarray(auto_fn(*arrays)),
        np.asarray(ref_fn(*arrays)),
        rtol=2e-6,
    )


def test_split_bf16_planes_rough():
    """bf16 plane storage: lossy but in the right ballpark."""
    import jax.numpy as jnp

    tree, arrays = _circuit_case(n_qubits=12, depth=6, seed=13)
    arrays64 = [a.astype(np.complex64) for a in arrays]
    ref = complex(np.asarray(tree.contract(arrays)))
    fn = _build_pair(
        tree, split_complex=True, plane_dtype=jnp.bfloat16,
        strip_exponent=True,
    )
    m, e = fn(*arrays64)
    got = complex(np.asarray(m.astype(jnp.complex64))) * 10.0 ** float(
        np.asarray(e)
    )
    assert abs(got - ref) / abs(ref) < 0.2
