"""Windowed-matmul gate execution (ops/windowed.py): correctness vs
dense numpy contraction, through the staged contractor.

Mirrors the reference's trusted-ground-truth strategy
(``/root/reference/tests/test_compute.py``): every path is checked by
``assert_allclose`` against a direct numpy einsum.
"""

import numpy as np
import pytest

import cotengra_tpu as ctg
from cotengra_tpu.ops.grouped import (
    make_grouped_staged_contractor,
    plan_grouped,
    to_plane_array,
)
from cotengra_tpu.ops.lowering import (
    extract_contractions,
    sliced_input_legs,
)


def make_gate_chain_instance(n_ax=17, n_gates=10, seed=0):
    """A big rank-``n_ax`` tensor with a sequence of small-gate
    absorptions (1- and 2-axis gates at assorted depths), contracted by
    a linear path. Returns (inputs, output, size_dict, arrays)."""
    rng = np.random.default_rng(seed)
    axes = [f"x{i}" for i in range(n_ax)]
    sizes = {a: 2 for a in axes}
    inputs = [tuple(axes)]
    arrays = [
        (rng.standard_normal(tuple(sizes[a] for a in axes))
         + 1j * rng.standard_normal(tuple(sizes[a] for a in axes))
         ).astype(np.complex64)
    ]
    live = list(axes)
    nxt = 0
    for g in range(n_gates):
        nq = 1 + (g % 2)
        pos = rng.choice(len(live), size=nq, replace=False)
        c_legs = tuple(live[p] for p in sorted(pos))
        ny_legs = []
        for _ in range(nq):
            nm = f"n{nxt}"
            nxt += 1
            sizes[nm] = 2
            ny_legs.append(nm)
        K = 2 ** nq
        y = (
            rng.standard_normal((K, K))
            + 1j * rng.standard_normal((K, K))
        ).astype(np.complex64) / np.sqrt(K)
        inputs.append(c_legs + tuple(ny_legs))
        arrays.append(
            y.reshape(tuple(2 for _ in range(2 * nq)))
        )
        for cl, nl in zip(c_legs, ny_legs):
            live[live.index(cl)] = nl
    output = tuple(live)
    size_dict = {ix: 2 for term in inputs for ix in term}
    return inputs, output, size_dict, arrays


def reference_value(inputs, output, arrays):
    import string

    names = {}
    letters = iter(
        string.ascii_letters + "".join(chr(0x100 + i) for i in range(200))
    )
    for term in inputs:
        for ix in term:
            if ix not in names:
                names[ix] = next(letters)
    eq = ",".join("".join(names[ix] for ix in term) for term in inputs)
    eq += "->" + "".join(names[ix] for ix in output)
    return np.einsum(
        eq, *[a.astype(np.complex128) for a in arrays],
        optimize="greedy",
    )


def linear_tree(inputs, output, size_dict):
    ssa = [(0, 1)]
    n = len(inputs)
    for k in range(2, n):
        ssa.append((n + k - 2, k))
    return ctg.ContractionTree.from_path(
        inputs, output, size_dict, ssa_path=ssa
    )


@pytest.fixture(scope="module")
def instance():
    inputs, output, size_dict, arrays = make_gate_chain_instance()
    ref = reference_value(inputs, output, arrays)
    tree = linear_tree(inputs, output, size_dict)
    return inputs, output, size_dict, arrays, ref, tree


def test_plan_contains_windows(instance):
    inputs, output, size_dict, arrays, ref, tree = instance
    ir = extract_contractions(tree)
    orders = [sliced_input_legs(tree, i) for i in range(tree.N)]
    plans, *_ = plan_grouped(
        ir, tree.size_dict, orders, gate_mode="window"
    )
    kinds = [k for k, _ in plans]
    assert "window" in kinds
    # every gate absorption must be covered by a window step (none
    # falling back to realign+mm pairs)
    n_gates = sum(
        len(info.gates) for k, info in plans if k == "window"
    )
    assert n_gates == 10
    assert kinds.count("pair") == 0


@pytest.mark.parametrize("strip", [False, True])
def test_windowed_contract_matches_numpy(instance, strip):
    inputs, output, size_dict, arrays, ref, tree = instance
    fn = make_grouped_staged_contractor(
        tree, stage_size=6, split_complex=True, strip_exponent=strip,
        gate_mode="window",
    )
    if strip:
        out, exp = fn(*arrays)
        got = np.asarray(out).astype(np.complex128) * 10.0 ** float(
            np.asarray(exp)
        )
    else:
        got = np.asarray(fn(*arrays))
    np.testing.assert_allclose(got, ref, rtol=2e-4)


def test_windowed_matches_inplace_mode(instance):
    inputs, output, size_dict, arrays, ref, tree = instance
    f_win = make_grouped_staged_contractor(
        tree, stage_size=6, split_complex=True, gate_mode="window"
    )
    f_inp = make_grouped_staged_contractor(
        tree, stage_size=6, split_complex=True, inplace_gates=True,
        gate_mode="inplace",
    )
    a = np.asarray(f_win(*arrays))
    b = np.asarray(f_inp(*arrays))
    np.testing.assert_allclose(a, b, rtol=2e-4)
    np.testing.assert_allclose(a, ref, rtol=2e-4)


def test_windowed_plane_io(instance):
    inputs, output, size_dict, arrays, ref, tree = instance
    fn = make_grouped_staged_contractor(
        tree, stage_size=6, split_complex=True, plane_io=True,
        gate_mode="window",
    )
    planes = [to_plane_array(a) for a in arrays]
    out = np.asarray(fn(*planes))
    got = out[0].astype(np.complex128) + 1j * out[1]
    np.testing.assert_allclose(got, ref, rtol=2e-4)


@pytest.mark.parametrize("mode", ["vmap", "scan"])
def test_windowed_sliced_batched(instance, mode):
    inputs, output, size_dict, arrays, ref, tree = instance
    import jax.numpy as jnp

    st = tree.copy()
    # slice indices that are genuinely contracted (gate inputs), so
    # slices are summands rather than output chunks
    inner = [inputs[1][0], inputs[2][0]]
    assert all(ix not in output for ix in inner)
    st.remove_ind_(inner[0])
    st.remove_ind_(inner[1])
    assert st.multiplicity == 4
    fn = make_grouped_staged_contractor(
        st, stage_size=6, split_complex=True,
        slice_batch=4, slice_batch_mode=mode, gate_mode="window",
    )
    out = np.asarray(
        fn(arrays, jnp.arange(4, dtype=jnp.int32))
    ).sum(axis=0)
    np.testing.assert_allclose(out, ref, rtol=2e-4)


def test_window_chain_multi_cluster_exactness():
    """Deliberately spread gates so multiple clusters/forms appear,
    f64 planes: result must be exact to ~1e-12."""
    import jax.numpy as jnp

    inputs, output, size_dict, arrays = make_gate_chain_instance(
        n_ax=17, n_gates=12, seed=3
    )
    ref = reference_value(inputs, output, arrays)
    tree = linear_tree(inputs, output, size_dict)
    fn = make_grouped_staged_contractor(
        tree, stage_size=4, split_complex=True,
        plane_dtype=jnp.float64, gate_mode="window",
    )
    arrays128 = [a.astype(np.complex128) for a in arrays]
    got = np.asarray(fn(*arrays128))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_hoisted_operator_cache_cross_check(instance, monkeypatch):
    """The identity-keyed hoisted-operator cache must be semantically
    invisible: calling the same contractor twice with the SAME leaf
    objects (cache hit) must equal a cache-bypassed build, and changed
    leaf objects must not return stale operators."""
    inputs, output, size_dict, arrays, ref, tree = instance

    fn = make_grouped_staged_contractor(
        tree, stage_size=6, split_complex=True, gate_mode="window"
    )
    first = np.asarray(fn(*arrays))
    again = np.asarray(fn(*arrays))  # identical leaves: cache-hit path
    np.testing.assert_array_equal(first, again)

    # recompute from scratch with the cache disabled entirely
    monkeypatch.setenv("CTG_OP_CACHE", "0")
    fn_nc = make_grouped_staged_contractor(
        tree, stage_size=6, split_complex=True, gate_mode="window"
    )
    fresh = np.asarray(fn_nc(*arrays))
    np.testing.assert_allclose(first, fresh, rtol=1e-6)
    monkeypatch.delenv("CTG_OP_CACHE")

    # new leaf objects with different values must MISS the cache
    arrays2 = [np.asarray(a) * (1.5 if i == 1 else 1.0)
               for i, a in enumerate(arrays)]
    changed = np.asarray(fn(*arrays2))
    assert not np.allclose(changed, first)
    ref2 = reference_value(inputs, output, arrays2)
    np.testing.assert_allclose(changed, ref2, rtol=2e-4)
