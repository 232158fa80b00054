"""Grouped-flat executor: block plans, lowering modes, and the public
sliced-contract path on high-rank networks."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import cotengra_tpu as ctg
from cotengra_tpu.ops.grouped import (
    _block_plan,
    make_grouped_staged_contractor,
)


def test_block_plan_identity():
    sizes = {"a": 2, "b": 3, "c": 4}
    assert _block_plan(("a", "b", "c"), ("a", "b", "c"), sizes) is None


@pytest.mark.parametrize("seed", range(6))
def test_block_plan_random_perms(seed):
    import random

    rng = random.Random(seed)
    labels = [f"i{k}" for k in range(8)]
    sizes = {ix: rng.choice([2, 3, 4]) for ix in labels}
    cur = list(labels)
    rng.shuffle(cur)
    tgt = list(labels)
    rng.shuffle(tgt)
    plan = _block_plan(cur, tgt, sizes)

    x = np.arange(int(np.prod([sizes[ix] for ix in cur])))
    # ground truth: full-rank transpose
    xf = x.reshape([sizes[ix] for ix in cur])
    perm = [cur.index(ix) for ix in tgt]
    expect = np.transpose(xf, perm).ravel()

    if plan is None:
        got = x
    else:
        block_dims, bperm = plan
        got = np.transpose(x.reshape(block_dims), bperm).ravel()
    assert (got == expect).all()


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("dtype", ["float32", "float64", "complex64"])
def test_small_transpose_matmul_exact(seed, dtype):
    """Tiny block transposes run as one-hot matmuls (the sub-tile
    relayout path on TPU is pathologically slow); the matmul form must
    be element-exact for every plane dtype."""
    import random

    import jax.numpy as jnp

    from cotengra_tpu.ops.grouped import (
        SMALL_T_MATMUL_MAX,
        _apply_block_plan,
        _apply_block_plan_split,
    )

    rng = random.Random(seed)
    nd = rng.randint(2, 5)
    block_dims = tuple(rng.choice([2, 3, 4]) for _ in range(nd))
    perm = list(range(nd))
    rng.shuffle(perm)
    perm = tuple(perm)
    n = int(np.prod(block_dims))
    assert n <= SMALL_T_MATMUL_MAX

    r = np.random.default_rng(seed)
    if dtype == "complex64":
        x = (r.normal(size=n) + 1j * r.normal(size=n)).astype(dtype)
        got = np.asarray(
            _apply_block_plan(jnp.asarray(x), (block_dims, perm))
        )
        expect = x.reshape(block_dims).transpose(perm).ravel()
        np.testing.assert_array_equal(got, expect)
    else:
        x = r.normal(size=2 * n).astype(dtype)
        got = np.asarray(
            _apply_block_plan_split(jnp.asarray(x), (block_dims, perm))
        )
        expect = (
            x.reshape((2,) + block_dims)
            .transpose((0,) + tuple(p + 1 for p in perm))
            .ravel()
        )
        np.testing.assert_array_equal(got, expect)


def _circuit_tree(n_qubits=26, depth=14, seed=2):
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
    ssa, _ = ctg.optimize_random_greedy_track_flops(
        inputs, output, size_dict, ntrials=32, seed=0, use_ssa=True
    )
    tree = ctg.ContractionTree.from_path(
        inputs, output, size_dict, ssa_path=ssa
    )
    return tree, [np.asarray(a) for a in arrays]


def test_grouped_matches_direct_on_high_rank():
    tree, arrays = _circuit_tree()
    from cotengra_tpu.ops.executor import _ir_max_rank

    assert _ir_max_rank(tree.extract_contractions()) > 12
    ref = tree.contract(arrays, implementation="pallas")  # direct path
    got = tree.contract(arrays)  # auto -> grouped
    assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5
    )


def test_grouped_full_contract_sliced():
    """Public sliced tree.contract (fori_loop inside jit) through the
    grouped core."""
    tree, arrays = _circuit_tree()
    ref = tree.contract(arrays)
    tree.slice_(target_slices=4)
    got = tree.contract(arrays)  # full contractor, grouped core inside
    assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


def test_grouped_staged_sliced_strip():
    tree, arrays = _circuit_tree()
    ref = tree.contract(arrays)
    fn = make_grouped_staged_contractor(
        tree, stage_size=10, strip_exponent=True
    )
    m, e = fn(*arrays)
    got = complex(np.asarray(m)) * 10.0 ** float(np.asarray(e))
    assert np.isclose(got, complex(np.asarray(ref)), rtol=1e-5)

@pytest.mark.parametrize("mode", ["scan", "vmap"])
@pytest.mark.parametrize("strip", [False, True])
def test_grouped_staged_slice_batched(mode, strip):
    """slice_batch: all slices in one batched call == per-slice calls."""
    import jax.numpy as jnp

    from cotengra_tpu.ops.executor import slice_arrays

    tree, arrays = _circuit_tree()
    tree.slice_(target_slices=8)
    nsl = tree.multiplicity
    assert nsl >= 8
    core = make_grouped_staged_contractor(
        tree, stage_size=5, strip_exponent=strip
    )
    bcore = make_grouped_staged_contractor(
        tree, stage_size=5, strip_exponent=strip,
        slice_batch=nsl, slice_batch_mode=mode,
    )
    jarrays = [jnp.asarray(a) for a in arrays]
    ids = jnp.arange(nsl, dtype=jnp.int32)
    res = bcore(jarrays, ids)
    if strip:
        res, exps = res
    for i in range(nsl):
        r = core(*slice_arrays(tree, jarrays, i))
        if strip:
            m, e = r
            ref = np.asarray(m) * 10.0 ** float(np.asarray(e))
            got = np.asarray(res[i]) * 10.0 ** float(np.asarray(exps[i]))
        else:
            ref = np.asarray(r)
            got = np.asarray(res[i])
        assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_grouped_staged_inplace_gates():
    """inplace_gates: pallas in-place fused gate chains (interpret mode
    on CPU) match the plain grouped path, with chains actually formed."""
    from cotengra_tpu.ops.grouped import plan_grouped
    from cotengra_tpu.ops.lowering import (
        extract_contractions,
        sliced_input_legs,
    )

    rng = np.random.default_rng(0)
    n = 18
    state = [f"a{k}" for k in range(n)]
    inputs = [tuple(state)]
    arrays = [
        rng.normal(size=(2,) * n) + 1j * rng.normal(size=(2,) * n)
    ]
    cur = list(state)
    nxt = 0
    # 2-qubit gates at leading (grid), middle (row) and trailing
    # (lane) positions, plus a mixed-span pair
    for i, j in [(0, 1), (5, 6), (16, 17), (2, 12), (8, 9), (13, 17)]:
        bi, bj = f"b{nxt}", f"b{nxt + 1}"
        nxt += 2
        inputs.append((bi, bj, cur[i], cur[j]))
        arrays.append(
            rng.normal(size=(2, 2, 2, 2))
            + 1j * rng.normal(size=(2, 2, 2, 2))
        )
        cur[i], cur[j] = bi, bj
    size_dict = {ix: 2 for t in inputs for ix in t}
    tree = ctg.ContractionTree.from_path(
        inputs, tuple(cur), size_dict, path=[(0, 1)] * (len(inputs) - 1)
    )

    ir = extract_contractions(tree)
    orders = [sliced_input_legs(tree, i) for i in range(tree.N)]
    plans, *_ = plan_grouped(
        ir, tree.size_dict, orders, inplace_gates=True
    )
    assert sum(k == "inplace" for k, _ in plans) >= 2

    ref = tree.contract(arrays)
    core = make_grouped_staged_contractor(
        tree, stage_size=50, split_complex=True, inplace_gates=True
    )
    got = core(*arrays)
    assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-8)


@pytest.mark.parametrize("batched", [False, True])
def test_grouped_staged_plane_io(batched):
    """plane_io: complex-free I/O matches the complex path."""
    import jax.numpy as jnp

    from cotengra_tpu.ops.executor import slice_arrays
    from cotengra_tpu.ops.grouped import to_plane_array

    tree, arrays = _circuit_tree()
    tree.slice_(target_slices=4)
    nsl = tree.multiplicity
    core = make_grouped_staged_contractor(
        tree, stage_size=6, split_complex=True
    )
    jarrays = [jnp.asarray(a) for a in arrays]
    planes = [jnp.asarray(to_plane_array(a)) for a in arrays]
    if batched:
        bcore = make_grouped_staged_contractor(
            tree, stage_size=6, split_complex=True, plane_io=True,
            slice_batch=nsl,
        )
        res = bcore(planes, jnp.arange(nsl, dtype=jnp.int32))
        for i in range(nsl):
            ref = np.asarray(core(*slice_arrays(tree, jarrays, i)))
            got = np.asarray(res[i][0]) + 1j * np.asarray(res[i][1])
            assert_allclose(got, ref, rtol=1e-4, atol=1e-6)
    else:
        # unbatched plane_io: slice the plane arrays host-side (axes +1)
        pcore = make_grouped_staged_contractor(
            tree, stage_size=6, split_complex=True, plane_io=True
        )
        key = tree.slice_key(1)
        sl = []
        for p, term in zip(planes, tree.inputs):
            for ax in reversed(range(len(term))):
                if term[ax] in tree.sliced_inds:
                    p = jnp.take(p, key[term[ax]], axis=ax + 1)
            sl.append(p)
        ref = np.asarray(core(*slice_arrays(tree, jarrays, 1)))
        out = pcore(*sl)
        got = np.asarray(out[0]) + 1j * np.asarray(out[1])
        assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_ids_to_digits_beyond_int64():
    """Digit decoding is exact for flat id spaces beyond int64
    (m=20 slices 2^39+ ways)."""
    import jax.numpy as jnp

    from cotengra_tpu.ops.grouped import _digit_columns, _ids_to_digits

    # synthetic meta: 5 indices of size 4, strides spanning 2^80
    meta = {
        f"i{k}": (4 ** (20 * k), 4, None) for k in range(5)
    }
    ids = [0, 1, 4 ** 20, 3 * 4 ** 80 + 2 * 4 ** 20 + 1]
    digs = _ids_to_digits(jnp.asarray([0]), meta)  # traced-safe shape
    assert digs.shape[1] == len(_digit_columns(meta))
    import numpy as np

    digs = np.asarray(_ids_to_digits(np.asarray(ids, object), meta))
    assert list(digs[0]) == [0, 0, 0, 0, 0]
    assert list(digs[1]) == [1, 0, 0, 0, 0]
    assert list(digs[2]) == [0, 1, 0, 0, 0]
    assert list(digs[3]) == [1, 2, 0, 0, 3]


def test_scattered_pair_dot_exact(monkeypatch):
    """The no-realign scattered pair dot (CTG_SCATTER_DOT) must equal
    the realign+2-D-dot path bit-for-bit at HIGHEST precision paths on
    CPU, across a full circuit contraction (threshold forced to 0 so
    every eligible pair takes the scattered path)."""
    from cotengra_tpu.ops import grouped

    tree, arrays = _circuit_tree()
    ref = tree.contract(arrays)

    monkeypatch.setattr(grouped, "_SCATTER_DOT", True)
    monkeypatch.setattr(grouped, "_SCATTER_MIN", 0)
    fn = make_grouped_staged_contractor(
        tree, stage_size=10, split_complex=True
    )
    got = fn(*arrays)
    assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-6, atol=1e-12
    )

    # and the explicitly disabled path still matches
    monkeypatch.setattr(grouped, "_SCATTER_DOT", False)
    fn2 = make_grouped_staged_contractor(
        tree, stage_size=10, split_complex=True
    )
    got2 = fn2(*arrays)
    assert_allclose(
        np.asarray(got2), np.asarray(ref), rtol=5e-6, atol=1e-12
    )


def test_scattered_pair_dot_exact_complex(monkeypatch):
    """The complex-dtype (split_complex=False) executor's scattered-dot
    branch must also match the realigned path across a full circuit."""
    from cotengra_tpu.ops import grouped

    tree, arrays = _circuit_tree()
    ref = tree.contract(arrays)

    monkeypatch.setattr(grouped, "_SCATTER_DOT", True)
    monkeypatch.setattr(grouped, "_SCATTER_MIN", 0)
    fn = make_grouped_staged_contractor(
        tree, stage_size=10, split_complex=False
    )
    got = fn(*arrays)
    assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-6, atol=1e-12
    )


def test_scatter_layout():
    """_scatter_layout merges adjacent same-class runs of the stored
    order, returns K positions + stored-order leg lists, and rejects
    padding-hazardous trailing dims."""
    from cotengra_tpu.ops.grouped import _scatter_layout

    sizes = {"a": 4, "b": 2, "c": 8, "d": 64, "e": 32}
    # stored (a b c d e), contract {b, d}: runs a |b| c |d| e
    out = _scatter_layout(("a", "b", "c", "d", "e"), {"b", "d"}, sizes)
    assert out is not None
    dims, kpos, m_stored, c_stored = out
    assert dims == (4, 2, 8, 64, 32)
    assert kpos == (1, 3)
    assert m_stored == ("a", "c", "e")
    assert c_stored == ("b", "d")

    # adjacent same-class runs merge
    out = _scatter_layout(("a", "b", "d", "c", "e"), {"b", "d"}, sizes)
    dims, kpos, m_stored, c_stored = out
    assert dims == (4, 2 * 64, 8 * 32)
    assert kpos == (1,)
    assert c_stored == ("b", "d")

    # tiny trailing stored dim -> ineligible (chip-measured padding)
    sizes2 = dict(sizes, e=2)
    assert (
        _scatter_layout(("a", "b", "c", "d", "e"), {"b", "d"}, sizes2)
        is None
    )
    # tiny trailing M-class dim (padded dot OUTPUT) -> ineligible even
    # though the trailing STORED dim is a big K block
    assert (
        _scatter_layout(("b", "a", "d"), {"b", "d"}, sizes) is None
    )
    # all-K or all-M -> ineligible
    assert _scatter_layout(("b", "d"), {"b", "d"}, sizes) is None
    assert _scatter_layout(("a", "c"), set(), sizes) is None


def test_layout_lookahead_exact(monkeypatch):
    """CTG_LAYOUT_LOOKAHEAD reclusters produced free-leg orders by
    consumer role; results must be exactly the same contraction. The
    chip-calibrated simulator (round 5) models ~2x less realign
    traffic with it on - this pins its correctness on CPU."""
    import cotengra_tpu.ops.grouped as G

    tree, arrays = _circuit_tree(n_qubits=20, depth=10, seed=5)
    ref = tree.contract(arrays)
    monkeypatch.setattr(G, "_LAYOUT_LOOKAHEAD", True)
    got = tree.contract(arrays)
    assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)
    # split-complex staged path (the bench configuration)
    from cotengra_tpu.ops.grouped import make_grouped_staged_contractor

    fn = make_grouped_staged_contractor(
        tree, stage_size=8, split_complex=True
    )
    got2 = fn(*arrays)
    assert_allclose(
        np.asarray(got2).reshape(np.asarray(ref).shape),
        np.asarray(ref),
        rtol=1e-5,
    )


@pytest.mark.parametrize("strip", [False, True])
def test_precompile_matches_lazy(strip):
    """fn.precompile AOT-compiles every stage concurrently; results and
    shapes must match the lazy-compile path exactly (it only warms the
    jit/persistent caches)."""
    import jax.numpy as jnp

    tree, arrays = _circuit_tree()
    ref = tree.contract(arrays)

    # unsliced staged contractor
    fn = make_grouped_staged_contractor(
        tree, stage_size=7, strip_exponent=strip,
        split_complex=True, plane_io=True,
    )
    from cotengra_tpu.ops.grouped import to_plane_array

    planes = [jnp.asarray(to_plane_array(a)) for a in arrays]
    njobs = fn.precompile(*planes)
    assert njobs and njobs >= 1
    res = fn(*planes)
    if strip:
        res, e = res
        amp = complex(*np.asarray(res)) * 10.0 ** float(np.asarray(e))
    else:
        amp = complex(*np.asarray(res))
    assert np.isclose(amp, complex(np.asarray(ref)), rtol=1e-4)

    # slice-batched contractor
    tree.slice_(target_slices=4)
    nsl = tree.multiplicity
    bcore = make_grouped_staged_contractor(
        tree, stage_size=7, strip_exponent=strip,
        split_complex=True, plane_io=True,
        slice_batch=nsl,
    )
    ids = jnp.arange(nsl, dtype=jnp.int32)
    njobs = bcore.precompile(planes, np.arange(nsl, dtype=np.int64))
    assert njobs and njobs >= 1
    res = bcore(planes, ids)
    if strip:
        res, exps = res
        tot = sum(
            complex(*np.asarray(res[i]))
            * 10.0 ** float(np.asarray(exps[i]))
            for i in range(nsl)
        )
    else:
        tot = sum(complex(*np.asarray(res[i])) for i in range(nsl))
    assert np.isclose(tot, complex(np.asarray(ref)), rtol=1e-4)
