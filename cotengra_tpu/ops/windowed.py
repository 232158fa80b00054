"""Windowed-matmul gate execution: small-tensor absorptions as MXU
dot_generals over contiguous storage windows - zero relayouts, no
custom kernels.

The dominant step type in circuit-like tensor networks is "absorb a
small gate y into a huge tensor x". Round 2 executed chains of these
with an in-place pallas kernel (``pallas_gates.py``): bandwidth-optimal
(one HBM round trip per chain) but VPU-bound - measured ~5x slower than
this chip's achievable matmul pass rate - and each distinct chain paid
seconds-to-minutes of client-side Mosaic lowering.

Measured on the v5e (scratch/micro_xla*.py): a plain XLA
``dot_general`` contracting a contiguous *window* of the flat storage
against a small dense operator runs at 580-660 GB/s effective (vs the
163 GB/s pallas-DMA ceiling and 296-390 GB/s elementwise), with the
identity-inflation flops absorbed by the MXU. So instead of preserving
layout and paying VPU arithmetic, we:

- keep every tensor flat and *plane-major* ``(2, axes...)`` (split
  complex);
- pick a contiguous span ``[i, j)`` of the stored axis order covering a
  cluster of gate axes (the *window*, size ``S = prod(sizes[i:j])``,
  capped) - untouched axes inside the span are carried by identity
  factors in the operator;
- build the dense window operator ``W (S_in, S_out)`` on device from
  the gate tensors (one-hot matmuls + a rest-digit mask, all 2-D),
  complex-embedded with the plane axis into the block form
  ``W2 (2*S_out, 2*S_in)``;
- apply with ONE plain 2-D matmul ``W2 @ (2S, M)``. A prefix window
  (span starting at axis 0, plane-major) needs no data movement at
  all; other forms (suffix / interior / multi-span) first rotate the
  window dims forward with a single fused transpose+reshape, kept
  pad-free by ordering the rest segments largest-last and 128-splitting
  trailing dims (see ``exec_window``). The result is always
  plane-major with the window's output axes at the FRONT of the stored
  order - tracked host-side. Measured ~3.3 ms (prefix) and ~7 ms
  (transpose + dot) per 1.07 GB pass. The earlier multi-contracting-dim
  ``dot_general`` formulation was abandoned: it compiles pathologically
  slowly on this backend (minutes per op at S >= 2048).

Because consecutive gate layers in circuits revisit the same axes, the
window-to-front rotation makes later clusters prefix windows (the fast
form) - a self-optimizing layout.

No reference analog: cotengra delegates pairwise execution to array
backends (``/root/reference/cotengra/contract.py:718-837``); this module
exists because of TPU tiled-layout economics (relayouts pad up to 64x,
while MXU flops are nearly free next to HBM traffic).
"""

import os

import jax
import jax.numpy as jnp

from ..utils.misc import prod

# window caps: identity-inflation flops scale with S (2*S flops per
# stored scalar); ~1024-2048 balances MXU time against the HBM pass.
# All env-overridable (CTG_WIN_*): the caps trade W2 operator bytes
# (HBM + host-build + tunnel-push, measured 945 MB total at the 4096
# caps on the m=10 bench) against window-step count and realignments.
S_MAX = int(os.environ.get("CTG_WIN_S_MAX", "1024"))
# absolute cap (window-size product): the dense operator is
# 4*S_in*S_out*4 bytes, built on device per pass (268 MB at 4096 -
# only chosen when nothing smaller is feasible; the cost model
# charges for operator size)
S_HARD = int(os.environ.get("CTG_WIN_S_HARD", "4096"))
# cap on the OUTPUT window product: gates can grow the window (ny
# bigger than c), and the dense operator scales S_in * S_out - an
# uncapped expansion cluster materializes a multi-GB operator (8
# doubling gates at S_in=4096 gave a 17 GB W2 before this cap)
S_OUT_MAX = int(os.environ.get("CTG_WIN_S_OUT_MAX", "4096"))
# when splitting scattered gate axes into multiple windows: merge two
# neighboring windows when the gap between them is at most this big
GAP_MERGE = 8
# merge neighbors unconditionally when the joined span stays this small
JOIN_SMALL = 256
# max disjoint windows contracted by one dot_general
MAX_WINDOWS = 4
# gates this large go through the ordinary pairwise path
MAX_GATE_SIZE = 2048
# only bother for big tensors
MIN_TENSOR_SIZE = 2 ** 16
# max gates accumulated into one open chain before forced close
MAX_CHAIN_GATES = 16
# max gates composed into one cluster operator
MAX_CLUSTER_GATES = 8


class WindowRec:
    """One planned windowed-matmul step (a cluster of gates)."""

    __slots__ = (
        "x_id", "out_id",
        "gates",          # tuple of (y_id, y_plan, k_dims, n_dims)
        "recipe",         # static compose/expand program (see below)
        "form",           # "prefix" | "suffix" | "interior" | "multi"
        "A1", "S_in", "A2", "S_out",
        "xdims",          # non-prefix: full reshape dims (A0, S1, A1, ...)
        "sdims",          # non-prefix: window dim indices, in span order
        "rdims",          # non-prefix: rest dim indices in RESULT order
                          # (ascending by size: the largest segment lands
                          # minor in both the transpose copy and the
                          # result storage order - tile-friendly)
        "out_order",      # stored order of the result (no plane)
        "out_shape",      # logical shape of the result
        "w2_id",          # temp id of a HOISTED prebuilt W2 (or None)
    )


def _substitute(win_axes, win_dims, c_legs, ny_legs, sizes):
    """Replace ``c_legs`` in the window by ``ny_legs`` (all ny at the
    first contracted position). Returns new (axes, dims)."""
    cset = set(c_legs)
    first = min(i for i, a in enumerate(win_axes) if a in cset)
    axes, dims = [], []
    for i, (a, d) in enumerate(zip(win_axes, win_dims)):
        if i == first:
            axes.extend(ny_legs)
            dims.extend(sizes[n] for n in ny_legs)
        if a in cset:
            continue
        axes.append(a)
        dims.append(d)
    return axes, dims


_LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"


class _LetterOverflow(Exception):
    pass


def _build_recipe(win_axes0, win_dims0, cluster, sizes):
    """Static program for composing the cluster's gates in their joint
    small space and expanding to the window.

    Returns ``(recipe, win_axes_out, win_dims_out)`` or ``(None, why,
    None)``. ``recipe`` is a dict consumed by :func:`build_w4`:

    - ``apply``: list of per-gate ``(j_sub, y_sub, out_sub, k_dims,
      n_dims)`` einsum fragments composing the joint operator ``J``
      (axes = original-in axes then current-out axes);
    - ``expand``: ``(operand_subs, out_sub, eye_dims, j_in_rank,
      j_out_rank)`` final expansion to the full window;
    - ``S_in``, ``S_out``.
    """
    # joint operator state: in axes (original) / cur axes (evolving)
    j_in = []      # axis names
    j_cur = []
    letter_of = {}
    counter = [0]

    def fresh():
        if counter[0] >= len(_LETTERS):
            raise _LetterOverflow()
        ch = _LETTERS[counter[0]]
        counter[0] += 1
        return ch

    apply_prog = []
    for (y_id, y_plan, c_legs, ny_legs, k_dims, n_dims) in cluster:
        j_sub = "".join(
            letter_of[a] for a in j_in
        ) + "".join(letter_of[a] for a in j_cur)
        y_letters = []
        new_in = []
        contracted = []
        for a in c_legs:
            if a in j_cur:
                y_letters.append(letter_of[a])
                contracted.append(a)
            else:
                # brand-new original axis: same letter becomes a new
                # J input axis
                ch = fresh()
                letter_of[a] = ch
                y_letters.append(ch)
                new_in.append(a)
        n_letters = []
        for a in ny_legs:
            ch = fresh()
            letter_of[a] = ch
            n_letters.append(ch)
        y_sub = "".join(y_letters) + "".join(n_letters)
        j_in = j_in + new_in
        j_cur = [a for a in j_cur if a not in set(contracted)] + list(
            ny_legs
        )
        out_sub = "".join(letter_of[a] for a in j_in) + "".join(
            letter_of[a] for a in j_cur
        )
        if len(set(out_sub)) != len(out_sub):
            return None, "duplicate joint axis", None
        apply_prog.append((j_sub, y_sub, out_sub, k_dims, n_dims))

    # window substitution to get the output axis order
    win_axes, win_dims = list(win_axes0), list(win_dims0)
    for (y_id, y_plan, c_legs, ny_legs, k_dims, n_dims) in cluster:
        win_axes, win_dims = _substitute(
            win_axes, win_dims, c_legs, ny_legs, sizes
        )

    # expansion to the full window is done at runtime with one-hot
    # matmuls + a rest-digit equality mask (see build_w4) - all 2-D,
    # large-minor-dim ops. (A naive rank-2w expansion einsum materializes
    # a tiny-minor-dim tensor that the TPU pads up to 64x - measured as
    # 70% of slice time.) Precompute the static index arrays here.
    rest_axes = [a for a in win_axes0 if a not in set(j_in)]
    if any(a not in win_axes for a in rest_axes):
        return None, "untouched axis vanished", None
    idx_in, rest_in = _index_arrays(
        list(win_axes0), list(win_dims0), j_in, rest_axes, sizes
    )
    idx_out, rest_out = _index_arrays(
        list(win_axes), list(win_dims), j_cur, rest_axes, sizes
    )
    kj = prod(sizes[a] for a in j_in) if j_in else 1
    nj = prod(sizes[a] for a in j_cur) if j_cur else 1
    recipe = {
        "apply": apply_prog,
        "expand": {
            "idx_in": idx_in,
            "rest_in": rest_in,
            "idx_out": idx_out,
            "rest_out": rest_out,
            "kj": kj,
            "nj": nj,
        },
        "S_in": prod(win_dims0) if win_dims0 else 1,
        "S_out": prod(win_dims) if win_dims else 1,
    }
    return recipe, win_axes, win_dims


def _index_arrays(axes, dims, j_axes, rest_axes, sizes):
    """For each flat index over ``(axes, dims)`` (row-major): the flat
    joint-operator index (mixed radix over ``j_axes`` in that order)
    and the flat rest key (mixed radix over ``rest_axes``)."""
    import numpy as np

    S = prod(dims) if dims else 1
    strides = {}
    s = 1
    for a, d in zip(reversed(axes), reversed(dims)):
        strides[a] = s
        s *= d
    i = np.arange(S, dtype=np.int64)
    jv = np.zeros(S, np.int64)
    for a in j_axes:
        d = sizes[a]
        jv = jv * d + (i // strides[a]) % d
    rv = np.zeros(S, np.int64)
    for a in rest_axes:
        d = sizes[a]
        rv = rv * d + (i // strides[a]) % d
    return jv.astype(np.int32), rv.astype(np.int32)


def build_w4(recipe, ys, dtype):
    """Build the complex-embedded window operator on device.

    ``ys``: per-gate ``(2, K, N)`` plane arrays (K enumerates c_legs,
    N enumerates ny_legs). Returns ``W4 (2, S_out, 2, S_in)`` real.
    """
    # compose in f32 (or f64 when the planes are f64): the operator is
    # tiny, so full precision here is free even under bf16 planes
    cdt = jnp.float64 if jnp.dtype(dtype) == jnp.float64 else \
        jnp.float32
    jr = ji = None
    for (j_sub, y_sub, out_sub, k_dims, n_dims), y in zip(
        recipe["apply"], ys
    ):
        y4r = y[0].reshape(tuple(k_dims) + tuple(n_dims)).astype(cdt)
        y4i = y[1].reshape(tuple(k_dims) + tuple(n_dims)).astype(cdt)
        if jr is None:
            # first gate: J = y (j_sub is empty)
            jr, ji = y4r, y4i
            continue
        eq = f"{j_sub},{y_sub}->{out_sub}"
        nr = jnp.einsum(eq, jr, y4r) - jnp.einsum(eq, ji, y4i)
        ni = jnp.einsum(eq, jr, y4i) + jnp.einsum(eq, ji, y4r)
        jr, ji = nr, ni
    ex = recipe["expand"]
    S_in, S_out = recipe["S_in"], recipe["S_out"]
    rest_in = jnp.asarray(ex["rest_in"])
    rest_out = jnp.asarray(ex["rest_out"])
    # rest-digit equality mask: W[i, o] is nonzero only where the
    # untouched window axes agree
    mask = (rest_in[:, None] == rest_out[None, :]).astype(cdt)
    if jr is None:
        # pure-rotation operator (no gates): the mask IS the (permuted)
        # identity over the window
        wr = mask
        wi = None
    else:
        kj, nj = ex["kj"], ex["nj"]
        jr2 = jr.reshape(kj, nj)
        ji2 = ji.reshape(kj, nj)
        idx_in = jnp.asarray(ex["idx_in"])
        idx_out = jnp.asarray(ex["idx_out"])
        # expand J to the window with one-hot matmuls (2-D, big minor
        # dims, MXU) instead of a high-rank einsum whose tiny-dim
        # output would be tile-padded up to 64x
        oh_in = (
            jnp.arange(kj, dtype=jnp.int32)[None, :]
            == idx_in[:, None]
        ).astype(cdt)  # (S_in, kj)
        oh_out = (
            jnp.arange(nj, dtype=jnp.int32)[None, :]
            == idx_out[:, None]
        ).astype(cdt)  # (S_out, nj)
        wr = (oh_in @ (jr2 @ oh_out.T)) * mask
        wi = (oh_in @ (ji2 @ oh_out.T)) * mask
    # block-embedded 2-D operator W2 (2*S_out, 2*S_in):
    # [[Wr^T, -Wi^T], [Wi^T, Wr^T]] - kept 2-D throughout (the 4-D
    # multi-contracting-dim dot_general form compiles pathologically
    # slowly on the TPU backend: 300+ s per op at S >= 2048)
    if wi is None:
        z = jnp.zeros_like(wr)
        top = jnp.concatenate([wr.T, z], axis=1)
        bot = jnp.concatenate([z, wr.T], axis=1)
    else:
        top = jnp.concatenate([wr.T, -wi.T], axis=1)
        bot = jnp.concatenate([wi.T, wr.T], axis=1)
    w2 = jnp.concatenate([top, bot], axis=0)
    return w2.astype(dtype)


def exec_window(rec, temps, shapes, precision, plane_dtype):
    """Execute one WindowRec over the plane-major flat temps.

    Every form lowers to ONE plain 2-D matmul
    ``(2S', 2S) @ (2S, M)`` - non-prefix forms first rotate the window
    dims forward with a single fused transpose+reshape (pad-free: the
    trailing dim M = numel/S stays large).

    When the planner hoisted this step's operator (``rec.w2_id`` set
    and present in ``temps``), the prebuilt ``W2`` flat array is used
    directly: the per-slice program then contains only the transpose +
    matmul, with the operator construction compiled (and usually run)
    ONCE in a separate tiny program - see
    ``grouped._plan_operator_hoist``.
    """
    w2_id = getattr(rec, "w2_id", None)
    if w2_id is not None and w2_id in temps:
        w2 = temps[w2_id].reshape(2 * rec.S_out, 2 * rec.S_in)
        if w2.dtype != jnp.dtype(plane_dtype):
            w2 = w2.astype(plane_dtype)
    else:
        ys = []
        from .grouped import _apply_block_plan_split

        for (y_id, y_plan, K, N) in rec.gates:
            yf = _apply_block_plan_split(temps[y_id], y_plan)
            ys.append(yf.reshape(2, K, N))
        w2 = build_w4(rec.recipe, ys, plane_dtype)
    # accumulate in f32 even under bf16 planes (the caller casts the
    # stored result back down)
    pet = (
        jnp.float32
        if jnp.dtype(plane_dtype).itemsize < 4
        else jnp.dtype(plane_dtype)
    )
    xf = temps[rec.x_id]
    S_in, S_out = rec.S_in, rec.S_out
    numel2 = xf.size
    M = numel2 // (2 * S_in)
    if rec.form == "prefix":
        x2 = xf.reshape(2 * S_in, M)
    else:
        # suffix / interior / multi: rotate the window dims forward
        # with one fused transpose+reshape. XLA materializes BOTH the
        # source (often folded into the producer's output layout) and
        # the transposed copy at their logical shapes, so each must end
        # in tile-friendly dims: split any large trailing dim D into
        # (D//128, 128) so the (8,128) tiles pad nothing (a small minor
        # dim pads up to 32x - an 8 GB HBM blowup measured on m=10).
        xdims, sdims, rdims = rec.xdims, rec.sdims, rec.rdims
        factors = [[d] for d in xdims]

        def split_ok(d):
            return d >= 1024 and d % 128 == 0

        # last STORAGE dim governs the source copy's minor dims
        if split_ok(xdims[-1]):
            factors[-1] = [xdims[-1] // 128, 128]
        # last PERMUTED dim governs the transposed copy's minor dims
        lp = rdims[-1] if rdims else sdims[-1]
        if lp != len(xdims) - 1 and split_ok(xdims[lp]):
            factors[lp] = [xdims[lp] // 128, 128]
        pos, k = [], 1
        for fs in factors:
            pos.append(tuple(range(k, k + len(fs))))
            k += len(fs)
        perm = (
            (0,)
            + tuple(p for i in sdims for p in pos[i])
            + tuple(p for i in rdims for p in pos[i])
        )
        xv = xf.reshape((2,) + tuple(f for fs in factors for f in fs))
        x2 = jax.lax.reshape(xv, (2 * S_in, M), dimensions=perm)
    out = jax.lax.dot_general(
        w2, x2,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=pet,
    )
    return out.reshape(-1)


def _choose_windows(pos_set, cur_order, sizes):
    """Partition the gate-axis positions into <= MAX_WINDOWS disjoint
    contiguous spans, extended/merged under the size caps.

    Returns ``(spans, total_S)`` with ``spans`` a list of ``(lo, hi)``
    in ascending order, or ``(None, reason)``.
    """
    n_ax = len(cur_order)

    def span_prod(lo, hi):
        return prod(sizes[a] for a in cur_order[lo:hi])

    pos = sorted(pos_set)
    # initial spans: one per position, then merge near neighbors -
    # only while the TOTAL window product stays within the cap
    spans = [[p, p + 1] for p in pos]

    def total_of(sp):
        return prod(span_prod(lo, hi) for lo, hi in sp)

    total = total_of(spans)
    merged = True
    while merged:
        merged = False
        for i in range(len(spans) - 1):
            gap = span_prod(spans[i][1], spans[i + 1][0])
            joined = span_prod(spans[i][0], spans[i + 1][1])
            new_total = (
                total
                // span_prod(*spans[i])
                // span_prod(*spans[i + 1])
                * joined
            )
            if new_total <= S_HARD and (
                joined <= JOIN_SMALL
                or (gap <= GAP_MERGE and joined <= S_MAX)
            ):
                spans[i][1] = spans[i + 1][1]
                del spans[i + 1]
                total = new_total
                merged = True
                break
    # enforce the window-count cap by merging the smallest joins
    while len(spans) > MAX_WINDOWS:
        best, bi = None, None
        for i in range(len(spans) - 1):
            joined = span_prod(spans[i][0], spans[i + 1][1])
            if best is None or joined < best:
                best, bi = joined, i
        total = (
            total
            // span_prod(*spans[bi])
            // span_prod(*spans[bi + 1])
            * best
        )
        spans[bi][1] = spans[bi + 1][1]
        del spans[bi + 1]
    if total > S_HARD:
        return None, "window product too large"
    # minor-dim safety is handled downstream: _fill_rec_dims orders the
    # rest segments largest-last and exec_window 128-splits trailing dims
    return [tuple(s) for s in spans], total


def _select_form(spans, cur_order, sizes):
    """Pick the cheapest feasible execution form for a window span set.

    Every form executes as ONE 2-D matmul ``(2S',2S)@(2S,M)``;
    non-prefix forms add one fused transpose pass (~3.5 ms/GB measured)
    to rotate the window dims forward. The quadratic term charges for
    building + reading the dense operator (4*S^2 floats).

    Returns ``(form, spans_f, cost)`` or None.
    """
    n_ax = len(cur_order)

    def win_prod(lo, hi):
        return prod(sizes[a] for a in cur_order[lo:hi])

    def op_cost(s):
        return 0.5 * s / 1024 + 0.7 * (s / 1024) ** 2

    span_lo, span_hi = spans[0][0], spans[-1][1]
    candidates = []
    # prefix: [0, span_hi) - no transpose pass
    s_pre = win_prod(0, span_hi)
    if s_pre <= S_HARD:
        candidates.append(
            ("prefix", [(0, span_hi)], 3.2 + op_cost(s_pre))
        )
    # windowed (transpose + dot): the chosen spans as-is
    s_tot = prod(win_prod(lo, hi) for lo, hi in spans)
    if s_tot <= S_HARD:
        if len(spans) > 1:
            form = "multi"
        elif span_hi == n_ax:
            form = "suffix"
        elif span_lo == 0:
            form = "prefix"
        else:
            form = "interior"
        if form != "prefix":
            candidates.append(
                (form, [tuple(s) for s in spans],
                 6.8 + op_cost(s_tot))
            )
    if not candidates:
        return None
    return min(candidates, key=lambda c: c[2])


def _fill_rec_dims(rec, form, spans_f, cur_order, sizes):
    """Fill the execution-shape fields of ``rec`` for its form.

    Returns the non-window ("rest") axes in the RESULT storage order.
    For the prefix form that is simply their current order (no data
    movement). For every other form the rest segments are reordered
    ascending by size, so the LARGEST segment becomes the minor dims
    of both the materialized transpose and the stored result: on TPU a
    small minor dim tile-pads up to 64x (a measured 32x / 8 GB blowup
    on the m=10 bench), while trailing large dims pad nothing.
    """
    n_ax = len(cur_order)

    def win_prod(lo, hi):
        return prod(sizes[a] for a in cur_order[lo:hi])

    rec.xdims = rec.sdims = rec.rdims = None
    rec.A1 = rec.A2 = None
    if form == "prefix":
        rec.A1 = 1
        rec.A2 = win_prod(spans_f[0][1], n_ax)
        return list(cur_order[spans_f[0][1]:])
    # alternating dims (A0, S1, A1, S2, ..., [Alast]) with size-1
    # A segments dropped; sdims = window dim indices
    xdims = []
    sidx = []
    segs = {}  # rest xdims index -> axes of that segment
    loose = []  # size-1 axes dropped from xdims (position-free)
    prev = 0
    for lo, hi in spans_f:
        a = win_prod(prev, lo)
        if a != 1 or not xdims:
            segs[len(xdims)] = cur_order[prev:lo]
            xdims.append(a)
        else:
            loose.extend(cur_order[prev:lo])
        sidx.append(len(xdims))
        xdims.append(win_prod(lo, hi))
        prev = hi
    a = win_prod(prev, n_ax)
    if a != 1:
        segs[len(xdims)] = cur_order[prev:n_ax]
        xdims.append(a)
    else:
        loose.extend(cur_order[prev:n_ax])
    rec.xdims = tuple(xdims)
    rec.sdims = tuple(sidx)
    sset = set(sidx)
    rdims = sorted(
        (i for i in range(len(xdims)) if i not in sset),
        key=lambda i: xdims[i],
    )
    rec.rdims = tuple(rdims)
    rest = [a for i in rdims for a in segs.get(i, ())]
    rest.extend(loose)
    return rest


def plan_rotation(order, sizes, axes, out_id):
    """Plan a pure-identity windowed dot moving (the deepest subset of)
    ``axes`` to the front of the stored order - a pad-free, MXU-speed
    realign used when a gate's axes are too scattered to window
    directly. Returns ``(rec, None)`` or ``(None, why)``.
    """
    order = list(order)
    pos_all = sorted({order.index(a) for a in axes if a in order})
    if not pos_all:
        return None, "no axes to rotate"
    for k in range(len(pos_all)):
        subset = set(pos_all[k:])
        spans, _why = _choose_windows(subset, order, sizes)
        if spans is None:
            continue
        if spans[0][0] == 0 and len(spans) == 1:
            return None, "axes already front"
        sel = _select_form(spans, order, sizes)
        if sel is None:
            continue
        form, spans_f, _cost = sel
        win_axes0 = tuple(
            a for lo, hi in spans_f for a in order[lo:hi]
        )
        win_dims0 = tuple(sizes[a] for a in win_axes0)
        S = prod(win_dims0)
        # identity operator: _build_recipe with no gates gives a pure
        # rest-mask (permuted identity) in build_w4
        recipe, _wao, _wdo = _build_recipe(
            win_axes0, win_dims0, [], sizes
        )
        if recipe is None:
            continue
        rec = WindowRec()
        rec.x_id = None
        rec.out_id = out_id
        rec.w2_id = None
        rec.gates = ()
        rec.recipe = recipe
        rec.form = form
        rec.S_in = rec.S_out = S
        rest = _fill_rec_dims(rec, form, spans_f, order, sizes)
        out_order = list(win_axes0) + rest
        rec.out_order = tuple(out_order)
        rec.out_shape = tuple(sizes[a] for a in out_order)
        return rec, None
    return None, "no feasible rotation"


def plan_window_chain(order0, sizes, gates, s_max=S_MAX):
    """Plan a chain of gate absorptions as windowed-matmul clusters.

    Parameters
    ----------
    order0 : tuple
        Stored axis order of the big tensor at chain start (no plane).
    sizes : dict
    gates : list of (y_id, y_plan, c_legs, ny_legs, step_out)
        In application order; ``y_plan`` realigns the gate to
        ``(2, K, N)`` with K enumerating ``c_legs``, N ``ny_legs``.

    Returns
    -------
    (list[WindowRec], None) or (None, reason)
    """
    cur_order = list(order0)
    pending = list(gates)
    recs = []

    while pending:
        # -- grow a cluster from pending[0] -----------------------------
        cluster = []
        taken = 0
        involved = set()
        pos_set = set()
        spans = None
        span_total = 1
        # running output-window product: span_total grown by each
        # gate's ny/c dim ratio (exact: substitution is in-window)
        out_num, out_den = 1, 1
        for (y_id, y_plan, c_legs, ny_legs, step_out) in pending:
            if taken >= MAX_CLUSTER_GATES:
                break
            # axes created by earlier gates in THIS cluster substitute
            # in place; only real current axes contribute positions
            pos = [
                cur_order.index(a) for a in c_legs if a in cur_order
            ]
            missing = [
                a for a in c_legs
                if a not in cur_order and a not in involved
            ]
            if missing:
                return None, f"gate axis missing from order: {missing}"
            cand = pos_set | set(pos)
            if not cand:
                # gate acts purely on axes created inside the cluster
                new_spans, new_total = spans, span_total
            else:
                new_spans, new_total = _choose_windows(
                    cand, cur_order, sizes
                )
                if new_spans is None:
                    if taken:
                        break
                    return None, new_total
            k_dims = tuple(sizes[a] for a in c_legs)
            n_dims = tuple(sizes[a] for a in ny_legs)
            nn = out_num * (prod(n_dims) or 1)
            nd = out_den * (prod(k_dims) or 1)
            # prospective S_out = new_total * nn / nd (exact division)
            if new_total * nn > S_OUT_MAX * nd:
                # output window would blow past the operator cap
                if taken:
                    break
                return None, "gate expands window beyond S_OUT_MAX"
            spans, span_total = new_spans, new_total
            out_num, out_den = nn, nd
            pos_set = cand
            involved |= set(c_legs) | set(ny_legs)
            cluster.append(
                (y_id, y_plan, tuple(c_legs), tuple(ny_legs),
                 k_dims, n_dims)
            )
            taken += 1
        cluster_steps = pending[:taken]
        pending = pending[taken:]
        if spans is None:
            return None, "cluster without window positions"

        sel = _select_form(spans, cur_order, sizes)
        if sel is None:
            return None, "no feasible window form"
        form, spans_f, _cost = sel

        n_ax = len(cur_order)

        def win_prod(lo, hi):
            return prod(sizes[a] for a in cur_order[lo:hi])

        # -- build the operator recipe over the concatenated spans ------
        win_axes0 = tuple(
            a for lo, hi in spans_f for a in cur_order[lo:hi]
        )
        win_dims0 = tuple(sizes[a] for a in win_axes0)
        try:
            recipe, win_axes_out, win_dims_out = _build_recipe(
                win_axes0, win_dims0, cluster, sizes
            )
        except _LetterOverflow:
            return None, "einsum letters exhausted"
        if recipe is None:
            return None, win_axes_out
        S_in = prod(win_dims0) if win_dims0 else 1
        S_out = recipe["S_out"]
        if S_out > S_OUT_MAX:
            # must match the growth-loop estimate; defensive only
            return None, "recipe output window exceeds S_OUT_MAX"

        rec = WindowRec()
        rec.w2_id = None
        # chain: cluster k consumes cluster k-1's output; the caller
        # fills in the first cluster's x (the chain's base tensor)
        rec.x_id = recs[-1].out_id if recs else None
        rec.gates = tuple(
            (y_id, y_plan, prod(k_dims) or 1, prod(n_dims) or 1)
            for (y_id, y_plan, c, nyl, k_dims, n_dims) in cluster
        )
        rec.recipe = recipe
        rec.form = form
        rec.S_in, rec.S_out = S_in, S_out
        rest = _fill_rec_dims(rec, form, spans_f, cur_order, sizes)

        # result order: window-out axes first, then the rest segments
        # (reordered largest-last by _fill_rec_dims - tile-friendly)
        out_order = list(win_axes_out) + rest
        rec.out_id = cluster_steps[-1][4]
        rec.out_order = tuple(out_order)
        rec.out_shape = tuple(sizes[a] for a in out_order)
        recs.append(rec)
        cur_order = out_order

    return recs, None
