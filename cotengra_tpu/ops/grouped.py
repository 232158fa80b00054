"""Grouped-layout execution: bound every XLA op to LOW RANK.

The TPU compiler's cost explodes with tensor rank (a trivial elementwise
op on a rank-18 tensor takes seconds to compile; rank-23+ contraction
steps take minutes or OOM the compile helper). Bond-2 tensor networks
produce intermediates with 20-30 size-2 axes, so the naive per-step
lowering is catastrophically slow to compile *regardless* of how each
step is expressed.

This executor therefore never materializes a high-rank tensor in any XLA
op:

- every intermediate is stored FLAT (1-D), with its logical axis order
  tracked host-side;
- each pairwise step reshapes its inputs directly into the 3-D
  ``(batch, M, K) x (batch, K, N)`` matmul form. The permutation from an
  input's stored order to the required grouped order is executed as a
  *block transpose*: maximal runs of axes that stay together are fused
  into single dimensions first, so the physical transpose acts on a
  handful of blocks, not the full rank;
- group orders are canonicalized to the LARGER input's stored order, so
  the big tensor in a step is usually already laid out correctly (zero
  or near-zero blocks) and the small tensor (e.g. a rank-4 gate) absorbs
  the cheap transpose;
- optimization barriers isolate the matmul from the reshape/transpose
  chain (the fusion itself is another compile-time trap).

This is the fused-modes BMM execution model (what dedicated contraction
engines use internally), propagated through the whole tree so the
high-rank form never exists on device.
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.misc import prod
from .lowering import SingleStep
from .pairwise import apply_pairwise, apply_single


def _block_plan(cur, tgt, sizes):
    """Plan a block transpose taking stored order ``cur`` to ``tgt``.

    Returns ``(block_dims, perm)``: reshape the flat tensor to
    ``block_dims`` (contiguous runs of ``cur``), apply ``perm``, and the
    result is contiguous in ``tgt`` order. Returns ``None`` if cur == tgt
    (no op needed).
    """
    cur = tuple(cur)
    tgt = tuple(tgt)
    if cur == tgt:
        return None
    pos = {ix: i for i, ix in enumerate(cur)}
    # greedy maximal runs: walk tgt, extend while consecutive in cur
    blocks = []  # (cur_start, length)
    i = 0
    n = len(tgt)
    while i < n:
        start = pos[tgt[i]]
        length = 1
        while (
            i + length < n and pos[tgt[i + length]] == start + length
        ):
            length += 1
        blocks.append((start, length))
        i += length
    # reshape partition: blocks sorted by cur position
    order = sorted(range(len(blocks)), key=lambda b: blocks[b][0])
    block_dims = tuple(
        prod(sizes[cur[blocks[b][0] + k]] for k in range(blocks[b][1]))
        for b in order
    )
    # perm: for each block in tgt appearance order, its index in the
    # cur-sorted reshape
    rank_of = {b: r for r, b in enumerate(order)}
    perm = tuple(rank_of[b] for b in range(len(blocks)))
    return block_dims, perm


# barriers only matter for big tensors: they stop the compile-time
# pathologies of fusing big high-rank copies into matmuls, but for small
# tensors fusion is beneficial (and harmless to compile)
BARRIER_MIN_SIZE = 2**16

# XLA:TPU sometimes "scoped"-promotes a mid-sized pallas-kernel output
# inside a scan body into VMEM; the default 16MB scoped limit then fails
# the compile. Raise it for the stage programs (forwarded per-compile
# even through the remote compile helper).
_STAGE_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "98304"}


def _stage_jit(fn):
    if jax.default_backend() in ("cpu", "gpu"):
        # the scoped-vmem option is TPU-only (CPU rejects it at compile)
        return jax.jit(fn)
    try:
        return jax.jit(fn, compiler_options=_STAGE_COMPILER_OPTIONS)
    except TypeError:  # older jax without compiler_options
        return jax.jit(fn)


def _maybe_barrier(x):
    if x.size >= BARRIER_MIN_SIZE:
        return jax.lax.optimization_barrier(x)
    return x


def _split_block_factors(block_dims, perm):
    """Tile-friendly factoring of a block transpose.

    XLA can still materialize the blocked/transposed forms at their
    logical shapes (observed: layout assignment pushes the blocked
    shape into the PRODUCER's output buffer, and the transposed copy
    materializes when the compacting reshape is not a layout bitcast).
    A small minor dim then tile-pads up to 64x - an 8 GB HBM blowup was
    measured on the m=10 bench. Splitting any large trailing dim D into
    (D//128, 128) makes both the source's and the transposed copy's
    (8,128) tiles exact. Returns (shape, expanded_perm) with perm
    positions offset by 1 for a leading plane dim kept at axis 0.
    """
    factors = [[d] for d in block_dims]

    def ok(d):
        return d >= 1024 and d % 128 == 0

    # last STORAGE dim governs the blocked source's minor dims
    if ok(block_dims[-1]):
        factors[-1] = [block_dims[-1] // 128, 128]
    # last PERMUTED dim governs the transposed copy's minor dims
    lp = perm[-1]
    if lp != len(block_dims) - 1 and ok(block_dims[lp]):
        factors[lp] = [block_dims[lp] // 128, 128]
    pos, k = [], 1
    for fs in factors:
        pos.append(tuple(range(k, k + len(fs))))
        k += len(fs)
    shape = tuple(f for fs in factors for f in fs)
    eperm = tuple(p for b in perm for p in pos[b])
    return shape, eperm


# Sub-tile transposes (a whole gate tensor inside one (8,128) tile) hit
# a pathological relayout path on TPU: a 32-element permuted copy inside
# the m=10 bench's scan body measured 6.5 ms - about 10^5x off. Tiny
# block transposes are instead expressed as one-hot matmuls, which
# always lower to a single fast MXU pass. Exact for every plane dtype:
# each output row has exactly one unit coefficient (HIGHEST precision
# keeps f32 values f32-precise through the TPU's bf16 MXU passes).
SMALL_T_MATMUL_MAX = int(os.environ.get("CTG_SMALL_T_MATMUL_MAX", "4096"))


@functools.lru_cache(maxsize=None)
def _perm_matrix(block_dims, perm):
    src = np.arange(prod(block_dims)).reshape(block_dims)
    src = src.transpose(perm).ravel()
    n = src.size
    p = np.zeros((n, n), np.float32)
    p[np.arange(n), src] = 1.0
    return p


def _apply_plan_matmul(flat, plan, nplanes):
    """out[p, i] = flat[p, src[i]] as (nplanes, n) @ (n, n) one-hot."""
    block_dims, perm = plan
    p = _perm_matrix(tuple(block_dims), tuple(perm))
    x = flat.reshape(nplanes, flat.size // nplanes)
    if jnp.issubdtype(flat.dtype, jnp.complexfloating):
        pj = jnp.asarray(p, flat.dtype.type(1).real.dtype)
        out_r = jax.lax.dot_general(
            x.real, pj, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        out_i = jax.lax.dot_general(
            x.imag, pj, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        out = jax.lax.complex(out_r, out_i)
    else:
        out = jax.lax.dot_general(
            x, jnp.asarray(p, flat.dtype),
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=flat.dtype,
        )
    return out.reshape((flat.size,))


# Multi-pass tile-exact transposes: when the stored order ends in tiny
# dims, NO single fused copy can be tile-exact (the 128-split machinery
# needs a big trailing dim) and XLA materializes the views at up to 64x
# padding - chip-measured 16 GB for a 256 MB operand (see
# transpose_synth module docstring). Big, badly-padding block plans are
# decomposed into a short sequence of copies that each keep >=1024-wide
# 128-splittable trailing units on both sides.
_MULTIPASS = os.environ.get("CTG_MULTIPASS", "1") != "0"
_MULTIPASS_MIN = int(
    os.environ.get("CTG_MULTIPASS_MIN_BYTES", str(32 * 2**20))
)
_MULTIPASS_PAD = float(os.environ.get("CTG_MULTIPASS_PAD_FACTOR", "4"))


def _multipass_plan(nbytes, block_dims, perm):
    """Pass sequence for a big badly-padding block plan, else None."""
    if not _MULTIPASS or nbytes < _MULTIPASS_MIN:
        return None
    from .transpose_synth import (
        padf,
        passes_cost,
        single_pass_pad_factor,
        synthesize_passes,
    )

    if single_pass_pad_factor(block_dims, perm) < _MULTIPASS_PAD:
        return None
    passes = synthesize_passes(block_dims, perm)
    if not passes:
        return None
    # engage only when the pass sequence's padded read+write traffic
    # beats the single copy's (it always wins on PEAK memory, but for
    # moderate pad factors one copy can still be cheaper end to end)
    single_cost = padf(block_dims[-1]) + padf(block_dims[perm[-1]])
    if passes_cost(passes) >= single_cost:
        return None
    return passes


def _apply_fused(flat, block_dims, perm, nplanes):
    """One fused transpose+compact-reshape copy, 128-split tile-exact.

    ``nplanes``: 0 for a bare flat array, 2 for plane-major storage
    (the leading plane dim stays at axis 0 and is never padded).
    """
    shape, eperm = _split_block_factors(block_dims, perm)
    if nplanes:
        t = flat.reshape((nplanes,) + shape)
        dims = (0,) + eperm
    else:
        t = flat.reshape(shape)
        dims = tuple(p - 1 for p in eperm)
    out = jax.lax.reshape(t, (flat.size,), dimensions=dims)
    return _maybe_barrier(out)


def _apply_block_plan(flat, plan):
    if plan is None:
        return flat
    block_dims, perm = plan
    if flat.size <= SMALL_T_MATMUL_MAX:
        return _apply_plan_matmul(flat, plan, 1)
    passes = _multipass_plan(
        flat.size * flat.dtype.itemsize, block_dims, perm
    )
    if passes is not None:
        for dims_i, perm_i in passes:
            flat = _apply_fused(flat, dims_i, perm_i, 0)
        return flat
    # transpose + compacting 1-D reshape expressed as ONE lax.reshape
    # (dimensions=perm), with large trailing dims 128-split so any
    # materialized intermediate is tile-exact (see _split_block_factors)
    return _apply_fused(flat, block_dims, perm, 0)


class _GroupedPair:
    """Precomputed plan for one pairwise step.

    ``mode`` selects a padding-aware lowering. TPU buffers pad their two
    minor dimensions to (8, 128) tiles, so any materialized array whose
    minor dims are tiny (e.g. a (1, 2^24, 2) matmul operand) blows up
    memory by up to 64x and stalls/OOMs the compiler. Modes:

    - "mac":    B==1, K<8  -> unrolled sum of 1-D vector MACs
    - "matvec": B==1, K>=8, N<8 -> per-column matvecs, concatenated flat
    - "mm":     B==1, K>=8, N>=8 -> (N,K)@(K,M) with big minor dims
    - "bmm":    B>1 -> 3-D batched matmul (padding accepted; rare)
    """

    __slots__ = (
        "x_id", "y_id", "out_id",
        "x_plan", "y_plan",
        "mode",
        "x_layout",  # "cm" -> (K, M); "mc" -> (M, K); "scat" -> stored
        "B", "M", "K", "N",
        "out_order",
        # no-realign scattered dot: (view_dims, kpos) over the stored
        # x order, decided at plan time (see _scatter_layout)
        "scatter",
        # recorded for gate-chain fusion
        "c_legs", "ny_legs", "m_legs", "b_legs", "y_size",
    )


class _FusedChain:
    """A run of consecutive small-gate absorptions into one evolving
    tensor, executed in ONE pass: the gates' kron product (tiny) is
    built on device and applied with a single matmul, instead of one
    bandwidth-bound sweep of the big tensor per gate."""

    __slots__ = (
        "x_id", "x_src_order",
        "gates",      # list of (gate_id, gate_order, c_legs, n_legs)
        "m_rest",
        "out_id", "out_order",
        "x_plan", "x_layout",
        "M", "K", "N",
    )

    def refresh(self, sizes, plan_badness_fn):
        """Recompute layout/plan after gates changed."""
        c_all = tuple(
            ix for (_, _, cl, _) in self.gates for ix in cl
        )
        n_all = tuple(
            ix for (_, _, _, nl) in self.gates for ix in nl
        )
        self.K = prod(sizes[ix] for ix in c_all)
        self.N = prod(sizes[ix] for ix in n_all)
        self.M = prod(sizes[ix] for ix in self.m_rest)
        self.out_order = n_all + tuple(self.m_rest)
        # layout choice mirrors the pair logic
        cand = []
        plan_cm = _block_plan(
            self.x_src_order, c_all + tuple(self.m_rest), sizes
        )
        cand.append(
            ("cm", plan_cm, plan_badness_fn(plan_cm, self.M * self.K))
        )
        if self.K % 128 == 0 or self.K < 8:
            plan_mc = _block_plan(
                self.x_src_order, tuple(self.m_rest) + c_all, sizes
            )
            cand.append(
                ("mc", plan_mc,
                 plan_badness_fn(plan_mc, self.M * self.K))
            )
        cand.sort(key=lambda t: t[2])
        self.x_layout, self.x_plan = cand[0][0], cand[0][1]


def _plan_badness(plan, total):
    """Padding waste of the block-reshape buffer (last partition dim)
    AND the transpose output (last target block), for big buffers."""
    if plan is None:
        return (1, 0)
    block_dims, perm = plan
    minor_in = block_dims[-1]
    minor_out = block_dims[perm[-1]]
    waste = max(1, 128 // max(min(minor_in, minor_out), 1))
    return (waste if total >= 2**16 else 1, len(perm))


class _InplaceRec:
    """A planned in-place fused gate chain (pallas kernel step)."""

    __slots__ = ("x_id", "out_id", "spec", "ys", "out_order",
                 "out_shape")


def plan_grouped(
    ir, size_dict, input_orders, fuse_gates=False, inplace_gates=False,
    gate_mode=None,
):
    """Host-side symbolic pass: stored orders + per-step plans.

    ``fuse_gates=True`` merges consecutive small-gate absorptions into
    the same evolving tensor into single fused-chain (kron + one matmul)
    steps.

    ``inplace_gates=True`` instead lowers runs of small-gate absorptions
    to layout-preserving pallas kernels (see ``pallas_gates.py``) -
    no realignment transposes, one HBM round trip per chain. Only valid
    for the split-complex execution path.

    ``gate_mode="window"`` (supersedes both, round 3) lowers gate
    chains to windowed MXU dot_generals (see ``windowed.py``): pure
    XLA, zero relayouts, measured ~4x faster than the pallas in-place
    kernels on v5e and with none of their Mosaic lowering latency.
    Split-complex only. ``gate_mode="inplace"`` = ``inplace_gates``.

    Returns ``(plans, storage, out_plan, out_shape, plan_last_use)``.
    """
    from .pallas_gates import MAX_CHAIN_GATES, build_chain_spec
    from .windowed import (
        MAX_CHAIN_GATES as W_MAX_CHAIN,
        MAX_GATE_SIZE as W_MAX_GATE,
        MIN_TENSOR_SIZE as W_MIN_TENSOR,
        plan_rotation,
        plan_window_chain,
    )

    if gate_mode is None:
        gate_mode = "inplace" if inplace_gates else None

    # fresh ssa ids for planner-created intermediates (rotations)
    aux_ids = [ir.num_inputs + len(ir.steps) + 1]

    steps = ir.steps
    final_id = ir.final_id
    sizes = dict(size_dict)

    storage = {}
    for i, order in enumerate(input_orders):
        storage[i] = tuple(order)

    plans = []

    # open in-place chain state:
    # dict(x_id, order0, gates[(c_set, ny)], y_ids, y_orders, out_id,
    #      spec, out_order, c_orders)
    chain = None

    # open window-chain state (gate_mode == "window"):
    # dict(x_id, order0, gates[(y_id, y_plan, c, ny, step_out)], recs,
    #      out_id)
    wchain = None

    def close_window_chain():
        nonlocal wchain
        if wchain is None:
            return
        recs = wchain["recs"]
        recs[0].x_id = wchain["x_id"]
        for rec in recs:
            plans.append(("window", rec))
            storage[rec.out_id] = rec.out_order
        wchain = None

    def try_window(p, step, si):
        """Extend / start a windowed gate chain with pair ``p``."""
        nonlocal wchain
        if (
            p.B != 1
            or p.b_legs
            or p.y_size > W_MAX_GATE
            or p.M * p.K < W_MIN_TENSOR
            or not p.c_legs
        ):
            return False
        y_order = storage[p.y_id]
        y_plan = _block_plan(
            y_order, tuple(p.c_legs) + tuple(p.ny_legs), sizes
        )
        g = (
            p.y_id, y_plan, tuple(p.c_legs), tuple(p.ny_legs), step.out
        )
        if (
            wchain is not None
            and wchain["out_id"] == p.x_id
            and ir.last_use.get(p.x_id) == si
            and len(wchain["gates"]) < W_MAX_CHAIN
        ):
            gates2 = wchain["gates"] + [g]
            recs, _why = plan_window_chain(
                wchain["order0"], sizes, gates2
            )
            if recs is not None:
                wchain["gates"] = gates2
                wchain["recs"] = recs
                wchain["out_id"] = step.out
                storage[step.out] = recs[-1].out_order
                return True
        close_window_chain()
        order0 = storage[p.x_id]
        recs, _why = plan_window_chain(order0, sizes, [g])
        base_id = p.x_id
        if recs is None and p.M * p.K >= 2 ** 16:
            # gate axes too scattered: pre-rotate the deep axes to the
            # front with a pure-identity window dot (pad-free,
            # MXU-speed realign), then retry
            rot, _rwhy = plan_rotation(
                order0, sizes, p.c_legs, aux_ids[0]
            )
            if rot is not None:
                recs2, _why2 = plan_window_chain(
                    rot.out_order, sizes, [g]
                )
                if recs2 is not None:
                    aux_ids[0] += 1
                    rot.x_id = p.x_id
                    plans.append(("window", rot))
                    storage[rot.out_id] = rot.out_order
                    base_id = rot.out_id
                    order0 = rot.out_order
                    recs = recs2
        if recs is None:
            return False
        wchain = {
            "x_id": base_id,
            "order0": order0,
            "gates": [g],
            "recs": recs,
            "out_id": step.out,
        }
        storage[step.out] = recs[-1].out_order
        return True

    def close_chain():
        nonlocal chain
        close_window_chain()
        if chain is None:
            return
        recs = []
        for y_id, y_order, (c_order, ny_order) in zip(
            chain["y_ids"], chain["y_orders"], chain["c_orders"]
        ):
            y_req = tuple(c_order) + tuple(ny_order)
            recs.append(
                (
                    y_id,
                    _block_plan(y_order, y_req, sizes),
                    max(1, prod(sizes[ix] for ix in c_order)),
                    max(1, prod(sizes[ix] for ix in ny_order)),
                )
            )
        rec = _InplaceRec()
        rec.x_id = chain["x_id"]
        rec.out_id = chain["out_id"]
        rec.spec = chain["spec"]
        rec.ys = tuple(recs)
        rec.out_order = chain["out_order"]
        rec.out_shape = tuple(sizes[ix] for ix in chain["out_order"])
        plans.append(("inplace", rec))
        storage[rec.out_id] = rec.out_order
        chain = None

    def try_inplace(p, step, si):
        """Extend / start an in-place chain with pair ``p``. Returns
        True if the step was absorbed."""
        nonlocal chain
        if (
            p.B != 1
            or p.b_legs
            or p.y_size > INPLACE_MAX_GATE_SIZE
            or p.M * p.K < 2**16
            or not p.c_legs
        ):
            return False
        g = (tuple(p.c_legs), tuple(p.ny_legs))
        y_order = storage[p.y_id]
        if (
            chain is not None
            and chain["out_id"] == p.x_id
            and ir.last_use.get(p.x_id) == si
            and len(chain["gates"]) < MAX_CHAIN_GATES
        ):
            gates2 = chain["gates"] + [g]
            spec, out_order, c_orders = build_chain_spec(
                chain["order0"], sizes, gates2
            )
            if spec is not None and _chain_combo_sum(spec) > (
                INPLACE_MAX_COMBO_SUM
            ):
                # the kernel's VPU work scales with the summed K*N MAC
                # sweeps; past this point an extra HBM round trip (new
                # chain) is cheaper than more in-pass arithmetic
                spec = None
            if spec is not None:
                chain["gates"] = gates2
                chain["y_ids"].append(p.y_id)
                chain["y_orders"].append(y_order)
                chain["out_id"] = step.out
                chain["spec"] = spec
                chain["out_order"] = out_order
                chain["c_orders"] = c_orders
                storage[step.out] = out_order
                return True
        close_chain()
        order0 = storage[p.x_id]
        spec, out_order, c_orders = build_chain_spec(
            order0, sizes, [g]
        )
        if spec is None:
            return False
        chain = {
            "x_id": p.x_id,
            "order0": order0,
            "gates": [g],
            "y_ids": [p.y_id],
            "y_orders": [y_order],
            "out_id": step.out,
            "spec": spec,
            "out_order": out_order,
            "c_orders": c_orders,
        }
        storage[step.out] = out_order
        return True

    # consumer lookup for the one-step layout lookahead: every
    # intermediate has exactly one consuming step in a tree
    consumer = {}
    for st in steps:
        if isinstance(st, SingleStep):
            consumer[st.inp] = None
        else:
            consumer[st.l] = st
            consumer[st.r] = st

    def _consumer_role_fn(out_id):
        """0/1/2 role of a leg at the consuming step (batch /
        contracted / free), or None when unknowable."""
        st = consumer.get(out_id)
        if st is None:
            return None
        other = set(st.r_legs if st.l == out_id else st.l_legs)
        cout = set(st.out_legs)

        def role(ix):
            if ix in other:
                return 0 if ix in cout else 1
            return 2

        return role

    for si, step in enumerate(steps):
        if isinstance(step, SingleStep):
            close_chain()
            plans.append(("single", step))
            storage[step.out] = tuple(step.out_legs)
            continue

        x_order = storage[step.l]
        y_order = storage[step.r]
        out_set = set(step.out_legs)
        x_set, y_set = set(x_order), set(y_order)
        shared = x_set & y_set

        b = [ix for ix in x_order if ix in shared and ix in out_set]
        c = [ix for ix in x_order if ix in shared and ix not in out_set]
        m = [ix for ix in x_order if ix not in shared]
        ny = [ix for ix in y_order if ix not in shared]

        # defensive: free axes not kept need pre-sums - rare; fall back
        # (recording the STORED orders, which are the actual axis labels
        # of the flat tensors at runtime)
        if any(ix not in out_set for ix in m + ny) or set(
            step.out_legs
        ) != set(b + m + ny):
            close_chain()
            x_dims = tuple(sizes[ix] for ix in x_order)
            y_dims = tuple(sizes[ix] for ix in y_order)
            plans.append(
                (
                    "fallback",
                    (step, step.l, step.r, x_order, y_order, x_dims,
                     y_dims),
                )
            )
            storage[step.out] = tuple(step.out_legs)
            continue

        # the tensor with the larger free group plays 'x' (keeps the big
        # group in the minor dims, avoids its transposes)
        x_id, y_id = step.l, step.r
        msize = prod(sizes[ix] for ix in m)
        nsize = prod(sizes[ix] for ix in ny)
        if nsize > msize:
            x_id, y_id = y_id, x_id
            x_order, y_order = y_order, x_order
            m, ny = ny, m
            msize, nsize = nsize, msize

        # canonical shared-group orders follow the bigger input overall
        big_order = (
            x_order
            if prod(sizes[ix] for ix in x_order)
            >= prod(sizes[ix] for ix in y_order)
            else y_order
        )
        b = [ix for ix in big_order if ix in shared and ix in out_set]
        c = [
            ix
            for ix in big_order
            if ix in shared and ix not in out_set
        ]

        B = prod(sizes[ix] for ix in b)
        M = msize
        K = prod(sizes[ix] for ix in c)
        N = nsize

        p = _GroupedPair()
        p.x_id, p.y_id, p.out_id = x_id, y_id, step.out
        p.B, p.M, p.K, p.N = B, M, K, N

        if B * M * K < 2**14 and B * K * N < 2**14:
            # everything small: full-rank direct contraction is fine and
            # padding waste is bounded by the tiny absolute sizes
            close_chain()
            x_dims = tuple(sizes[ix] for ix in x_order)
            y_dims = tuple(sizes[ix] for ix in y_order)
            plans.append(
                (
                    "fallback",
                    (step, x_id, y_id, x_order, y_order, x_dims, y_dims),
                )
            )
            storage[step.out] = tuple(step.out_legs)
            continue

        def plan_badness(plan, total):
            return _plan_badness(plan, total)

        # one-step layout lookahead: the internal order of the free
        # groups (m, ny) in the produced tensor is ours to choose.
        # Clustering those legs by their role at the CONSUMING step
        # (batch / contracted / free there) turns the consumer's
        # realignment into a few large blocks instead of a fine
        # interleave with small (heavily padded) minor blocks. Adopted
        # only when the summed producer+consumer padding badness drops.
        if B == 1 and _LAYOUT_LOOKAHEAD:
            crole = _consumer_role_fn(step.out)
            if crole is not None:
                m_cl = sorted(m, key=crole)
                ny_cl = sorted(ny, key=crole)
                if m_cl != m or ny_cl != ny:
                    osize = prod(
                        sizes[ix] for ix in b + ny + m
                    )

                    def tot_cost(mm, nn):
                        xp = _block_plan(
                            x_order, tuple(c) + tuple(mm), sizes
                        )
                        oo = tuple(b) + tuple(nn) + tuple(mm)
                        cp = _block_plan(
                            oo, tuple(sorted(oo, key=crole)), sizes
                        )
                        bx = _plan_badness(xp, M * K)
                        bc = _plan_badness(cp, osize)
                        return (bx[0] + bc[0], bx[1] + bc[1])

                    if tot_cost(m_cl, ny_cl) < tot_cost(m, ny):
                        m, ny = m_cl, ny_cl

        def choose_x_layout(allow_mc):
            """Pick (c+m) or (m+c) storage for x by padding badness of
            the required block transpose."""
            cand = []
            plan_cm = _block_plan(x_order, tuple(c) + tuple(m), sizes)
            cand.append(("cm", plan_cm, plan_badness(plan_cm, M * K)))
            if allow_mc:
                plan_mc = _block_plan(
                    x_order, tuple(m) + tuple(c), sizes
                )
                cand.append(
                    ("mc", plan_mc, plan_badness(plan_mc, M * K))
                )
            cand.sort(key=lambda t: t[2])
            return cand[0][0], cand[0][1]

        p.scatter = None
        if B == 1:
            if K < 8:
                p.mode = "mac"
                # "mc" keeps contracted axes trailing (strided 1-D
                # slices), avoiding a leading-small-block transpose
                p.x_layout, p.x_plan = choose_x_layout(allow_mc=True)
                y_req = tuple(c) + tuple(ny)      # (K, N), tiny
            elif N < 8:
                p.mode = "matvec"
                p.x_layout, p.x_plan = choose_x_layout(
                    allow_mc=(K % 128 == 0)
                )
                y_req = tuple(c) + tuple(ny)      # (K, N), tiny
            else:
                p.mode = "mm"
                p.x_layout, p.x_plan = choose_x_layout(
                    allow_mc=(K % 128 == 0)
                )
                y_req = tuple(ny) + tuple(c)      # (N, K), pads only y
            p.out_order = tuple(b) + tuple(ny) + tuple(m)
            # no-realign scattered dot: contract the stored view's K
            # positions directly, skipping the big x realign copy (or
            # multipass copy sequence) entirely. The output carries M
            # in STORED order - recorded below, downstream adapts.
            # Chip-measured 57%-of-device-time realign copies on the
            # MXU-heavy combo plans motivated generalizing this beyond
            # stable two-block splits (prof_combo256_v, round 4).
            if (
                _SCATTER_DOT
                and p.mode in ("mm", "matvec")
                and p.x_plan is not None   # realign would cost a copy
                and 2 * K * M >= _SCATTER_MIN
            ):
                sc = _scatter_layout(x_order, set(c), sizes)
                if sc is not None:
                    dims, kpos, m_stored, c_stored = sc
                    p.scatter = (dims, kpos)
                    p.x_plan = None
                    p.x_layout = "scat"
                    m = list(m_stored)
                    c = list(c_stored)
                    if p.mode == "mm":
                        y_req = tuple(ny) + tuple(c)
                    else:
                        y_req = tuple(c) + tuple(ny)
                    p.out_order = tuple(b) + tuple(ny) + tuple(m)
        else:
            p.mode = "bmm"
            p.x_layout = "cm"
            x_req = tuple(b) + tuple(c) + tuple(m)   # (B, K, M)
            y_req = tuple(b) + tuple(ny) + tuple(c)  # (B, N, K)
            p.out_order = tuple(b) + tuple(ny) + tuple(m)
            p.x_plan = _block_plan(x_order, x_req, sizes)

        p.y_plan = _block_plan(y_order, y_req, sizes)
        p.c_legs = tuple(c)
        p.ny_legs = tuple(ny)
        p.m_legs = tuple(m)
        p.b_legs = tuple(b)
        p.y_size = prod(sizes[ix] for ix in y_order)

        if gate_mode == "window":
            if try_window(p, step, si):
                continue
            close_chain()
        elif gate_mode == "inplace":
            if try_inplace(p, step, si):
                continue
            close_chain()

        if fuse_gates and _try_extend_chain(
            plans, p, step, si, ir.last_use, storage, sizes
        ):
            continue

        plans.append(("pair", p))
        storage[step.out] = p.out_order

    close_chain()

    # final rearrangement to the true output order
    final_order = storage.get(final_id, ())
    out_plan = _block_plan(
        final_order,
        tuple(ir.output_legs),
        sizes,
    ) if tuple(final_order) != tuple(ir.output_legs) else None
    out_shape = tuple(sizes[ix] for ix in ir.output_legs)

    # plan-level liveness (fusion changes plan/step correspondence)
    plan_last_use = {}
    for pi, (kind, info) in enumerate(plans):
        if kind == "pair":
            ids = (info.x_id, info.y_id)
        elif kind == "single":
            ids = (info.inp,)
        elif kind == "fusedchain":
            ids = (info.x_id, *(g[0] for g in info.gates))
        elif kind == "inplace":
            ids = (info.x_id, *(y[0] for y in info.ys))
        elif kind == "window":
            ids = (info.x_id, *(g[0] for g in info.gates))
        else:
            ids = (info[1], info[2])
        for vid in ids:
            plan_last_use[vid] = pi
    plan_last_use.pop(final_id, None)

    return plans, storage, out_plan, out_shape, plan_last_use


MAX_FUSED_GATES = 4
MAX_FUSED_K = 64
MAX_GATE_SIZE = 256
# the in-place pallas path handles larger "gates" (e.g. K=8, N=32
# fused-qubit blocks); its own MAX_GATE_COMBOS bounds kernel unrolling
INPLACE_MAX_GATE_SIZE = 2048

# one-step layout lookahead in plan_grouped (see there). EXPERIMENTAL
# and off by default: the single-plan badness proxy mispredicts the
# compiler's real padding choices on the bench (a 64x-padded realign
# appeared downstream) - needs a real end-to-end padded-traffic model
# before it can be trusted. RESOLUTION (round 3): the padding problem
# this targeted is fixed at execution instead - every block/window
# transpose 128-splits large trailing dims so both copies are
# tile-exact (zero padded traffic, see _apply_block_plan_split and
# windowed.exec_window); the lookahead now only trades transpose
# *block granularity* and stays an opt-in research knob.
_LAYOUT_LOOKAHEAD = bool(
    int(os.environ.get("CTG_LAYOUT_LOOKAHEAD", "0"))
)

# per-chain VPU guard: kernel sweep count per chain. Splitting chains
# does NOT reduce total VPU work (it only adds HBM passes - measured
# neutral-to-worse on the bench), so the default is effectively off;
# the knob remains for pathological chains.
INPLACE_MAX_COMBO_SUM = int(
    os.environ.get("CTG_INPLACE_MAX_COMBO_SUM", "1000000")
)


def _chain_combo_sum(spec):
    """Summed K*N MAC-sweep count of a chain spec (VPU cost proxy)."""
    total = 0
    for g in spec.gates:
        _, _, kdims_dim, ny_dims_dim, _, roll_axes = g[:6]
        nroll = prod([kk for _, _, kk in roll_axes] or [1])
        total += (
            prod(kdims_dim or (1,))
            * prod(ny_dims_dim or (1,))
            * nroll
            * nroll
        )
    return total


def _try_extend_chain(plans, p, step, si, step_last_use, storage, sizes):
    """Try merging the freshly-planned pair ``p`` into a fused gate
    chain ending at ``plans[-1]``. Returns True if merged."""
    if p.B != 1 or p.b_legs or p.y_size > MAX_GATE_SIZE:
        return False
    if not plans:
        return False
    kind_prev, prev = plans[-1]

    if kind_prev == "pair":
        # previous pair can seed a chain if it too absorbed a small gate
        if (
            prev.B != 1
            or prev.b_legs
            or prev.y_size > MAX_GATE_SIZE
            or prev.out_id != p.x_id
            or step_last_use.get(prev.out_id) != si
            or prev.K * p.K > MAX_FUSED_K
        ):
            return False
        # current gate must act on ORIGINAL axes of the chain base
        if any(ix in set(prev.ny_legs) for ix in p.c_legs):
            return False
        chain = _FusedChain()
        chain.x_id = prev.x_id
        chain.x_src_order = storage[prev.x_id]
        chain.gates = [
            (prev.y_id, storage[prev.y_id], prev.c_legs, prev.ny_legs),
            (p.y_id, storage[p.y_id], p.c_legs, p.ny_legs),
        ]
        chain.m_rest = [
            ix for ix in prev.m_legs if ix not in set(p.c_legs)
        ]
    elif kind_prev == "fusedchain":
        prev_n = {ix for (_, _, _, nl) in prev.gates for ix in nl}
        if (
            prev.out_id != p.x_id
            or step_last_use.get(prev.out_id) != si
            or len(prev.gates) >= MAX_FUSED_GATES
            or prev.K * p.K > MAX_FUSED_K
            or any(ix in prev_n for ix in p.c_legs)
        ):
            return False
        chain = prev
        chain.gates = chain.gates + [
            (p.y_id, storage[p.y_id], p.c_legs, p.ny_legs)
        ]
        chain.m_rest = [
            ix for ix in chain.m_rest if ix not in set(p.c_legs)
        ]
    else:
        return False

    chain.out_id = step.out
    chain.refresh(sizes, _plan_badness)
    if kind_prev == "pair":
        plans[-1] = ("fusedchain", chain)
    else:
        plans[-1] = ("fusedchain", chain)
    storage[step.out] = chain.out_order
    return True


def _exec_steps(
    plans,
    indices,
    temps,
    shapes,
    last_use,
    strip_exponent,
    precision,
    preferred_element_type,
    exponent,
):
    """Execute the plan steps at ``indices`` over the dict of flat
    tensors ``temps`` (mutated in place; ``shapes`` maps id -> full
    logical shape). Returns the running exponent."""
    for si in indices:
        kind, info = plans[si]
        if kind == "single":
            step = info
            x = temps[step.inp].reshape(shapes[step.inp])
            out = apply_single(x, step.in_legs, step.out_legs)
            temps[step.out] = jnp.ravel(out)
            shapes[step.out] = out.shape
            if last_use.get(step.inp) == si:
                del temps[step.inp]
            continue

        if kind == "fallback":
            step, x_id, y_id, x_order, y_order, x_dims, y_dims = info
            x = temps[x_id].reshape(x_dims)
            y = temps[y_id].reshape(y_dims)
            out = apply_pairwise(
                x, y, x_order, y_order, step.out_legs,
                precision=precision,
                preferred_element_type=preferred_element_type,
            )
            if strip_exponent:
                absmax = jnp.max(jnp.abs(out))
                scale = jnp.where(
                    absmax == 0, jnp.ones_like(absmax), absmax
                )
                out = out / scale
                e = jnp.log10(scale)
                exponent = e if exponent is None else exponent + e
            temps[step.out] = jnp.ravel(out)
            shapes[step.out] = out.shape
            for vid in (x_id, y_id):
                if last_use.get(vid) == si:
                    temps.pop(vid, None)
            continue

        if kind == "fusedchain":
            ch = info
            K, M, N = ch.K, ch.M, ch.N
            xf = _apply_block_plan(temps[ch.x_id], ch.x_plan)
            # build the combined gate (kron product) - tiny
            G = None
            for gid, gorder, c_legs, n_legs in ch.gates:
                gdims = tuple(shapes[gid]) if gid in shapes else None
                g = temps[gid].reshape(gdims)
                g2 = apply_single(
                    g, gorder, tuple(c_legs) + tuple(n_legs)
                )
                Ki = prod(g2.shape[: len(c_legs)])
                Ni = prod(g2.shape[len(c_legs):])
                g2 = g2.reshape(Ki, Ni)
                G = g2 if G is None else jnp.kron(G, g2)
            # apply with one pass (same lowerings as plain pairs)
            if K < 8:
                cols = []
                xks = []
                for k in range(K):
                    if ch.x_layout == "cm":
                        xks.append(
                            jax.lax.dynamic_slice(xf, (k * M,), (M,))
                        )
                    else:
                        xks.append(
                            jax.lax.slice(
                                xf, (k,), (k + (M - 1) * K + 1,), (K,)
                            )
                        )
                for n in range(N):
                    acc = None
                    for k in range(K):
                        term = xks[k] * G[k, n]
                        acc = term if acc is None else acc + term
                    cols.append(acc)
                out = cols[0] if N == 1 else jnp.concatenate(cols)
            else:
                if ch.x_layout == "cm":
                    x2 = _maybe_barrier(xf.reshape(K, M))
                    xdim = 0
                else:
                    x2 = _maybe_barrier(xf.reshape(M, K))
                    xdim = 1
                if N < 8:
                    cols = []
                    for n in range(N):
                        col = jax.lax.dot_general(
                            G[:, n],
                            x2,
                            dimension_numbers=(
                                ((0,), (xdim,)), ((), ())
                            ),
                            precision=precision,
                            preferred_element_type=preferred_element_type,
                        )
                        cols.append(col)
                    out = (
                        cols[0] if N == 1 else jnp.concatenate(cols)
                    )
                else:
                    out = jax.lax.dot_general(
                        G.T,
                        x2,
                        dimension_numbers=(((1,), (xdim,)), ((), ())),
                        precision=precision,
                        preferred_element_type=preferred_element_type,
                    )
                out = _maybe_barrier(out)
            if strip_exponent:
                absmax = jnp.max(jnp.abs(out))
                scale = jnp.where(
                    absmax == 0, jnp.ones_like(absmax), absmax
                )
                out = out / scale
                e = jnp.log10(scale)
                exponent = e if exponent is None else exponent + e
            temps[ch.out_id] = jnp.ravel(out)
            shapes[ch.out_id] = (1, N, M)
            for vid in (ch.x_id, *(g[0] for g in ch.gates)):
                if last_use.get(vid) == si:
                    temps.pop(vid, None)
            continue

        p = info
        B, M, K, N = p.B, p.M, p.K, p.N
        xf = _apply_block_plan(temps[p.x_id], p.x_plan)
        yf = _apply_block_plan(temps[p.y_id], p.y_plan)

        if p.scatter is not None:
            # no-realign scattered dot on the stored x view; output
            # carries M in stored order (p.out_order records it)
            dims, kpos = p.scatter
            if p.mode == "mm":
                y2 = yf.reshape(N, K)
            else:  # matvec: y stored (K, N)
                y2 = yf.reshape(K, N).T
            kdims = tuple(dims[q] for q in kpos)
            lhs = y2.reshape((N,) + kdims)
            x2 = xf.reshape(dims)
            dn = (
                (tuple(range(1, 1 + len(kpos))), tuple(kpos)),
                ((), ()),
            )
            out = jax.lax.dot_general(
                lhs,
                x2,
                dimension_numbers=dn,
                precision=precision,
                preferred_element_type=preferred_element_type,
            )  # (N, *mdims)
            out = _maybe_barrier(out)
        elif p.mode == "mac":
            # unrolled scalar-vector MACs, everything 1-D (no padded
            # buffers). "cm": x flat is (K, M) -> contiguous slices;
            # "mc": x flat is (M, K) -> strided slices
            y2 = yf.reshape(K, N)
            xks = []
            for k in range(K):
                if p.x_layout == "cm":
                    xks.append(
                        jax.lax.dynamic_slice(xf, (k * M,), (M,))
                    )
                else:
                    xks.append(
                        jax.lax.slice(
                            xf, (k,), (k + (M - 1) * K + 1,), (K,)
                        )
                    )
            cols = []
            for n in range(N):
                acc = None
                for k in range(K):
                    term = xks[k] * y2[k, n]
                    acc = term if acc is None else acc + term
                cols.append(acc)
            out = cols[0] if N == 1 else jnp.concatenate(cols)
        elif p.mode == "matvec":
            if p.x_layout == "cm":
                x2 = _maybe_barrier(xf.reshape(K, M))
                xdim = 0
            else:
                x2 = _maybe_barrier(xf.reshape(M, K))
                xdim = 1
            y2 = yf.reshape(K, N)
            cols = []
            for n in range(N):
                col = jax.lax.dot_general(
                    y2[:, n],
                    x2,
                    dimension_numbers=(((0,), (xdim,)), ((), ())),
                    precision=precision,
                    preferred_element_type=preferred_element_type,
                )
                cols.append(col)  # (M,)
            out = cols[0] if N == 1 else jnp.concatenate(cols)
            out = _maybe_barrier(out)
        elif p.mode == "mm":
            if p.x_layout == "cm":
                x2 = _maybe_barrier(xf.reshape(K, M))
                xdim = 0
            else:
                x2 = _maybe_barrier(xf.reshape(M, K))
                xdim = 1
            y2 = _maybe_barrier(yf.reshape(N, K))
            out = jax.lax.dot_general(
                y2,
                x2,
                dimension_numbers=(((1,), (xdim,)), ((), ())),
                precision=precision,
                preferred_element_type=preferred_element_type,
            )  # (N, M): both minor dims big -> pad-free
            out = _maybe_barrier(out)
        else:  # bmm, B > 1
            x3 = _maybe_barrier(xf.reshape(B, K, M))
            y3 = _maybe_barrier(yf.reshape(B, N, K))
            out = jax.lax.dot_general(
                y3,
                x3,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision=precision,
                preferred_element_type=preferred_element_type,
            )  # (B, N, M)
            out = _maybe_barrier(out)

        if strip_exponent:
            absmax = jnp.max(jnp.abs(out))
            scale = jnp.where(
                absmax == 0, jnp.ones_like(absmax), absmax
            )
            out = out / scale
            e = jnp.log10(scale)
            exponent = e if exponent is None else exponent + e
        temps[p.out_id] = jnp.ravel(out)
        shapes[p.out_id] = (B, N, M)
        for vid in (p.x_id, p.y_id):
            if last_use.get(vid) == si:
                temps.pop(vid, None)
    return exponent


def _zero_exponent(result):
    dt = result.dtype
    if jnp.issubdtype(dt, jnp.complexfloating):
        dt = jnp.zeros((), dt).real.dtype
    return jnp.zeros((), dt)


# -- split-complex execution -------------------------------------------------
#
# TPU has no native complex arithmetic: XLA decomposes complex64 matmuls
# into four f32 passes and, worse, materialized complex buffers carry a
# trailing (re, im) pair-dim that the (8, 128) tiling pads up to 64x.
# Instead, store every temporary as a single REAL flat array of length
# ``2 * numel`` - the real plane followed by the imag plane (plane-major,
# so the pair-dim is the MAJOR dim and never padded). Pairwise steps mix
# the planes explicitly:
#
# - "mm" (cm layout): one real matmul of the block-embedded gate
#   ``[[yr, -yi], [yi, yr]] (2N, 2K)`` against the stacked planes
#   ``(2K, M)`` - same flop count as the complex product, ONE MXU call,
#   and every dimension doubled (better MXU shapes for tiny gates);
# - "matvec"/"mac": per-column plane combinations (2 stacked matvecs per
#   output column, or unrolled MACs on 1-D plane slices);
# - small steps fall back to genuine complex arithmetic (padding is
#   bounded by their tiny absolute size).
#
# Measured on v5e (scratch/micro_complex.py): 1.6x bandwidth per byte on
# elementwise passes, 2.35x on K=2 matmuls, 1.47x on MAC chains. Split
# planes in plain f32 are exact (same arithmetic as complex64); a bf16
# ``plane_dtype`` additionally halves bandwidth at reduced precision.

# leg label reserved for the plane axis in single-term ops
_PLANE = "\x00plane"


def _to_planes(a, plane_dtype):
    """complex (or real) array -> flat (2*numel,) plane-major real."""
    a = jnp.asarray(a)
    if jnp.issubdtype(a.dtype, jnp.complexfloating):
        re, im = jnp.real(a), jnp.imag(a)
    else:
        re, im = a, jnp.zeros_like(a)
    return jnp.concatenate(
        [re.reshape(-1), im.reshape(-1)]
    ).astype(plane_dtype)


def _planes_to_complex(flat, shape):
    """flat (2*numel,) planes -> complex array of ``shape``."""
    n = prod(shape)
    f32 = jnp.float64 if flat.dtype == jnp.float64 else jnp.float32
    re = flat[:n].reshape(shape).astype(f32)
    im = flat[n:].reshape(shape).astype(f32)
    return jax.lax.complex(re, im)


def _apply_block_plan_split(flat, plan):
    """Block transpose of plane-major flat storage: both planes move with
    the same plan, plane dim stays leading (major, pad-free)."""
    if plan is None:
        return flat
    block_dims, perm = plan
    if flat.size <= 2 * SMALL_T_MATMUL_MAX:
        return _apply_plan_matmul(flat, plan, 2)
    # per-plane bytes: flat holds both planes, the size gate is per
    # logical operand so split and non-split engage at the same size
    passes = _multipass_plan(
        flat.size // 2 * flat.dtype.itemsize, block_dims, perm
    )
    if passes is not None:
        for dims_i, perm_i in passes:
            flat = _apply_fused(flat, dims_i, perm_i, 2)
        return flat
    # single fused transpose+compact-reshape, 128-split; see
    # _apply_block_plan / _split_block_factors
    return _apply_fused(flat, block_dims, perm, 2)


# Scattered-dims pair dot: skip the explicit x realign entirely.
# The realign of a big pair operand (an interleaved bit-permutation of
# a 2^26 tensor) lowers to a reshape+copy+reshape triple measured at
# ~26 ms/slice on the m=10 bench (at DEFAULT precision XLA even
# materializes it in bf16 at a padded 16-wide minor dim). A
# dot_general that contracts the SCATTERED K dim positions of the
# un-realigned view costs ~nothing extra and compiles ~30x faster
# (scratch/micro_pairdot2.py: +0.01 ms vs +8.1 ms at 2^26). Only the
# tiny y operand is realigned. CTG_SCATTER_DOT=0 restores the
# realign+2-D-dot path.
_SCATTER_DOT = os.environ.get("CTG_SCATTER_DOT", "1") != "0"
_SCATTER_MIN = 2 ** int(os.environ.get("CTG_SCATTER_DOT_MIN_LOG2", "20"))
# Chip-measured (scratch/probe_scatter.py, v5e): XLA folds the
# scattered-K operand fetch into the MXU load only when the stored
# view's trailing dim is large - trailing >=64 compiled with ZERO temp,
# trailing 16 materialized an 8x-padded copy (still cheaper than the
# realign triple, measured end-to-end), and trailing <=4 materialized
# at 32-64x padding or failed to compile outright (the combo-plan OOM:
# 16G for a 256M view). Pairs whose trailing stored dim is below this
# floor fall back to the explicit tile-aware realign path.
_SCATTER_MIN_TRAIL = int(os.environ.get("CTG_SCATTER_MIN_TRAIL", "16"))


# rank guard for the un-realigned view (rank explosion stalls the TPU
# memory planner; see module docstring and CLAUDE.md)
_SCATTER_MAX_RANK = int(os.environ.get("CTG_SCATTER_MAX_RANK", "11"))


def _scatter_layout(x_order, c_set, sizes):
    """Stored-view layout for a no-realign scattered pair dot.

    Merges adjacent same-class (contracted K vs free M) runs of the
    stored x order into view dims and returns ``(block_dims, kpos,
    m_stored, c_stored)``: the merged view dims, the positions of the
    K-class dims, and the free/contracted legs in stored order. The
    direct ``dot_general`` then contracts the scattered K positions of
    the un-realigned view; its output carries the M legs in STORED
    order (``m_stored``), which the planner records as the produced
    tensor's storage order - downstream steps adapt, so no output
    reorder is ever needed.

    Returns None when the view would be padding- or rank-hazardous:
    trailing stored dim or trailing M-class dim below
    ``_SCATTER_MIN_TRAIL`` (chip-measured: trailing >=64 folds into the
    MXU load with ZERO temp; 16 materializes an 8x-padded copy, still
    cheaper than the realign; <=4 pads 32-64x or OOMs the compiler), or
    view rank above ``_SCATTER_MAX_RANK``.

    Only lane (trailing) dims are guarded: the dot output (N, *m-dims)
    may still carry a small second-minor dim (m-dims[-2], or N down to
    2 in matvec mode), sublane-padding the output temp up to 4x. That
    is accepted by design - sublane padding is bounded (8 rows) and the
    output temp is transient; guarding it too would reject most
    profitable scatters (the realign alternative copies the full
    operand twice).
    """
    dims, isk, runs = [], [], []
    for ix in x_order:
        k = ix in c_set
        if isk and isk[-1] == k:
            dims[-1] *= sizes[ix]
            runs[-1].append(ix)
        else:
            dims.append(sizes[ix])
            isk.append(k)
            runs.append([ix])
    if len(dims) < 2 or len(dims) > _SCATTER_MAX_RANK:
        return None
    if not any(isk) or all(isk):
        return None
    mdims = [d for d, k in zip(dims, isk) if not k]
    if dims[-1] < _SCATTER_MIN_TRAIL or mdims[-1] < _SCATTER_MIN_TRAIL:
        return None
    kpos = tuple(i for i, k in enumerate(isk) if k)
    m_stored = tuple(
        ix for run, k in zip(runs, isk) if not k for ix in run
    )
    c_stored = tuple(
        ix for run, k in zip(runs, isk) if k for ix in run
    )
    return tuple(dims), kpos, m_stored, c_stored


def _split_pair_scattered(
    x_flat, yf, p, block_dims, kpos, precision, pet
):
    """One real-block dot_general on the un-realigned x view.

    lhs (2N, 2, *kdims) carries the complex combine over the plane
    axis: out rows [0:N] = yr.xr - yi.xi (real), rows [N:2N] =
    yi.xr + yr.xi (imag); contracting (plane, K-dims) of the stored
    view yields (2N, *m-dims) - already plane-major (N, M).
    """
    N, K = p.N, p.K
    if p.mode == "mm":
        y2 = yf.reshape(2, N, K)
        yr, yi = y2[0], y2[1]
    else:  # y stored (K, N)
        y2 = yf.reshape(2, K, N)
        yr, yi = y2[0].T, y2[1].T
    lhs = jnp.stack(
        [
            jnp.concatenate([yr, yi], axis=0),    # x real-plane coeffs
            jnp.concatenate([-yi, yr], axis=0),   # x imag-plane coeffs
        ],
        axis=1,
    )  # (2N, 2, K)
    kdims = tuple(block_dims[q] for q in kpos)
    lhs = lhs.reshape((2 * N, 2) + kdims)
    x2 = x_flat.reshape((2,) + tuple(block_dims))
    dn = (
        (tuple(range(1, 2 + len(kpos))), (0,) + tuple(q + 1 for q in kpos)),
        ((), ()),
    )
    out = jax.lax.dot_general(
        lhs, x2, dn, precision=precision, preferred_element_type=pet
    )  # (2N, *mdims)
    return _maybe_barrier(out.reshape(-1))


def _split_apply_small_y(
    xf, x_layout, M, K, N, ykn_r, ykn_i, precision, pet
):
    """Apply a small (K, N) complex 'gate' (planes ``ykn_r/ykn_i``) to the
    big plane-flat tensor ``xf`` (logical (K, M) in ``x_layout``).
    Returns plane-flat (2*N*M,) in (N, M) logical order. B == 1 only.
    """
    dot = jax.lax.dot_general
    if K < 8:
        # unrolled plane MACs on 1-D slices (pad-free)
        off = K * M
        xks_r, xks_i = [], []
        for k in range(K):
            if x_layout == "cm":
                xks_r.append(jax.lax.dynamic_slice(xf, (k * M,), (M,)))
                xks_i.append(
                    jax.lax.dynamic_slice(xf, (off + k * M,), (M,))
                )
            else:
                xks_r.append(
                    jax.lax.slice(xf, (k,), (k + (M - 1) * K + 1,), (K,))
                )
                xks_i.append(
                    jax.lax.slice(
                        xf,
                        (off + k,),
                        (off + k + (M - 1) * K + 1,),
                        (K,),
                    )
                )
        cols_r, cols_i = [], []
        for n in range(N):
            accr = acci = None
            for k in range(K):
                tr = xks_r[k] * ykn_r[k, n] - xks_i[k] * ykn_i[k, n]
                ti = xks_r[k] * ykn_i[k, n] + xks_i[k] * ykn_r[k, n]
                accr = tr if accr is None else accr + tr
                acci = ti if acci is None else acci + ti
            cols_r.append(accr)
            cols_i.append(acci)
        return jnp.concatenate(cols_r + cols_i)

    if N < 8:
        # per-column matvecs
        cols_r, cols_i = [], []
        if x_layout == "cm":
            # stacked planes (2K, M); embed the complex combine into the
            # 2K-vector: zr = [yr; -yi] . X, zi = [yi; yr] . X
            x2 = _maybe_barrier(xf.reshape(2 * K, M))
            for n in range(N):
                vr = jnp.concatenate([ykn_r[:, n], -ykn_i[:, n]])
                vi = jnp.concatenate([ykn_i[:, n], ykn_r[:, n]])
                cols_r.append(
                    dot(vr, x2, (((0,), (0,)), ((), ())),
                        precision=precision, preferred_element_type=pet)
                )
                cols_i.append(
                    dot(vi, x2, (((0,), (0,)), ((), ())),
                        precision=precision, preferred_element_type=pet)
                )
        else:
            # stacked planes (2M, K); a real y-column hits both planes at
            # once: X @ yr = [xr yr; xi yr]
            x2 = _maybe_barrier(xf.reshape(2 * M, K))
            for n in range(N):
                a = dot(x2, ykn_r[:, n], (((1,), (0,)), ((), ())),
                        precision=precision, preferred_element_type=pet)
                b = dot(x2, ykn_i[:, n], (((1,), (0,)), ((), ())),
                        precision=precision, preferred_element_type=pet)
                cols_r.append(a[:M] - b[M:])
                cols_i.append(b[:M] + a[M:])
        return _maybe_barrier(jnp.concatenate(cols_r + cols_i))

    # mm: K >= 8, N >= 8
    yrT, yiT = ykn_r.T, ykn_i.T  # (N, K), tiny
    if x_layout == "cm":
        x2 = _maybe_barrier(xf.reshape(2 * K, M))
        yb = jnp.concatenate(
            [
                jnp.concatenate([yrT, -yiT], axis=1),
                jnp.concatenate([yiT, yrT], axis=1),
            ],
            axis=0,
        )  # (2N, 2K): the real block embedding of the complex gate
        out = dot(yb, x2, (((1,), (0,)), ((), ())),
                  precision=precision, preferred_element_type=pet)
        # (2N, M) = planes of (N, M), already plane-major
        return _maybe_barrier(out.reshape(-1))
    x2 = _maybe_barrier(xf.reshape(2 * M, K))
    a = dot(yrT, x2, (((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=pet)  # (N, 2M)
    b = dot(yiT, x2, (((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=pet)
    zr = a[:, :M] - b[:, M:]
    zi = b[:, :M] + a[:, M:]
    return _maybe_barrier(
        jnp.concatenate([zr.reshape(-1), zi.reshape(-1)])
    )


def _exec_steps_split(
    plans,
    indices,
    temps,
    shapes,
    last_use,
    strip_exponent,
    precision,
    pet,
    exponent,
    plane_dtype,
):
    """Split-complex twin of ``_exec_steps``: ``temps`` holds plane-major
    flat REAL arrays of length 2*numel; ``shapes`` maps id -> logical
    (complex) shape. Returns the running exponent."""
    dot = jax.lax.dot_general

    def store(out_id, flat, shape, si, srcs):
        if flat.dtype != plane_dtype:
            flat = flat.astype(plane_dtype)
        temps[out_id] = flat
        shapes[out_id] = shape
        for vid in srcs:
            if last_use.get(vid) == si:
                temps.pop(vid, None)

    edt = (
        jnp.float64 if plane_dtype == jnp.float64 else jnp.float32
    )

    def strip(flat):
        nonlocal exponent
        absmax = jnp.max(jnp.abs(flat)).astype(edt)
        scale = jnp.where(absmax == 0, jnp.ones_like(absmax), absmax)
        flat = flat / scale.astype(flat.dtype)
        e = jnp.log10(scale)
        exponent = e if exponent is None else exponent + e
        return flat

    for si in indices:
        kind, info = plans[si]
        if kind == "single":
            step = info
            x2 = temps[step.inp].reshape((2,) + tuple(shapes[step.inp]))
            out = apply_single(
                x2,
                (_PLANE,) + tuple(step.in_legs),
                (_PLANE,) + tuple(step.out_legs),
            )
            store(
                step.out, out.reshape(-1), out.shape[1:], si, (step.inp,)
            )
            continue

        if kind == "fallback":
            step, x_id, y_id, x_order, y_order, x_dims, y_dims = info
            xc = _planes_to_complex(temps[x_id], x_dims)
            yc = _planes_to_complex(temps[y_id], y_dims)
            out = apply_pairwise(
                xc, yc, x_order, y_order, step.out_legs,
                precision=precision,
            )
            flat = jnp.concatenate(
                [jnp.real(out).reshape(-1), jnp.imag(out).reshape(-1)]
            )
            if strip_exponent:
                flat = strip(flat)
            store(step.out, flat, out.shape, si, (x_id, y_id))
            continue

        if kind == "window":
            rec = info
            from .windowed import exec_window

            out = exec_window(
                rec, temps, shapes, precision, plane_dtype
            )
            # no exponent strip (see the inplace note below): chains
            # are near-unitary; surrounding matmul steps still strip
            srcs = (rec.x_id, *(g[0] for g in rec.gates))
            if getattr(rec, "w2_id", None) is not None:
                srcs += (rec.w2_id,)
            store(rec.out_id, out, rec.out_shape, si, srcs)
            continue

        if kind == "inplace":
            rec = info
            from .pallas_gates import run_chain

            ys = []
            for y_id, y_plan, K, N in rec.ys:
                yf = _apply_block_plan_split(temps[y_id], y_plan)
                ys.append(yf.reshape(2, K, N))
            out = run_chain(rec.spec, temps[rec.x_id], ys)
            # no exponent strip here: it would cost an extra full HBM
            # pass and gate chains are near-unitary (magnitudes stable);
            # stripping still happens at the surrounding matmul steps
            store(
                rec.out_id, out, rec.out_shape, si,
                (rec.x_id, *(y[0] for y in rec.ys)),
            )
            continue

        if kind == "fusedchain":
            ch = info
            K, M, N = ch.K, ch.M, ch.N
            xf = _apply_block_plan_split(temps[ch.x_id], ch.x_plan)
            g_r = g_i = None
            for gid, gorder, c_legs, n_legs in ch.gates:
                gdims = tuple(shapes[gid])
                gc = _planes_to_complex(temps[gid], gdims)
                g2 = apply_single(
                    gc, gorder, tuple(c_legs) + tuple(n_legs)
                )
                Ki = prod(g2.shape[: len(c_legs)])
                Ni = prod(g2.shape[len(c_legs):])
                g2 = g2.reshape(Ki, Ni)
                if g_r is None:
                    gk = g2
                else:
                    gk = jnp.kron(
                        jax.lax.complex(g_r, g_i), g2
                    )
                g_r = jnp.real(gk).astype(jnp.float32)
                g_i = jnp.imag(gk).astype(jnp.float32)
            out = _split_apply_small_y(
                xf, ch.x_layout, M, K, N,
                g_r.astype(plane_dtype), g_i.astype(plane_dtype),
                precision, pet,
            )
            if strip_exponent:
                out = strip(out)
            store(
                ch.out_id, out, (1, N, M), si,
                (ch.x_id, *(g[0] for g in ch.gates)),
            )
            continue

        p = info
        B, M, K, N = p.B, p.M, p.K, p.N
        if p.scatter is not None:
            yf = _apply_block_plan_split(temps[p.y_id], p.y_plan)
            out = _split_pair_scattered(
                temps[p.x_id], yf, p, p.scatter[0], p.scatter[1],
                precision, pet,
            )
            if strip_exponent:
                out = strip(out)
            store(p.out_id, out, (B, N, M), si, (p.x_id, p.y_id))
            continue
        xf = _apply_block_plan_split(temps[p.x_id], p.x_plan)
        yf = _apply_block_plan_split(temps[p.y_id], p.y_plan)

        if p.mode == "bmm":
            x3 = _maybe_barrier(xf.reshape(2, B, K, M))
            y3 = _maybe_barrier(yf.reshape(2, B, N, K))
            dn = (((2,), (1,)), ((0,), (0,)))
            rr = dot(y3[0], x3[0], dn, precision=precision,
                     preferred_element_type=pet)
            ii = dot(y3[1], x3[1], dn, precision=precision,
                     preferred_element_type=pet)
            ri = dot(y3[1], x3[0], dn, precision=precision,
                     preferred_element_type=pet)
            ir = dot(y3[0], x3[1], dn, precision=precision,
                     preferred_element_type=pet)
            out = jnp.concatenate(
                [(rr - ii).reshape(-1), (ri + ir).reshape(-1)]
            )
            out = _maybe_barrier(out)
        else:
            # y stored as (K, N) for mac/matvec, (N, K) for mm
            if p.mode == "mm":
                y2 = yf.reshape(2, N, K)
                ykn_r, ykn_i = y2[0].T, y2[1].T
            else:
                y2 = yf.reshape(2, K, N)
                ykn_r, ykn_i = y2[0], y2[1]
            out = _split_apply_small_y(
                xf, p.x_layout, M, K, N, ykn_r, ykn_i, precision, pet
            )
        if strip_exponent:
            out = strip(out)
        store(p.out_id, out, (B, N, M), si, (p.x_id, p.y_id))
    return exponent


def _resolve_split(split_complex, arrays):
    if split_complex in (None, "auto"):
        return any(
            jnp.issubdtype(jnp.asarray(a).dtype, jnp.complexfloating)
            for a in arrays
        )
    return bool(split_complex)


def _resolve_plane_dtype(plane_dtype, arrays):
    if plane_dtype is not None:
        return jnp.dtype(plane_dtype)
    dt = jnp.result_type(*(jnp.asarray(a).dtype for a in arrays))
    if jnp.issubdtype(dt, jnp.complexfloating):
        return jnp.zeros((), dt).real.dtype
    return dt


def build_grouped_core_fn(
    ir,
    strip_exponent=False,
    precision=None,
    preferred_element_type=None,
    size_dict=None,
    input_orders=None,
    fuse_gates=False,
    split_complex=None,
    plane_dtype=None,
    inplace_gates=False,
    gate_mode=None,
):
    """Single-function grouped-flat executor over the whole IR.

    ``split_complex`` (default auto: on when any input is complex) runs
    the whole contraction on stacked real/imag planes - see the
    split-complex section above.
    """
    plans, storage, out_plan, out_shape, last_use = plan_grouped(
        ir, size_dict, input_orders, fuse_gates=fuse_gates,
        inplace_gates=inplace_gates, gate_mode=gate_mode,
    )
    final_id = ir.final_id
    sizes = dict(size_dict)
    in_shapes = {
        i: tuple(sizes[ix] for ix in input_orders[i])
        for i in range(ir.num_inputs)
    }

    def core(*arrays):
        shapes = dict(in_shapes)
        if not _resolve_split(split_complex, arrays) and any(
            k in ("inplace", "window") for k, _ in plans
        ):
            raise ValueError(
                "gate-chain plans require split-complex execution"
            )
        if _resolve_split(split_complex, arrays):
            pdt = _resolve_plane_dtype(plane_dtype, arrays)
            temps = {
                i: _to_planes(a, pdt) for i, a in enumerate(arrays)
            }
            exponent = _exec_steps_split(
                plans, range(len(plans)), temps, shapes, last_use,
                strip_exponent, precision, preferred_element_type,
                None, pdt,
            )
            flat = _apply_block_plan_split(temps[final_id], out_plan)
            result = _planes_to_complex(flat, out_shape)
        else:
            temps = {i: jnp.ravel(a) for i, a in enumerate(arrays)}
            exponent = _exec_steps(
                plans, range(len(plans)), temps, shapes, last_use,
                strip_exponent, precision, preferred_element_type, None,
            )
            result = _apply_block_plan(temps[final_id], out_plan)
            result = result.reshape(out_shape)
        if strip_exponent:
            if exponent is None:
                exponent = _zero_exponent(result)
            return result, exponent
        return result

    return core


def _digit_columns(meta):
    """Stable column order for the mixed-radix digits of a flat slice
    id: one column per non-projected sliced index."""
    return [ix for ix, (_, _, project) in meta.items() if project is None]


def _ids_to_digits(slice_ids, meta):
    """Decode flat slice ids into an ``(n, ncols)`` int32 digit matrix.

    Concrete ids decode host-side with exact Python big-int arithmetic,
    so the flat id space may exceed int32/int64 (deep instances slice
    2^39+ ways). Traced ids fall back to in-jit stride math, valid
    whenever the individual strides fit int32.
    """
    cols = _digit_columns(meta)
    if isinstance(slice_ids, jax.core.Tracer):
        sid = slice_ids.astype(jnp.int32)
        digs = []
        for ix in cols:
            stride, size, _ = meta[ix]
            if stride > 2**31 - 1:
                # any int32-representable id has digit 0 here
                digs.append(jnp.zeros_like(sid))
            else:
                digs.append((sid // stride) % size)
        return jnp.stack(digs, axis=-1)
    import numpy as np

    ids = [int(s) for s in np.asarray(slice_ids).reshape(-1)]
    digs = np.empty((len(ids), len(cols)), np.int32)
    for j, ix in enumerate(cols):
        stride, size, _ = meta[ix]
        digs[:, j] = [(s // stride) % size for s in ids]
    return jnp.asarray(digs)


def _select_input(a, axes, meta, digits, axis_offset=0):
    """Select the sliced view(s) of raw input ``a`` for a matrix of
    slice-id digits (see ``_ids_to_digits``). Dynamically sliced inputs
    come back with a leading batch axis; projected-only inputs come back
    unbatched (slice-invariant). ``axis_offset`` shifts the recorded
    axes (plane-stacked inputs carry a leading re/im axis).
    """
    cols = _digit_columns(meta)
    col_of = {ix: j for j, ix in enumerate(cols)}

    def pick(dig_row):
        b = a
        for ax, ix in axes:
            _, _, project = meta[ix]
            if project is not None:
                b = jax.lax.index_in_dim(
                    b, project, axis=ax + axis_offset, keepdims=False
                )
            else:
                b = jax.lax.dynamic_index_in_dim(
                    b, dig_row[col_of[ix]], axis=ax + axis_offset,
                    keepdims=False,
                )
        return b

    if any(meta[ix][2] is None for _, ix in axes):
        return jax.vmap(pick)(digits)
    return pick(jnp.zeros((max(len(cols), 1),), jnp.int32))


def to_plane_array(a):
    """Host-side: complex array -> real ``(2, *shape)`` re/im plane stack
    (the ``plane_io`` input format). Real arrays get a zero imag plane.
    """
    import numpy as np

    a = np.asarray(a)
    if np.iscomplexobj(a):
        return np.ascontiguousarray(np.stack([a.real, a.imag]))
    return np.stack([a, np.zeros_like(a)])


class _OpEntry:
    """One hoisted window operator: the plan step it feeds, the gate
    lineage subprogram producing the gate values, and the dynamically
    sliced indices the operator value depends on."""

    __slots__ = ("plan_idx", "rec", "w2_id", "dyn_inds", "lineage",
                 "leaves", "stack_axes", "stack_dims")


# lineage tensors above this size are not worth recomputing in the
# operator program (and signal a non-gate-like producer)
_HOIST_MAX_LINEAGE_NUMEL = 2 ** 16
# cap on one hoisted operator STACK (all slice variants) in bytes
_HOIST_MAX_STACK_BYTES = 2 ** 30


def _plan_operator_hoist(plans, ir, storage, sizes, sel_axes, meta):
    """Find window steps whose ``W2`` operator can be prebuilt outside
    the per-slice program.

    A window operator depends only on its gate tensors, which are tiny
    and produced by a tiny lineage of preprocessing steps from the raw
    inputs. Building ``W2`` in the per-slice program (a) recompiles the
    one-hot expansion + mask construction into every stage that
    contains a window step - measured as the dominant share of the
    pathological minutes-long per-stage TPU compiles - and (b) reruns
    it for every slice. Hoisting compiles the construction once as its
    own tiny program and passes ``W2`` in as an argument.

    Gates whose lineage touches dynamically sliced indices get a
    STACKED operator (one ``W2`` per digit combination of exactly those
    indices, typically 2-4), selected per-slice like any sliced input.

    Returns a list of :class:`_OpEntry` (``w2_id`` unassigned).
    """
    def_out = {}
    for pi, (kind, info) in enumerate(plans):
        if kind == "single":
            def_out[info.out] = pi
        elif kind == "fallback":
            def_out[info[0].out] = pi
        else:
            def_out[info.out_id] = pi

    def numel_of(vid):
        legs = storage.get(vid)
        if legs is None:
            return None
        return prod(sizes[ix] for ix in legs) if legs else 1

    entries = []
    for pi, (kind, info) in enumerate(plans):
        if kind != "window":
            continue
        rec = info
        lineage = set()
        leaves = set()
        ok = True
        stack = [y_id for (y_id, *_r) in rec.gates]
        seen = set(stack)
        while stack and ok:
            vid = stack.pop()
            ne = numel_of(vid)
            if ne is None or ne > _HOIST_MAX_LINEAGE_NUMEL:
                ok = False
                break
            if vid < ir.num_inputs:
                leaves.add(vid)
                continue
            pj = def_out.get(vid)
            if pj is None:
                ok = False
                break
            k2, in2 = plans[pj]
            if k2 == "single":
                srcs = (in2.inp,)
            elif k2 == "fallback":
                srcs = (in2[1], in2[2])
            elif k2 == "pair":
                srcs = (in2.x_id, in2.y_id)
            else:
                ok = False
                break
            lineage.add(pj)
            for s in srcs:
                if s not in seen:
                    seen.add(s)
                    stack.append(s)
        if not ok:
            continue
        dyn = sorted(
            {
                ix
                for lf in leaves
                for (_ax, ix) in sel_axes.get(lf, ())
                if meta[ix][2] is None
            },
            key=str,
        )
        dims = tuple(meta[ix][1] for ix in dyn)
        # W2 is (2*S_out, 2*S_in) f32: 16*S_in*S_out bytes per variant
        stack_bytes = (
            (prod(dims) if dims else 1) * 16 * rec.S_in * rec.S_out
        )
        if stack_bytes > _HOIST_MAX_STACK_BYTES:
            continue
        e = _OpEntry()
        e.plan_idx = pi
        e.rec = rec
        e.w2_id = None
        e.dyn_inds = tuple(dyn)
        e.lineage = tuple(sorted(lineage))
        e.leaves = tuple(sorted(leaves))
        e.stack_dims = dims
        # descending axis order: successive keepdims=False removals in
        # _select_input stay valid (same convention as
        # _sliced_axes_per_input)
        e.stack_axes = tuple(
            (j, ix) for j, ix in enumerate(dyn)
        )[::-1]
        entries.append(e)
    return entries


def _make_operator_build_fn(
    entries, plans, in_shapes, sel_axes, meta, ax_off, plane_io,
    plane_dtype, precision, pet, leaf_ids,
):
    """The standalone window-operator program: gate LEAF arrays (in
    ``leaf_ids`` order) -> tuple of ``W2`` flats (stacked over
    slice-digit combos when the operator is slice-dependent).
    Projected slice indices are applied statically here; dynamic ones
    are enumerated and stacked.

    Taking only the (tiny) leaves keeps the program's inputs small
    enough to run on the CPU backend - see the wiring in
    :func:`make_grouped_staged_contractor`."""
    import itertools

    from .windowed import build_w4

    def op_build(*leaf_arrays):
        arrays = dict(zip(leaf_ids, leaf_arrays))
        pdt = _resolve_plane_dtype(plane_dtype, leaf_arrays)
        outs = []
        for e in entries:
            rec = e.rec
            pos_of = {ix: j for j, ix in enumerate(e.dyn_inds)}
            variants = []
            for combo in itertools.product(
                *(range(d) for d in e.stack_dims)
            ):
                temps = {}
                shapes = {}
                for lf in e.leaves:
                    a = arrays[lf]
                    for ax, ix in sel_axes.get(lf, ()):
                        _stride, _size, project = meta[ix]
                        idx = (
                            project
                            if project is not None
                            else combo[pos_of[ix]]
                        )
                        a = jax.lax.index_in_dim(
                            a, int(idx), axis=ax + ax_off,
                            keepdims=False,
                        )
                    temps[lf] = (
                        jnp.ravel(a).astype(pdt)
                        if plane_io
                        else _to_planes(a, pdt)
                    )
                    shapes[lf] = in_shapes[lf]
                if e.lineage:
                    _exec_steps_split(
                        plans, e.lineage, temps, shapes, {}, False,
                        precision, pet, None, pdt,
                    )
                ys = [
                    _apply_block_plan_split(
                        temps[y_id], y_plan
                    ).reshape(2, K, N)
                    for (y_id, y_plan, K, N) in rec.gates
                ]
                variants.append(build_w4(rec.recipe, ys, pdt))
            if e.stack_dims:
                w = jnp.stack(variants).reshape(
                    e.stack_dims + variants[0].shape
                )
            else:
                w = variants[0]
            outs.append(w)
        return tuple(outs)

    return op_build


def make_grouped_staged_contractor(
    tree,
    stage_size=12,
    strip_exponent=False,
    precision=None,
    preferred_element_type=None,
    autojit=True,
    fuse_gates=False,
    split_complex=False,
    plane_dtype=None,
    slice_batch=None,
    slice_batch_mode="auto",
    plane_io=False,
    inplace_gates="auto",
    gate_mode="auto",
):
    """Grouped-flat executor compiled as many small jitted stages.

    On backends whose compiler is slow per-op for large buffers (the
    remote TPU compile helper), one big program can take tens of minutes;
    ~``stage_size``-step stages compile independently (and hit the
    persistent cache independently), at the cost of one dispatch per
    stage.

    ``split_complex=True`` (build-time decision: stage signatures change)
    runs on stacked real/imag planes; input conversion happens inside the
    first stage, so raw (complex) arrays go straight in with no eager
    per-array dispatches.

    ``slice_batch=B`` changes the returned callable's signature to
    ``fn(arrays, slice_ids)`` where ``arrays`` are the RAW (unsliced)
    inputs and ``slice_ids`` is a 1-D int array of B slice numbers.
    Slice selection happens inside the first jitted stage and every
    stage is ``vmap``-ed over the slice axis, so B slices cost the same
    number of dispatches as one. Subtrees that no sliced index reaches
    are computed once (unbatched) and broadcast. Returns the B per-slice
    results stacked on a leading axis (and a ``(B,)`` exponent vector if
    ``strip_exponent``); the caller sums / reassembles. Reference
    intent: ``core.py:3943-4030`` (one call contracting all slices).

    ``slice_batch_mode``: ``"vmap"`` runs all B slices concurrently
    (B-times the per-slice temp memory, including any padded
    realignment copies - best for small slices); ``"scan"`` loops over
    the batch device-side inside each stage (per-slice memory, still
    one dispatch per stage per batch - best for big slices); ``"auto"``
    picks by per-slice size.

    ``plane_io=True`` (requires ``split_complex``) keeps complex dtypes
    off the device entirely: each complex input is passed as a real
    ``(2, *shape)`` re/im plane stack (see :func:`to_plane_array`) and
    the result comes back as ``(2, *out_shape)`` planes. Some TPU
    runtimes cannot transfer or compile complex buffers at all; plane
    I/O also halves transfer dtype quirks on the hot path.
    """
    from .lowering import extract_contractions, sliced_input_legs

    if gate_mode == "auto":
        # gate chains run on split planes only. "inplace" (pallas,
        # round 2) is the measured end-to-end winner on the v5e bench
        # and the default; "window" (MXU dot_generals, round 3) remains
        # opt-in: at full caps its hoisted W2 operators cost 945 MB of
        # HBM (OOM alongside the 2^28 peak), and at small caps
        # (CTG_WIN_S_*, 120 MB) it runs green but slower - round-4
        # m=10 numbers: inplace+scattered-dot 1.141-1.185 s vs window
        # 1.619 s per 8 slices. The MXU wins per-op but loses end to
        # end to the window realignments and operator traffic.
        if not split_complex:
            gate_mode = None
        else:
            gate_mode = "inplace"
    if gate_mode and not split_complex:
        raise ValueError("gate chains require split_complex=True")

    # CTG_PEAK_ORDER=1 schedules steps in the tree's peak-minimizing
    # depth-first order (exchange rule, tree.peak_optimized_order) -
    # lower concurrent-live HBM for deep sliced plans, at the cost of
    # possibly splitting gate chains the default extent order keeps
    # adjacent. Opt-in: adjacency-sensitive fusion makes it a per-plan
    # A/B, not a default.
    order = (
        tree.peak_optimized_order()
        if os.environ.get("CTG_PEAK_ORDER", "0") == "1"
        else None
    )
    ir = extract_contractions(tree, order=order)
    input_orders = [sliced_input_legs(tree, i) for i in range(tree.N)]
    plans, storage, out_plan, out_shape, last_use = plan_grouped(
        ir, tree.size_dict, input_orders, fuse_gates=fuse_gates,
        gate_mode=gate_mode,
    )
    final_id = ir.final_id
    sizes = dict(tree.size_dict)
    in_shapes = {
        i: tuple(sizes[ix] for ix in input_orders[i])
        for i in range(ir.num_inputs)
    }

    n = len(plans)
    stage_size = max(1, stage_size)
    bounds = list(range(0, n, stage_size)) + [n]

    # symbolic liveness: which ids are live entering each stage
    def stage_fn(start, end, carry_ids, out_ids, shapes_static, first):
        def fn(carry, exponent=None):
            # per-slice body; under slice_batch this is the vmap cell
            if split_complex:
                if first:
                    pdt = _resolve_plane_dtype(plane_dtype, carry)
                    # hoisted W2 operators are already real block
                    # embeddings: flatten, never plane-stack
                    temps = {
                        i: jnp.ravel(a).astype(pdt)
                        if (plane_io or i in w2_set)
                        else _to_planes(a, pdt)
                        for i, a in zip(carry_ids, carry)
                    }
                else:
                    pdt = carry[0].dtype
                    temps = dict(zip(carry_ids, carry))
                shapes = dict(shapes_static)
                exponent = _exec_steps_split(
                    plans, range(start, end), temps, shapes, last_use,
                    strip_exponent, precision, preferred_element_type,
                    exponent, pdt,
                )
            else:
                temps = dict(zip(carry_ids, carry))
                if first:
                    temps = {
                        i: jnp.ravel(a) for i, a in temps.items()
                    }
                shapes = dict(shapes_static)
                exponent = _exec_steps(
                    plans, range(start, end), temps, shapes, last_use,
                    strip_exponent, precision, preferred_element_type,
                    exponent,
                )
            outs = tuple(temps[i] for i in out_ids)
            if strip_exponent:
                if exponent is None:
                    if split_complex:
                        exponent = jnp.zeros(
                            (),
                            jnp.float64
                            if pdt == jnp.float64
                            else jnp.float32,
                        )
                    else:
                        exponent = _zero_exponent(outs[0])
                return outs, exponent
            return outs

        if not slice_batch:
            return _stage_jit(fn) if autojit else fn

        if scan_slices:
            # sequential device-side loop over the slice axis: per-slice
            # temp memory is identical to the unbatched path (vmap would
            # multiply every padded realignment copy by the batch size),
            # but a whole batch of slices still costs one dispatch per
            # stage. Everything is batched (slice-invariant subtrees are
            # recomputed per slice - they are tiny gate subtrees).
            if strip_exponent and not first:

                def outer(carry, exponent):
                    return jax.lax.map(
                        lambda ce: fn(ce[0], ce[1]), (carry, exponent)
                    )

            elif not first:

                def outer(carry):
                    return jax.lax.map(fn, carry)

            else:

                def outer(carry, digits):
                    sel = []
                    for i, a in zip(carry_ids, carry):
                        if i in batched:
                            sel.append(
                                _select_input(
                                    a, sel_axes[i], meta,
                                    digits, sel_off[i],
                                )
                            )
                            continue
                        b = (
                            _select_input(
                                a, sel_axes[i], meta, None, sel_off[i]
                            )
                            if sel_axes[i]
                            else a
                        )
                        sel.append(
                            jnp.broadcast_to(
                                b, digits.shape[:1] + b.shape
                            )
                        )
                    return jax.lax.map(fn, tuple(sel))

            return _stage_jit(outer) if autojit else outer

        # vmap over the slice axis; ids untouched by any dynamically
        # sliced index stay unbatched (computed once, broadcast by XLA
        # only where a batched operand meets them)
        in_ax = tuple(0 if i in batched else None for i in carry_ids)
        out_ax = tuple(0 if i in batched else None for i in out_ids)
        o_ax = (out_ax, 0) if strip_exponent else out_ax

        if strip_exponent and not first:
            vfn = jax.vmap(fn, in_axes=(in_ax, 0), out_axes=o_ax)
            return _stage_jit(vfn) if autojit else vfn

        vfn = jax.vmap(
            lambda c: fn(c), in_axes=(in_ax,), out_axes=o_ax
        )
        if not first:
            return _stage_jit(vfn) if autojit else vfn

        # first stage additionally performs the slice selection from the
        # RAW input arrays, inside the same jitted program
        def outer(carry, digits):
            sel = tuple(
                _select_input(a, sel_axes[i], meta, digits, sel_off[i])
                if sel_axes[i]
                else a
                for i, a in zip(carry_ids, carry)
            )
            return vfn(sel)

        return _stage_jit(outer) if autojit else outer

    # determine produced/used ids per stage to compute carries
    def step_ids(si):
        kind, info = plans[si]
        if kind == "pair":
            return (info.x_id, info.y_id), info.out_id
        if kind == "single":
            return (info.inp,), info.out
        if kind == "fusedchain":
            return (info.x_id, *(g[0] for g in info.gates)), info.out_id
        if kind == "inplace":
            return (info.x_id, *(y[0] for y in info.ys)), info.out_id
        if kind == "window":
            srcs = (info.x_id, *(g[0] for g in info.gates))
            if getattr(info, "w2_id", None) is not None:
                srcs += (info.w2_id,)
            return srcs, info.out_id
        step, x_id, y_id = info[0], info[1], info[2]
        return (x_id, y_id), step.out

    defined_at = {i: -1 for i in range(ir.num_inputs)}
    for si in range(n):
        _, out = step_ids(si)
        defined_at[out] = si

    def live_ids(boundary_step):
        out = []
        for vid, d in defined_at.items():
            if d < boundary_step:
                lu = last_use.get(vid)
                if vid == final_id or (
                    lu is not None and lu >= boundary_step
                ):
                    out.append(vid)
        return sorted(out)

    # which value ids vary across slices: any ancestor input touched by a
    # dynamically (non-projected) sliced index
    if plane_io and not split_complex:
        raise ValueError("plane_io requires split_complex=True")
    ax_off = 1 if plane_io else 0

    batched = set()
    per_input = ()
    meta = {}
    scan_slices = False
    if slice_batch:
        if slice_batch_mode == "auto":
            # vmap multiplies every temp (incl. padded realignment
            # copies) by the batch size; beyond ~2^24 batched elements
            # per temp that exhausts HBM, so loop device-side instead
            scan_slices = tree.max_size() * slice_batch > 2**24
        else:
            scan_slices = slice_batch_mode == "scan"
        from .executor import _slice_meta, _sliced_axes_per_input

        meta = _slice_meta(tree)
        per_input = _sliced_axes_per_input(tree)
        batched = {
            i
            for i in range(ir.num_inputs)
            if any(meta[ix][2] is None for _, ix in per_input[i])
        }
        for si in range(n):
            srcs, out = step_ids(si)
            if any(s in batched for s in srcs):
                batched.add(out)

    # per-id slice-selection metadata: leaf inputs use the tree's
    # sliced axes (offset by the plane axis under plane_io); hoisted
    # operator stacks use their own leading digit axes (no offset)
    sel_axes = {
        i: (per_input[i] if slice_batch else ())
        for i in range(ir.num_inputs)
    }
    sel_off = {i: ax_off for i in range(ir.num_inputs)}

    # -- hoist window operators out of the per-slice program ----------
    # (their construction compiles as its own tiny program and usually
    # runs once; per-slice stages keep only transposes + matmuls)
    op_entries = []
    op_build_j = None
    w2_set = frozenset()
    if gate_mode == "window" and os.environ.get(
        "CTG_HOIST_W2", "1"
    ) != "0":
        op_entries = _plan_operator_hoist(
            plans, ir, storage, sizes, sel_axes, meta
        )
    if op_entries:
        base_id = max(storage) + 1
        w2_ids = []
        for k, e in enumerate(op_entries):
            wid = base_id + k
            e.w2_id = wid
            e.rec.w2_id = wid
            w2_ids.append(wid)
            defined_at[wid] = -1
            last_use[wid] = e.plan_idx
            sel_axes[wid] = e.stack_axes
            sel_off[wid] = 0
            if e.dyn_inds:
                batched.add(wid)
        w2_set = frozenset(w2_ids)
        if slice_batch:
            # re-propagate slice-variance: a window output whose only
            # slice dependence enters via its (hoisted) operator must
            # still be batched
            for si in range(n):
                srcs, out = step_ids(si)
                if any(s in batched for s in srcs):
                    batched.add(out)
        op_leaf_ids = tuple(
            sorted({lf for e in op_entries for lf in e.leaves})
        )
        op_build = _make_operator_build_fn(
            op_entries, plans, in_shapes, sel_axes, meta, ax_off,
            plane_io, plane_dtype, precision, preferred_element_type,
            op_leaf_ids,
        )
        # The build is tiny compute (gate leaves <= 2^16 numel) but its
        # one-hot/mask graph compiles pathologically on TPU (227s
        # measured for one 7-gate operator).  Build on the CPU backend
        # - leaves pulled host-side, results pushed to the default
        # device once per call - unless told otherwise.
        hoist_backend = os.environ.get("CTG_HOIST_BACKEND", "cpu")
        if (
            autojit
            and hoist_backend == "cpu"
            and jax.default_backend() != "cpu"
        ):
            cpu_dev = jax.devices("cpu")[0]
            op_build_c = jax.jit(op_build)
            timing = os.environ.get("CTG_TIMING") == "1"

            def op_build_raw(*arrays):
                t0 = time.perf_counter() if timing else 0.0
                leaves = tuple(
                    np.asarray(arrays[i]) for i in op_leaf_ids
                )
                t1 = time.perf_counter() if timing else 0.0
                with jax.default_device(cpu_dev):
                    outs = op_build_c(*leaves)
                    outs = tuple(np.asarray(o) for o in outs)
                t2 = time.perf_counter() if timing else 0.0
                dev = jax.devices()[0]
                res = tuple(jax.device_put(o, dev) for o in outs)
                if timing:
                    # sync only when measuring: the subsequent stage
                    # dispatch already orders against the transfers
                    for r in res:
                        r.block_until_ready()
                    t3 = time.perf_counter()
                    nb = sum(o.nbytes for o in outs)
                    print(
                        f"# op_build: pull={t1 - t0:.3f}s "
                        f"build={t2 - t1:.3f}s "
                        f"push={t3 - t2:.3f}s ({nb / 2**20:.0f} MB)",
                        file=sys.stderr,
                    )
                return res

        else:
            op_build_full = (
                _stage_jit(op_build) if autojit else op_build
            )

            def op_build_raw(*arrays):
                return op_build_full(
                    *(arrays[i] for i in op_leaf_ids)
                )

        # The operators depend only on the (tiny, slice-independent)
        # gate leaves, so for repeated calls with the same leaf objects
        # - every slice batch of a contraction - rebuilding them (host
        # pulls + device pushes over a ~25ms-latency tunnel, per leaf)
        # is pure overhead. One-entry cache keyed on leaf identity;
        # holding strong refs to the previous call's gate leaves is
        # cheap (<= 2^16 numel each) and avoids id-reuse hazards.
        # NOTE: the cache assumes leaves are not mutated in place
        # between calls (jnp arrays are immutable; numpy leaves must be
        # treated as frozen once handed to the contractor).
        # CTG_OP_CACHE=0 disables it (every call rebuilds + repushes).
        op_cache = {"leaves": None, "outs": None}
        op_cache_on = os.environ.get("CTG_OP_CACHE", "1") != "0"

        def op_build_j(*arrays):
            leaves = tuple(arrays[i] for i in op_leaf_ids)
            prev = op_cache["leaves"]
            if (
                op_cache_on
                and prev is not None
                and len(prev) == len(leaves)
                and all(a is b for a, b in zip(prev, leaves))
            ):
                return op_cache["outs"]
            outs = op_build_raw(*arrays)
            if op_cache_on:
                op_cache["leaves"] = leaves
                op_cache["outs"] = outs
            return outs

    stages = []
    carries = [list(range(ir.num_inputs)) + sorted(w2_set)]
    for k in range(len(bounds) - 1):
        start, end = bounds[k], bounds[k + 1]
        carry_in = carries[-1]
        carry_out = live_ids(end) if end < n else [final_id]
        # shapes of everything (static, known host-side)
        shapes_static = dict(in_shapes)
        for si in range(n):
            kind, info = plans[si]
            if kind == "pair":
                shapes_static[info.out_id] = (info.B, info.N, info.M)
            elif kind == "fusedchain":
                shapes_static[info.out_id] = (1, info.N, info.M)
            elif kind == "inplace":
                shapes_static[info.out_id] = info.out_shape
            elif kind == "window":
                shapes_static[info.out_id] = info.out_shape
            elif kind == "single":
                shapes_static[info.out] = tuple(
                    sizes[ix] for ix in storage[info.out]
                )
            else:  # fallback
                fstep = info[0]
                shapes_static[fstep.out] = tuple(
                    sizes[ix] for ix in storage[fstep.out]
                )
        stages.append(
            (stage_fn(start, end, carry_in, carry_out, shapes_static,
                      first=(k == 0)),
             carry_out)
        )
        carries.append(carry_out)

    def _post(flat):
        if split_complex:
            flat = _apply_block_plan_split(flat, out_plan)
            if plane_io:
                return flat.reshape((2,) + tuple(out_shape))
            return _planes_to_complex(flat, out_shape)
        return _apply_block_plan(flat, out_plan).reshape(out_shape)

    def _precompile_stages(carry, digits_aval):
        """AOT-compile every stage program CONCURRENTLY.

        The stage programs are independent XLA computations, but the
        normal lazy-jit path compiles them serially — stage k+1's
        compile waits for stage k's compile *and* execution. Each
        ``.compile()`` releases the GIL during the XLA compile, so a
        thread per stage overlaps the per-program compile floor (on
        the remote-tunnel backend the compile runs server-side).
        Abstract shapes are propagated host-side with ``eval_shape``
        (no device work), then all stages lower+compile in a thread
        pool. This populates jax's in-process/persistent compilation
        caches; the subsequent normal call hits them.

        Returns the number of programs compiled, or None when the
        executor is un-jitted or carries a hoisted-operator build
        (window mode — its op_build is not abstractly traceable).
        """
        if not autojit or op_build_j is not None:
            return None
        import concurrent.futures as cf

        jobs = []
        exponent = None
        for k, (sf, _carry_out) in enumerate(stages):
            if k == 0:
                args = (carry, digits_aval) if digits_aval is not None \
                    else (carry,)
            elif strip_exponent:
                args = (carry, exponent)
            else:
                args = (carry,)
            res = jax.eval_shape(sf, *args)
            jobs.append((sf, args))
            if strip_exponent:
                carry, exponent = res
            else:
                carry = res
        nw = min(len(jobs), int(
            os.environ.get("CTG_PRECOMPILE_WORKERS", "16")
        ))
        with cf.ThreadPoolExecutor(max_workers=max(nw, 1)) as ex:
            futs = [
                ex.submit(lambda sf=sf, a=a: sf.lower(*a).compile())
                for sf, a in jobs
            ]
            for f in futs:
                f.result()
        return len(jobs)

    if slice_batch:

        def fn(arrays, slice_ids):
            # decode flat ids to digits (host-side exact for concrete
            # ids - the flat id space may exceed int64 on deep
            # instances)
            digits = _ids_to_digits(slice_ids, meta)
            nb = digits.shape[0]
            carry = tuple(arrays)
            if op_build_j is not None:
                # separate tiny program: window operators built once
                # per call, not once per slice per stage
                carry = carry + tuple(op_build_j(*arrays))
            exponent = None
            for k, (sf, carry_out) in enumerate(stages):
                if k == 0:
                    res = sf(carry, digits)
                else:
                    res = sf(carry, exponent) if strip_exponent else sf(
                        carry
                    )
                if strip_exponent:
                    carry, exponent = res
                else:
                    carry = res
            (flat,) = carry
            if scan_slices or final_id in batched:
                result = jax.vmap(_post)(flat)
            else:
                r = _post(flat)
                result = jnp.broadcast_to(r, (nb,) + r.shape)
            if strip_exponent:
                if exponent is None:
                    exponent = jnp.zeros((nb,), jnp.float32)
                return result, exponent
            return result

        def precompile(arrays, slice_ids):
            digits = _ids_to_digits(np.asarray(slice_ids), meta)
            carry = tuple(
                jax.ShapeDtypeStruct(tuple(a.shape), a.dtype)
                for a in arrays
            )
            dig_aval = jax.ShapeDtypeStruct(
                tuple(digits.shape), digits.dtype
            )
            return _precompile_stages(carry, dig_aval)

        fn.precompile = precompile
        return fn

    def fn(*arrays):
        carry = tuple(arrays)
        if op_build_j is not None:
            carry = carry + tuple(op_build_j(*arrays))
        exponent = None
        for k, (sf, carry_out) in enumerate(stages):
            if strip_exponent:
                carry, exponent = (
                    sf(carry) if exponent is None else sf(carry, exponent)
                )
            else:
                carry = sf(carry)
        (flat,) = carry
        result = _post(flat)
        if strip_exponent:
            if exponent is None:
                exponent = _zero_exponent(result)
            return result, exponent
        return result

    def precompile(*arrays):
        carry = tuple(
            jax.ShapeDtypeStruct(tuple(a.shape), a.dtype)
            for a in arrays
        )
        return _precompile_stages(carry, None)

    fn.precompile = precompile
    return fn
