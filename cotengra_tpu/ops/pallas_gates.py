"""Pallas TPU kernel: IN-PLACE fused gate-chain application.

The dominant step type in circuit-like tensor networks is "absorb a
small gate": contract a tiny tensor y (say 2x2 or 4x4) with a huge
tensor x over one or two axes. Because the contracted axes are replaced
by new axes of the same size, the big tensor's storage layout can be
PRESERVED: out[..., n, ...] = sum_k y[k, n] * x[..., k, ...] with n in
the k positions. The XLA lowering of this (dot_general after a block
transpose) materializes the realignment in (8,128)-tiled layouts, where
a small axis in the minor dims costs up to 32x padded HBM traffic - the
single largest cost in the honest round-2 profile.

This module instead lowers a CHAIN of such gate applications to one
pallas kernel. The flat plane-major storage (2*numel real scalars) is
viewed as ``(2, above..., R2, C)``:

- ``C`` (minor, >=1024 lanes) and ``R2`` (second-minor, 8..128
  sublanes) are carved off the trailing axes - splitting an untouched
  axis if needed - so the HBM layout of the view is compact and the
  reshape from the flat form is a free bitcast;
- gate axes in the ``above`` region are exposed as full-size middle
  dims ("dim gates": contracted by slicing + restacking the VMEM tile);
- gate axes inside ``R2`` or ``C`` are handled with static rolls +
  iota masks ("roll gates"): ``out = sum_d coeff_d(pos) *
  roll(x, d*stride)`` - no reshapes or relayouts at all. Because region
  boundaries fall on axis boundaries, an axis is always entirely inside
  one region, and roll periods always divide the tile extent;
- every remaining dim is a grid dim. Each VMEM tile is read once, all
  gates of the chain are applied on registers (VPU), and the tile is
  written back once: traffic for a t-gate chain is read+write of x -
  the bandwidth lower bound - instead of t padded round trips.

No reference analog: cotengra delegates pairwise contractions to array
backends (``contract.py``); this kernel exists because of the TPU's
tiled-layout padding rules.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.misc import prod

# planning limits
C_MIN = 1024             # minimum minor dim (lanes)
R2_MIN, R2_MAX = 8, 128  # second-minor dim bounds (sublanes)
MAX_VIEW_RANK = 12       # view dims including plane, R2, C
MAX_CHAIN_GATES = int(os.environ.get("CTG_MAX_CHAIN_GATES", "8"))
MAX_GATE_DIM_PROD = 64   # product of dim-gate axes live in the tile
MAX_GATE_COMBOS = 512    # K*N unrolled MACs per gate in the kernel
# in-block + out-block budget; kernel live temporaries (rolled copies,
# accumulators, tiled fields) land on the compiler's scoped-vmem stack
# at ~15-25x this, covered by the raised 64M scoped limit the stage
# programs compile with (grouped._STAGE_COMPILER_OPTIONS)
VMEM_TILE_BUDGET = (
    int(os.environ.get("CTG_VMEM_TILE_BUDGET_KB", "2048")) * 1024
)
# coefficient-field mode (see kernel): per-gate / per-chain VMEM budget
# for the precomputed shift-coefficient fields (0 disables field mode)
FIELD_GATE_BUDGET = (
    int(os.environ.get("CTG_FIELD_GATE_BUDGET_KB", "8192")) * 1024
)
FIELD_CHAIN_BUDGET = (
    int(os.environ.get("CTG_FIELD_CHAIN_BUDGET_KB", "16384")) * 1024
)
# grid dimension semantics for the chain kernels ("arbitrary" or
# "parallel"); every grid cell writes a disjoint output block, so
# "parallel" is valid. Chip-measured (scratch/micro_dma2.py, round 5):
# both semantics run at the same ~160 GB/s copy ceiling across
# 512KB-4MB blocks, so the conservative "arbitrary" stays the default;
# the knob remains for future Mosaic versions where "parallel" may
# unlock cross-step DMA overlap.
_GRID_SEM = os.environ.get("CTG_GRID_SEMANTICS", "arbitrary")


class ChainSpec:
    """Static description of one fused in-place gate chain."""

    __slots__ = (
        "in_view", "out_view", "in_block", "out_block",
        "seg_sizes", "in_seg_axes", "out_seg_axes",
        "r2", "c_dim", "c_blk",
        "gates",    # ("dim", pos, kdims, ny_dims)
        #           | ("roll", axes=((axis_kind, stride, size), ...))
        #             axis_kind: 0 = row (R2, axis -2), 1 = lane (C, -1)
        "grid",
        "_key",
    )

    def key(self):
        if self._key is None:
            self._key = (
                self.in_view, self.out_view, self.in_block,
                self.out_block, self.seg_sizes, self.in_seg_axes,
                self.out_seg_axes, self.r2, self.c_dim, self.c_blk,
                self.gates, self.grid,
            )
        return self._key


def build_chain_spec(order0, sizes, gates):
    """Try to build a :class:`ChainSpec`.

    Parameters
    ----------
    order0 : tuple[str]
        Stored axis order of the big tensor at chain start.
    sizes : dict
        Axis sizes.
    gates : list of (c_legs, ny_legs)
        Per gate: contracted legs (tuple) and new legs (tuple, same
        total size), applied sequentially. For gates whose axes land in
        the roll regions, c_legs[i] pairs positionally with ny_legs[i]
        (must match sizes).

    Returns
    -------
    (spec, out_order, c_orders) or (None, reason, None)
        ``c_orders``: per gate ``(c_order, ny_order)`` - realign y to
        ``c_order + ny_order``; K/N enumerate in those orders.
    """
    if len(gates) > MAX_CHAIN_GATES:
        return None, "too many gates", None

    all_c = set()
    for c_legs, _ in gates:
        all_c |= set(c_legs)
    if not all_c:
        return None, "no gates", None
    # mid-chain-created legs that are later contracted
    created = set()
    for c_legs, ny_legs in gates:
        created |= set(ny_legs)

    def is_gate_axis(name):
        return name in all_c

    # sizes lookup that understands ("__part__", name, size) entries
    def size_of(entry):
        if isinstance(entry, tuple):
            return entry[2]
        return sizes[entry]

    def name_of(entry):
        if isinstance(entry, tuple):
            return None
        return entry

    def gate_of(entry):
        nm = name_of(entry)
        return nm is not None and is_gate_axis(nm)

    # ---- carve C then R2 off the tail ---------------------------------
    def carve(axes, lo, hi):
        region = []
        p = 1
        axes = list(axes)
        while p < lo and axes:
            e = axes[-1]
            sz = size_of(e)
            if gate_of(e):
                axes.pop()
                region.insert(0, (name_of(e), sz))
                p *= sz
            else:
                need = -(-lo // p)
                # smallest power-of-two-ish divisor >= need
                take = sz
                d = sz
                while d % 2 == 0 and d // 2 >= need:
                    d //= 2
                if d >= need and sz % d == 0:
                    take = d
                if take == sz:
                    axes.pop()
                    region.insert(0, (name_of(e), sz))
                else:
                    axes.pop()
                    axes.append(("__part__", name_of(e), sz // take))
                    region.insert(0, (None, take))
                p *= take
        if p < lo or p > hi:
            return None, None
        return region, axes

    cregion, rest = carve(list(order0), C_MIN, 2**18)
    if cregion is None:
        return None, "tensor too small for C", None
    c_dim = prod(s for _, s in cregion)
    if c_dim % 128:
        return None, "C not lane aligned", None
    r2region, rest = carve(rest, R2_MIN, R2_MAX * 16)
    if r2region is None:
        return None, "tensor too small for R2", None
    r2 = prod(s for _, s in r2region)
    if r2 % 8:
        return None, "R2 not sublane aligned", None

    # ---- above region: touched legs individual, runs fused ------------
    touched_above = set()
    above_names = []
    for e in rest:
        nm = name_of(e)
        above_names.append((nm, size_of(e)))
        if nm is not None and is_gate_axis(nm):
            touched_above.add(nm)

    dims = []  # ('seg', size) | ('leg', name, size)
    run = 1
    for nm, sz in above_names:
        if nm in touched_above:
            if run > 1:
                dims.append(("seg", run))
                run = 1
            dims.append(("leg", nm, sz))
        else:
            run *= sz
    if run > 1:
        dims.append(("seg", run))

    # roll-region name lists (position -> name), evolve by substitution
    r2names = [nm for nm, _ in r2region]
    cnames = [nm for nm, _ in cregion]
    r2sizes = [s for _, s in r2region]
    csizes = [s for _, s in cregion]

    def roll_strides(names, szs):
        st = {}
        s = 1
        for nm, sz in zip(reversed(names), reversed(szs)):
            if nm is not None:
                st[nm] = s
            s *= sz
        return st

    in_dims = list(dims)
    gate_specs = []
    c_orders = []
    max_lane_period = 1
    field_bytes_total = 0
    order = list(order0)  # evolving output leg order

    for c_legs, ny_legs in gates:
        cset = set(c_legs)
        pos_above = sorted(
            i
            for i, d in enumerate(dims)
            if d[0] == "leg" and d[1] in cset
        )
        above_hit = {dims[i][1] for i in pos_above}
        r2_hit = [nm for nm in r2names if nm in cset]
        c_hit = [nm for nm in cnames if nm in cset]
        if len(above_hit) + len(r2_hit) + len(c_hit) != len(cset):
            return None, "gate axis not addressable", None

        # pair every roll-region axis with a same-size ny leg: the new
        # axis takes the old one's position (required for in-place);
        # leftover ny legs become dim axes at the first dim-c position
        roll_list = r2_hit + c_hit
        ny_pool = list(ny_legs)
        pair = {}
        for cx in roll_list:
            cand = next(
                (n for n in ny_pool if sizes[n] == sizes[cx]), None
            )
            if cand is None:
                return None, "roll axis unpairable", None
            pair[cx] = cand
            ny_pool.remove(cand)
        dim_ny = tuple(ny_pool)
        anchor_end = False
        if dim_ny and not pos_above:
            # anchor the new dims at the very end of the above region
            # (just above R2) - expressible in leg order only when the
            # above/R2 boundary falls on an axis boundary
            if r2region[0][0] is None:
                return None, "dim ny without dim anchor", None
            anchor_end = True

        str_r2 = roll_strides(r2names, r2sizes)
        str_c = roll_strides(cnames, csizes)
        roll_axes = tuple(
            [(0, str_r2[cx], sizes[cx]) for cx in r2_hit]
            + [(1, str_c[cx], sizes[cx]) for cx in c_hit]
        )
        for kind, st, kk in roll_axes:
            if kind == 1:
                max_lane_period = max(max_lane_period, st * kk)

        kdims_dim = tuple(dims[i][2] for i in pos_above)
        ny_dims_dim = tuple(sizes[ix] for ix in dim_ny)
        Kg = prod(kdims_dim) * prod(kk for _, _, kk in roll_axes)
        Ng = prod(ny_dims_dim) * prod(kk for _, _, kk in roll_axes)
        if Kg * Ng > MAX_GATE_COMBOS:
            return None, "too many gate combos", None
        first = pos_above[0] if pos_above else (
            len(dims) if anchor_end else 0
        )
        # coefficient-field mode: the roll part runs as sum-of-rolls
        # weighted by precomputed coefficient lane/row fields -
        # prod(2k-1) sweeps instead of Nroll^2, and no masks. Budgeted
        # by the VMEM the fields occupy.
        mode = "mix"
        if roll_axes:
            import itertools

            r2p = max(
                [st * kk for kind, st, kk in roll_axes if kind == 0]
                or [1]
            )
            pl = max(
                [st * kk for kind, st, kk in roll_axes if kind == 1]
                or [1]
            )
            shifts = tuple(
                itertools.product(
                    *[range(-(kk - 1), kk) for _, _, kk in roll_axes]
                )
            )
            nfields = (
                prod(kdims_dim or (1,))
                * prod(ny_dims_dim or (1,))
                * len(shifts)
            )
            fbytes = 2 * nfields * r2p * pl * 4
            if (
                fbytes <= FIELD_GATE_BUDGET
                and field_bytes_total + fbytes <= FIELD_CHAIN_BUDGET
            ):
                mode = "field"
                field_bytes_total += fbytes
        if mode == "field":
            gate_specs.append(
                ("field", tuple(pos_above), kdims_dim, ny_dims_dim,
                 first, roll_axes, shifts, r2p, pl)
            )
        else:
            gate_specs.append(
                ("mix", tuple(pos_above), kdims_dim, ny_dims_dim,
                 first, roll_axes)
            )
        c_orders.append(
            (
                tuple(dims[i][1] for i in pos_above)
                + tuple(roll_list),
                dim_ny + tuple(pair[cx] for cx in roll_list),
            )
        )

        # substitute dims (above region)
        if pos_above:
            new_dims = []
            for i, d in enumerate(dims):
                if i == first:
                    new_dims.extend(
                        ("leg", ix, sizes[ix]) for ix in dim_ny
                    )
                elif i in pos_above:
                    continue
                else:
                    new_dims.append(d)
            dims = new_dims
        elif anchor_end:
            dims = dims + [
                ("leg", ix, sizes[ix]) for ix in dim_ny
            ]
        # rename roll-region axes
        if roll_list:
            r2names = [pair.get(nm, nm) for nm in r2names]
            cnames = [pair.get(nm, nm) for nm in cnames]

        # evolving output leg order: roll axes rename in place; dim-c
        # legs are removed with dim_ny inserted at the first's position
        order = [pair.get(ix, ix) for ix in order]
        if above_hit:
            fpos = min(order.index(ix) for ix in above_hit)
            order = (
                [ix for ix in order[:fpos] if ix not in above_hit]
                + list(dim_ny)
                + [ix for ix in order[fpos:] if ix not in above_hit]
            )
        elif anchor_end and dim_ny:
            fpos = order.index(r2names[0])
            order = order[:fpos] + list(dim_ny) + order[fpos:]

    out_dims = dims

    if (
        len(in_dims) + 3 > MAX_VIEW_RANK
        or len(out_dims) + 3 > MAX_VIEW_RANK
    ):
        return None, "view rank too high", None

    def legs_prod(dd):
        return prod([d[2] for d in dd if d[0] == "leg"] or [1])

    gmax = max(legs_prod(in_dims), legs_prod(out_dims))
    if gmax > MAX_GATE_DIM_PROD:
        return None, "gate dim product too large", None

    # ---- tiling --------------------------------------------------------
    def blocks_bytes(cb):
        bi = 2 * prod(
            [1 if d[0] == "seg" else d[2] for d in in_dims] or [1]
        ) * r2 * cb * 4
        bo = 2 * prod(
            [1 if d[0] == "seg" else d[2] for d in out_dims] or [1]
        ) * r2 * cb * 4
        return bi + bo

    c_blk = min(c_dim, max(2048, max_lane_period))
    while (
        blocks_bytes(c_blk) > VMEM_TILE_BUDGET
        and c_blk // 2 >= max(128, max_lane_period)
        and c_dim % (c_blk // 2) == 0
    ):
        c_blk //= 2
    if blocks_bytes(c_blk) > VMEM_TILE_BUDGET:
        return None, "tile exceeds VMEM budget", None
    if c_blk % max_lane_period or c_dim % c_blk:
        return None, "C not tileable by lane period", None

    # field-gate fields are materialized at full (r2, c_blk) tile size
    # outside the kernel (in-kernel tiling from the small period shape
    # costs thousands of lane concats); now that c_blk is known, demote
    # any gate whose full-size fields would blow the VMEM budget
    fb_total = 0
    for i, g in enumerate(gate_specs):
        if g[0] != "field":
            continue
        nfields = (
            prod(g[2] or (1,)) * prod(g[3] or (1,)) * len(g[6])
        )
        fbytes = 2 * nfields * r2 * c_blk * 4
        if (
            fbytes > FIELD_GATE_BUDGET
            or fb_total + fbytes > FIELD_CHAIN_BUDGET
        ):
            gate_specs[i] = ("mix",) + g[1:6]
        else:
            fb_total += fbytes

    spec = ChainSpec()
    spec._key = None
    spec.in_view = (
        (2,)
        + tuple(d[1] if d[0] == "seg" else d[2] for d in in_dims)
        + (r2, c_dim)
    )
    spec.out_view = (
        (2,)
        + tuple(d[1] if d[0] == "seg" else d[2] for d in out_dims)
        + (r2, c_dim)
    )

    in_segs = [i for i, d in enumerate(in_dims) if d[0] == "seg"]
    out_segs = [i for i, d in enumerate(out_dims) if d[0] == "seg"]
    if [in_dims[i][1] for i in in_segs] != [
        out_dims[i][1] for i in out_segs
    ]:
        return None, "segment mismatch", None

    spec.seg_sizes = tuple(in_dims[i][1] for i in in_segs)
    spec.in_seg_axes = tuple(i + 1 for i in in_segs)
    spec.out_seg_axes = tuple(i + 1 for i in out_segs)
    spec.r2 = r2
    spec.c_dim = c_dim
    spec.c_blk = c_blk
    spec.gates = tuple(gate_specs)
    spec.grid = (max(1, prod(spec.seg_sizes)), c_dim // c_blk)

    def block_of(dd):
        blk = [2]
        for d in dd:
            blk.append(1 if d[0] == "seg" else d[2])
        blk.extend((r2, c_blk))
        return tuple(blk)

    spec.in_block = block_of(in_dims)
    spec.out_block = block_of(out_dims)

    return spec, tuple(order), tuple(c_orders)


def _unravel(s, sizes):
    coords = []
    for sz in reversed(sizes):
        coords.append(s % sz)
        s = s // sz
    return tuple(reversed(coords))


@functools.lru_cache(maxsize=1024)
def _field_plan(gate):
    """Static per-gate field plan for a ``"field"`` gate spec.

    Returns ``(offsets, idx, valid)``:

    - ``offsets[si] = (dr, dc)`` roll amounts per shift vector, in the
      kernel's ``get_roll`` convention (``out[i] = x[i - d]``);
    - ``idx``: int32 ``(Kdim, Ndim, S, r2p, pl)`` indices into the
      flattened realigned ``(K, N)`` gate matrix;
    - ``valid``: bool, same shape - False where the shifted axis value
      leaves the axis (the coefficient is zero there, which also kills
      the circular-roll wrap-around artifacts).
    """
    (_, pos, kdims_dim, ny_dims_dim, first, roll_axes, shifts, r2p,
     pl) = gate
    roll_kdims = tuple(kk for _, _, kk in roll_axes)
    nroll = prod(roll_kdims) if roll_kdims else 1
    kdim = prod(kdims_dim or (1,))
    ndim = prod(ny_dims_dim or (1,))
    ntot = ndim * nroll
    S = len(shifts)

    r = np.arange(r2p).reshape(-1, 1)
    c = np.arange(pl).reshape(1, -1)
    nvs = []
    for kind, st, kk in roll_axes:
        base = r if kind == 0 else c
        nvs.append((base // st) % kk)

    offsets = []
    idx = np.zeros((kdim, ndim, S, r2p, pl), np.int32)
    valid = np.zeros((kdim, ndim, S, r2p, pl), bool)
    for si, d in enumerate(shifts):
        dr = dc = 0
        ok = np.ones((r2p, pl), bool)
        kvs = []
        for (kind, st, kk), da, nv in zip(roll_axes, d, nvs):
            kv = nv + da
            ok &= (kv >= 0) & (kv < kk)
            kvs.append(np.clip(kv, 0, kk - 1))
            if kind == 0:
                dr -= da * st
            else:
                dc -= da * st
        offsets.append((dr, dc))
        krflat = np.zeros((r2p, pl), np.int64)
        nrflat = np.zeros((r2p, pl), np.int64)
        for kk, kv, nv in zip(roll_kdims, kvs, nvs):
            krflat = krflat * kk + kv
            nrflat = nrflat * kk + nv
        for kd in range(kdim):
            kflat = kd * nroll + krflat
            for nd in range(ndim):
                nflat = nd * nroll + nrflat
                idx[kd, nd, si] = kflat * ntot + nflat
                valid[kd, nd, si] = ok
    return tuple(offsets), idx, valid


@functools.lru_cache(maxsize=512)
def _build_pallas_fn(key, dtype_name, interpret):
    """Build the pallas_call callable for a spec key."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (in_view, out_view, in_block, out_block, seg_sizes, in_seg_axes,
     out_seg_axes, r2, c_dim, c_blk, gates, grid) = key
    dtype = jnp.dtype(dtype_name)
    ngates = len(gates)

    def _roll(x, d, axis):
        # circular shift: out[i] = x[i - d] along `axis`
        d = d % x.shape[axis]
        if d == 0:
            return x
        if interpret:
            return jnp.roll(x, d, axis=axis)
        if axis == x.ndim - 1:
            return pltpu.roll(x, d, axis=axis)
        # second-minor: static slice + concat (sublane shift)
        lo = jax.lax.slice_in_dim(
            x, x.shape[axis] - d, x.shape[axis], axis=axis
        )
        hi = jax.lax.slice_in_dim(x, 0, x.shape[axis] - d, axis=axis)
        return jnp.concatenate([lo, hi], axis=axis)

    field_gate_ids = [i for i, g in enumerate(gates) if g[0] == "field"]
    nfield = len(field_gate_ids)
    field_slot = {gi: k for k, gi in enumerate(field_gate_ids)}

    def kernel(*refs):
        y_refs = refs[:ngates]
        f_refs = refs[ngates:ngates + nfield]
        x_ref = refs[ngates + nfield]
        o_ref = refs[ngates + nfield + 1]
        # sub-32-bit storage (bf16 planes) upcasts for compute:
        # pltpu.roll only supports 32-bit data, and the MACs accumulate
        # better; f32/f64 storage computes at its own precision
        cdt = jnp.float32 if dtype.itemsize < 4 else dtype
        t = x_ref[:].astype(cdt)
        tr, ti = t[0], t[1]
        for gi, g in enumerate(gates):
            yv = y_refs[gi][:].astype(cdt)
            yr, yi = yv[0], yv[1]          # (K, N)
            mode = g[0]
            _, pos, kdims_dim, ny_dims_dim, first, roll_axes = g[:6]
            roll_kdims = tuple(kk for _, _, kk in roll_axes)
            Nroll = prod(roll_kdims) if roll_kdims else 1
            Ndim = prod(ny_dims_dim) if ny_dims_dim else 1

            # slice out each dim-axis combination once
            xslices = []
            for kd in np.ndindex(*kdims_dim):
                idx = [slice(None)] * tr.ndim
                for p_ax, kv in zip(pos, kd):
                    idx[p_ax] = kv
                idx = tuple(idx)
                xslices.append((tr[idx], ti[idx]))

            if roll_axes:
                shp = xslices[0][0].shape
                row_iota = jax.lax.broadcasted_iota(
                    jnp.int32, shp, len(shp) - 2
                )
                lane_iota = jax.lax.broadcasted_iota(
                    jnp.int32, shp, len(shp) - 1
                )
                rolled = {}

                def get_roll(sl, dr, dc):
                    kk = (sl, dr, dc)
                    if kk not in rolled:
                        xr, xi = xslices[sl]
                        if dr:
                            xr = _roll(xr, dr, xr.ndim - 2)
                            xi = _roll(xi, dr, xi.ndim - 2)
                        if dc:
                            xr = _roll(xr, dc, xr.ndim - 1)
                            xi = _roll(xi, dc, xi.ndim - 1)
                        rolled[kk] = (xr, xi)
                    return rolled[kk]

            if mode == "field":
                # sum-of-rolls with precomputed coefficient fields:
                # prod(2k-1) sweeps, no masks (invalid shifts carry
                # zero coefficients, which also nulls circular wrap)
                offsets, _, _ = _field_plan(g)
                S = len(offsets)
                # fields arrive pre-tiled to the full (r2, c_blk) tile
                fv = f_refs[field_slot[gi]][:].astype(cdt)

                def fld(plane, fidx):
                    return fv[plane, fidx]

                outs_r, outs_i = [], []
                for ndflat in range(Ndim):
                    ar = ai = None
                    for kdflat, (xr, xi) in enumerate(xslices):
                        for si, (dr, dc) in enumerate(offsets):
                            if dr == 0 and dc == 0:
                                xr2, xi2 = xr, xi
                            else:
                                xr2, xi2 = get_roll(kdflat, dr, dc)
                            fidx = (kdflat * Ndim + ndflat) * S + si
                            fr = fld(0, fidx)
                            fi_ = fld(1, fidx)
                            pr = fr * xr2 - fi_ * xi2
                            pi = fr * xi2 + fi_ * xr2
                            ar = pr if ar is None else ar + pr
                            ai = pi if ai is None else ai + pi
                    outs_r.append(ar)
                    outs_i.append(ai)
                if pos or ny_dims_dim:
                    tr = jnp.stack(outs_r, axis=first)
                    ti = jnp.stack(outs_i, axis=first)
                    if len(ny_dims_dim) != 1:
                        shape = (
                            tr.shape[:first] + tuple(ny_dims_dim)
                            + tr.shape[first + 1:]
                        )
                        tr = tr.reshape(shape)
                        ti = ti.reshape(shape)
                else:
                    tr, ti = outs_r[0], outs_i[0]
                continue

            outs_r, outs_i = [], []
            for ndflat, nd in enumerate(np.ndindex(*ny_dims_dim)):
                if not roll_axes:
                    ar = ai = None
                    for kdflat, (xr, xi) in enumerate(xslices):
                        cr = yr[kdflat, ndflat]
                        ci = yi[kdflat, ndflat]
                        pr = cr * xr - ci * xi
                        pi = cr * xi + ci * xr
                        ar = pr if ar is None else ar + pr
                        ai = pi if ai is None else ai + pi
                    outs_r.append(ar)
                    outs_i.append(ai)
                    continue
                accr = acci = None
                for nr in np.ndindex(*roll_kdims):
                    nrflat = int(np.ravel_multi_index(nr, roll_kdims))
                    nflat = ndflat * Nroll + nrflat
                    mask = None
                    for (kind, st, kk), nv in zip(roll_axes, nr):
                        iota = row_iota if kind == 0 else lane_iota
                        m = ((iota // st) % kk) == nv
                        mask = (
                            m
                            if mask is None
                            else jnp.logical_and(mask, m)
                        )
                    ar = ai = None
                    for kdflat in range(len(xslices)):
                        for kr in np.ndindex(*roll_kdims):
                            krflat = int(
                                np.ravel_multi_index(kr, roll_kdims)
                            )
                            kflat = kdflat * Nroll + krflat
                            dr = dc = 0
                            for (kind, st, _), kv, nv in zip(
                                roll_axes, kr, nr
                            ):
                                if kind == 0:
                                    dr += (nv - kv) * st
                                else:
                                    dc += (nv - kv) * st
                            xr, xi = get_roll(kdflat, dr, dc)
                            cr = yr[kflat, nflat]
                            ci = yi[kflat, nflat]
                            pr = cr * xr - ci * xi
                            pi = cr * xi + ci * xr
                            ar = pr if ar is None else ar + pr
                            ai = pi if ai is None else ai + pi
                    mr = jnp.where(mask, ar, 0.0)
                    mi = jnp.where(mask, ai, 0.0)
                    accr = mr if accr is None else accr + mr
                    acci = mi if acci is None else acci + mi
                outs_r.append(accr)
                outs_i.append(acci)

            if pos or ny_dims_dim:
                tr = jnp.stack(outs_r, axis=first)
                ti = jnp.stack(outs_i, axis=first)
                if len(ny_dims_dim) != 1:
                    shape = (
                        tr.shape[:first] + tuple(ny_dims_dim)
                        + tr.shape[first + 1:]
                    )
                    tr = tr.reshape(shape)
                    ti = ti.reshape(shape)
            else:
                tr, ti = outs_r[0], outs_i[0]
        o_ref[:] = jnp.stack([tr, ti]).astype(o_ref.dtype)

    nseg = len(seg_sizes)

    def make_index(view_len, seg_axes):
        def index(s, c):
            coords = _unravel(s, seg_sizes) if nseg else ()
            idx = [0] * view_len
            for ax, cv in zip(seg_axes, coords):
                idx[ax] = cv
            idx[-1] = c
            return tuple(idx)

        return index

    y_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM)
        for _ in range(ngates + nfield)
    ]

    def fn(x, ys, fields):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_view, dtype),
            grid=grid,
            in_specs=y_specs
            + [
                pl.BlockSpec(
                    in_block,
                    make_index(len(in_view), in_seg_axes),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                out_block,
                make_index(len(out_view), out_seg_axes),
                memory_space=pltpu.VMEM,
            ),
            compiler_params=pltpu.CompilerParams(
                # both grid dims write disjoint output blocks, so
                # "parallel" is semantically valid; it lets Mosaic
                # reorder/pipeline grid steps. CTG_GRID_SEMANTICS
                # selects for A/B measurement on real hardware.
                dimension_semantics=(_GRID_SEM, _GRID_SEM),
            ),
            interpret=interpret,
        )(*ys, *fields, x)

    return fn


def run_chain(spec, x_flat, ys, interpret=None):
    """Apply the fused chain to plane-major flat ``x_flat``.

    ``ys``: list of (2, K, N) plane arrays (already realigned so that K
    enumerates the gate's contracted axes in kernel order).
    Returns the plane-major flat result.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dtype = x_flat.dtype
    fn = _build_pallas_fn(spec.key(), jnp.dtype(dtype).name, interpret)
    x = x_flat.reshape(spec.in_view)
    ys = [y.astype(dtype) for y in ys]
    # gather the coefficient fields for "field"-mode gates from their
    # realigned (2, K, N) matrices (XLA-side; tiny)
    fields = []
    for gi, g in enumerate(spec.gates):
        if g[0] != "field":
            continue
        _, idx, valid = _field_plan(g)
        nf = idx.shape[0] * idx.shape[1] * idx.shape[2]
        r2p, pl = idx.shape[3], idx.shape[4]
        idxf = jnp.asarray(idx.reshape(nf, r2p, pl))
        vf = jnp.asarray(valid.reshape(nf, r2p, pl))
        yf = ys[gi].reshape(2, -1)
        f = jnp.where(vf[None], yf[:, idxf], jnp.zeros((), dtype))
        # pre-tile to the full kernel tile (XLA-side; read once)
        f = jnp.tile(f, (1, 1, spec.r2 // r2p, spec.c_blk // pl))
        fields.append(f)
    out = fn(x, ys, fields)
    out = out.reshape(-1)
    if not interpret:
        # stop XLA from "scoped"-promoting the kernel output into VMEM
        # (inside scan bodies it may try to stack-allocate the whole
        # array in VMEM and blow the 16MB scoped limit)
        out = jax.lax.optimization_barrier(out)
    return out
