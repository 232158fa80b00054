"""Multi-pass tile-friendly block-transpose synthesis for TPU.

Problem: a block transpose (``flat -> transpose(view) -> flat``) is
lowered by XLA as ONE materialized copy whose input view and transposed
output keep their logical multi-dim shapes. TPU buffers tile-pad their
two minor dims to (sublane, 128), so whenever the view's trailing dim
(or the permuted order's trailing dim) is tiny, the copy materializes
at up to 64x padding - measured blowups include 16 GB for a 256 MB
slice operand (the round-4 combo-plan compile OOM) and 4.6 GB
scattered-dot temps on the official m=10 plan (scratch/probe_scatter).

The existing ``_split_block_factors`` machinery makes a single copy
tile-exact by 128-splitting the trailing dims - but only when they are
large. When the STORED axis order ends in small dims, no single copy
can be tile-exact; this module decomposes the permutation into a short
sequence of copies, each of which keeps wide trailing units on both
sides:

    legality of one pass (one fused ``lax.reshape(dimensions=)``) at
    alignment tier ``t`` (t in {128, 64, 32}):
      - the input view's trailing dim is % t == 0 and >= t
      - the permuted order's trailing dim likewise

At tier 128 every pass is lane-exact (>= 1024 additionally gets
128-split by the apply path so sublanes are exact too); tier t < 128
bounds the lane padding of a pass by 128/t. Tiers are tried from
exact down, and the cheapest total plan (sum of per-pass padded
read+write traffic, ``passes_cost``) wins.

Within a pass, view dims are formed by merging ADJACENT atoms of the
current order (contiguous in storage, so the merge is free) and any
permutation of the merged groups is one copy. Atoms are pre-split so
every 128-divisible dim >= 256 yields exactly-128 pieces - splits are
free (adjacent pieces re-merge into view dims automatically) and only
add scheme flexibility.

Constructive schemes, tried per tier in increasing pass count. Write
``U`` for the minimal legal suffix unit of the current (stored) order
and ``Z`` for the minimal legal suffix unit of the target order. Two
moves are legal by construction:

  * current -> (anything) + U   with U kept glued at the tail
    (the input's trailing group then contains U; the output's
    trailing group is the U run), and
  * (anything) + Z -> target    with Z glued in target order
    (both trailing groups then contain Z).

  1 pass : the direct copy is already legal (big trailing units).
  3 pass : U, Z disjoint -  rest+Z+U  ->  rest+U+Z  ->  target.
  3 pass : anchor scheme - legal single atoms b (outside U) and a
           (outside Z; a == b allowed) act as movable tail anchors:
           M+U+b  ->  (target minus a)+a  ->  target.
  5 pass : juggle a spare working unit W built from atoms outside U
           and Z:  A+W+U -> A+U+W (W takes the tail) -> B+Z+W (U
           dissolves, Z assembles) -> C+Z (W parks, Z takes the
           tail) -> target.  Exists whenever the free pool can form
           a legal unit; passes that turn out to be no-ops (order
           already equal) are skipped.

Every synthesized pass is validated by construction (its legality is
checked before being recorded; the final order must equal the target)
- on any failure the caller keeps the single-copy fallback, so
synthesis can never change semantics. Genuinely thin shapes (e.g.
``(1024, 2) -> (2, 1024)``: no legal pass exists at any tier because
every reachable order ends in the size-2 atom's unit) simply return
None.

Reference parity note: the reference (cotengra) delegates contraction
execution to opt_einsum/backends and has no analog - this is TPU-only
infrastructure (cf. SURVEY.md 2.6/2.9 execution-engine obligations).
"""

import functools

TIERS = (128, 64, 32)


def _prod(xs):
    out = 1
    for x in xs:
        out *= x
    return out


def _ok(p, tier=128):
    """Legal trailing-unit product at an alignment tier.

    tier=128 is lane-exact (units >= 1024 additionally get 128-split
    by the apply path so the sublane dim is >= 8; for units in
    [128, 1024) the minor dim is the unit itself and XLA adapts the
    sublane tile - T(1..8, 128) all observed on chip). tier t < 128
    bounds the lane padding of the pass by 128/t."""
    return p >= tier and p % tier == 0


def padf(p):
    """Lane padding factor of a buffer whose minor dim is ``p``."""
    if p >= 128 and p % 128 == 0:
        return 1.0
    return (-(-p // 128) * 128) / p


def passes_cost(passes):
    """Estimated relative traffic of a pass list: each pass reads its
    input view and writes the transposed copy, both padded by their
    trailing dim's lane factor."""
    return sum(
        padf(dims[-1]) + padf(dims[perm[-1]]) for dims, perm in passes
    )


def single_pass_pad_factor(block_dims, perm):
    """Worst minor-dim padding factor of the SINGLE-copy lowering.

    Conservative estimate used to decide when multi-pass synthesis is
    worth it: the fused copy materializes the source view (trailing
    stored dim) and the transposed copy (trailing permuted dim); a
    trailing dim d < 128 lane-pads by ~128/d (chip-measured 32-64x for
    d in {2,4}, 8x for 16; dims >= 1024 are 128-split and exact).
    """
    return max(padf(block_dims[-1]), padf(block_dims[perm[-1]]))


def _min_ok_suffix(order, sizes, tier):
    """Smallest k such that the last k atoms of ``order`` form a legal
    trailing unit at ``tier``; None if no suffix qualifies."""
    p = 1
    for k in range(1, len(order) + 1):
        p *= sizes[order[-k]]
        if _ok(p, tier):
            return k
    return None


class _PassBuilder:
    """Accumulates passes over an evolving atom order.

    Each recorded pass is one fused transpose copy: the atoms of the
    current order are cut into maximal runs that are contiguous
    ascending in the requested output order; those runs (view dims) are
    permuted. Legality - the input's trailing group and the output's
    trailing group must both be ``_ok`` at the builder's tier - is
    checked before recording; an illegal request leaves the state
    unchanged and returns False. Equal-order requests are free no-ops.
    """

    def __init__(self, sizes, current, target, tier):
        self.sizes = sizes
        self.cur = list(current)
        self.target = list(target)
        self.tier = tier
        self.passes = []  # list of (group_dims, perm) per pass

    def apply(self, out_order):
        cur = self.cur
        n = len(cur)
        out_order = list(out_order)
        if out_order == cur:
            return True
        pos_out = {a: i for i, a in enumerate(out_order)}
        groups = []
        s = 0
        for i in range(1, n + 1):
            if i == n or pos_out[cur[i]] != pos_out[cur[i - 1]] + 1:
                groups.append((s, i))
                s = i
        order = sorted(
            range(len(groups)),
            key=lambda g: pos_out[cur[groups[g][0]]],
        )
        in_last = groups[-1]
        out_last = groups[order[-1]]
        pin = _prod(self.sizes[a] for a in cur[in_last[0]:in_last[1]])
        pout = _prod(
            self.sizes[a] for a in cur[out_last[0]:out_last[1]]
        )
        if not (_ok(pin, self.tier) and _ok(pout, self.tier)):
            return False
        dims = tuple(
            _prod(self.sizes[a] for a in cur[s:e]) for (s, e) in groups
        )
        self.passes.append((dims, tuple(order)))
        self.cur = out_order
        return True

    def done(self):
        return self.cur == self.target


def _presplit(block_dims, perm):
    """Recursively split every 128-divisible dim >= 256 into
    exactly-128 atoms (plus one <256 head piece).

    Free (adjacent pieces re-merge into view dims) and guarantees
    anchor atoms for the schemes. Returns (sizes, current, target)
    over atom ids."""
    sizes = []
    pieces = []  # per original dim: list of atom ids
    for d in block_dims:
        ids = []
        parts = []
        while d >= 256 and d % 128 == 0:
            parts.append(128)
            d //= 128
        parts.append(d)
        for p in reversed(parts):
            ids.append(len(sizes))
            sizes.append(p)
        pieces.append(ids)
    current = [a for ids in pieces for a in ids]
    target = [a for j in perm for a in pieces[j]]
    return sizes, current, target


def _pick_w(free, sizes, tier):
    """A small legal working unit from the free atom pool, or None.

    Greedy descending accumulation (exact for power-of-two sizes,
    where legality is just product >= tier); falls back to the whole
    pool."""
    pool = sorted(free, key=lambda a: -sizes[a])
    picked = []
    p = 1
    for a in pool:
        picked.append(a)
        p *= sizes[a]
        if _ok(p, tier):
            return picked
    return picked if picked and _ok(p, tier) else None


def _synthesize_tier(sizes, current, target, tier):
    b = _PassBuilder(sizes, current, target, tier)
    if b.apply(target):  # 1 pass (or identity)
        return b.passes

    ku = _min_ok_suffix(current, sizes, tier)
    kz = _min_ok_suffix(target, sizes, tier)
    if ku is None or kz is None:
        return None
    U = current[-ku:]
    Z = target[-kz:]
    Uset, Zset = set(U), set(Z)
    tpos = {a: i for i, a in enumerate(target)}

    def tsort(atoms):
        return sorted(atoms, key=lambda a: tpos[a])

    if not (Uset & Zset):
        # 3 passes: rest+Z+U -> rest+U+Z -> target
        rest = tsort(set(current) - Uset - Zset)
        z = tsort(Zset)
        if (
            b.apply(rest + z + U)
            and b.apply(rest + U + z)
            and b.apply(target)
        ):
            return b.passes
        b = _PassBuilder(sizes, current, target, tier)

    # anchor scheme, 3 passes: with legal single atoms bb (not in U,
    # so U can stay glued while bb takes the tail) and aa (not in Z,
    # so Z stays glued in the penultimate order; aa == bb is fine):
    #   current -> M + U + bb        (in: U glued; out: the bb run)
    #   -> (target \ aa) + aa        (in: the bb run; out: the aa run
    #                                 - U dissolves, Z assembles free)
    #   -> target                    (in: the aa run; out: contains Z)
    anchors = [a for a in current if _ok(sizes[a], tier)]
    bb = next((a for a in anchors if a not in Uset), None)
    aa = next((a for a in anchors if a not in Zset), None)
    if bb is not None and aa is not None:
        M = tsort(set(current) - Uset - {bb})
        pen = [a for a in target if a != aa]
        if (
            b.apply(M + U + [bb])
            and b.apply(pen + [aa])
            and b.apply(target)
        ):
            return b.passes
        b = _PassBuilder(sizes, current, target, tier)

    # overlap: juggle a spare working unit W (disjoint from U and Z)
    free = [a for a in target if a not in Uset and a not in Zset]
    W = _pick_w(free, sizes, tier)
    if W is None:
        return None
    Wset = set(W)
    A = tsort(set(current) - Wset - Uset)
    B = tsort(set(current) - Zset - Wset)
    z = tsort(Zset)
    # park W (glued) at the slot of its first atom in target order
    C = []
    inserted = False
    for a in target:
        if a in Zset:
            continue
        if a in Wset:
            if not inserted:
                C.extend(W)
                inserted = True
            continue
        C.append(a)
    if (
        b.apply(A + W + U)
        and b.apply(A + U + W)
        and b.apply(B + z + W)
        and b.apply(C + z)
        and b.apply(target)
    ):
        return b.passes
    return None


def synthesize_passes(block_dims, perm):
    """Decompose a block transpose into tile-friendly passes.

    Parameters
    ----------
    block_dims : tuple[int]
        Sizes of the stored view's dims (storage order).
    perm : tuple[int]
        Output dim j of the transpose reads input dim ``perm[j]``.

    Returns
    -------
    passes : list[(dims, perm)] or None
        Each entry is a block plan applying one wide-trailing-unit
        copy; applying them in sequence equals the requested
        transpose. The cheapest plan across alignment tiers (by
        ``passes_cost``) is returned; None when no tier admits a
        decomposition (caller falls back to the single copy).
    """
    return _synthesize_cached(tuple(block_dims), tuple(perm))


@functools.lru_cache(maxsize=4096)
def _synthesize_cached(block_dims, perm):
    if list(perm) == list(range(len(block_dims))):
        return []
    sizes, current, target = _presplit(block_dims, perm)
    best = None
    best_cost = None
    for tier in TIERS:
        passes = _synthesize_tier(sizes, current, target, tier)
        if passes is None:
            continue
        cost = passes_cost(passes)
        if best is None or cost < best_cost:
            best, best_cost = passes, cost
    return best
