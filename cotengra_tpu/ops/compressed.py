"""Compressed (approximate, chi-capped) contraction EXECUTION.

The reference library only *plans* compressed contractions and delegates
execution to quimb (``core.py:4356-4362``). Here we execute them natively:
follow the tree in surface order; after each pairwise contraction, any
multibond to a neighboring tensor whose combined dimension exceeds ``chi``
is truncated with a QR+SVD compression:

    T_a --(D>chi)-- T_b
    T_a = Q_a R_a ;  T_b = Q_b R_b          (QR onto the bond)
    U s V = SVD(R_a @ R_b^T), keep chi      (truncate the core)
    T_a <- Q_a U sqrt(s) ; T_b <- Q_b V sqrt(s)

All dense linear algebra runs through jax (QR/SVD on device); each
distinct shape signature jits once. Because shapes change dynamically with
truncation, the driver loop is host-side - the same execution model quimb
uses, but dispatching XLA ops.
"""

import functools

import jax
import jax.numpy as jnp

from .pairwise import apply_pairwise, apply_single


@functools.partial(jax.jit, static_argnames=("chi",))
def _compress_pair_core(A, B, chi):
    """A: (la, D), B: (lb, D) sharing bond D>chi -> (la, chi), (lb, chi)."""
    Qa, Ra = jnp.linalg.qr(A)          # (la, k) (k, D)
    Qb, Rb = jnp.linalg.qr(B)          # (lb, k') (k', D)
    M = Ra @ Rb.T                      # (k, k')
    U, s, Vh = jnp.linalg.svd(M, full_matrices=False)
    U = U[:, :chi]
    s = s[:chi]
    Vh = Vh[:chi, :]
    sq = jnp.sqrt(s)
    newA = Qa @ (U * sq[None, :])      # (la, chi)
    newB = Qb @ (Vh.T * sq[None, :])   # (lb, chi)
    return newA, newB


def _move_bond_last(x, legs, bond_group):
    """Transpose/reshape so the bond-group axes are fused last.

    Returns (matrix, other_legs, other_shape)."""
    other = [ix for ix in legs if ix not in bond_group]
    perm = [legs.index(ix) for ix in other] + [
        legs.index(ix) for ix in bond_group
    ]
    xt = jnp.transpose(x, perm)
    other_shape = xt.shape[: len(other)]
    d_other = 1
    for d in other_shape:
        d_other *= d
    d_bond = 1
    for d in xt.shape[len(other):]:
        d_bond *= d
    return xt.reshape(d_other, d_bond), tuple(other), other_shape


def compress_bond(Ta, legs_a, Tb, legs_b, bond_group, chi, new_ix):
    """Compress the shared ``bond_group`` indices between two tensors to a
    single new index of size <= chi. Returns updated
    (Ta, legs_a, Tb, legs_b)."""
    Am, other_a, shape_a = _move_bond_last(Ta, list(legs_a), bond_group)
    Bm, other_b, shape_b = _move_bond_last(Tb, list(legs_b), bond_group)
    k = min(Am.shape[0], Bm.shape[0], Am.shape[1], chi)
    newA, newB = _compress_pair_core(Am, Bm, int(k))
    Ta2 = newA.reshape(*shape_a, newA.shape[-1])
    Tb2 = newB.reshape(*shape_b, newB.shape[-1])
    return Ta2, (*other_a, new_ix), Tb2, (*other_b, new_ix)


def contract_compressed(
    tree,
    arrays,
    chi=None,
    order="surface_order",
    compress_late=None,
    strip_exponent=False,
    progbar=False,
):
    """Execute ``tree`` approximately with maximum bond dimension ``chi``.

    Parameters
    ----------
    tree : ContractionTree or ContractionTreeCompressed
    arrays : sequence[array]
    chi : int, optional
        Maximum bond dimension (default: the tree's default chi).
    order : "surface_order" or callable
    compress_late : bool, optional
        Compress the inputs of each contraction just before contracting
        (True) or the new tensor just after (False, default).

    Returns
    -------
    array
        The (approximate) contraction result, transposed to the tree's
        output index order.
    """
    if chi is None or chi == "auto":
        chi = tree.get_default_chi()
    if compress_late is None:
        compress_late = getattr(
            tree, "get_default_compress_late", lambda: False
        )()

    # live tensors: node -> (array, legs tuple)
    live = {}
    for i, leaf in enumerate(tree.gen_leaves()):
        x = jnp.asarray(arrays[i])
        raw = tuple(tree.inputs[i])
        eff = tuple(dict.fromkeys(raw))
        if raw != eff:
            x = apply_single(x, raw, eff)
        live[leaf] = (x, eff)

    fresh = map("__chi{}".format, range(10**6)).__next__

    def neighbors_of(node):
        """Other live nodes sharing at least one index with ``node``."""
        _, legs = live[node]
        legset = set(legs)
        for other, (_, olegs) in live.items():
            if other != node and legset.intersection(olegs):
                yield other

    def compress_with_neighbors(node):
        for other in list(neighbors_of(node)):
            x, legs = live[node]
            y, olegs = live[other]
            # never compress output indices, and only bonds exclusively
            # between these two tensors (not hyperedges on 3+ tensors)
            holders = {}
            for nd, (_, lg) in live.items():
                for ix in lg:
                    holders[ix] = holders.get(ix, 0) + 1
            shared = tuple(
                ix
                for ix in legs
                if ix in set(olegs)
                and ix not in out_set
                and holders.get(ix, 0) == 2
            )
            d = 1
            for ix in shared:
                ax = legs.index(ix)
                d *= x.shape[ax]
            if d > chi and shared:
                new_ix = fresh()
                x2, l2, y2, o2 = compress_bond(
                    x, legs, y, olegs, shared, chi, new_ix
                )
                live[node] = (x2, l2)
                live[other] = (y2, o2)

    out_set = set(tree.output)
    exponent = jnp.zeros((), jnp.float32)

    for p, l, r in tree.traverse(order):
        if compress_late:
            compress_with_neighbors(l)
            compress_with_neighbors(r)
        (x, l_legs) = live.pop(l)
        (y, r_legs) = live.pop(r)
        # kept legs = indices that still appear on other live tensors or
        # in the output; everything else is contracted/summed here
        other_inds = set(out_set)
        for _, (_, olegs) in live.items():
            other_inds.update(olegs)
        p_legs = tuple(
            ix
            for ix in dict.fromkeys(l_legs + r_legs)
            if ix in other_inds
        )
        z = apply_pairwise(x, y, l_legs, r_legs, p_legs)
        if strip_exponent:
            absmax = jnp.max(jnp.abs(z))
            scale = jnp.where(absmax == 0, jnp.ones_like(absmax), absmax)
            z = z / scale
            exponent = exponent + jnp.log10(scale).astype(jnp.float32)
        live[p] = (z, p_legs)
        if not compress_late:
            compress_with_neighbors(p)

    (result, legs) = live.popitem()[1]
    # transpose to output order (output indices always survive)
    target = tuple(ix for ix in tree.output if ix in legs)
    if legs != target and target:
        perm = tuple(legs.index(ix) for ix in target)
        result = jnp.transpose(result, perm)
    if strip_exponent:
        return result, exponent
    return result
