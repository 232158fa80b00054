"""The two primitive array operations of the execution engine.

- ``apply_single``: single-term einsum (diag / trace / sum / transpose),
  arising from leaf preprocessing.
- ``apply_pairwise``: pairwise contraction lowered directly to
  ``jax.lax.dot_general`` with batch/contract dimension numbers - the
  TPU-native replacement for the reference's transpose+reshape+BMM pipeline
  (``cotengra/contract.py:167-329``): the MXU consumes dot_general natively
  and XLA fuses any residual transposes.
"""

import functools

import jax
import jax.numpy as jnp

from ..utils.symbols import get_symbol


@functools.lru_cache(maxsize=2**14)
def _single_eq(in_legs, out_legs):
    symmap = {}
    for ix in in_legs:
        if ix not in symmap:
            symmap[ix] = get_symbol(len(symmap))
    lhs = "".join(symmap[ix] for ix in in_legs)
    rhs = "".join(symmap[ix] for ix in out_legs)
    return f"{lhs}->{rhs}"


def apply_single(x, in_legs, out_legs):
    """Apply a single-term operation: diagonals for repeated indices, sums
    over removed indices, and transposition into ``out_legs`` order.
    """
    return jnp.einsum(_single_eq(in_legs, out_legs), x)


@functools.lru_cache(maxsize=2**14)
def _pair_plan(l_legs, r_legs, out_legs):
    """Precompute dot_general dimension numbers and the output permutation
    for a pairwise contraction. Cached on the legs signature.

    Returns
    -------
    l_sum : tuple[int]   axes of x to pre-sum (defensive, usually empty)
    r_sum : tuple[int]   axes of y to pre-sum
    dimension_numbers : ((lc, rc), (lb, rb))
    perm : tuple[int] or None
        Permutation taking dot_general's output to ``out_legs`` order.
    """
    out_set = set(out_legs)
    l_set, r_set = set(l_legs), set(r_legs)
    shared = l_set & r_set

    # defensive: indices on one side only that aren't kept must be summed
    l_sum = tuple(
        i
        for i, ix in enumerate(l_legs)
        if ix not in shared and ix not in out_set
    )
    r_sum = tuple(
        i
        for i, ix in enumerate(r_legs)
        if ix not in shared and ix not in out_set
    )
    l_eff = tuple(
        ix for ix in l_legs if (ix in shared) or (ix in out_set)
    )
    r_eff = tuple(
        ix for ix in r_legs if (ix in shared) or (ix in out_set)
    )

    batch = tuple(ix for ix in l_eff if ix in shared and ix in out_set)
    contract = tuple(
        ix for ix in l_eff if ix in shared and ix not in out_set
    )
    lb = tuple(l_eff.index(ix) for ix in batch)
    rb = tuple(r_eff.index(ix) for ix in batch)
    lc = tuple(l_eff.index(ix) for ix in contract)
    rc = tuple(r_eff.index(ix) for ix in contract)

    l_free = tuple(
        ix for ix in l_eff if ix not in shared
    )
    r_free = tuple(
        ix for ix in r_eff if ix not in shared
    )
    computed = batch + l_free + r_free
    if computed == tuple(out_legs):
        perm = None
    else:
        perm = tuple(computed.index(ix) for ix in out_legs)

    return l_sum, r_sum, ((lc, rc), (lb, rb)), perm


# above this many total dims, lower to an explicit 3-D batched matmul:
# high-rank dot_generals (e.g. 25 size-2 axes on circuit TNs) explode TPU
# compile time and get poor layouts, while reshape(B, M, K) @ (B, K, N)
# is the shape the MXU pipeline is built for
MAX_DIRECT_NDIM = 10


@functools.lru_cache(maxsize=2**14)
def _bmm_plan(l_legs, r_legs, out_legs):
    """Plan transposes/reshapes for the 3-D batched-matmul lowering."""
    out_set = set(out_legs)
    l_set, r_set = set(l_legs), set(r_legs)
    shared = l_set & r_set
    batch = tuple(ix for ix in l_legs if ix in shared and ix in out_set)
    contract = tuple(
        ix for ix in l_legs if ix in shared and ix not in out_set
    )
    l_free = tuple(
        ix for ix in l_legs if ix not in shared and ix in out_set
    )
    r_free = tuple(
        ix for ix in r_legs if ix not in shared and ix in out_set
    )
    l_perm = (
        tuple(l_legs.index(ix) for ix in batch)
        + tuple(l_legs.index(ix) for ix in l_free)
        + tuple(l_legs.index(ix) for ix in contract)
    )
    r_perm = (
        tuple(r_legs.index(ix) for ix in batch)
        + tuple(r_legs.index(ix) for ix in contract)
        + tuple(r_legs.index(ix) for ix in r_free)
    )
    computed = batch + l_free + r_free
    if computed == tuple(out_legs):
        out_perm = None
    else:
        out_perm = tuple(computed.index(ix) for ix in out_legs)
    return (
        batch, contract, l_free, r_free, l_perm, r_perm, out_perm,
    )


def _apply_pairwise_bmm(
    x, y, l_legs, r_legs, out_legs, precision, preferred_element_type
):
    (batch, contract, l_free, r_free, l_perm, r_perm, out_perm) = (
        _bmm_plan(tuple(l_legs), tuple(r_legs), tuple(out_legs))
    )
    nb, nc, nlf, nrf = (
        len(batch), len(contract), len(l_free), len(r_free),
    )
    xt = jnp.transpose(x, l_perm)
    yt = jnp.transpose(y, r_perm)
    bshape = xt.shape[:nb]
    lf_shape = xt.shape[nb:nb + nlf]
    rf_shape = yt.shape[nb + nc:]

    def _prod(s):
        p = 1
        for d in s:
            p *= d
        return p

    B, M, K, N = (
        _prod(bshape), _prod(lf_shape),
        _prod(xt.shape[nb + nlf:]), _prod(rf_shape),
    )
    # optimization barriers stop XLA fusing the high-rank
    # transpose/reshape into the matmul - that fusion makes the TPU
    # compiler take minutes (observed 209s -> 1.1s for one 22-dim step)
    x3 = jax.lax.optimization_barrier(xt.reshape(B, M, K))
    y3 = jax.lax.optimization_barrier(yt.reshape(B, K, N))
    out3 = jax.lax.dot_general(
        x3,
        y3,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=precision,
        preferred_element_type=preferred_element_type,
    )
    out3 = jax.lax.optimization_barrier(out3)
    out = out3.reshape(*bshape, *lf_shape, *rf_shape)
    if out_perm is not None:
        out = jnp.transpose(out, out_perm)
    return out


def apply_pairwise(
    x,
    y,
    l_legs,
    r_legs,
    out_legs,
    precision=None,
    preferred_element_type=None,
):
    """Contract two tensors: ``out_legs`` determines which shared indices
    are batch (kept) vs contracted (summed).

    Low-rank steps lower directly to ``dot_general`` with dimension
    numbers; high-rank steps (many small axes, as in bond-2 circuit TNs)
    are reshaped into a 3-D batched matmul first - the TPU compiler
    handles ~25-dimensional dot_generals catastrophically badly, while
    fused-axis matmuls are its native shape.
    """
    l_sum, r_sum, dnums, perm = _pair_plan(
        tuple(l_legs), tuple(r_legs), tuple(out_legs)
    )
    if l_sum:
        x = jnp.sum(x, axis=l_sum)
        l_legs = tuple(
            ix for i, ix in enumerate(l_legs) if i not in set(l_sum)
        )
    if r_sum:
        y = jnp.sum(y, axis=r_sum)
        r_legs = tuple(
            ix for i, ix in enumerate(r_legs) if i not in set(r_sum)
        )

    if max(x.ndim, y.ndim, len(out_legs)) > MAX_DIRECT_NDIM:
        return _apply_pairwise_bmm(
            x, y, l_legs, r_legs, out_legs, precision,
            preferred_element_type,
        )

    out = jax.lax.dot_general(
        x,
        y,
        dimension_numbers=dnums,
        precision=precision,
        preferred_element_type=preferred_element_type,
    )
    if perm is not None:
        out = jnp.transpose(out, perm)
    return out


# -- standalone array utilities ----------------------------------------------
# Public pairwise entry points independent of any tree, mirroring the
# reference's BMM-based `einsum`/`tensordot` array functions
# (/root/reference/cotengra/contract.py:414,521) - here lowered straight
# to dot_general (the TPU-native BMM).


def einsum(eq, *arrays):
    """Contract one or two arrays with an einsum equation, lowered to
    ``apply_single`` / ``apply_pairwise`` (dot_general). For more than
    two operands use :func:`cotengra_tpu.einsum`, which plans a full
    contraction tree.
    """
    lhs, rhs = eq.split("->") if "->" in eq else (eq, None)
    terms = lhs.split(",")
    if rhs is None:
        # implicit output: indices appearing exactly once, sorted
        from collections import Counter

        counts = Counter(ix for t in terms for ix in t)
        rhs = "".join(sorted(ix for ix, c in counts.items() if c == 1))
    if len(terms) == 1:
        return apply_single(arrays[0], tuple(terms[0]), tuple(rhs))
    if len(terms) == 2:
        return apply_pairwise(
            arrays[0], arrays[1], tuple(terms[0]), tuple(terms[1]),
            tuple(rhs),
        )
    raise ValueError(
        "pairwise einsum handles 1 or 2 operands; use "
        "cotengra_tpu.einsum for full contractions"
    )


def tensordot(a, b, axes=2):
    """``np.tensordot`` equivalent lowered to ``dot_general``.

    ``axes`` may be an int (contract the last/first ``axes`` dims) or a
    pair of dim lists.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if isinstance(axes, int):
        ax_a = tuple(range(a.ndim - axes, a.ndim))
        ax_b = tuple(range(axes))
    else:
        ax_a, ax_b = axes
        if isinstance(ax_a, int):
            ax_a = (ax_a,)
        if isinstance(ax_b, int):
            ax_b = (ax_b,)
        ax_a = tuple(d % a.ndim for d in ax_a)
        ax_b = tuple(d % b.ndim for d in ax_b)
    return jax.lax.dot_general(
        a, b, dimension_numbers=((ax_a, ax_b), ((), ()))
    )
