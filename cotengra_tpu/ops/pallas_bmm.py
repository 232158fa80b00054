"""Pallas TPU kernel: tiled batched matmul with a fused |max| reduction.

Exponent-stripped contraction (``strip_exponent=True``) needs
``absmax = max|z|`` of every intermediate to renormalize it - computed
naively that is an extra full pass over the freshly-written output in HBM.
This kernel computes the per-tile max from the accumulator while it is
still in VMEM and writes a tiny (grid-shaped) partials array instead,
eliminating the second pass (then ``jnp.max`` of the partials is
negligible).

Used by the executor when ``implementation="pallas"`` for contraction
steps that lower to a batched matmul with MXU-worthy tile sizes; other
steps fall back to ``lax.dot_general``.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_absmax_kernel(x_ref, y_ref, o_ref, amax_ref, acc_ref):
    k = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        x_ref[0], y_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _finish():
        acc = acc_ref[...]
        o_ref[0] = acc.astype(o_ref.dtype)
        amax_ref[0, 0, 0] = jnp.max(jnp.abs(acc))


def _pad_to(x, axis, mult):
    d = x.shape[axis]
    pad = (-d) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit, static_argnames=("bm", "bn", "bk", "interpret")
)
def bmm_absmax(x, y, bm=256, bn=256, bk=256, interpret=False):
    """``x: (B, M, K) @ y: (B, K, N) -> (out: (B, M, N), absmax: scalar)``
    with the absmax computed in-VMEM during the matmul epilogue.
    """
    B, M, K = x.shape
    _, _, N = y.shape
    bm = min(bm, max(8, M))
    bn = min(bn, max(128, N))
    bk = min(bk, max(128, K))

    xp = _pad_to(_pad_to(x, 1, bm), 2, bk)
    yp = _pad_to(_pad_to(y, 1, bk), 2, bn)
    Mp, Kp = xp.shape[1], xp.shape[2]
    Np = yp.shape[2]
    gm, gn, gk = Mp // bm, Np // bn, Kp // bk

    out, amax = pl.pallas_call(
        _mm_absmax_kernel,
        grid=(B, gm, gn, gk),
        in_specs=[
            pl.BlockSpec(
                (1, bm, bk), lambda b, i, j, k: (b, i, k)
            ),
            pl.BlockSpec(
                (1, bk, bn), lambda b, i, j, k: (b, k, j)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, bm, bn), lambda b, i, j, k: (b, i, j)
            ),
            pl.BlockSpec(
                (1, 1, 1), lambda b, i, j, k: (b, i, j)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Mp, Np), x.dtype),
            jax.ShapeDtypeStruct((B, gm, gn), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(xp, yp)

    return out[:, :M, :N], jnp.max(amax)


def _bmm_layout(l_legs, r_legs, out_legs):
    """Plan the transposes/reshapes taking a pairwise contraction into
    (B, M, K) x (B, K, N) batched-matmul form. Returns None if the step
    is not a clean batched matmul (e.g. needs pre-sums)."""
    l_set, r_set, o_set = set(l_legs), set(r_legs), set(out_legs)
    batch = [ix for ix in l_legs if ix in r_set and ix in o_set]
    contract = [ix for ix in l_legs if ix in r_set and ix not in o_set]
    l_free = [ix for ix in l_legs if ix not in r_set]
    r_free = [ix for ix in r_legs if ix not in l_set]
    if any(ix not in o_set for ix in l_free + r_free):
        return None  # needs pre-sums - not a clean BMM
    return batch, contract, l_free, r_free


def pairwise_bmm_absmax(x, y, l_legs, r_legs, out_legs, interpret=False):
    """Pairwise contraction via the fused pallas kernel, returning
    ``(out_in_out_legs_order, absmax)``. Caller must ensure
    ``_bmm_layout`` is not None and dtype is real."""
    from ..utils.misc import prod

    plan = _bmm_layout(tuple(l_legs), tuple(r_legs), tuple(out_legs))
    batch, contract, l_free, r_free = plan

    def to3(t, legs, first, second):
        perm = (
            [legs.index(ix) for ix in batch]
            + [legs.index(ix) for ix in first]
            + [legs.index(ix) for ix in second]
        )
        tt = jnp.transpose(t, perm)
        shp = tt.shape
        nb = len(batch)
        b = prod(shp[:nb]) if nb else 1
        m = prod(shp[nb:nb + len(first)]) if first else 1
        k = prod(shp[nb + len(first):]) if second else 1
        return tt.reshape(b, m, k), shp[:nb]

    x3, bdims = to3(x, list(l_legs), l_free, contract)
    y3, _ = to3(y, list(r_legs), contract, r_free)

    out3, amax = bmm_absmax(x3, y3, interpret=interpret)

    # reshape back: (batch..., l_free..., r_free...)
    def dim_of(legs, t, ix):
        return t.shape[legs.index(ix)]

    shape = (
        tuple(bdims)
        + tuple(dim_of(list(l_legs), x, ix) for ix in l_free)
        + tuple(dim_of(list(r_legs), y, ix) for ix in r_free)
    )
    out = out3.reshape(shape)
    computed = tuple(batch) + tuple(l_free) + tuple(r_free)
    if computed != tuple(out_legs):
        out = jnp.transpose(
            out, tuple(computed.index(ix) for ix in out_legs)
        )
    return out, amax
