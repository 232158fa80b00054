"""Micro-benchmark: mid-axis block transposes on the chip.

The m=10 inplace trace shows XLA lowering our fused
transpose+compact-reshape realignments to tiled copies at ~77 GB/s for
patterns like f32[32768,8,8,128] {3,2,1,0}->{3,1,2,0} (swap two 8-sized
axes above the 128-lane dim). Tests whether a one-hot matmul on the
middle axes (einsum 'ij,ajc->aic') rides the MXU dot pass rate
(~580 GB/s measured by micro_xla) instead.

HONEST TIMING: single calls are dominated by the ~25 ms tunnel
dispatch; every variant runs R=16 times inside one jit via fori_loop
with optimization_barrier between iterations (so perm∘perm can't
cancel), and the measurement ends in a value pull.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R = 16


def timed(fn_rep, x, nbytes):
    out = fn_rep(x)  # compile
    np.asarray(out.ravel()[:4])
    t0 = time.time()
    out = fn_rep(x)
    v = np.asarray(out.ravel()[:4])
    dt = (time.time() - t0) / R
    assert np.all(np.isfinite(v))
    return dt, 2 * nbytes / dt / 1e9


def rep(step):
    @jax.jit
    def fn(x):
        def body(i, c):
            return jax.lax.optimization_barrier(step(c))

        return jax.lax.fori_loop(0, R, body, x)

    return fn


def main():
    M, P1, P2, C = 32768, 8, 8, 128
    nbytes = M * P1 * P2 * C * 4
    x = jnp.asarray(
        np.random.default_rng(0)
        .normal(size=(M, P1, P2, C))
        .astype(np.float32)
    )

    def s_reshape(c):
        flat = jax.lax.reshape(
            c, (M * P1 * P2 * C,), dimensions=(0, 2, 1, 3)
        )
        return flat.reshape(M, P1, P2, C)

    def s_transpose(c):
        return jnp.transpose(c, (0, 2, 1, 3)).reshape(M, P1, P2, C)

    perm = np.arange(P1 * P2).reshape(P1, P2).T.ravel()
    p = np.zeros((P1 * P2, P1 * P2), np.float32)
    p[np.arange(P1 * P2), perm] = 1.0
    pj = jnp.asarray(p)

    def s_dot(c):
        xm = c.reshape(M, P1 * P2, C)
        out = jnp.einsum(
            "ij,ajc->aic", pj, xm,
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.reshape(M, P1, P2, C)

    def s_dot_default(c):
        xm = c.reshape(M, P1 * P2, C)
        out = jnp.einsum("ij,ajc->aic", pj, xm)
        return out.reshape(M, P1, P2, C)

    def s_copy_only(c):
        # pure elementwise pass (the HBM r/w floor for this buffer)
        return c * 1.0000001

    for name, step in [
        ("elementwise floor", s_copy_only),
        ("lax.reshape(dims)", s_reshape),
        ("transpose+reshape", s_transpose),
        ("one-hot einsum HIGHEST", s_dot),
        ("one-hot einsum DEFAULT", s_dot_default),
    ]:
        try:
            dt, rate = timed(rep(step), x, nbytes)
            print(f"{name:26s} {dt * 1e3:8.2f} ms  {rate:7.1f} GB/s eff")
        except Exception as e:
            print(f"{name:26s} FAILED {type(e).__name__}: {str(e)[:120]}")

    a = np.asarray(jax.jit(s_transpose)(x))
    b = np.asarray(jax.jit(s_dot)(x))
    print("exact:", bool((a == b).all()))


if __name__ == "__main__":
    main()
