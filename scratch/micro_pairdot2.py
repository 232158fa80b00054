"""Micro v2: step-138 pair lowering, scale-forced per-iteration x.

v1's fori carried only a scalar, so XLA hoisted the loop-invariant
transpose (and could hoist an internal repacked x for the scattered
form) out of the loop - every variant measured just the residual dot.
Here each iteration first rescales x (a full HBM read+write that
cannot be hoisted: the factor depends on i), then applies the variant;
the "scale only" baseline is subtracted to isolate the variant cost.
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
DIMS = (4, 4, 4, 2, 256, 2, 4, 4, 2, 2, 16)
PERM = (1, 3, 5, 7, 9, 0, 2, 4, 6, 8, 10)
KDIMS = tuple(DIMS[p] for p in PERM[:5])
MDIMS = tuple(DIMS[p] for p in PERM[5:])
K = int(np.prod(KDIMS))
N = 16
M = int(np.prod(MDIMS))


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out.ravel()[:4])
    t0 = time.time()
    out = fn(*args)
    np.asarray(out.ravel()[:4])
    return (time.time() - t0) / R


def rep(step):
    @jax.jit
    def fn(x, y):
        def body(i, c):
            xi = x * (1.0 + 1e-7 * i.astype(jnp.float32))
            return jax.lax.optimization_barrier(step(xi, y, c))

        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    return fn


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=DIMS).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    y_scat = y.reshape(KDIMS + (N,))

    def s_scale(xi, y, c):
        return c + xi.ravel()[0]

    def s_a_def(xi, y, c):
        xt = jax.lax.reshape(xi, (K, M), dimensions=PERM)
        out = jax.lax.dot_general(y, xt, (((0,), (0,)), ((), ())))
        return c + out[0, 0]

    def s_a_hi(xi, y, c):
        xt = jax.lax.reshape(xi, (K, M), dimensions=PERM)
        out = jax.lax.dot_general(
            y, xt, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        return c + out[0, 0]

    def s_b_def(xi, y, c):
        out = jax.lax.dot_general(
            y_scat, xi, (((0, 1, 2, 3, 4), PERM[:5]), ((), ()))
        )
        return c + out.ravel()[0]

    def s_b_hi(xi, y, c):
        out = jax.lax.dot_general(
            y_scat, xi, (((0, 1, 2, 3, 4), PERM[:5]), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        return c + out.ravel()[0]

    base = None
    for name, step in [
        ("scale only (baseline)", s_scale),
        ("transpose+dot DEFAULT", s_a_def),
        ("transpose+dot HIGHEST", s_a_hi),
        ("scattered dot DEFAULT", s_b_def),
        ("scattered dot HIGHEST", s_b_hi),
    ]:
        t0 = time.time()
        dt = timed(rep(step), x, y)
        extra = (dt - base) * 1e3 if base is not None else 0.0
        if base is None:
            base = dt
        print(
            f"{name:24s} {dt * 1e3:8.2f} ms/iter"
            + (f"  (+{extra:6.2f} ms vs baseline)" if extra else "")
            + f"  (compile {time.time() - t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()

