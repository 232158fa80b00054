"""Micro: the m=10 plan's step-138 pair contraction, three lowerings.

The trace shows its x-operand realign (11-dim interleave of a 2^26
tensor, plan ((4,4,4,2,256,2,4,4,2,2,16),(1,3,5,7,9,0,2,4,6,8,10)))
materializing as a bf16 reshape+copy+reshape triple at a padded 16-wide
minor dim - ~26 ms/slice, the single largest data-formatting item.
Compares, with honest fori+barrier timing:

  a) current form: fused transpose+reshape to (K=128, M=2^19), then
     2-D dot with y (128, 16)
  b) direct dot_general contracting the five scattered K dims of the
     un-realigned view (no explicit transpose; XLA picks the layout)
  c) b at HIGHEST precision

plus each at DEFAULT and HIGHEST where relevant.
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
KDIMS = tuple(DIMS[p] for p in PERM[:5])   # (4,2,2,4,2) = 128
MDIMS = tuple(DIMS[p] for p in PERM[5:])   # = 2^19
K = int(np.prod(KDIMS))
N = 16
M = int(np.prod(MDIMS))


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out.ravel()[:4])
    t0 = time.time()
    out = fn(*args)
    v = np.asarray(out.ravel()[:4])
    dt = (time.time() - t0) / R
    assert np.all(np.isfinite(v))
    return dt


def rep(step, x, y):
    @jax.jit
    def fn(x, y):
        def body(i, c):
            out = step(x, y, c)
            return jax.lax.optimization_barrier(out)

        # carry a scalar so iterations chain without reusing the big out
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    return fn


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=DIMS).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    y_scat = y.reshape(KDIMS + (N,))
    nbytes = x.size * 4 + M * N * 4

    def a_default(x, y, c):
        xt = jax.lax.reshape(x, (K, M), dimensions=PERM)
        out = jax.lax.dot_general(
            y, xt, (((0,), (0,)), ((), ()))
        )  # (N, M)
        return c + out[0, 0]

    def a_highest(x, y, c):
        xt = jax.lax.reshape(x, (K, M), dimensions=PERM)
        out = jax.lax.dot_general(
            y, xt, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        return c + out[0, 0]

    def b_default(x, y, c):
        out = jax.lax.dot_general(
            y_scat, x,
            (((0, 1, 2, 3, 4), PERM[:5]), ((), ())),
        )  # (N, *MDIMS)
        return c + out.ravel()[0]

    def b_highest(x, y, c):
        out = jax.lax.dot_general(
            y_scat, x,
            (((0, 1, 2, 3, 4), PERM[:5]), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        return c + out.ravel()[0]

    for name, step in [
        ("transpose+dot DEFAULT", a_default),
        ("transpose+dot HIGHEST", a_highest),
        ("scattered dot DEFAULT", b_default),
        ("scattered dot HIGHEST", b_highest),
    ]:
        try:
            t0 = time.time()
            dt = timed(rep(step, x, y), x, y)
            rate = 2 * nbytes / dt / 1e9
            print(
                f"{name:24s} {dt * 1e3:8.2f} ms  {rate:7.1f} GB/s eff "
                f"(compile {time.time() - t0:.0f}s)",
                flush=True,
            )
        except Exception as e:
            print(f"{name:24s} FAILED {type(e).__name__}: {str(e)[:120]}")

    # correctness
    ra = np.asarray(
        jax.jit(
            lambda x, y: jax.lax.dot_general(
                y,
                jax.lax.reshape(x, (K, M), dimensions=PERM),
                (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
        )(x, y)
    )
    rb = np.asarray(
        jax.jit(
            lambda x, y: jax.lax.dot_general(
                y_scat, x,
                (((0, 1, 2, 3, 4), PERM[:5]), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(N, M)
        )(x, y)
    )
    print("allclose:", np.allclose(ra, rb, rtol=1e-5))


if __name__ == "__main__":
    main()
