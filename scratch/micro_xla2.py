"""Second XLA measurement round: plane-major-preserving window forms,
precision cost, composition rates."""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

NUMEL = 2 ** 27
rng = np.random.default_rng(1)
X_FLAT = jnp.asarray(rng.standard_normal(2 * NUMEL).astype(np.float32))

OPTS = {"xla_tpu_scoped_vmem_limit_kib": "98304"}
HI = jax.lax.Precision.HIGHEST


def timed(label, fn, x, out_bytes=None, flops=0, n=10):
    @functools.partial(jax.jit, compiler_options=OPTS)
    def rep(x):
        def body(i, c):
            return jax.lax.optimization_barrier(fn(x))
        return jax.lax.fori_loop(0, n, body, fn(x))

    r = rep(x)
    v = np.asarray(r.reshape(-1)[:4]).astype(np.float32)
    assert np.all(np.isfinite(v)), (label, v)
    t0 = time.time()
    r = rep(x)
    np.asarray(r.reshape(-1)[:4])
    dt = (time.time() - t0) / (n + 1)
    in_b = x.size * x.dtype.itemsize
    ob = out_bytes if out_bytes is not None else in_b
    gb = (in_b + ob) / 1e9
    extra = f"  mxu {flops/dt/1e12:5.1f} TF/s" if flops else ""
    print(f"{label:52s} {dt*1e3:7.2f} ms  {gb/dt:5.0f} GB/s{extra}")
    return dt


if __name__ == "__main__":
    S = 1024
    A1 = 512
    A2 = NUMEL // (S * A1)
    fl = 2 * NUMEL * 2 * S  # per-plane pair count approx

    # v2: plane-major preserving: dg(W4, xv) -> (2, S', A1, A2)
    W4 = jnp.asarray(
        rng.standard_normal((2, S, 2, S)).astype(np.float32)
    )
    timed("v2 dg(W4,(2,A1,S,A2)) plane-major out",
          lambda x: jax.lax.dot_general(
              W4, x.reshape(2, A1, S, A2),
              dimension_numbers=(((2, 3), (0, 2)), ((), ())),
              preferred_element_type=jnp.float32),
          X_FLAT, flops=2 * 2 * NUMEL * 2 * S)

    # v1 again for reference at same shapes (plane-inside out)
    timed("v1 dg((2,A1,S,A2),W4) out (A1,A2,2,S')",
          lambda x: jax.lax.dot_general(
              x.reshape(2, A1, S, A2), W4,
              dimension_numbers=(((0, 2), (0, 1)), ((), ())),
              preferred_element_type=jnp.float32),
          X_FLAT, flops=2 * 2 * NUMEL * 2 * S)

    # v2 suffix special case A2=1
    A1s = NUMEL // S
    timed("v2 suffix dg(W4,(2,A1,S)) plane-major",
          lambda x: jax.lax.dot_general(
              W4, x.reshape(2, A1s, S),
              dimension_numbers=(((2, 3), (0, 2)), ((), ())),
              preferred_element_type=jnp.float32),
          X_FLAT, flops=2 * 2 * NUMEL * 2 * S)

    # prefix-window embed: x (2S, M) with W_emb (2S', 2S)
    W2 = jnp.asarray(
        rng.standard_normal((2 * S, 2 * S)).astype(np.float32)
    )
    Mp = 2 * NUMEL // (2 * S)
    timed("prefix embed (2S,2S)@(2S,M) S=1024",
          lambda x: jnp.dot(W2, x.reshape(2 * S, Mp),
                            preferred_element_type=jnp.float32),
          X_FLAT, flops=2 * 2 * S * 2 * S * Mp)

    # prefix embed smaller window S=256
    S2 = 256
    W2s = jnp.asarray(
        rng.standard_normal((2 * S2, 2 * S2)).astype(np.float32)
    )
    Mp2 = 2 * NUMEL // (2 * S2)
    timed("prefix embed (2S,2S)@(2S,M) S=256",
          lambda x: jnp.dot(W2s, x.reshape(2 * S2, Mp2),
                            preferred_element_type=jnp.float32),
          X_FLAT, flops=2 * 2 * S2 * 2 * S2 * Mp2)

    # precision: HIGHEST on the suffix dot
    V = jnp.asarray(rng.standard_normal((S, S)).astype(np.float32))
    M = 2 * NUMEL // S
    timed("suffix dot f32 HIGHEST",
          lambda x: jnp.dot(x.reshape(M, S), V,
                            preferred_element_type=jnp.float32,
                            precision=HI),
          X_FLAT, flops=2 * M * S * S)

    # mid window with small S (=64: single 2-qubit gate + few idents)
    S3 = 64
    A13 = 2048
    A23 = 2 * NUMEL // (S3 * A13)
    V64 = jnp.asarray(rng.standard_normal((S3, S3)).astype(np.float32))
    timed("mid dg (A1,64,A2)x(64,64)",
          lambda x: jax.lax.dot_general(
              x.reshape(A13, S3, A23), V64,
              dimension_numbers=(((1,), (0,)), ((), ())),
              preferred_element_type=jnp.float32),
          X_FLAT, flops=2 * 2 * NUMEL * S3)

    # contraction mid-window: (A1, S, A2) x (S, S/8): size reduction
    Vc = jnp.asarray(
        rng.standard_normal((S, S // 8)).astype(np.float32)
    )
    timed("mid contract (A1,1024,A2)x(1024,128)",
          lambda x: jax.lax.dot_general(
              x.reshape(A1, S, A2 * 2), Vc,
              dimension_numbers=(((1,), (0,)), ((), ())),
              preferred_element_type=jnp.float32),
          X_FLAT, out_bytes=2 * NUMEL * 4 // 8,
          flops=2 * 2 * NUMEL * S // 8)
