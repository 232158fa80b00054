"""Measure pure-XLA rates for the windowed-matmul execution design.

All on a 2^27-element split-complex tensor (2*2^27 f32 = 1.07 GB).
Reported GB/s = (in + out bytes)/time; useful ceiling is ~296 GB/s
(XLA elementwise r+w rate on this chip).
"""

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
    M = 2 * NUMEL // 1024  # rows when S=1024 and planes folded in rows

    # 1) elementwise bf16
    xb = X_FLAT.astype(jnp.bfloat16)
    timed("elementwise f32", lambda x: x * 1.000001, X_FLAT)
    timed("elementwise bf16", lambda x: x * 1.000001, xb)

    # 2) suffix-real: (M, 1024) @ (1024, 1024) f32 default prec
    V = jnp.asarray(rng.standard_normal((1024, 1024)).astype(np.float32))
    Vb = V.astype(jnp.bfloat16)
    fl = 2 * M * 1024 * 1024
    timed("suffix dot (M,1024)@(1024,1024) f32",
          lambda x: jnp.dot(x.reshape(M, 1024), V,
                            preferred_element_type=jnp.float32),
          X_FLAT, flops=fl)
    timed("suffix dot bf16 in (f32 acc)",
          lambda x: jnp.dot(x.reshape(M, 1024).astype(jnp.bfloat16), Vb,
                            preferred_element_type=jnp.float32),
          X_FLAT, flops=fl)
    timed("suffix dot bf16 storage+out",
          lambda x: jnp.dot(x.reshape(M, 1024), Vb,
                            preferred_element_type=jnp.bfloat16),
          xb, flops=fl)
    # smaller window S=256
    M4 = 2 * NUMEL // 256
    V256 = jnp.asarray(
        rng.standard_normal((256, 256)).astype(np.float32)
    )
    timed("suffix dot (M,256)@(256,256) f32",
          lambda x: jnp.dot(x.reshape(M4, 256), V256,
                            preferred_element_type=jnp.float32),
          X_FLAT, flops=2 * M4 * 256 * 256)

    # 3) multi-dim contraction, plane major non-adjacent:
    #    x (2, A, C) x V4 (2, C, 2, C') contract ((0,2),(0,1))
    A = NUMEL // 1024
    V4 = jnp.asarray(
        rng.standard_normal((2, 1024, 2, 1024)).astype(np.float32)
    )
    timed("nonadj dg (2,A,C)x(2,C,2,C') f32",
          lambda x: jax.lax.dot_general(
              x.reshape(2, A, 1024), V4,
              dimension_numbers=(((0, 2), (0, 1)), ((), ())),
              preferred_element_type=jnp.float32),
          X_FLAT, flops=2 * A * 2048 * 2048)

    # 4) plane-adjacent embed: x (A, 2C) @ V_emb (2C, 2C')
    V2 = jnp.asarray(
        rng.standard_normal((2048, 2048)).astype(np.float32)
    )
    V2b = V2.astype(jnp.bfloat16)
    timed("adj embed (A,2048)@(2048,2048) f32",
          lambda x: jnp.dot(x.reshape(A, 2048), V2,
                            preferred_element_type=jnp.float32),
          X_FLAT, flops=2 * A * 2048 * 2048)
    timed("adj embed bf16 in",
          lambda x: jnp.dot(x.reshape(A, 2048).astype(jnp.bfloat16),
                            V2b, preferred_element_type=jnp.float32),
          X_FLAT, flops=2 * A * 2048 * 2048)

    # 5) prefix complex mm: (2N,2K)@(2K,M) K=128, N=16
    W = jnp.asarray(rng.standard_normal((32, 256)).astype(np.float32))
    Mp = 2 * NUMEL // 256
    timed("prefix mm (32,256)@(256,Mp) f32",
          lambda x: jnp.dot(W, x.reshape(256, Mp),
                            preferred_element_type=jnp.float32),
          X_FLAT, out_bytes=32 * Mp * 4, flops=2 * 32 * 256 * Mp)
    # prefix small: K=4 (2 qubit axes) N=4
    W8 = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))
    Mp8 = 2 * NUMEL // 8
    timed("prefix mm (8,8)@(8,Mp) f32",
          lambda x: jnp.dot(W8, x.reshape(8, Mp8),
                            preferred_element_type=jnp.float32),
          X_FLAT, flops=2 * 8 * 8 * Mp8)

    # 6) plane-move transpose (2, A, C) -> (A, 2, C)
    timed("plane move (2,A,1024)->(A,2,1024)",
          lambda x: jax.lax.reshape(
              x.reshape(2, A, 1024), (2 * NUMEL,),
              dimensions=(1, 0, 2)),
          X_FLAT)

    # 7) mid-window: x (A1, S, A2) @ V (S, S') contract middle, A2=4096
    A2 = 4096
    S = 512
    A1 = 2 * NUMEL // (S * A2)
    Vm = jnp.asarray(rng.standard_normal((S, S)).astype(np.float32))
    timed("mid dg (A1,512,4096)x(512,512) ct mid",
          lambda x: jax.lax.dot_general(
              x.reshape(A1, S, A2), Vm,
              dimension_numbers=(((1,), (0,)), ((), ())),
              preferred_element_type=jnp.float32),
          X_FLAT, flops=2 * A1 * A2 * S * S)
