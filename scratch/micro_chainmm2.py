"""Variant sweep for the MXU chain kernel: lane-region width C,
bf16 dot inputs, row-only vs row+lane."""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUMEL = 2 ** 27
rng = np.random.default_rng(1)
X_FLAT = jnp.asarray(rng.standard_normal(2 * NUMEL).astype(np.float32))


def variant(C, gdim, R2, lane_mode, dot_dtype, label):
    """gdim: product of above gate dims (rows = 2*gdim*R2)."""
    seg = NUMEL // (gdim * R2 * C)
    in_view = (2, gdim, seg, R2, C)
    in_block = (2, gdim, 1, R2, C)
    grid = (seg,)
    rows = 2 * gdim * R2
    W = jnp.asarray(
        rng.standard_normal((rows, rows)).astype(np.float32)
    )
    Vr = jnp.asarray(rng.standard_normal((C, C)).astype(np.float32))
    Vi = jnp.asarray(rng.standard_normal((C, C)).astype(np.float32))

    ddt = jnp.dtype(dot_dtype)

    def kernel(*refs):
        i = 0
        w_ref = refs[i]; i += 1
        if lane_mode >= 1:
            vr_ref = refs[i]; i += 1
        if lane_mode == 2:
            vi_ref = refs[i]; i += 1
        x_ref = refs[i]
        o_ref = refs[i + 1]
        X = x_ref[:].reshape(rows, C).astype(ddt)
        X = jnp.dot(w_ref[:].astype(ddt), X,
                    preferred_element_type=jnp.float32)
        if lane_mode == 1:
            X = jnp.dot(X.astype(ddt), vr_ref[:].astype(ddt),
                        preferred_element_type=jnp.float32)
        elif lane_mode == 2:
            h = rows // 2
            Xd = X.astype(ddt)
            Yr, Yi = Xd[:h], Xd[h:]
            vr = vr_ref[:].astype(ddt)
            vi = vi_ref[:].astype(ddt)
            Zr = (jnp.dot(Yr, vr, preferred_element_type=jnp.float32)
                  - jnp.dot(Yi, vi, preferred_element_type=jnp.float32))
            Zi = (jnp.dot(Yr, vi, preferred_element_type=jnp.float32)
                  + jnp.dot(Yi, vr, preferred_element_type=jnp.float32))
            X = jnp.concatenate([Zr, Zi], axis=0)
        o_ref[:] = X.reshape(o_ref.shape).astype(o_ref.dtype)

    ops = [W]
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    if lane_mode >= 1:
        ops.append(Vr)
        specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if lane_mode == 2:
        ops.append(Vi)
        specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    def one(x):
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(in_view, x.dtype),
            grid=grid,
            in_specs=specs + [
                pl.BlockSpec(in_block, lambda s: (0, 0, s, 0, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                in_block, lambda s: (0, 0, s, 0, 0),
                memory_space=pltpu.VMEM),
        )
        return fn(*ops, x.reshape(in_view)).reshape(-1)

    @functools.partial(
        jax.jit,
        compiler_options={"xla_tpu_scoped_vmem_limit_kib": "98304"},
    )
    def rep(x):
        def body(i, x):
            return jax.lax.optimization_barrier(one(x))
        return jax.lax.fori_loop(0, 10, body, x)

    r = rep(X_FLAT)
    v = np.asarray(r[:4])
    assert np.all(np.isfinite(v)), (label, v)
    t0 = time.time()
    r = rep(X_FLAT)
    np.asarray(r[:4])
    dt = (time.time() - t0) / 10
    gb = 2 * NUMEL * 4 * 2 / 1e9
    mxu = 2 * rows * rows * (NUMEL * 2 // rows) * 1
    if lane_mode == 2:
        mxu += 4 * 2 * C * (NUMEL * 2 // 2)
    elif lane_mode == 1:
        mxu += 2 * C * (NUMEL * 2)
    print(f"{label:45s} {dt*1e3:7.2f} ms  {gb/dt:5.0f} GB/s  "
          f"mxu {mxu/dt/1e12:5.1f} TF/s")


if __name__ == "__main__":
    # baseline shapes: gdim=16 (4 gates above), R2=8
    variant(1024, 16, 8, 2, "float32", "C=1024 lane-cplx f32")
    variant(1024, 16, 8, 2, "bfloat16", "C=1024 lane-cplx bf16")
    variant(512, 16, 8, 2, "bfloat16", "C=512 lane-cplx bf16")
    variant(256, 16, 8, 2, "bfloat16", "C=256 lane-cplx bf16")
    variant(128, 16, 8, 2, "bfloat16", "C=128 lane-cplx bf16")
    variant(128, 16, 8, 2, "float32", "C=128 lane-cplx f32")
    variant(512, 16, 8, 0, "bfloat16", "C=512 row-only bf16")
    variant(512, 16, 8, 0, "float32", "C=512 row-only f32")
    variant(512, 64, 8, 0, "bfloat16", "C=512 gdim=64 row-only bf16")
    variant(512, 16, 16, 2, "bfloat16", "C=512 R2=16 lane-cplx bf16")
