"""Chase the pallas 165 GB/s copy ceiling: semantics, block sizes,
aliasing, dtype."""

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
X_BF16 = X_FLAT.astype(jnp.bfloat16)


def run(label, seg_blk=1, semantics=None, alias=False, dtype="float32",
        rows=128, C=1024):
    x0 = X_BF16 if dtype == "bfloat16" else X_FLAT
    total = x0.size
    seg = total // (rows * C)
    in_view = (seg, rows, C)
    in_block = (seg_blk, rows, C)
    grid = (seg // seg_blk,)

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    kwargs = {}
    if semantics is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=semantics
        )
    if alias:
        kwargs["input_output_aliases"] = {0: 0}

    def one(x):
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(in_view, x.dtype),
            grid=grid,
            in_specs=[pl.BlockSpec(in_block, lambda s: (s, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(in_block, lambda s: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
            **kwargs,
        )
        return fn(x.reshape(in_view)).reshape(-1)

    @functools.partial(
        jax.jit,
        compiler_options={"xla_tpu_scoped_vmem_limit_kib": "98304"},
    )
    def rep(x):
        def body(i, x):
            return jax.lax.optimization_barrier(one(x))
        return jax.lax.fori_loop(0, 10, body, x)

    r = rep(x0)
    v = np.asarray(r[:4]).astype(np.float32)
    assert np.all(np.isfinite(v)), (label, v)
    t0 = time.time()
    r = rep(x0)
    np.asarray(r[:4])
    dt = (time.time() - t0) / 10
    gb = total * x0.dtype.itemsize * 2 / 1e9
    print(f"{label:50s} {dt*1e3:7.2f} ms  {gb/dt:5.0f} GB/s")


if __name__ == "__main__":
    run("base f32 1MB blocks")
    run("parallel semantics", semantics=("parallel",))
    run("arbitrary semantics", semantics=("arbitrary",))
    run("blocks x4 (4MB)", seg_blk=4)
    run("blocks /2 (512KB)", rows=64)
    run("aliased in-place", alias=True)
    run("bf16 storage", dtype="bfloat16")
    run("bf16 + parallel", dtype="bfloat16", semantics=("parallel",))
    run("bf16 blocks x4", dtype="bfloat16", seg_blk=4)
