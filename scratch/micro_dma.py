"""Isolate pallas DMA efficiency: pure-copy kernels under different
block/gather layouts, vs XLA elementwise (296 GB/s reference)."""

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


def run(label, in_view, in_block, grid, index_map, compute=None):
    def kernel(x_ref, o_ref):
        if compute is None:
            o_ref[:] = x_ref[:]
        else:
            o_ref[:] = compute(x_ref[:]).astype(o_ref.dtype)

    def one(x):
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(in_view, x.dtype),
            grid=grid,
            in_specs=[pl.BlockSpec(in_block, index_map,
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(in_block, index_map,
                                   memory_space=pltpu.VMEM),
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

    r = rep(X_FLAT)
    v = np.asarray(r[:4])
    assert np.all(np.isfinite(v)), (label, v)
    t0 = time.time()
    r = rep(X_FLAT)
    np.asarray(r[:4])
    dt = (time.time() - t0) / 10
    gb = 2 * NUMEL * 4 * 2 / 1e9
    print(f"{label:50s} {dt*1e3:7.2f} ms  {gb/dt:5.0f} GB/s")


if __name__ == "__main__":
    # a) gathered: (2, gdim=16, seg, R2=8, C=1024), block=1 on seg
    gdim, R2, C = 16, 8, 1024
    seg = NUMEL // (gdim * R2 * C)
    run("gathered (2,16,seg,8,1024) blk seg=1",
        (2, gdim, seg, R2, C), (2, gdim, 1, R2, C), (seg,),
        lambda s: (0, 0, s, 0, 0))
    # b) contiguous: (2, seg, gdim, R2, C), block=1 on seg
    run("contig (2,seg,16,8,1024) blk seg=1",
        (2, seg, gdim, R2, C), (2, 1, gdim, R2, C), (seg,),
        lambda s: (0, s, 0, 0, 0))
    # c) contiguous flat rows: (2, seg, 128, 1024): 512KB/plane-chunk
    rows = 128
    seg2 = NUMEL // (rows * 1024)
    run("contig (2,seg,128,1024) blk seg=1",
        (2, seg2, rows, 1024), (2, 1, rows, 1024), (seg2,),
        lambda s: (0, s, 0, 0))
    # d) bigger contiguous tiles: 2MB per plane chunk
    rows = 512
    seg3 = NUMEL // (rows * 1024)
    run("contig (2,seg,512,1024) blk seg=1",
        (2, seg3, rows, 1024), (2, 1, rows, 1024), (seg3,),
        lambda s: (0, s, 0, 0))
    # e) plane-in-grid: (2*seg, 128, 1024) fully flat 3d
    rows = 128
    seg4 = 2 * NUMEL // (rows * 1024)
    run("flat (2seg,128,1024) blk seg=1",
        (seg4, rows, 1024), (1, rows, 1024), (seg4,),
        lambda s: (s, 0, 0))
    # f) flat with compute: scale
    run("flat (2seg,128,1024) + scale",
        (seg4, rows, 1024), (1, rows, 1024), (seg4,),
        lambda s: (s, 0, 0), compute=lambda x: x * 1.000001)
    # g) gathered with finer gdim chunks: (2, 16, seg, 8, 512)
    C = 512
    seg5 = NUMEL // (gdim * R2 * C)
    run("gathered (2,16,seg,8,512) blk seg=1",
        (2, gdim, seg5, R2, C), (2, gdim, 1, R2, C), (seg5,),
        lambda s: (0, 0, s, 0, 0))
    # h) 2-d grid variant of (a): seg split in two grid dims
    C = 1024
    sa, sb = 32, seg // 32
    run("gathered 2dgrid (2,16,sa,sb,8,1024)",
        (2, gdim, sa, sb, R2, C), (2, gdim, 1, 1, R2, C), (sa, sb),
        lambda i, j: (0, 0, i, j, 0, 0))
