"""Compile each m=10 window step standalone on the TPU with a PREBUILT
W2 operator (as the staged program sees it after the operator hoist),
timing compile and reporting compiled temp memory. Isolates the
transpose+dot realignment cost from the operator-build cost.

Usage: python scratch/probe_window_compile.py [start] [stop] [dtype]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from profile_bench import build_tree

from cotengra_tpu.ops import grouped as G
from cotengra_tpu.ops.lowering import extract_contractions, \
    sliced_input_legs
from cotengra_tpu.ops.windowed import exec_window
from cotengra_tpu.utils.misc import prod

OPTS = {"xla_tpu_scoped_vmem_limit_kib": "98304"}


def main():
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    stop = int(sys.argv[2]) if len(sys.argv) > 2 else 10**9
    dtype = jnp.dtype(sys.argv[3]) if len(sys.argv) > 3 else jnp.float32

    tree, arrays = build_tree(10, 2**27)
    ir = extract_contractions(tree)
    orders = [sliced_input_legs(tree, i) for i in range(tree.N)]
    plans, storage, out_plan, out_shape, last_use = G.plan_grouped(
        ir, tree.size_dict, orders, gate_mode="window"
    )

    for pi, (kind, info) in enumerate(plans):
        if kind != "window" or pi < start or pi >= stop:
            continue
        rec = info
        x_numel2 = 2 * prod(rec.out_shape) * rec.S_in // rec.S_out
        w2_id = 10**9
        rec.w2_id = w2_id

        def fn(xf, w2, rec=rec):
            temps = {rec.x_id: xf, w2_id: w2}
            return exec_window(rec, temps, {}, None, dtype)

        xf = jax.ShapeDtypeStruct((x_numel2,), dtype)
        w2 = jax.ShapeDtypeStruct(
            (4 * rec.S_in * rec.S_out,), dtype
        )
        t0 = time.time()
        try:
            c = jax.jit(fn, compiler_options=OPTS).lower(xf, w2).compile()
            dt = time.time() - t0
            mem = c.memory_analysis()
            tmp = getattr(mem, "temp_size_in_bytes", None)
        except Exception as e:
            print(
                f"[{pi}] form={rec.form} S={rec.S_in}->{rec.S_out} "
                f"FAILED {type(e).__name__}: {str(e)[:200]}",
                flush=True,
            )
            continue
        print(
            f"[{pi}] form={rec.form} S={rec.S_in}->{rec.S_out} "
            f"xdims={rec.xdims} numel2={x_numel2} "
            f"compile={dt:.1f}s temp={tmp and tmp/2**20:.0f}MB",
            flush=True,
        )


if __name__ == "__main__":
    main()
