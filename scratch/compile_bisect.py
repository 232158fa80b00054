"""Compile each m=10 plan step standalone on the TPU and time it."""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

sys.path.insert(0, "/root/repo/scratch")
from profile_bench import build_tree

from cotengra_tpu.ops import grouped as G
from cotengra_tpu.ops.lowering import extract_contractions, \
    sliced_input_legs
from cotengra_tpu.ops.windowed import exec_window
from cotengra_tpu.utils.misc import prod

OPTS = {"xla_tpu_scoped_vmem_limit_kib": "98304"}


def main():
    tree, arrays = build_tree(10, 2**27)
    ir = extract_contractions(tree)
    orders = [sliced_input_legs(tree, i) for i in range(tree.N)]
    plans, storage, out_plan, out_shape, last_use = G.plan_grouped(
        ir, tree.size_dict, orders, gate_mode="window"
    )
    sizes = dict(tree.size_dict)
    rng = np.random.default_rng(0)

    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    stop = int(sys.argv[2]) if len(sys.argv) > 2 else len(plans)
    for pi, (kind, info) in enumerate(plans):
        if pi < start or pi >= stop:
            continue
        if kind == "window":
            rec = info
            x_numel = 2 * prod(rec.out_shape) * rec.S_in // rec.S_out

            def fn(xf, ys_flat, rec=rec):
                temps = {rec.x_id: xf}
                for (y_id, y_plan, K, N), yf in zip(rec.gates, ys_flat):
                    temps[y_id] = yf
                return exec_window(rec, temps, {}, None, jnp.float32)

            xf = jnp.asarray(
                rng.standard_normal(x_numel).astype(np.float32)
            )
            ys = [
                jnp.asarray(
                    rng.standard_normal(
                        2 * sizes_of(storage, sizes, y_id)
                    ).astype(np.float32)
                )
                for (y_id, *_rest) in rec.gates
            ]
            jf = jax.jit(fn, compiler_options=OPTS)
            t0 = time.time()
            try:
                r = jf(xf, ys)
                np.asarray(r[:2])
                dt = time.time() - t0
            except Exception as e:
                print(f"[{pi}] window form={rec.form} S={rec.S_in}->"
                      f"{rec.S_out} FAILED: {type(e).__name__}",
                      flush=True)
                continue
            print(
                f"[{pi}] window form={rec.form} S={rec.S_in}->"
                f"{rec.S_out} gates={len(rec.gates)} "
                f"numel=2^{int(np.log2(max(x_numel//2,1)))} "
                f"compile+run={dt:.1f}s",
                flush=True,
            )


def sizes_of(storage, sizes, y_id):
    return prod(sizes[ix] for ix in storage[y_id])


if __name__ == "__main__":
    main()
