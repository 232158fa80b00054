"""Decompose the pathological window-step compile: operator build vs
transpose+dot. Run one variant per process:

  python scratch/micro_hoist.py STEP VARIANT
    VARIANT in {full, dot, build}

full  = exec_window as-is (build_w4 in-graph + transpose + matmul)
dot   = W2 passed as an argument; program = transpose + matmul only
build = build_w4 alone (operator construction program)
"""

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
from cotengra_tpu.ops.windowed import exec_window, build_w4
from cotengra_tpu.utils.misc import prod

OPTS = {"xla_tpu_scoped_vmem_limit_kib": "98304"}


def main():
    step = int(sys.argv[1])
    variant = sys.argv[2]

    tree, arrays = build_tree(10, 2**27)
    ir = extract_contractions(tree)
    orders = [sliced_input_legs(tree, i) for i in range(tree.N)]
    plans, storage, out_plan, out_shape, last_use = G.plan_grouped(
        ir, tree.size_dict, orders, gate_mode="window"
    )
    sizes = dict(tree.size_dict)
    rng = np.random.default_rng(0)

    kind, rec = plans[step]
    assert kind == "window", kind
    x_numel = 2 * prod(rec.out_shape) * rec.S_in // rec.S_out

    def mk_ys():
        return [
            jnp.asarray(
                rng.standard_normal(
                    2 * prod(sizes[ix] for ix in storage[y_id])
                ).astype(np.float32)
            )
            for (y_id, *_rest) in rec.gates
        ]

    ys_flat = mk_ys()
    print(
        f"step {step}: form={rec.form} S={rec.S_in}->{rec.S_out} "
        f"gates={len(rec.gates)} numel=2^"
        f"{int(np.log2(max(x_numel // 2, 1)))}",
        flush=True,
    )

    if variant in ("full", "dot"):
        xf = jnp.asarray(
            rng.standard_normal(x_numel).astype(np.float32)
        )

    if variant == "full":
        def fn(xf, ys_flat):
            temps = {rec.x_id: xf}
            for (y_id, y_plan, K, N), yf in zip(rec.gates, ys_flat):
                temps[y_id] = yf
            return exec_window(rec, temps, {}, None, jnp.float32)

        jf = jax.jit(fn, compiler_options=OPTS)
        t0 = time.time()
        r = jf(xf, ys_flat)
        np.asarray(r[:2])
        print(f"full: compile+run={time.time() - t0:.1f}s", flush=True)

    elif variant == "build":
        def fn(ys_flat):
            ys = []
            from cotengra_tpu.ops.grouped import _apply_block_plan_split
            for (y_id, y_plan, K, N), yf in zip(rec.gates, ys_flat):
                ys.append(
                    _apply_block_plan_split(yf, y_plan).reshape(2, K, N)
                )
            return build_w4(rec.recipe, ys, jnp.float32)

        jf = jax.jit(fn, compiler_options=OPTS)
        t0 = time.time()
        r = jf(ys_flat)
        np.asarray(r[:2, :2])
        print(f"build: compile+run={time.time() - t0:.1f}s", flush=True)

    elif variant == "dot":
        # precompute W2 host-side (cpu) then compile transpose+dot only
        w2_shape = (2 * rec.S_out, 2 * rec.S_in)
        w2 = jnp.asarray(
            rng.standard_normal(w2_shape).astype(np.float32)
        )

        def fn(xf, w2):
            S_in = rec.S_in
            M = xf.size // (2 * S_in)
            if rec.form == "prefix":
                x2 = xf.reshape(2 * S_in, M)
            elif rec.form == "suffix":
                x2 = jax.lax.reshape(
                    xf.reshape(2, rec.A1, S_in), (2 * S_in, M),
                    dimensions=(0, 2, 1),
                )
            elif rec.form == "interior":
                x2 = jax.lax.reshape(
                    xf.reshape(2, rec.A1, S_in, rec.A2), (2 * S_in, M),
                    dimensions=(0, 2, 1, 3),
                )
            else:
                xv = xf.reshape((2,) + tuple(rec.xdims))
                s_idx = set(rec.sdims)
                perm = (
                    (0,)
                    + tuple(1 + i for i in rec.sdims)
                    + tuple(
                        1 + i
                        for i in range(len(rec.xdims))
                        if i not in s_idx
                    )
                )
                x2 = jax.lax.reshape(xv, (2 * S_in, M), dimensions=perm)
            out = jax.lax.dot_general(
                w2, x2,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out.reshape(-1)

        jf = jax.jit(fn, compiler_options=OPTS)
        t0 = time.time()
        r = jf(xf, w2)
        np.asarray(r[:2])
        print(f"dot: compile+run={time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
