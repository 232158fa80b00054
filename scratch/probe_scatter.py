"""Compile-probe each scattered-pair-dot candidate of a plan on the TPU.

For every pair step eligible for the no-realign scattered dot, AOT-
compiles JUST that dot (no execution) and prints the compiled temp
allocation - ground truth on whether XLA folds the scattered-K fetch
into the MXU operand load or materializes a (catastrophically padded)
copy of the view. Diagnoses the combo-plan OOM (16G for a 256M view,
bench_r4_combo_sb2.log) and calibrates the eligibility guard.

Usage: python scratch/probe_scatter.py plans/sycamore53_m10_t27.json
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    plan_file = sys.argv[1]
    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.grouped import (
        plan_grouped,
        _scattered_pair_dims,
        _split_pair_scattered,
        _SCATTER_MIN,
    )
    from cotengra_tpu.ops.lowering import (
        extract_contractions,
        sliced_input_legs,
    )
    from cotengra_tpu.ops.preprocess import absorb_simple_tensors
    from cotengra_tpu.utils.io import load_tree

    m = 20 if "m20" in plan_file else 10
    inputs, output, shapes, size_dict, arrays = rand_circuit_tn(
        n_qubits=53, depth=m, seed=42
    )
    inputs, arrays = absorb_simple_tensors(
        inputs, arrays, output, max_rank=2, max_absorb_size=2**12
    )
    size_dict = {
        ix: int(d)
        for term, arr in zip(inputs, arrays)
        for ix, d in zip(term, arr.shape)
    }
    tree = load_tree(plan_file, inputs, output, size_dict)
    ir = extract_contractions(tree)
    input_orders = [sliced_input_legs(tree, i) for i in range(tree.N)]
    plans, *_ = plan_grouped(
        ir, tree.size_dict, input_orders, gate_mode="inplace"
    )
    prec = jax.lax.Precision.HIGHEST
    for pi, (kind, info) in enumerate(plans):
        if kind == "inplace" or not hasattr(info, "x_plan"):
            continue
        p = info
        if p.mode == "bmm" or 2 * p.K * p.M < _SCATTER_MIN:
            continue
        scat = _scattered_pair_dims(p)
        if scat is None:
            continue
        block_dims, kpos = scat

        def dot_fn(x_flat, yf, p=p, bd=block_dims, kp=kpos):
            return _split_pair_scattered(
                x_flat, yf, p, bd, kp, prec, jnp.float32
            )

        xs = jax.ShapeDtypeStruct((2 * p.K * p.M,), jnp.float32)
        ys = jax.ShapeDtypeStruct((2 * p.K * p.N,), jnp.float32)
        raw = 2 * p.K * p.M * 4
        try:
            compiled = jax.jit(dot_fn).lower(xs, ys).compile()
            ma = compiled.memory_analysis()
            tmp = getattr(ma, "temp_size_in_bytes", None)
            print(
                f"step {pi}: K=2^{p.K.bit_length()-1} "
                f"M=2^{p.M.bit_length()-1} N={p.N} "
                f"block={block_dims} kpos={kpos} raw={raw/2**20:.0f}M "
                f"temp={tmp/2**20:.0f}M ratio={tmp/raw:.1f}x"
            )
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(
                f"step {pi}: K=2^{p.K.bit_length()-1} "
                f"M=2^{p.M.bit_length()-1} N={p.N} "
                f"block={block_dims} kpos={kpos} raw={raw/2**20:.0f}M "
                f"COMPILE FAIL: {msg}"
            )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
