"""Dump the inplace gate-chain specs of the bench plan (host-side).

For each chain: the big-tensor size, gate count, per-gate (K, N, mode,
axis region), and the kernel VPU sweep proxy - to see where the
measured ~80 ms/slice of pallas kernel time concentrates.
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.grouped import plan_grouped
    from cotengra_tpu.ops.lowering import (
        extract_contractions,
        sliced_input_legs,
    )
    from cotengra_tpu.ops.preprocess import absorb_simple_tensors
    from cotengra_tpu.utils.io import load_tree
    from cotengra_tpu.utils.misc import prod

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
    tree = load_tree(
        f"/root/repo/plans/sycamore53_m{m}_t27.json",
        inputs, output, size_dict,
    )
    ir = extract_contractions(tree)
    input_orders = [sliced_input_legs(tree, i) for i in range(tree.N)]
    plans, storage, out_plan, out_shape, last_use = plan_grouped(
        ir, tree.size_dict, input_orders, gate_mode="inplace"
    )
    sizes = tree.size_dict
    n_inplace = 0
    for pi, (kind, info) in enumerate(plans):
        if kind != "inplace":
            continue
        n_inplace += 1
        numel = prod(info.out_shape)
        spec = info.spec if hasattr(info, "spec") else None
        print(f"step {pi}: inplace out_numel=2^{numel.bit_length()-1} "
              f"ngates={len(info.ys)}")
        for (y_id, y_plan, K, N) in info.ys:
            print(f"    gate K={K} N={N}")
        if spec is not None:
            from cotengra_tpu.ops.grouped import _chain_combo_sum
            print(f"    combo_sum={_chain_combo_sum(spec)}")
            for g in spec.gates:
                mode, pos, kdims, nydims, first, roll_axes = g[:6]
                print(
                    f"    g mode={mode} pos={pos} kdims={kdims} "
                    f"ny={nydims} rolls={roll_axes}"
                )
    print(f"total inplace chains: {n_inplace}")
    by_kind = {}
    for kind, _ in plans:
        by_kind[kind] = by_kind.get(kind, 0) + 1
    print("plan kinds:", by_kind)


if __name__ == "__main__":
    main()
