"""Dump scattered-pair-dot candidates of a bench plan (host-side).

For each pair step eligible for the no-realign scattered dot, print the
stored block dims, which positions are contracted (kpos), the resulting
view rank, and the rank after merging adjacent same-class runs - to
diagnose the combo-plan OOM where XLA materialized the rank-12 view at
T(2,128) with a 64x padding blowup (bench_r4_combo_sb2.log).

Usage: python scratch/dump_scatter.py plans/sycamore53_m10_t27_combo.json
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")


def merged_dims(block_dims, kpos):
    """Merge adjacent stored dims of the same class (K vs M)."""
    kset = set(kpos)
    out_dims, out_isk = [], []
    for q, d in enumerate(block_dims):
        isk = q in kset
        if out_isk and out_isk[-1] == isk:
            out_dims[-1] *= d
        else:
            out_dims.append(d)
            out_isk.append(isk)
    return tuple(out_dims), tuple(
        i for i, isk in enumerate(out_isk) if isk
    )


def main():
    plan_file = sys.argv[1]
    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.grouped import (
        plan_grouped,
        _scattered_pair_dims,
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
        mdims, mk = merged_dims(block_dims, kpos)
        # padded bytes of the (2, *block_dims) f32 view at T(s, 128)
        def padded(dims):
            last = dims[-1] if dims else 1
            sub = dims[-2] if len(dims) > 1 else 1
            from math import prod as mprod
            lead = mprod(dims[:-2]) if len(dims) > 2 else 1
            tile_s = 8 if sub >= 8 else sub
            pl = -(-last // 128) * 128
            ps = -(-sub // tile_s) * tile_s
            return 2 * lead * ps * pl * 4
        raw = 2 * 4
        for d in block_dims:
            raw *= d
        print(
            f"step {pi}: mode={p.mode} xlay={p.x_layout} "
            f"K=2^{p.K.bit_length()-1} M=2^{p.M.bit_length()-1} "
            f"N={p.N}\n"
            f"    block={block_dims} kpos={kpos} rank={len(block_dims)}\n"
            f"    merged={mdims} mkpos={mk} mrank={len(mdims)}\n"
            f"    bytes raw={raw/2**20:.0f}M "
            f"padded(block)={padded(block_dims)/2**20:.0f}M "
            f"padded(merged)={padded(mdims)/2**20:.0f}M"
        )


if __name__ == "__main__":
    main()
