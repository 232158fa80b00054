"""Re-slice the m=20 master plan to bigger per-slice targets and rank
them with the lowering simulator.

The m=10 round-5 lesson (BASELINE.md): the fixed ~35 ms/slice overhead
plus copy pricing rewards FEWER, BIGGER slices — the unsliced 2^28-peak
plan beat the 8x-sliced flops-optimal one 2.5x. m=20 cannot run
unsliced (18.93 master plan peaks at 2^30), but the committed execution
plan (19.63 @ target 2^27) may be leaving the same per-slice overhead
on the table vs a 2^28-target slicing, as long as the per-slice PEAK
stays under the measured v5e ceiling (~2^28.2 for this workload; the
scan-batched sliced program regime).

Usage: python scratch/reslice_m20.py [target_log2 ...]
Env: RM20_SEED, RM20_MAXITER (reconf iters, default 30).
Saves plans/sycamore53_m20_t{t}.json when the modelled
time-to-full-amplitude beats every committed m20 execution plan.
"""

import math
import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    targets = [int(a) for a in sys.argv[1:]] or [28]
    maxiter = int(os.environ.get("RM20_MAXITER", "30"))

    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.preprocess import absorb_simple_tensors
    from cotengra_tpu.ops.simulate import simulate_grouped
    from cotengra_tpu.utils.io import load_tree, save_tree

    inputs, output, shapes, size_dict, arrays = rand_circuit_tn(
        n_qubits=53, depth=20, seed=42
    )
    inputs, arrays = absorb_simple_tensors(
        inputs, arrays, output, max_rank=2, max_absorb_size=2**12
    )
    size_dict = {
        ix: int(d)
        for term, arr in zip(inputs, arrays)
        for ix, d in zip(term, arr.shape)
    }

    def report(tag, t):
        d = simulate_grouped(t, detail=True)
        # rank by modelled time-to-full-amplitude = nsl * per_slice
        tta = t.multiplicity * d["per_slice_s"]
        print(
            f"{tag}: log10F={t.total_flops(log=10):.3f} "
            f"log2[nsl]={math.log2(max(t.multiplicity, 1)):.1f} "
            f"log2[peak]={math.log2(max(t.peak_size(), 1)):.2f} "
            f"per_slice={d['per_slice_s'] * 1e3:.1f}ms "
            f"(chain={d['chain_s'] * 1e3:.0f} copy={d['copy_s'] * 1e3:.0f} "
            f"dot={d['dot_s'] * 1e3:.0f}) "
            f"log2[tta_s]={math.log2(max(tta, 1e-30)):.3f}",
            flush=True,
        )
        return tta

    # the committed execution plan is the bar
    bar = load_tree(
        "/root/repo/plans/sycamore53_m20_t27.json", inputs, output, size_dict
    )
    bar_tta = report("committed t27", bar)

    master = load_tree(
        "/root/repo/plans/sycamore53_m20_t30.json", inputs, output, size_dict
    )
    report("master t30 (not executable: peak > HBM)", master)

    for tgt in targets:
        t = master.copy()
        t.slice_and_reconfigure_(
            2**tgt, reconf_opts={"subtree_size": 6, "maxiter": maxiter}
        )
        tta = report(f"resliced t{tgt}", t)
        peak = math.log2(max(t.peak_size(), 1))
        if peak > 28.2:
            print(f"  -> peak 2^{peak:.2f} > 2^28.2 ceiling; not saved")
            continue
        if tta < bar_tta:
            out = f"/root/repo/plans/sycamore53_m20_t{tgt}.json"
            save_tree(
                out, t,
                log10_flops=t.total_flops(log=10),
                target_log2=tgt,
                planner="reslice_m20(from t30 master)",
            )
            print(f"  -> SAVED {out} (modelled {bar_tta / tta:.2f}x faster)")


if __name__ == "__main__":
    main()
