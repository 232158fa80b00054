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

    best_tta, best_tree, best_tag = bar_tta, None, None
    best_env = {}
    for tgt in targets:
        t = master.copy()
        t.slice_and_reconfigure_(
            2**tgt, reconf_opts={"subtree_size": 6, "maxiter": maxiter}
        )
        tta = report(f"resliced t{tgt}", t)
        if os.environ.get("RM20_SAVE_CAND"):
            # save the raw reslice as a chip-trial candidate even when
            # it violates the modelled peak ceiling - the 2^28.2 gate is
            # a proxy calibrated on m=10-family plans; only the chip
            # knows the real HBM verdict
            out = f"/root/repo/plans/r5_m20_t{tgt}cand.json"
            save_tree(
                out, t,
                log10_flops=t.total_flops(log=10),
                planner=f"reslice_m20(from t30 master, t{tgt}, raw)",
            )
            print(f"  -> candidate saved {out}")
        # first lever: reschedule, don't re-slice. The exchange-rule
        # depth-first order can cut concurrent-live peak at zero cost
        # in flops/slices (CTG_PEAK_ORDER=1 on the executor).
        cb = t.peak_optimized_order()
        if cb is not None:
            po_peak = math.log2(max(t.peak_size(order=cb), 1))
            print(f"  peak-order: peak 2^{po_peak:.2f} (default "
                  f"2^{math.log2(max(t.peak_size(), 1)):.2f})")
            if po_peak <= 28.2:
                os.environ["CTG_PEAK_ORDER"] = "1"
                tta_po = report(f"resliced t{tgt} PEAK-ORDER", t)
                os.environ.pop("CTG_PEAK_ORDER")
                if tta_po < best_tta:
                    best_tta, best_tree = tta_po, t.copy()
                    best_tag = f"t{tgt}+peakorder"
                    best_env = {"CTG_PEAK_ORDER": "1"}
                continue
        # the executor ceiling binds on PEAK (concurrent-live), not
        # max_size: keep slicing one index at a time with reconf repair
        # until the peak fits, ranking each rung
        step = 0
        while math.log2(max(t.peak_size(), 1)) > 28.2 and step < 8:
            t.slice_(target_slices=2, temperature=0.01)
            t.subtree_reconfigure_(subtree_size=6, maxiter=maxiter)
            step += 1
            tta = report(f"resliced t{tgt}+peak{step}", t)
        peak = math.log2(max(t.peak_size(), 1))
        if peak > 28.2:
            print(f"  -> peak 2^{peak:.2f} > 2^28.2 ceiling; not saved")
            continue
        if tta < best_tta:
            best_tta, best_tree, best_tag = tta, t.copy(), f"t{tgt}"
    if best_tree is not None:
        out = "/root/repo/plans/sycamore53_m20_t28.json"
        save_tree(
            out, best_tree,
            log10_flops=best_tree.total_flops(log=10),
            planner=f"reslice_m20(from t30 master, {best_tag}, peak-sliced)",
        )
        print(
            f"  -> SAVED {out} ({best_tag}, modelled "
            f"{bar_tta / best_tta:.2f}x faster than committed t27; "
            f"run with env {best_env})"
        )


if __name__ == "__main__":
    main()
