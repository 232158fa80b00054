"""Generate write-optimized ("combo") plan candidates for the bench.

The flops-optimal m=10 plan puts ~95% of its flops in VPU-bound pallas
gate chains; searching under a combo objective (flops + alpha*writes)
with slicing-aware scoring yields plans whose mass sits in big MXU pair
dots instead - chip-measured 7x device throughput (combo-256,
bench_r4_combo256_mp logs) at a modest flops premium.

Usage: python scratch/make_combo_plans.py [m] [alpha ...]
Env: TARGET (log2 target size, default 27), SEEDS (comma list),
     OUT (plan path; default plans/sycamore53_m{m}_t{target}_combo{-a}.json)
"""

import os
import sys

sys.path.insert(0, "/root/repo")


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    alphas = [int(a) for a in sys.argv[2:]] or [64]
    target = 2 ** int(os.environ.get("TARGET", "27"))
    seeds = [
        int(s) for s in os.environ.get("SEEDS", "7,11,23").split(",")
    ]

    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.preprocess import absorb_simple_tensors
    from cotengra_tpu.pathfinders.basic import (
        optimize_random_greedy_track_flops,
    )
    from cotengra_tpu.tree import ContractionTree
    from cotengra_tpu.utils.io import save_tree

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

    for alpha in alphas:
        obj = f"combo-{alpha}"
        best = None
        for seed in seeds:
            ssa_path, _ = optimize_random_greedy_track_flops(
                inputs, output, size_dict, ntrials=256, seed=seed,
                costmod=(0.1, 4.0),
            )
            tree = ContractionTree.from_path(
                inputs, output, size_dict, ssa_path=ssa_path
            )
            tree.subtree_reconfigure_(
                subtree_size=10, maxiter=300, minimize=obj
            )
            if tree.max_size() > target:
                tree.slice_and_reconfigure_(
                    target,
                    minimize=obj,
                    reconf_opts={
                        "subtree_size": 6,
                        "maxiter": 50,
                        "minimize": obj,
                    },
                )
            import math

            lf = math.log10(max(tree.total_flops(), 1))
            lw = math.log10(max(tree.total_write(), 1))
            nsl = tree.nslices
            print(
                f"combo-{alpha} seed{seed}: log10F={lf:.3f} "
                f"log10W={lw:.3f} size=2^{math.log2(tree.max_size()):.0f}"
                f" nsl={nsl}",
                flush=True,
            )
            score = tree.total_flops() + alpha * tree.total_write()
            if best is None or score < best[0]:
                best = (score, tree, lf, lw, nsl)
        _, tree, lf, lw, nsl = best
        tl = int(target).bit_length() - 1
        suffix = "" if alpha == 64 else f"-{alpha}"
        out = os.environ.get(
            "OUT",
            f"/root/repo/plans/sycamore53_m{m}_t{tl}_combo{suffix}.json",
        )
        save_tree(tree, out)
        print(
            f"SAVED {out}: log10F={lf:.3f} log10W={lw:.3f} nsl={nsl}",
            flush=True,
        )


if __name__ == "__main__":
    main()
