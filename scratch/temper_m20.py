"""m=20 plan quality: parallel tempering from the best committed plan.

The drift-SA polish plateaued at log10F=19.9152 for 500+ rounds;
tempering runs a ladder of temperatures with periodic best-exchange to
escape that local basin (VERDICT round-3 item 6: scale the winning
greedy+SA recipe, not ctgpart). Saves into the committed t30 plan on
improvement, like scratch/polish_m20.py.

Usage: python scratch/temper_m20.py [minutes] [target_log2]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    tgt_log = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    target_size = 2**tgt_log
    seed = int(os.environ.get("M20_SEED", "7"))

    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.preprocess import absorb_simple_tensors
    from cotengra_tpu.pathfinders.annealing import parallel_temper_tree
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
    plan_file = f"/root/repo/plans/sycamore53_m20_t{tgt_log}.json"
    tree = load_tree(plan_file, inputs, output, size_dict)
    best = tree.total_flops(log=10)
    best_tree = tree
    print(f"# committed: log10F={best:.4f}", flush=True)

    t_end = time.time() + minutes * 60
    r = 0
    while time.time() < t_end:
        r += 1
        t0 = time.time()
        cand = parallel_temper_tree(
            best_tree,
            num_replicas=4,
            tmax=0.08,
            tmin=0.002,
            rounds=4,
            tsteps_per_round=10,
            target_size=target_size,
            seed=seed + r,
            mode="drift",
        )
        cand.subtree_reconfigure_(subtree_size=10, maxiter=300)
        if cand.max_size() > target_size:
            cand.slice_(target_size=target_size)
        f = cand.total_flops(log=10)
        print(
            f"# temper round {r}: log10F={f:.4f} (best {best:.4f}) "
            f"[{time.time() - t0:.0f}s]",
            flush=True,
        )
        if f < best - 1e-9:
            best = f
            best_tree = cand
            save_tree(
                plan_file, cand, log10_flops=best, target_log2=tgt_log
            )
            print(f"# SAVED improved plan: {best:.4f}", flush=True)
    print(f"# done: best log10F={best:.4f}", flush=True)


if __name__ == "__main__":
    main()
