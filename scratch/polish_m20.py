"""Polish the committed m=20 plan: rounds of drift-SA (slicing-aware)
+ subtree reconfiguration, seeded FROM the committed tree rather than
fresh hyper sampling (449 fresh trials got 19.92; fresh ctgpart rounds
plateaued at 20.4 - the remaining gap to the published ~19.5 regime is
local-refinement depth, so spend cycles there).

Usage: python scratch/polish_m20.py [hours] [target_log2]
Saves plans/sycamore53_m20_t{target}.json whenever improved.
Run at nice 19: the box has one core and the TPU bench owns it.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    hours = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    tgt_log = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    target_size = 2 ** tgt_log

    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.preprocess import absorb_simple_tensors
    from cotengra_tpu.pathfinders.annealing import simulated_anneal_tree
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

    plan_file = os.path.join(
        "/root/repo/plans", f"sycamore53_m20_t{tgt_log}.json"
    )
    tree = load_tree(plan_file, inputs, output, size_dict)
    best = tree.total_flops(log=10)
    print(f"# committed: log10F={best:.4f}", flush=True)

    deadline = time.time() + hours * 3600
    r = 0
    cur = tree.copy()
    while time.time() < deadline:
        r += 1
        t0 = time.time()
        cand = simulated_anneal_tree(
            cur,
            mode="drift",
            target_size=target_size,
            tsteps=60,
            tmax=0.03,
            tmin=0.001,
            numiter=4,
            seed=r,
        )
        if cand.max_size() > target_size:
            cand.slice_and_reconfigure_(
                target_size,
                reconf_opts={"subtree_size": 8, "maxiter": 60},
            )
        cand.subtree_reconfigure_(subtree_size=10, maxiter=150)
        f = cand.total_flops(log=10)
        print(
            f"# round {r}: log10F={f:.4f} (best {best:.4f}) "
            f"[{time.time()-t0:.0f}s]",
            flush=True,
        )
        if f < best - 1e-9:
            best = f
            tree = cand.copy()
            save_tree(
                plan_file, tree,
                log10_flops=best, target_log2=tgt_log,
            )
            print(f"# SAVED improved plan: {best:.4f}", flush=True)
            cur = cand
        elif f < best + 0.15:
            # keep drifting from a near-best candidate (exploration)
            cur = cand
        else:
            cur = tree.copy()
    print(f"# done: best log10F={best:.4f}", flush=True)


if __name__ == "__main__":
    main()
