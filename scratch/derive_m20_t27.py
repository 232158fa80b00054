"""Derive the m=20 2^27 execution plan from the polished t30 plan.

Slices the committed t30 tree (log10F=18.93, 2^23 slices) down to
max_size 2^27 with reconfigure interleaved, then a final drift-SA +
reconfigure polish at the t27 constraint. Replaces
plans/sycamore53_m20_t27.json on improvement over the committed one.

Usage: python scratch/derive_m20_t27.py [minutes]
"""

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 45.0
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
    t30 = load_tree(
        "/root/repo/plans/sycamore53_m20_t30.json",
        inputs, output, size_dict,
    )
    out = "/root/repo/plans/sycamore53_m20_t27.json"
    old = load_tree(out, inputs, output, size_dict)
    best = old.total_flops(log=10)
    print(f"# committed t27: log10F={best:.4f}", flush=True)

    tree = t30.copy()
    t0 = time.time()
    tree.slice_and_reconfigure_(
        2**27, reconf_opts={"subtree_size": 8, "maxiter": 60}
    )
    f = tree.total_flops(log=10)
    print(
        f"# sliced down: log10F={f:.4f} nsl=2^"
        f"{math.log2(tree.multiplicity):.0f} [{time.time()-t0:.0f}s]",
        flush=True,
    )
    if f < best - 1e-9:
        best = f
        save_tree(out, tree, log10_flops=best, target_log2=27)
        print(f"# SAVED: {best:.4f}", flush=True)

    deadline = time.time() + minutes * 60
    cur, r = tree.copy(), 0
    while time.time() < deadline:
        r += 1
        t0 = time.time()
        cand = simulated_anneal_tree(
            cur, mode="drift", target_size=2**27,
            tsteps=60, tmax=0.03, tmin=0.001, numiter=4, seed=r,
        )
        if cand.max_size() > 2**27:
            cand.slice_and_reconfigure_(
                2**27, reconf_opts={"subtree_size": 8, "maxiter": 60}
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
            save_tree(out, tree, log10_flops=best, target_log2=27)
            print(f"# SAVED: {best:.4f}", flush=True)
            cur = cand
        elif f < best + 0.15:
            cur = cand
        else:
            cur = tree.copy()
    print(f"# done: best log10F={best:.4f}", flush=True)


if __name__ == "__main__":
    main()


