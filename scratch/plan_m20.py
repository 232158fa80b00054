"""m=20 plan search: slicing-aware hyper optimization with the native
partitioner in the method pool.

Round-2 recipe (449 trials of greedy+labels, sbplx) reached
log10F=19.92 @ 2^30. Round-3 adds the ctgpart multilevel partitioner
(the kahypar-quality slot named by BASELINE.md:66-68 as the blocker to
the published ~19.5 regime).

Usage: python scratch/plan_m20.py [minutes] [target_log2]
Env: M20_METHODS (csv), M20_OPTLIB, M20_SEED.
Writes plans/sycamore53_m20_t{target}.json when improving on the
committed plan.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    tgt_log = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    target_size = 2 ** tgt_log
    seed = int(os.environ.get("M20_SEED", "42"))

    from cotengra_tpu.hyper.driver import HyperOptimizer
    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.preprocess import absorb_simple_tensors
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
    print(f"# instance: {len(inputs)} tensors, target 2^{tgt_log}")

    plan_file = os.path.join(
        "/root/repo/plans", f"sycamore53_m20_t{tgt_log}.json"
    )
    best_flops = None
    if os.path.exists(plan_file):
        try:
            prev = load_tree(plan_file, inputs, output, size_dict)
            best_flops = prev.total_flops(log=10)
            print(f"# committed plan: log10F={best_flops:.3f} "
                  f"nslices=2^{prev.nslices_log2:.0f}"
                  if hasattr(prev, 'nslices_log2') else
                  f"# committed plan: log10F={best_flops:.3f}")
        except Exception as e:
            print(f"# committed plan load failed: {e}")

    methods = os.environ.get(
        "M20_METHODS", "greedy,ctgpart"
    ).split(",")
    optlib = os.environ.get("M20_OPTLIB", "sbplx")

    opt = HyperOptimizer(
        methods=methods,
        optlib=optlib,
        max_repeats=100000,
        max_time=0,  # set per chunk below
        parallel=False,
        seed=seed,
        simulated_annealing_opts={"tsteps": 10},
        slicing_reconf_opts={
            "target_size": target_size,
            "reconf_opts": {"subtree_size": 8, "maxiter": 60},
        },
        reconf_opts={"subtree_size": 10, "maxiter": 120},
        progbar=False,
    )
    import math
    from collections import Counter

    # chunked search with INCREMENTAL saves: the optimizer accumulates
    # trials across .search() calls, and every improving chunk commits
    # the plan to disk immediately (a crash / kill / TPU-recovery stop
    # then loses at most one chunk of progress)
    t0 = time.time()
    chunk_s = 600.0
    while time.time() - t0 < minutes * 60:
        left = minutes * 60 - (time.time() - t0)
        opt.max_time = min(chunk_s, max(left, 60.0))
        tree = opt.search(inputs, output, size_dict)
        f = tree.total_flops(log=10)
        print(
            f"# chunk done: {len(opt.trials)} trials "
            f"{time.time()-t0:.0f}s best log10F={f:.3f} "
            f"nslices=2^{math.log2(max(tree.multiplicity, 1)):.0f}",
            flush=True,
        )
        if best_flops is None or f < best_flops - 1e-9:
            save_tree(
                plan_file, tree,
                log10_flops=f, target_log2=tgt_log,
                planner=f"hyper:{','.join(methods)}:{optlib}",
            )
            print(
                f"# SAVED improved plan to {plan_file} "
                f"({best_flops} -> {f:.3f})",
                flush=True,
            )
            best_flops = f

    cnt = Counter(t.get("method") for t in opt.trials)
    top = sorted(opt.trials, key=lambda t: t["score"])[:10]
    print(f"# methods sampled: {dict(cnt)}")
    print(f"# top-10 methods: {[t.get('method') for t in top]}")


if __name__ == "__main__":
    main()
