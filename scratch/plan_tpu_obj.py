"""Plan search under the executor-aware 'tpu' objective (VERDICT r4 #3).

Round 4 proved the flops objective and the chip's actual cost diverge
by >3x (flops-optimal plans are bandwidth-bound in VPU gate chains).
TpuTimeObjective scores each step at its roofline
max(flops, flops_per_elem*(out+lhs+rhs)); this script runs the winning
slicing-aware hyper recipe under it and commits the best plan.

Usage: python scratch/plan_tpu_obj.py [depth] [minutes] [target_log2]
Env: PT_MINIMIZE (default "tpu"), PT_SEED, PT_METHODS, PT_OUT.
Writes plans/sycamore53_m{depth}_t{target}_tpu.json when the modelled
time improves on the existing file (if any). Also prints the modelled
seconds of every committed plan for the same instance, so the chip A/B
has a prediction table to validate the calibration against.
"""

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")


def instance(depth):
    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.preprocess import absorb_simple_tensors

    inputs, output, shapes, size_dict, arrays = rand_circuit_tn(
        n_qubits=53, depth=depth, seed=42
    )
    inputs, arrays = absorb_simple_tensors(
        inputs, arrays, output, max_rank=2, max_absorb_size=2**12
    )
    size_dict = {
        ix: int(d)
        for term, arr in zip(inputs, arrays)
        for ix, d in zip(term, arr.shape)
    }
    return inputs, output, size_dict


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    minutes = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0
    tgt_log = int(sys.argv[3]) if len(sys.argv) > 3 else 27
    target_size = 2**tgt_log
    seed = int(os.environ.get("PT_SEED", "42"))
    minimize = os.environ.get("PT_MINIMIZE", "tpu")

    from cotengra_tpu.hyper.driver import HyperOptimizer
    from cotengra_tpu.scoring import parse_minimize
    from cotengra_tpu.utils.io import load_tree, save_tree

    obj = parse_minimize(minimize)
    inputs, output, size_dict = instance(depth)
    print(f"# instance m={depth}: {len(inputs)} tensors, "
          f"target 2^{tgt_log}, minimize={minimize}", flush=True)

    # model-predicted seconds for every committed plan of this instance
    import glob

    for pf in sorted(
        glob.glob(f"/root/repo/plans/sycamore53_m{depth}_t*.json")
    ):
        if pf.endswith(".refamp.json"):
            continue
        try:
            t = load_tree(pf, inputs, output, size_dict)
        except Exception as e:
            print(f"#   {os.path.basename(pf)}: load failed ({e})")
            continue
        print(
            f"#   {os.path.basename(pf)}: log10F="
            f"{t.total_flops(log=10):.2f} nsl={t.multiplicity} "
            f"modelled={obj.estimated_seconds(t):.3f}s",
            flush=True,
        )

    out = os.environ.get("PT_OUT") or os.path.join(
        "/root/repo/plans", f"sycamore53_m{depth}_t{tgt_log}_tpu.json"
    )
    best_modelled = None
    if os.path.exists(out):
        try:
            prev = load_tree(out, inputs, output, size_dict)
            best_modelled = obj.estimated_seconds(prev)
            print(f"# existing {out}: modelled={best_modelled:.3f}s")
        except Exception as e:
            print(f"# existing plan load failed: {e}")

    methods = os.environ.get("PT_METHODS", "greedy").split(",")
    opt = HyperOptimizer(
        methods=methods,
        minimize=minimize,
        optlib=os.environ.get("PT_OPTLIB", "sbplx"),
        max_repeats=100000,
        max_time=0,
        parallel=False,
        seed=seed,
        simulated_annealing_opts={"tsteps": 10},
        # the driver plumbs `minimize` into slicing/SA/reconf itself
        slicing_reconf_opts={
            "target_size": target_size,
            "reconf_opts": {"subtree_size": 8, "maxiter": 60},
        },
        reconf_opts={"subtree_size": 10, "maxiter": 120},
        progbar=False,
    )

    t0 = time.time()
    while time.time() - t0 < minutes * 60:
        left = minutes * 60 - (time.time() - t0)
        opt.max_time = min(600.0, max(left, 60.0))
        tree = opt.search(inputs, output, size_dict)
        sec = obj.estimated_seconds(tree)
        print(
            f"# chunk: {len(opt.trials)} trials {time.time()-t0:.0f}s "
            f"best log10F={tree.total_flops(log=10):.3f} "
            f"log10W={math.log10(max(tree.total_write(), 1)):.3f} "
            f"nsl=2^{math.log2(max(tree.multiplicity, 1)):.0f} "
            f"modelled={sec:.3f}s",
            flush=True,
        )
        if best_modelled is None or sec < best_modelled - 1e-9:
            save_tree(
                out, tree,
                log10_flops=tree.total_flops(log=10),
                target_log2=tgt_log,
                planner=f"hyper:{','.join(methods)}:{minimize}",
                modelled_seconds=sec,
            )
            print(f"# SAVED {out} ({best_modelled} -> {sec:.3f}s)",
                  flush=True)
            best_modelled = sec


if __name__ == "__main__":
    main()
