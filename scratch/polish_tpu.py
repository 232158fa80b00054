"""Search/polish plans under the chip-calibrated executor objective.

Round-5 successor to plan_tpu_obj.py: instead of a cold hyper search
only, this seeds from every committed plan of the instance and
interleaves (a) fresh slicing-aware hyper trials under minimize="tpu"
with (b) SA + reconfigure polish of the incumbent, accepting by the
lowering simulator's modelled seconds (ops/simulate.py) under a peak-
memory guard (the simulator does not model HBM; 2^28.2 is the measured
v5e ceiling for this workload).

Usage: python scratch/polish_tpu.py [depth] [minutes] [target_log2]
Env: PT_SEED, PT_OUT, PT_MAX_PEAK_LOG2 (default 28.2),
     PT_HYPER_EVERY (default 4).
Writes plans/sycamore53_m{depth}_t{target}_tpu.json on improvement.
"""

import glob
import math
import os
import random
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from scratch.plan_tpu_obj import instance  # noqa: E402


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    minutes = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0
    tgt_log = int(sys.argv[3]) if len(sys.argv) > 3 else 27
    target_size = 2**tgt_log
    seed = int(os.environ.get("PT_SEED", "42"))
    max_peak = float(os.environ.get("PT_MAX_PEAK_LOG2", "28.2"))
    hyper_every = int(os.environ.get("PT_HYPER_EVERY", "4"))

    from cotengra_tpu.hyper.driver import HyperOptimizer
    from cotengra_tpu.pathfinders.annealing import simulated_anneal_tree
    from cotengra_tpu.scoring import parse_minimize
    from cotengra_tpu.utils.io import load_tree, save_tree

    obj = parse_minimize("tpu")
    inputs, output, size_dict = instance(depth)
    rng = random.Random(seed)

    def peak_log2(t):
        return math.log2(max(t.peak_size(), 1))

    def score(t):
        if peak_log2(t) > max_peak:
            return float("inf")
        return obj.estimated_seconds(t)

    out = os.environ.get("PT_OUT") or os.path.join(
        "/root/repo/plans", f"sycamore53_m{depth}_t{tgt_log}_tpu.json"
    )

    best = None
    best_sec = float("inf")
    for pf in sorted(
        glob.glob(f"/root/repo/plans/sycamore53_m{depth}_t*.json")
    ):
        if pf.endswith(".refamp.json"):
            continue
        try:
            t = load_tree(pf, inputs, output, size_dict)
        except Exception as e:
            print(f"# seed {os.path.basename(pf)}: load failed ({e})",
                  flush=True)
            continue
        sec = score(t)
        print(
            f"# seed {os.path.basename(pf)}: log10F="
            f"{t.total_flops(log=10):.2f} nsl={t.multiplicity} "
            f"peak=2^{peak_log2(t):.2f} modelled={sec:.3f}s",
            flush=True,
        )
        if sec < best_sec:
            best, best_sec = t, sec

    saved_sec = best_sec if os.path.exists(out) else float("inf")

    def maybe_save(t, sec, tag):
        nonlocal saved_sec
        if sec < saved_sec - 1e-6:
            save_tree(
                out, t,
                log10_flops=t.total_flops(log=10),
                target_log2=tgt_log,
                planner=f"polish_tpu:{tag}",
                modelled_seconds=sec,
            )
            saved_sec = sec
            print(f"# SAVED {out} ({tag}, modelled={sec:.3f}s)",
                  flush=True)

    # the cheap tree-level hooks CANNOT rank these plan families (gate
    # chains batch ~10 steps into one state pass, realigns and slice
    # overhead are invisible at tree level - measured round 5, see
    # BASELINE.md) - so SA/reconf explore under the classic objectives,
    # which generate the right *move families*, and the lowering
    # simulator is the sole judge of what to keep.
    MOVE_OBJECTIVES = ["flops", "combo", "combo-256", "size", "write"]

    # seed pool for exploration (escape the incumbent's basin)
    pool = [t for t in [best] if t is not None]
    for pf in sorted(
        glob.glob(f"/root/repo/plans/sycamore53_m{depth}_t*.json")
    ):
        if pf.endswith(".refamp.json"):
            continue
        try:
            t = load_tree(pf, inputs, output, size_dict)
            pool.append(t)
        except Exception:
            pass

    opt = HyperOptimizer(
        methods=["greedy"],
        minimize=rng.choice(MOVE_OBJECTIVES),
        optlib="sbplx",
        max_repeats=100000,
        max_time=0,
        parallel=False,
        seed=seed,
        simulated_annealing_opts={"tsteps": 8},
        slicing_reconf_opts={
            "target_size": target_size,
            "reconf_opts": {"subtree_size": 8, "maxiter": 40},
        },
        progbar=False,
    )

    t0 = time.time()
    it = 0
    while time.time() - t0 < minutes * 60:
        it += 1
        if best is None or (hyper_every and it % hyper_every == 0):
            # fresh diversity: one hyper chunk (classic objective moves,
            # simulator-judged below)
            opt.max_time = min(
                120.0, max(minutes * 60 - (time.time() - t0), 30.0)
            )
            try:
                t = opt.search(inputs, output, size_dict)
            except Exception as e:
                print(f"# hyper chunk failed: {e}", flush=True)
                continue
            sec = score(t)
            tag = f"hyper@{len(opt.trials)}"
        else:
            # polish: anneal slices + reconfigure under a sampled move
            # objective, starting from the incumbent or a pool seed
            base = (
                best if rng.random() < 0.6 else rng.choice(pool)
            )
            mv = rng.choice(MOVE_OBJECTIVES)
            mode = rng.choice(["basic", "reslice", "drift"])
            t = simulated_anneal_tree(
                base,
                tsteps=rng.choice([6, 10, 16]),
                numiter=2,
                minimize=mv,
                target_size=target_size,
                mode=mode,
                seed=rng.randrange(2**31),
            )
            t.subtree_reconfigure_(
                subtree_size=rng.choice([6, 8, 10]),
                maxiter=60,
                minimize=mv,
            )
            sec = score(t)
            tag = f"sa-{mode}-{mv}"
        if sec < best_sec:
            best, best_sec = t, sec
            pool.append(t)
        print(
            f"# it={it} {tag}: log10F={t.total_flops(log=10):.3f} "
            f"nsl={t.multiplicity} peak=2^{peak_log2(t):.2f} "
            f"modelled={sec:.3f}s best={best_sec:.3f}s "
            f"elapsed={time.time() - t0:.0f}s",
            flush=True,
        )
        maybe_save(best, best_sec, tag)


if __name__ == "__main__":
    main()
