"""Benchmark: Sycamore-like random-circuit amplitude contraction on TPU.

Plans a 53-qubit depth-``m`` amplitude tensor network with the in-house
pathfinders (random-greedy + subtree reconfiguration), slices it to fit
memory, contracts a batch of slices on the device, and reports the
effective contraction rate in TFLOP/s (complex flops convention: 4x the
scalar-op count, matching reference ``core.py:1219``).

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is the fraction of the north-star target (60% of bf16 matmul
speed-of-light per chip, BASELINE.json).
"""

import json
import os
import sys
import time


def detect_sol_tflops():
    """bf16 matmul speed-of-light of the attached chip."""
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5p")
    table = {"v4": 275.0, "v5e": 197.0, "v5p": 459.0, "v6e": 918.0}
    return table.get(gen, 459.0), gen


def main():
    t_start = time.time()
    import jax

    # persistent compilation cache: the axon/TPU compiler is slow for
    # many-small-op programs (~40x CPU); repeated bench runs hit the cache
    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.executor import make_contractor, slice_arrays
    from cotengra_tpu.pathfinders.basic import (
        optimize_random_greedy_track_flops,
    )
    from cotengra_tpu.tree import ContractionTree

    m = int(os.environ.get("BENCH_DEPTH", "10"))
    seed = 42

    # -- build + preprocess (host) ----------------------------------------
    inputs, output, shapes, size_dict, arrays = rand_circuit_tn(
        n_qubits=53, depth=m, seed=seed
    )
    from cotengra_tpu.ops.preprocess import absorb_simple_tensors

    n_raw = len(inputs)
    absorb_rank = int(os.environ.get("BENCH_ABSORB_RANK", "2"))
    inputs, arrays = absorb_simple_tensors(
        inputs, arrays, output, max_rank=absorb_rank,
        max_absorb_size=2**12,
    )
    size_dict = {
        ix: int(d)
        for term, arr in zip(inputs, arrays)
        for ix, d in zip(term, arr.shape)
    }
    print(
        f"# preprocess: {n_raw} -> {len(inputs)} tensors",
        file=sys.stderr,
    )
    t0 = time.time()
    # winning recipe (beats reference rg-512 and hyper-128 on this
    # instance by ~0.35 log10): native rg-512 -> deep reconfigure -> SA
    ssa_path, lf = optimize_random_greedy_track_flops(
        inputs, output, size_dict, ntrials=512, seed=seed, use_ssa=True
    )
    tree = ContractionTree.from_path(
        inputs, output, size_dict, ssa_path=ssa_path
    )
    tree.subtree_reconfigure_(subtree_size=12, maxiter=500)
    from cotengra_tpu.pathfinders.annealing import simulated_anneal_tree

    for r in range(2):
        cand = simulated_anneal_tree(
            tree, tsteps=40, tmax=0.04, tmin=0.002, seed=r
        )
        cand.subtree_reconfigure_(subtree_size=10, maxiter=200)
        if cand.total_flops() < tree.total_flops():
            tree = cand
    t_plan = time.time() - t0

    # slice to a comfortable intermediate size (2^25 complex64 = 256 MB);
    # smaller targets also keep the axon remote-compile helper within its
    # memory cap on deep circuits
    target_size = 2 ** int(os.environ.get("BENCH_TARGET_SIZE", "25"))
    if tree.max_size() > target_size:
        tree.slice_and_reconfigure_(
            target_size,
            reconf_opts={"subtree_size": 6, "maxiter": 50},
        )

    print(
        f"# plan: {tree.describe('full')} plan_time={t_plan:.1f}s",
        file=sys.stderr,
    )

    # -- execute a batch of slices on device ------------------------------
    arrays = [jnp.asarray(a) for a in arrays]
    core = make_contractor(tree, autojit=True)

    nsl = tree.multiplicity
    nbench = min(nsl, 16)

    def run_slice(i):
        return core(*slice_arrays(tree, arrays, i))

    # the axon remote-compile helper SIGKILLs / times out on large single
    # programs (observed: OK at 2^18 intermediates, dead at >=2^24) - go
    # staged proactively for big cores, with a reactive fallback too
    def build_staged():
        from cotengra_tpu.ops.grouped import (
            make_grouped_staged_contractor,
        )

        ss = int(os.environ.get("BENCH_STAGE_SIZE", "64"))
        fg = bool(int(os.environ.get("BENCH_FUSE_GATES", "0")))
        sp = bool(int(os.environ.get("BENCH_SPLIT", "1")))
        print(
            f"# staged grouped compile ({ss} steps/stage, fuse={fg}, "
            f"split={sp})",
            file=sys.stderr,
        )
        return make_grouped_staged_contractor(
            tree, stage_size=ss, fuse_gates=fg, split_complex=sp
        )

    if tree.max_size() > 2**20:
        # the remote compile helper is slow per-op on large buffers in
        # one big program; many small programs compile reliably
        core = build_staged()

    try:
        out = run_slice(0)
        jax.block_until_ready(out)
    except Exception as exc:
        print(
            f"# compile failed ({type(exc).__name__}); retrying staged",
            file=sys.stderr,
        )
        core = build_staged()
        out = run_slice(0)
        jax.block_until_ready(out)
    t_compile = time.time() - t0 - t_plan

    def timed_pass():
        t1 = time.time()
        acc = None
        for i in range(nbench):
            r = run_slice(i)
            acc = r if acc is None else acc + r
        jax.block_until_ready(acc)
        return time.time() - t1

    # calibrate repeats so each measurement is >= 0.5s of device work
    once = timed_pass()
    reps = max(1, int(0.5 / max(once, 1e-4)))
    best = float("inf")
    for _ in range(5):
        t1 = time.time()
        for _ in range(reps):
            acc = None
            for i in range(nbench):
                r = run_slice(i)
                acc = r if acc is None else acc + r
        jax.block_until_ready(acc)
        best = min(best, (time.time() - t1) / reps)

    flops_per_slice = tree.total_flops(dtype="complex") / nsl
    tflops = flops_per_slice * nbench / best / 1e12

    sol, gen = detect_sol_tflops()
    target = 0.6 * sol
    result = {
        "metric": f"sycamore53_m{m}_contract_tflops_per_chip_{gen}",
        "value": round(tflops, 3),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / target, 4),
    }
    print(
        f"# log10[FLOPs]={tree.total_flops(log=10):.2f} "
        f"nslices={nsl} bench_slices={nbench} time={best:.3f}s "
        f"compile={t_compile:.1f}s total={time.time() - t_start:.1f}s "
        f"SoL({gen})={sol} TFLOP/s",
        file=sys.stderr,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
