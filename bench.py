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

    # -- fail fast if the device is wedged --------------------------------
    # A wedged axon tunnel hangs inside C++ on the first device op with
    # no Python-level recourse; without this guard the driver's bench
    # run blocks forever instead of recording a clear failure.
    import threading

    wd_s = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "600"))
    if wd_s > 0:
        def _probe_died():
            print(
                f"# FATAL: device liveness probe exceeded {wd_s:.0f}s "
                "- TPU tunnel wedged; no measurement possible",
                file=sys.stderr,
            )
            sys.stderr.flush()
            os._exit(3)

        _wd = threading.Timer(wd_s, _probe_died)
        _wd.daemon = True
        _wd.start()
        import numpy as _np

        _x = jnp.ones((256, 256), jnp.float32)
        _v = _np.asarray(_x @ _x)
        assert _np.isfinite(_v).all() and _v[0, 0] == 256.0
        # second round-trip times the warm dispatch+pull path: a healthy
        # tunnel does this in ~25-50 ms. A sick-but-alive tunnel (seen
        # at ~2 s/roundtrip) produces rc=0 with a number that measures
        # the tunnel, not the chip - flag it so the record says so.
        _t0 = time.time()
        _v = _np.asarray(_x @ _x)
        _rt = time.time() - _t0
        _wd.cancel()
        print(
            f"# device probe ok ({jax.devices()[0].platform}), "
            f"roundtrip={_rt * 1e3:.0f}ms"
            + (
                " [TUNNEL DEGRADED: dispatch latency >10x healthy;"
                " timings below measure the tunnel, not the chip]"
                if _rt > 0.5
                else ""
            ),
            file=sys.stderr,
        )

    from cotengra_tpu.models.circuits import rand_circuit_tn
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

    # intermediate-size target: m=10's official plan is UNSLICED (max
    # intermediate 2^28; chip-validated rc=0 — the unsliced program has
    # no scan batching, so the 2^28 scan-OOM does not apply) and a
    # 2^29 target loads it verbatim. m=20's official plan targets 2^28
    # (peak 2^29 chip-validated rc=0 at slice_batch=8: 386 ms/slice vs
    # the previous t27 plan's 460 over the same 2^29 slices). Other
    # depths default to 2^27: 512 MB/plane maximizes arithmetic
    # intensity within v5e HBM for scan-batched sliced programs. Fresh
    # replans (no committed plan) inherit the target as their slicing
    # goal.
    target_size = 2 ** int(
        os.environ.get(
            "BENCH_TARGET_SIZE", {10: "29", 20: "28"}.get(m, "27")
        )
    )

    # deep instances (m=20) need the expensive slicing-aware hyper
    # search (~30 min on one core); its winning plan is checked in under
    # plans/ and validated against the instance content hash on load
    plan_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "plans"
    )
    tgt_log = target_size.bit_length() - 1
    # exact-target plan first, then any higher-target plan (sliced down);
    # BENCH_PLAN pins a specific plan file (A/B of plan variants)
    if os.environ.get("BENCH_PLAN"):
        candidates = [os.environ["BENCH_PLAN"]]
    else:
        candidates = [
            os.path.join(plan_dir, f"sycamore53_m{m}_t{t}.json")
            for t in [tgt_log] + list(range(tgt_log + 1, 33))
        ]
    tree = None
    ref_file = None  # CPU-f64 reference amplitude sidecar, if usable
    if not int(os.environ.get("BENCH_REPLAN", "0")):
        from cotengra_tpu.utils.io import load_tree

        for plan_file in candidates:
            if not os.path.exists(plan_file):
                continue
            try:
                tree = load_tree(plan_file, inputs, output, size_dict)
                print(
                    f"# plan loaded from {plan_file}", file=sys.stderr
                )
            except ValueError as e:
                print(f"# plan cache mismatch: {e}", file=sys.stderr)
                continue
            if tree.max_size() > target_size:
                tree.slice_and_reconfigure_(
                    target_size,
                    reconf_opts={"subtree_size": 6, "maxiter": 30},
                )
            else:
                # plan used verbatim: its slice enumeration matches the
                # committed reference amplitude (scratch/make_ref_amp.py)
                ref_file = plan_file[:-5] + ".refamp.json"
            break

    if tree is None:
        # winning recipe (beats reference rg-512 and hyper-128 on this
        # instance by ~0.35 log10): native rg-512 -> deep reconf -> SA
        ssa_path, lf = optimize_random_greedy_track_flops(
            inputs, output, size_dict, ntrials=512, seed=seed,
            use_ssa=True,
        )
        tree = ContractionTree.from_path(
            inputs, output, size_dict, ssa_path=ssa_path
        )
        tree.subtree_reconfigure_(subtree_size=12, maxiter=500)
        from cotengra_tpu.pathfinders.annealing import (
            simulated_anneal_tree,
        )

        for r in range(2):
            cand = simulated_anneal_tree(
                tree, tsteps=40, tmax=0.04, tmin=0.002, seed=r
            )
            cand.subtree_reconfigure_(subtree_size=10, maxiter=200)
            if cand.total_flops() < tree.total_flops():
                tree = cand
        if tree.max_size() > target_size:
            tree.slice_and_reconfigure_(
                target_size,
                reconf_opts={"subtree_size": 6, "maxiter": 50},
            )
    t_plan = time.time() - t0

    print(
        f"# plan: {tree.describe('full')} plan_time={t_plan:.1f}s",
        file=sys.stderr,
    )

    # -- execute a batch of slices on device ------------------------------
    # HONEST TIMING RULES (learned the hard way on the axon remote
    # backend): executions can fail *silently* - block_until_ready
    # returns promptly on a poisoned buffer without raising, and the
    # error only surfaces (or never does) on a device->host value pull.
    # Additionally complex64 buffers cannot be transferred or (currently)
    # freshly compiled at all. Therefore:
    #   * the device program is complex-free end to end (split_complex +
    #     plane_io: inputs go up as (2,*shape) f32 plane stacks, the
    #     amplitude comes back as f32 planes);
    #   * every timed pass ends in an np.asarray() VALUE PULL, and the
    #     pulled amplitude is checked finite+nonzero and stable across
    #     passes.
    import numpy as np

    from cotengra_tpu.ops.grouped import (
        make_grouped_staged_contractor,
        to_plane_array,
    )

    ss0 = int(os.environ.get("BENCH_STAGE_SIZE", "64"))
    sb0 = int(os.environ.get("BENCH_SLICE_BATCH", "16"))
    fg = bool(int(os.environ.get("BENCH_FUSE_GATES", "0")))
    mode = os.environ.get("BENCH_SLICE_MODE", "auto")
    pdt = os.environ.get("BENCH_PLANE_DTYPE")  # e.g. "bfloat16"
    # gate-chain executor: "inplace" (pallas kernels, measured end-to-end
    # winner and the "auto" default), "window" (MXU dot_generals,
    # opt-in), or "none"
    gm0 = os.environ.get("BENCH_GATE_MODE", "auto")
    # matmul precision: on TPU, DEFAULT lowers f32 dots to bf16
    # multiplies (f32 accumulate), which accumulates to a 4.6%
    # amplitude error across the m=10 contraction (BASELINE.md round-4
    # table); "highest" (true-f32 multi-pass) recovers the f32-storage
    # floor (~1e-6) and, with the scattered pair dot, is faster than
    # the old DEFAULT+realign path ever was. Default: highest.
    # BENCH_MATMUL_PRECISION=default opts back into bf16 multiplies.
    prec = os.environ.get("BENCH_MATMUL_PRECISION", "highest")
    prec = None if prec in ("", "default") else prec

    def attempt(tree, ss, sb, gm):
        """Compile + warm up + time one bench configuration.

        Returns (amp0, best_seconds, nbench, compile_seconds). Raises on
        compile failure or device OOM - the caller degrades and retries.
        A failed device execution on this remote backend surfaces at the
        np.asarray value pull inside run_pass, so every path that can
        OOM is inside this function.
        """
        nsl = tree.multiplicity
        sb = max(1, min(sb, nsl))
        # BENCH_SLICES overrides the measured slice count (e.g. to
        # match a refamp sidecar whose deep-plan CPU-f64 reference only
        # covers the first 8 slices); still a slice-batch multiple
        nbench = int(
            os.environ.get("BENCH_SLICES", "0")
        ) or min(nsl, max(sb, 16))
        nbench = max(sb, (min(nsl, nbench) // sb) * sb)
        print(
            f"# staged grouped compile ({ss} steps/stage, fuse={fg}, "
            f"split+plane_io, slice_batch={sb}, mode={mode}, gate={gm})",
            file=sys.stderr,
        )
        t_c0 = time.time()
        core = make_grouped_staged_contractor(
            tree,
            stage_size=ss,
            fuse_gates=fg,
            split_complex=True,
            plane_io=True,
            plane_dtype=jnp.dtype(pdt) if pdt else None,
            slice_batch=sb if nsl > 1 else None,
            slice_batch_mode=mode,
            gate_mode=None if gm == "none" else gm,
            precision=prec,
        )
        planes = [jnp.asarray(to_plane_array(a)) for a in arrays]
        # parallel AOT stage compile: each stage .compile() releases the
        # GIL during the (server-side) XLA compile, so a thread per
        # stage overlaps the per-program compile floor. Populates the
        # jit + persistent caches; the warmup pass below then hits them.
        pc = int(os.environ.get("BENCH_PRECOMPILE", "0"))
        if pc and hasattr(core, "precompile"):
            t_p0 = time.time()
            if nsl > 1:
                njobs = core.precompile(
                    planes,
                    np.arange(min(sb, nsl), dtype=np.int64),
                )
            else:
                njobs = core.precompile(*planes)
            print(
                f"# precompiled {njobs} stage programs in "
                f"{time.time() - t_p0:.1f}s",
                file=sys.stderr,
            )
        if nsl > 1:
            id_batches = [
                jnp.arange(k * sb, (k + 1) * sb, dtype=jnp.int32)
                for k in range(max(1, nbench // sb))
            ]

            def run_pass():
                # returns the host-side (pulled) partial amplitude planes
                acc = None
                for ids in id_batches:
                    r = jnp.sum(core(planes, ids), axis=0)
                    acc = r if acc is None else acc + r
                return np.asarray(acc)

        else:
            nbench = 1

            def run_pass():
                return np.asarray(core(*planes))

        amp0 = run_pass()  # compile + warmup + correctness anchor
        if not np.all(np.isfinite(amp0)) or not np.any(amp0):
            raise RuntimeError("warmup amplitude not finite/nonzero")
        t_compile = time.time() - t_c0

        best = float("inf")
        for _ in range(int(os.environ.get("BENCH_PASSES", "3"))):
            t1 = time.time()
            amp = run_pass()
            dt = time.time() - t1
            if not np.allclose(amp, amp0, rtol=1e-4, atol=1e-12):
                raise RuntimeError("unstable amplitude between passes")
            best = min(best, dt)
        return amp0, best, nbench, t_compile

    amp0, best, nbench, t_compile = attempt(tree, ss0, sb0, gm0)

    nsl = tree.multiplicity
    flops_per_slice = tree.total_flops(dtype="complex") / nsl
    tflops = flops_per_slice * nbench / best / 1e12

    # -- numerics: error bar vs committed CPU-f64 reference ---------------
    # scratch/make_ref_amp.py contracts the same plan's first-n slices in
    # numpy f64 and commits the partial amplitude next to the plan; every
    # published rate then carries an on-chip amplitude relerr.
    relerr = None
    if ref_file and os.path.exists(ref_file) and not pdt:
        with open(ref_file) as f:
            refs = {int(k): v for k, v in json.load(f)["amps"].items()}
        if nbench in refs:
            ref_amp = complex(*refs[nbench])
            dev_amp = complex(amp0[0], amp0[1])
            relerr = abs(dev_amp - ref_amp) / abs(ref_amp)

    sol, gen = detect_sol_tflops()
    target = 0.6 * sol
    result = {
        "metric": f"sycamore53_m{m}_contract_tflops_per_chip_{gen}",
        "value": round(tflops, 3),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / target, 4),
        # compile latency is a first-class metric: cold-cache budget
        # <=20s for the official m=10 config (BASELINE.md round-5 row)
        "compile_s": round(t_compile, 1),
    }
    print(
        f"# log10[FLOPs]={tree.total_flops(log=10):.2f} "
        f"nslices={nsl} bench_slices={nbench} time={best:.3f}s "
        f"time_to_amplitude={best * nsl / nbench:.3f}s "
        f"compile={t_compile:.1f}s total={time.time() - t_start:.1f}s "
        f"SoL({gen})={sol} TFLOP/s "
        f"amp={complex(amp0[0], amp0[1]):.3e}"
        + (
            f" relerr_vs_cpu_f64={relerr:.2e}"
            if relerr is not None
            else ""
        ),
        file=sys.stderr,
    )
    print(json.dumps(result))


def run_ladder():
    """Runtime-OOM fallback ladder, one subprocess per rung.

    The driver records this script's rc; a live chip must NEVER produce
    rc=1 just because the first-choice configuration exhausts HBM or
    the remote compile helper dies. Crucially the retry MUST be a fresh
    process: on this remote backend a failed (OOM/poisoned) execution's
    buffers are never reclaimed within the owning process - after one
    RESOURCE_EXHAUSTED even a few-MB device_put fails (measured; the
    round-3 crash had the same signature) - but disconnect frees
    everything. Degrade in measured-impact order: smaller slice batch
    -> smaller stage programs -> pallas inplace gate mode -> smaller
    slice target.
    """
    import subprocess

    ss0 = int(os.environ.get("BENCH_STAGE_SIZE", "64"))
    sb0 = int(os.environ.get("BENCH_SLICE_BATCH", "16"))
    gm0 = os.environ.get("BENCH_GATE_MODE", "auto")
    tgt_log = int(os.environ.get("BENCH_TARGET_SIZE", "27"))

    rungs = [{}]
    # slice_batch is the cheapest knob (peak HBM scales with it and the
    # per-slice rate is nearly flat down to 2) - exhaust it first, all
    # the way to 1, before touching anything that changes the program.
    sb_floor = 1
    sb = sb0
    while sb > sb_floor:
        sb = max(sb_floor, sb // 4 if sb > 4 else sb // 2)
        rungs.append({"BENCH_SLICE_BATCH": str(sb)})
    sb_min = str(sb_floor)
    if ss0 > 8:
        rungs.append({"BENCH_SLICE_BATCH": sb_min, "BENCH_STAGE_SIZE": "8"})
    if gm0 not in ("inplace", "none"):
        rungs.append(
            {
                "BENCH_SLICE_BATCH": sb_min,
                "BENCH_STAGE_SIZE": "8",
                "BENCH_GATE_MODE": "inplace",
            }
        )
    if tgt_log > 20:
        rungs.append(
            {
                "BENCH_SLICE_BATCH": sb_min,
                "BENCH_STAGE_SIZE": "8",
                "BENCH_GATE_MODE": "inplace",
                "BENCH_TARGET_SIZE": str(min(26, tgt_log - 1)),
            }
        )

    me = os.path.abspath(__file__)
    for i, over in enumerate(rungs):
        env = dict(os.environ)
        env.update(over)
        env["BENCH_LADDER_CHILD"] = "1"
        if over:
            print(f"# ladder rung {i}: {over}", file=sys.stderr)
        p = subprocess.run(
            [sys.executable, me], env=env,
            stdout=subprocess.PIPE,  # stderr passes straight through
        )
        out = p.stdout.decode(errors="replace")
        if p.returncode == 0:
            for line in reversed(out.splitlines()):
                if line.startswith("{"):
                    print(line)
                    return 0
        if p.returncode == 3:
            # liveness-probe timeout: the tunnel is wedged; retrying
            # other configurations would just burn 10 min per rung
            print("# tunnel wedged; aborting ladder", file=sys.stderr)
            return 3
        print(
            f"# rung {i} failed (rc={p.returncode}); degrading",
            file=sys.stderr,
        )
    return 1


if __name__ == "__main__":
    if os.environ.get("BENCH_LADDER_CHILD") or os.environ.get(
        "BENCH_NO_LADDER"
    ):
        main()
    else:
        sys.exit(run_ladder())
