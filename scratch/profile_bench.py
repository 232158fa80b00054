"""Profile the bench workload: device-time by op category + host-side
flops-by-plan-kind breakdown.

Usage: python scratch/profile_bench.py [depth]
Env: BENCH_TARGET_SIZE, BENCH_SLICE_BATCH, BENCH_PLANE_DTYPE as in bench.py.
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def build_tree(m, target_size, seed=42):
    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.preprocess import absorb_simple_tensors
    from cotengra_tpu.pathfinders.basic import (
        optimize_random_greedy_track_flops,
    )
    from cotengra_tpu.tree import ContractionTree

    inputs, output, shapes, size_dict, arrays = rand_circuit_tn(
        n_qubits=53, depth=m, seed=seed
    )
    inputs, arrays = absorb_simple_tensors(
        inputs, arrays, output, max_rank=2, max_absorb_size=2**12
    )
    size_dict = {
        ix: int(d)
        for term, arr in zip(inputs, arrays)
        for ix, d in zip(term, arr.shape)
    }
    plan_dir = "/root/repo/plans"
    tgt_log = target_size.bit_length() - 1
    tree = None
    from cotengra_tpu.utils.io import load_tree

    if os.environ.get("BENCH_PLAN"):
        candidates = [os.environ["BENCH_PLAN"]]
    else:
        candidates = [
            os.path.join(plan_dir, f"sycamore53_m{m}_t{t}.json")
            for t in [tgt_log] + list(range(tgt_log + 1, 33))
        ]
    for pf in candidates:
        if os.path.exists(pf):
            try:
                tree = load_tree(pf, inputs, output, size_dict)
            except ValueError:
                continue
            if tree.max_size() > target_size:
                tree.slice_and_reconfigure_(
                    target_size,
                    reconf_opts={"subtree_size": 6, "maxiter": 30},
                )
            break
    if tree is None:
        ssa_path, lf = optimize_random_greedy_track_flops(
            inputs, output, size_dict, ntrials=512, seed=seed,
            use_ssa=True,
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
        if tree.max_size() > target_size:
            tree.slice_and_reconfigure_(
                target_size, reconf_opts={"subtree_size": 6, "maxiter": 50}
            )
    return tree, arrays


def plan_flops_breakdown(tree):
    """Host-side: complex-flops by plan kind (per slice)."""
    from cotengra_tpu.ops.lowering import (
        extract_contractions, sliced_input_legs,
    )
    from cotengra_tpu.ops.grouped import plan_grouped
    from cotengra_tpu.utils.misc import prod

    ir = extract_contractions(tree)
    input_orders = [sliced_input_legs(tree, i) for i in range(tree.N)]
    plans, storage, out_plan, out_shape, last_use = plan_grouped(
        ir, tree.size_dict, input_orders, inplace_gates=True
    )
    by_kind = {}
    details = []
    for kind, info in plans:
        if kind == "pair":
            f = 8 * info.B * info.M * info.K * info.N
            key = f"pair:{info.mode}"
            details.append((key, f, (info.B, info.M, info.K, info.N)))
        elif kind == "inplace":
            f = 0
            for (y_id, y_plan, K, N) in info.ys:
                # big-tensor size ~ M*K per gate
                M = prod(info.out_shape) // max(N, 1)
                f += 8 * M * K * N
            key = f"inplace[{len(info.ys)}g]"
            details.append((key, f, info.out_shape))
        elif kind == "fusedchain":
            f = 8 * info.M * info.K * info.N
            key = "fusedchain"
            details.append((key, f, (info.M, info.K, info.N)))
        elif kind == "fallback":
            step, x_id, y_id, x_order, y_order, x_dims, y_dims = info
            sizes = tree.size_dict
            all_legs = set(x_order) | set(y_order)
            f = 8 * prod(sizes[ix] for ix in all_legs)
            key = "fallback"
            details.append((key, f, None))
        else:
            key = "single"
            f = 0
        by_kind[key] = by_kind.get(key, 0) + f
    return by_kind, details


def parse_trace(logdir):
    files = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    if not files:
        print("no trace files found under", logdir)
        return
    f = max(files, key=os.path.getmtime)
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    evs = data.get("traceEvents", [])
    # find device lanes: pid names containing "TPU" / thread "XLA Op"
    cat_time = {}
    op_time = {}
    total = 0.0
    for e in evs:
        if e.get("ph") != "X":
            continue
        args = e.get("args") or {}
        hlo_cat = args.get("hlo_category")
        if hlo_cat is None:
            continue
        dur = e.get("dur", 0) / 1e6  # seconds
        name = e.get("name", "")
        cat_time[hlo_cat] = cat_time.get(hlo_cat, 0.0) + dur
        k = (hlo_cat, name.split(".")[0])
        op_time[k] = op_time.get(k, 0.0) + dur
        total += dur
    print(f"\n== device op time (total {total*1e3:.1f} ms) ==")
    for c, t in sorted(cat_time.items(), key=lambda kv: -kv[1]):
        print(f"  {c:40s} {t*1e3:9.1f} ms  {100*t/total:5.1f}%")
    print("\n== top ops ==")
    for (c, n), t in sorted(op_time.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {t*1e3:9.1f} ms  [{c}] {n}")


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache"
    )
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", 1.0
    )
    import jax.numpy as jnp
    import numpy as np

    from cotengra_tpu.ops.grouped import (
        make_grouped_staged_contractor, to_plane_array,
    )

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    target_size = 2 ** int(os.environ.get("BENCH_TARGET_SIZE", "27"))
    tree, arrays = build_tree(m, target_size)
    print(f"plan: {tree.describe('full')}")

    if os.environ.get("FLOPS_BREAKDOWN"):
        by_kind, details = plan_flops_breakdown(tree)
        tot = sum(by_kind.values())
        print(f"\n== per-slice flops by plan kind (total {tot:.3e}) ==")
        for k, f in sorted(by_kind.items(), key=lambda kv: -kv[1]):
            print(f"  {k:20s} {f:.3e}  {100*f/tot:5.1f}%")
        print("\n== biggest steps ==")
        for k, f, shape in sorted(details, key=lambda d: -d[1])[:15]:
            print(f"  {f:.3e}  {k}  {shape}")

    if os.environ.get("SKIP_DEVICE"):
        return

    nsl = tree.multiplicity
    sb = max(1, min(int(os.environ.get("BENCH_SLICE_BATCH", "8")), nsl))
    pdt = os.environ.get("BENCH_PLANE_DTYPE")
    core = make_grouped_staged_contractor(
        tree,
        stage_size=int(os.environ.get("BENCH_STAGE_SIZE", "64")),
        split_complex=True,
        plane_io=True,
        plane_dtype=jnp.dtype(pdt) if pdt else None,
        slice_batch=sb if nsl > 1 else None,
        slice_batch_mode=os.environ.get("BENCH_SLICE_MODE", "auto"),
        precision=(
            None
            if os.environ.get("BENCH_MATMUL_PRECISION", "highest")
            in ("", "default")
            else os.environ.get("BENCH_MATMUL_PRECISION", "highest")
        ),
    )
    planes = [jnp.asarray(to_plane_array(a)) for a in arrays]
    ids = jnp.arange(0, sb, dtype=jnp.int32)

    def run_pass():
        if nsl > 1:
            return np.asarray(jnp.sum(core(planes, ids), axis=0))
        return np.asarray(core(*planes))

    t0 = time.time()
    amp0 = run_pass()
    print(f"\nwarmup(compile): {time.time()-t0:.1f}s amp={amp0}")
    assert np.all(np.isfinite(amp0)) and np.any(amp0)
    t0 = time.time()
    amp = run_pass()
    dt = time.time() - t0
    print(f"pass: {dt*1e3:.1f} ms for {sb} slices "
          f"({dt/sb*1e3:.1f} ms/slice)")

    logdir = "/tmp/ctg_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    amp = run_pass()
    jax.profiler.stop_trace()
    assert np.allclose(amp, amp0, rtol=1e-4, atol=1e-12)
    parse_trace(logdir)


if __name__ == "__main__":
    main()
