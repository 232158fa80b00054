"""Roofline wall-clock simulator over the REAL grouped lowering.

Round 4 proved that search objectives built from tree-level quantities
(flops, write) and the chip's actual cost diverge by several x: the
flops-optimal m=10 plan is bandwidth-bound in pallas gate chains, the
"write-optimized" combo plans are bound by realign copies, and a
roofline of ``max(flops/MXU, operand_bytes/HBM)`` mispredicted their
A/B by an order of magnitude (it said combo-256 would win 6.4x; it
measured 1.17x *slower*).

The fix is to model what the executor actually lowers, not the tree:
this module runs the real host-side planner (:func:`plan_grouped` -
the exact code path the staged contractor uses) and prices each planned
op at its engine's *measured* operating point:

- pallas gate chains stream the state through VMEM once per chain and
  run at pallas's own DMA ceiling (~163 GB/s measured, sweep-limited
  when many gates share a chain) - NOT at the chip's HBM bandwidth;
- realign block transposes are XLA formatting copies; multipass
  sequences multiply traffic by ``passes_cost`` and padding by the
  trailing-dim lane factors (``transpose_synth.padf``);
- pair dots run 4 real matmuls per complex contraction (split planes)
  at the MXU's measured effective f32-HIGHEST rate, or stall on operand
  streaming for skinny shapes;
- every executed stage costs one host dispatch over the tunnel.

Constants below are calibrated against the round-4/5 chip measurements
of three structurally different m=10 plans (flops-optimal 1.19 s, combo
1.84 s, combo-256 1.40 s; per-op profiles in ``docs/DESIGN.md`` and
``/tmp/prof_combo256*.log``). See ``scratch/sim_calibrate.py``.

This is the "executor's own time model" the reference's Objective
protocol gets extended with (reference hook surface:
``cotengra/scoring.py:50-75``; the reference itself has no executor
model - its contractor trusts FLOP counts, ``contract.py:718-837``).
"""

import math
import os

from ..utils.misc import prod
from .lowering import SingleStep, extract_contractions, sliced_input_legs


# v5e measured operating points (see module docstring; re-calibrate per
# chip generation with scratch/sim_calibrate.py). With these, the three
# measured m=10 plans reproduce at 1.18/1.71/1.26 s vs 1.19/1.84/1.40
# measured - right order, <10% absolute error.
V5E_CONSTANTS = {
    # pallas in-place gate-chain kernels: state read+write per chain,
    # including their flat<->view retile copies (measured 10.4 GB in
    # 82 ms/slice on the official plan)
    "chain_gbps": 127.0,
    # VPU MAC sweeps inside a chain; only binds for gate-dense chains
    "chain_vpu_gmacs": 3000.0,
    # XLA data-formatting copies: realign block transposes and
    # scattered-operand materializations (53 GB in 175 ms/slice,
    # combo-256 profile)
    "copy_gbps": 300.0,
    # dot_general operand/result streaming
    "dot_gbps": 400.0,
    # MXU peak on well-tiled shapes, f32 HIGHEST (6-pass bf16);
    # de-rated by lane utilization min(1, K/128) * min(1, N/128)
    "mxu_tflops": 35.0,
    # fixed per-slice cost: scan-mode dynamic-update-slice, per-slice
    # reduce/loop fusions, exponent strips (all three plan profiles
    # carry ~30-40 ms/slice not attributable to chains/copies/dots)
    "slice_overhead_s": 0.035,
    # host->device dispatch per compiled stage (tunnel round trip)
    "dispatch_s": 0.020,
    # bytes per stored plane element (split-complex f32)
    "plane_bytes": 4,
    # scattered dots whose stored view's trailing dim is below this
    # materialize a lane-padded operand copy (chip-measured: >=64
    # folds into the MXU load with zero temp)
    "scatter_fold_min_trail": 64,
}


def _copy_traffic(nelem, plan, plane_bytes):
    """Padded element-traffic (read+write, both planes) of one realign
    block transpose, mirroring ``_apply_block_plan_split``'s choice of
    single-copy vs multipass lowering."""
    from .grouped import SMALL_T_MATMUL_MAX, _multipass_plan
    from .transpose_synth import padf, passes_cost

    if plan is None:
        return 0.0
    block_dims, perm = plan
    if 2 * nelem <= 2 * SMALL_T_MATMUL_MAX:
        # small tensors go through the one-hot-matmul path; bounded
        # absolute cost, count the unpadded read+write
        return 2.0 * 2 * nelem
    # passes_cost / the padf sum already count read + write per pass
    passes = _multipass_plan(nelem * plane_bytes, block_dims, perm)
    if passes is not None:
        return nelem * passes_cost(passes)
    return nelem * (padf(block_dims[-1]) + padf(block_dims[perm[-1]]))


def simulate_grouped(
    tree,
    constants=None,
    stage_size=64,
    gate_mode="inplace",
    detail=False,
):
    """Modelled wall-clock seconds of ``tree.contract`` on the grouped
    TPU executor (all slices, one pass, slice-batched), from the real
    per-step plans.

    Returns the modelled seconds; with ``detail=True`` returns a dict
    with the per-engine breakdown (per-slice seconds by bucket, traffic
    and flop tallies) for calibration and regression tables.
    """
    from .grouped import _chain_combo_sum, plan_grouped

    c = dict(V5E_CONSTANTS)
    if constants:
        c.update(constants)
    pb = c["plane_bytes"]
    chain_bw = c["chain_gbps"] * 1e9
    copy_bw = c["copy_gbps"] * 1e9
    dot_bw = c["dot_gbps"] * 1e9
    mxu = c["mxu_tflops"] * 1e12
    vpu = c["chain_vpu_gmacs"] * 1e9

    # mirror the executor's CTG_PEAK_ORDER scheduling knob so the model
    # prices the same step order the chip would run
    order = (
        tree.peak_optimized_order()
        if os.environ.get("CTG_PEAK_ORDER", "0") == "1"
        else None
    )
    ir = extract_contractions(tree, order=order)
    input_orders = [sliced_input_legs(tree, i) for i in range(tree.N)]
    plans, storage, out_plan, out_shape, _ = plan_grouped(
        ir, tree.size_dict, input_orders, gate_mode=gate_mode
    )
    sizes = tree.size_dict

    chain_s = copy_s = dot_s = other_s = 0.0
    copy_bytes = dot_flops = chain_bytes = 0.0

    for kind, info in plans:
        if kind == "pair" or kind == "fusedchain":
            if kind == "pair":
                B, M, K, N = info.B, info.M, info.K, info.N
                x_elems = B * M * K
                y_elems = B * K * N
            else:
                B, (M, K, N) = 1, (info.M, info.K, info.N)
                x_elems = M * K
                y_elems = K * N
            t = _copy_traffic(x_elems, info.x_plan, pb)
            t += _copy_traffic(
                y_elems, getattr(info, "y_plan", None), pb
            )
            if getattr(info, "scatter", None) is not None:
                # un-realigned scattered-K dot: zero copy when the
                # stored view's trailing dim folds into the MXU load,
                # else XLA materializes a lane-padded operand
                from .transpose_synth import padf

                trail = info.scatter[0][-1]
                if trail < c["scatter_fold_min_trail"]:
                    t += x_elems * (1.0 + padf(trail))
            cb = t * 2 * pb  # two planes
            copy_bytes += cb
            copy_s += cb / copy_bw
            flops = 8.0 * B * M * K * N
            util = min(1.0, K / 128.0) * min(1.0, N / 128.0)
            stream = 2 * pb * (x_elems + y_elems + B * M * N)
            dot_flops += flops
            dot_s += max(flops / (mxu * util), stream / dot_bw)
        elif kind == "inplace" or kind == "window":
            s_out = prod(info.out_shape) if kind == "inplace" else prod(
                tuple(sizes[ix] for ix in info.out_order)
            )
            cb = 2 * 2 * pb * s_out  # read+write, two planes
            chain_bytes += cb
            combo = (
                _chain_combo_sum(info.spec)
                if kind == "inplace"
                else sum(g[3] for g in info.gates)
            )
            chain_s += max(cb / chain_bw, s_out * combo / vpu)
        elif kind == "single":
            s_out = prod(tuple(sizes[ix] for ix in info.out_legs))
            other_s += 2 * 2 * pb * s_out / copy_bw
        else:  # fallback
            step = info[0]
            sx = prod(info[5])
            sy = prod(info[6])
            so = prod(tuple(sizes[ix] for ix in step.out_legs))
            other_s += 2 * pb * 2 * (sx + sy + so) / copy_bw

    if out_plan is not None:
        cb = _copy_traffic(prod(out_shape), out_plan, pb) * 2 * pb
        copy_bytes += cb
        copy_s += cb / copy_bw

    per_slice = (
        chain_s + copy_s + dot_s + other_s + c["slice_overhead_s"]
    )
    nsl = tree.multiplicity
    n_stages = max(1, math.ceil(len(plans) / max(stage_size, 1)))
    seconds = nsl * per_slice + n_stages * c["dispatch_s"]

    if not detail:
        return seconds
    return {
        "seconds": seconds,
        "per_slice_s": per_slice,
        "nslices": nsl,
        "n_plans": len(plans),
        "n_stages": n_stages,
        "chain_s": chain_s,
        "copy_s": copy_s,
        "dot_s": dot_s,
        "other_s": other_s,
        "chain_gb": chain_bytes / 1e9,
        "copy_gb": copy_bytes / 1e9,
        "dot_tflop": dot_flops / 1e12,
    }
