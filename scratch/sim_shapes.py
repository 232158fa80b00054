"""Print per-dot shapes and per-plan bucket tallies of the measured
m=10 plans, to design the MXU utilization model."""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from scratch.plan_tpu_obj import instance  # noqa: E402

from cotengra_tpu.utils.io import load_tree  # noqa: E402
from cotengra_tpu.ops.lowering import (  # noqa: E402
    extract_contractions,
    sliced_input_legs,
)
from cotengra_tpu.ops.grouped import plan_grouped  # noqa: E402

inputs, output, size_dict = instance(10)

for pf in (
    "plans/sycamore53_m10_t27.json",
    "plans/sycamore53_m10_t27_combo.json",
    "plans/sycamore53_m10_t27_combo-256.json",
):
    tree = load_tree("/root/repo/" + pf, inputs, output, size_dict)
    ir = extract_contractions(tree)
    input_orders = [sliced_input_legs(tree, i) for i in range(tree.N)]
    plans, storage, out_plan, out_shape, _ = plan_grouped(
        ir, tree.size_dict, input_orders, gate_mode="inplace"
    )
    from collections import Counter

    kinds = Counter(k for k, _ in plans)
    print(f"== {pf} nsl={tree.multiplicity} kinds={dict(kinds)}")
    dots = []
    for kind, info in plans:
        if kind == "pair":
            fl = 8 * info.B * info.M * info.K * info.N
            dots.append(
                (fl, info.B, info.M, info.K, info.N, info.mode,
                 "scat" if info.scatter else
                 ("re" if info.x_plan is not None else "ok"))
            )
    dots.sort(reverse=True)
    for d in dots[:14]:
        print(f"   flops={d[0]:.3e} B={d[1]} M={d[2]} K={d[3]} "
              f"N={d[4]} {d[5]} x:{d[6]}")
    tot = sum(d[0] for d in dots)
    print(f"   total pair flops/slice = {tot:.3e} "
          f"({len(dots)} pair steps)")
