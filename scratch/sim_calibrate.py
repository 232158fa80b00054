"""Lower the measured m=10 plans through the real grouped planner and
tally per-engine work, to calibrate a roofline time model (round 5).

Measured on chip (v5e, HIGHEST, split+plane_io, multipass on):
  official  (log10F=11.20, 8 sl):  1.185-1.206 s  -> ~148 ms/slice
  combo     (log10F=11.78, 16 sl): 1.843 s        -> ~115 ms/slice
  combo-256 (log10F=12.13, 4 sl):  1.403-1.407 s  -> ~351 ms/slice
Profiles: official ~58% gate chains / 37% realign copies;
combo-256 ~57% formatting / 30% MXU dots (91 ms conv, 175 ms copies).
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from scratch.plan_tpu_obj import instance  # noqa: E402

from cotengra_tpu.utils.io import load_tree  # noqa: E402
from cotengra_tpu.ops.simulate import simulate_grouped  # noqa: E402

inputs, output, size_dict = instance(10)

MEASURED = {
    "plans/sycamore53_m10_t27.json": 1.19,
    "plans/sycamore53_m10_t27_combo.json": 1.843,
    "plans/sycamore53_m10_t27_combo-256.json": 1.405,
    "plans/sycamore53_m10_t27_tpu.json": None,
}

for pf, meas in MEASURED.items():
    try:
        tree = load_tree("/root/repo/" + pf, inputs, output, size_dict)
    except Exception as e:
        print(f"{pf}: load failed ({e})")
        continue
    rep = simulate_grouped(tree, detail=True)
    print(f"== {pf}")
    print(f"   nsl={tree.multiplicity} log10F={tree.total_flops(log=10):.2f}")
    for k, v in sorted(rep.items()):
        print(f"   {k}: {v}")
    if meas:
        print(f"   modelled={rep['seconds']:.3f}s measured={meas}s "
              f"ratio={rep['seconds'] / meas:.2f}")
