"""Generate the committed CPU-f64 reference amplitude for a bench plan.

Contracts the same instance bench.py builds (Sycamore-like 53q, seed
42, rank<=2 absorption) with the committed plan's own slice enumeration
in numpy float64, and writes the partial amplitudes over the first-n
slices (for the n values bench.py can select as ``nbench``) to a
``<plan>.refamp.json`` sidecar. bench.py then prints
``relerr_vs_cpu_f64`` next to every on-chip rate.

Usage: python scratch/make_ref_amp.py plans/sycamore53_m10_t27.json
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np


def main():
    plan_file = sys.argv[1]
    m = int(re.search(r"_m(\d+)_", plan_file).group(1))

    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.preprocess import absorb_simple_tensors
    from cotengra_tpu.utils.io import load_tree

    inputs, output, shapes, size_dict, arrays = rand_circuit_tn(
        n_qubits=53, depth=m, seed=42
    )
    inputs, arrays = absorb_simple_tensors(
        inputs, arrays, output, max_rank=2, max_absorb_size=2**12
    )
    size_dict = {
        ix: int(d)
        for term, arr in zip(inputs, arrays)
        for ix, d in zip(term, arr.shape)
    }
    tree = load_tree(plan_file, inputs, output, size_dict)
    nsl = tree.multiplicity
    print(f"plan: {tree.describe('full')}")

    arrays64 = [np.asarray(a, dtype=np.complex128) for a in arrays]
    # the n values bench.py can pick: nbench = min(nsl, max(sb, 16))
    # rounded down to a slice-batch multiple
    # REF_MAX_N caps the slice count (deep plans with big slices: 16
    # covers every nbench bench.py picks at slice_batch <= 16)
    cap = int(os.environ.get("REF_MAX_N", "64"))
    ns = sorted(
        {n for n in (4, 8, 16, 32) if n <= min(nsl, cap)}
        | {min(nsl, cap)}
    )
    out = plan_file[:-5] + ".refamp.json"

    def dump(amps):
        # write after every completed n so a long deep-plan run yields
        # a usable sidecar as soon as the smallest n finishes
        with open(out, "w") as f:
            json.dump(
                {
                    "instance": f"sycamore53_m{m}_seed42_absorb2",
                    "dtype": "complex128",
                    "note": (
                        "partial amplitude over the plan's first-n"
                        " slices"
                    ),
                    "amps": amps,
                },
                f,
                indent=1,
            )
        print(f"wrote {out} (n={max(amps, key=int)})")

    amps = {}
    acc = 0.0 + 0.0j
    done = 0
    for n in ns:
        for i in range(done, n):
            t0 = time.time()
            acc += complex(
                np.asarray(tree.contract_slice(arrays64, i))
            )
            print(f"  slice {i}: {time.time() - t0:.1f}s", file=sys.stderr)
        done = n
        amps[str(n)] = [acc.real, acc.imag]
        print(f"n={n}: {acc:.6e}")
        dump(amps)


if __name__ == "__main__":
    main()
