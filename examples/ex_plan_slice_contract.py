"""End-to-end: plan a circuit amplitude, slice it to fit memory, contract
on the attached device (the TPU-native analog of the reference's
benchmarking protocol).

Run:  python examples/ex_plan_slice_contract.py [depth]
"""

import sys
import time

import jax.numpy as jnp

import cotengra_tpu as ctg
from cotengra_tpu.models.circuits import rand_circuit_tn
from cotengra_tpu.ops.preprocess import absorb_simple_tensors

depth = int(sys.argv[1]) if len(sys.argv) > 1 else 6

# 1. build a Sycamore-like amplitude tensor network
inputs, output, shapes, size_dict, arrays = rand_circuit_tn(
    n_qubits=30, depth=depth, seed=0
)
inputs, arrays = absorb_simple_tensors(inputs, arrays, output)
size_dict = {
    ix: int(d)
    for term, arr in zip(inputs, arrays)
    for ix, d in zip(term, arr.shape)
}
print(f"{len(inputs)} tensors after preprocessing")

# 2. plan: batched random-greedy then local refinement
t0 = time.time()
ssa, _ = ctg.optimize_random_greedy_track_flops(
    inputs, output, size_dict, ntrials=128, seed=0, use_ssa=True
)
tree = ctg.ContractionTree.from_path(
    inputs, output, size_dict, ssa_path=ssa
)
tree.subtree_reconfigure_(subtree_size=10)
print(f"planned in {time.time() - t0:.2f}s: {tree.describe('full')}")

# 3. slice until the largest intermediate fits comfortably
if tree.max_size() > 2**22:
    tree.slice_and_reconfigure_(2**22)
    print(f"sliced: {tree.describe('full')}")

# 4. contract - one jitted program, slice loop traced inside
arrays = [jnp.asarray(a) for a in arrays]
t0 = time.time()
amp = tree.contract(arrays)
print(f"amplitude = {complex(amp):.6e}  ({time.time() - t0:.2f}s incl. compile)")
