"""Quantify the amplitude error of reduced-precision plane storage.

Runs the exact bench executor config (split_complex + plane_io + window
gate mode) on CPU with plane_dtype in {float64, float32, bfloat16} and
reports the relative amplitude error of each vs the f64 run, per depth.
Storage rounding dominates (the windowed matmuls accumulate in f32 even
under bf16 planes - see ops/windowed.exec_window), so the error grows
with chain depth; this measures that growth on the real Sycamore-like
instances.

Usage: python scratch/bf16_error.py [depths csv] [target_log2]
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def amplitude(tree, arrays, plane_dtype):
    from cotengra_tpu.ops.grouped import (
        make_grouped_staged_contractor,
        to_plane_array,
    )

    nsl = tree.multiplicity
    sb = min(8, nsl) if nsl > 1 else None
    core = make_grouped_staged_contractor(
        tree,
        stage_size=8,
        split_complex=True,
        plane_io=True,
        plane_dtype=plane_dtype,
        slice_batch=sb,
        slice_batch_mode="auto",
        gate_mode="window",
    )
    planes = [jnp.asarray(to_plane_array(a)) for a in arrays]
    if nsl > 1:
        acc = None
        for k in range(nsl // sb):
            ids = jnp.arange(k * sb, (k + 1) * sb, dtype=jnp.int32)
            r = jnp.sum(core(planes, ids), axis=0)
            acc = r if acc is None else acc + r
        amp = np.asarray(acc, dtype=np.float64)
    else:
        amp = np.asarray(core(*planes), dtype=np.float64)
    return complex(amp[0], amp[1])


def main():
    depths = [int(d) for d in (sys.argv[1] if len(sys.argv) > 1 else "4,6,8").split(",")]
    tgt = int(sys.argv[2]) if len(sys.argv) > 2 else 18

    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.preprocess import absorb_simple_tensors
    from cotengra_tpu.pathfinders.basic import (
        optimize_random_greedy_track_flops,
    )
    from cotengra_tpu.tree import ContractionTree

    print("depth  nslices  relerr(f32)  relerr(bf16)")
    for m in depths:
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
        ssa_path, _ = optimize_random_greedy_track_flops(
            inputs, output, size_dict, ntrials=64, seed=42, use_ssa=True
        )
        tree = ContractionTree.from_path(
            inputs, output, size_dict, ssa_path=ssa_path
        )
        tree.subtree_reconfigure_(subtree_size=8, maxiter=60)
        if tree.max_size() > 2**tgt:
            tree.slice_and_reconfigure_(
                2**tgt, reconf_opts={"subtree_size": 6, "maxiter": 20}
            )
        ref = amplitude(tree, arrays, jnp.float64)
        e32 = abs(amplitude(tree, arrays, jnp.float32) - ref) / abs(ref)
        ebf = abs(amplitude(tree, arrays, jnp.bfloat16) - ref) / abs(ref)
        print(
            f"{m:5d}  {tree.multiplicity:7d}  {e32:11.2e}  {ebf:12.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
