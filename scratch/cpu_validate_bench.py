"""CPU end-to-end validation of the exact bench.py executor config.

Runs the same staged grouped contractor the bench uses (split_complex +
plane_io + window gate mode + slice batching + operator hoisting) on the
CPU backend at a small depth, and cross-checks the amplitude against a
plain numpy einsum contraction of the same sliced tree.

Usage: python scratch/cpu_validate_bench.py [depth] [target_log2] [slice_batch]
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    tgt = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    sb = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.grouped import (
        make_grouped_staged_contractor,
        to_plane_array,
    )
    from cotengra_tpu.ops.preprocess import absorb_simple_tensors
    from cotengra_tpu.pathfinders.basic import (
        optimize_random_greedy_track_flops,
    )
    from cotengra_tpu.tree import ContractionTree

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
    nsl = tree.multiplicity
    print(f"plan: {tree.describe('full')}")

    # reference amplitude: direct per-slice numpy contraction
    ref = tree.contract(arrays, autojit=False)
    ref = complex(np.asarray(ref))

    core = make_grouped_staged_contractor(
        tree,
        stage_size=8,
        split_complex=True,
        plane_io=True,
        slice_batch=sb if nsl > 1 else None,
        slice_batch_mode="auto",
        gate_mode="window",
    )
    planes = [jnp.asarray(to_plane_array(a)) for a in arrays]
    if nsl > 1:
        acc = None
        for k in range((nsl + sb - 1) // sb):
            ids = jnp.arange(k * sb, min((k + 1) * sb, nsl), dtype=jnp.int32)
            if len(ids) < sb:
                # bench uses full batches only; pad by repeating id 0 and
                # masking is not implemented, so just run partial batch
                core_p = make_grouped_staged_contractor(
                    tree,
                    stage_size=8,
                    split_complex=True,
                    plane_io=True,
                    slice_batch=len(ids),
                    slice_batch_mode="auto",
                    gate_mode="window",
                )
                r = jnp.sum(core_p(planes, ids), axis=0)
            else:
                r = jnp.sum(core(planes, ids), axis=0)
            acc = r if acc is None else acc + r
        amp = np.asarray(acc)
    else:
        amp = np.asarray(core(*planes))
    got = complex(amp[0], amp[1])
    err = abs(got - ref) / max(abs(ref), 1e-300)
    print(f"ref={ref:.6e} got={got:.6e} relerr={err:.2e}")
    assert err < 1e-6, f"MISMATCH relerr={err}"
    print("OK")


if __name__ == "__main__":
    main()
