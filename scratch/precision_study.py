"""On-chip multiply-precision accuracy study (TPU_RUNBOOK step 4b).

jax's DEFAULT precision lowers f32 dot_generals to bf16-multiply
(f32-accumulate) passes on TPU, so on-chip amplitudes carry
bf16-multiply error that CPU validation (true f32) cannot see. This
script contracts a depth-m Sycamore-like amplitude on the chip twice -
DEFAULT and HIGHEST matmul precision, same plan, inplace gate mode -
and compares both against the CPU f64 amplitude.

Usage: python scratch/precision_study.py [depth=6] [gate_mode=inplace]
Writes the relerr table to stdout for BASELINE.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(m):
    from cotengra_tpu.models.circuits import rand_circuit_tn
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
        inputs, output, size_dict, ntrials=128, seed=42, use_ssa=True
    )
    tree = ContractionTree.from_path(
        inputs, output, size_dict, ssa_path=ssa_path
    )
    tree.subtree_reconfigure_(subtree_size=10, maxiter=200)
    if tree.max_size() > 2**27:
        tree.slice_and_reconfigure_(
            2**27, reconf_opts={"subtree_size": 6, "maxiter": 20}
        )
    return tree, arrays


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    gm = sys.argv[2] if len(sys.argv) > 2 else "inplace"

    # -- CPU f64 ground truth (subprocess would be cleaner; the axon
    # plugin ignores JAX_PLATFORMS, so compute it via numpy explicitly)
    import numpy as np

    tree, arrays = build(m)
    print(f"plan: {tree.describe('full')}", flush=True)
    arrays64 = [np.asarray(a, np.complex128) for a in arrays]
    nsl = tree.multiplicity
    ref = 0.0 + 0.0j
    for i in range(nsl):
        ref += complex(
            np.asarray(tree.contract_slice(arrays64, i, autojit=False))
        )
    print(f"cpu_f64: {ref:.9e}", flush=True)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cotengra_tpu.ops.grouped import (
        make_grouped_staged_contractor,
        to_plane_array,
    )

    planes = [jnp.asarray(to_plane_array(a)) for a in arrays]
    for prec in (None, "highest"):
        core = make_grouped_staged_contractor(
            tree,
            stage_size=int(os.environ.get("BENCH_STAGE_SIZE", "64")),
            split_complex=True,
            plane_io=True,
            slice_batch=nsl if nsl > 1 else None,
            gate_mode=gm,
            precision=prec,
        )

        def run():
            if nsl > 1:
                ids = jnp.arange(nsl, dtype=jnp.int32)
                return np.asarray(jnp.sum(core(planes, ids), axis=0))
            return np.asarray(core(*planes))

        t0 = time.time()
        amp = run()
        t_compile = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            amp = run()
            best = min(best, time.time() - t0)
        got = complex(amp[0], amp[1])
        rel = abs(got - ref) / abs(ref)
        print(
            f"precision={prec or 'DEFAULT':8s} amp={got:.9e} "
            f"relerr={rel:.3e} time={best * 1e3:.1f}ms "
            f"(compile {t_compile:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
