"""Quick quality probe: ctgpart vs labels vs greedy trial quality on
the m=20 Sycamore instance (unsliced log10 FLOPs, equal trial counts).

Usage: python scratch/part_quality.py [ntrials] [reconf_size]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    ntrials = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    rsize = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    import numpy as np

    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.preprocess import absorb_simple_tensors
    import cotengra_tpu.hyper as H
    from cotengra_tpu.hyper.driver import _HYPER_FNS, _HYPER_SPACES, _HYPER_CONSTANTS
    from cotengra_tpu.tree import ContractionTree

    inputs, output, shapes, size_dict, arrays = rand_circuit_tn(
        n_qubits=53, depth=20, seed=42
    )
    inputs, arrays = absorb_simple_tensors(
        inputs, arrays, output, max_rank=2, max_absorb_size=2**12
    )
    size_dict = {
        ix: int(d)
        for term, arr in zip(inputs, arrays)
        for ix, d in zip(term, arr.shape)
    }
    print(f"# instance: {len(inputs)} tensors")

    from cotengra_tpu.hyper.space import sample_uniform

    for method in ("ctgpart", "ctgpart-agglom", "labels", "greedy"):
        if method not in _HYPER_FNS:
            print(f"{method}: not registered")
            continue
        fn = _HYPER_FNS[method]
        space = _HYPER_SPACES[method]
        consts = _HYPER_CONSTANTS[method]
        best = np.inf
        scores = []
        t0 = time.time()
        from cotengra_tpu.utils.misc import get_rng
        prng = get_rng(7)
        for t in range(ntrials):
            params = sample_uniform(space, prng)
            params.update(consts or {})
            try:
                ssa = fn(inputs, output, size_dict, seed=int(t), **params)
            except Exception as e:
                print(f"  {method} trial {t} failed: {e}")
                continue
            tree = ContractionTree.from_path(
                inputs, output, size_dict, ssa_path=ssa
            )
            if rsize:
                tree.subtree_reconfigure_(subtree_size=rsize, maxiter=80)
            lf = tree.total_flops(log=10)
            scores.append(lf)
            best = min(best, lf)
        dt = time.time() - t0
        print(
            f"{method:16s} best={best:.3f} "
            f"med={np.median(scores):.3f} n={len(scores)} "
            f"({dt:.1f}s)"
        )


if __name__ == "__main__":
    main()
