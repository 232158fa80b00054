"""Compare the committed m=20 t27 plan against slicing the (newer,
much better) t30 plan down to 2^27 — if the latter wins, the stale t27
plan should be replaced so BENCH_TARGET_SIZE=27 uses the better path.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.preprocess import absorb_simple_tensors
    from cotengra_tpu.utils.io import load_tree, save_tree

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

    t27 = load_tree(
        "/root/repo/plans/sycamore53_m20_t27.json", inputs, output, size_dict
    )
    import math

    print(
        f"t27 committed: log10F={t27.total_flops(log=10):.3f} "
        f"nslices=2^{math.log2(max(t27.multiplicity, 1)):.0f} "
        f"width=2^{math.log2(t27.max_size()):.0f}",
        flush=True,
    )

    t30 = load_tree(
        "/root/repo/plans/sycamore53_m20_t30.json", inputs, output, size_dict
    )
    print(
        f"t30 committed: log10F={t30.total_flops(log=10):.3f} "
        f"nslices=2^{math.log2(max(t30.multiplicity, 1)):.0f}",
        flush=True,
    )
    t30.slice_and_reconfigure_(
        2**27, reconf_opts={"subtree_size": 8, "maxiter": 60}
    )
    f = t30.total_flops(log=10)
    print(
        f"t30 sliced to 2^27: log10F={f:.3f} "
        f"nslices=2^{math.log2(max(t30.multiplicity, 1)):.0f} "
        f"width=2^{math.log2(t30.max_size()):.0f}",
        flush=True,
    )
    if f < t27.total_flops(log=10) - 1e-9:
        save_tree(
            "/root/repo/plans/sycamore53_m20_t27.json", t30,
            log10_flops=f, target_log2=27, planner="t30-sliced-down",
        )
        print("REPLACED t27 plan with the sliced-down t30 plan")


if __name__ == "__main__":
    main()
