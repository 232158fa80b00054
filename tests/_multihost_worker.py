"""Worker process for the 2-process jax.distributed smoke test
(launched by tests/test_multihost.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID in the environment)."""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import cotengra_tpu as ctg  # noqa: E402
from cotengra_tpu.parallel.mesh import (  # noqa: E402
    broadcast_tree,
    get_global_mesh,
    maybe_init_distributed,
)


def main():
    active = maybe_init_distributed()
    assert active, "distributed runtime failed to activate"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    mesh = get_global_mesh()
    assert mesh.devices.size == 8

    inputs, output, shapes, size_dict = ctg.rand_equation(12, 3, seed=0)
    # identical arrays on both processes (replicated inputs)
    arrays = [
        np.random.default_rng(i).normal(size=s)
        for i, s in enumerate(shapes)
    ]
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    tree.slice_(target_slices=8)
    assert tree.multiplicity >= 8
    # stochastic planning may diverge across processes; SPMD requires
    # the exact same tree everywhere
    tree = broadcast_tree(tree)

    got = tree.contract_sharded(arrays, mesh=mesh)
    got = np.asarray(got)  # psum result is fully replicated
    exp = np.einsum(
        ctg.utils.inds_to_eq(inputs, output), *arrays, optimize=True
    )
    np.testing.assert_allclose(got, exp, rtol=1e-8)
    print(f"OK-MULTIHOST p{jax.process_index()}", flush=True)


if __name__ == "__main__":
    main()
    sys.exit(0)
