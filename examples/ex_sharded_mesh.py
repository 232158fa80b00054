"""Shard a sliced contraction over a TPU mesh: inner slice ids stride
across devices, partial sums combine with psum over ICI.

Works without TPU hardware too - run with virtual CPU devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/ex_sharded_mesh.py
"""

import os

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import jax

if jax.default_backend() == "cpu" or True:
    pass  # use whatever devices are present

import numpy as np

import cotengra_tpu as ctg
from cotengra_tpu.parallel.mesh import contract_sharded, get_default_mesh

inputs, output, shapes, size_dict = ctg.rand_equation(
    12, 3, d_min=2, d_max=3, seed=0
)
arrays = [np.random.default_rng(0).normal(size=s) for s in shapes]

tree = ctg.array_contract_tree(
    inputs, output, size_dict=size_dict, optimize="random-greedy"
)
tree.slice_(target_slices=len(jax.devices()))
print(f"{tree.multiplicity} slices over {len(jax.devices())} devices")

mesh = get_default_mesh()
result = contract_sharded(tree, arrays, mesh=mesh)
expected = np.einsum(
    ctg.utils.inds_to_eq(inputs, output), *arrays, optimize=True
)
print("matches single-device:", np.allclose(np.asarray(result), expected))
