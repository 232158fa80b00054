"""Circuit TN generator: structure, unitarity, amplitude sanity."""

import numpy as np
from numpy.testing import assert_allclose

import cotengra_tpu as ctg
from cotengra_tpu.models.circuits import (
    grid_couplers,
    rand_circuit_tn,
    sycamore_like_qubits,
)
from cotengra_tpu.ops.preprocess import absorb_simple_tensors


def test_sycamore_like_layout():
    qubits = sycamore_like_qubits(53)
    assert len(qubits) == 53
    assert len(set(qubits)) == 53
    patterns = grid_couplers(qubits)
    assert set(patterns) == set("ABCD")
    # every coupler joins neighbouring qubits
    for pats in patterns.values():
        for (a, b) in pats:
            assert abs(a[0] - b[0]) + abs(a[1] - b[1]) == 1


def test_circuit_tn_structure():
    inputs, output, shapes, size_dict, arrays = rand_circuit_tn(
        n_qubits=10, depth=4, seed=0
    )
    assert output == []
    assert all(d == 2 for d in size_dict.values())
    assert len(inputs) == len(arrays)
    for term, arr in zip(inputs, arrays):
        assert arr.shape == tuple(size_dict[ix] for ix in term)
    # every index appears exactly twice (closed amplitude network)
    counts = {}
    for term in inputs:
        for ix in term:
            counts[ix] = counts.get(ix, 0) + 1
    assert set(counts.values()) == {2}


def test_circuit_amplitude_magnitude():
    """|amplitude|^2 of a random circuit is ~ 1/2^n on average; at the
    very least it must be finite, nonzero and <= 1."""
    inputs, output, shapes, size_dict, arrays = rand_circuit_tn(
        n_qubits=12, depth=6, seed=1
    )
    inputs, arrays = absorb_simple_tensors(inputs, arrays, output)
    size_dict = {
        ix: int(d)
        for t, a in zip(inputs, arrays)
        for ix, d in zip(t, a.shape)
    }
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="random-greedy"
    )
    amp = complex(np.asarray(tree.contract([np.asarray(a) for a in arrays])))
    assert 0 < abs(amp) < 1.0
    # loosely around 2^-12 scale
    assert 1e-8 < abs(amp) ** 2 < 1e-1


def test_gate_unitarity():
    from cotengra_tpu.models.circuits import _rand_unitary
    from cotengra_tpu.utils.misc import get_rng

    u = _rand_unitary(4, get_rng(0))
    assert_allclose(u @ u.conj().T, np.eye(4), atol=1e-10)
