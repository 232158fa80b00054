"""Pathfinder internals: simplification invariants, path format
converters, flops-limit early abort (reference ``test_paths_basic.py``
strategy).
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import cotengra_tpu as ctg
from cotengra_tpu.pathfinders.basic import PlanGraph, optimize_simplify
from cotengra_tpu.tree import is_ssa_path, linear_to_ssa, ssa_to_linear


def test_simplify_preserves_result():
    """Paths with simplification steps still contract correctly."""
    for seed in range(6):
        inputs, output, shapes, size_dict = ctg.perverse_equation(
            10, n_inputs=6, seed=seed
        )
        arrays = [
            np.random.default_rng(seed).normal(size=s) for s in shapes
        ]
        expected = np.einsum(
            ctg.utils.inds_to_eq(inputs, output), *arrays, optimize=True
        )
        path = optimize_simplify(inputs, output, size_dict)
        tree = ctg.ContractionTree.from_path(
            inputs, output, size_dict, path=path
        )
        got = tree.contract(arrays)
        assert_allclose(np.asarray(got), expected, rtol=1e-8)


def test_simplify_batch_index():
    # an index on every term is removed from planning
    inputs = [("a", "b"), ("a", "c"), ("a", "d")]
    g = PlanGraph(inputs, ("b", "c", "d", "a"), {"a": 7, "b": 2, "c": 2, "d": 2})
    g.simplify_batch()
    for legs in g.terms.values():
        assert all(g.sizes[ix] != 7 for ix, _ in legs)


def test_simplify_hadamard_groups():
    inputs = [("a", "b"), ("a", "b"), ("a", "b"), ("c",)]
    g = PlanGraph(inputs, ("a", "b", "c"), {"a": 2, "b": 2, "c": 2})
    before = len(g.terms)
    g.simplify_hadamard()
    # three identical terms collapse to one
    assert len(g.terms) == before - 2


def test_flops_limit_early_abort():
    inputs, output, shapes, size_dict = ctg.rand_equation(
        12, 4, d_min=4, d_max=4, seed=0
    )
    g = PlanGraph(
        inputs, output, size_dict, track_flops=True, flops_limit=10
    )
    ok = g.optimize_greedy()
    assert ok is False  # aborted


def test_path_converters_roundtrip():
    paths = [
        ((0, 1), (0, 1), (0, 1)),
        ((2, 3), (0, 1), (0, 1)),
    ]
    for p in paths:
        ssa = linear_to_ssa(p, 4)
        assert is_ssa_path(ssa, 4)
        back = ssa_to_linear(ssa, 4)
        assert tuple(map(tuple, back)) == p


def test_size_one_indices_ignored():
    inputs = [("a", "b"), ("b", "c")]
    output = ("a", "c")
    size_dict = {"a": 3, "b": 1, "c": 4}
    path = ctg.optimize_greedy(inputs, output, size_dict)
    tree = ctg.ContractionTree.from_path(
        inputs, output, size_dict, path=path
    )
    rng = np.random.default_rng(0)
    x, y = rng.normal(size=(3, 1)), rng.normal(size=(1, 4))
    assert_allclose(
        np.asarray(tree.contract([x, y])), x @ y, rtol=1e-8
    )


def test_optimal_known_chain():
    # matrix chain where the optimal order is unambiguous:
    # (2x100) @ (100x3) @ (3x100) -> must contract left pair first
    inputs = [("a", "b"), ("b", "c"), ("c", "d")]
    output = ("a", "d")
    size_dict = {"a": 2, "b": 100, "c": 3, "d": 100}
    ssa = ctg.optimize_optimal(inputs, output, size_dict, use_ssa=True)
    tree = ctg.ContractionTree.from_path(
        inputs, output, size_dict, ssa_path=ssa
    )
    # optimal cost: (a b c) + (a c d) = 600 + 600
    assert tree.total_flops() == 1200
