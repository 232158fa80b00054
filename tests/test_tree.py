"""Tree invariants: stats vs brute-force recomputation, path round-trips,
slicing round-trips, reconfiguration improvements.

Mirrors the strategy of reference ``tests/test_tree.py``: incremental
tracking is always cross-checked against recomputing from scratch.
"""

import math

import pytest

import cotengra_tpu as ctg
from cotengra_tpu.tree import ContractionTree
from cotengra_tpu.utils.misc import compute_size_by_dict


def recompute_stats(tree):
    """Recompute flops/write/size from scratch, independent of caches."""
    fresh = ContractionTree(tree.inputs, tree.output, tree.size_dict)
    fresh.sliced_inds = dict(tree.sliced_inds)
    fresh.multiplicity = tree.multiplicity
    fresh.children = dict(tree.children)
    return fresh.contract_stats()


@pytest.mark.parametrize("seed", range(5))
def test_from_path_stats_match_recompute(seed):
    inputs, output, shapes, size_dict = ctg.rand_equation(
        10, 3, n_out=2, n_hyper_in=1, n_hyper_out=1, seed=seed
    )
    path = ctg.optimize_greedy(inputs, output, size_dict, seed=seed)
    tree = ContractionTree.from_path(inputs, output, size_dict, path=path)
    assert tree.is_complete()
    stats = tree.contract_stats()
    fresh = recompute_stats(tree)
    assert stats == fresh
    assert tree.total_flops() >= 1
    assert tree.max_size() >= 1


@pytest.mark.parametrize("seed", range(3))
def test_ssa_linear_roundtrip(seed):
    inputs, output, shapes, size_dict = ctg.rand_equation(8, 3, seed=seed)
    path = ctg.optimize_greedy(inputs, output, size_dict, seed=seed)
    ssa = ctg.linear_to_ssa(path)
    back = ctg.ssa_to_linear(ssa)
    assert tuple(map(tuple, back)) == tuple(map(tuple, path))

    t1 = ContractionTree.from_path(inputs, output, size_dict, path=path)
    t2 = ContractionTree.from_path(inputs, output, size_dict, ssa_path=ssa)
    assert t1.total_flops() == t2.total_flops()


def test_path_export_roundtrip():
    inputs, output, shapes, size_dict = ctg.rand_equation(9, 3, seed=0)
    path = ctg.optimize_greedy(inputs, output, size_dict)
    tree = ContractionTree.from_path(inputs, output, size_dict, path=path)
    # re-import the exported path: identical cost
    tree2 = ContractionTree.from_path(
        inputs, output, size_dict, ssa_path=tree.get_ssa_path()
    )
    assert tree2.total_flops() == tree.total_flops()
    tree3 = ContractionTree.from_path(
        inputs, output, size_dict, path=tree.get_path()
    )
    assert tree3.total_flops() == tree.total_flops()


@pytest.mark.parametrize("seed", range(4))
def test_remove_ind_incremental_vs_fresh(seed):
    inputs, output, shapes, size_dict = ctg.rand_equation(
        10, 3, n_out=2, seed=seed
    )
    path = ctg.optimize_greedy(inputs, output, size_dict, seed=seed)
    tree = ContractionTree.from_path(inputs, output, size_dict, path=path)
    tree.contract_stats()

    import random

    rng = random.Random(seed)
    cands = [ix for ix in size_dict if size_dict[ix] > 1]
    for ix in rng.sample(cands, min(3, len(cands))):
        tree.remove_ind_(ix)
        stats = tree.contract_stats()
        fresh = recompute_stats(tree)
        assert stats == fresh


def test_remove_restore_roundtrip():
    inputs, output, shapes, size_dict = ctg.rand_equation(
        10, 3, n_out=1, seed=7
    )
    path = ctg.optimize_greedy(inputs, output, size_dict, seed=7)
    tree = ContractionTree.from_path(inputs, output, size_dict, path=path)
    f0 = tree.total_flops()
    s0 = tree.max_size()

    cands = [ix for ix in size_dict if size_dict[ix] > 1][:3]
    for ix in cands:
        tree.remove_ind_(ix)
    assert tree.multiplicity > 1
    for ix in list(tree.sliced_inds):
        tree.restore_ind_(ix)
    assert tree.multiplicity == 1
    assert tree.total_flops() == f0
    assert tree.max_size() == s0


def test_peak_size_and_describe():
    inputs, output, shapes, size_dict = ctg.rand_equation(8, 3, seed=1)
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    assert tree.peak_size() >= tree.max_size()
    d = tree.describe()
    assert "log10[FLOPs]" in d
    d = tree.describe("full")
    assert "PEAK" in d
    str(tree)
    repr(tree)


def test_subtree_reconfigure_improves_or_keeps():
    inputs, output, shapes, size_dict = ctg.rand_equation(20, 3, seed=3)
    path = ctg.optimize_random(inputs, output, size_dict, seed=3)
    tree = ContractionTree.from_path(inputs, output, size_dict, path=path)
    f0 = tree.total_flops()
    tree.subtree_reconfigure_(subtree_size=6)
    f1 = tree.total_flops()
    assert f1 <= f0
    # cross-check incremental totals
    assert tree.contract_stats() == recompute_stats(tree)


def test_slice_hits_target_size():
    inputs, output, shapes, size_dict = ctg.rand_equation(
        16, 3, d_min=2, d_max=2, seed=11
    )
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    target = max(tree.max_size() // 8, 2)
    tree.slice_(target_size=target)
    assert tree.max_size() <= target
    assert tree.multiplicity > 1
    assert tree.contract_stats() == recompute_stats(tree)


def test_slice_and_reconfigure():
    inputs, output, shapes, size_dict = ctg.rand_equation(
        20, 3, d_min=2, d_max=2, seed=13
    )
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    target = max(tree.max_size() // 8, 2)
    tree.slice_and_reconfigure_(target)
    assert tree.max_size() <= target


def test_contract_nodes_multi():
    inputs, output, shapes, size_dict = ctg.rand_equation(7, 3, seed=5)
    tree = ContractionTree(inputs, output, size_dict)
    tree.contract_nodes([tree.leaf(i) for i in range(7)])
    assert tree.is_complete()


def test_single_input_tree():
    # single term: trace + transpose
    inputs = [("a", "b", "a")]
    output = ("b",)
    size_dict = {"a": 3, "b": 4}
    tree = ContractionTree(inputs, output, size_dict)
    assert tree.N == 1
    assert tree.is_complete()


@pytest.mark.parametrize("seed", range(4))
def test_peak_optimized_order(seed):
    """The exchange-rule order is a valid traversal of the same step set
    whose simulated peak never exceeds the default order's (reference
    ``reorder_for_peak_size``, core.py:1170-1187)."""
    inputs, output, shapes, size_dict = ctg.rand_equation(
        24, 3, d_min=2, d_max=4, seed=seed
    )
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    cb = tree.peak_optimized_order()
    if cb is None:
        # default extent order already at least as good - valid outcome
        return
    steps = list(tree.traverse(order=cb))
    # same contraction set, every rank distinct and topologically valid
    assert sorted(p for p, _, _ in steps) == sorted(tree.children)
    seen = set()
    for p, l, r in steps:
        for c in (l, r):
            assert c.bit_count() == 1 or c in seen
        seen.add(p)
    assert tree.peak_size(order=cb) < tree.peak_size()


def test_peak_order_execution_matches(monkeypatch):
    """CTG_PEAK_ORDER=1 changes only the schedule, not the value."""
    import numpy as np

    inputs, output, shapes, size_dict = ctg.rand_equation(
        14, 3, d_min=2, d_max=3, seed=7
    )
    arrays = [np.random.default_rng(i).normal(size=s) for i, s in
              enumerate(shapes)]
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    ref = tree.contract(arrays)
    monkeypatch.setenv("CTG_PEAK_ORDER", "1")
    from cotengra_tpu.ops.grouped import make_grouped_staged_contractor

    fn = make_grouped_staged_contractor(tree, stage_size=8)
    got = fn(*arrays)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-6
    )
