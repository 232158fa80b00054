"""CompressedExhaustive branch-and-bound compressed path search.

Reference behavior model:
``/root/reference/cotengra/experimental/path_compressed_branchbound.py``.
"""

import pytest

import cotengra_tpu as ctg
from cotengra_tpu.pathfinders.basic import optimize_greedy
from cotengra_tpu.pathfinders.compressed_bb import (
    CompressedExhaustive,
    CompressedTreeRefiner,
)
from cotengra_tpu.scoring import CompressedStatsTrackerPeak
from cotengra_tpu.tree_compressed import ContractionTreeCompressed


def _lattice_tree(dims=(4, 4), d=4, seed=0):
    inputs, output, shapes, size_dict = ctg.lattice_equation(
        list(dims), d_min=d
    )
    path = optimize_greedy(inputs, output, size_dict, seed=seed)
    tree = ContractionTreeCompressed.from_path(
        inputs, output, size_dict, path=path,
        objective="peak-compressed",
    )
    return tree


def _score(tree):
    return tree.compressed_contract_stats(
        tracker_cls=CompressedStatsTrackerPeak
    ).score


def test_scratch_search_completes():
    tree = _lattice_tree((3, 3))
    opt = CompressedExhaustive("peak-compressed", max_nodes=2000)
    t2 = opt.search(tree.inputs, tree.output, tree.size_dict)
    assert t2.is_complete()
    assert t2.N == tree.N
    assert opt.best_score < float("inf")
    # linear path export is consistent
    assert len(opt.path) == tree.N - 1


def test_seeded_never_worse():
    """Seeding with the current path bounds the search: the result can
    only match or beat the seed."""
    tree = _lattice_tree((4, 4))
    before = _score(tree)
    t2 = tree.compressed_reconfigure(max_nodes=3000)
    assert _score(t2) <= before
    assert t2.is_complete()


def test_order_only_restricts_merges():
    tree = _lattice_tree((4, 4))
    orig_merges = {
        frozenset(
            i for i in range(tree.N) if (1 << i) & p
        )
        for p in tree.children
    }
    t2 = tree.compressed_reconfigure(
        max_nodes=2000, order_only=True
    )
    new_merges = {
        frozenset(
            i for i in range(t2.N) if (1 << i) & p
        )
        for p in t2.children
    }
    assert new_merges <= orig_merges
    assert _score(t2) <= _score(tree)


def test_free_beats_or_matches_order_only():
    tree = _lattice_tree((4, 4))
    t_free = tree.compressed_reconfigure(max_nodes=4000)
    t_ord = tree.compressed_reconfigure(
        max_nodes=4000, order_only=True
    )
    assert _score(t_free) <= _score(t_ord)


def test_exploration_power_mode():
    tree = _lattice_tree((3, 3))
    opt = CompressedExhaustive(
        "peak-compressed", max_nodes=1500, exploration_power=2.0
    )
    t2 = opt.search(tree.inputs, tree.output, tree.size_dict)
    assert t2.is_complete()


def test_inplace_reconfigure():
    tree = _lattice_tree((4, 4))
    before = _score(tree)
    out = tree.compressed_reconfigure_(max_nodes=2000)
    assert out is tree
    assert _score(tree) <= before


def test_tree_refiner_population():
    trees = {
        seed: _lattice_tree((4, 4), seed=seed) for seed in range(3)
    }
    before = {k: _score(t) for k, t in trees.items()}
    ref = CompressedTreeRefiner(
        trees, minimize="peak-compressed", max_refine_time=2
    )
    out = ref.refine(num_its=3)
    for k, t in out.items():
        assert _score(t) <= before[k]
