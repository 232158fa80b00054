"""Windowed compressed-path refinement (branch-bound windows + chain SA).

Reference behavior model: ``path_compressed.py`` WindowedOptimizer tests
implied by ``/root/reference/tests/test_core.py`` windowed_reconfigure
usage.
"""

import pytest

import cotengra_tpu as ctg
from cotengra_tpu.pathfinders.basic import optimize_greedy
from cotengra_tpu.pathfinders.windowed_opt import (
    WindowedOptimizer,
    bit_path_to_ssa_path,
    ssa_path_to_bit_path,
)
from cotengra_tpu.scoring import (
    CompressedStatsTrackerPeak,
    parse_minimize,
)
from cotengra_tpu.tree_compressed import ContractionTreeCompressed


def _lattice_tree(dims=(6, 6), d=4, seed=0, objective="peak-compressed"):
    inputs, output, shapes, size_dict = ctg.lattice_equation(
        list(dims), d_min=d
    )
    path = optimize_greedy(inputs, output, size_dict, seed=seed)
    tree = ContractionTreeCompressed.from_path(
        inputs, output, size_dict, path=path, objective=objective
    )
    return tree


def _score(tree):
    stats = tree.compressed_contract_stats(
        tracker_cls=CompressedStatsTrackerPeak
    )
    return stats.score


def test_bit_path_roundtrip():
    ssa = ((0, 1), (2, 3), (4, 5), (6, 7))
    assert bit_path_to_ssa_path(ssa_path_to_bit_path(ssa)) == ssa


def test_tracker_copy_preserves_subclass_state():
    tree = _lattice_tree((4, 4))
    stats = tree.compressed_contract_stats(
        tracker_cls=CompressedStatsTrackerPeak
    )
    cp = stats.copy()
    assert cp.peak_size == stats.peak_size
    assert cp.flops == stats.flops
    assert cp.total_size == stats.total_size
    assert cp.score == stats.score


def test_chain_replay_matches_tree_replay():
    """ChainState.next must accumulate exactly what the tree's
    from-scratch compressed replay computes (same hook order)."""
    tree = _lattice_tree((5, 5))
    obj = parse_minimize("peak-compressed")
    wo = WindowedOptimizer(
        tree.inputs,
        tree.output,
        tree.size_dict,
        minimize=obj,
        ssa_path=tree.get_ssa_path("surface_order"),
        seed=0,
    )
    stats = tree.compressed_contract_stats(
        tracker_cls=CompressedStatsTrackerPeak, accel=False
    )
    assert wo.tracker.flops == stats.flops
    assert wo.tracker.peak_size == stats.peak_size
    assert wo.tracker.max_size == stats.max_size
    assert wo.tracker.write == stats.write


@pytest.mark.parametrize("order_only", [False, True])
def test_windowed_reconfigure_improves(order_only):
    tree = _lattice_tree()
    before = _score(tree)
    t2 = tree.windowed_reconfigure(
        window_size=10,
        max_iterations=30,
        order_only=order_only,
        seed=0,
    )
    after = _score(t2)
    assert after < before
    # the rebuilt tree is a complete valid tree over the same inputs
    assert t2.is_complete()
    assert t2.N == tree.N


def test_windowed_free_beats_order_only():
    """Structure-free window rebuilds reach scores the order-only mode
    cannot (it can only reorder the same merges)."""
    tree = _lattice_tree()
    t_free = tree.windowed_reconfigure(
        window_size=10, max_iterations=30, order_only=False, seed=0
    )
    t_ord = tree.windowed_reconfigure(
        window_size=10, max_iterations=30, order_only=True, seed=0
    )
    assert _score(t_free) < _score(t_ord)


def test_simulated_anneal_improves():
    tree = _lattice_tree()
    before = _score(tree)
    t2 = tree.simulated_anneal(tsteps=8, numiter=4, seed=0)
    assert _score(t2) < before
    assert t2.is_complete()


def test_windowed_reconfigure_inplace():
    tree = _lattice_tree((5, 5))
    before = _score(tree)
    out = tree.windowed_reconfigure_(
        window_size=8, max_iterations=15, seed=1
    )
    assert out is tree
    assert _score(tree) <= before


def test_refined_chain_score_cross_check():
    """After refinement, rebuilding a fresh chain from the refined path
    must agree with the rebuilt tree's from-scratch replay (the spliced
    in-place trackers are allowed to drift; the exported path is what
    counts)."""
    tree = _lattice_tree()
    obj = parse_minimize("peak-compressed")
    wo = WindowedOptimizer(
        tree.inputs,
        tree.output,
        tree.size_dict,
        minimize=obj,
        ssa_path=tree.get_ssa_path("surface_order"),
        seed=0,
    )
    wo.refine(window_size=10, max_iterations=20)
    refined = wo.get_ssa_path()
    # fresh replay of the refined path
    wo2 = WindowedOptimizer(
        tree.inputs,
        tree.output,
        tree.size_dict,
        minimize=obj,
        ssa_path=refined,
        seed=0,
    )
    t2 = ContractionTreeCompressed.from_path(
        tree.inputs,
        tree.output,
        tree.size_dict,
        ssa_path=refined,
        objective="peak-compressed",
    )
    stats = t2.compressed_contract_stats(
        tracker_cls=CompressedStatsTrackerPeak, accel=False
    )
    assert wo2.tracker.flops == stats.flops
    assert wo2.tracker.peak_size == stats.peak_size
