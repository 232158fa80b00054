"""Pathfinder and hyper-optimizer behavior (mirrors reference
``tests/test_optimizers.py`` strategy: every method must beat naive
contraction; samplers keep consistent state under inf scores; reusable
optimizers cache correctly).
"""

import math

import pytest

import cotengra_tpu as ctg
from cotengra_tpu.pathfinders.annealing import (
    parallel_temper_tree,
    simulated_anneal_tree,
)
from cotengra_tpu.pathfinders.labels import optimize_labels
from cotengra_tpu.tree import ContractionTree


def example(n=24, seed=0):
    return ctg.rand_equation(n, 3, n_out=2, seed=seed)


@pytest.mark.parametrize(
    "optimize",
    [
        "greedy",
        "optimal",  # applied to a small instance below
        "random-greedy",
        "edgesort",
        "random",
        "simplify",
        "auto",
    ],
)
def test_presets_give_speedup(optimize):
    n = 8 if optimize in ("optimal",) else 20
    inputs, output, shapes, size_dict = ctg.rand_equation(n, 3, seed=1)
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize=optimize
    )
    assert tree.is_complete()
    assert tree.speedup() > 1


def test_optimal_is_optimal_on_small():
    # optimal must never be beaten by greedy
    for seed in range(5):
        inputs, output, shapes, size_dict = ctg.rand_equation(
            7, 3, seed=seed
        )
        t_opt = ctg.array_contract_tree(
            inputs, output, size_dict=size_dict, optimize="optimal"
        )
        t_greedy = ctg.array_contract_tree(
            inputs, output, size_dict=size_dict, optimize="greedy"
        )
        assert t_opt.total_flops() <= t_greedy.total_flops()


def test_optimal_minimize_size():
    from cotengra_tpu.pathfinders.basic import optimize_optimal

    inputs, output, shapes, size_dict = ctg.rand_equation(7, 3, seed=3)
    ssa = optimize_optimal(
        inputs, output, size_dict, minimize="size", use_ssa=True
    )
    t_size = ContractionTree.from_path(
        inputs, output, size_dict, ssa_path=ssa
    )
    t_flops = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="optimal"
    )
    assert t_size.max_size() <= t_flops.max_size()


def test_random_greedy_tracks_flops():
    inputs, output, shapes, size_dict = example()
    path, log10_flops = ctg.optimize_random_greedy_track_flops(
        inputs, output, size_dict, ntrials=8, seed=0
    )
    tree = ContractionTree.from_path(inputs, output, size_dict, path=path)
    assert tree.total_flops(log=10) == pytest.approx(log10_flops, abs=1e-6)


def test_random_greedy_deterministic_with_seed():
    inputs, output, shapes, size_dict = example()
    r1 = ctg.optimize_random_greedy_track_flops(
        inputs, output, size_dict, ntrials=4, seed=7
    )
    r2 = ctg.optimize_random_greedy_track_flops(
        inputs, output, size_dict, ntrials=4, seed=7
    )
    assert r1 == r2


def test_labels_partitioner():
    inputs, output, shapes, size_dict = ctg.rand_equation(50, 3, seed=2)
    path = optimize_labels(inputs, output, size_dict, seed=0)
    tree = ContractionTree.from_path(inputs, output, size_dict, path=path)
    assert tree.is_complete()
    assert tree.speedup() > 1


def test_simulated_anneal_improves():
    inputs, output, shapes, size_dict = ctg.rand_equation(30, 3, seed=5)
    path = ctg.optimize_random(inputs, output, size_dict, seed=5)
    tree = ContractionTree.from_path(inputs, output, size_dict, path=path)
    f0 = tree.total_flops()
    t2 = simulated_anneal_tree(tree, tsteps=30, seed=0)
    assert t2.total_flops() <= f0
    # integrity
    fresh = ContractionTree(t2.inputs, t2.output, t2.size_dict)
    fresh.children = dict(t2.children)
    assert t2.contract_stats() == fresh.contract_stats()


@pytest.mark.parametrize("mode", ["basic", "reslice", "drift", 2])
def test_simulated_anneal_slice_modes(mode):
    inputs, output, shapes, size_dict = ctg.rand_equation(
        30, 3, d_min=2, d_max=2, seed=5
    )
    path = ctg.optimize_random(inputs, output, size_dict, seed=5)
    tree = ContractionTree.from_path(inputs, output, size_dict, path=path)
    target = tree.max_size() // 4
    t2 = simulated_anneal_tree(
        tree, tsteps=12, target_size=target, mode=mode, seed=0
    )
    if mode != "drift":
        # all but drift enforce the final target
        assert t2.max_size() <= target
    # integrity: stats must match a from-scratch recompute
    fresh = ContractionTree(t2.inputs, t2.output, t2.size_dict)
    fresh.children = dict(t2.children)
    for ix in t2.sliced_inds:
        fresh.remove_ind_(ix)
    assert t2.contract_stats() == fresh.contract_stats()


def test_simulated_anneal_numiter_sweeps():
    inputs, output, shapes, size_dict = ctg.rand_equation(24, 3, seed=3)
    path = ctg.optimize_random(inputs, output, size_dict, seed=3)
    tree = ContractionTree.from_path(inputs, output, size_dict, path=path)
    f0 = tree.total_flops()
    t2 = simulated_anneal_tree(tree, tsteps=6, numiter=5, seed=0)
    assert t2.total_flops() <= f0


def test_parallel_temper_target_size_penalty():
    inputs, output, shapes, size_dict = ctg.rand_equation(
        24, 3, d_min=2, d_max=2, seed=7
    )
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    target = tree.max_size() // 2
    t2 = parallel_temper_tree(
        tree,
        num_replicas=3,
        rounds=2,
        target_size=target,
        seed=0,
    )
    # drift mode floats around the target; sliced size must have moved
    # toward it and the tree must stay consistent
    fresh = ContractionTree(t2.inputs, t2.output, t2.size_dict)
    fresh.children = dict(t2.children)
    for ix in t2.sliced_inds:
        fresh.remove_ind_(ix)
    assert t2.contract_stats() == fresh.contract_stats()


def test_parallel_temper():
    inputs, output, shapes, size_dict = ctg.rand_equation(20, 3, seed=6)
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    t2 = parallel_temper_tree(tree, num_replicas=3, rounds=2, seed=0)
    assert t2.total_flops() <= tree.total_flops() * 1.001


@pytest.mark.parametrize("optlib", ["random", "evo", "de", "pe"])
def test_hyper_optimizer(optlib):
    inputs, output, shapes, size_dict = ctg.rand_equation(24, 3, seed=8)
    opt = ctg.HyperOptimizer(
        max_repeats=12,
        optlib=optlib,
        reconf_opts={},
        on_trial_error="raise",
        seed=0,
    )
    tree = opt.search(inputs, output, size_dict)
    assert tree.speedup() > 1
    assert len(opt.trials) == 12
    assert opt.best_score < float("inf")


def test_hyper_with_slicing():
    inputs, output, shapes, size_dict = ctg.rand_equation(
        24, 3, d_min=2, d_max=2, seed=9
    )
    base = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    target = max(base.max_size() // 4, 4)
    opt = ctg.HyperOptimizer(
        max_repeats=8,
        slicing_opts={"target_size": target},
        on_trial_error="raise",
        seed=0,
    )
    tree = opt.search(inputs, output, size_dict)
    assert tree.max_size() <= target


def test_hyper_equil_stop():
    inputs, output, shapes, size_dict = ctg.rand_equation(16, 3, seed=10)
    opt = ctg.HyperOptimizer(
        max_repeats=1000, max_time="equil:5", seed=0
    )
    opt.search(inputs, output, size_dict)
    assert len(opt.trials) < 1000


def test_hyper_parallel():
    inputs, output, shapes, size_dict = ctg.rand_equation(20, 3, seed=11)
    opt = ctg.HyperOptimizer(
        max_repeats=8, parallel="threads:2", seed=0
    )
    tree = opt.search(inputs, output, size_dict)
    assert tree.speedup() > 1
    assert len(opt.trials) >= 8


def test_hyper_trial_error_inf_score():
    import cotengra_tpu.hyper as hyper

    def bad_method(inputs, output, size_dict, **params):
        raise ValueError("boom")

    hyper.register_hyper_function("_always_fails", bad_method, space={})
    try:
        inputs, output, shapes, size_dict = ctg.rand_equation(
            10, 3, seed=12
        )
        opt = ctg.HyperOptimizer(
            methods=["greedy", "_always_fails"],
            max_repeats=10,
            on_trial_error="ignore",
            seed=0,
        )
        tree = opt.search(inputs, output, size_dict)
        assert tree is not None
        assert any(
            t["score"] == float("inf") for t in opt.trials
        ) or all(t["method"] == "greedy" for t in opt.trials)
    finally:
        from cotengra_tpu.hyper.driver import _HYPER_FNS, _HYPER_SPACES

        _HYPER_FNS.pop("_always_fails", None)
        _HYPER_SPACES.pop("_always_fails", None)


def test_reusable_hyper_optimizer(tmp_path):
    inputs, output, shapes, size_dict = ctg.rand_equation(14, 3, seed=13)
    opt = ctg.ReusableHyperOptimizer(
        directory=str(tmp_path / "cache"),
        max_repeats=6,
        seed=0,
    )
    t1 = opt.search(inputs, output, size_dict)
    assert len(opt) == 1
    searched_opt = opt.last_opt
    t2 = opt.search(inputs, output, size_dict)
    # second call must be a cache hit (no new search)
    assert opt.last_opt is searched_opt
    assert t2.total_flops() == t1.total_flops()

    # a fresh optimizer over the same directory also hits the cache
    opt2 = ctg.ReusableHyperOptimizer(
        directory=str(tmp_path / "cache"), max_repeats=6, seed=1
    )
    t3 = opt2.search(inputs, output, size_dict)
    assert opt2.last_opt is None
    assert t3.total_flops() == t1.total_flops()


def test_uniform_optimizer():
    from cotengra_tpu.hyper import UniformOptimizer

    inputs, output, shapes, size_dict = ctg.rand_equation(16, 3, seed=14)
    opt = UniformOptimizer(
        methods=["greedy"], max_repeats=6, on_trial_error="raise", seed=0
    )
    tree = opt.search(inputs, output, size_dict)
    assert tree.speedup() > 1
