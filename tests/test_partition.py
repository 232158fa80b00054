"""Native multilevel hypergraph partitioner (ctgpart) tests.

Mirrors the reference's partitioner expectations: membership validity,
balance, cut quality on structured graphs, and tree quality through the
PartitionTreeBuilder (reference `path_kahypar.py` / `test_optimizers.py`
style assertions).
"""

import collections

import numpy as np
import pytest

from cotengra_tpu.models.instances import (
    lattice_equation,
    rand_equation,
)
from cotengra_tpu.pathfinders.partition import (
    ctgpart_available,
    ctgpart_partition,
    optimize_ctgpart,
)
from cotengra_tpu.tree import ContractionTree

needs_native = pytest.mark.skipif(
    not ctgpart_available(), reason="native kernels unavailable"
)


@needs_native
def test_lattice_bisection_quality():
    inputs, output, shapes, size_dict = lattice_equation(
        [8, 8], d_max=2, seed=0
    )
    subset = list(range(len(inputs)))
    m = ctgpart_partition(
        subset, inputs, size_dict, parts=2, imbalance=0.05, seed=0
    )
    sizes = collections.Counter(m)
    assert set(sizes) == {0, 1}
    assert abs(sizes[0] - sizes[1]) <= 8
    # a good 8x8 lattice bisection cuts ~8 of 112 internal edges
    ix_holders = collections.defaultdict(list)
    for i, term in enumerate(inputs):
        for ix in term:
            ix_holders[ix].append(i)
    cut = sum(
        1
        for hs in ix_holders.values()
        if len(hs) >= 2 and len({m[h] for h in hs}) > 1
    )
    assert cut <= 16


@needs_native
def test_lattice_cut_beats_label_propagation():
    """Direct cut-quality comparison on a structured graph: the
    multilevel partitioner should find (weighted-)cuts at least as
    good as label propagation, best-of-4 seeds each (the reference's
    kahypar-vs-labels quality ordering, `hyper.py:30-41`)."""
    from cotengra_tpu.pathfinders.labels import (
        label_propagation_partition,
    )

    inputs, output, shapes, size_dict = lattice_equation(
        [8, 8], d_max=2, seed=0
    )
    subset = list(range(len(inputs)))
    ix_holders = collections.defaultdict(list)
    for i, term in enumerate(inputs):
        for ix in term:
            ix_holders[ix].append(i)

    def cut_of(m):
        return sum(
            1
            for hs in ix_holders.values()
            if len(hs) >= 2 and len({m[h] for h in hs}) > 1
        )

    best_ctg = min(
        cut_of(
            ctgpart_partition(
                subset, inputs, size_dict, parts=2,
                imbalance=0.05, seed=s,
            )
        )
        for s in range(4)
    )
    best_lab = min(
        cut_of(
            label_propagation_partition(
                subset, inputs, size_dict, parts=2, seed=s,
            )
        )
        for s in range(4)
    )
    assert best_ctg <= best_lab


@needs_native
@pytest.mark.parametrize("parts", [2, 3, 4, 7])
def test_kway_membership(parts):
    inputs, output, shapes, size_dict = rand_equation(
        60, 3, seed=2, d_max=3
    )
    subset = list(range(len(inputs)))
    m = ctgpart_partition(
        subset, inputs, size_dict, parts=parts, seed=1
    )
    assert len(m) == len(subset)
    assert set(m) <= set(range(parts))
    # every part non-empty and roughly balanced
    sizes = collections.Counter(m)
    assert len(sizes) == parts
    assert max(sizes.values()) <= 3 * (len(subset) // parts)


@needs_native
def test_partition_trees_beat_random(seed=3):
    inputs, output, shapes, size_dict = rand_equation(
        70, 3, seed=seed, d_max=3
    )
    p = optimize_ctgpart(
        inputs, output, size_dict, seed=0, use_ssa=True
    )
    tree = ContractionTree.from_path(
        inputs, output, size_dict, ssa_path=p
    )
    assert tree.is_complete()
    from cotengra_tpu.pathfinders.random import optimize_random

    pr = optimize_random(inputs, output, size_dict, seed=0, use_ssa=True)
    rtree = ContractionTree.from_path(
        inputs, output, size_dict, ssa_path=pr
    )
    assert tree.total_flops(log=10) < rtree.total_flops(log=10)


@needs_native
def test_agglom_mode():
    inputs, output, shapes, size_dict = rand_equation(
        50, 3, seed=5, d_max=2
    )
    p = optimize_ctgpart(
        inputs, output, size_dict, seed=0, use_ssa=True, agglom=True,
        groupsize=4,
    )
    tree = ContractionTree.from_path(
        inputs, output, size_dict, ssa_path=p
    )
    assert tree.is_complete()


@needs_native
def test_hyper_method_registered():
    from cotengra_tpu.hyper.driver import HyperOptimizer

    inputs, output, shapes, size_dict = rand_equation(
        40, 3, seed=7, d_max=2
    )
    opt = HyperOptimizer(
        methods=["ctgpart"], max_repeats=4, optlib="random",
        parallel=False, seed=0, on_trial_error="raise",
    )
    tree = opt.search(inputs, output, size_dict)
    assert tree.is_complete()


@needs_native
def test_determinism():
    inputs, output, shapes, size_dict = rand_equation(
        50, 3, seed=9, d_max=2
    )
    subset = list(range(len(inputs)))
    m1 = ctgpart_partition(subset, inputs, size_dict, parts=3, seed=11)
    m2 = ctgpart_partition(subset, inputs, size_dict, parts=3, seed=11)
    assert m1 == m2
