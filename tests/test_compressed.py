"""Compressed (chi-capped) cost model, compressed pathfinders, multi
trees (mirrors reference ``tests/test_compressed.py``).
"""

import pytest

import cotengra_tpu as ctg
from cotengra_tpu.scoring import parse_minimize
from cotengra_tpu.tree_compressed import ContractionTreeCompressed
from cotengra_tpu.tree_multi import ContractionTreeMulti


def lattice_tree(chi=16, seed=0, cls=ContractionTreeCompressed):
    inputs, output, shapes, size_dict = ctg.lattice_equation(
        [5, 6], d_min=4
    )
    ssa = ctg.optimize_greedy(
        inputs, output, size_dict, use_ssa=True, seed=seed
    )
    return cls.from_path(inputs, output, size_dict, ssa_path=ssa)


def test_compressed_stats_bounded_by_exact():
    tree = lattice_tree()
    # chi-capped sizes can never exceed the exact ones (flops CAN, since
    # compressed flops include the QR/compression work)
    assert tree.max_size(chi=4) <= tree.max_size_exact()
    assert tree.total_flops(chi=4) > 0


def test_compressed_chi_monotone():
    tree = lattice_tree()
    p4 = tree.peak_size(chi=4)
    p16 = tree.peak_size(chi=16)
    p_inf = tree.peak_size(chi=10**9)
    assert p4 <= p16 <= p_inf


def test_compressed_objective_parsing():
    for spec, attr in [
        ("peak-compressed", "peak_size"),
        ("peak-compressed-16", "peak_size"),
        ("max-compressed-8", "max_size"),
        ("size-compressed", "max_size"),
        ("write-compressed-4", "write"),
        ("flops-compressed", "flops"),
        ("combo-compressed-32", "flops"),
    ]:
        obj = parse_minimize(spec)
        tree = lattice_tree()
        trial = {"tree": tree}
        score = obj(trial)
        assert score > 0
        assert trial["flops"] > 0


def test_compressed_refuses_exact_contraction():
    tree = lattice_tree()
    with pytest.raises(NotImplementedError):
        tree.contract([])


def test_greedy_compressed_pathfinders():
    inputs, output, shapes, size_dict = ctg.lattice_equation(
        [5, 5], d_min=3
    )
    for preset in ("greedy-compressed", "greedy-span"):
        tree = ctg.array_contract_tree(
            inputs, output, size_dict=size_dict, optimize=preset
        )
        assert isinstance(tree, ContractionTreeCompressed)
        assert tree.is_complete()


def test_hyper_compressed_beats_single_trial():
    inputs, output, shapes, size_dict = ctg.lattice_equation(
        [5, 5], d_min=3
    )
    opt = ctg.HyperCompressedOptimizer(
        chi=9, max_repeats=10, seed=0, on_trial_error="raise"
    )
    tree = opt.search(inputs, output, size_dict)
    assert opt.best_score <= max(
        t["score"] for t in opt.trials if t["score"] < float("inf")
    )
    assert isinstance(tree, ContractionTreeCompressed)


def test_windowed_reconfigure_improves_or_keeps():
    tree = lattice_tree(seed=3)
    s0 = tree.compressed_contract_stats(chi=8).peak_size
    t2 = tree.windowed_reconfigure(
        minimize="peak-compressed-8", max_iterations=30, seed=0
    )
    s1 = t2.compressed_contract_stats(chi=8).peak_size
    assert s1 <= s0


def test_multi_tree_costs():
    inputs, output, shapes, size_dict = ctg.rand_equation(14, 3, seed=1)
    var_inds = sorted(size_dict)[:4]
    ssa = ctg.optimize_greedy(inputs, output, size_dict, use_ssa=True)
    mt = ContractionTreeMulti.from_path(
        inputs, output, size_dict, ssa_path=ssa
    )
    mt.sliced_inds = {ix: None for ix in var_inds}

    from cotengra_tpu.scoring import get_multi_objective

    # dense >= uniform multiplicities
    mt.set_default_objective(get_multi_objective("dense", 64))
    dense_flops = mt.total_flops()
    mt._mult_cache.clear()
    mt._tracked = False
    mt.set_default_objective(get_multi_objective("uniform", 64))
    uniform_flops = mt.total_flops()
    assert dense_flops >= uniform_flops

    # exact simulation on a config batch gives finite sensible numbers
    import random

    rng = random.Random(0)
    configs = [
        {ix: rng.randrange(size_dict[ix]) for ix in var_inds}
        for _ in range(16)
    ]
    stats = mt.exact_multi_stats(configs)
    assert stats["flops"] > 0
    assert stats["peak"] >= stats["size"]


def test_exact_multi_stats_memoization_invariants():
    import random

    from cotengra_tpu.tree import ContractionTree

    inputs, output, shapes, size_dict = ctg.rand_equation(10, 3, seed=3)
    var_inds = sorted(size_dict)[:3]
    ssa = ctg.optimize_greedy(inputs, output, size_dict, use_ssa=True)
    mt = ContractionTreeMulti.from_path(
        inputs, output, size_dict, ssa_path=ssa
    )
    mt.sliced_inds = {ix: None for ix in var_inds}
    from cotengra_tpu.scoring import get_multi_objective

    mt.set_default_objective(get_multi_objective("uniform", 64))

    rng = random.Random(7)
    configs = [
        {ix: rng.randrange(size_dict[ix]) for ix in var_inds}
        for _ in range(12)
    ]
    stats = mt.exact_multi_stats(configs)

    # flops are charged exactly once per distinct (node, projected
    # sub-config) value — recount with a plain set, no scheduling
    seen = set()
    flops = 0
    for config in configs:
        for p, _, _ in mt.traverse():
            key = (
                p,
                tuple(config[ix] for ix in mt.get_node_var_inds(p)),
            )
            if key not in seen:
                seen.add(key)
                flops += ContractionTree.get_flops(mt, p)
    assert stats["flops"] == flops

    # repeating the whole batch is fully cached: no extra flops or
    # writes, and the memory peak is unchanged
    stats2 = mt.exact_multi_stats(configs + configs)
    assert stats2["flops"] == stats["flops"]
    assert stats2["write"] == stats["write"]
    assert stats2["peak"] == stats["peak"]

    # consecutive duplicate configs exercise the shared-block-boundary
    # path (empty blocks must not double-free the root amplitude)
    stats3 = mt.exact_multi_stats([configs[0], configs[0], configs[1]])
    stats4 = mt.exact_multi_stats([configs[0], configs[1]])
    assert stats3 == stats4


def _reference_exact_multi_stats(mt, configs):
    """Emulation of the reference's three-pass accounting
    (``/root/reference/cotengra/core_multi.py:167-253``), including its
    end-of-block behavior: ``mem_current -= get_size(p)`` runs for
    *every* config block with whatever ``p`` the last executed
    contraction left behind — so an empty (fully-cached duplicate)
    block double-subtracts the previous root. Used only to pin down the
    intentional divergence of ``exact_multi_stats``.
    """
    from cotengra_tpu.tree import ContractionTree

    order = tuple(mt.traverse())

    def vkey(node, config):
        return node, tuple(
            config[ix] for ix in mt.get_node_var_inds(node)
        )

    blocks = []
    produced = set()
    for config in configs:
        block = []
        for p, l, r in order:
            pk = vkey(p, config)
            if pk not in produced:
                produced.add(pk)
                block.append((p, vkey(l, config), vkey(r, config)))
        blocks.append(block)

    freed = set()
    frees_here = {}
    for bi in range(len(blocks) - 1, -1, -1):
        for ei in range(len(blocks[bi]) - 1, -1, -1):
            _, lk, rk = blocks[bi][ei]
            here = []
            for ck in (rk, lk):
                if ck not in freed:
                    freed.add(ck)
                    if ck[0].bit_count() > 1:
                        here.append(ck[0])
            frees_here[(bi, ei)] = here

    flops = live = peak = written = 0
    p = None
    for bi, block in enumerate(blocks):
        for ei, (p, _, _) in enumerate(block):
            flops += ContractionTree.get_flops(mt, p)
            psize = mt.get_size(p)
            live += psize
            written += psize
            peak = max(peak, live)
            for node in frees_here[(bi, ei)]:
                live -= mt.get_size(node)
        # reference: runs even when block is empty (stale p)
        if p is not None:
            live -= mt.get_size(p)

    return {
        "flops": flops,
        "write": written,
        "size": mt.max_size(),
        "peak": peak,
    }


def test_exact_multi_stats_vs_reference_semantics():
    """Differential pin of exact_multi_stats against the reference's
    accounting: identical on duplicate-free batches; on batches with
    duplicate configs only the reference's stale-root double-decrement
    differs (it can only lower subsequent memory readings, never the
    flops/write/size totals)."""
    import random

    inputs, output, shapes, size_dict = ctg.rand_equation(10, 3, seed=3)
    var_inds = sorted(size_dict)[:3]
    ssa = ctg.optimize_greedy(inputs, output, size_dict, use_ssa=True)
    mt = ContractionTreeMulti.from_path(
        inputs, output, size_dict, ssa_path=ssa
    )
    mt.sliced_inds = {ix: None for ix in var_inds}
    from cotengra_tpu.scoring import get_multi_objective

    mt.set_default_objective(get_multi_objective("uniform", 64))

    rng = random.Random(11)
    configs = [
        {ix: rng.randrange(size_dict[ix]) for ix in var_inds}
        for _ in range(8)
    ]
    # make the projected sub-configs genuinely collide
    assert len({tuple(sorted(c.items())) for c in configs}) > 1

    # duplicate-free: full agreement
    ours = mt.exact_multi_stats(configs)
    ref = _reference_exact_multi_stats(mt, configs)
    assert ours == ref

    # with duplicate configs: totals agree; the reference's
    # double-decrement can only make its peak <= ours, and ours is
    # invariant under the duplication (nothing was recomputed)
    dup = [configs[0], configs[0], configs[1], configs[1], configs[2]]
    ours_dup = mt.exact_multi_stats(dup)
    ref_dup = _reference_exact_multi_stats(mt, dup)
    for k in ("flops", "write", "size"):
        assert ours_dup[k] == ref_dup[k]
    assert ref_dup["peak"] <= ours_dup["peak"]
    assert ours_dup == mt.exact_multi_stats(
        [configs[0], configs[1], configs[2]]
    )


def test_contract_compressed_exact_at_large_chi():
    import numpy as np

    from cotengra_tpu.utils.symbols import inds_to_eq

    inputs, output, shapes, size_dict = ctg.lattice_equation(
        [4, 4], d_min=2
    )
    rng = np.random.default_rng(0)
    arrays = [rng.normal(size=s) for s in shapes]
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy-compressed"
    )
    exact = np.einsum(
        inds_to_eq(inputs, output), *arrays, optimize=True
    )
    approx = tree.contract_compressed(arrays, chi=10**6)
    np.testing.assert_allclose(
        np.asarray(approx), exact, rtol=1e-8
    )


def test_contract_compressed_truncation_close_on_weak_network():
    import numpy as np

    from cotengra_tpu.utils.symbols import inds_to_eq

    inputs, output, shapes, size_dict = ctg.lattice_equation(
        [4, 4], d_min=2
    )
    rng = np.random.default_rng(1)
    # near-product tensors: truncation should be nearly exact
    arrays = [np.ones(s) + 0.01 * rng.normal(size=s) for s in shapes]
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy-compressed"
    )
    exact = np.einsum(
        inds_to_eq(inputs, output), *arrays, optimize=True
    )
    approx = tree.contract_compressed(arrays, chi=4)
    rel = abs(float(np.asarray(approx)) - exact) / abs(exact)
    assert rel < 1e-6


def test_contract_compressed_strip_exponent():
    import numpy as np

    inputs, output, shapes, size_dict = ctg.lattice_equation(
        [5, 5], d_min=3
    )
    rng = np.random.default_rng(2)
    arrays = [np.ones(s) + 0.05 * rng.normal(size=s) for s in shapes]
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy-compressed"
    )
    m, e = tree.contract_compressed(
        arrays, chi=9, strip_exponent=True
    )
    # ground truth: our exact sliced executor with exponent stripping
    # (numpy's own einsum pathfinding chokes on closed lattices)
    exact_tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="random-greedy"
    )
    em, ee = exact_tree.contract(
        [a.astype(np.float64) for a in arrays], strip_exponent=True
    )
    exact_log = float(np.asarray(ee)) + np.log10(
        abs(float(np.asarray(em)))
    )
    got_log = float(np.asarray(e)) + np.log10(abs(float(np.asarray(m))))
    assert abs(got_log - exact_log) < 1e-3


def test_hyper_multi_optimizer():
    inputs, output, shapes, size_dict = ctg.rand_equation(12, 3, seed=2)
    var_inds = sorted(size_dict)[:3]
    opt = ctg.HyperMultiOptimizer(
        varmults=var_inds,
        numconfigs=32,
        max_repeats=6,
        seed=0,
        on_trial_error="raise",
    )
    tree = opt.search(inputs, output, size_dict)
    assert isinstance(tree, ContractionTreeMulti)
    assert tree.total_flops() > 0
