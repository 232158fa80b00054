"""Interface behavior: caches, format parsing, dispatch (mirrors
reference ``tests/test_interface.py`` strategy: counters via monkeypatch).
"""

import numpy as np
import pytest

import cotengra_tpu as ctg
from cotengra_tpu import interface
from cotengra_tpu.utils.eqs import (
    canonicalize_inputs,
    parse_einsum_input,
    parse_eq_ellipses,
)


def test_expression_cache_hits(monkeypatch):
    calls = {"n": 0}
    real = interface._build_expression

    def counting(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(interface, "_build_expression", counting)
    interface.clear_caches()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 4))
    y = rng.normal(size=(4, 5))
    ctg.einsum("ab,bc->ac", x, y, optimize="greedy")
    assert calls["n"] == 1
    # same contraction, different labels: canonicalization -> cache hit
    ctg.einsum("xy,yz->xz", x, y, optimize="greedy")
    assert calls["n"] == 1
    # different shapes -> miss
    ctg.einsum("ab,bc->ac", x.T.copy(), rng.normal(size=(3, 5)),
               optimize="greedy")
    assert calls["n"] == 2
    interface.clear_caches()


def test_path_cache(monkeypatch):
    calls = {"n": 0}
    real = interface.find_path

    def counting(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(interface, "find_path", counting)
    interface.clear_caches()
    inputs, output, shapes, size_dict = ctg.rand_equation(8, 3, seed=0)
    p1 = ctg.array_contract_path(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    p2 = ctg.array_contract_path(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    assert p1 == p2
    assert calls["n"] == 1
    interface.clear_caches()


def test_parse_ellipses():
    eq = parse_eq_ellipses("...ab,bc->...ac", [(2, 3, 4, 5), (5, 6)])
    lhs, rhs = eq.split("->")
    t0, t1 = lhs.split(",")
    assert len(t0) == 4 and t1 == "bc" and len(rhs) == 4


def test_parse_interleaved():
    eq, arrays = parse_einsum_input(
        (np.zeros((2, 3)), ("i", "j"), np.zeros((3, 4)), ("j", "k"),
         ("i", "k"))
    )
    assert eq == "ab,bc->ac"
    assert len(arrays) == 2


def test_canonicalize_broadcast_conflict():
    with pytest.raises(ValueError):
        canonicalize_inputs(
            [("a",), ("a",)], None, shapes=[(3,), (4,)]
        )


def test_optimize_dispatch_types():
    inputs, output, shapes, size_dict = ctg.rand_equation(6, 3, seed=1)
    rng = np.random.default_rng(0)
    arrays = [rng.normal(size=s) for s in shapes]
    expected = np.einsum(
        ctg.utils.inds_to_eq(inputs, output), *arrays, optimize=True
    )
    # 1. preset string
    r1 = ctg.array_contract(arrays, inputs, output, optimize="greedy")
    # 2. explicit path
    path = ctg.array_contract_path(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    r2 = ctg.array_contract(
        arrays, inputs, output, optimize=path, cache_expression=False
    )
    # 3. optimizer instance
    r3 = ctg.array_contract(
        arrays, inputs, output, optimize=ctg.GreedyOptimizer(),
        cache_expression=False,
    )
    # 4. tree
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    r4 = ctg.array_contract(
        arrays, inputs, output, optimize=tree, cache_expression=False
    )
    for r in (r1, r2, r3, r4):
        np.testing.assert_allclose(np.asarray(r), expected, rtol=1e-8)


def test_register_preset_custom():
    def my_opt(inputs, output, size_dict):
        return ctg.optimize_greedy(inputs, output, size_dict)

    ctg.register_preset("my-test-preset", my_opt)
    assert "my-test-preset" in ctg.list_presets()
    inputs, output, shapes, size_dict = ctg.rand_equation(6, 3, seed=2)
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="my-test-preset"
    )
    assert tree.is_complete()


def test_reference_compat_exports():
    """Reference users find the same top-level names (VERDICT parity)."""
    import cotengra_tpu as ctg

    assert ctg.contract is ctg.einsum
    assert ctg.contract_expression is ctg.einsum_expression
    inputs, output, shapes, size_dict = ctg.rand_equation(10, 3, seed=0)
    path = ctg.hyper_optimize(inputs, output, size_dict, max_repeats=4)
    tree = ctg.ContractionTree.from_path(
        inputs, output, size_dict, path=path
    )
    assert tree.is_complete()
    for fn in (ctg.greedy_optimize, ctg.optimal_outer_optimize):
        t = ctg.ContractionTree.from_path(
            inputs, output, size_dict,
            path=fn(inputs, output, size_dict),
        )
        assert t.is_complete()
    assert ctg.AutoHQOptimizer().optimal_cutoff == 650


def test_edge_path_converters():
    import cotengra_tpu as ctg

    inputs = [("a", "b"), ("b", "c"), ("a", "c")]
    ssa = ctg.edge_path_to_ssa(["a", "b", "c"], inputs)
    assert ssa == ((0, 2), (1, 3))
    lin = ctg.edge_path_to_linear(["a", "b", "c"], inputs)
    tree = ctg.ContractionTree.from_path(
        inputs, (), {"a": 2, "b": 3, "c": 4}, path=lin
    )
    assert tree.is_complete()


def test_reusable_random_greedy(tmp_path):
    import cotengra_tpu as ctg

    inputs, output, shapes, size_dict = ctg.rand_equation(12, 3, seed=3)
    opt = ctg.ReusableRandomGreedyOptimizer(
        directory=str(tmp_path / "rg"), max_repeats=8
    )
    t1 = opt.search(inputs, output, size_dict)
    assert len(opt) == 1
    t2 = opt.search(inputs, output, size_dict)  # disk-cache hit
    assert t2.total_flops() == t1.total_flops()
