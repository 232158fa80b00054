"""opt_einsum interop, plotting smoke tests, instance IO, hashing,
external solver formats, agglomerative partitioning.
"""

import io
import math

import numpy as np
import pytest

import cotengra_tpu as ctg


def test_opt_einsum_interop():
    oe = pytest.importorskip("opt_einsum")
    from cotengra_tpu.oe import OEPathOptimizer

    rng = np.random.default_rng(0)
    x, y, z = (
        rng.normal(size=(8, 9)),
        rng.normal(size=(9, 10)),
        rng.normal(size=(10, 8)),
    )
    opt = OEPathOptimizer(ctg.GreedyOptimizer())
    got = oe.contract("ab,bc,ca->", x, y, z, optimize=opt)
    np.testing.assert_allclose(
        got, np.einsum("ab,bc,ca->", x, y, z), rtol=1e-8
    )


def test_opt_einsum_preset_registration():
    oe = pytest.importorskip("opt_einsum")
    names = ctg.register_opt_einsum_presets()
    # (second call is a no-op but must not raise)
    ctg.register_opt_einsum_presets()
    rng = np.random.default_rng(1)
    x, y = rng.normal(size=(4, 5)), rng.normal(size=(5, 6))
    got = oe.contract("ab,bc->ac", x, y, optimize="cotengra-greedy")
    np.testing.assert_allclose(got, x @ y, rtol=1e-8)


def test_tree_exports():
    inputs, output, shapes, size_dict = ctg.rand_equation(12, 3, seed=0)
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    G = tree.to_networkx()
    assert G.number_of_nodes() == 2 * tree.N - 1
    df = tree.to_df()
    assert len(df) == tree.N - 1
    assert df["cum_flops"].iloc[-1] == tree.total_flops()


def test_plot_smoke():
    import matplotlib

    matplotlib.use("Agg", force=True)
    inputs, output, shapes, size_dict = ctg.rand_equation(12, 3, seed=0)
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    for layout in ("ring", "tent", "span"):
        fig, ax = tree.plot_tree(layout=layout)
        assert fig is not None
    tree.plot_contractions()

    opt = ctg.HyperOptimizer(max_repeats=4, seed=0)
    opt.search(inputs, output, size_dict)
    opt.plot_trials()
    opt.plot_scatter()

    hg = ctg.get_hypergraph(inputs, output, size_dict)
    hg.plot()

    from cotengra_tpu.slicing import SliceFinder

    sf = SliceFinder(tree, target_slices=4)
    sf.plot_slicings()

    import matplotlib.pyplot as plt

    plt.close("all")


def test_instance_io_roundtrip():
    inputs, output, shapes, size_dict = ctg.rand_equation(8, 3, seed=2)
    buf = io.StringIO()
    ctg.save_instance(buf, inputs, output, size_dict)
    buf.seek(0)
    i2, o2, s2 = ctg.load_instance(buf)
    assert [tuple(t) for t in i2] == [tuple(t) for t in inputs]
    assert tuple(o2) == tuple(output)
    assert s2 == size_dict


def test_hash_contraction_b_invariance():
    inputs = [("a", "b"), ("b", "c"), ("c", "a")]
    output = ()
    size_dict = {"a": 2, "b": 3, "c": 4}
    h1 = ctg.hash_contraction_b(inputs, output, size_dict)
    # permute inputs
    h2 = ctg.hash_contraction_b(
        [inputs[2], inputs[0], inputs[1]], output, size_dict
    )
    assert h1 == h2
    # relabel indices consistently
    relabel = {"a": "x", "b": "y", "c": "z"}
    inputs3 = [tuple(relabel[ix] for ix in t) for t in inputs]
    size3 = {relabel[k]: v for k, v in size_dict.items()}
    h3 = ctg.hash_contraction_b(inputs3, output, size3)
    assert h1 == h3
    # different sizes -> different hash
    h4 = ctg.hash_contraction_b(
        inputs, output, {"a": 2, "b": 3, "c": 5}
    )
    assert h1 != h4


def test_linegraph_formats():
    from cotengra_tpu.pathfinders.linegraph import (
        LineGraph,
        td_str_to_elimination_order,
    )

    inputs = [("a", "b"), ("b", "c"), ("c", "a")]
    lg = LineGraph(inputs, ())
    gr = lg.to_gr_str()
    assert gr.startswith("p tw 3 3")
    cnf = lg.to_cnf_str()
    assert cnf.startswith("p cnf 3 3")

    # parse a hand-written tree decomposition
    td = "s td 2 2 3\nb 1 1 2\nb 2 2 3\n1 2\n"
    order = td_str_to_elimination_order(td)
    assert sorted(order) == [0, 1, 2]


def test_labels_agglom():
    from cotengra_tpu.pathfinders.labels import optimize_labels_agglom

    inputs, output, shapes, size_dict = ctg.rand_equation(40, 3, seed=5)
    path = optimize_labels_agglom(inputs, output, size_dict, seed=0)
    tree = ctg.ContractionTree.from_path(
        inputs, output, size_dict, path=path
    )
    assert tree.is_complete()
    assert tree.speedup() > 1


def test_print_contractions(capsys):
    inputs, output, shapes, size_dict = ctg.rand_equation(6, 3, seed=0)
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    tree.print_contractions()
    out = capsys.readouterr().out
    assert "flops=10^" in out
    assert out.count("\n") == tree.N - 1


def test_full_reference_preset_surface():
    """Every reference preset string registers (unconditionally, like
    the reference ``__init__.py:266-372``); dependency-pinned ones fail
    at USE time with a clear error naming the missing piece."""
    ref_presets = {
        "auto", "auto-hq", "edgesort", "greedy", "optimal",
        "optimal-outer", "random-greedy", "random-greedy-128",
        "greedy-compressed", "greedy-span", "hyper", "hyper-256",
        "hyper-greedy", "hyper-labels", "hyper-kahypar",
        "hyper-balanced", "hyper-spinglass", "hyper-betweenness",
        "hyper-compressed", "flowcutter-2", "flowcutter-10",
        "flowcutter-60", "quickbb-2", "quickbb-10", "quickbb-60",
    }
    missing = ref_presets - set(ctg.list_presets())
    assert not missing, f"unregistered reference presets: {missing}"

    from cotengra_tpu.pathfinders.external import flowcutter_available
    from cotengra_tpu.pathfinders.igraph import igraph_available

    inputs, output, shapes, size_dict = ctg.rand_equation(8, 3, seed=0)
    # igraph absent in this image: the method registers anyway (like the
    # reference) and every trial fails with ImportError, surfaced in
    # the all-trials-failed error
    from cotengra_tpu.hyper import list_hyper_functions

    assert "spinglass" in list_hyper_functions()
    if not igraph_available():
        with pytest.warns(UserWarning, match="igraph"):
            with pytest.raises(RuntimeError, match="igraph"):
                ctg.array_contract_tree(
                    inputs, output, size_dict=size_dict,
                    optimize="hyper-spinglass",
                )
    if not flowcutter_available():
        with pytest.raises(Exception):
            ctg.array_contract_tree(
                inputs, output, size_dict=size_dict,
                optimize="flowcutter-2",
            )


def test_pairwise_einsum_tensordot_standalone():
    import numpy as np

    from cotengra_tpu.ops import pairwise_einsum, tensordot

    rng = np.random.default_rng(0)
    a = rng.normal(size=(3, 4, 5))
    b = rng.normal(size=(5, 4, 6))
    np.testing.assert_allclose(
        np.asarray(pairwise_einsum("abc,cbd->ad", a, b)),
        np.einsum("abc,cbd->ad", a, b),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(tensordot(a, b, axes=([2, 1], [0, 1]))),
        np.tensordot(a, b, axes=([2, 1], [0, 1])),
        rtol=1e-12,
    )
    # single-term: diagonal + sum + implicit output
    c = rng.normal(size=(3, 4, 4))
    np.testing.assert_allclose(
        np.asarray(pairwise_einsum("abb->a", c)),
        np.einsum("abb->a", c),
        rtol=1e-12,
    )


def test_resistance_centrality():
    from cotengra_tpu.hypergraph import HyperGraph

    inputs = [("a",), ("a", "b"), ("b", "c"), ("c", "d"), ("d",)]
    hg = HyperGraph(inputs, (), {ix: 2 for ix in "abcd"})
    c = hg.resistance_centrality()
    assert max(c, key=c.get) == 2  # path-graph center
    assert min(c.values()) == 0.0 and max(c.values()) == 1.0
    # hyperedge-aware: a 3-node hyperedge connects all three
    inputs2 = [("x",), ("x", "y"), ("y",), ("y", "z"), ("z",)]
    hg2 = HyperGraph(inputs2, (), {ix: 2 for ix in "xyz"})
    c2 = hg2.resistance_centrality()
    assert len(c2) == 5


def test_plot_flat_and_rubberband_distinct():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    import cotengra_tpu as ctg

    inputs, output, shapes, size_dict = ctg.rand_equation(10, 3, seed=0)
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    fig1, ax1 = tree.plot_flat()
    fig2, ax2 = tree.plot_rubberband()
    fig3, ax3 = tree.plot_tent()
    # the flat layout is a dendrogram by contraction order: its node
    # heights differ from the tent layout's extent-based heights
    plt.close("all")


def test_make_arrays_utilities():
    """Reference capability: cotengra/utils.py:997-1340 (rand_tree,
    make_rand_size_dict_from_inputs, make_shapes_from_inputs,
    make_arrays_from_{inputs,eq})."""
    import numpy as np

    import cotengra_tpu as ctg

    inputs = [["a", "b"], ["b", "c"], ["c", "a"]]
    sd = ctg.make_rand_size_dict_from_inputs(inputs, 2, 4, seed=0)
    assert set(sd) == {"a", "b", "c"}
    assert all(2 <= d <= 4 for d in sd.values())
    shapes = ctg.make_shapes_from_inputs(inputs, sd)
    assert shapes[0] == (sd["a"], sd["b"])
    arrs = ctg.make_arrays_from_inputs(inputs, sd, seed=1)
    assert [a.shape for a in arrs] == shapes
    # deterministic under the same seed
    arrs2 = ctg.make_arrays_from_inputs(inputs, sd, seed=1)
    assert all(np.array_equal(x, y) for x, y in zip(arrs, arrs2))
    # from-eq variant, complex dtype
    arrs3 = ctg.make_arrays_from_eq("ab,bc->ac", seed=2,
                                    dtype="complex128")
    assert arrs3[0].dtype == np.complex128
    assert arrs3[0].shape[1] == arrs3[1].shape[0]


def test_rand_tree():
    import cotengra_tpu as ctg

    tree = ctg.rand_tree(10, 3, n_out=2, seed=3)
    assert tree.N == 10
    assert tree.is_complete()
    assert len(tree.output) == 2
