"""Drawing canvas + circuit/altair plot smoke and geometry tests."""

import math

import pytest

import cotengra_tpu as ctg

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg", force=True)

from cotengra_tpu.schematic import (  # noqa: E402
    Drawing,
    _convex_hull,
    auto_colors,
    average_color,
    axonometric_project,
    coo_to_zorder,
    darken_color,
    get_color,
    hash_to_color,
    hash_to_nvalues,
    jitter_color,
    mod_sat,
    set_coloring_seed,
)


def test_axonometric_projection_axes():
    # the z axis projects straight up
    x0, y0 = axonometric_project(0, 0, 0)
    x1, y1 = axonometric_project(0, 0, 1)
    assert x1 == pytest.approx(x0)
    assert y1 == pytest.approx(y0 + 1)
    # x and y go opposite horizontal directions
    xa, _ = axonometric_project(1, 0, 0)
    xb, _ = axonometric_project(0, 1, 0)
    assert xa > 0 > xb


def test_zorder_monotone_toward_viewer():
    assert coo_to_zorder(1, 0, 0) > coo_to_zorder(0, 0, 0)
    assert coo_to_zorder(0, 1, 0) < coo_to_zorder(0, 0, 0)
    assert coo_to_zorder(0, 0, 1) > coo_to_zorder(0, 0, 0)


def test_color_utils():
    c = get_color("blue")
    assert len(c) == 4
    assert get_color("blue", alpha=0.5)[3] == 0.5
    d = darken_color(c)
    assert all(dc <= cc for dc, cc in zip(d[:3], c[:3]))
    a = average_color([c, get_color("red")])
    assert len(a) == 4
    assert len(jitter_color(c)) == 4
    assert len(mod_sat(c, 0.5)) == 4
    cols = auto_colors(7)
    assert len(cols) == 7
    assert len(set(cols)) == 7


def test_hash_to_color_deterministic():
    set_coloring_seed(42)
    c1 = hash_to_color("abc")
    c2 = hash_to_color("abc")
    assert c1 == c2
    assert hash_to_color("abd") != c1
    vals = hash_to_nvalues("xyz", 3)
    assert len(vals) == 3
    assert all(0 <= v < 1 for v in vals)


def test_convex_hull_square():
    pts = [(0, 0), (1, 0), (1, 1), (0, 1), (0.5, 0.5), (0.2, 0.8)]
    hull = _convex_hull(pts)
    assert sorted(hull) == [(0, 0), (0, 1), (1, 0), (1, 1)]


def test_drawing_primitives_smoke():
    d = Drawing(figsize=(3, 3))
    d.text((0, 0), "hello")
    d.text_between((0, 0), (2, 1), "edge")
    d.label_ax(0.5, 0.9, "axlabel")
    d.label_fig(0.5, 0.99, "figlabel")
    d.circle((1, 1), radius=0.3)
    d.wedge((2, 2), 0, 120)
    d.dot((0.5, 0.5))
    d.regular_polygon((1, 2), n=5)
    for m in "o s v ^ < > D h".split():
        d.marker((3, 1), marker=m, radius=0.1)
    d.square((2, 0))
    d.line((0, 0), (1, 1), arrowhead=True, text="ln")
    d.line_offset((0, 1), (2, 1), offset=0.3)
    d.curve([(0, 0), (1, 0.5), (2, 0), (3, 1)])
    d.shape([(0, 0), (1, 0), (0.5, 1)])
    d.rectangle((0, 0), (1, 2))
    d.rectangle((1, 1), (2, 3), radius=0.1)
    d.patch([(0, 0), (1, 0), (1, 1), (0, 1)])
    d.patch_around([(0, 0), (1, 1), (2, 0)], radius=0.4)
    d.patch_around_circles((0, 0), 0.5, (3, 0), 0.5)
    import matplotlib.pyplot as plt

    plt.close(d.fig)


def test_drawing_3d_coordinates_and_presets():
    d = Drawing(presets={"wire": {"color": (1, 0, 0, 1)}})
    ln = d.line((0, 0, 0), (1, 1, 1), preset="wire")
    assert ln.get_color() == (1, 0, 0, 1)
    d.cube((0, 0, 0))
    c = d.circle((1, 0, 0))
    # 3d coords get a depth-based zorder
    assert c.get_zorder() != 0 or ln.get_zorder() != 0
    import matplotlib.pyplot as plt

    plt.close(d.fig)


def test_drawing_external_ax_does_not_own_limits():
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    d = Drawing(ax=ax)
    assert not d.fig_owner
    d.circle((100, 100))
    plt.close(fig)


def _small_tree():
    inputs, output, shapes, size_dict = ctg.rand_equation(8, 3, seed=1)
    return ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )


def test_plot_tree_circuit_smoke():
    import matplotlib.pyplot as plt

    tree = _small_tree()
    fig, ax = tree.plot_circuit()
    # one circle per internal contraction
    import matplotlib.patches as mp

    ncircles = sum(
        isinstance(p, mp.Circle) for p in ax.patches
    )
    assert ncircles == len(tree.children)
    plt.close(fig)


def test_altair_variants():
    pytest.importorskip("altair")
    inputs, output, shapes, size_dict = ctg.rand_equation(10, 3, seed=2)
    opt = ctg.HyperOptimizer(max_repeats=4, seed=0)
    opt.search(inputs, output, size_dict)
    opt.plot_trials_alt()
    opt.plot_scatter_alt()
    tree = _small_tree()
    tree.plot_contractions_alt()


def test_trials_to_df():
    from cotengra_tpu.plot import trials_to_df

    inputs, output, shapes, size_dict = ctg.rand_equation(10, 3, seed=2)
    opt = ctg.HyperOptimizer(max_repeats=4, seed=0)
    opt.search(inputs, output, size_dict)
    df = trials_to_df(opt)
    assert len(df) == 4
    assert df["best_score"].is_monotonic_decreasing
    assert math.isfinite(df["log10_flops"].iloc[0])
