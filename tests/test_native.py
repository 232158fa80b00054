"""Native C++ kernel parity with the Python fallbacks."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import cotengra_tpu as ctg
from cotengra_tpu.ops import native
from cotengra_tpu.pathfinders import basic

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native kernels unavailable"
)


@pytest.mark.parametrize("seed", range(4))
def test_native_greedy_valid_tree(seed):
    inputs, output, shapes, size_dict = ctg.rand_equation(
        30, 3, n_out=2, n_hyper_in=1, seed=seed
    )
    path = native.optimize_greedy(
        inputs, output, size_dict, seed=seed, use_ssa=True
    )
    tree = ctg.ContractionTree.from_path(
        inputs, output, size_dict, ssa_path=path
    )
    assert tree.is_complete()
    assert tree.speedup() > 1


@pytest.mark.parametrize("seed", range(4))
def test_native_random_greedy_flops_exact(seed):
    inputs, output, shapes, size_dict = ctg.rand_equation(
        20, 3, n_out=2, seed=seed
    )
    path, lf = native.optimize_random_greedy_track_flops(
        inputs, output, size_dict, ntrials=8, seed=seed, use_ssa=True
    )
    tree = ctg.ContractionTree.from_path(
        inputs, output, size_dict, ssa_path=path
    )
    assert tree.total_flops(log=10) == pytest.approx(lf, abs=1e-6)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("minimize", ["flops", "size", "combo-64"])
def test_native_optimal_matches_python(seed, minimize):
    inputs, output, shapes, size_dict = ctg.rand_equation(
        9, 3, seed=seed
    )
    pn = native.optimize_optimal(
        inputs, output, size_dict, minimize=minimize, use_ssa=True
    )
    pp = basic.optimize_optimal(
        inputs, output, size_dict, minimize=minimize, use_ssa=True,
        accel=False,
    )
    tn = ctg.ContractionTree.from_path(
        inputs, output, size_dict, ssa_path=pn
    )
    tp = ctg.ContractionTree.from_path(
        inputs, output, size_dict, ssa_path=pp
    )
    # the DP itself is exact on each connected component; tiny absolute
    # differences can arise in the heuristic scalar / disconnected glue
    if minimize == "flops":
        import math

        assert math.isclose(
            tn.total_flops(log=10), tp.total_flops(log=10), abs_tol=0.01
        )
    elif minimize == "size":
        assert tn.max_size() == tp.max_size()
    else:
        import math

        assert math.isclose(
            tn.combo_cost(log=10), tp.combo_cost(log=10), abs_tol=0.01
        )


@pytest.mark.parametrize("seed", range(5))
def test_native_path_contract_correct(seed):
    """End to end: native-planned path contracts to the right numbers."""
    inputs, output, shapes, size_dict = ctg.perverse_equation(
        8, n_inputs=5, seed=seed
    )
    rng = np.random.default_rng(seed)
    arrays = [rng.normal(size=s) for s in shapes]
    path = native.optimize_greedy(inputs, output, size_dict, seed=seed)
    tree = ctg.ContractionTree.from_path(
        inputs, output, size_dict, path=path
    )
    got = tree.contract(arrays)
    eq = ctg.utils.inds_to_eq(inputs, output)
    expected = np.einsum(eq, *arrays, optimize=True)
    assert_allclose(np.asarray(got), expected, rtol=1e-8)


@pytest.mark.parametrize("compress_late", [False, True])
def test_native_compressed_replay_parity(compress_late):
    inputs, output, shapes, size_dict = ctg.lattice_equation(
        [6, 6], d_min=4
    )
    tree = ctg.ContractionTreeCompressed.from_path(
        inputs,
        output,
        size_dict,
        ssa_path=ctg.optimize_greedy(
            inputs, output, size_dict, use_ssa=True, seed=0
        ),
    )
    s_py = tree.compressed_contract_stats(
        chi=16, accel=False, compress_late=compress_late
    )
    s_cc = tree.compressed_contract_stats(
        chi=16, accel="auto", compress_late=compress_late
    )
    assert (s_py.flops, s_py.write, s_py.max_size, s_py.peak_size) == (
        s_cc.flops, s_cc.write, s_cc.max_size, s_cc.peak_size,
    )


def test_native_determinism():
    inputs, output, shapes, size_dict = ctg.rand_equation(40, 3, seed=7)
    r1 = native.optimize_random_greedy_track_flops(
        inputs, output, size_dict, ntrials=8, seed=123
    )
    r2 = native.optimize_random_greedy_track_flops(
        inputs, output, size_dict, ntrials=8, seed=123
    )
    assert r1 == r2
