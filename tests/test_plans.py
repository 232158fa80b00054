"""Committed contraction plans must load, validate, and match their
advertised quality."""

import glob
import json
import math
import os

import pytest

import cotengra_tpu as ctg

PLAN_DIR = os.path.join(os.path.dirname(__file__), "..", "plans")


def test_m20_plan_loads_and_matches_metadata():
    path = os.path.join(PLAN_DIR, "sycamore53_m20_t30.json")
    if not os.path.exists(path):
        pytest.skip("no m20 plan committed")
    from cotengra_tpu.models.circuits import rand_circuit_tn
    from cotengra_tpu.ops.preprocess import absorb_simple_tensors

    inputs, output, shapes, size_dict, arrays = rand_circuit_tn(
        n_qubits=53, depth=20, seed=42
    )
    inputs, arrays = absorb_simple_tensors(
        inputs, arrays, output, max_rank=2, max_absorb_size=2**12
    )
    size_dict = {
        ix: int(d)
        for t, a in zip(inputs, arrays)
        for ix, d in zip(t, a.shape)
    }
    tree = ctg.load_tree(path, inputs, output, size_dict)
    assert tree.is_complete()
    meta = json.load(open(path))
    assert math.isclose(
        tree.total_flops(log=10), meta["log10_flops"], abs_tol=0.01
    )
    assert tree.max_size() <= 2**30


def test_plan_hash_rejects_wrong_instance(tmp_path):
    inputs, output, shapes, size_dict = ctg.rand_equation(8, 3, seed=0)
    tree = ctg.array_contract_tree(
        inputs, output, size_dict=size_dict, optimize="greedy"
    )
    f = tmp_path / "plan.json"
    ctg.save_tree(str(f), tree)
    # same structure, different instance -> must be rejected
    inputs2, output2, shapes2, size_dict2 = ctg.rand_equation(
        8, 3, seed=1
    )
    with pytest.raises(ValueError):
        ctg.load_tree(str(f), inputs2, output2, size_dict2)
    # round trip on the right instance preserves everything
    t2 = ctg.load_tree(str(f), inputs, output, size_dict)
    assert t2.contract_stats() == tree.contract_stats()


def test_all_committed_plans_parse():
    for path in glob.glob(os.path.join(PLAN_DIR, "*.json")):
        if path.endswith(".refamp.json"):
            # CPU-f64 reference-amplitude sidecar, not a plan
            continue
        data = json.load(open(path))
        assert "hash_b" in data and "children" in data


def test_refamp_sidecars_parse():
    """bench.py relerr sidecars (scratch/make_ref_amp.py) carry f64
    partial amplitudes keyed by first-n slice count."""
    for path in glob.glob(os.path.join(PLAN_DIR, "*.refamp.json")):
        data = json.load(open(path))
        assert data["dtype"] == "complex128"
        for n, (re, im) in data["amps"].items():
            assert int(n) > 0
            assert math.isfinite(re) and math.isfinite(im)
            assert (re, im) != (0.0, 0.0)
