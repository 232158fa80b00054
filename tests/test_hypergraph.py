"""HyperGraph behavior: mutation, costs, centrality, compression."""

import pytest

import cotengra_tpu as ctg
from cotengra_tpu.hypergraph import HyperGraph


def example():
    inputs, output, shapes, size_dict = ctg.rand_equation(
        12, 3, n_out=1, n_hyper_in=1, seed=0
    )
    return HyperGraph(inputs, output, size_dict), inputs, output, size_dict


def test_counts_and_sizes():
    hg, inputs, output, size_dict = example()
    assert hg.get_num_nodes() == len(inputs)
    assert hg.get_num_edges() == len(
        {ix for term in inputs for ix in term}
    )
    for i, term in enumerate(inputs):
        expect = 1
        for ix in term:
            expect *= size_dict[ix]
        assert hg.node_size(i) == expect


def test_contract_keeps_external_inds():
    hg, inputs, output, size_dict = example()
    # pick two neighbors
    i = 0
    j = hg.neighbors(0)[0]
    before_edges = set(hg.edges)
    k = hg.contract(i, j)
    assert not hg.has_node(i) and not hg.has_node(j)
    assert hg.has_node(k)
    # every index on k appears elsewhere or in the output
    for ix in hg.get_node(k):
        others = [n for n in hg.edges[ix] if n != k]
        assert others or ix in output


def test_compress_caps_multibonds():
    # two nodes sharing two bonds of size 4 -> one bond capped at chi
    hg = HyperGraph(
        [("a", "b"), ("a", "b", "c")], ("c",), {"a": 4, "b": 4, "c": 2}
    )
    hg.compress(chi=8)
    shared = [
        ix for ix in hg.get_node(0) if ix in set(hg.get_node(1))
    ]
    assert len(shared) == 1
    assert hg.edge_size(shared[0]) == 8


def test_centrality_and_distance():
    inputs, output, shapes, size_dict = ctg.lattice_equation(
        [5, 5], d_min=2
    )
    hg = HyperGraph(inputs, output, size_dict)
    cent = hg.simple_centrality()
    assert set(cent) == set(hg.nodes)
    assert all(0.0 <= v <= 1.0 for v in cent.values())
    # the middle of the lattice is more central than a corner
    assert cent[12] > cent[0]
    dist = hg.simple_distance([0])
    assert dist[0] == 0
    assert dist[24] == 8  # manhattan across the 5x5 lattice


def test_compression_cost_hooks():
    hg, *_ = example()
    nodes = [0, hg.neighbors(0)[0]]
    assert hg.neighborhood_size(nodes) > 0
    assert hg.contract_pair_cost(*nodes) >= hg.node_size(0)
    assert hg.neighborhood_compress_cost(2, nodes) >= 0


def test_to_networkx():
    hg, inputs, *_ = example()
    G = hg.to_networkx()
    assert G.number_of_nodes() >= len(inputs)
