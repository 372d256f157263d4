"""Graph construction: kNN edges, dense normalization, padding isolation."""

import numpy as np
import pytest

from weatherforecast_stgcn_maml_tpu.graph import (
    build_region_graph,
    grid_node_positions,
    knn_edges,
    normalized_adjacency,
    round_up,
)


def test_round_up():
    assert round_up(441) == 512
    assert round_up(128) == 128
    assert round_up(1) == 128
    assert round_up(21, 8) == 24


def test_grid_node_positions_row_major():
    lats = np.array([0.0, 1.0])
    lons = np.array([10.0, 11.0, 12.0])
    pos = grid_node_positions(lats, lons)
    # lat-outer, lon-inner order must match the [T, lat, lon] -> [T, N] reshape.
    assert pos.shape == (6, 2)
    np.testing.assert_allclose(pos[0], [0.0, 10.0])
    np.testing.assert_allclose(pos[1], [0.0, 11.0])
    np.testing.assert_allclose(pos[3], [1.0, 10.0])


def test_knn_edges_matches_bruteforce():
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 10, size=(30, 2))
    k = 4
    edges = knn_edges(pos, k=k)
    assert edges.shape == (30 * k, 2)
    for dst in range(30):
        mine = edges[edges[:, 1] == dst][:, 0]
        d = np.linalg.norm(pos - pos[dst], axis=1)
        d[dst] = np.inf
        expected = set(np.argsort(d)[:k])
        assert set(mine.tolist()) == expected
        assert dst not in mine  # no self loops in the edge list


def test_knn_on_grid_prefers_axis_neighbors():
    pos = grid_node_positions(np.arange(5.0), np.arange(5.0))
    edges = knn_edges(pos, k=4)
    # Interior node (2,2) = index 12: neighbors are the 4 axis-adjacent cells.
    nbrs = set(edges[edges[:, 1] == 12][:, 0].tolist())
    assert nbrs == {7, 11, 13, 17}


def test_normalized_adjacency_symmetric_normalization():
    # Path graph 0->1, 1->0, 1->2, 2->1 plus self loops.
    edges = np.array([[0, 1], [1, 0], [1, 2], [2, 1]])
    a = normalized_adjacency(edges, 3)
    # Row sums of D^-1/2 (A+I) D^-1/2 are <= 1, diag positive.
    assert a.shape == (3, 3)
    assert np.all(np.diag(a) > 0)
    # Symmetric for a symmetric edge set.
    np.testing.assert_allclose(a, a.T, atol=1e-6)
    # deg(0)=2, deg(1)=3: a[0,1] = 1/sqrt(2*3)
    np.testing.assert_allclose(a[0, 1], 1 / np.sqrt(6), atol=1e-6)


def test_padding_rows_are_zero():
    edges = np.array([[0, 1], [1, 0]])
    a = normalized_adjacency(edges, 2, pad_to=8)
    assert a.shape == (8, 8)
    assert np.all(a[2:, :] == 0)
    assert np.all(a[:, 2:] == 0)


def test_build_region_graph():
    g = build_region_graph(np.arange(3.0), np.arange(7.0), k_neighbors=4)
    assert g.num_nodes == 21
    assert g.padded_nodes == 128
    assert g.node_mask.sum() == 21
    assert np.all(g.node_mask[21:] == 0)
    # Real-node block row-stochastic-ish: every real row has mass.
    assert np.all(g.a_hat[:21].sum(axis=1) > 0)


def test_pad_to_too_small_raises():
    with pytest.raises(ValueError):
        build_region_graph(np.arange(3.0), np.arange(7.0), pad_to=16)
