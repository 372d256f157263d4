"""Node-sharded (spatial-parallel) forward vs the unsharded reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from weatherforecast_stgcn_maml_tpu.config import MeshConfig, ModelConfig
from weatherforecast_stgcn_maml_tpu.graph import (
    build_distance_weighted_graph,
    build_region_graph,
)
from weatherforecast_stgcn_maml_tpu.models.hybrid import apply_hybrid, init_hybrid
from weatherforecast_stgcn_maml_tpu.models.losses import masked_mse
from weatherforecast_stgcn_maml_tpu.parallel.mesh import make_mesh
from weatherforecast_stgcn_maml_tpu.parallel.spatial import (
    make_spatial_forward,
    spatial_mse,
)

CFG = ModelConfig(
    hidden_channels=16,
    gcn_layers=2,
    lstm_hidden=8,
    lstm_layers=2,
    window=6,
    horizon=3,
    koppen_dim=4,
    gcn_dropout=0.0,
    lstm_dropout=0.0,
)


def _mesh(axis="sp", n=8):
    return make_mesh(MeshConfig(data_axis=axis, num_devices=n))


def test_spatial_forward_matches_unsharded():
    mesh = _mesh()
    g = build_region_graph(np.arange(5.0), np.arange(6.0), pad_to=128)
    params = init_hybrid(jax.random.key(0), CFG)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(CFG.window, 128, CFG.feature_channels)),
        jnp.float32,
    )
    a = jnp.asarray(g.a_hat)
    kop = jnp.int32(3)

    ref = apply_hybrid(params, a, x, kop, CFG, train=False)
    fwd = make_spatial_forward(CFG, mesh)
    got = fwd(params, a, x, kop)
    assert got.shape == (CFG.horizon, 128, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_spatial_mse_matches_masked_mse():
    mesh = _mesh()
    rng = np.random.default_rng(1)
    preds = jnp.asarray(rng.normal(size=(3, 128, 12)), jnp.float32)
    targets = jnp.asarray(rng.normal(size=(3, 128, 12)), jnp.float32)
    mask = np.zeros(128, np.float32)
    mask[:30] = 1.0
    ref = masked_mse(preds, targets, jnp.asarray(mask))
    got = spatial_mse(mesh)(preds, targets, jnp.asarray(mask))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_distance_weighted_graph():
    g = build_distance_weighted_graph(
        np.arange(4.0), np.arange(4.0), distance_threshold=1.5
    )
    assert g.num_nodes == 16
    assert g.padded_nodes == 128
    a = g.a_hat[:16, :16]
    # Symmetric, self-loops present, zero beyond the threshold.
    np.testing.assert_allclose(a, a.T, atol=1e-6)
    assert np.all(np.diag(a) > 0)
    # Nodes 0 (corner, (0,0)) and 15 ((3,3)) are far apart -> no edge.
    assert a[0, 15] == 0.0
    # Adjacent nodes (dist 1) and diagonal (sqrt2 < 1.5) connected.
    assert a[0, 1] > 0 and a[0, 5] > 0
    # Works in the model like any other adjacency.
    params = init_hybrid(jax.random.key(0), CFG)
    x = jnp.zeros((CFG.window, 128, CFG.feature_channels))
    out = apply_hybrid(params, jnp.asarray(g.a_hat), x, jnp.int32(1), CFG)
    assert np.isfinite(np.asarray(out)).all()
