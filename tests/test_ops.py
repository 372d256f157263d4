"""Pallas fused GCN ops vs the XLA reference path (CPU: XLA fallback +
gradient correctness of the custom VJPs)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from weatherforecast_stgcn_maml_tpu.config import ModelConfig
from weatherforecast_stgcn_maml_tpu.graph import build_region_graph
from weatherforecast_stgcn_maml_tpu.models.gcn import apply_gcn_layer, init_gcn_layer
from weatherforecast_stgcn_maml_tpu.models.hybrid import apply_hybrid, init_hybrid
from weatherforecast_stgcn_maml_tpu.models.stgcn import apply_encoder, init_encoder
from weatherforecast_stgcn_maml_tpu.ops.fused_gcn import (
    fused_gcn_layer,
    fused_gcn_stack,
)

CFG = ModelConfig(
    hidden_channels=16,
    gcn_layers=3,
    lstm_hidden=8,
    lstm_layers=1,
    window=4,
    horizon=2,
    koppen_dim=4,
    gcn_dropout=0.1,
    lstm_dropout=0.0,
)


def _inputs(n=128, c=CFG.in_channels, w=4):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(n, n)).astype(np.float32) / n)
    h = jnp.asarray(rng.normal(size=(w, n, c)), jnp.float32)
    return a, h


def test_fused_layer_matches_xla_path():
    key = jax.random.key(0)
    p = init_gcn_layer(key, CFG.in_channels, 16)
    a, h = _inputs()
    ref = jax.nn.relu(apply_gcn_layer(p, a, h))
    got = fused_gcn_layer(p, a, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_fused_layer_gradients():
    key = jax.random.key(1)
    p = init_gcn_layer(key, CFG.in_channels, 16)
    a, h = _inputs()

    def loss_fused(p, h):
        return jnp.sum(fused_gcn_layer(p, a, h) ** 2)

    def loss_ref(p, h):
        return jnp.sum(jax.nn.relu(apply_gcn_layer(p, a, h)) ** 2)

    gp_f, gh_f = jax.grad(loss_fused, argnums=(0, 1))(p, h)
    gp_r, gh_r = jax.grad(loss_ref, argnums=(0, 1))(p, h)
    np.testing.assert_allclose(np.asarray(gh_f), np.asarray(gh_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gp_f["w"]), np.asarray(gp_r["w"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gp_f["b"]), np.asarray(gp_r["b"]), rtol=1e-4, atol=1e-5
    )


def test_fused_stack_matches_layerwise():
    key = jax.random.key(2)
    enc = init_encoder(key, CFG)
    a, h = _inputs()
    ref = h
    for layer in enc["layers"]:
        ref = jax.nn.relu(apply_gcn_layer(layer, a, ref))
    got = fused_gcn_stack(enc["layers"], a, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_stack_gradients():
    key = jax.random.key(3)
    enc = init_encoder(key, CFG)
    a, h = _inputs()

    def loss_fused(layers, h):
        return jnp.sum(fused_gcn_stack(layers, a, h) ** 2)

    def loss_ref(layers, h):
        out = h
        for layer in layers:
            out = jax.nn.relu(apply_gcn_layer(layer, a, out))
        return jnp.sum(out**2)

    g_f = jax.grad(loss_fused, argnums=(0, 1))(enc["layers"], h)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(enc["layers"], h)
    for a_leaf, b_leaf in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(
            np.asarray(a_leaf), np.asarray(b_leaf), rtol=1e-4, atol=1e-5
        )


def test_fused_lstm_matches_xla_path():
    from weatherforecast_stgcn_maml_tpu.models.lstm import apply_lstm, init_lstm
    from weatherforecast_stgcn_maml_tpu.ops.fused_lstm import (
        fits_vmem,
        fused_lstm_last_hidden,
    )

    params = init_lstm(jax.random.key(7), in_dim=12, hidden=8, num_layers=3)
    # hidden=8 / c_in=12 are not 128-lane aligned: the gate must route such
    # shapes to XLA (round-3 review finding) ...
    assert not fits_vmem(params, 6)
    # ... while reference-scale aligned shapes still pass the gate.
    assert fits_vmem(
        init_lstm(jax.random.key(7), in_dim=256, hidden=128, num_layers=4), 24
    )
    x = jnp.asarray(np.random.default_rng(7).normal(size=(40, 6, 12)), jnp.float32)
    ref = apply_lstm(params, x)
    got = fused_lstm_last_hidden(params, x)  # CPU -> XLA fallback
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)

    # Gradients flow through the custom VJP.
    g = jax.grad(lambda p: jnp.sum(fused_lstm_last_hidden(p, x) ** 2))(params)
    gr = jax.grad(lambda p: jnp.sum(apply_lstm(p, x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_hybrid_pallas_lstm_flag():
    cfg = dataclasses.replace(CFG, use_pallas_lstm=True)
    params = init_hybrid(jax.random.key(8), CFG)
    g = build_region_graph(np.arange(3.0), np.arange(4.0), pad_to=128)
    x = jnp.asarray(
        np.random.default_rng(8).normal(size=(CFG.window, 128, CFG.feature_channels)),
        jnp.float32,
    )
    ref = apply_hybrid(params, jnp.asarray(g.a_hat), x, jnp.int32(1), CFG)
    got = apply_hybrid(params, jnp.asarray(g.a_hat), x, jnp.int32(1), cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_encoder_pallas_flag_eval_equivalence():
    """use_pallas_gcn=True in eval mode routes through the fused stack and
    must match the plain path; the full hybrid forward agrees too."""
    cfg = dataclasses.replace(CFG, use_pallas_gcn=True)
    enc = init_encoder(jax.random.key(4), CFG)
    a, h = _inputs()
    ref = apply_encoder(enc, a, h, CFG, train=False)
    got = apply_encoder(enc, a, h, cfg, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    params = init_hybrid(jax.random.key(5), CFG)
    g = build_region_graph(np.arange(3.0), np.arange(4.0), pad_to=128)
    x = jnp.asarray(
        np.random.default_rng(6).normal(size=(CFG.window, 128, CFG.feature_channels)),
        jnp.float32,
    )
    out_ref = apply_hybrid(params, jnp.asarray(g.a_hat), x, jnp.int32(1), CFG)
    out_pls = apply_hybrid(params, jnp.asarray(g.a_hat), x, jnp.int32(1), cfg)
    np.testing.assert_allclose(
        np.asarray(out_pls), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )
