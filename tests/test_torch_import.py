"""Reference-checkpoint import: torch state dicts -> functional param tree.

Builds a faithful reference-shaped torch module graph (GCNConv-style linear
weights, 4-layer LSTM, output head, Koppen embedding), saves a checkpoint in
the reference schema, imports it, and checks (a) every tensor lands in the
right place and (b) the imported LSTM/head reproduce torch's numerics.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from weatherforecast_stgcn_maml_tpu.config import ModelConfig  # noqa: E402
from weatherforecast_stgcn_maml_tpu.models.lstm import apply_lstm  # noqa: E402
from weatherforecast_stgcn_maml_tpu.utils.torch_import import (  # noqa: E402
    import_torch_checkpoint,
    model_config_from_checkpoint,
    params_from_state_dicts,
)

CFG = ModelConfig(
    hidden_channels=8, gcn_layers=2, lstm_hidden=6, lstm_layers=2,
    window=4, horizon=3, koppen_dim=5, koppen_classes=31,
)


def _reference_state_dicts(cfg: ModelConfig, seed=0):
    torch.manual_seed(seed)
    hybrid = {}
    d_in = cfg.in_channels
    for i in range(1, cfg.gcn_layers + 1):
        hybrid[f"base_stgcn.conv{i}.lin.weight"] = torch.randn(
            cfg.hidden_channels, d_in
        )
        hybrid[f"base_stgcn.conv{i}.bias"] = torch.randn(cfg.hidden_channels)
        d_in = cfg.hidden_channels
    # Dead-weight STGCN head present in reference checkpoints (quirk 4).
    hybrid["base_stgcn.output_layer.weight"] = torch.randn(
        12 * cfg.horizon, cfg.hidden_channels
    )
    hybrid["base_stgcn.output_layer.bias"] = torch.randn(12 * cfg.horizon)
    lstm = torch.nn.LSTM(
        cfg.hidden_channels, cfg.lstm_hidden, num_layers=cfg.lstm_layers,
        batch_first=True,
    )
    for k, v in lstm.state_dict().items():
        hybrid[f"lstm.{k}"] = v
    hybrid["output_layer.weight"] = torch.randn(
        12 * cfg.horizon, cfg.lstm_hidden
    )
    hybrid["output_layer.bias"] = torch.randn(12 * cfg.horizon)
    koppen = {"embedding.weight": torch.randn(cfg.koppen_classes, cfg.koppen_dim)}
    return hybrid, koppen, lstm


def test_params_from_state_dicts_shapes_and_values():
    hybrid, koppen, _ = _reference_state_dicts(CFG)
    params = params_from_state_dicts(hybrid, koppen, CFG)
    assert params["encoder"]["layers"][0]["w"].shape == (CFG.in_channels, 8)
    np.testing.assert_array_equal(
        params["encoder"]["layers"][0]["w"],
        hybrid["base_stgcn.conv1.lin.weight"].numpy().T,
    )
    np.testing.assert_array_equal(
        params["head"]["w"], hybrid["output_layer.weight"].numpy().T
    )
    np.testing.assert_array_equal(
        params["koppen"], koppen["embedding.weight"].numpy()
    )
    # Import keeps torch's two bias copies as separate leaves (optimizer-
    # semantics parity); the forward consumes their sum via lstm_bias.
    layer1 = params["lstm"]["layers"][1]
    np.testing.assert_array_equal(
        layer1["b_ih"], hybrid["lstm.bias_ih_l1"].numpy()
    )
    np.testing.assert_array_equal(
        layer1["b_hh"], hybrid["lstm.bias_hh_l1"].numpy()
    )
    from weatherforecast_stgcn_maml_tpu.models.common import lstm_bias

    np.testing.assert_allclose(
        np.asarray(lstm_bias(layer1)),
        (hybrid["lstm.bias_ih_l1"] + hybrid["lstm.bias_hh_l1"]).numpy(),
        rtol=1e-6,
    )


def test_imported_lstm_matches_torch_forward():
    hybrid, koppen, torch_lstm = _reference_state_dicts(CFG)
    params = params_from_state_dicts(hybrid, koppen, CFG)
    x = np.random.default_rng(0).normal(size=(5, CFG.window, CFG.hidden_channels))
    with torch.no_grad():
        out_t, _ = torch_lstm(torch.tensor(x, dtype=torch.float32))
    last_torch = out_t[:, -1].numpy()
    last_jax = np.asarray(
        apply_lstm(params["lstm"], jnp.asarray(x, jnp.float32))
    )
    np.testing.assert_allclose(last_jax, last_torch, rtol=1e-4, atol=1e-5)


def test_full_checkpoint_roundtrip(tmp_path):
    hybrid, koppen, _ = _reference_state_dicts(CFG)
    path = str(tmp_path / "ref.pt")
    torch.save(
        {
            "hybrid_model_state_dict": hybrid,
            "koppen_embed_state_dict": koppen,
            "config": {
                "input_channels": CFG.in_channels,
                "hidden_channels": CFG.hidden_channels,
                "output_channels": 12,
                "window_size": CFG.window,
                "forecast_horizon": CFG.horizon,
            },
            "hybrid_config": {
                "lstm_hidden_size": CFG.lstm_hidden,
                "lstm_num_layers": CFG.lstm_layers,
                "lstm_dropout": 0.2,
            },
            "stats": {"mean": np.arange(12.0), "std": np.ones(12)},
            "model_version": "5.0",
            "epoch": 17,
        },
        path,
    )
    params, cfg, stats, meta = import_torch_checkpoint(path)
    assert cfg.hidden_channels == CFG.hidden_channels
    assert cfg.lstm_layers == CFG.lstm_layers
    assert cfg.window == CFG.window and cfg.horizon == CFG.horizon
    assert stats is not None and stats.mean[3] == 3.0
    assert meta["model_version"] == "5.0" and meta["epoch"] == 17
    # Imported params drive the (intended-semantics) forward.
    from weatherforecast_stgcn_maml_tpu.graph import build_region_graph
    from weatherforecast_stgcn_maml_tpu.models.hybrid import apply_hybrid

    g = build_region_graph(np.arange(2.0), np.arange(3.0), pad_to=128)
    x = jnp.asarray(
        np.random.default_rng(1).normal(
            size=(cfg.window, 128, cfg.feature_channels)
        ),
        jnp.float32,
    )
    out = apply_hybrid(params, jnp.asarray(g.a_hat), x, jnp.int32(2), cfg)
    assert out.shape == (cfg.horizon, 128, 12)
    assert np.isfinite(np.asarray(out)).all()


def test_config_fallback_defaults():
    cfg = model_config_from_checkpoint({})
    assert cfg.hidden_channels == 256
    assert cfg.lstm_hidden == 128 and cfg.lstm_layers == 4
    assert cfg.window == 24 and cfg.horizon == 8
