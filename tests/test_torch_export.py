"""Torch checkpoint export (utils/torch_export.py) — the inverse interop.

Round-trip proof: reference .pt -> import -> export -> import again gives
bit-equal params; and an exported checkpoint is loadable the way the
reference loads it (state-dict keys/shapes match a real torch LSTM module,
bias split sums to ours).
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from weatherforecast_stgcn_maml_tpu.config import ModelConfig  # noqa: E402
from weatherforecast_stgcn_maml_tpu.models.hybrid import init_hybrid  # noqa: E402
from weatherforecast_stgcn_maml_tpu.utils.torch_export import (  # noqa: E402
    export_torch_checkpoint,
    state_dicts_from_params,
)
from weatherforecast_stgcn_maml_tpu.utils.torch_import import (  # noqa: E402
    import_torch_checkpoint,
    params_from_state_dicts,
)

CFG = ModelConfig(
    hidden_channels=8, gcn_layers=2, lstm_hidden=6, lstm_layers=2,
    window=4, horizon=3, koppen_dim=5, koppen_classes=31,
)


def _canon(params):
    """Fuse split LSTM biases so native (fused `b`) and torch-imported
    (`b_ih`/`b_hh`) trees compare on effective values. Import keeps the
    split deliberately (optimizer-semantics parity, utils/torch_import.py),
    so a native->export->import roundtrip is bit-equal only up to it."""
    from weatherforecast_stgcn_maml_tpu.models.common import lstm_bias

    out = {k: v for k, v in params.items()}
    out["lstm"] = {
        "layers": [
            {"wx": l["wx"], "wh": l["wh"], "b": np.asarray(lstm_bias(l))}
            for l in params["lstm"]["layers"]
        ]
    }
    return out


def _tree_equal(a, b):
    a, b = _canon(a), _canon(b)
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_export_import_roundtrip_bit_equal(tmp_path):
    params = jax.tree.map(
        np.asarray, init_hybrid(jax.random.key(0), CFG)
    )
    path = str(tmp_path / "exported.pt")
    export_torch_checkpoint(
        path, params, CFG,
        stats={"mean": np.arange(12.0), "std": np.ones(12)},
        region=(40, 45, 285, 290), region_name="NewYork",
        extra_meta={"val_loss": 0.25},
    )
    params2, cfg2, stats2, meta2 = import_torch_checkpoint(path)
    _tree_equal(params, params2)
    assert cfg2.hidden_channels == CFG.hidden_channels
    assert cfg2.lstm_layers == CFG.lstm_layers
    assert cfg2.window == CFG.window and cfg2.horizon == CFG.horizon
    assert stats2 is not None and stats2.mean[5] == 5.0
    assert meta2["region_name"] == "NewYork"
    assert meta2["val_loss"] == 0.25


def test_exported_state_dict_loads_into_torch_lstm():
    """The reference rebuilds nn.LSTM from the checkpoint; our exported keys
    must satisfy strict load and reproduce the same math despite the
    bias_ih/bias_hh split (ours carries the sum in bias_ih)."""
    params = jax.tree.map(np.asarray, init_hybrid(jax.random.key(1), CFG))
    hybrid_sd, _ = state_dicts_from_params(params, CFG)
    lstm = torch.nn.LSTM(
        CFG.hidden_channels, CFG.lstm_hidden, num_layers=CFG.lstm_layers,
        batch_first=True,
    )
    lstm_sd = {
        k[len("lstm."):]: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in hybrid_sd.items() if k.startswith("lstm.")
    }
    lstm.load_state_dict(lstm_sd, strict=True)

    from weatherforecast_stgcn_maml_tpu.models.lstm import apply_lstm
    import jax.numpy as jnp

    x = np.random.default_rng(0).normal(
        size=(5, CFG.window, CFG.hidden_channels)
    )
    with torch.no_grad():
        out_t, _ = lstm(torch.tensor(x, dtype=torch.float32))
    ours = np.asarray(apply_lstm(params["lstm"], jnp.asarray(x, jnp.float32)))
    np.testing.assert_allclose(ours, out_t[:, -1].numpy(), rtol=1e-4, atol=1e-5)


def test_reference_then_roundtrip_is_identity(tmp_path):
    """Start from reference-made state dicts: import -> export -> import
    must be the identity on every tensor."""
    from tests.test_torch_import import _reference_state_dicts

    hybrid, koppen, _ = _reference_state_dicts(CFG, seed=3)
    params = params_from_state_dicts(hybrid, koppen, CFG)
    path = str(tmp_path / "rt.pt")
    export_torch_checkpoint(path, params, CFG)
    params2, cfg2, _, _ = import_torch_checkpoint(path)
    assert cfg2.gcn_layers == CFG.gcn_layers
    _tree_equal(params, params2)


def test_export_cli(tmp_path):
    """cli export-checkpoint reads a framework checkpoint dir."""
    from weatherforecast_stgcn_maml_tpu.cli import main as cli_main
    from weatherforecast_stgcn_maml_tpu.config import (
        ExperimentConfig, to_dict,
    )
    from weatherforecast_stgcn_maml_tpu.utils.checkpoint import save_checkpoint

    cfg = dataclasses.replace(ExperimentConfig(), model=CFG)
    params = jax.tree.map(np.asarray, init_hybrid(jax.random.key(2), CFG))
    src = str(tmp_path / "meta" / "ckpt_best")
    save_checkpoint(
        src, {"params": params},
        {"schema": "wfstgcn-meta-v1", "config": to_dict(cfg), "epoch": 4},
    )
    out = str(tmp_path / "exported_cli.pt")
    rc = cli_main([
        "export-checkpoint", src, "--out", out,
    ])
    assert rc in (0, None)
    params2, cfg2, _, meta2 = import_torch_checkpoint(out)
    _tree_equal(params, params2)
    assert meta2["epoch"] == 4
    assert cfg2.lstm_hidden == CFG.lstm_hidden
