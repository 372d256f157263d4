"""Import reference PyTorch checkpoints into this framework's param tree.

A user of the reference has `.pt` checkpoints saved by
train_hybrid_maml_v5.py:311-335 / adapt_hybrid_v5.py:240-257 with keys
`hybrid_model_state_dict`, `koppen_embed_state_dict`, `config`,
`hybrid_config`, and (adapted) `stats`. This module maps those tensors onto
the functional param tree of `models/hybrid.py` so trained reference models
can be validated/served/fine-tuned here.

Mapping notes (shapes are reference -> ours):
  * GCNConv `lin.weight` [out, in] -> encoder layer `w` [in, out] (transpose;
    PyG stores the dense transform transposed relative to x @ W). GCNConv
    `bias` [out] -> `b`.
  * LSTM `weight_ih_l{k}` [4H, in] -> `wx` [in, 4H] (transpose), same gate
    order (i, f, g, o); `weight_hh_l{k}` -> `wh`; `bias_ih`/`bias_hh` ->
    SEPARATE leaves `b_ih`/`b_hh`. The forward only ever sees their sum
    (models/common.py lstm_bias), but keeping both preserves torch's
    optimizer semantics when fine-tuning imported weights: Adam steps the
    two identical-gradient copies independently, so the effective bias
    moves at 2x a fused bias's rate and the clip norm counts it twice
    (tests/test_recipe_parity.py). Natively-initialized models use a
    single fused `b`.
  * `output_layer.weight` [H*12, lstm_hidden] -> head `w` (transpose).
  * Koppen `embedding.weight` [31, 8] -> `koppen` as-is.
  * The reference STGCN's own `output_layer` is dead weight in the hybrid
    path (SURVEY quirk 4) and is ignored.

Semantics caveat: parameters transfer exactly, but this framework runs the
*intended* forward (per-timestep graph convolution, aligned outputs —
docs/REFERENCE_SEMANTICS.md #10/#12), so outputs are not bit-identical to
the reference's buggy flattened forward. That is the point.
"""

from __future__ import annotations

import numpy as np

from weatherforecast_stgcn_maml_tpu.config import ModelConfig
from weatherforecast_stgcn_maml_tpu.data.preprocess import NormStats


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def params_from_state_dicts(
    hybrid_state: dict, koppen_state: dict, cfg: ModelConfig
) -> dict:
    """Build the hybrid param tree from reference state dicts."""
    enc_layers = []
    for i in range(1, cfg.gcn_layers + 1):
        w = _np(hybrid_state[f"base_stgcn.conv{i}.lin.weight"]).T
        key_b = f"base_stgcn.conv{i}.bias"
        b = (
            _np(hybrid_state[key_b])
            if key_b in hybrid_state
            else np.zeros(w.shape[1], np.float32)
        )
        enc_layers.append({"w": w.astype(np.float32), "b": b.astype(np.float32)})

    lstm_layers = []
    for l in range(cfg.lstm_layers):
        wx = _np(hybrid_state[f"lstm.weight_ih_l{l}"]).T
        wh = _np(hybrid_state[f"lstm.weight_hh_l{l}"]).T
        lstm_layers.append(
            {
                "wx": wx.astype(np.float32),
                "wh": wh.astype(np.float32),
                "b_ih": _np(hybrid_state[f"lstm.bias_ih_l{l}"]).astype(
                    np.float32
                ),
                "b_hh": _np(hybrid_state[f"lstm.bias_hh_l{l}"]).astype(
                    np.float32
                ),
            }
        )

    head_w = _np(hybrid_state["output_layer.weight"]).T
    head_b = _np(hybrid_state["output_layer.bias"])
    koppen = _np(koppen_state["embedding.weight"])

    return {
        "encoder": {"layers": enc_layers},
        "lstm": {"layers": lstm_layers},
        "head": {"w": head_w.astype(np.float32), "b": head_b.astype(np.float32)},
        "koppen": koppen.astype(np.float32),
    }


def model_config_from_checkpoint(ckpt: dict) -> ModelConfig:
    """Reconstruct a ModelConfig from the reference checkpoint's config
    blocks (train_hybrid_maml_v5.py:321-332), falling back to the reference
    defaults the validator hardcodes (validate_hybrid_v5.py:58-69)."""
    config = ckpt.get("config", {})
    hybrid = ckpt.get("hybrid_config", {})
    return ModelConfig(
        hidden_channels=int(config.get("hidden_channels", 256)),
        window=int(config.get("window_size", 24)),
        horizon=int(config.get("forecast_horizon", 8)),
        lstm_hidden=int(hybrid.get("lstm_hidden_size", 128)),
        lstm_layers=int(hybrid.get("lstm_num_layers", 4)),
        lstm_dropout=float(hybrid.get("lstm_dropout", 0.2)),
    )


def import_torch_checkpoint(path: str, *, allow_unsafe_pickle: bool = False):
    """Load a reference .pt checkpoint -> (params, ModelConfig, NormStats|None, meta).

    Requires torch (CPU build is enough). Loads with torch's safe
    `weights_only=True` by default (the reference schema is tensors + plain
    dicts + numpy stats, train_hybrid_maml_v5.py:311-335); a checkpoint
    needing arbitrary pickle execution is refused unless the caller
    explicitly opts in with `allow_unsafe_pickle=True` for a TRUSTED file.
    """
    import dataclasses

    import torch

    if allow_unsafe_pickle:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    else:
        try:
            import numpy as _np

            # The reference's adapted checkpoints store numpy stats
            # arrays/scalars; allowlist exactly the numpy reconstruction
            # machinery (arrays, dtypes, scalar rebuild) and nothing else.
            _ma = _np._core.multiarray
            safe = [_np.ndarray, _np.dtype, _ma._reconstruct, _ma.scalar]
            safe += [
                getattr(_np.dtypes, n)
                for n in dir(_np.dtypes)
                if n.endswith("DType")
            ]
            with torch.serialization.safe_globals(safe):
                ckpt = torch.load(path, map_location="cpu", weights_only=True)
        except Exception as e:
            raise RuntimeError(
                f"safe (weights_only) load of {path!r} failed: {e}\n"
                "If you trust this file, retry with "
                "allow_unsafe_pickle=True (executes pickle bytecode)."
            ) from e
    cfg = model_config_from_checkpoint(ckpt)
    hybrid_state = ckpt["hybrid_model_state_dict"]
    koppen_state = ckpt["koppen_embed_state_dict"]
    # Infer structural facts directly from the tensors (robust to
    # non-default architectures).
    n_convs = sum(
        1 for k in hybrid_state if k.startswith("base_stgcn.conv") and k.endswith(".lin.weight")
    )
    n_lstm = sum(
        1 for k in hybrid_state if k.startswith("lstm.weight_ih_l")
    )
    kop_classes, kop_dim = koppen_state["embedding.weight"].shape
    cfg = dataclasses.replace(
        cfg,
        gcn_layers=n_convs or cfg.gcn_layers,
        lstm_layers=n_lstm or cfg.lstm_layers,
        koppen_classes=int(kop_classes),
        koppen_dim=int(kop_dim),
    )
    params = params_from_state_dicts(hybrid_state, koppen_state, cfg)
    stats = None
    if isinstance(ckpt.get("stats"), dict) and "mean" in ckpt["stats"]:
        stats = NormStats(
            mean=np.asarray(ckpt["stats"]["mean"], np.float32).reshape(-1),
            std=np.asarray(ckpt["stats"]["std"], np.float32).reshape(-1),
        )
    meta = {
        k: ckpt[k]
        for k in ("model_version", "epoch", "best_loss", "region_name", "val_loss")
        if k in ckpt
    }
    return params, cfg, stats, meta
