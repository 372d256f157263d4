"""Model-family registry: one init/apply dispatch for every engine.

Families (ModelConfig.family):
  "hybrid" — STGCN encoder -> scanned LSTM -> head (the flagship,
             models/hybrid.py; reference HybridSTGCN_LSTM).
  "stgcn"  — STGCN encoder -> last-slice head (models/stgcn.py; the
             reference's standalone backbone, model.py:7-52).

Both share the apply signature
  apply(params, a_hat, x, koppen_code, cfg, *, train, rng) -> [H, N, 12]
so MAML, supervised adaptation, validation, and forecasting are family-
agnostic.
"""

from __future__ import annotations

from weatherforecast_stgcn_maml_tpu.config import ModelConfig
from weatherforecast_stgcn_maml_tpu.models.hybrid import apply_hybrid, init_hybrid
from weatherforecast_stgcn_maml_tpu.models.stgcn import (
    apply_stgcn_forecaster,
    init_stgcn_forecaster,
)

_FAMILIES = {
    "hybrid": (init_hybrid, apply_hybrid),
    "stgcn": (init_stgcn_forecaster, apply_stgcn_forecaster),
}


def init_model(key, cfg: ModelConfig):
    try:
        # Lookup only — an internal KeyError from a valid family's init
        # must not be misreported as "unknown family".
        init_fn = _FAMILIES[cfg.family][0]
    except KeyError:
        raise ValueError(
            f"unknown model family {cfg.family!r}; known: {sorted(_FAMILIES)}"
        ) from None
    return init_fn(key, cfg)


def apply_model(params, a_hat, x, koppen_code, cfg: ModelConfig, *, train=False, rng=None):
    try:
        apply_fn = _FAMILIES[cfg.family][1]
    except KeyError:
        raise ValueError(
            f"unknown model family {cfg.family!r}; known: {sorted(_FAMILIES)}"
        ) from None
    return apply_fn(params, a_hat, x, koppen_code, cfg, train=train, rng=rng)
