"""Model-family registry: both families train through every engine."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherforecast_stgcn_maml_tpu.config import (
    AdaptConfig,
    DataConfig,
    ExperimentConfig,
    MetaConfig,
    ModelConfig,
)
from weatherforecast_stgcn_maml_tpu.data.synthetic import synthetic_region_for_box
from weatherforecast_stgcn_maml_tpu.engines.adapt import run_adaptation
from weatherforecast_stgcn_maml_tpu.engines.meta_train import run_meta_training
from weatherforecast_stgcn_maml_tpu.engines.validate import run_validation
from weatherforecast_stgcn_maml_tpu.graph import build_region_graph
from weatherforecast_stgcn_maml_tpu.models.registry import apply_model, init_model

BOX = (10.0, 10.75, 20.0, 20.75)

STGCN_CFG = ModelConfig(
    family="stgcn",
    hidden_channels=8,
    gcn_layers=2,
    lstm_hidden=8,
    lstm_layers=1,
    window=6,
    horizon=2,
    koppen_dim=4,
)


def test_unknown_family_raises():
    bad = dataclasses.replace(STGCN_CFG, family="transformer")
    with pytest.raises(ValueError, match="unknown model family"):
        init_model(jax.random.key(0), bad)
    with pytest.raises(ValueError, match="unknown model family"):
        apply_model({}, None, None, None, bad)


def test_stgcn_family_forward():
    params = init_model(jax.random.key(0), STGCN_CFG)
    assert "lstm" not in params and "koppen" in params
    g = build_region_graph(np.arange(2.0), np.arange(3.0), pad_to=128)
    x = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(STGCN_CFG.window, 128, STGCN_CFG.feature_channels)
        ),
        jnp.float32,
    )
    out = apply_model(params, jnp.asarray(g.a_hat), x, jnp.int32(2), STGCN_CFG)
    assert out.shape == (STGCN_CFG.horizon, 128, 12)
    assert np.isfinite(np.asarray(out)).all()


def test_stgcn_family_through_all_engines(tmp_path):
    cfg = ExperimentConfig(
        model=STGCN_CFG,
        meta=MetaConfig(
            num_epochs=2, meta_batch=2, grad_accum=1, inner_epochs=1,
            inner_batches=2, query_train_mode=False,
        ),
        adapt=AdaptConfig(epochs=2, batch_size=4, max_samples=30),
        data=DataConfig(synthetic_timesteps=40, validate_max_timesteps=16),
        out_dir=str(tmp_path / "out"),
    )
    regions = [
        synthetic_region_for_box(BOX, num_timesteps=40, seed=1, name="A"),
        synthetic_region_for_box(
            (30.0, 30.75, 40.0, 40.75), num_timesteps=40, seed=2, name="B"
        ),
    ]
    mres = run_meta_training(cfg, regions, log_cb=lambda *_: None)
    assert np.isfinite(mres.best_loss)

    region = synthetic_region_for_box(BOX, num_timesteps=40, seed=3, name="A")
    ares = run_adaptation(
        cfg, BOX, "StgcnRegion", meta_ckpt=mres.best_path, region=region,
        log_cb=lambda *_: None,
    )
    assert np.isfinite(ares.val_mse)
    assert ares.epoch_losses[-1] <= ares.epoch_losses[0] * 1.5

    vres = run_validation(cfg, BOX, "StgcnRegion", make_plots=False, log_cb=lambda *_: None)
    assert vres.model_kind == "adapted"
    assert np.isfinite(vres.results["average_mse"])

    # Family mismatch fails with a clear message, not an Orbax tree error.
    hybrid_cfg = dataclasses.replace(cfg, model=dataclasses.replace(STGCN_CFG, family="hybrid"))
    with pytest.raises(ValueError, match="family"):
        run_validation(
            hybrid_cfg, BOX, "StgcnRegion", make_plots=False, log_cb=lambda *_: None
        )
    with pytest.raises(ValueError, match="family"):
        run_adaptation(
            hybrid_cfg, BOX, "Other", meta_ckpt=mres.best_path, region=region,
            log_cb=lambda *_: None,
        )
