"""Relative-coordinate feature channels (ROADMAP #2 box-invariance)."""

import numpy as np
import jax

from weatherforecast_stgcn_maml_tpu.config import DataConfig, MetaConfig, ModelConfig
from weatherforecast_stgcn_maml_tpu.data.preprocess import (
    prepare_features,
    relative_coord_channels,
)
from weatherforecast_stgcn_maml_tpu.data.synthetic import synthetic_region_for_box
from weatherforecast_stgcn_maml_tpu.train.maml import (
    init_meta_state,
    make_jit_meta_step,
)
from weatherforecast_stgcn_maml_tpu.train.tasks import build_meta_tasks, stack_tasks


def test_relative_coords_box_invariant_and_appended():
    r1 = synthetic_region_for_box((10, 11, 20, 21), num_timesteps=40, seed=0)
    r2 = synthetic_region_for_box((40, 41, 80, 81), num_timesteps=40, seed=0)
    c1, c2 = relative_coord_channels(r1), relative_coord_channels(r2)
    np.testing.assert_allclose(c1, c2)  # same box shape -> identical channels
    assert c1.min() == -1.0 and c1.max() == 1.0

    feats, _ = prepare_features(r1, rel_coords=True)
    assert feats.shape[-1] == 18
    np.testing.assert_allclose(feats[0, :, 16:], c1, atol=1e-6)
    # Constant over time.
    np.testing.assert_allclose(feats[-1, :, 16:], feats[0, :, 16:])


def test_meta_step_trains_with_relative_coords(tiny_model_cfg):
    import dataclasses

    cfg = dataclasses.replace(tiny_model_cfg, relative_coords=True)
    assert cfg.feature_channels == 18 and cfg.in_channels == cfg.koppen_dim + 18
    meta = MetaConfig(meta_batch=2, grad_accum=1, inner_epochs=1, inner_batches=2)
    regions = [
        synthetic_region_for_box((10.0 + i, 11.0 + i, 20.0, 21.0),
                                 num_timesteps=48, seed=i)
        for i in range(2)
    ]
    built = build_meta_tasks(regions, cfg, meta, DataConfig())
    tasks = stack_tasks([b.task for b in built])
    assert tasks.support_x.shape[-1] == 18

    state = init_meta_state(jax.random.key(0), cfg, meta)
    step = make_jit_meta_step(cfg, meta)
    state, metrics = step(state, tasks, jax.random.key(1))
    assert np.isfinite(float(metrics["meta_loss"]))
