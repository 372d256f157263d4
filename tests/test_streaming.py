"""Chunked HBM streaming for long adaptation histories."""

import dataclasses

import numpy as np
import pytest

from weatherforecast_stgcn_maml_tpu.config import (
    AdaptConfig,
    DataConfig,
    ExperimentConfig,
    MetaConfig,
    ModelConfig,
)
from weatherforecast_stgcn_maml_tpu.data.streaming import (
    assign_anchors,
    plan_chunks,
)
from weatherforecast_stgcn_maml_tpu.data.synthetic import synthetic_region_for_box
from weatherforecast_stgcn_maml_tpu.data.windows import WindowSpec
from weatherforecast_stgcn_maml_tpu.engines.adapt import run_adaptation
from weatherforecast_stgcn_maml_tpu.engines.meta_train import run_meta_training

SPEC = WindowSpec(window=6, horizon=2)


def test_plan_chunks_single_when_fits():
    assert plan_chunks(100, SPEC, 0) == plan_chunks(100, SPEC, 200)
    chunks = plan_chunks(100, SPEC, 0)
    assert len(chunks) == 1 and chunks[0].start == 0 and chunks[0].stop == 100


def test_plan_chunks_overlap_and_uniform_size():
    chunks = plan_chunks(100, SPEC, 40)
    assert all(c.stop - c.start == 40 for c in chunks)
    # Consecutive chunks overlap by window + horizon.
    for a, b in zip(chunks, chunks[1:]):
        assert a.stop - b.start >= SPEC.window + SPEC.horizon
    assert chunks[-1].stop == 100


def test_plan_chunks_too_small_raises():
    with pytest.raises(ValueError):
        plan_chunks(100, SPEC, SPEC.window + SPEC.horizon)


def test_assign_anchors_covers_all_exactly_once():
    t = 100
    chunks = plan_chunks(t, SPEC, 40)
    global_anchors = SPEC.valid_anchors(t)
    local_sets = assign_anchors(chunks, global_anchors, SPEC)
    covered = []
    for ch, local in zip(chunks, local_sets):
        covered.extend((local + ch.start).tolist())
        # Every local anchor's window+horizon fits inside its chunk.
        assert all(la - SPEC.window >= 0 for la in local)
        assert all(la + SPEC.horizon < ch.stop - ch.start for la in local)
    assert sorted(covered) == global_anchors.tolist()


def test_streamed_adaptation_matches_unstreamed(tmp_path):
    """Chunked adaptation must produce the same learning signal as the
    device-resident path (same anchors, same data; shuffle off so batch
    composition differs only by chunk grouping)."""
    cfg = ExperimentConfig(
        model=ModelConfig(
            hidden_channels=8, gcn_layers=2, lstm_hidden=8, lstm_layers=1,
            window=6, horizon=2, koppen_dim=4,
        ),
        meta=MetaConfig(
            num_epochs=1, meta_batch=1, grad_accum=1, inner_epochs=1,
            inner_batches=2, query_train_mode=False,
        ),
        adapt=AdaptConfig(epochs=2, batch_size=4, max_samples=60, shuffle=False),
        data=DataConfig(synthetic_timesteps=96),
        out_dir=str(tmp_path / "out"),
    )
    box = (10.0, 10.75, 20.0, 20.75)
    regions = [synthetic_region_for_box(box, num_timesteps=96, seed=1, name="A")]
    mres = run_meta_training(cfg, regions, log_cb=lambda *_: None)

    region = synthetic_region_for_box(box, num_timesteps=96, seed=2, name="A")
    res_full = run_adaptation(
        cfg, box, "Full", meta_ckpt=mres.best_path, region=region,
        log_cb=lambda *_: None,
    )
    streamed_cfg = dataclasses.replace(
        cfg, adapt=dataclasses.replace(cfg.adapt, max_device_timesteps=40)
    )
    logs = []
    res_stream = run_adaptation(
        streamed_cfg, box, "Streamed", meta_ckpt=mres.best_path, region=region,
        log_cb=logs.append,
    )
    assert any("streaming" in l and "chunks" in l for l in logs)
    assert np.isfinite(res_stream.val_mse)
    # Same data, same total anchor set -> very similar outcomes (batch
    # grouping differs across chunk boundaries, so not bit-identical).
    assert res_stream.val_mse == pytest.approx(res_full.val_mse, rel=0.15)
