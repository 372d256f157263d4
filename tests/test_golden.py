"""Golden regression values: fixed-seed training trajectories on CPU.

Guards against silent numerics regressions (wrong normalization order,
broken rng threading, adjacency changes). Tolerances are loose enough to
survive XLA/jax version bumps but tight enough to catch semantic changes.
If a DELIBERATE change moves these values, re-record them in the same
commit and say why in its message.
"""

import jax
import numpy as np

from weatherforecast_stgcn_maml_tpu.config import DataConfig, MetaConfig, ModelConfig
from weatherforecast_stgcn_maml_tpu.data.preprocess import prepare_features
from weatherforecast_stgcn_maml_tpu.data.synthetic import synthetic_region_for_box
from weatherforecast_stgcn_maml_tpu.train.maml import (
    init_meta_state,
    make_jit_meta_step,
)
from weatherforecast_stgcn_maml_tpu.train.tasks import build_meta_tasks, stack_tasks

MODEL_CFG = ModelConfig(
    hidden_channels=8,
    gcn_layers=2,
    lstm_hidden=8,
    lstm_layers=2,
    window=6,
    horizon=2,
    koppen_dim=4,
)
META_CFG = MetaConfig(
    meta_batch=2, grad_accum=1, inner_epochs=1, inner_batches=3,
)


def test_golden_synthetic_stats():
    region = synthetic_region_for_box(
        (10.0, 10.75, 20.0, 20.75), num_timesteps=64, seed=42
    )
    _, stats = prepare_features(region)
    # t2m mean ~288 K with the generator's fixed offsets.
    np.testing.assert_allclose(stats.mean[2], 288.03, atol=0.5)
    np.testing.assert_allclose(stats.std[2], 4.20, atol=0.5)


def test_golden_meta_training_trajectory():
    regions = [
        synthetic_region_for_box(
            (10.0 + i, 10.75 + i, 20.0, 20.75), num_timesteps=48, seed=100 + i
        )
        for i in range(2)
    ]
    built = build_meta_tasks(regions, MODEL_CFG, META_CFG, DataConfig())
    tasks = jax.tree.map(np.asarray, stack_tasks([b.task for b in built]))
    state = init_meta_state(jax.random.key(0), MODEL_CFG, META_CFG)
    step = make_jit_meta_step(MODEL_CFG, META_CFG)
    losses = []
    for e in range(3):
        state, m = step(state, tasks, jax.random.key(e))
        losses.append(float(m["meta_loss"]))
    golden = [0.7848, 0.7824, 0.7809]  # recorded 2026-08-16, jax 0.9.0 CPU
    np.testing.assert_allclose(losses, golden, rtol=0.02)


def test_bench_flop_accounting_multiplies_scan_trips():
    """Round-1 regression class: XLA cost_analysis counts a lax.scan body
    ONCE, so the meta-step FLOP floor must multiply by the real trip counts
    (bench.flops_per_meta_step). Guard the multiplier structure: the derived
    FLOPs scale linearly with inner_epochs (trip count), and the quick
    workload's derived value equals batch x steps x one-inner-grad FLOPs."""
    import os
    import sys

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_bench_inputs, flops_per_meta_step
    from weatherforecast_stgcn_maml_tpu.config import DataConfig, MetaConfig
    from weatherforecast_stgcn_maml_tpu.train.tasks import build_meta_tasks, stack_tasks
    from weatherforecast_stgcn_maml_tpu.data.synthetic import synthetic_region_for_box

    state, step, tasks, graph, model_cfg, meta_cfg = build_bench_inputs(
        quick=True, dtype="float32"
    )
    f1 = flops_per_meta_step(state, tasks, model_cfg, meta_cfg)
    assert f1 > 0

    # Doubling inner_epochs must scale the derived FLOPs by the trip-count
    # ratio (steps = epochs*S + Q), NOT leave them constant (the bug).
    meta2 = MetaConfig(
        meta_batch=meta_cfg.meta_batch, grad_accum=meta_cfg.grad_accum,
        inner_epochs=meta_cfg.inner_epochs * 2,
        inner_batches=meta_cfg.inner_batches,
    )
    f2 = flops_per_meta_step(state, tasks, model_cfg, meta2)
    s_count = int(tasks.support_x.shape[1])
    q = min(meta_cfg.query_batches, int(tasks.query_x.shape[1]))
    steps1 = meta_cfg.inner_epochs * s_count + q
    steps2 = meta2.inner_epochs * s_count + min(meta2.query_batches, int(tasks.query_x.shape[1]))
    np.testing.assert_allclose(f2 / f1, steps2 / steps1, rtol=1e-6)
