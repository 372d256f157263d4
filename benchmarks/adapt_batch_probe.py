"""Adaptation-epoch batch-width probe (follow-up to scaling_study.md).

The meta-path scaling study found per-window cost RISES with vmap width on
one chip (bandwidth-bound backward). The adapt engine's compiled epoch
(train/supervised.py) defaults to batch_size=8 — this probe times one full
epoch (same ~488 windows) at several batch widths to find the per-window
sweet spot for the adaptation hot path. Arms interleaved per round for
contention fairness; per-arm best over rounds.

Output: benchmarks/adapt_batch_probe.json.
Run: cd /root/repo && python benchmarks/adapt_batch_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))
sys.path.insert(0, SELF_DIR)


def main(widths=(2, 4, 8, 16), rounds: int = 6) -> int:
    import jax
    import jax.numpy as jnp

    from weatherforecast_stgcn_maml_tpu.config import ModelConfig
    from weatherforecast_stgcn_maml_tpu.data.preprocess import pad_nodes, prepare_features
    from weatherforecast_stgcn_maml_tpu.data.synthetic import synthetic_region_for_box
    from weatherforecast_stgcn_maml_tpu.data.windows import WindowSpec
    from weatherforecast_stgcn_maml_tpu.graph import build_region_graph
    from weatherforecast_stgcn_maml_tpu.models.registry import init_model
    from weatherforecast_stgcn_maml_tpu.train.optimizers import adaptation_optimizer
    from weatherforecast_stgcn_maml_tpu.train.supervised import (
        SupervisedState,
        make_epoch_runner,
    )

    model_cfg = ModelConfig(compute_dtype="bfloat16")
    region = synthetic_region_for_box((18.0, 23.0, 75.0, 80.0), num_timesteps=650, seed=0)
    graph = build_region_graph(region.lats, region.lons)
    feats, _ = prepare_features(region)
    features = jnp.asarray(pad_nodes(feats, graph.padded_nodes))
    a_hat = jnp.asarray(graph.a_hat)
    mask = jnp.asarray(graph.node_mask)
    kop = jnp.int32(0)
    spec = WindowSpec(model_cfg.window, model_cfg.horizon)
    anchors = spec.window + np.arange(spec.num_samples(region.num_timesteps))
    # Use the largest window count every width divides (LCM may exceed the
    # data); otherwise truncate per arm — the per-window metric normalizes.
    total = len(anchors)
    tx, _ = adaptation_optimizer("India")
    params = init_model(jax.random.key(0), model_cfg)

    arms = []
    for b in widths:
        n_b = (total // b) * b
        batches = jnp.asarray(anchors[:n_b].reshape(-1, b))
        state = SupervisedState(
            params=jax.tree.map(jnp.array, params), opt_state=tx.init(params)
        )
        run = make_epoch_runner(model_cfg, tx, spec)
        t0 = time.perf_counter()
        state, losses = run(
            state, features, batches, a_hat, mask, kop,
            jnp.float32(5e-4), jax.random.key(1),
        )
        np.asarray(losses)
        print(f"[batch] B={b}: compiled+first-epoch {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        arms.append({"b": b, "batches": batches, "state": state, "run": run, "times": []})

    from _interleave import run_interleaved

    def make_rep(arm):
        counter = [0]

        def rep():
            counter[0] += 1
            arm["state"], losses = arm["run"](
                arm["state"], features, arm["batches"], a_hat, mask, kop,
                jnp.float32(5e-4), jax.random.key(10 + counter[0]),
            )
            np.asarray(losses)  # forced fetch

        return rep

    timed = run_interleaved(
        {f"B={a['b']}": make_rep(a) for a in arms}, rounds, "batch"
    )
    out = {
        str(a["b"]): {
            "epoch_best_ms": timed[f"B={a['b']}"]["best_ms"],
            "us_per_window": timed[f"B={a['b']}"]["best_ms"]
            / (total // a["b"] * a["b"]) * 1e3,
            "epoch_median_ms": timed[f"B={a['b']}"]["median_ms"],
        }
        for a in arms
    }
    out["windows_per_epoch"] = total
    with open(os.path.join(SELF_DIR, "adapt_batch_probe.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
