"""Row-folded LSTM window batch vs grid-serialized vmap, adaptation path.

The adaptation engine vmaps the model over its window batch with SHARED
weights. Default pallas batching runs the LSTM stack kernel on a
(V, T) grid — V x T dependent recurrent dots at 512 rows each.
ops/fused_lstm_stack.py `_ROWFOLD` folds the windows into the kernel's
row dimension instead: T dependent dots at V*512 rows — half the
dependency-chain length at double width, the lever the roofline analysis
(benchmarks/roofline_r3.md) identifies as the real latency reducer.

Measures the real supervised train step (train/supervised.py, batch 2 —
the production adapt configuration) chained 90x in-graph, _ROWFOLD on vs
off, interleaved. Output: benchmarks/adapt_fold_probe.json.
Run: cd /root/repo && python benchmarks/adapt_fold_probe.py
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


def main(rounds: int = 10) -> int:
    import jax
    import jax.numpy as jnp

    from _interleave import run_interleaved
    from weatherforecast_stgcn_maml_tpu.config import ModelConfig
    from weatherforecast_stgcn_maml_tpu.data.preprocess import (
        pad_nodes,
        prepare_features,
    )
    from weatherforecast_stgcn_maml_tpu.data.synthetic import (
        synthetic_region_for_box,
    )
    from weatherforecast_stgcn_maml_tpu.data.windows import (
        WindowSpec,
        gather_batch,
    )
    from weatherforecast_stgcn_maml_tpu.graph import build_region_graph
    from weatherforecast_stgcn_maml_tpu.models.registry import init_model
    from weatherforecast_stgcn_maml_tpu.ops import fused_lstm_stack
    from weatherforecast_stgcn_maml_tpu.train.optimizers import (
        adaptation_optimizer,
    )
    from weatherforecast_stgcn_maml_tpu.train.supervised import (
        SupervisedState,
        make_train_step,
    )

    report: dict = {"backend": jax.default_backend()}
    model_cfg = ModelConfig(compute_dtype="bfloat16")
    region = synthetic_region_for_box(
        (10.0, 15.0, 20.0, 25.0), num_timesteps=200, seed=0
    )
    g = build_region_graph(region.lats, region.lons)
    feats, _ = prepare_features(region)
    feats = jnp.asarray(pad_nodes(feats, g.padded_nodes))
    a_hat = jnp.asarray(g.a_hat)
    node_mask = jnp.asarray(g.node_mask)
    koppen = jnp.asarray(region.koppen_code, jnp.int32)
    spec = WindowSpec(model_cfg.window, model_cfg.horizon)
    tx, lr = adaptation_optimizer(region.name or "NewYork")
    params = init_model(jax.random.key(2), model_cfg)
    iters, batch = 90, 2
    anchors = jnp.asarray(spec.valid_anchors(feats.shape[0])[:batch])
    bx, by = gather_batch(feats, anchors, spec)
    bx = jax.device_put(bx)
    by = jax.device_put(by)
    key = jax.random.key(7)

    arms = {}
    for name, fold in (("serialized", False), ("rowfold", True)):
        saved = fused_lstm_stack._ROWFOLD
        fused_lstm_stack._ROWFOLD = fold
        try:
            step = make_train_step(model_cfg, tx)

            @jax.jit
            def chain(state, bx, by, step=step):
                def body(s, k):
                    s, loss = step(
                        s, bx, by, a_hat, node_mask, koppen, lr, k
                    )
                    return s, loss

                keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                    jnp.arange(iters)
                )
                state, losses = jax.lax.scan(body, state, keys)
                return state, losses[-1]

            state0 = SupervisedState(params, tx.init(params))
            t0 = time.perf_counter()
            state, loss = chain(state0, bx, by)
            float(np.asarray(loss))
            compile_s = time.perf_counter() - t0
            print(f"[adapt-fold] {name} compiled {compile_s:.1f}s "
                  f"loss {float(np.asarray(loss)):.4f}", file=sys.stderr)
        finally:
            fused_lstm_stack._ROWFOLD = saved
        arms[name] = {"chain": chain, "state": state, "compile_s": compile_s,
                      "loss": float(np.asarray(loss))}

    # Numerics: both arms after 90 steps from the same init must agree.
    d = abs(arms["serialized"]["loss"] - arms["rowfold"]["loss"])
    rel = d / (abs(arms["serialized"]["loss"]) or 1.0)
    assert rel < 5e-2, ("rowfold-vs-serialized 90-step loss", rel)
    report["loss_rel_diff_90steps"] = rel

    def make_rep(arm):
        def rep():
            arm["state"], loss = arm["chain"](arm["state"], bx, by)
            float(np.asarray(loss))

        return rep

    timed = run_interleaved(
        {k: make_rep(v) for k, v in arms.items()}, rounds, "adapt-90step"
    )
    for k in timed:
        timed[k]["ms_per_window"] = timed[k]["best_ms"] / (iters * batch)
        timed[k]["windows_per_sec"] = 1000.0 / timed[k]["ms_per_window"]
    report["adapt_train_90steps_batch2"] = timed

    with open(os.path.join(SELF_DIR, "adapt_fold_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
