"""V-batched merged LSTM kernel vs grid-serialized vmap of the kernel.

jax.vmap of a pallas_call prepends a grid dimension, so the meta loop's
task-vmap runs V whole kernel instances back to back — V independent
recurrent chains serialized, each leaving the MXU half-idle on its
latency-bound chain of [B, C+H] dots. ops/fused_lstm_stack.py `_VBATCH`
routes the vmap into one kernel instance that issues the V chains' dots
adjacently at every (t, l) via jax.custom_batching.custom_vmap.

Two interleaved measurements (contention discipline per CLAUDE.md):
  1. train-mode LSTM-grad microbench: 90 chained grads, vmap 2 tasks with
     per-task weights (grad inside vmap — the MAML shape);
  2. the decision metric: full clean-window meta step, vbatch on vs off.

Output: benchmarks/lstm_vbatch_probe.json.
Run: cd /root/repo && python benchmarks/lstm_vbatch_probe.py
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
    from weatherforecast_stgcn_maml_tpu.config import (
        DataConfig,
        MetaConfig,
        ModelConfig,
    )
    from weatherforecast_stgcn_maml_tpu.data.synthetic import (
        synthetic_region_for_box,
    )
    from weatherforecast_stgcn_maml_tpu.models.lstm import init_lstm
    from weatherforecast_stgcn_maml_tpu.ops import fused_lstm_stack
    from weatherforecast_stgcn_maml_tpu.train.maml import (
        init_meta_state,
        make_jit_meta_step,
    )
    from weatherforecast_stgcn_maml_tpu.train.tasks import (
        build_meta_tasks,
        stack_tasks,
    )

    report: dict = {"backend": jax.default_backend()}

    # --- 0. parity: vbatch vs serialized at reference shapes, train mode --
    t, b, h, c, layers, iters, ntasks = 24, 512, 128, 256, 4, 90, 2
    params_v = [
        init_lstm(jax.random.key(v), c, h, layers) for v in range(ntasks)
    ]
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *params_v)
    x_v = jnp.asarray(
        np.random.default_rng(1)
        .normal(size=(ntasks, b, t, c))
        .astype(np.float32)
    )
    key = jax.random.key(7)

    def grad_fn(vbatch):
        def per_task(p, x):
            def loss(pp):
                saved = fused_lstm_stack._VBATCH
                fused_lstm_stack._VBATCH = vbatch
                try:
                    out = fused_lstm_stack.lstm_stack_last_all(
                        pp, x, dropout_rate=0.2, train=True, rng=key,
                        compute_dtype=jnp.bfloat16,
                    )
                finally:
                    fused_lstm_stack._VBATCH = saved
                return jnp.sum(out.astype(jnp.float32) ** 2)

            return jax.grad(loss)(p)

        return jax.jit(jax.vmap(per_task))

    g_ser = grad_fn(False)(stacked, x_v)
    g_vb = grad_fn(True)(stacked, x_v)
    rel = jax.tree.map(
        lambda a, bb: float(
            np.max(np.abs(np.asarray(a, np.float32) - np.asarray(bb, np.float32)))
            / (np.max(np.abs(np.asarray(a, np.float32))) or 1.0)
        ),
        g_ser, g_vb,
    )
    worst = max(jax.tree.leaves(rel))
    assert worst <= 5e-2, ("vbatch-vs-serialized grad parity", worst)
    report["grad_parity_max_rel"] = worst
    print(f"[lstm-vbatch] grad parity max rel {worst:.2e}", file=sys.stderr)

    # --- 1. train-mode LSTM-grad microbench (grad inside vmap) ------------
    def make_arm(vbatch):
        def chain(stacked, x):
            def body(p, k):
                saved = fused_lstm_stack._VBATCH
                fused_lstm_stack._VBATCH = vbatch
                try:
                    def per_task(pt, xt):
                        def loss(pp):
                            out = fused_lstm_stack.lstm_stack_last_all(
                                pp, xt, dropout_rate=0.2, train=True, rng=k,
                                compute_dtype=jnp.bfloat16,
                            )
                            return jnp.sum(out.astype(jnp.float32) ** 2)

                        return jax.grad(loss)(pt)

                    g = jax.vmap(per_task)(p, x)
                finally:
                    fused_lstm_stack._VBATCH = saved
                return jax.tree.map(lambda a, b_: a - 1e-9 * b_, p, g), None

            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                jnp.arange(iters)
            )
            p, _ = jax.lax.scan(body, stacked, keys)
            return p

        fn = jax.jit(chain)
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(stacked, x_v))[0])
        print(
            f"[lstm-vbatch] grad vbatch={vbatch} compiled "
            f"{time.perf_counter() - t0:.1f}s", file=sys.stderr,
        )

        def rep():
            np.asarray(jax.tree.leaves(fn(stacked, x_v))[0])

        return rep

    timed = run_interleaved(
        {"serialized": make_arm(False), "vbatch": make_arm(True)},
        rounds, "lstm-grad",
    )
    for k in timed:
        timed[k]["ms_per_iter"] = timed[k]["best_ms"] / iters
    report["lstm_grad_90iter_train_vmap2"] = timed

    # --- 2. full meta step -------------------------------------------------
    boxes = [(10.0 + 6 * i, 15.0 + 6 * i, 20.0, 25.0) for i in range(4)]
    regions = [
        synthetic_region_for_box(bx, num_timesteps=160, seed=i)
        for i, bx in enumerate(boxes)
    ]
    meta_cfg = MetaConfig()
    model_cfg = ModelConfig(compute_dtype="bfloat16")
    built = build_meta_tasks(regions, model_cfg, meta_cfg, DataConfig())
    tasks = jax.tree.map(jnp.asarray, stack_tasks([bb.task for bb in built]))

    arms = {}
    for name, vbatch in (("serialized", False), ("vbatch", True)):
        # The flag is baked in at trace time: set it, build + compile the
        # step, restore. Fresh state per arm (the step donates its state).
        state0 = init_meta_state(jax.random.key(0), model_cfg, meta_cfg)
        saved = fused_lstm_stack._VBATCH
        fused_lstm_stack._VBATCH = vbatch
        try:
            step = make_jit_meta_step(model_cfg, meta_cfg)
            t0 = time.perf_counter()
            state, m = step(state0, tasks, jax.random.key(1))
            float(np.asarray(m["meta_loss"]))
            compile_s = time.perf_counter() - t0
            print(f"[lstm-vbatch] meta {name} compiled {compile_s:.1f}s",
                  file=sys.stderr)
            state, m = step(state, tasks, jax.random.key(1))
            float(np.asarray(m["meta_loss"]))
        finally:
            fused_lstm_stack._VBATCH = saved
        arms[name] = {"state": state, "step": step, "compile_s": compile_s}

    def make_rep(arm):
        counter = [0]

        def rep():
            counter[0] += 1
            arm["state"], m = arm["step"](
                arm["state"], tasks, jax.random.key(10 + counter[0])
            )
            float(np.asarray(m["meta_loss"]))

        return rep

    timed = run_interleaved(
        {k: make_rep(a) for k, a in arms.items()}, rounds, "meta-step"
    )
    report["meta_step"] = {
        k: {**timed[k], "compile_s": arms[k]["compile_s"]} for k in arms
    }

    with open(os.path.join(SELF_DIR, "lstm_vbatch_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
