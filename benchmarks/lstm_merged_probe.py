"""Merged-gates fused LSTM stack vs the split-dot variant.

Each recurrent step's x@wx + h@wh pair is the latency bottleneck of the
whole meta step (96 tiny matmul pairs per forward). The merged variant
(ops/fused_lstm_stack.py `_MERGED_GATES`) concatenates [inp | h_prev] and
the per-layer weights so every (t, l) runs ONE [B, C+H] @ [C+H, 4H]
contraction forward — and the backward's 6 dots collapse to 3 (recompute,
dgates@W^T, xh^T@dgates). Same FLOPs, half the MXU instruction count on
the sequential chain.

Two interleaved measurements (contention discipline per CLAUDE.md):
  1. train-mode LSTM-grad microbench: 90 chained grads of the fused stack
     with dropout masks active, vmap 2 tasks — merged vs split;
  2. the decision metric: full clean-window meta step, merged vs split.

Output: benchmarks/lstm_merged_probe.json.
Run: cd /root/repo && python benchmarks/lstm_merged_probe.py
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

    # --- 0. parity: merged vs split at reference shapes, train mode -------
    t, b, h, c, layers, iters = 24, 512, 128, 256, 4, 90
    params = init_lstm(jax.random.key(0), c, h, layers)
    x2 = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, b, t, c)).astype(np.float32)
    )
    key = jax.random.key(7)

    def stack_loss(merged):
        def f(p, xx):
            out = jax.vmap(
                lambda xb: fused_lstm_stack.lstm_stack_last_all(
                    p, xb, dropout_rate=0.2, train=True, rng=key,
                    compute_dtype=jnp.bfloat16, merged=merged,
                )
            )(xx)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    g_split = jax.jit(jax.grad(stack_loss(False)))(params, x2)
    g_merged = jax.jit(jax.grad(stack_loss(True)))(params, x2)
    rel = jax.tree.map(
        lambda a, bb: float(
            np.max(np.abs(np.asarray(a, np.float32) - np.asarray(bb, np.float32)))
            / (np.max(np.abs(np.asarray(a, np.float32))) or 1.0)
        ),
        g_split, g_merged,
    )
    worst = max(jax.tree.leaves(rel))
    assert worst <= 5e-2, ("merged-vs-split grad parity", worst)
    report["grad_parity_max_rel"] = worst
    print(f"[lstm-merged] grad parity max rel {worst:.2e}", file=sys.stderr)

    # --- 1. train-mode LSTM-grad microbench -------------------------------
    def make_arm(merged):
        def one(params, x):
            def body(p, k):
                g = jax.grad(
                    lambda pp: jnp.sum(
                        jax.vmap(
                            lambda xb: fused_lstm_stack.lstm_stack_last_all(
                                pp, xb, dropout_rate=0.2, train=True, rng=k,
                                compute_dtype=jnp.bfloat16, merged=merged,
                            )
                        )(x).astype(jnp.float32) ** 2
                    )
                )(p)
                return jax.tree.map(lambda a, b_: a - 1e-9 * b_, p, g), None

            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                jnp.arange(iters)
            )
            p, _ = jax.lax.scan(body, params, keys)
            return p

        fn = jax.jit(one)
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(params, x2))[0])
        print(
            f"[lstm-merged] grad merged={merged} compiled "
            f"{time.perf_counter() - t0:.1f}s", file=sys.stderr,
        )

        def rep():
            np.asarray(jax.tree.leaves(fn(params, x2))[0])

        return rep

    timed = run_interleaved(
        {"split": make_arm(False), "merged": make_arm(True)},
        rounds, "lstm-grad",
    )
    for k in timed:
        timed[k]["ms_per_iter"] = timed[k]["best_ms"] / iters
    report["lstm_grad_90iter_train"] = timed

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
    for name, merged in (("split", False), ("merged", True)):
        # The flag is baked in at trace time: set it, build + compile the
        # step, restore. Each arm's executable keeps its own variant.
        # Fresh state per arm: the jitted step donates its state argument,
        # so a shared state0 is deleted by the first arm's warmup.
        state0 = init_meta_state(jax.random.key(0), model_cfg, meta_cfg)
        saved = fused_lstm_stack._MERGED_GATES
        fused_lstm_stack._MERGED_GATES = merged
        try:
            step = make_jit_meta_step(model_cfg, meta_cfg)
            t0 = time.perf_counter()
            state, m = step(state0, tasks, jax.random.key(1))
            float(np.asarray(m["meta_loss"]))
            compile_s = time.perf_counter() - t0
            print(f"[lstm-merged] meta {name} compiled {compile_s:.1f}s",
                  file=sys.stderr)
            state, m = step(state, tasks, jax.random.key(1))
            float(np.asarray(m["meta_loss"]))
        finally:
            fused_lstm_stack._MERGED_GATES = saved
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

    with open(os.path.join(SELF_DIR, "lstm_merged_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
