"""Time-blocked fused GCN training kernel vs the per-slice variant.

ops/fused_gcn_train.py `_TIME_BLOCK` folds wb time slices into each grid
program: the H@W contraction runs over wb*N rows at once, each block's dW
is ONE wb*N-deep contraction, and the dW/db accumulator round-trips drop
by wb. The per-slice A dots stay per-slice (A is block-diagonal over
time).

Two interleaved measurements (contention discipline per CLAUDE.md):
  1. train-mode encoder-grad microbench: 90 chained grads of the fused
     encoder (dropout active), vmap 2 tasks — wb 1 vs 4 (and 8);
  2. the decision metric: full clean-window meta step, wb 1 vs 4.

Output: benchmarks/gcn_block_probe.json.
Run: cd /root/repo && python benchmarks/gcn_block_probe.py
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
    from weatherforecast_stgcn_maml_tpu.models.stgcn import (
        apply_encoder,
        init_encoder,
    )
    from weatherforecast_stgcn_maml_tpu.ops import fused_gcn_train
    from weatherforecast_stgcn_maml_tpu.train.maml import (
        init_meta_state,
        make_jit_meta_step,
    )
    from weatherforecast_stgcn_maml_tpu.train.tasks import (
        build_meta_tasks,
        stack_tasks,
    )

    report: dict = {"backend": jax.default_backend()}
    model_cfg = ModelConfig(compute_dtype="bfloat16")
    n, iters, ntasks = 512, 90, 2
    rng_np = np.random.default_rng(1)
    enc = init_encoder(jax.random.key(0), model_cfg)
    a = jnp.asarray(rng_np.uniform(size=(n, n)).astype(np.float32) / n)
    x2 = jnp.asarray(
        rng_np.normal(
            size=(ntasks, model_cfg.window, n, model_cfg.in_channels)
        ).astype(np.float32)
    )
    key = jax.random.key(7)

    # --- 0. parity: wb=4 vs wb=1 at reference shapes, train mode ----------
    def enc_grad(wb):
        def f(enc, x):
            saved = fused_gcn_train._TIME_BLOCK
            fused_gcn_train._TIME_BLOCK = wb
            try:
                def per_task(xt):
                    def loss(e):
                        out = apply_encoder(
                            e, a, xt, model_cfg, train=True, rng=key,
                            use_pallas=True,
                        )
                        return jnp.sum(out.astype(jnp.float32) ** 2)

                    return jax.grad(loss)(enc)

                return jax.vmap(per_task)(x)
            finally:
                fused_gcn_train._TIME_BLOCK = saved

        return jax.jit(f)

    g1 = enc_grad(1)(enc, x2)
    g4 = enc_grad(4)(enc, x2)
    rel = jax.tree.map(
        lambda p, q: float(
            np.max(np.abs(np.asarray(p, np.float32) - np.asarray(q, np.float32)))
            / (np.max(np.abs(np.asarray(p, np.float32))) or 1.0)
        ),
        g1, g4,
    )
    worst = max(jax.tree.leaves(rel))
    assert worst <= 5e-2, ("wb4-vs-wb1 grad parity", worst)
    report["grad_parity_max_rel"] = worst
    print(f"[gcn-block] grad parity max rel {worst:.2e}", file=sys.stderr)

    # --- 1. train-mode encoder-grad microbench ----------------------------
    def make_arm(wb):
        def chain(enc, x):
            saved = fused_gcn_train._TIME_BLOCK
            fused_gcn_train._TIME_BLOCK = wb
            try:
                def body(e, k):
                    def per_task(xt):
                        def loss(ee):
                            out = apply_encoder(
                                ee, a, xt, model_cfg, train=True, rng=k,
                                use_pallas=True,
                            )
                            return jnp.sum(out.astype(jnp.float32) ** 2)

                        return jax.grad(loss)(e)

                    g = jax.vmap(per_task)(x)
                    g = jax.tree.map(lambda v: v.mean(0), g)
                    return jax.tree.map(
                        lambda p_, g_: p_ - 1e-9 * g_, e, g
                    ), None

                keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                    jnp.arange(iters)
                )
                e, _ = jax.lax.scan(body, enc, keys)
            finally:
                fused_gcn_train._TIME_BLOCK = saved
            return e

        fn = jax.jit(chain)
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(enc, x2))[0])
        print(
            f"[gcn-block] grad wb={wb} compiled "
            f"{time.perf_counter() - t0:.1f}s", file=sys.stderr,
        )

        def rep():
            np.asarray(jax.tree.leaves(fn(enc, x2))[0])

        return rep

    timed = run_interleaved(
        {"wb1": make_arm(1), "wb4": make_arm(4), "wb8": make_arm(8)},
        rounds, "enc-grad",
    )
    for k in timed:
        timed[k]["ms_per_iter"] = timed[k]["best_ms"] / iters
    report["encoder_grad_90iter_train_vmap2"] = timed

    # --- 2. full meta step -------------------------------------------------
    boxes = [(10.0 + 6 * i, 15.0 + 6 * i, 20.0, 25.0) for i in range(4)]
    regions = [
        synthetic_region_for_box(bx, num_timesteps=160, seed=i)
        for i, bx in enumerate(boxes)
    ]
    meta_cfg = MetaConfig()
    built = build_meta_tasks(regions, model_cfg, meta_cfg, DataConfig())
    tasks = jax.tree.map(jnp.asarray, stack_tasks([bb.task for bb in built]))

    arms = {}
    for name, wb in (("wb1", 1), ("wb4", 4)):
        # The block size is baked in at trace time: set it, build + compile
        # the step, restore. Fresh state per arm (the step donates state).
        state0 = init_meta_state(jax.random.key(0), model_cfg, meta_cfg)
        saved = fused_gcn_train._TIME_BLOCK
        fused_gcn_train._TIME_BLOCK = wb
        try:
            step = make_jit_meta_step(model_cfg, meta_cfg)
            t0 = time.perf_counter()
            state, m = step(state0, tasks, jax.random.key(1))
            float(np.asarray(m["meta_loss"]))
            compile_s = time.perf_counter() - t0
            print(f"[gcn-block] meta {name} compiled {compile_s:.1f}s",
                  file=sys.stderr)
            state, m = step(state, tasks, jax.random.key(1))
            float(np.asarray(m["meta_loss"]))
        finally:
            fused_gcn_train._TIME_BLOCK = saved
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
        {k: make_rep(v) for k, v in arms.items()}, rounds, "meta-step"
    )
    report["meta_step"] = {
        k: {**timed[k], "compile_s": arms[k]["compile_s"]} for k in arms
    }

    with open(os.path.join(SELF_DIR, "gcn_block_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
