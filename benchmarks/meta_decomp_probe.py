"""Decompose the meta step: per-inner-iter cost vs fixed overhead.

Times the full jitted meta step at inner_epochs in {6, 3, 0} (90/45/0
inner steps per task; everything else identical) in one interleaved
process. The slope of time vs inner steps is the true in-context cost of
one inner SGD iteration; the intercept is everything else — query
evaluation, outer gradient, AdamW + schedule, dispatch. This tells us
whether the remaining gap to the FLOP floor lives in the inner chain or
in the fixed overhead.

Output: benchmarks/meta_decomp_probe.json.
Run: cd /root/repo && python benchmarks/meta_decomp_probe.py
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
    boxes = [(10.0 + 6 * i, 15.0 + 6 * i, 20.0, 25.0) for i in range(4)]
    regions = [
        synthetic_region_for_box(bx, num_timesteps=160, seed=i)
        for i, bx in enumerate(boxes)
    ]

    arms = {}
    inner_epochs = (6, 3, 0)
    for ep in inner_epochs:
        meta_cfg = MetaConfig(inner_epochs=ep)
        built = build_meta_tasks(regions, model_cfg, meta_cfg, DataConfig())
        tasks = jax.tree.map(
            jnp.asarray, stack_tasks([bb.task for bb in built])
        )
        state0 = init_meta_state(jax.random.key(0), model_cfg, meta_cfg)
        step = make_jit_meta_step(model_cfg, meta_cfg)
        t0 = time.perf_counter()
        state, m = step(state0, tasks, jax.random.key(1))
        float(np.asarray(m["meta_loss"]))
        compile_s = time.perf_counter() - t0
        print(f"[meta-decomp] ep={ep} compiled {compile_s:.1f}s",
              file=sys.stderr)
        state, m = step(state, tasks, jax.random.key(1))
        float(np.asarray(m["meta_loss"]))
        arms[f"ep{ep}"] = {
            "state": state, "step": step, "tasks": tasks,
            "inner_steps": ep * MetaConfig().inner_batches,
        }

    def make_rep(arm):
        counter = [0]

        def rep():
            counter[0] += 1
            arm["state"], m = arm["step"](
                arm["state"], arm["tasks"], jax.random.key(10 + counter[0])
            )
            float(np.asarray(m["meta_loss"]))

        return rep

    timed = run_interleaved(
        {k: make_rep(v) for k, v in arms.items()}, rounds, "meta-step"
    )
    for k in arms:
        timed[k]["inner_steps_per_task"] = arms[k]["inner_steps"]
    report["meta_step_by_inner_epochs"] = timed

    # Least-squares slope/intercept over best times (per sequential inner
    # iter: grad_accum micro-batches run serially, vmap width spreads the
    # meta_batch, so sequential iters = inner_steps * grad_accum).
    xs = np.array([
        arms[k]["inner_steps"] * MetaConfig().grad_accum for k in arms
    ], np.float64)
    ys = np.array([timed[k]["best_ms"] for k in arms], np.float64)
    a_mat = np.stack([xs, np.ones_like(xs)], axis=1)
    (slope, intercept), *_ = np.linalg.lstsq(a_mat, ys, rcond=None)
    report["per_sequential_inner_iter_ms"] = float(slope)
    report["fixed_overhead_ms"] = float(intercept)
    print(
        f"[meta-decomp] slope {slope:.3f} ms/sequential-iter, "
        f"intercept {intercept:.1f} ms", file=sys.stderr,
    )

    with open(os.path.join(SELF_DIR, "meta_decomp_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
