"""Meta-batch scaling study: vmap width amortization on one chip.

The reference workload fixes meta_batch=4 / grad_accum=2 (so each compiled
micro-update vmaps only 2 tasks). This study measures how meta-step
throughput scales when the per-update vmap width grows — the production
question for scaling MAML beyond the reference's tiny batch (VERDICT r1
item 4 lever 1). Workload per task is identical (90 inner steps); what
changes is how many tasks amortize each small matmul.

Reports, per (meta_batch, grad_accum): step seconds, tasks/s, per-task ms,
and MFU vs the FLOP floor. Writes benchmarks/scaling_study.json.

Usage: python benchmarks/scaling_study.py [--widths 2,4,8,16] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="2,4,8,16",
                    help="per-update vmap widths (tasks per micro-update)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--small", action="store_true", help="CPU smoke-test scale")
    args = ap.parse_args(argv)

    from bench import _bf16_peak_flops, flops_per_meta_step
    from weatherforecast_stgcn_maml_tpu.config import (
        DataConfig,
        MetaConfig,
        ModelConfig,
    )
    from weatherforecast_stgcn_maml_tpu.data.synthetic import synthetic_region_for_box
    from weatherforecast_stgcn_maml_tpu.train.maml import (
        init_meta_state,
        make_jit_meta_step,
    )
    from weatherforecast_stgcn_maml_tpu.train.tasks import build_meta_tasks, stack_tasks

    model_kw = {}
    t_len = 160
    if args.small:
        model_kw = dict(
            hidden_channels=16, gcn_layers=2, lstm_hidden=8, lstm_layers=2,
            window=6, horizon=3,
        )
        t_len = 48
    model_cfg = ModelConfig(compute_dtype=args.dtype, **model_kw)
    widths = [int(w) for w in args.widths.split(",")]
    max_tasks = max(widths)
    boxes = [(10.0 + 3 * i, 15.0 + 3 * i, 20.0, 25.0) for i in range(max_tasks)]
    regions = [
        synthetic_region_for_box(b, num_timesteps=t_len, seed=i)
        for i, b in enumerate(boxes)
    ]
    base_meta = (
        MetaConfig() if not args.small
        else MetaConfig(inner_epochs=1, inner_batches=3)
    )
    built = build_meta_tasks(regions, model_cfg, base_meta, DataConfig())
    all_tasks = [b.task for b in built]

    on_tpu = jax.default_backend() == "tpu"
    results = {"dtype": args.dtype, "backend": jax.default_backend(), "rows": []}
    for width in widths:
        # One micro-update per step at this width: grad_accum=1, batch=width.
        import dataclasses

        meta_cfg = dataclasses.replace(base_meta, meta_batch=width, grad_accum=1)
        tasks = jax.tree.map(
            jnp.asarray, stack_tasks(all_tasks[:width])
        )
        state = init_meta_state(jax.random.key(0), model_cfg, meta_cfg)
        step = make_jit_meta_step(model_cfg, meta_cfg)

        def run():
            nonlocal state
            state, m = step(state, tasks, jax.random.key(1))
            float(np.asarray(m["meta_loss"]))

        run()  # compile
        run()
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        best = min(times)
        floor = (
            flops_per_meta_step(state, tasks, model_cfg, meta_cfg)
            / _bf16_peak_flops()
            if on_tpu
            else None
        )
        row = {
            "vmap_width": width,
            "step_seconds_best": best,
            "tasks_per_sec": width / best,
            "per_task_ms": best / width * 1e3,
            "mfu_vs_bf16_peak": (floor / best) if floor else None,
        }
        results["rows"].append(row)
        _log(
            f"[scaling] width {width}: {best * 1e3:.0f} ms/step, "
            f"{width / best:.2f} tasks/s, {best / width * 1e3:.0f} ms/task"
            + (f", {floor / best * 100:.1f}% MFU" if floor else "")
        )

    path = os.path.join(os.path.dirname(__file__), "scaling_study.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
