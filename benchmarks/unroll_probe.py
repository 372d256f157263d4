"""Inner-SGD scan-unroll probe at bench scale (VERDICT r1 item 4 follow-up).

`meta.inner_unroll` replicates the inner-SGD step body inside the lax.scan
(train/maml.py:115). The LSTM *time* scan's full unroll won ~20% on the meta
step (benchmarks/perf_probe.py), so this probe checks whether unrolling the
*inner-step* loop buys anything too — or just burns compile time (each inner
step body is already ~milliseconds of work, so loop overhead should be
negligible; measure, don't assume).

Contention discipline: the shared TPU pool swings ~60x (CLAUDE.md), so arms
are timed INTERLEAVED round-robin — every arm samples every time window —
and compared on per-arm best. Output: benchmarks/unroll_probe.json.

Run: cd /root/repo && python benchmarks/unroll_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import jax.numpy as jnp

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))
sys.path.insert(0, SELF_DIR)


def main(unrolls=(1, 2, 3), rounds: int = 8) -> int:
    import jax

    from weatherforecast_stgcn_maml_tpu.config import DataConfig, MetaConfig, ModelConfig
    from weatherforecast_stgcn_maml_tpu.data.synthetic import synthetic_region_for_box
    from weatherforecast_stgcn_maml_tpu.train.maml import (
        init_meta_state,
        make_jit_meta_step,
    )
    from weatherforecast_stgcn_maml_tpu.train.tasks import build_meta_tasks, stack_tasks

    model_cfg = ModelConfig(compute_dtype="bfloat16")
    boxes = [(10.0 + 6 * i, 15.0 + 6 * i, 20.0, 25.0) for i in range(4)]
    regions = [
        synthetic_region_for_box(b, num_timesteps=160, seed=i)
        for i, b in enumerate(boxes)
    ]

    arms = {}
    for k in unrolls:
        meta_cfg = MetaConfig(inner_unroll=k)
        built = build_meta_tasks(regions, model_cfg, meta_cfg, DataConfig())
        # Device-stage once: numpy tasks would re-ship ~140 MB per timed step
        # through the tunnel (see bench.py build_bench_inputs).
        tasks = jax.tree.map(jnp.asarray, stack_tasks([b.task for b in built]))
        state = init_meta_state(jax.random.key(0), model_cfg, meta_cfg)
        step = make_jit_meta_step(model_cfg, meta_cfg)
        t0 = time.perf_counter()
        state, m = step(state, tasks, jax.random.key(1))
        float(np.asarray(m["meta_loss"]))
        compile_s = time.perf_counter() - t0
        state, m = step(state, tasks, jax.random.key(1))  # tunnel warmup
        float(np.asarray(m["meta_loss"]))
        arms[k] = {"state": state, "step": step, "tasks": tasks,
                   "compile_s": compile_s}
        print(f"[unroll] k={k} compiled in {compile_s:.1f}s", file=sys.stderr)

    from _interleave import run_interleaved

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
        {str(k): make_rep(a) for k, a in arms.items()}, rounds, "unroll"
    )
    out = {
        str(k): {**timed[str(k)], "compile_s": a["compile_s"]}
        for k, a in arms.items()
    }
    with open(os.path.join(SELF_DIR, "unroll_probe.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
