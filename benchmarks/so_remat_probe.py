"""Second-order MAML remat-policy probe at bench scale.

Exact MAML differentiates through the 90-step inner SGD; the backward's
memory/recompute tradeoff is `meta.so_remat` (config.py). This probe times
the full SO meta step per policy, interleaved across contention windows,
and checks the meta-gradients agree (the policies are mathematically
identical — only residual storage differs). An arm that OOMs is recorded
as such. Output: benchmarks/so_remat_probe.json.

Run: cd /root/repo && python benchmarks/so_remat_probe.py
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


def main(policies=("step", "dots", "none"), rounds: int = 6) -> int:
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
    losses = {}
    for pol in policies:
        meta_cfg = MetaConfig(second_order=True, so_remat=pol)
        built = build_meta_tasks(regions, model_cfg, meta_cfg, DataConfig())
        # Device-stage once: numpy tasks would re-ship ~140 MB per timed step
        # through the tunnel (see bench.py build_bench_inputs).
        tasks = jax.tree.map(jnp.asarray, stack_tasks([b.task for b in built]))
        state = init_meta_state(jax.random.key(0), model_cfg, meta_cfg)
        step = make_jit_meta_step(model_cfg, meta_cfg)
        try:
            t0 = time.perf_counter()
            state, m = step(state, tasks, jax.random.key(1))
            loss = float(np.asarray(m["meta_loss"]))
            compile_s = time.perf_counter() - t0
            state, m = step(state, tasks, jax.random.key(1))
            float(np.asarray(m["meta_loss"]))
        except Exception as e:
            arms[pol] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"[so] {pol}: FAILED {type(e).__name__}", file=sys.stderr)
            continue
        losses[pol] = loss
        arms[pol] = {"state": state, "step": step, "tasks": tasks,
                     "compile_s": compile_s, "times": []}
        print(f"[so] {pol}: compiled {compile_s:.1f}s first-loss {loss:.5f}",
              file=sys.stderr)

    live = {p: a for p, a in arms.items() if "times" in a}
    if len(set(round(v, 4) for v in losses.values())) > 1:
        print(f"[so] WARNING: first-step losses differ across policies: {losses}",
              file=sys.stderr)

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
        {p: make_rep(a) for p, a in live.items()}, rounds, "so"
    )
    out = {}
    for pol, arm in arms.items():
        if "times" in arm:
            out[pol] = {
                **timed[pol],
                "compile_s": arm["compile_s"],
                "first_loss": losses[pol],
            }
        else:
            out[pol] = arm
    with open(os.path.join(SELF_DIR, "so_remat_probe.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
