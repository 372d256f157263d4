"""Validate + time the shard_map 2-D meta step on real TPU (1x1 mesh).

The CPU-mesh tests (tests/test_parallel.py) prove the shard_map step's
SEMANTICS bit-exactly on the XLA route, but Pallas interpret mode cannot
trace under manual axes (JAX 0.9 'closed_call' lowering bug), so the
fused-kernel-inside-shard_map path — the whole point of parallel/meta_sp.py
— is validated here on the real chip instead: a 1x1 dp x sp mesh makes
every collective a no-op while exercising Mosaic lowering of the custom-VJP
stack kernel under shard_map manual axes, including the VMA plumbing
(ShapeDtypeStruct vma= on every kernel output).

Arms (interleaved, reference-scale default configs, rbg keys):
  single        unsharded jit meta step, fused kernels (the bench.py step)
  shardmap_1x1  parallel.meta_sp.make_shardmap_meta_step_2d on Mesh (1, 1)

Reports per-arm best/median step time and the per-task-loss agreement.
Round 5: the shardmap arm's encoder now runs the node-sharded fused GCN
sandwich ops (ops/fused_gcn_shard.py — per-layer A-row contraction + bias
+ ReLU + int8 mask + next dense transform fused per shard, gathers in
XLA), replacing the round-4 XLA _spatial_encoder that was the named bulk
of the 20% 1x1 overhead (VERDICT r4 item 3). The remaining expected gap
vs `single` is the per-layer hw/residual HBM crossing the whole-stack
fused GCN kernel avoids.

Output: benchmarks/shardmap_meta_probe.json.
Run: cd /root/repo && python benchmarks/shardmap_meta_probe.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))
sys.path.insert(0, SELF_DIR)


def main(rounds: int = 8) -> int:
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
    from weatherforecast_stgcn_maml_tpu.parallel.mesh import make_mesh_2d
    from weatherforecast_stgcn_maml_tpu.parallel.meta_sp import (
        make_shardmap_meta_step_2d,
    )
    from weatherforecast_stgcn_maml_tpu.train.maml import (
        init_meta_state,
        make_jit_meta_step,
    )
    from weatherforecast_stgcn_maml_tpu.train.tasks import (
        build_meta_tasks,
        stack_tasks,
    )
    from weatherforecast_stgcn_maml_tpu.utils.prng import make_key

    model_cfg = ModelConfig(compute_dtype="bfloat16")
    meta_cfg = MetaConfig()
    boxes = [(10.0 + 6 * i, 15.0 + 6 * i, 20.0, 25.0) for i in range(4)]
    regions = [
        synthetic_region_for_box(b, num_timesteps=160, seed=i)
        for i, b in enumerate(boxes)
    ]
    built = build_meta_tasks(regions, model_cfg, meta_cfg, DataConfig())
    tasks = stack_tasks([b.task for b in built])
    tasks = jax.tree.map(jnp.asarray, tasks)  # device-staged (repo rule)

    report: dict = {"backend": jax.default_backend(),
                    "nodes": int(tasks.a_hat.shape[-1])}
    key = make_key(7, meta_cfg.rng_impl)

    state_a = init_meta_state(jax.random.key(0), model_cfg, meta_cfg)
    single = make_jit_meta_step(model_cfg, meta_cfg)
    _, m1 = single(state_a, tasks, key)
    l1 = np.asarray(m1["per_task_loss"])

    mesh = make_mesh_2d(1, 1)
    state_b = init_meta_state(jax.random.key(0), model_cfg, meta_cfg)
    shmap = make_shardmap_meta_step_2d(
        model_cfg, meta_cfg, mesh, donate_state=False
    )
    _, m2 = shmap(state_b, tasks, key)
    l2 = np.asarray(m2["per_task_loss"])
    report["per_task_loss_single"] = l1.tolist()
    report["per_task_loss_shardmap"] = l2.tolist()
    rel = float(np.max(np.abs(l1 - l2) / np.maximum(np.abs(l1), 1e-8)))
    report["max_rel_loss_diff"] = rel
    print(f"[shardmap-meta] loss agreement: max rel diff {rel:.2e}",
          file=sys.stderr)

    # Timing arms: non-donating steps on fixed states, forced value fetch.
    sa = init_meta_state(jax.random.key(1), model_cfg, meta_cfg)
    sb = jax.tree.map(lambda x: x, sa)
    # make_jit_meta_step donates its state; rebuild non-donating for timing.
    import weatherforecast_stgcn_maml_tpu.train.maml as maml

    single_t = jax.jit(maml.make_meta_step(model_cfg, meta_cfg))
    np.asarray(single_t(sa, tasks, key)[1]["meta_loss"])
    np.asarray(shmap(sb, tasks, key)[1]["meta_loss"])

    def rep_single():
        np.asarray(single_t(sa, tasks, key)[1]["meta_loss"])

    def rep_shmap():
        np.asarray(shmap(sb, tasks, key)[1]["meta_loss"])

    timed = run_interleaved(
        {"single": rep_single, "shardmap_1x1": rep_shmap}, rounds,
        "shardmap-meta",
    )
    report["raw"] = timed
    for k in ("single", "shardmap_1x1"):
        print(f"[shardmap-meta] {k}: best {timed[k]['best_ms']:.1f} ms "
              f"median {timed[k]['median_ms']:.1f} ms", file=sys.stderr)

    with open(os.path.join(SELF_DIR, "shardmap_meta_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
