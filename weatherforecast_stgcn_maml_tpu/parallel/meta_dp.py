"""Data-parallel MAML meta step over a device mesh.

Tasks are sharded along the mesh's data axis; parameters and optimizer state
are replicated. Each device runs the full inner-adaptation scan for its local
tasks (zero communication — the inner loop is task-local by construction) and
XLA inserts a single psum over ICI for the meta-gradient mean. This is the
sharded-jit ("pjit") formulation: sharding annotations in, collectives out.
"""

from __future__ import annotations

import jax

from weatherforecast_stgcn_maml_tpu.config import MetaConfig, ModelConfig
from weatherforecast_stgcn_maml_tpu.parallel.mesh import (
    replicated,
    task_batch_sharding,
)
from weatherforecast_stgcn_maml_tpu.train.maml import make_meta_step


def make_parallel_meta_step(
    model_cfg: ModelConfig,
    meta_cfg: MetaConfig,
    mesh,
    axis: str = "dp",
    donate_state: bool = True,
):
    """Jit the meta step with dp sharding over the task batch.

    The returned callable has the same signature as the single-device step:
    `(state, tasks, rng) -> (state, metrics)`. `tasks` should be placed with
    `parallel.mesh.shard_task_batch` (or any layout — jit will reshard).

    Requires meta_batch/grad_accum (the per-update micro-batch) to be
    divisible by the mesh size so every device holds equal task shards.
    """
    per_update = meta_cfg.meta_batch // max(1, meta_cfg.grad_accum)
    n_dev = mesh.devices.size
    if per_update % n_dev:
        raise ValueError(
            f"tasks per update ({per_update}) must be divisible by mesh size "
            f"({n_dev}) for even dp sharding"
        )

    step = make_meta_step(model_cfg, meta_cfg, mesh=mesh, axis=axis)
    rep = replicated(mesh)
    task_sh = task_batch_sharding(mesh, axis)
    return jax.jit(
        step,
        in_shardings=(rep, task_sh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )
