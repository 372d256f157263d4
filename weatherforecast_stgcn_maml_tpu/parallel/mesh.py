"""Device mesh construction and sharding specs."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from weatherforecast_stgcn_maml_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """1-D data-parallel mesh over the task axis.

    MAML's meta batch is the natural parallel dimension of this workload
    (SURVEY.md section 2): tasks are independent until the outer gradient
    mean, so a 1-D mesh keeps the only collective (the grad psum) riding
    ICI neighbors.
    """
    if devices is None:
        devices = jax.devices()
    n = cfg.num_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]), axis_names=(cfg.data_axis,))


def task_batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Sharding for a Task pytree batched on its leading axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_task_batch(tasks, mesh: Mesh, axis: str = "dp"):
    """Place a stacked Task pytree with its leading axis sharded over `axis`."""
    sharding = task_batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tasks)
