"""Multi-host (multi-process) initialization helpers.

A multi-host TPU deployment runs one process per host; JAX's distributed
runtime wires them into a single logical device mesh over ICI (within a
slice) and DCN (across slices). This module wraps the boilerplate:

  * `initialize()` — `jax.distributed.initialize` from explicit arguments or
    the standard env vars (`COORDINATOR_ADDRESS`, `NUM_PROCESSES`,
    `PROCESS_ID`); on single-process TPU VMs it is a documented no-op.
  * `global_mesh()` — a 1-D dp mesh over ALL global devices; combined with
    `parallel/meta_dp.py`, the meta batch then shards across hosts and the
    gradient psum rides ICI (XLA routes any cross-slice segment over DCN).
  * The region-adaptation fleet needs no collectives at all: use
    `parallel/fleet.py:auto_shard()` to partition regions by process.

No multi-host TPU hardware exists on this image, but the recipe itself IS
executed: tests/test_distributed.py spawns two OS processes that join a
coordination service on localhost (CPU backend, 2 fake devices each),
build the global mesh, and run a cross-process psum. SURVEY.md test
strategy (d) covers the sharding logic on a virtual mesh in addition.
"""

from __future__ import annotations

import os


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed if a multi-process topology is configured.

    Returns True when distributed mode was initialized. With no arguments
    and no `COORDINATOR_ADDRESS`/`NUM_PROCESSES`/`PROCESS_ID` env vars this
    is a no-op returning False (single-process run). A PARTIAL topology
    (some but not all of the three set) raises RuntimeError instead of
    silently degrading to N duplicate single-process runs.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    configured = {
        "COORDINATOR_ADDRESS": coordinator_address,
        "NUM_PROCESSES": num_processes,
        "PROCESS_ID": process_id,
    }
    if all(v is None for v in configured.values()):
        return False  # true single-process run
    missing = [k for k, v in configured.items() if v is None]
    if missing:
        # A PARTIALLY configured launch must fail loudly: silently falling
        # back to single-process mode would make every host adapt ALL
        # regions and clobber each other's checkpoints on shared storage.
        raise RuntimeError(
            f"partial multi-process configuration: {missing} unset while "
            f"{[k for k, v in configured.items() if v is not None]} set — "
            "export all of COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID "
            "(or none, for a single-process run)"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(axis: str = "dp"):
    """1-D mesh over all global devices (local + remote processes)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), axis_names=(axis,))
