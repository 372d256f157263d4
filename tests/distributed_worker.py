"""Worker process for the 2-process jax.distributed CPU test.

Invoked by tests/test_distributed.py as
`python distributed_worker.py <process_id> <num_processes> <port>`.
Each process brings up 2 fake CPU devices, joins the coordination service
through `parallel.distributed.initialize`, builds the global dp mesh, and
runs a cross-process psum — executing the exact recipe
`parallel/distributed.py` documents for multi-host deployments.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from weatherforecast_stgcn_maml_tpu.parallel.distributed import (  # noqa: E402
    global_mesh,
    initialize,
)

assert initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
), "initialize() returned False despite explicit topology"
assert jax.process_count() == nproc, jax.process_count()

mesh = global_mesh()
ndev = mesh.devices.size
assert ndev == 2 * nproc, f"expected {2 * nproc} global devices, got {ndev}"

sharding = NamedSharding(mesh, P("dp"))
data = np.arange(ndev, dtype=np.float32)
x = jax.make_array_from_callback((ndev,), sharding, lambda idx: data[idx])

psum = jax.jit(
    jax.shard_map(
        lambda v: jax.lax.psum(v, "dp"), mesh=mesh, in_specs=P("dp"), out_specs=P()
    )
)
out = psum(x)
val = float(np.asarray(out.addressable_data(0))[0])
expected = float(data.sum())
assert val == expected, (val, expected)
print(f"worker {pid}: psum OK ({val})", flush=True)
