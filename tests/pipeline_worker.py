"""Worker process for the 2-OS-process pipeline-fleet test.

Invoked by tests/test_distributed.py as
`python pipeline_worker.py <shard_id> <num_shards> <out_dir>`.

Each process runs the real `run_pipeline` over its shard of the region
list (the reference's main.py:30-69 driver loop at fleet scale): adapt
each region from the SHARED meta checkpoint in out_dir, then validate,
coordinating with the other shard purely through the shared filesystem.
Writes out_dir/shard<id>.json with the region -> average_mse map.
"""

import json
import os
import sys

shard_id, num_shards, out_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tests._pipeline_case import BOXES, make_cfg  # noqa: E402
from weatherforecast_stgcn_maml_tpu.engines.pipeline import run_pipeline  # noqa: E402

cfg = make_cfg(out_dir)
res = run_pipeline(
    cfg, BOXES, shard_id=shard_id, num_shards=num_shards,
    make_plots=False, log_cb=lambda *_: None,
)
assert not res.errors, res.errors
assert all(
    np.isfinite(v["average_mse"]) for v in res.validations.values()
), res.validations

with open(os.path.join(out_dir, f"shard{shard_id}.json"), "w") as f:
    json.dump(
        {name: v["average_mse"] for name, v in res.validations.items()}, f
    )
print(f"pipeline worker {shard_id}: OK ({sorted(res.validations)})", flush=True)
