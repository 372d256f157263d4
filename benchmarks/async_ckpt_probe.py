"""Async-checkpoint overlap probe (VERDICT r2 item 10 done-criterion).

A checkpoint write costs ~1 s through the TPU tunnel (device->host fetch of
the params+opt-state tree), ~2 meta steps at round-3 speed. With
`AsyncCheckpointer` the fetch+write rides under subsequent epochs' compute,
so meta-train epoch time with `checkpoint_every=1` should match
`checkpoint_every=huge` in a clean window.

Runs the REAL meta-train engine (engines/meta_train.py) twice in one
process on the same device-staged synthetic tasks, alternating nothing —
the two runs are short and sequential, so this probe reports per-epoch
MEDIANS and the distribution, and flags obviously-contended windows.

Run: cd /root/repo && python benchmarks/async_ckpt_probe.py
Output: benchmarks/async_ckpt_probe.json
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))


def run_engine(ckpt_every: int, epochs: int, out_dir: str) -> list:
    from weatherforecast_stgcn_maml_tpu.config import (
        DataConfig,
        ExperimentConfig,
        MetaConfig,
        ModelConfig,
    )
    from weatherforecast_stgcn_maml_tpu.data.synthetic import (
        synthetic_region_for_box,
    )
    from weatherforecast_stgcn_maml_tpu.engines.meta_train import (
        run_meta_training,
    )

    cfg = ExperimentConfig(
        model=ModelConfig(compute_dtype="bfloat16"),
        meta=MetaConfig(num_epochs=epochs, checkpoint_every=ckpt_every),
        data=DataConfig(synthetic_timesteps=160),
        out_dir=out_dir,
    )
    regions = [
        synthetic_region_for_box(
            (10.0 + 6 * i, 15.0 + 6 * i, 20.0, 25.0), num_timesteps=160, seed=i
        )
        for i in range(4)
    ]
    times = []
    run_meta_training(
        cfg, regions,
        log_cb=lambda m: times.append(m) if "epoch" in str(m) else None,
    )
    # Parse "(X.XXs)" from the engine's epoch lines.
    secs = []
    for m in times:
        m = str(m)
        if "loss" in m and m.endswith("s)"):
            secs.append(float(m.rsplit("(", 1)[1][:-2]))
    return secs


def main(epochs: int = 12) -> int:
    out = {}
    with tempfile.TemporaryDirectory() as td:
        for label, every in (("no_ckpt", 10_000), ("every_epoch", 1)):
            secs = run_engine(every, epochs, os.path.join(td, label))
            # Skip the first 2 epochs (compile + tunnel warm-up).
            steady = secs[2:]
            out[label] = {
                "epoch_seconds": [round(s, 3) for s in secs],
                "median_steady_s": float(np.median(steady)),
                "best_steady_s": float(np.min(steady)),
            }
            print(f"[async-ckpt] {label}: median {np.median(steady):.3f}s "
                  f"best {np.min(steady):.3f}s", file=sys.stderr)
    ratio = (
        out["every_epoch"]["median_steady_s"] / out["no_ckpt"]["median_steady_s"]
    )
    out["every_epoch_over_no_ckpt_median"] = round(ratio, 3)
    out["note"] = (
        "sequential runs in a time-shared pool — compare medians, and "
        "re-run if the two arms' distributions are obviously from "
        "different contention regimes"
    )
    with open(os.path.join(SELF_DIR, "async_ckpt_probe.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
