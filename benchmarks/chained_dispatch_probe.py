"""meta.epochs_per_dispatch A/B on real TPU.

Measures the production meta-train engine (engines/meta_train.py) with
k=1 (per-epoch dispatch, reference cadence) vs k=4 (whole chunks compiled
into one dispatch via train/maml.py make_chained_meta_step). The chained
path exists to amortize the ~25-30 ms tunnel dispatch floor + metrics
fetch that per-epoch dispatch pays (~34 ms fixed/epoch measured in
benchmarks/meta_decomp_probe.json against a ~0.5 s epoch at these
synthetic shapes).

Arms ALTERNATE k=1,k=4,k=1,k=4 in one process so both sample the same
contention windows (benchmarks/_interleave.py discipline, coarsened to
run granularity because each arm is one engine call). Per-epoch times
come from the engine's own meta_log.jsonl `epoch_seconds` records (dt/kk
for chunks); the first chunk of every run (compile + tunnel warm-up) is
skipped.

Run: cd /root/repo && python benchmarks/chained_dispatch_probe.py
Output: benchmarks/chained_dispatch_probe.json
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))


def run_engine(k: int, epochs: int, out_dir: str) -> list:
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
        meta=MetaConfig(
            num_epochs=epochs,
            epochs_per_dispatch=k,
            checkpoint_every=10_000,  # isolate dispatch cost from ckpt I/O
        ),
        data=DataConfig(synthetic_timesteps=160),
        out_dir=out_dir,
    )
    regions = [
        synthetic_region_for_box(
            (10.0 + 6 * i, 15.0 + 6 * i, 20.0, 25.0), num_timesteps=160, seed=i
        )
        for i in range(4)
    ]
    run_meta_training(cfg, regions, log_cb=lambda m: None)
    secs = []
    with open(os.path.join(out_dir, "meta", "meta_log.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "epoch_seconds" in rec:
                secs.append(float(rec["epoch_seconds"]))
    return secs


def main(epochs: int = 16, reps: int = 2) -> int:
    per_arm: dict = {"k1": [], "k4": []}
    losses: dict = {"k1": None, "k4": None}
    with tempfile.TemporaryDirectory() as td:
        for rep in range(reps):
            for label, k in (("k1", 1), ("k4", 4)):
                out_dir = os.path.join(td, f"{label}_r{rep}")
                secs = run_engine(k, epochs, out_dir)
                # First chunk holds compile + warm-up for both arms.
                per_arm[label].extend(secs[max(4, k):])
                with open(
                    os.path.join(out_dir, "meta", "meta_log.jsonl")
                ) as f:
                    last = json.loads(f.readlines()[-1])
                losses[label] = last["meta_loss"]
                print(
                    f"[chained] rep{rep} {label}: "
                    f"median {np.median(secs[max(4, k):]):.3f}s/epoch "
                    f"final loss {last['meta_loss']:.4f}",
                    file=sys.stderr,
                )
    out = {}
    for label, secs in per_arm.items():
        out[label] = {
            "epoch_seconds": [round(s, 4) for s in secs],
            "median_s": float(np.median(secs)),
            "best_s": float(np.min(secs)),
            "final_meta_loss": losses[label],
        }
    out["k4_over_k1_median"] = round(
        out["k4"]["median_s"] / out["k1"]["median_s"], 4
    )
    out["note"] = (
        "engine-level A/B, alternating runs in one process; per-epoch "
        "times are the engine's own meta_log.jsonl records (chunk dt/k "
        "for k=4). Final losses differ only through difficulty-sampler "
        "staleness (chunk-granular updates); the chained step itself is "
        "bit-identical to sequential (tests/test_maml.py)."
    )
    with open(os.path.join(SELF_DIR, "chained_dispatch_probe.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
