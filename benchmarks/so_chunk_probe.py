"""Second-order remat schedule A/B at bench scale.

bench.py --second-order: 2.395 s/step at 29.7% MFU vs the 712 ms
cost-analyzed SO floor. so_remat="step" recomputes every inner step's
FULL fwd+bwd inside the scan transpose; "none" (no recompute) overflows
the remote compiler (so_remat_probe r3). The new two-level schedules
("sqrt", "chunk:<k>", train/maml.py) checkpoint only chunk boundaries:
the transpose recomputes each chunk's FORWARD once, saving the per-step
double recompute at sqrt-scaled memory.

Arms (one window, interleaved; meta-level in-graph timing — valid under
the round-4 dispatch-floor methodology):
  step     — the current default.
  sqrt     — chunk = 9 (90 inner steps).
  chunk30  — 3 chunks of 30 (more memory, least recompute).

Output: benchmarks/so_chunk_probe.json.
Run: cd /root/repo && python benchmarks/so_chunk_probe.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))
sys.path.insert(0, SELF_DIR)


def main(rounds: int = 6) -> int:
    import jax

    from _interleave import run_interleaved
    from bench import build_bench_inputs
    from weatherforecast_stgcn_maml_tpu.train.maml import make_meta_step
    from weatherforecast_stgcn_maml_tpu.utils.prng import make_key

    state, _, tasks, graph, model_cfg, meta_cfg = build_bench_inputs(
        quick=False, dtype="bfloat16", second_order=True
    )
    key = make_key(1, meta_cfg.rng_impl)

    arms, losses = {}, {}
    for name, pol in [("step", "step"), ("sqrt", "sqrt"),
                      ("chunk30", "chunk:30")]:
        mc = dataclasses.replace(meta_cfg, so_remat=pol)
        step = jax.jit(make_meta_step(model_cfg, mc))
        t0 = time.perf_counter()
        try:
            out = step(state, tasks, key)[1]["meta_loss"]
            losses[name] = float(np.asarray(out))
        except Exception as e:  # compile-side OOM etc. — record, skip arm
            losses[name] = f"ERROR: {str(e)[:200]}"
            print(f"[so-chunk] {name} FAILED: {str(e)[:200]}",
                  file=sys.stderr)
            continue
        print(f"[so-chunk] {name} compiled {time.perf_counter() - t0:.1f}s "
              f"loss={losses[name]:.6f}", file=sys.stderr)

        def rep(step=step):
            np.asarray(step(state, tasks, key)[1]["meta_loss"])

        arms[name] = rep

    ok_losses = [v for v in losses.values() if isinstance(v, float)]
    assert max(ok_losses) - min(ok_losses) <= 5e-4 * max(
        1.0, abs(ok_losses[0])
    ), losses

    timed = run_interleaved(arms, rounds, "so-chunk")
    best = {k: timed[k]["best_ms"] for k in timed}
    report = {
        "backend": jax.default_backend(),
        "meta_loss": losses,
        "raw": timed,
        "best_ms": best,
    }
    for k, v in best.items():
        print(f"[so-chunk] {k}: best {v:.1f} ms", file=sys.stderr)
    with open(os.path.join(SELF_DIR, "so_chunk_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
