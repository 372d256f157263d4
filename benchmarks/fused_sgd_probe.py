"""A/B the fused whole-tree clip+SGD inner update at the real meta step.

sgd_math_probe.json: the XLA-lowered per-leaf clip+update costs 0.27
ms/iter x 182 sequential iters (~49 ms of the ~285 ms step). The fused
kernel (ops/fused_sgd.py) runs it as ONE program. Arms interleaved in one
window; numerics asserted equal at trace-level tolerance.

Output: benchmarks/fused_sgd_probe.json.
Run: cd /root/repo && python benchmarks/fused_sgd_probe.py
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


def main(rounds: int = 10) -> int:
    import jax

    from _interleave import run_interleaved
    from bench import build_bench_inputs
    from weatherforecast_stgcn_maml_tpu.train.maml import make_meta_step
    from weatherforecast_stgcn_maml_tpu.utils.prng import make_key

    state, _, tasks, graph, model_cfg, meta_cfg = build_bench_inputs(
        quick=False, dtype="bfloat16"
    )
    key = make_key(1, meta_cfg.rng_impl)

    arms, losses = {}, {}
    for name, fused in [("fused", True), ("xla", False)]:
        mc = dataclasses.replace(meta_cfg, fused_inner_update=fused)
        step = jax.jit(make_meta_step(model_cfg, mc))
        t0 = time.perf_counter()
        out = step(state, tasks, key)[1]["meta_loss"]
        losses[name] = float(np.asarray(out))
        print(f"[fused-sgd] {name} compiled {time.perf_counter() - t0:.1f}s "
              f"loss={losses[name]:.6f}", file=sys.stderr)

        def rep(step=step):
            np.asarray(step(state, tasks, key)[1]["meta_loss"])

        arms[name] = rep

    assert abs(losses["fused"] - losses["xla"]) <= 5e-4 * max(
        1.0, abs(losses["xla"])
    ), losses

    timed = run_interleaved(arms, rounds, "fused-sgd")
    best = {k: timed[k]["best_ms"] for k in timed}
    report = {
        "backend": jax.default_backend(),
        "meta_loss": losses,
        "raw": timed,
        "best_ms": best,
        "saved_ms": best["xla"] - best["fused"],
    }
    for k, v in best.items():
        print(f"[fused-sgd] {k}: best {v:.1f} ms", file=sys.stderr)
    with open(os.path.join(SELF_DIR, "fused_sgd_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
