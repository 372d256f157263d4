"""Upper-bound the dropout machinery's share of the meta step.

meta_component_probe.json localizes the step's headroom to the LSTM grad
(1.08 vs 0.44 ms/iter floor) and tree math; lstm_grad_ablate_probe.json
showed masks cost 0.14 ms of the 1.1 ms LSTM grad at B=512. This probe
bounds the TOTAL mask+rng cost at the real workload: the full meta step
with gcn/lstm dropout at the reference 0.2 vs 0.0 (the nomask kernel
variants engage and ALL rng generation disappears), interleaved in one
window. The delta is the ceiling for what in-kernel PRNG mask generation
(dropout_impl="kernel") can recover — realized if generating masks in the
kernels costs ~nothing over the nomask variants.

Output: benchmarks/mask_cost_probe.json.
Run: cd /root/repo && python benchmarks/mask_cost_probe.py
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


def main(rounds: int = 8) -> int:
    import jax

    from _interleave import run_interleaved
    from bench import build_bench_inputs
    from weatherforecast_stgcn_maml_tpu.train.maml import make_meta_step
    from weatherforecast_stgcn_maml_tpu.utils.prng import make_key

    state, _, tasks, graph, model_cfg, meta_cfg = build_bench_inputs(
        quick=False, dtype="bfloat16"
    )
    key = make_key(1, meta_cfg.rng_impl)

    arms = {}
    for name, mc in [
        ("drop02", model_cfg),
        ("drop00", dataclasses.replace(
            model_cfg, gcn_dropout=0.0, lstm_dropout=0.0)),
        ("lstm00", dataclasses.replace(model_cfg, lstm_dropout=0.0)),
        ("gcn00", dataclasses.replace(model_cfg, gcn_dropout=0.0)),
    ]:
        step = jax.jit(make_meta_step(mc, meta_cfg))
        t0 = time.perf_counter()
        out = step(state, tasks, key)[1]["meta_loss"]
        np.asarray(out)
        print(f"[mask-cost] {name} compiled {time.perf_counter() - t0:.1f}s "
              f"loss={float(np.asarray(out)):.4f}", file=sys.stderr)

        def rep(step=step):
            np.asarray(step(state, tasks, key)[1]["meta_loss"])

        arms[name] = rep

    timed = run_interleaved(arms, rounds, "mask-cost")
    best = {k: timed[k]["best_ms"] for k in timed}
    report = {
        "backend": jax.default_backend(),
        "raw": timed,
        "best_ms": best,
        "mask_total_ms": best["drop02"] - best["drop00"],
        "mask_lstm_ms": best["drop02"] - best["lstm00"],
        "mask_gcn_ms": best["drop02"] - best["gcn00"],
    }
    for k, v in best.items():
        print(f"[mask-cost] {k}: best {v:.1f} ms", file=sys.stderr)
    with open(os.path.join(SELF_DIR, "mask_cost_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
