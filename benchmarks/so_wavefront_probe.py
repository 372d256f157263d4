"""A/B the wavefront LSTM routing inside the SO Hessian transpose, full-step.

The component probe (benchmarks/so_lstm_probe.json) shows the wavefront
XLA LSTM (dot-merged gates, layer-parallel wavefront schedule) beating the
plain scan on every twice-differentiable constituent (rof-HVP 5.51 -> 4.32
ms/iter). But the first full-bench window with `meta.so_wavefront=True`
(benchmarks/last_so_run.json, 18:10 window) read 2.018 s/step vs the 16:55
window's 1.840 — cross-window readings are not comparable (CLAUDE.md), so
this probe settles the default with both arms interleaved in ONE process:

  wf_on  — meta.so_impl="rof", meta.so_wavefront=True
  wf_off — meta.so_impl="rof", meta.so_wavefront=False

plus the explicit dispatch-floor arm (round-4 methodology).

Output: benchmarks/so_wavefront_probe.json.
Run: cd /root/repo && python benchmarks/so_wavefront_probe.py
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
    import jax.numpy as jnp

    from _interleave import run_interleaved
    from bench import build_bench_inputs, flops_per_meta_step, _bf16_peak_flops
    from weatherforecast_stgcn_maml_tpu.train.maml import make_jit_meta_step

    state0, _, tasks, graph, model_cfg, meta_cfg = build_bench_inputs(
        quick=False, dtype="bfloat16", second_order=True
    )
    step_flops = flops_per_meta_step(state0, tasks, model_cfg, meta_cfg)
    peak = _bf16_peak_flops()

    arms = {}
    first_loss = {}
    states = {}

    for name, wf in (("wf_on", True), ("wf_off", False)):
        cfg_i = dataclasses.replace(meta_cfg, so_impl="rof", so_wavefront=wf)
        step = make_jit_meta_step(model_cfg, cfg_i)
        st = jax.tree.map(lambda x: x + 0, state0)
        t0 = time.perf_counter()
        st, m = step(st, tasks, jax.random.key(7))
        first_loss[name] = float(np.asarray(m["meta_loss"]))
        print(
            f"[so-wf] {name} compiled+ran {time.perf_counter() - t0:.1f}s "
            f"loss={first_loss[name]:.6f}",
            file=sys.stderr,
        )
        states[name] = st

        def rep(name=name, step=step):
            st, m = step(states[name], tasks, jax.random.key(7))
            states[name] = st
            np.asarray(m["meta_loss"])

        arms[name] = rep

    @jax.jit
    def floor_fn(c):
        return (c * 1.000001).astype(jnp.float32).sum()

    zc = jnp.zeros((8, 128), jnp.float32)
    np.asarray(floor_fn(zc))
    arms["floor"] = lambda: np.asarray(floor_fn(zc))

    timed = run_interleaved(arms, rounds, "so-wf")

    best = {k: timed[k]["best_ms"] for k in timed}
    fl = best["floor"]
    corrected = {k: best[k] - fl for k in best if k != "floor"}
    mfu = {k: (step_flops / peak * 1e3) / corrected[k] for k in corrected}
    report = {
        "backend": jax.default_backend(),
        "nodes": int(graph.padded_nodes),
        "flops_per_step": step_flops,
        "first_loss": first_loss,
        "raw": timed,
        "best_ms": best,
        "floor_corrected_ms": corrected,
        "mfu_floor_corrected": mfu,
        "dispatch_floor_ms": fl,
    }
    for k in sorted(corrected):
        print(
            f"[so-wf] {k}: {corrected[k]:.1f} ms/step mfu={mfu[k] * 100:.1f}%",
            file=sys.stderr,
        )

    with open(os.path.join(SELF_DIR, "so_wavefront_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
