"""A/B the second-order Hessian-transpose implementations at bench scale.

train/so_grad.py gives the SO inner gradient a pluggable transpose:

  xla — linearize-and-transpose the whole inner gradient (round-3 route;
        forces every fused kernel off for the ENTIRE step): 2.380 s/step,
        29.9% MFU (benchmarks/last_so_run.json).
  hvp — explicit symmetric-Hessian HVP, forward-over-reverse
        jvp(grad(L)); the once-differentiated parts (inner grads, query
        loss + reverse) keep the fused Pallas kernels.
  rof — explicit HVP, reverse-over-forward grad(p -> jvp(L)(p; ct)):
        one standard reverse scan over a doubled forward.
  fhvp — forward-over-reverse where the gradient itself is the FUSED
        composition (train/so_fused.py): the Hessian transpose runs the
        hand-written R-operator kernels (ops/fused_lstm_hvp.py) instead of
        the XLA LSTM scan.

All three meta steps are mathematically identical (float64 equivalence in
tests/test_maml.py); each arm also prints its first meta_loss here as a
same-dtype sanity check. Arms run interleaved in ONE process with an
explicit dispatch-floor arm (round-4 methodology, CLAUDE.md).

Output: benchmarks/so_impl_probe.json.
Run: cd /root/repo && python benchmarks/so_impl_probe.py
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

    for impl in ("xla", "hvp", "rof", "fhvp"):
        cfg_i = dataclasses.replace(meta_cfg, so_impl=impl)
        step = make_jit_meta_step(model_cfg, cfg_i)
        # Per-arm state: the jitted step donates its state argument.
        st = jax.tree.map(lambda x: x + 0, state0)
        t0 = time.perf_counter()
        st, m = step(st, tasks, jax.random.key(7))
        first_loss[impl] = float(np.asarray(m["meta_loss"]))
        print(
            f"[so-impl] {impl} compiled+ran {time.perf_counter() - t0:.1f}s "
            f"loss={first_loss[impl]:.6f}",
            file=sys.stderr,
        )
        states[impl] = st

        def rep(impl=impl, step=step):
            st, m = step(states[impl], tasks, jax.random.key(7))
            states[impl] = st
            np.asarray(m["meta_loss"])

        arms[impl] = rep

    @jax.jit
    def floor_fn(c):
        return (c * 1.000001).astype(jnp.float32).sum()

    zc = jnp.zeros((8, 128), jnp.float32)
    np.asarray(floor_fn(zc))
    arms["floor"] = lambda: np.asarray(floor_fn(zc))

    timed = run_interleaved(arms, rounds, "so-impl")

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
            f"[so-impl] {k}: {corrected[k]:.1f} ms/step mfu={mfu[k] * 100:.1f}%",
            file=sys.stderr,
        )

    with open(os.path.join(SELF_DIR, "so_impl_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
