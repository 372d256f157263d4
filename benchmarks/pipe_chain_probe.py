"""Pipelined-kernel A/B with in-graph chained grads (no dispatch floor).

benchmarks/pipe_ab_probe.json measured single dispatches — the isolated
LSTM grad (~0.3 ms of compute) disappeared under the ~25 ms tunnel floor
and the meta step moved <0.5%. This probe chains K = 40 grad evaluations
inside one jit (each feeding a param-dependent perturbation forward so XLA
cannot batch them) and sweeps _PIPE_MAX x batch:

  p{1,2,4}_b512    inner-loop shape: one task's 512 padded nodes
  p{1,2,4}_b1024   two tasks' rows (the adapt-batch sweet spot)

Per-call time = slope/K. Output: benchmarks/pipe_chain_probe.json.
Run: cd /root/repo && python benchmarks/pipe_chain_probe.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))
sys.path.insert(0, SELF_DIR)

K = 40
WINDOW, CIN, HID, LAYERS = 24, 256, 128, 4


def main(rounds: int = 8) -> int:
    import jax
    import jax.numpy as jnp

    from _interleave import run_interleaved
    from weatherforecast_stgcn_maml_tpu.ops import fused_lstm_stack as fls

    rng = np.random.default_rng(0)
    report: dict = {"backend": jax.default_backend(), "k_chain": K}

    def make_params():
        return {
            "layers": [
                {
                    "wx": jnp.asarray(rng.normal(
                        size=(CIN if l == 0 else HID, 4 * HID)
                    ).astype(np.float32) * 0.05),
                    "wh": jnp.asarray(rng.normal(
                        size=(HID, 4 * HID)).astype(np.float32) * 0.05),
                    "b": jnp.asarray(rng.normal(
                        size=(4 * HID,)).astype(np.float32)),
                }
                for l in range(LAYERS)
            ]
        }

    arms = {}
    for b in (512, 1024):
        x = jnp.asarray(rng.normal(size=(b, WINDOW, CIN)).astype(np.float32),
                        jnp.bfloat16)
        for pmax in (1, 2, 4):
            fls._PIPE_MAX = pmax
            params = make_params()

            def loss(p, xx):
                return fls.lstm_stack_last_all(
                    p, xx, compute_dtype=jnp.bfloat16
                ).astype(jnp.float32).sum()

            def chained(p, xx):
                def body(carry, _):
                    pp, s = carry
                    g = jax.grad(loss)(pp, xx)
                    # Param-dependent update keeps iterations sequential.
                    pp = jax.tree.map(lambda a, gg: a - 1e-6 * gg, pp, g)
                    return (pp, s + g["layers"][0]["b"].sum()), None

                (pp, s), _ = jax.lax.scan(body, (p, 0.0), None, length=K)
                return s

            jfn = jax.jit(chained)
            np.asarray(jfn(params, x))

            def rep(jfn=jfn, params=params, x=x):
                np.asarray(jfn(params, x))

            arms[f"p{pmax}_b{b}"] = rep
    fls._PIPE_MAX = 4

    timed = run_interleaved(arms, rounds, "pipe-chain")
    report["raw"] = timed
    fit = {}
    for name, t in timed.items():
        per = t["best_ms"] / K
        fit[name] = {"per_grad_ms": per}
        print(f"[pipe-chain] {name}: {per:.3f} ms/grad", file=sys.stderr)
    report["fit"] = fit

    with open(os.path.join(SELF_DIR, "pipe_chain_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
