"""Attribute the fused LSTM stack GRADIENT's time to its components.

benchmarks/pipe_chain_probe.json: the chained full grad runs ~0.93 ms at
[B=512, T=24, C=256, H=128, L=4] vs a ~0.39 ms fwd+bwd FLOP floor (2.4x).
The three prior hypotheses are measured dead ends at these shapes
(dot-latency: chains hit 95-99% peak, dot_latency_probe; VPU share: pipe=4
hides the cell math, ~2% on the real grad; grid-step overhead: tb=4
neutral, tb_ab_probe). This probe splits the remaining time:

  * fwd_lastonly  — no-residual forward (eval variant): pure recurrence.
  * fwd_resid     — residual-emitting forward (the grad's primal): adds the
                    2*L*T*B*H residual store stream.
  * grad_full     — value_and_grad (primal + bwd kernel).
  * grad_nomask   — same without dropout masks (mask stream + VPU cost).

All arms chained K deep in-graph (amortizing the ~26 ms tunnel dispatch
floor) and interleaved round-robin in one window. Differences attribute:
residual-store cost (fwd_resid - fwd_lastonly), bwd-kernel cost
(grad - fwd_resid), mask cost (grad_full - grad_nomask).

Output: benchmarks/lstm_grad_ablate_probe.json.
Run: cd /root/repo && python benchmarks/lstm_grad_ablate_probe.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))
sys.path.insert(0, SELF_DIR)

B, T, C, H, L = 512, 24, 256, 128, 4
K = 40  # chain depth


def main(rounds: int = 8) -> int:
    import jax
    import jax.numpy as jnp

    from _interleave import run_interleaved
    from weatherforecast_stgcn_maml_tpu.ops import fused_lstm_stack as fls

    rng = np.random.default_rng(0)
    params = {
        "layers": [
            {
                "wx": jnp.asarray(rng.normal(
                    size=(C if l == 0 else H, 4 * H)
                ).astype(np.float32) * 0.05),
                "wh": jnp.asarray(rng.normal(
                    size=(H, 4 * H)).astype(np.float32) * 0.05),
                "b": jnp.asarray(rng.normal(
                    size=(4 * H,)).astype(np.float32)),
            }
            for l in range(L)
        ]
    }
    x = jnp.asarray(
        rng.normal(size=(B, T, C)).astype(np.float32), jnp.bfloat16
    )
    key = jax.random.key(3)

    def fwd(p, xx, train):
        return fls.lstm_stack_last_all(
            p, xx, compute_dtype=jnp.bfloat16,
            dropout_rate=0.2 if train else 0.0, train=train,
            rng=key if train else None,
        ).astype(jnp.float32)

    # Chained arms: each link feeds a scalar back into x so XLA cannot
    # overlap/elide links; one dispatch covers K dependent computations.
    def chain(body):
        def run(p, xx):
            def link(carry, _):
                out = body(p, xx * (1.0 + 0.0 * carry))
                return out, None

            s0 = jnp.float32(0.0)
            s, _ = jax.lax.scan(link, s0, None, length=K)
            return s

        return jax.jit(run)

    def fwd_resid(p, xx):
        layers = p["layers"]
        b2d = jnp.stack([l["b"] for l in layers])
        wcat0 = jnp.concatenate([layers[0]["wx"], layers[0]["wh"]], axis=0)
        wcatr = jnp.stack([
            jnp.concatenate([layers[l]["wx"], layers[l]["wh"]], axis=0)
            for l in range(1, L)
        ])
        x_tbc = jnp.swapaxes(xx, 0, 1)
        h_all, c_all, h_last = fls._fwd_pallas_m(
            x_tbc, wcat0, wcatr, b2d, None, jnp.bfloat16, False,
            emit_residuals=True,
        )
        # consume one element of each output so nothing is DCE'd
        return (
            h_last.astype(jnp.float32).sum()
            + h_all[0, 0, 0, 0].astype(jnp.float32)
            + c_all[0, 0, 0, 0].astype(jnp.float32)
        )

    def loss_train(p, xx):
        return fwd(p, xx, True).sum()

    def loss_eval(p, xx):
        return fwd(p, xx, False).sum()

    arms_defs = {
        # eval route = lastonly kernel (no residual stream)
        "fwd_lastonly": chain(lambda p, xx: loss_eval(p, xx)),
        # grad's primal: the residual-emitting forward, called directly
        # (taking value_and_grad and using only the value would let XLA
        # DCE the bwd kernel but NOT the residual stores).
        "fwd_resid": chain(lambda p, xx: fwd_resid(p, xx)),
        "grad_full": chain(
            lambda p, xx: jax.tree.leaves(
                jax.grad(loss_train)(p, xx)
            )[0].sum()
        ),
        "grad_nomask": chain(
            lambda p, xx: jax.tree.leaves(
                jax.grad(loss_eval)(p, xx)
            )[0].sum()
        ),
    }

    arms = {}
    for name, fn in arms_defs.items():
        out = fn(params, x)  # compile + sanity
        np.asarray(out)

        def rep(fn=fn):
            np.asarray(fn(params, x))

        arms[name] = rep

    timed = run_interleaved(arms, rounds, "lstm-ablate")
    report = {
        "backend": jax.default_backend(),
        "shape": {"B": B, "T": T, "C": C, "H": H, "L": L},
        "k_chain": K,
        "raw": timed,
        "per_call_ms": {
            k: timed[k]["best_ms"] / K for k in timed
        },
    }
    for k in sorted(arms):
        print(f"[lstm-ablate] {k}: best {timed[k]['best_ms']:.2f} ms "
              f"({timed[k]['best_ms'] / K * 1000:.1f} us/call)",
              file=sys.stderr)

    with open(os.path.join(SELF_DIR, "lstm_grad_ablate_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
