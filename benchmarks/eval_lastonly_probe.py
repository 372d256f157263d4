"""Eval-path LSTM stack: no-residual (lastonly) kernel vs the old
residual-emitting kernel vs the XLA scan.

Round-3 self-review found the eval/serving forward was paying the
training kernel's 2*L*T*B*H residual stream (XLA cannot DCE stores inside
an opaque pallas_call). The custom_vjp primal now runs a lastonly variant
(ops/fused_lstm_stack.py `_fwd_kernel_m_lastonly*`) with no residual
outputs. This probe measures what that bought on the real eval shape.

Arms (interleaved, chain of 20 in-graph forwards per rep):
  lastonly — the current no-grad primal (emit_residuals=False)
  residual — the pre-fix behavior (emit_residuals=True, h_last consumed)
  xla      — the unrolled XLA scan reference

Output: benchmarks/eval_lastonly_probe.json.
Run: cd /root/repo && python benchmarks/eval_lastonly_probe.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))
sys.path.insert(0, SELF_DIR)

T, B, C, H, L = 24, 512, 256, 128, 4
CHAIN = 20


def main(rounds: int = 12) -> int:
    import jax
    import jax.numpy as jnp

    from _interleave import run_interleaved
    from weatherforecast_stgcn_maml_tpu.models.lstm import apply_lstm, init_lstm
    from weatherforecast_stgcn_maml_tpu.ops import fused_lstm_stack as fls

    if jax.default_backend() != "tpu":
        print("needs the TPU backend", file=sys.stderr)
        return 1

    params = init_lstm(jax.random.key(0), C, H, L)
    params = jax.device_put(params)
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).normal(size=(B, T, C)), jnp.bfloat16
        ).astype(jnp.float32)
    )

    layers = params["layers"]
    b2d = jnp.stack([layers[l]["b"] for l in range(L)])
    wcat0 = jnp.concatenate([layers[0]["wx"], layers[0]["wh"]], axis=0)
    wcatr = jnp.stack([
        jnp.concatenate([layers[l]["wx"], layers[l]["wh"]], axis=0)
        for l in range(1, L)
    ])
    x_tbc = jnp.swapaxes(x, 0, 1)

    dt = jnp.bfloat16

    def chain(step):
        def run(x0):
            def body(carry, _):
                out = step(carry)
                # Feed a value derived from the output back in so the chain
                # cannot be collapsed; keep shapes fixed.
                nxt = x0 + out.sum().astype(x0.dtype) * 0.0
                return nxt, out[0, 0]
            _, outs = jax.lax.scan(body, x0, None, length=CHAIN)
            return outs
        return jax.jit(run)

    lastonly = chain(
        lambda xv: fls._fwd_pallas_m(
            jnp.swapaxes(xv, 0, 1), wcat0, wcatr, b2d, None, dt, False,
            emit_residuals=False,
        )
    )
    residual = chain(
        lambda xv: fls._fwd_pallas_m(
            jnp.swapaxes(xv, 0, 1), wcat0, wcatr, b2d, None, dt, False,
            emit_residuals=True,
        )[2]
    )
    xla = chain(lambda xv: apply_lstm(params, xv, compute_dtype=dt, kernel="xla", unroll=T))

    arms = {
        "lastonly": lambda: np.asarray(lastonly(x)),
        "residual": lambda: np.asarray(residual(x)),
        "xla": lambda: np.asarray(xla(x)),
    }
    for rep in arms.values():
        rep()  # compile + warm

    res = run_interleaved(arms, rounds, "eval_lastonly")
    for name in res:
        res[name]["ms_per_fwd_best"] = res[name]["best_ms"] / CHAIN

    # Numerics: lastonly must equal the residual kernel's h_last bit-exactly
    # (same f32 carry; residual emission is store-only).
    a = np.asarray(lastonly(x))
    b = np.asarray(residual(x))
    max_delta = float(np.abs(a - b).max())

    out = {
        "shape": {"T": T, "B": B, "C": C, "H": H, "L": L, "chain": CHAIN,
                  "dtype": "bfloat16"},
        "results": res,
        "lastonly_vs_residual_max_delta": max_delta,
    }
    path = os.path.join(SELF_DIR, "eval_lastonly_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: round(v["ms_per_fwd_best"], 3)
                      for k, v in res.items()} | {"max_delta": max_delta}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
