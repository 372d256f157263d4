"""Attribute the fused LSTM stack's per-grid-step time INSIDE the kernel.

The eval (lastonly) kernel runs 0.686 ms at [B=512, T=24, C=256, H=128,
L=4] (lstm_grad_ablate_probe.json) = 28.6 us per grid step, of which the
16 merged dots account for ~4.1 us at MXU peak (synthetic dependent-dot
chains reach 84-99%: dot_latency_probe, lstm_pipe_probe). Masks and
residual stores measure ~free; cell-math hiding (pipe) and time-blocking
(tb) were washes. This probe splits the remaining ~24 us/step with
in-kernel ablations (fused_lstm_stack._ABLATE_*):

  full      — production lastonly nomask kernel, f32 weights (in-kernel
              bf16 cast per grid step, as the real call does today).
  precast   — weights passed ALREADY bf16: deletes the per-step
              [384+3*256, 512] f32->bf16 cast (~590K elements/step).
  nocell    — gate nonlinearities replaced by a linear cell (keeps the
              c->h->next-step dependence): bounds the transcendental cost.
  nocell_precast — both.
  noscratch — carry scratch entry/exit removed (recurrence broken across
              grid steps — WRONG numerics, probe only): if this is
              dramatically faster, the cross-step serialization itself is
              the floor; if not, the overhead is per-step fixed work.

Output: benchmarks/lstm_kernel_ablate_probe.json.
Run: cd /root/repo && python benchmarks/lstm_kernel_ablate_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))
sys.path.insert(0, SELF_DIR)

B, T, C, H, L = 512, 24, 256, 128, 4
K = 40


def main(rounds: int = 8) -> int:
    import jax
    import jax.numpy as jnp

    from _interleave import run_interleaved
    from weatherforecast_stgcn_maml_tpu.ops import fused_lstm_stack as fls

    rng = np.random.default_rng(0)
    wcat0 = jnp.asarray(
        rng.normal(size=(C + H, 4 * H)).astype(np.float32) * 0.05
    )
    wcatr = jnp.asarray(
        rng.normal(size=(L - 1, 2 * H, 4 * H)).astype(np.float32) * 0.05
    )
    b2d = jnp.asarray(rng.normal(size=(L, 4 * H)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(T, B, C)).astype(np.float32), jnp.bfloat16)

    def chain(nocell, noscratch, precast):
        w0 = wcat0.astype(jnp.bfloat16) if precast else wcat0
        wr = wcatr.astype(jnp.bfloat16) if precast else wcatr

        def run(xx, w0, wr, bb):
            def link(carry, _):
                h = fls._fwd_pallas_m(
                    xx * (1.0 + 0.0 * carry), w0, wr, bb, None,
                    jnp.bfloat16, False, emit_residuals=False,
                )
                return h.astype(jnp.float32).mean(), None

            s, _ = jax.lax.scan(link, jnp.float32(0.0), None, length=K)
            return s

        fls._ABLATE_NOCELL = nocell
        fls._ABLATE_NOSCRATCH = noscratch
        try:
            fn = jax.jit(run)
            t0 = time.perf_counter()
            np.asarray(fn(x, w0, wr, b2d))  # compile with flags live
        finally:
            fls._ABLATE_NOCELL = False
            fls._ABLATE_NOSCRATCH = False
        print(f"[lstm-abl] compiled in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        def rep(fn=fn, w0=w0, wr=wr):
            np.asarray(fn(x, w0, wr, b2d))

        return rep

    arms = {
        "full": chain(False, False, False),
        "precast": chain(False, False, True),
        "nocell": chain(True, False, False),
        "nocell_precast": chain(True, False, True),
        "noscratch": chain(False, True, False),
    }
    timed = run_interleaved(arms, rounds, "lstm-abl")
    report = {
        "backend": jax.default_backend(),
        "shape": {"B": B, "T": T, "C": C, "H": H, "L": L},
        "k_chain": K,
        "raw": timed,
        "per_call_ms": {k: timed[k]["best_ms"] / K for k in timed},
        "per_grid_step_us": {
            k: timed[k]["best_ms"] / K / T * 1000 for k in timed
        },
    }
    for k in timed:
        print(f"[lstm-abl] {k}: {timed[k]['best_ms'] / K:.3f} ms/call "
              f"({timed[k]['best_ms'] / K / T * 1000:.1f} us/step)",
              file=sys.stderr)
    with open(
        os.path.join(SELF_DIR, "lstm_kernel_ablate_probe.json"), "w"
    ) as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
