"""R-bwd kernel rate attribution: VPU-bound or dot-issue-bound?

fhvp_decomp_probe.json pins the SO residual on the tangent-of-backward
LSTM kernel (`_hvpbwd_kernel_m`): ~0.17 ms per dot-unit over its 9 units
vs ~0.11 for the first-order backward's 3 — a 1.5x per-dot rate gap that
is either hidden tangent VPU math (the R-bwd runs ~3x the FO backward's
elementwise chains between dots) or per-dot MXU issue overhead (6 dot
issues per (t, l) vs the FO backward's 3).

Arms (interleaved, one window, explicit floor; production stack shape
[T=24, B=512, C=256, H=128, L=4] bf16, vmap-2 like the production task
vmap):

  fo_bwd       — the first-order backward kernel (3 dot units/(t,l)).
  rbwd_full    — the R-bwd kernel as shipped (9 units + full tangent VPU).
  rbwd_ablate  — SAME dots/streams/accumulators, tangent elementwise
                 chains collapsed to single adds
                 (ops/fused_lstm_hvp.py ablate_tangent_vpu).
  floor        — near-empty dispatch, subtracted from every arm.

Read: if ablate ~= full, the gap is MXU/issue-bound (merge paired dots);
if ablate approaches fo_bwd's per-unit rate, the gap is the tangent VPU
math (attack or accept as the floor). Writes benchmarks/hvp_rate_probe.json.
Run: cd /root/repo && python benchmarks/hvp_rate_probe.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))
sys.path.insert(0, SELF_DIR)

ITERS = 30
BF16_PEAK = 197e12
T, B, C, H, L = 24, 512, 256, 128, 4
V = 2  # task vmap width


def main(rounds: int = 8) -> int:
    import jax
    import jax.numpy as jnp

    from _interleave import run_interleaved
    from weatherforecast_stgcn_maml_tpu.ops import fused_lstm_hvp as fh
    from weatherforecast_stgcn_maml_tpu.ops import fused_lstm_stack as fs

    if jax.default_backend() != "tpu":
        print("[hvp-rate] TPU required", file=sys.stderr)
        return 1

    dt = jnp.bfloat16
    keep = 0.8
    rng = np.random.default_rng(0)

    def arr(shape, dtype=dt, scale=0.3):
        return jnp.asarray(rng.normal(size=shape) * scale, dtype)

    x = arr((V, T, B, C))
    tx = arr((V, T, B, C))
    g = arr((V, B, H))
    tg = arr((V, B, H))
    h_all = arr((V, L, T, B, H))
    th_all = arr((V, L, T, B, H))
    c_all = arr((V, L, T, B, H))
    tc_all = arr((V, L, T, B, H))
    wcat0 = arr((C + H, 4 * H))
    twcat0 = arr((C + H, 4 * H))
    wcatr = arr((L - 1, 2 * H, 4 * H))
    twcatr = arr((L - 1, 2 * H, 4 * H))
    b2d = arr((L, 4 * H), jnp.float32, 0.1)
    tb2d = arr((L, 4 * H), jnp.float32, 0.1)
    masks = jnp.asarray(
        (rng.uniform(size=(V, L - 1, T, B, H)) < keep).astype(np.int8)
    )

    def rbwd(ablate):
        def one(g1, tg1, x1, tx1, ha, tha, ca, tca, m1):
            return fh._hvpbwd_pallas_m(
                g1, tg1, x1, tx1, ha, tha, ca, tca,
                wcat0, twcat0, wcatr, twcatr, b2d, tb2d, m1,
                dt, False, keep, ablate_tangent_vpu=ablate,
            )[0]

        def unit(x2, i):
            out = jax.vmap(one)(
                g, tg, x2, tx, h_all, th_all, c_all, tc_all, masks
            )
            return x2 + 1e-9 * out.astype(x2.dtype)

        return unit

    def fo_bwd_unit(x2, i):
        def one(g1, x1, ha, ca, m1):
            return fs._bwd_pallas_m(
                g1, x1, ha, ca, wcat0, wcatr, b2d, m1, dt, False, keep
            )[0]

        out = jax.vmap(one)(g, x, h_all, c_all, masks)
        return x2 + 1e-9 * out.astype(x2.dtype)

    def chain_of(unit):
        def chain(x2):
            def body(x2, i):
                return unit(x2, i), None

            x2, _ = jax.lax.scan(body, x2, jnp.arange(ITERS))
            return jax.tree.leaves(x2)[0].astype(jnp.float32).sum()

        return chain

    arms = {}
    for name, unit in [
        ("fo_bwd", fo_bwd_unit),
        ("rbwd_full", rbwd(False)),
        ("rbwd_ablate", rbwd(True)),
    ]:
        jfn = jax.jit(chain_of(unit))
        t0 = time.perf_counter()
        np.asarray(jfn(x))
        print(f"[hvp-rate] {name} compiled {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        arms[name] = functools.partial(lambda f: np.asarray(f(x)), jfn)

    @jax.jit
    def floor_fn(c):
        return (c * 1.000001).astype(jnp.float32).sum()

    zc = jnp.zeros((8, 128), jnp.float32)
    np.asarray(floor_fn(zc))
    arms["floor"] = lambda: np.asarray(floor_fn(zc))

    timed = run_interleaved(arms, rounds, "hvp-rate")
    fl = timed["floor"]["best_ms"]
    per_iter = {
        k: (timed[k]["best_ms"] - fl) / ITERS
        for k in timed if k != "floor"
    }

    # Dot-unit FLOPs: per (t, l) a unit is one [VB, C_l+H]x[C_l+H, 4H]
    # contraction (C_0 = C, C_{l>0} = H via the merged [2H, 4H] recurrent
    # block). FO backward: 3 units; R-bwd: 9.
    unit_flops = sum(
        2.0 * V * B * ((C + H) if l == 0 else 2 * H) * 4 * H
        for l in range(L)
    ) * T / (T * L)  # mean per (t,l)
    units_total = {"fo_bwd": 3 * T * L, "rbwd_full": 9 * T * L,
                   "rbwd_ablate": 9 * T * L}
    report = {
        "backend": jax.default_backend(),
        "shape": {"T": T, "B": B, "C": C, "H": H, "L": L, "vmap": V},
        "iters": ITERS,
        "raw": timed,
        "dispatch_floor_ms": fl,
        "per_iter_ms": per_iter,
        "ms_per_dot_unit": {
            k: per_iter[k] / units_total[k] for k in per_iter
        },
        "mfu_of_dots": {
            k: (units_total[k] * unit_flops / BF16_PEAK * 1e3)
            / per_iter[k]
            for k in per_iter
        },
    }
    for k in per_iter:
        print(
            f"[hvp-rate] {k}: {per_iter[k]:.3f} ms/iter "
            f"({report['ms_per_dot_unit'][k] * 1e3:.2f} us/dot-unit, "
            f"dot-MFU {report['mfu_of_dots'][k] * 100:.1f}%)",
            file=sys.stderr,
        )
    with open(os.path.join(SELF_DIR, "hvp_rate_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
