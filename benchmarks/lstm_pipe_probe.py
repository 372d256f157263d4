"""Does Mosaic overlap one chain's VPU cell math with another's MXU dot?

benchmarks/vpu_share_probe.json localized the fused LSTM kernel's gap: the
f32 cell math adds ~0.9 us per step on top of the 2.04 us merged-gates dot
(mxu_frac 0.69) — VPU work serialized INTO the MXU dependency chain. But
LSTM rows are independent: splitting the batch into P interleaved chains
makes chain A's cell math independent of chain B's dot, so a scheduler that
overlaps MXU and VPU should hide the cell cost entirely
(per-step -> max(dot, cell) per chain instead of dot + cell).

Arms (grid=(M,), K chained steps, shapes = production merged-gates kernel):
  pipe1   one [1024, 384] @ [384, 512] chain + f32 cell math (baseline,
          identical to vpu_share_probe's lstm_f32)
  pipe2   two interleaved [512, 384] chains
  pipe4   four interleaved [256, 384] chains
  dots1   pipe1 without cell math (MXU bound reference)

Per-step slope between K points. If pipe2 ~= dots1, the production kernel
should adopt 2-way row pipelining. Output: benchmarks/lstm_pipe_probe.json.
Run: cd /root/repo && python benchmarks/lstm_pipe_probe.py
"""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))
sys.path.insert(0, SELF_DIR)

M = 100
KS = (16, 64)
B, CH, H4, HID = 1024, 384, 512, 128


def main(rounds: int = 8) -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from _interleave import run_interleaved

    report: dict = {"backend": jax.default_backend(), "m_programs": M,
                    "ks": list(KS)}
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def cell(gates, m, cdt=jnp.float32):
        g32 = gates.astype(cdt)
        i = jax.nn.sigmoid(g32[:, :HID])
        f = jax.nn.sigmoid(g32[:, HID:2 * HID])
        g = jnp.tanh(g32[:, 2 * HID:3 * HID])
        o = jax.nn.sigmoid(g32[:, 3 * HID:])
        c = f * g + i * g
        hh = o * jnp.tanh(c)
        hh = hh * (m.astype(cdt) * 1.25)
        return jnp.concatenate([hh, hh, hh, hh], axis=1)

    def kernel(w_ref, h_ref, m_ref, o_ref, *, k, pipes, with_cell):
        w = w_ref[:]
        bp = B // pipes
        hs = [h_ref[p * bp:(p + 1) * bp] for p in range(pipes)]
        ms = [m_ref[p * bp:(p + 1) * bp] for p in range(pipes)]
        for _ in range(k):
            gs = [
                jnp.dot(h[:, :CH], w, preferred_element_type=jnp.float32)
                for h in hs
            ]
            if with_cell:
                nxts = [cell(g, m) for g, m in zip(gs, ms)]
            else:
                nxts = [g * 2.0 for g in gs]
            for p in range(pipes):
                o_ref[p * bp:(p + 1) * bp] = nxts[p].astype(o_ref.dtype)
            hs = [n.astype(dt) for n in nxts]

    def make_arm(pipes, with_cell, k):
        w = jnp.asarray(rng.normal(size=(CH, H4)).astype(np.float32) * 0.05, dt)
        h0 = jnp.asarray(rng.normal(size=(B, H4)).astype(np.float32), dt)
        m = jnp.asarray(rng.integers(0, 2, size=(B, HID)).astype(np.int8))
        fn = pl.pallas_call(
            functools.partial(kernel, k=k, pipes=pipes, with_cell=with_cell),
            grid=(M,),
            in_specs=[
                pl.BlockSpec((CH, H4), lambda s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, H4), lambda s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, HID), lambda s: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (B, H4), lambda s: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, H4), dt),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )
        jfn = jax.jit(lambda w_, h_, m_: fn(w_, h_, m_))
        np.asarray(jfn(w, h0, m))

        def rep():
            np.asarray(jfn(w, h0, m))

        return rep

    arms = {}
    for k in KS:
        arms[f"dots1_k{k}"] = make_arm(1, False, k)
        for p in (1, 2, 4):
            arms[f"pipe{p}_k{k}"] = make_arm(p, True, k)

    timed = run_interleaved(arms, rounds, "lstm-pipe")
    report["raw"] = timed

    peak = 197e12
    ideal = 2 * B * CH * H4 / peak
    fits = {}
    for name in ("dots1", "pipe1", "pipe2", "pipe4"):
        best = {k: timed[f"{name}_k{k}"]["best_ms"] * 1e-3 for k in KS}
        slope = (best[KS[-1]] - best[KS[0]]) / (M * (KS[-1] - KS[0]))
        fits[name] = {
            "per_step_us": slope * 1e6,
            "ideal_flop_us": ideal * 1e6,
            "mxu_frac": ideal / slope if slope > 0 else None,
        }
        print(
            f"[lstm-pipe] {name}: {slope * 1e6:.3f} us/step "
            f"(ideal {ideal * 1e6:.3f})", file=sys.stderr,
        )
    report["fit"] = fits

    with open(os.path.join(SELF_DIR, "lstm_pipe_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
