"""Where the fused kernels' non-MXU time goes: VPU elementwise between
dependent dots.

benchmarks/dot_latency_probe.json overturned the round-3 roofline's
latency hypothesis: a bare chain of dependent reference-shape dots runs
at 95-99% of bf16 peak (per-dot stall 0.01-0.14 us, not ~2 us). The
real kernels sit at ~50%, so the gap must be the elementwise work the
cell/layer math inserts INTO the dependency chain (gate nonlinearities,
cell updates, bias/ReLU/mask) — VPU work that cannot overlap the MXU
because each dot depends on it.

Arms (all Pallas, grid=(M,), K chained steps per program, bf16 dots with
f32 accumulation exactly like the production kernels):

  lstm_dots      one [1024,384]@[384,512] merged-gates dot per step
  lstm_f32       + the full LSTM cell math in f32 (production layout:
                   4 sliced nonlinearities + cell update + mask)
  lstm_f32_slab  + cell math f32 with i|f|o adjacent (ONE [B,3H] sigmoid
                   slab + one tanh) — tests op-count vs element-count
  lstm_bf16      + cell math in bf16 (2x-packed VPU lanes if supported)
  gcn_dots       one v1 GCN layer's dots (HW over 4 slices + 4 A-dots)
  gcn_f32        + bias + ReLU + int8-mask multiply in f32 (production)
  gcn_bf16       + the same elementwise in bf16

Per-step slope between K points isolates the added VPU cost per step.
Output: benchmarks/vpu_share_probe.json.
Run: cd /root/repo && python benchmarks/vpu_share_probe.py
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
N, C, WB = 512, 256, 4


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

    # Mosaic cannot lower jax.nn.sigmoid / jnp.tanh on bf16 vectors (their
    # lowerings broadcast f32 constants into the vector dtype and trip a
    # 'vector.broadcast' verification error). The bf16 arms use manual
    # same-dtype formulations; f32 arms keep the production forms.
    def _sig(x):
        if x.dtype == jnp.bfloat16:
            one = jnp.ones((), x.dtype)
            return one / (one + jnp.exp(-x))
        return jax.nn.sigmoid(x)

    def _tanh(x):
        if x.dtype == jnp.bfloat16:
            one = jnp.ones((), x.dtype)
            two = one + one
            return two * _sig(two * x) - one
        return jnp.tanh(x)

    # ---------------- LSTM-step arms ------------------------------------
    def lstm_kernel(w_ref, h_ref, m_ref, o_ref, *, k, cell):
        h = h_ref[:]  # [B, H4] bf16 (gates of "previous step")
        w = w_ref[:]  # [CH, H4]
        m = m_ref[:]  # [B, HID] int8
        for _ in range(k):
            gates = jnp.dot(
                h[:, :CH], w, preferred_element_type=jnp.float32
            )  # [B, H4] f32
            if cell == "none":
                nxt = gates * 2.0
            elif cell in ("f32", "slab", "bf16"):
                cdt = jnp.bfloat16 if cell == "bf16" else jnp.float32
                g32 = gates.astype(cdt)
                if cell == "slab":
                    # i|f|o adjacent: ONE [B, 3H] sigmoid + one tanh.
                    ifo = _sig(g32[:, : 3 * HID])
                    i = ifo[:, :HID]
                    f = ifo[:, HID:2 * HID]
                    o = ifo[:, 2 * HID:]
                    g = _tanh(g32[:, 3 * HID:])
                else:
                    i = _sig(g32[:, :HID])
                    f = _sig(g32[:, HID:2 * HID])
                    g = _tanh(g32[:, 2 * HID:3 * HID])
                    o = _sig(g32[:, 3 * HID:])
                c = f * g + i * g  # stand-in cell update (same op count)
                hh = o * _tanh(c)
                hh = hh * (m.astype(cdt) * 1.25)  # dropout-mask multiply
                # Widen back to [B, H4] to keep the chain shape (cheap
                # broadcast concat, identical across cell arms).
                nxt = jnp.concatenate([hh, hh, hh, hh], axis=1).astype(
                    jnp.float32
                )
            o_ref[:] = nxt.astype(o_ref.dtype)
            h = nxt.astype(h.dtype)

    def make_lstm_arm(cell, k):
        w = jnp.asarray(rng.normal(size=(CH, H4)).astype(np.float32) * 0.05, dt)
        h0 = jnp.asarray(rng.normal(size=(B, H4)).astype(np.float32), dt)
        m = jnp.asarray(
            rng.integers(0, 2, size=(B, HID)).astype(np.int8)
        )
        fn = pl.pallas_call(
            functools.partial(lstm_kernel, k=k, cell=cell),
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

    # ---------------- GCN-layer arms ------------------------------------
    def gcn_kernel(a_ref, w_ref, b_ref, m_ref, h_ref, o_ref, *, k, elem):
        h = h_ref[:]  # [WB*N, C] bf16
        a = a_ref[:]
        w = w_ref[:]
        m = m_ref[:]  # [WB*N, C] int8
        for _ in range(k):
            hw = jnp.dot(h, w, preferred_element_type=jnp.float32).astype(dt)
            z = jnp.concatenate([
                jnp.dot(
                    a, hw[s * N:(s + 1) * N], preferred_element_type=jnp.float32
                )
                for s in range(WB)
            ])  # [WB*N, C] f32
            if elem == "none":
                h = (z * 2.0).astype(dt)
            else:
                cdt = jnp.bfloat16 if elem == "bf16" else jnp.float32
                zz = z.astype(cdt) + b_ref[:].astype(cdt)
                zz = jnp.maximum(zz, 0.0)
                zz = zz * (m.astype(cdt) * 1.25)
                h = (zz * 2.0).astype(dt)
            o_ref[:] = h

    def make_gcn_arm(elem, k):
        a = jnp.asarray(
            rng.uniform(size=(N, N)).astype(np.float32) / N, dt
        )
        w = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.05, dt)
        b = jnp.asarray(rng.normal(size=(1, C)).astype(np.float32))
        m = jnp.asarray(
            rng.integers(0, 2, size=(WB * N, C)).astype(np.int8)
        )
        h0 = jnp.asarray(rng.normal(size=(WB * N, C)).astype(np.float32), dt)
        fn = pl.pallas_call(
            functools.partial(gcn_kernel, k=k, elem=elem),
            grid=(M,),
            in_specs=[
                pl.BlockSpec((N, N), lambda s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), lambda s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (WB * N, C), lambda s: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (WB * N, C), lambda s: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (WB * N, C), lambda s: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((WB * N, C), dt),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )
        jfn = jax.jit(lambda a_, w_, b_, m_, h_: fn(a_, w_, b_, m_, h_))
        np.asarray(jfn(a, w, b, m, h0))

        def rep():
            np.asarray(jfn(a, w, b, m, h0))

        return rep

    arms = {}
    for k in KS:
        for cell in ("none", "f32", "slab", "bf16"):
            arms[f"lstm_{cell}_k{k}"] = make_lstm_arm(cell, k)
        for elem in ("none", "f32", "bf16"):
            arms[f"gcn_{elem}_k{k}"] = make_gcn_arm(elem, k)

    timed = run_interleaved(arms, rounds, "vpu-share")
    report["raw"] = timed

    peak = 197e12
    flops = {
        "lstm": 2 * B * CH * H4,
        "gcn": 2 * WB * N * C * C + 2 * WB * N * N * C,
    }
    fits = {}
    for fam in ("lstm", "gcn"):
        variants = (
            ("none", "f32", "slab", "bf16") if fam == "lstm"
            else ("none", "f32", "bf16")
        )
        for v in variants:
            best = {
                k: timed[f"{fam}_{v}_k{k}"]["best_ms"] * 1e-3 for k in KS
            }
            slope = (best[KS[-1]] - best[KS[0]]) / (M * (KS[-1] - KS[0]))
            ideal = flops[fam] / peak
            fits[f"{fam}_{v}"] = {
                "per_step_us": slope * 1e6,
                "ideal_flop_us": ideal * 1e6,
                "vpu_us_per_step": (slope - ideal) * 1e6,
                "mxu_frac": ideal / slope if slope > 0 else None,
            }
            print(
                f"[vpu-share] {fam}_{v}: {slope * 1e6:.3f} us/step "
                f"(ideal {ideal * 1e6:.3f})", file=sys.stderr,
            )
    report["fit"] = fits

    with open(os.path.join(SELF_DIR, "vpu_share_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
