"""Per-dot overhead microbenchmark: dependent MXU contractions at the
reference-scale shapes that dominate the 441/512-node meta step.

The round-3 roofline (benchmarks/roofline_r3.md) attributes the residual
~1.5x gap to MXU pipeline fill/drain on sub-microsecond DEPENDENT dots but
estimates the per-dot penalty (~0.2 us) from public cycle counts. This
probe MEASURES it: Pallas kernels running K chained dots per grid program,
M programs per dispatch, at three shapes:

  dep_a      [512,512]@[512,256]   — the GCN A@(HW) dot (per time slice)
  dep_a_wide [512,512]@[512,1024]  — the same dot column-packed over a
                                     4-slice time block (the candidate
                                     fused_gcn_train v2 layout: 4x FLOPs
                                     per dot, same chain length)
  dep_lstm   [1024,384]@[384,512]  — the merged-gates LSTM step dot
  xla_dep_a  dep_a's chain as a plain XLA scan (per-dot cost outside
             Pallas, for reference)

Per-dot cost comes from the slope of time vs K at fixed M (program setup
and dispatch cancel); the stall share is slope minus the bf16-peak FLOP
time. If the A-shape stall is ~constant per dot, column-packing (one wide
dot replacing wb narrow ones) recovers most of it — the decision input
for the v2 GCN kernel.

Output: benchmarks/dot_latency_probe.json.
Run: cd /root/repo && python benchmarks/dot_latency_probe.py
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

M = 100  # grid programs per dispatch
KS = (16, 64, 256)  # dots per program


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

    def chain_kernel(a_ref, h_ref, o_ref, *, k):
        h = h_ref[:]
        a = a_ref[:]
        for _ in range(k):
            # Chain: each dot consumes the previous one's output. The *2
            # scale keeps magnitudes alive over 256 bf16 hops (A rows sum
            # to ~0.5); one VPU pass per hop, identical across arms.
            h = (
                jax.lax.dot(a, h, preferred_element_type=jnp.float32) * 2.0
            ).astype(h.dtype)
        o_ref[:] = h

    def make_pallas_arm(name, a_shape, h_shape, k):
        a = jnp.asarray(
            rng.uniform(size=a_shape).astype(np.float32) / a_shape[1], dt
        )
        h0 = jnp.asarray(rng.normal(size=h_shape).astype(np.float32), dt)

        if name == "dep_lstm":
            # h [1024, 512] -> slice [:, :384] @ w [384, 512] -> [1024, 512]
            def kern(a_ref, h_ref, o_ref):
                h = h_ref[:]
                w = a_ref[:]
                for _ in range(k):
                    h = (
                        jax.lax.dot(
                            h[:, : w.shape[0]], w,
                            preferred_element_type=jnp.float32,
                        )
                        * 2.0
                    ).astype(h.dtype)
                o_ref[:] = h
        else:
            import functools

            kern = functools.partial(chain_kernel, k=k)

        fn = pl.pallas_call(
            kern,
            grid=(M,),
            in_specs=[
                pl.BlockSpec(a_shape, lambda s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(h_shape, lambda s: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                h_shape, lambda s: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(h_shape, dt),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )
        jfn = jax.jit(lambda a_, h_: fn(a_, h_))
        np.asarray(jfn(a, h0))  # compile + warm

        def rep():
            np.asarray(jfn(a, h0))

        return rep

    def make_xla_arm(k):
        a = jnp.asarray(
            rng.uniform(size=(512, 512)).astype(np.float32) / 512, dt
        )
        h0 = jnp.asarray(rng.normal(size=(512, 256)).astype(np.float32), dt)

        @jax.jit
        def fn(a_, h_):
            def prog(h, _):
                for _ in range(k):
                    h = (
                        jax.lax.dot(a_, h, preferred_element_type=jnp.float32)
                        * 2.0
                    ).astype(h.dtype)
                return h, None

            h, _ = jax.lax.scan(prog, h_, None, length=M)
            return h

        np.asarray(fn(a, h0))

        def rep():
            np.asarray(fn(a, h0))

        return rep

    shapes = {
        "dep_a": ((512, 512), (512, 256)),
        "dep_a_wide": ((512, 512), (512, 1024)),
        "dep_lstm": ((384, 512), (1024, 512)),
    }
    arms = {}
    for k in KS:
        for name, (a_shape, h_shape) in shapes.items():
            arms[f"{name}_k{k}"] = make_pallas_arm(name, a_shape, h_shape, k)
        arms[f"xla_dep_a_k{k}"] = make_xla_arm(k)

    timed = run_interleaved(arms, rounds, "dot-latency")
    report["raw"] = timed

    # Per-dot slope between successive K points (dispatch + per-program
    # setup cancel in the difference).
    peak = 197e12  # v5e bf16
    flops = {
        "dep_a": 2 * 512 * 512 * 256,
        "dep_a_wide": 2 * 512 * 512 * 1024,
        "dep_lstm": 2 * 1024 * 384 * 512,
        "xla_dep_a": 2 * 512 * 512 * 256,
    }
    fits = {}
    for name in list(shapes) + ["xla_dep_a"]:
        best = {k: timed[f"{name}_k{k}"]["best_ms"] * 1e-3 for k in KS}
        slope = (best[KS[-1]] - best[KS[0]]) / (M * (KS[-1] - KS[0]))
        ideal = flops[name] / peak
        fits[name] = {
            "per_dot_us": slope * 1e6,
            "ideal_flop_us": ideal * 1e6,
            "stall_us_per_dot": (slope - ideal) * 1e6,
            "mxu_frac": ideal / slope if slope > 0 else None,
        }
        print(f"[dot-latency] {name}: {slope * 1e6:.3f} us/dot "
              f"(ideal {ideal * 1e6:.3f}, stall {(slope - ideal) * 1e6:.3f})",
              file=sys.stderr)
    report["fit"] = fits

    with open(os.path.join(SELF_DIR, "dot_latency_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
