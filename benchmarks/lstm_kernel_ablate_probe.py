"""LSTM stack kernel ablations — and the probe-methodology correction.

FINAL CONCLUSION (the arms evolved over several runs; see git history):
a chain of K=40 kernel calls per dispatch does NOT amortize the ~22 ms
tunnel dispatch+fetch floor when each call's real work is only ~0.1-0.2 ms
— the floor dominated every per-call reading in this file's early runs and
in lstm_grad_ablate/pipe_chain/meta_component (round-4) and the round-3
roofline's per-step analyses. The decisive arms (one window):

  dots0/dots96/dots384 — the dependent merged-dot chain at 0/96/384 dots
      per call: 21.9 / 25.9 / 38.2 ms per 40-call dispatch. Slope
      = 1.04-1.06 us per [512,384]@[384,512] dot = 97-98% OF bf16 PEAK.
      Intercept = the dispatch floor. The MXU is NOT the problem, the
      recurrence dependency is NOT the problem, and in-kernel ablations
      (cell math, weight casts, scratch, concats, masks, residual streams)
      were all read against a 22 ms constant.

Floor-corrected production-kernel numbers (subtracting the same-window
dots0): lastonly fwd ~160 us/call vs 74 us dot-ideal (cell math ~57 us —
the real residual), full fwd+bwd grad ~0.42 ms/call. At the meta step the
valid in-graph A/Bs (pipe_ab, tb_ab, mask_cost — one dispatch per rep,
182 iters in-graph) stand unchanged: pipe/tb neutral, masks ~8 ms/step.

meta_component_probe.py now carries an explicit `floor` arm and reports
floor-corrected per-iter attribution (enc ~93% MFU, LSTM ~53%, tree math
~0.08 ms/iter).

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
    import functools

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

    # Same-window synthetic floor: a pallas kernel with the real kernel's
    # grid/stream/scratch STRUCTURE but a body of just the 4 layer dots
    # (dependent through a carried h), with and without the per-layer
    # concatenate — cross-window synthetic numbers (lstm_pipe_probe) are
    # not comparable under pool contention.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def dot_kernel(x_ref, w0_ref, wr_ref, h_last_ref, h_scr, *, concat):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            h_scr[:] = jnp.zeros_like(h_scr)

        inp = x_ref[0].astype(jnp.bfloat16)  # [B, C]
        for l in range(L):
            w = (w0_ref[:] if l == 0 else wr_ref[l - 1]).astype(jnp.bfloat16)
            h_prev = h_scr[l]
            if concat:
                xh = jnp.concatenate(
                    [inp, h_prev.astype(jnp.bfloat16)], axis=1
                )
                gates = jnp.dot(xh, w, preferred_element_type=jnp.float32)
            else:
                gates = jnp.dot(
                    inp, w[: inp.shape[1]],
                    preferred_element_type=jnp.float32,
                ) + jnp.dot(
                    h_prev.astype(jnp.bfloat16), w[inp.shape[1]:][:H],
                    preferred_element_type=jnp.float32,
                )
            h = gates[:, :H]
            h_scr[l] = h
            inp = h.astype(jnp.bfloat16)
        h_last_ref[:] = h_scr[L - 1]

    def dot_chain(concat):
        def run(xx, w0, wr):
            def link(carry, _):
                h = pl.pallas_call(
                    functools.partial(dot_kernel, concat=concat),
                    grid=(T,),
                    in_specs=[
                        pl.BlockSpec((1, B, C), lambda s: (s, 0, 0)),
                        pl.BlockSpec((C + H, 4 * H), lambda s: (0, 0)),
                        pl.BlockSpec(
                            (L - 1, 2 * H, 4 * H), lambda s: (0, 0, 0)
                        ),
                    ],
                    out_specs=pl.BlockSpec((B, H), lambda s: (0, 0)),
                    out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
                    scratch_shapes=[pltpu.VMEM((L, B, H), jnp.float32)],
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=48 * 1024 * 1024
                    ),
                )(xx * (1.0 + 0.0 * carry), w0, wr)
                return h.mean(), None

            s, _ = jax.lax.scan(link, jnp.float32(0.0), None, length=K)
            return s

        fn = jax.jit(run)
        t0 = time.perf_counter()
        np.asarray(fn(x, wcat0, wcatr))
        print(f"[lstm-abl] dotchain compiled {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        def rep(fn=fn):
            np.asarray(fn(x, wcat0, wcatr))

        return rep

    # Discriminate stream-DMA cost vs grid machinery: x held ENTIRELY in
    # VMEM (6.3 MB at these shapes) — (a) grid=(T,) with a revisited full
    # block, (b) no grid at all (python time loop in one program).
    def vmem_kernel(x_ref, w0_ref, wr_ref, h_last_ref, h_scr, *, whole):
        def step_body(inp):
            nxt = inp
            for l in range(L):
                w = (
                    w0_ref[:] if l == 0 else wr_ref[l - 1]
                ).astype(jnp.bfloat16)
                h_prev = h_scr[l]
                xh = jnp.concatenate(
                    [nxt, h_prev.astype(jnp.bfloat16)], axis=1
                )
                gates = jnp.dot(xh, w, preferred_element_type=jnp.float32)
                h = gates[:, :H]
                h_scr[l] = h
                nxt = h.astype(jnp.bfloat16)

        if whole:
            for t in range(T):
                step_body(x_ref[t].astype(jnp.bfloat16))
            h_last_ref[:] = h_scr[L - 1]
        else:
            s = pl.program_id(0)

            @pl.when(s == 0)
            def _():
                h_scr[:] = jnp.zeros_like(h_scr)

            step_body(x_ref[pl.ds(s, 1)][0].astype(jnp.bfloat16))
            h_last_ref[:] = h_scr[L - 1]

    def vmem_chain(whole):
        def run(xx, w0, wr):
            def link(carry, _):
                h = pl.pallas_call(
                    functools.partial(vmem_kernel, whole=whole),
                    grid=() if whole else (T,),
                    in_specs=[
                        pl.BlockSpec(
                            (T, B, C),
                            (lambda: (0, 0, 0))
                            if whole
                            else (lambda s: (0, 0, 0)),
                        ),
                        pl.BlockSpec(
                            (C + H, 4 * H),
                            (lambda: (0, 0)) if whole else (lambda s: (0, 0)),
                        ),
                        pl.BlockSpec(
                            (L - 1, 2 * H, 4 * H),
                            (lambda: (0, 0, 0))
                            if whole
                            else (lambda s: (0, 0, 0)),
                        ),
                    ],
                    out_specs=pl.BlockSpec(
                        (B, H),
                        (lambda: (0, 0)) if whole else (lambda s: (0, 0)),
                    ),
                    out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
                    scratch_shapes=[pltpu.VMEM((L, B, H), jnp.float32)],
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=64 * 1024 * 1024
                    ),
                )(xx * (1.0 + 0.0 * carry), w0, wr)
                return h.mean(), None

            s, _ = jax.lax.scan(link, jnp.float32(0.0), None, length=K)
            return s

        fn = jax.jit(run)
        t0 = time.perf_counter()
        np.asarray(fn(x, wcat0, wcatr))
        print(
            f"[lstm-abl] vmem(whole={whole}) compiled "
            f"{time.perf_counter() - t0:.1f}s", file=sys.stderr,
        )

        def rep(fn=fn):
            np.asarray(fn(x, wcat0, wcatr))

        return rep

    # Value-carried whole-program variant: weights read ONCE, h carries as
    # SSA values across the entire T x L loop — no scratch round-trips, no
    # per-step ref reads. Mirrors dot_latency_probe's dep_lstm (95-99% of
    # peak) but with the real 4-layer structure.
    def values_kernel(x_ref, w0_ref, wr_ref, h_last_ref, *, with_cell):
        w0 = w0_ref[:].astype(jnp.bfloat16)
        wrs = [wr_ref[l][:, :].astype(jnp.bfloat16) for l in range(L - 1)]
        zero = jnp.zeros((B, H), jnp.bfloat16)
        hs = [zero] * L
        cs = [jnp.zeros((B, H), jnp.float32)] * L
        for t in range(T):
            nxt = x_ref[t].astype(jnp.bfloat16)
            for l in range(L):
                xh = jnp.concatenate([nxt, hs[l]], axis=1)
                gates = jnp.dot(
                    xh, w0 if l == 0 else wrs[l - 1],
                    preferred_element_type=jnp.float32,
                )
                if with_cell:
                    i = 1.0 / (1.0 + jnp.exp(-gates[:, :H]))
                    f = 1.0 / (1.0 + jnp.exp(-gates[:, H:2 * H]))
                    g = jnp.tanh(gates[:, 2 * H:3 * H])
                    o = 1.0 / (1.0 + jnp.exp(-gates[:, 3 * H:]))
                    c = f * cs[l] + i * g
                    h = o * jnp.tanh(c)
                    cs[l] = c
                else:
                    h = gates[:, :H]
                hs[l] = h.astype(jnp.bfloat16)
                nxt = hs[l]
        h_last_ref[:] = hs[-1].astype(jnp.float32)

    def values_chain(with_cell):
        def run(xx, w0, wr):
            def link(carry, _):
                h = pl.pallas_call(
                    functools.partial(values_kernel, with_cell=with_cell),
                    out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=64 * 1024 * 1024
                    ),
                )(xx * (1.0 + 0.0 * carry), w0, wr)
                return h.mean(), None

            s, _ = jax.lax.scan(link, jnp.float32(0.0), None, length=K)
            return s

        fn = jax.jit(run)
        t0 = time.perf_counter()
        np.asarray(fn(x, wcat0, wcatr))
        print(
            f"[lstm-abl] values(cell={with_cell}) compiled "
            f"{time.perf_counter() - t0:.1f}s", file=sys.stderr,
        )

        def rep(fn=fn):
            np.asarray(fn(x, wcat0, wcatr))

        return rep

    # Latency vs issue-rate: (a) make the 4 per-step dots INDEPENDENT (all
    # read the same input, results XOR-folded only at the end) — if time
    # collapses, the dependent chain's fill/drain is the cost and wavefront
    # ordering is the fix; (b) scale B at fixed chain length — constant
    # time/step means latency-bound, linear means throughput-bound.
    def indep_kernel(x_ref, w0_ref, wr_ref, h_last_ref):
        w0 = w0_ref[:].astype(jnp.bfloat16)
        wrs = [wr_ref[l][:, :].astype(jnp.bfloat16) for l in range(L - 1)]
        acc = jnp.zeros((B, H), jnp.float32)
        zero_h = jnp.zeros((B, H), jnp.bfloat16)
        for t in range(T):
            inp = x_ref[t].astype(jnp.bfloat16)
            xh = jnp.concatenate([inp, zero_h], axis=1)
            xh2 = jnp.concatenate([inp[:, :H], zero_h], axis=1)  # [B, 2H]
            g0 = jnp.dot(xh, w0, preferred_element_type=jnp.float32)
            gs = [
                jnp.dot(xh2, wrs[l], preferred_element_type=jnp.float32)
                for l in range(L - 1)
            ]
            acc = acc + g0[:, :H]
            for g in gs:
                acc = acc + g[:, :H]
        h_last_ref[:] = acc

    def indep_chain():
        def run(xx, w0, wr):
            def link(carry, _):
                h = pl.pallas_call(
                    indep_kernel,
                    out_shape=jax.ShapeDtypeStruct((B, H), jnp.float32),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=64 * 1024 * 1024
                    ),
                )(xx * (1.0 + 0.0 * carry), w0, wr)
                return h.mean(), None

            s, _ = jax.lax.scan(link, jnp.float32(0.0), None, length=K)
            return s

        fn = jax.jit(run)
        t0 = time.perf_counter()
        np.asarray(fn(x, wcat0, wcatr))
        print(f"[lstm-abl] indep compiled {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        def rep(fn=fn):
            np.asarray(fn(x, wcat0, wcatr))

        return rep

    def values_chain_b(bb):
        xb = jnp.asarray(
            rng.normal(size=(T, bb, C)).astype(np.float32), jnp.bfloat16
        )

        def kern(x_ref, w0_ref, wr_ref, h_last_ref):
            w0 = w0_ref[:].astype(jnp.bfloat16)
            wrs = [wr_ref[l][:, :].astype(jnp.bfloat16) for l in range(L - 1)]
            hs = [jnp.zeros((bb, H), jnp.bfloat16)] * L
            for t in range(T):
                nxt = x_ref[t].astype(jnp.bfloat16)
                for l in range(L):
                    xh = jnp.concatenate([nxt, hs[l]], axis=1)
                    gates = jnp.dot(
                        xh, w0 if l == 0 else wrs[l - 1],
                        preferred_element_type=jnp.float32,
                    )
                    hs[l] = gates[:, :H].astype(jnp.bfloat16)
                    nxt = hs[l]
            h_last_ref[:] = hs[-1].astype(jnp.float32)

        def run(xx, w0, wr):
            def link(carry, _):
                h = pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((bb, H), jnp.float32),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=96 * 1024 * 1024
                    ),
                )(xx * (1.0 + 0.0 * carry), w0, wr)
                return h.mean(), None

            s, _ = jax.lax.scan(link, jnp.float32(0.0), None, length=K)
            return s

        fn = jax.jit(run)
        t0 = time.perf_counter()
        np.asarray(fn(xb, wcat0, wcatr))
        print(f"[lstm-abl] values_b{bb} compiled "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

        def rep(fn=fn):
            np.asarray(fn(xb, wcat0, wcatr))

        return rep

    # dot_latency_probe's dep_lstm replica at B=512, same dot count per
    # call (96): h shape-preserved, no concat, no per-layer weights — the
    # variant that measured 95-99% of peak in ITS window. In-window
    # comparison settles whether that number was window-flattered or the
    # glue (concat/multi-weight/slicing) is the real cost.
    def dep_replica():
        w = jnp.asarray(
            rng.normal(size=(C + H, 4 * H)).astype(np.float32) * 0.05,
            jnp.bfloat16,
        )
        h0 = jnp.asarray(
            rng.normal(size=(B, 4 * H)).astype(np.float32), jnp.bfloat16
        )

        def kern(w_ref, h_ref, o_ref):
            hh = h_ref[:]
            ww = w_ref[:]
            for _ in range(T * L):
                hh = (
                    jax.lax.dot(
                        hh[:, : ww.shape[0]], ww,
                        preferred_element_type=jnp.float32,
                    )
                    * 2.0
                ).astype(hh.dtype)
            o_ref[:] = hh

        def run(w, h0):
            def link(carry, _):
                o = pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((B, 4 * H), jnp.bfloat16),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=64 * 1024 * 1024
                    ),
                )(w * (1.0 + 0.0 * carry), h0)
                return o.astype(jnp.float32).mean(), None

            s, _ = jax.lax.scan(link, jnp.float32(0.0), None, length=K)
            return s

        fn = jax.jit(run)
        t0 = time.perf_counter()
        np.asarray(fn(w, h0))
        print(f"[lstm-abl] dep_replica compiled "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

        def rep(fn=fn):
            np.asarray(fn(w, h0))

        return rep

    # Per-call fixed cost vs per-dot slope, in-window: an (almost) empty
    # kernel in the same chain structure, and the dep chain at 4x depth.
    def fixed_cost_arm(n_dots):
        w = jnp.asarray(
            rng.normal(size=(C + H, 4 * H)).astype(np.float32) * 0.05,
            jnp.bfloat16,
        )
        h0 = jnp.asarray(
            rng.normal(size=(B, 4 * H)).astype(np.float32), jnp.bfloat16
        )

        def kern(w_ref, h_ref, o_ref):
            hh = h_ref[:]
            ww = w_ref[:]
            for _ in range(n_dots):
                hh = (
                    jax.lax.dot(
                        hh[:, : ww.shape[0]], ww,
                        preferred_element_type=jnp.float32,
                    )
                    * 2.0
                ).astype(hh.dtype)
            o_ref[:] = hh

        def run(w, h0):
            def link(carry, _):
                o = pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((B, 4 * H), jnp.bfloat16),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=64 * 1024 * 1024
                    ),
                )(w * (1.0 + 0.0 * carry), h0)
                return o.astype(jnp.float32).mean(), None

            s, _ = jax.lax.scan(link, jnp.float32(0.0), None, length=K)
            return s

        fn = jax.jit(run)
        t0 = time.perf_counter()
        np.asarray(fn(w, h0))
        print(f"[lstm-abl] dots{n_dots} compiled "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

        def rep(fn=fn):
            np.asarray(fn(w, h0))

        return rep

    arms = {
        "dots0": fixed_cost_arm(0),
        "dots96": fixed_cost_arm(96),
        "dots384": fixed_cost_arm(384),
        "values_nocell": values_chain(False),
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
