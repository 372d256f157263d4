"""Where do the LSTM stack's second-order milliseconds go?

so_decomp_probe.json put the LSTM SO unit at 9.7 ms/iter — ~80% of SO
step time — and the jvp-of-grad transpose bought ~1%. This probe breaks
the unit into its autodiff constituents on the twice-differentiable XLA
route (the route the Hessian transpose actually runs, train/so_grad.py),
all interleaved in one TPU window with a dispatch-floor arm:

  fwd        — loss forward                                  (~1 F)
  grad       — FO reverse gradient                           (~3 F)
  jvp        — forward directional derivative along ct       (~2 F)
  rof        — HVP as grad(p ↦ jvp(loss)(p; ct))             (~6 F)
  for2       — HVP as jvp(grad(loss))(p; ct)                 (~6 F)
  rof_eval   — rof with train=False (no dropout masks): does
               recomputed mask generation hide in the HVP?
  unit       — the production SO unit (inner grad + custom-VJP rof
               transpose + query grad through the SGD step), cf.
               so_decomp_probe's lstm_hvp arm.
  floor      — near-empty dispatch (subtracted from every arm).

F := one forward's FLOPs. Ratios to `grad` tell us whether the HVP is
FLOP-bound (rof/grad ≈ 2) or structurally mis-scheduled (≫ 2).

Output: benchmarks/so_lstm_probe.json.
Run: cd /root/repo && python benchmarks/so_lstm_probe.py
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

ITERS = 30
INNER_LR = 0.01
BF16_PEAK = 197e12


def main(rounds: int = 8) -> int:
    import jax
    import jax.numpy as jnp

    from _interleave import run_interleaved
    from bench import build_bench_inputs
    from weatherforecast_stgcn_maml_tpu.models.lstm import apply_lstm
    from weatherforecast_stgcn_maml_tpu.train.optimizers import (
        clip_global_norm_tree,
    )
    from weatherforecast_stgcn_maml_tpu.train.so_grad import make_so_grad
    from weatherforecast_stgcn_maml_tpu.utils.prng import make_key

    state, _step, tasks, graph, model_cfg, meta_cfg = build_bench_inputs(
        quick=False, dtype="bfloat16", second_order=True
    )
    params = state.params["lstm"]
    n = graph.padded_nodes
    key = make_key(1, meta_cfg.rng_impl)
    rng_np = np.random.default_rng(0)
    x2 = jnp.asarray(
        rng_np.normal(
            size=(2, n, model_cfg.window, model_cfg.hidden_channels)
        ).astype(np.float32),
        jnp.bfloat16,
    )
    print(
        f"[so-lstm] hidden={model_cfg.hidden_channels} "
        f"lstm_hidden={model_cfg.lstm_hidden} layers={model_cfg.lstm_layers} "
        f"window={model_cfg.window} rows/task={n}",
        file=sys.stderr,
    )

    def make_loss(train: bool, wavefront: bool = False):
        def loss(lp):
            def per_task(x1):
                if wavefront:
                    from weatherforecast_stgcn_maml_tpu.models.lstm import (
                        apply_lstm_wavefront,
                    )

                    out = apply_lstm_wavefront(
                        lp, x1, dropout_rate=model_cfg.lstm_dropout,
                        train=train, rng=key, compute_dtype=jnp.bfloat16,
                        unroll=model_cfg.lstm_unroll,
                    )
                else:
                    out = apply_lstm(
                        lp, x1, dropout_rate=model_cfg.lstm_dropout,
                        train=train, rng=key, compute_dtype=jnp.bfloat16,
                        unroll=model_cfg.lstm_unroll, kernel="xla",
                    )
                return jnp.mean(out.astype(jnp.float32) ** 2)

            return jax.vmap(per_task)(x2).mean()

        return loss

    loss = make_loss(True)
    # A fixed, param-shaped tangent direction (the incoming cotangent in
    # the real SO backward) — deterministic, non-degenerate.
    ct = jax.tree.map(
        lambda p: (jnp.cos(jnp.arange(p.size, dtype=jnp.float32) * 0.37)
                   .reshape(p.shape) * 0.01).astype(p.dtype),
        params,
    )

    def jvp_t(p, loss_fn=loss):
        _, t = jax.jvp(loss_fn, (p,), (ct,))
        return t

    def rof(p, loss_fn=loss):
        return jax.grad(lambda q: jvp_t(q, loss_fn))(p)

    def for2(p):
        _, hv = jax.jvp(jax.grad(loss), (p,), (ct,))
        return hv

    # Production SO unit: grad through (one clipped inner-SGD step + loss)
    # with the inner gradient's transpose rerouted to the rof HVP, like
    # train/so_grad.py does at the meta step.
    g_op = make_so_grad(
        lambda p, aux, r: loss(p), lambda p, aux, r: loss(p), "rof"
    )

    def unit(p):
        def adapted_loss(p0):
            g = g_op(p0, (), key)
            g, _ = clip_global_norm_tree(g, meta_cfg.clip_norm)
            p1 = jax.tree.map(lambda a, b: a - INNER_LR * b, p0, g)
            return loss(p1)

        return jax.grad(adapted_loss)(p)

    compiled = {}

    def add(name, body, scalar_out: bool):
        def chain(p):
            def step(p, _):
                out = body(p)
                if scalar_out:
                    p = jax.tree.map(lambda a: a * (1.0 + 1e-12 * out), p)
                else:
                    p = jax.tree.map(lambda a, b: a - 1e-9 * b, p, out)
                return p, None

            p, _ = jax.lax.scan(step, p, None, length=ITERS)
            return jax.tree.leaves(p)[0].astype(jnp.float32).sum()

        jfn = jax.jit(chain)
        t0 = time.perf_counter()
        np.asarray(jfn(params))
        print(f"[so-lstm] {name} compiled {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        def rep(jfn=jfn):
            np.asarray(jfn(params))

        compiled[name] = rep

    add("fwd", loss, True)
    add("grad", jax.grad(loss), False)
    add("jvp", jvp_t, True)
    add("rof", rof, False)
    add("for2", for2, False)
    add("rof_eval", lambda p: rof(p, make_loss(False)), False)
    add("unit", unit, False)
    # Wavefront formulation (apply_lstm_wavefront): identical FLOPs, 3.5x
    # less sequential depth (T+L-1 vs T*L recurrent dots), pure XLA and
    # twice-differentiable. If its rof beats the layerwise rof, the diff2
    # route should run it (with layerwise-equivalent explicit masks).
    loss_wf = make_loss(True, wavefront=True)
    add("fwd_wf", loss_wf, True)
    add("grad_wf", jax.grad(loss_wf), False)
    add("rof_wf", lambda p: rof(p, loss_wf), False)

    def floor_fn(c):
        return (c * 1.000001).astype(jnp.float32).sum()

    jfl = jax.jit(floor_fn)
    z = jnp.zeros((8, 128), jnp.float32)
    np.asarray(jfl(z))
    compiled["floor"] = lambda: np.asarray(jfl(z))

    timed = run_interleaved(compiled, rounds, "so-lstm")
    best = {k: timed[k]["best_ms"] for k in timed}
    fl = best["floor"]
    per_iter = {k: (best[k] - fl) / ITERS for k in best if k != "floor"}
    ratios = {k: per_iter[k] / per_iter["fwd"] for k in per_iter}
    report = {
        "backend": jax.default_backend(),
        "nodes": int(n),
        "iters": ITERS,
        "raw": timed,
        "best_ms": best,
        "per_iter_ms": per_iter,
        "ratio_to_fwd": ratios,
        "dispatch_floor_ms": fl,
    }
    for k in sorted(per_iter):
        print(
            f"[so-lstm] {k}: {per_iter[k]:.3f} ms/iter "
            f"({ratios[k]:.2f}x fwd)",
            file=sys.stderr,
        )
    with open(os.path.join(SELF_DIR, "so_lstm_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
