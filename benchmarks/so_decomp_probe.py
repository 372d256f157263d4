"""Second-order MAML step decomposition + the symmetric-Hessian transpose A/B.

The SO meta step (2.38 s, benchmarks/so_chunk_probe.json) runs the
twice-differentiable XLA route — the same route whose FO step the fused
kernels took from 645 to 260 ms. This probe attributes SO time to the
encoder vs the LSTM stack and A/Bs one structural alternative, all
interleaved in ONE TPU window with an explicit dispatch-floor arm
(round-4 methodology, CLAUDE.md):

  hyb_so    — ITERS chained grad-of-(one clipped inner-SGD step + query
              loss) on the FULL hybrid (vmap-2 tasks) — the SO meta
              step's per-inner-iter unit (fwd A + transpose B).
  enc_so    — same body, encoder params/loss only.
  lstm_so   — same body, LSTM stack only (hybrid's [N, W, 256] shape).
  lstm_hvp  — lstm_so with the inner gradient wrapped in a custom VJP
              whose transpose is the FORWARD-over-reverse Hessian-vector
              product jvp(grad)(p; ct) (valid because the Hessian of a
              scalar loss is symmetric: (dg/dp)^T ct = H ct). Same FLOPs
              asymptotically; the A/B asks whether XLA schedules the
              jvp-of-grad better than the transpose-of-grad scan.
  hyb_hvp   — the HVP transpose on the full hybrid body.
  floor     — near-empty dispatch (subtracted from every arm).

Per-arm FLOPs come from cost-analyzing ONE body application, so each arm
reports its own floor-corrected MFU.

Output: benchmarks/so_decomp_probe.json.
Run: cd /root/repo && python benchmarks/so_decomp_probe.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))
sys.path.insert(0, SELF_DIR)

ITERS = 30  # chained SO iterations per arm (compile-time bounded)
INNER_LR = 0.01
BF16_PEAK = 197e12


def _hvp_grad(loss_fn):
    """grad(loss_fn) with a symmetric-Hessian (jvp-of-grad) transpose."""
    import jax

    @jax.custom_vjp
    def g_op(p):
        return jax.grad(loss_fn)(p)

    def fwd(p):
        return jax.grad(loss_fn)(p), p

    def bwd(p, ct):
        _, hv = jax.jvp(jax.grad(loss_fn), (p,), (ct,))
        return (hv,)

    g_op.defvjp(fwd, bwd)
    return g_op


def main(rounds: int = 8) -> int:
    import time

    import jax
    import jax.numpy as jnp

    from _interleave import run_interleaved
    from bench import build_bench_inputs
    from weatherforecast_stgcn_maml_tpu.models.lstm import apply_lstm
    from weatherforecast_stgcn_maml_tpu.models.stgcn import apply_encoder
    from weatherforecast_stgcn_maml_tpu.models.registry import apply_model
    from weatherforecast_stgcn_maml_tpu.models.losses import masked_mse
    from weatherforecast_stgcn_maml_tpu.train.optimizers import (
        clip_global_norm_tree,
    )
    from weatherforecast_stgcn_maml_tpu.utils.prng import make_key

    state, step, tasks, graph, model_cfg, meta_cfg = build_bench_inputs(
        quick=False, dtype="bfloat16", second_order=True
    )
    # The SO route the meta step actually runs: pure XLA (train/maml.py).
    model_cfg = dataclasses.replace(
        model_cfg, lstm_kernel="xla", use_pallas_gcn=False, use_pallas_lstm=False
    )
    params = state.params
    n = graph.padded_nodes
    key = make_key(1, meta_cfg.rng_impl)
    t2 = jax.tree.map(lambda x: x[:2], tasks)

    compiled = {}
    flops_one = {}

    def _cost_one(fn, *args) -> float:
        an = jax.jit(fn).lower(*args).cost_analysis() or {}
        return float(an.get("flops", 0.0))

    def add(name, fn, *args, body=None, body_args=None):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jfn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        print(f"[so-decomp] {name} compiled {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        if body is not None:
            flops_one[name] = _cost_one(body, *body_args)

        def rep(jfn=jfn, args=args):
            np.asarray(jax.tree.leaves(jfn(*args))[0])

        compiled[name] = rep

    def so_chain_builder(loss_fn, hvp: bool):
        """ITERS-chained SO unit: grad through (clipped SGD step + loss)."""
        grad_of = _hvp_grad(loss_fn) if hvp else jax.grad(loss_fn)

        def so_unit(p, k):
            def adapted_loss(p0):
                g = grad_of(p0)
                g, _ = clip_global_norm_tree(g, meta_cfg.clip_norm)
                p1 = jax.tree.map(lambda a, b: a - INNER_LR * b, p0, g)
                return loss_fn(p1)

            return jax.grad(adapted_loss)(p)

        def chain(p, k0):
            def body(p, k):
                gg = so_unit(p, k)
                p = jax.tree.map(lambda a, b: a - 1e-9 * b, p, gg)
                return p, None

            keys = jax.vmap(lambda i: jax.random.fold_in(k0, i))(
                jnp.arange(ITERS)
            )
            p, _ = jax.lax.scan(body, p, keys)
            return jax.tree.leaves(p)[0].astype(jnp.float32).sum()

        return chain, so_unit

    # --- full hybrid: vmap-2 tasks, real support batch + masked MSE --------
    def hyb_loss(p):
        def per_task(t1):
            preds = apply_model(
                p, t1.a_hat, t1.support_x[0], t1.koppen, model_cfg,
                train=True, rng=key,
            )
            return masked_mse(preds, t1.support_y[0], t1.node_mask)

        return jax.vmap(per_task)(t2).mean()

    for nm, hv in (("hyb_so", False), ("hyb_hvp", True)):
        chain, unit = so_chain_builder(lambda p: hyb_loss(p), hv)
        add(nm, chain, params, key, body=unit, body_args=(params, key))

    # --- encoder only -------------------------------------------------------
    rng_np = np.random.default_rng(0)
    x_in2 = jnp.asarray(
        rng_np.normal(size=(2, model_cfg.window, n, model_cfg.in_channels))
        .astype(np.float32)
    )

    def enc_loss(e):
        def per_task(a1, x1):
            out = apply_encoder(
                e, a1, x1, model_cfg, train=True, rng=key, use_pallas=False
            )
            return jnp.mean(out.astype(jnp.float32) ** 2)

        return jax.vmap(per_task)(t2.a_hat, x_in2).mean()

    chain, unit = so_chain_builder(enc_loss, False)
    add("enc_so", chain, params["encoder"], key,
        body=unit, body_args=(params["encoder"], key))

    # --- LSTM stack only ----------------------------------------------------
    xl2 = jnp.asarray(
        rng_np.normal(size=(2, n, model_cfg.window, model_cfg.hidden_channels))
        .astype(np.float32),
        jnp.bfloat16,
    )

    def lstm_loss(lp):
        def per_task(x1):
            out = apply_lstm(
                lp, x1, dropout_rate=model_cfg.lstm_dropout, train=True,
                rng=key, compute_dtype=jnp.bfloat16,
                unroll=model_cfg.lstm_unroll, kernel="xla",
            )
            return jnp.mean(out.astype(jnp.float32) ** 2)

        return jax.vmap(per_task)(xl2).mean()

    for nm, hv in (("lstm_so", False), ("lstm_hvp", True)):
        chain, unit = so_chain_builder(lstm_loss, hv)
        add(nm, chain, params["lstm"], key,
            body=unit, body_args=(params["lstm"], key))

    # --- floor ---------------------------------------------------------------
    def floor_fn(c):
        return (c * 1.000001).astype(jnp.float32).sum()

    add("floor", floor_fn, jnp.zeros((8, 128), jnp.float32))

    timed = run_interleaved(compiled, rounds, "so-decomp")

    best = {k: timed[k]["best_ms"] for k in timed}
    fl = best["floor"]
    per_iter = {
        k: (best[k] - fl) / ITERS for k in best if k != "floor"
    }
    mfu = {
        k: (flops_one[k] / BF16_PEAK * 1e3) / per_iter[k]
        for k in flops_one
        if per_iter.get(k)
    }
    report = {
        "backend": jax.default_backend(),
        "nodes": int(n),
        "iters": ITERS,
        "raw": timed,
        "best_ms": best,
        "per_iter_ms": per_iter,
        "flops_per_iter": flops_one,
        "mfu_floor_corrected": mfu,
        "dispatch_floor_ms": fl,
    }
    for k in sorted(per_iter):
        m = f" mfu={mfu[k] * 100:.1f}%" if k in mfu else ""
        print(f"[so-decomp] {k}: {per_iter[k]:.3f} ms/iter{m}", file=sys.stderr)

    with open(os.path.join(SELF_DIR, "so_decomp_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
