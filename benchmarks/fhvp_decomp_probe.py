"""Post-fhvp SO decomposition: where does the remaining SO time go?

Round-4's fused Hessian transpose (so_impl="fhvp") took the SO meta step
from 2.40 to 1.23 s (59% MFU vs the 712 ms cost-analyzed floor,
benchmarks/last_so_run.json). This probe attributes the REMAINING gap by
timing the per-inner-iter units of the production SO step, all interleaved
in ONE TPU window with an explicit dispatch-floor arm (CLAUDE.md
methodology):

  fo_grad   — vmap-2-task fused first-order inner gradient (the unit the
              custom_vjp fwd runs, and the recompute each bwd step pays
              under so_remat="step").
  fhvp      — vmap-2-task jvp(grad_loss_fused)(p; ct): the fused HVP unit
              so_grad's bwd evaluates per inner step (R-operator kernels on
              the LSTM segment, XLA encoder/head glue).
  hvp_xla   — the same HVP on the twice-differentiable XLA copy (the
              "hvp"/"rof"-route unit) for the before/after at unit level.
  enc_hvp   — encoder-only XLA HVP unit: the GCN share *inside* fhvp (the
              fused composition runs the encoder on the layerwise XLA
              route — train/so_fused.py `pre`).
  lstm_rfwd — jvp of the stack fwd_op alone (tangent-forward R-kernel) at
              production shape, vmap-2.
  lstm_rbwd — jvp of the stack bwd_op composition (tangent-of-backward
              R-kernel) at production shape, vmap-2.
  floor     — near-empty dispatch (subtracted from every arm).

Per-arm FLOPs for the model-level arms come from cost-analyzing the XLA
equivalent of ONE unit (pallas calls are opaque to cost analysis, so the
fused arms reuse their XLA twin's count — same math, tests/test_so_fused.py).

Output: benchmarks/fhvp_decomp_probe.json.
Run: cd /root/repo && python benchmarks/fhvp_decomp_probe.py
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

ITERS = 30
BF16_PEAK = 197e12


def main(rounds: int = 8) -> int:
    import time

    import jax
    import jax.numpy as jnp

    from _interleave import run_interleaved
    from bench import build_bench_inputs
    from weatherforecast_stgcn_maml_tpu.models.common import lstm_bias
    from weatherforecast_stgcn_maml_tpu.models.losses import masked_mse
    from weatherforecast_stgcn_maml_tpu.models.registry import apply_model
    from weatherforecast_stgcn_maml_tpu.models.stgcn import apply_encoder
    from weatherforecast_stgcn_maml_tpu.ops.fused_lstm_hvp import hvp_stack_ops
    from weatherforecast_stgcn_maml_tpu.train.so_fused import (
        make_grad_loss_fused,
    )
    from weatherforecast_stgcn_maml_tpu.utils.prng import make_key

    state, _, tasks, graph, model_cfg, meta_cfg = build_bench_inputs(
        quick=False, dtype="bfloat16", second_order=True
    )
    params = state.params
    n = graph.padded_nodes
    key = make_key(1, meta_cfg.rng_impl)
    t2 = jax.tree.map(lambda x: x[:2], tasks)
    aux2 = (
        t2.support_x[:, 0],
        t2.support_y[:, 0],
        t2.a_hat,
        t2.koppen,
        t2.node_mask,
    )

    # The XLA pins the production meta step applies for the
    # twice-differentiable copy (train/maml.py:106).
    model_cfg_x = dataclasses.replace(
        model_cfg, lstm_kernel="xla", use_pallas_gcn=False,
        use_pallas_lstm=False,
    )

    def _loss_on(mc):
        def loss(p, aux, step_rng):
            xb, yb, a_hat, koppen, node_mask = aux
            preds = apply_model(
                p, a_hat, xb, koppen, mc, train=True, rng=step_rng
            )
            return masked_mse(preds, yb, node_mask)

        return loss

    loss_fast = _loss_on(model_cfg)
    loss_x = _loss_on(model_cfg_x)
    fused_grad = make_grad_loss_fused(model_cfg, loss_x)

    ct = jax.tree.map(
        lambda p: jnp.asarray(
            np.random.default_rng(3).normal(size=p.shape) * 1e-2, p.dtype
        ),
        params,
    )

    compiled = {}
    flops_one = {}

    def _cost_one(fn, *args) -> float:
        # The axon remote backend has no client-side cost analysis (returns
        # {}), so lower the XLA-twin body for CPU — lowering is shape-only.
        with jax.default_device(jax.devices("cpu")[0]):
            an = jax.jit(fn).lower(*args).cost_analysis() or {}
        return float(an.get("flops", 0.0))

    def add(name, fn, *args, body=None, body_args=None):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jfn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        print(f"[fhvp-decomp] {name} compiled {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        if body is not None:
            flops_one[name] = _cost_one(body, *body_args)

        def rep(jfn=jfn, args=args):
            np.asarray(jax.tree.leaves(jfn(*args))[0])

        compiled[name] = rep

    def chain_of(unit):
        """ITERS-scan a p -> p unit and reduce to one scalar fetch."""

        def chain(p):
            def body(p, i):
                return unit(p, i), None

            p, _ = jax.lax.scan(body, p, jnp.arange(ITERS))
            return jax.tree.leaves(p)[0].astype(jnp.float32).sum()

        return chain

    def hvp_unit_of(grad_fn):
        def unit(p, i):
            k = jax.random.fold_in(key, i)
            hv2 = jax.vmap(
                lambda aux: jax.jvp(
                    lambda q: grad_fn(q, aux, k), (p,), (ct,)
                )[1]
            )(aux2)
            return jax.tree.map(
                lambda a, b: a - 1e-9 * b.mean(0).astype(a.dtype), p, hv2
            )

        return unit

    # --- model-level arms ----------------------------------------------------
    def fo_unit(p, i):
        k = jax.random.fold_in(key, i)
        g2 = jax.vmap(
            lambda aux: jax.grad(loss_fast)(p, aux, k)
        )(aux2)
        return jax.tree.map(
            lambda a, b: a - 1e-9 * b.mean(0).astype(a.dtype), p, g2
        )

    def fo_unit_x(p, i):
        k = jax.random.fold_in(key, i)
        g2 = jax.vmap(lambda aux: jax.grad(loss_x)(p, aux, k))(aux2)
        return jax.tree.map(
            lambda a, b: a - 1e-9 * b.mean(0).astype(a.dtype), p, g2
        )

    add("fo_grad", chain_of(fo_unit), params,
        body=fo_unit_x, body_args=(params, jnp.int32(0)))
    add("fhvp", chain_of(hvp_unit_of(fused_grad)), params,
        body=hvp_unit_of(lambda q, aux, k: jax.grad(loss_x)(q, aux, k)),
        body_args=(params, jnp.int32(0)))
    add("hvp_xla",
        chain_of(hvp_unit_of(lambda q, aux, k: jax.grad(loss_x)(q, aux, k))),
        params,
        body=hvp_unit_of(lambda q, aux, k: jax.grad(loss_x)(q, aux, k)),
        body_args=(params, jnp.int32(0)))

    # --- encoder-only HVP unit (the GCN share inside fhvp) -------------------
    rng_np = np.random.default_rng(0)
    x_in2 = jnp.asarray(
        rng_np.normal(size=(2, model_cfg.window, n, model_cfg.in_channels))
        .astype(np.float32)
    )
    ct_enc = ct["encoder"]

    def enc_loss(e, a1, x1):
        out = apply_encoder(
            e, a1, x1, model_cfg, train=True, rng=key, final_dropout=False,
            use_pallas=False,
        )
        return jnp.mean(out.astype(jnp.float32) ** 2)

    def enc_unit(e, i):
        hv2 = jax.vmap(
            lambda a1, x1: jax.jvp(
                lambda q: jax.grad(enc_loss)(q, a1, x1), (e,), (ct_enc,)
            )[1]
        )(t2.a_hat, x_in2)
        return jax.tree.map(
            lambda a, b: a - 1e-9 * b.mean(0).astype(a.dtype), e, hv2
        )

    add("enc_hvp", chain_of(enc_unit), params["encoder"],
        body=enc_unit, body_args=(params["encoder"], jnp.int32(0)))

    # --- isolated R-kernel arms (production stack shape, vmap-2) -------------
    hidden = model_cfg.lstm_hidden
    n_layers = model_cfg.lstm_layers
    keep = 1.0 - model_cfg.lstm_dropout
    w = model_cfg.window
    dt = jnp.bfloat16
    layers = params["lstm"]["layers"]
    wcat0 = jnp.concatenate(
        [layers[0]["wx"], layers[0]["wh"]], axis=0
    ).astype(dt)
    wcatr = jnp.stack([
        jnp.concatenate([layers[l]["wx"], layers[l]["wh"]], axis=0)
        for l in range(1, n_layers)
    ]).astype(dt)
    b2d = jnp.stack(
        [lstm_bias(layers[l]) for l in range(n_layers)]
    ).astype(dt)
    x_tbc2 = jnp.asarray(
        rng_np.normal(size=(2, w, n, model_cfg.hidden_channels)), dt
    )
    masks2 = jnp.asarray(
        (rng_np.uniform(size=(2, n_layers - 1, w, n, hidden)) < keep)
        .astype(np.int8)
    )
    g2 = jnp.asarray(rng_np.normal(size=(2, n, hidden)), dt)
    fwd_op, bwd_op = hvp_stack_ops(jnp.dtype(dt).name, False, keep, True)
    tw0, twr, tb2 = (
        jnp.asarray(rng_np.normal(size=a.shape) * 1e-2, a.dtype)
        for a in (wcat0, wcatr, b2d)
    )

    def rfwd_unit(x2, i):
        def one(x1, m1):
            (h_last, _, _), (th_last, _, _) = jax.jvp(
                lambda xx, w0, wr, bb: fwd_op(xx, w0, wr, bb, m1),
                (x1, wcat0, wcatr, b2d),
                (jnp.zeros_like(x1), tw0, twr, tb2),
            )
            return h_last + th_last

        out = jax.vmap(one)(x2, masks2)  # [2, N, hidden]
        upd = jnp.zeros_like(x2).at[:, 0, :, : out.shape[-1]].set(
            out.astype(x2.dtype)
        )
        return x2 + 1e-9 * upd

    add("lstm_rfwd", chain_of(rfwd_unit), x_tbc2)

    def rbwd_unit(x2, i):
        def one(x1, m1, g1):
            def grads(w0, wr, bb):
                _, h_all, c_all = fwd_op(x1, w0, wr, bb, m1)
                dx, dw0, dwr, db = bwd_op(
                    g1, x1, h_all, c_all, w0, wr, bb, m1
                )
                return dx

            _, tdx = jax.jvp(grads, (wcat0, wcatr, b2d), (tw0, twr, tb2))
            return tdx

        out = jax.vmap(one)(x2, masks2, g2)
        return x2 + 1e-9 * out.astype(x2.dtype)

    add("lstm_rbwd", chain_of(rbwd_unit), x_tbc2)

    # --- floor -----------------------------------------------------------------
    def floor_fn(c):
        return (c * 1.000001).astype(jnp.float32).sum()

    add("floor", floor_fn, jnp.zeros((8, 128), jnp.float32))

    timed = run_interleaved(compiled, rounds, "fhvp-decomp")

    best = {k: timed[k]["best_ms"] for k in timed}
    fl = best["floor"]
    per_iter = {k: (best[k] - fl) / ITERS for k in best if k != "floor"}
    mfu = {
        k: (flops_one[k] / BF16_PEAK * 1e3) / per_iter[k]
        for k in flops_one
        if per_iter.get(k)
    }
    report = {
        "backend": jax.default_backend(),
        "nodes": int(n),
        "iters": ITERS,
        "so_impl_default": meta_cfg.so_impl,
        "raw": timed,
        "best_ms": best,
        "per_iter_ms": per_iter,
        "flops_per_iter": flops_one,
        "mfu_floor_corrected": mfu,
        "dispatch_floor_ms": fl,
    }
    for k in sorted(per_iter):
        m = f" mfu={mfu[k] * 100:.1f}%" if k in mfu else ""
        print(f"[fhvp-decomp] {k}: {per_iter[k]:.3f} ms/iter{m}",
              file=sys.stderr)

    with open(os.path.join(SELF_DIR, "fhvp_decomp_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
