"""Same-window decomposition of the reference-scale meta step.

Prior component probes ran in DIFFERENT TPU windows: gcn_block_probe's
encoder grad (1.14 ms/iter) plus pipe_chain_probe's LSTM grad (1.28 ms/iter
at b1024) already exceed the whole measured step (269 ms best / 182
sequential vmapped iters = 1.48 ms/iter), so cross-window numbers cannot
attribute the remaining 1.5x to the 179 ms FLOP floor (VERDICT r3 item 1).
This probe times every component interleaved round-robin in ONE window:

  meta       — the full bench meta step (meta_batch 4, grad_accum 2:
               2 sequential micro-updates x vmap-2 x (90 inner + 1 query)).
  micrograd  — ONE micro-update's value_and_grad (vmap-2 over 2 tasks,
               90 inner steps + query), no optimizer math. ~ meta/2.
  adaptfwd   — vmap-2 adapt_and_query_loss forward only. FOMAML's outer
               grad adds only the query bwd, so micrograd - adaptfwd
               isolates the outer-grad cost.
  enc90      — 90 chained vmap-2 encoder grads (train mode, fused kernels,
               exactly the inner step's encoder fwd+bwd work).
  lstm90     — 90 chained vmap-2 LSTM-stack grads at the hybrid's LSTM
               shape ([512 nodes, 24 steps, 256 ch] per task).
  sgd90      — 90 chained clip+SGD param-tree updates (non-matmul math on
               the ~860K-param tree that sits on the dependent chain).

Per-iter matmul FLOP floors at 512 padded nodes, vmap 2, bf16 197 TFLOP/s
peak: full inner fwd+bwd 0.99 ms (GCN 0.55, LSTM 0.44, head ~0.0004).

Output: benchmarks/meta_component_probe.json.
Run: cd /root/repo && python benchmarks/meta_component_probe.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))
sys.path.insert(0, SELF_DIR)

ITERS = 90  # inner steps per task — the meta step's sequential hot loop


def main(rounds: int = 8) -> int:
    import time

    import jax
    import jax.numpy as jnp

    from _interleave import run_interleaved
    from bench import build_bench_inputs
    from weatherforecast_stgcn_maml_tpu.models.lstm import apply_lstm
    from weatherforecast_stgcn_maml_tpu.models.stgcn import apply_encoder
    from weatherforecast_stgcn_maml_tpu.train.maml import adapt_and_query_loss
    from weatherforecast_stgcn_maml_tpu.train.optimizers import (
        clip_global_norm_tree,
    )
    from weatherforecast_stgcn_maml_tpu.utils.prng import make_key

    state, step, tasks, graph, model_cfg, meta_cfg = build_bench_inputs(
        quick=False, dtype="bfloat16"
    )
    params = state.params
    n = graph.padded_nodes
    key = make_key(1, meta_cfg.rng_impl)
    t2 = jax.tree.map(lambda x: x[:2], tasks)
    rngs2 = jax.random.split(key, 2)

    compiled = {}

    def add(name, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        print(f"[meta-comp] {name} compiled {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        def rep(fn=fn, args=args):
            np.asarray(jax.tree.leaves(fn(*args))[0])

        compiled[name] = rep

    # --- meta: the full step (state donated in bench; keep it undonated
    # here so repeated reps reuse the same state buffer). -------------------
    from weatherforecast_stgcn_maml_tpu.train.maml import make_meta_step

    plain_step = jax.jit(make_meta_step(model_cfg, meta_cfg))
    add("meta", lambda s, t, k: plain_step(s, t, k)[1]["meta_loss"],
        state, tasks, key)

    # --- micrograd / adaptfwd ----------------------------------------------
    def mean_loss(p, tt, rr):
        losses = jax.vmap(
            lambda t, r: adapt_and_query_loss(p, t, r, model_cfg, meta_cfg)
        )(tt, rr)
        return losses.mean()

    add("micrograd",
        jax.jit(lambda p, tt, rr: jax.tree.leaves(
            jax.grad(mean_loss)(p, tt, rr))[0].astype(jnp.float32).sum()),
        params, t2, rngs2)
    add("adaptfwd", jax.jit(mean_loss), params, t2, rngs2)

    # --- enc90: the inner step's encoder fwd+bwd, chained -------------------
    a_hat2 = t2.a_hat  # [2, N, N]
    rng_np = np.random.default_rng(0)
    # The encoder's real input is features + broadcast Koppen embedding
    # (in_channels = 24), not the raw 16-channel support tensor.
    x_in2 = jnp.asarray(
        rng_np.normal(
            size=(2, model_cfg.window, n, model_cfg.in_channels)
        ).astype(np.float32)
    )

    def enc_chain(enc, aa, xx, k0):
        def body(e, k):
            def per_task(a1, x1):
                def loss(ee):
                    out = apply_encoder(
                        ee, a1, x1, model_cfg, train=True, rng=k,
                        use_pallas=True,
                    )
                    return jnp.sum(out.astype(jnp.float32) ** 2)

                return jax.grad(loss)(e)

            g = jax.vmap(per_task)(aa, xx)
            g = jax.tree.map(lambda v: v.mean(0), g)
            return jax.tree.map(lambda p_, g_: p_ - 1e-9 * g_, e, g), None

        keys = jax.vmap(lambda i: jax.random.fold_in(k0, i))(
            jnp.arange(ITERS)
        )
        e, _ = jax.lax.scan(body, enc, keys)
        return jax.tree.leaves(e)[0].astype(jnp.float32).sum()

    add("enc90", jax.jit(enc_chain), params["encoder"], a_hat2, x_in2, key)

    # --- lstm90: the inner step's LSTM fwd+bwd, chained ----------------------
    xl2 = jnp.asarray(
        rng_np.normal(size=(2, n, model_cfg.window, model_cfg.hidden_channels))
        .astype(np.float32),
        jnp.bfloat16,
    )

    def lstm_chain(lp, xx, k0):
        def body(p, k):
            def per_task(x1, k1):
                def loss(pp):
                    out = apply_lstm(
                        pp, x1, dropout_rate=model_cfg.lstm_dropout,
                        train=True, rng=k1, compute_dtype=jnp.bfloat16,
                        unroll=model_cfg.lstm_unroll,
                        kernel=model_cfg.lstm_kernel,
                    )
                    return jnp.sum(out.astype(jnp.float32) ** 2)

                return jax.grad(loss)(p)

            g = jax.vmap(per_task)(xx, jax.random.split(k, 2))
            g = jax.tree.map(lambda v: v.mean(0), g)
            return jax.tree.map(lambda p_, g_: p_ - 1e-9 * g_, p, g), None

        keys = jax.vmap(lambda i: jax.random.fold_in(k0, i))(
            jnp.arange(ITERS)
        )
        p, _ = jax.lax.scan(body, lp, keys)
        return jax.tree.leaves(p)[0].astype(jnp.float32).sum()

    add("lstm90", jax.jit(lstm_chain), params["lstm"], xl2, key)

    # --- floor: near-empty dispatch of the same chain structure — the
    # tunnel dispatch+fetch cost that every arm pays ONCE per rep. All
    # per-iter attributions subtract it (the round-4 ablation probes were
    # initially read without it: a 40-link chain of EMPTY kernels measured
    # 21.9 ms, i.e. ~90% of several arms' total).
    def floor_fn(c):
        return (c * 1.000001).astype(jnp.float32).sum()

    add("floor", jax.jit(floor_fn), jnp.zeros((8, 128), jnp.float32))

    # --- sgd90: clip + update math on the param tree ------------------------
    def sgd_chain(p):
        def body(pp, _):
            g = jax.tree.map(lambda a: a * 1e-6, pp)
            g, _n = clip_global_norm_tree(g, meta_cfg.clip_norm)
            pp = jax.tree.map(
                lambda a, b: a - meta_cfg.inner_lr * b, pp, g
            )
            return pp, None

        p, _ = jax.lax.scan(body, p, None, length=ITERS)
        return jax.tree.leaves(p)[0].astype(jnp.float32).sum()

    add("sgd90", jax.jit(sgd_chain), params)

    timed = run_interleaved(compiled, rounds, "meta-comp")

    best = {k: timed[k]["best_ms"] for k in timed}
    fl = best["floor"]
    # Attribution at per-inner-iter granularity (vmap-2 shapes), the
    # per-dispatch tunnel floor subtracted from every arm.
    per_iter = {
        "inner_total": (best["micrograd"] - fl) / (ITERS + 1),
        "adaptfwd": (best["adaptfwd"] - fl) / (ITERS + 1),
        "enc_grad": (best["enc90"] - fl) / ITERS,
        "lstm_grad": (best["lstm90"] - fl) / ITERS,
        "sgd_math": (best["sgd90"] - fl) / ITERS,
        "outer_grad_extra_ms": best["micrograd"] - best["adaptfwd"],
        "meta_minus_2micro_ms": best["meta"] - 2 * best["micrograd"] + fl,
        "dispatch_floor_ms": fl,
    }
    floors_ms = {
        "inner_total": 0.99, "enc_grad": 0.55, "lstm_grad": 0.44,
    }
    report = {
        "backend": jax.default_backend(),
        "nodes": int(n),
        "iters": ITERS,
        "raw": timed,
        "best_ms": best,
        "per_iter_ms": per_iter,
        "per_iter_floor_ms_bf16": floors_ms,
    }
    for k, v in best.items():
        print(f"[meta-comp] {k}: best {v:.2f} ms", file=sys.stderr)

    with open(os.path.join(SELF_DIR, "meta_component_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
