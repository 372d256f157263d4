"""Decompose the 4096-node supervised train step (scale_envelope's 37.4%
MFU arm) into encoder-grad / LSTM-grad / full-step components.

At 4096 padded nodes the fused training kernels' unchunked VMEM gates
close (dense adjacency alone is 67 MB f32), so round 3 originally ran the
layerwise XLA path and MFU dropped from ~52% (2048, kernels on) to 37.4%.
This probe localized where that XLA-path time went: NOT the adjacency
dots ([4096,4096]@[4096,256] ~ 8.6 GFLOP each runs near peak — enc_fwd
measured ~81% MFU) but the wide-batch LSTM scan (B = batch*N = 32768
rows), measured 165 ms/step against a ~14 ms FLOP floor — HBM-bound
elementwise traffic XLA streams between every tiny recurrent dot. The
probe's findings drove two fixes, both measured here:

  * rbg training keys (the production engines' default) take the encoder
    grad 152 -> 119 ms — threefry mask generation is a real cost at
    [24, 4096, 256] mask shapes (--rng-impl arms).
  * batch-CHUNKED fused-stack routing (ops/fused_lstm_stack.py
    stack_chunk_size / lstm_stack_last_all_chunked): rows are independent,
    so the kernel runs in gate-passing b/2^k chunks — LSTM grad
    165.3 -> 35.4 ms (4.7x), full step 328.6 -> 149.4 ms
    (37.4% -> ~80% MFU).

Arms (interleaved round-robin, one in-graph lax.scan chain per dispatch,
forced value fetch per rep — CLAUDE.md timing discipline):
  full          — value_and_grad of the masked-MSE supervised loss + adam
                  update (the envelope's exact step), chain 3
  enc_grad      — grad chain through the per-window encoder stack alone,
                  chain 6
  lstm_grad     — grad chain through the stacked LSTM alone at [N, W, 256]
                  rows x batch windows (the hybrid's exact LSTM workload),
                  production kernel routing (auto -> chunked), chain 6
  lstm_grad_xla — same workload forced onto the XLA scan (the A/B)
  enc_fwd       — encoder forward only (train=False -> eval GCN kernel
                  gate also closed at this size, pure XLA), chain 6

Reference workload: hybrid_model.py:60-117 scaled to 4096-node regions.
Output: benchmarks/large_node_decomp_probe[_rbg].json.
Run: cd /root/repo && python benchmarks/large_node_decomp_probe.py
     [--rng-impl rbg]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))
sys.path.insert(0, SELF_DIR)


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument(
        "--rng-impl", default="default",
        help="PRNG impl for the training keys: 'default' (threefry) or "
             "'rbg' (the production engines' default, utils/prng.py)",
    )
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from weatherforecast_stgcn_maml_tpu.config import ModelConfig
    from weatherforecast_stgcn_maml_tpu.models.hybrid import init_hybrid
    from weatherforecast_stgcn_maml_tpu.models.losses import masked_mse
    from weatherforecast_stgcn_maml_tpu.models.lstm import apply_lstm
    from weatherforecast_stgcn_maml_tpu.models.stgcn import apply_encoder
    from weatherforecast_stgcn_maml_tpu.train.supervised import batched_forward
    from weatherforecast_stgcn_maml_tpu.utils.prng import make_key

    if jax.default_backend() != "tpu":
        _log("needs the TPU backend (axon)")
        return 1

    n, b = args.nodes, args.batch
    cfg = ModelConfig(compute_dtype=args.dtype)
    w = cfg.window
    c_feat = cfg.feature_channels  # 16: model input (12 weather + 4 time)
    c_enc = cfg.in_channels  # 24: encoder input (weather+time+koppen)
    hid, lh = cfg.hidden_channels, cfg.lstm_hidden

    rng = np.random.default_rng(0)
    params = init_hybrid(jax.random.key(0), cfg)
    a = rng.uniform(size=(n, n)).astype(np.float32)
    a_hat = jnp.asarray(a / a.sum(axis=1, keepdims=True))
    x_full = jnp.asarray(rng.normal(size=(b, w, n, c_feat)), jnp.float32)
    y_full = jnp.asarray(
        rng.normal(size=(b, cfg.horizon, n, cfg.num_weather_vars)), jnp.float32
    )
    x_enc = jnp.asarray(rng.normal(size=(b, w, n, c_enc)), jnp.float32)
    x_lstm = jnp.asarray(rng.normal(size=(b, n, w, hid)), jnp.float32)
    mask = jnp.ones((n,), jnp.float32)
    koppen = jnp.int32(8)
    tx = optax.adam(5e-4)
    opt_state = tx.init(params)

    def chain(step_fn, init_carry, k, data):
        """jit an in-graph scan of k dependent steps.

        `data` (the big input arrays) is passed as a jit ARGUMENT: closing
        over it would embed it as an HLO literal, and the 805 MB x_lstm
        constant exceeds the axon remote-compile request limit (HTTP 413).
        """

        @jax.jit
        def run(carry, key, data):
            def body(c, kk):
                return step_fn(c, kk, data), None

            out, _ = jax.lax.scan(body, carry, jax.random.split(key, k))
            return out

        data = jax.device_put(data)
        return (lambda carry, key: run(carry, key, data)), init_carry

    # --- full supervised step (envelope-identical: grad + adam update) ---
    def full_step(carry, key, data):
        p, o = carry
        xf, yf, ah = data

        def loss_fn(pp):
            preds = batched_forward(pp, ah, xf, koppen, cfg,
                                    train=True, rng=key)
            return masked_mse(preds, yf, mask)

        _, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o)
        return optax.apply_updates(p, updates), o

    # --- encoder-only gradient chain ---
    def enc_step(p_enc, key, data):
        xe, ah = data

        def loss_fn(pe):
            def one(xi, ri):
                h = apply_encoder(pe, ah, xi, cfg, train=True, rng=ri)
                return jnp.sum((h * mask[:, None]).astype(jnp.float32))

            rngs = jax.random.split(key, b)
            return jnp.sum(jax.vmap(one)(xe, rngs))

        g = jax.grad(loss_fn)(p_enc)
        return jax.tree.map(lambda a_, b_: a_ - 1e-6 * b_, p_enc, g)

    # --- LSTM-only gradient chain (nodes-as-batch, vmapped over windows) ---
    def make_lstm_step(kernel):
        def lstm_step(p_lstm, key, data):
            (xl,) = data

            def loss_fn(pl):
                def one(xi, ri):
                    h = apply_lstm(pl, xi, dropout_rate=cfg.lstm_dropout,
                                   train=True, rng=ri,
                                   compute_dtype=jnp.dtype(args.dtype),
                                   unroll=cfg.lstm_unroll, kernel=kernel)
                    return jnp.sum(h.astype(jnp.float32))

                rngs = jax.random.split(key, b)
                return jnp.sum(jax.vmap(one)(xl, rngs))

            g = jax.grad(loss_fn)(p_lstm)
            return jax.tree.map(lambda a_, b_: a_ - 1e-6 * b_, p_lstm, g)

        return lstm_step

    # --- encoder forward only ---
    def encfwd_step(h_carry, key, data):
        del key
        xe, ah = data

        def one(xi):
            return apply_encoder(params["encoder"], ah, xi, cfg,
                                 train=False)

        h = jax.vmap(one)(xe + h_carry[None, None, None, :])
        # tiny [c_enc] carry keeps the chained forwards data-dependent
        return jnp.mean(h, axis=(0, 1, 2))[:c_enc] * 1e-6

    arms = {
        "full": chain(full_step, (params, opt_state), 3,
                      (x_full, y_full, a_hat)) + (3,),
        "enc_grad": chain(enc_step, params["encoder"], 6,
                          (x_enc, a_hat)) + (6,),
        "lstm_grad": chain(make_lstm_step(cfg.lstm_kernel), params["lstm"], 6,
                           (x_lstm,)) + (6,),
        "lstm_grad_xla": chain(make_lstm_step("xla"), params["lstm"], 6,
                               (x_lstm,)) + (6,),
        "enc_fwd": chain(encfwd_step, jnp.zeros((c_enc,)), 6,
                         (x_enc, a_hat)) + (6,),
    }

    # compile + first run
    state = {}
    for name, (run, carry, k) in arms.items():
        t0 = time.perf_counter()
        carry = run(carry, make_key(1, args.rng_impl))
        np.asarray(jax.tree.leaves(carry)[0])  # forced fetch
        state[name] = carry
        _log(f"[decomp] {name}: compiled+first {time.perf_counter()-t0:.1f}s "
             f"(chain {k})")

    from _interleave import run_interleaved

    def make_rep(name):
        run, _, k = arms[name]
        counter = [0]

        def rep():
            counter[0] += 1
            state[name] = run(state[name], make_key(10 + counter[0], args.rng_impl))
            np.asarray(jax.tree.leaves(state[name])[0])

        return rep

    timed = run_interleaved({n_: make_rep(n_) for n_ in arms}, args.rounds,
                            "decomp")

    results = {}
    for name, (run, _, k) in arms.items():
        t = timed[name]
        per = [ms / k for ms in t["times_ms"]]
        results[name] = {
            "chain": k,
            "best_ms_per_step": min(per),
            "median_ms_per_step": float(np.median(per)),
            "times_ms_per_step": [round(v, 2) for v in per],
        }
        _log(f"[decomp] {name}: best {min(per):.1f} ms/step "
             f"median {np.median(per):.1f}")

    out = {
        "nodes": n, "batch": b, "dtype": args.dtype,
        "rng_impl": args.rng_impl,
        "results": results,
    }
    suffix = "" if args.rng_impl == "default" else f"_{args.rng_impl}"
    path = os.path.join(SELF_DIR, f"large_node_decomp_probe{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    _log(f"[decomp] wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
