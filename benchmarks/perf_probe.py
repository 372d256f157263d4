"""Component-level timing probe for the MAML meta step on TPU.

The meta step at reference scale is ~8% MFU against the bf16 FLOP floor
(bench.py). jax.profiler hangs through the axon tunnel and single-dispatch
timings bottom out at the tunnel's ~30 ms dispatch floor, so every probe
here runs its component in an IN-GRAPH `lax.scan` chain of `--iters`
sequentially-dependent steps inside one jit — exactly how the real inner
loop executes — and reports device time per step. Numbers are comparable
within one run/window only (CLAUDE.md contention caveat).

Probes:
  * the real inner-SGD scan (grad + clip + update), per inner step
  * variants: dropout off, no grad clip, f32 vs bf16
  * encoder-only and LSTM-only gradient chains at the same shapes
  * GCN aggregation layouts: batched einsum vs single flattened matmul
  * full meta step (the bench headline) for cross-checking

Usage: python benchmarks/perf_probe.py [--dtype bfloat16] [--iters 90]
Writes benchmarks/perf_probe_last.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, reps=5):
    fn()  # compile + warmup
    fn()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=90)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--full-step", action="store_true",
                    help="also time the full meta step (slow compile)")
    args = ap.parse_args(argv)

    from weatherforecast_stgcn_maml_tpu.config import (
        DataConfig,
        MetaConfig,
        ModelConfig,
    )
    from weatherforecast_stgcn_maml_tpu.data.synthetic import synthetic_region_for_box
    from weatherforecast_stgcn_maml_tpu.models.common import accum_dtype
    from weatherforecast_stgcn_maml_tpu.models.losses import masked_mse
    from weatherforecast_stgcn_maml_tpu.models.lstm import apply_lstm
    from weatherforecast_stgcn_maml_tpu.models.registry import apply_model
    from weatherforecast_stgcn_maml_tpu.models.stgcn import apply_encoder
    from weatherforecast_stgcn_maml_tpu.train.maml import (
        init_meta_state,
        make_jit_meta_step,
    )
    from weatherforecast_stgcn_maml_tpu.train.optimizers import clip_global_norm_tree
    from weatherforecast_stgcn_maml_tpu.train.tasks import build_meta_tasks, stack_tasks

    model_cfg = ModelConfig(compute_dtype=args.dtype)
    meta_cfg = MetaConfig()
    boxes = [(10.0 + 6 * i, 15.0 + 6 * i, 20.0, 25.0) for i in range(4)]
    regions = [
        synthetic_region_for_box(b, num_timesteps=160, seed=i)
        for i, b in enumerate(boxes)
    ]
    built = build_meta_tasks(regions, model_cfg, meta_cfg, DataConfig())
    # Device-stage once: numpy tasks would re-ship ~140 MB per timed step
    # through the tunnel (see bench.py build_bench_inputs).
    tasks = jax.tree.map(jnp.asarray, stack_tasks([b.task for b in built]))
    state = init_meta_state(jax.random.key(0), model_cfg, meta_cfg)
    per = meta_cfg.meta_batch // meta_cfg.grad_accum  # vmap width of a micro step
    micro = jax.tree.map(lambda x: jnp.asarray(x[:per]), tasks)
    iters = args.iters
    out = {
        "backend": jax.default_backend(), "dtype": args.dtype,
        "iters": iters, "vmap_tasks": per,
    }
    _log(f"[probe] backend={jax.default_backend()} dtype={args.dtype} iters={iters}")

    def record(label, seconds_total):
        ms = seconds_total / iters * 1e3
        out[label + "_ms_per_iter"] = ms
        _log(f"[probe] {label}: {ms:.2f} ms/iter")

    # ---- the real inner-SGD chain (per task, vmapped over `per` tasks) ----
    def make_inner_chain(train, clip, cfg=model_cfg):
        def support_loss(p, task, idx, rng):
            x = task.support_x[idx]
            y = task.support_y[idx]
            preds = apply_model(
                p, task.a_hat, x, task.koppen, cfg,
                train=train, rng=rng if train else None,
            )
            return masked_mse(preds, y, task.node_mask)

        def one_task(task, rng, p):
            n_support = task.support_x.shape[0]

            def body(pc, s):
                g = jax.grad(support_loss)(
                    pc, task, jnp.mod(s, n_support), jax.random.fold_in(rng, s)
                )
                if clip:
                    g, _ = clip_global_norm_tree(g, 1.0)
                return jax.tree.map(lambda a, b: a - 0.01 * b, pc, g), None

            pa, _ = jax.lax.scan(body, p, jnp.arange(iters))
            return pa

        return jax.jit(jax.vmap(one_task, in_axes=(0, 0, None)))

    from weatherforecast_stgcn_maml_tpu.utils.prng import make_key

    # Production rng impl (rbg by default) — threefry mask generation was
    # a measured ~70 ms/meta-step cost (benchmarks/rng_impl_probe.json).
    rngs = jax.random.split(make_key(2, meta_cfg.rng_impl), per)

    for label, train, clip in [
        ("inner_sgd", True, True),
        ("inner_sgd_nodrop", False, True),
        ("inner_sgd_noclip", True, False),
    ]:
        chain = make_inner_chain(train, clip)

        def run():
            pa = chain(micro, rngs, state.params)
            np.asarray(jax.tree.leaves(pa)[0])

        record(label, timeit(run, args.reps))

    # f32 comparison of the full chain
    cfg_f32 = dataclasses.replace(model_cfg, compute_dtype="float32")
    chain32 = make_inner_chain(True, True, cfg_f32)

    def run32():
        pa = chain32(micro, rngs, state.params)
        np.asarray(jax.tree.leaves(pa)[0])

    record("inner_sgd_f32", timeit(run32, args.reps))

    # ---- encoder-only gradient chain at inner shapes ----
    x_enc = jnp.concatenate(
        [
            micro.support_x[:, 0],
            jnp.zeros(
                (*micro.support_x[:, 0].shape[:-1], model_cfg.koppen_dim),
                micro.support_x.dtype,
            ),
        ],
        axis=-1,
    )  # [per, W, N, 24]

    def enc_loss(p, x, a, mask):
        h = apply_encoder(p, a, x, model_cfg, train=False)
        # Mask the node axis (repo rule: never reduce over nodes unmasked).
        se = (h.astype(jnp.float32) ** 2) * mask[None, :, None]  # h: [W,N,Ch]
        return se.sum() / (mask.sum() * h.shape[0] * h.shape[-1])

    def enc_chain(x, a, mask, p):
        def body(pc, _):
            g = jax.grad(enc_loss)(pc, x, a, mask)
            return jax.tree.map(lambda u, v: u - 0.01 * v, pc, g), None

        pa, _ = jax.lax.scan(body, p, None, length=iters)
        return pa

    enc_fn = jax.jit(jax.vmap(enc_chain, in_axes=(0, 0, 0, None)))

    def run_enc():
        g = enc_fn(x_enc, micro.a_hat, micro.node_mask, state.params["encoder"])
        np.asarray(jax.tree.leaves(g)[0])

    record("encoder_grad", timeit(run_enc, args.reps))

    # ---- LSTM-only gradient chain ----
    n = micro.a_hat.shape[-1]
    h_lstm = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (per, n, model_cfg.window, model_cfg.hidden_channels)
        ),
        jnp.float32,
    )
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    for unroll, kern in ((1, "xla"), (6, "xla"), (model_cfg.window, "xla"),
                         (model_cfg.window, "auto")):

        def lstm_loss(p, h, u=unroll, k=kern):
            o = apply_lstm(p, h, train=False, compute_dtype=dt, unroll=u, kernel=k)
            return (o.astype(jnp.float32) ** 2).mean()

        def lstm_chain(h, p, loss=lstm_loss):
            def body(pc, _):
                g = jax.grad(loss)(pc, h)
                return jax.tree.map(lambda u, v: u - 0.01 * v, pc, g), None

            pa, _ = jax.lax.scan(body, p, None, length=iters)
            return pa

        lstm_fn = jax.jit(jax.vmap(lstm_chain, in_axes=(0, None)))

        def run_lstm():
            g = lstm_fn(h_lstm, state.params["lstm"])
            np.asarray(jax.tree.leaves(g)[0])

        label = (f"lstm_grad_unroll{unroll}" if kern == "xla"
                 else "lstm_grad_stack_kernel")
        record(label, timeit(run_lstm, args.reps))

    # ---- GCN aggregation layouts (fwd-only chains) ----
    acc = accum_dtype(dt)
    a2 = micro.a_hat.astype(dt)  # [per, N, N]
    h0 = x_enc.astype(dt)  # [per, W, N, 24]
    w_mat = jnp.asarray(
        np.random.default_rng(1).standard_normal((24, model_cfg.hidden_channels)),
        dt,
    )

    def agg_einsum(a, hw):
        return jnp.einsum("nm,wmc->wnc", a, hw, preferred_element_type=acc)

    def agg_flat(a, hw):
        w_, n_, c_ = hw.shape
        flat = jnp.transpose(hw, (1, 0, 2)).reshape(n_, w_ * c_)
        mixed = jnp.dot(a, flat, preferred_element_type=acc)
        return jnp.transpose(mixed.reshape(n_, w_, c_), (1, 0, 2))

    for label, agg in [("gcn_agg_einsum", agg_einsum), ("gcn_agg_flat", agg_flat)]:

        def layer_chain(a, h):
            def body(hc, _):
                hw = jnp.dot(hc, w_mat[: hc.shape[-1]], preferred_element_type=acc)
                o = agg(a, hw.astype(dt))
                o = o / (jnp.max(jnp.abs(o)) + 1e-3)  # keep values bounded
                return o.astype(dt)[..., : hc.shape[-1]], None

            hN, _ = jax.lax.scan(body, h, None, length=iters)
            return hN

        fn = jax.jit(jax.vmap(layer_chain))

        def run_agg():
            np.asarray(fn(a2, h0))

        record(label, timeit(run_agg, args.reps))

    # ---- full meta step cross-check ----
    if args.full_step:
        step = make_jit_meta_step(model_cfg, meta_cfg)
        st = jax.tree.map(jnp.array, state)

        def run_step():
            nonlocal st
            st, m = step(st, tasks, jax.random.key(1))
            float(np.asarray(m["meta_loss"]))

        t = timeit(run_step, max(2, args.reps // 2))
        out["meta_step_s"] = t
        _log(f"[probe] full meta step: {t * 1e3:.0f} ms")

    path = os.path.join(os.path.dirname(__file__), "perf_probe_last.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
