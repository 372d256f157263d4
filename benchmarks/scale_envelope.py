"""Scale envelope — training-step MFU as the spatial graph grows.

The reference tops out at ~441-node regions (5-degree boxes,
dataLoader.py:6-12). This framework is designed for production scale-out:
dense-adjacency graph conv rides the MXU, so MFU should RISE with node
count (bigger matmuls amortize the LSTM's small recurrent steps), until
HBM, not dispatch, is the limit. This study measures the supervised
training step (the adapt engine's hot path, train/supervised.py) at
growing padded node counts on one chip and reports time, derived FLOPs,
and MFU against the chip's bf16 peak.

FLOPs come from XLA cost analysis of a SINGLE train step — valid because
the LSTM time scan is fully unrolled (model.lstm_unroll=0), so nothing is
undercounted (the round-1 roofline bug documented in
bench.py:flops_per_meta_step does not apply). Each timed dispatch then
chains CHAIN_STEPS optimizer steps in one in-graph lax.scan: a single
step per dispatch would be dominated by the tunnel's ~30 ms dispatch
floor (discovered when a batch-2 run "measured" 31 ms/step at every N).

Contention discipline: arms are timed interleaved round-robin; per-arm
best over all rounds. Output: benchmarks/scale_envelope.json.

Run: cd /root/repo && python benchmarks/scale_envelope.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))


CHAIN_STEPS = 10  # optimizer steps per timed dispatch (amortizes dispatch)


def build_arm(n_nodes: int, batch: int, model_cfg, rng_impl: str = "default"):
    import jax
    import jax.numpy as jnp
    import optax

    from weatherforecast_stgcn_maml_tpu.models.losses import masked_mse
    from weatherforecast_stgcn_maml_tpu.models.registry import init_model
    from weatherforecast_stgcn_maml_tpu.train.supervised import batched_forward
    from weatherforecast_stgcn_maml_tpu.utils.prng import make_key

    rng = np.random.default_rng(n_nodes)
    w, c = model_cfg.window, model_cfg.feature_channels
    x = jnp.asarray(rng.normal(size=(batch, w, n_nodes, c)), jnp.float32)
    y = jnp.asarray(
        rng.normal(size=(batch, model_cfg.horizon, n_nodes, model_cfg.num_weather_vars)),
        jnp.float32,
    )
    a = rng.uniform(size=(n_nodes, n_nodes)).astype(np.float32)
    a_hat = jnp.asarray(a / a.sum(axis=1, keepdims=True))
    mask = jnp.ones((n_nodes,), jnp.float32)
    koppen = jnp.int32(8)
    params = init_model(jax.random.key(0), model_cfg)
    tx = optax.adam(5e-4)
    opt_state = tx.init(params)

    # Inputs ride as jit ARGUMENTS, not closures: a closed-over array is
    # embedded as an HLO literal, and the 8192-node adjacency alone
    # (268 MB f32) exceeds the axon remote-compile request limit (HTTP 413).
    data = jax.device_put((x, y, a_hat, mask))

    def one_step(params, opt_state, step_rng, data):
        xd, yd, ad, md = data

        def loss_fn(p):
            preds = batched_forward(
                p, ad, xd, koppen, model_cfg, train=True, rng=step_rng
            )
            return masked_mse(preds, yd, md)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def _train_step(params, opt_state, rng, data):
        def body(carry, step_rng):
            p, o = carry
            p, o, loss = one_step(p, o, step_rng, data)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jax.random.split(rng, CHAIN_STEPS)
        )
        return params, opt_state, losses[-1]

    def train_step(params, opt_state, rng):
        return _train_step(params, opt_state, rng, data)

    lowered = jax.jit(one_step).lower(
        params, opt_state, jax.random.key(1), data
    )
    flops = float((lowered.cost_analysis() or {}).get("flops", 0.0))
    if flops <= 0.0:  # axon backend has no client-side cost analysis
        from bench import _analytic_inner_flops

        flops = batch * _analytic_inner_flops(model_cfg, n_nodes)
    return {
        "step": train_step, "params": params, "opt_state": opt_state,
        "make_key": lambda seed: make_key(seed, rng_impl),
        "flops": flops, "nodes": n_nodes, "batch": batch, "times": [],
    }


def main(
    node_counts=(512, 1024, 2048),
    batch: int = 8,
    rounds: int = 8,
    out_name: str = "scale_envelope.json",
    rng_impl: str = "default",
) -> int:
    import jax

    from weatherforecast_stgcn_maml_tpu.config import ModelConfig

    sys.path.insert(0, SELF_DIR)
    from bench import _bf16_peak_flops  # same peak table as the headline bench

    model_cfg = ModelConfig(compute_dtype="bfloat16")
    peak = _bf16_peak_flops() if jax.default_backend() == "tpu" else None

    arms = []
    for n in node_counts:
        t0 = time.perf_counter()
        arm = build_arm(n, batch, model_cfg, rng_impl)
        arm["params"], arm["opt_state"], loss = arm["step"](
            arm["params"], arm["opt_state"], arm["make_key"](2)
        )
        float(np.asarray(loss))
        print(
            f"[scale] N={n}: compiled+first-step {time.perf_counter() - t0:.1f}s, "
            f"{arm['flops']:.3e} FLOPs/step",
            file=sys.stderr,
        )
        arms.append(arm)

    from _interleave import run_interleaved

    def make_rep(arm):
        counter = [0]

        def rep():
            counter[0] += 1
            arm["params"], arm["opt_state"], loss = arm["step"](
                arm["params"], arm["opt_state"], arm["make_key"](10 + counter[0])
            )
            float(np.asarray(loss))  # forced fetch (CLAUDE.md timing rule)

        return rep

    # Dispatch-floor arm: a near-empty jitted dispatch in the same window.
    # Each timed rep pays the tunnel's dispatch+fetch cost ONCE regardless
    # of chain depth (measured 22-25 ms — comparable to a whole 512-node
    # 10-step chain), so per-step numbers divide it in. The production
    # engines compile WHOLE EPOCHS into one dispatch (engines/adapt.py),
    # amortizing it over 50-200+ steps; the floor-corrected column is the
    # honest hardware envelope (round-4 methodology fix).
    import jax.numpy as jnp

    zf = jax.jit(lambda c: (c * 1.000001).astype(jnp.float32).sum())
    zx = jnp.zeros((8, 128), jnp.float32)
    float(np.asarray(zf(zx)))

    def floor_rep():
        float(np.asarray(zf(zx)))

    reps = {f"N={a['nodes']}": make_rep(a) for a in arms}
    reps["floor"] = floor_rep
    timed = run_interleaved(reps, rounds, "scale")
    floor_ms = timed["floor"]["best_ms"]
    out = {
        "batch_windows": batch, "dtype": "bfloat16", "rng_impl": rng_impl,
        "chain_steps_per_dispatch": CHAIN_STEPS,
        "dispatch_floor_ms": floor_ms, "arms": [],
    }
    for a in arms:
        t = timed[f"N={a['nodes']}"]
        best = t["best_ms"] / 1e3 / CHAIN_STEPS  # per optimizer step
        best_corr = max(t["best_ms"] - floor_ms, 1e-9) / 1e3 / CHAIN_STEPS
        entry = {
            "nodes": a["nodes"],
            "flops_per_step": a["flops"],
            "best_ms": best * 1e3,
            "best_ms_floor_corrected": best_corr * 1e3,
            "median_ms": t["median_ms"] / CHAIN_STEPS,
            "windows_per_sec": a["batch"] / best,
        }
        if peak:
            entry["mfu_vs_bf16_peak"] = a["flops"] / best / peak
            entry["mfu_floor_corrected"] = a["flops"] / best_corr / peak
        out["arms"].append(entry)
    with open(os.path.join(SELF_DIR, out_name), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, nargs="+", default=[512, 1024, 2048])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--out", default="scale_envelope.json")
    ap.add_argument(
        "--rng-impl", default="default",
        help="PRNG impl for training keys: 'default' (threefry, the "
             "historical envelope methodology) or 'rbg' (the production "
             "engines' default — mask generation off the VPU threefry "
             "path; see utils/prng.py)",
    )
    a = ap.parse_args()
    sys.exit(
        main(
            node_counts=tuple(a.nodes), batch=a.batch, rounds=a.rounds,
            out_name=a.out, rng_impl=a.rng_impl,
        )
    )
