"""Benchmark harness — MAML meta-training throughput at reference scale.

Headline metric (BASELINE.json): MAML meta-steps/sec, where one meta step is
one full reference meta-epoch workload — 4 tasks x (6 inner epochs x 15
support batches + 1 query batch) with grad-accum-2 AdamW outer updates — on
the reference architecture (441-node region padded to 512, window 24 ->
horizon 8, GCN hidden 256, LSTM 128x4, ~860K params).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

`vs_baseline` compares against the measured PyTorch reference-equivalent
workload (benchmarks/baseline_torch.json; re-measure with --baseline). The
reference itself publishes no numbers (BASELINE.md), and the only torch
device in this image is the host CPU — the baseline JSON records exactly
what was measured and how.

Extra modes (details go to stderr / side files, never the JSON line):
  --baseline    re-measure the torch baseline and rewrite the JSON
  --kernels     compare Pallas fused GCN vs XLA on this backend
  --quick       tiny shapes (smoke test)
  --dtype bf16  run the bench with bfloat16 compute
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _log(*args):
    print(*args, file=sys.stderr, flush=True)


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


BASELINE_PATH = os.path.join(os.path.dirname(__file__), "benchmarks", "baseline_torch.json")


def _backend_watchdog(timeout_s: int = 300):
    """Guard the first device contact: the axon tunnel has been observed
    HANGING INDEFINITELY inside device enumeration (whole-pool outages,
    round 3). A hung bench produces no artifact at all; this emits an
    honest error line on the driver's JSON contract and exits instead.
    Call `.set()` on the returned event once the backend answered."""
    import threading

    done = threading.Event()

    def check():
        if not done.wait(timeout_s):
            print(json.dumps({
                "metric": "meta_steps_per_sec", "value": 0.0,
                "unit": "steps/s", "vs_baseline": 0.0,
                "error": f"backend init did not complete in {timeout_s}s "
                         "(TPU tunnel unreachable)",
            }), flush=True)
            os._exit(3)

    threading.Thread(target=check, name="wf-backend-watchdog", daemon=True).start()
    return done


def build_bench_inputs(quick: bool, dtype: str, second_order: bool = False):
    import jax
    import numpy as np

    from weatherforecast_stgcn_maml_tpu.config import (
        DataConfig,
        MetaConfig,
        ModelConfig,
    )
    from weatherforecast_stgcn_maml_tpu.data.synthetic import synthetic_region_for_box
    from weatherforecast_stgcn_maml_tpu.train.maml import (
        init_meta_state,
        make_jit_meta_step,
    )
    from weatherforecast_stgcn_maml_tpu.train.tasks import build_meta_tasks, stack_tasks

    if quick:
        model_cfg = ModelConfig(
            hidden_channels=32, gcn_layers=2, lstm_hidden=16, lstm_layers=2,
            window=8, horizon=4, compute_dtype=dtype,
        )
        meta_cfg = MetaConfig(
            meta_batch=2, grad_accum=1, inner_epochs=1, inner_batches=3,
            second_order=second_order,
        )
        boxes = [(10.0 + i, 10.75 + i, 20.0, 20.75) for i in range(2)]
        t = 64
    else:
        model_cfg = ModelConfig(compute_dtype=dtype)  # reference scale
        meta_cfg = MetaConfig(second_order=second_order)  # 4 tasks, 6x15 inner, grad-accum 2
        # 5-degree boxes at 0.25 deg -> 21x21 = 441 nodes, like the
        # reference's meta-training regions (BASELINE.md data scale).
        boxes = [(10.0 + 6 * i, 15.0 + 6 * i, 20.0, 25.0) for i in range(4)]
        t = 160  # enough for 15 support + query windows

    regions = [
        synthetic_region_for_box(b, num_timesteps=t, seed=i)
        for i, b in enumerate(boxes)
    ]
    built = build_meta_tasks(regions, model_cfg, meta_cfg, DataConfig())
    # Stage the task batch ON DEVICE once, like engines/meta_train.py's
    # device-staged task pool. Host (numpy) tasks would re-ship ~140 MB of
    # support/query tensors through the tunnel EVERY timed step, inflating
    # the measured step by ~1 s (the round-2 bench-vs-e2e gap: bench best
    # 1.8 s while the engine ran the same step 0.72 s steady).
    import jax.numpy as jnp

    tasks = jax.tree.map(jnp.asarray, stack_tasks([b.task for b in built]))
    jax.block_until_ready(tasks)
    state = init_meta_state(jax.random.key(0), model_cfg, meta_cfg)
    step = make_jit_meta_step(model_cfg, meta_cfg)
    return state, step, tasks, built[0].graph, model_cfg, meta_cfg


# Peak dense-matmul throughput per chip, bf16 with f32 accumulation
# (public TPU spec sheets). Used only to derive a physical LOWER BOUND on
# step time — never a performance claim. f32 inputs also ride the MXU on
# TPU (default matmul precision), so the bf16 peak is a valid bound for
# both dtypes.
TPU_BF16_PEAK_FLOPS = {
    "v4": 275e12,
    "v5 lite": 197e12,  # v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v6": 918e12,  # Trillium
}


def _bf16_peak_flops() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, peak in TPU_BF16_PEAK_FLOPS.items():
        if key in kind:
            return peak
    return 197e12  # unknown TPU: assume v5e-class


def flops_per_meta_step(state, tasks, model_cfg, meta_cfg) -> float:
    """Physically-derived FLOPs of ONE meta step (FO or second-order).

    XLA's `cost_analysis` counts a `lax.scan` body ONCE regardless of trip
    count, so cost analysis of the full meta step undercounts ~100x (the
    round-1 roofline made exactly that mistake). Instead: cost-analyze a
    single inner SGD gradient step, then multiply by the real trip counts —
    meta_batch tasks x (inner_epochs x S support steps + Q query fwd/bwd,
    where a query grad costs about one inner grad).

    Second-order (VERDICT r3 item 2a): the SO meta-gradient additionally
    differentiates THROUGH every inner update. The inner scan's forward
    pass costs one inner update `A` per step; its backward pass costs one
    VJP-of-the-inner-update `B` per step — cost-analyzed directly from
    `jax.vjp(inner_update)`, whose lowering includes the per-step remat
    recompute (so_remat="step" recomputes the update's fwd+bwd inside the
    transpose, exactly what the lowered vjp contains). Total:
    batch x (steps x (A + B) + query grad-of-adapted ~ A).
    """
    import dataclasses

    import jax

    from weatherforecast_stgcn_maml_tpu.models.losses import masked_mse
    from weatherforecast_stgcn_maml_tpu.models.registry import apply_model
    from weatherforecast_stgcn_maml_tpu.train.optimizers import (
        clip_global_norm_tree,
    )

    if meta_cfg.second_order:
        # Mirror train/maml.py's SO rerouting: the cost model must lower
        # the same twice-differentiable XLA route the SO step actually
        # runs (and jax.vjp through a Pallas custom-VJP has no JVP rule).
        model_cfg = dataclasses.replace(
            model_cfg, lstm_kernel="xla", use_pallas_gcn=False,
            use_pallas_lstm=False,
        )

    task0 = jax.tree.map(lambda x: x[0], tasks)

    def support_loss(p, x, y, rng):
        preds = apply_model(
            p, task0.a_hat, x, task0.koppen, model_cfg, train=True, rng=rng
        )
        return masked_mse(preds, y, task0.node_mask)

    def one_inner_grad(p, rng):
        return jax.grad(support_loss)(
            p, task0.support_x[0], task0.support_y[0], rng
        )

    def _cost(fn, *args) -> float:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.cost_analysis() or {}
        return float(analysis.get("flops", 0.0))

    inner_flops = _cost(one_inner_grad, state.params, jax.random.key(0))
    if inner_flops <= 0.0:  # backend without client-side cost analysis
        inner_flops = _analytic_inner_flops(model_cfg, int(task0.a_hat.shape[0]))

    batch = int(tasks.support_x.shape[0])
    s = int(tasks.support_x.shape[1])
    steps = meta_cfg.inner_epochs * s
    q = min(meta_cfg.query_batches, int(tasks.query_x.shape[1]))
    if not meta_cfg.second_order:
        return batch * (steps + q) * inner_flops

    # SO: B = FLOPs of one VJP through the full inner update (grad + clip
    # + SGD step), evaluated the way the scan transpose evaluates it.
    def inner_update(p, rng):
        g = one_inner_grad(p, rng)
        g, _ = clip_global_norm_tree(g, meta_cfg.clip_norm)
        return jax.tree.map(lambda a, b: a - meta_cfg.inner_lr * b, p, g)

    def step_vjp(p, ct, rng):
        _, vjp = jax.vjp(lambda q: inner_update(q, rng), p)
        return vjp(ct)

    ct = jax.tree.map(jax.numpy.zeros_like, state.params)
    vjp_flops = _cost(step_vjp, state.params, ct, jax.random.key(0))
    if vjp_flops <= 0.0:
        # Fallback: an HVP-like transpose costs ~3x the first-order step
        # (recompute fwd+bwd, then transpose both) — standard grad-of-grad
        # cost ratio; used only when cost_analysis is unavailable.
        vjp_flops = 3.0 * inner_flops
    return batch * (steps * (inner_flops + vjp_flops) + q * inner_flops)


def _analytic_inner_flops(cfg, n: int) -> float:
    """Fallback matmul-FLOP estimate of one fwd+bwd inner step (bwd ~ 2x fwd)."""
    w, ch, lh = cfg.window, cfg.hidden_channels, cfg.lstm_hidden
    gcn = 0.0
    c_in = cfg.in_channels
    for _ in range(cfg.gcn_layers):
        gcn += w * (2.0 * n * c_in * ch + 2.0 * n * n * ch)
        c_in = ch
    lstm, inp = 0.0, ch
    for _ in range(cfg.lstm_layers):
        lstm += 2.0 * n * w * 4.0 * lh * (inp + lh)
        inp = lh
    head = 2.0 * n * lh * cfg.num_weather_vars * cfg.horizon
    return 3.0 * (gcn + lstm + head)


def bench_meta(quick: bool, dtype: str, reps: int, second_order: bool = False) -> dict:
    import jax
    import numpy as np

    reps = max(1, reps)

    from weatherforecast_stgcn_maml_tpu.utils.profiling import block_until_ready

    state, step, tasks, graph, model_cfg, meta_cfg = build_bench_inputs(
        quick, dtype, second_order
    )
    _log(
        f"[bench] backend={jax.default_backend()} devices={jax.devices()} "
        f"nodes={graph.num_nodes} (padded {graph.padded_nodes}) dtype={dtype}"
    )

    # Physical lower bound on step time: derived FLOPs / chip bf16 peak.
    # At reference scale this is ~2.4e13 FLOPs => >= ~122 ms on a v5e even
    # at 100% MFU; any smaller reading is a measurement artifact, not speed.
    step_flops = flops_per_meta_step(state, tasks, model_cfg, meta_cfg)
    on_tpu = jax.default_backend() == "tpu"
    # Quick-mode shapes are dispatch-latency-bound; MFU against the floor is
    # meaningless there, so the floor gates nothing in quick mode.
    # SO included (VERDICT r3 item 2a): flops_per_meta_step cost-analyzes
    # the per-step VJP for grad-of-grad, so --second-order reports MFU too.
    floor_s = (
        step_flops / _bf16_peak_flops() if on_tpu and not quick else None
    )
    if floor_s is not None:
        _log(
            f"[bench] derived {step_flops:.3e} FLOPs/meta-step -> physical "
            f"floor {floor_s * 1e3:.0f} ms/step at 100% bf16 MFU"
        )

    from weatherforecast_stgcn_maml_tpu.utils.prng import make_key

    bench_key = make_key(1, meta_cfg.rng_impl)

    # In-graph step chaining (CLAUDE.md timing rule): each timed dispatch
    # runs `chain_k` meta steps back-to-back inside ONE jitted program, so
    # the ~25-30 ms tunnel dispatch + host-fetch floor is amortized 1/K.
    # This matches production (engines/meta_train.py dispatches epochs
    # without per-step host syncs and batches metric fetches). K = 1 for
    # quick mode (explicitly a dispatch-bound smoke test) and second-order
    # (a 2.4 s step makes the floor ~1% and chained bursts too coarse for
    # contention sampling).
    # K=8 leaves ~3.5 ms/step of floor share (raw and floor-corrected
    # figures are both reported, so K only affects the headline's floor
    # share, not the honesty of either number).
    chain_k = 8 if (on_tpu and not quick and not second_order) else 1
    if chain_k > 1:
        import jax.numpy as jnp

        @jax.jit
        def chain(state, tasks, key):
            def body(s, k):
                s, m = step(s, tasks, k)
                return s, m["meta_loss"]

            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                jnp.arange(chain_k)
            )
            state, losses = jax.lax.scan(body, state, keys)
            return state, {"meta_loss": losses[-1]}
    else:
        chain = step

    t0 = time.perf_counter()
    state, metrics = chain(state, tasks, bench_key)
    block_until_ready(metrics["meta_loss"])
    compile_s = time.perf_counter() - t0
    _log(
        f"[bench] first dispatch (compile + run, chain of {chain_k}): "
        f"{compile_s:.2f}s"
    )
    # One extra warmup: the remote-TPU tunnel's first post-compile dispatch
    # is routinely slow.
    state, metrics = chain(state, tasks, bench_key)
    block_until_ready(metrics["meta_loss"])

    # Per-dispatch floor: each timed rep pays the tunnel's dispatch+fetch
    # cost ONCE (a chain of EMPTY kernels measures ~22 ms;
    # benchmarks/lstm_kernel_ablate_probe.json, round-4 methodology fix).
    # Measured with a near-empty jitted dispatch in the same window so the
    # floor-corrected MFU is an apples-to-apples hardware number; the raw
    # per-step figure (floor share divided by chain_k) stays the headline
    # for continuity with earlier rounds.
    floor_dispatch_s = 0.0
    if on_tpu:
        import jax.numpy as jnp

        zf = jax.jit(lambda c: (c * 1.000001).astype(jnp.float32).sum())
        zx = jnp.zeros((8, 128), jnp.float32)
        float(np.asarray(zf(zx)))  # compile + warm
        floor_dispatch_s = min(
            _timed(lambda: float(np.asarray(zf(zx)))) for _ in range(6)
        )
        _log(f"[bench] dispatch+fetch floor: {floor_dispatch_s * 1e3:.1f} ms")

    # The shared TPU pool behind the tunnel shows ~60x contention swings
    # (benchmarks/e2e_tpu_run.md). On TPU: sample in short bursts within a
    # time budget and keep the global best. Stop early when (a) a step
    # reaches CLEAN_MFU of the physical floor (clearly uncontended), or
    # (b) the window is stable — repeated bursts stop improving the best,
    # so more sampling would not change the answer. Other backends have no
    # pool contention — one burst, no retry, no warning.
    CLEAN_MFU = 0.125  # best <= floor/CLEAN_MFU counts as a clean window
    clean_thresh_s = (floor_s / CLEAN_MFU) if floor_s is not None else float("inf")
    # Quick mode has no floor (dispatch-bound shapes), hence no clean/
    # contended verdict — one burst, explicitly a smoke test only. Its 60s
    # budget only bounds that burst when the pool stalls (individual tiny
    # steps have been observed taking minutes under pathological
    # contention); it never triggers a second burst (clean_thresh is inf).
    budget_s = (360.0 if not quick else 60.0) if on_tpu else 0.0
    times = []
    burst_avgs = []
    t_start = time.perf_counter()
    burst = 0
    stale_bursts = 0
    best = float("inf")
    while True:
        burst_start = len(times)
        for r in range(reps):
            t0 = time.perf_counter()
            state, metrics = chain(
                state, tasks, jax.random.fold_in(bench_key, 2 + burst * reps + r)
            )
            # Force a device->host value fetch: under pool contention the
            # tunnel's block_until_ready has been observed returning early.
            float(np.asarray(metrics["meta_loss"]))
            # Per-step time: the chain amortizes dispatch 1/K; dividing by K
            # is exact for the in-graph steps themselves.
            times.append((time.perf_counter() - t0) / chain_k)
            if budget_s > 0 and time.perf_counter() - t_start > budget_s and r >= 1:
                break  # bound budget overshoot to about one step
            # A uniformly slow burst will not produce the best step —
            # contention persists for minutes at a time, so bail after 3
            # slow reps and spend the budget sampling OTHER windows.
            if (
                floor_s is not None
                and r >= 2
                and min(times[burst_start:]) > 2 * clean_thresh_s
            ):
                break
            # Mixed windows defeat the check above: one 1.8s rep keeps the
            # burst-min low while individual reps stall for minutes
            # (observed 280s avg with a 1.8s best in one burst). A single
            # pathological rep poisons the remaining budget — bail and
            # resample a fresh window instead.
            if (
                floor_s is not None
                and r >= 2
                and times[-1] > 10 * clean_thresh_s
            ):
                break
        burst_times = times[burst_start:]
        burst_avgs.append((min(burst_times), sum(burst_times) / len(burst_times)))
        prev_best = best
        best = min(times)
        stale_bursts = stale_bursts + 1 if best > 0.95 * prev_best else 0
        elapsed = time.perf_counter() - t_start
        _log(
            f"[bench] burst {burst}: best {min(burst_times) * 1e3:.1f}ms, "
            f"global best {best * 1e3:.1f}ms (elapsed {elapsed:.0f}s)"
        )
        if best <= clean_thresh_s or elapsed > budget_s or stale_bursts >= 5:
            break
        burst += 1
        # Irregular inter-burst sleeps avoid phase-locking with another
        # tenant's periodic workload on the shared pool.
        time.sleep(min(15.0 + (burst * 7) % 23, max(0.0, budget_s - elapsed)))
    # Average of the best burst only: comparable across runs regardless of
    # how long contention sampling lasted.
    avg = min(burst_avgs, key=lambda ba: ba[0])[1]
    contended = floor_s is not None and best > clean_thresh_s
    mfu = (floor_s / best) if floor_s is not None else None
    if contended:
        _log(
            "[bench] WARNING: best step achieved "
            f"{mfu * 100:.1f}% of bf16 peak (< {CLEAN_MFU * 100:.0f}% "
            "threshold); the shared pool's known ~60x contention swings "
            "likely understate hardware capability in this window"
        )
    _log(f"[bench] steady-state step: best {best * 1e3:.1f}ms avg {avg * 1e3:.1f}ms")
    best_corr = max(best - floor_dispatch_s / chain_k, 1e-9)
    mfu_corr = (floor_s / best_corr) if floor_s is not None else None
    if mfu_corr is not None:
        _log(
            f"[bench] floor-corrected step {best_corr * 1e3:.1f}ms "
            f"({mfu_corr * 100:.1f}% MFU)"
        )
    return {
        "meta_steps_per_sec": 1.0 / best,
        "step_seconds_best": best,
        "step_seconds_avg_best_burst": avg,
        "compile_seconds": compile_s,
        "meta_loss": float(metrics["meta_loss"]),
        "backend": jax.default_backend(),
        "dtype": dtype,
        "flops_per_step": step_flops,
        "floor_seconds_bf16_peak": floor_s,
        "mfu_vs_bf16_peak": mfu,
        "dispatch_floor_seconds": floor_dispatch_s,
        "step_seconds_floor_corrected": best_corr,
        "mfu_floor_corrected": mfu_corr,
        "contended": contended,
        "num_timed_steps": len(times) * chain_k,
        "chain_length": chain_k,
    }


def kernel_parity(dtype: str) -> dict:
    """TPU-side Pallas-vs-XLA parity gate, run by DEFAULT every round.

    CI runs on the CPU backend where the Mosaic kernels silently fall back
    to XLA (VERDICT r2 weak #3) — so the driver-captured TPU bench artifact
    is where bit-level kernel claims get proven. Checks the fused GCN layer
    + stack, the eval fused LSTM, and the training-grade LSTM recurrence
    kernel (forward AND its hand-written backward). Any mismatch raises —
    bench fails loudly rather than recording numbers from a broken kernel.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from weatherforecast_stgcn_maml_tpu.config import ModelConfig
    from weatherforecast_stgcn_maml_tpu.models.common import resolve_dtype
    from weatherforecast_stgcn_maml_tpu.models.gcn import (
        apply_gcn_layer,
        init_gcn_layer,
    )
    from weatherforecast_stgcn_maml_tpu.models.lstm import apply_lstm, init_lstm
    from weatherforecast_stgcn_maml_tpu.models.stgcn import (
        apply_encoder,
        init_encoder,
    )
    from weatherforecast_stgcn_maml_tpu.ops.fused_gcn import (
        fused_gcn_layer,
        fused_gcn_stack,
    )
    from weatherforecast_stgcn_maml_tpu.ops.fused_lstm import (
        fused_lstm_last_hidden,
    )
    from weatherforecast_stgcn_maml_tpu.ops.lstm_scan import (
        lstm_recurrence,
        lstm_recurrence_xla,
    )

    if jax.default_backend() != "tpu":
        return {"skipped": f"backend={jax.default_backend()} (kernels are "
                           "TPU-only; CI covers them in interpret mode)"}

    dt = resolve_dtype(dtype)
    tol = 1e-5 if dt == jnp.float32 else 5e-2
    # Backward checks carry a platform-set floor: TPU's default f32 matmul
    # runs in bf16 passes, and XLA-default vs precision=HIGHEST differ by
    # 1.2-2.2e-3 relative on this workload (measured; the Pallas backward
    # sits at ~3.6e-4). XLA-with-remat is bit-identical, so the kernel's
    # recompute structure is exact — the spread is matmul rounding only.
    bwd_tol = 5e-3 if dt == jnp.float32 else 5e-2
    n, c, w, hid, t_len = 512, 256, 24, 128, 24
    rng = np.random.default_rng(0)
    checks: dict = {}

    def rel_err(got, ref):
        ref, got = np.asarray(ref, np.float32), np.asarray(got, np.float32)
        scale = float(np.max(np.abs(ref))) or 1.0
        return float(np.max(np.abs(got - ref))) / scale

    a = jnp.asarray(rng.uniform(size=(n, n)).astype(np.float32) / n)
    h = jnp.asarray(rng.normal(size=(w, n, c)).astype(np.float32))
    gp = init_gcn_layer(jax.random.key(0), c, c)
    checks["gcn_layer"] = rel_err(
        fused_gcn_layer(gp, a, h, compute_dtype=dt),
        jax.nn.relu(apply_gcn_layer(gp, a, h, compute_dtype=dt)),
    )

    mc = ModelConfig(compute_dtype=dtype)
    enc = init_encoder(jax.random.key(1), mc)
    x_in = jnp.asarray(
        rng.normal(size=(w, n, mc.in_channels)).astype(np.float32)
    )
    checks["gcn_stack"] = rel_err(
        fused_gcn_stack(enc["layers"], a, x_in, compute_dtype=dt),
        apply_encoder(enc, a, x_in, mc, train=False, use_pallas=False),
    )

    # Fused GCN TRAINING kernel: forward + full gradient with dropout
    # masks active (drawn identically in both paths).
    def enc_train_loss(use_pallas):
        def f(p, xx):
            out = apply_encoder(
                p, a, xx, mc, train=True, rng=jax.random.key(6),
                use_pallas=use_pallas,
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return f

    checks["gcn_train_fwd"] = rel_err(
        jax.jit(
            lambda p, xx: apply_encoder(
                p, a, xx, mc, train=True, rng=jax.random.key(6),
                use_pallas=True,
            )
        )(enc, x_in),
        apply_encoder(
            enc, a, x_in, mc, train=True, rng=jax.random.key(6),
            use_pallas=False,
        ),
    )
    et_ref = jax.jit(jax.grad(enc_train_loss(False), argnums=(0, 1)))(enc, x_in)
    et_got = jax.jit(jax.grad(enc_train_loss(True), argnums=(0, 1)))(enc, x_in)
    checks["gcn_train_bwd_dx"] = rel_err(et_got[1], et_ref[1])
    checks["gcn_train_bwd_dw"] = max(
        rel_err(b_, a_)
        for a_, b_ in zip(jax.tree.leaves(et_ref[0]), jax.tree.leaves(et_got[0]))
    )

    lp = init_lstm(jax.random.key(2), c, hid, 4)
    x_seq = jnp.asarray(rng.normal(size=(n, t_len, c)).astype(np.float32))
    checks["lstm_eval_fused"] = rel_err(
        fused_lstm_last_hidden(lp, x_seq, compute_dtype=dt),
        apply_lstm(lp, x_seq, compute_dtype=dt),
    )

    # Whole-stack fused kernel (the production "auto" path): forward AND
    # the full train-mode gradient (dropout masks drawn in both paths from
    # the same rng stream) at reference shape.
    ref_fwd = apply_lstm(lp, x_seq, compute_dtype=dt, kernel="xla")
    got_fwd = jax.jit(
        lambda p, x: apply_lstm(p, x, compute_dtype=dt, kernel="pallas_stack")
    )(lp, x_seq)
    checks["lstm_stack_fwd"] = rel_err(got_fwd, ref_fwd)

    def stack_loss(kernel):
        def f(p, x):
            out = apply_lstm(
                p, x, dropout_rate=0.2, train=True, rng=jax.random.key(5),
                compute_dtype=dt, kernel=kernel,
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return f

    sp_ref = jax.jit(jax.grad(stack_loss("xla"), argnums=(0, 1)))(lp, x_seq)
    sp_got = jax.jit(
        jax.grad(stack_loss("pallas_stack"), argnums=(0, 1))
    )(lp, x_seq)
    checks["lstm_stack_bwd_dx"] = rel_err(sp_got[1], sp_ref[1])
    checks["lstm_stack_bwd_dw"] = max(
        rel_err(b_, a_)
        for a_, b_ in zip(jax.tree.leaves(sp_ref[0]), jax.tree.leaves(sp_got[0]))
    )

    # Batch-chunked stack route (wide-batch supervised steps): chunked
    # fused == XLA with the SAME full-batch dropout masks sliced per chunk.
    from weatherforecast_stgcn_maml_tpu.ops.fused_lstm_stack import (
        lstm_stack_last_all_chunked,
    )

    def chunk_loss(p, x):
        out = lstm_stack_last_all_chunked(
            p, x, n // 2, dropout_rate=0.2, train=True,
            rng=jax.random.key(5), compute_dtype=dt,
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    checks["lstm_chunked_fwd"] = rel_err(
        jax.jit(lambda p, x: lstm_stack_last_all_chunked(
            p, x, n // 2, compute_dtype=dt))(lp, x_seq),
        ref_fwd,
    )
    ck_got = jax.jit(jax.grad(chunk_loss, argnums=(0, 1)))(lp, x_seq)
    checks["lstm_chunked_bwd_dx"] = rel_err(ck_got[1], sp_ref[1])
    checks["lstm_chunked_bwd_dw"] = max(
        rel_err(b_, a_)
        for a_, b_ in zip(jax.tree.leaves(sp_ref[0]), jax.tree.leaves(ck_got[0]))
    )

    xp = jnp.asarray(rng.normal(size=(t_len, n, 4 * hid)).astype(np.float32))
    whm = jnp.asarray(rng.normal(size=(hid, 4 * hid)).astype(np.float32) * 0.1)
    w_out = jnp.asarray(rng.normal(size=(t_len, n, hid)).astype(np.float32))
    checks["lstm_scan_fwd"] = rel_err(
        jax.jit(lambda a_, b_: lstm_recurrence(
            a_, b_, compute_dtype=dt, kernel="pallas"))(xp, whm),
        lstm_recurrence_xla(xp, whm, compute_dtype=dt),
    )

    def loss(fn):
        return lambda xp, wh: jnp.sum(fn(xp, wh).astype(jnp.float32) * w_out)

    d_ref = jax.grad(
        loss(lambda a_, b_: lstm_recurrence_xla(a_, b_, compute_dtype=dt)),
        argnums=(0, 1),
    )(xp, whm)
    d_got = jax.jit(jax.grad(
        loss(lambda a_, b_: lstm_recurrence(
            a_, b_, compute_dtype=dt, kernel="pallas")),
        argnums=(0, 1),
    ))(xp, whm)
    checks["lstm_scan_bwd_dxp"] = rel_err(d_got[0], d_ref[0])
    checks["lstm_scan_bwd_dwh"] = rel_err(d_got[1], d_ref[1])

    # R-operator (Pearlmutter) HVP kernels — the default SO path
    # (meta.so_impl="fhvp", ops/fused_lstm_hvp.py). jvp of the custom_jvp
    # stack ops vs jvp over plain-XLA autodiff of the same merged-gates
    # stack, dropout masks active. Run at f32 (interpret-mode CI covers the
    # dtype matrix; here the point is proving the hand-written tangent
    # schedules on real Mosaic). Tangent-of-backward compounds ~2x more
    # matmul rounding than a first-order backward, hence its own tolerance.
    from weatherforecast_stgcn_maml_tpu.ops.fused_lstm_hvp import (
        hvp_stack_ops,
    )

    hvp_tol = 2e-2
    ht, hb, hc, hh, hl, keep = 8, 128, 128, 128, 2, 0.75
    hx = jnp.asarray(rng.normal(size=(ht, hb, hc)).astype(np.float32))
    hw0 = jnp.asarray(
        rng.normal(size=(hc + hh, 4 * hh)).astype(np.float32) * 0.3
    )
    hwr = jnp.asarray(
        rng.normal(size=(hl - 1, 2 * hh, 4 * hh)).astype(np.float32) * 0.3
    )
    hb2 = jnp.asarray(rng.normal(size=(hl, 4 * hh)).astype(np.float32) * 0.1)
    hmasks = jnp.asarray(
        (rng.uniform(size=(hl - 1, ht, hb, hh)) < keep).astype(np.int8)
    )
    hg = jnp.asarray(rng.normal(size=(hb, hh)).astype(np.float32))
    h_fwd_op, h_bwd_op = hvp_stack_ops("float32", False, keep, True)

    def hvp_ref_stack(x_, w0_, wr_, b_):
        hidden = hh
        inp = x_
        h_alls, c_alls = [], []
        for l in range(hl):
            w_ = w0_ if l == 0 else wr_[l - 1]
            hcur = jnp.zeros((hb, hidden), jnp.float32)
            ccur = jnp.zeros((hb, hidden), jnp.float32)
            hs, cs = [], []
            for s in range(ht):
                gates = jnp.concatenate([inp[s], hcur], axis=1) @ w_ + b_[l]
                i_ = jax.nn.sigmoid(gates[:, :hidden])
                f_ = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
                g_ = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
                o_ = jax.nn.sigmoid(gates[:, 3 * hidden:])
                ccur = f_ * ccur + i_ * g_
                hcur = o_ * jnp.tanh(ccur)
                hs.append(hcur)
                cs.append(ccur)
            h_alls.append(jnp.stack(hs))
            c_alls.append(jnp.stack(cs))
            inp = h_alls[-1]
            if l < hl - 1:
                inp = inp * (hmasks[l].astype(jnp.float32) / keep)
        return h_alls[-1][-1], jnp.stack(h_alls), jnp.stack(c_alls)

    hprim = (hx, hw0, hwr, hb2)
    htans = tuple(
        jnp.asarray(rng.normal(size=p.shape).astype(np.float32))
        for p in hprim
    )
    hvr_out, hvr_tan = jax.jit(
        lambda p_, t_: jax.jvp(hvp_ref_stack, p_, t_)
    )(hprim, htans)
    hvg_out, hvg_tan = jax.jit(
        lambda p_, t_: jax.jvp(
            lambda x_, w0_, wr_, b_: h_fwd_op(x_, w0_, wr_, b_, hmasks),
            p_, t_,
        )
    )(hprim, htans)
    checks["hvp_fwd"] = max(
        rel_err(b_, a_)
        for a_, b_ in zip(jax.tree.leaves(hvr_out), jax.tree.leaves(hvg_out))
    )
    checks["hvp_fwd_tangent"] = max(
        rel_err(b_, a_)
        for a_, b_ in zip(jax.tree.leaves(hvr_tan), jax.tree.leaves(hvg_tan))
    )

    def hvp_ref_grads(g_, x_, w0_, wr_, b_):
        _, vjp = jax.vjp(
            lambda *a_: hvp_ref_stack(*a_)[0], x_, w0_, wr_, b_
        )
        return vjp(g_)

    def hvp_fused_grads(g_, x_, w0_, wr_, b_):
        _, h_all_, c_all_ = hvp_ref_stack(x_, w0_, wr_, b_)
        return h_bwd_op(g_, x_, h_all_, c_all_, w0_, wr_, b_, hmasks)

    hbprim = (hg,) + hprim
    hbtans = tuple(
        jnp.asarray(rng.normal(size=p.shape).astype(np.float32))
        for p in hbprim
    )
    hbr_out, hbr_tan = jax.jit(
        lambda p_, t_: jax.jvp(hvp_ref_grads, p_, t_)
    )(hbprim, hbtans)
    hbg_out, hbg_tan = jax.jit(
        lambda p_, t_: jax.jvp(hvp_fused_grads, p_, t_)
    )(hbprim, hbtans)
    checks["hvp_bwd"] = max(
        rel_err(b_, a_)
        for a_, b_ in zip(jax.tree.leaves(hbr_out), jax.tree.leaves(hbg_out))
    )
    checks["hvp_bwd_tangent"] = max(
        rel_err(b_, a_)
        for a_, b_ in zip(jax.tree.leaves(hbr_tan), jax.tree.leaves(hbg_tan))
    )

    # Node-sharded fused GCN sandwich ops (ops/fused_gcn_shard.py) — the
    # shard_map path's encoder route. Compiled Mosaic inside a real
    # 1-device shard_map (interpret mode cannot run under check_vma
    # manual axes, so THIS is where the sharded kernels get proven):
    # train-mode forward + full gradient vs the XLA _spatial_encoder,
    # identical per-shard mask streams.
    from jax.sharding import PartitionSpec as P

    from weatherforecast_stgcn_maml_tpu.parallel.spatial import (
        _spatial_encoder,
    )

    sh_mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("sp",))
    sh_rng = jax.random.key(9)
    mc_xla = dataclasses.replace(mc, use_pallas_gcn=False)

    def sh_enc(cfg):
        def body(e, a_rows, x_local):
            sub = jax.random.fold_in(sh_rng, jax.lax.axis_index("sp"))
            return _spatial_encoder(
                e, a_rows, x_local, cfg, "sp", train=True, rng=sub
            )

        return jax.shard_map(
            body, mesh=sh_mesh,
            in_specs=(P(), P("sp", None), P(None, "sp", None)),
            out_specs=P(None, "sp", None),
        )

    def sh_loss(cfg):
        def f(e, xx):
            return jnp.sum(sh_enc(cfg)(e, a, xx).astype(jnp.float32) ** 2)

        return f

    checks["gcn_shard_fwd"] = rel_err(
        jax.jit(sh_enc(mc))(enc, a, x_in),
        jax.jit(sh_enc(mc_xla))(enc, a, x_in),
    )
    shg_ref = jax.jit(jax.grad(sh_loss(mc_xla), argnums=(0, 1)))(enc, x_in)
    shg_got = jax.jit(jax.grad(sh_loss(mc), argnums=(0, 1)))(enc, x_in)
    checks["gcn_shard_bwd_dx"] = rel_err(shg_got[1], shg_ref[1])
    checks["gcn_shard_bwd_dw"] = max(
        rel_err(b_, a_)
        for a_, b_ in zip(jax.tree.leaves(shg_ref[0]), jax.tree.leaves(shg_got[0]))
    )

    # Second-order meta step THROUGH shard_map at shapes where the fused
    # GCN sandwich route would engage. Regression trap for round 5's
    # trace-time break: the sandwich is a first-order custom_vjp, and the
    # fhvp composition (train/so_fused.make_local_grad_loss_fused) gets
    # jax.jvp'd — its encoder must stay on the layerwise XLA route or
    # tracing dies with "can't apply jvp to a custom_vjp function"
    # (caught by shardmap_so_probe.py after commit d54361a; CPU tests
    # cannot reach this path, the route is gated on the real backend).
    # Small region (128 padded nodes), default channel dims so every
    # fused route stays engaged; checked against the single-device SO
    # step's per-task losses.
    from weatherforecast_stgcn_maml_tpu.config import DataConfig, MetaConfig
    from weatherforecast_stgcn_maml_tpu.data.synthetic import (
        synthetic_region_for_box,
    )
    from weatherforecast_stgcn_maml_tpu.parallel.mesh import make_mesh_2d
    from weatherforecast_stgcn_maml_tpu.parallel.meta_sp import (
        make_shardmap_meta_step_2d,
    )
    from weatherforecast_stgcn_maml_tpu.train.maml import (
        init_meta_state,
        make_jit_meta_step,
    )
    from weatherforecast_stgcn_maml_tpu.train.tasks import (
        build_meta_tasks,
        stack_tasks,
    )
    from weatherforecast_stgcn_maml_tpu.utils.prng import make_key

    so_model = mc
    so_meta = MetaConfig(
        second_order=True, meta_batch=2, grad_accum=1,
        inner_epochs=1, inner_batches=2,
    )
    so_regions = [
        synthetic_region_for_box(
            (10.0 + i, 10.75 + i, 20.0, 20.75), num_timesteps=64, seed=i
        )
        for i in range(2)
    ]
    so_built = build_meta_tasks(so_regions, so_model, so_meta, DataConfig())
    so_tasks = jax.device_put(stack_tasks([b.task for b in so_built]))
    so_key = make_key(11, so_meta.rng_impl)
    # make_jit_meta_step donates its state: init a second identical state
    # for the shardmap arm (same seed -> same values) instead of aliasing
    # device buffers into the donated call.
    so_state = init_meta_state(jax.random.key(4), so_model, so_meta)
    _, so_m1 = make_jit_meta_step(so_model, so_meta)(
        init_meta_state(jax.random.key(4), so_model, so_meta),
        so_tasks, so_key,
    )
    so_shmap = make_shardmap_meta_step_2d(
        so_model, so_meta, make_mesh_2d(1, 1), donate_state=False
    )
    _, so_m2 = so_shmap(so_state, so_tasks, so_key)
    checks["so_shardmap_step"] = rel_err(
        so_m2["per_task_loss"], so_m1["per_task_loss"]
    )

    # Fused whole-tree clip+SGD update (ops/fused_sgd.py) vs the XLA tree
    # ops — unbatched and vmapped (per-instance norms), clip active.
    from weatherforecast_stgcn_maml_tpu.ops import fused_sgd
    from weatherforecast_stgcn_maml_tpu.train.optimizers import (
        clip_global_norm_tree,
    )

    ptree = {
        "w": jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(256,)).astype(np.float32)),
        "k": jnp.asarray(rng.normal(size=(31, 8)).astype(np.float32)),
    }
    gtree = jax.tree.map(lambda x: x * 3.0, ptree)

    def sgd_ref(p, g):
        g, _ = clip_global_norm_tree(jax.lax.stop_gradient(g), 1.0)
        return jax.tree.map(lambda a, b: a - 0.01 * b, p, g)

    got = jax.jit(
        lambda p, g: fused_sgd.clip_sgd_update(p, g, 0.01, 1.0)
    )(ptree, gtree)
    ref = sgd_ref(ptree, gtree)
    checks["fused_sgd"] = max(
        rel_err(a, b)
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref))
    )
    bp = jax.tree.map(lambda x: jnp.stack([x, x * 0.5]), ptree)
    bg = jax.tree.map(lambda x: jnp.stack([x * 50.0, x * 1e-4]), ptree)
    gotb = jax.jit(jax.vmap(
        lambda p, g: fused_sgd.clip_sgd_update(p, g, 0.01, 1.0)
    ))(bp, bg)
    refb = jax.vmap(sgd_ref)(bp, bg)
    checks["fused_sgd_vmap"] = max(
        rel_err(a, b)
        for a, b in zip(jax.tree.leaves(gotb), jax.tree.leaves(refb))
    )

    def _tol(k):
        if k.startswith("hvp_"):
            return hvp_tol if "tangent" in k else bwd_tol
        return bwd_tol if "bwd" in k else tol

    bad = {k: v for k, v in checks.items() if not (v <= _tol(k))}
    if bad:
        raise SystemExit(
            f"[bench] KERNEL PARITY FAILED ({dtype}, tol {tol}/"
            f"bwd {bwd_tol}): {bad}"
        )
    worst = max(checks.values())
    _log(
        f"[bench] kernels: parity ok (max rel |Δ| {worst:.2e} over "
        f"{list(checks)} @ {dtype}, tol {tol} fwd / {bwd_tol} bwd)"
    )
    return {"dtype": dtype, "tol": tol, "bwd_tol": bwd_tol,
            "max_rel_err": worst, **checks}


def bench_kernels(dtype: str, inner_iters: int = 100) -> dict:
    """Pallas fused GCN vs XLA einsum at bench shapes.

    Each timed dispatch runs `inner_iters` chained layer applications inside
    one jitted `lax.scan`, so per-call dispatch latency (substantial through
    the axon TPU tunnel) is amortized out of the per-layer number.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from weatherforecast_stgcn_maml_tpu.models.common import resolve_dtype
    from weatherforecast_stgcn_maml_tpu.models.gcn import apply_gcn_layer, init_gcn_layer
    from weatherforecast_stgcn_maml_tpu.ops.fused_gcn import fused_gcn_layer

    n, c_in, c_out, w = 512, 256, 256, 24
    key = jax.random.key(0)
    p = init_gcn_layer(key, c_in, c_out)
    a = jnp.asarray(np.random.default_rng(0).uniform(size=(n, n)), jnp.float32)
    h = jnp.asarray(np.random.default_rng(1).normal(size=(w, n, c_in)), jnp.float32)
    dt = resolve_dtype(dtype)

    def repeat(layer_fn):
        @jax.jit
        def run(a, h):
            def body(carry, _):
                out = layer_fn(a, carry)
                # Renormalize so 100 chained ReLU layers neither explode
                # nor collapse to zero (keeps the compute honest).
                out = out / (jnp.max(jnp.abs(out)) + 1e-6)
                return out, ()

            final, _ = jax.lax.scan(body, h, None, length=inner_iters)
            return final

        return run

    xla_layer = lambda a, h: jax.nn.relu(apply_gcn_layer(p, a, h, compute_dtype=dt))
    pls_layer = lambda a, h: fused_gcn_layer(p, a, h, compute_dtype=dt)

    out = {"inner_iters": inner_iters}
    # Interleaved round-robin arms + FORCED value fetch per rep: sequential
    # arms in a contended pool measure the pool, and block_until_ready has
    # been observed returning early through the tunnel (CLAUDE.md timing
    # rules — same discipline as every benchmarks/ probe).
    arms, times = {}, {}
    for name, fn in [("xla", repeat(xla_layer)), ("pallas", repeat(pls_layer))]:
        try:
            np.asarray(fn(a, h))  # compile + warm
            arms[name], times[name] = fn, []
        except Exception as e:  # pallas unavailable off-TPU
            out[name + "_error"] = f"{type(e).__name__}: {e}"
    for _ in range(5):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            np.asarray(fn(a, h))
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        out[name + "_us_per_layer"] = min(ts) / inner_iters * 1e6
    if "xla_us_per_layer" in out and "pallas_us_per_layer" in out:
        out["pallas_speedup"] = out["xla_us_per_layer"] / out["pallas_us_per_layer"]
        ref = xla_layer(a, h)
        got = pls_layer(a, h)
        out["max_abs_diff"] = float(jnp.max(jnp.abs(ref - got)))
        flops = 2 * w * (n * c_in * c_out + n * n * c_out)
        out["xla_gflops"] = flops / (out["xla_us_per_layer"] * 1e-6) / 1e9
        out["pallas_gflops"] = flops / (out["pallas_us_per_layer"] * 1e-6) / 1e9
    _log(f"[bench] kernels: {out}")
    return out


def bench_workload_configs(dtype: str) -> dict:
    """Measure the remaining BASELINE.json workload configs (1, 2, 3, 5).

    1: single-region forward + MSE eval latency;
    2: single-region supervised fine-tune epoch throughput (adapt path);
    3: single-task MAML inner loop + one meta-update;
    5: dp-sharded meta step over a device mesh (skipped on 1 device).
    Details only — the headline JSON line stays config 4 (full meta step).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from weatherforecast_stgcn_maml_tpu.config import (
        DataConfig,
        MeshConfig,
        MetaConfig,
        ModelConfig,
    )
    from weatherforecast_stgcn_maml_tpu.data.preprocess import pad_nodes, prepare_features
    from weatherforecast_stgcn_maml_tpu.data.synthetic import synthetic_region_for_box
    from weatherforecast_stgcn_maml_tpu.data.windows import WindowSpec
    from weatherforecast_stgcn_maml_tpu.graph import build_region_graph
    from weatherforecast_stgcn_maml_tpu.models.hybrid import init_hybrid
    from weatherforecast_stgcn_maml_tpu.models.losses import masked_mse
    from weatherforecast_stgcn_maml_tpu.train.maml import (
        adapt_and_query_loss,
        init_meta_state,
        make_jit_meta_step,
    )
    from weatherforecast_stgcn_maml_tpu.train.optimizers import adaptation_optimizer
    from weatherforecast_stgcn_maml_tpu.train.supervised import (
        SupervisedState,
        make_epoch_runner,
    )
    from weatherforecast_stgcn_maml_tpu.train.tasks import build_meta_tasks, stack_tasks
    from weatherforecast_stgcn_maml_tpu.utils.profiling import block_until_ready

    model_cfg = ModelConfig(compute_dtype=dtype)
    meta_cfg = MetaConfig()
    box = (18.0, 23.0, 75.0, 80.0)  # the India box (config 1's region)
    region = synthetic_region_for_box(box, num_timesteps=160, seed=0)
    graph = build_region_graph(region.lats, region.lons)
    feats_np, _ = prepare_features(region)
    features = jnp.asarray(pad_nodes(feats_np, graph.padded_nodes))
    a_hat = jnp.asarray(graph.a_hat)
    mask = jnp.asarray(graph.node_mask)
    kop = jnp.int32(8)
    spec = WindowSpec(model_cfg.window, model_cfg.horizon)
    params = init_hybrid(jax.random.key(0), model_cfg)
    out = {}

    def timeit(fn, reps=10):
        fn()  # warmup/compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    # Config 1: forward + MSE eval on one window.
    from weatherforecast_stgcn_maml_tpu.data.windows import gather_batch

    x1, y1 = gather_batch(features, jnp.asarray([spec.window]), spec)

    @jax.jit
    def fwd_eval(params, x, y):
        from weatherforecast_stgcn_maml_tpu.train.supervised import batched_forward

        preds = batched_forward(params, a_hat, x, kop, model_cfg, train=False, rng=None)
        return masked_mse(preds, y, mask)

    # Single-dispatch latency: through the axon tunnel this sits on the
    # ~25-30 ms dispatch floor — it measures end-to-end serving latency in
    # THIS environment, not device compute (which is sub-ms at this shape).
    out["forward_eval_us"] = timeit(
        lambda: float(np.asarray(fwd_eval(params, x1, y1)))
    ) * 1e6

    # Config 2: one supervised fine-tune epoch (adapt path) at the tuned
    # default batch width (AdaptConfig.batch_size; adapt_batch_probe.json).
    from weatherforecast_stgcn_maml_tpu.config import AdaptConfig

    bsz = AdaptConfig().batch_size
    tx, _ = adaptation_optimizer("Bench")
    run_epoch = make_epoch_runner(model_cfg, tx, spec)
    anchors = spec.window + np.arange(spec.num_samples(region.num_timesteps))
    nb = len(anchors) // bsz
    batches = jnp.asarray(anchors[: nb * bsz].reshape(nb, bsz))
    # run_epoch donates its state: thread one state through the reps (fresh
    # copies of params so the shared `params` tree is never donated away).
    sstate = SupervisedState(
        params=jax.tree.map(jnp.array, params), opt_state=tx.init(params)
    )

    def one_epoch():
        nonlocal sstate
        sstate, losses = run_epoch(
            sstate, features, batches, a_hat,
            mask, kop, jnp.float32(5e-4), jax.random.key(1),
        )
        np.asarray(losses)  # forced fetch (contended block_until_ready lies)

    epoch_s = timeit(one_epoch, reps=5)
    out["adapt_epoch_seconds"] = epoch_s
    out["adapt_samples_per_sec"] = nb * bsz / epoch_s

    # Config 3: single-task inner loop + meta-update.
    built = build_meta_tasks([region], model_cfg, meta_cfg, DataConfig())
    task = jax.tree.map(jnp.asarray, built[0].task)

    inner = jax.jit(
        lambda p, t, r: adapt_and_query_loss(p, t, r, model_cfg, meta_cfg)
    )
    out["single_task_inner_ms"] = timeit(
        lambda: float(np.asarray(inner(params, task, jax.random.key(2))))
    ) * 1e3

    # Config 5: dp-sharded meta step (needs >1 device).
    n_dev = len(jax.devices())
    if n_dev > 1:
        from weatherforecast_stgcn_maml_tpu.parallel.mesh import make_mesh
        from weatherforecast_stgcn_maml_tpu.parallel.meta_dp import (
            make_parallel_meta_step,
        )

        per = meta_cfg.meta_batch // meta_cfg.grad_accum
        use = min(n_dev, per)
        mesh = make_mesh(MeshConfig(num_devices=use))
        regions = [
            synthetic_region_for_box(
                (10.0 + 6 * i, 15.0 + 6 * i, 20.0, 25.0), num_timesteps=160, seed=i
            )
            for i in range(meta_cfg.meta_batch)
        ]
        built = build_meta_tasks(regions, model_cfg, meta_cfg, DataConfig())
        tasks = jax.tree.map(jnp.asarray, stack_tasks([b.task for b in built]))
        state = init_meta_state(jax.random.key(0), model_cfg, meta_cfg)
        pstep = make_parallel_meta_step(model_cfg, meta_cfg, mesh, donate_state=False)

        def dp_step():
            _, m = pstep(state, tasks, jax.random.key(3))
            float(np.asarray(m["meta_loss"]))

        out["dp_meta_step_ms"] = timeit(dp_step, reps=5) * 1e3
        out["dp_devices"] = use
    else:
        out["dp_meta_step_ms"] = None
        out["dp_devices"] = 1

    _log(f"[bench] workload configs: {out}")
    return out


def load_or_measure_baseline(remeasure: bool) -> dict:
    if not remeasure and os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            return json.load(f)
    _log("[bench] measuring torch reference-equivalent baseline on CPU ...")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "benchmarks"))
    from torch_reference_workload import measure

    result = measure()
    with open(BASELINE_PATH, "w") as f:
        json.dump(result, f, indent=2)
    return result


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--baseline", action="store_true", help="re-measure torch baseline")
    ap.add_argument("--kernels", action="store_true", help="also compare pallas vs xla")
    ap.add_argument(
        "--all-configs", action="store_true",
        help="also measure the other BASELINE.json workload configs",
    )
    ap.add_argument(
        "--dtype", default="bfloat16", choices=["float32", "bfloat16"],
        help="headline runs bf16 (convergence-certified, benchmarks/"
        "e2e_tpu_run.md); pass float32 for the secondary comparison line",
    )
    ap.add_argument(
        "--second-order", action="store_true",
        help="benchmark full second-order MAML (grad-of-grad through the\n"
        "rematerialized inner scan) instead of FOMAML (VERDICT r2 item 3)",
    )
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument(
        "--cpu", action="store_true",
        help="debug: force the local CPU backend (both the env var AND "
        "jax.config — this image's sitecustomize pins axon otherwise)",
    )
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    baseline = load_or_measure_baseline(args.baseline)

    # First device contact happens inside kernel_parity/bench_meta; guard it.
    import jax

    ready = _backend_watchdog()
    jax.devices()
    ready.set()
    # Default-run parity gate (VERDICT r2 item 2): prove the custom kernels
    # on the real backend before recording any timing; raises on mismatch.
    # Skipped in --quick smoke runs: the gate compiles ~12 full-reference-
    # scale kernel programs and would dominate a tiny-shape smoke test.
    if args.quick:
        parity = {"skipped": "--quick smoke run (full gate runs by default)"}
    else:
        parity = kernel_parity(args.dtype)
    result = bench_meta(args.quick, args.dtype, args.reps, args.second_order)
    details = {"bench": result, "baseline": baseline, "kernel_parity": parity}
    if args.kernels:
        details["kernels"] = bench_kernels(args.dtype)
    if args.all_configs:
        details["workload_configs"] = bench_workload_configs(args.dtype)

    # Quick smoke runs land in their own artifact: last_run.json is the
    # full-scale record the docs cite, and a tiny-shape smoke test must
    # never clobber it (this happened once in round 3). Second-order runs
    # get their own file for the same reason.
    # Output goes to the UNTRACKED benchmarks/out/ (VERDICT r4 weak 7: the
    # driver's post-snapshot bench run must not dirty the committed tree).
    # The committed benchmarks/last*_run.json files are explicit snapshots
    # copied there by hand when a result is worth citing.
    if args.quick:
        artifact = "last_quick_run.json"
    elif args.second_order:
        artifact = "last_so_run.json"
    else:
        artifact = "last_run.json"
    out_dir = os.path.join(os.path.dirname(__file__), "benchmarks", "out")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, artifact)
    with open(out_path, "w") as f:
        json.dump(details, f, indent=2)
    _log(f"[bench] details -> {out_path}")

    value = result["meta_steps_per_sec"]
    vs = value / baseline["meta_steps_per_sec"]
    if args.quick:
        line = {
            "metric": "maml_meta_steps_per_sec_quick_smoke",
            "value": round(value, 4),
            "unit": "meta-steps/s on tiny smoke-test shapes (NOT comparable to baseline)",
            "vs_baseline": None,
        }
    else:
        unit = (
            f"meta-epochs/s, {result['dtype']} (4 tasks x 90 inner steps, "
            "441-node regions, ~860K-param hybrid; vs_baseline is vs the "
            "measured torch reference workload on HOST CPU — no GPU exists "
            "in this image, see benchmarks/baseline_torch.json)"
        )
        if result.get("mfu_vs_bf16_peak") is not None:
            unit += (
                f" [physical floor {result['floor_seconds_bf16_peak'] * 1e3:.0f}"
                f" ms/step at 100% bf16 MFU; this run: "
                f"{result['mfu_vs_bf16_peak'] * 100:.1f}% MFU"
            )
            if result.get("mfu_floor_corrected") is not None:
                unit += (
                    f" ({result['mfu_floor_corrected'] * 100:.1f}% with the "
                    f"{result['dispatch_floor_seconds'] * 1e3:.0f} ms "
                    "per-dispatch tunnel floor subtracted)"
                )
            if result.get("contended"):
                unit += "; likely pool-contended window"
            unit += "]"
        if args.second_order:
            unit = "SECOND-ORDER " + unit
        line = {
            "metric": "maml_so_meta_steps_per_sec"
            if args.second_order else "maml_meta_steps_per_sec",
            "value": round(value, 4),
            "unit": unit,
            "vs_baseline": round(vs, 1),
        }
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
