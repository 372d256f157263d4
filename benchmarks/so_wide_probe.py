"""Wide-batch second-order: chunked R-operator routing vs the XLA HVP.

Before round-4's `hvp_chunk_size` (ops/fused_lstm_hvp.py), the fused
Hessian transpose only engaged where ONE kernel instance fit VMEM — 512
padded nodes at bf16 — so every wider SO step silently dropped to the XLA
HVP measured at ~30% MFU (benchmarks/fhvp_decomp_probe.json). The chunked
route runs the R-kernels in row slices instead (rows are independent),
mirroring the first-order stack_chunk_size fix that took the 4096-node
supervised step from 12x-over-floor to its FLOP floor
(benchmarks/large_node_decomp_probe.json).

This probe A/Bs, at 1024- and 2048-padded-node meta tasks:

  fhvp — the fused composition, now batch-chunked at these widths.
  hvp  — jvp of the XLA loss copy's gradient: what wide-batch SO ran
         before this change (fhvp's own former fallback).

Arms run interleaved in ONE process with an explicit dispatch-floor arm
(round-4 methodology, CLAUDE.md); each arm prints its first meta_loss as a
same-dtype sanity check (the two impls are equivalence-tested in
tests/test_so_fused.py / tests/test_maml.py).

Output: benchmarks/so_wide_probe.json.
Run: cd /root/repo && python benchmarks/so_wide_probe.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))
sys.path.insert(0, SELF_DIR)

# (label, lon/lat box) -> padded node count at 0.25 deg: a w-degree box has
# (4w+1)^2 nodes, padded to a multiple of 128; 7.5 deg -> 961 -> 1024,
# 11 deg -> 2025 -> 2048.
SIZES = {
    1024: 7.5,
    2048: 11.0,
    4096: 15.75,
}


def build_inputs(width_deg: float, dtype: str):
    import jax

    from weatherforecast_stgcn_maml_tpu.config import (
        DataConfig,
        MetaConfig,
        ModelConfig,
    )
    from weatherforecast_stgcn_maml_tpu.data.synthetic import (
        synthetic_region_for_box,
    )
    from weatherforecast_stgcn_maml_tpu.train.maml import init_meta_state
    from weatherforecast_stgcn_maml_tpu.train.tasks import (
        build_meta_tasks,
        stack_tasks,
    )

    model_cfg = ModelConfig(compute_dtype=dtype)
    # 2 tasks / no accum keeps the widest arm's step in single-digit
    # seconds; the FLOP model scales with the actual configs either way.
    meta_cfg = MetaConfig(
        meta_batch=2, grad_accum=1, second_order=True
    )
    boxes = [
        (10.0 + (width_deg + 2) * i, 10.0 + (width_deg + 2) * i + width_deg,
         20.0, 20.0 + width_deg)
        for i in range(2)
    ]
    regions = [
        synthetic_region_for_box(b, num_timesteps=160, seed=i)
        for i, b in enumerate(boxes)
    ]
    built = build_meta_tasks(regions, model_cfg, meta_cfg, DataConfig())
    tasks = stack_tasks([b.task for b in built])
    tasks = jax.device_put(tasks)
    state = init_meta_state(jax.random.key(0), model_cfg, meta_cfg)
    state = jax.device_put(state)
    graph = built[0].graph
    return state, tasks, graph, model_cfg, meta_cfg


def main(rounds: int = 5) -> int:
    import argparse

    import jax
    import jax.numpy as jnp

    from _interleave import run_interleaved
    from bench import _bf16_peak_flops, flops_per_meta_step
    from weatherforecast_stgcn_maml_tpu.ops.fused_lstm_hvp import (
        hvp_chunk_size,
    )
    from weatherforecast_stgcn_maml_tpu.train.maml import make_jit_meta_step

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sizes", default=None,
        help="comma-separated padded-node subset of %s" % list(SIZES),
    )
    ap.add_argument(
        "--skip-hvp", action="store_true",
        help="time only the fhvp arm (the XLA-HVP twin's remote compile "
        "runs ~20 min at 1024 nodes and grows with width; once the A/B "
        "is on record for a size class, wider envelope points only need "
        "the production route). Skips the first-loss gate (no twin).",
    )
    ap.add_argument(
        "--merge", action="store_true",
        help="merge results into an existing so_wide_probe.json instead "
        "of starting a fresh artifact (e.g. adding a --sizes 4096 point)",
    )
    cli = ap.parse_args()
    sizes = (
        {int(s): SIZES[int(s)] for s in cli.sizes.split(",")}
        if cli.sizes else SIZES
    )

    dtype = "bfloat16"
    peak = _bf16_peak_flops()

    arms = {}
    states = {}
    first_loss = {}
    meta = {}
    # Timing runs (and the artifact is rewritten) after EACH size, so a
    # timeout mid-compile of a later size's XLA-HVP arm — observed 1100 s
    # remote compiles at 1024 nodes — cannot lose the finished sizes.
    timed_all: dict = {}
    floor_ms = None

    def floor_arm():
        @jax.jit
        def floor_fn(c):
            return (c * 1.000001).astype(jnp.float32).sum()

        zc = jnp.zeros((8, 128), jnp.float32)
        np.asarray(floor_fn(zc))
        return lambda: np.asarray(floor_fn(zc))

    def write_report():
        fl = min(
            v["best_ms"] for k, v in timed_all.items()
            if k.startswith("floor")
        )
        best = {
            k: v["best_ms"] for k, v in timed_all.items()
            if not k.startswith("floor")
        }
        corrected = {k: best[k] - fl for k in best}
        mfu = {
            k: (meta[int(k.split("@")[1])]["flops_per_step"] / peak * 1e3)
            / corrected[k]
            for k in corrected
        }
        report = {
            "backend": jax.default_backend(),
            "sizes": meta,
            "first_loss": first_loss,
            "raw": timed_all,
            "best_ms": best,
            "floor_corrected_ms": corrected,
            "mfu_floor_corrected": mfu,
            "dispatch_floor_ms": fl,
        }
        for k in sorted(corrected):
            print(
                f"[so-wide] {k}: {corrected[k]:.1f} ms/step "
                f"mfu={mfu[k] * 100:.1f}%",
                file=sys.stderr,
            )
        with open(os.path.join(SELF_DIR, "so_wide_probe.json"), "w") as f:
            json.dump(report, f, indent=2)
        return report

    if cli.merge and os.path.exists(os.path.join(SELF_DIR, "so_wide_probe.json")):
        with open(os.path.join(SELF_DIR, "so_wide_probe.json")) as f:
            prev = json.load(f)
        meta.update({int(k): v for k, v in prev.get("sizes", {}).items()})
        first_loss.update(prev.get("first_loss", {}))
        timed_all.update(prev.get("raw", {}))

    impls = ("fhvp",) if cli.skip_hvp else ("fhvp", "hvp")
    for nodes, width in sizes.items():
        state0, tasks, graph, model_cfg, meta_cfg = build_inputs(
            width, dtype
        )
        assert int(graph.padded_nodes) == nodes, graph.padded_nodes
        step_flops = flops_per_meta_step(state0, tasks, model_cfg, meta_cfg)
        t_win = int(tasks.support_x.shape[2])
        chunk = hvp_chunk_size(
            t_win, nodes, model_cfg.hidden_channels, model_cfg.lstm_hidden,
            model_cfg.lstm_layers, itemsize=2,
        )
        meta[nodes] = {"flops_per_step": step_flops, "hvp_chunk": chunk}
        print(f"[so-wide] nodes={nodes} chunk={chunk}", file=sys.stderr)

        for impl in impls:
            key = f"{impl}@{nodes}"
            cfg_i = dataclasses.replace(meta_cfg, so_impl=impl)
            step = make_jit_meta_step(model_cfg, cfg_i)
            st = jax.tree.map(lambda x: x + 0, state0)
            t0 = time.perf_counter()
            st, m = step(st, tasks, jax.random.key(7))
            np.asarray(m["meta_loss"])
            print(
                f"[so-wide] {key} compiled+ran "
                f"{time.perf_counter() - t0:.1f}s",
                file=sys.stderr,
            )
            # Numerics-gate observable: the loss ONE STEP LATER, i.e.
            # after an update taken with this impl's SO meta-gradient.
            # (The first step's own meta_loss is computed at the shared
            # initial params and is identical by construction — gating on
            # it, as the round-4 draft did, detects nothing.)
            st, m2 = step(st, tasks, jax.random.key(11))
            first_loss[key] = float(np.asarray(m2["meta_loss"]))
            print(
                f"[so-wide] {key} post-update loss={first_loss[key]:.6f}",
                file=sys.stderr,
            )
            states[key] = st

            def rep(key=key, step=step, tasks=tasks):
                st, m = step(states[key], tasks, jax.random.key(7))
                states[key] = st
                np.asarray(m["meta_loss"])

            arms[key] = rep

        # Numerics gate (ADVICE r4): the two SO implementations must agree
        # at these widths BEFORE any timing — a routing/numerics regression
        # aborts the probe instead of producing a silently-invalid A/B.
        # bf16 compute + a grad-of-grad depth of rounding => 2e-2 relative.
        if not cli.skip_hvp:
            fa, fb = first_loss[f"fhvp@{nodes}"], first_loss[f"hvp@{nodes}"]
            rel = abs(fa - fb) / max(abs(fb), 1e-6)
            if not rel <= 2e-2:
                raise SystemExit(
                    f"[so-wide] SO impl divergence at {nodes} nodes: "
                    f"fhvp={fa:.6f} hvp={fb:.6f} (rel {rel:.3e} > 2e-2)"
                )

        size_arms = {k: arms.pop(k) for k in list(arms)}
        size_arms[f"floor@{nodes}"] = floor_arm()
        timed = run_interleaved(size_arms, rounds, f"so-wide@{nodes}")
        timed_all.update(timed)
        report = write_report()

    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
