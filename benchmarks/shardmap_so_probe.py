"""Validate + time SECOND-ORDER MAML on the shard_map path, real TPU.

CPU-mesh tests (tests/test_parallel.py::test_meta_shardmap_2d_second_order_
f64) prove the SO shard_map semantics exactly, but only on the XLA fallback
routes (Pallas interpret mode cannot trace under manual axes). This probe
exercises the KERNEL-ENGAGED SO sharding on the real chip with a 1x1 mesh
(collectives no-op; Mosaic lowering of the custom_jvp R-operator kernels
under manual axes + the per-shard axis_index rng plumbing are real):

  1. gradient parity: make_local_grad_loss_fused (the fhvp composition the
     SO custom_vjp jvp's) vs jax.grad of the local fused-kernel loss — same
     dropout streams, same kernels, so the values must agree to bf16 noise;
  2. per-task loss parity of the full SO shard_map meta step vs the
     single-device SO step (both so_impl="fhvp");
  3. interleaved step timing: single SO vs shard_map SO.

`--nodes {1024,2048,4096}` composes the three round-4/5 axes at once
(VERDICT r4 item 8): wide regions (so_wide_probe.py's box widths,
meta_batch=2/no-accum like that probe), second order, shard_map 1x1 —
asserting the batch-CHUNKED R-operator routing (train/so_fused.py
fused_hvp_chunk) stays engaged per shard before timing. Wide runs write
benchmarks/shardmap_so_wide_probe.json.

Output: benchmarks/shardmap_so_probe.json.
Run: cd /root/repo && python benchmarks/shardmap_so_probe.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))
sys.path.insert(0, SELF_DIR)


# Padded node count -> lon/lat box width in degrees (so_wide_probe.py:41).
WIDE_SIZES = {1024: 7.5, 2048: 11.0, 4096: 15.75}


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument(
        "--nodes", type=int, default=0, choices=[0, *WIDE_SIZES],
        help="0 = reference-scale 512-node default; otherwise compose the "
        "wide-batch chunked-HVP routing with the shard_map SO step",
    )
    args = ap.parse_args(argv)
    rounds = args.rounds

    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from _interleave import run_interleaved
    from weatherforecast_stgcn_maml_tpu.config import (
        DataConfig,
        MetaConfig,
        ModelConfig,
    )
    from weatherforecast_stgcn_maml_tpu.data.synthetic import (
        synthetic_region_for_box,
    )
    from weatherforecast_stgcn_maml_tpu.parallel.mesh import make_mesh_2d
    from weatherforecast_stgcn_maml_tpu.parallel.meta_sp import (
        make_shardmap_meta_step_2d,
    )
    from weatherforecast_stgcn_maml_tpu.parallel.spatial import (
        hybrid_local_forward,
        psum_masked_mse,
    )
    from weatherforecast_stgcn_maml_tpu.train.maml import (
        init_meta_state,
        make_jit_meta_step,
    )
    from weatherforecast_stgcn_maml_tpu.train.so_fused import (
        make_local_grad_loss_fused,
    )
    from weatherforecast_stgcn_maml_tpu.train.tasks import (
        build_meta_tasks,
        stack_tasks,
    )
    from weatherforecast_stgcn_maml_tpu.utils.prng import make_key

    import dataclasses

    from weatherforecast_stgcn_maml_tpu.train.so_fused import fused_hvp_chunk

    model_cfg = ModelConfig(compute_dtype="bfloat16")
    if args.nodes:
        # Wide composed mode: so_wide_probe's region geometry + task shape.
        w = WIDE_SIZES[args.nodes]
        meta_cfg = MetaConfig(meta_batch=2, grad_accum=1, second_order=True)
        boxes = [
            (10.0 + (w + 2) * i, 10.0 + (w + 2) * i + w, 20.0, 20.0 + w)
            for i in range(2)
        ]
    else:
        meta_cfg = MetaConfig(second_order=True)  # so_impl default = "fhvp"
        boxes = [(10.0 + 6 * i, 15.0 + 6 * i, 20.0, 25.0) for i in range(4)]
    regions = [
        synthetic_region_for_box(b, num_timesteps=160, seed=i)
        for i, b in enumerate(boxes)
    ]
    built = build_meta_tasks(regions, model_cfg, meta_cfg, DataConfig())
    tasks = stack_tasks([b.task for b in built])
    tasks = jax.tree.map(jnp.asarray, tasks)  # device-staged (repo rule)

    n_pad = int(tasks.a_hat.shape[-1])
    report: dict = {
        "backend": jax.default_backend(),
        "nodes": n_pad,
        "so_impl": meta_cfg.so_impl,
    }
    if args.nodes:
        assert n_pad == args.nodes, (n_pad, args.nodes)
        # The whole point of the composed probe: the per-shard batch (all
        # n_pad rows at sp=1) must route through the batch-CHUNKED
        # R-operator kernels, not silently fall back to the XLA HVP.
        chunk = fused_hvp_chunk(model_cfg, model_cfg.window, n_pad)
        assert chunk is not None and chunk < n_pad, (
            f"chunked fused HVP not engaged at {n_pad} nodes (chunk={chunk})"
        )
        report["hvp_chunk"] = int(chunk)
        print(f"[shardmap-so] wide mode: {n_pad} nodes, hvp_chunk={chunk}",
              file=sys.stderr)
    key = make_key(7, meta_cfg.rng_impl)
    mesh = make_mesh_2d(1, 1)

    # --- 1. per-shard gradient parity: fused composition vs jax.grad ------
    model_cfg_x = dataclasses.replace(
        model_cfg, lstm_kernel="xla", use_pallas_gcn=False,
        use_pallas_lstm=False,
    )

    def _loss_on(mc):
        def loss(p, aux, step_rng):
            xb, yb, a_rows, koppen, node_mask = aux
            preds = hybrid_local_forward(
                p, a_rows, xb, koppen, mc, "sp", train=True, rng=step_rng
            )
            return psum_masked_mse(preds, yb, node_mask, "sp")

        return loss

    loss_fast = _loss_on(model_cfg)
    fused_grad = make_local_grad_loss_fused(model_cfg, "sp", _loss_on(model_cfg_x))

    params0 = init_meta_state(jax.random.key(0), model_cfg, meta_cfg).params
    aux0 = (
        tasks.support_x[0, 0],
        tasks.support_y[0, 0],
        tasks.a_hat[0],
        tasks.koppen[0],
        tasks.node_mask[0],
    )

    def both(p, aux, k):
        pv = jax.tree.map(
            lambda a: jax.lax.pcast(a, "sp", to="varying"), p
        )
        g1 = jax.grad(loss_fast)(pv, aux, k)
        g2 = fused_grad(pv, aux, k)
        return g1, g2

    # aux0 fields are already indexed down to one (task, sample):
    # x [W, N, C], y [H, N, 12], a_hat [N, N], koppen [], node_mask [N].
    aux_specs = (
        P(None, "sp", None), P(None, "sp", None),
        P("sp", None), P(), P("sp"),
    )
    g1, g2 = jax.jit(
        jax.shard_map(
            both, mesh=mesh, in_specs=(P(), aux_specs, P()),
            out_specs=(P("sp"), P("sp")),
        )
    )(params0, aux0, key)
    rels = []
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = max(float(np.max(np.abs(a))), 1e-6)
        rels.append(float(np.max(np.abs(a - b))) / denom)
    report["grad_parity_max_rel"] = max(rels)
    print(
        f"[shardmap-so] fused-vs-autodiff local grad: max rel "
        f"{max(rels):.2e}", file=sys.stderr,
    )

    # --- 2. full SO meta-step loss parity ---------------------------------
    state_a = init_meta_state(jax.random.key(0), model_cfg, meta_cfg)
    single = make_jit_meta_step(model_cfg, meta_cfg)
    _, m1 = single(state_a, tasks, key)
    l1 = np.asarray(m1["per_task_loss"])

    state_b = init_meta_state(jax.random.key(0), model_cfg, meta_cfg)
    shmap = make_shardmap_meta_step_2d(
        model_cfg, meta_cfg, mesh, donate_state=False
    )
    _, m2 = shmap(state_b, tasks, key)
    l2 = np.asarray(m2["per_task_loss"])
    report["per_task_loss_single"] = l1.tolist()
    report["per_task_loss_shardmap"] = l2.tolist()
    rel = float(np.max(np.abs(l1 - l2) / np.maximum(np.abs(l1), 1e-8)))
    report["max_rel_loss_diff"] = rel
    print(f"[shardmap-so] SO loss agreement: max rel diff {rel:.2e}",
          file=sys.stderr)

    # --- 3. interleaved timing --------------------------------------------
    import weatherforecast_stgcn_maml_tpu.train.maml as maml

    sa = init_meta_state(jax.random.key(1), model_cfg, meta_cfg)
    sb = jax.tree.map(lambda x: x, sa)
    single_t = jax.jit(maml.make_meta_step(model_cfg, meta_cfg))
    np.asarray(single_t(sa, tasks, key)[1]["meta_loss"])
    np.asarray(shmap(sb, tasks, key)[1]["meta_loss"])

    def rep_single():
        np.asarray(single_t(sa, tasks, key)[1]["meta_loss"])

    def rep_shmap():
        np.asarray(shmap(sb, tasks, key)[1]["meta_loss"])

    timed = run_interleaved(
        {"single_so": rep_single, "shardmap_so_1x1": rep_shmap}, rounds,
        "shardmap-so",
    )
    report["raw"] = timed
    for k in ("single_so", "shardmap_so_1x1"):
        print(f"[shardmap-so] {k}: best {timed[k]['best_ms']:.1f} ms "
              f"median {timed[k]['median_ms']:.1f} ms", file=sys.stderr)

    out_name = (
        "shardmap_so_wide_probe.json" if args.nodes
        else "shardmap_so_probe.json"
    )
    with open(os.path.join(SELF_DIR, out_name), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
