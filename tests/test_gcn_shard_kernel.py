"""Node-sharded fused GCN sandwich op (ops/fused_gcn_shard.py).

Two layers of CPU coverage (plus bench.py's TPU gate for the compiled
kernels inside a real shard_map):

  * KERNEL tests — the real Pallas bodies through the interpreter,
    standalone (per-shard slices fed by hand; interpret mode cannot run
    inside a check_vma shard_map, see ops/fused_gcn_shard.force_interpret):
    forward + full custom-VJP parity vs `_layer_reference` across the
    (has_next, has_mask) matrix and across grid accumulation.
  * GLUE tests — `gcn_shard_encoder` inside real shard_map meshes with
    `force_reference` standing in for the op: gathers, per-shard mask
    draws, pcasts, and layer chaining vs the XLA `_spatial_encoder`,
    forward and gradients, plus the shard_map meta-step integration.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherforecast_stgcn_maml_tpu.config import MeshConfig, ModelConfig
from weatherforecast_stgcn_maml_tpu.models.stgcn import init_encoder
from weatherforecast_stgcn_maml_tpu.ops import fused_gcn_shard
from weatherforecast_stgcn_maml_tpu.ops.fused_gcn_shard import (
    _layer_reference,
    _shard_layer_op,
)
from weatherforecast_stgcn_maml_tpu.parallel.mesh import make_mesh
from weatherforecast_stgcn_maml_tpu.parallel.spatial import _spatial_encoder

CFG = ModelConfig(
    hidden_channels=16, gcn_layers=3, lstm_hidden=8, lstm_layers=1,
    window=4, horizon=2, koppen_dim=4, gcn_dropout=0.3,
)
CFG_XLA = dataclasses.replace(CFG, use_pallas_gcn=False)


# ---------------------------------------------------------------------------
# Kernel-level: real Pallas bodies (interpret) vs the reference semantics
# ---------------------------------------------------------------------------


def _op_inputs(seed, t=8, nl=16, n=32, hid=16, hid_next=16, has_mask=True):
    rng = np.random.default_rng(seed)
    hw_full = jnp.asarray(rng.normal(size=(t, n, hid)), jnp.float32)
    a_rows = jnp.asarray(rng.uniform(size=(nl, n)).astype(np.float32) / n)
    b2d = jnp.asarray(rng.normal(size=(1, hid)), jnp.float32)
    w_next = jnp.asarray(rng.normal(size=(hid, hid_next)), jnp.float32)
    mask = (
        jnp.asarray(rng.uniform(size=(t, nl, hid)) < 0.7).astype(jnp.int8)
        if has_mask else None
    )
    return hw_full, a_rows, b2d, w_next, mask


@pytest.mark.parametrize("has_next", [True, False])
@pytest.mark.parametrize("has_mask", [True, False])
@pytest.mark.parametrize("t", [4, 8])  # 1 and 2 grid programs (wb=4)
def test_op_forward_and_vjp_parity(has_next, has_mask, t):
    hw_full, a_rows, b2d, w_next, mask = _op_inputs(
        has_next * 2 + has_mask, t=t, has_mask=has_mask
    )
    keep = 0.7
    op = _shard_layer_op("float32", True, keep, has_next, has_mask)
    args = [hw_full, a_rows, b2d]
    if has_next:
        args.append(w_next)
    if has_mask:
        args.append(mask)

    def ref_fn(hw, b, wn):
        return _layer_reference(
            hw, a_rows, b, wn if has_next else None, mask, jnp.float32, keep
        )

    def got_fn(hw, b, wn):
        a = [hw, a_rows, b]
        if has_next:
            a.append(wn)
        if has_mask:
            a.append(mask)
        with fused_gcn_shard.force_interpret():
            return op(*a)

    ref = ref_fn(hw_full, b2d, w_next)
    got = got_fn(hw_full, b2d, w_next)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-6
        )

    # Full VJP parity: random cotangents on every output, grads w.r.t.
    # hw_full (the gather cotangent partial), bias, and w_next — covering
    # the backward kernel's relu'-recovery, mask factor, and the dW/db
    # accumulation across grid programs (t=8 runs two).
    cts = jax.tree.map(
        lambda x: jnp.asarray(
            np.random.default_rng(9).normal(size=x.shape), x.dtype
        ),
        ref,
    )

    def scalarize(fn):
        def f(hw, b, wn):
            out = fn(hw, b, wn)
            return sum(
                jnp.vdot(o.astype(jnp.float32), c.astype(jnp.float32))
                for o, c in zip(jax.tree.leaves(out), jax.tree.leaves(cts))
            )

        return f

    g_ref = jax.grad(scalarize(ref_fn), argnums=(0, 1, 2))(
        hw_full, b2d, w_next
    )
    g_got = jax.grad(scalarize(got_fn), argnums=(0, 1, 2))(
        hw_full, b2d, w_next
    )
    names = ["d_hw_full", "db", "dw_next"]
    for name, r, g in zip(names, g_ref, g_got):
        if name == "dw_next" and not has_next:
            continue  # w_next unused by both closures
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-5,
            err_msg=name,
        )


def test_shard_layer_gate_shapes():
    sup = fused_gcn_shard.shard_layer_supported
    assert sup(24, 512, 512, 256)          # reference scale, 1 shard
    assert sup(24, 256, 512, 256)          # 2 shards
    assert not sup(24, 512, 512, 200)      # hid not lane-aligned
    assert not sup(24, 500, 512, 256)      # rows not sublane-aligned
    assert not sup(24, 512, 500, 256)      # full N not lane-aligned


# ---------------------------------------------------------------------------
# Glue-level: the sharded route inside real shard_map meshes
# ---------------------------------------------------------------------------


def _mesh(n=2):
    return make_mesh(MeshConfig(data_axis="sp", num_devices=n))


def _setup(seed=0, n=128):
    enc = init_encoder(jax.random.key(seed), CFG)
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.uniform(size=(n, n)).astype(np.float32) / n)
    x = jnp.asarray(
        rng.normal(size=(CFG.window, n, CFG.in_channels)), jnp.float32
    )
    return enc, a, x


def _sharded_encoder(mesh, cfg, enc, a, x, rng, *, train, fused):
    from jax.sharding import PartitionSpec as P

    def body(enc, a_rows, x_local):
        # Per-shard rng stream, same convention as hybrid_local_forward.
        sub = (
            jax.random.fold_in(rng, jax.lax.axis_index("sp"))
            if rng is not None else None
        )
        return _spatial_encoder(
            enc, a_rows, x_local, cfg, "sp", train=train, rng=sub
        )

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("sp", None), P(None, "sp", None)),
        out_specs=P(None, "sp", None),
    )
    if fused:
        with fused_gcn_shard.force_reference():
            return f(enc, a, x)
    return f(enc, a, x)


@pytest.mark.parametrize("n_shards", [1, 2, 4])
@pytest.mark.parametrize("train", [True, False])
def test_shard_glue_forward_parity(n_shards, train):
    mesh = _mesh(n_shards)
    enc, a, x = _setup()
    rng = jax.random.key(5) if train else None
    ref = _sharded_encoder(mesh, CFG_XLA, enc, a, x, rng, train=train, fused=False)
    got = _sharded_encoder(mesh, CFG, enc, a, x, rng, train=train, fused=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


def test_shard_glue_grad_parity_all_leaves():
    """Gradients through shard_map (params + input) must match the XLA
    sharded route — covering the per-shard partial d_hw through the
    all-gather transpose and the pcast promotion of replicated leaves."""
    mesh = _mesh(2)
    enc, a, x = _setup(2)
    rng = jax.random.key(7)
    w_out = jnp.asarray(
        np.random.default_rng(3).normal(
            size=(CFG.window, 128, CFG.hidden_channels)
        ),
        jnp.float32,
    )

    def loss(cfg, fused):
        def f(enc, x):
            out = _sharded_encoder(
                mesh, cfg, enc, a, x, rng, train=True, fused=fused
            )
            return jnp.sum(out * w_out)

        return f

    gp_ref, gx_ref = jax.grad(loss(CFG_XLA, False), argnums=(0, 1))(enc, x)
    gp_got, gx_got = jax.grad(loss(CFG, True), argnums=(0, 1))(enc, x)
    np.testing.assert_allclose(
        np.asarray(gx_got), np.asarray(gx_ref), rtol=1e-4, atol=1e-5
    )
    for a_, b_ in zip(jax.tree.leaves(gp_ref), jax.tree.leaves(gp_got)):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a_), rtol=1e-4, atol=1e-5
        )


def test_shardmap_meta_step_with_fused_gcn_glue():
    """The shard_map dp x sp FO meta step with the sandwich route engaged
    (reference impl) must match the XLA-route shard_map step."""
    from weatherforecast_stgcn_maml_tpu.config import (
        DataConfig,
        MetaConfig,
    )
    from weatherforecast_stgcn_maml_tpu.data.synthetic import (
        synthetic_region_for_box,
    )
    from weatherforecast_stgcn_maml_tpu.parallel.mesh import shard_task_batch_2d
    from weatherforecast_stgcn_maml_tpu.parallel.meta_sp import (
        make_shardmap_meta_step_2d,
    )
    from weatherforecast_stgcn_maml_tpu.train.maml import init_meta_state
    from weatherforecast_stgcn_maml_tpu.train.tasks import (
        build_meta_tasks,
        stack_tasks,
    )

    model_cfg = ModelConfig(
        hidden_channels=16, gcn_layers=2, lstm_hidden=8, lstm_layers=2,
        window=4, horizon=2, koppen_dim=4,
        gcn_dropout=0.3, lstm_dropout=0.0,
    )
    meta_cfg = MetaConfig(
        meta_batch=2, grad_accum=1, inner_epochs=1, inner_batches=2,
        query_train_mode=False,
    )
    mesh = make_mesh(
        MeshConfig(num_devices=4, spatial_devices=2, sp_impl="shardmap")
    )
    boxes = [(10.0 + i, 10.75 + i, 20.0, 20.75) for i in range(2)]
    regions = [
        synthetic_region_for_box(b, num_timesteps=40, seed=i)
        for i, b in enumerate(boxes)
    ]
    built = build_meta_tasks(regions, model_cfg, meta_cfg, DataConfig())
    tasks = stack_tasks([b.task for b in built])
    tasks = shard_task_batch_2d(tasks, mesh)
    state = init_meta_state(jax.random.key(0), model_cfg, meta_cfg)

    step = make_shardmap_meta_step_2d(
        model_cfg, meta_cfg, mesh, donate_state=False
    )
    _, m_ref = step(state, tasks, jax.random.key(3))
    # Fresh step instance: the route flag is read at TRACE time.
    with fused_gcn_shard.force_reference():
        step_fused = make_shardmap_meta_step_2d(
            model_cfg, meta_cfg, mesh, donate_state=False
        )
        _, m_got = step_fused(state, tasks, jax.random.key(3))
    np.testing.assert_allclose(
        float(m_got["meta_loss"]), float(m_ref["meta_loss"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(m_got["per_task_loss"]),
        np.asarray(m_ref["per_task_loss"]), rtol=1e-5,
    )
