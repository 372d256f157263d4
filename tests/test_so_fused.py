"""Fused second-order path: R-operator kernels (ops/fused_lstm_hvp.py) and
the fused Hessian-transpose wiring (train/so_fused.py).

Kernel bodies run through the Pallas interpreter on CPU and are compared
against jax.jvp over plain-XLA autodiff of a reference stack — i.e. the
exact object the kernels hand-schedule. End-to-end: the `so_impl="fhvp"`
meta-gradient must match the linearize-and-transpose route.
"""

import dataclasses

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from weatherforecast_stgcn_maml_tpu.ops import fused_lstm_hvp as fh

T, B, C, H, L = 5, 16, 24, 8, 3
KEEP = 0.75


def _ref_stack(x, wcat0, wcatr, b2d, masks):
    """Plain-jnp merged-gates stack: x [T, B, C] -> (h_last, h_all, c_all).

    The mathematical function both kernel pairs implement (mirrors
    ops/fused_lstm_stack.py's layout: wcat0 [C+H, 4H], wcatr [L-1, 2H, 4H],
    b2d [L, 4H], int8 masks [L-1, T, B, H] with the 1/keep scale applied
    in-graph).
    """
    t, b, _ = x.shape
    n_layers = b2d.shape[0]
    hidden = b2d.shape[1] // 4
    h_all = []
    c_all = []
    inp_seq = x
    for l in range(n_layers):
        w = wcat0 if l == 0 else wcatr[l - 1]
        h = jnp.zeros((b, hidden), jnp.float32)
        c = jnp.zeros((b, hidden), jnp.float32)
        hs = []
        cs = []
        for s in range(t):
            xh = jnp.concatenate([inp_seq[s], h], axis=1)
            gates = xh @ w + b2d[l]
            i = jax.nn.sigmoid(gates[:, :hidden])
            f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
            g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
            o = jax.nn.sigmoid(gates[:, 3 * hidden:])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            hs.append(h)
            cs.append(c)
        h_all.append(jnp.stack(hs))
        c_all.append(jnp.stack(cs))
        inp_seq = h_all[-1]
        if l < n_layers - 1 and masks is not None:
            inp_seq = inp_seq * (masks[l].astype(jnp.float32) / KEEP)
    return h_all[-1][-1], jnp.stack(h_all), jnp.stack(c_all)


def _setup(seed=0, with_masks=True, layers=L):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(T, B, C)).astype(np.float32))
    wcat0 = jnp.asarray(
        rng.normal(size=(C + H, 4 * H)).astype(np.float32) * 0.3
    )
    wcatr = jnp.asarray(
        rng.normal(size=(max(layers - 1, 1), 2 * H, 4 * H)).astype(np.float32)
        * 0.3
    )
    b2d = jnp.asarray(rng.normal(size=(layers, 4 * H)).astype(np.float32) * 0.1)
    masks = None
    if with_masks and layers > 1:
        masks = jnp.asarray(
            (rng.uniform(size=(layers - 1, T, B, H)) < KEEP).astype(np.int8)
        )
    return x, wcat0, wcatr, b2d, masks


def _tangents(seed, *primals):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.normal(size=p.shape).astype(np.float32)) for p in primals
    )


@pytest.mark.parametrize("with_masks", [True, False])
def test_rfwd_jvp_matches_autodiff(with_masks):
    x, wcat0, wcatr, b2d, masks = _setup(0, with_masks)
    keep = KEEP if with_masks else 1.0
    fwd_op, _ = fh.hvp_stack_ops("float32", True, keep, masks is not None)

    def ref(x_, w0_, wr_, b_):
        return _ref_stack(x_, w0_, wr_, b_, masks)

    def fused(x_, w0_, wr_, b_):
        args = (x_, w0_, wr_, b_) + ((masks,) if masks is not None else ())
        return fwd_op(*args)

    prim = (x, wcat0, wcatr, b2d)
    tans = _tangents(1, *prim)
    out_ref, tan_ref = jax.jvp(ref, prim, tans)
    out_got, tan_got = jax.jvp(fused, prim, tans)
    for a, b in zip(jax.tree.leaves(out_ref), jax.tree.leaves(out_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(tan_ref), jax.tree.leaves(tan_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("with_masks", [True, False])
def test_rbwd_jvp_matches_autodiff(with_masks):
    x, wcat0, wcatr, b2d, masks = _setup(2, with_masks)
    keep = KEEP if with_masks else 1.0
    _, bwd_op = fh.hvp_stack_ops("float32", True, keep, masks is not None)
    g = jnp.asarray(
        np.random.default_rng(3).normal(size=(B, H)).astype(np.float32)
    )

    def ref_grads(g_, x_, w0_, wr_, b_):
        # The object the backward kernel computes: VJP of the stack's
        # h_last output at cotangent g_.
        def f(x__, w0__, wr__, b__):
            return _ref_stack(x__, w0__, wr__, b__, masks)[0]

        _, vjp = jax.vjp(f, x_, w0_, wr_, b_)
        return vjp(g_)

    def fused_grads(g_, x_, w0_, wr_, b_):
        _, h_all, c_all = _ref_stack(x_, w0_, wr_, b_, masks)
        args = (g_, x_, h_all, c_all, w0_, wr_, b_)
        if masks is not None:
            args = args + (masks,)
        return bwd_op(*args)

    prim = (g, x, wcat0, wcatr, b2d)
    tans = _tangents(4, *prim)
    out_ref, tan_ref = jax.jvp(ref_grads, prim, tans)
    out_got, tan_got = jax.jvp(fused_grads, prim, tans)
    for a, b in zip(jax.tree.leaves(out_ref), jax.tree.leaves(out_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(tan_ref), jax.tree.leaves(tan_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-3)


def test_rbwd_single_layer():
    x, wcat0, wcatr, b2d, _ = _setup(5, with_masks=False, layers=1)
    _, bwd_op = fh.hvp_stack_ops("float32", True, 1.0, False)
    g = jnp.asarray(
        np.random.default_rng(6).normal(size=(B, H)).astype(np.float32)
    )

    def ref_grads(g_, x_, w0_, b_):
        def f(x__, w0__, b__):
            return _ref_stack(x__, w0__, wcatr, b__, None)[0]

        _, vjp = jax.vjp(f, x_, w0_, b_)
        return vjp(g_)

    def fused_grads(g_, x_, w0_, b_):
        _, h_all, c_all = _ref_stack(x_, w0_, wcatr, b_, None)
        dx, dw0, _, db = bwd_op(g_, x_, h_all, c_all, w0_, wcatr, b_)
        return dx, dw0, db

    prim = (g, x, wcat0, b2d)
    tans = _tangents(7, *prim)
    out_ref, tan_ref = jax.jvp(ref_grads, prim, tans)
    out_got, tan_got = jax.jvp(fused_grads, prim, tans)
    for a, b in zip(jax.tree.leaves(out_ref), jax.tree.leaves(out_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(tan_ref), jax.tree.leaves(tan_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# End-to-end wiring (train/so_fused.py + so_impl="fhvp")
# ---------------------------------------------------------------------------

from weatherforecast_stgcn_maml_tpu.config import (  # noqa: E402
    DataConfig,
    MetaConfig,
    ModelConfig,
)
from weatherforecast_stgcn_maml_tpu.data.synthetic import (  # noqa: E402
    synthetic_region_for_box,
)
from weatherforecast_stgcn_maml_tpu.models.losses import masked_mse  # noqa: E402
from weatherforecast_stgcn_maml_tpu.models.registry import (  # noqa: E402
    apply_model,
    init_model,
)
from weatherforecast_stgcn_maml_tpu.train.maml import (  # noqa: E402
    adapt_and_query_loss,
    init_meta_state,
)
from weatherforecast_stgcn_maml_tpu.train.so_fused import (  # noqa: E402
    make_grad_loss_fused,
)
from weatherforecast_stgcn_maml_tpu.train.tasks import (  # noqa: E402
    build_meta_tasks,
)

MODEL_CFG = ModelConfig(
    hidden_channels=8,
    gcn_layers=2,
    lstm_hidden=8,
    lstm_layers=2,
    window=6,
    horizon=2,
    koppen_dim=4,
    gcn_dropout=0.2,
    lstm_dropout=0.25,
)
META_CFG = MetaConfig(
    meta_batch=1,
    grad_accum=1,
    inner_epochs=1,
    inner_batches=2,
    query_batches=1,
    query_train_mode=False,
    second_order=True,
)


def _task(model_cfg=MODEL_CFG, meta_cfg=META_CFG):
    regions = [
        synthetic_region_for_box((10.0, 10.5, 20.0, 20.5), num_timesteps=40,
                                 seed=0)
    ]
    task = build_meta_tasks(regions, model_cfg, meta_cfg, DataConfig())[0].task
    return jax.tree.map(jnp.asarray, task)


def _aux(task, idx=0):
    return (
        task.support_x[idx],
        task.support_y[idx],
        task.a_hat,
        task.koppen,
        task.node_mask,
    )


def _loss(model_cfg):
    def loss(p, aux, step_rng):
        xb, yb, a_hat, koppen, node_mask = aux
        preds = apply_model(
            p, a_hat, xb, koppen, model_cfg, train=True, rng=step_rng
        )
        return masked_mse(preds, yb, node_mask)

    return loss


@pytest.mark.parametrize("dropout_on", [True, False])
def test_grad_loss_fused_matches_autodiff(dropout_on):
    """The manual VJP composition (encoder/head XLA segments around the
    custom_jvp stack ops) must equal jax.grad of the support loss."""
    model_cfg = MODEL_CFG if dropout_on else dataclasses.replace(
        MODEL_CFG, gcn_dropout=0.0, lstm_dropout=0.0
    )
    task = _task(model_cfg)
    params = init_model(jax.random.key(0), model_cfg)
    aux = _aux(task)
    rng = jax.random.key(7)
    loss = _loss(model_cfg)
    g_ref = jax.grad(loss)(params, aux, rng)
    with fh.force_interpret():
        g_got = make_grad_loss_fused(model_cfg, loss)(params, aux, rng)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_grad_loss_fused_hvp_matches_autodiff():
    """jvp of the fused composition — the actual fhvp Hessian transpose —
    must equal jvp of jax.grad on the same loss."""
    task = _task()
    params = init_model(jax.random.key(1), MODEL_CFG)
    aux = _aux(task)
    rng = jax.random.key(8)
    loss = _loss(MODEL_CFG)
    ct = jax.tree.map(
        lambda p: jnp.asarray(
            np.random.default_rng(3).normal(size=p.shape), p.dtype
        ),
        params,
    )
    _, hv_ref = jax.jvp(
        lambda q: jax.grad(loss)(q, aux, rng), (params,), (ct,)
    )
    with fh.force_interpret():
        grad_loss = make_grad_loss_fused(MODEL_CFG, loss)
        _, hv_got = jax.jvp(
            lambda q: grad_loss(q, aux, rng), (params,), (ct,)
        )
    for a, b in zip(jax.tree.leaves(hv_ref), jax.tree.leaves(hv_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)


def test_fhvp_meta_grad_matches_xla():
    """so_impl="fhvp" (R-operator kernels through the full inner-SGD scan)
    must produce the same meta-gradient as the linearize-and-transpose
    route, f32 tolerance."""
    task = _task()
    params = init_meta_state(jax.random.key(2), MODEL_CFG, META_CFG).params
    rng = jax.random.key(5)
    grads = {}
    for impl in ("xla", "fhvp"):
        cfg = dataclasses.replace(META_CFG, so_impl=impl)
        with fh.force_interpret():
            grads[impl] = jax.grad(
                lambda p: adapt_and_query_loss(p, task, rng, MODEL_CFG, cfg)
            )(params)
    for a, b in zip(
        jax.tree.leaves(grads["xla"]), jax.tree.leaves(grads["fhvp"])
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)


def test_fhvp_fallback_off_tpu():
    """Without force_interpret on CPU, fhvp falls back to jvp-of-XLA-grad
    ("hvp" semantics) — same meta-gradient, no kernels required."""
    task = _task()
    params = init_meta_state(jax.random.key(2), MODEL_CFG, META_CFG).params
    rng = jax.random.key(5)
    grads = {}
    for impl in ("xla", "fhvp"):
        cfg = dataclasses.replace(META_CFG, so_impl=impl)
        grads[impl] = jax.grad(
            lambda p: adapt_and_query_loss(p, task, rng, MODEL_CFG, cfg)
        )(params)
    for a, b in zip(
        jax.tree.leaves(grads["xla"]), jax.tree.leaves(grads["fhvp"])
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)


# ---------------------------------------------------------------------------
# Wide-batch chunked routing (hvp_chunk_size + chunked_stack_ops)
# ---------------------------------------------------------------------------


def test_hvp_chunk_size_routing():
    """Reference shapes: 512 nodes bf16 fits unchunked; wider batches get a
    fitting divisor chunk (multiple of 8) instead of losing the fused
    route; shapes with no fitting divisor >= min_chunk return None."""
    assert fh.hvp_chunk_size(24, 512, 256, 128, 4, itemsize=2) == 512
    for b in (1024, 2048, 4096, 8192):
        c = fh.hvp_chunk_size(24, b, 256, 128, 4, itemsize=2)
        assert c is not None and c < b and b % c == 0 and c % 8 == 0
        assert fh.hvp_supported(24, c, 256, 128, 4, 2)
    # f32 residual streams: 512 rows only fit chunked.
    c32 = fh.hvp_chunk_size(24, 512, 256, 128, 4, itemsize=4)
    assert c32 is not None and c32 < 512 and 512 % c32 == 0
    assert fh.hvp_chunk_size(24, 512, 256, 128, 4, itemsize=4,
                             min_chunk=512) is None


def test_chunked_stack_ops_match_unchunked():
    """Row-chunked wrappers must be value- AND tangent-identical to the
    unchunked ops: rows are independent, masks slice per chunk, weight
    grads sum across chunks."""
    x, wcat0, wcatr, b2d, masks = _setup(4, True)
    fwd_op, bwd_op = fh.hvp_stack_ops("float32", True, KEEP, True)
    fwd_c, bwd_c = fh.chunked_stack_ops(fwd_op, bwd_op, B // 2, True)

    prim = (x, wcat0, wcatr, b2d)
    tans = _tangents(5, *prim)
    out_ref, tan_ref = jax.jvp(
        lambda *a: fwd_op(*a, masks), prim, tans
    )
    out_got, tan_got = jax.jvp(
        lambda *a: fwd_c(*a, masks), prim, tans
    )
    for a, b in zip(jax.tree.leaves((out_ref, tan_ref)),
                    jax.tree.leaves((out_got, tan_got))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)

    _, h_all, c_all = out_ref
    g = jnp.asarray(
        np.random.default_rng(6).normal(size=(B, H)).astype(np.float32)
    )
    bprim = (g, x, h_all, c_all, wcat0, wcatr, b2d)
    btans = _tangents(7, *bprim)
    bout_ref, btan_ref = jax.jvp(
        lambda *a: bwd_op(*a, masks), bprim, btans
    )
    bout_got, btan_got = jax.jvp(
        lambda *a: bwd_c(*a, masks), bprim, btans
    )
    for a, b in zip(jax.tree.leaves((bout_ref, btan_ref)),
                    jax.tree.leaves((bout_got, btan_got))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)


def test_grad_loss_fused_chunked_matches_autodiff():
    """The full fhvp composition with a forced row chunk — gradient AND
    Hessian-vector product — must match plain autodiff (wide-batch SO
    keeps the fused route instead of dropping to the XLA HVP)."""
    task = _task()
    params = init_model(jax.random.key(0), MODEL_CFG)
    aux = _aux(task)
    n = int(aux[0].shape[1])
    assert n % 2 == 0
    rng = jax.random.key(7)
    loss = _loss(MODEL_CFG)

    g_ref = jax.grad(loss)(params, aux, rng)
    with fh.force_interpret():
        g_got = make_grad_loss_fused(
            MODEL_CFG, loss, chunk_override=n // 2
        )(params, aux, rng)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)

    ct = jax.tree.map(
        lambda p: jnp.asarray(
            np.random.default_rng(9).normal(size=p.shape), p.dtype
        ),
        params,
    )
    _, hv_ref = jax.jvp(
        lambda q: jax.grad(loss)(q, aux, rng), (params,), (ct,)
    )
    with fh.force_interpret():
        grad_loss = make_grad_loss_fused(
            MODEL_CFG, loss, chunk_override=n // 2
        )
        _, hv_got = jax.jvp(
            lambda q: grad_loss(q, aux, rng), (params,), (ct,)
        )
    for a, b in zip(jax.tree.leaves(hv_ref), jax.tree.leaves(hv_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)
