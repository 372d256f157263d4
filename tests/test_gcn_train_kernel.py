"""Fused GCN training kernel (ops/fused_gcn_train.py) vs the XLA encoder.

Interpret-mode execution of the real kernel bodies on CPU: train-mode
forward parity (bit-identical dropout masks), full gradient parity
(x + every w/b leaf), the final_dropout (standalone STGCN) variant, and
the FO meta-gradient integration. TPU parity is asserted by bench.py's
default gate.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from weatherforecast_stgcn_maml_tpu.config import ModelConfig
from weatherforecast_stgcn_maml_tpu.models.stgcn import apply_encoder, init_encoder
from weatherforecast_stgcn_maml_tpu.ops import fused_gcn_train

CFG = ModelConfig(
    hidden_channels=16, gcn_layers=3, lstm_hidden=8, lstm_layers=1,
    window=4, horizon=2, koppen_dim=4, gcn_dropout=0.3,
)


def _setup(seed=0, n=32):
    enc = init_encoder(jax.random.key(seed), CFG)
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.uniform(size=(n, n)).astype(np.float32) / n)
    x = jnp.asarray(
        rng.normal(size=(CFG.window, n, CFG.in_channels)), jnp.float32
    )
    return enc, a, x


def _xla(enc, a, x, **kw):
    return apply_encoder(enc, a, x, CFG, train=True, use_pallas=False, **kw)


def _fused(enc, a, x, **kw):
    with fused_gcn_train.force_interpret():
        return apply_encoder(enc, a, x, CFG, train=True, use_pallas=True, **kw)


def test_train_forward_parity():
    enc, a, x = _setup()
    rng = jax.random.key(5)
    ref = _xla(enc, a, x, rng=rng)
    got = _fused(enc, a, x, rng=rng)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_final_dropout_variant():
    enc, a, x = _setup(1)
    rng = jax.random.key(6)
    ref = _xla(enc, a, x, rng=rng, final_dropout=True)
    got = _fused(enc, a, x, rng=rng, final_dropout=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_grad_parity_all_leaves():
    enc, a, x = _setup(2)
    rng = jax.random.key(7)
    w_out = jnp.asarray(
        np.random.default_rng(3).normal(
            size=(CFG.window, 32, CFG.hidden_channels)
        ),
        jnp.float32,
    )

    def loss(fn):
        return lambda enc, x: jnp.sum(fn(enc, a, x, rng=rng) * w_out)

    gp_ref, gx_ref = jax.grad(loss(_xla), argnums=(0, 1))(enc, x)
    gp_got, gx_got = jax.grad(loss(_fused), argnums=(0, 1))(enc, x)
    np.testing.assert_allclose(
        np.asarray(gx_got), np.asarray(gx_ref), rtol=1e-4, atol=1e-5
    )
    for a_, b_ in zip(jax.tree.leaves(gp_ref), jax.tree.leaves(gp_got)):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a_), rtol=1e-4, atol=1e-5
        )


def test_grad_parity_across_time_blocks(monkeypatch):
    """W=8 with _TIME_BLOCK=4 runs TWO grid programs, covering the
    cross-program dW/db accumulation; _TIME_BLOCK=1 covers the unblocked
    per-slice configuration. Both must match XLA."""
    cfg8 = dataclasses.replace(CFG, window=8)
    enc = init_encoder(jax.random.key(11), cfg8)
    rng_np = np.random.default_rng(11)
    n = 32
    a = jnp.asarray(rng_np.uniform(size=(n, n)).astype(np.float32) / n)
    x = jnp.asarray(
        rng_np.normal(size=(cfg8.window, n, cfg8.in_channels)), jnp.float32
    )
    rng = jax.random.key(12)

    def loss(use_pallas):
        def f(enc):
            if use_pallas:
                with fused_gcn_train.force_interpret():
                    out = apply_encoder(
                        enc, a, x, cfg8, train=True, rng=rng, use_pallas=True
                    )
            else:
                out = apply_encoder(
                    enc, a, x, cfg8, train=True, rng=rng, use_pallas=False
                )
            return jnp.sum(out ** 2)

        return f

    g_ref = jax.grad(loss(False))(enc)
    for wb in (4, 1):
        monkeypatch.setattr(fused_gcn_train, "_TIME_BLOCK", wb)
        g_got = jax.grad(loss(True))(enc)
        for a_, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
            np.testing.assert_allclose(
                np.asarray(b_), np.asarray(a_), rtol=1e-4, atol=1e-5,
                err_msg=f"wb={wb}",
            )


def test_single_layer_stack():
    cfg1 = dataclasses.replace(CFG, gcn_layers=1)
    enc = init_encoder(jax.random.key(4), cfg1)
    rng_np = np.random.default_rng(4)
    n = 16
    a = jnp.asarray(rng_np.uniform(size=(n, n)).astype(np.float32) / n)
    x = jnp.asarray(
        rng_np.normal(size=(cfg1.window, n, cfg1.in_channels)), jnp.float32
    )
    rng = jax.random.key(8)
    # gcn_layers=1 with final_dropout=True exercises the 1-layer + mask path.
    ref = apply_encoder(
        enc, a, x, cfg1, train=True, rng=rng, use_pallas=False,
        final_dropout=True,
    )
    with fused_gcn_train.force_interpret():
        got = apply_encoder(
            enc, a, x, cfg1, train=True, rng=rng, use_pallas=True,
            final_dropout=True,
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def loss(use_pallas):
        def f(enc):
            if use_pallas:
                with fused_gcn_train.force_interpret():
                    out = apply_encoder(
                        enc, a, x, cfg1, train=True, rng=rng, use_pallas=True,
                        final_dropout=True,
                    )
            else:
                out = apply_encoder(
                    enc, a, x, cfg1, train=True, rng=rng, use_pallas=False,
                    final_dropout=True,
                )
            return jnp.sum(out ** 2)

        return f

    g_ref = jax.grad(loss(False))(enc)
    g_got = jax.grad(loss(True))(enc)
    for a_, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a_), rtol=1e-4, atol=1e-5
        )


def test_fo_meta_grad_through_gcn_kernel(tiny_model_cfg):
    """Full FOMAML meta-gradient with the fused GCN training kernel active
    in the model (the hybrid's encoder) — must match the XLA path."""
    from weatherforecast_stgcn_maml_tpu.config import MetaConfig
    from weatherforecast_stgcn_maml_tpu.train import maml

    meta_cfg = MetaConfig(
        second_order=False, inner_epochs=1, inner_batches=2, meta_batch=2,
        grad_accum=1,
    )
    n = 8
    rng = np.random.default_rng(9)
    mk = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    task = maml.Task(
        support_x=mk(2, tiny_model_cfg.window, n, tiny_model_cfg.feature_channels),
        support_y=mk(2, tiny_model_cfg.horizon, n, 12),
        query_x=mk(1, tiny_model_cfg.window, n, tiny_model_cfg.feature_channels),
        query_y=mk(1, tiny_model_cfg.horizon, n, 12),
        koppen=jnp.asarray(3, jnp.int32),
        a_hat=jnp.eye(n, dtype=jnp.float32),
        node_mask=jnp.ones((n,), jnp.float32),
    )
    params = maml.init_meta_state(
        jax.random.key(0), tiny_model_cfg, meta_cfg
    ).params

    def meta_grad(use_pallas):
        cfg = dataclasses.replace(tiny_model_cfg, use_pallas_gcn=use_pallas)
        return jax.grad(
            lambda p: maml.adapt_and_query_loss(
                p, task, jax.random.key(2), cfg, meta_cfg
            )
        )(params)

    g_ref = meta_grad(False)
    with fused_gcn_train.force_interpret():
        g_got = meta_grad(True)
    for a_, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a_), rtol=2e-4, atol=1e-6
        )


def test_float64_never_takes_fused_path(monkeypatch):
    """The train kernels accumulate in f32 (preferred_element_type), so the
    float64 FD-test configuration must route to the layerwise XLA path even
    under force_interpret (repo matmul rule; round-3 review finding)."""
    def _boom(*a, **k):
        raise AssertionError("fused path taken at float64")

    monkeypatch.setattr(fused_gcn_train, "gcn_stack_train", _boom)
    cfg64 = dataclasses.replace(CFG, compute_dtype="float64")
    enc, a, x = _setup(3)
    with jax.enable_x64(True):
        enc64 = jax.tree.map(lambda v: jnp.asarray(np.asarray(v), jnp.float64), enc)
        with fused_gcn_train.force_interpret():
            out = apply_encoder(
                enc64, jnp.asarray(np.asarray(a), jnp.float64),
                jnp.asarray(np.asarray(x), jnp.float64), cfg64,
                train=True, use_pallas=True, rng=jax.random.key(9),
            )
    assert out.dtype == jnp.float64


def test_grad_with_bfloat16_biases():
    """custom_vjp cotangent dtypes must match the primals': bf16-cast params
    previously crashed because db was hardcoded to f32 (round-3 review
    finding). Only checks the VJP plumbing accepts non-f32 leaves."""
    enc, a, x = _setup(4)
    enc16 = jax.tree.map(lambda v: v.astype(jnp.bfloat16), enc)
    rng = jax.random.key(11)

    def loss(p):
        return jnp.sum(_fused(p, a, x, rng=rng) ** 2)

    grads = jax.grad(loss)(enc16)
    flat = jax.tree.leaves(grads)
    assert all(g.dtype == jnp.bfloat16 for g in flat)
    assert all(np.isfinite(np.asarray(g, np.float32)).all() for g in flat)
