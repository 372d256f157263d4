"""Fused LSTM recurrence kernel (ops/lstm_scan.py) vs the XLA scan.

CI runs on the CPU backend, where the Mosaic kernels cannot compile — so
these tests execute the REAL kernel bodies through the Pallas interpreter
(`interpret=True`): forward math, the reverse-time backward kernel, the
carry-reset-at-t==0 logic, and vmap batching are all exercised. Bit-exact
TPU execution is additionally asserted by `bench.py`'s default kernel-parity
gate every round (VERDICT r2 next-round item 2).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherforecast_stgcn_maml_tpu.ops.lstm_scan import (
    lstm_recurrence,
    lstm_recurrence_xla,
    pallas_supported,
)

T, B, H = 5, 16, 128  # hidden must be a multiple of 128 for the kernel


def _inputs(seed=0, t=T, b=B, h=H):
    rng = np.random.default_rng(seed)
    xp = jnp.asarray(rng.normal(size=(t, b, 4 * h)).astype(np.float32))
    wh = jnp.asarray(rng.normal(size=(h, 4 * h)).astype(np.float32) * 0.1)
    return xp, wh


def test_forward_parity_interpret():
    xp, wh = _inputs()
    ref = lstm_recurrence_xla(xp, wh)
    got = lstm_recurrence(xp, wh, kernel="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_backward_parity_interpret():
    xp, wh = _inputs(1)
    # Weighted sum so every (t, b, h) output position has a distinct cotangent.
    w_out = jnp.asarray(
        np.random.default_rng(2).normal(size=(T, B, H)).astype(np.float32)
    )

    def loss(fn):
        return lambda xp, wh: jnp.sum(fn(xp, wh) * w_out)

    ref_fn = loss(lambda xp, wh: lstm_recurrence_xla(xp, wh))
    got_fn = loss(
        lambda xp, wh: lstm_recurrence(xp, wh, kernel="pallas", interpret=True)
    )
    dxp_ref, dwh_ref = jax.grad(ref_fn, argnums=(0, 1))(xp, wh)
    dxp_got, dwh_got = jax.grad(got_fn, argnums=(0, 1))(xp, wh)
    np.testing.assert_allclose(
        np.asarray(dxp_got), np.asarray(dxp_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dwh_got), np.asarray(dwh_ref), rtol=1e-4, atol=1e-5
    )


def test_vmap_parity_interpret():
    """The meta step vmaps tasks over the op: the vmap axis becomes a
    prepended grid dimension and the carry scratch must reset per instance."""
    xps = jnp.stack([_inputs(i)[0] for i in range(3)])
    _, wh = _inputs(7)
    ref = jax.vmap(lambda xp: lstm_recurrence_xla(xp, wh))(xps)
    got = jax.vmap(
        lambda xp: lstm_recurrence(xp, wh, kernel="pallas", interpret=True)
    )(xps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_vmap_grad_parity_interpret():
    xps = jnp.stack([_inputs(i)[0] for i in range(2)])
    _, wh = _inputs(8)

    def mean_last(fn):
        return lambda xps, wh: jnp.mean(
            jax.vmap(lambda xp: fn(xp, wh))(xps)[:, -1] ** 2
        )

    ref_fn = mean_last(lambda xp, wh: lstm_recurrence_xla(xp, wh))
    got_fn = mean_last(
        lambda xp, wh: lstm_recurrence(xp, wh, kernel="pallas", interpret=True)
    )
    dxp_ref, dwh_ref = jax.grad(ref_fn, argnums=(0, 1))(xps, wh)
    dxp_got, dwh_got = jax.grad(got_fn, argnums=(0, 1))(xps, wh)
    np.testing.assert_allclose(
        np.asarray(dxp_got), np.asarray(dxp_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dwh_got), np.asarray(dwh_ref), rtol=1e-4, atol=1e-5
    )


def test_auto_falls_back_on_cpu():
    """On the CPU backend "auto" must pick the XLA scan (and be exact)."""
    xp, wh = _inputs(3)
    ref = lstm_recurrence_xla(xp, wh)
    got = lstm_recurrence(xp, wh, kernel="auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=0)


def test_supported_gate():
    assert pallas_supported(24, 512, 128)
    assert not pallas_supported(24, 512, 120)  # hidden not 128-aligned
    assert not pallas_supported(24, 513, 128)  # batch not sublane-aligned
    assert not pallas_supported(24, 65536, 128)  # VMEM blowout


def test_model_path_uses_kernel_flag(tiny_model_cfg):
    """apply_hybrid with lstm_kernel="pallas" would need TPU; assert the
    config plumb-through at least traces with the XLA fallback and that the
    second-order MAML engine forces lstm_kernel="xla"."""
    from weatherforecast_stgcn_maml_tpu.config import MetaConfig
    from weatherforecast_stgcn_maml_tpu.train import maml

    cfg = dataclasses.replace(tiny_model_cfg, lstm_kernel="auto")
    meta_cfg = MetaConfig(
        second_order=True, inner_epochs=1, inner_batches=1, meta_batch=2,
        grad_accum=1,
    )
    # Build a tiny task and take one SO meta step — would crash inside the
    # custom VJP if the pallas path were (wrongly) selected and vice versa.
    n = 8
    rng = np.random.default_rng(0)
    task = maml.Task(
        support_x=jnp.asarray(
            rng.normal(size=(1, cfg.window, n, cfg.feature_channels)),
            jnp.float32,
        ),
        support_y=jnp.asarray(
            rng.normal(size=(1, cfg.horizon, n, cfg.num_weather_vars)),
            jnp.float32,
        ),
        query_x=jnp.asarray(
            rng.normal(size=(1, cfg.window, n, cfg.feature_channels)),
            jnp.float32,
        ),
        query_y=jnp.asarray(
            rng.normal(size=(1, cfg.horizon, n, cfg.num_weather_vars)),
            jnp.float32,
        ),
        koppen=jnp.asarray(3, jnp.int32),
        a_hat=jnp.eye(n, dtype=jnp.float32),
        node_mask=jnp.ones((n,), jnp.float32),
    )
    params = maml.init_meta_state(jax.random.key(0), cfg, meta_cfg).params
    loss = maml.adapt_and_query_loss(
        params, task, jax.random.key(1), cfg, meta_cfg
    )
    g = jax.grad(
        lambda p: maml.adapt_and_query_loss(p, task, jax.random.key(1), cfg, meta_cfg)
    )(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))


def test_fo_meta_grad_through_pallas_kernel(tiny_model_cfg):
    """The FULL first-order meta-gradient with the Pallas recurrence in the
    model (interpret mode): the outer grad linearizes through the inner
    jax.grad, whose trace contains raw pallas_call primitives (no JVP
    rule) — only the stop_gradient(p) detach in maml.inner_step keeps the
    outer linearization away from them. This is the exact structure that
    crashed on TPU in round 3 before that fix; it must match the XLA-kernel
    meta-gradient numerically."""
    from weatherforecast_stgcn_maml_tpu.config import MetaConfig
    from weatherforecast_stgcn_maml_tpu.ops import lstm_scan
    from weatherforecast_stgcn_maml_tpu.train import maml

    meta_cfg = MetaConfig(
        second_order=False, inner_epochs=1, inner_batches=2, meta_batch=2,
        grad_accum=1,
    )
    n = 8
    rng = np.random.default_rng(5)
    task = maml.Task(
        support_x=jnp.asarray(
            rng.normal(
                size=(2, tiny_model_cfg.window, n, tiny_model_cfg.feature_channels)
            ),
            jnp.float32,
        ),
        support_y=jnp.asarray(
            rng.normal(size=(2, tiny_model_cfg.horizon, n, 12)), jnp.float32
        ),
        query_x=jnp.asarray(
            rng.normal(
                size=(1, tiny_model_cfg.window, n, tiny_model_cfg.feature_channels)
            ),
            jnp.float32,
        ),
        query_y=jnp.asarray(
            rng.normal(size=(1, tiny_model_cfg.horizon, n, 12)), jnp.float32
        ),
        koppen=jnp.asarray(3, jnp.int32),
        a_hat=jnp.eye(n, dtype=jnp.float32),
        node_mask=jnp.ones((n,), jnp.float32),
    )
    params = maml.init_meta_state(
        jax.random.key(0), tiny_model_cfg, meta_cfg
    ).params

    def meta_grad(kernel):
        cfg = dataclasses.replace(tiny_model_cfg, lstm_kernel=kernel)
        return jax.grad(
            lambda p: maml.adapt_and_query_loss(
                p, task, jax.random.key(2), cfg, meta_cfg
            )
        )(params)

    g_xla = meta_grad("xla")
    with lstm_scan.force_interpret():
        g_pal = meta_grad("pallas")
    for a, b in zip(jax.tree.leaves(g_xla), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )
