"""Whole-stack fused LSTM kernel (ops/fused_lstm_stack.py) vs the XLA path.

Runs the real kernel bodies through the Pallas interpreter on CPU: eval
parity, TRAIN-mode parity (the fused path must draw bit-identical dropout
masks), full gradient parity (x and every weight/bias), vmap batching, and
the complete first-order meta-gradient. TPU bit-exactness is asserted by
bench.py's default kernel-parity gate.
"""

import dataclasses

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from weatherforecast_stgcn_maml_tpu.models.lstm import apply_lstm, init_lstm
from weatherforecast_stgcn_maml_tpu.ops import fused_lstm_stack

T, B, C, H, L = 5, 16, 24, 8, 3


def _setup(seed=0, layers=L):
    params = init_lstm(jax.random.key(seed), C, H, layers)
    x = jnp.asarray(
        np.random.default_rng(seed).normal(size=(B, T, C)).astype(np.float32)
    )
    return params, x


def _stack(params, x, **kw):
    with fused_lstm_stack.force_interpret():
        return apply_lstm(params, x, kernel="pallas_stack", **kw)


def test_eval_parity():
    params, x = _setup()
    ref = apply_lstm(params, x, kernel="xla")
    got = _stack(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_single_layer_parity():
    params, x = _setup(1, layers=1)
    ref = apply_lstm(params, x, kernel="xla")
    got = _stack(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_train_mode_mask_parity():
    """Inter-layer dropout masks must be drawn bit-identically to the XLA
    path (same fold_in(rng, l) streams) so train-mode numerics agree."""
    params, x = _setup(2)
    rng = jax.random.key(9)
    ref = apply_lstm(
        params, x, kernel="xla", dropout_rate=0.4, train=True, rng=rng
    )
    got = _stack(params, x, dropout_rate=0.4, train=True, rng=rng)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_grad_parity_all_leaves():
    params, x = _setup(3)
    tgt = jnp.asarray(
        np.random.default_rng(4).normal(size=(B, H)).astype(np.float32)
    )

    def loss(kernel):
        def f(params, x):
            if kernel == "xla":
                out = apply_lstm(params, x, kernel="xla")
            else:
                out = _stack(params, x)
            return jnp.sum((out - tgt) ** 2)

        return f

    gp_ref, gx_ref = jax.grad(loss("xla"), argnums=(0, 1))(params, x)
    gp_got, gx_got = jax.grad(loss("stack"), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(
        np.asarray(gx_got), np.asarray(gx_ref), rtol=1e-4, atol=1e-5
    )
    for a, b in zip(jax.tree.leaves(gp_ref), jax.tree.leaves(gp_got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        )


def test_train_grad_parity():
    params, x = _setup(5)
    rng = jax.random.key(11)

    def loss(kernel):
        def f(params):
            kw = dict(dropout_rate=0.3, train=True, rng=rng)
            out = (
                apply_lstm(params, x, kernel="xla", **kw)
                if kernel == "xla" else _stack(params, x, **kw)
            )
            return jnp.sum(out ** 2)

        return f

    g_ref = jax.grad(loss("xla"))(params)
    g_got = jax.grad(loss("stack"))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        )


def test_split_variant_train_grad_parity():
    """The non-default kernel variant (merged vs split dots) must stay
    correct: run the same train-mode grad check with `merged` flipped."""
    params, x = _setup(8)
    rng = jax.random.key(13)
    other = not fused_lstm_stack._MERGED_GATES

    def loss(kernel):
        def f(params):
            kw = dict(dropout_rate=0.3, train=True, rng=rng)
            if kernel == "xla":
                out = apply_lstm(params, x, kernel="xla", **kw)
            else:
                with fused_lstm_stack.force_interpret():
                    out = fused_lstm_stack.lstm_stack_last_all(
                        params, x, merged=other, **kw
                    )
            return jnp.sum(out ** 2)

        return f

    g_ref = jax.grad(loss("xla"))(params)
    g_got = jax.grad(loss("other"))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        )


def test_vmap_parity():
    params, _ = _setup(6)
    xs = jnp.stack(
        [_setup(10 + i)[1] for i in range(3)]
    )  # [3, B, T, C]
    ref = jax.vmap(lambda x: apply_lstm(params, x, kernel="xla"))(xs)
    with fused_lstm_stack.force_interpret():
        got = jax.vmap(
            lambda x: apply_lstm(params, x, kernel="pallas_stack")
        )(xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.fixture
def vbatch_on(monkeypatch):
    """Pin the flag-gated V-batched kernels on (default off: measured
    slower at reference shapes, benchmarks/lstm_vbatch_probe.json) so the
    gated code stays covered."""
    monkeypatch.setattr(fused_lstm_stack, "_VBATCH", True)


def test_vbatch_grad_inside_vmap_per_task_weights(vbatch_on):
    """MAML shape: vmap over tasks with PER-TASK params, grad INSIDE the
    vmap — routes through the V-batched kernel's custom_vmap rules."""
    rng = jax.random.key(21)
    params_v = [_setup(30 + v)[0] for v in range(3)]
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *params_v)
    xs = jnp.stack([_setup(40 + v)[1] for v in range(3)])

    def per_task(p, x):
        def loss(pp):
            out = _stack(pp, x, dropout_rate=0.3, train=True, rng=rng)
            return jnp.sum(out ** 2)

        return jax.grad(loss)(p)

    got = jax.vmap(per_task)(stacked, xs)

    for v in range(3):
        def loss_ref(pp):
            out = apply_lstm(
                pp, xs[v], kernel="xla", dropout_rate=0.3, train=True,
                rng=rng,
            )
            return jnp.sum(out ** 2)

        ref = jax.grad(loss_ref)(params_v[v])
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
            np.testing.assert_allclose(
                np.asarray(b[v]), np.asarray(a), rtol=1e-4, atol=1e-5
            )


@pytest.mark.parametrize("rowfold", [True, False])
def test_vbatch_grad_of_vmap_shared_weights(vbatch_on, monkeypatch, rowfold):
    """Adaptation shape: grad OF a window-vmapped forward with SHARED
    params. rowfold=True exercises the row-fold route (chains folded into
    kernel rows; dW comes back pre-summed); rowfold=False exercises the
    V-batched kernels' unbatched-primal cotangent summing."""
    monkeypatch.setattr(fused_lstm_stack, "_ROWFOLD", rowfold)
    params, _ = _setup(50)
    xs = jnp.stack([_setup(60 + i)[1] for i in range(2)])
    rng = jax.random.key(31)

    def loss(kernel):
        def f(p):
            if kernel == "xla":
                out = jax.vmap(
                    lambda x, r: apply_lstm(
                        p, x, kernel="xla", dropout_rate=0.25, train=True,
                        rng=r,
                    )
                )(xs, jax.random.split(rng, 2))
            else:
                with fused_lstm_stack.force_interpret():
                    out = jax.vmap(
                        lambda x, r: apply_lstm(
                            p, x, kernel="pallas_stack", dropout_rate=0.25,
                            train=True, rng=r,
                        )
                    )(xs, jax.random.split(rng, 2))
            return jnp.sum(out ** 2)

        return f

    g_ref = jax.grad(loss("xla"))(params)
    g_got = jax.grad(loss("stack"))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
        )


def test_fo_meta_grad_through_stack_kernel(tiny_model_cfg):
    """Full FOMAML meta-gradient with the stack kernel in the model — the
    integration that caught the per-layer kernel's JVP crash in round 3."""
    from weatherforecast_stgcn_maml_tpu.config import MetaConfig
    from weatherforecast_stgcn_maml_tpu.train import maml

    meta_cfg = MetaConfig(
        second_order=False, inner_epochs=1, inner_batches=2, meta_batch=2,
        grad_accum=1,
    )
    n = 8
    rng = np.random.default_rng(7)
    mk = lambda *shape: jnp.asarray(rng.normal(size=shape), jnp.float32)
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

    def meta_grad(kernel):
        cfg = dataclasses.replace(tiny_model_cfg, lstm_kernel=kernel)
        return jax.grad(
            lambda p: maml.adapt_and_query_loss(
                p, task, jax.random.key(2), cfg, meta_cfg
            )
        )(params)

    g_xla = meta_grad("xla")
    with fused_lstm_stack.force_interpret():
        g_stk = meta_grad("pallas_stack")
    for a, b in zip(jax.tree.leaves(g_xla), jax.tree.leaves(g_stk)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6
        )


def test_float64_never_takes_stack_kernel(monkeypatch):
    """float64 must route to the XLA scan even when kernel="pallas_stack" is
    forced: the stack kernels accumulate in f32, which would silently
    truncate the float64 FD-test path (repo matmul rule; round-3 review
    finding)."""
    def _boom(*a, **k):
        raise AssertionError("stack kernel taken at float64")

    monkeypatch.setattr(fused_lstm_stack, "lstm_stack_last_all", _boom)
    params, x = _setup(70)
    with jax.enable_x64(True):
        p64 = jax.tree.map(lambda v: jnp.asarray(np.asarray(v), jnp.float64), params)
        out = apply_lstm(
            p64, jnp.asarray(np.asarray(x), jnp.float64),
            kernel="pallas_stack", compute_dtype=jnp.float64,
        )
    assert out.dtype == jnp.float64


def test_nograd_primal_skips_residuals(monkeypatch):
    """The custom_vjp primal (no grad anywhere) must run the lastonly
    kernel (emit_residuals=False) — eval/serving pays no residual HBM
    stream; the grad path still emits residuals (round-3 review fix)."""
    calls = []
    real = fused_lstm_stack._fwd_pallas_m

    def spy(*a, **k):
        calls.append(k.get("emit_residuals", True))
        return real(*a, **k)

    monkeypatch.setattr(fused_lstm_stack, "_fwd_pallas_m", spy)
    params, x = _setup(80)
    _stack(params, x)  # primal-only call
    assert calls and all(c is False for c in calls)
    calls.clear()
    jax.grad(lambda p: jnp.sum(_stack(p, x)))(params)
    assert calls and any(c is True for c in calls)


def test_stack_chunk_size_logic():
    """Chunk search: unchunked when it fits; largest fitting b/2^k when it
    does not; None when every chunk >= min_chunk still fails the gate."""
    # Reference-ish shape fits unchunked -> chunk == b.
    assert fused_lstm_stack.stack_chunk_size(24, 1024, 256, 128, 4, 2) == 1024
    # 32768 rows (8-window x 4096-node supervised step, bf16) must split
    # into a proper divisor that passes the gate.
    bc = fused_lstm_stack.stack_chunk_size(24, 32768, 256, 128, 4, 2)
    assert bc is not None and bc < 32768 and 32768 % bc == 0
    assert fused_lstm_stack.stack_supported(24, bc, 256, 128, 4, 2)
    # A minimum-chunk floor above every fitting size -> None (route XLA).
    assert (
        fused_lstm_stack.stack_chunk_size(
            24, 32768, 256, 128, 4, 2, min_chunk=1 << 20
        )
        is None
    )
    # Non-power-of-two batches (b = 3 * 2^k) find a fused route too: the
    # search covers ALL multiple-of-8 divisors, not just b/2^k halvings
    # (round-3 advisor finding), and returns the LARGEST fitting one.
    b = 3 * 8192
    bc = fused_lstm_stack.stack_chunk_size(24, b, 256, 128, 4, 2)
    assert bc is not None and bc < b and b % bc == 0 and bc % 8 == 0
    assert fused_lstm_stack.stack_supported(24, bc, 256, 128, 4, 2)
    assert bc == max(
        d for d in range(512, b)
        if b % d == 0 and d % 8 == 0
        and fused_lstm_stack.stack_supported(24, d, 256, 128, 4, 2)
    )


def test_chunked_stack_parity_eval_and_train():
    """Batch-chunked fused stack == unchunked == XLA path, eval AND train:
    masks are drawn once for the full batch from the same fold_in streams
    and sliced per chunk, so numerics are bit-comparable across all three
    (rows are independent in an LSTM)."""
    params, x = _setup(91)
    rng = jax.random.key(13)
    for kw in ({}, {"dropout_rate": 0.4, "train": True, "rng": rng}):
        ref = apply_lstm(params, x, kernel="xla", **kw)
        with fused_lstm_stack.force_interpret():
            got = fused_lstm_stack.lstm_stack_last_all_chunked(
                params, x, B // 2, interpret=True, **kw
            )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6
        )


def test_chunked_stack_grad_parity():
    """Weight grads sum across chunks (plain autodiff of the chunk loop)
    and match the XLA path on every leaf, train mode with dropout."""
    params, x = _setup(92)
    rng = jax.random.key(17)

    def loss_xla(p):
        out = apply_lstm(
            p, x, kernel="xla", dropout_rate=0.3, train=True, rng=rng
        )
        return jnp.sum(out**2)

    def loss_chunked(p):
        with fused_lstm_stack.force_interpret():
            out = fused_lstm_stack.lstm_stack_last_all_chunked(
                p, x, B // 4, dropout_rate=0.3, train=True, rng=rng,
                interpret=True,
            )
        return jnp.sum(out**2)

    g_ref = jax.grad(loss_xla)(params)
    g_got = jax.grad(loss_chunked)(params)
    for leaf_ref, leaf_got in zip(
        jax.tree.leaves(g_ref), jax.tree.leaves(g_got)
    ):
        np.testing.assert_allclose(
            np.asarray(leaf_got), np.asarray(leaf_ref), rtol=2e-4, atol=1e-5
        )


def test_apply_lstm_auto_routes_chunked(monkeypatch):
    """When the unchunked gate fails but a chunk fits, kernel="auto" on the
    TPU backend must take the chunked fused route, not the XLA scan."""
    params, x = _setup(93)
    taken = []

    def spy(p, xx, chunk, **kw):
        taken.append(chunk)
        return jnp.zeros((xx.shape[0], H), jnp.float32)

    monkeypatch.setattr(
        fused_lstm_stack, "lstm_stack_last_all_chunked", spy
    )
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # The real unchunked gate fails at these tiny shapes (hidden % 128);
    # report a fitting half-batch chunk (gate math itself is covered by
    # test_stack_chunk_size_logic).
    monkeypatch.setattr(
        fused_lstm_stack, "stack_chunk_size",
        lambda t, b, *a, **k: b // 2,
    )
    out = apply_lstm(params, x, kernel="auto")
    assert taken == [B // 2]
    assert out.shape == (B, H)
