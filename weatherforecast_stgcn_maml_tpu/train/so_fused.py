"""Fully-fused Hessian transpose for second-order MAML (`so_impl="fhvp"`).

`train/so_grad.py` computes each inner step's (dg/dp)ᵀct as an HVP. The
"hvp"/"rof" routes run that HVP on a twice-differentiable XLA copy of the
loss — correct, but the XLA LSTM scan is the measured bottleneck (~25%
forward MFU at reference shapes; benchmarks/so_lstm_probe.json). This module
computes the same HVP with the R-operator kernels
(ops/fused_lstm_hvp.py) instead:

  1. `make_grad_loss_fused` re-expresses ∇L for the hybrid model as a
     manual VJP composition — XLA `jax.vjp` segments for the encoder/head
     glue around two `jax.custom_jvp` stack ops (fused forward, fused
     hand-written backward). The value is EXACTLY jax.grad of the support
     loss (same dropout streams, same kernels); the point is that the
     composition is forward-differentiable.
  2. so_grad's g_bwd then evaluates hv = jvp(grad_loss)(p; ct): JAX pushes
     tangents through the XLA glue automatically, and through the stack ops
     via the hand-written tangent kernels. jvp is the outermost transform —
     the HVP is a terminal value — so no transpose rules are needed.

The gradient segmentation mirrors models/hybrid.py:apply_hybrid line by
line (Koppen embed -> GCN encoder -> stacked LSTM -> head dropout -> dense
head -> masked MSE) with bit-identical RNG streams, so the Hessian is of
the SAME stochastic loss the fused first-order paths train on. Falls back
to `jax.grad` of the XLA loss copy when the kernel route is unavailable
(non-hybrid family, float64, non-TPU backend, or VMEM-gated shapes) —
making "fhvp" safe as a default: worst case it degrades to "hvp".

Reference intent: full MAML (/root/reference/README.md:116-124, `higher`
in requirements.txt:11).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from weatherforecast_stgcn_maml_tpu.config import ModelConfig
from weatherforecast_stgcn_maml_tpu.models.common import (
    apply_dense,
    dropout,
    lstm_bias,
    resolve_dtype,
)
from weatherforecast_stgcn_maml_tpu.models.losses import masked_mse
from weatherforecast_stgcn_maml_tpu.models.stgcn import apply_encoder
from weatherforecast_stgcn_maml_tpu.ops import fused_lstm_hvp as _fh
from weatherforecast_stgcn_maml_tpu.ops.fused_lstm_hvp import (
    chunked_stack_ops,
    hvp_chunk_size,
    hvp_stack_ops,
)


def fused_hvp_chunk(model_cfg: ModelConfig, t: int, b: int,
                    interpret: bool = False) -> int | None:
    """Static (trace-time) routing decision for the fused HVP.

    Returns the batch-chunk size the R-operator kernels should run at —
    b itself when one kernel instance fits VMEM, a smaller row-chunk when
    only slices fit (ops/fused_lstm_hvp.py:hvp_chunk_size; wide-batch
    second-order keeps the fused route instead of dropping to the XLA
    HVP), or None when the fused route is unavailable entirely
    (non-hybrid family, float64, pinned XLA kernels, non-TPU backend, or
    no fitting chunk).
    """
    dtype = resolve_dtype(model_cfg.compute_dtype)
    if model_cfg.family != "hybrid" or dtype == jnp.float64:
        return None
    if model_cfg.lstm_kernel == "xla":
        # Caller pinned the XLA routes — e.g. the GSPMD sp-sharded meta
        # step (train/maml.py make_meta_step), where opaque kernels would
        # block the partitioner. fhvp degrades to jvp-of-XLA-grad there.
        return None
    if interpret or _fh._FORCE_INTERPRET:
        return b
    if jax.default_backend() != "tpu":
        return None
    return hvp_chunk_size(
        t, b, model_cfg.hidden_channels, model_cfg.lstm_hidden,
        model_cfg.lstm_layers, itemsize=jnp.dtype(dtype).itemsize,
    )


def fused_hvp_route(model_cfg: ModelConfig, t: int, b: int,
                    interpret: bool = False) -> bool:
    """True when the fused HVP engages at these shapes (chunked or not)."""
    return fused_hvp_chunk(model_cfg, t, b, interpret) is not None


def make_grad_loss_fused(model_cfg: ModelConfig, loss_xla, *,
                         interpret: bool = False,
                         chunk_override: int | None = None):
    """Build grad_loss(p, aux, step_rng) == jax.grad(support_loss).

    `loss_xla` is the twice-differentiable XLA loss copy (the "hvp"/"rof"
    routes' loss_diff2) used as the fallback when the fused route is
    unavailable at the traced shapes. `chunk_override` forces a specific
    row-chunk size through the R-kernels (tests/probes); by default the
    chunk comes from `fused_hvp_chunk` (b itself when unchunked fits).
    """
    dtype = resolve_dtype(model_cfg.compute_dtype)

    def grad_loss(p, aux, step_rng):
        xb, yb, a_hat, koppen, node_mask = aux
        w, n, _ = xb.shape
        chunk = (chunk_override if chunk_override is not None
                 else fused_hvp_chunk(model_cfg, w, n, interpret))
        if chunk is None:
            return jax.grad(loss_xla)(p, aux, step_rng)

        n_layers = model_cfg.lstm_layers
        hidden = model_cfg.lstm_hidden
        rate = model_cfg.lstm_dropout
        keep = 1.0 - rate
        # Same split as apply_hybrid (models/hybrid.py:77).
        enc_rng, lstm_rng, head_rng = jax.random.split(step_rng, 3)
        masks = None
        if rate > 0.0 and n_layers > 1:
            # Bit-identical to lstm_stack_last_all's fold_in(rng, l) streams.
            masks = jnp.stack([
                jax.random.bernoulli(
                    jax.random.fold_in(lstm_rng, l), keep, (w, n, hidden)
                )
                for l in range(n_layers - 1)
            ]).astype(jnp.int8)
        fwd_op, bwd_op = hvp_stack_ops(
            jnp.dtype(dtype).name,
            bool(interpret or _fh._FORCE_INTERPRET),
            float(keep) if masks is not None else 1.0,
            masks is not None,
        )
        if chunk < n:
            fwd_op, bwd_op = chunked_stack_ops(
                fwd_op, bwd_op, chunk, masks is not None
            )

        def pre(q):
            # Koppen embed + GCN encoder + merged-weight packing. The
            # encoder runs the LAYERWISE XLA route (use_pallas=False): its
            # fused train kernel is a first-order custom_vjp, and the
            # encoder's share of the HVP is small (so_decomp_probe.json).
            emb = q["koppen"][koppen]
            emb = jnp.broadcast_to(emb, (w, n, emb.shape[-1]))
            h = jnp.concatenate([xb, emb.astype(xb.dtype)], axis=-1)
            h = apply_encoder(
                q["encoder"], a_hat, h, model_cfg, train=True, rng=enc_rng,
                final_dropout=False, use_pallas=False,
            )
            if model_cfg.stop_base_gradients:
                h = jax.lax.stop_gradient(h)
            # h [W, N, hidden] is already the stack's [T, B, C] layout
            # (apply_hybrid swaps twice on the way to the kernel).
            wcat0, wcatr, b2d = _pack_lstm_weights(q, n_layers, hidden)
            return h, wcat0, wcatr, b2d

        def post(q, feat):
            feat = dropout(feat, rate, head_rng, train=True)
            out = apply_dense(q["head"], feat, compute_dtype=dtype)
            out = out.reshape(
                n, model_cfg.horizon, model_cfg.num_weather_vars
            )
            preds = jnp.swapaxes(out, 0, 1)  # [H, N, 12]
            return masked_mse(preds, yb, node_mask)

        return _vjp_sandwich(p, pre, post, fwd_op, bwd_op, masks)

    return grad_loss


def _vjp_sandwich(p, pre, post, fwd_op, bwd_op, masks):
    """∇L as XLA vjp segments around the custom_jvp stack ops."""
    (x_tbc, wcat0, wcatr, b2d), pre_vjp = jax.vjp(pre, p)
    args = (x_tbc, wcat0, wcatr, b2d)
    if masks is not None:
        args = args + (masks,)
    feat, h_all, c_all = fwd_op(*args)
    loss, post_vjp = jax.vjp(post, p, feat)
    dp_post, dfeat = post_vjp(jnp.ones_like(loss))
    bargs = (dfeat, x_tbc, h_all, c_all, wcat0, wcatr, b2d)
    if masks is not None:
        bargs = bargs + (masks,)
    dx, dw0, dwr, db = bwd_op(*bargs)
    (dp_pre,) = pre_vjp((dx, dw0, dwr, db))
    return jax.tree.map(jnp.add, dp_pre, dp_post)


def _pack_lstm_weights(q, n_layers: int, hidden: int):
    """Merged-gate weight packing shared by both compositions."""
    layers = q["lstm"]["layers"]
    wcat0 = jnp.concatenate([layers[0]["wx"], layers[0]["wh"]], axis=0)
    if n_layers > 1:
        wcatr = jnp.stack([
            jnp.concatenate([layers[l]["wx"], layers[l]["wh"]], axis=0)
            for l in range(1, n_layers)
        ])
    else:
        wcatr = jnp.zeros((1, 2 * hidden, 4 * hidden), wcat0.dtype)
    b2d = jnp.stack([lstm_bias(layers[l]) for l in range(n_layers)])
    return wcat0, wcatr, b2d


def make_local_grad_loss_fused(model_cfg: ModelConfig, sp_axis: str,
                               loss_xla, *, interpret: bool = False,
                               chunk_override: int | None = None):
    """Node-sharded twin of `make_grad_loss_fused` for the shard_map path.

    Builds grad_loss(p, aux, step_rng) == jax.grad of the node-LOCAL support
    loss inside a shard_map body (parallel/meta_sp.py): `pre` mirrors
    `parallel.spatial.hybrid_local_forward` (Koppen embed + all-gather GCN
    encoder over the local rows, per-shard rng streams), the stack ops run
    the R-operator kernels on the SHARD-LOCAL batch rows (which shrink back
    under the VMEM gate — the sp axis's whole point), and `post` ends in the
    psummed masked MSE.

    The value is the per-shard PARTIAL gradient — the same object
    `jax.grad(local_loss)` returns inside the body; the caller psums it over
    sp (meta_sp.inner_step). jvp of this composition under shard_map pushes
    each shard's incoming cotangent through the collectives' (linear) JVP
    rules, which by symmetry of the joint Hessian over the per-shard param
    copies is exactly the transpose the SO meta-gradient needs — see the
    f64 parity tests in tests/test_parallel.py.
    """
    from weatherforecast_stgcn_maml_tpu.parallel.spatial import (
        _spatial_encoder,
        psum_masked_mse,
    )

    dtype = resolve_dtype(model_cfg.compute_dtype)

    def grad_loss(p, aux, step_rng):
        xb, yb, a_rows, koppen, node_mask = aux
        w, n_local, _ = xb.shape
        chunk = (chunk_override if chunk_override is not None
                 else fused_hvp_chunk(model_cfg, w, n_local, interpret))
        if chunk is None:
            return jax.grad(loss_xla)(p, aux, step_rng)

        n_layers = model_cfg.lstm_layers
        hidden = model_cfg.lstm_hidden
        rate = model_cfg.lstm_dropout
        keep = 1.0 - rate
        # Same per-shard stream as hybrid_local_forward: fold in the shard
        # index, then the same 3-way split.
        shard_rng = jax.random.fold_in(
            step_rng, jax.lax.axis_index(sp_axis)
        )
        enc_rng, lstm_rng, head_rng = jax.random.split(shard_rng, 3)
        masks = None
        if rate > 0.0 and n_layers > 1:
            masks = jnp.stack([
                jax.random.bernoulli(
                    jax.random.fold_in(lstm_rng, l), keep,
                    (w, n_local, hidden),
                )
                for l in range(n_layers - 1)
            ]).astype(jnp.int8)
        fwd_op, bwd_op = hvp_stack_ops(
            jnp.dtype(dtype).name,
            bool(interpret or _fh._FORCE_INTERPRET),
            float(keep) if masks is not None else 1.0,
            masks is not None,
        )
        if chunk < n_local:
            fwd_op, bwd_op = chunked_stack_ops(
                fwd_op, bwd_op, chunk, masks is not None
            )

        # The encoder inside this composition must run the layerwise XLA
        # route: the node-sharded fused GCN sandwich is a first-order
        # custom_vjp (no JVP rule), and the whole grad_loss gets jax.jvp'd
        # by the fhvp Hessian transpose. Same pattern as the single-device
        # composition's use_pallas=False; mask streams are identical
        # across routes (bench.py gcn_shard parity), so the gradient is
        # the fused loss's gradient to compute-dtype rounding, and the
        # encoder's HVP share is small (so_decomp_probe.json).
        enc_cfg = dataclasses.replace(model_cfg, use_pallas_gcn=False)

        def pre(q):
            emb = q["koppen"][koppen]
            emb = jnp.broadcast_to(emb, (w, n_local, emb.shape[-1]))
            h = jnp.concatenate([xb, emb.astype(xb.dtype)], axis=-1)
            h = _spatial_encoder(
                q["encoder"], a_rows, h, enc_cfg, sp_axis, train=True,
                rng=enc_rng,
            )
            if model_cfg.stop_base_gradients:
                h = jax.lax.stop_gradient(h)
            wcat0, wcatr, b2d = _pack_lstm_weights(q, n_layers, hidden)
            return h, wcat0, wcatr, b2d

        def post(q, feat):
            feat = dropout(feat, rate, head_rng, train=True)
            out = apply_dense(q["head"], feat, compute_dtype=dtype)
            out = out.reshape(
                n_local, model_cfg.horizon, model_cfg.num_weather_vars
            )
            preds = jnp.swapaxes(out, 0, 1)  # [H, N/d, 12]
            return psum_masked_mse(preds, yb, node_mask, sp_axis)

        return _vjp_sandwich(p, pre, post, fwd_op, bwd_op, masks)

    return grad_loss
