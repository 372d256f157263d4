"""Fused dense-adjacency GCN layer as a Pallas TPU kernel.

Computes `relu(A_hat @ (H @ W) + b)` for a batch of time slices in one kernel:
both matmuls run back-to-back on the MXU with the intermediate held in VMEM,
and the bias + ReLU epilogue happens in-register — no HBM round-trip for the
[N, hidden] intermediate that the unfused XLA path may spill between ops.

Shapes are small per slice (N padded to a multiple of 128, channels <= 256),
so one grid program processes one full (batch, time) slice: VMEM footprint is
  A_hat [N, N] + H [N, C_in] + W [C_in, C_out] + out [N, C_out]
~ 2.3 MB for N=512, C=256 fp32 — comfortably under the ~16 MB VMEM budget.

XLA already fuses this pattern well (SURVEY.md section 7 predicted it may win
at these sizes); `fused_gcn_layer` therefore exists behind the
`ModelConfig.use_pallas_gcn` flag and `bench.py --kernels` compares the two —
keep whichever wins. On non-TPU backends it transparently falls back to XLA.

The kernel has a custom VJP so it is usable inside the MAML grad-of-grad
transform: the backward pass reuses the same fused matmul structure.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from weatherforecast_stgcn_maml_tpu.models.gcn import apply_gcn_layer


def _xla_forward(w, b, a_hat, h, compute_dtype):
    out = apply_gcn_layer({"w": w, "b": b}, a_hat, h, compute_dtype=compute_dtype)
    return jax.nn.relu(out)


def _kernel(a_ref, h_ref, w_ref, b_ref, out_ref, *, compute_dtype):
    h = h_ref[0].astype(compute_dtype)  # [N, C_in]
    w = w_ref[:].astype(compute_dtype)  # [C_in, C_out]
    hw = jnp.dot(h, w, preferred_element_type=jnp.float32)
    a = a_ref[:].astype(compute_dtype)  # [N, N]
    agg = jnp.dot(a, hw.astype(compute_dtype), preferred_element_type=jnp.float32)
    out_ref[0] = jnp.maximum(agg + b_ref[:], 0.0)


def _pallas_forward(w, b, a_hat, h, compute_dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lead = h.shape[:-2]
    n, c_in = h.shape[-2:]
    c_out = w.shape[-1]
    hb = h.reshape(-1, n, c_in)
    batch = hb.shape[0]
    b2d = b.reshape(1, c_out)

    out = pl.pallas_call(
        partial(_kernel, compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((batch, n, c_out), jnp.float32),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c_in), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, c_out), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * (n * c_in * c_out + n * n * c_out),
            bytes_accessed=4 * (n * n + batch * n * (c_in + c_out) + c_in * c_out),
            transcendentals=0,
        ),
    )(a_hat, hb, w, b2d)
    return out.reshape(*lead, n, c_out)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused(w, b, a_hat, h, compute_dtype):
    if jax.default_backend() != "tpu":
        return _xla_forward(w, b, a_hat, h, compute_dtype)
    return _pallas_forward(w, b, a_hat, h, compute_dtype)


def _fused_fwd(w, b, a_hat, h, compute_dtype):
    out = _fused(w, b, a_hat, h, compute_dtype)
    return out, (w, a_hat, h, out)


def _fused_bwd(compute_dtype, res, g):
    from weatherforecast_stgcn_maml_tpu.models.common import accum_dtype

    w, a_hat, h, out = res
    g = jnp.where(out > 0, g, 0.0)  # ReLU gate
    dt = compute_dtype
    acc = accum_dtype(dt)
    # out = A @ (H W) + b ; dA-term not needed (A is a static buffer).
    # dH = A^T @ g @ W^T ; dW = H^T @ (A^T @ g) ; db = sum(g).
    atg = jnp.einsum(
        "nm,...nc->...mc", a_hat.astype(dt), g.astype(dt),
        preferred_element_type=acc,
    )
    dh = jnp.dot(atg.astype(dt), w.T.astype(dt), preferred_element_type=acc)
    dw = jnp.einsum(
        "...mi,...mc->ic", h.astype(dt), atg.astype(dt),
        preferred_element_type=acc,
    )
    db = g.sum(axis=tuple(range(g.ndim - 1)))
    da = jnp.zeros_like(a_hat)
    return dw, db, da, dh


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_gcn_layer(params, a_hat, h, *, compute_dtype=jnp.float32):
    """Drop-in fused replacement for `relu(apply_gcn_layer(...))`.

    Args:
      params: {"w": [C_in, C_out], "b": [C_out]}.
      a_hat: [N, N] normalized adjacency.
      h: [..., N, C_in].
    Returns [..., N, C_out] float32.
    """
    return _fused(params["w"], params["b"], a_hat, h, compute_dtype)


# ---------------------------------------------------------------------------
# Whole-encoder fusion: all GCN layers in ONE kernel, activations resident in
# VMEM across layers. XLA fuses bias+ReLU into each matmul but still spills
# the [N, hidden] activation to HBM between layers; here a time slice enters
# VMEM once and leaves once, with 2L matmuls in between. Backward recomputes
# through the XLA layer path (jax.vjp), so the stack is usable under grad —
# though the intended use is the serving/inference path (train-mode dropout
# between layers forces the per-layer kernel anyway).
# ---------------------------------------------------------------------------


def _xla_stack(weights, biases, a_hat, h, compute_dtype):
    for w, b in zip(weights, biases):
        h = jax.nn.relu(
            apply_gcn_layer({"w": w, "b": b}, a_hat, h, compute_dtype=compute_dtype)
        )
    return h


def _stack_kernel(a_ref, h_ref, *rest, num_layers, compute_dtype):
    w_refs = rest[:num_layers]
    b_refs = rest[num_layers : 2 * num_layers]
    out_ref = rest[2 * num_layers]
    a = a_ref[:].astype(compute_dtype)
    h = h_ref[0].astype(compute_dtype)
    for l in range(num_layers):
        w = w_refs[l][:].astype(compute_dtype)
        hw = jnp.dot(h, w, preferred_element_type=jnp.float32)
        agg = jnp.dot(a, hw.astype(compute_dtype), preferred_element_type=jnp.float32)
        h = jnp.maximum(agg + b_refs[l][:], 0.0).astype(compute_dtype)
    out_ref[0] = h.astype(jnp.float32)


def _pallas_stack(weights, biases, a_hat, h, compute_dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lead = h.shape[:-2]
    n = h.shape[-2]
    num_layers = len(weights)
    c_out = weights[-1].shape[-1]
    hb = h.reshape(-1, n, h.shape[-1])
    batch = hb.shape[0]

    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0,) * 2, memory_space=pltpu.VMEM)
        for w in weights
    ]
    b2d = [b.reshape(1, -1) for b in biases]
    b_specs = [
        pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for b in b2d
    ]
    flops = sum(
        2 * batch * (n * w.shape[0] * w.shape[1] + n * n * w.shape[1])
        for w in weights
    )
    out = pl.pallas_call(
        partial(_stack_kernel, num_layers=num_layers, compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((batch, n, c_out), jnp.float32),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, n, hb.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            *w_specs,
            *b_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, n, c_out), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (n * n + batch * n * (hb.shape[-1] + c_out)),
            transcendentals=0,
        ),
    )(a_hat, hb, *weights, *b2d)
    return out.reshape(*lead, n, c_out)


# Conservative VMEM budget for the fused stack's resident buffers (the
# hardware has ~16 MB/core; leave headroom for double buffering and spills).
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _stack_fits_vmem(weights, n: int, c_in: int) -> bool:
    adj = n * n * 4
    ws = sum(w.shape[0] * w.shape[1] * 4 for w in weights)
    c_max = max([c_in] + [w.shape[1] for w in weights])
    act = 2 * n * c_max * 4  # current + next activation
    return adj + ws + act <= _VMEM_BUDGET_BYTES


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_stack(weights, biases, a_hat, h, compute_dtype):
    if (
        jax.default_backend() != "tpu"
        or jnp.dtype(compute_dtype) == jnp.float64
        or not _stack_fits_vmem(weights, h.shape[-2], h.shape[-1])
    ):
        # Non-TPU backends, or grids whose adjacency no longer fits VMEM
        # (N >~ 1500 at fp32): XLA path. Beyond-VMEM single-chip serving is
        # better served by the node-sharded spatial path (parallel/spatial).
        return _xla_stack(weights, biases, a_hat, h, compute_dtype)
    return _pallas_stack(weights, biases, a_hat, h, compute_dtype)


def _fused_stack_fwd(weights, biases, a_hat, h, compute_dtype):
    return _fused_stack(weights, biases, a_hat, h, compute_dtype), (
        weights,
        biases,
        a_hat,
        h,
    )


def _fused_stack_bwd(compute_dtype, res, g):
    weights, biases, a_hat, h = res
    _, vjp = jax.vjp(
        lambda ws, bs, hh: _xla_stack(ws, bs, a_hat, hh, compute_dtype),
        weights,
        biases,
        h,
    )
    dw, db, dh = vjp(g)
    return dw, db, jnp.zeros_like(a_hat), dh


_fused_stack.defvjp(_fused_stack_fwd, _fused_stack_bwd)


def fused_gcn_stack(layers, a_hat, h, *, compute_dtype=jnp.float32):
    """Run a whole GCN layer stack fused in one Pallas kernel.

    Args:
      layers: list of {"w": [C_in, C_out], "b": [C_out]} (the encoder's
        params, models/stgcn.py layout).
      a_hat: [N, N]; h: [..., N, C_in].
    Returns [..., N, C_out_last] float32.
    """
    weights = tuple(l["w"] for l in layers)
    biases = tuple(l["b"] for l in layers)
    return _fused_stack(weights, biases, a_hat, h, compute_dtype)
