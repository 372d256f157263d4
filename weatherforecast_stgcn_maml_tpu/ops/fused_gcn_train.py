"""Fused GCN encoder TRAINING kernel: stack + ReLU + dropout, custom VJP.

The round-2 fused GCN (ops/fused_gcn.py) is eval-only: with inter-layer
dropout active the encoder trains through the XLA per-layer path, paying
dropout as separate bernoulli/where ops and round-tripping [W, N, hidden]
activations through HBM at every layer boundary. Round-3's perf probe puts
the full-model dropout machinery at ~0.5 ms of the 2.6 ms inner step and
the encoder grad at 0.97 ms vs its ~0.6 ms matmul floor.

This kernel runs the WHOLE encoder — every layer's H@W, A@(HW), bias,
ReLU, and dropout-mask multiply — inside one Pallas program per direction:

  * forward: grid=(W/wb,) over time-slice BLOCKS (`_TIME_BLOCK` slices per
    program — slices are independent, so the H@W contraction runs over all
    wb*N rows at once); A and all weights VMEM-resident; per-layer
    post-dropout activations stream out as residuals;
  * backward: grid=(W/wb,) again (no reversal needed), recovers relu' from
    the post-dropout residuals (h>0 iff z>0 wherever the mask is live;
    masked positions contribute zero via the mask factor), uses transposed
    `dot_general` contractions instead of materialized A^T/W^T, computes
    each block's dW in one wb*N-deep contraction, and accumulates dW/db
    into revisited output blocks (wb x fewer accumulator round-trips).

Dropout masks are drawn in XLA bit-identically to the layerwise path
(same fold_in(rng, l) streams, full [W, N, hidden] draw) and streamed as
int8 {0, 1} with the 1/keep scale folded into the kernels — quarter the
mask HBM bytes, bit-identical products — so train-mode numerics match the
XLA encoder, which CI asserts through the Pallas interpreter.

Custom VJP => first-order only; second-order MAML and non-TPU backends use
the XLA path (train/maml.py routes automatically).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

# Same empirical calibration as ops/fused_lstm_stack.py: Mosaic's scoped
# allocation runs ~1.8x the naive block accounting; caps raised per-kernel.
_VMEM_BUDGET_BYTES = 34 * 1024 * 1024

_FORCE_INTERPRET = False


class force_interpret:
    def __enter__(self):
        global _FORCE_INTERPRET
        self._saved = _FORCE_INTERPRET
        _FORCE_INTERPRET = True

    def __exit__(self, *exc):
        global _FORCE_INTERPRET
        _FORCE_INTERPRET = self._saved


def _compiler_params(interpret: bool, mib: int):
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=mib * 1024 * 1024)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, a_ref, w0_ref, wr_ref, b_ref, m_ref, h_out_ref,
                *, n_layers, n_masks, compute_dtype, keep=1.0, wb=1):
    a = a_ref[:].astype(compute_dtype)
    h = x_ref[:]  # [wb, N, C] — wb independent time slices per program
    res_dtype = h_out_ref.dtype
    inv_keep = 1.0 / keep if n_masks else 1.0
    n = h.shape[1]
    for l in range(n_layers):
        w = (w0_ref[:] if l == 0 else wr_ref[l - 1]).astype(compute_dtype)
        c_l = h.shape[-1]
        # H@W over ALL wb slices in one contraction ([wb*N, C] rows — the
        # leading-dim merge is a free row-major reshape).
        hw = jnp.dot(
            h.astype(compute_dtype).reshape(wb * n, c_l), w,
            preferred_element_type=jnp.float32,
        ).astype(compute_dtype).reshape(wb, n, -1)
        # A@(HW) per slice (A is block-diagonal over slices).
        z = jnp.stack([
            jnp.dot(a, hw[s], preferred_element_type=jnp.float32)
            for s in range(wb)
        ]) + b_ref[pl.ds(l, 1), :]
        h = jnp.maximum(z, 0.0)
        if l < n_masks:
            # Masks stream as int8 {0, 1} (quarter the HBM bytes of the old
            # f32 {0, 1/keep} stream); the 1/keep scale folds in here, and
            # (m * f32(1/keep)) is exact for m in {0, 1}, so the products
            # are bit-identical to the old pre-scaled-mask stream.
            h = h * (m_ref[l].astype(jnp.float32) * inv_keep)
        # Residuals stream at compute precision (halves the HBM stream under
        # bf16 training): every backward use re-casts to compute_dtype for
        # the MXU anyway, and the relu'-sign recovery (h > 0) is unaffected
        # by bf16 rounding. The last layer's residual IS the primal output —
        # its consumer (the LSTM) casts to compute_dtype before its matmuls.
        h_out_ref[l] = h.astype(res_dtype)


def _fwd_kernel_nomask(x_ref, a_ref, w0_ref, wr_ref, b_ref, h_out_ref,
                       *, n_layers, compute_dtype, wb=1):
    _fwd_kernel(
        x_ref, a_ref, w0_ref, wr_ref, b_ref, None, h_out_ref,
        n_layers=n_layers, n_masks=0, compute_dtype=compute_dtype, wb=wb,
    )


def _bwd_kernel(g_ref, x_ref, a_ref, w0_ref, wr_ref, m_ref, h_all_ref,
                dx_ref, dw0_ref, dwr_ref, db_ref,
                *, n_layers, n_masks, compute_dtype, keep=1.0, wb=1):
    t = pl.program_id(0)
    a = a_ref[:].astype(compute_dtype)
    inv_keep = 1.0 / keep if n_masks else 1.0
    dh = g_ref[:]  # [wb, N, hidden] cotangent of the final layer's output
    n = dh.shape[1]
    for l in range(n_layers - 1, -1, -1):
        h_post = h_all_ref[l]
        # relu'(z) recovered from the post-dropout residual: where the mask
        # is live, h_post > 0 iff z > 0; where the mask is 0 the mask
        # factor below zeroes the contribution anyway. The compare runs in
        # f32 — Mosaic has no bf16 cmpf, and bf16 rounding never flips the
        # sign (positives round to positives, zero is exact).
        dz = dh * (h_post.astype(jnp.float32) > 0.0).astype(jnp.float32)
        if l < n_masks:
            dz = dz * (m_ref[l].astype(jnp.float32) * inv_keep)
        dz_c = dz.astype(compute_dtype)
        # dhw[s] = A^T @ dz[s] per slice via transposed contractions (no
        # materialized A^T).
        dhw = jnp.stack([
            jax.lax.dot_general(
                a, dz_c[s], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for s in range(wb)
        ]).astype(compute_dtype)  # [wb, N, hid]
        inp = (x_ref[:] if l == 0 else h_all_ref[l - 1]).astype(compute_dtype)
        c_l = inp.shape[-1]
        hid = dhw.shape[-1]
        # Weight grad over ALL wb slices in ONE deep contraction
        # ([wb*N]-long MAC chains instead of wb accumulated [N]-long ones —
        # the whole point of time-blocking).
        dw_upd = jax.lax.dot_general(
            inp.reshape(wb * n, c_l), dhw.reshape(wb * n, hid),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_upd = jnp.sum(dz, axis=(0, 1), keepdims=False)[None]  # [1, hid]
        w = (w0_ref[:] if l == 0 else wr_ref[l - 1]).astype(compute_dtype)
        d_in = jax.lax.dot_general(
            dhw.reshape(wb * n, hid), w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(wb, n, c_l)
        if l == 0:
            dx_ref[:] = d_in.astype(dx_ref.dtype)
        else:
            dh = d_in

        if l == 0:
            @pl.when(t == 0)
            def _(dw_upd=dw_upd):
                dw0_ref[:] = dw_upd

            @pl.when(t > 0)
            def _(dw_upd=dw_upd):
                dw0_ref[:] = dw0_ref[:] + dw_upd
        else:
            @pl.when(t == 0)
            def _(l=l, dw_upd=dw_upd):
                dwr_ref[l - 1] = dw_upd

            @pl.when(t > 0)
            def _(l=l, dw_upd=dw_upd):
                dwr_ref[l - 1] = dwr_ref[l - 1] + dw_upd

        @pl.when(t == 0)
        def _(l=l, db_upd=db_upd):
            db_ref[pl.ds(l, 1), :] = db_upd

        @pl.when(t > 0)
        def _(l=l, db_upd=db_upd):
            db_ref[pl.ds(l, 1), :] = db_ref[pl.ds(l, 1), :] + db_upd

    if n_layers == 1:
        @pl.when(t == 0)
        def _():
            dwr_ref[:] = jnp.zeros_like(dwr_ref)


def _bwd_kernel_nomask(g_ref, x_ref, a_ref, w0_ref, wr_ref, h_all_ref,
                       dx_ref, dw0_ref, dwr_ref, db_ref,
                       *, n_layers, compute_dtype, wb=1):
    _bwd_kernel(
        g_ref, x_ref, a_ref, w0_ref, wr_ref, None, h_all_ref,
        dx_ref, dw0_ref, dwr_ref, db_ref,
        n_layers=n_layers, n_masks=0, compute_dtype=compute_dtype, wb=wb,
    )


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


# Time slices folded into each program instance. The weight-grad
# contraction deepens from N- to wb*N-long MAC chains and the dW/db
# accumulator writes drop by wb; the per-slice A dots stay per-slice
# (A is block-diagonal over time). A/B'd at reference shapes in
# benchmarks/gcn_block_probe.py; flip here if the probe ever reverses.
_TIME_BLOCK = 4


def _pick_wb(t: int, requested: int | None) -> int:
    """Largest divisor of t that is <= the requested block size."""
    want = _TIME_BLOCK if requested is None else requested
    for wb in range(min(want, t), 0, -1):
        if t % wb == 0:
            return wb
    return 1


def _fwd_pallas(x, a_hat, w0, wr, b2d, masks, compute_dtype, interpret,
                keep=1.0, wb=None):
    t, n, c_in = x.shape
    n_layers, hid = b2d.shape
    n_masks = 0 if masks is None else masks.shape[0]
    wb = _pick_wb(t, wb)
    in_specs = [
        pl.BlockSpec((wb, n, c_in), lambda s: (s, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, n), lambda s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c_in, hid), lambda s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (max(n_layers - 1, 1), hid, hid), lambda s: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((n_layers, hid), lambda s: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, a_hat, w0, wr, b2d]
    if masks is not None:
        in_specs.append(
            pl.BlockSpec(
                (n_masks, wb, n, hid), lambda s: (0, s, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(masks)
        kernel = functools.partial(
            _fwd_kernel, n_layers=n_layers, n_masks=n_masks,
            compute_dtype=compute_dtype, keep=keep, wb=wb,
        )
    else:
        kernel = functools.partial(
            _fwd_kernel_nomask, n_layers=n_layers, compute_dtype=compute_dtype,
            wb=wb,
        )
    h_all = pl.pallas_call(
        kernel,
        grid=(t // wb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (n_layers, wb, n, hid), lambda s: (0, s, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_layers, t, n, hid), jnp.dtype(compute_dtype)
        ),
        compiler_params=_compiler_params(interpret, 32 + 8 * wb),
        interpret=interpret,
    )(*args)
    return h_all


def _bwd_pallas(g, x, a_hat, w0, wr, masks, h_all, compute_dtype, interpret,
                keep=1.0, wb=None):
    t, n, c_in = x.shape
    n_layers, _, hid = h_all.shape[0], h_all.shape[1], h_all.shape[3]
    n_masks = 0 if masks is None else masks.shape[0]
    wb = _pick_wb(t, wb)
    in_specs = [
        pl.BlockSpec((wb, n, hid), lambda s: (s, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wb, n, c_in), lambda s: (s, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, n), lambda s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c_in, hid), lambda s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (max(n_layers - 1, 1), hid, hid), lambda s: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [g, x, a_hat, w0, wr]
    if masks is not None:
        in_specs.append(
            pl.BlockSpec(
                (n_masks, wb, n, hid), lambda s: (0, s, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(masks)
    in_specs.append(
        pl.BlockSpec(
            (n_layers, wb, n, hid), lambda s: (0, s, 0, 0),
            memory_space=pltpu.VMEM,
        )
    )
    args.append(h_all)
    kernel = (
        functools.partial(
            _bwd_kernel, n_layers=n_layers, n_masks=n_masks,
            compute_dtype=compute_dtype, keep=keep, wb=wb,
        )
        if masks is not None
        else functools.partial(
            _bwd_kernel_nomask, n_layers=n_layers, compute_dtype=compute_dtype,
            wb=wb,
        )
    )
    dx, dw0, dwr, db = pl.pallas_call(
        kernel,
        grid=(t // wb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((wb, n, c_in), lambda s: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, hid), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (max(n_layers - 1, 1), hid, hid), lambda s: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n_layers, hid), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, n, c_in), x.dtype),
            jax.ShapeDtypeStruct((c_in, hid), jnp.float32),
            jax.ShapeDtypeStruct((max(n_layers - 1, 1), hid, hid), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, hid), jnp.float32),
        ],
        compiler_params=_compiler_params(interpret, 48 + 10 * wb),
        interpret=interpret,
    )(*args)
    return dx, dw0, dwr, db


# ---------------------------------------------------------------------------
# Custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _gcn_train_pallas(x, a_hat, w0, wr, b2d, compute_dtype, interpret, keep,
                      masks):
    h_all = _fwd_pallas(
        x, a_hat, w0, wr, b2d, masks, compute_dtype, interpret, keep
    )
    return h_all[-1]


def _gcn_fwd(x, a_hat, w0, wr, b2d, compute_dtype, interpret, keep, masks):
    h_all = _fwd_pallas(
        x, a_hat, w0, wr, b2d, masks, compute_dtype, interpret, keep
    )
    return h_all[-1], (x, a_hat, w0, wr, b2d, masks, h_all)


def _gcn_bwd(compute_dtype, interpret, keep, res, g):
    x, a_hat, w0, wr, b2d, masks, h_all = res
    dx, dw0, dwr, db = _bwd_pallas(
        g, x, a_hat, w0, wr, masks, h_all, compute_dtype, interpret, keep
    )
    # Masks are non-differentiable sampling artifacts; their integer primal
    # takes a float0 cotangent (matches XLA-path dropout, where the mask is
    # a constant of the trace).
    dmasks = (
        None if masks is None
        else np.zeros(masks.shape, dtype=jax.dtypes.float0)
    )
    # a_hat is a constant of the graph (precomputed adjacency) — a zero
    # cotangent keeps the signature without computing an [N, N] gradient
    # nothing consumes (the graph is never trained).
    return (
        dx.astype(x.dtype),
        jnp.zeros_like(a_hat),
        dw0.astype(w0.dtype),
        dwr.astype(wr.dtype),
        db.astype(b2d.dtype),
        dmasks,
    )


_gcn_train_pallas.defvjp(_gcn_fwd, _gcn_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def train_supported(t: int, n: int, c_in: int, hid: int, n_layers: int) -> bool:
    if not _HAVE_PALLAS:
        return False
    if hid % 128 or n % 8 or t < 1 or n_layers < 1:
        return False
    a_bytes = n * n * 4
    weights = (c_in * hid + (2 * n_layers - 1) * hid * hid // 1) * 4
    streamed = n * (c_in + hid * (n_layers + 1) + hid + c_in) * 4
    return 2 * streamed + a_bytes + 2 * weights <= _VMEM_BUDGET_BYTES


def gcn_stack_train(
    layers,
    a_hat,
    x,
    *,
    dropout_rate: float,
    rng,
    final_dropout: bool = False,
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """Fused training forward of the encoder stack: x [W, N, C] -> [W, N, hid].

    Matches `models.stgcn.apply_encoder`'s train path exactly — masks are
    drawn from the same fold_in(rng, l) streams over the full [W, N, hid]
    shape. First-order differentiable (custom VJP).
    """
    t, n, _ = x.shape
    n_layers = len(layers)
    hid = layers[0]["w"].shape[1]
    w0 = layers[0]["w"]
    if n_layers > 1:
        wr = jnp.stack([layers[l]["w"] for l in range(1, n_layers)])
    else:
        wr = jnp.zeros((1, hid, hid), w0.dtype)
    b2d = jnp.stack([layers[l]["b"] for l in range(n_layers)])

    n_masks = n_layers if final_dropout else n_layers - 1
    masks = None
    keep = 1.0
    if dropout_rate > 0.0 and rng is not None and n_masks > 0:
        keep = 1.0 - dropout_rate
        # int8 {0, 1} — a quarter of the f32 bytes in HBM (the mask stream
        # is written once by the bernoulli and read by BOTH kernel passes);
        # the 1/keep scale folds into the kernel, where (m * f32(1/keep)) is
        # exact for m in {0, 1} so numerics are unchanged vs pre-scaled f32.
        masks = jnp.stack([
            jax.random.bernoulli(
                jax.random.fold_in(rng, l), keep, (t, n, hid)
            )
            for l in range(n_masks)
        ]).astype(jnp.int8)  # [n_masks, W, N, hid]

    return _gcn_train_pallas(
        x, a_hat, w0, wr, b2d, compute_dtype,
        interpret or _FORCE_INTERPRET, keep, masks,
    )
