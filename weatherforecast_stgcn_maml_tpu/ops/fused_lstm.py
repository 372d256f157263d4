"""Fused multi-layer LSTM forward as a single Pallas TPU kernel.

The XLA path (models/lstm.py) runs one `lax.scan` per layer with the
recurrent weights re-fetched from HBM each of the T steps and inter-layer
activations round-tripping through HBM. This kernel processes a tile of the
batch through ALL timesteps and ALL layers in one program:

  * every weight matrix lives in VMEM for the whole kernel;
  * the input projection for a (layer, tile) is one big [tile*T, C] @
    [C, 4H] MXU matmul;
  * the T recurrent steps run in-register/VMEM with `fori_loop`;
  * inter-layer activations stay in a VMEM scratch buffer.

Eval/serving path only (no inter-layer dropout — the training path keeps
the XLA scan). Backward falls back to differentiating the XLA
implementation (custom VJP), so the op is still safe under `jax.grad`.

VMEM budget per program at reference scale (`_TILE`=64, T=24, C=256,
H=128): input tile 1.6 MB + x_proj scratch 0.8 MB + layer-out scratch
0.8 MB + weights ~1.1 MB -> ~4.3 MB, under `_VMEM_BUDGET_BYTES` (12 MiB,
below Mosaic's 16 MiB default scoped cap). `fits_vmem` guards larger or
misaligned shapes back to XLA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from weatherforecast_stgcn_maml_tpu.models.common import lstm_bias

from weatherforecast_stgcn_maml_tpu.models.lstm import apply_lstm

_VMEM_BUDGET_BYTES = 12 * 1024 * 1024
_TILE = 64


def _layer_dims(params):
    layers = params["layers"]
    c_in = layers[0]["wx"].shape[0]
    hidden = layers[0]["wh"].shape[0]
    return layers, c_in, hidden


def fits_vmem(params, t: int) -> bool:
    layers, c_in, hidden = _layer_dims(params)
    # Mosaic lane alignment: the kernel's gates[:, k*hidden:(k+1)*hidden]
    # slices and [TILE, T, hidden] scratches need 128-lane-aligned hidden
    # (same gate as lstm_scan.pallas_supported / stack_supported) — route
    # misaligned shapes back to XLA instead of failing in the compiler.
    if hidden % 128 or c_in % 128:
        return False
    weights = sum(
        (l["wx"].size + l["wh"].size + lstm_bias(l).size) * 4 for l in layers
    )
    # Double-buffered input block + h/xp scratches.
    tile_bufs = _TILE * t * (2 * c_in + hidden + 4 * hidden) * 4
    return weights + tile_bufs + 2 * _TILE * hidden * 4 <= _VMEM_BUDGET_BYTES


def _kernel(x_ref, *rest, num_layers, t, hidden, compute_dtype):
    wx_refs = rest[:num_layers]
    wh_refs = rest[num_layers : 2 * num_layers]
    b_refs = rest[2 * num_layers : 3 * num_layers]
    out_ref = rest[3 * num_layers]
    h_scratch = rest[3 * num_layers + 1]  # [TILE, T, H] inter-layer buffer
    xp_ref = rest[3 * num_layers + 2]  # [TILE, T, 4H] scratch

    tile = x_ref.shape[1]

    h_final = None
    for l in range(num_layers):
        wx = wx_refs[l][:].astype(compute_dtype)
        wh = wh_refs[l][:].astype(compute_dtype)
        c_in = wx.shape[0]
        # The whole tile's input projection as one MXU matmul. Layer 0 reads
        # the kernel input; later layers read the previous layer's outputs
        # from h_scratch (fully materialized before it gets overwritten —
        # Mosaic only supports full-width dynamic stores, so per-step writes
        # below cover the entire last dim).
        src = x_ref[0] if l == 0 else h_scratch[:]
        flat = src.reshape(tile * t, c_in)
        xp_ref[:] = (
            jnp.dot(
                flat.astype(compute_dtype), wx, preferred_element_type=jnp.float32
            ).reshape(tile, t, 4 * hidden)
            + b_refs[l][:]
        )

        def step(s, carry):
            h, c = carry
            gates = xp_ref[:, s, :] + jnp.dot(
                h.astype(compute_dtype), wh, preferred_element_type=jnp.float32
            )
            i = jax.nn.sigmoid(gates[:, :hidden])
            f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
            g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
            o = jax.nn.sigmoid(gates[:, 3 * hidden :])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            h_scratch[:, s, :] = h  # full-width store (aligned)
            return (h, c)

        zero = jnp.zeros((tile, hidden), jnp.float32)
        h_final, _ = jax.lax.fori_loop(0, t, step, (zero, zero))
    out_ref[:] = h_final


def _pallas_forward(params, x, compute_dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    layers, c_in, hidden = _layer_dims(params)
    b, t, _ = x.shape
    num_layers = len(layers)
    pad_b = -(-b // _TILE) * _TILE
    if pad_b != b:
        x = jnp.concatenate(
            [x, jnp.zeros((pad_b - b, t, c_in), x.dtype)], axis=0
        )

    w_specs = [
        pl.BlockSpec(l["wx"].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for l in layers
    ]
    wh_specs = [
        pl.BlockSpec(l["wh"].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for l in layers
    ]
    b2d = [lstm_bias(l).reshape(1, -1) for l in layers]
    b_specs = [
        pl.BlockSpec(bb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for bb in b2d
    ]

    out = pl.pallas_call(
        partial(
            _kernel,
            num_layers=num_layers,
            t=t,
            hidden=hidden,
            compute_dtype=compute_dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((pad_b, hidden), jnp.float32),
        grid=(pad_b // _TILE,),
        in_specs=[
            pl.BlockSpec(
                (1, _TILE, t, c_in),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *w_specs,
            *wh_specs,
            *b_specs,
        ],
        out_specs=pl.BlockSpec(
            (_TILE, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_TILE, t, hidden), jnp.float32),
            pltpu.VMEM((_TILE, t, 4 * hidden), jnp.float32),
        ],
    )(x.reshape(1, pad_b, t, c_in), *[l["wx"] for l in layers],
      *[l["wh"] for l in layers], *b2d)
    return out[:b]


def _xla_forward(params, x, compute_dtype):
    return apply_lstm(params, x, compute_dtype=compute_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_lstm(params, x, compute_dtype):
    if (
        jax.default_backend() != "tpu"
        or jnp.dtype(compute_dtype) == jnp.float64
        or not fits_vmem(params, x.shape[1])
    ):
        return _xla_forward(params, x, compute_dtype)
    return _pallas_forward(params, x, compute_dtype)


def _fwd(params, x, compute_dtype):
    return _fused_lstm(params, x, compute_dtype), (params, x)


def _bwd(compute_dtype, res, g):
    params, x = res
    _, vjp = jax.vjp(lambda p, xx: _xla_forward(p, xx, compute_dtype), params, x)
    return vjp(g)


_fused_lstm.defvjp(_fwd, _bwd)


def fused_lstm_last_hidden(params, x, *, compute_dtype=jnp.float32):
    """Fused replacement for `apply_lstm(params, x)` (eval mode).

    Args: x [B, T, C] batch-major. Returns [B, H] top-layer last hidden.
    """
    return _fused_lstm(params, x, compute_dtype)
