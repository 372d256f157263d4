"""Multi-layer LSTM as `lax.scan` over time, batched over nodes.

The reference runs one cuDNN LSTM launch *per node* in a Python loop
(hybrid_model.py:94-102) — N sequential kernel launches per forward. Here the
node axis is simply the batch axis of a scanned LSTM: one compiled scan of W
steps processes all nodes at once, each step being two MXU matmuls
([N, C] @ [C, 4H] and [N, H] @ [H, 4H]). The input projection for *all*
timesteps is hoisted out of the scan into a single [W*N, C] @ [C, 4H] matmul
(the recurrent matmul is the only sequential dependency).

Gate order is (i, f, g, o); a single bias per layer (the sum of torch's
b_ih + b_hh is mathematically identical).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from weatherforecast_stgcn_maml_tpu.models.common import (
    Params,
    accum_dtype,
    dropout,
    scaled_uniform,
)


def init_lstm(key, in_dim: int, hidden: int, num_layers: int) -> Params:
    """Uniform(-1/sqrt(hidden)) init, the torch.nn.LSTM scheme, so parameter
    scales match the reference (hybrid_model.py:42-49)."""
    layers = []
    bound = 1.0 / float(hidden) ** 0.5
    for l in range(num_layers):
        key, kx, kh, kb = jax.random.split(key, 4)
        d_in = in_dim if l == 0 else hidden
        layers.append(
            {
                "wx": scaled_uniform(kx, (d_in, 4 * hidden), bound),
                "wh": scaled_uniform(kh, (hidden, 4 * hidden), bound),
                "b": scaled_uniform(kb, (4 * hidden,), bound),
            }
        )
    return {"layers": layers}


def _lstm_layer(
    p: Params, x_tbc: jnp.ndarray, *, compute_dtype=jnp.float32, unroll: int = 1
) -> jnp.ndarray:
    """One LSTM layer over time-major input [T, B, C] -> outputs [T, B, H]."""
    t, b, _ = x_tbc.shape
    hidden = p["wh"].shape[0]
    acc = accum_dtype(compute_dtype)
    wx = p["wx"].astype(compute_dtype)
    wh = p["wh"].astype(compute_dtype)
    bias = p["b"]

    # Hoist the input projection out of the scan: [T, B, C] @ [C, 4H].
    x_proj = (
        jnp.dot(x_tbc.astype(compute_dtype), wx, preferred_element_type=acc)
        + bias
    )

    def step(carry, xp):
        h, c = carry
        gates = xp + jnp.dot(
            h.astype(compute_dtype), wh, preferred_element_type=acc
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    # Derive the zero carry from x_proj (not fresh jnp.zeros) so its dtype
    # AND its device-varying type match under shard_map'd node sharding.
    zero = x_proj[0, :, :hidden] * 0.0
    init = (zero, zero)
    # Unrolling matters: each recurrent matmul is tiny ([B,H]@[H,4H]) and a
    # rolled scan pays ~15-20us loop overhead per trip on TPU — at W=24 that
    # overhead, not the MXU, dominates the hybrid's inner-loop time
    # (benchmarks/perf_probe.py). `unroll=W` emits straight-line code.
    (_, _), outputs = jax.lax.scan(
        step, init, x_proj, unroll=max(1, min(unroll, t))
    )
    return outputs


def apply_lstm(
    params: Params,
    x: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    train: bool = False,
    rng=None,
    compute_dtype=jnp.float32,
    unroll: int = 1,
) -> jnp.ndarray:
    """Run the stacked LSTM.

    Args:
      x: [B, T, C] batch-major sequences (B = nodes).
    Returns:
      [B, H] last-timestep hidden state of the top layer — the feature the
      hybrid head consumes (hybrid_model.py:101).

    Inter-layer dropout is applied to every layer's output except the last
    (torch.nn.LSTM semantics when num_layers > 1).
    """
    h = jnp.swapaxes(x, 0, 1)  # [T, B, C] time-major for scan
    n_layers = len(params["layers"])
    for l, layer in enumerate(params["layers"]):
        h = _lstm_layer(layer, h, compute_dtype=compute_dtype, unroll=unroll)
        if l < n_layers - 1 and n_layers > 1:
            sub = jax.random.fold_in(rng, l) if rng is not None else None
            h = dropout(h, dropout_rate, sub, train=train)
    return h[-1]  # [B, H]
