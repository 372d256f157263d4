"""Loss functions with node masking for padded graphs.

Padding the node axis to a lane-aligned size (graph.py) lets every region
share one compiled program; these losses restrict the reduction to real
nodes so padding never influences gradients or metrics.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mse(
    preds: jnp.ndarray, targets: jnp.ndarray, node_mask: jnp.ndarray
) -> jnp.ndarray:
    """MSE over valid nodes.

    Args:
      preds, targets: [..., H, N, C].
      node_mask: [N] with 1.0 for real nodes.
    Returns scalar: mean squared error over all (..., H, valid N, C) entries —
    the same reduction as the reference's nn.MSELoss on unpadded tensors
    (train_hybrid_maml_v5.py:119, adapt_hybrid_v5.py:180).
    """
    mask = node_mask[..., :, None]  # [N, 1]
    se = jnp.square(preds - targets) * mask
    denom = jnp.maximum(jnp.sum(node_mask), 1.0)
    # Average over every axis; node axis contributes only valid entries.
    per_node_terms = se.sum(axis=(-3, -2, -1))
    scale = preds.shape[-3] * preds.shape[-1] * denom
    return jnp.mean(per_node_terms) / scale


def masked_mae(
    preds: jnp.ndarray, targets: jnp.ndarray, node_mask: jnp.ndarray
) -> jnp.ndarray:
    """Mean absolute error over valid nodes (same reduction as masked_mse)."""
    mask = node_mask[..., :, None]
    ae = jnp.abs(preds - targets) * mask
    denom = jnp.maximum(jnp.sum(node_mask), 1.0)
    per_node_terms = ae.sum(axis=(-3, -2, -1))
    scale = preds.shape[-3] * preds.shape[-1] * denom
    return jnp.mean(per_node_terms) / scale
