"""Optimizers and learning-rate schedules (optax).

Covers the reference's three optimization setups:
  * MAML outer loop: AdamW(lr=1e-3, wd=1e-4) + CosineAnnealingWarmRestarts
    (T_0=10, T_mult=2, eta_min=1e-6) + global grad clip 1.0
    (train_hybrid_maml_v5.py:245-252, :174-177);
  * MAML inner loop: plain SGD(lr=0.01) + clip 1.0 (implemented functionally
    in train/maml.py, not via optax, so it stays differentiable);
  * regional adaptation: climate-aware Adam (per-zone lr/weight-decay) with
    the per-epoch ClimateAwareLRScheduler (adaptive_scheduler.py:7-95).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np
import optax

from weatherforecast_stgcn_maml_tpu.config import MetaConfig

# Region-name -> climate-zone membership (adaptive_scheduler.py:29-31).
TROPICAL_REGIONS = frozenset({"Indonesia", "Thailand", "QueensAustralia"})
COLD_REGIONS = frozenset({"Moscow", "NorthSiberia", "Afghanistan"})

# Per-zone (lr multiplier, weight decay) (adaptive_scheduler.py:17-21, :72-76).
CLIMATE_LR_MULT = {"tropical": 0.9, "temperate": 1.0, "cold": 1.1}
CLIMATE_WEIGHT_DECAY = {"tropical": 1e-5, "temperate": 1e-4, "cold": 5e-5}


def climate_zone(region_name: str) -> str:
    if region_name in TROPICAL_REGIONS:
        return "tropical"
    if region_name in COLD_REGIONS:
        return "cold"
    return "temperate"


def cosine_warm_restarts(
    base_lr: float,
    t0: int,
    t_mult: int,
    eta_min: float,
    steps_per_epoch: int = 1,
):
    """Closed-form SGDR schedule (CosineAnnealingWarmRestarts equivalent).

    Cycle lengths t0, t0*t_mult, t0*t_mult^2, ... in *epochs*; `steps_per_epoch`
    maps optimizer-update counts to epochs. Works on traced step values.
    """
    t0 = float(t0)

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) / steps_per_epoch
        if t_mult == 1:
            t_cur = jnp.mod(epoch, t0)
            t_i = t0
        else:
            tm = float(t_mult)
            # Cycle index n: epoch >= t0*(tm^n - 1)/(tm - 1).
            n = jnp.floor(
                jnp.log(epoch / t0 * (tm - 1.0) + 1.0) / jnp.log(tm)
            )
            cycle_start = t0 * (tm**n - 1.0) / (tm - 1.0)
            t_i = t0 * tm**n
            t_cur = epoch - cycle_start
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t_cur / t_i))
        return eta_min + (base_lr - eta_min) * cos

    return schedule


def clip_by_global_norm_torch(max_norm: float) -> optax.GradientTransformation:
    """Global-norm clip with torch.nn.utils.clip_grad_norm_ semantics.

    torch scales by max_norm / (norm + 1e-6) when norm > max_norm;
    optax.clip_by_global_norm scales by min(1, max_norm / norm). The eps
    makes the clipped step ~1e-6 relatively smaller — numerically tiny but
    enough to fork an fp32 training trajectory from the reference's within
    a few epochs (benchmarks/recipe_parity.py). All chains use this variant
    so clipping is bit-consistent with clip_global_norm_tree and torch."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        clipped, _ = clip_global_norm_tree(updates, max_norm)
        return clipped, state

    return optax.GradientTransformation(init_fn, update_fn)


def meta_optimizer(cfg: MetaConfig) -> tuple[optax.GradientTransformation, callable]:
    """Outer-loop AdamW + warm-restart schedule + global clip.

    The schedule is stepped per *optimizer update*; the reference steps its
    scheduler once per epoch with `grad_accum` updates inside, so
    steps_per_epoch = grad_accum.
    """
    schedule = cosine_warm_restarts(
        cfg.outer_lr, cfg.cosine_t0, cfg.cosine_t_mult, cfg.eta_min,
        steps_per_epoch=max(1, cfg.grad_accum),
    )
    tx = optax.chain(
        clip_by_global_norm_torch(cfg.clip_norm),
        optax.adamw(learning_rate=schedule, weight_decay=cfg.weight_decay),
    )
    return tx, schedule


def adaptation_optimizer(
    region_name: str, base_lr: float = 6e-4, clip_norm: float = 1.0
) -> tuple[optax.GradientTransformation, float]:
    """Climate-aware Adam (adaptive_scheduler.py:68-95).

    torch.optim.Adam's `weight_decay` is L2 regularization folded into the
    gradient *before* the Adam moments — optax equivalent: add_decayed_weights
    ahead of scale_by_adam. The learning rate is injected per update (the
    ClimateAwareLRScheduler recomputes it each epoch), so the chain ends at
    the preconditioned update and the train step applies `-lr * u`.
    """
    zone = climate_zone(region_name)
    lr = base_lr * CLIMATE_LR_MULT[zone]
    wd = CLIMATE_WEIGHT_DECAY[zone]
    tx = optax.chain(
        clip_by_global_norm_torch(clip_norm),
        optax.add_decayed_weights(wd),
        optax.scale_by_adam(),
    )
    return tx, lr


@dataclass
class ClimateLRSchedule:
    """Per-epoch climate-aware LR (ClimateAwareLRScheduler, adaptive_scheduler.py:7-66).

    5-epoch cosine cycles scaled by the climate-zone multiplier, with
    loss-based nudges after epoch 3 (x1.1 if loss > 1.0, x0.95 if < 0.2).
    Host-side: the resulting scalar feeds the jitted train step.
    """

    region_name: str
    base_lr: float = 6e-4
    cycle_length: int = 5
    epoch: int = 0

    def step(self, epoch_loss: float | None = None) -> float:
        self.epoch += 1
        progress = (self.epoch - 1) % self.cycle_length / self.cycle_length
        cosine = 0.5 * (1.0 + np.cos(np.pi * progress))
        lr = self.base_lr * CLIMATE_LR_MULT[climate_zone(self.region_name)] * cosine
        if epoch_loss is not None and self.epoch > 3:
            if epoch_loss > 1.0:
                lr *= 1.1
            elif epoch_loss < 0.2:
                lr *= 0.95
        return float(lr)


def freeze_base_mask(params_template) -> dict:
    """Pytree mask: True for trainable leaves, False for the STGCN encoder.

    The reference "freezes" the base by excluding its params from the
    optimizer (hybrid_model.py:34-36, :119-124). With `stop_gradient` alone
    the encoder's grads are zero but decoupled weight decay would still
    shrink it — so when `model.stop_base_gradients` is set, wrap the
    optimizer in `optax.masked` with this mask to leave the base untouched,
    matching torch's requires_grad=False semantics exactly.
    """
    import jax

    return {
        k: (
            jax.tree.map(lambda _: False, v)
            if k == "encoder"
            else jax.tree.map(lambda _: True, v)
        )
        for k, v in params_template.items()
    }


def trainable_mask(params_template, model_cfg) -> dict:
    """Pytree mask from ModelConfig freeze flags (optax.masked).

    False (frozen, no update and no weight decay) for the STGCN encoder
    when `stop_base_gradients`, and for the Koppen table when
    `train_koppen_embedding` is off (reference quirk 11 — the embedding is
    excluded from the adaptation optimizer, adapt_hybrid_v5.py:172)."""
    import jax

    def keep(k):
        if k == "encoder":
            return not model_cfg.stop_base_gradients
        if k == "koppen":
            return model_cfg.train_koppen_embedding
        return True

    return {
        k: jax.tree.map(lambda _: keep(k), v)
        for k, v in params_template.items()
    }


def masked_freeze(tx, mask) -> optax.GradientTransformation:
    """`optax.masked` that ZEROES updates for frozen (mask=False) leaves.

    `optax.masked(tx, mask)` alone passes non-masked updates through
    UNCHANGED — i.e. the raw gradient — and this framework's train steps
    apply `p - lr*u`, so a "frozen" leaf would still take plain-SGD steps.
    (The encoder freeze survived that by accident: `stop_base_gradients`
    zeroes its grads in the model, so the pass-through was zero. The Koppen
    freeze has no stop_gradient — torch semantics keep grads FLOWING through
    the embedding, it's merely absent from the optimizer's param list,
    adapt_hybrid_v5.py:172 — and measurably leaked ~1e-6/step.) Chaining a
    `set_to_zero` over the inverse mask restores torch's not-in-optimizer
    semantics exactly: full gradient flow, zero update, no weight decay.
    """
    import jax

    inv = jax.tree.map(lambda b: not b, mask)
    return optax.chain(
        optax.masked(tx, mask), optax.masked(optax.set_to_zero(), inv)
    )


def clip_global_norm_tree(grads, max_norm: float):
    """Differentiable global-norm clip matching torch's clip_grad_norm_
    (scale by max_norm / (norm + 1e-6) only when norm > max_norm). Used
    inside the MAML inner loop where grads must stay traced."""
    import jax

    leaves = jax.tree.leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    scale = jnp.where(norm > max_norm, max_norm / (norm + 1e-6), 1.0)
    return jax.tree.map(lambda g: g * scale, grads), norm
