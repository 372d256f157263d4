"""Fused whole-tree clip+SGD update (ops/fused_sgd.py) vs the XLA tree ops.

Runs the kernel through the Pallas interpreter on CPU: unbatched and
vmapped parity (clip active and inactive), FO gradient semantics (identity
Jacobian), and full meta-step equivalence with the flag on/off. TPU timing
is covered by benchmarks/sgd_math_probe.py and the default bench.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weatherforecast_stgcn_maml_tpu.ops import fused_sgd
from weatherforecast_stgcn_maml_tpu.train.optimizers import (
    clip_global_norm_tree,
)


def _tree(seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * scale)
    return {
        "enc": {"layers": [{"w": mk(24, 32), "b": mk(32)} for _ in range(2)]},
        "lstm": {"layers": [{"wx": mk(32, 64), "wh": mk(16, 64), "b": mk(64)}]},
        "head": {"w": mk(16, 12), "b": mk(12)},
        "koppen": mk(31, 8),
    }


def _ref(p, g, lr, clip):
    g = jax.lax.stop_gradient(g)
    g, _ = clip_global_norm_tree(g, clip)
    return jax.tree.map(lambda a, b: a - lr * b, p, g)


@pytest.mark.parametrize("gscale", [1e-3, 10.0])  # clip inactive / active
def test_parity_unbatched(gscale):
    p = _tree(0)
    g = _tree(1, gscale)
    with fused_sgd.force_interpret():
        got = fused_sgd.clip_sgd_update(p, g, 0.01, 1.0)
    want = _ref(p, g, 0.01, 1.0)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )


def test_parity_vmapped_per_instance_norms():
    """Each vmapped instance must clip by ITS OWN global norm."""
    p = _tree(0)
    # Instance 0 far over the clip norm, instance 1 far under.
    bp = jax.tree.map(lambda x: jnp.stack([x, x * 0.5]), p)
    bg = jax.tree.map(lambda x: jnp.stack([x * 50.0, x * 1e-4]), p)
    with fused_sgd.force_interpret():
        got = jax.jit(
            jax.vmap(lambda pp, gg: fused_sgd.clip_sgd_update(pp, gg, 0.01, 1.0))
        )(bp, bg)
    want = jax.vmap(lambda pp, gg: _ref(pp, gg, 0.01, 1.0))(bp, bg)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )


def test_fo_gradient_is_identity():
    p = _tree(0)
    g = _tree(1, 5.0)

    def f(pp):
        with fused_sgd.force_interpret():
            out = fused_sgd.clip_sgd_update(pp, g, 0.01, 1.0)
        return sum(jnp.sum(l) for l in jax.tree.leaves(out))

    grads = jax.grad(f)(p)
    for l in jax.tree.leaves(grads):
        np.testing.assert_allclose(np.asarray(l), 1.0)

    # And it matches the XLA FO linearization exactly (stop-gradiented g).
    def f_ref(pp):
        return sum(jnp.sum(l) for l in jax.tree.leaves(_ref(pp, g, 0.01, 1.0)))

    ref_grads = jax.grad(f_ref)(p)
    for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(ref_grads)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_meta_step_equivalence():
    """Full FO meta step: fused inner update == XLA tree ops."""
    from weatherforecast_stgcn_maml_tpu.config import (
        DataConfig, MetaConfig, ModelConfig,
    )
    from weatherforecast_stgcn_maml_tpu.data.synthetic import (
        synthetic_region_for_box,
    )
    from weatherforecast_stgcn_maml_tpu.train.maml import (
        init_meta_state, make_jit_meta_step,
    )
    from weatherforecast_stgcn_maml_tpu.train.tasks import (
        build_meta_tasks, stack_tasks,
    )

    model_cfg = ModelConfig(
        hidden_channels=16, gcn_layers=2, lstm_hidden=8, lstm_layers=2,
        window=6, horizon=2,
    )
    meta_cfg = MetaConfig(
        meta_batch=2, grad_accum=1, inner_epochs=1, inner_batches=3,
        query_train_mode=False,
    )
    regions = [
        synthetic_region_for_box(
            (10.0 + i, 10.5 + i, 20.0, 20.5), num_timesteps=40, seed=i
        )
        for i in range(2)
    ]
    built = build_meta_tasks(regions, model_cfg, meta_cfg, DataConfig())
    tasks = jax.tree.map(jnp.asarray, stack_tasks([b.task for b in built]))
    key = jax.random.key(0)

    out = {}
    for name, fused in [("fused", True), ("xla", False)]:
        cfg = dataclasses.replace(meta_cfg, fused_inner_update=fused)
        state = init_meta_state(jax.random.key(0), model_cfg, cfg)
        step = make_jit_meta_step(model_cfg, cfg)
        if fused:
            with fused_sgd.force_interpret():
                state, m = step(state, tasks, key)
        else:
            state, m = step(state, tasks, key)
        out[name] = (state, m)

    np.testing.assert_allclose(
        float(out["fused"][1]["meta_loss"]), float(out["xla"][1]["meta_loss"]),
        rtol=1e-6,
    )
    for a, b in zip(
        jax.tree.leaves(out["fused"][0].params),
        jax.tree.leaves(out["xla"][0].params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        )
