"""Whole-tree fused clip + SGD update in ONE Pallas program.

The MAML inner loop applies `p - inner_lr * clip(g)` to the ~23-leaf,
~860K-param tree 182 times per meta step. Lowered through XLA this is ~46
back-to-back tiny ops (a sumsq reduce and a scale+subtract per leaf), each
paying a few microseconds of fixed overhead — measured 0.25 ms/iter for
the update alone and 0.27 ms with the clip (benchmarks/sgd_math_probe.json;
update_only 249.5 us, clip_update 265.6 us, and FLATTENING to one vector is
WORSE at 310 us because the concat/slice ops replace the per-leaf ops).
That is ~18% of the 1.71 ms/iter inner step (benchmarks/
meta_component_probe.json) for work whose HBM traffic floor is ~12 us.

This op runs the entire clip + update as ONE kernel: every leaf's grad
sumsq accumulates in registers, the torch-semantics clip scale
(optimizers.clip_global_norm_tree: scale by max_norm/(norm+1e-6) only when
norm > max_norm) folds into the learning rate, and every leaf updates in
the same program — one kernel's fixed cost instead of ~46.

Gradient semantics: FIRST-ORDER ONLY, by construction. The op applies
`stop_gradient` to the incoming grads, so its exact Jacobian w.r.t.
`params` is the identity — the same linearization the FOMAML inner step
produces through XLA (train/maml.py stop_gradients the inner grads before
the update). The custom VJP passes the cotangent through unchanged.
Second-order MAML must NOT route here; train/maml.py keeps the XLA path
for `second_order=True` (as it does for all fused kernels).

vmap (the meta step's task axis) maps to a leading grid dimension: each
program step clips by ITS OWN task's global norm, exactly like the
unbatched op per task.

Reference parity: the clip matches torch.nn.utils.clip_grad_norm_
(adapt_hybrid_v5.py:200 semantics) exactly as clip_global_norm_tree does,
including the leaf-order sum and the 1e-6 eps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

# Test hook (CPU CI) mirroring the other ops modules.
_FORCE_INTERPRET = False

# Kill switch mirroring native.set_enabled-style gates: tests compare the
# fused route against the XLA tree ops with this off.
_ENABLED = True


class force_interpret:
    def __enter__(self):
        global _FORCE_INTERPRET
        self._saved = _FORCE_INTERPRET
        _FORCE_INTERPRET = True

    def __exit__(self, *exc):
        global _FORCE_INTERPRET
        _FORCE_INTERPRET = self._saved


def _kernel(n_leaves: int, lr: float, max_norm: float, *refs):
    ps = refs[:n_leaves]
    gs = refs[n_leaves : 2 * n_leaves]
    outs = refs[2 * n_leaves :]
    # Leaf-order sumsq accumulation — the same reduction order as
    # clip_global_norm_tree's python-level sum over jax.tree.leaves.
    total = jnp.float32(0.0)
    for g in gs:
        gg = g[...].astype(jnp.float32)
        total = total + jnp.sum(gg * gg)
    norm = jnp.sqrt(total)
    scale = jnp.where(
        norm > max_norm, max_norm / (norm + 1e-6), jnp.float32(1.0)
    )
    step = lr * scale
    for p, g, o in zip(ps, gs, outs):
        o[...] = p[...] - step * g[...]


def _run_pallas(leaves_p, leaves_g, lr, max_norm, interpret):
    from jax.experimental.pallas import tpu as pltpu

    n = len(leaves_p)
    kernel = functools.partial(_kernel, n, float(lr), float(max_norm))
    out_shapes = [jax.ShapeDtypeStruct(p.shape, p.dtype) for p in leaves_p]
    vmem = sum(p.size * p.dtype.itemsize for p in leaves_p) * 3
    params = (
        {}
        if interpret
        else {
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=int(max(vmem * 2.5, 8 * 1024 * 1024))
            )
        }
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        interpret=interpret,
        **params,
    )(*leaves_p, *leaves_g)


def _kernel_batched(
    n_leaves: int, v: int, lr: float, max_norm: float, *refs
):
    # One program, static unroll over the (small) task-vmap width: a
    # per-instance grid would need (1, ...) blocks, which the TPU lowering
    # rejects for leaves whose trailing dims aren't (8, 128)-aligned (e.g.
    # [V, 256] biases); full-array refs are always legal.
    ps = refs[:n_leaves]
    gs = refs[n_leaves : 2 * n_leaves]
    outs = refs[2 * n_leaves :]
    for i in range(v):
        total = jnp.float32(0.0)
        for g in gs:
            gg = g[i].astype(jnp.float32)
            total = total + jnp.sum(gg * gg)
        norm = jnp.sqrt(total)
        scale = jnp.where(
            norm > max_norm, max_norm / (norm + 1e-6), jnp.float32(1.0)
        )
        step = lr * scale
        for p, g, o in zip(ps, gs, outs):
            o[i] = p[i] - step * g[i]


def _run_pallas_batched(leaves_p, leaves_g, lr, max_norm, interpret):
    """Leading batch axis handled inside one program (per-instance norms)."""
    from jax.experimental.pallas import tpu as pltpu

    n = len(leaves_p)
    v = leaves_p[0].shape[0]
    kernel = functools.partial(
        _kernel_batched, n, v, float(lr), float(max_norm)
    )
    out_shapes = [jax.ShapeDtypeStruct(p.shape, p.dtype) for p in leaves_p]
    vmem = sum(p.size * p.dtype.itemsize for p in leaves_p) * 3
    params = (
        {}
        if interpret
        else {
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=int(max(vmem * 2.5, 8 * 1024 * 1024))
            )
        }
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        interpret=interpret,
        **params,
    )(*leaves_p, *leaves_g)


def fused_supported() -> bool:
    if not (_HAVE_PALLAS and _ENABLED):
        return False
    if _FORCE_INTERPRET:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def clip_sgd_update(params, grads, lr: float, max_norm: float):
    """`p - lr * clip(g)` over the whole tree in one fused kernel.

    lr and max_norm are STATIC (python floats — the MAML inner_lr and
    clip_norm are config constants). Grads are stop-gradiented inside, so
    the op's Jacobian w.r.t. params is exactly the identity (FO semantics);
    the custom VJP passes cotangents through. Falls back to the XLA tree
    ops off-TPU or when disabled.
    """
    if not isinstance(lr, (int, float)) or not isinstance(
        max_norm, (int, float)
    ):
        raise TypeError(
            "clip_sgd_update needs STATIC (python float) lr/max_norm — they "
            "bake into the kernel; got "
            f"lr={type(lr).__name__}, max_norm={type(max_norm).__name__}"
        )
    if not fused_supported():
        from weatherforecast_stgcn_maml_tpu.train.optimizers import (
            clip_global_norm_tree,
        )

        g = jax.lax.stop_gradient(grads)
        g, _ = clip_global_norm_tree(g, max_norm)
        return jax.tree.map(lambda a, b: a - lr * b, params, g)

    return _clip_sgd_fused(params, jax.lax.stop_gradient(grads), lr, max_norm)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _clip_sgd_fused(params, grads, lr, max_norm):
    return _clip_sgd_impl(params, grads, lr, max_norm)


def _clip_sgd_impl(params, grads, lr, max_norm):
    leaves_p, treedef = jax.tree.flatten(params)
    leaves_g = jax.tree.leaves(grads)
    interpret = _FORCE_INTERPRET
    outs = _core(len(leaves_p), lr, max_norm, interpret)(leaves_p, leaves_g)
    return jax.tree.unflatten(treedef, outs)


@functools.lru_cache(maxsize=None)
def _core(n_leaves, lr, max_norm, interpret):
    """The vmappable kernel wrapper over flat leaf lists.

    custom_vmap maps the task axis to the kernel grid: the rule requires
    every leaf batched the same way, which jax.vmap over (params, grads)
    pytrees guarantees in the MAML inner loop.
    """
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def run(leaves_p, leaves_g):
        return list(
            _run_pallas(leaves_p, leaves_g, lr, max_norm, interpret)
        )

    @run.def_vmap
    def _rule(axis_size, in_batched, leaves_p, leaves_g):
        # vmap's scan-carry fixed point first traces with the carry
        # (params) unbatched while grads are task-batched — broadcast any
        # unbatched leaf (transient in the final trace, where the carry
        # resolves to batched).
        pb, gb = in_batched

        def bcast(x, b):
            return x if b else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape
            )

        leaves_p = [bcast(x, b) for x, b in zip(leaves_p, pb)]
        leaves_g = [bcast(x, b) for x, b in zip(leaves_g, gb)]
        outs = _run_pallas_batched(leaves_p, leaves_g, lr, max_norm, interpret)
        return list(outs), [True] * len(outs)

    return run


def _fwd(params, grads, lr, max_norm):
    return _clip_sgd_fused(params, grads, lr, max_norm), None


def _bwd(lr, max_norm, _res, ct):
    # out = p - lr*clip(stop_grad(g)): d out/d p = I, d out/d g = 0.
    return ct, jax.tree.map(jnp.zeros_like, ct)


_clip_sgd_fused.defvjp(_fwd, _bwd)
