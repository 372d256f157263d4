"""Second-order inner-gradient operator with a pluggable Hessian transpose.

The SO meta-gradient through K inner SGD steps needs, at every inner step,
the transpose of d(inner grad)/d(params) applied to the incoming cotangent
— a Hessian-vector product. The default route (``so_impl="xla"``)
linearizes-and-transposes the whole inner gradient computation, which has
two costs at once:

  * every fused Pallas kernel must be routed off (their custom VJPs are
    first-order only), so the ENTIRE step — inner grads, query loss, query
    reverse AND the Hessian transposes — runs the slower XLA paths;
  * XLA's transpose-of-a-reverse-scan schedules poorly at this model's
    shapes (benchmarks/so_decomp_probe.json: the LSTM stack is ~80% of SO
    step time at ~12x its FO-grad cost).

Because the Hessian of a scalar loss is symmetric, ``(dg/dp)^T ct == H ct``
(equality of mixed partials), the transpose can instead be an *explicit*
HVP on a separate, twice-differentiable loss, while everything that is
differentiated only ONCE — the inner gradient itself, the query loss and
its reverse — keeps the fused kernels:

  so_impl="hvp"   H·ct by forward-over-reverse:  jvp(grad(L))(p; ct)
  so_impl="rof"   H·ct by reverse-over-forward:  grad(p ↦ jvp(L)(p; ct))
  so_impl="fhvp"  H·ct by forward-over-reverse where grad(L) itself is the
                  FUSED-kernel gradient, made forward-differentiable by the
                  R-operator kernels (train/so_fused.py +
                  ops/fused_lstm_hvp.py) — nothing in the Hessian
                  transpose runs the XLA LSTM scan.

"rof" builds the directional derivative s(p) = <∇L(p), ct> as ONE
hand-rolled forward-tangent pass and reverses through it once — a single
standard reverse scan over a doubled forward, instead of tangents threaded
through both the forward and the reverse scans.

All three routes compute the same meta-gradient (float64 equivalence
asserted in tests/test_maml.py); the perf A/B lives in
benchmarks/so_impl_probe.py. Reference intent: full MAML
(/root/reference/README.md:116-124, `higher` in requirements.txt:11).
"""

from __future__ import annotations

import numpy as np

import jax

SO_IMPLS = ("xla", "hvp", "rof", "fhvp")


def _zero_ct(x):
    """Zero cotangent for a non-differentiated primal input.

    custom_vjp's bwd must return a cotangent for every primal argument.
    Inexact (float) task tensors get symbolic-zero-equivalent arrays;
    integer / PRNG-key primals take JAX's float0 tangent type. The task
    data and step keys are never targets of the meta-gradient, so zeros
    are exact, not an approximation.
    """
    import jax.numpy as jnp

    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact):
        return jnp.zeros_like(x)
    return np.zeros(np.shape(x), jax.dtypes.float0)


def make_so_grad(loss_fast, loss_diff2, impl: str, fused_grad_fn=None):
    """Build the inner-gradient operator g(p, aux, step_rng) = ∇_p loss.

    loss_fast:  loss(p, aux, step_rng) on the fast (fused-kernel) model
                route — differentiated ONCE to produce g. `aux` is a
                pytree of task data passed EXPLICITLY (a custom_vjp must
                not close over task tensors: under the meta step's task
                vmap they are batch tracers, and closed-over tracers
                escaping into the bwd rule is an UnexpectedTracerError).
    loss_diff2: the same loss on a twice-differentiable (pure-XLA) model
                route — used only inside the Hessian transpose. For
                impl="xla" the caller must pass a twice-differentiable
                loss_fast; loss_diff2 is unused.
    fused_grad_fn: for impl="fhvp", the forward-differentiable gradient
                from train/so_fused.py:make_grad_loss_fused — jvp'd
                directly for the HVP so the Hessian transpose runs the
                R-operator kernels.
    """
    if impl == "xla":
        return jax.grad(loss_fast)
    if impl not in SO_IMPLS:
        raise ValueError(
            f"meta.so_impl={impl!r}: expected one of {SO_IMPLS}"
        )
    if impl == "fhvp" and fused_grad_fn is None:
        raise ValueError("so_impl='fhvp' requires fused_grad_fn")

    @jax.custom_vjp
    def g_op(p, aux, step_rng):
        return jax.grad(loss_fast)(p, aux, step_rng)

    def g_fwd(p, aux, step_rng):
        return jax.grad(loss_fast)(p, aux, step_rng), (p, aux, step_rng)

    def g_bwd(res, ct):
        p, aux, step_rng = res
        if impl == "fhvp":
            _, hv = jax.jvp(
                lambda q: fused_grad_fn(q, aux, step_rng), (p,), (ct,)
            )
        elif impl == "hvp":
            _, hv = jax.jvp(
                lambda q: jax.grad(loss_diff2)(q, aux, step_rng), (p,), (ct,)
            )
        else:  # "rof"

            def directional(q):
                _, t = jax.jvp(
                    lambda qq: loss_diff2(qq, aux, step_rng), (q,), (ct,)
                )
                return t

            hv = jax.grad(directional)(p)
        return hv, jax.tree.map(_zero_ct, aux), _zero_ct(step_rng)

    g_op.defvjp(g_fwd, g_bwd)
    return g_op
