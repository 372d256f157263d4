"""Node-sharded fused GCN layer op — the shard_map path's encoder kernel.

The shard_map dp x sp meta step (parallel/meta_sp.py) keeps the fused LSTM
kernels engaged per node shard, but its GCN encoder ran plain XLA dots with
f32 dropout machinery (`parallel.spatial._spatial_encoder`) — measured as
the bulk of the path's 20% overhead vs the unsharded step at a 1x1 mesh
(benchmarks/shardmap_meta_probe.json, round 4): the unsharded step's fused
GCN TRAIN kernel (ops/fused_gcn_train.py) is a whole-stack program that a
node-sharded encoder cannot reuse, because an all-gather must run between
layers and collectives cannot live inside the kernel.

This module refactors that stack kernel into a PER-LAYER "sandwich" op that
keeps everything between two gathers fused:

    hw_full[l] --(kernel)--> h_post[l]  and  hw_local[l+1]

i.e. one Pallas program per direction computes the A-row-block contraction
`a_rows @ hw_full` + bias + ReLU + int8 dropout-mask multiply AND the next
layer's dense transform `h_post @ W[l+1]` — so the activation never round-
trips HBM between the graph contraction and the dense transform, dropout
streams as int8 {0,1} with 1/keep folded in (quarter the mask bytes of the
XLA where-machinery), and the backward recovers relu' from the post-dropout
residual exactly like the stack kernel. The all-gather stays OUTSIDE in
XLA (`jax.lax.all_gather` inside the shard_map body); its transpose is the
psum-scatter that reduces each shard's partial `d_hw_full` — so the custom
VJP emits per-shard partials and the collective algebra is XLA's.

At a 1-shard mesh the gather is the identity and the sandwich chain is the
stack kernel split at layer boundaries — same dots, same masks, residuals
crossing HBM once per layer instead of zero; the remaining gap vs the
whole-stack kernel is measured, not assumed (benchmarks/shardmap_meta_probe).

Custom VJP => first-order only; the shard_map SO path already reroutes its
twice-differentiated model copy to XLA (parallel/meta_sp.py), same as the
unsharded step.

Reference workload: /root/reference/train_hybrid_maml_v5.py:110-184 sharded
over a device mesh (the reference trains single-device; node sharding is
this framework's scale-out axis, SURVEY.md section 5).
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

from weatherforecast_stgcn_maml_tpu.ops.fused_lstm_stack import _join_vma

# Same empirical Mosaic scoped-allocation calibration as the stack kernels.
_VMEM_BUDGET_BYTES = 34 * 1024 * 1024

_FORCE_INTERPRET = False
_FORCE_REFERENCE = False

# Time slices per program instance — same tuning as the stack kernel's
# _TIME_BLOCK (benchmarks/gcn_block_probe.json: wb=4 wins, wb=8 regresses).
_TIME_BLOCK = 4


class force_interpret:
    """Run the kernel bodies through the Pallas interpreter (CPU tests).

    Only usable OUTSIDE shard_map: the interpreter re-evaluates the kernel
    jaxpr under the outer trace, where shard_map's check_vma rejects the
    kernels' literal constants against varying block values. Kernel-level
    CPU tests therefore exercise the ops standalone (per-shard slices fed
    by hand); the shard_map GLUE is covered by `force_reference` below, and
    the real compiled-kernels-inside-shard_map path by bench.py's TPU gate.
    """

    def __enter__(self):
        global _FORCE_INTERPRET
        self._saved = _FORCE_INTERPRET
        _FORCE_INTERPRET = True

    def __exit__(self, *exc):
        global _FORCE_INTERPRET
        _FORCE_INTERPRET = self._saved


class force_reference:
    """Route `gcn_shard_encoder` through the plain-JAX layer reference.

    Engages the sandwich route (gathers, mask draws, pcasts, layer
    chaining) inside shard_map on any backend, with `_layer_reference`
    standing in for the Pallas op — whose numerics the standalone
    interpret-mode tests pin against that same reference.
    """

    def __enter__(self):
        global _FORCE_REFERENCE
        self._saved = _FORCE_REFERENCE
        _FORCE_REFERENCE = True

    def __exit__(self, *exc):
        global _FORCE_REFERENCE
        _FORCE_REFERENCE = self._saved


def _compiler_params(interpret: bool, mib: int):
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=mib * 1024 * 1024)


def _pick_wb(t: int) -> int:
    for wb in range(min(_TIME_BLOCK, t), 0, -1):
        if t % wb == 0:
            return wb
    return 1


def shard_layer_supported(t: int, nl: int, n: int, hid: int,
                          itemsize: int = 4) -> bool:
    """VMEM gate for one sandwich layer (backward is the wider pass).

    nl = this shard's row count, n = full padded node count. Streams are
    double-buffered; the adjacency row block and weights are grid-constant.
    """
    if not _HAVE_PALLAS:
        return False
    if hid % 128 or nl % 8 or n % 128 or t < 1:
        return False
    wb = _pick_wb(t)
    a_bytes = nl * n * 4
    w_bytes = 2 * hid * hid * 4  # w_next + its dw accumulator
    # fwd streams: hw_full block in, h_post + hw_next out, int8 mask.
    # bwd streams: g1 + g2 + h_post res in, d_hw_full ([wb, n, hid]!) out.
    streamed = wb * (
        2 * n * hid * itemsize          # hw_full in / d_hw_full out
        + 4 * nl * hid * itemsize       # h/hw_next/g1/g2
        + nl * hid                      # int8 mask
    )
    return 2 * streamed + a_bytes + w_bytes <= _VMEM_BUDGET_BYTES


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(hw_ref, a_ref, b_ref, wn_ref, m_ref, h_out, hwn_out,
                *, has_next, has_mask, compute_dtype, keep, wb):
    a = a_ref[:].astype(compute_dtype)
    hw = hw_ref[:].astype(compute_dtype)  # [wb, N, hid]
    nl = a.shape[0]
    hid = hw.shape[-1]
    # A-row-block contraction per time slice (A is block-diagonal over
    # slices, exactly like the stack kernel).
    z = jnp.stack([
        jnp.dot(a, hw[s], preferred_element_type=jnp.float32)
        for s in range(wb)
    ]) + b_ref[:]
    h = jnp.maximum(z, 0.0)
    if has_mask:
        inv_keep = 1.0 / keep
        h = h * (m_ref[:].astype(jnp.float32) * inv_keep)
    h_out[:] = h.astype(h_out.dtype)
    if has_next:
        wn = wn_ref[:].astype(compute_dtype)
        hwn = jnp.dot(
            h.astype(compute_dtype).reshape(wb * nl, hid), wn,
            preferred_element_type=jnp.float32,
        )
        hwn_out[:] = hwn.reshape(wb, nl, -1).astype(hwn_out.dtype)


def _bwd_kernel(g1_ref, g2_ref, h_res_ref, a_ref, wn_ref, m_ref,
                dhw_ref, dwn_ref, db_ref,
                *, has_next, has_mask, compute_dtype, keep, wb):
    t = pl.program_id(0)
    a = a_ref[:].astype(compute_dtype)
    h_post = h_res_ref[:].astype(jnp.float32)  # [wb, NL, hid]
    nl = h_post.shape[1]
    hid = h_post.shape[-1]
    dh = g1_ref[:].astype(jnp.float32)
    if has_next:
        g2 = g2_ref[:].astype(compute_dtype)
        wn = wn_ref[:].astype(compute_dtype)
        # dh += g2 @ wnT via a transposed contraction (no materialized wnT).
        dh = dh + jax.lax.dot_general(
            g2.reshape(wb * nl, -1), wn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(wb, nl, hid)
        # dWnext over ALL wb slices in one wb*NL-deep contraction.
        dwn_upd = jax.lax.dot_general(
            h_post.astype(compute_dtype).reshape(wb * nl, hid),
            g2.reshape(wb * nl, -1),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(t == 0)
        def _():
            dwn_ref[:] = dwn_upd

        @pl.when(t > 0)
        def _():
            dwn_ref[:] = dwn_ref[:] + dwn_upd

    # relu' recovered from the post-dropout residual: where the mask is
    # live, h_post > 0 iff z > 0; where the mask is 0 the mask factor
    # zeroes the contribution anyway (stack-kernel trick).
    dz = dh * (h_post > 0.0).astype(jnp.float32)
    if has_mask:
        inv_keep = 1.0 / keep
        dz = dz * (m_ref[:].astype(jnp.float32) * inv_keep)
    db_upd = jnp.sum(dz, axis=(0, 1), keepdims=False)[None]

    @pl.when(t == 0)
    def _():
        db_ref[:] = db_upd

    @pl.when(t > 0)
    def _():
        db_ref[:] = db_ref[:] + db_upd

    dz_c = dz.astype(compute_dtype)
    # This shard's PARTIAL of the gathered activations' cotangent:
    # d_hw_full[s] = a_rowsT @ dz[s] (transposed contraction). The
    # all-gather's transpose outside psum-scatters these across shards.
    dhw = jnp.stack([
        jax.lax.dot_general(
            a, dz_c[s], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for s in range(wb)
    ])
    dhw_ref[:] = dhw.astype(dhw_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------


def _fwd_pallas(hw_full, a_rows, b2d, w_next, mask, compute_dtype, interpret,
                keep):
    t, n, hid = hw_full.shape
    nl = a_rows.shape[0]
    has_next = w_next is not None
    has_mask = mask is not None
    wb = _pick_wb(t)
    hid_next = w_next.shape[1] if has_next else hid
    blk = lambda rows, cols: pl.BlockSpec(
        (wb, rows, cols), lambda s: (s, 0, 0), memory_space=pltpu.VMEM
    )
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda s: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [blk(n, hid), const2((nl, n)), const2((1, hid))]
    args = [hw_full, a_rows, b2d]
    if has_next:
        in_specs.append(const2((hid, hid_next)))
        args.append(w_next)
    if has_mask:
        in_specs.append(blk(nl, hid))
        args.append(mask)

    def kernel(*refs):
        i = 3
        wn_ref = m_ref = None
        if has_next:
            wn_ref = refs[i]
            i += 1
        if has_mask:
            m_ref = refs[i]
            i += 1
        outs = refs[i:]
        h_out = outs[0]
        hwn_out = outs[1] if has_next else None
        _fwd_kernel(
            refs[0], refs[1], refs[2], wn_ref, m_ref, h_out, hwn_out,
            has_next=has_next, has_mask=has_mask,
            compute_dtype=compute_dtype, keep=keep, wb=wb,
        )

    rd = jnp.dtype(compute_dtype)
    vma = _join_vma(*args)
    out_specs = [blk(nl, hid)]
    out_shape = [jax.ShapeDtypeStruct((t, nl, hid), rd, vma=vma)]
    if has_next:
        out_specs.append(blk(nl, hid_next))
        out_shape.append(jax.ShapeDtypeStruct((t, nl, hid_next), rd, vma=vma))
    outs = pl.pallas_call(
        kernel,
        grid=(t // wb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_compiler_params(interpret, 32 + 8 * wb),
        interpret=interpret,
    )(*args)
    return (outs[0], outs[1]) if has_next else (outs[0], None)


def _bwd_pallas(g1, g2, h_post, a_rows, w_next, mask, compute_dtype,
                interpret, keep, hw_dtype):
    t, nl, hid = h_post.shape
    n = a_rows.shape[1]
    has_next = w_next is not None
    has_mask = mask is not None
    wb = _pick_wb(t)
    hid_next = w_next.shape[1] if has_next else hid
    blk = lambda rows, cols: pl.BlockSpec(
        (wb, rows, cols), lambda s: (s, 0, 0), memory_space=pltpu.VMEM
    )
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda s: (0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [blk(nl, hid)]
    args = [g1]
    if has_next:
        in_specs.append(blk(nl, hid_next))
        args.append(g2)
    in_specs.extend([blk(nl, hid), const2((nl, n))])
    args.extend([h_post, a_rows])
    if has_next:
        in_specs.append(const2((hid, hid_next)))
        args.append(w_next)
    if has_mask:
        in_specs.append(blk(nl, hid))
        args.append(mask)

    def kernel(*refs):
        i = 0
        g1_ref = refs[i]; i += 1
        g2_ref = None
        if has_next:
            g2_ref = refs[i]; i += 1
        h_res_ref = refs[i]; i += 1
        a_ref = refs[i]; i += 1
        wn_ref = m_ref = None
        if has_next:
            wn_ref = refs[i]; i += 1
        if has_mask:
            m_ref = refs[i]; i += 1
        outs = refs[i:]
        dhw_ref = outs[0]
        dwn_ref = outs[1] if has_next else None
        db_ref = outs[2] if has_next else outs[1]
        _bwd_kernel(
            g1_ref, g2_ref, h_res_ref, a_ref, wn_ref, m_ref,
            dhw_ref, dwn_ref, db_ref,
            has_next=has_next, has_mask=has_mask,
            compute_dtype=compute_dtype, keep=keep, wb=wb,
        )

    vma = _join_vma(*args)
    out_specs = [blk(n, hid)]
    out_shape = [jax.ShapeDtypeStruct((t, n, hid), hw_dtype, vma=vma)]
    if has_next:
        out_specs.append(const2((hid, hid_next)))
        out_shape.append(
            jax.ShapeDtypeStruct((hid, hid_next), jnp.float32, vma=vma)
        )
    out_specs.append(const2((1, hid)))
    out_shape.append(jax.ShapeDtypeStruct((1, hid), jnp.float32, vma=vma))
    outs = pl.pallas_call(
        kernel,
        grid=(t // wb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_compiler_params(interpret, 40 + 10 * wb),
        interpret=interpret,
    )(*args)
    if has_next:
        dhw, dwn, db = outs
    else:
        dhw, db = outs
        dwn = None
    return dhw, dwn, db


@functools.lru_cache(maxsize=None)
def _shard_layer_op(dtype_str: str, interpret: bool, keep: float,
                    has_next: bool, has_mask: bool):
    """custom_vjp sandwich op for one sharded GCN layer.

    op(hw_full, a_rows, b2d[, w_next][, mask]) ->
        (h_post, hw_next) if has_next else h_post

    hw_full [W, N, hid] (gathered), a_rows [NL, N], b2d [1, hid],
    w_next [hid, hid_next], mask [W, NL, hid] int8.
    """
    compute_dtype = jnp.dtype(dtype_str)

    @jax.custom_vjp
    def op(*args):
        hw_full, a_rows, b2d = args[:3]
        i = 3
        w_next = mask = None
        if has_next:
            w_next = args[i]; i += 1
        if has_mask:
            mask = args[i]; i += 1
        h_post, hw_next = _fwd_pallas(
            hw_full, a_rows, b2d, w_next, mask, compute_dtype,
            interpret or _FORCE_INTERPRET, keep,
        )
        return (h_post, hw_next) if has_next else h_post

    def fwd(*args):
        out = op(*args)
        h_post = out[0] if has_next else out
        return out, (h_post, args)

    def bwd(res, g):
        h_post, args = res
        hw_full, a_rows, b2d = args[:3]
        i = 3
        w_next = mask = None
        if has_next:
            w_next = args[i]; i += 1
        if has_mask:
            mask = args[i]; i += 1
        if has_next:
            g1, g2 = g
        else:
            g1, g2 = g, None
        dhw, dwn, db = _bwd_pallas(
            g1, g2, h_post, a_rows, w_next, mask, compute_dtype,
            interpret or _FORCE_INTERPRET, keep, hw_full.dtype,
        )
        grads = [
            dhw.astype(hw_full.dtype),
            # The adjacency is a precomputed constant of the graph — zero
            # cotangent keeps the signature without an [NL, N] gradient
            # nothing consumes (same convention as ops/fused_gcn_train.py).
            jnp.zeros_like(a_rows),
            db.astype(b2d.dtype),
        ]
        if has_next:
            grads.append(dwn.astype(w_next.dtype))
        if has_mask:
            grads.append(np.zeros(mask.shape, dtype=jax.dtypes.float0))
        return tuple(grads)

    op.defvjp(fwd, bwd)
    return op


def _layer_reference(hw_full, a_rows, b2d, w_next, mask, compute_dtype,
                     keep):
    """Plain-JAX statement of the sandwich op's semantics.

    The standalone interpret-mode tests pin the Pallas kernels against
    this; the shard_map glue tests run the encoder with this impl
    (force_reference) so CPU CI covers the full sharded route without
    tripping the interpreter's vma checking.
    """
    dtype = jnp.dtype(compute_dtype)
    z = jnp.einsum(
        "nm,tmh->tnh", a_rows.astype(dtype), hw_full.astype(dtype),
        preferred_element_type=jnp.float32,
    ) + b2d
    h = jnp.maximum(z, 0.0)
    if mask is not None:
        h = h * (mask.astype(jnp.float32) * (1.0 / keep))
    h_post = h.astype(dtype)
    if w_next is None:
        return h_post
    t, nl, hid = h_post.shape
    hw_next = jnp.dot(
        h_post.reshape(t * nl, hid), w_next.astype(dtype),
        preferred_element_type=jnp.float32,
    ).reshape(t, nl, -1).astype(dtype)
    return h_post, hw_next


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def shard_encoder_supported(t: int, nl: int, n: int, c_in: int, hid: int,
                            compute_dtype) -> bool:
    """Whether the sandwich route can run this encoder's shapes."""
    itemsize = jnp.dtype(compute_dtype).itemsize
    return shard_layer_supported(t, nl, n, hid, itemsize=max(itemsize, 2))


def gcn_shard_encoder(
    layers,
    a_rows,
    x_local,
    axis: str,
    *,
    dropout_rate: float,
    rng,
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """Node-sharded fused encoder: x_local [W, NL, C] -> [W, NL, hid].

    Call INSIDE a shard_map body. Per layer: dense transform (XLA dot,
    node-local), `jax.lax.all_gather` over `axis` (the only communication,
    transposing to the partial-gradient psum-scatter), then the fused
    sandwich op. Masks are drawn per shard from the same
    `fold_in(rng, l)` streams as `parallel.spatial._spatial_encoder`, so
    the sharded XLA path and this route see identical dropout draws.
    `rng=None` (or rate 0) disables dropout — the eval/query path.
    """
    from weatherforecast_stgcn_maml_tpu.models.common import accum_dtype

    def _vary(arr):
        # The kernel body mixes sharded activations with replicated weights
        # and biases; under shard_map's VMA tracking every pallas operand
        # must agree, so promote anything not yet varying over `axis`
        # (exactly meta_sp.py's pvary convention — replicated-in-value
        # params become device-varying, transposing to the psum the caller
        # already performs).
        cur = getattr(jax.typeof(arr), "vma", None) or frozenset()
        if axis in cur:
            return arr
        return jax.lax.pcast(arr, axis, to="varying")

    dtype = jnp.dtype(compute_dtype)
    acc = accum_dtype(dtype)
    n_layers = len(layers)
    t, nl, _ = x_local.shape
    keep = 1.0 - dropout_rate
    use_masks = dropout_rate > 0.0 and rng is not None and n_layers > 1
    h = x_local
    hw_local = jnp.dot(
        h.astype(dtype), layers[0]["w"].astype(dtype),
        preferred_element_type=acc,
    ).astype(dtype)
    for l in range(n_layers):
        hw_full = jax.lax.all_gather(hw_local, axis, axis=1, tiled=True)
        has_next = l < n_layers - 1
        has_mask = use_masks and has_next
        b2d = layers[l]["b"].reshape(1, -1)
        w_next = layers[l + 1]["w"] if has_next else None
        mask = None
        if has_mask:
            hid = layers[l]["w"].shape[1]
            mask = jax.random.bernoulli(
                jax.random.fold_in(rng, l), keep, (t, nl, hid)
            ).astype(jnp.int8)
        if _FORCE_REFERENCE:
            out = _layer_reference(
                hw_full, a_rows, b2d, w_next, mask, dtype, keep
            )
        else:
            op = _shard_layer_op(
                str(dtype), interpret or _FORCE_INTERPRET, keep, has_next,
                has_mask,
            )
            args = [hw_full, a_rows, b2d]
            if has_next:
                args.append(w_next)
            if has_mask:
                args.append(mask)
            out = op(*(_vary(a) for a in args))
        if has_next:
            h, hw_local = out
        else:
            h = out
    return h
