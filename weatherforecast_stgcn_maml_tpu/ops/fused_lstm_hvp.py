"""Second-order (Pearlmutter R-operator) kernels for the fused LSTM stack.

Second-order MAML needs, at every inner step, the Hessian-vector product
H·ct of the support loss — computed in `train/so_grad.py` as the forward
derivative of the gradient, jvp(∇L)(p; ct). The gradient's LSTM segment is
the fused stack kernel pair (ops/fused_lstm_stack.py: forward + hand-written
backward), whose custom VJP is first-order only, so round-4's "hvp"/"rof"
routes ran the whole Hessian transpose on the XLA scan — measured at 25%
forward MFU with every SO constituent scaling off it
(benchmarks/so_lstm_probe.json: rof-HVP 5.5 ms/iter vs 0.78 for the fused
first-order grad).

This module makes the stack's gradient *forward-differentiable* with two
more hand-written kernels — the R-operator applied to each existing kernel:

  * `_hvpfwd_kernel_m` — tangent forward: propagates the primal recurrence
    AND its directional derivative in one pass. Per (t, l) the tangent
    gates ṡ = ẋh@W + xh@Ẇ + ḃ are ONE merged [B, 2(C+H)] contraction
    (operands stacked on the contraction axis), next to the primal's
    [B, C+H] dot — 3 forward-dot units total, the R{F} algorithmic floor.
  * `_hvpbwd_kernel_m` — tangent of the backward: linearizes every line of
    the backward kernel (gate recompute, cell-gradient VPU math, dxh / dW
    contractions) and emits the primal gradients AND their tangents — the
    per-leaf HVP contributions — sharing the gate-recompute dot between
    both. 9 forward-dot units per (t, l) vs the first-order backward's 3.

Wiring: `hvp_stack_ops` returns the (fwd_op, bwd_op) pair as
`jax.custom_jvp` functions whose primal bodies are the EXISTING first-order
pallas calls and whose JVP rules are the R-kernels. `train/so_fused.py`
composes them into a manually-VJP'd gradient of the full hybrid loss, so
`jax.jvp(grad_loss)(p; ct)` — the whole Hessian transpose — runs fused.
jvp is the OUTERMOST transform there (the HVP value is a terminal output of
so_grad's custom_vjp bwd), so no transpose rule is ever needed: forward-mode
kernels suffice.

Reference intent: full second-order MAML (/root/reference/README.md:116-124,
`higher` in requirements.txt:11); the reference's torch `higher` loop would
autodiff grad-of-grad through cuDNN — this is the TPU-native equivalent with
the double-backward hand-scheduled instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from weatherforecast_stgcn_maml_tpu.ops.fused_lstm_stack import (
    _HAVE_PALLAS,
    _VMEM_BUDGET_BYTES,
    _bwd_pallas_m,
    _compiler_params,
    _fwd_pallas_m,
    _join_vma,
    _res_dtype,
    _sigmoid,
)

if _HAVE_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

_FORCE_INTERPRET = False


class force_interpret:
    """Run the HVP kernel bodies through the Pallas interpreter (tests)."""

    def __enter__(self):
        global _FORCE_INTERPRET
        self._saved = _FORCE_INTERPRET
        _FORCE_INTERPRET = True

    def __exit__(self, *exc):
        global _FORCE_INTERPRET
        _FORCE_INTERPRET = self._saved


def hvp_supported(t: int, b: int, c_in: int, hidden: int, n_layers: int,
                  itemsize: int = 4) -> bool:
    """VMEM gate for the R-operator backward (the wider of the two).

    Mirrors `stack_supported` with every stream, weight block, and
    accumulator doubled (primal + tangent), plus 4 scratch carries. The
    reference-scale inner step (t=24, b=512 padded nodes, c=256, h=128,
    L=4, bf16) estimates ~28 MiB and passes.
    """
    if not _HAVE_PALLAS:
        return False
    if hidden % 128 or b % 8 or t < 1 or n_layers < 1:
        return False
    if c_in % 128:
        return False
    g4 = 4 * hidden
    weights = (c_in * g4 + (2 * n_layers - 1) * hidden * g4 + n_layers * g4) * 4
    # x, tx, dx, tdx stream at x dtype (f32 from the encoder); h/c residual
    # views double for tangents AND for the prev-step second views.
    streamed = b * (
        4 * c_in * 4
        + 8 * n_layers * hidden * itemsize
        + 2 * hidden * 4  # g, tg
        + (n_layers - 1) * hidden  # int8 masks
    )
    accum = 2 * weights
    scratch = 4 * n_layers * b * hidden * 4
    return 2 * streamed + 2 * weights + accum + scratch <= _VMEM_BUDGET_BYTES


def hvp_chunk_size(t: int, b: int, c_in: int, hidden: int, n_layers: int,
                   itemsize: int = 4, min_chunk: int = 256) -> int | None:
    """Largest batch-chunk size that fits the R-operator kernels' VMEM gate.

    The HVP kernels stream twice the first-order stack's residuals (primal
    + tangent views), so `hvp_supported` rejects reference-shape batches
    beyond ~512 padded nodes (bf16) — which previously dropped every wider
    second-order step back to the XLA HVP measured at ~30% MFU
    (benchmarks/fhvp_decomp_probe.json: 6.96 vs 3.47 ms/iter fused). LSTM
    batch rows are independent, so — exactly like the first-order
    `stack_chunk_size` route (ops/fused_lstm_stack.py) — the R-kernels can
    run in B/chunk sequential row slices instead.

    Returns b itself when unchunked fits, the largest fitting divisor of b
    that is a multiple of 8 and >= min_chunk otherwise, or None (route the
    XLA HVP instead). All divisors are searched, not just halvings.
    min_chunk defaults below the first-order stack's 512: the R-kernels run
    9 dot units per (t, l) vs the backward's 3, so narrower rows still
    carry enough MXU work per grid step to beat the XLA HVP.
    """
    if hvp_supported(t, b, c_in, hidden, n_layers, itemsize):
        return b
    divisors: list[int] = []
    d = 1
    while d * d <= b:
        if b % d == 0:
            divisors.extend((d, b // d))
        d += 1
    for bc in sorted(set(divisors), reverse=True):
        if bc >= b or bc < min_chunk or bc % 8:
            continue
        if hvp_supported(t, bc, c_in, hidden, n_layers, itemsize):
            return bc
    return None


def chunked_stack_ops(fwd_op, bwd_op, chunk: int, has_masks: bool):
    """Row-chunked wrappers over the custom_jvp stack ops.

    `fwd_op`/`bwd_op` are the `hvp_stack_ops` pair. The wrappers split the
    batch (row) axis into B/chunk slices and run each slice through the
    underlying op; rows are independent in an LSTM, so this is exact —
    dx/h/c outputs concatenate back, weight/bias gradients sum across
    chunks. Both wrappers are plain compositions of the custom_jvp ops
    with `lax` slicing/concatenation, so `jax.jvp` of the sandwich pushes
    tangents through them natively: each chunk call hits the ops'
    R-operator JVP rules and the glue differentiates itself. The dropout
    masks are drawn ONCE for the full batch by the caller and sliced per
    chunk, so the RNG/dropout streams are bit-identical to unchunked;
    weight/bias gradients, however, are summed across chunks in a
    different f32 accumulation order than the single-kernel full-batch
    contraction, so chunked vs unchunked results differ at float rounding
    level (tests compare with rtol, not exact equality).
    """

    def fwd_c(*args):
        x = args[0]
        b = x.shape[1]
        if b % chunk:
            raise ValueError(f"batch {b} not divisible by chunk {chunk}")
        lasts, h_alls, c_alls = [], [], []
        for i in range(b // chunk):
            sl = slice(i * chunk, (i + 1) * chunk)
            a = (x[:, sl],) + tuple(args[1:4])
            if has_masks:
                a = a + (args[4][:, :, sl],)
            h_last, h_all, c_all = fwd_op(*a)
            lasts.append(h_last)
            h_alls.append(h_all)
            c_alls.append(c_all)
        return (
            jnp.concatenate(lasts, axis=0),
            jnp.concatenate(h_alls, axis=2),
            jnp.concatenate(c_alls, axis=2),
        )

    def bwd_c(*args):
        g, x, h_all, c_all = args[:4]
        wargs = tuple(args[4:7])
        b = x.shape[1]
        if b % chunk:
            raise ValueError(f"batch {b} not divisible by chunk {chunk}")
        dxs = []
        acc = None
        for i in range(b // chunk):
            sl = slice(i * chunk, (i + 1) * chunk)
            a = (g[sl], x[:, sl], h_all[:, :, sl], c_all[:, :, sl]) + wargs
            if has_masks:
                a = a + (args[7][:, :, sl],)
            dx, dw0, dwr, db = bwd_op(*a)
            dxs.append(dx)
            if acc is None:
                acc = (dw0, dwr, db)
            else:
                acc = (acc[0] + dw0, acc[1] + dwr, acc[2] + db)
        return (jnp.concatenate(dxs, axis=1),) + acc

    return fwd_c, bwd_c


# ---------------------------------------------------------------------------
# R{F}: tangent forward kernel
# ---------------------------------------------------------------------------


def _hvpfwd_kernel_m(x_ref, tx_ref, wcat0_ref, twcat0_ref, wcatr_ref,
                     twcatr_ref, b_ref, tb_ref, m_ref,
                     h_out, c_out, th_out, tc_out, hl_ref, thl_ref,
                     h_scr, c_scr, th_scr, tc_scr,
                     *, n_layers, hidden, has_masks, compute_dtype, keep=1.0):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)
        th_scr[:] = jnp.zeros_like(th_scr)
        tc_scr[:] = jnp.zeros_like(tc_scr)

    inv_keep = 1.0 / keep if has_masks else 1.0
    inp = x_ref[0].astype(compute_dtype)
    tinp = tx_ref[0].astype(compute_dtype)
    for l in range(n_layers):
        w = (wcat0_ref[:] if l == 0 else wcatr_ref[l - 1]).astype(compute_dtype)
        tw = (twcat0_ref[:] if l == 0 else twcatr_ref[l - 1]).astype(
            compute_dtype
        )
        h_prev = h_scr[l]
        c_prev = c_scr[l]
        th_prev = th_scr[l]
        tc_prev = tc_scr[l]
        xh = jnp.concatenate([inp, h_prev.astype(compute_dtype)], axis=1)
        txh = jnp.concatenate([tinp, th_prev.astype(compute_dtype)], axis=1)
        gates = (
            jnp.dot(xh, w, preferred_element_type=jnp.float32)
            + b_ref[pl.ds(l, 1), :]
        )
        # ṡ = ẋh@W + xh@Ẇ + ḃ as ONE contraction: operands stacked on the
        # contracting axis.
        tgates = (
            jnp.dot(
                jnp.concatenate([txh, xh], axis=1),
                jnp.concatenate([w, tw], axis=0),
                preferred_element_type=jnp.float32,
            )
            + tb_ref[pl.ds(l, 1), :]
        )
        i = _sigmoid(gates[:, :hidden])
        f = _sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = _sigmoid(gates[:, 3 * hidden:])
        ti = i * (1.0 - i) * tgates[:, :hidden]
        tf = f * (1.0 - f) * tgates[:, hidden:2 * hidden]
        tg = (1.0 - g * g) * tgates[:, 2 * hidden:3 * hidden]
        to = o * (1.0 - o) * tgates[:, 3 * hidden:]
        c = f * c_prev + i * g
        tc = tf * c_prev + f * tc_prev + ti * g + i * tg
        tch = jnp.tanh(c)
        h = o * tch
        th = to * tch + o * (1.0 - tch * tch) * tc
        h_scr[l] = h
        c_scr[l] = c
        th_scr[l] = th
        tc_scr[l] = tc
        h_out[l, 0] = h.astype(h_out.dtype)
        c_out[l, 0] = c.astype(c_out.dtype)
        th_out[l, 0] = th.astype(th_out.dtype)
        tc_out[l, 0] = tc.astype(tc_out.dtype)
        if l == n_layers - 1:
            # Constant-indexed block: the final grid step's write persists.
            hl_ref[:] = h
            thl_ref[:] = th
        else:
            if has_masks:
                mk = m_ref[l, 0].astype(jnp.float32) * inv_keep
                inp = (h * mk).astype(compute_dtype)
                tinp = (th * mk).astype(compute_dtype)
            else:
                inp = h.astype(compute_dtype)
                tinp = th.astype(compute_dtype)


def _hvpfwd_kernel_m_nomask(x_ref, tx_ref, wcat0_ref, twcat0_ref, wcatr_ref,
                            twcatr_ref, b_ref, tb_ref,
                            h_out, c_out, th_out, tc_out, hl_ref, thl_ref,
                            h_scr, c_scr, th_scr, tc_scr,
                            *, n_layers, hidden, compute_dtype):
    _hvpfwd_kernel_m(
        x_ref, tx_ref, wcat0_ref, twcat0_ref, wcatr_ref, twcatr_ref,
        b_ref, tb_ref, None,
        h_out, c_out, th_out, tc_out, hl_ref, thl_ref,
        h_scr, c_scr, th_scr, tc_scr,
        n_layers=n_layers, hidden=hidden, has_masks=False,
        compute_dtype=compute_dtype,
    )


def _hvpfwd_pallas_m(x, tx, wcat0, twcat0, wcatr, twcatr, b2d, tb2d, masks,
                     compute_dtype, interpret, keep=1.0):
    t, b, c_in = x.shape
    n_layers, g4 = b2d.shape
    hidden = g4 // 4
    has_masks = masks is not None
    rd = _res_dtype(compute_dtype)
    blk3 = lambda shape: pl.BlockSpec(
        shape, lambda s: (s, 0, 0), memory_space=pltpu.VMEM
    )
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda s: (0, 0), memory_space=pltpu.VMEM
    )
    const3 = lambda shape: pl.BlockSpec(
        shape, lambda s: (0, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        blk3((1, b, c_in)),
        blk3((1, b, c_in)),
        const2((c_in + hidden, g4)),
        const2((c_in + hidden, g4)),
        const3((max(n_layers - 1, 1), 2 * hidden, g4)),
        const3((max(n_layers - 1, 1), 2 * hidden, g4)),
        const2((n_layers, g4)),
        const2((n_layers, g4)),
    ]
    if has_masks:
        in_specs.append(
            pl.BlockSpec(
                (n_layers - 1, 1, b, hidden), lambda s: (0, s, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    res_spec = pl.BlockSpec(
        (n_layers, 1, b, hidden), lambda s: (0, s, 0, 0),
        memory_space=pltpu.VMEM,
    )
    last_spec = pl.BlockSpec(
        (b, hidden), lambda s: (0, 0), memory_space=pltpu.VMEM
    )
    args = [x, tx, wcat0, twcat0, wcatr, twcatr, b2d, tb2d]
    if has_masks:
        args.append(masks)
    vma = _join_vma(*args)
    kernel = (
        functools.partial(
            _hvpfwd_kernel_m, n_layers=n_layers, hidden=hidden,
            has_masks=True, compute_dtype=compute_dtype, keep=keep,
        )
        if has_masks
        else functools.partial(
            _hvpfwd_kernel_m_nomask, n_layers=n_layers, hidden=hidden,
            compute_dtype=compute_dtype,
        )
    )
    outs = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=in_specs,
        out_specs=[res_spec, res_spec, res_spec, res_spec, last_spec,
                   last_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_layers, t, b, hidden), rd, vma=vma),
            jax.ShapeDtypeStruct((n_layers, t, b, hidden), rd, vma=vma),
            jax.ShapeDtypeStruct((n_layers, t, b, hidden), rd, vma=vma),
            jax.ShapeDtypeStruct((n_layers, t, b, hidden), rd, vma=vma),
            jax.ShapeDtypeStruct((b, hidden), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((b, hidden), jnp.float32, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_layers, b, hidden), jnp.float32),
            pltpu.VMEM((n_layers, b, hidden), jnp.float32),
            pltpu.VMEM((n_layers, b, hidden), jnp.float32),
            pltpu.VMEM((n_layers, b, hidden), jnp.float32),
        ],
        compiler_params=_compiler_params(interpret, 64),
        interpret=interpret,
    )(*args)
    h_all, c_all, th_all, tc_all, h_last, th_last = outs
    return h_all, c_all, th_all, tc_all, h_last, th_last


# ---------------------------------------------------------------------------
# R{B}: tangent-of-backward kernel (emits primal grads AND their tangents)
# ---------------------------------------------------------------------------


def _hvpbwd_kernel_m(g_ref, tg_ref, x_ref, tx_ref,
                     h_all_ref, h_prev_ref, th_all_ref, th_prev_ref,
                     c_all_ref, c_prev_ref, tc_all_ref, tc_prev_ref,
                     wcat0_ref, twcat0_ref, wcatr_ref, twcatr_ref,
                     b_ref, tb2_ref, m_ref,
                     dx_ref, tdx_ref, dwcat0_ref, tdwcat0_ref,
                     dwcatr_ref, tdwcatr_ref, db_ref, tdb_ref,
                     dh_scr, dc_scr, tdh_scr, tdc_scr,
                     *, n_layers, hidden, c_in, has_masks, compute_dtype,
                     t_len, keep=1.0, ablate_tangent_vpu=False):
    s = pl.program_id(0)  # time index t_len-1-s via the index maps
    inv_keep = 1.0 / keep if has_masks else 1.0

    @pl.when(s == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        tdh_scr[:] = jnp.zeros_like(tdh_scr)
        tdc_scr[:] = jnp.zeros_like(tdc_scr)

    at_t0 = s == t_len - 1
    g_in = jnp.where(s == 0, g_ref[:], jnp.zeros_like(g_ref[:]))
    tg_in = jnp.where(s == 0, tg_ref[:], jnp.zeros_like(tg_ref[:]))

    d_above = None
    td_above = None
    for l in range(n_layers - 1, -1, -1):
        if l == 0:
            w = wcat0_ref[:].astype(compute_dtype)
            tw = twcat0_ref[:].astype(compute_dtype)
            cw = c_in
        else:
            w = wcatr_ref[l - 1].astype(compute_dtype)
            tw = twcatr_ref[l - 1].astype(compute_dtype)
            cw = hidden

        zero_bh = jnp.zeros((), jnp.float32)
        h_prev = jnp.where(
            at_t0, zero_bh, h_prev_ref[l, 0].astype(jnp.float32)
        )
        c_prev = jnp.where(
            at_t0, zero_bh, c_prev_ref[l, 0].astype(jnp.float32)
        )
        th_prev = jnp.where(
            at_t0, zero_bh, th_prev_ref[l, 0].astype(jnp.float32)
        )
        tc_prev = jnp.where(
            at_t0, zero_bh, tc_prev_ref[l, 0].astype(jnp.float32)
        )
        if l == 0:
            inp = x_ref[0].astype(compute_dtype)
            tinp = tx_ref[0].astype(compute_dtype)
        else:
            inp = h_all_ref[l - 1, 0].astype(jnp.float32)
            tinp = th_all_ref[l - 1, 0].astype(jnp.float32)
            if has_masks:
                mk = m_ref[l - 1, 0].astype(jnp.float32) * inv_keep
                inp = inp * mk
                tinp = tinp * mk
            inp = inp.astype(compute_dtype)
            tinp = tinp.astype(compute_dtype)
        xh = jnp.concatenate([inp, h_prev.astype(compute_dtype)], axis=1)
        txh = jnp.concatenate([tinp, th_prev.astype(compute_dtype)], axis=1)
        gates = (
            jnp.dot(xh, w, preferred_element_type=jnp.float32)
            + b_ref[pl.ds(l, 1), :]
        )
        tgates = (
            jnp.dot(
                jnp.concatenate([txh, xh], axis=1),
                jnp.concatenate([w, tw], axis=0),
                preferred_element_type=jnp.float32,
            )
            + tb2_ref[pl.ds(l, 1), :]
        )
        i = _sigmoid(gates[:, :hidden])
        f = _sigmoid(gates[:, hidden:2 * hidden])
        g_ = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = _sigmoid(gates[:, 3 * hidden:])
        tc_ = jnp.tanh(c_all_ref[l, 0].astype(jnp.float32))
        one_m_tc2 = 1.0 - tc_ * tc_

        dh = dh_scr[l]
        tdh = tdh_scr[l]
        if l == n_layers - 1:
            dh = dh + g_in
            tdh = tdh + tg_in
        if d_above is not None:
            dh = dh + d_above
            tdh = tdh + td_above
        dc = dc_scr[l] + dh * o * one_m_tc2
        so = o * (1.0 - o)
        do_pre = dh * tc_ * so
        si = i * (1.0 - i)
        di_pre = dc * g_ * si
        sf = f * (1.0 - f)
        df_pre = dc * c_prev * sf
        sg = 1.0 - g_ * g_
        dg_pre = dc * i * sg
        dgates = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=-1)
        if ablate_tangent_vpu:
            # PROBE-ONLY timing ablation (never routed by production code):
            # every dot, stream, and accumulator identical to the real
            # kernel — only the tangent ELEMENTWISE derivative chains are
            # collapsed to single adds (keeping each dot's result live so
            # Mosaic cannot dead-code it). Separates the R-bwd kernel's
            # VPU-bound share from its MXU/dot-issue share
            # (benchmarks/hvp_rate_probe.py; VERDICT r5 item 2).
            tdc = tdc_scr[l] + tdh
            tdi_pre = di_pre + tgates[:, :hidden]
            tdf_pre = df_pre + tgates[:, hidden:2 * hidden]
            tdg_pre = dg_pre + tgates[:, 2 * hidden:3 * hidden]
            tdo_pre = do_pre + tgates[:, 3 * hidden:]
            tdc_next = tdc * f
        else:
            ti = i * (1.0 - i) * tgates[:, :hidden]
            tf = f * (1.0 - f) * tgates[:, hidden:2 * hidden]
            tg_ = (1.0 - g_ * g_) * tgates[:, 2 * hidden:3 * hidden]
            to = o * (1.0 - o) * tgates[:, 3 * hidden:]
            ttc = one_m_tc2 * tc_all_ref[l, 0].astype(jnp.float32)
            tdc = (
                tdc_scr[l]
                + tdh * o * one_m_tc2
                + dh * to * one_m_tc2
                - dh * o * (2.0 * tc_ * ttc)
            )
            tdo_pre = (
                tdh * tc_ * so + dh * ttc * so
                + dh * tc_ * (1.0 - 2.0 * o) * to
            )
            tdi_pre = (
                tdc * g_ * si + dc * tg_ * si
                + dc * g_ * (1.0 - 2.0 * i) * ti
            )
            tdf_pre = (
                tdc * c_prev * sf + dc * tc_prev * sf
                + dc * c_prev * (1.0 - 2.0 * f) * tf
            )
            tdg_pre = tdc * i * sg + dc * ti * sg - dc * i * (2.0 * g_ * tg_)
            tdc_next = tdc * f + dc * tf
        tdgates = jnp.concatenate(
            [tdi_pre, tdf_pre, tdg_pre, tdo_pre], axis=-1
        )
        dc_scr[l] = dc * f
        tdc_scr[l] = tdc_next

        dgc = dgates.astype(compute_dtype)
        tdgc = tdgates.astype(compute_dtype)
        dxh = jax.lax.dot_general(
            dgc, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # ṫdxh = ṫdgates@Wᵀ + dgates@Ẇᵀ: stacked on the contracting (4H) axis.
        tdxh = jax.lax.dot_general(
            jnp.concatenate([tdgc, dgc], axis=1),
            jnp.concatenate([w, tw], axis=1),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d_in = dxh[:, :cw]
        td_in = tdxh[:, :cw]
        dh_scr[l] = dxh[:, cw:]
        tdh_scr[l] = tdxh[:, cw:]
        if l == 0:
            dx_ref[0] = d_in.astype(dx_ref.dtype)
            tdx_ref[0] = td_in.astype(tdx_ref.dtype)
            d_above = None
            td_above = None
        else:
            if has_masks:
                mk = m_ref[l - 1, 0].astype(jnp.float32) * inv_keep
                d_in = d_in * mk
                td_in = td_in * mk
            d_above = d_in
            td_above = td_in

        dw_part = jax.lax.dot_general(
            xh, dgc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # ṫdW = xhᵀ@ṫdgates + ẋhᵀ@dgates: stacked on the contracting (row)
        # axis with swapped pairing.
        tdw_part = jax.lax.dot_general(
            jnp.concatenate([xh, txh], axis=0),
            jnp.concatenate([tdgc, dgc], axis=0),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_part = jnp.sum(dgates, axis=0, keepdims=True)
        tdb_part = jnp.sum(tdgates, axis=0, keepdims=True)

        if l == 0:
            @pl.when(s == 0)
            def _(dw_part=dw_part, tdw_part=tdw_part):
                dwcat0_ref[:] = dw_part
                tdwcat0_ref[:] = tdw_part

            @pl.when(s > 0)
            def _(dw_part=dw_part, tdw_part=tdw_part):
                dwcat0_ref[:] = dwcat0_ref[:] + dw_part
                tdwcat0_ref[:] = tdwcat0_ref[:] + tdw_part
        else:
            @pl.when(s == 0)
            def _(l=l, dw_part=dw_part, tdw_part=tdw_part):
                dwcatr_ref[l - 1] = dw_part
                tdwcatr_ref[l - 1] = tdw_part

            @pl.when(s > 0)
            def _(l=l, dw_part=dw_part, tdw_part=tdw_part):
                dwcatr_ref[l - 1] = dwcatr_ref[l - 1] + dw_part
                tdwcatr_ref[l - 1] = tdwcatr_ref[l - 1] + tdw_part

        @pl.when(s == 0)
        def _(l=l, db_part=db_part, tdb_part=tdb_part):
            db_ref[pl.ds(l, 1), :] = db_part
            tdb_ref[pl.ds(l, 1), :] = tdb_part

        @pl.when(s > 0)
        def _(l=l, db_part=db_part, tdb_part=tdb_part):
            db_ref[pl.ds(l, 1), :] = db_ref[pl.ds(l, 1), :] + db_part
            tdb_ref[pl.ds(l, 1), :] = tdb_ref[pl.ds(l, 1), :] + tdb_part

    if n_layers == 1:
        @pl.when(s == 0)
        def _():
            dwcatr_ref[:] = jnp.zeros_like(dwcatr_ref)
            tdwcatr_ref[:] = jnp.zeros_like(tdwcatr_ref)


def _hvpbwd_kernel_m_nomask(g_ref, tg_ref, x_ref, tx_ref,
                            h_all_ref, h_prev_ref, th_all_ref, th_prev_ref,
                            c_all_ref, c_prev_ref, tc_all_ref, tc_prev_ref,
                            wcat0_ref, twcat0_ref, wcatr_ref, twcatr_ref,
                            b_ref, tb2_ref,
                            dx_ref, tdx_ref, dwcat0_ref, tdwcat0_ref,
                            dwcatr_ref, tdwcatr_ref, db_ref, tdb_ref,
                            dh_scr, dc_scr, tdh_scr, tdc_scr,
                            *, n_layers, hidden, c_in, compute_dtype, t_len,
                            ablate_tangent_vpu=False):
    _hvpbwd_kernel_m(
        g_ref, tg_ref, x_ref, tx_ref,
        h_all_ref, h_prev_ref, th_all_ref, th_prev_ref,
        c_all_ref, c_prev_ref, tc_all_ref, tc_prev_ref,
        wcat0_ref, twcat0_ref, wcatr_ref, twcatr_ref, b_ref, tb2_ref, None,
        dx_ref, tdx_ref, dwcat0_ref, tdwcat0_ref,
        dwcatr_ref, tdwcatr_ref, db_ref, tdb_ref,
        dh_scr, dc_scr, tdh_scr, tdc_scr,
        n_layers=n_layers, hidden=hidden, c_in=c_in, has_masks=False,
        compute_dtype=compute_dtype, t_len=t_len,
        ablate_tangent_vpu=ablate_tangent_vpu,
    )


def _hvpbwd_pallas_m(g, tg, x, tx, h_all, th_all, c_all, tc_all,
                     wcat0, twcat0, wcatr, twcatr, b2d, tb2d, masks,
                     compute_dtype, interpret, keep=1.0,
                     ablate_tangent_vpu=False):
    t, b, c_in = x.shape
    n_layers, g4 = b2d.shape
    hidden = g4 // 4
    has_masks = masks is not None
    nb = t
    rev3 = lambda s: (nb - 1 - s, 0, 0)
    rev4 = lambda s: (0, nb - 1 - s, 0, 0)
    prev4 = lambda s: (0, jnp.maximum(nb - 2 - s, 0), 0, 0)
    const2 = lambda s: (0, 0)
    const3 = lambda s: (0, 0, 0)
    lastspec = pl.BlockSpec((b, hidden), const2, memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, b, c_in), rev3, memory_space=pltpu.VMEM)
    res = pl.BlockSpec((n_layers, 1, b, hidden), rev4, memory_space=pltpu.VMEM)
    resp = pl.BlockSpec(
        (n_layers, 1, b, hidden), prev4, memory_space=pltpu.VMEM
    )
    w0spec = pl.BlockSpec((c_in + hidden, g4), const2, memory_space=pltpu.VMEM)
    wrspec = pl.BlockSpec(
        (max(n_layers - 1, 1), 2 * hidden, g4), const3,
        memory_space=pltpu.VMEM,
    )
    bspec = pl.BlockSpec((n_layers, g4), const2, memory_space=pltpu.VMEM)
    in_specs = [
        lastspec, lastspec,       # g, tg
        xspec, xspec,             # x, tx
        res, resp, res, resp,     # h_all (+prev), th_all (+prev)
        res, resp, res, resp,     # c_all (+prev), tc_all (+prev)
        w0spec, w0spec, wrspec, wrspec, bspec, bspec,
    ]
    if has_masks:
        in_specs.append(
            pl.BlockSpec(
                (n_layers - 1, 1, b, hidden),
                lambda s: (0, nb - 1 - s, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    out_specs = [
        xspec, xspec,             # dx, tdx
        w0spec, w0spec, wrspec, wrspec, bspec, bspec,
    ]
    kernel = (
        functools.partial(
            _hvpbwd_kernel_m, n_layers=n_layers, hidden=hidden, c_in=c_in,
            has_masks=True, compute_dtype=compute_dtype, t_len=t, keep=keep,
            ablate_tangent_vpu=ablate_tangent_vpu,
        )
        if has_masks
        else functools.partial(
            _hvpbwd_kernel_m_nomask, n_layers=n_layers, hidden=hidden,
            c_in=c_in, compute_dtype=compute_dtype, t_len=t,
            ablate_tangent_vpu=ablate_tangent_vpu,
        )
    )
    args = [g, tg, x, tx, h_all, h_all, th_all, th_all, c_all, c_all,
            tc_all, tc_all, wcat0, twcat0, wcatr, twcatr, b2d, tb2d]
    if has_masks:
        args.append(masks)
    vma = _join_vma(*args)
    wr_shape = (max(n_layers - 1, 1), 2 * hidden, g4)
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((t, b, c_in), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((t, b, c_in), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((c_in + hidden, g4), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((c_in + hidden, g4), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct(wr_shape, jnp.float32, vma=vma),
            jax.ShapeDtypeStruct(wr_shape, jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((n_layers, g4), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((n_layers, g4), jnp.float32, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_layers, b, hidden), jnp.float32),
            pltpu.VMEM((n_layers, b, hidden), jnp.float32),
            pltpu.VMEM((n_layers, b, hidden), jnp.float32),
            pltpu.VMEM((n_layers, b, hidden), jnp.float32),
        ],
        compiler_params=_compiler_params(interpret, 96),
        interpret=interpret,
    )(*args)
    return outs  # dx, tdx, dwcat0, tdwcat0, dwcatr, tdwcatr, db, tdb


# ---------------------------------------------------------------------------
# custom_jvp wiring
# ---------------------------------------------------------------------------


def _materialize_tangent(t_, p_):
    """Zero-fill symbolic/float0 tangents so the kernels see real arrays."""
    if t_ is None or (hasattr(t_, "dtype") and t_.dtype == jax.dtypes.float0):
        return jnp.zeros_like(p_)
    return t_


@functools.lru_cache(maxsize=None)
def hvp_stack_ops(dtype_str: str, interpret: bool, keep: float,
                  has_masks: bool):
    """(fwd_op, bwd_op): the fused stack's kernels as custom_jvp functions.

    fwd_op(x, wcat0, wcatr, b2d[, masks]) -> (h_last, h_all, c_all)
    bwd_op(g, x, h_all, c_all, wcat0, wcatr, b2d[, masks])
        -> (dx, dwcat0, dwcatr, db)

    Primal bodies are the existing first-order pallas calls
    (ops/fused_lstm_stack.py); the JVP rules run the R-operator kernels, so
    `jax.jvp` over a gradient composed from these ops computes the exact
    Hessian-vector product with every dot fused. FORWARD-mode only: reverse
    differentiation of these ops is unsupported by design (the SO wiring in
    train/so_grad.py only ever jvp's them).
    """
    compute_dtype = jnp.dtype(dtype_str)

    @jax.custom_jvp
    def fwd_op(*args):
        x, wcat0, wcatr, b2d = args[:4]
        masks = args[4] if has_masks else None
        h_all, c_all, h_last = _fwd_pallas_m(
            x, wcat0, wcatr, b2d, masks, compute_dtype,
            interpret or _FORCE_INTERPRET, keep,
        )
        return h_last, h_all, c_all

    @fwd_op.defjvp
    def _fwd_jvp(primals, tangents):
        x, wcat0, wcatr, b2d = primals[:4]
        masks = primals[4] if has_masks else None
        tx, twcat0, twcatr, tb2d = (
            _materialize_tangent(t_, p_)
            for t_, p_ in zip(tangents[:4], primals[:4])
        )
        h_all, c_all, th_all, tc_all, h_last, th_last = _hvpfwd_pallas_m(
            x, tx, wcat0, twcat0, wcatr, twcatr, b2d, tb2d, masks,
            compute_dtype, interpret or _FORCE_INTERPRET, keep,
        )
        return (h_last, h_all, c_all), (th_last, th_all, tc_all)

    @jax.custom_jvp
    def bwd_op(*args):
        g, x, h_all, c_all, wcat0, wcatr, b2d = args[:7]
        masks = args[7] if has_masks else None
        dx, dwcat0, dwcatr, db = _bwd_pallas_m(
            g, x, h_all, c_all, wcat0, wcatr, b2d, masks, compute_dtype,
            interpret or _FORCE_INTERPRET, keep,
        )
        return (
            dx.astype(x.dtype),
            dwcat0.astype(wcat0.dtype),
            dwcatr.astype(wcatr.dtype),
            db.astype(b2d.dtype),
        )

    @bwd_op.defjvp
    def _bwd_jvp(primals, tangents):
        g, x, h_all, c_all, wcat0, wcatr, b2d = primals[:7]
        masks = primals[7] if has_masks else None
        tg, tx, th_all, tc_all, twcat0, twcatr, tb2d = (
            _materialize_tangent(t_, p_)
            for t_, p_ in zip(tangents[:7], primals[:7])
        )
        (dx, tdx, dwcat0, tdwcat0, dwcatr, tdwcatr, db, tdb) = (
            _hvpbwd_pallas_m(
                g, tg, x, tx, h_all, th_all, c_all, tc_all,
                wcat0, twcat0, wcatr, twcatr, b2d, tb2d, masks,
                compute_dtype, interpret or _FORCE_INTERPRET, keep,
            )
        )
        outs = (
            dx.astype(x.dtype),
            dwcat0.astype(wcat0.dtype),
            dwcatr.astype(wcatr.dtype),
            db.astype(b2d.dtype),
        )
        touts = (
            tdx.astype(x.dtype),
            tdwcat0.astype(wcat0.dtype),
            tdwcatr.astype(wcatr.dtype),
            tdb.astype(b2d.dtype),
        )
        return outs, touts

    return fwd_op, bwd_op
