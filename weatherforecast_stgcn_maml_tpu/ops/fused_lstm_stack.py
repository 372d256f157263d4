"""Whole-stack fused LSTM: all layers + all timesteps in ONE Pallas kernel
per direction, with a hand-written backward.

Round-3 measurement history (benchmarks/lstm_kernel_probe.json): the
per-LAYER recurrence kernel (ops/lstm_scan.py) was bit-exact but ~8% SLOWER
than XLA's fully-unrolled scan at the meta step — its cost is the XLA<->
Pallas boundary: 8 dispatches per inner step and a [T, B, 4H] float32
input-projection tensor materialized to HBM per layer per direction, plus a
2-matmul gate-recompute backward. This kernel removes that boundary
entirely:

  * ONE forward kernel: grid=(T,), per step it advances ALL layers —
    layer l's input is layer l-1's just-computed hidden state, still in
    registers/VMEM. Only x[t] streams in; h/c residuals stream out AT
    COMPUTE PRECISION (bf16 under bf16 training — halves the residual
    HBM stream; the f32 VMEM carry keeps forward numerics bit-exact).
    The primal output is just the [B, H] last-timestep top-layer state
    the hybrid head consumes. All weights (wx0, stacked wxr/wh, biases)
    are VMEM-resident for the whole scan. Inter-layer dropout applies
    streamed precomputed int8 {0, 1} masks (the 1/keep scale folds
    into the kernel; quarter the mask HBM bytes), drawn bit-identically
    to the XLA path's.
  * ONE backward kernel: reversed grid, carries (dh, dc) per layer,
    recomputes gate activations from residuals (cheaper than storing
    [L, T, B, 4H] gates), walks layers top-down so the same-timestep
    inter-layer gradient flows within the step, and ACCUMULATES
    dwx/dwh/db into revisited output blocks — weight gradients never
    round-trip through HBM as per-step partials. Previous-timestep
    residuals are second streamed views of the same arrays (index-mapped
    to max(t-1, 0), zero-selected at t == 0) — no XLA-side shifted
    copies. Only dx streams out, in x's dtype.

vmap (the meta step's task axis) prepends a grid dimension; the carry
scratch resets at t == 0, which is the first step of every batch instance
(batch-major iteration), so batching is safe — the same argument as
ops/lstm_scan.py, CI-tested through the full FO meta gradient.

The custom VJP wraps only the Pallas path: second-order MAML and non-TPU
backends use the XLA scan (train/maml.py routes automatically).
Replaces the reference's per-node torch loop workload
(hybrid_model.py:94-102) on the training path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from weatherforecast_stgcn_maml_tpu.models.common import lstm_bias
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

# Gate against the raised compiler cap (64 MiB backward). Mosaic's actual
# scoped allocation runs ~1.8x the naive block accounting below (measured:
# a 38 MiB estimate requested 69.5 MiB at B=2048 — live gate intermediates
# and pipelining buffers beyond the 2x stream double-buffer), so the budget
# here is 64/1.8 rounded down. B=512 reference shapes estimate ~12 MiB and
# pass; B>=2048 single-chip routes to the XLA scan — grids that large are
# the node-sharded path's job (parallel/spatial.py), where the per-shard B
# shrinks back under the gate. Physical VMEM is 128 MiB on v4/v5 chips.
_VMEM_BUDGET_BYTES = 34 * 1024 * 1024

# Test hook mirroring ops/lstm_scan.py's: run kernels interpreted (CPU CI).
_FORCE_INTERPRET = False

# Merged-gates variant: each step's x@wx + h@wh pair fuses into ONE
# [B, C+H] @ [C+H, 4H] contraction (and the backward's 6 dots per (t, l)
# into 3) — same FLOPs, half the MXU ops on the latency-bound recurrent
# chain. A/B'd interleaved at reference shapes (benchmarks/
# lstm_merged_probe.py); flip here if the probe ever reverses.
_MERGED_GATES = True

# vmap routing for the merged stack (jax.custom_batching.custom_vmap
# rules; the wiring itself is always on):
#
# _VBATCH — PER-TASK weights (the meta loop): fold the chains into ONE
# kernel instance issuing all chains' dots adjacently. MEASURED SLOWER at
# reference shapes (vmap 2, interleaved A/B: LSTM grad 1.28 vs 1.21
# ms/iter, meta step a wash — benchmarks/lstm_vbatch_probe.json): Mosaic
# serializes the independent dots within a program anyway, so the fold
# only adds VMEM pressure. Flag-gated off (like the wavefront scheduler);
# CI pins it on to keep the kernels covered.
_VBATCH = False

# _ROWFOLD — SHARED weights (the adaptation window batch): fold the
# chains into the ROW dimension of the single-task kernel — half the
# dependent dots at double width. MEASURED A WASH on the real adapt train
# step (batch 2, 90-step chains, interleaved: best 208 vs 210 ms,
# numerics 5e-7 — benchmarks/adapt_fold_probe.json): at 512 rows the
# dots are already execution-dominated and the x/residual relayouts eat
# the latency gain. Default off; the parametrized CI test covers both
# routes.
_ROWFOLD = False


class force_interpret:
    def __enter__(self):
        global _FORCE_INTERPRET
        self._saved = _FORCE_INTERPRET
        _FORCE_INTERPRET = True

    def __exit__(self, *exc):
        global _FORCE_INTERPRET
        _FORCE_INTERPRET = self._saved


_PIPE_MAX = 4

# Probe-only ablation hooks (benchmarks/lstm_kernel_ablate_probe.py) — never
# set on production paths; they change numerics and exist to attribute the
# kernel's per-grid-step time to cell math vs the cross-step recurrence.
_ABLATE_NOCELL = False  # gate nonlinearities -> cheap linear cell
_ABLATE_NOSCRATCH = False  # no carry scratch entry/exit (breaks recurrence
#                            across grid steps -> measures the serialization)


def _pick_pipe(b: int) -> int:
    """Row-chain interleave factor for the merged kernels.

    The largest p <= _PIPE_MAX dividing b into 8-row-aligned chains; the
    measured sweet spot is 4 (cell math fully hidden under the other
    chains\' dots, benchmarks/lstm_pipe_probe.json), 2 recovers about half
    the gap, 1 is the un-pipelined layout.
    """
    p = _PIPE_MAX
    while p > 1 and (b % p or (b // p) % 8):
        p //= 2
    return max(1, p)


_TB_MAX = 1


def _pick_tb(t: int, est_block_bytes: int) -> int:
    """Time-block size for the merged kernels.

    Largest divisor of t up to _TB_MAX whose per-program streamed blocks
    (double-buffered) fit the VMEM budget. Mirrors the GCN train kernel's
    _TIME_BLOCK — but MEASURED NEUTRAL here and left off by default
    (_TB_MAX=1): benchmarks/tb_ab_probe.json shows tb=4 flat on the
    isolated LSTM grad (25.1 vs 25.3 ms) and ~1% slower on the meta step
    (286.8 vs 291.7 ms best) — Mosaic's automatic block double-buffering
    already hides per-grid-step stream setup at recurrent shapes, unlike
    the GCN kernel whose win came from deepening the dW contraction. The
    grid-overhead hypothesis from benchmarks/pipe_chain_probe.json (LSTM
    grad at 3.3x its FLOP floor) is thereby ruled out; the residual is the
    serial recurrent-chain latency itself.
    """
    budget = 80 * 1024 * 1024  # leave headroom under the 128 MiB physical
    tb = min(_TB_MAX, t)
    while tb > 1 and (t % tb or 2 * tb * est_block_bytes > budget):
        tb -= 1
    return max(1, tb)


def _join_vma(*arrays):
    """Union of the inputs' varying-manual-axes (shard_map VMA tracking).

    A pallas_call traced inside a check_vma=True `jax.shard_map` must state
    how its outputs vary across mesh axes (ShapeDtypeStruct's `vma`); the
    kernels are elementwise-in-batch over their operands, so outputs vary
    wherever any input does. Outside shard_map every vma is empty and this
    is a no-op.
    """
    vma = frozenset()
    for a in arrays:
        v = getattr(jax.typeof(a), "vma", None)
        if v:
            vma = vma | v
    return vma


def _sigmoid(x):
    return jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, wx0_ref, wxr_ref, wh_ref, b_ref, m_ref,
                h_out_ref, c_out_ref, h_last_ref, h_scr, c_scr,
                *, n_layers, hidden, has_masks, compute_dtype, keep=1.0):
    t = pl.program_id(0)
    res_dtype = h_out_ref.dtype

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    inp = x_ref[0].astype(compute_dtype)  # [B, C]
    inv_keep = 1.0 / keep if has_masks else 1.0
    for l in range(n_layers):
        wx = (wx0_ref[:] if l == 0 else wxr_ref[l - 1]).astype(compute_dtype)
        wh = wh_ref[l].astype(compute_dtype)
        gates = (
            jnp.dot(inp, wx, preferred_element_type=jnp.float32)
            + jnp.dot(
                h_scr[l].astype(compute_dtype), wh,
                preferred_element_type=jnp.float32,
            )
            + b_ref[pl.ds(l, 1), :]  # [1, 4H] broadcasts over B
        )
        i = _sigmoid(gates[:, :hidden])
        f = _sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = _sigmoid(gates[:, 3 * hidden:])
        c = f * c_scr[l] + i * g
        h = o * jnp.tanh(c)
        h_scr[l] = h
        c_scr[l] = c
        # Residuals for the backward only stream at compute precision — the
        # backward either re-casts them to compute_dtype for MXU anyway (h)
        # or tolerates the rounding at the bf16 matmul-noise floor (c). The
        # f32 carry in scratch keeps the FORWARD numerics bit-exact vs XLA.
        h_out_ref[l, 0] = h.astype(res_dtype)
        c_out_ref[l, 0] = c.astype(res_dtype)
        if l == n_layers - 1:
            # Primal output: the top layer's hidden state. Constant-mapped
            # block, revisited each step — only the final (t = T-1) value is
            # flushed, which is exactly the last-timestep readout the hybrid
            # head consumes (and the only cotangent the backward receives).
            h_last_ref[:] = h
        if l < n_layers - 1:
            nxt = h
            if has_masks:
                # Masks stream as int8 {0, 1} (quarter the HBM bytes of the
                # old f32 {0, 1/keep} stream); the scale folds in here.
                # (m * f32(1/keep)) is exact for m in {0, 1}, so the products
                # are bit-identical to the old pre-scaled-mask stream.
                nxt = nxt * (m_ref[l, 0].astype(jnp.float32) * inv_keep)
            inp = nxt.astype(compute_dtype)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(g_ref, x_ref, h_all_ref, h_prev_ref, c_all_ref, c_prev_ref,
                wx0_ref, wxr_ref, wh_ref, b_ref, m_ref,
                dx_ref, dwx0_ref, dwxr_ref, dwh_ref, db_ref,
                dh_scr, dc_scr,
                *, n_layers, hidden, has_masks, compute_dtype, t_len,
                keep=1.0):
    s = pl.program_id(0)  # time index is T-1-s via the index maps
    inv_keep = 1.0 / keep if has_masks else 1.0

    @pl.when(s == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    # h_prev_ref/c_prev_ref are second streamed VIEWS of the same h/c
    # residual arrays, index-mapped to max(t-1, 0) — no XLA-side shifted
    # copies (the old jnp.concatenate cost a full [L, T, B, H] write+read
    # per direction per iteration). At t == 0 (s == T-1) the view aliases
    # t == 0; the true previous state is zero, selected here.
    at_t0 = s == t_len - 1
    # Cotangent of the [B, H] primal arrives only at the last timestep.
    g_in = jnp.where(s == 0, g_ref[:], jnp.zeros_like(g_ref[:]))

    d_from_above = None  # [B, H] gradient into layer l's output at this t
    for l in range(n_layers - 1, -1, -1):
        # Selects run in f32 (Mosaic lowers f32 select/cmp universally;
        # bf16 element-wise compares are not supported on all targets).
        h_prev = jnp.where(
            at_t0,
            jnp.zeros((), jnp.float32),
            h_prev_ref[l, 0].astype(jnp.float32),
        )
        c_prev = jnp.where(
            at_t0,
            jnp.zeros((), jnp.float32),
            c_prev_ref[l, 0].astype(jnp.float32),
        )
        if l == 0:
            inp = x_ref[0].astype(compute_dtype)
            wx = wx0_ref[:].astype(compute_dtype)
        else:
            inp = h_all_ref[l - 1, 0]
            if has_masks:
                # Mask multiply in f32 like the forward's, so the recomputed
                # gate inputs round once, not twice, under bf16 residuals.
                inp = inp.astype(jnp.float32) * (
                    m_ref[l - 1, 0].astype(jnp.float32) * inv_keep
                )
            inp = inp.astype(compute_dtype)
            wx = wxr_ref[l - 1].astype(compute_dtype)
        wh = wh_ref[l].astype(compute_dtype)

        # Recompute this (l, t)'s gate activations from residuals.
        gates = (
            jnp.dot(inp, wx, preferred_element_type=jnp.float32)
            + jnp.dot(
                h_prev.astype(compute_dtype), wh,
                preferred_element_type=jnp.float32,
            )
            + b_ref[pl.ds(l, 1), :]
        )
        i = _sigmoid(gates[:, :hidden])
        f = _sigmoid(gates[:, hidden:2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o = _sigmoid(gates[:, 3 * hidden:])
        tc = jnp.tanh(c_all_ref[l, 0].astype(jnp.float32))

        dh = dh_scr[l]
        if l == n_layers - 1:
            dh = dh + g_in
        if d_from_above is not None:
            dh = dh + d_from_above
        dc = dc_scr[l] + dh * o * (1.0 - tc * tc)
        do_pre = dh * tc * o * (1.0 - o)
        di_pre = dc * g * i * (1.0 - i)
        df_pre = dc * c_prev * f * (1.0 - f)
        dg_pre = dc * i * (1.0 - g * g)
        dgates = jnp.concatenate(
            [di_pre, df_pre, dg_pre, do_pre], axis=-1
        )  # [B, 4H] float32

        dgates_c = dgates.astype(compute_dtype)
        # Recurrent carry to t-1: dgates @ wh^T, expressed as a transposed
        # contraction so no materialized wh^T is needed.
        dh_scr[l] = jax.lax.dot_general(
            dgates_c, wh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dc_scr[l] = dc * f

        # Input-gradient: to dx (layer 0) or layer below's dh (same t).
        d_in = jax.lax.dot_general(
            dgates_c, wx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if l == 0:
            dx_ref[0] = d_in.astype(dx_ref.dtype)
            d_from_above = None
        else:
            if has_masks:
                d_in = d_in * (m_ref[l - 1, 0].astype(jnp.float32) * inv_keep)
            d_from_above = d_in

        # Weight/bias gradients, accumulated across the revisited blocks.
        dwx_upd = jax.lax.dot_general(
            inp, dgates_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C_in, 4H]
        dwh_upd = jax.lax.dot_general(
            h_prev.astype(compute_dtype), dgates_c,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, 4H]
        db_upd = jnp.sum(dgates, axis=0, keepdims=True)  # [1, 4H]

        if l == 0:
            @pl.when(s == 0)
            def _(dwx_upd=dwx_upd):
                dwx0_ref[:] = dwx_upd

            @pl.when(s > 0)
            def _(dwx_upd=dwx_upd):
                dwx0_ref[:] = dwx0_ref[:] + dwx_upd
        else:
            @pl.when(s == 0)
            def _(l=l, dwx_upd=dwx_upd):
                dwxr_ref[l - 1] = dwx_upd

            @pl.when(s > 0)
            def _(l=l, dwx_upd=dwx_upd):
                dwxr_ref[l - 1] = dwxr_ref[l - 1] + dwx_upd

        @pl.when(s == 0)
        def _(l=l, dwh_upd=dwh_upd, db_upd=db_upd):
            dwh_ref[l] = dwh_upd
            db_ref[pl.ds(l, 1), :] = db_upd

        @pl.when(s > 0)
        def _(l=l, dwh_upd=dwh_upd, db_upd=db_upd):
            dwh_ref[l] = dwh_ref[l] + dwh_upd
            db_ref[pl.ds(l, 1), :] = db_ref[pl.ds(l, 1), :] + db_upd

    if n_layers == 1:
        # The placeholder dwxr lane is never touched by the loop — zero it
        # once so the output block never carries garbage (VMEM is not
        # zero-initialized).
        @pl.when(s == 0)
        def _():
            dwxr_ref[:] = jnp.zeros_like(dwxr_ref)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _specs_fwd(t, b, c_in, hidden, n_layers, has_masks):
    g4 = 4 * hidden
    in_specs = [
        pl.BlockSpec((1, b, c_in), lambda s: (s, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c_in, g4), lambda s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (max(n_layers - 1, 1), hidden, g4), lambda s: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (n_layers, hidden, g4), lambda s: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((n_layers, g4), lambda s: (0, 0), memory_space=pltpu.VMEM),
    ]
    if has_masks:
        in_specs.append(
            pl.BlockSpec(
                (n_layers - 1, 1, b, hidden), lambda s: (0, s, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    out_specs = [
        pl.BlockSpec(
            (n_layers, 1, b, hidden), lambda s: (0, s, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (n_layers, 1, b, hidden), lambda s: (0, s, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((b, hidden), lambda s: (0, 0), memory_space=pltpu.VMEM),
    ]
    return in_specs, out_specs


def _res_dtype(compute_dtype):
    """Residual storage precision: compute precision. h residuals are re-cast
    to compute_dtype for every MXU use anyway (bit-identical); c residuals
    feed f32 VPU math, where bf16 storage adds rounding at the same order as
    the bf16 matmul-noise floor the backward already sits at. The forward
    carry lives in f32 scratch, so FORWARD outputs stay bit-exact vs XLA
    regardless. Halves the residual HBM stream under bf16 training."""
    return jnp.dtype(compute_dtype)


def _fwd_pallas(x, wx0, wxr, wh, b2d, masks, compute_dtype, interpret,
                keep=1.0):
    t, b, c_in = x.shape
    n_layers, hidden, g4 = wh.shape[0], wh.shape[1], wh.shape[2]
    has_masks = masks is not None
    in_specs, out_specs = _specs_fwd(t, b, c_in, hidden, n_layers, has_masks)
    kernel = (
        functools.partial(
            _fwd_kernel, n_layers=n_layers, hidden=hidden, has_masks=True,
            compute_dtype=compute_dtype, keep=keep,
        )
        if has_masks
        else functools.partial(
            _fwd_kernel_nomask, n_layers=n_layers, hidden=hidden,
            compute_dtype=compute_dtype,
        )
    )
    args = [x, wx0, wxr, wh, b2d] + ([masks] if has_masks else [])
    vma = _join_vma(*args)
    rd = _res_dtype(compute_dtype)
    h_all, c_all, h_last = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((n_layers, t, b, hidden), rd, vma=vma),
            jax.ShapeDtypeStruct((n_layers, t, b, hidden), rd, vma=vma),
            jax.ShapeDtypeStruct((b, hidden), jnp.float32, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_layers, b, hidden), jnp.float32),
            pltpu.VMEM((n_layers, b, hidden), jnp.float32),
        ],
        compiler_params=_compiler_params(interpret, 48),
        interpret=interpret,
    )(*args)
    return h_all, c_all, h_last


def _compiler_params(interpret: bool, mib: int):
    # Mosaic's default scoped-VMEM cap is 16 MiB; the physical VMEM on
    # v4/v5-class chips is 128 MiB. The backward kernel's resident weights +
    # gradient accumulators + double-buffered streams legitimately need
    # more than the default at reference shapes (observed 21 MiB request).
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=mib * 1024 * 1024)


def _fwd_kernel_nomask(x_ref, wx0_ref, wxr_ref, wh_ref, b_ref,
                       h_out_ref, c_out_ref, h_last_ref, h_scr, c_scr,
                       *, n_layers, hidden, compute_dtype):
    _fwd_kernel(
        x_ref, wx0_ref, wxr_ref, wh_ref, b_ref, None,
        h_out_ref, c_out_ref, h_last_ref, h_scr, c_scr,
        n_layers=n_layers, hidden=hidden, has_masks=False,
        compute_dtype=compute_dtype,
    )


def _bwd_kernel_nomask(g_ref, x_ref, h_all_ref, h_prev_ref, c_all_ref,
                       c_prev_ref, wx0_ref, wxr_ref, wh_ref, b_ref,
                       dx_ref, dwx0_ref, dwxr_ref, dwh_ref, db_ref,
                       dh_scr, dc_scr, *, n_layers, hidden, compute_dtype,
                       t_len):
    _bwd_kernel(
        g_ref, x_ref, h_all_ref, h_prev_ref, c_all_ref, c_prev_ref,
        wx0_ref, wxr_ref, wh_ref, b_ref, None,
        dx_ref, dwx0_ref, dwxr_ref, dwh_ref, db_ref, dh_scr, dc_scr,
        n_layers=n_layers, hidden=hidden, has_masks=False,
        compute_dtype=compute_dtype, t_len=t_len,
    )


def _bwd_pallas(g, x, h_all, c_all, wx0, wxr, wh, b2d, masks,
                compute_dtype, interpret, keep=1.0):
    t, b, c_in = x.shape
    n_layers, hidden, g4 = wh.shape[0], wh.shape[1], wh.shape[2]
    has_masks = masks is not None
    rev3 = lambda s: (t - 1 - s, 0, 0)
    rev4 = lambda s: (0, t - 1 - s, 0, 0)
    # Previous-timestep residuals are second streamed VIEWS of h_all/c_all
    # at max(t-1, 0) — the kernel zero-selects at t == 0 — instead of
    # XLA-side shifted copies (which cost a full [L, T, B, H] HBM write +
    # read per direction per iteration).
    prev4 = lambda s: (0, jnp.maximum(t - 2 - s, 0), 0, 0)
    const2 = lambda s: (0, 0)
    const3 = lambda s: (0, 0, 0)
    in_specs = [
        pl.BlockSpec((b, hidden), const2, memory_space=pltpu.VMEM),    # g
        pl.BlockSpec((1, b, c_in), rev3, memory_space=pltpu.VMEM),     # x
        pl.BlockSpec((n_layers, 1, b, hidden), rev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((n_layers, 1, b, hidden), prev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((n_layers, 1, b, hidden), rev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((n_layers, 1, b, hidden), prev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((c_in, g4), const2, memory_space=pltpu.VMEM),     # wx0
        pl.BlockSpec(
            (max(n_layers - 1, 1), hidden, g4), const3,
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((n_layers, hidden, g4), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((n_layers, g4), const2, memory_space=pltpu.VMEM),  # b
    ]
    if has_masks:
        in_specs.append(
            pl.BlockSpec(
                (n_layers - 1, 1, b, hidden), lambda s: (0, t - 1 - s, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    out_specs = [
        pl.BlockSpec((1, b, c_in), rev3, memory_space=pltpu.VMEM),     # dx
        pl.BlockSpec((c_in, g4), const2, memory_space=pltpu.VMEM),     # dwx0
        pl.BlockSpec(
            (max(n_layers - 1, 1), hidden, g4), const3,
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((n_layers, hidden, g4), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((n_layers, g4), const2, memory_space=pltpu.VMEM),  # db
    ]
    kernel = (
        functools.partial(
            _bwd_kernel, n_layers=n_layers, hidden=hidden, has_masks=True,
            compute_dtype=compute_dtype, t_len=t, keep=keep,
        )
        if has_masks
        else functools.partial(
            _bwd_kernel_nomask, n_layers=n_layers, hidden=hidden,
            compute_dtype=compute_dtype, t_len=t,
        )
    )
    args = [g, x, h_all, h_all, c_all, c_all, wx0, wxr, wh, b2d]
    vma = _join_vma(*args)
    if has_masks:
        args.append(masks)
    dx, dwx0, dwxr, dwh, db = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((t, b, c_in), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((c_in, g4), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct(
                (max(n_layers - 1, 1), hidden, g4), jnp.float32, vma=vma
            ),
            jax.ShapeDtypeStruct((n_layers, hidden, g4), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((n_layers, g4), jnp.float32, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_layers, b, hidden), jnp.float32),
            pltpu.VMEM((n_layers, b, hidden), jnp.float32),
        ],
        compiler_params=_compiler_params(interpret, 64),
        interpret=interpret,
    )(*args)
    return dx, dwx0, dwxr, dwh, db


# ---------------------------------------------------------------------------
# Merged-gates kernels: ONE [B, C+H] @ [C+H, 4H] contraction per (t, l)
# ---------------------------------------------------------------------------


def _fwd_kernel_m(x_ref, wcat0_ref, wcatr_ref, b_ref, m_ref,
                  h_out_ref, c_out_ref, h_last_ref, h_scr, c_scr,
                  *, n_layers, hidden, has_masks, compute_dtype, keep=1.0,
                  pipe=1, tb=1):
    # h_out_ref/c_out_ref are None on the no-grad primal path (no backward
    # will consume residuals — eval/serving skips the 2*L*T*B*H HBM stream).
    #
    # `pipe` splits the batch rows into independent recurrent chains and
    # interleaves their work: all `pipe` merged dots are issued before any
    # chain's cell math, so one chain's VPU gate/cell computation overlaps
    # another's MXU contraction (benchmarks/lstm_pipe_probe.json,
    # vpu_share_probe.json; ~2% at production shapes). Per-row numerics are
    # unchanged (dots and cell math are row-local; only the bias broadcast
    # is shared).
    #
    # `tb` processes that many time slices per grid program (the GCN train
    # kernel's _TIME_BLOCK pattern): the (h, c) state rides Python carry
    # variables across the in-program slices instead of a scratch
    # round-trip per step, and per-program block-streaming setup amortizes
    # tb-fold. Measured neutral (benchmarks/tb_ab_probe.json) — and the
    # round-4 methodology correction showed why: the dots already run at
    # 97-98% of bf16 peak (lstm_kernel_ablate_probe: empty-kernel chains
    # cost the ~22 ms tunnel dispatch floor that earlier per-call readings
    # divided in), so neither grid-step count nor dot latency is a
    # residual. The kernel's remaining gap to its naive 3x-fwd floor is
    # the bwd's BY-DESIGN gate-recompute dot group (cheaper than streaming
    # 4H gate residuals) plus partially-hidden VPU cell math.
    s = pl.program_id(0)
    emit_res = h_out_ref is not None
    res_dtype = h_out_ref.dtype if emit_res else jnp.float32

    @pl.when(s == 0)
    def _():
        if not _ABLATE_NOSCRATCH:
            h_scr[:] = jnp.zeros_like(h_scr)
            c_scr[:] = jnp.zeros_like(c_scr)

    b_rows = x_ref.shape[1]
    bp = b_rows // pipe
    sls = [slice(p * bp, (p + 1) * bp) for p in range(pipe)]
    inv_keep = 1.0 / keep if has_masks else 1.0
    # (h, c) carries live in registers/VMEM values across the block's tb
    # slices; scratch is read once at block entry and written once at exit.
    if _ABLATE_NOSCRATCH:
        zero = jnp.zeros((bp, hidden), jnp.float32)
        h_c = [[zero for _ in sls] for _ in range(n_layers)]
        c_c = [[zero for _ in sls] for _ in range(n_layers)]
    else:
        h_c = [[h_scr[l, sl] for sl in sls] for l in range(n_layers)]
        c_c = [[c_scr[l, sl] for sl in sls] for l in range(n_layers)]
    for j in range(tb):
        inps = [x_ref[j, sl].astype(compute_dtype) for sl in sls]
        for l in range(n_layers):
            w = (
                wcat0_ref[:] if l == 0 else wcatr_ref[l - 1]
            ).astype(compute_dtype)
            bias = b_ref[pl.ds(l, 1), :]
            # Phase A — all chains' merged dots back to back on the MXU:
            # [inp | h_prev] @ [[wx], [wh]], one contraction per chain.
            gates_p = []
            for p in range(pipe):
                xh = jnp.concatenate(
                    [inps[p], h_c[l][p].astype(compute_dtype)], axis=1
                )
                gates_p.append(
                    jnp.dot(xh, w, preferred_element_type=jnp.float32) + bias
                )
            # Phase B — cell math per chain (VPU), overlapping later
            # chains' phase-A dots and the next layer's first dots.
            nxt_p = []
            for p, sl in enumerate(sls):
                gates = gates_p[p]
                if _ABLATE_NOCELL:
                    # Linear stand-in keeping the (c -> h -> next step)
                    # dependence but no transcendentals.
                    c = gates[:, :hidden] * 0.25 + c_c[l][p] * 0.5
                    h = gates[:, hidden:2 * hidden] * 0.25 + c * 0.25
                else:
                    i = _sigmoid(gates[:, :hidden])
                    f = _sigmoid(gates[:, hidden:2 * hidden])
                    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
                    o = _sigmoid(gates[:, 3 * hidden:])
                    c = f * c_c[l][p] + i * g
                    h = o * jnp.tanh(c)
                h_c[l][p] = h
                c_c[l][p] = c
                if emit_res:
                    h_out_ref[l, j, sl] = h.astype(res_dtype)
                    c_out_ref[l, j, sl] = c.astype(res_dtype)
                if l == n_layers - 1 and j == tb - 1:
                    h_last_ref[sl] = h
                if l < n_layers - 1:
                    nxt = h
                    if has_masks:
                        nxt = nxt * (
                            m_ref[l, j, sl].astype(jnp.float32) * inv_keep
                        )
                    nxt_p.append(nxt.astype(compute_dtype))
            if l < n_layers - 1:
                inps = nxt_p
    if not _ABLATE_NOSCRATCH:
        for l in range(n_layers):
            for p, sl in enumerate(sls):
                h_scr[l, sl] = h_c[l][p]
                c_scr[l, sl] = c_c[l][p]


def _bwd_kernel_m(g_ref, x_ref, h_all_ref, h_prev_ref, c_all_ref, c_prev_ref,
                  wcat0_ref, wcatr_ref, b_ref, m_ref,
                  dx_ref, dwcat0_ref, dwcatr_ref, db_ref,
                  dh_scr, dc_scr,
                  *, n_layers, hidden, c_in, has_masks, compute_dtype, t_len,
                  keep=1.0, pipe=1, tb=1):
    # `pipe` interleaves independent row chains exactly like _fwd_kernel_m:
    # each chain's gate recompute / dxh / dwcat dots are issued adjacently
    # so other chains' VPU cell-gradient math hides under them. Weight/bias
    # gradients accumulate per-chain partial contractions (f32 adds — same
    # math, reassociated at chain boundaries).
    #
    # `tb` processes that many time slices per grid program (reverse
    # order): the (dh, dc) carries and the per-layer dwcat/db accumulators
    # ride Python variables across the block's slices, so scratch/ref
    # round-trips and block-streaming setup amortize tb-fold. The previous-
    # block residual refs (h_prev/c_prev, one BLOCK earlier chronologically)
    # supply h_{t-1}/c_{t-1} for the block's oldest slice; in-block slices
    # read their own block.
    s = pl.program_id(0)  # block index is nb-1-s via the index maps
    nb = t_len // tb
    inv_keep = 1.0 / keep if has_masks else 1.0

    @pl.when(s == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    at_t0 = s == nb - 1  # this block holds absolute time 0 (at j == 0)
    g_in = jnp.where(s == 0, g_ref[:], jnp.zeros_like(g_ref[:]))

    b_rows = g_ref.shape[0]
    bp = b_rows // pipe
    sls = [slice(p * bp, (p + 1) * bp) for p in range(pipe)]

    dh_c = [[dh_scr[l, sl] for sl in sls] for l in range(n_layers)]
    dc_c = [[dc_scr[l, sl] for sl in sls] for l in range(n_layers)]
    dwcat_acc = [None] * n_layers
    db_acc = [None] * n_layers

    for j in range(tb - 1, -1, -1):
        d_from_above = [None] * pipe
        for l in range(n_layers - 1, -1, -1):
            if l == 0:
                w = wcat0_ref[:].astype(compute_dtype)
                cw = c_in
            else:
                w = wcatr_ref[l - 1].astype(compute_dtype)
                cw = hidden

            # Phase A — recompute every chain's (l, t) gates: merged dots.
            xh_p, gates_p = [], []
            for p, sl in enumerate(sls):
                if j > 0:
                    h_prev = h_all_ref[l, j - 1, sl].astype(jnp.float32)
                else:
                    h_prev = jnp.where(
                        at_t0,
                        jnp.zeros((), jnp.float32),
                        h_prev_ref[l, tb - 1, sl].astype(jnp.float32),
                    )
                if l == 0:
                    inp = x_ref[j, sl].astype(compute_dtype)
                else:
                    inp = h_all_ref[l - 1, j, sl]
                    if has_masks:
                        inp = inp.astype(jnp.float32) * (
                            m_ref[l - 1, j, sl].astype(jnp.float32) * inv_keep
                        )
                    inp = inp.astype(compute_dtype)
                xh = jnp.concatenate(
                    [inp, h_prev.astype(compute_dtype)], axis=1
                )  # [bp, cw + H]
                xh_p.append(xh)
                gates_p.append(
                    jnp.dot(xh, w, preferred_element_type=jnp.float32)
                    + b_ref[pl.ds(l, 1), :]
                )

            # Phase B — cell-gradient VPU math per chain (overlaps phase
            # A/C dots of other chains).
            dgates_p = []
            for p, sl in enumerate(sls):
                gates = gates_p[p]
                if j > 0:
                    c_prev = c_all_ref[l, j - 1, sl].astype(jnp.float32)
                else:
                    c_prev = jnp.where(
                        at_t0,
                        jnp.zeros((), jnp.float32),
                        c_prev_ref[l, tb - 1, sl].astype(jnp.float32),
                    )
                i = _sigmoid(gates[:, :hidden])
                f = _sigmoid(gates[:, hidden:2 * hidden])
                g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
                o = _sigmoid(gates[:, 3 * hidden:])
                tc = jnp.tanh(c_all_ref[l, j, sl].astype(jnp.float32))

                dh = dh_c[l][p]
                if l == n_layers - 1 and j == tb - 1:
                    dh = dh + g_in[sl]
                if d_from_above[p] is not None:
                    dh = dh + d_from_above[p]
                dc = dc_c[l][p] + dh * o * (1.0 - tc * tc)
                do_pre = dh * tc * o * (1.0 - o)
                di_pre = dc * g * i * (1.0 - i)
                df_pre = dc * c_prev * f * (1.0 - f)
                dg_pre = dc * i * (1.0 - g * g)
                dgates_p.append(jnp.concatenate(
                    [di_pre, df_pre, dg_pre, do_pre], axis=-1
                ))  # [bp, 4H] float32
                dc_c[l][p] = dc * f

            # Phase C — every chain's dxh and dwcat contractions.
            for p, sl in enumerate(sls):
                xh = xh_p[p]
                dgates = dgates_p[p]
                dgates_c = dgates.astype(compute_dtype)
                # dgates @ W^T in one contraction, then split: first cw
                # lanes are the input gradient, last H the recurrent carry
                # to t-1.
                dxh = jax.lax.dot_general(
                    dgates_c, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [bp, cw + H]
                d_in = dxh[:, :cw]
                dh_c[l][p] = dxh[:, cw:]

                if l == 0:
                    dx_ref[j, sl] = d_in.astype(dx_ref.dtype)
                    d_from_above[p] = None
                else:
                    if has_masks:
                        d_in = d_in * (
                            m_ref[l - 1, j, sl].astype(jnp.float32) * inv_keep
                        )
                    d_from_above[p] = d_in

                # Merged weight gradient: [inp | h_prev]^T @ dgates — per-
                # chain contraction, chains and block slices summed in f32
                # (rows split back into (dwx, dwh) outside).
                part = jax.lax.dot_general(
                    xh, dgates_c, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [cw + H, 4H]
                dwcat_acc[l] = (
                    part if dwcat_acc[l] is None else dwcat_acc[l] + part
                )
                db_part = jnp.sum(dgates, axis=0, keepdims=True)  # [1, 4H]
                db_acc[l] = (
                    db_part if db_acc[l] is None else db_acc[l] + db_part
                )

    for l in range(n_layers):
        for p, sl in enumerate(sls):
            dh_scr[l, sl] = dh_c[l][p]
            dc_scr[l, sl] = dc_c[l][p]

    for l in range(n_layers - 1, -1, -1):
        dwcat_upd = dwcat_acc[l]
        db_upd = db_acc[l]
        if l == 0:
            @pl.when(s == 0)
            def _(dwcat_upd=dwcat_upd):
                dwcat0_ref[:] = dwcat_upd

            @pl.when(s > 0)
            def _(dwcat_upd=dwcat_upd):
                dwcat0_ref[:] = dwcat0_ref[:] + dwcat_upd
        else:
            @pl.when(s == 0)
            def _(l=l, dwcat_upd=dwcat_upd):
                dwcatr_ref[l - 1] = dwcat_upd

            @pl.when(s > 0)
            def _(l=l, dwcat_upd=dwcat_upd):
                dwcatr_ref[l - 1] = dwcatr_ref[l - 1] + dwcat_upd

        @pl.when(s == 0)
        def _(l=l, db_upd=db_upd):
            db_ref[pl.ds(l, 1), :] = db_upd

        @pl.when(s > 0)
        def _(l=l, db_upd=db_upd):
            db_ref[pl.ds(l, 1), :] = db_ref[pl.ds(l, 1), :] + db_upd

    if n_layers == 1:
        @pl.when(s == 0)
        def _():
            dwcatr_ref[:] = jnp.zeros_like(dwcatr_ref)


def _fwd_kernel_m_nomask(x_ref, wcat0_ref, wcatr_ref, b_ref,
                         h_out_ref, c_out_ref, h_last_ref, h_scr, c_scr,
                         *, n_layers, hidden, compute_dtype, pipe=1, tb=1):
    _fwd_kernel_m(
        x_ref, wcat0_ref, wcatr_ref, b_ref, None,
        h_out_ref, c_out_ref, h_last_ref, h_scr, c_scr,
        n_layers=n_layers, hidden=hidden, has_masks=False,
        compute_dtype=compute_dtype, pipe=pipe, tb=tb,
    )


def _fwd_kernel_m_lastonly(x_ref, wcat0_ref, wcatr_ref, b_ref, m_ref,
                           h_last_ref, h_scr, c_scr,
                           *, n_layers, hidden, compute_dtype, keep, pipe=1,
                           tb=1):
    _fwd_kernel_m(
        x_ref, wcat0_ref, wcatr_ref, b_ref, m_ref,
        None, None, h_last_ref, h_scr, c_scr,
        n_layers=n_layers, hidden=hidden, has_masks=True,
        compute_dtype=compute_dtype, keep=keep, pipe=pipe, tb=tb,
    )


def _fwd_kernel_m_lastonly_nomask(x_ref, wcat0_ref, wcatr_ref, b_ref,
                                  h_last_ref, h_scr, c_scr,
                                  *, n_layers, hidden, compute_dtype, pipe=1,
                                  tb=1):
    _fwd_kernel_m(
        x_ref, wcat0_ref, wcatr_ref, b_ref, None,
        None, None, h_last_ref, h_scr, c_scr,
        n_layers=n_layers, hidden=hidden, has_masks=False,
        compute_dtype=compute_dtype, pipe=pipe, tb=tb,
    )


def _bwd_kernel_m_nomask(g_ref, x_ref, h_all_ref, h_prev_ref, c_all_ref,
                         c_prev_ref, wcat0_ref, wcatr_ref, b_ref,
                         dx_ref, dwcat0_ref, dwcatr_ref, db_ref,
                         dh_scr, dc_scr,
                         *, n_layers, hidden, c_in, compute_dtype, t_len,
                         pipe=1, tb=1):
    _bwd_kernel_m(
        g_ref, x_ref, h_all_ref, h_prev_ref, c_all_ref, c_prev_ref,
        wcat0_ref, wcatr_ref, b_ref, None,
        dx_ref, dwcat0_ref, dwcatr_ref, db_ref, dh_scr, dc_scr,
        n_layers=n_layers, hidden=hidden, c_in=c_in, has_masks=False,
        compute_dtype=compute_dtype, t_len=t_len, pipe=pipe, tb=tb,
    )


def _fwd_pallas_m(x, wcat0, wcatr, b2d, masks, compute_dtype, interpret,
                  keep=1.0, emit_residuals=True):
    t, b, c_in = x.shape
    n_layers, g4 = b2d.shape
    hidden = g4 // 4
    has_masks = masks is not None
    rd = _res_dtype(compute_dtype)
    # Streamed bytes per time slice: x in, residual h/c out, masks in.
    slice_bytes = b * c_in * x.dtype.itemsize
    if emit_residuals:
        slice_bytes += 2 * n_layers * b * hidden * jnp.dtype(rd).itemsize
    if has_masks:
        slice_bytes += (n_layers - 1) * b * hidden
    tb = _pick_tb(t, slice_bytes)
    in_specs = [
        pl.BlockSpec((tb, b, c_in), lambda s: (s, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (c_in + hidden, g4), lambda s: (0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (max(n_layers - 1, 1), 2 * hidden, g4), lambda s: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((n_layers, g4), lambda s: (0, 0), memory_space=pltpu.VMEM),
    ]
    if has_masks:
        in_specs.append(
            pl.BlockSpec(
                (n_layers - 1, tb, b, hidden), lambda s: (0, s, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    res_spec = pl.BlockSpec(
        (n_layers, tb, b, hidden), lambda s: (0, s, 0, 0),
        memory_space=pltpu.VMEM,
    )
    last_spec = pl.BlockSpec((b, hidden), lambda s: (0, 0), memory_space=pltpu.VMEM)
    args = [x, wcat0, wcatr, b2d] + ([masks] if has_masks else [])
    vma = _join_vma(*args)
    pipe = _pick_pipe(b)
    if not emit_residuals:
        # No-grad primal (eval/serving): skip the 2*L*T*B*H residual stream
        # entirely — XLA cannot DCE stores inside the opaque kernel, so this
        # needs its own variant rather than dead outputs.
        kernel = (
            functools.partial(
                _fwd_kernel_m_lastonly, n_layers=n_layers, hidden=hidden,
                compute_dtype=compute_dtype, keep=keep, pipe=pipe, tb=tb,
            )
            if has_masks
            else functools.partial(
                _fwd_kernel_m_lastonly_nomask, n_layers=n_layers,
                hidden=hidden, compute_dtype=compute_dtype, pipe=pipe, tb=tb,
            )
        )
        h_last = pl.pallas_call(
            kernel,
            grid=(t // tb,),
            in_specs=in_specs,
            out_specs=[last_spec],
            out_shape=[
                jax.ShapeDtypeStruct((b, hidden), jnp.float32, vma=vma)
            ],
            scratch_shapes=[
                pltpu.VMEM((n_layers, b, hidden), jnp.float32),
                pltpu.VMEM((n_layers, b, hidden), jnp.float32),
            ],
            compiler_params=_compiler_params(interpret, 48),
            interpret=interpret,
        )(*args)[0]
        return h_last
    kernel = (
        functools.partial(
            _fwd_kernel_m, n_layers=n_layers, hidden=hidden, has_masks=True,
            compute_dtype=compute_dtype, keep=keep, pipe=pipe, tb=tb,
        )
        if has_masks
        else functools.partial(
            _fwd_kernel_m_nomask, n_layers=n_layers, hidden=hidden,
            compute_dtype=compute_dtype, pipe=pipe, tb=tb,
        )
    )
    h_all, c_all, h_last = pl.pallas_call(
        kernel,
        grid=(t // tb,),
        in_specs=in_specs,
        out_specs=[res_spec, res_spec, last_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_layers, t, b, hidden), rd, vma=vma),
            jax.ShapeDtypeStruct((n_layers, t, b, hidden), rd, vma=vma),
            jax.ShapeDtypeStruct((b, hidden), jnp.float32, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_layers, b, hidden), jnp.float32),
            pltpu.VMEM((n_layers, b, hidden), jnp.float32),
        ],
        compiler_params=_compiler_params(interpret, 48),
        interpret=interpret,
    )(*args)
    return h_all, c_all, h_last


def _bwd_pallas_m(g, x, h_all, c_all, wcat0, wcatr, b2d, masks,
                  compute_dtype, interpret, keep=1.0):
    t, b, c_in = x.shape
    n_layers, g4 = b2d.shape
    hidden = g4 // 4
    has_masks = masks is not None
    rd_b = h_all.dtype.itemsize
    # Streamed bytes per time slice: x + dx, 4 residual views, masks.
    slice_bytes = (
        b * c_in * (x.dtype.itemsize * 2)
        + 4 * n_layers * b * hidden * rd_b
        + ((n_layers - 1) * b * hidden if has_masks else 0)
    )
    tb = _pick_tb(t, slice_bytes)
    nb = t // tb
    rev3 = lambda s: (nb - 1 - s, 0, 0)
    rev4 = lambda s: (0, nb - 1 - s, 0, 0)
    prev4 = lambda s: (0, jnp.maximum(nb - 2 - s, 0), 0, 0)
    const2 = lambda s: (0, 0)
    const3 = lambda s: (0, 0, 0)
    in_specs = [
        pl.BlockSpec((b, hidden), const2, memory_space=pltpu.VMEM),    # g
        pl.BlockSpec((tb, b, c_in), rev3, memory_space=pltpu.VMEM),    # x
        pl.BlockSpec((n_layers, tb, b, hidden), rev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((n_layers, tb, b, hidden), prev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((n_layers, tb, b, hidden), rev4, memory_space=pltpu.VMEM),
        pl.BlockSpec((n_layers, tb, b, hidden), prev4, memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (c_in + hidden, g4), const2, memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (max(n_layers - 1, 1), 2 * hidden, g4), const3,
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((n_layers, g4), const2, memory_space=pltpu.VMEM),  # b
    ]
    if has_masks:
        in_specs.append(
            pl.BlockSpec(
                (n_layers - 1, tb, b, hidden), lambda s: (0, nb - 1 - s, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    out_specs = [
        pl.BlockSpec((tb, b, c_in), rev3, memory_space=pltpu.VMEM),    # dx
        pl.BlockSpec(
            (c_in + hidden, g4), const2, memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (max(n_layers - 1, 1), 2 * hidden, g4), const3,
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((n_layers, g4), const2, memory_space=pltpu.VMEM),  # db
    ]
    kernel = (
        functools.partial(
            _bwd_kernel_m, n_layers=n_layers, hidden=hidden, c_in=c_in,
            has_masks=True, compute_dtype=compute_dtype, t_len=t, keep=keep,
            pipe=_pick_pipe(b), tb=tb,
        )
        if has_masks
        else functools.partial(
            _bwd_kernel_m_nomask, n_layers=n_layers, hidden=hidden,
            c_in=c_in, compute_dtype=compute_dtype, t_len=t,
            pipe=_pick_pipe(b), tb=tb,
        )
    )
    args = [g, x, h_all, h_all, c_all, c_all, wcat0, wcatr, b2d]
    if has_masks:
        args.append(masks)
    vma = _join_vma(*args)
    dx, dwcat0, dwcatr, db = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((t, b, c_in), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((c_in + hidden, g4), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct(
                (max(n_layers - 1, 1), 2 * hidden, g4), jnp.float32, vma=vma
            ),
            jax.ShapeDtypeStruct((n_layers, g4), jnp.float32, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_layers, b, hidden), jnp.float32),
            pltpu.VMEM((n_layers, b, hidden), jnp.float32),
        ],
        compiler_params=_compiler_params(interpret, 64),
        interpret=interpret,
    )(*args)
    return dx, dwcat0, dwcatr, db


# ---------------------------------------------------------------------------
# V-batched merged kernels: vmap folds INTO the kernel, not onto the grid
# ---------------------------------------------------------------------------
#
# jax.vmap of a pallas_call prepends a grid dimension, so the MAML task-vmap
# (train/maml.py) runs V complete kernel instances BACK TO BACK — V
# independent recurrent chains serialized, each leaving the MXU half-idle on
# its latency-bound [B, C+H] @ [C+H, 4H] chain. These kernels take the task
# axis V explicitly and issue the V independent contractions adjacently at
# every (t, l), so one chain's gate math and weight loads hide under
# another's dot. Wired in through jax.custom_batching.custom_vmap beneath
# the custom VJP (custom_vjp outside, per the JAX composition rule), so any
# vmap over the stack — tasks in the meta loop, windows in the adaptation
# batch — lands here automatically; oversized V falls back to the old
# grid-serialized behavior under a VMEM guard.


def _fwd_kernel_mv(x_ref, wcat0_ref, wcatr_ref, b_ref, m_ref,
                   h_out_ref, c_out_ref, h_last_ref, h_scr, c_scr,
                   *, n_tasks, n_layers, hidden, has_masks, compute_dtype,
                   keep=1.0):
    t = pl.program_id(0)
    res_dtype = h_out_ref.dtype

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    inv_keep = 1.0 / keep if has_masks else 1.0
    inps = [x_ref[v, 0].astype(compute_dtype) for v in range(n_tasks)]
    for l in range(n_layers):
        # All V dots first (independent — the MXU pipelines across tasks),
        # elementwise gate math after.
        gates_v = []
        for v in range(n_tasks):
            w = (
                wcat0_ref[v] if l == 0 else wcatr_ref[v, l - 1]
            ).astype(compute_dtype)
            xh = jnp.concatenate(
                [inps[v], h_scr[v, l].astype(compute_dtype)], axis=1
            )
            gates_v.append(
                jnp.dot(xh, w, preferred_element_type=jnp.float32)
                + b_ref[v, pl.ds(l, 1), :]
            )
        for v in range(n_tasks):
            gates = gates_v[v]
            i = _sigmoid(gates[:, :hidden])
            f = _sigmoid(gates[:, hidden:2 * hidden])
            g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
            o = _sigmoid(gates[:, 3 * hidden:])
            c = f * c_scr[v, l] + i * g
            h = o * jnp.tanh(c)
            h_scr[v, l] = h
            c_scr[v, l] = c
            h_out_ref[v, l, 0] = h.astype(res_dtype)
            c_out_ref[v, l, 0] = c.astype(res_dtype)
            if l == n_layers - 1:
                h_last_ref[v] = h
            if l < n_layers - 1:
                nxt = h
                if has_masks:
                    nxt = nxt * (
                        m_ref[v, l, 0].astype(jnp.float32) * inv_keep
                    )
                inps[v] = nxt.astype(compute_dtype)


def _bwd_kernel_mv(g_ref, x_ref, h_all_ref, h_prev_ref, c_all_ref,
                   c_prev_ref, wcat0_ref, wcatr_ref, b_ref, m_ref,
                   dx_ref, dwcat0_ref, dwcatr_ref, db_ref,
                   dh_scr, dc_scr,
                   *, n_tasks, n_layers, hidden, c_in, has_masks,
                   compute_dtype, t_len, keep=1.0):
    s = pl.program_id(0)  # time index is T-1-s via the index maps
    inv_keep = 1.0 / keep if has_masks else 1.0

    @pl.when(s == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    at_t0 = s == t_len - 1
    g_in = jnp.where(s == 0, g_ref[:], jnp.zeros_like(g_ref[:]))  # [V, B, H]

    d_above = [None] * n_tasks
    for l in range(n_layers - 1, -1, -1):
        cw = c_in if l == 0 else hidden
        # Recompute dots for all V chains back-to-back.
        xh_v, w_v, gates_v = [], [], []
        for v in range(n_tasks):
            h_prev = jnp.where(
                at_t0,
                jnp.zeros((), jnp.float32),
                h_prev_ref[v, l, 0].astype(jnp.float32),
            )
            if l == 0:
                inp = x_ref[v, 0].astype(compute_dtype)
                w = wcat0_ref[v].astype(compute_dtype)
            else:
                inp = h_all_ref[v, l - 1, 0]
                if has_masks:
                    inp = inp.astype(jnp.float32) * (
                        m_ref[v, l - 1, 0].astype(jnp.float32) * inv_keep
                    )
                inp = inp.astype(compute_dtype)
                w = wcatr_ref[v, l - 1].astype(compute_dtype)
            xh = jnp.concatenate([inp, h_prev.astype(compute_dtype)], axis=1)
            gates_v.append(
                jnp.dot(xh, w, preferred_element_type=jnp.float32)
                + b_ref[v, pl.ds(l, 1), :]
            )
            xh_v.append(xh)
            w_v.append(w)
        # Elementwise gate gradients per chain.
        dgates_v = []
        for v in range(n_tasks):
            gates = gates_v[v]
            i = _sigmoid(gates[:, :hidden])
            f = _sigmoid(gates[:, hidden:2 * hidden])
            g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
            o = _sigmoid(gates[:, 3 * hidden:])
            c_prev = jnp.where(
                at_t0,
                jnp.zeros((), jnp.float32),
                c_prev_ref[v, l, 0].astype(jnp.float32),
            )
            tc = jnp.tanh(c_all_ref[v, l, 0].astype(jnp.float32))
            dh = dh_scr[v, l]
            if l == n_layers - 1:
                dh = dh + g_in[v]
            if d_above[v] is not None:
                dh = dh + d_above[v]
            dc = dc_scr[v, l] + dh * o * (1.0 - tc * tc)
            do_pre = dh * tc * o * (1.0 - o)
            di_pre = dc * g * i * (1.0 - i)
            df_pre = dc * c_prev * f * (1.0 - f)
            dg_pre = dc * i * (1.0 - g * g)
            dgates = jnp.concatenate(
                [di_pre, df_pre, dg_pre, do_pre], axis=-1
            )
            dgates_v.append((dgates, dgates.astype(compute_dtype), dc * f))
        # Input-gradient dots, adjacently.
        for v in range(n_tasks):
            _, dgates_c, dcf = dgates_v[v]
            dxh = jax.lax.dot_general(
                dgates_c, w_v[v], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d_in = dxh[:, :cw]
            dh_scr[v, l] = dxh[:, cw:]
            dc_scr[v, l] = dcf
            if l == 0:
                dx_ref[v, 0] = d_in.astype(dx_ref.dtype)
                d_above[v] = None
            else:
                if has_masks:
                    d_in = d_in * (
                        m_ref[v, l - 1, 0].astype(jnp.float32) * inv_keep
                    )
                d_above[v] = d_in
        # Weight/bias gradients, accumulated across the revisited blocks.
        for v in range(n_tasks):
            dgates, dgates_c, _ = dgates_v[v]
            dwcat_upd = jax.lax.dot_general(
                xh_v[v], dgates_c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            db_upd = jnp.sum(dgates, axis=0, keepdims=True)
            if l == 0:
                @pl.when(s == 0)
                def _(v=v, u=dwcat_upd):
                    dwcat0_ref[v] = u

                @pl.when(s > 0)
                def _(v=v, u=dwcat_upd):
                    dwcat0_ref[v] = dwcat0_ref[v] + u
            else:
                @pl.when(s == 0)
                def _(v=v, l=l, u=dwcat_upd):
                    dwcatr_ref[v, l - 1] = u

                @pl.when(s > 0)
                def _(v=v, l=l, u=dwcat_upd):
                    dwcatr_ref[v, l - 1] = dwcatr_ref[v, l - 1] + u

            @pl.when(s == 0)
            def _(v=v, l=l, u=db_upd):
                db_ref[v, pl.ds(l, 1), :] = u

            @pl.when(s > 0)
            def _(v=v, l=l, u=db_upd):
                db_ref[v, pl.ds(l, 1), :] = db_ref[v, pl.ds(l, 1), :] + u

    if n_layers == 1:
        @pl.when(s == 0)
        def _():
            dwcatr_ref[:] = jnp.zeros_like(dwcatr_ref)


def _fwd_kernel_mv_nomask(x_ref, wcat0_ref, wcatr_ref, b_ref,
                          h_out_ref, c_out_ref, h_last_ref, h_scr, c_scr,
                          *, n_tasks, n_layers, hidden, compute_dtype):
    _fwd_kernel_mv(
        x_ref, wcat0_ref, wcatr_ref, b_ref, None,
        h_out_ref, c_out_ref, h_last_ref, h_scr, c_scr,
        n_tasks=n_tasks, n_layers=n_layers, hidden=hidden, has_masks=False,
        compute_dtype=compute_dtype,
    )


def _bwd_kernel_mv_nomask(g_ref, x_ref, h_all_ref, h_prev_ref, c_all_ref,
                          c_prev_ref, wcat0_ref, wcatr_ref, b_ref,
                          dx_ref, dwcat0_ref, dwcatr_ref, db_ref,
                          dh_scr, dc_scr,
                          *, n_tasks, n_layers, hidden, c_in, compute_dtype,
                          t_len):
    _bwd_kernel_mv(
        g_ref, x_ref, h_all_ref, h_prev_ref, c_all_ref, c_prev_ref,
        wcat0_ref, wcatr_ref, b_ref, None,
        dx_ref, dwcat0_ref, dwcatr_ref, db_ref, dh_scr, dc_scr,
        n_tasks=n_tasks, n_layers=n_layers, hidden=hidden, c_in=c_in,
        has_masks=False, compute_dtype=compute_dtype, t_len=t_len,
    )


def _fwd_pallas_mv(x, wcat0, wcatr, b2d, masks, compute_dtype, interpret,
                   keep=1.0):
    nv, t, b, c_in = x.shape
    n_layers, g4 = b2d.shape[1], b2d.shape[2]
    hidden = g4 // 4
    has_masks = masks is not None
    lr = max(n_layers - 1, 1)
    in_specs = [
        pl.BlockSpec(
            (nv, 1, b, c_in), lambda s: (0, s, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (nv, c_in + hidden, g4), lambda s: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (nv, lr, 2 * hidden, g4), lambda s: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (nv, n_layers, g4), lambda s: (0, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    if has_masks:
        in_specs.append(
            pl.BlockSpec(
                (nv, n_layers - 1, 1, b, hidden),
                lambda s: (0, 0, s, 0, 0), memory_space=pltpu.VMEM,
            )
        )
    out_specs = [
        pl.BlockSpec(
            (nv, n_layers, 1, b, hidden), lambda s: (0, 0, s, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (nv, n_layers, 1, b, hidden), lambda s: (0, 0, s, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (nv, b, hidden), lambda s: (0, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    kernel = (
        functools.partial(
            _fwd_kernel_mv, n_tasks=nv, n_layers=n_layers, hidden=hidden,
            has_masks=True, compute_dtype=compute_dtype, keep=keep,
        )
        if has_masks
        else functools.partial(
            _fwd_kernel_mv_nomask, n_tasks=nv, n_layers=n_layers,
            hidden=hidden, compute_dtype=compute_dtype,
        )
    )
    args = [x, wcat0, wcatr, b2d] + ([masks] if has_masks else [])
    vma = _join_vma(*args)
    rd = _res_dtype(compute_dtype)
    h_all, c_all, h_last = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nv, n_layers, t, b, hidden), rd, vma=vma),
            jax.ShapeDtypeStruct((nv, n_layers, t, b, hidden), rd, vma=vma),
            jax.ShapeDtypeStruct((nv, b, hidden), jnp.float32, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((nv, n_layers, b, hidden), jnp.float32),
            pltpu.VMEM((nv, n_layers, b, hidden), jnp.float32),
        ],
        compiler_params=_compiler_params(interpret, min(112, 24 + 28 * nv)),
        interpret=interpret,
    )(*args)
    return h_all, c_all, h_last


def _bwd_pallas_mv(g, x, h_all, c_all, wcat0, wcatr, b2d, masks,
                   compute_dtype, interpret, keep=1.0):
    nv, t, b, c_in = x.shape
    n_layers, g4 = b2d.shape[1], b2d.shape[2]
    hidden = g4 // 4
    has_masks = masks is not None
    lr = max(n_layers - 1, 1)
    rev4 = lambda s: (0, t - 1 - s, 0, 0)
    rev5 = lambda s: (0, 0, t - 1 - s, 0, 0)
    prev5 = lambda s: (0, 0, jnp.maximum(t - 2 - s, 0), 0, 0)
    const3 = lambda s: (0, 0, 0)
    const4 = lambda s: (0, 0, 0, 0)
    in_specs = [
        pl.BlockSpec((nv, b, hidden), const3, memory_space=pltpu.VMEM),  # g
        pl.BlockSpec((nv, 1, b, c_in), rev4, memory_space=pltpu.VMEM),   # x
        pl.BlockSpec(
            (nv, n_layers, 1, b, hidden), rev5, memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (nv, n_layers, 1, b, hidden), prev5, memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (nv, n_layers, 1, b, hidden), rev5, memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (nv, n_layers, 1, b, hidden), prev5, memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (nv, c_in + hidden, g4), const3, memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (nv, lr, 2 * hidden, g4), const4, memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((nv, n_layers, g4), const3, memory_space=pltpu.VMEM),
    ]
    if has_masks:
        in_specs.append(
            pl.BlockSpec(
                (nv, n_layers - 1, 1, b, hidden),
                lambda s: (0, 0, t - 1 - s, 0, 0), memory_space=pltpu.VMEM,
            )
        )
    out_specs = [
        pl.BlockSpec((nv, 1, b, c_in), rev4, memory_space=pltpu.VMEM),   # dx
        pl.BlockSpec(
            (nv, c_in + hidden, g4), const3, memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (nv, lr, 2 * hidden, g4), const4, memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((nv, n_layers, g4), const3, memory_space=pltpu.VMEM),
    ]
    kernel = (
        functools.partial(
            _bwd_kernel_mv, n_tasks=nv, n_layers=n_layers, hidden=hidden,
            c_in=c_in, has_masks=True, compute_dtype=compute_dtype,
            t_len=t, keep=keep,
        )
        if has_masks
        else functools.partial(
            _bwd_kernel_mv_nomask, n_tasks=nv, n_layers=n_layers,
            hidden=hidden, c_in=c_in, compute_dtype=compute_dtype, t_len=t,
        )
    )
    args = [g, x, h_all, h_all, c_all, c_all, wcat0, wcatr, b2d]
    if has_masks:
        args.append(masks)
    vma = _join_vma(*args)
    dx, dwcat0, dwcatr, db = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nv, t, b, c_in), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((nv, c_in + hidden, g4), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((nv, lr, 2 * hidden, g4), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((nv, n_layers, g4), jnp.float32, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((nv, n_layers, b, hidden), jnp.float32),
            pltpu.VMEM((nv, n_layers, b, hidden), jnp.float32),
        ],
        compiler_params=_compiler_params(interpret, min(120, 32 + 40 * nv)),
        interpret=interpret,
    )(*args)
    return dx, dwcat0, dwcatr, db


def vbatch_supported(nv: int, t: int, b: int, c_in: int, hidden: int,
                     n_layers: int) -> bool:
    """Can V chains fold into one kernel instance within the VMEM budget?

    Past this, the custom_vmap rules fall back to jax.vmap of the
    single-task kernel (pallas's default grid-serialized batching).
    """
    g4 = 4 * hidden
    weights = nv * ((c_in + hidden) * g4 + (n_layers - 1) * 2 * hidden * g4
                    + n_layers * g4) * 4
    streamed = nv * b * (c_in + hidden * (4 + n_layers - 1) + hidden
                         + c_in) * 4
    accum = weights
    scratch = 2 * nv * n_layers * b * hidden * 4
    return 2 * streamed + weights + accum + scratch <= 2 * _VMEM_BUDGET_BYTES


def _vbcast(axis_size, in_batched, args):
    flat = []
    for a, batched in zip(args, in_batched):
        flat.append(
            a if batched
            else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
        )
    return flat


@functools.lru_cache(maxsize=64)
def _merged_stack_fn(dtype_str, interpret, keep, has_masks):
    """custom_vjp(custom_vmap(...)) wiring for the merged stack kernel.

    Cached per (dtype, interpret, keep, has_masks) so jit retracing reuses
    one function identity. The custom_vjp must wrap the custom_vmap'd
    calls (JAX composition rule); vmap of this function therefore batches
    the fwd/bwd bodies, whose pallas calls the custom_vmap rules intercept
    and route to the V-batched kernels.
    """
    compute_dtype = jnp.dtype(dtype_str)

    from jax.custom_batching import custom_vmap

    @custom_vmap
    def fwd_call(*args):
        x, wcat0, wcatr, b2d = args[:4]
        masks = args[4] if has_masks else None
        return _fwd_pallas_m(
            x, wcat0, wcatr, b2d, masks, compute_dtype, interpret, keep
        )

    @fwd_call.def_vmap
    def _fwd_rule(axis_size, in_batched, *args):
        weights_batched = in_batched[1] or in_batched[2] or in_batched[3]
        bargs = _vbcast(axis_size, in_batched, args)
        x = bargs[0]
        nv, t, b, c_in = x.shape
        n_layers, g4 = args[3].shape[-2], args[3].shape[-1]
        hidden = g4 // 4
        masks = bargs[4] if has_masks else None
        if _ROWFOLD and not weights_batched and stack_supported(
            t, nv * b, c_in, hidden, n_layers,
            itemsize=compute_dtype.itemsize,
        ):
            # SHARED weights (adaptation window batch): fold the chains into
            # the row dimension — half the dependent dots at double width,
            # the one fold that genuinely reduces MXU pipeline-latency share
            # (benchmarks/roofline_r3.md). Exact: rows are independent.
            xf = jnp.moveaxis(x, 0, 1).reshape(t, nv * b, c_in)
            mf = None
            if has_masks:
                # [V, L-1, T, B, H] -> [L-1, T, V*B, H]
                mf = jnp.moveaxis(masks, 0, 2).reshape(
                    n_layers - 1, t, nv * b, hidden
                )
            h_all, c_all, h_last = _fwd_pallas_m(
                xf, args[1], args[2], args[3], mf, compute_dtype,
                interpret, keep,
            )
            # Back to batched layout (bwd re-folds; XLA cancels the pair
            # for the residuals).
            h_all = jnp.moveaxis(
                h_all.reshape(n_layers, t, nv, b, hidden), 2, 0
            )
            c_all = jnp.moveaxis(
                c_all.reshape(n_layers, t, nv, b, hidden), 2, 0
            )
            outs = (h_all, c_all, h_last.reshape(nv, b, hidden))
        elif _VBATCH and vbatch_supported(nv, t, b, c_in, hidden, n_layers):
            outs = _fwd_pallas_mv(
                x, bargs[1], bargs[2], bargs[3], masks, compute_dtype,
                interpret, keep,
            )
        else:
            outs = jax.vmap(
                lambda *a: _fwd_pallas_m(
                    *a[:4], a[4] if has_masks else None, compute_dtype,
                    interpret, keep,
                )
            )(*bargs)
        return outs, (True, True, True)

    @custom_vmap
    def fwd_last_call(*args):
        # No-grad primal: last hidden only, no residual streams.
        x, wcat0, wcatr, b2d = args[:4]
        masks = args[4] if has_masks else None
        return _fwd_pallas_m(
            x, wcat0, wcatr, b2d, masks, compute_dtype, interpret, keep,
            emit_residuals=False,
        )

    @fwd_last_call.def_vmap
    def _fwd_last_rule(axis_size, in_batched, *args):
        # Eval batching: plain grid-serialized vmap of the lastonly kernel
        # (the rowfold/V-batch folds only matter for training throughput).
        bargs = _vbcast(axis_size, in_batched, args)
        out = jax.vmap(
            lambda *a: _fwd_pallas_m(
                *a[:4], a[4] if has_masks else None, compute_dtype,
                interpret, keep, emit_residuals=False,
            )
        )(*bargs)
        return out, True

    @custom_vmap
    def bwd_call(*args):
        g, x, h_all, c_all, wcat0, wcatr, b2d = args[:7]
        masks = args[7] if has_masks else None
        return _bwd_pallas_m(
            g, x, h_all, c_all, wcat0, wcatr, b2d, masks, compute_dtype,
            interpret, keep,
        )

    @bwd_call.def_vmap
    def _bwd_rule(axis_size, in_batched, *args):
        weights_batched = in_batched[4] or in_batched[5] or in_batched[6]
        bargs = _vbcast(axis_size, in_batched, args)
        x = bargs[1]
        nv, t, b, c_in = x.shape
        n_layers, g4 = args[6].shape[-2], args[6].shape[-1]
        hidden = g4 // 4
        masks = bargs[7] if has_masks else None
        if _ROWFOLD and not weights_batched and stack_supported(
            t, nv * b, c_in, hidden, n_layers,
            itemsize=compute_dtype.itemsize,
        ):
            # Shared weights: row-fold, mirroring the fwd rule. dwcat/db
            # come out already summed over every row — i.e. over the chain
            # axis — which is exactly the unbatched-primal cotangent.
            gf = bargs[0].reshape(nv * b, hidden)
            xf = jnp.moveaxis(x, 0, 1).reshape(t, nv * b, c_in)
            h_f = jnp.moveaxis(bargs[2], 0, 2).reshape(
                n_layers, t, nv * b, hidden
            )
            c_f = jnp.moveaxis(bargs[3], 0, 2).reshape(
                n_layers, t, nv * b, hidden
            )
            mf = None
            if has_masks:
                mf = jnp.moveaxis(masks, 0, 2).reshape(
                    n_layers - 1, t, nv * b, hidden
                )
            dx, dwcat0, dwcatr, db = _bwd_pallas_m(
                gf, xf, h_f, c_f, args[4], args[5], args[6], mf,
                compute_dtype, interpret, keep,
            )
            dx = jnp.moveaxis(dx.reshape(t, nv, b, c_in), 1, 0)
            if not in_batched[1]:
                # x unbatched too: its cotangent sums over the lanes.
                dx = dx.sum(axis=0)
            # dwcat/db are already the sum over every row (= over lanes),
            # exactly the unbatched-primal cotangent; weights are
            # guaranteed unbatched in this branch.
            return (
                (dx, dwcat0, dwcatr, db),
                (in_batched[1], False, False, False),
            )
        if _VBATCH and vbatch_supported(nv, t, b, c_in, hidden, n_layers):
            dx, dwcat0, dwcatr, db = _bwd_pallas_mv(
                bargs[0], x, bargs[2], bargs[3], bargs[4], bargs[5],
                bargs[6], masks, compute_dtype, interpret, keep,
            )
        else:
            dx, dwcat0, dwcatr, db = jax.vmap(
                lambda *a: _bwd_pallas_m(
                    *a[:7], a[7] if has_masks else None, compute_dtype,
                    interpret, keep,
                )
            )(*bargs)
        # Cotangents of unbatched primals (shared weights under a window
        # vmap) must come back unbatched: sum over the chain axis, exactly
        # what the transpose of the broadcast would do.
        outs, outs_b = [], []
        for cot, primal_batched in zip(
            (dx, dwcat0, dwcatr, db),
            (in_batched[1], in_batched[4], in_batched[5], in_batched[6]),
        ):
            if primal_batched:
                outs.append(cot)
                outs_b.append(True)
            else:
                outs.append(cot.sum(axis=0))
                outs_b.append(False)
        return tuple(outs), tuple(outs_b)

    @jax.custom_vjp
    def stack(*args):
        # Primal-only evaluation (no grad taken anywhere): custom_vjp calls
        # THIS body, not stack_fwd — so eval/serving runs the lastonly
        # kernel and never streams h/c residuals to HBM.
        return fwd_last_call(*args)

    def stack_fwd(*args):
        h_all, c_all, h_last = fwd_call(*args)
        return h_last, (args, h_all, c_all)

    def stack_bwd(res, g):
        args, h_all, c_all = res
        x, wcat0, wcatr, b2d = args[:4]
        masks = args[4] if has_masks else None
        bwd_args = [g, x, h_all, c_all, wcat0, wcatr, b2d]
        if has_masks:
            bwd_args.append(masks)
        dx, dwcat0, dwcatr, db = bwd_call(*bwd_args)
        grads = (
            dx.astype(x.dtype),
            dwcat0.astype(wcat0.dtype),
            dwcatr.astype(wcatr.dtype),
            db.astype(b2d.dtype),
        )
        if has_masks:
            grads = grads + (np.zeros(masks.shape, dtype=jax.dtypes.float0),)
        return grads

    stack.defvjp(stack_fwd, stack_bwd)
    return stack


# ---------------------------------------------------------------------------
# Custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _stack_pallas(x, wx0, wxr, wh, b2d, compute_dtype, interpret, keep, masks):
    _, _, h_last = _fwd_pallas(
        x, wx0, wxr, wh, b2d, masks, compute_dtype, interpret, keep
    )
    return h_last  # [B, H] top layer at the last timestep (f32)


def _stack_fwd(x, wx0, wxr, wh, b2d, compute_dtype, interpret, keep, masks):
    h_all, c_all, h_last = _fwd_pallas(
        x, wx0, wxr, wh, b2d, masks, compute_dtype, interpret, keep
    )
    return h_last, (x, wx0, wxr, wh, b2d, masks, h_all, c_all)


def _stack_bwd(compute_dtype, interpret, keep, res, g):
    x, wx0, wxr, wh, b2d, masks, h_all, c_all = res
    dx, dwx0, dwxr, dwh, db = _bwd_pallas(
        g, x, h_all, c_all, wx0, wxr, wh, b2d, masks, compute_dtype, interpret,
        keep,
    )
    # Cotangent dtypes must match the primals'.
    dx = dx.astype(x.dtype)
    dwx0 = dwx0.astype(wx0.dtype)
    dwxr = dwxr.astype(wxr.dtype)
    dwh = dwh.astype(wh.dtype)
    db = db.astype(b2d.dtype)
    # Masks are non-differentiable sampling artifacts; their integer primal
    # takes a float0 cotangent (matches XLA-path dropout, where the mask is
    # a constant of the trace).
    dmasks = (
        None if masks is None
        else np.zeros(masks.shape, dtype=jax.dtypes.float0)
    )
    return dx, dwx0, dwxr, dwh, db, dmasks


_stack_pallas.defvjp(_stack_fwd, _stack_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def stack_supported(t: int, b: int, c_in: int, hidden: int, n_layers: int,
                    itemsize: int = 4) -> bool:
    if not _HAVE_PALLAS:
        return False
    if hidden % 128 or b % 8 or t < 1 or n_layers < 1:
        return False
    if c_in % 128:
        return False
    g4 = 4 * hidden
    weights = (c_in * g4 + (2 * n_layers - 1) * hidden * g4 + n_layers * g4) * 4
    # Backward peak: 6 streamed [*, b, hidden]-ish blocks double-buffered,
    # plus dx block, plus weight-grad accumulators resident. The streamed
    # blocks (x, h/c residuals, g, dx) are stored at compute precision
    # (_res_dtype) — `itemsize` makes the gate ~2x less conservative under
    # bf16; weight blocks, accumulators, and scratch stay f32.
    streamed = b * (c_in + hidden * (4 + n_layers - 1) + hidden + c_in) * itemsize
    accum = weights  # same shapes as the weights
    scratch = 2 * n_layers * b * hidden * 4
    return 2 * streamed + weights + accum + scratch <= _VMEM_BUDGET_BYTES


def stack_chunk_size(t: int, b: int, c_in: int, hidden: int, n_layers: int,
                     itemsize: int = 4, min_chunk: int = 512) -> int | None:
    """Largest batch-chunk size that fits the stack kernel's VMEM gate.

    LSTM batch rows are independent, so a batch too wide for one kernel
    instance (stack_supported False — e.g. 8-window x 4096-node supervised
    steps put B = 32768 rows through the recurrence) can run the fused
    stack in B/chunk sequential slices instead of falling back to the XLA
    scan, which measured 12x over the LSTM FLOP floor at that width
    (HBM-bound elementwise traffic the kernel keeps in VMEM;
    benchmarks/large_node_decomp_probe.json).

    Returns b itself when unchunked fits, the largest fitting divisor of b
    that is a multiple of 8 and >= min_chunk otherwise, or None (chunks
    below min_chunk forfeit the MXU efficiency that motivates the kernel —
    route XLA instead). All divisors are searched (descending), not just
    b/2^k halvings, so e.g. b = 3*2^k batches still find a fused route.
    """
    if stack_supported(t, b, c_in, hidden, n_layers, itemsize):
        return b
    # Divisors of b, largest first. b is at most a few hundred thousand
    # rows (windows x padded nodes), so trial division at trace time is
    # free relative to one XLA compile.
    divisors: list[int] = []
    d = 1
    while d * d <= b:
        if b % d == 0:
            divisors.extend((d, b // d))
        d += 1
    for bc in sorted(set(divisors), reverse=True):
        if bc >= b or bc < min_chunk or bc % 8:
            continue
        if stack_supported(t, bc, c_in, hidden, n_layers, itemsize):
            return bc
    return None


def lstm_stack_last_all_chunked(
    params,
    x,
    chunk: int,
    *,
    dropout_rate: float = 0.0,
    train: bool = False,
    rng=None,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    merged: bool | None = None,
):
    """Fused stack over a batch too wide for one kernel instance.

    Splits x [B, T, C] into B/chunk row slices and runs the fused stack
    per slice. Rows are independent in an LSTM, so this is exact; dropout
    masks are drawn ONCE for the full batch from the same fold_in(rng, l)
    streams as the unchunked/XLA paths and sliced per chunk, so train-mode
    numerics stay bit-identical to both. Weight gradients sum across
    chunks through the custom VJP (plain autodiff of the Python loop).
    """
    b, t, _ = x.shape
    if b % chunk:
        raise ValueError(f"batch {b} not divisible by chunk {chunk}")
    layers = params["layers"]
    n_layers = len(layers)
    hidden = layers[0]["wh"].shape[0]
    masks = None
    if train and dropout_rate > 0.0 and rng is not None and n_layers > 1:
        keep = 1.0 - dropout_rate
        masks = jnp.stack([
            jax.random.bernoulli(
                jax.random.fold_in(rng, l), keep, (t, b, hidden)
            )
            for l in range(n_layers - 1)
        ]).astype(jnp.int8)  # [L-1, T, B, H]
    outs = []
    for i in range(b // chunk):
        sl = slice(i * chunk, (i + 1) * chunk)
        outs.append(lstm_stack_last_all(
            params, x[sl],
            dropout_rate=dropout_rate, train=train, rng=None,
            compute_dtype=compute_dtype, interpret=interpret, merged=merged,
            masks=None if masks is None else masks[:, :, sl],
        ))
    return jnp.concatenate(outs, axis=0)  # [B, H]


def lstm_stack_last_all(
    params,
    x,
    *,
    dropout_rate: float = 0.0,
    train: bool = False,
    rng=None,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    merged: bool | None = None,
    masks=None,
):
    """Run the whole stacked LSTM fused: x [B, T, C] -> h_top [B, H].

    Matches `models.lstm.apply_lstm` exactly, including torch-style
    inter-layer dropout (masks drawn from the same fold_in(rng, l) streams,
    so train-mode numerics are bit-comparable to the XLA path).

    `merged` selects the merged-gates kernels (default `_MERGED_GATES`):
    per-layer weights concatenate to [[wx], [wh]] so each step runs one
    [B, C+H] contraction; the weight-grad split back to (dwx, dwh) is the
    XLA transpose of that concatenation.

    `masks` optionally supplies precomputed int8 {0,1} dropout masks
    [L-1, T, B, H] (time-major) instead of drawing them from `rng` — the
    batch-chunked route (lstm_stack_last_all_chunked) uses this to draw
    ONE full-batch mask per layer and slice it per chunk, keeping chunked
    numerics bit-identical to the unchunked/XLA paths. `dropout_rate`
    still supplies the 1/keep scale folded into the kernel.
    """
    layers = params["layers"]
    n_layers = len(layers)
    hidden = layers[0]["wh"].shape[0]
    x_tbc = jnp.swapaxes(x, 0, 1)  # [T, B, C]
    t, b, c_in = x_tbc.shape
    if merged is None:
        merged = _MERGED_GATES

    b2d = jnp.stack([lstm_bias(layers[l]) for l in range(n_layers)])

    keep = 1.0
    if masks is not None:
        if n_layers <= 1 or dropout_rate <= 0.0:
            raise ValueError(
                "precomputed masks require n_layers > 1 and dropout_rate > 0"
            )
        keep = 1.0 - dropout_rate
        masks = masks.astype(jnp.int8)  # [L-1, T, B, H]
    elif train and dropout_rate > 0.0 and rng is not None and n_layers > 1:
        keep = 1.0 - dropout_rate
        # int8 {0, 1} — a quarter of the f32 bytes in HBM (the mask stream
        # is written once by the bernoulli and read by BOTH kernel passes);
        # the 1/keep scale folds into the kernel, where (m * f32(1/keep)) is
        # exact for m in {0, 1} so numerics are unchanged vs pre-scaled f32.
        masks = jnp.stack([
            jax.random.bernoulli(
                jax.random.fold_in(rng, l), keep, (t, b, hidden)
            )
            for l in range(n_layers - 1)
        ]).astype(jnp.int8)  # [L-1, T, B, H]

    if merged:
        wcat0 = jnp.concatenate([layers[0]["wx"], layers[0]["wh"]], axis=0)
        if n_layers > 1:
            wcatr = jnp.stack([
                jnp.concatenate([layers[l]["wx"], layers[l]["wh"]], axis=0)
                for l in range(1, n_layers)
            ])
        else:
            wcatr = jnp.zeros((1, 2 * hidden, 4 * hidden), wcat0.dtype)
        # Always go through the custom_vmap-wired function: unbatched
        # calls run the plain merged kernel; vmapped calls route per the
        # _ROWFOLD/_VBATCH flags above (default: grid-serialized).
        fn = _merged_stack_fn(
            jnp.dtype(compute_dtype).name,
            bool(interpret or _FORCE_INTERPRET),
            float(keep), masks is not None,
        )
        args = (x_tbc, wcat0, wcatr, b2d)
        if masks is not None:
            args = args + (masks,)
        return fn(*args)  # [B, H] last timestep

    wx0 = layers[0]["wx"]
    if n_layers > 1:
        wxr = jnp.stack([layers[l]["wx"] for l in range(1, n_layers)])
    else:
        wxr = jnp.zeros((1, hidden, 4 * hidden), wx0.dtype)
    wh = jnp.stack([layers[l]["wh"] for l in range(n_layers)])

    return _stack_pallas(
        x_tbc, wx0, wxr, wh, b2d, compute_dtype,
        interpret or _FORCE_INTERPRET, keep, masks,
    )  # [B, H] last timestep
