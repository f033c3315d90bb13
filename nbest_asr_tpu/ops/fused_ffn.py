"""Fused FFN-block Pallas megakernel: GEMM → bias → erf-GELU → dropout
→ GEMM → bias → dropout → residual → LayerNorm, one kernel each way.

Why this exists (NOTES_r2.md MFU analysis, measured at the dominant
DSTC2 bucket 128×64 on v5e): the encoder's GEMMs run at 76% MFU but the
*inter-GEMM elementwise chains* cost ~23 ms of a 71 ms step — XLA
schedules them as separate f32 round-trips.  Piecewise Pallas kernels
(fused LN alone, bias-GELU alone) made it *worse* because they broke
XLA's surrounding fusions while leaving the GEMMs outside.  This kernel
absorbs the whole FFN block **including both GEMMs**, so every
elementwise op runs on VMEM-resident tiles between the two dots and
nothing is left for XLA to schedule badly.

Blocking: grid (row-blocks, inter-blocks).  In bf16 — the production
dtype — BOTH weight matrices (9.4 MB at BERT size) are grid-constant
VMEM residents fetched from HBM exactly once per kernel launch (a
single inter block); with f32 weights (18.9 MB, over the 16 MB VMEM)
the intermediate dimension streams through in ``(h, IT)`` slices, the
second GEMM accumulating into an f32 scratch.  The first version of
this kernel streamed slices for bf16 too and was 3–5% *slower* than
XLA end to end: with rows as the major grid axis the weight slices
re-fetch for every row block (~600 MB/layer of weight DMA).  Weight
residency flipped it to ~4% *faster* at every bucket.

Dropout uses the same regenerable per-tile on-chip PRNG masks as
`flash_attention` (`_keep_mask`): forward and backward reseed
identically, so no mask ever exists in HBM.

Backward: the forward additionally saves ``y2d`` (the post-dropout
second-GEMM output, (n, h)) and the LN stats; the backward kernel then
needs ONE sweep — it derives the LN/residual gradients row-locally,
streams the same weight slices to produce dx, and emits the
intermediate tiles (dh, gd, dy2, xhat) that the weight/bias/LN-param
gradients need.  Those are plain reductions that XLA already runs at
full rate (and their f32 accumulators wouldn't fit VMEM), so they stay
in XLA.

The XLA path in `models/encoder.py` remains the correctness oracle;
wired behind ``EncoderConfig.use_fused_ffn``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_gelu import _erf, _INV_SQRT2, _INV_SQRT2PI
from .flash_attention import _keep_mask
from .fused_attention import KERNEL_VMEM_LIMIT

BLOCK_ROWS = 128
BLOCK_INTER = 768
LANES = 128


def _block_rows(dtype, bwd: bool) -> int:
    """VMEM-fitting row blocks (v5e, 16 MB): the backward carries ~3×
    the row-shaped state (recompute + emitted wgrad tiles) next to the
    weights, so its blocks are half the forward's (128-row bf16 bwd
    measured OOM)."""
    return 64 if bwd else BLOCK_ROWS


def _block_inter(dtype, inter: int) -> int:
    """bf16: no inter blocking — both weights (9.4 MB at BERT size) stay
    grid-constant in VMEM, fetched from HBM exactly once per kernel
    (inter-blocking would re-stream them for every row block: measured
    3-5% *slower* steps from ~600 MB/layer of weight DMA).  f32 weights
    (18.9 MB) cannot fit, so they stream in (h, IT) slices."""
    if jnp.dtype(dtype) == jnp.float32 and inter % BLOCK_INTER == 0:
        return BLOCK_INTER
    return inter


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dot(a, b, dims=((1,), (0,))):
    """MXU dot, f32 accumulation, per-dtype precision (see
    flash_attention._sb_dot for why bf16 must not use HIGHEST)."""
    prec = (jax.lax.Precision.HIGHEST if a.dtype == jnp.float32
            else None)
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _gelu_f32(h32):
    return h32 * 0.5 * (1.0 + _erf(h32 * _INV_SQRT2))


def _gelu_grad_f32(h32):
    cdf = 0.5 * (1.0 + _erf(h32 * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * h32 * h32) * _INV_SQRT2PI
    return cdf + h32 * pdf


MASK_ROWS = 64


def _mask_ids(bn: int):
    """Dropout-mask tile ids at a FIXED 64-row granularity, independent
    of the kernel's row-block size.  The forward runs 128-row blocks and
    the backward 64-row blocks (VMEM budget, `_block_rows`); keying masks
    on the *kernel* tile id+shape would decorrelate them between forward
    and backward and silently corrupt the dropout gradients.  Instead
    every absolute 64-row sub-tile r of the (padded) row dimension draws
    its own mask: a 128-row forward block covers sub-tiles 2i and 2i+1,
    exactly the backward's blocks i'=2i and 2i+1.

    Returns (stream1, stream2): id of sub-tile s of the current block for
    the first (row, IT) dropout at inter-slice j, and for the second
    (row, h) dropout (offset past every stream-1 id).  When bn < 64 the
    whole call is a single block shared by fwd and bwd (fused_ffn_block
    pads rows so this is the only other case), and the block is its own
    sub-tile."""
    n_sub = max(bn // MASK_ROWS, 1)
    r0 = pl.program_id(0) * n_sub
    n64 = pl.num_programs(0) * n_sub
    n_j = pl.num_programs(1)
    j = pl.program_id(1)

    def stream1(s):
        return (r0 + s) * n_j + j

    def stream2(s):
        return n64 * n_j + (r0 + s)

    return stream1, stream2


def _drop(x32, seed_ref, rate, id_fn, inv_keep):
    """Dropout over an (R, C) f32 tile, drawing the keep-mask per 64-row
    sub-tile (see `_mask_ids`).  R is either a multiple of 64 or the
    whole (sub-64) row dimension."""
    rows = x32.shape[0]
    if rows <= MASK_ROWS:
        keep = _keep_mask(seed_ref, rate, id_fn(0), x32.shape)
    else:
        assert rows % MASK_ROWS == 0, rows
        keep = jnp.concatenate(
            [_keep_mask(seed_ref, rate, id_fn(s),
                        (MASK_ROWS, x32.shape[1]))
             for s in range(rows // MASK_ROWS)], axis=0)
    return jnp.where(keep, x32 * inv_keep, 0.0)


def _gelu_slice(x, w1_ref, b1_ref, seed_ref, cdt, rate, inv_keep):
    """First GEMM + bias + GELU + dropout for the current inter slice.
    Mirrors the XLA op order: f32-accumulated dot + bias, cast to the
    compute dtype between stages (what `dense` does)."""
    h32 = _dot(x, w1_ref[...]) + b1_ref[...].astype(jnp.float32)
    h = h32.astype(cdt)
    g32 = _gelu_f32(h.astype(jnp.float32))
    if rate > 0.0:
        s1, _ = _mask_ids(x.shape[0])
        g32 = _drop(g32, seed_ref, rate, s1, inv_keep)
    return h, g32.astype(cdt)


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref, lb_ref,
                seed_ref, y_ref, y2d_ref, mean_ref, rstd_ref, acc_scr,
                *, rate: float, eps: float):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    cdt = x_ref.dtype
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    @pl.when(j == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    x = x_ref[...]
    _, gd = _gelu_slice(x, w1_ref, b1_ref, seed_ref, cdt, rate,
                        inv_keep)
    acc_scr[...] += _dot(gd, w2_ref[...])

    @pl.when(j == n_j - 1)
    def _tail():
        y2_32 = acc_scr[...] + b2_ref[...].astype(jnp.float32)
        y2 = y2_32.astype(cdt).astype(jnp.float32)
        if rate > 0.0:
            _, s2 = _mask_ids(x.shape[0])
            y2 = _drop(y2, seed_ref, rate, s2, inv_keep)
        y2d_ref[...] = y2.astype(y2d_ref.dtype)
        s = y2 + x.astype(jnp.float32)
        mean = jnp.mean(s, axis=1, keepdims=True)
        c = s - mean
        var = jnp.mean(c * c, axis=1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        y = c * rstd * ls_ref[...].astype(jnp.float32) \
            + lb_ref[...].astype(jnp.float32)
        y_ref[...] = y.astype(y_ref.dtype)
        mean_ref[...] = jnp.broadcast_to(mean, mean_ref.shape)
        rstd_ref[...] = jnp.broadcast_to(rstd, rstd_ref.shape)


def _row_grads(x_ref, y2d_ref, dy_ref, ls_ref, mean_ref, rstd_ref,
               seed_ref, rate, inv_keep):
    """Row-local backward head, recomputed per inter step (cheap, (R, h)
    sized): LN backward → residual/dropout split."""
    x32 = x_ref[...].astype(jnp.float32)
    s = y2d_ref[...].astype(jnp.float32) + x32
    mean = mean_ref[...][:, :1]
    rstd = rstd_ref[...][:, :1]
    xhat = (s - mean) * rstd
    dy = dy_ref[...].astype(jnp.float32)
    gl = dy * ls_ref[...].astype(jnp.float32)
    m1 = jnp.mean(gl, axis=1, keepdims=True)
    m2 = jnp.mean(gl * xhat, axis=1, keepdims=True)
    ds = (gl - m1 - xhat * m2) * rstd
    dy2 = ds
    if rate > 0.0:
        _, s2 = _mask_ids(x32.shape[0])
        dy2 = _drop(dy2, seed_ref, rate, s2, inv_keep)
    return xhat, ds, dy2


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, ls_ref, seed_ref,
                mean_ref, rstd_ref, y2d_ref, dy_ref,
                dx_ref, dh_ref, gd_ref, dy2_ref, xhat_ref, dx_scr,
                *, rate: float):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    cdt = x_ref.dtype
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    xhat, ds, dy2 = _row_grads(x_ref, y2d_ref, dy_ref, ls_ref,
                               mean_ref, rstd_ref, seed_ref, rate,
                               inv_keep)

    @pl.when(j == 0)
    def _init():
        dx_scr[...] = ds  # residual branch of d s/d x

    x = x_ref[...]
    h, gd = _gelu_slice(x, w1_ref, b1_ref, seed_ref, cdt, rate,
                        inv_keep)
    dy2c = dy2.astype(cdt)
    dgd = _dot(dy2c, w2_ref[...], dims=((1,), (1,)))     # (R, IT)
    if rate > 0.0:
        s1, _ = _mask_ids(x.shape[0])
        dgd = _drop(dgd, seed_ref, rate, s1, inv_keep)
    dh = dgd * _gelu_grad_f32(h.astype(jnp.float32))
    dhc = dh.astype(cdt)
    dx_scr[...] += _dot(dhc, w1_ref[...], dims=((1,), (1,)))

    dh_ref[...] = dhc
    gd_ref[...] = gd

    @pl.when(j == n_j - 1)
    def _emit():
        dx_ref[...] = dx_scr[...].astype(dx_ref.dtype)
        dy2_ref[...] = dy2.astype(dy2_ref.dtype)
        xhat_ref[...] = xhat.astype(xhat_ref.dtype)


def _specs(bn, h, it):
    row_h = pl.BlockSpec((bn, h), lambda i, j: (i, 0))
    row_it = pl.BlockSpec((bn, it), lambda i, j: (i, j))
    w1 = pl.BlockSpec((h, it), lambda i, j: (0, j))
    w2 = pl.BlockSpec((it, h), lambda i, j: (j, 0))
    vec_h = pl.BlockSpec((1, h), lambda i, j: (0, 0))
    vec_it = pl.BlockSpec((1, it), lambda i, j: (0, j))
    stat = pl.BlockSpec((bn, LANES), lambda i, j: (i, 0))
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return row_h, row_it, w1, w2, vec_h, vec_it, stat, seed


def _fwd_call(x2, w1, b1, w2, b2, ls, lb, seed, rate, eps):
    n, h = x2.shape
    inter = w1.shape[1]
    bn = min(_block_rows(x2.dtype, bwd=False), n)
    it = _block_inter(x2.dtype, inter)
    row_h, _, w1s, w2s, vec_h, vec_it, stat, seed_s = _specs(bn, h, it)
    grid = (n // bn, inter // it)
    y, y2d, mean, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, eps=eps),
        grid=grid,
        in_specs=[row_h, w1s, vec_it, w2s, vec_h, vec_h, vec_h, seed_s],
        out_specs=(row_h, row_h, stat, stat),
        out_shape=(
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n, LANES), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((bn, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=KERNEL_VMEM_LIMIT),
    )(x2, w1, b1.reshape(1, inter), w2, b2.reshape(1, h),
      ls.reshape(1, h), lb.reshape(1, h), seed)
    return y, y2d, mean, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _ffn_core(x2, w1, b1, w2, b2, ls, lb, seed, rate, eps):
    y, _, _, _ = _fwd_call(x2, w1, b1, w2, b2, ls, lb, seed, rate, eps)
    return y


def _ffn_core_fwd(x2, w1, b1, w2, b2, ls, lb, seed, rate, eps):
    y, y2d, mean, rstd = _fwd_call(x2, w1, b1, w2, b2, ls, lb, seed,
                                   rate, eps)
    return y, (x2, w1, b1, w2, b2, ls, lb, seed, y2d, mean, rstd)


def _bwd_call(x2, w1, b1, w2, ls, seed, mean, rstd, y2d, dy, rate):
    """The backward Pallas sweep.  Returns the input gradient plus the
    intermediate tiles (dh, gd, dy2, xhat) that the weight/bias/LN-param
    reductions consume — also used directly by tools/tpu_kernel_check.py
    to extract the backward's regenerated dropout masks (gd, dy2) for
    the fwd/bwd mask-consistency oracle."""
    n, h = x2.shape
    inter = w1.shape[1]
    bn = min(_block_rows(x2.dtype, bwd=True), n)
    it = _block_inter(x2.dtype, inter)
    row_h, row_it, w1s, w2s, vec_h, vec_it, stat, seed_s = _specs(
        bn, h, it)
    grid = (n // bn, inter // it)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate),
        grid=grid,
        in_specs=[row_h, w1s, vec_it, w2s, vec_h, seed_s,
                  stat, stat, row_h, row_h],
        out_specs=(row_h, row_it, row_it, row_h, row_h),
        out_shape=(
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, inter), x2.dtype),
            jax.ShapeDtypeStruct((n, inter), x2.dtype),
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, h), x2.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((bn, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=KERNEL_VMEM_LIMIT),
    )(x2, w1, b1.reshape(1, inter), w2, ls.reshape(1, h), seed,
      mean, rstd, y2d, dy)


def _ffn_core_bwd(rate, eps, res, dy):
    x2, w1, b1, w2, b2, ls, lb, seed, y2d, mean, rstd = res
    dx, dh, gd, dy2, xhat = _bwd_call(x2, w1, b1, w2, ls, seed,
                                      mean, rstd, y2d, dy, rate)

    # weight / bias / LN-parameter grads: plain reductions over the
    # emitted tiles — XLA wgrad GEMMs run at full rate and their f32
    # accumulators would not fit VMEM next to the streamed weights
    f32 = jnp.float32
    dw1 = jnp.einsum("nk,nm->km", x2, dh,
                     preferred_element_type=f32).astype(w1.dtype)
    db1 = jnp.sum(dh.astype(f32), axis=0).astype(b1.dtype)
    dw2 = jnp.einsum("nm,nk->mk", gd, dy2,
                     preferred_element_type=f32).astype(w2.dtype)
    db2 = jnp.sum(dy2.astype(f32), axis=0).astype(b2.dtype)
    dy32 = dy.astype(f32)
    dls = jnp.sum(dy32 * xhat.astype(f32), axis=0).astype(ls.dtype)
    dlb = jnp.sum(dy32, axis=0).astype(lb.dtype)
    return (dx, dw1, db1, dw2, db2, dls, dlb, None)


_ffn_core.defvjp(_ffn_core_fwd, _ffn_core_bwd)


# ===================================================================== #
# int8-forward training variant (VERDICT r3 next #5 — the named physics
# lever: ~52% of the 54.8 ms step is pure GEMM at bf16 and the v5e MXU
# runs int8 at 2x).  Semantics: the FORWARD runs both FFN GEMMs int8
# (per-output-channel symmetric weights quantized fresh each step from
# the live bf16 values + per-token dynamic activation quant, f32
# accumulation — the serving recipe, `ops/int8_serving.py`); the
# BACKWARD is the unchanged bf16 megakernel sweep (`_bwd_call`), i.e.
# gradients are computed as if the forward had been bf16
# (straight-through w.r.t. quantization).  Dropout masks regenerate
# from the same seeds either way, so fwd/bwd masks stay consistent.
# ===================================================================== #


def _quant_rows_f32(x32):
    """Per-token symmetric int8 activation quant (quant.dense_int8 math)."""
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _dense_i8_f32(x32, wq_ref, ws_ref, b_ref):
    """int8 x int8 -> int32 MXU dot with f32 dequant epilogue; returns
    f32 (caller casts)."""
    xq, xs = _quant_rows_f32(x32)
    acc = jax.lax.dot_general(xq, wq_ref[...], ((((1,), (0,))), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs * ws_ref[...] \
        + b_ref[...].astype(jnp.float32)


def _fwd_kernel_i8(x_ref, w1q_ref, w1s_ref, b1_ref, w2q_ref, w2s_ref,
                   b2_ref, ls_ref, lb_ref, seed_ref,
                   y_ref, y2d_ref, mean_ref, rstd_ref,
                   *, rate: float, eps: float):
    """Single-j forward (int8 weights always VMEM-resident: 4.7 MB at
    BERT size).  Stage order / cast points / dropout mask ids mirror
    `_fwd_kernel` exactly so the bf16 backward regenerates the same
    masks."""
    cdt = x_ref.dtype
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    h = _dense_i8_f32(x32, w1q_ref, w1s_ref, b1_ref).astype(cdt)
    g32 = _gelu_f32(h.astype(jnp.float32))
    if rate > 0.0:
        s1, _ = _mask_ids(x.shape[0])
        g32 = _drop(g32, seed_ref, rate, s1, inv_keep)
    gd = g32.astype(cdt)

    y2_32 = _dense_i8_f32(gd.astype(jnp.float32), w2q_ref, w2s_ref,
                          b2_ref)
    y2 = y2_32.astype(cdt).astype(jnp.float32)
    if rate > 0.0:
        _, s2 = _mask_ids(x.shape[0])
        y2 = _drop(y2, seed_ref, rate, s2, inv_keep)
    y2d_ref[...] = y2.astype(y2d_ref.dtype)
    s = y2 + x32
    mean = jnp.mean(s, axis=1, keepdims=True)
    c = s - mean
    var = jnp.mean(c * c, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = c * rstd * ls_ref[...].astype(jnp.float32) \
        + lb_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)
    mean_ref[...] = jnp.broadcast_to(mean, mean_ref.shape)
    rstd_ref[...] = jnp.broadcast_to(rstd, rstd_ref.shape)


def _fwd_call_i8(x2, w1, b1, w2, b2, ls, lb, seed, rate, eps):
    from .quant import quantize_weight

    n, h = x2.shape
    inter = w1.shape[1]
    # weights re-quantized from the LIVE values every step (one cheap
    # XLA pass; they change under the optimizer)
    w1q, w1s = quantize_weight(w1.astype(jnp.float32), axis_in=-2)
    w2q, w2s = quantize_weight(w2.astype(jnp.float32), axis_in=-2)
    bn = min(_block_rows(x2.dtype, bwd=False), n)
    # 2-D (rows, 1) grid: `_mask_ids` keys dropout masks off grid axis 1
    # (the bf16 forward's inter-slice axis) — the int8 layout is always
    # non-streaming (n_j == 1), but the axis must exist or tracing the
    # dropout path fails with "Axis 1 is out of bounds"
    row_h = pl.BlockSpec((bn, h), lambda i, j: (i, 0))
    vec_h = pl.BlockSpec((1, h), lambda i, j: (0, 0))
    vec_it = pl.BlockSpec((1, inter), lambda i, j: (0, 0))
    stat = pl.BlockSpec((bn, LANES), lambda i, j: (i, 0))
    y, y2d, mean, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel_i8, rate=rate, eps=eps),
        grid=(n // bn, 1),
        in_specs=[row_h,
                  pl.BlockSpec((h, inter), lambda i, j: (0, 0)), vec_it,
                  vec_it,
                  pl.BlockSpec((inter, h), lambda i, j: (0, 0)), vec_h,
                  vec_h, vec_h, vec_h,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(row_h, row_h, stat, stat),
        out_shape=(
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n, LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=KERNEL_VMEM_LIMIT),
    )(x2, w1q, w1s.reshape(1, inter), b1.reshape(1, inter), w2q,
      w2s.reshape(1, h), b2.reshape(1, h), ls.reshape(1, h),
      lb.reshape(1, h), seed)
    return y, y2d, mean, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _ffn_core_i8(x2, w1, b1, w2, b2, ls, lb, seed, rate, eps):
    y, _, _, _ = _fwd_call_i8(x2, w1, b1, w2, b2, ls, lb, seed, rate,
                              eps)
    return y


def _ffn_core_i8_fwd(x2, w1, b1, w2, b2, ls, lb, seed, rate, eps):
    y, y2d, mean, rstd = _fwd_call_i8(x2, w1, b1, w2, b2, ls, lb, seed,
                                      rate, eps)
    # identical residual tuple to the bf16 core: the backward IS the
    # bf16 backward (`_ffn_core_bwd`), fed the int8 forward's saved
    # y2d/LN stats
    return y, (x2, w1, b1, w2, b2, ls, lb, seed, y2d, mean, rstd)


_ffn_core_i8.defvjp(_ffn_core_i8_fwd, _ffn_core_bwd)


# --------------------------------------------------------------------- #
# int8 BACKWARD variant (``--int8_train_bwd``): the backward sweep's
# three in-kernel GEMMs also run int8 on the MXU —
#   (C) the forward recompute x@W1 reuses the forward's int8 recipe, so
#       the regenerated h/gd now match the int8 forward's EXACTLY
#       (the bf16 backward recomputes them in bf16 — a documented
#       straight-through mismatch this variant removes);
#   (A) dgrad dy2@W2^T and (B) dx += dh@W1^T contract over the weights'
#       OUTPUT axis, where per-output-channel scales cannot factor out
#       of the int8 dot — they fold exactly into the incoming gradient
#       before its per-token quantization (`quant.dgrad_int8` math).
# Weights are quantized once per step from the live bf16 values — the
# SAME quantization the int8 forward used.  The row-local LN/residual
# head (ds), all dropout masks, and the XLA wgrad/bias/LN-param
# reductions stay exactly the bf16 backward's.  What is approximated is
# only the per-token rounding of scaled gradients entering A and B.
# --------------------------------------------------------------------- #

def _dgrad_rows_i8(g32, wq_ref, ws_ref):
    """g @ dequant(wq)^T with the per-output scales folded into g before
    per-token quant (quant.dgrad_int8 math on VMEM-resident tiles)."""
    gs = g32 * ws_ref[...]
    gq, gscale = _quant_rows_f32(gs)
    acc = jax.lax.dot_general(gq, wq_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * gscale


def _bwd_kernel_i8(x_ref, w1q_ref, w1s_ref, b1_ref, w2q_ref, w2s_ref,
                   ls_ref, seed_ref, mean_ref, rstd_ref, y2d_ref, dy_ref,
                   dx_ref, dh_ref, gd_ref, dy2_ref, xhat_ref, dx_scr,
                   *, rate: float):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    cdt = x_ref.dtype
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    xhat, ds, dy2 = _row_grads(x_ref, y2d_ref, dy_ref, ls_ref,
                               mean_ref, rstd_ref, seed_ref, rate,
                               inv_keep)

    @pl.when(j == 0)
    def _init():
        dx_scr[...] = ds  # residual branch — unquantized, exact

    x32 = x_ref[...].astype(jnp.float32)
    # (C) int8 forward recompute: identical math (and dropout ids) to
    # _fwd_kernel_i8, so gd here == the int8 forward's gd bit-for-bit
    h32 = _dense_i8_f32(x32, w1q_ref, w1s_ref, b1_ref)
    h = h32.astype(cdt)
    g32 = _gelu_f32(h.astype(jnp.float32))
    if rate > 0.0:
        s1, _ = _mask_ids(x32.shape[0])
        g32 = _drop(g32, seed_ref, rate, s1, inv_keep)
    gd = g32.astype(cdt)

    # (A) int8 dgrad through W2
    dgd = _dgrad_rows_i8(dy2, w2q_ref, w2s_ref)          # (R, IT)
    if rate > 0.0:
        s1, _ = _mask_ids(x32.shape[0])
        dgd = _drop(dgd, seed_ref, rate, s1, inv_keep)
    dh = dgd * _gelu_grad_f32(h.astype(jnp.float32))
    # (B) int8 dgrad through W1
    dx_scr[...] += _dgrad_rows_i8(dh, w1q_ref, w1s_ref)

    dh_ref[...] = dh.astype(cdt)
    gd_ref[...] = gd

    @pl.when(j == n_j - 1)
    def _emit():
        dx_ref[...] = dx_scr[...].astype(dx_ref.dtype)
        dy2_ref[...] = dy2.astype(dy2_ref.dtype)
        xhat_ref[...] = xhat.astype(xhat_ref.dtype)


def _bwd_call_i8(x2, w1, b1, w2, ls, seed, mean, rstd, y2d, dy, rate):
    from .quant import quantize_weight

    n, h = x2.shape
    inter = w1.shape[1]
    # the same per-step quantization the int8 forward computed
    w1q, w1s = quantize_weight(w1.astype(jnp.float32), axis_in=-2)
    w2q, w2s = quantize_weight(w2.astype(jnp.float32), axis_in=-2)
    # int8 weights free ~4.9 MB of VMEM vs the bf16 backward, so the
    # i8 backward runs full 128-row blocks (the bf16 bwd's 64-row limit
    # was weight+tile residency); mask ids are 64-row-granular by
    # design, so fwd/bwd dropout masks stay consistent at any block
    bn = min(BLOCK_ROWS, n)
    it = inter  # int8-train requires the non-streaming layout
    row_h, row_it, w1spec, w2spec, vec_h, vec_it, stat, seed_s = _specs(
        bn, h, it)
    grid = (n // bn, inter // it)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_i8, rate=rate),
        grid=grid,
        in_specs=[row_h, w1spec, vec_it, vec_it, w2spec, vec_h, vec_h,
                  seed_s, stat, stat, row_h, row_h],
        out_specs=(row_h, row_it, row_it, row_h, row_h),
        out_shape=(
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, inter), x2.dtype),
            jax.ShapeDtypeStruct((n, inter), x2.dtype),
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, h), x2.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((bn, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=KERNEL_VMEM_LIMIT),
    )(x2, w1q, w1s.reshape(1, inter), b1.reshape(1, inter), w2q,
      w2s.reshape(1, h), ls.reshape(1, h), seed, mean, rstd, y2d, dy)


def _ffn_core_i8_bwd(rate, eps, res, dy):
    x2, w1, b1, w2, b2, ls, lb, seed, y2d, mean, rstd = res
    dx, dh, gd, dy2, xhat = _bwd_call_i8(x2, w1, b1, w2, ls, seed,
                                         mean, rstd, y2d, dy, rate)
    f32 = jnp.float32
    dw1 = jnp.einsum("nk,nm->km", x2, dh,
                     preferred_element_type=f32).astype(w1.dtype)
    db1 = jnp.sum(dh.astype(f32), axis=0).astype(b1.dtype)
    dw2 = jnp.einsum("nm,nk->mk", gd, dy2,
                     preferred_element_type=f32).astype(w2.dtype)
    db2 = jnp.sum(dy2.astype(f32), axis=0).astype(b2.dtype)
    dy32 = dy.astype(f32)
    dls = jnp.sum(dy32 * xhat.astype(f32), axis=0).astype(ls.dtype)
    dlb = jnp.sum(dy32, axis=0).astype(lb.dtype)
    return (dx, dw1, db1, dw2, db2, dls, dlb, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _ffn_core_i8b(x2, w1, b1, w2, b2, ls, lb, seed, rate, eps):
    y, _, _, _ = _fwd_call_i8(x2, w1, b1, w2, b2, ls, lb, seed, rate,
                              eps)
    return y


_ffn_core_i8b.defvjp(_ffn_core_i8_fwd, _ffn_core_i8_bwd)


def fused_ffn_block_int8_train(x: jnp.ndarray, w1, b1, w2, b2, ln_scale,
                               ln_bias, *, dropout_rate: float = 0.0,
                               dropout_rng=None, eps: float = 1e-12,
                               int8_bwd: bool = False) -> jnp.ndarray:
    """`fused_ffn_block` with int8 forward GEMMs / bf16 backward (or the
    int8-dgrad backward when ``int8_bwd``, CLI ``--int8_train_bwd``).

    Requires dims where the bf16 kernels keep weights resident (no
    inter streaming): use with compute dtype bfloat16 at BERT-family
    dims."""
    shape = x.shape
    h = shape[-1]
    inter = w1.shape[1]
    if _block_inter(x.dtype, inter) != inter:
        raise ValueError(
            "int8-train FFN requires a non-streaming weight layout "
            "(bf16 compute); f32 streams inter slices whose dropout "
            "mask ids would diverge from the int8 forward's")
    n = 1
    for d in shape[:-1]:
        n *= d
    x2 = x.reshape(n, h)
    rate = float(dropout_rate)
    if rate > 0.0:
        if dropout_rng is None:
            raise ValueError("fused_ffn_block_int8_train: dropout_rate "
                             "> 0 requires dropout_rng")
        seed = jax.random.bits(dropout_rng, (1,), "uint32").astype(
            jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    n8 = _round_up(n, 8)
    n_pad = n8 if n8 <= MASK_ROWS else _round_up(n, BLOCK_ROWS)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
    core = _ffn_core_i8b if int8_bwd else _ffn_core_i8
    y = core(x2, w1, b1, w2, b2, ln_scale, ln_bias, seed, rate,
             float(eps))
    return y[:n].reshape(shape)


def fused_ffn_block(x: jnp.ndarray, w1, b1, w2, b2, ln_scale, ln_bias,
                    *, dropout_rate: float = 0.0, dropout_rng=None,
                    eps: float = 1e-12) -> jnp.ndarray:
    """LN(x + drop(drop(gelu(x@w1+b1))@w2+b2)) over the last axis.

    x: (..., h); w1: (h, inter); w2: (inter, h); h and inter must be
    128-lane multiples (BERT: 768/3072)."""
    shape = x.shape
    h = shape[-1]
    n = 1
    for d in shape[:-1]:
        n *= d
    x2 = x.reshape(n, h)
    rate = float(dropout_rate)
    if rate > 0.0:
        if dropout_rng is None:
            raise ValueError("fused_ffn_block: dropout_rate > 0 "
                             "requires dropout_rng")
        seed = jax.random.bits(dropout_rng, (1,), "uint32").astype(
            jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    # pad rows so BOTH row blockings tile exactly: up to MASK_ROWS the
    # fwd and bwd share a single (8-sublane-aligned) block; anything
    # larger pads to the 128-row fwd block, whose 64-row bwd blocks and
    # 64-row mask sub-tiles (`_mask_ids`) then divide it
    n8 = _round_up(n, 8)
    n_pad = n8 if n8 <= MASK_ROWS else _round_up(n, BLOCK_ROWS)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
    y = _ffn_core(x2, w1, b1, w2, b2, ln_scale, ln_bias, seed, rate,
                  float(eps))
    return y[:n].reshape(shape)
