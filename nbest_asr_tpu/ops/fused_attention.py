"""Fused attention-block Pallas megakernel: QKV GEMM → per-head
attention (softmax + in-kernel dropout) → out-proj GEMM → bias →
dropout → residual → LayerNorm, one kernel each way.

Why (NOTES_r2.md MFU analysis + round-2 VERDICT): after the fused FFN
megakernel, the attention block is the last unabsorbed inter-GEMM
elementwise chain — QKV bias/split/reshape, the (b, h, s, s) prob +
dropout-mask HBM round-trips XLA materializes for its backward, and the
out-proj bias/dropout/residual/LN chain.  The two measured lessons from
round 2 drive the design: Pallas kernels win only when they absorb the
GEMMs around the elementwise work, and weight VMEM-residency decides
the sign.  Both attention weight matrices (wqkv 3.5 MB + wo 1.2 MB in
bf16 at BERT-base) are grid-constant VMEM residents here.

Replaces, on the TPU training path, the reference's HF BertSelfAttention
+ BertSelfOutput stack (external torch modules, ref `models/model.py:19`).

Structure (the proven single-block recipe from
`flash_attention._sb_fwd_kernel`, extended to the whole residual block):

- native (b, s, h) layout — no (b,s,h,d) <-> (b,h,s,d) transposes,
- grid over batch only; `block_b = max(1, 128 // s_p)` batch elements
  per grid step so the GEMMs see >= 128-row tiles at short buckets,
- in-kernel head loop with plain (not online) softmax — seq <= 512
  fits one VMEM block (all of DSTC2),
- minimal score padding: seq pads only to the 16-sublane tile and the
  score matrix stays (s_p, s_p) — Mosaic handles non-128 lane dims, so
  seq 96 does a (96, 96) score matrix (the single-block flash kernel
  pays (96, 128)),
- backward is ONE kernel sweep: recompute QKV GEMM + probs once, emit
  dx plus the (dqkv, ctx, dout, xhat) tiles whose weight/bias/LN-param
  gradients are plain XLA reductions (their f32 accumulators would not
  fit VMEM next to the resident weights).

Dropout: the same regenerable `_keep_mask` scheme as flash/fused-FFN,
with mask ids keyed on the ABSOLUTE batch element (attn stream:
``elem * n_heads + head``; hidden stream offset past it) — invariant to
the kernel's blocking by construction, so the forward and backward can
never decorrelate even if their block sizes diverge (the round-2
advisor found exactly that bug in the fused FFN kernel).

The XLA path in `models/encoder.py` remains the correctness oracle;
wired behind ``EncoderConfig.use_fused_attn`` (training only — the
deterministic eval path has no backward to pay and stays on XLA's fused
attention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import MASK_VALUE, _keep_mask

LANES = 128
FAB_MAX_SEQ = 512     # one-VMEM-block ceiling, same as flash SB_MAX_SEQ

# Per-kernel Mosaic VMEM allowance.  The compiler's DEFAULT scoped-vmem
# limit is 16 MiB — an allocation *ceiling*, not the part's capacity
# (v5e carries 128 MiB of VMEM per core).  The megakernels' worst
# supported shape (seq 512, bert-large h=1024, double-buffered row
# blocks + resident weights + attention temporaries) needs ~33 MiB, and
# nesting the backward inside lax.scan bodies (layer scan x grad-accum
# scan at the 12-layer reference geometry, config.n_accum_steps) adds
# enough shared scoped overhead to tip 16-MiB-marginal shapes over
# (observed: seq-240 bucket backward at 16.10 MiB vs the 16.00 MiB
# default under accum=4).  64 MiB keeps every routed shape comfortably
# legal while the weight-residency budget (models/encoder.py
# kernel_vmem_budget) still decides WHAT routes here.
KERNEL_VMEM_LIMIT = 64 * 2 ** 20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dot(a, b, dims=((1,), (0,))):
    """MXU dot, f32 accumulation, per-dtype precision (see
    flash_attention._sb_dot: Mosaic rejects HIGHEST on bf16 vectors)."""
    prec = (jax.lax.Precision.HIGHEST if a.dtype == jnp.float32
            else None)
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _seg_mask_col(m, s_p, s_kv):
    """(s_p, 1) column of each QUERY row's segment-mask value, extracted
    from the (s_kv,) lane-vector ``m`` without any sublane-shaped input:
    build the rectangular identity from two broadcasted iotas, multiply
    by the broadcast mask row and lane-reduce — a diagonal gather as
    pure VPU work (s_p <= s_kv always holds here)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (s_p, s_kv), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (s_p, s_kv), 1)
    eye = (rows == cols).astype(m.dtype)
    return jnp.sum(eye * m[None, :], axis=1, keepdims=True)


def _head_probs(qkv, r0, s_p, s_kv, h, d, i, m, sm_scale, qm=None):
    """Normalized (s_p, s_kv = s_p) attention probs (f32) + k, v slices
    for head i of the element whose rows start at r0.  No kv padding:
    Mosaic handles non-128 lane dims on the score matrix (an in-kernel
    zero-pad concatenate is rejected anyway — lane-offset slices and
    fresh zeros have mismatched vector layouts), and a (96, 96) score
    matrix beats the single-block flash kernel's (96, 128).

    SEGMENT-mask semantics (ops/attention.py:multi_head_attention): a
    query attends exactly the keys sharing its mask value, so 1/0 masks
    behave as before and multi-valued masks give packed block-diagonal
    attention.  ``qm`` is the per-element (s_p, 1) query-side column
    (hoisted out of the head loop by the callers via _seg_mask_col)."""
    q = qkv[r0:r0 + s_p, i * d:(i + 1) * d]
    k = qkv[r0:r0 + s_p, h + i * d:h + (i + 1) * d]
    v = qkv[r0:r0 + s_p, 2 * h + i * d:2 * h + (i + 1) * d]
    s_ = _dot(q, k, ((1,), (1,))) * sm_scale
    if qm is None:
        qm = _seg_mask_col(m, s_p, s_kv)
    s_ = jnp.where(m[None, :] == qm, s_, MASK_VALUE)
    mx = jnp.max(s_, axis=1, keepdims=True)
    p = jnp.exp(s_ - mx)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    return p, q, k, v


def _hidden_drop(x32, seed_ref, rate, inv_keep, block_b, s_p, n_heads):
    """Hidden (out-proj) dropout over the (R, h) tile: one mask per
    ABSOLUTE batch element, id offset past every attention-mask id."""
    n_elems = pl.num_programs(0) * block_b
    outs = []
    for e in range(block_b):
        elem = pl.program_id(0) * block_b + e
        keep = _keep_mask(seed_ref, rate, n_elems * n_heads + elem,
                          (s_p, x32.shape[1]))
        outs.append(jnp.where(keep, x32[e * s_p:(e + 1) * s_p]
                              * inv_keep, 0.0))
    return jnp.concatenate(outs, axis=0) if block_b > 1 else outs[0]


def _qkv_gemm(x2, wqkv_ref, bqkv_ref, cdt):
    return (_dot(x2, wqkv_ref[...])
            + bqkv_ref[...].astype(jnp.float32)).astype(cdt)


# ===================================================================== #
# forward
# ===================================================================== #

def _fab_fwd_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, ls_ref,
                    lb_ref, mask_ref, seed_ref,
                    y_ref, od_ref, mean_ref, rstd_ref, ctx_scr,
                    *, n_heads: int, sm_scale: float, attn_rate: float,
                    hid_rate: float, eps: float, block_b: int,
                    s_p: int, s_kv: int):
    cdt = x_ref.dtype
    f32 = jnp.float32
    h = x_ref.shape[1]
    d = h // n_heads
    inv_a = 1.0 / (1.0 - attn_rate) if attn_rate > 0.0 else 1.0
    inv_h = 1.0 / (1.0 - hid_rate) if hid_rate > 0.0 else 1.0

    x2 = x_ref[...]
    qkv = _qkv_gemm(x2, wqkv_ref, bqkv_ref, cdt)
    for e in range(block_b):
        elem = pl.program_id(0) * block_b + e
        r0 = e * s_p
        m = mask_ref[e, 0]
        qm = _seg_mask_col(m, s_p, s_kv)
        for i in range(n_heads):
            p, _, _, v = _head_probs(qkv, r0, s_p, s_kv, h, d, i, m,
                                     sm_scale, qm)
            if attn_rate > 0.0:
                keep = _keep_mask(seed_ref, attn_rate,
                                  elem * n_heads + i, p.shape)
                p = jnp.where(keep, p * inv_a, 0.0)
            ctx_scr[r0:r0 + s_p, i * d:(i + 1) * d] = _dot(
                p.astype(cdt), v, ((1,), (0,))).astype(cdt)

    out32 = _dot(ctx_scr[...], wo_ref[...]) + bo_ref[...].astype(f32)
    out = out32.astype(cdt).astype(f32)
    if hid_rate > 0.0:
        out = _hidden_drop(out, seed_ref, hid_rate, inv_h, block_b,
                           s_p, n_heads)
    od_ref[...] = out.astype(od_ref.dtype)
    s_res = out + x2.astype(f32)
    mean = jnp.mean(s_res, axis=1, keepdims=True)
    c = s_res - mean
    var = jnp.mean(c * c, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = c * rstd * ls_ref[...].astype(f32) + lb_ref[...].astype(f32)
    y_ref[...] = y.astype(y_ref.dtype)
    mean_ref[...] = jnp.broadcast_to(mean, mean_ref.shape)
    rstd_ref[...] = jnp.broadcast_to(rstd, rstd_ref.shape)


# ===================================================================== #
# backward — one sweep: LN/residual backward (row-local), out-proj
# dgrad, prob recompute + 5 attention dots per head, QKV dgrad
# ===================================================================== #

def _fab_bwd_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, ls_ref, mask_ref,
                    seed_ref, mean_ref, rstd_ref, od_ref, dy_ref,
                    dx_ref, dqkv_ref, ctx_ref, dout_ref, xhat_ref,
                    *, n_heads: int, sm_scale: float, attn_rate: float,
                    hid_rate: float, block_b: int, s_p: int, s_kv: int):
    cdt = x_ref.dtype
    f32 = jnp.float32
    h = x_ref.shape[1]
    d = h // n_heads
    inv_a = 1.0 / (1.0 - attn_rate) if attn_rate > 0.0 else 1.0
    inv_h = 1.0 / (1.0 - hid_rate) if hid_rate > 0.0 else 1.0

    x2 = x_ref[...]
    x32 = x2.astype(f32)
    s_res = od_ref[...].astype(f32) + x32
    mean = mean_ref[...][:, :1]
    rstd = rstd_ref[...][:, :1]
    xhat = (s_res - mean) * rstd
    dy = dy_ref[...].astype(f32)
    gl = dy * ls_ref[...].astype(f32)
    m1 = jnp.mean(gl, axis=1, keepdims=True)
    m2 = jnp.mean(gl * xhat, axis=1, keepdims=True)
    ds = (gl - m1 - xhat * m2) * rstd                 # (R, h) f32
    dout = ds
    if hid_rate > 0.0:
        dout = _hidden_drop(dout, seed_ref, hid_rate, inv_h, block_b,
                            s_p, n_heads)
    dout_c = dout.astype(cdt)
    dctx = _dot(dout_c, wo_ref[...], dims=((1,), (1,)))   # (R, h) f32

    qkv = _qkv_gemm(x2, wqkv_ref, bqkv_ref, cdt)
    for e in range(block_b):
        elem = pl.program_id(0) * block_b + e
        r0 = e * s_p
        m = mask_ref[e, 0]
        qm = _seg_mask_col(m, s_p, s_kv)
        for i in range(n_heads):
            p, q, k, v = _head_probs(qkv, r0, s_p, s_kv, h, d, i, m,
                                     sm_scale, qm)
            do_i = dctx[r0:r0 + s_p, i * d:(i + 1) * d].astype(cdt)
            dp = _dot(do_i, v, ((1,), (1,)))          # (s_p, s_kv) f32
            if attn_rate > 0.0:
                keep = _keep_mask(seed_ref, attn_rate,
                                  elem * n_heads + i, p.shape)
                p_v = jnp.where(keep, p * inv_a, 0.0)
                dp = jnp.where(keep, dp * inv_a, 0.0)
            else:
                p_v = p
            p_vc = p_v.astype(cdt)
            dv_i = _dot(p_vc, do_i, ((0,), (0,)))     # (s_kv, d)
            ctx_i = _dot(p_vc, v, ((1,), (0,)))       # (s_p, d)
            # di = sum_k dPbar ⊙ Pbar (== sum(do*o), same contraction)
            di = jnp.sum(dp * p, axis=1, keepdims=True)
            ds_a = (p * (dp - di) * sm_scale).astype(cdt)
            dq_i = _dot(ds_a, k, ((1,), (0,)))        # (s_p, d)
            dk_i = _dot(ds_a, q, ((0,), (0,)))        # (s_kv, d)
            rows = slice(r0, r0 + s_p)
            dqkv_ref[rows, i * d:(i + 1) * d] = dq_i.astype(cdt)
            dqkv_ref[rows, h + i * d:h + (i + 1) * d] = \
                dk_i[:s_p].astype(cdt)
            dqkv_ref[rows, 2 * h + i * d:2 * h + (i + 1) * d] = \
                dv_i[:s_p].astype(cdt)
            ctx_ref[rows, i * d:(i + 1) * d] = ctx_i.astype(cdt)

    dx = ds + _dot(dqkv_ref[...], wqkv_ref[...], dims=((1,), (1,)))
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dout_ref[...] = dout_c
    xhat_ref[...] = xhat.astype(xhat_ref.dtype)


# ===================================================================== #
# pallas_call plumbing + custom VJP
# ===================================================================== #

def _fab_specs(R, h, block_b, s_kv):
    row_h = pl.BlockSpec((R, h), lambda i: (i, 0))
    row_3h = pl.BlockSpec((R, 3 * h), lambda i: (i, 0))
    wqkv = pl.BlockSpec((h, 3 * h), lambda i: (0, 0))
    wo = pl.BlockSpec((h, h), lambda i: (0, 0))
    vec_3h = pl.BlockSpec((1, 3 * h), lambda i: (0, 0))
    vec_h = pl.BlockSpec((1, h), lambda i: (0, 0))
    # 3D (b, 1, s_kv) so the block's LAST TWO dims equal the array's
    # (Mosaic's tiling rule — a 2D (block_b, s_kv) block with block_b=1
    # fails the 8-sublane divisibility requirement)
    mask = pl.BlockSpec((block_b, 1, s_kv), lambda i: (i, 0, 0))
    stat = pl.BlockSpec((R, LANES), lambda i: (i, 0))
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return row_h, row_3h, wqkv, wo, vec_3h, vec_h, mask, stat, seed


def _fab_fwd_call(x2, wqkv, bqkv, wo, bo, ls, lb, mask2, seed,
                  n_heads, attn_rate, hid_rate, eps, block_b, s_p):
    n, h = x2.shape
    R = block_b * s_p
    s_kv = s_p
    row_h, _, wqkv_s, wo_s, vec_3h, vec_h, mask_s, stat, seed_s = \
        _fab_specs(R, h, block_b, s_kv)
    grid = (n // R,)
    return pl.pallas_call(
        functools.partial(
            _fab_fwd_kernel, n_heads=n_heads,
            sm_scale=1.0 / float(h // n_heads) ** 0.5,
            attn_rate=attn_rate, hid_rate=hid_rate, eps=eps,
            block_b=block_b, s_p=s_p, s_kv=s_kv),
        grid=grid,
        in_specs=[row_h, wqkv_s, vec_3h, wo_s, vec_h, vec_h, vec_h,
                  mask_s, seed_s],
        out_specs=(row_h, row_h, stat, stat),
        out_shape=(
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n, LANES), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((R, h), x2.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=KERNEL_VMEM_LIMIT),
    )(x2, wqkv, bqkv.reshape(1, 3 * h), wo, bo.reshape(1, h),
      ls.reshape(1, h), lb.reshape(1, h), mask2, seed)


def _fab_bwd_call(x2, wqkv, bqkv, wo, ls, mask2, seed, mean, rstd, od,
                  dy, n_heads, attn_rate, hid_rate, block_b, s_p):
    """The backward Pallas sweep.  Returns (dx, dqkv, ctx, dout, xhat)
    — the last four are the tiles the weight/bias/LN-param reductions
    consume; also used directly by tools/tpu_kernel_check.py to extract
    the backward's regenerated dropout masks for the fwd/bwd
    mask-consistency oracle."""
    n, h = x2.shape
    R = block_b * s_p
    s_kv = s_p
    row_h, row_3h, wqkv_s, wo_s, vec_3h, vec_h, mask_s, stat, seed_s = \
        _fab_specs(R, h, block_b, s_kv)
    grid = (n // R,)
    return pl.pallas_call(
        functools.partial(
            _fab_bwd_kernel, n_heads=n_heads,
            sm_scale=1.0 / float(h // n_heads) ** 0.5,
            attn_rate=attn_rate, hid_rate=hid_rate,
            block_b=block_b, s_p=s_p, s_kv=s_kv),
        grid=grid,
        in_specs=[row_h, wqkv_s, vec_3h, wo_s, vec_h, mask_s, seed_s,
                  stat, stat, row_h, row_h],
        out_specs=(row_h, row_3h, row_h, row_h, row_h),
        out_shape=(
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, 3 * h), x2.dtype),
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, h), x2.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=KERNEL_VMEM_LIMIT),
    )(x2, wqkv, bqkv.reshape(1, 3 * h), wo, ls.reshape(1, h), mask2,
      seed, mean, rstd, od, dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13,
                                                    14))
def _fab_core(x2, wqkv, bqkv, wo, bo, ls, lb, mask2, seed,
              n_heads, attn_rate, hid_rate, eps, block_b, s_p):
    y, _, _, _ = _fab_fwd_call(x2, wqkv, bqkv, wo, bo, ls, lb, mask2,
                               seed, n_heads, attn_rate, hid_rate, eps,
                               block_b, s_p)
    return y


def _fab_core_fwd(x2, wqkv, bqkv, wo, bo, ls, lb, mask2, seed,
                  n_heads, attn_rate, hid_rate, eps, block_b, s_p):
    y, od, mean, rstd = _fab_fwd_call(
        x2, wqkv, bqkv, wo, bo, ls, lb, mask2, seed, n_heads,
        attn_rate, hid_rate, eps, block_b, s_p)
    return y, (x2, wqkv, bqkv, wo, bo, ls, lb, mask2, seed, od, mean,
               rstd)


def _fab_core_bwd(n_heads, attn_rate, hid_rate, eps, block_b, s_p,
                  res, dy):
    x2, wqkv, bqkv, wo, bo, ls, lb, mask2, seed, od, mean, rstd = res
    dx, dqkv, ctx, dout, xhat = _fab_bwd_call(
        x2, wqkv, bqkv, wo, ls, mask2, seed, mean, rstd, od, dy,
        n_heads, attn_rate, hid_rate, block_b, s_p)

    # weight / bias / LN-param grads: plain reductions over the emitted
    # tiles — XLA wgrad GEMMs run at full rate, and their f32
    # accumulators would not fit VMEM next to the resident weights.
    # Padded rows contribute exact zeros (dy pads to zero → dout/dqkv
    # rows zero), so the reductions run on the padded arrays directly.
    f32 = jnp.float32
    dwqkv = jnp.einsum("nk,nm->km", x2, dqkv,
                       preferred_element_type=f32).astype(wqkv.dtype)
    dbqkv = jnp.sum(dqkv.astype(f32), axis=0).astype(bqkv.dtype)
    dwo = jnp.einsum("nm,nk->mk", ctx, dout,
                     preferred_element_type=f32).astype(wo.dtype)
    dbo = jnp.sum(dout.astype(f32), axis=0).astype(bo.dtype)
    dy32 = dy.astype(f32)
    dls = jnp.sum(dy32 * xhat.astype(f32), axis=0).astype(ls.dtype)
    dlb = jnp.sum(dy32, axis=0).astype(lb.dtype)
    return (dx, dwqkv, dbqkv, dwo, dbo, dls, dlb, None, None)


_fab_core.defvjp(_fab_core_fwd, _fab_core_bwd)


# ===================================================================== #
# int8-forward training variant (the VERDICT-r3 int8-training probe,
# extended past the FFN): the QKV and out-proj GEMMs run int8×int8→int32
# on the MXU — weights re-quantized per step from the live bf16 values,
# per-token dynamic activation quant fused in VMEM, f32 accumulation —
# while the attention math (scores/softmax/probs) and both dropouts stay
# exactly the bf16 kernel's, at the same regenerable mask ids.  The
# backward IS the unchanged bf16 sweep (`_fab_bwd_call`) fed the int8
# forward's saved od/LN stats: straight-through w.r.t. quantization
# except the LN/residual head, which differentiates through the ACTUAL
# int8 output (the same contract as
# `fused_ffn.fused_ffn_block_int8_train`).
# ===================================================================== #

def _dense_rows_i8(x32, wq_ref, ws_ref, b_ref):
    """Per-token activation quant + int8 MXU dot + f32 dequant/bias
    epilogue (quant.dense_int8 math on VMEM-resident tiles)."""
    from .fused_ffn import _quant_rows_f32

    xq, xs = _quant_rows_f32(x32)
    acc = jax.lax.dot_general(xq, wq_ref[...], ((((1,), (0,))), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs * ws_ref[...] \
        + b_ref[...].astype(jnp.float32)


def _fab_fwd_kernel_i8(x_ref, wqkvq_ref, wqkvs_ref, bqkv_ref, woq_ref,
                       wos_ref, bo_ref, ls_ref, lb_ref, mask_ref,
                       seed_ref, y_ref, od_ref, mean_ref, rstd_ref,
                       ctx_scr, *, n_heads: int, sm_scale: float,
                       attn_rate: float, hid_rate: float, eps: float,
                       block_b: int, s_p: int, s_kv: int):
    """Stage order / cast points / dropout mask ids mirror
    `_fab_fwd_kernel` exactly so the bf16 backward regenerates the same
    masks."""
    cdt = x_ref.dtype
    f32 = jnp.float32
    h = x_ref.shape[1]
    d = h // n_heads
    inv_a = 1.0 / (1.0 - attn_rate) if attn_rate > 0.0 else 1.0
    inv_h = 1.0 / (1.0 - hid_rate) if hid_rate > 0.0 else 1.0

    x2 = x_ref[...]
    x32 = x2.astype(f32)
    qkv = _dense_rows_i8(x32, wqkvq_ref, wqkvs_ref,
                         bqkv_ref).astype(cdt)
    for e in range(block_b):
        elem = pl.program_id(0) * block_b + e
        r0 = e * s_p
        m = mask_ref[e, 0]
        qm = _seg_mask_col(m, s_p, s_kv)
        for i in range(n_heads):
            p, _, _, v = _head_probs(qkv, r0, s_p, s_kv, h, d, i, m,
                                     sm_scale, qm)
            if attn_rate > 0.0:
                keep = _keep_mask(seed_ref, attn_rate,
                                  elem * n_heads + i, p.shape)
                p = jnp.where(keep, p * inv_a, 0.0)
            ctx_scr[r0:r0 + s_p, i * d:(i + 1) * d] = _dot(
                p.astype(cdt), v, ((1,), (0,))).astype(cdt)

    out32 = _dense_rows_i8(ctx_scr[...].astype(f32), woq_ref, wos_ref,
                           bo_ref)
    out = out32.astype(cdt).astype(f32)
    if hid_rate > 0.0:
        out = _hidden_drop(out, seed_ref, hid_rate, inv_h, block_b,
                           s_p, n_heads)
    od_ref[...] = out.astype(od_ref.dtype)
    s_res = out + x32
    mean = jnp.mean(s_res, axis=1, keepdims=True)
    c = s_res - mean
    var = jnp.mean(c * c, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = c * rstd * ls_ref[...].astype(f32) + lb_ref[...].astype(f32)
    y_ref[...] = y.astype(y_ref.dtype)
    mean_ref[...] = jnp.broadcast_to(mean, mean_ref.shape)
    rstd_ref[...] = jnp.broadcast_to(rstd, rstd_ref.shape)


def _fab_fwd_call_i8(x2, wqkv, bqkv, wo, bo, ls, lb, mask2, seed,
                     n_heads, attn_rate, hid_rate, eps, block_b, s_p):
    from .quant import quantize_weight

    n, h = x2.shape
    R = block_b * s_p
    s_kv = s_p
    # weights re-quantized from the LIVE values every step (one cheap
    # XLA pass; they change under the optimizer)
    wqkvq, wqkvs = quantize_weight(wqkv.astype(jnp.float32), axis_in=-2)
    woq, wos = quantize_weight(wo.astype(jnp.float32), axis_in=-2)
    row_h, _, wqkv_s, wo_s, vec_3h, vec_h, mask_s, stat, seed_s = \
        _fab_specs(R, h, block_b, s_kv)
    grid = (n // R,)
    return pl.pallas_call(
        functools.partial(
            _fab_fwd_kernel_i8, n_heads=n_heads,
            sm_scale=1.0 / float(h // n_heads) ** 0.5,
            attn_rate=attn_rate, hid_rate=hid_rate, eps=eps,
            block_b=block_b, s_p=s_p, s_kv=s_kv),
        grid=grid,
        in_specs=[row_h, wqkv_s, vec_3h, vec_3h, wo_s, vec_h, vec_h,
                  vec_h, vec_h, mask_s, seed_s],
        out_specs=(row_h, row_h, stat, stat),
        out_shape=(
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n, LANES), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((R, h), x2.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=KERNEL_VMEM_LIMIT),
    )(x2, wqkvq, wqkvs.reshape(1, 3 * h), bqkv.reshape(1, 3 * h), woq,
      wos.reshape(1, h), bo.reshape(1, h), ls.reshape(1, h),
      lb.reshape(1, h), mask2, seed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13,
                                                    14))
def _fab_core_i8(x2, wqkv, bqkv, wo, bo, ls, lb, mask2, seed,
                 n_heads, attn_rate, hid_rate, eps, block_b, s_p):
    y, _, _, _ = _fab_fwd_call_i8(x2, wqkv, bqkv, wo, bo, ls, lb, mask2,
                                  seed, n_heads, attn_rate, hid_rate,
                                  eps, block_b, s_p)
    return y


def _fab_core_i8_fwd(x2, wqkv, bqkv, wo, bo, ls, lb, mask2, seed,
                     n_heads, attn_rate, hid_rate, eps, block_b, s_p):
    y, od, mean, rstd = _fab_fwd_call_i8(
        x2, wqkv, bqkv, wo, bo, ls, lb, mask2, seed, n_heads,
        attn_rate, hid_rate, eps, block_b, s_p)
    # identical residual tuple to the bf16 core: the backward IS the
    # bf16 backward (`_fab_core_bwd`), fed the int8 forward's saved
    # od/LN stats
    return y, (x2, wqkv, bqkv, wo, bo, ls, lb, mask2, seed, od, mean,
               rstd)


_fab_core_i8.defvjp(_fab_core_i8_fwd, _fab_core_bwd)


# --------------------------------------------------------------------- #
# int8 BACKWARD variant (``--int8_train_bwd``): the backward sweep's
# three large GEMMs also run int8 — the QKV recompute reuses the int8
# forward recipe (regenerated qkv == the int8 forward's bit-for-bit),
# and the two dgrads (dctx = dout@Wo^T, dx += dqkv@Wqkv^T) contract
# over the weights' OUTPUT axes, so their per-output-channel scales
# fold exactly into the incoming gradients before per-token quant
# (`quant.dgrad_int8` math — same recipe as `fused_ffn._bwd_kernel_i8`).
# The per-head attention dots (s_p × d tiles) stay bf16: they are too
# small for int8 to pay and their numerics drive the softmax backward.
# --------------------------------------------------------------------- #

def _fab_bwd_kernel_i8(x_ref, wqkvq_ref, wqkvs_ref, bqkv_ref, woq_ref,
                       wos_ref, ls_ref, mask_ref, seed_ref, mean_ref,
                       rstd_ref, od_ref, dy_ref,
                       dx_ref, dqkv_ref, ctx_ref, dout_ref, xhat_ref,
                       *, n_heads: int, sm_scale: float,
                       attn_rate: float, hid_rate: float, block_b: int,
                       s_p: int, s_kv: int):
    from .fused_ffn import _dgrad_rows_i8

    cdt = x_ref.dtype
    f32 = jnp.float32
    h = x_ref.shape[1]
    d = h // n_heads
    inv_a = 1.0 / (1.0 - attn_rate) if attn_rate > 0.0 else 1.0
    inv_h = 1.0 / (1.0 - hid_rate) if hid_rate > 0.0 else 1.0

    x2 = x_ref[...]
    x32 = x2.astype(f32)
    s_res = od_ref[...].astype(f32) + x32
    mean = mean_ref[...][:, :1]
    rstd = rstd_ref[...][:, :1]
    xhat = (s_res - mean) * rstd
    dy = dy_ref[...].astype(f32)
    gl = dy * ls_ref[...].astype(f32)
    m1 = jnp.mean(gl, axis=1, keepdims=True)
    m2 = jnp.mean(gl * xhat, axis=1, keepdims=True)
    ds = (gl - m1 - xhat * m2) * rstd
    dout = ds
    if hid_rate > 0.0:
        dout = _hidden_drop(dout, seed_ref, hid_rate, inv_h, block_b,
                            s_p, n_heads)
    dout_c = dout.astype(cdt)
    dctx = _dgrad_rows_i8(dout, woq_ref, wos_ref)         # (R, h) f32

    qkv = _dense_rows_i8(x32, wqkvq_ref, wqkvs_ref,
                         bqkv_ref).astype(cdt)
    for e in range(block_b):
        elem = pl.program_id(0) * block_b + e
        r0 = e * s_p
        m = mask_ref[e, 0]
        qm = _seg_mask_col(m, s_p, s_kv)
        for i in range(n_heads):
            p, q, k, v = _head_probs(qkv, r0, s_p, s_kv, h, d, i, m,
                                     sm_scale, qm)
            do_i = dctx[r0:r0 + s_p, i * d:(i + 1) * d].astype(cdt)
            dp = _dot(do_i, v, ((1,), (1,)))
            if attn_rate > 0.0:
                keep = _keep_mask(seed_ref, attn_rate,
                                  elem * n_heads + i, p.shape)
                p_v = jnp.where(keep, p * inv_a, 0.0)
                dp = jnp.where(keep, dp * inv_a, 0.0)
            else:
                p_v = p
            p_vc = p_v.astype(cdt)
            dv_i = _dot(p_vc, do_i, ((0,), (0,)))
            ctx_i = _dot(p_vc, v, ((1,), (0,)))
            di = jnp.sum(dp * p, axis=1, keepdims=True)
            ds_a = (p * (dp - di) * sm_scale).astype(cdt)
            dq_i = _dot(ds_a, k, ((1,), (0,)))
            dk_i = _dot(ds_a, q, ((0,), (0,)))
            rows = slice(r0, r0 + s_p)
            dqkv_ref[rows, i * d:(i + 1) * d] = dq_i.astype(cdt)
            dqkv_ref[rows, h + i * d:h + (i + 1) * d] = \
                dk_i[:s_p].astype(cdt)
            dqkv_ref[rows, 2 * h + i * d:2 * h + (i + 1) * d] = \
                dv_i[:s_p].astype(cdt)
            ctx_ref[rows, i * d:(i + 1) * d] = ctx_i.astype(cdt)

    dx = ds + _dgrad_rows_i8(dqkv_ref[...].astype(f32), wqkvq_ref,
                             wqkvs_ref)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dout_ref[...] = dout_c
    xhat_ref[...] = xhat.astype(xhat_ref.dtype)


def _fab_bwd_call_i8(x2, wqkv, bqkv, wo, ls, mask2, seed, mean, rstd,
                     od, dy, n_heads, attn_rate, hid_rate, block_b,
                     s_p):
    from .quant import quantize_weight

    n, h = x2.shape
    R = block_b * s_p
    s_kv = s_p
    # the same per-step quantization the int8 forward computed
    wqkvq, wqkvs = quantize_weight(wqkv.astype(jnp.float32), axis_in=-2)
    woq, wos = quantize_weight(wo.astype(jnp.float32), axis_in=-2)
    row_h, row_3h, wqkv_s, wo_s, vec_3h, vec_h, mask_s, stat, seed_s = \
        _fab_specs(R, h, block_b, s_kv)
    grid = (n // R,)
    return pl.pallas_call(
        functools.partial(
            _fab_bwd_kernel_i8, n_heads=n_heads,
            sm_scale=1.0 / float(h // n_heads) ** 0.5,
            attn_rate=attn_rate, hid_rate=hid_rate,
            block_b=block_b, s_p=s_p, s_kv=s_kv),
        grid=grid,
        in_specs=[row_h, wqkv_s, vec_3h, vec_3h, wo_s, vec_h, vec_h,
                  mask_s, seed_s, stat, stat, row_h, row_h],
        out_specs=(row_h, row_3h, row_h, row_h, row_h),
        out_shape=(
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, 3 * h), x2.dtype),
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, h), x2.dtype),
            jax.ShapeDtypeStruct((n, h), x2.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=KERNEL_VMEM_LIMIT),
    )(x2, wqkvq, wqkvs.reshape(1, 3 * h), bqkv.reshape(1, 3 * h), woq,
      wos.reshape(1, h), ls.reshape(1, h), mask2, seed, mean, rstd,
      od, dy)


def _fab_core_i8_bwd(n_heads, attn_rate, hid_rate, eps, block_b, s_p,
                     res, dy):
    x2, wqkv, bqkv, wo, bo, ls, lb, mask2, seed, od, mean, rstd = res
    dx, dqkv, ctx, dout, xhat = _fab_bwd_call_i8(
        x2, wqkv, bqkv, wo, ls, mask2, seed, mean, rstd, od, dy,
        n_heads, attn_rate, hid_rate, block_b, s_p)
    f32 = jnp.float32
    dwqkv = jnp.einsum("nk,nm->km", x2, dqkv,
                       preferred_element_type=f32).astype(wqkv.dtype)
    dbqkv = jnp.sum(dqkv.astype(f32), axis=0).astype(bqkv.dtype)
    dwo = jnp.einsum("nm,nk->mk", ctx, dout,
                     preferred_element_type=f32).astype(wo.dtype)
    dbo = jnp.sum(dout.astype(f32), axis=0).astype(bo.dtype)
    dy32 = dy.astype(f32)
    dls = jnp.sum(dy32 * xhat.astype(f32), axis=0).astype(ls.dtype)
    dlb = jnp.sum(dy32, axis=0).astype(lb.dtype)
    return (dx, dwqkv, dbqkv, dwo, dbo, dls, dlb, None, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13,
                                                    14))
def _fab_core_i8b(x2, wqkv, bqkv, wo, bo, ls, lb, mask2, seed,
                  n_heads, attn_rate, hid_rate, eps, block_b, s_p):
    y, _, _, _ = _fab_fwd_call_i8(x2, wqkv, bqkv, wo, bo, ls, lb, mask2,
                                  seed, n_heads, attn_rate, hid_rate,
                                  eps, block_b, s_p)
    return y


_fab_core_i8b.defvjp(_fab_core_i8_fwd, _fab_core_i8_bwd)


def fused_attention_block_int8_train(x: jnp.ndarray, wqkv, bqkv, wo, bo,
                                     ln_scale, ln_bias, attn_mask, *,
                                     n_heads: int,
                                     attn_dropout: float = 0.0,
                                     hidden_dropout: float = 0.0,
                                     dropout_rng=None,
                                     eps: float = 1e-12,
                                     int8_bwd: bool = False
                                     ) -> jnp.ndarray:
    """`fused_attention_block` with int8 forward GEMMs / bf16 backward
    (CLI ``--int8_train_attn``; ``int8_bwd`` additionally runs the
    backward's QKV-recompute and both dgrads int8 — CLI
    ``--int8_train_bwd``).  Same shape/lane requirements."""
    b, s, h = x.shape
    s_p = _round_up(s, 16)
    block_b = max(1, 128 // s_p)
    b_pad = _round_up(b, block_b)
    s_kv = s_p

    a_rate = float(attn_dropout)
    h_rate = float(hidden_dropout)
    if a_rate > 0.0 or h_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("fused_attention_block_int8_train: dropout "
                             "requires dropout_rng")
        seed = jax.random.bits(dropout_rng, (1,), "uint32").astype(
            jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)

    xp = x
    if b_pad != b or s_p != s:
        xp = jnp.pad(x, ((0, b_pad - b), (0, s_p - s), (0, 0)))
    # pad the mask with -1 (a segment id no real position carries):
    # under segment-EQUALITY masking this keeps every in-range pad row's
    # attended set identical to the unpadded XLA oracle's, whatever
    # internal seq padding the kernel uses
    mask2 = jnp.pad(attn_mask.astype(jnp.float32),
                    ((0, b_pad - b), (0, s_kv - s)),
                    constant_values=-1.0)[:, None, :]
    x2 = xp.reshape(b_pad * s_p, h)
    core = _fab_core_i8b if int8_bwd else _fab_core_i8
    y = core(x2, wqkv, bqkv, wo, bo, ln_scale, ln_bias, mask2,
             seed, int(n_heads), a_rate, h_rate, float(eps),
             block_b, s_p)
    return y.reshape(b_pad, s_p, h)[:b, :s]


def fused_attention_block(x: jnp.ndarray, wqkv, bqkv, wo, bo, ln_scale,
                          ln_bias, attn_mask, *, n_heads: int,
                          attn_dropout: float = 0.0,
                          hidden_dropout: float = 0.0,
                          dropout_rng=None,
                          eps: float = 1e-12) -> jnp.ndarray:
    """LN(x + drop(attn(x) @ wo + bo)) over the full attention block.

    x: (b, s, h); wqkv: (h, 3h) with q|k|v concatenated on the output
    axis (the encoder's layout); wo: (h, h); attn_mask: (b, s) with
    1.0 = attend.  h must be a 128-lane multiple and s <= FAB_MAX_SEQ.
    """
    b, s, h = x.shape
    s_p = _round_up(s, 16)
    block_b = max(1, 128 // s_p)
    b_pad = _round_up(b, block_b)
    s_kv = s_p

    a_rate = float(attn_dropout)
    h_rate = float(hidden_dropout)
    if a_rate > 0.0 or h_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("fused_attention_block: dropout requires "
                             "dropout_rng")
        seed = jax.random.bits(dropout_rng, (1,), "uint32").astype(
            jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)

    xp = x
    if b_pad != b or s_p != s:
        xp = jnp.pad(x, ((0, b_pad - b), (0, s_p - s), (0, 0)))
    # pad the mask with -1 (a segment id no real position carries):
    # under segment-EQUALITY masking this keeps every in-range pad row's
    # attended set identical to the unpadded XLA oracle's, whatever
    # internal seq padding the kernel uses
    mask2 = jnp.pad(attn_mask.astype(jnp.float32),
                    ((0, b_pad - b), (0, s_kv - s)),
                    constant_values=-1.0)[:, None, :]
    x2 = xp.reshape(b_pad * s_p, h)
    y = _fab_core(x2, wqkv, bqkv, wo, bo, ln_scale, ln_bias, mask2,
                  seed, int(n_heads), a_rate, h_rate, float(eps),
                  block_b, s_p)
    return y.reshape(b_pad, s_p, h)[:b, :s]
