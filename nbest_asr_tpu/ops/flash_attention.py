"""Blockwise flash attention for TPU (Pallas/Mosaic), forward + backward.

The reference's attention lives inside HF's CUDA-backed BertModel; this is
the TPU-native replacement (SURVEY.md §7 step 6): online-softmax tiling so
the (s, s) score matrix never touches HBM, f32 softmax statistics over
bf16 tiles, padding-mask support (DSTC2 batches are ragged), and a
custom-VJP backward split into dKV and dQ kernels (the standard two-kernel
structure: dKV iterates Q-innermost, dQ iterates KV-innermost).

Layout: the core kernels take (batch, heads, seq, head_dim); the public
`flash_attention` wrapper transposes from the encoder's (b, s, h, d)
activations and pads seq to the 128-lane block size (padded kv columns are
masked, padded q rows are sliced off afterwards).

Non-causal only (bidirectional encoder); attention-prob dropout is not
implemented in-kernel — the encoder routes to the XLA path when training
with attn_dropout > 0 (`ops/attention.py`).

Measured on v5e at DSTC2 scale (seq <= 256, head_dim 64): XLA's fused
attention is faster (the kernel pays grid overhead that only amortizes at
longer sequences), so flash stays opt-in.  What it buys today is memory —
batch 64 x seq 256 trains under flash where the XLA path OOMs the 16G
chip — and it is the on-ramp to ring attention / context parallelism for
long-context variants (SURVEY.md §5.7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ===================================================================== #
# forward
# ===================================================================== #

def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, sm_scale: float, n_kv: int):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0].astype(jnp.float32)          # (bq, d)
    k = k_ref[0, 0].astype(jnp.float32)          # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) * sm_scale   # (bq, bk)

    kv_mask = mask_ref[0, 0]                     # (bk,) f32 {0,1}
    s = jnp.where(kv_mask[None, :] > 0, s, MASK_VALUE)

    m_prev = m_scr[...]                          # (bq, LANES) replicated
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)   # (bq, 1)
    m_next = jnp.maximum(m_prev, m_curr)         # (bq, LANES)
    alpha = jnp.exp(m_prev - m_next)             # (bq, LANES)
    p = jnp.exp(s - m_next[:, :1])               # (bq, bk)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_next
    l_scr[...] = l_next

    v = v_ref[0, 0].astype(jnp.float32)          # (bk, d)
    acc_scr[...] = acc_scr[...] * alpha[:, :1] + jnp.dot(
        p, v, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l = l_scr[...][:, :1]                    # (bq, 1)
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        lse = m_scr[...][:, :1] + jnp.log(jnp.maximum(l, 1e-30))
        # stats tile is (8, block_q): per-row value broadcast over the 8
        # sublanes (TPU blocks need the 2nd-to-last dim divisible by 8)
        lse_ref[0, 0, 0] = jnp.broadcast_to(
            lse[:, 0][None, :], lse_ref.shape[3:]).astype(lse_ref.dtype)


def _fwd_call(q, k, v, kv_mask, sm_scale, block_q, block_k):
    """Returns (o (b,h,s,d), lse (b,h,s) f32)."""
    b, h, s, d = q.shape
    n_q = s // block_q
    n_kv = s // block_k

    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale, n_kv=n_kv),
        grid=(b, h, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b_, h_, q_, kv: (b_, h_, q_, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, h_, q_, kv: (b_, h_, kv, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, h_, q_, kv: (b_, h_, kv, 0)),
            pl.BlockSpec((1, 1, block_k),
                         lambda b_, h_, q_, kv: (b_, 0, kv)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b_, h_, q_, kv: (b_, h_, q_, 0)),
            pl.BlockSpec((1, 1, 1, 8, block_q),
                         lambda b_, h_, q_, kv: (b_, h_, q_, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),   # running max
            pltpu.VMEM((block_q, LANES), jnp.float32),   # running sum
            pltpu.VMEM((block_q, d), jnp.float32),       # output acc
        ],
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, n_q, 8, block_q), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(q, k, v, kv_mask)
    return o, lse[:, :, :, 0, :].reshape(b, h, s)


# ===================================================================== #
# backward
# ===================================================================== #

def _recompute_p(q_ref, k_ref, mask_ref, lse_ref, sm_scale):
    q = q_ref[0, 0].astype(jnp.float32)           # (bq, d)
    k = k_ref[0, 0].astype(jnp.float32)           # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) * sm_scale
    kv_mask = mask_ref[0, 0]
    s = jnp.where(kv_mask[None, :] > 0, s, MASK_VALUE)
    lse = lse_ref[0, 0][:, :1]                    # (bq, 1)
    return q, k, jnp.exp(s - lse)                 # p: (bq, bk)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                    di_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                    *, sm_scale: float, n_q: int):
    q_idx = pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q, k, p = _recompute_p(q_ref, k_ref, mask_ref, lse_ref, sm_scale)
    v = v_ref[0, 0].astype(jnp.float32)           # (bk, d)
    do = do_ref[0, 0].astype(jnp.float32)         # (bq, d)
    di = di_ref[0, 0][:, :1]                      # (bq, 1)

    dv_scr[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)      # p^T @ do -> (bk, d)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)      # (bq, bk)
    ds = p * (dp - di) * sm_scale
    dk_scr[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)      # ds^T @ q -> (bk, d)

    @pl.when(q_idx == n_q - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                   di_ref, dq_ref, dq_scr, *, sm_scale: float, n_kv: int):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q, k, p = _recompute_p(q_ref, k_ref, mask_ref, lse_ref, sm_scale)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    di = di_ref[0, 0][:, :1]

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    ds = p * (dp - di) * sm_scale
    dq_scr[...] += jnp.dot(ds, k, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _stats_tiles(x_bhs: jnp.ndarray) -> jnp.ndarray:
    """(b, h, s) per-row stat -> (b, h, s, LANES) lane-replicated tiles the
    backward kernels read with (1, 1, block_q, LANES) blocks."""
    return jnp.broadcast_to(x_bhs[..., None], (*x_bhs.shape, LANES))


# ===================================================================== #
# custom-vjp core + public wrapper
# ===================================================================== #

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_core(q, k, v, kv_mask, sm_scale, block_q, block_k):
    o, _ = _fwd_call(q, k, v, kv_mask, sm_scale, block_q, block_k)
    return o


def _flash_core_fwd(q, k, v, kv_mask, sm_scale, block_q, block_k):
    o, lse = _fwd_call(q, k, v, kv_mask, sm_scale, block_q, block_k)
    return o, (q, k, v, kv_mask, o, lse)


def _flash_core_bwd(sm_scale, block_q, block_k, res, do):
    q, k, v, kv_mask, o, lse = res
    b, h, s, d = q.shape
    n_q = s // block_q
    n_kv = s // block_k

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di_t = _stats_tiles(di)        # (b, h, s, LANES)
    lse_t = _stats_tiles(lse)

    def q_spec(which):
        # index maps differ between the two kernels: in dKV the Q index is
        # grid dim 3, in dQ it is grid dim 2
        if which == "dkv":
            return lambda b_, h_, kv, q_: (b_, h_, q_, 0)
        return lambda b_, h_, q_, kv: (b_, h_, q_, 0)

    def kv_spec(which):
        if which == "dkv":
            return lambda b_, h_, kv, q_: (b_, h_, kv, 0)
        return lambda b_, h_, q_, kv: (b_, h_, kv, 0)

    def mask_spec(which):
        if which == "dkv":
            return lambda b_, h_, kv, q_: (b_, 0, kv)
        return lambda b_, h_, q_, kv: (b_, 0, kv)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, sm_scale=sm_scale, n_q=n_q),
        grid=(b, h, n_kv, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), q_spec("dkv")),
            pl.BlockSpec((1, 1, block_k, d), kv_spec("dkv")),
            pl.BlockSpec((1, 1, block_k, d), kv_spec("dkv")),
            pl.BlockSpec((1, 1, block_k), mask_spec("dkv")),
            pl.BlockSpec((1, 1, block_q, d), q_spec("dkv")),
            pl.BlockSpec((1, 1, block_q, LANES), q_spec("dkv")),
            pl.BlockSpec((1, 1, block_q, LANES), q_spec("dkv")),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_k, d), kv_spec("dkv")),
            pl.BlockSpec((1, 1, block_k, d), kv_spec("dkv")),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(q, k, v, kv_mask, do, lse_t, di_t)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, sm_scale=sm_scale, n_kv=n_kv),
        grid=(b, h, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), q_spec("dq")),
            pl.BlockSpec((1, 1, block_k, d), kv_spec("dq")),
            pl.BlockSpec((1, 1, block_k, d), kv_spec("dq")),
            pl.BlockSpec((1, 1, block_k), mask_spec("dq")),
            pl.BlockSpec((1, 1, block_q, d), q_spec("dq")),
            pl.BlockSpec((1, 1, block_q, LANES), q_spec("dq")),
            pl.BlockSpec((1, 1, block_q, LANES), q_spec("dq")),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), q_spec("dq")),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(q, k, v, kv_mask, do, lse_t, di_t)

    return dq, dk, dv, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(q_bshd, k_bshd, v_bshd, attn_mask,
                    sm_scale: float | None = None,
                    block_q: int | None = None,
                    block_k: int | None = None) -> jnp.ndarray:
    """Public entry: (b, s, h, d) q/k/v + (b, s) padding mask -> (b, s, h, d)."""
    b, s, h, d = q_bshd.shape
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    if block_q is None:
        # bigger blocks amortize grid overhead (measured ~30% faster at
        # seq 256 with 256-blocks); VMEM stays comfortable to 256
        block_q = 256 if s >= 256 else DEFAULT_BLOCK_Q
    if block_k is None:
        block_k = 256 if s >= 256 else DEFAULT_BLOCK_K

    s_pad = _round_up(s, max(block_q, block_k))

    def pad_seq(x):
        if s_pad == s:
            return x
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))

    q = jnp.transpose(pad_seq(q_bshd), (0, 2, 1, 3))
    k = jnp.transpose(pad_seq(k_bshd), (0, 2, 1, 3))
    v = jnp.transpose(pad_seq(v_bshd), (0, 2, 1, 3))
    mask = attn_mask.astype(jnp.float32)
    if s_pad != s:
        mask = jnp.pad(mask, ((0, 0), (0, s_pad - s)))
    # (b, 1, s): the singleton middle dim satisfies the TPU block-shape
    # rule for the (1, 1, block_k) mask tiles
    mask = mask[:, None, :]

    out = _flash_core(q, k, v, mask, float(sm_scale), block_q, block_k)
    out = jnp.transpose(out, (0, 2, 1, 3))[:, :s]
    return out.astype(q_bshd.dtype)
