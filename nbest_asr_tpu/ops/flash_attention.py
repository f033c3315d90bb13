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

Non-causal only (bidirectional encoder).

**In-kernel attention-prob dropout** (the reference trains with
``bert_dropout=0.1`` inside HF's attention, `n_best_asr_bert.py:79`): each
(b, h, q-block, kv-block) tile seeds the per-core TPU PRNG with a
deterministic hash of (caller seed, tile id) and regenerates the *same*
keep-mask in the forward and both backward kernels — the (s, s) mask never
exists in HBM.  The online-softmax denominator uses the *undropped*
probabilities (dropout applies to the normalized probs, and the mask
commutes with the final 1/l scaling), and the backward identity
``di = sum(do * o) = sum(dP̄ ⊙ P̄)`` still holds under dropout because
``o = (M/keep ⊙ P̄) V`` makes both sides contract the same masked terms.

Why this matters for speed: at training time the XLA path materializes the
(b, h, s, s) probs and its dropout mask in HBM for the backward pass; the
flash path writes only (o, lse) and regenerates everything else on-chip.
The deterministic (eval) comparison at seq <= 256 / head_dim 64 still
favors XLA's fused attention, but with dropout on, flash removes ~s^2 HBM
traffic per layer — measure via `tools/perf_probe.py`.  Flash also wins
memory: batch 64 x seq 256 trains under flash where XLA OOMs the 16G chip.
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


def _keep_mask(seed_ref, rate: float, tile_id, shape):
    """Regenerable per-tile dropout keep-mask.  Seeding the per-core PRNG
    with hash(caller seed, tile id) makes the same (b, h, q-block,
    kv-block) tile produce identical bits in the forward and both backward
    kernels — the mask is never stored.  Keep iff bits >= rate * 2^32."""
    pltpu.prng_seed(seed_ref[0] ^ (tile_id * jnp.int32(-1640531527)))
    # prng_random_bits yields *signed* int32 on TPU — bitcast before the
    # unsigned threshold compare or the negative half is always dropped
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.uint32(min(int(rate * 2.0 ** 32), 2 ** 32 - 1))
    return bits >= thresh


def _seg_col(vec, n_rows):
    """(n_rows, 1) column of the first n_rows values of the lane vector
    ``vec`` — a diagonal gather via two broadcasted iotas (pure VPU; no
    sublane-shaped input needed).  Requires n_rows <= len(vec)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_rows, vec.shape[0]), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_rows, vec.shape[0]), 1)
    eye = (rows == cols).astype(vec.dtype)
    return jnp.sum(eye * vec[None, :], axis=1, keepdims=True)


def _fwd_tile_id():
    """Linear tile id for the forward/dq grid order (b, h, q, kv)."""
    nh, nq, nkv = (pl.num_programs(1), pl.num_programs(2),
                   pl.num_programs(3))
    return ((pl.program_id(0) * nh + pl.program_id(1)) * nq
            + pl.program_id(2)) * nkv + pl.program_id(3)


def _dkv_tile_id():
    """Same linear id from the dKV grid order (b, h, kv, q)."""
    nh, nq, nkv = (pl.num_programs(1), pl.num_programs(3),
                   pl.num_programs(2))
    return ((pl.program_id(0) * nh + pl.program_id(1)) * nq
            + pl.program_id(3)) * nkv + pl.program_id(2)


# ===================================================================== #
# forward
# ===================================================================== #

def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, qmask_ref, seed_ref,
                o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, sm_scale: float, n_kv: int,
                dropout_rate: float):
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

    # SEGMENT-mask semantics (ops/attention.py): a query attends the
    # keys sharing its mask value — 1/0 padding masks behave as before,
    # multi-valued masks give packed block-diagonal attention
    kv_mask = mask_ref[0, 0]                     # (bk,) f32 segment ids
    q_mask = _seg_col(qmask_ref[0, 0], s.shape[0])   # (bq, 1)
    s = jnp.where(kv_mask[None, :] == q_mask, s, MASK_VALUE)

    m_prev = m_scr[...]                          # (bq, LANES) replicated
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)   # (bq, 1)
    m_next = jnp.maximum(m_prev, m_curr)         # (bq, LANES)
    alpha = jnp.exp(m_prev - m_next)             # (bq, LANES)
    p = jnp.exp(s - m_next[:, :1])               # (bq, bk)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_next
    l_scr[...] = l_next

    if dropout_rate > 0.0:
        # dropout applies to the normalized probs; the mask commutes with
        # the final 1/l scaling, so masking the unnormalized p here while
        # l accumulates the UNdropped p is exact
        keep = _keep_mask(seed_ref, dropout_rate, _fwd_tile_id(), p.shape)
        p_acc = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
    else:
        p_acc = p

    v = v_ref[0, 0].astype(jnp.float32)          # (bk, d)
    acc_scr[...] = acc_scr[...] * alpha[:, :1] + jnp.dot(
        p_acc, v, preferred_element_type=jnp.float32,
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


def _fwd_call(q, k, v, kv_mask, seed, sm_scale, block_q, block_k,
              dropout_rate):
    """Returns (o (b,h,s,d), lse (b,h,s) f32)."""
    b, h, s, d = q.shape
    n_q = s // block_q
    n_kv = s // block_k

    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale, n_kv=n_kv,
                          dropout_rate=dropout_rate),
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
            pl.BlockSpec((1, 1, block_q),
                         lambda b_, h_, q_, kv: (b_, 0, q_)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(q, k, v, kv_mask, kv_mask, seed)
    return o, lse[:, :, :, 0, :].reshape(b, h, s)


# ===================================================================== #
# backward
# ===================================================================== #

def _recompute_p(q_ref, k_ref, mask_ref, qmask_ref, lse_ref, sm_scale):
    q = q_ref[0, 0].astype(jnp.float32)           # (bq, d)
    k = k_ref[0, 0].astype(jnp.float32)           # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) * sm_scale
    kv_mask = mask_ref[0, 0]
    q_mask = _seg_col(qmask_ref[0, 0], s.shape[0])
    s = jnp.where(kv_mask[None, :] == q_mask, s, MASK_VALUE)
    lse = lse_ref[0, 0][:, :1]                    # (bq, 1)
    return q, k, jnp.exp(s - lse)                 # p: (bq, bk)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, mask_ref, qmask_ref, do_ref,
                    lse_ref,
                    di_ref, seed_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                    *, sm_scale: float, n_q: int, dropout_rate: float):
    q_idx = pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q, k, p = _recompute_p(q_ref, k_ref, mask_ref, qmask_ref,
                           lse_ref, sm_scale)
    v = v_ref[0, 0].astype(jnp.float32)           # (bk, d)
    do = do_ref[0, 0].astype(jnp.float32)         # (bq, d)
    di = di_ref[0, 0][:, :1]                      # (bq, 1)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)      # (bq, bk)

    if dropout_rate > 0.0:
        # o = (M/keep ⊙ P̄) V:  dV = (M/keep ⊙ P̄)^T dO and
        # dP̄ = M/keep ⊙ (dO V^T); the di = sum(do*o) rescaling identity
        # is unchanged (both sides contract the same masked terms)
        keep = _keep_mask(seed_ref, dropout_rate, _dkv_tile_id(), p.shape)
        inv_keep = 1.0 / (1.0 - dropout_rate)
        p_v = jnp.where(keep, p * inv_keep, 0.0)
        dp = jnp.where(keep, dp * inv_keep, 0.0)
    else:
        p_v = p

    dv_scr[...] += jax.lax.dot_general(
        p_v, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)      # p^T @ do -> (bk, d)

    ds = p * (dp - di) * sm_scale
    dk_scr[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)      # ds^T @ q -> (bk, d)

    @pl.when(q_idx == n_q - 1)
    def _store():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, mask_ref, qmask_ref, do_ref,
                   lse_ref,
                   di_ref, seed_ref, dq_ref, dq_scr,
                   *, sm_scale: float, n_kv: int, dropout_rate: float):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q, k, p = _recompute_p(q_ref, k_ref, mask_ref, qmask_ref,
                           lse_ref, sm_scale)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    di = di_ref[0, 0][:, :1]

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    if dropout_rate > 0.0:
        keep = _keep_mask(seed_ref, dropout_rate, _fwd_tile_id(), p.shape)
        dp = jnp.where(keep, dp * (1.0 / (1.0 - dropout_rate)), 0.0)
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
# single-block fused attention (seq <= 512): the DSTC2 production path
# ===================================================================== #
#
# At DSTC2 shapes (padded seq <= 512) the whole sequence fits one VMEM
# block, so the general tiled kernels above pay pure overhead: online-
# softmax bookkeeping, two backward kernels that each recompute the score
# matrix, and -- dominating at these sizes -- six HBM layout transposes
# (b,s,h,d) <-> (b,h,s,d) per fwd+bwd.  This specialization:
#
# - takes the encoder's native (b, s, h*d) layout (h*d = 768 = 6 x 128
#   lanes, perfectly tiled; NO transposes anywhere),
# - grids over batch only and loops heads in-kernel (12x more work per
#   grid step; Pallas double-buffers the next batch row during compute),
# - runs plain (not online) softmax per head, keeps no residuals but the
#   inputs (backward recomputes the probs ONCE and emits dq, dk, dv from
#   a single kernel: 5 dots/head vs the tiled path's 7),
# - regenerates the same in-kernel dropout mask in fwd and bwd.

SB_MAX_SEQ = 512


def _sb_dot(a, b, dims):
    """MXU dot in the operands' NATIVE dtype with f32 accumulation —
    exactly the XLA oracle's einsum(..., preferred_element_type=f32) on
    bf16 activations.  Upcasting operands to f32 first would force a
    multi-pass f32 MXU matmul (~4x slower).  Precision is per-dtype:
    HIGHEST for f32 operands (full-precision unit-test path), default for
    bf16 (Mosaic rejects contract_precision=fp32 on bf16 vectors)."""
    prec = (jax.lax.Precision.HIGHEST if a.dtype == jnp.float32
            else None)
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


def _sb_probs(q_ref, k_ref, mask_ref, i, d, sm_scale, qm):
    """(s_q, s_kv) normalized attention probs for head i, f32, under
    segment-mask equality (ops/attention.py); ``qm`` is the hoisted
    (s_q, 1) query-side mask column."""
    q = q_ref[0][:, i * d:(i + 1) * d]
    k = k_ref[0][:, i * d:(i + 1) * d]
    s_ = _sb_dot(q, k, ((1,), (1,))) * sm_scale
    kv_mask = mask_ref[0, 0]                       # (s,) segment ids
    s_ = jnp.where(kv_mask[None, :] == qm, s_, MASK_VALUE)
    m = jnp.max(s_, axis=1, keepdims=True)
    p = jnp.exp(s_ - m)
    return p / jnp.sum(p, axis=1, keepdims=True)


def _sb_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, seed_ref, o_ref,
                   *, sm_scale: float, n_heads: int, d: int,
                   dropout_rate: float):
    cdt = o_ref.dtype
    qm = _seg_col(mask_ref[0, 0], q_ref.shape[1])
    for i in range(n_heads):
        p = _sb_probs(q_ref, k_ref, mask_ref, i, d, sm_scale, qm)
        if dropout_rate > 0.0:
            tid = pl.program_id(0) * n_heads + i
            keep = _keep_mask(seed_ref, dropout_rate, tid, p.shape)
            p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
        v = v_ref[0][:, i * d:(i + 1) * d]
        o_ref[0, :, i * d:(i + 1) * d] = _sb_dot(
            p.astype(cdt), v, ((1,), (0,))).astype(cdt)


def _sb_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, seed_ref,
                   dq_ref, dk_ref, dv_ref,
                   *, sm_scale: float, n_heads: int, d: int,
                   dropout_rate: float):
    cdt = q_ref.dtype
    qm = _seg_col(mask_ref[0, 0], q_ref.shape[1])
    for i in range(n_heads):
        p = _sb_probs(q_ref, k_ref, mask_ref, i, d, sm_scale, qm)
        do = do_ref[0][:, i * d:(i + 1) * d]
        v = v_ref[0][:, i * d:(i + 1) * d]
        dp = _sb_dot(do, v, ((1,), (1,)))          # (s, s) f32
        if dropout_rate > 0.0:
            tid = pl.program_id(0) * n_heads + i
            keep = _keep_mask(seed_ref, dropout_rate, tid, p.shape)
            inv_keep = 1.0 / (1.0 - dropout_rate)
            p_v = jnp.where(keep, p * inv_keep, 0.0)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        else:
            p_v = p
        dv_ref[0, :, i * d:(i + 1) * d] = _sb_dot(
            p_v.astype(cdt), do, ((0,), (0,))).astype(dv_ref.dtype)
        # di = sum_k dPbar ⊙ Pbar (== sum(do*o) -- same masked contraction)
        di = jnp.sum(dp * p, axis=1, keepdims=True)
        ds = (p * (dp - di) * sm_scale).astype(cdt)
        q = q_ref[0][:, i * d:(i + 1) * d]
        k = k_ref[0][:, i * d:(i + 1) * d]
        dq_ref[0, :, i * d:(i + 1) * d] = _sb_dot(
            ds, k, ((1,), (0,))).astype(dq_ref.dtype)
        dk_ref[0, :, i * d:(i + 1) * d] = _sb_dot(
            ds, q, ((0,), (0,))).astype(dk_ref.dtype)


def _sb_specs(b, s_q, s_kv, hd):
    """Asymmetric q/kv row padding: only the *lane* (kv) axis of the
    score matrix needs 128-alignment; q rows are sublanes and need only
    16 (the bf16 sublane tile).  At DSTC2 bucket lengths this is the
    difference between a (s, 128k) and a (128k, 128k) score matrix —
    e.g. 25% less work at seq 96, 37.5% at 160."""
    qrow = pl.BlockSpec((1, s_q, hd), lambda b_: (b_, 0, 0))
    kvrow = pl.BlockSpec((1, s_kv, hd), lambda b_: (b_, 0, 0))
    mask = pl.BlockSpec((1, 1, s_kv), lambda b_: (b_, 0, 0))
    seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    return qrow, kvrow, mask, seed


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _sb_core(q, k, v, kv_mask, seed, sm_scale, n_heads, dropout_rate):
    """q: (b, s_q, h*d); k/v: (b, s_kv, h*d); kv_mask: (b, 1, s_kv);
    returns o: (b, s_q, h*d)."""
    b, s_q, hd = q.shape
    s_kv = k.shape[1]
    qrow, kvrow, mask, seed_spec = _sb_specs(b, s_q, s_kv, hd)
    return pl.pallas_call(
        functools.partial(_sb_fwd_kernel, sm_scale=sm_scale,
                          n_heads=n_heads, d=hd // n_heads,
                          dropout_rate=dropout_rate),
        grid=(b,),
        in_specs=[qrow, kvrow, kvrow, mask, seed_spec],
        out_specs=qrow,
        out_shape=jax.ShapeDtypeStruct((b, s_q, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(q, k, v, kv_mask, seed)


def _sb_core_fwd(q, k, v, kv_mask, seed, sm_scale, n_heads, dropout_rate):
    o = _sb_core(q, k, v, kv_mask, seed, sm_scale, n_heads, dropout_rate)
    return o, (q, k, v, kv_mask, seed)


def _sb_core_bwd(sm_scale, n_heads, dropout_rate, res, do):
    q, k, v, kv_mask, seed = res
    b, s_q, hd = q.shape
    s_kv = k.shape[1]
    qrow, kvrow, mask, seed_spec = _sb_specs(b, s_q, s_kv, hd)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_sb_bwd_kernel, sm_scale=sm_scale,
                          n_heads=n_heads, d=hd // n_heads,
                          dropout_rate=dropout_rate),
        grid=(b,),
        in_specs=[qrow, kvrow, kvrow, mask, qrow, seed_spec],
        out_specs=(qrow, kvrow, kvrow),
        out_shape=(jax.ShapeDtypeStruct((b, s_q, hd), q.dtype),
                   jax.ShapeDtypeStruct((b, s_kv, hd), q.dtype),
                   jax.ShapeDtypeStruct((b, s_kv, hd), q.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(q, k, v, kv_mask, do, seed)
    return dq, dk, dv, None, None


_sb_core.defvjp(_sb_core_fwd, _sb_core_bwd)


# ===================================================================== #
# custom-vjp core + public wrapper
# ===================================================================== #

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_core(q, k, v, kv_mask, seed, sm_scale, block_q, block_k,
                dropout_rate):
    o, _ = _fwd_call(q, k, v, kv_mask, seed, sm_scale, block_q, block_k,
                     dropout_rate)
    return o


def _flash_core_fwd(q, k, v, kv_mask, seed, sm_scale, block_q, block_k,
                    dropout_rate):
    o, lse = _fwd_call(q, k, v, kv_mask, seed, sm_scale, block_q, block_k,
                       dropout_rate)
    return o, (q, k, v, kv_mask, seed, o, lse)


def _flash_core_bwd(sm_scale, block_q, block_k, dropout_rate, res, do):
    q, k, v, kv_mask, seed, o, lse = res
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

    def qmask_spec(which):
        # the SAME (b, 1, s) mask array viewed with q-indexed blocks
        # (segment-mask equality needs the query rows' values too)
        if which == "dkv":
            return lambda b_, h_, kv, q_: (b_, 0, q_)
        return lambda b_, h_, q_, kv: (b_, 0, q_)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, sm_scale=sm_scale, n_q=n_q,
                          dropout_rate=dropout_rate),
        grid=(b, h, n_kv, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), q_spec("dkv")),
            pl.BlockSpec((1, 1, block_k, d), kv_spec("dkv")),
            pl.BlockSpec((1, 1, block_k, d), kv_spec("dkv")),
            pl.BlockSpec((1, 1, block_k), mask_spec("dkv")),
            pl.BlockSpec((1, 1, block_q), qmask_spec("dkv")),
            pl.BlockSpec((1, 1, block_q, d), q_spec("dkv")),
            pl.BlockSpec((1, 1, block_q, LANES), q_spec("dkv")),
            pl.BlockSpec((1, 1, block_q, LANES), q_spec("dkv")),
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(q, k, v, kv_mask, kv_mask, do, lse_t, di_t, seed)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, sm_scale=sm_scale, n_kv=n_kv,
                          dropout_rate=dropout_rate),
        grid=(b, h, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), q_spec("dq")),
            pl.BlockSpec((1, 1, block_k, d), kv_spec("dq")),
            pl.BlockSpec((1, 1, block_k, d), kv_spec("dq")),
            pl.BlockSpec((1, 1, block_k), mask_spec("dq")),
            pl.BlockSpec((1, 1, block_q), qmask_spec("dq")),
            pl.BlockSpec((1, 1, block_q, d), q_spec("dq")),
            pl.BlockSpec((1, 1, block_q, LANES), q_spec("dq")),
            pl.BlockSpec((1, 1, block_q, LANES), q_spec("dq")),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), q_spec("dq")),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(q, k, v, kv_mask, kv_mask, do, lse_t, di_t, seed)

    return dq, dk, dv, None, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(q_bshd, k_bshd, v_bshd, attn_mask,
                    sm_scale: float | None = None,
                    block_q: int | None = None,
                    block_k: int | None = None,
                    dropout_rate: float = 0.0,
                    dropout_rng=None) -> jnp.ndarray:
    """Public entry: (b, s, h, d) q/k/v + (b, s) SEGMENT mask ->
    (b, s, h, d).  Mask semantics follow ops/attention.py: 0 = pad,
    k >= 1 = packed-segment id; a query attends exactly the keys sharing
    its mask value (plain 1/0 masks keep their old meaning).

    ``dropout_rate > 0`` enables in-kernel attention-prob dropout (the
    reference's ``bert_dropout`` inside HF attention); ``dropout_rng`` (a
    JAX PRNG key) is then required and is reduced to a 32-bit seed that,
    hashed with each tile id, drives the on-chip PRNG."""
    b, s, h, d = q_bshd.shape
    dropout_rate = float(dropout_rate)
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("flash_attention: dropout_rate > 0 requires "
                             "dropout_rng")
        seed = jax.random.bits(dropout_rng, (1,), "uint32").astype(
            jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)

    # short sequences (all of DSTC2): single-block fused kernel in the
    # encoder's native (b, s, h*d) layout — no transposes, one bwd kernel.
    # q rows pad only to the 16-sublane tile; kv rows to the 128-lane tile
    # (asymmetric: a (s_q, s_kv) score matrix, see _sb_specs)
    if s <= SB_MAX_SEQ and block_q is None and block_k is None:
        s_q = _round_up(s, 16)
        s_kv = _round_up(s, LANES)

        def pad_sb(x, to):
            if to == s:
                return x
            return jnp.pad(x, ((0, 0), (0, to - s), (0, 0), (0, 0)))

        q2 = pad_sb(q_bshd, s_q).reshape(b, s_q, h * d)
        k2 = pad_sb(k_bshd, s_kv).reshape(b, s_kv, h * d)
        v2 = pad_sb(v_bshd, s_kv).reshape(b, s_kv, h * d)
        mask2 = attn_mask.astype(jnp.float32)
        if s_kv != s:
            # -1 padding: under segment-equality masking the in-range
            # pad rows keep the same attended set as the unpadded oracle
            mask2 = jnp.pad(mask2, ((0, 0), (0, s_kv - s)),
                            constant_values=-1.0)
        out = _sb_core(q2, k2, v2, mask2[:, None, :], seed,
                       float(sm_scale), h, dropout_rate)
        return out[:, :s].reshape(b, s, h, d).astype(q_bshd.dtype)

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
        mask = jnp.pad(mask, ((0, 0), (0, s_pad - s)),
                       constant_values=-1.0)
    # (b, 1, s): the singleton middle dim satisfies the TPU block-shape
    # rule for the (1, 1, block_k) mask tiles
    mask = mask[:, None, :]

    out = _flash_core(q, k, v, mask, seed, float(sm_scale), block_q,
                      block_k, dropout_rate)
    out = jnp.transpose(out, (0, 2, 1, 3))[:, :s]
    return out.astype(q_bshd.dtype)
