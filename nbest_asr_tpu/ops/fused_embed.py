"""Fused embedding lookup: word + position + token-type + LayerNorm in
one Pallas pass (SURVEY.md §7 step 6 / BASELINE north star: "fused
embedding+segment-id lookup").

Design: the word table stays in HBM (`pltpu.ANY`); the kernel processes
``BN`` token rows per grid step, issuing one async DMA per row (ids come
in via `PrefetchScalarGridSpec`, so the copies can start before compute —
the same scattered-row pattern as paged attention's KV fetch), waits for
the batch of copies, then adds position/type rows (VMEM-resident — those
tables are small) and applies LayerNorm, all on the (BN, h) tile.

Backward: gathers' gradients are scatter-adds into the tables — exactly
what XLA emits for the reference formulation — so the custom VJP
recomputes the backward through the XLA ops (`_xla_embed`).  Parity with
the XLA oracle is pinned by tests/test_fused_kernels.py (values and
gradients, interpret mode) and on a real v5e chip (max diff 2e-6).

Measured (v5e, bert-base table, 128x64 tokens): 3.7 ms vs XLA's 1.8 ms —
XLA's native gather wins at this table size, so the kernel stays opt-in
(`EncoderConfig.use_fused_embedding`); it exists as the
scatter-gather-DMA reference pattern (per-token aligned-group fetch +
one-hot select) for cases XLA handles poorly (e.g. quantized tables).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN = 8  # token rows per grid step (sublane-aligned)


def _xla_embed(word, pos, type_, scale, bias, ids, type_ids,
               position_ids, eps):
    x = word[ids] + pos[position_ids] + type_[type_ids]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(word.dtype)


def _embed_kernel(ids_ref, tids_ref, word_hbm, pos_ref, type_ref,
                  scale_ref, bias_ref, out_ref, scratch, sems,
                  *, eps: float, seq_len: int):
    i = pl.program_id(0)

    # scatter-gather the BN word rows from HBM.  HBM arrays carry (8,128)
    # tiling, so single rows can't be sliced; the table arrives reshaped
    # as (V/8, 8, h) row *groups* — DMA each token's aligned group, then
    # select the row in-register with a one-hot matmul.
    copies = []
    subs = []
    for j in range(BN):
        token_id = ids_ref[i * BN + j]
        group = token_id // 8
        subs.append(token_id % 8)
        cp = pltpu.make_async_copy(
            word_hbm.at[group],     # (8, h) aligned group
            scratch.at[j],
            sems.at[j],
        )
        cp.start()
        copies.append(cp)
    for cp in copies:
        cp.wait()

    # positions: rows of one grid step are consecutive within a sequence
    # (BN | seq_len, row-major layout), so the BN position rows are one
    # aligned dynamic slice starting at (i*BN) % seq_len
    p_start = pl.multiple_of((i * BN) % seq_len, BN)
    pos_rows = pos_ref[pl.ds(p_start, BN), :].astype(jnp.float32)

    # token types: one-hot (BN, T) @ table (T, h) — a tiny matmul instead
    # of per-row dynamic slices (Mosaic requires 8-aligned slices)
    T = type_ref.shape[0]
    tids = jnp.stack([tids_ref[i * BN + j] for j in range(BN)])  # (BN,)
    onehot = (tids[:, None]
              == jax.lax.broadcasted_iota(jnp.int32, (BN, T), 1)
              ).astype(jnp.float32)
    type_rows = jnp.dot(onehot, type_ref[...].astype(jnp.float32),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)

    # select each token's row from its 8-row group: flatten the groups to
    # (BN*8, h) and pick with one (BN, BN*8) one-hot matmul (batched dots
    # don't lower on Mosaic)
    sub_ids = jnp.stack(subs)                              # (BN,)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (BN, 1), 0)[:, 0]
    target = row_idx * 8 + sub_ids                          # (BN,)
    onehot = (target[:, None]
              == jax.lax.broadcasted_iota(jnp.int32, (BN, BN * 8), 1)
              ).astype(jnp.float32)
    flat = scratch[...].reshape(BN * 8, -1).astype(jnp.float32)
    word_rows = jnp.dot(onehot, flat,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (BN, h)

    x = word_rows + pos_rows + type_rows

    mean = jnp.mean(x, axis=-1, keepdims=True)
    c = x - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    y = c * jax.lax.rsqrt(var + eps) \
        * scale_ref[...].astype(jnp.float32) \
        + bias_ref[...].astype(jnp.float32)
    out_ref[...] = y.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_embed_lookup(word, pos, type_, scale, bias, ids, type_ids,
                       seq_len: int, eps: float = 1e-12):
    """(b, s) int ids -> (b, s, h) normalized embeddings.

    ``seq_len`` is the static row length; position row = (flat row index
    mod seq_len).  Position offset (RoBERTa) must be pre-applied by
    slicing the table before the call.  Requires b*s % 8 == 0 (the packer
    guarantees len_multiple=8).
    """
    b, s = ids.shape
    h = word.shape[1]
    n = b * s
    assert n % BN == 0, f"rows {n} must be a multiple of {BN}"
    flat_ids = ids.reshape(n).astype(jnp.int32)
    flat_tids = type_ids.reshape(n).astype(jnp.int32)

    # view the table as aligned (V/8, 8, h) row groups (pad V to 8)
    V = word.shape[0]
    V_pad = ((V + 7) // 8) * 8
    word_g = word
    if V_pad != V:
        word_g = jnp.pad(word, ((0, V_pad - V), (0, 0)))
    word_g = word_g.reshape(V_pad // 8, 8, h)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // BN,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # word (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),         # pos table
            pl.BlockSpec(memory_space=pltpu.VMEM),         # type table
            pl.BlockSpec((1, h), lambda i, *_: (0, 0)),    # ln scale
            pl.BlockSpec((1, h), lambda i, *_: (0, 0)),    # ln bias
        ],
        out_specs=pl.BlockSpec((BN, h), lambda i, *_: (i, 0)),
        scratch_shapes=[
            # (BN, 8, h): one aligned 8-row group slot per token
            pltpu.VMEM((BN, 8, h), word.dtype),
            pltpu.SemaphoreType.DMA((BN,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_embed_kernel, eps=eps, seq_len=seq_len),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h), word.dtype),
    )(flat_ids, flat_tids, word_g, pos, type_,
      scale.reshape(1, h), bias.reshape(1, h))
    return out.reshape(b, s, h)


def _fwd(word, pos, type_, scale, bias, ids, type_ids, seq_len, eps):
    y = fused_embed_lookup(word, pos, type_, scale, bias, ids, type_ids,
                           seq_len, eps)
    return y, (word, pos, type_, scale, bias, ids, type_ids)


def _bwd(seq_len, eps, res, dy):
    # backward through the XLA formulation (scatter-adds into the tables
    # are what XLA generates anyway; the kernel is a fwd-path win)
    word, pos, type_, scale, bias, ids, type_ids = res
    b, s = ids.shape
    position_ids = jnp.broadcast_to(
        jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))

    def f(word, pos, type_, scale, bias):
        return _xla_embed(word, pos, type_, scale, bias, ids, type_ids,
                          position_ids, eps)

    _, vjp = jax.vjp(f, word, pos, type_, scale, bias)
    dw, dp, dt, dsc, db = vjp(dy)
    return dw, dp, dt, dsc, db, None, None


fused_embed_lookup.defvjp(_fwd, _bwd)
