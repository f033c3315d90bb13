"""Fused embedding lookup: word + position + token-type + LayerNorm in
one Pallas pass (SURVEY.md §7 step 6 / BASELINE north star: "fused
embedding+segment-id lookup").

Design: one grid step per token row.  `PrefetchScalarGridSpec` makes the
token ids available to the BlockSpec index maps, so the (1, h) block of
the word/type tables *is* the embedding row — Pallas's pipeline logic
then double-buffers the HBM row fetches against the LN compute
automatically.  Position rows are addressed arithmetically from the grid
index.

Backward: gathers' gradients are scatter-adds into the tables; those are
exactly what XLA emits for the reference formulation, so the custom VJP
recomputes the backward through the XLA ops (`_xla_embed`) — the kernel
is a forward-path (serving/eval) optimization and a worked example of
scalar-prefetch indexing.  Parity with the XLA oracle is pinned by
tests/test_fused_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xla_embed(word, pos, type_, scale, bias, ids, type_ids,
               position_ids, eps):
    x = word[ids] + pos[position_ids] + type_[type_ids]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(word.dtype)


def _embed_kernel(ids_ref, type_ids_ref, word_ref, pos_ref, type_ref,
                  scale_ref, bias_ref, out_ref, *, eps: float):
    x = (word_ref[...].astype(jnp.float32)
         + pos_ref[...].astype(jnp.float32)
         + type_ref[...].astype(jnp.float32))          # (1, h)
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

    ``seq_len`` is the static row length; position row = (grid index mod
    seq_len).  Position offset (RoBERTa) must be pre-applied by slicing
    the table before the call.
    """
    b, s = ids.shape
    h = word.shape[1]
    n = b * s
    flat_ids = ids.reshape(n).astype(jnp.int32)
    flat_tids = type_ids.reshape(n).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h), lambda i, ids_r, tids_r: (ids_r[i], 0)),
            pl.BlockSpec((1, h), lambda i, ids_r, tids_r: (i % seq_len, 0)),
            pl.BlockSpec((1, h), lambda i, ids_r, tids_r: (tids_r[i], 0)),
            pl.BlockSpec((1, h), lambda i, ids_r, tids_r: (0, 0)),
            pl.BlockSpec((1, h), lambda i, ids_r, tids_r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h),
                               lambda i, ids_r, tids_r: (i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_embed_kernel, eps=eps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h), word.dtype),
    )(flat_ids, flat_tids, word, pos, type_,
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
