"""Fused residual-add + LayerNorm Pallas kernel (fwd + custom VJP).

SURVEY.md §7 step 6: one VMEM pass computes ``LN(x + r)`` and stashes the
f32 normalization statistics for the backward, instead of XLA's separate
add + reduce + scale HLOs.  The XLA implementation in `ops/layers.py`
remains the correctness oracle; the encoder selects this kernel via
``EncoderConfig.use_fused_ln``.

Shapes: (rows, hidden) with hidden a multiple of 128 lanes (BERT's 768
is); rows are tiled in blocks of 256.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------- #
# forward: y = (x + r - mean) * rstd * scale + bias
# --------------------------------------------------------------------- #

def _fwd_kernel(x_ref, r_ref, scale_ref, bias_ref, y_ref, mean_ref,
                rstd_ref, *, eps: float):
    s = (x_ref[...].astype(jnp.float32)
         + r_ref[...].astype(jnp.float32))            # (rows, h)
    mean = jnp.mean(s, axis=1, keepdims=True)         # (rows, 1)
    c = s - mean
    var = jnp.mean(c * c, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = c * rstd * scale_ref[...].astype(jnp.float32) \
        + bias_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)
    mean_ref[...] = jnp.broadcast_to(mean, mean_ref.shape)
    rstd_ref[...] = jnp.broadcast_to(rstd, rstd_ref.shape)


def _fwd_call(x, r, scale, bias, eps):
    n, h = x.shape
    bn = min(BLOCK_ROWS, n)
    grid = (n // bn,)
    y, mean, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, h), lambda i: (i, 0)),
            pl.BlockSpec((bn, h), lambda i: (i, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bn, h), lambda i: (i, 0)),
            pl.BlockSpec((bn, 128), lambda i: (i, 0)),
            pl.BlockSpec((bn, 128), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h), x.dtype),
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
        ),
    )(x, r, scale.reshape(1, h), bias.reshape(1, h))
    return y, mean, rstd


# --------------------------------------------------------------------- #
# backward
# --------------------------------------------------------------------- #

def _bwd_kernel(x_ref, r_ref, scale_ref, mean_ref, rstd_ref, dy_ref,
                dx_ref, dscale_ref, dbias_ref, *, n_blocks: int):
    i = pl.program_id(0)

    s = (x_ref[...].astype(jnp.float32)
         + r_ref[...].astype(jnp.float32))
    mean = mean_ref[...][:, :1]
    rstd = rstd_ref[...][:, :1]
    xhat = (s - mean) * rstd                           # (rows, h)
    dy = dy_ref[...].astype(jnp.float32)
    g = dy * scale_ref[...].astype(jnp.float32)        # (rows, h)

    h = s.shape[1]
    m1 = jnp.mean(g, axis=1, keepdims=True)
    m2 = jnp.mean(g * xhat, axis=1, keepdims=True)
    dx = (g - m1 - xhat * m2) * rstd
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dscale_ref[...] = jnp.zeros_like(dscale_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dscale_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbias_ref[...] += jnp.sum(dy, axis=0, keepdims=True)


def _bwd_call(eps, res, dy):
    x, r, scale, mean, rstd = res
    n, h = x.shape
    bn = min(BLOCK_ROWS, n)
    grid = (n // bn,)
    dx, dscale, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, n_blocks=n // bn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, h), lambda i: (i, 0)),
            pl.BlockSpec((bn, h), lambda i: (i, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((bn, 128), lambda i: (i, 0)),
            pl.BlockSpec((bn, 128), lambda i: (i, 0)),
            pl.BlockSpec((bn, h), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bn, h), lambda i: (i, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h), x.dtype),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # dscale/dbias accumulate
        ),
    )(x, r, scale.reshape(1, h), mean, rstd, dy)
    # residual-add: ds/dx == ds/dr == dx
    return dx, dx, dscale.reshape(h), dbias.reshape(h)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_ln_2d(x, r, scale, bias, eps):
    y, _, _ = _fwd_call(x, r, scale, bias, eps)
    return y


def _fused_ln_2d_fwd(x, r, scale, bias, eps):
    y, mean, rstd = _fwd_call(x, r, scale, bias, eps)
    return y, (x, r, scale, mean, rstd)


_fused_ln_2d.defvjp(_fused_ln_2d_fwd, _bwd_call)


def fused_residual_layer_norm(x: jnp.ndarray, residual: jnp.ndarray,
                              scale: jnp.ndarray, bias: jnp.ndarray,
                              eps: float = 1e-12) -> jnp.ndarray:
    """LN(x + residual) over the last axis; any leading batch dims."""
    shape = x.shape
    h = shape[-1]
    n = 1
    for d in shape[:-1]:
        n *= d
    x2 = x.reshape(n, h)
    r2 = residual.reshape(n, h)
    n_pad = _round_up(n, 8)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
        r2 = jnp.pad(r2, ((0, n_pad - n), (0, 0)))
    # rows blocked at BLOCK_ROWS; ensure divisibility
    bn = min(BLOCK_ROWS, n_pad)
    n_pad2 = _round_up(n_pad, bn)
    if n_pad2 != n_pad:
        x2 = jnp.pad(x2, ((0, n_pad2 - n_pad), (0, 0)))
        r2 = jnp.pad(r2, ((0, n_pad2 - n_pad), (0, 0)))
    y = _fused_ln_2d(x2, r2, scale, bias, float(eps))
    return y[:n].reshape(shape)
