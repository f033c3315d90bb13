"""Fused bias-add + exact GELU Pallas kernel (fwd + custom VJP).

SURVEY.md §7 step 6.  Elementwise, so XLA usually fuses the equivalent
chain into the producing matmul already — this kernel exists to (a) keep
the hot FFN path explicit and tunable and (b) serve as the simplest
worked example of the custom-VJP kernel pattern used by the bigger
kernels.  Wired behind ``EncoderConfig.use_fused_gelu``; default off, the
XLA path in `ops/layers.py` is the oracle.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK_ROWS = 256
_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 — far
    below bf16 resolution).  `lax.erf` has no Pallas TPU lowering."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _fwd_kernel(x_ref, b_ref, y_ref):
    s = x_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf(s * _INV_SQRT2))
    y_ref[...] = (s * cdf).astype(y_ref.dtype)


def _bwd_kernel(x_ref, b_ref, dy_ref, dx_ref):
    s = x_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf(s * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * s * s) * _INV_SQRT2PI
    dx = dy_ref[...].astype(jnp.float32) * (cdf + s * pdf)
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _call(kernel, x2, b2, *extra):
    n, h = x2.shape
    bn = min(BLOCK_ROWS, n)
    bh = min(h, 1024)  # block columns too: (256, 3072) blocks blow VMEM
    assert h % bh == 0
    grid = (n // bn, h // bh)
    tile = pl.BlockSpec((bn, bh), lambda i, j: (i, j))
    specs = [tile, pl.BlockSpec((1, bh), lambda i, j: (0, j))] \
        + [tile for _ in extra]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs,
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((n, h), x2.dtype),
    )(x2, b2, *extra)


@functools.partial(jax.custom_vjp)
def _fused_gelu_2d(x, b):
    return _call(_fwd_kernel, x, b)


def _fused_gelu_2d_fwd(x, b):
    return _call(_fwd_kernel, x, b), (x, b)


def _fused_gelu_2d_bwd(res, dy):
    x, b = res
    dx = _call(_bwd_kernel, x, b, dy)
    db = jnp.sum(dx.astype(jnp.float32), axis=0)
    return dx, db


_fused_gelu_2d.defvjp(_fused_gelu_2d_fwd, _fused_gelu_2d_bwd)


def fused_bias_gelu(x: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """gelu(x + bias) over the last axis; any leading dims."""
    shape = x.shape
    h = shape[-1]
    n = 1
    for d in shape[:-1]:
        n *= d
    x2 = x.reshape(n, h)
    bn = min(BLOCK_ROWS, _round_up(n, 8))
    n_pad = _round_up(n, bn)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
    y = _fused_gelu_2d(x2, bias.reshape(1, h))
    return y[:n].reshape(shape)
