"""Int8-forward training FFN megakernel (VERDICT r3 next #5) —
interpret-mode oracles.

Contract of `fused_ffn_block_int8_train`:
- FORWARD == the int8 XLA chain (quant.dense_int8 for both GEMMs +
  GELU/residual/LN), i.e. real int8 numerics;
- BACKWARD == the bf16/f32 megakernel backward fed the int8 forward's
  saved activations: gradients computed as if the forward were full
  precision (straight-through w.r.t. quantization) except the LN/residual
  head, which differentiates through the ACTUAL int8 y2d.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from nbest_asr_tpu.ops.fused_ffn import (fused_ffn_block,
                                         fused_ffn_block_int8_train)
from nbest_asr_tpu.ops.layers import gelu, layer_norm
from nbest_asr_tpu.ops.quant import dense_int8, quantize_weight

H, INTER = 128, 256
EPS = 1e-12


def _inputs(n=48, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, H) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.randn(H, INTER) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(INTER) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.randn(INTER, H) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(H) * 0.02, jnp.float32)
    ls = jnp.asarray(1.0 + 0.1 * rng.randn(H), jnp.float32)
    lb = jnp.asarray(0.1 * rng.randn(H), jnp.float32)
    return x, w1, b1, w2, b2, ls, lb


def _int8_oracle(x, w1, b1, w2, b2, ls, lb):
    """The quantized XLA chain (`ops/quant.py` math)."""
    w1q, w1s = quantize_weight(w1, axis_in=-2)
    w2q, w2s = quantize_weight(w2, axis_in=-2)
    g = gelu(dense_int8(x, w1q, w1s, b1))
    y2 = dense_int8(g, w2q, w2s, b2)
    return layer_norm(x + y2, ls, lb, EPS)


def test_int8_forward_matches_quantized_oracle():
    args = _inputs()
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        out = fused_ffn_block_int8_train(*args, eps=EPS)
        ref = _int8_oracle(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)
    # and it is genuinely quantized: differs from the full-precision
    # block beyond float noise
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        full = fused_ffn_block(*args, eps=EPS)
    assert np.max(np.abs(np.asarray(out) - np.asarray(full))) > 1e-3


def test_int8_backward_is_straight_through():
    """Gradients: LN/residual head differentiates through the int8
    forward's saved y2d; the GEMM chain uses full-precision weights.
    Oracle: the same hybrid computed in XLA."""
    x, w1, b1, w2, b2, ls, lb = _inputs(n=32, seed=3)

    def hybrid_oracle(x, w1, b1, w2, b2, ls, lb):
        # forward values from the int8 chain, backward graph from the
        # full-precision chain — emulated with stop_gradient splicing:
        # y2_used = y2_fp + sg(y2_int8 - y2_fp)
        w1q, w1s = quantize_weight(w1, axis_in=-2)
        w2q, w2s = quantize_weight(w2, axis_in=-2)
        y2_i8 = dense_int8(gelu(dense_int8(x, w1q, w1s, b1)),
                           w2q, w2s, b2)
        y2_fp = gelu(x @ w1 + b1) @ w2 + b2
        y2 = y2_fp + jax.lax.stop_gradient(y2_i8 - y2_fp)
        return layer_norm(x + y2, ls, lb, EPS)

    def loss_kernel(*a):
        return jnp.sum(fused_ffn_block_int8_train(*a, eps=EPS) ** 2)

    def loss_oracle(*a):
        return jnp.sum(hybrid_oracle(*a) ** 2)

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        g_k = jax.grad(loss_kernel, argnums=tuple(range(7)))(
            x, w1, b1, w2, b2, ls, lb)
        g_o = jax.grad(loss_oracle, argnums=tuple(range(7)))(
            x, w1, b1, w2, b2, ls, lb)
    names = ("x", "w1", "b1", "w2", "b2", "ls", "lb")
    for name, a, b in zip(names, g_k, g_o):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3,
            err_msg=f"grad {name}")


def test_int8_train_requires_nonstreaming_layout():
    x, w1, b1, w2, b2, ls, lb = _inputs()
    big_w1 = jnp.zeros((H, 3072), jnp.float32)
    big_w2 = jnp.zeros((3072, H), jnp.float32)
    with pytest.raises(ValueError, match="non-streaming"):
        fused_ffn_block_int8_train(x, big_w1, jnp.zeros(3072), big_w2,
                                   b2, ls, lb, eps=EPS)
