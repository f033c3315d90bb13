"""Int8 weight quantization for the serving path.

TPU-native rationale: v5e's MXU runs int8×int8→int32 at 394 TOPS — 2×
the bf16 rate — and int8 weights halve the encoder's weight HBM
traffic.  The scheme is the standard symmetric one (pallas guide §19,
"Quantization Kernels", here expressed in XLA which already lowers
int8 `dot_general` onto the MXU):

- **Weights**: per-output-channel symmetric int8, quantized offline at
  `Predictor` construction (`quantize_encoder_params`).  Scales are
  f32 ``amax/127`` over the input axis.
- **Activations**: dynamic per-token symmetric int8 computed inside the
  forward (`dense_int8`) — one `abs-max` reduction per GEMM input, the
  rescale folds into the output epilogue.

Training and the XLA correctness oracle stay f32/bf16; quantization is
a pure serving-time transform of the parameter tree (the 4 encoder GEMM
kernels per layer).  Embeddings (gather, not matmul), LayerNorm, biases
and the classifier heads (768→30/161 — negligible) stay f32.

The reference has no serving or quantization story at all (its only
inference is the `--testing` re-evaluation, `n_best_asr_bert.py:442`).

Measured on v5e at DSTC2 serving shapes (batch 64 × seq ≤ 256,
BERT-base, `tools/serve_bench.py --quantize int8`): int8 is **slower**
than bf16 — 43.2 ms/batch async vs 36.4 — because the per-GEMM dynamic
activation quant adds elementwise passes to an already
elementwise-bound workload (NOTES_r2.md MFU analysis).  What int8 buys
here is *memory*: encoder GEMM weights drop 4× (f32 340 MB → 85 MB),
which matters for larger models or many-model serving, not latency at
this scale.  Accuracy: scores track f32 within 0.05 and decoded labels
agree on ≥11/12 utterances (test_int8_quantized_predictor).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray, axis_in: int = -2):
    """Per-output-channel symmetric int8 over the input axis.

    w: (..., in, out) f32 → (q int8 same shape, scale f32 with the input
    axis reduced to 1)."""
    amax = jnp.max(jnp.abs(w), axis=axis_in, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dgrad_int8(g: jnp.ndarray, wq: jnp.ndarray,
               w_scale: jnp.ndarray) -> jnp.ndarray:
    """dx = g @ dequant(wq)^T via an int8×int8→int32 MXU dot (the
    input-gradient GEMM of the int8-training backward, and its XLA
    oracle).

    The contraction runs over the weight's OUTPUT axis, so the
    per-output-channel scales cannot factor out of the int8 dot the way
    they do in `dense_int8`; instead they fold EXACTLY into ``g``
    before its per-token dynamic quantization:
    ``sum_o q(g*ws)[o] * wq[i,o] * g_scale == sum_o g[o] * w[i,o]``
    up to the activation-quant rounding of the scaled gradient.

    g: (..., out) bf16/f32; wq: (in, out) int8; w_scale: (1, out) f32.
    Returns f32 (..., in).
    """
    gf = g.astype(jnp.float32) * w_scale.reshape(
        (1,) * (g.ndim - 1) + (-1,))
    amax = jnp.max(jnp.abs(gf), axis=-1, keepdims=True)
    g_scale = jnp.maximum(amax, 1e-12) / 127.0
    gq = jnp.clip(jnp.round(gf / g_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        gq, wq, (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * g_scale


def dense_int8(x: jnp.ndarray, wq: jnp.ndarray, w_scale: jnp.ndarray,
               bias: jnp.ndarray) -> jnp.ndarray:
    """y = x @ dequant(wq) + bias via an int8×int8→int32 MXU dot.

    x: (..., in) bf16/f32; wq: (in, out) int8; w_scale: (1, out) f32.
    Activations are dynamically quantized per token (row abs-max)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * x_scale * w_scale
    return (out + bias.astype(jnp.float32)).astype(x.dtype)


_LAYER_GEMM_KERNELS = ("qkv_kernel", "attn_out_kernel",
                       "ffn_in_kernel", "ffn_out_kernel")


def quantize_encoder_params(params: dict) -> dict:
    """Return a copy of the model param tree with the encoder's stacked
    GEMM kernels replaced by ``{"q": int8 (L, in, out), "scale": f32
    (L, 1, out)}`` dicts.  `encoder_forward` dispatches on the dict
    leaves; everything else is untouched."""
    params = dict(params)
    enc = dict(params["encoder"])
    layers = dict(enc["layers"])
    for name in _LAYER_GEMM_KERNELS:
        q, scale = quantize_weight(layers[name], axis_in=-2)
        layers[name] = {"q": q, "scale": scale}
    enc["layers"] = layers
    params["encoder"] = enc
    return params


def is_quantized(kernel) -> bool:
    return isinstance(kernel, dict)
