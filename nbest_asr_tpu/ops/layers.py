"""Elementary compute ops for the encoder, XLA-path implementations.

These are the correctness oracles; the Pallas kernels in this package
(`fused_ln.py`, `flash_attention.py`) are wired behind config flags and
tested for numerical equivalence against these (SURVEY.md §7 step 6).

Everything is shape-static and fusion-friendly: XLA fuses bias+GELU and
residual+LayerNorm into the surrounding matmuls on TPU; the Pallas variants
exist to go beyond that on the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def acc_dtype(dtype) -> jnp.dtype:
    """Accumulation dtype: at least f32 (bf16 inputs accumulate in f32; f64
    inputs — used by the x64 training-dynamics parity tests — stay f64)."""
    return jnp.promote_types(dtype, jnp.float32)


def dense(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
          compute_dtype=None) -> jnp.ndarray:
    """y = x @ kernel + bias with an explicit MXU accumulation dtype."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    acc = acc_dtype(x.dtype)
    y = jnp.dot(x, kernel, preferred_element_type=acc)
    return (y + bias.astype(acc)).astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — matches HF BERT's default activation, which the
    reference encoder uses via transformers' BertModel
    (`models/model.py:19, 42-46`)."""
    return jax.nn.gelu(x, approximate=False)


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-12) -> jnp.ndarray:
    """LayerNorm in (at least) f32 regardless of activation dtype
    (bf16-safe)."""
    dtype = x.dtype
    acc = acc_dtype(dtype)
    x32 = x.astype(acc)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(acc) + bias.astype(acc)
    return y.astype(dtype)


def dropout(x: jnp.ndarray, rate: float, rng, deterministic: bool
            ) -> jnp.ndarray:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
