"""Multi-head self-attention: XLA path + optional Pallas flash path.

The reference's attention lives inside HF transformers' BertModel (external
CUDA-backed library, `models/model.py:19`); here it is first-class.  The XLA
path below is the correctness oracle; `use_flash=True` routes to the
blockwise Pallas kernel in `flash_attention.py` (TPU only).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp

from .layers import dropout


def multi_head_attention(
    q: jnp.ndarray,                # (b, s, n_heads, d_head)
    k: jnp.ndarray,
    v: jnp.ndarray,
    attn_mask: jnp.ndarray,        # (b, s) 1.0 = attend, 0.0 = pad
    *,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    deterministic: bool = True,
    use_flash: bool = False,
) -> jnp.ndarray:
    """Returns (b, s, n_heads, d_head)."""
    if use_flash and (deterministic or dropout_rate == 0.0):
        # attention-prob dropout is not implemented in the flash kernel;
        # callers fall back to the XLA path while training with dropout > 0.
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, attn_mask)

    from .layers import acc_dtype

    b, s, h, d = q.shape
    acc = acc_dtype(q.dtype)
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=acc))
    # (b, h, s, s) logits in >= f32 for numerics
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=acc
    ) * scale
    bias = (1.0 - attn_mask[:, None, None, :].astype(acc)) * -1e9
    logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    if not deterministic and dropout_rate > 0.0:
        probs = dropout(probs, dropout_rate, dropout_rng, deterministic)
    probs = probs.astype(v.dtype)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=acc
    )
    return out.astype(q.dtype)
