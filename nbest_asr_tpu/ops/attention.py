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


def resolve_flash(flag) -> bool:
    """Resolve the tri-state --use_flash_attention flag: None = auto =
    Pallas attention on the training path when the backend is a real
    accelerator (it needs Mosaic lowering; interpret mode on CPU is for
    tests only)."""
    if flag is not None:
        return bool(flag)
    import jax

    return jax.default_backend() != "cpu"


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
    """Returns (b, s, n_heads, d_head).

    Routing (measured on v5e at DSTC2 scale, `tools/perf_probe.py`):
    the TRAINING path goes to the Pallas kernel — with attn dropout > 0
    its in-kernel regenerable masks make it ~2x faster than XLA fwd+bwd
    (XLA materializes the (b, h, s, s) probs + mask in HBM for the
    backward, and the host-PRNG mask generation breaks its fused-attention
    pattern); with dropout 0 it is ~14% slower but keeps the no-residual
    memory profile (batch 64 x 256 trains where XLA OOMs).  DETERMINISTIC
    (eval/serving) attention stays on XLA, whose own fusion runs at ~peak
    for the dropout-free forward and has no backward to pay for.
    """
    if use_flash and not deterministic:
        from .flash_attention import flash_attention

        if dropout_rate > 0.0:
            return flash_attention(q, k, v, attn_mask,
                                   dropout_rate=dropout_rate,
                                   dropout_rng=dropout_rng)
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
