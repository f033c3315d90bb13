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
    Pallas kernels on the training path when the backend is a TPU.  The
    kernels are Mosaic-only (pltpu.prng_seed, TPU CompilerParams): they
    cannot lower on GPU, and interpret mode on CPU is for tests only —
    so auto must check for "tpu" specifically, not merely "not cpu"."""
    if flag is not None:
        return bool(flag)
    import jax

    return jax.default_backend() == "tpu"


# Below this sequence length the XLA attention wins even while training
# with dropout (see the routing table in multi_head_attention); the
# threshold compares the *bucketed* (static) seq length.  The production
# knob is EncoderConfig.flash_min_seq / --flash_min_seq (serialized with
# the run config); the NBEST_FLASH_MIN_SEQ env var remains as a
# measurement-time override for probing only and wins when set.
import os as _os

DEFAULT_FLASH_MIN_SEQ = 160


def effective_flash_min_seq(cfg_value=None) -> int:
    env = _os.environ.get("NBEST_FLASH_MIN_SEQ")
    if env is not None:
        return int(env)
    return DEFAULT_FLASH_MIN_SEQ if cfg_value is None else int(cfg_value)


FLASH_MIN_SEQ = effective_flash_min_seq()

# Above the single-block ceiling (SB_MAX_SEQ=512) the TILED flash
# kernels measured SLOWER than XLA attention when XLA's materialized
# (b, h, s, s) probs actually fit: at batch 8 x seq 1024 fwd+bwd with
# dropout, XLA 3.47 ms vs tiled flash 5.45 ms (perf_probe --what attn
# --seq 1024 --flash_dropout, v5e).  But flash remains the MEMORY path:
# XLA's backward keeps probs + dropout mask + grads resident (~3x the
# probs bytes) and OOMs the 16G chip at large batch x seq.  Routing
# rule: tiled territory goes to XLA unless its attention residency
# would crowd HBM (budget 2 GiB — bf16 probs x3; batch 64 x 1024 is
# ~4.8 GiB -> flash).
_XLA_ATTN_RESIDENCY_BUDGET = 2 * 2 ** 30


def _flash_preferred(b: int, s: int, h: int, itemsize: int = 2) -> bool:
    """Static routing predicate for the training flash path at (batch,
    seq, heads).  Single-block territory (s <= 512): flash (measured
    winner at seq >= flash_min_seq).  Tiled territory: XLA unless its
    ~3x (b, h, s, s) backward residency — at the actual compute dtype's
    ``itemsize``, so f32 compute doubles the estimate — exceeds the
    budget."""
    from .flash_attention import SB_MAX_SEQ

    if s <= SB_MAX_SEQ:
        return True
    return 3 * b * h * s * s * itemsize > _XLA_ATTN_RESIDENCY_BUDGET


def multi_head_attention(
    q: jnp.ndarray,                # (b, s, n_heads, d_head)
    k: jnp.ndarray,
    v: jnp.ndarray,
    attn_mask: jnp.ndarray,        # (b, s) SEGMENT mask: 0 = pad,
    #                                k >= 1 = packed-segment id.  A
    #                                position attends exactly the
    #                                positions with ITS OWN mask value,
    #                                so the plain 1/0 padding mask keeps
    #                                its meaning (every valid position
    #                                attends every valid position) and a
    #                                multi-valued mask gives the
    #                                block-diagonal attention of
    #                                example packing (data/packing.py)
    #                                with zero extra inputs.  Pad
    #                                positions attend each other (their
    #                                outputs are never consumed: the
    #                                model reads CLS positions only and
    #                                valid queries never mix pad values
    #                                in, so no gradient flows through
    #                                them either).
    *,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    deterministic: bool = True,
    use_flash: bool = False,
    flash_min_seq: "int | None" = None,
) -> jnp.ndarray:
    """Returns (b, s, n_heads, d_head).

    Routing (measured on v5e at DSTC2 bucket shapes with attn dropout
    0.1, fwd+bwd per layer, `tools/perf_probe.py --what attn
    --flash_dropout`):

    =====  ========  =========  ======
    seq    XLA (ms)  flash (ms) winner
    =====  ========  =========  ======
    64     0.375     0.859      XLA
    96     0.264     0.650      XLA
    160    0.741     0.655      flash
    256    0.713     0.577      flash
    =====  ========  =========  ======

    The TRAINING path goes to the Pallas kernel for seq >= 160 (where
    its in-kernel regenerable dropout masks beat XLA, which materializes
    the (b, h, s, s) probs + mask in HBM for the backward); short buckets
    stay on XLA, whose tiny-shape fusion the single-block kernel's
    per-batch-row grid cannot amortize.  DETERMINISTIC (eval/serving)
    attention stays on XLA everywhere: its fused dropout-free forward
    runs at ~peak and has no backward to pay for.  Flash also remains the
    memory path: batch 64 x 256 trains under flash where XLA OOMs the
    16G chip.

    Above the single-block ceiling (seq > 512) the tiled kernels
    measured slower than XLA at shapes where XLA's probs residency
    fits (batch 8 x 1024 w/ dropout: XLA 3.47 ms vs 5.45 fwd+bwd), so
    tiled flash is taken only when that residency would crowd HBM —
    see ``_flash_preferred``.
    """
    if (use_flash and not deterministic
            and q.shape[1] >= effective_flash_min_seq(flash_min_seq)
            and _flash_preferred(*q.shape[:3], q.dtype.itemsize)):
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
    m = attn_mask.astype(acc)
    same_seg = m[:, None, None, :] == m[:, None, :, None]   # (b,1,s,s)
    logits = jnp.where(same_seg, logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1)
    if not deterministic and dropout_rate > 0.0:
        probs = dropout(probs, dropout_rate, dropout_rng, deterministic)
    probs = probs.astype(v.dtype)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=acc
    )
    return out.astype(q.dtype)
