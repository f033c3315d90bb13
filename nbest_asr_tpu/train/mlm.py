"""Masked-language-model pretraining objective over the shared encoder.

The reference's protocol fine-tunes a *pretrained* encoder
(`n_best_asr_bert.py:480-487`; paper numbers `README.md:74-77`), but no
pretrained checkpoints ship with this offline mirror
(`.MISSING_LARGE_BLOBS`).  This module provides the missing stage: BERT-
style MLM pretraining of the in-repo encoder on the DSTC2 text itself, so
`tools/pretrain_mlm.py` can produce a local checkpoint consumable through
the EXISTING pretrained-init path (``--tod_pre_trained_model`` ->
`models/hf_convert.py:load_pretrained_encoder`).

Design (standard BERT MLM, Devlin et al. 2018):
- 15% of maskable positions selected per step, of which 80% -> ``[MASK]``,
  10% -> a random vocab id, 10% -> kept.  Selection happens ON DEVICE
  inside the jitted step from the step RNG, so every pass over the small
  corpus sees fresh masks (no host-side masking work, no materialized
  masked copies of the dataset).
- Prediction head: dense(h->h) + GELU + LayerNorm, decoder tied to the
  word-embedding matrix plus a free output bias — exactly the HF
  ``cls.predictions.*`` layout so the head exports losslessly alongside
  the encoder.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.encoder import EncoderConfig, encoder_forward
from ..ops.layers import dense, gelu, layer_norm

MLM_IGNORE = -1  # label id for unmasked positions


def init_mlm_head_params(rng, cfg: EncoderConfig) -> dict:
    h = cfg.hidden_size
    k = (jax.random.truncated_normal(rng, -2.0, 2.0, (h, h), jnp.float32)
         * cfg.initializer_range)
    return {
        "transform_kernel": k,
        "transform_bias": jnp.zeros((h,), jnp.float32),
        "ln_scale": jnp.ones((h,), jnp.float32),
        "ln_bias": jnp.zeros((h,), jnp.float32),
        "decoder_bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
    }


def mlm_head_export_state(head: dict, word_emb) -> Dict:
    """Head params -> HF ``cls.predictions.*`` tensors (numpy, torch
    (out, in) layout) for `export_hf_checkpoint`'s ``extra_state``."""
    import numpy as np

    return {
        "cls.predictions.transform.dense.weight": np.asarray(
            head["transform_kernel"]).T,
        "cls.predictions.transform.dense.bias": np.asarray(
            head["transform_bias"]),
        "cls.predictions.transform.LayerNorm.weight": np.asarray(
            head["ln_scale"]),
        "cls.predictions.transform.LayerNorm.bias": np.asarray(
            head["ln_bias"]),
        "cls.predictions.bias": np.asarray(head["decoder_bias"]),
        "cls.predictions.decoder.weight": np.asarray(word_emb),
        "cls.predictions.decoder.bias": np.asarray(head["decoder_bias"]),
    }


def apply_mlm_mask(rng, input_ids: jnp.ndarray, maskable: jnp.ndarray,
                   mask_token_id: int, vocab_size: int,
                   mask_rate: float = 0.15
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (masked_ids, labels); labels are MLM_IGNORE off-target."""
    r_sel, r_kind, r_rand = jax.random.split(rng, 3)
    shape = input_ids.shape
    sel = (jax.random.uniform(r_sel, shape) < mask_rate) & maskable
    labels = jnp.where(sel, input_ids, MLM_IGNORE)
    u = jax.random.uniform(r_kind, shape)
    rand_ids = jax.random.randint(r_rand, shape, 0, vocab_size,
                                  dtype=input_ids.dtype)
    replacement = jnp.where(
        u < 0.8, jnp.asarray(mask_token_id, input_ids.dtype),
        jnp.where(u < 0.9, rand_ids, input_ids))
    return jnp.where(sel, replacement, input_ids), labels


def mlm_loss(params: dict, masked_ids: jnp.ndarray, labels: jnp.ndarray,
             attn_mask: jnp.ndarray, segment_ids, cfg: EncoderConfig,
             rng) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean cross-entropy over masked positions (and the masked count)."""
    x = encoder_forward(params["encoder"], masked_ids, attn_mask,
                        segment_ids, cfg, deterministic=False, rng=rng)
    head = params["mlm_head"]
    cdt = cfg.cdtype
    h = dense(x, head["transform_kernel"].astype(cdt),
              head["transform_bias"])
    h = layer_norm(gelu(h), head["ln_scale"], head["ln_bias"],
                   cfg.layer_norm_eps)
    word = params["encoder"]["embeddings"]["word"].astype(cdt)  # tied
    logits = jnp.dot(h, word.T, preferred_element_type=jnp.float32)
    logits = logits + head["decoder_bias"].astype(jnp.float32)

    on_target = labels != MLM_IGNORE
    safe_labels = jnp.where(on_target, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    token_nll = -jnp.take_along_axis(
        logp, safe_labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    n_masked = jnp.sum(on_target)
    total = jnp.sum(jnp.where(on_target, token_nll, 0.0))
    return total / jnp.maximum(n_masked, 1), n_masked


def make_mlm_train_step(cfg: EncoderConfig, tx, mask_token_id: int,
                        mask_rate: float = 0.15):
    """Jitted (params, opt_state, batch, rng) -> (params, opt_state, loss).

    ``batch``: dict of input_ids/attn_mask/segment_ids/maskable arrays.
    Masking is regenerated from ``rng`` every invocation.
    """

    def step(params, opt_state, batch, rng):
        r_mask, r_drop = jax.random.split(rng)
        masked_ids, labels = apply_mlm_mask(
            r_mask, batch["input_ids"], batch["maskable"],
            mask_token_id, cfg.vocab_size, mask_rate)

        def loss_fn(p):
            loss, n = mlm_loss(p, masked_ids, labels, batch["attn_mask"],
                               batch["segment_ids"], cfg, r_drop)
            return loss, n

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))
