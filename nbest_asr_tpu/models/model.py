"""Full model: encoder + hierarchical classifier.

Parity surface: `models/model.py:11-83` (`TOD_ASR_Transformer_STC`).  The
forward encodes the ASR input and (optionally) the manual-transcript input
with the *same shared encoder weights* (ref :50-58), takes each sequence's
[CLS] vector (ref :47, :58), feeds the selected one to the classifier
(ref :60-67) and returns
``(top_scores, bottom_probs, final_scores, asr_cls, trans_cls)``
(ref :73; the dict-of-groups becomes the dense ``bottom_probs``).

Checkpoint save/load is handled by Orbax in the training loop (the
reference's raw ``state_dict`` torch.save at :75-83 has no optimizer state
and no resume; ours checkpoints params+opt_state+step, SURVEY.md §5.4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .encoder import EncoderConfig, encoder_forward, init_encoder_params
from .heads import hierarchical_head, init_head_params


@dataclass(frozen=True)
class ModelConfig:
    encoder: EncoderConfig
    n_top: int
    n_bottom: int
    head_dropout: float = 0.0      # reference --dropout (default 0.0)

    @property
    def hidden(self) -> int:
        return self.encoder.hidden_size


def init_model_params(rng, cfg: ModelConfig) -> dict:
    k_enc, k_head = jax.random.split(rng)
    return {
        "encoder": init_encoder_params(k_enc, cfg.encoder),
        "head": init_head_params(k_head, cfg.hidden, cfg.n_top,
                                 cfg.n_bottom),
    }


def model_forward(
    params: dict,
    cfg: ModelConfig,
    hier: Dict[str, jnp.ndarray],
    input_ids: jnp.ndarray,
    attn_mask: jnp.ndarray,
    token_type_ids: Optional[jnp.ndarray] = None,
    trans_input_ids: Optional[jnp.ndarray] = None,
    trans_attn_mask: Optional[jnp.ndarray] = None,
    trans_token_type_ids: Optional[jnp.ndarray] = None,
    *,
    classifier_input_type: str = "asr",
    deterministic: bool = True,
    rng=None,
    position_ids: Optional[jnp.ndarray] = None,
    trans_position_ids: Optional[jnp.ndarray] = None,
    cls_positions: Optional[jnp.ndarray] = None,
    trans_cls_positions: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           Optional[jnp.ndarray]]:
    """Returns (top_scores, bottom_probs, final_scores, asr_cls, trans_cls).

    ``trans_*`` arrays trigger the second (shared-weight) encoder pass the
    reference runs for the transcript stream (ref `models/model.py:50-58`);
    pass None to skip it (eval-time single-stream mode).

    EXAMPLE PACKING (data/packing.py): when several utterances share one
    row, ``cls_positions`` (b, n_seg) holds each packed segment's [CLS]
    offset; the per-segment CLS vectors are gathered and flattened to
    (b * n_seg, h), so every downstream output gets one row per
    UTTERANCE (invalid segments point at offset 0 and are zeroed by the
    caller's example mask).  ``position_ids`` restarts positions per
    segment; ``attn_mask`` carries the packed segment ids (see
    ops/attention.py).  With all four packing args None the behavior is
    the original single-utterance-per-row forward (CLS at position 0,
    ref :47).
    """
    if rng is None:
        if not deterministic:
            # a silent PRNGKey(0) default would make dropout identical
            # every step — a training-quality bug with plausible logs
            raise ValueError(
                "model_forward: deterministic=False requires an rng")
        rng = jax.random.PRNGKey(0)
    r_asr, r_trans, r_head = jax.random.split(rng, 3)

    from ..ops.layers import acc_dtype

    def take_cls(seq, positions):
        if positions is None:
            return seq[:, 0, :].astype(acc_dtype(seq.dtype))
        # (b, n_seg, h) per-segment CLS gather -> one row per utterance
        g = jnp.take_along_axis(seq, positions[:, :, None], axis=1)
        return g.reshape(-1, seq.shape[-1]).astype(acc_dtype(seq.dtype))

    seq_out = encoder_forward(
        params["encoder"], input_ids, attn_mask, token_type_ids,
        cfg.encoder, deterministic=deterministic, rng=r_asr,
        position_ids=position_ids)
    asr_cls = take_cls(seq_out, cls_positions)

    trans_cls = None
    if trans_input_ids is not None:
        trans_out = encoder_forward(
            params["encoder"], trans_input_ids, trans_attn_mask,
            trans_token_type_ids, cfg.encoder,
            deterministic=deterministic, rng=r_trans,
            position_ids=trans_position_ids)
        trans_cls = take_cls(trans_out, trans_cls_positions)

    feats = trans_cls if (classifier_input_type == "transcript"
                          and trans_cls is not None) else asr_cls
    top_scores, bottom_probs, final_scores = hierarchical_head(
        params["head"], feats, hier,
        dropout_rate=cfg.head_dropout, rng=r_head,
        deterministic=deterministic)
    return top_scores, bottom_probs, final_scores, asr_cls, trans_cls
