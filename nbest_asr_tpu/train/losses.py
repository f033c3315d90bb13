"""Compound loss stack — one jit-compiled scalar.

Parity surface (`n_best_asr_bert.py:145-195`):

1. bottom BCE, **sum** reduction, on ``final_scores`` vs the multi-hot
   labels (ref :173-177; ``nn.BCELoss(reduction='sum')`` :572).
2. top BCE, sum reduction, on ``top_scores`` vs ``labels @ bottom2top_mat``
   (ref :180-185, `utils/STC_util.py:4-7`).  The matmul target is kept
   *unclamped* on purpose: two gold bottoms sharing a top yield target 2.0
   in the reference too, and the BCE formula is evaluated as-is — this
   affects training dynamics and is preserved (SURVEY.md §7 "hard parts").
3. per-group CE: for every multi-bottom top group, NLL(sum over batch) of
   ``log(group_softmax + 1e-12)`` at the gold member — empty groups hit the
   group's **last** member (the NONE label), ref `cal_ce_loss` :145-157 +
   `onehot_to_scalar` (`STC_util.py:29-51`); averaged over groups.
   **Deliberate generalization** (pinned by
   `tests/test_train_stack.py::test_group_ce_multi_gold_generalization`):
   where the reference *asserts* at most one gold bottom per group
   (`STC_util.py:34` — it crashes on >= 2), this formulation accepts
   multi-gold rows: per group the loss is ``-(sum of gold logps +
   (1 - n_gold) * NONE logp)`` — for n_gold == 0/1 this is exactly the
   reference's NLL; for n_gold >= 2 it rewards every gold member and
   *penalizes* NONE mass with weight (n_gold - 1).  DSTC2 data never
   produces multi-gold groups (the reference would crash if it did), so
   the paths agree on all reference-reachable inputs.
4. optional MSE (mean) between the ASR-[CLS] and transcript-[CLS]
   representations — ``--add_l2_loss``, train only (ref :166-170; eval
   calls the loss without hidden states, ref :331).

torch's BCELoss clamps log terms at -100; replicated here for bit-level
faithfulness of the sum-reduced losses.  The clamp must also be
*gradient*-safe: ``jnp.maximum(jnp.log(p), -100)`` is forward-correct but
its VJP computes ``0 * (1/p)`` at ``p == 0`` — NaN — and a fully
converged run (train acc 100%, probs saturated to exact 0/1) then NaNs
the whole state on the next step (observed at epoch 29 of the 40-epoch
quality smoke).  torch never hits this because BCELoss's *backward*
clamps its denominator (``(p-t)/max(p(1-p), eps)``) and the saturated
sigmoid derivative zeroes the product; `_safe_log`/`_safe_log1m` below
reproduce that effective behavior (identical forward values, gradient
exactly 0 at saturation) with the double-where pattern.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from ..ops.layers import acc_dtype

# exp(-100): below this, the -100 clamp is active and the gradient must
# be cut BEFORE the log to avoid 0 * inf in the VJP
_LOG_CLAMP_TINY = 3.7200760e-44


def _safe_log(p):
    """max(log(p), -100) with a NaN-free VJP (grad 0 where clamped)."""
    ok = p > _LOG_CLAMP_TINY
    ps = jnp.where(ok, p, 1.0)
    return jnp.where(ok, jnp.maximum(jnp.log(ps), -100.0), -100.0)


def _safe_log1m(p):
    """max(log1p(-p), -100) with a NaN-free VJP."""
    ok = (1.0 - p) > _LOG_CLAMP_TINY
    ps = jnp.where(ok, p, 0.0)
    return jnp.where(ok, jnp.maximum(jnp.log1p(-ps), -100.0), -100.0)


@dataclass(frozen=True)
class LossConfig:
    add_l2_loss: bool = False


def total_loss(
    top_scores: jnp.ndarray,
    bottom_probs: jnp.ndarray,
    final_scores: jnp.ndarray,
    labels: jnp.ndarray,
    hier: Dict[str, jnp.ndarray],
    cfg: LossConfig,
    asr_cls: Optional[jnp.ndarray] = None,
    trans_cls: Optional[jnp.ndarray] = None,
    example_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (total, parts).  ``parts`` carries each term for the
    reference's per-term ``loss_record`` reporting (ref :163-193) — but as
    traced scalars fetched once per epoch, not per-step ``.item()`` syncs.

    ``example_mask`` (b,) zeroes out padding rows introduced by fixed-shape
    batching; the reference has no such rows (dynamic last batch).
    """
    parts: Dict[str, jnp.ndarray] = {}

    def masked_sum(x_rows):
        # x_rows: per-row scalar losses (b,)
        if example_mask is None:
            return jnp.sum(x_rows)
        return jnp.sum(x_rows * example_mask.astype(jnp.float32))

    # --- bottom BCE (sum) -------------------------------------------- #
    acc = acc_dtype(final_scores.dtype)
    p = final_scores.astype(acc)
    t = labels.astype(acc)
    row_bce = -jnp.sum(
        t * _safe_log(p) + (1 - t) * _safe_log1m(p),
        axis=1,
    )
    bottom = masked_sum(row_bce)
    parts["bottom_bce"] = bottom

    # --- top BCE (sum), unclamped matmul targets ---------------------- #
    top_targets = t @ hier["bottom2top_mat"]                   # (b, n_top)
    tp = top_scores.astype(acc)
    row_top = -jnp.sum(
        top_targets * _safe_log(tp)
        + (1 - top_targets) * _safe_log1m(tp),
        axis=1,
    )
    top = masked_sum(row_top)
    parts["top_bce"] = top

    # --- per-group CE -------------------------------------------------- #
    if example_mask is not None:
        # padded rows would otherwise hit the "empty -> NONE" branch and
        # contribute loss; zero them via the labels/logp mask
        lbl = t * example_mask[:, None]
        logp_mask = example_mask[:, None]
    else:
        lbl = t
        logp_mask = None
    logp = jnp.log(bottom_probs.astype(acc) + 1e-12)
    M = hier["membership"]
    picked = jnp.einsum("bn,tn->bt", lbl * logp, M)
    has_gold = jnp.einsum("bn,tn->bt", lbl, M)
    last_logp = logp[:, hier["group_last_bottom"]]
    per_group = -(picked + (1.0 - has_gold) * last_logp)
    if logp_mask is not None:
        per_group = per_group * logp_mask
    multi = hier["is_multi_top"].astype(jnp.float32)
    ce = jnp.sum(jnp.sum(per_group, axis=0) * multi) / jnp.sum(multi)
    parts["group_ce"] = ce

    total = bottom + top + ce

    # --- optional MSE alignment --------------------------------------- #
    if cfg.add_l2_loss and asr_cls is not None and trans_cls is not None:
        diff = (asr_cls - trans_cls).astype(acc)
        if example_mask is not None:
            diff = diff * example_mask[:, None]
            denom = jnp.maximum(jnp.sum(example_mask), 1.0) * diff.shape[1]
        else:
            denom = diff.shape[0] * diff.shape[1]
        mse = jnp.sum(jnp.square(diff)) / denom
        parts["mse"] = mse
        total = total + mse

    parts["total"] = total
    return total, parts
