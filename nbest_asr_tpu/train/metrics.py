"""Metrics: micro tuple-F1 + exact-match accuracy.

Two paths, by design (SURVEY.md §7 step 7):

- **device path** — TP/FP/FN + exact-match accumulated as arrays inside the
  jitted step from the decoded multi-hot vs the gold multi-hot: the
  training-time monitor (replaces the reference's per-sample host decode in
  the hot loop, `n_best_asr_bert.py:283-288`).
- **host path** — string-level `update_f1`/`compute_f1` with the *raw* gold
  label strings (`utils/fscore.py:2-21`): the reported eval numbers.  This
  is bit-exact with the reference even for out-of-vocab gold labels (which
  the multi-hot path would collapse onto <unk>) and honors the optional
  ontology filter (`n_best_asr_bert.py:218-229, 342-344`).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------- #
# device path
# --------------------------------------------------------------------- #

def f1_counts_from_multihot(pred: jnp.ndarray, gold: jnp.ndarray,
                            example_mask: jnp.ndarray | None = None
                            ) -> Dict[str, jnp.ndarray]:
    """pred/gold (b, n_bottom) {bool, 0/1} -> dict of scalar counts."""
    p = pred.astype(jnp.float32)
    g = gold.astype(jnp.float32)
    tp_rows = jnp.sum(p * g, axis=1)
    fp_rows = jnp.sum(p * (1 - g), axis=1)
    fn_rows = jnp.sum((1 - p) * g, axis=1)
    exact_rows = jnp.all(p == g, axis=1).astype(jnp.float32)
    ones = jnp.ones_like(tp_rows)
    if example_mask is not None:
        em = example_mask.astype(jnp.float32)
        tp_rows, fp_rows, fn_rows = tp_rows * em, fp_rows * em, fn_rows * em
        exact_rows = exact_rows * em
        ones = em
    return {
        "tp": jnp.sum(tp_rows),
        "fp": jnp.sum(fp_rows),
        "fn": jnp.sum(fn_rows),
        "correct": jnp.sum(exact_rows),
        "total": jnp.sum(ones),
    }


# --------------------------------------------------------------------- #
# host path — exact reference semantics
# --------------------------------------------------------------------- #

def update_f1(pred: Sequence[str], gold: Sequence[str],
              TP: int, FP: int, FN: int) -> Tuple[int, int, int]:
    """Parity: `utils/fscore.py:2-11` (duplicates in gold count twice)."""
    for term in pred:
        if term in gold:
            TP += 1
        else:
            FP += 1
    for term in gold:
        if term not in pred:
            FN += 1
    return TP, FP, FN


def compute_f1(TP: int, FP: int, FN: int) -> Tuple[float, float, float]:
    """Parity: `utils/fscore.py:14-21`."""
    if TP == 0:
        return 0.0, 0.0, 0.0
    p = 100 * TP / (TP + FP)
    r = 100 * TP / (TP + FN)
    f = 100 * 2 * TP / (2 * TP + FN + FP)
    return p, r, f


def filter_informative(labels: Sequence[str], ontology: dict) -> List[str]:
    """Ontology filter (parity: `n_best_asr_bert.py:218-229`)."""
    out = []
    for lbl in labels:
        tup = lbl.split("-")
        if len(tup) == 3:
            act, slot, value = tup
            if slot == "this" or (
                slot in ontology["informable"]
                and len(ontology["informable"][slot]) > 1
            ):
                out.append(lbl)
        else:
            out.append(lbl)
    return out


def multihot_to_labels(pred: np.ndarray, idx2label: Dict[int, str]
                       ) -> List[List[str]]:
    """(b, n_bottom) bool -> per-row label-string lists."""
    out: List[List[str]] = []
    for row in pred:
        out.append([idx2label[int(j)] for j in np.nonzero(row)[0]])
    return out


def host_eval_metrics(pred_multihot: np.ndarray,
                      raw_golds: Sequence[Sequence[str]],
                      idx2label: Dict[int, str],
                      ontology: dict | None = None
                      ) -> Tuple[Tuple[float, float, float], float,
                                 List[List[str]], List[List[str]]]:
    """Reported eval metrics from device predictions + raw gold strings.

    Returns ((p, r, f), acc, pred_strings, gold_strings_after_filter)."""
    preds = multihot_to_labels(pred_multihot, idx2label)
    TP = FP = FN = 0
    corr = 0
    tot = 0
    golds_out: List[List[str]] = []
    for pred, gold in zip(preds, raw_golds):
        gold = list(gold)
        if ontology is not None:
            pred = filter_informative(pred, ontology)
            gold = filter_informative(gold, ontology)
        TP, FP, FN = update_f1(pred, gold, TP, FP, FN)
        tot += 1
        if set(pred) == set(gold):
            corr += 1
        golds_out.append(gold)
    acc = (corr / tot * 100) if tot else 0.0
    return compute_f1(TP, FP, FN), acc, preds, golds_out
