"""Per-epoch observability: prediction CSVs + per-label classification
reports.

Parity: `utils/dataset/tod_asr_util.py:150-241` (`EpochInfoCollector`,
`observability_lens`, hierarchical `classification_report`).  Runs on host
at epoch boundaries only; the hierarchy-aware skip rule (predicted labels
outside the gold universe are only scored against gold-universe labels,
ref :176-178) is preserved.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Sequence


@dataclass
class EpochInfo:
    raw_inputs: List[str]
    pred_classes: List[List[str]]
    golds: List[List[str]]
    matches: List[bool]
    mean_loss: float
    precision: float
    recall: float
    f1: float
    acc: float


def classification_report(pred_classes: Sequence[Sequence[str]],
                          golds: Sequence[Sequence[str]]) -> str:
    """Per-label binary P/R/F1/support table (ref :150-198)."""
    from sklearn.metrics import precision_recall_fscore_support
    from tabulate import tabulate

    gold_universe = set()
    for g in golds:
        gold_universe |= set(g)

    y_true = {label: [] for label in gold_universe}
    y_pred = {label: [] for label in gold_universe}

    for pred, gold in zip(pred_classes, golds):
        sp, sg = set(pred), set(gold)
        for label in sg:
            y_true[label].append(1)
            y_pred[label].append(1 if label in sp else 0)
        for label in (sp - sg) & gold_universe:
            y_true[label].append(0)
            y_pred[label].append(1)

    rows = []
    for label in sorted(gold_universe):
        p, r, f, _ = precision_recall_fscore_support(
            y_true[label], y_pred[label], average="binary",
            zero_division=0)
        support = y_true[label].count(1)
        rows.append([label, round(p, 2), round(r, 2), round(f, 2),
                     support])
    return tabulate(rows, ["label", "precision", "recall", "f1-score",
                           "support"])


def observability_lens(info: EpochInfo, epoch: int, dataset_type: str,
                       output_dir: str, extra_name: str) -> None:
    """Writes epoch_<i>_for_<split>_observe_<name>.csv and the per-label
    classification report (ref :202-223)."""
    import pandas as pd

    n = len(info.raw_inputs)
    df = pd.DataFrame({
        "epoch": [epoch] * n,
        "dataset": [dataset_type] * n,
        "mean_loss": [info.mean_loss] * n,
        "precision": [info.precision] * n,
        "recall": [info.recall] * n,
        "f1": [info.f1] * n,
        "acc": [info.acc] * n,
        "raw_inputs": info.raw_inputs,
        "pred_classes": info.pred_classes,
        "gold": info.golds,
        "matches": info.matches,
    })
    df.to_csv(os.path.join(
        output_dir,
        f"epoch_{epoch}_for_{dataset_type}_observe_{extra_name}.csv"),
        index=False)

    report = classification_report(info.pred_classes, info.golds)
    with open(os.path.join(
            output_dir,
            f"classification_report_epoch_{epoch}_for_{dataset_type}.txt"),
            "w") as fp:
        fp.write(report)
