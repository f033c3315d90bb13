"""Shard reading and the coverage (sample-complexity) sampler.

Parity targets:
- `utils/dataset/tod_asr_util.py:43-71` (`read_wcn_data`): parse the
  3-field ``\\t<=>\\t`` lines into (asr words, transcript words, labels).
- `utils/dataset/tod_asr_util.py:12-39` (`_get_stratified_sampled_data`):
  label-stratified coverage sampling — keep the first exemplar of every
  unique label-set, then fill to ``coverage * N`` with a seed-42 pandas
  sample of the remainder.  Train-only (`n_best_asr_bert.py:524-526`).

Unlike the reference, nothing downstream re-tokenizes per step: these raw
word lists flow once through the offline input builder
(`input_builder.py`) into fixed-shape arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .. import constants as C


@dataclass
class RawSplit:
    asr_seqs: List[List[str]]
    trans_seqs: List[List[str]]
    labels: List[List[str]]

    def __len__(self) -> int:
        return len(self.asr_seqs)

    def select(self, idx: Sequence[int]) -> "RawSplit":
        return RawSplit(
            [self.asr_seqs[i] for i in idx],
            [self.trans_seqs[i] for i in idx],
            [self.labels[i] for i in idx],
        )


def read_sep_data(path: str, coverage: Optional[float] = None) -> RawSplit:
    asr_seqs, trans_seqs, labels = [], [], []
    with open(path) as fp:
        for line in fp:
            asr, trans, lbl = line.strip("\n\r").split(C.FIELD_SEP)
            asr_seqs.append(asr.strip().split(" "))
            trans_seqs.append(trans.strip().split(" "))
            labels.append(lbl.strip().split(C.LABEL_SEP) if lbl else [])
    split = RawSplit(asr_seqs, trans_seqs, labels)
    if coverage:
        split = stratified_coverage_sample(split, coverage)
    return split


def stratified_coverage_sample(split: RawSplit, coverage: float) -> RawSplit:
    """Label-stratified subsample at the given coverage fraction.

    Exact reference semantics (`tod_asr_util.py:12-39`): one first-seen
    exemplar per unique label tuple is always kept; the remaining rows are
    sampled without replacement with pandas ``random_state=42`` to reach
    ``round(|coverage*N - n_unique|)`` extra rows.  Uses pandas when
    available for bit-exact sample selection, else a numpy RandomState(42)
    fallback with the same keep-unique-first semantics.
    """
    n = len(split)
    label_tuples = [tuple(l) for l in split.labels]

    seen = set()
    unique_idx: List[int] = []
    for i, t in enumerate(label_tuples):
        if t not in seen:
            seen.add(t)
            unique_idx.append(i)
    rest_idx = [i for i in range(n) if i not in set(unique_idx)]

    rem_count = int(np.round(abs(float(coverage) * n - len(unique_idx))))
    rem_count = min(rem_count, len(rest_idx))

    try:
        import pandas as pd

        rest = pd.DataFrame({"i": rest_idx})
        sampled = rest.sample(n=rem_count, random_state=42)["i"].tolist()
    except ImportError:  # pragma: no cover - pandas is normally present
        rng = np.random.RandomState(42)
        sampled = rng.choice(np.asarray(rest_idx), size=rem_count,
                             replace=False).tolist()

    return split.select(unique_idx + list(sampled))


def labels_to_multihot(labels: Sequence[Sequence[str]], label2idx: dict,
                       n_labels: int) -> np.ndarray:
    """Label-string lists -> multi-hot matrix (b, n_labels); OOV labels map
    to UNK (parity: collate_fn `tod_asr_util.py:118-127`)."""
    out = np.zeros((len(labels), n_labels), dtype=np.float32)
    for i, lbls in enumerate(labels):
        for l in lbls:
            out[i, label2idx.get(l, C.UNK)] = 1.0
    return out


def train_valid_test_paths(dataroot: str, train_file: str = "train",
                           valid_file: str = "valid",
                           test_file: str = "test") -> Tuple[str, str, str]:
    import os
    return (os.path.join(dataroot, train_file),
            os.path.join(dataroot, valid_file),
            os.path.join(dataroot, test_file))
