"""Tokenizers behind one small interface.

The reference tokenizes with HuggingFace slow tokenizers *inside the train
step, every batch, every epoch* (`n_best_asr_bert.py:249-250`,
`utils/bert_xlnet_inputs.py:46-53`).  Here tokenization is offline and
happens exactly once per dataset (see `input_builder.py`); the trainer only
ever sees fixed-shape int arrays.

Two implementations:

- ``HFTokenizerAdapter`` — wraps a transformers tokenizer for the
  pretrained families the reference supports (bert / roberta / xlm-roberta /
  TOD-BERT checkpoints; `n_best_asr_bert.py:33-37, 480-487`).  Requires the
  checkpoint files to exist locally (this environment has no network).
- ``WordVocabTokenizer`` — self-contained whole-word tokenizer over the
  ETL's word vocab (`memory.json``'s word2idx).  Used for from-scratch
  training, smoke tests and benchmarks when no HF checkpoint is on disk.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from .. import constants as C
from .vocab import Memory


HF_NAMES = {
    "bert": "bert-base-uncased",
    "roberta": "roberta-base",
    "xlm-roberta": "xlm-roberta-base",
}


def resolve_checkpoint(name: str) -> str:
    """Map a canonical HF checkpoint name to a local directory when
    ``NBEST_HF_LOCAL`` provides one (``$NBEST_HF_LOCAL/<name>``); otherwise
    return the name for transformers' own local-cache resolution.  Keeps
    the reference CLI surface (`--pre_trained_model bert|roberta|
    xlm-roberta`) usable in this no-network environment with checkpoints
    staged on disk."""
    import os

    root = os.environ.get("NBEST_HF_LOCAL")
    if root:
        cand = os.path.join(root, name)
        if os.path.isdir(cand):
            return cand
    return name


class BaseTokenizer:
    cls_token: str
    sep_token: str
    pad_token: str
    pad_token_id: int
    vocab_size: int
    # True when '[SEP]' between n-best hypotheses must be rendered as a
    # doubled separator (XLM-R convention, `bert_xlnet_inputs.py:37-40`).
    double_sep: bool = False

    def tokenize(self, word: str) -> List[str]:
        raise NotImplementedError

    def convert_tokens_to_ids(self, tokens: Sequence[str]) -> List[int]:
        raise NotImplementedError


class WordVocabTokenizer(BaseTokenizer):
    """Whole-word tokenizer over the ETL word vocab.

    ids reuse the memory's word2idx (PAD=0, UNK=1, ..., CLS=4) and append a
    dedicated ``<sep>`` id at the end (same trick as reference
    `utils/util.py:66-70`).
    """

    def __init__(self, memory: Memory, lowercase: bool = True):
        self.vocab: Dict[str, int] = dict(memory.word2idx)
        self.lowercase = lowercase
        self.cls_token = C.CLS_WORD
        self.pad_token = C.PAD_WORD
        self.sep_token = "<sep>"
        # [SYS]/[USR] are special tokens in the TOD-BERT vocab the reference
        # relies on (`bert_xlnet_inputs.py:30-35`); register them so the TOD
        # layout round-trips through the fallback tokenizer as well.
        for special in (self.sep_token, C.SYS_MARK, C.USR_MARK):
            if special not in self.vocab:
                self.vocab[special] = len(self.vocab)
        self.pad_token_id = self.vocab[C.PAD_WORD]
        self.vocab_size = len(self.vocab)

    def tokenize(self, word: str) -> List[str]:
        if not word:
            # empty tokens from doubled spaces in the raw shards vanish,
            # matching HF tokenizers' tokenize('') == [] (the serialized
            # lines do contain double spaces, e.g. "are  restaurants")
            return []
        if word in self.vocab:  # specials & exact hits bypass lowercasing
            return [word]
        if self.lowercase:
            word = word.lower()
        return [word if word in self.vocab else C.UNK_WORD]

    def convert_tokens_to_ids(self, tokens: Sequence[str]) -> List[int]:
        return [self.vocab.get(t, C.UNK) for t in tokens]


class HFTokenizerAdapter(BaseTokenizer):
    """Adapter over a transformers tokenizer (local files only)."""

    def __init__(self, name_or_path: str, family: str | None = None):
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(
            name_or_path, local_files_only=True
        )
        self.cls_token = self._tok.cls_token
        self.sep_token = self._tok.sep_token
        self.pad_token = self._tok.pad_token
        self.pad_token_id = self._tok.pad_token_id
        self.vocab_size = self._tok.vocab_size
        self.double_sep = (family == "xlm-roberta")

    def tokenize(self, word: str) -> List[str]:
        return self._tok.tokenize(word)

    def convert_tokens_to_ids(self, tokens: Sequence[str]) -> List[int]:
        return self._tok.convert_tokens_to_ids(list(tokens))


def load_tokenizer(pre_trained_model: str | None,
                   tod_pre_trained_model: str | None,
                   memory: Memory, *,
                   require_pretrained: bool = False) -> BaseTokenizer:
    """Resolve the tokenizer the same way the reference resolves
    `opt.tokenizer` (`n_best_asr_bert.py:480-487`).

    When a pretrained tokenizer was *requested* but cannot be loaded, this
    never falls back silently: it raises if ``require_pretrained`` and
    otherwise emits a loud stderr warning before using the self-contained
    word-vocab tokenizer (the reference would crash here; the fallback only
    exists for offline smoke runs)."""
    requested = tod_pre_trained_model or (
        HF_NAMES.get(pre_trained_model) if pre_trained_model else None)
    if pre_trained_model and pre_trained_model not in HF_NAMES \
            and not tod_pre_trained_model:
        raise ValueError(
            f"unknown --pre_trained_model {pre_trained_model!r}; "
            f"choices: {sorted(HF_NAMES)}")
    if requested:
        try:
            if tod_pre_trained_model:
                return HFTokenizerAdapter(tod_pre_trained_model)
            return HFTokenizerAdapter(resolve_checkpoint(requested),
                                      family=pre_trained_model)
        except Exception as e:
            msg = (f"could not load pretrained tokenizer {requested!r}: "
                   f"{type(e).__name__}: {e}")
            if require_pretrained:
                raise RuntimeError(
                    msg + " (--require_pretrained set; refusing the "
                    "from-scratch fallback)") from e
            import sys

            print(
                "WARNING: %s\nWARNING: falling back to the from-scratch "
                "word-vocab tokenizer — this run will NOT use pretrained "
                "weights. Pass --require_pretrained to make this fatal."
                % msg, file=sys.stderr, flush=True)
    return WordVocabTokenizer(memory)
