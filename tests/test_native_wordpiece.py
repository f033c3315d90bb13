"""Native (C++) WordPiece tokenization parity vs transformers
(VERDICT r3 next #2).

The reference's primary path tokenizes word-by-word into subwords with a
HF BertTokenizer (`utils/bert_xlnet_inputs.py:46-53`).  Rounds 1-3 only
implemented whole-word vocab lookup natively, so every pretrained family
fell back to Python packing.  These tests pin the native WordPiece
implementation (greedy longest-match + BasicTokenizer clean/lower/
strip-accents/punct-split, `native/nbest_loader.cpp`) BIT-equal to a
transformers BertTokenizer built from a synthetic offline vocab.txt,
across all three input layouts, at the packed-array level.
"""

import json
import os
import sys

import numpy as np
import pytest

from nbest_asr_tpu.data.dataset import RawSplit, read_sep_data
from nbest_asr_tpu.data.etl import build_memory
from nbest_asr_tpu.data.input_builder import pack_split
from nbest_asr_tpu.data.tokenizer import HFTokenizerAdapter

native = pytest.importorskip("nbest_asr_tpu.data.native_loader")
if not native.native_available():
    pytest.skip("no C++ toolchain", allow_module_level=True)

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")

HAND_VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[SYS]", "[USR]",
    "the", "i", "a", "want", "food", "chinese", "north", "town",
    "rest", "##aur", "##ant", "##s", "price", "##range", "whats",
    "don", "##t", "'", ",", ".", "?", "-", "cafe", "##e",
    "what", "##hat", "th", "##e",
]


def _write_tokenizer_dir(path: str, vocab) -> str:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "vocab.txt"), "w") as fp:
        fp.write("\n".join(vocab) + "\n")
    with open(os.path.join(path, "tokenizer_config.json"), "w") as fp:
        json.dump({"tokenizer_class": "BertTokenizer",
                   "do_lower_case": True, "model_max_length": 512}, fp)
    with open(os.path.join(path, "special_tokens_map.json"), "w") as fp:
        json.dump({"pad_token": "[PAD]", "unk_token": "[UNK]",
                   "cls_token": "[CLS]", "sep_token": "[SEP]",
                   "mask_token": "[MASK]",
                   "additional_special_tokens": ["[SYS]", "[USR]"]}, fp)
    return path


@pytest.fixture(scope="module")
def hand_tokenizer(tmp_path_factory):
    d = _write_tokenizer_dir(
        str(tmp_path_factory.mktemp("wp_vocab")), HAND_VOCAB)
    return HFTokenizerAdapter(d)


@pytest.fixture(scope="module")
def tiny_mem():
    return build_memory("a b".split(),
                        ["inform-food-chinese", "request-phone",
                         "thankyou"], ["inform"])


# words exercising every BasicTokenizer/WordPiece branch: exact hits,
# multi-piece splits, case folding, accent stripping (é -> e), embedded
# punctuation splits, apostrophes, pure-UNK, >100-char words, specials
EDGE_WORDS = [
    "the", "restaurant", "restaurants", "RESTAURANTS", "pricerange",
    "don't", "what?", "whats", "thee", "café", "CAFÉ",
    "zzzgibberish", "a", "-", "x" * 120, "i,want", "..", "café-town",
]


def _edge_split():
    seqs = []
    # one utterance per word (plus a kitchen-sink one), each framed the
    # way the ETL serializes lines
    for w in EDGE_WORDS:
        seqs.append(["[CLS]", "[SYS]", "the", w, "[USR]", w, "food",
                     "[SEP]", w, "?"])
    seqs.append(["[CLS]", "[SYS]"] + EDGE_WORDS[:6] + ["[USR]"]
                + EDGE_WORDS + ["[SEP]"] + EDGE_WORDS[::-1])
    labels = [["thankyou"] for _ in seqs]
    return RawSplit(asr_seqs=seqs, trans_seqs=[list(s) for s in seqs],
                    labels=labels)


@pytest.mark.parametrize("layout", ["default", "no_system_act", "tod"])
def test_wordpiece_pack_parity_edge_cases(hand_tokenizer, tiny_mem,
                                          layout):
    split = _edge_split()
    py = pack_split(split, hand_tokenizer, tiny_mem, layout=layout)
    packer = native.NativePacker(tiny_mem, hand_tokenizer, layout)
    nat = packer.pack_lines(split.asr_seqs, split.trans_seqs,
                            split.labels, max_len=py.max_len)
    np.testing.assert_array_equal(nat.input_ids, py.input_ids)
    np.testing.assert_array_equal(nat.attn_mask, py.attn_mask)
    np.testing.assert_array_equal(nat.trans_input_ids, py.trans_input_ids)
    np.testing.assert_array_equal(nat.labels, py.labels)
    if layout != "no_system_act":
        np.testing.assert_array_equal(nat.segment_ids, py.segment_ids)
        np.testing.assert_array_equal(nat.trans_segment_ids,
                                      py.trans_segment_ids)


def test_wordpiece_tokens_match_transformers_per_word(hand_tokenizer):
    """Direct per-word comparison (diagnoses pack-level mismatches)."""
    lib_packer = native.NativePacker(
        build_memory("a".split(), ["thankyou"], []), hand_tokenizer,
        "no_system_act")
    for w in EDGE_WORDS:
        ref_ids = hand_tokenizer.convert_tokens_to_ids(
            hand_tokenizer.tokenize(w))
        packed = lib_packer.pack_lines(
            [["[CLS]", "[SYS]", "[USR]", w]], max_len=128)
        row = packed.input_ids[0]
        got = row[1:int(packed.attn_mask[0].sum()) - 1].tolist()
        assert got == ref_ids, f"word {w!r}: native {got} != hf {ref_ids}"


def test_wordpiece_file_parity_real_corpus(tmp_path, ref_valid_path,
                                           ref_memory):
    """Train a REAL WordPiece vocab on reference shard text (the exact
    stage `tools/pretrain_mlm.py` ships), then pack 150 real lines through
    both packers and require bit equality."""
    sys.path.insert(0, TOOLS)
    from pretrain_mlm import corpus_lines, train_wordpiece_vocab

    shard = str(tmp_path / "shard")
    with open(ref_valid_path) as fp:
        lines = fp.readlines()[:150]
    with open(shard, "w") as fp:
        fp.writelines(lines)
    raw = read_sep_data(shard)
    tok_dir = str(tmp_path / "tok")
    train_wordpiece_vocab(corpus_lines(raw), tok_dir, 800)
    tok = HFTokenizerAdapter(tok_dir)
    assert native.native_supported(tok)

    py = pack_split(raw, tok, ref_memory, layout="default")
    nat = native.pack_file_native(shard, ref_memory, tok, "default")
    np.testing.assert_array_equal(nat.input_ids, py.input_ids)
    np.testing.assert_array_equal(nat.segment_ids, py.segment_ids)
    np.testing.assert_array_equal(nat.attn_mask, py.attn_mask)
    np.testing.assert_array_equal(nat.trans_input_ids, py.trans_input_ids)
    np.testing.assert_array_equal(nat.labels, py.labels)
    assert nat.raw_labels == py.raw_labels
    # real subword work happened (not a degenerate whole-word vocab):
    # some row must be longer than its word count + framing
    assert (nat.attn_mask.sum(1) > 4).all()


def test_unsupported_tokenizers_fall_back(ref_memory):
    """BPE/SentencePiece families are NOT native-supported (they fall
    back to Python packing in serve/ETL)."""
    class FakeAdapter:
        _tok = object()
        pad_token_id = 0

    assert not native.native_supported(FakeAdapter())
