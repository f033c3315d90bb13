"""Data-core tests: vocab/hierarchy invariants, golden parity with the
shipped reference artifacts (valid shard + memory.pt), coverage sampler,
input layouts, and fixed-shape packing."""

import numpy as np
import pytest

from nbest_asr_tpu import constants as C
from nbest_asr_tpu.data.dataset import (read_sep_data,
                                        stratified_coverage_sample,
                                        labels_to_multihot)
from nbest_asr_tpu.data.etl import build_memory, get_label, split_label
from nbest_asr_tpu.data.input_builder import build_inputs, pack_split
from nbest_asr_tpu.data.tokenizer import WordVocabTokenizer
from nbest_asr_tpu.data.vocab import Memory


# --------------------------------------------------------------------- #
# label extraction / hierarchy builder
# --------------------------------------------------------------------- #

def test_get_label_rules():
    assert get_label({"act": "negate", "slots": []}) == "negate"
    assert get_label({"act": "request", "slots": [["phone"]]}) == \
        "request-phone"
    # request uses slot[1] (ref process_dstc2_with_SEP.py:44-46)
    assert get_label({"act": "request", "slots": [["slot", "phone"]]}) == \
        "request-phone"
    assert get_label({"act": "inform", "slots": [["food", "chinese"]]}) == \
        "inform-food-chinese"


def test_split_label():
    assert split_label("negate") == ("negate", None)
    assert split_label("request-phone") == ("request-phone", None)
    assert split_label("inform-food-chinese") == \
        ("inform-food", "inform-food-chinese")


def test_build_memory_none_last_invariant(tiny_memory):
    mem = tiny_memory
    arr = mem.arrays()
    # every multi group's largest index is its NONE label
    for t in range(mem.n_top):
        if arr.is_multi_top[t]:
            last = int(arr.group_last_bottom[t])
            assert mem.idx2label[last].endswith("NONE")
    # bottom->top unique and total
    assert (arr.bottom2top >= 0).all()
    assert arr.membership.sum() == mem.n_bottom


def test_memory_json_roundtrip(tiny_memory):
    mem2 = Memory.from_json(tiny_memory.to_json())
    assert mem2.label2idx == tiny_memory.label2idx
    assert mem2.top2bottom == tiny_memory.top2bottom
    a1, a2 = tiny_memory.arrays(), mem2.arrays()
    np.testing.assert_array_equal(a1.membership, a2.membership)


# --------------------------------------------------------------------- #
# golden parity vs shipped reference artifacts
# --------------------------------------------------------------------- #

def test_reference_memory_counts(ref_memory):
    # counts measured from the shipped memory.pt (SURVEY.md §2.1)
    assert len(ref_memory.word2idx) == 1497
    assert ref_memory.n_bottom == 161
    assert ref_memory.n_top == 30
    arr = ref_memory.arrays()
    assert int(arr.is_multi_top.sum()) == 10
    # NONE-last in every multi group
    for t in np.nonzero(arr.is_multi_top)[0]:
        last = int(arr.group_last_bottom[t])
        assert ref_memory.idx2label[last].endswith("NONE")


def test_rebuild_hierarchy_from_reference_labels(ref_memory):
    """Feeding our builder the reference's labels in reference index order
    reproduces the exact same label indexing + groups."""
    real_labels = [ref_memory.idx2label[i] for i in range(2, ref_memory.n_bottom)
                   if not ref_memory.idx2label[i].endswith("NONE")]
    mem = build_memory(["dummy"], real_labels, [])
    assert mem.label2idx == ref_memory.label2idx
    assert mem.toplabel2idx == ref_memory.toplabel2idx
    assert mem.top2bottom == ref_memory.top2bottom


def test_read_valid_shard(ref_valid_path):
    split = read_sep_data(ref_valid_path)
    assert len(split) == 3560
    # framing markers present
    assert split.asr_seqs[0][0] == C.CLS_MARK
    assert split.asr_seqs[0][1] == C.SYS_MARK
    assert C.USR_MARK in split.asr_seqs[0]
    assert all(len(l) >= 1 for l in split.labels)


def test_coverage_sampler_semantics(ref_valid_path):
    split = read_sep_data(ref_valid_path)
    cov = stratified_coverage_sample(split, 0.05)
    uniq = {tuple(l) for l in split.labels}
    got = {tuple(l) for l in cov.labels}
    # every unique label-set is represented
    assert got == uniq
    n_unique = len(uniq)
    expect = n_unique + int(np.round(abs(0.05 * len(split) - n_unique)))
    assert len(cov) == expect
    # deterministic
    cov2 = stratified_coverage_sample(split, 0.05)
    assert cov.labels == cov2.labels


# --------------------------------------------------------------------- #
# input layouts
# --------------------------------------------------------------------- #

@pytest.fixture()
def word_tok(tiny_memory):
    return WordVocabTokenizer(tiny_memory)


RAW = [["[CLS]", "[SYS]", "want", "food", "[USR]", "i", "want",
        "[SEP]", "i", "want", "food"]]


def test_layout_default(word_tok):
    built = build_inputs(RAW, word_tok, layout="default")
    toks = built.tokens[0]
    # [CLS] sys [SEP] hyp1 [SEP] hyp2  (ref bert_xlnet_inputs.py:74-85)
    assert toks[0] == word_tok.cls_token
    assert toks[1:3] == ["want", "food"]
    assert toks[3] == word_tok.sep_token
    assert toks[-1] == word_tok.sep_token
    segs = built.segment_ids[0]
    assert segs[:3] == [0, 0, 0]
    assert set(segs[3:]) == {1}
    assert len(segs) == len(toks)


def test_layout_no_system_act(word_tok):
    built = build_inputs(RAW, word_tok, layout="no_system_act")
    toks = built.tokens[0]
    assert toks[0] == word_tok.cls_token
    assert "want" in toks and toks[-1] == word_tok.sep_token
    # system words not included (ref :70-72)
    assert toks[1] == "i"


def test_layout_tod(word_tok):
    built = build_inputs(RAW, word_tok, layout="tod")
    toks = built.tokens[0]
    # [CLS] [SYS] sys [USR] hyps [SEP]  (ref :55-65)
    assert toks[0] == word_tok.cls_token
    assert toks[1] == C.SYS_MARK
    assert C.USR_MARK in toks
    segs = built.segment_ids[0]
    usr_pos = toks.index(C.USR_MARK)
    assert set(segs[:usr_pos]) == {0}
    assert set(segs[usr_pos:]) == {1}


def test_double_sep_layout(word_tok):
    word_tok.double_sep = True  # simulate XLM-R (ref :37-40)
    built = build_inputs(RAW, word_tok, layout="default")
    toks = built.tokens[0]
    sep = word_tok.sep_token
    # inter-hypothesis separator doubled; leading b-separator doubled too
    i = toks.index("i")
    assert toks[i - 2:i] == [sep, sep]


# --------------------------------------------------------------------- #
# packing
# --------------------------------------------------------------------- #

def test_pack_split_shapes(tiny_memory, word_tok):
    from nbest_asr_tpu.data.dataset import RawSplit

    split = RawSplit(
        asr_seqs=[RAW[0], RAW[0][:6] + ["[USR]", "food"]],
        trans_seqs=[RAW[0], RAW[0]],
        labels=[["inform-food-chinese"], ["negate", "request-phone"]],
    )
    # fix the malformed second asr seq (needs [USR])
    split.asr_seqs[1] = ["[CLS]", "[SYS]", "want", "[USR]", "food"]

    packed = pack_split(split, word_tok, tiny_memory, layout="default")
    n, L = packed.input_ids.shape
    assert n == 2 and L % 8 == 0
    assert packed.attn_mask.shape == (n, L)
    assert packed.labels.shape == (2, tiny_memory.n_bottom)
    # real attention mask matches nonpad prefix length
    row = packed.input_ids[0]
    mask = packed.attn_mask[0]
    nonpad = int(mask.sum())
    assert (row[:nonpad] != word_tok.pad_token_id).all() or nonpad > 0
    assert (mask[nonpad:] == 0).all()
    # multihot
    lbl = packed.labels[1]
    idx = tiny_memory.label2idx
    assert lbl[idx["negate"]] == 1 and lbl[idx["request-phone"]] == 1
    assert lbl.sum() == 2


def test_labels_multihot_oov(tiny_memory):
    mh = labels_to_multihot([["not-a-label"]], tiny_memory.label2idx,
                            tiny_memory.n_bottom)
    assert mh[0, C.UNK] == 1.0


def test_pack_reference_valid_subset(ref_valid_path, ref_memory):
    split = read_sep_data(ref_valid_path)
    sub = split.select(range(64))
    tok = WordVocabTokenizer(ref_memory)
    packed = pack_split(sub, tok, ref_memory, layout="default")
    assert packed.input_ids.shape[0] == 64
    # first token is always CLS id
    cls_id = tok.convert_tokens_to_ids([tok.cls_token])[0]
    assert (packed.input_ids[:, 0] == cls_id).all()
    # every row has at least one gold label bit
    assert (packed.labels.sum(axis=1) >= 1).all()
