"""Native (C++) loader parity vs the Python packer on the shipped valid
shard, all three layouts."""

import os

import numpy as np
import pytest

from nbest_asr_tpu.data.dataset import read_sep_data
from nbest_asr_tpu.data.input_builder import pack_split
from nbest_asr_tpu.data.native_loader import (native_available,
                                              pack_file_native)
from nbest_asr_tpu.data.tokenizer import WordVocabTokenizer

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


@pytest.mark.parametrize("layout", ["default", "no_system_act", "tod"])
def test_native_matches_python(ref_valid_path, ref_memory, layout,
                               tmp_path):
    tok = WordVocabTokenizer(ref_memory)
    # subset shard for speed
    sub_path = os.path.join(str(tmp_path), "shard")
    with open(ref_valid_path) as fp, open(sub_path, "w") as out:
        for i, line in enumerate(fp):
            if i >= 200:
                break
            out.write(line)

    split = read_sep_data(sub_path)
    py = pack_split(split, tok, ref_memory, layout=layout, max_len=256)
    nat = pack_file_native(sub_path, ref_memory, tok, layout=layout,
                           max_len=256)

    np.testing.assert_array_equal(nat.input_ids, py.input_ids)
    np.testing.assert_array_equal(nat.attn_mask, py.attn_mask)
    np.testing.assert_array_equal(nat.trans_input_ids, py.trans_input_ids)
    np.testing.assert_array_equal(nat.labels, py.labels)
    if layout != "no_system_act":
        np.testing.assert_array_equal(nat.segment_ids, py.segment_ids)
    assert nat.raw_labels == py.raw_labels


def test_native_auto_max_len(ref_valid_path, ref_memory, tmp_path):
    tok = WordVocabTokenizer(ref_memory)
    sub_path = os.path.join(str(tmp_path), "shard")
    with open(ref_valid_path) as fp, open(sub_path, "w") as out:
        for i, line in enumerate(fp):
            if i >= 64:
                break
            out.write(line)
    nat = pack_file_native(sub_path, ref_memory, tok)
    py = pack_split(read_sep_data(sub_path), tok, ref_memory)
    assert nat.max_len == py.max_len
    np.testing.assert_array_equal(nat.input_ids, py.input_ids)


def test_pack_lines_matches_pack_file(ref_valid_path, ref_memory,
                                      tmp_path):
    """In-memory packing (serving path) == file packing on the same
    records."""
    from nbest_asr_tpu.data.native_loader import NativePacker

    tok = WordVocabTokenizer(ref_memory)
    with open(ref_valid_path) as fp:
        lines = [next(fp) for _ in range(50)]
    sub = os.path.join(str(tmp_path), "shard")
    with open(sub, "w") as out:
        out.writelines(lines)

    packer = NativePacker(ref_memory, tok)
    by_file = packer.pack_file(sub, max_len=256)

    asr = [l.split("\t<=>\t")[0].strip().split(" ") for l in lines]
    trans = [l.split("\t<=>\t")[1].strip().split(" ") for l in lines]
    lbls = [l.strip("\n").split("\t<=>\t")[2].split(";") for l in lines]
    by_lines = packer.pack_lines(asr, trans, lbls, max_len=256)

    np.testing.assert_array_equal(by_file.input_ids, by_lines.input_ids)
    np.testing.assert_array_equal(by_file.trans_input_ids,
                                  by_lines.trans_input_ids)
    np.testing.assert_array_equal(by_file.labels, by_lines.labels)
    assert by_file.raw_labels == by_lines.raw_labels


def test_pack_lines_rejects_malformed(ref_memory):
    from nbest_asr_tpu.data.native_loader import NativePacker

    tok = WordVocabTokenizer(ref_memory)
    packer = NativePacker(ref_memory, tok)
    with pytest.raises(ValueError, match="malformed"):
        packer.pack_lines([["[CLS]", "[SYS]", "no", "usr", "marker"]])
