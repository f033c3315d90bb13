"""End-to-end pretrained-checkpoint path: on-disk HF checkpoint ->
tokenizer + converter -> train state -> full CLI run.

The reference loads pretrained weights at `n_best_asr_bert.py:480-487` and
fails loudly when the checkpoint is broken.  These tests pin (a) that the
disk -> AutoConfig -> convert -> train chain actually moves the checkpoint
weights into the train state, and (b) that a missing/broken checkpoint can
never silently produce a from-scratch run (loud warning by default,
hard-fail under --require_pretrained).
"""

import os

import numpy as np
import pytest

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] [SYS] [USR] "
    "i want a cheap restaurant in the north south town what is phone "
    "number address food chinese indian thank you good bye noise sil "
    "um uh looking for part of price range moderately priced area"
).split()


pytestmark = pytest.mark.slow  # CPU-training / subprocess tier


@pytest.fixture(scope="module")
def hf_checkpoint_dir(tmp_path_factory):
    """Tiny random-init BertModel + BertTokenizer saved to disk — the
    shape of a real --tod_pre_trained_model checkpoint directory."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel, BertTokenizer

    d = tmp_path_factory.mktemp("hf_ckpt")
    vocab_file = d / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB) + "\n")
    tok = BertTokenizer(str(vocab_file))
    tok.add_special_tokens(
        {"additional_special_tokens": ["[SYS]", "[USR]"]})
    tok.save_pretrained(str(d))

    torch.manual_seed(7)
    cfg = BertConfig(
        vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=320, type_vocab_size=2)
    model = BertModel(cfg, add_pooling_layer=False)
    model.save_pretrained(str(d))
    word_emb = model.state_dict()[
        "embeddings.word_embeddings.weight"].numpy().copy()
    return str(d), word_emb


@pytest.fixture(scope="module")
def dataroot(tmp_path_factory):
    ref_valid = "/root/reference/dstc2_data/processed_data/raw/valid"
    ref_mem = "/root/reference/dstc2_data/processed_data/raw/memory.pt"
    if not os.path.exists(ref_valid):
        pytest.skip("reference data unavailable")
    from nbest_asr_tpu.data.vocab import Memory

    d = tmp_path_factory.mktemp("dataroot")
    lines = open(ref_valid).read().splitlines(keepends=True)
    with open(d / "train", "w") as fp:
        fp.writelines(lines[:80])
    with open(d / "valid", "w") as fp:
        fp.writelines(lines[80:112])
    Memory.from_torch_pt(ref_mem).save(str(d / "memory.json"))
    return str(d)


def test_build_model_moves_checkpoint_weights(hf_checkpoint_dir, dataroot):
    """disk -> AutoConfig/AutoModel -> converter -> params: the word
    embedding table in the initial train params must be the checkpoint's,
    bit-exact (covers Missing #2 / `hf_convert.load_pretrained_encoder`)."""
    from nbest_asr_tpu.config import RunOptions
    from nbest_asr_tpu.data.tokenizer import HFTokenizerAdapter
    from nbest_asr_tpu.data.vocab import Memory
    from nbest_asr_tpu.train.loop import build_model

    ckpt_dir, word_emb = hf_checkpoint_dir
    memory = Memory.load(os.path.join(dataroot, "memory.json"))
    opt = RunOptions(dataset="dstc2", dataroot=dataroot,
                     tod_pre_trained_model=ckpt_dir,
                     require_pretrained=True)
    tok = HFTokenizerAdapter(ckpt_dir)
    cfg, params = build_model(opt, memory, tok)
    assert cfg.encoder.vocab_size == len(VOCAB)
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["embeddings"]["word"]), word_emb)


def test_cli_end_to_end_with_disk_checkpoint(hf_checkpoint_dir, dataroot,
                                             tmp_path):
    """Full CLI drive with --tod_pre_trained_model: trains, checkpoints,
    and (with --fix_bert_model freezing the encoder at lr 0) the saved
    best checkpoint still carries the converted HF weights bit-exact."""
    from nbest_asr_tpu.cli import main

    ckpt_dir, word_emb = hf_checkpoint_dir
    exp = tmp_path / "exp"
    rc = main([
        "--dataset", "dstc2", "--dataroot", dataroot,
        "--tod_pre_trained_model", ckpt_dir, "--require_pretrained",
        "--fix_bert_model", "--batchSize", "8", "--max_epoch", "1",
        "--lr", "1e-3", "--experiment", str(exp),
    ])
    assert rc == 0
    # the exp dir is derived under --experiment (utils/exp_dir.py)
    import glob

    best = glob.glob(str(exp / "**" / "best.json"), recursive=True)
    assert best, f"no best.json under {exp}"
    model_ckpt = os.path.join(os.path.dirname(best[0]), "model.ckpt")
    if os.path.exists(model_ckpt):  # written on first NEW BEST
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(model_ckpt)
        got = np.asarray(restored["params"]["encoder"]["embeddings"]["word"])
        np.testing.assert_array_equal(got, word_emb)


def test_missing_checkpoint_warns_loudly(dataroot, capsys):
    from nbest_asr_tpu.data.tokenizer import (WordVocabTokenizer,
                                              load_tokenizer)
    from nbest_asr_tpu.data.vocab import Memory

    memory = Memory.load(os.path.join(dataroot, "memory.json"))
    tok = load_tokenizer(None, "/nonexistent/ckpt", memory)
    assert isinstance(tok, WordVocabTokenizer)
    err = capsys.readouterr().err
    assert "WARNING" in err and "falling back" in err


def test_missing_checkpoint_hard_fails_when_required(dataroot):
    from nbest_asr_tpu.data.tokenizer import load_tokenizer
    from nbest_asr_tpu.data.vocab import Memory

    memory = Memory.load(os.path.join(dataroot, "memory.json"))
    with pytest.raises(RuntimeError, match="require_pretrained"):
        load_tokenizer(None, "/nonexistent/ckpt", memory,
                       require_pretrained=True)


def test_build_model_hard_fails_when_required(dataroot):
    from nbest_asr_tpu.config import RunOptions
    from nbest_asr_tpu.data.tokenizer import WordVocabTokenizer
    from nbest_asr_tpu.data.vocab import Memory
    from nbest_asr_tpu.train.loop import build_model

    memory = Memory.load(os.path.join(dataroot, "memory.json"))
    opt = RunOptions(dataset="dstc2", dataroot=dataroot,
                     tod_pre_trained_model="/nonexistent/ckpt",
                     require_pretrained=True)
    with pytest.raises(RuntimeError, match="require_pretrained"):
        build_model(opt, memory, WordVocabTokenizer(memory))


def test_cli_require_pretrained_exit_code(dataroot, tmp_path, capsys):
    from nbest_asr_tpu.cli import main

    rc = main([
        "--dataset", "dstc2", "--dataroot", dataroot,
        "--tod_pre_trained_model", "/nonexistent/ckpt",
        "--require_pretrained", "--experiment", str(tmp_path / "exp"),
    ])
    assert rc == 2
    assert "error:" in capsys.readouterr().err


def test_unknown_family_rejected(dataroot):
    from nbest_asr_tpu.data.tokenizer import load_tokenizer
    from nbest_asr_tpu.data.vocab import Memory

    memory = Memory.load(os.path.join(dataroot, "memory.json"))
    with pytest.raises(ValueError, match="unknown --pre_trained_model"):
        load_tokenizer("distilbert", None, memory)
