"""RoBERTa family end-to-end: the remaining reference model family
(`--pre_trained_model roberta`, ref `n_best_asr_bert.py:33-37`) driven
through the full CLI with a real on-disk BPE tokenizer checkpoint +
random-init RobertaModel, like the XLM-R twin (test_xlmr_path.py).

Pins the roberta-specific semantics:
- SINGLE ``</s>`` separator between n-best hypotheses (the reference
  doubles the separator ONLY for XLM-R, `bert_xlnet_inputs.py:37-43`),
- pad id 1 with a real attention mask,
- RoBERTa position offset 2 after conversion,
- no token-type embeddings (type_vocab_size=1).
"""

import glob
import os

import pytest

CORPUS = [
    "i want a cheap restaurant in the north part of town",
    "what is the phone number and address",
    "im looking for moderately priced chinese food",
    "thank you good bye",
    "is there anything else in the south area",
    "a restaurant serving indian food in the expensive price range",
] * 10


pytestmark = pytest.mark.slow  # CPU-training / subprocess tier


@pytest.fixture(scope="module")
def roberta_checkpoint(tmp_path_factory):
    pytest.importorskip("torch")
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import (RobertaConfig, RobertaModel,
                              RobertaTokenizerFast)

    root = tmp_path_factory.mktemp("hf_local")
    d = root / "roberta-base"  # resolve_checkpoint maps the family here
    d.mkdir()

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=220,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>"])
    tok.train_from_iterator(CORPUS, trainer)
    fast = RobertaTokenizerFast(tokenizer_object=tok)
    fast.save_pretrained(str(d))
    assert fast.pad_token_id == 1  # roberta convention: pad=1, bos=0

    import torch

    torch.manual_seed(5)
    cfg = RobertaConfig(
        vocab_size=len(fast), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=320, type_vocab_size=1, pad_token_id=1)
    model = RobertaModel(cfg, add_pooling_layer=False)
    model.save_pretrained(str(d))
    return str(root), str(d)


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
        fp.writelines(lines[:64])
    with open(d / "valid", "w") as fp:
        fp.writelines(lines[64:96])
    Memory.from_torch_pt(ref_mem).save(str(d / "memory.json"))
    return str(d)


def test_single_sep_layout(roberta_checkpoint, dataroot):
    """Plain roberta keeps a SINGLE </s> between hypotheses — the
    doubled form is XLM-R-only in the reference."""
    from nbest_asr_tpu.data.dataset import read_sep_data
    from nbest_asr_tpu.data.input_builder import pack_split
    from nbest_asr_tpu.data.tokenizer import HFTokenizerAdapter
    from nbest_asr_tpu.data.vocab import Memory

    _, ckpt_dir = roberta_checkpoint
    tok = HFTokenizerAdapter(ckpt_dir, family="roberta")
    assert not tok.double_sep and tok.pad_token_id == 1

    memory = Memory.load(os.path.join(dataroot, "memory.json"))
    split = read_sep_data(os.path.join(dataroot, "train")).select(range(8))
    packed = pack_split(split, tok, memory, layout="default")

    sep_id = tok.convert_tokens_to_ids([tok.sep_token])[0]
    ids = packed.input_ids
    assert (ids == sep_id).sum() > 0, "no separators packed at all"
    pairs = ((ids[:, :-1] == sep_id) & (ids[:, 1:] == sep_id)).sum()
    assert pairs == 0, "roberta stream must not double the separator"
    pad_positions = packed.attn_mask == 0
    assert pad_positions.any()
    assert (ids[pad_positions] == 1).all()


def test_cli_roberta_end_to_end(roberta_checkpoint, dataroot, tmp_path,
                                monkeypatch, capsys):
    """Full CLI: --pre_trained_model roberta resolves the staged local
    checkpoint, converts it (position_offset=2, no segment table), and
    trains."""
    from nbest_asr_tpu.cli import main

    root, _ = roberta_checkpoint
    monkeypatch.setenv("NBEST_HF_LOCAL", root)
    exp = tmp_path / "exp"
    rc = main([
        "--dataset", "dstc2", "--dataroot", dataroot,
        "--pre_trained_model", "roberta", "--require_pretrained",
        "--batchSize", "8", "--max_epoch", "1",
        "--lr", "1e-3", "--experiment", str(exp),
    ])
    assert rc == 0
    err = capsys.readouterr().err
    assert "falling back" not in err and "FROM SCRATCH" not in err
    logs = glob.glob(str(exp) + "/**/log.train", recursive=True)
    assert logs, "training log missing"
    txt = open(logs[0]).read()
    assert "[Valid]" in txt and "BEST RESULT" in txt
