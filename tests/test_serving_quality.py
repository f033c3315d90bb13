"""Serving-numerics quality pinning (VERDICT r3 next #3).

The int8 serving path changes predictions; `tools/serving_quality.py`
measures the F1/Acc cost on real hardware, and THIS test pins the
CPU-checkable core: predictions and scores of the quantized XLA path
(`ops/quant.py` math — the same quantized algebra the TPU megakernels
fuse) must agree with the full-precision path above a stated threshold on
a TRAINED model.  Red-capable: a broken quant scale chain collapses
agreement to near-random.
"""

import os

import numpy as np
import pytest

import jax

from nbest_asr_tpu.config import RunOptions
from nbest_asr_tpu.data.dataset import read_sep_data
from nbest_asr_tpu.data.input_builder import pack_split
from nbest_asr_tpu.data.tokenizer import WordVocabTokenizer
from nbest_asr_tpu.data.vocab import Memory
from nbest_asr_tpu.models.encoder import EncoderConfig
from nbest_asr_tpu.models.model import ModelConfig
from nbest_asr_tpu.serve import Predictor
from nbest_asr_tpu.train.loop import Trainer, init_model_params

REF = "/root/reference/dstc2_data/processed_data/raw"


pytestmark = pytest.mark.slow  # CPU-training / subprocess tier


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    if not os.path.exists(os.path.join(REF, "valid")):
        pytest.skip("reference data unavailable")
    memory = Memory.from_torch_pt(os.path.join(REF, "memory.pt"))
    tok = WordVocabTokenizer(memory)
    split = read_sep_data(os.path.join(REF, "valid"))
    cfg = ModelConfig(
        encoder=EncoderConfig.tiny(vocab_size=tok.vocab_size,
                                   hidden_size=128),
        n_top=memory.n_top, n_bottom=memory.n_bottom)
    packed = {
        "train": pack_split(split.select(range(96)), tok, memory,
                            max_len=128),
        "valid": pack_split(split.select(range(96, 128)), tok, memory,
                            max_len=128),
    }
    tmp = tmp_path_factory.mktemp("servq")
    opt = RunOptions(dataset="dstc2", dataroot="unused",
                     experiment=str(tmp), batchSize=16, max_epoch=10,
                     random_seed=999, lr=1e-3, bert_lr=1e-3)
    opt.exp_dir = str(tmp)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    tr = Trainer(opt, memory, cfg, params, packed)
    for _ in range(10):
        tr.run_train_epoch()
    final = jax.device_get(tr.state.params)
    utts = [" ".join(s) for s in split.asr_seqs[96:160]]
    return memory, tok, cfg, final, utts


def _agreement(a, b) -> float:
    return sum(set(x) == set(y) for x, y in zip(a, b)) / max(len(a), 1)


def test_int8_predictions_agree_with_full_precision(trained):
    memory, tok, cfg, params, utts = trained
    base = Predictor(dict(params), cfg, memory, tok, batch_size=16,
                     max_len=128, fused_attn_eval=False)
    q = Predictor(dict(params), cfg, memory, tok, batch_size=16,
                  max_len=128, quantize="int8", fused_attn_eval=False)
    p_base = base.predict(utts)
    p_q = q.predict(utts)
    agree = _agreement(p_base, p_q)
    # stated contract: >= 95% utterance-exact agreement on a trained
    # model (measured on this fixture: 100%); docs/PERFORMANCE.md
    # carries the on-hardware F1 deltas from tools/serving_quality.py
    assert agree >= 0.95, f"int8 agreement {agree:.2%}"

    s_base = base.scores(utts)
    s_q = q.scores(utts)
    # score drift bound: int8 weight+activation quant at bert-ish dims
    assert np.max(np.abs(s_base - s_q)) < 0.15
    assert np.mean(np.abs(s_base - s_q)) < 0.02


def test_int8_gate_is_red_capable(trained, monkeypatch):
    """Corrupting the quant scales must collapse agreement — proves the
    gate actually watches the quantized math."""
    memory, tok, cfg, params, utts = trained
    base = Predictor(dict(params), cfg, memory, tok, batch_size=16,
                     max_len=128, fused_attn_eval=False)

    from nbest_asr_tpu.ops import quant as quant_mod

    real = quant_mod.quantize_encoder_params

    def corrupted(p):
        qp = real(p)

        def bust(leaf):
            if isinstance(leaf, dict) and "scale" in leaf:
                return {"q": leaf["q"], "scale": leaf["scale"] * 7.3}
            return leaf

        enc = qp["encoder"]["layers"]
        qp["encoder"]["layers"] = {
            k: bust(v) for k, v in enc.items()}
        return qp

    monkeypatch.setattr(quant_mod, "quantize_encoder_params", corrupted)
    q = Predictor(dict(params), cfg, memory, tok, batch_size=16,
                  max_len=128, quantize="int8", fused_attn_eval=False)
    s_base = base.scores(utts)
    s_q = q.scores(utts)
    assert np.max(np.abs(s_base - s_q)) > 0.15
