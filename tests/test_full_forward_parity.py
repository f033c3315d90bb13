"""Composed end-to-end forward parity: our model (converted encoder +
vectorized hierarchical head) vs a direct torch reimplementation of the
reference model (HF BertModel + ragged per-group heads,
`models/model.py:35-73` + `hierarchical_classifier.py:35-60`), sharing the
exact same weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_full_forward_matches_torch_reference_model(tiny_memory):
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    from nbest_asr_tpu.models.heads import hierarchy_device_arrays
    from nbest_asr_tpu.models.hf_convert import (config_from_hf,
                                                 convert_hf_model)
    from nbest_asr_tpu.models.model import ModelConfig, model_forward

    mem = tiny_memory
    hidden = 48

    hf_cfg = BertConfig(
        vocab_size=96, hidden_size=hidden, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    bert = BertModel(hf_cfg, add_pooling_layer=False).eval()

    # shared head weights
    rng = np.random.RandomState(5)
    top_w = rng.randn(hidden, mem.n_top).astype(np.float32) * 0.1
    top_b = rng.randn(mem.n_top).astype(np.float32) * 0.1
    bot_w = rng.randn(hidden, mem.n_bottom).astype(np.float32) * 0.1
    bot_b = rng.randn(mem.n_bottom).astype(np.float32) * 0.1

    # ---- torch reference path ---------------------------------------- #
    def torch_reference(ids, mask, segs):
        with torch.no_grad():
            seq = bert(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask),
                       token_type_ids=torch.tensor(segs)
                       ).last_hidden_state
            cls = seq[:, 0, :]                                 # ref :47
            top = torch.sigmoid(
                cls @ torch.tensor(top_w) + torch.tensor(top_b))
            logits = cls @ torch.tensor(bot_w) + torch.tensor(bot_b)
            b = cls.shape[0]
            final = torch.empty(b, mem.n_bottom)
            for t, members in mem.top2bottom.items():
                members = sorted(members)
                if len(members) >= 2:                          # ref :54-56
                    sm = torch.softmax(logits[:, members], dim=1)
                    final[:, members] = top[:, t:t + 1] * sm
                else:                                          # ref :58
                    final[:, members] = top[:, t:t + 1]
            return top.numpy(), final.numpy()

    # ---- our path ------------------------------------------------------ #
    enc_cfg = config_from_hf(hf_cfg)
    params = {
        "encoder": jax.tree.map(jnp.asarray, convert_hf_model(bert,
                                                              enc_cfg)),
        "head": {
            "top_kernel": jnp.asarray(top_w),
            "top_bias": jnp.asarray(top_b),
            "bottom_kernel": jnp.asarray(bot_w),
            "bottom_bias": jnp.asarray(bot_b),
        },
    }
    cfg = ModelConfig(encoder=enc_cfg, n_top=mem.n_top,
                      n_bottom=mem.n_bottom)
    hier = hierarchy_device_arrays(mem.arrays())

    ids = np.random.RandomState(1).randint(1, 96, (3, 24)).astype(np.int64)
    mask = np.ones((3, 24), np.float32)
    mask[1, 18:] = 0
    segs = np.zeros((3, 24), np.int64)
    segs[:, 10:] = 1

    ref_top, ref_final = torch_reference(ids, mask, segs)
    top, probs, final, asr_cls, _ = model_forward(
        params, cfg, hier, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask), jnp.asarray(segs, jnp.int32))

    np.testing.assert_allclose(np.asarray(top), ref_top, atol=2e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(final), ref_final, atol=2e-5,
                               rtol=1e-4)

    # and the decode over those scores agrees with the reference rule
    from nbest_asr_tpu.train.decode import decode_multihot

    pred = np.asarray(decode_multihot(top, probs, hier))
    for i in range(3):
        expect = []
        for t, p in enumerate(ref_top[i]):
            if p <= 0.5:
                continue
            members = sorted(mem.top2bottom[t])
            if len(members) == 1:
                expect.append(members[0])
            else:
                j = members[int(np.argmax(ref_final[i, members]))]
                if not mem.idx2label[j].endswith("NONE"):
                    expect.append(j)
        assert set(np.nonzero(pred[i])[0].tolist()) == set(expect)
