"""Model-core tests: group-softmax head math vs a straightforward ragged
loop, encoder forward parity vs a random-init HF BertModel through the
checkpoint converter, and basic shape/jit checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nbest_asr_tpu.models.encoder import (EncoderConfig, encoder_forward,
                                          init_encoder_params)
from nbest_asr_tpu.models.heads import (group_softmax, hierarchical_head,
                                        hierarchy_device_arrays,
                                        init_head_params)
from nbest_asr_tpu.models.model import (ModelConfig, init_model_params,
                                        model_forward)


# --------------------------------------------------------------------- #
# head math
# --------------------------------------------------------------------- #

def _ragged_reference_head(top_scores, bottom_logits, mem):
    """Direct ragged re-computation of hierarchical_classifier.py:44-58."""
    b = top_scores.shape[0]
    n_bottom = bottom_logits.shape[1]
    final = np.zeros((b, n_bottom), np.float64)
    probs = np.zeros((b, n_bottom), np.float64)
    for t, members in mem.top2bottom.items():
        members = sorted(members)
        if len(members) >= 2:
            logits = bottom_logits[:, members]
            e = np.exp(logits - logits.max(axis=1, keepdims=True))
            sm = e / e.sum(axis=1, keepdims=True)
            probs[:, members] = sm
            final[:, members] = top_scores[:, t:t + 1] * sm
        else:
            probs[:, members] = 1.0
            final[:, members] = top_scores[:, t:t + 1]
    return probs, final


def test_group_softmax_matches_ragged_loop(tiny_memory):
    mem = tiny_memory
    arr = mem.arrays()
    hier = hierarchy_device_arrays(arr)
    rng = np.random.RandomState(0)
    b = 5
    bottom_logits = rng.randn(b, mem.n_bottom).astype(np.float32) * 3
    top_scores = 1 / (1 + np.exp(-rng.randn(b, mem.n_top))) \
        .astype(np.float32)

    probs = np.asarray(group_softmax(jnp.asarray(bottom_logits),
                                     hier["membership"],
                                     hier["bottom2top"]))
    ref_probs, ref_final = _ragged_reference_head(
        top_scores.astype(np.float64), bottom_logits.astype(np.float64), mem)
    np.testing.assert_allclose(probs, ref_probs, atol=1e-5)

    # full composition
    top_per_bottom = top_scores[:, np.asarray(arr.bottom2top)]
    multi = np.asarray(arr.is_multi_top)[np.asarray(arr.bottom2top)]
    final = np.where(multi, top_per_bottom * probs, top_per_bottom)
    np.testing.assert_allclose(final, ref_final, atol=1e-5)


def test_group_softmax_sums_to_one(tiny_memory):
    mem = tiny_memory
    hier = hierarchy_device_arrays(mem.arrays())
    logits = jnp.asarray(np.random.randn(3, mem.n_bottom), jnp.float32)
    probs = group_softmax(logits, hier["membership"], hier["bottom2top"])
    sums = np.asarray(jnp.einsum("bn,tn->bt", probs, hier["membership"]))
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)


def test_head_shapes(tiny_memory):
    mem = tiny_memory
    hier = hierarchy_device_arrays(mem.arrays())
    params = init_head_params(jax.random.PRNGKey(0), 32, mem.n_top,
                              mem.n_bottom)
    feats = jnp.ones((4, 32), jnp.float32)
    top, probs, final = hierarchical_head(params, feats, hier)
    assert top.shape == (4, mem.n_top)
    assert probs.shape == final.shape == (4, mem.n_bottom)
    assert bool((np.asarray(top) > 0).all() and (np.asarray(top) < 1).all())


def test_head_dropout_is_per_group(tiny_memory):
    """The reference draws a FRESH dropout sample of the CLS features for
    every group head (hierarchical_classifier.py:41, 44-48 — dropout(x)
    inside the per-group loop).  Probe: route member j of each multi
    group to feature j via a one-hot bottom kernel, feed all-ones
    features; each group's softmax then reveals that group's mask bits
    on features 0..k-1.  A shared bottom mask (the pre-r5 behavior)
    makes the two multi groups' softmax outputs identical on every row;
    independent per-group masks make them differ somewhere w.h.p."""
    mem = tiny_memory
    arr = mem.arrays()
    hier = hierarchy_device_arrays(arr)
    h = 16
    multi_groups = [sorted(m) for t, m in mem.top2bottom.items()
                    if len(m) >= 2]
    assert len(multi_groups) >= 2
    W = np.zeros((h, mem.n_bottom), np.float32)
    for members in multi_groups:
        for j, col in enumerate(members):
            W[j, col] = 1.0
    params = init_head_params(jax.random.PRNGKey(0), h, mem.n_top,
                              mem.n_bottom)
    params = dict(params, bottom_kernel=jnp.asarray(W),
                  bottom_bias=jnp.zeros((mem.n_bottom,), jnp.float32))
    feats = jnp.ones((256, h), jnp.float32)
    _, probs, _ = hierarchical_head(
        params, feats, hier, dropout_rate=0.5,
        rng=jax.random.PRNGKey(7), deterministic=False)
    probs = np.asarray(probs)
    g1, g2 = multi_groups[0], multi_groups[1]
    k = min(len(g1), len(g2))
    sig1, sig2 = probs[:, g1[:k]], probs[:, g2[:k]]
    assert not np.allclose(sig1, sig2), \
        "bottom dropout mask is shared across group heads"
    # and the deterministic path is untouched by the rate
    _, probs_det, _ = hierarchical_head(params, feats, hier,
                                        dropout_rate=0.5,
                                        deterministic=True)
    _, probs_base, _ = hierarchical_head(params, feats, hier)
    np.testing.assert_allclose(np.asarray(probs_det),
                               np.asarray(probs_base))


# --------------------------------------------------------------------- #
# encoder
# --------------------------------------------------------------------- #

def test_encoder_forward_shapes_and_jit():
    cfg = EncoderConfig.tiny(vocab_size=100)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.randint(1, 100, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.float32)
    fwd = jax.jit(lambda p, i, m: encoder_forward(p, i, m, None, cfg))
    out = fwd(params, ids, mask)
    assert out.shape == (2, 16, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_encoder_mask_blocks_pad_influence():
    """Changing token content under a masked-out position must not change
    unmasked positions' outputs (the reference's input_ids>0 quirk would
    fail this under XLM-R conventions)."""
    cfg = EncoderConfig.tiny(vocab_size=100)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    ids1 = np.random.randint(1, 100, (1, 16)).astype(np.int32)
    ids2 = ids1.copy()
    ids2[0, 10:] = 7  # mutate only masked-out tail
    mask = np.ones((1, 16), np.float32)
    mask[0, 10:] = 0.0
    out1 = encoder_forward(params, jnp.asarray(ids1), jnp.asarray(mask),
                           None, cfg)
    out2 = encoder_forward(params, jnp.asarray(ids2), jnp.asarray(mask),
                           None, cfg)
    np.testing.assert_allclose(np.asarray(out1[:, :10]),
                               np.asarray(out2[:, :10]), atol=1e-5)


def test_encoder_parity_vs_hf_bert():
    """Random-init HF BertModel -> converter -> our encoder: outputs must
    match to ~1e-4 (f32, CPU).  Exercises the full checkpoint-conversion
    path of `--pre_trained_model`/`--tod_pre_trained_model`."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    from nbest_asr_tpu.models.hf_convert import (config_from_hf,
                                                 convert_hf_model)

    hf_cfg = BertConfig(
        vocab_size=120, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf_model = BertModel(hf_cfg, add_pooling_layer=False).eval()

    cfg = config_from_hf(hf_cfg)
    params = convert_hf_model(hf_model, cfg)
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.RandomState(1)
    ids = rng.randint(1, 120, (3, 20)).astype(np.int64)
    mask = np.ones((3, 20), np.float32)
    mask[0, 15:] = 0  # ragged row
    segs = rng.randint(0, 2, (3, 20)).astype(np.int64)

    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(segs),
        ).last_hidden_state.numpy()

    ours = np.asarray(encoder_forward(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask),
        jnp.asarray(segs, jnp.int32), cfg))

    # compare only unmasked positions (masked outputs are don't-care)
    m = mask.astype(bool)
    np.testing.assert_allclose(ours[m], hf_out[m], atol=2e-4, rtol=1e-3)


# --------------------------------------------------------------------- #
# full model
# --------------------------------------------------------------------- #

def test_model_forward_dual_stream(tiny_memory):
    mem = tiny_memory
    hier = hierarchy_device_arrays(mem.arrays())
    enc_cfg = EncoderConfig.tiny(vocab_size=64)
    cfg = ModelConfig(encoder=enc_cfg, n_top=mem.n_top,
                      n_bottom=mem.n_bottom)
    params = init_model_params(jax.random.PRNGKey(0), cfg)

    ids = jnp.asarray(np.random.randint(1, 64, (2, 12)), jnp.int32)
    mask = jnp.ones((2, 12), jnp.float32)
    top, probs, final, asr_cls, trans_cls = model_forward(
        params, cfg, hier, ids, mask, None,
        trans_input_ids=ids, trans_attn_mask=mask)
    assert trans_cls is not None
    assert asr_cls.shape == trans_cls.shape == (2, enc_cfg.hidden_size)
    # shared encoder weights: identical inputs give identical CLS
    np.testing.assert_allclose(np.asarray(asr_cls), np.asarray(trans_cls),
                               atol=1e-6)
    assert final.shape == (2, mem.n_bottom)


def test_encoder_parity_vs_hf_xlm_roberta():
    """Random-init HF XLMRobertaModel -> converter -> our encoder with the
    RoBERTa position offset (padding_idx+1 position numbering) and real
    attention masks."""
    torch = pytest.importorskip("torch")
    from transformers import XLMRobertaConfig, XLMRobertaModel

    from nbest_asr_tpu.models.hf_convert import (config_from_hf,
                                                 convert_hf_model)

    hf_cfg = XLMRobertaConfig(
        vocab_size=150, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=66, type_vocab_size=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pad_token_id=1,
    )
    torch.manual_seed(0)
    hf_model = XLMRobertaModel(hf_cfg, add_pooling_layer=False).eval()

    cfg = config_from_hf(hf_cfg)
    assert cfg.position_offset == 2
    params = jax.tree.map(jnp.asarray, convert_hf_model(hf_model, cfg))

    rng = np.random.RandomState(3)
    ids = rng.randint(2, 150, (2, 18)).astype(np.int64)
    mask = np.ones((2, 18), np.float32)

    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()

    ours = np.asarray(encoder_forward(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask), None,
        cfg))
    np.testing.assert_allclose(ours, hf_out, atol=2e-4, rtol=1e-3)
