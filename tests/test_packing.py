"""Example packing (data/packing.py): per-utterance math must be
EXACTLY the unpacked math — block-diagonal segment-mask attention,
per-segment positions, per-segment CLS gathers (VERDICT r4 #3).

The segment-mask semantics themselves (ops/attention.py: a query attends
exactly the keys sharing its mask value) are pinned here against every
attention path: XLA, flash single-block, flash tiled, and the fused
megakernel — all in interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from nbest_asr_tpu.data.packing import (pack_train_data, plan_bins,
                                        _lengths)
from nbest_asr_tpu.models.encoder import EncoderConfig
from nbest_asr_tpu.models.model import ModelConfig, init_model_params, \
    model_forward
from nbest_asr_tpu.ops.attention import multi_head_attention


# --------------------------------------------------------------------- #
# planner / packer invariants
# --------------------------------------------------------------------- #

def _fake_host_data(rng, n=23, max_len=40, n_bottom=9, vocab=50):
    lens = rng.randint(3, max_len + 1, size=n)
    tlens = np.maximum(2, lens - rng.randint(0, 3, size=n))
    ids = np.zeros((n, max_len), np.int32)
    tids = np.zeros((n, max_len), np.int32)
    mask = np.zeros((n, max_len), np.float32)
    tmask = np.zeros((n, max_len), np.float32)
    segs = np.zeros((n, max_len), np.int32)
    for i in range(n):
        ids[i, :lens[i]] = rng.randint(2, vocab, size=lens[i])
        mask[i, :lens[i]] = 1.0
        tids[i, :tlens[i]] = rng.randint(2, vocab, size=tlens[i])
        tmask[i, :tlens[i]] = 1.0
        segs[i, lens[i] // 2:lens[i]] = 1
    labels = (rng.rand(n, n_bottom) < 0.2).astype(np.float32)
    return {"input_ids": ids, "attn_mask": mask, "segment_ids": segs,
            "trans_input_ids": tids, "trans_attn_mask": tmask,
            "trans_segment_ids": np.zeros_like(segs), "labels": labels}


def test_plan_bins_invariants():
    rng = np.random.RandomState(0)
    data = _fake_host_data(rng, n=57)
    al, tl = _lengths(data["attn_mask"]), _lengths(data["trans_attn_mask"])
    bins = plan_bins(al, tl, capacity=64, max_segs=4)
    seen = sorted(r for b in bins for r in b)
    assert seen == list(range(57))          # every row exactly once
    for b in bins:
        assert len(b) <= 4
        assert sum(int(al[r]) for r in b) <= 64
        assert sum(int(tl[r]) for r in b) <= 64


def test_pack_train_data_arrays():
    rng = np.random.RandomState(1)
    data = _fake_host_data(rng)
    pk, bins = pack_train_data(data, capacity=64, max_segs=4)
    m, cap = pk["input_ids"].shape
    assert m == len(bins)
    al = _lengths(data["attn_mask"])
    for i, rows in enumerate(bins):
        off = 0
        for j, r in enumerate(rows):
            L = int(al[r])
            assert pk["cls_pos"][i, j] == off
            np.testing.assert_array_equal(
                pk["input_ids"][i, off:off + L],
                data["input_ids"][r, :L])
            # mask carries the segment id, positions restart at 0
            assert (pk["attn_mask"][i, off:off + L] == j + 1).all()
            np.testing.assert_array_equal(
                pk["position_ids"][i, off:off + L], np.arange(L))
            np.testing.assert_array_equal(pk["labels"][i, j],
                                          data["labels"][r])
            assert pk["seg_mask"][i, j] == 1.0
            off += L
        assert (pk["attn_mask"][i, off:] == 0).all()
        assert (pk["seg_mask"][i, len(rows):] == 0).all()


def test_pack_widens_capacity_never_truncates():
    rng = np.random.RandomState(2)
    data = _fake_host_data(rng, max_len=70)
    pk, _ = pack_train_data(data, capacity=16, max_segs=4)
    longest = int(_lengths(data["attn_mask"]).max())
    assert pk["input_ids"].shape[1] >= longest


# --------------------------------------------------------------------- #
# segment-mask attention semantics, all paths
# --------------------------------------------------------------------- #

def _two_seg_case(s=32, h=2, d=8, seed=3):
    """One row holding two segments (lengths 10 and 13, 9 pad) plus the
    same content as two separate rows."""
    rng = np.random.RandomState(seed)
    q = rng.randn(1, s, h, d).astype(np.float32)
    mask = np.zeros((1, s), np.float32)
    mask[0, :10] = 1.0
    mask[0, 10:23] = 2.0
    # unpacked: two rows with the segments at the front
    q2 = np.zeros((2, s, h, d), np.float32)
    q2[0, :10] = q[0, :10]
    q2[1, :13] = q[0, 10:23]
    mask2 = np.zeros((2, s), np.float32)
    mask2[0, :10] = 1.0
    mask2[1, :13] = 1.0
    return q, mask, q2, mask2


def test_xla_segment_mask_equals_unpacked():
    q, mask, q2, mask2 = _two_seg_case()
    out = np.asarray(multi_head_attention(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray(q),
        jnp.asarray(mask)))
    ref = np.asarray(multi_head_attention(
        jnp.asarray(q2), jnp.asarray(q2), jnp.asarray(q2),
        jnp.asarray(mask2)))
    np.testing.assert_allclose(out[0, :10], ref[0, :10], atol=1e-6)
    np.testing.assert_allclose(out[0, 10:23], ref[1, :13], atol=1e-6)


@pytest.mark.parametrize("tiled", [False, True])
def test_flash_segment_mask_matches_xla(tiled):
    from nbest_asr_tpu.ops.flash_attention import flash_attention

    s = 256 if tiled else 64
    rng = np.random.RandomState(4)
    x = rng.randn(2, s, 2, 16).astype(np.float32)
    mask = np.zeros((2, s), np.float32)
    mask[0, : s // 3] = 1.0
    mask[0, s // 3: 2 * s // 3] = 2.0
    mask[1, : s // 2] = 1.0
    kw = dict(block_q=128, block_k=128) if tiled else {}
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(jnp.asarray(x), jnp.asarray(x),
                              jnp.asarray(x), jnp.asarray(mask), **kw)
    ref = multi_head_attention(jnp.asarray(x), jnp.asarray(x),
                               jnp.asarray(x), jnp.asarray(mask))
    valid = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(out)[valid],
                               np.asarray(ref)[valid], atol=2e-5)


def test_fused_attention_segment_mask_matches_oracle():
    from tests.test_fused_attention import _oracle, _params

    rng = np.random.RandomState(5)
    b, s, h, nh = 2, 24, 128, 2
    x = jnp.asarray((rng.randn(b, s, h) * 0.5).astype(np.float32))
    p = _params(rng, h)
    mask = np.zeros((b, s), np.float32)
    mask[0, :9] = 1.0
    mask[0, 9:20] = 2.0
    mask[1, :15] = 1.0
    mask = jnp.asarray(mask)
    from nbest_asr_tpu.ops.fused_attention import fused_attention_block

    with pltpu.force_tpu_interpret_mode():
        got = fused_attention_block(
            x, p["wqkv"], p["bqkv"], p["wo"], p["bo"], p["ls"], p["lb"],
            mask, n_heads=nh)
    want = _oracle(x, p, mask, nh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


# --------------------------------------------------------------------- #
# end-to-end: packed forward == unpacked forward, per utterance
# --------------------------------------------------------------------- #

def test_packed_forward_bit_equals_unpacked(tiny_memory):
    from nbest_asr_tpu.models.heads import hierarchy_device_arrays

    mem = tiny_memory
    hier = hierarchy_device_arrays(mem.arrays())
    rng = np.random.RandomState(6)
    data = _fake_host_data(rng, n=13, max_len=24, n_bottom=mem.n_bottom,
                           vocab=40)
    pk, bins = pack_train_data(data, capacity=48, max_segs=3)
    assert any(len(b) >= 2 for b in bins), "case must actually pack"

    cfg = ModelConfig(
        encoder=EncoderConfig.tiny(vocab_size=40),
        n_top=mem.n_top, n_bottom=mem.n_bottom)
    params = init_model_params(jax.random.PRNGKey(0), cfg)

    top_p, _, final_p, cls_p, _ = model_forward(
        params, cfg, hier,
        jnp.asarray(pk["input_ids"]), jnp.asarray(pk["attn_mask"]),
        jnp.asarray(pk["segment_ids"]),
        position_ids=jnp.asarray(pk["position_ids"]),
        cls_positions=jnp.asarray(pk["cls_pos"]),
        deterministic=True)
    top_u, _, final_u, cls_u, _ = model_forward(
        params, cfg, hier,
        jnp.asarray(data["input_ids"]), jnp.asarray(data["attn_mask"]),
        jnp.asarray(data["segment_ids"]), deterministic=True)

    n_seg = pk["cls_pos"].shape[1]
    top_p, final_p, cls_p = (np.asarray(top_p), np.asarray(final_p),
                             np.asarray(cls_p))
    for i, rows in enumerate(bins):
        for j, r in enumerate(rows):
            flat = i * n_seg + j
            np.testing.assert_allclose(cls_p[flat], np.asarray(cls_u)[r],
                                       atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(top_p[flat], np.asarray(top_u)[r],
                                       atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(
                final_p[flat], np.asarray(final_u)[r],
                atol=1e-5, rtol=1e-5)


def test_packed_decode_f1_equal_unpacked(tiny_memory):
    """Decode + F1 counters on packed outputs == unpacked, with the
    segment mask zeroing the empty slots (VERDICT r4 #3 'decode/F1
    bit-equality test vs unpacked')."""
    from nbest_asr_tpu.models.heads import hierarchy_device_arrays
    from nbest_asr_tpu.train.decode import decode_multihot
    from nbest_asr_tpu.train.metrics import f1_counts_from_multihot

    mem = tiny_memory
    hier = hierarchy_device_arrays(mem.arrays())
    rng = np.random.RandomState(7)
    data = _fake_host_data(rng, n=13, max_len=24, n_bottom=mem.n_bottom,
                           vocab=40)
    pk, bins = pack_train_data(data, capacity=48, max_segs=3)

    cfg = ModelConfig(
        encoder=EncoderConfig.tiny(vocab_size=40),
        n_top=mem.n_top, n_bottom=mem.n_bottom)
    params = init_model_params(jax.random.PRNGKey(0), cfg)

    top_p, probs_p, _, _, _ = model_forward(
        params, cfg, hier,
        jnp.asarray(pk["input_ids"]), jnp.asarray(pk["attn_mask"]),
        jnp.asarray(pk["segment_ids"]),
        position_ids=jnp.asarray(pk["position_ids"]),
        cls_positions=jnp.asarray(pk["cls_pos"]), deterministic=True)
    top_u, probs_u, _, _, _ = model_forward(
        params, cfg, hier,
        jnp.asarray(data["input_ids"]), jnp.asarray(data["attn_mask"]),
        jnp.asarray(data["segment_ids"]), deterministic=True)

    pred_p = decode_multihot(top_p, probs_p, hier)
    pred_u = decode_multihot(top_u, probs_u, hier)
    n_seg = pk["cls_pos"].shape[1]
    for i, rows in enumerate(bins):
        for j, r in enumerate(rows):
            np.testing.assert_array_equal(
                np.asarray(pred_p)[i * n_seg + j], np.asarray(pred_u)[r])

    labels_flat = jnp.asarray(pk["labels"].reshape(-1, mem.n_bottom))
    cnt_p = f1_counts_from_multihot(
        pred_p, labels_flat, jnp.asarray(pk["seg_mask"].reshape(-1)))
    cnt_u = f1_counts_from_multihot(pred_u,
                                    jnp.asarray(data["labels"]))
    for k in cnt_u:
        assert float(cnt_p[k]) == float(cnt_u[k]), k


def test_packed_trainer_smoke(tiny_memory):
    """A packed Trainer epoch runs end-to-end (train + unpacked eval)
    and produces finite, sane metrics."""
    from nbest_asr_tpu.config import RunOptions
    from nbest_asr_tpu.data.input_builder import PackedSplit
    from nbest_asr_tpu.train.loop import Trainer

    mem = tiny_memory
    rng = np.random.RandomState(8)
    n = 48
    data = _fake_host_data(rng, n=n, max_len=24, n_bottom=mem.n_bottom,
                           vocab=40)
    label_names = [mem.idx2label[i] for i in range(mem.n_bottom)]
    split = PackedSplit(
        input_ids=data["input_ids"], segment_ids=data["segment_ids"],
        attn_mask=data["attn_mask"],
        trans_input_ids=data["trans_input_ids"],
        trans_segment_ids=data["trans_segment_ids"],
        trans_attn_mask=data["trans_attn_mask"],
        labels=data["labels"],
        raw_asr=[["w"] for _ in range(n)],
        raw_labels=[[label_names[int(j)]
                     for j in np.nonzero(data["labels"][i])[0]]
                    for i in range(n)],
        max_len=24)
    opt = RunOptions(dataset="t", dataroot="t", batchSize=8, max_epoch=2,
                     lr=1e-3, bert_lr=1e-3, pack_examples=True,
                     pack_capacity=48, pack_max_segs=3,
                     experiment="/tmp/pack_smoke")
    opt.exp_dir = "/tmp/pack_smoke"
    cfg = ModelConfig(encoder=EncoderConfig.tiny(vocab_size=40),
                      n_top=mem.n_top, n_bottom=mem.n_bottom)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    tr = Trainer(opt, mem, cfg, params,
                 {"train": split, "valid": split})
    m1 = tr.run_train_epoch()
    assert np.isfinite(m1.mean_loss)
    m2, _ = tr.run_eval_epoch("valid")
    assert np.isfinite(m2.mean_loss)
    assert 0.0 <= m2.acc <= 100.0
