"""Multi-host direct data mode through the Trainer (VERDICT r2 #4 /
SURVEY.md §5.8).

The building blocks (process_sharded_batch + data_mode='direct' steps)
were covered in round 2; these tests cover the NEW usable path: the
per-process train shard (`parallel/process_data.py`) and the Trainer
epoch driver running on it end to end.

- partition properties at process_count=4: disjoint/complete ownership,
  every row trained exactly once per epoch, identical cross-process plan
  geometry and RNG consumption;
- single-process degenerate case: `--data_mode direct` trains 2 epochs
  BIT-IDENTICAL to index mode (params and metrics), with bucketing,
  token-budget batching and steps_per_call chaining all on.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nbest_asr_tpu.config import RunOptions
from nbest_asr_tpu.data.input_builder import PackedSplit
from nbest_asr_tpu.models.encoder import EncoderConfig
from nbest_asr_tpu.models.model import ModelConfig, init_model_params
from nbest_asr_tpu.parallel.process_data import ProcessTrainShard
from nbest_asr_tpu.train.loop import Trainer

VOCAB = 64


pytestmark = pytest.mark.slow  # CPU-training / subprocess tier


def _synthetic_packed(n_rows: int, max_len: int, n_bottom: int,
                      seed: int = 0) -> PackedSplit:
    """Random fixed-shape split with a mix of real lengths so bucketing
    has work to do."""
    rng = np.random.RandomState(seed)
    lens = rng.choice([6, 10, 14, 20, 28, max_len], size=n_rows)
    ids = np.zeros((n_rows, max_len), np.int32)
    mask = np.zeros((n_rows, max_len), np.float32)
    for i, L in enumerate(lens):
        ids[i, :L] = rng.randint(3, VOCAB, L)
        mask[i, :L] = 1.0
    labels = (rng.rand(n_rows, n_bottom) < 0.1).astype(np.float32)
    segs = np.zeros_like(ids)
    return PackedSplit(
        input_ids=ids, segment_ids=segs, attn_mask=mask,
        trans_input_ids=ids.copy(), trans_segment_ids=segs.copy(),
        trans_attn_mask=mask.copy(), labels=labels,
        raw_asr=[["w"] for _ in range(n_rows)],
        raw_labels=[[] for _ in range(n_rows)], max_len=max_len)


def _host_dict(p: PackedSplit):
    return {
        "input_ids": p.input_ids, "attn_mask": p.attn_mask,
        "segment_ids": p.segment_ids,
        "trans_input_ids": p.trans_input_ids,
        "trans_attn_mask": p.trans_attn_mask,
        "trans_segment_ids": p.trans_segment_ids, "labels": p.labels,
    }


def test_shard_partition_and_epoch_coverage():
    P = 4
    packed = _synthetic_packed(101, 32, 9, seed=3)
    data = _host_dict(packed)
    shards = [ProcessTrainShard(data, [16, 32], process_index=p,
                                process_count=P) for p in range(P)]

    # ownership: disjoint and complete
    owned = np.concatenate([s.owned_rows for s in shards])
    assert len(owned) == 101 and len(np.unique(owned)) == 101

    # same bucket geometry everywhere
    for s in shards[1:]:
        assert [b.blen for b in s.buckets] == \
            [b.blen for b in shards[0].buckets]
        assert [b.global_n for b in s.buckets] == \
            [b.global_n for b in shards[0].buckets]

    # identical plan geometry + RNG consumption across processes
    plans = [s.epoch_plan(np.random.RandomState(42), lambda blen: 8, 2)
             for s in shards]
    states = [np.random.RandomState(42) for _ in range(P)]
    for s, st in zip(shards, states):
        s.epoch_plan(st, lambda blen: 8, 2)
    r0 = states[0].randint(1 << 30)
    assert all(st.randint(1 << 30) == r0 for st in states[1:])
    for p in plans[1:]:
        assert [(bi, mb, idx.shape) for bi, mb, idx in p] == \
            [(bi, mb, idx.shape) for bi, mb, idx in plans[0]]

    # every global row trained at most once per epoch (trailing micros
    # that don't fill an accumulation group are dropped, same as index
    # mode); local index i of a bucket is its i-th owned row
    from nbest_asr_tpu.data.bucketing import (bucket_assignment,
                                              row_lengths)

    assignment = bucket_assignment(row_lengths(data), [16, 32], 32)
    seen = []
    for p, (s, plan) in enumerate(zip(shards, plans)):
        for bi, mb, idx in plan:
            b = s.buckets[bi]
            real = idx[idx < b.local_n]
            assert len(np.unique(real)) == len(real)
            bucket_rows = assignment[bi][1]
            seen.extend(bucket_rows[b.owned_pos[real]].tolist())
    assert len(seen) == len(set(seen))
    assert len(seen) >= 90  # near-full coverage of the 101 rows

    # masks: sentinel slots produce example_mask 0 and clamp in-range
    s0, (bi, mb, idx) = shards[0], plans[0][-1]
    lb = s0.local_batch(bi, idx[0])
    assert lb["example_mask"].shape == idx[0].shape
    n_real = int(lb["example_mask"].sum())
    assert n_real == int((idx[0] < s0.buckets[bi].local_n).sum())


def test_single_process_plan_matches_index_mode_rng():
    """With one process the shard's epoch plan must consume the RNG and
    produce the same index geometry as the index-mode Trainer helpers."""
    from nbest_asr_tpu.train.loop import _epoch_step_indices

    packed = _synthetic_packed(57, 32, 9, seed=5)
    data = _host_dict(packed)
    shard = ProcessTrainShard(data, [16, 32])

    r_direct = np.random.RandomState(7)
    plan = shard.epoch_plan(r_direct, lambda blen: 8, 2)

    r_index = np.random.RandomState(7)
    for (bi, mb, idx) in plan:
        b = shard.buckets[bi]
        perm = r_index.permutation(b.global_n)
        ref = _epoch_step_indices(b.global_n, 8, 2, perm)
        np.testing.assert_array_equal(idx, ref)
    assert r_direct.randint(1 << 30) == r_index.randint(1 << 30)


@pytest.fixture(scope="module")
def trainer_setup():
    from nbest_asr_tpu.data.etl import build_memory

    labels = ["inform-food-chinese", "inform-food-indian",
              "request-phone", "thankyou", "negate"]
    memory = build_memory("a b c d".split(), labels, ["inform"])
    packed = {"train": _synthetic_packed(60, 32, memory.n_bottom, seed=1),
              "valid": _synthetic_packed(16, 32, memory.n_bottom, seed=2)}
    enc = EncoderConfig.tiny(vocab_size=VOCAB)
    cfg = ModelConfig(encoder=enc, n_top=memory.n_top,
                      n_bottom=memory.n_bottom)
    return memory, packed, cfg


def _train_two_epochs(trainer_setup, tmp_path, mode: str):
    memory, packed, cfg = trainer_setup
    opt = RunOptions(dataset="dstc2", dataroot="unused",
                     experiment=str(tmp_path), batchSize=8, max_epoch=8,
                     random_seed=11, lr=1e-3, bert_lr=1e-3,
                     length_buckets="16,32", token_budget=128,
                     steps_per_call=2, data_mode=mode)
    opt.exp_dir = str(tmp_path)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    tr = Trainer(opt, memory, cfg, params, packed)
    metrics = [tr.run_train_epoch() for _ in range(2)]
    return jax.device_get(tr.state.params), metrics, tr


def test_direct_mode_bit_identical_to_index_mode(trainer_setup, tmp_path):
    p_idx, m_idx, _ = _train_two_epochs(trainer_setup,
                                        tmp_path / "i", "index")
    p_dir, m_dir, tr = _train_two_epochs(trainer_setup,
                                         tmp_path / "d", "direct")
    assert tr.direct_data and tr._shard is not None
    for a, b in zip(jax.tree.leaves(p_idx), jax.tree.leaves(p_dir)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for ma, mb in zip(m_idx, m_dir):
        assert ma == mb

    # eval still works in direct mode (valid split stays on index path)
    em, _ = tr.run_eval_epoch("valid", 0)
    assert np.isfinite(em.mean_loss)
