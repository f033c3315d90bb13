"""Benchmark: DSTC2 fine-tune throughput (utterances/sec/chip).

Measures a real training epoch through the actual Trainer on the shipped
DSTC2 valid shard (3,560 utterances): offline-packed inputs, length
bucketing, jitted train step (BERT-base-sized encoder 12L/768H/12 heads,
hierarchical head over the real 30/161 label hierarchy, BertAdam update,
on-device metrics), bf16 compute, rbg dropout PRNG — the configuration a
`--compute_dtype bfloat16 --length_buckets 64,96,160,256` CLI run uses.

Baseline: the reference publishes no throughput numbers (SURVEY.md §6).
BASELINE.md's target is >=10x the reference single-GPU fine-tune rate.  We
use an estimated 40 utt/s for the reference (BERT-base fwd+bwd, batch 16,
per-batch-max padding, dual encoder pass, per-step CPU tokenization and
per-term .item() syncs on a V100-class GPU) and report
``vs_baseline = measured / 40``.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_UTT_PER_SEC = 40.0
REF_RAW = "/root/reference/dstc2_data/processed_data/raw"


def _real_packed(memory, tok):
    from nbest_asr_tpu.data.dataset import read_sep_data
    from nbest_asr_tpu.data.input_builder import pack_split

    split = read_sep_data(os.path.join(REF_RAW, "valid"))
    return pack_split(split, tok, memory, max_len=256)


def _synthetic_packed(memory, tok, n=3560):
    """Fallback when the reference shard is absent: DSTC2-like lengths."""
    from nbest_asr_tpu.data.dataset import RawSplit
    from nbest_asr_tpu.data.input_builder import pack_split

    rng = np.random.RandomState(0)
    words = [w for w in list(tok.vocab)[8:200]]
    rows, trans, labels = [], [], []
    label_names = [memory.idx2label[i] for i in range(2, memory.n_bottom)]
    for _ in range(n):
        L = int(np.clip(rng.lognormal(4.1, 0.45), 12, 220))
        sys_part = [words[i % len(words)] for i in rng.randint(
            0, len(words), max(4, L // 6))]
        usr_part = [words[i % len(words)] for i in rng.randint(
            0, len(words), L)]
        rows.append(["[CLS]", "[SYS]"] + sys_part + ["[USR]"] + usr_part)
        trans.append(["[CLS]", "[SYS]"] + sys_part + ["[USR]"]
                     + usr_part[: max(4, L // 3)])
        labels.append([label_names[rng.randint(len(label_names))]])
    return pack_split(RawSplit(rows, trans, labels), tok, memory,
                      max_len=256)


def main() -> None:
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    # persistent compile cache: the per-bucket train-step compiles are
    # ~2min each through the remote TPU compiler on first run, ~1s cached
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nbest_asr_tpu.config import RunOptions
    from nbest_asr_tpu.data.tokenizer import WordVocabTokenizer
    from nbest_asr_tpu.data.vocab import Memory
    from nbest_asr_tpu.models.encoder import EncoderConfig
    from nbest_asr_tpu.models.model import ModelConfig, init_model_params
    from nbest_asr_tpu.train.loop import Trainer

    mem_pt = os.path.join(REF_RAW, "memory.pt")
    if os.path.exists(mem_pt):
        memory = Memory.from_torch_pt(mem_pt)
    else:
        from nbest_asr_tpu.data.etl import build_memory

        memory = build_memory(
            ["x"], ["inform-food-chinese", "inform-food-indian",
                    "thankyou", "request-phone"], [])
    tok = WordVocabTokenizer(memory)

    if os.path.exists(os.path.join(REF_RAW, "valid")):
        packed = _real_packed(memory, tok)
    else:
        packed = _synthetic_packed(memory, tok)

    opt = RunOptions(
        dataset="dstc2", dataroot="bench", batchSize=32,
        max_epoch=50, optim_choice="bertadam", lr=3e-5, bert_lr=3e-5,
        bert_dropout=0.1, compute_dtype="bfloat16",
        length_buckets="64,96,160,256",
        # NBEST_BENCH_PACK=<capacity> probes example packing
        # (--pack_examples): every train row holds several utterances
        # behind a block-diagonal segment mask (data/packing.py)
        pack_examples=bool(os.environ.get("NBEST_BENCH_PACK")),
        pack_capacity=int(os.environ.get("NBEST_BENCH_PACK", "0") or 256),
        # per-bucket token-budget batching: quality-validated on the
        # smoke split (QUALITY.md — it *improves* F1 over fixed batch 32)
        token_budget=8192,
        # chain K optimizer steps per compiled call (lax.scan over the
        # step body, equality-tested vs single steps) — amortizes the
        # per-dispatch host+tunnel cost; NBEST_BENCH_CHAIN overrides
        steps_per_call=int(os.environ.get("NBEST_BENCH_CHAIN", "1")),
        experiment="/tmp/bench_exp")
    opt.exp_dir = "/tmp/bench_exp"

    # BERT-base-sized encoder; the word-vocab ids index a 30522 table so
    # the embedding/grad cost matches a real bert-base-uncased fine-tune.
    # Flash attention with in-kernel dropout is the TRAINING default on
    # TPU (~20% faster step at this config, tools/perf_probe.py; eval
    # stays on XLA via the ops/attention.py router)
    from nbest_asr_tpu.ops.attention import resolve_flash

    enc = EncoderConfig.bert_base(
        vocab_size=30522, compute_dtype="bfloat16",
        hidden_dropout=opt.bert_dropout, attn_dropout=opt.bert_dropout,
        use_flash_attention=resolve_flash(None),
        use_fused_ffn=resolve_flash(None),
        use_fused_attn=resolve_flash(None),
        # int8 training GEMMs are the TPU shipping default (round-5
        # ship decision: quality-neutral at n=10 on the pretrained
        # protocol, QUALITY.md; +5.7% step throughput).  The bench
        # matches the trainer's auto default (full fwd+attn+bwd stack,
        # NBEST_BENCH_INT8=2); =1 probes forward-only int8, =0 forces
        # the bf16 megakernels (--no_int8_train*).
        use_int8_train=int(os.environ.get("NBEST_BENCH_INT8",
                                          "2")) >= 1,
        use_int8_train_attn=int(os.environ.get("NBEST_BENCH_INT8",
                                               "2")) >= 1,
        use_int8_train_bwd=int(os.environ.get("NBEST_BENCH_INT8",
                                              "2")) >= 2)
    cfg = ModelConfig(encoder=enc, n_top=memory.n_top,
                      n_bottom=memory.n_bottom)
    # init on the CPU backend: dozens of tiny init compiles would each
    # round-trip the remote TPU compiler (the Trainer device_puts the tree)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_model_params(jax.random.PRNGKey(0), cfg)

    trainer = Trainer(opt, memory, cfg, params, {"train": packed})

    n_chips = int(np.prod(trainer.mesh.devices.shape))

    trainer.run_train_epoch()          # warmup epoch: compiles per bucket
    t0 = time.perf_counter()
    m = trainer.run_train_epoch()      # timed epoch
    dt = time.perf_counter() - t0

    n_utts = len(packed)               # epoch consumes ~all rows
    utt_per_sec = n_utts / dt / n_chips
    assert np.isfinite(m.mean_loss)
    print(json.dumps({
        "metric": "dstc2_finetune_throughput",
        "value": round(utt_per_sec, 2),
        "unit": "utterances/sec/chip",
        "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
