"""Run configuration + CLI.

The public flag surface is the reference's argparse
(`n_best_asr_bert.py:39-142`, documented in its README:50-64) — flag names
are API.  TPU-native additions are grouped at the bottom and default to
sensible TPU behavior.

Unlike the reference (which mutates one argparse namespace and threads it
everywhere, including into the model forward — SURVEY.md §5.6), this is a
plain dataclass resolved once; runtime objects (tokenizer, optimizer, mesh)
live in the Trainer.
"""

from __future__ import annotations

import argparse
import json
import os
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class RunOptions:
    # ------------- model structure (ref :43-55) ----------------------- #
    emb_size: int = 256
    hidden_size: int = 512
    max_seq_len: Optional[int] = None
    n_layers: int = 6
    n_head: int = 4
    d_k: int = 64
    d_v: int = 64
    score_util: str = "pp"          # vestigial in the reference; accepted
    sent_repr: str = "bin_sa_cls"   # vestigial; accepted
    cls_type: str = "stc"

    # ------------- data & vocab (ref :57-63) -------------------------- #
    dataset: str = "dstc2"
    dataroot: str = ""
    train_file: str = "train"
    valid_file: str = "valid"
    test_file: str = "test"
    ontology_path: Optional[str] = None

    # ------------- pretrained model (ref :66-68, :100-101) ------------ #
    bert_model_name: str = "bert-base-uncased"
    fix_bert_model: bool = False
    pre_trained_model: Optional[str] = None       # bert|roberta|xlm-roberta
    tod_pre_trained_model: Optional[str] = None   # checkpoint path
    require_pretrained: bool = False              # hard-fail instead of the
    # from-scratch fallback when the requested checkpoint can't be loaded
    # (the reference always fails loudly here, `n_best_asr_bert.py:480-487`;
    # the fallback exists only because this environment may have no
    # checkpoint on disk — it must never be silent)

    # ------------- training & testing (ref :71-86) -------------------- #
    testing: bool = False
    deviceId: int = -1              # accepted for CLI parity; JAX picks
    random_seed: int = 999
    l2: float = 0.0
    dropout: float = 0.0
    bert_dropout: float = 0.1
    batchSize: int = 16
    max_norm: float = 5.0
    max_epoch: int = 50
    experiment: str = "exp"
    optim_choice: str = "bertadam"
    lr: float = 5e-4
    bert_lr: float = 1e-5
    warmup_proportion: float = 0.1
    init_type: str = "uf"
    init_range: float = 0.2

    # ------------- semantics flags (ref :89-109) ---------------------- #
    with_system_act: bool = False
    coverage: Optional[float] = None
    add_l2_loss: bool = False
    without_system_act: bool = False
    add_segment_ids: bool = False

    # ------------- TPU-native additions ------------------------------- #
    compute_dtype: str = "float32"        # bfloat16 for the TPU hot path
    prng_impl: str = "rbg"                # dropout-mask PRNG; "rbg" makes
    # attention-prob dropout ~free on TPU (threefry costs ~20% of the
    # train step at BERT-base/seq-256; measured on v5e)
    use_flash_attention: "bool | None" = None  # None = auto: Pallas
    # attention on the TRAINING path when running on a TPU backend (it
    # wins there with in-kernel dropout, tools/perf_probe.py); eval stays
    # on XLA either way (ops/attention.py routing)
    use_fused_ffn: "bool | None" = None   # None = auto: the Pallas FFN
    # megakernel (ops/fused_ffn.py) on TPU backends — ~4% faster steps
    # at every DSTC2 bucket with both FFN weights VMEM-resident
    use_fused_attn: "bool | None" = None  # None = auto: the Pallas
    # attention-block megakernel (ops/fused_attention.py) on TPU —
    # QKV GEMM + attention + out-proj + dropout/residual/LN fused,
    # training path, seq <= 512
    int8_train: "bool | None" = None      # int8 FORWARD GEMMs in the
    # training FFN megakernel (bf16 backward otherwise).  None = auto:
    # ON when training on a TPU backend with bfloat16 compute (where
    # the megakernels route); measured quality-neutral at n=10 on the
    # pretrained protocol (QUALITY.md int8-training table: test F1
    # 88.53 ± 0.53 int8 fwd+attn+bwd vs 88.46 ± 0.57 bf16, identical
    # accuracy) for +5.7% step throughput (PERFORMANCE.md)
    int8_train_attn: "bool | None" = None  # extend int8-train to the
    # attention megakernel's QKV + out-proj GEMMs
    # (ops/fused_attention.fused_attention_block_int8_train);
    # same auto rule as int8_train
    int8_train_bwd: "bool | None" = None  # extend int8-train to the
    # backwards' dgrad + recompute GEMMs (quantized-gradient rounding
    # enters dgrads; measured with its own quality arms — see
    # QUALITY.md); same auto rule as int8_train
    flash_min_seq: int = 160              # flash-attention routing
    # threshold (bucketed seq >= this trains on the Pallas kernel);
    # serialized into the exp dir when non-default, dumped with the rest
    # of the config to exp_dir/config.json
    remat: bool = False
    n_model_parallel: int = 1             # tensor-parallel mesh axis
    len_multiple: int = 8                 # pad lengths to this multiple
    length_buckets: str = ""              # e.g. "128,192,256": group rows
    # by length into per-bucket fixed shapes (one compile per bucket);
    # batches are drawn within a bucket, step order shuffled — trades the
    # reference's fully-iid batch order for ~2x less padding compute
    memory_file: str = "memory.json"      # memory.pt also accepted
    native_loader: bool = True            # C++ shard loader when built
    eval_batch: Optional[int] = None      # defaults to the train micro_b
    steps_per_call: int = 1               # chain K optimizer steps into
    # one compiled call (lax.scan) to amortize per-dispatch latency
    token_budget: Optional[int] = None    # per-bucket batch sizing: pick
    # each bucket's micro-batch as ~token_budget/bucket_len (rounded to
    # 8, never below the parity micro-batch).  NOT reference-parity: the
    # effective optimizer batch varies per bucket; validated for quality
    # on the smoke split (QUALITY.md) before use
    pack_examples: bool = False           # TRAIN-split example packing
    # (data/packing.py): several utterances share one pack_capacity-token
    # row with block-diagonal segment-mask attention, per-segment
    # positions and per-segment CLS gathers — per-utterance math
    # unchanged (bit-equality pinned by tests/test_packing.py), epoch
    # runs at the long-seq MFU with ~full token occupancy.  Eval splits
    # stay unpacked
    pack_capacity: int = 256              # packed row length (widened,
    # never truncating, if an utterance is longer)
    pack_max_segs: int = 8                # max utterances per packed row
    data_mode: str = "index"              # "index": whole split device-
    # resident, steps gather by row index (single-controller, <= 1 host).
    # "direct": each process owns a strided shard of the train split and
    # global microbatches are assembled per step via
    # jax.make_array_from_process_local_data — the multi-host path
    # (docs/SCALING.md).  Single-process direct == index bit-exactly.
    checkpoint_every: int = 0             # extra periodic ckpt (epochs)
    resume: Optional[str] = None          # checkpoint dir to resume from
    profile_dir: Optional[str] = None     # jax.profiler trace of epoch 1
    eval_every: int = 1                   # evaluate valid/test every N
    # epochs (always on the final epoch).  The reference evaluates every
    # epoch unconditionally (`n_best_asr_bert.py:408-424`); N>1 trades
    # best-epoch granularity for wall time on long/small-data runs
    eval_artifacts: str = "full"          # "full": reference-parity
    # per-epoch artifacts (valid/test.iterN[.err] dumps, observability
    # CSVs + per-label classification reports — ref tod_asr_util.py:
    # 202-223).  "none": skip them (metrics/logs/best.json unchanged) —
    # for seed sweeps, where the per-epoch pandas/sklearn host work
    # dominates wall time on small hosts
    save_best: str = "ckpt"               # "ckpt": Orbax-checkpoint on
    # every new best valid F1 (needed for --testing / resume-best).
    # "none": track + log best without writing params — sweep runs that
    # only consume best.json

    # ------------- resolved at setup ---------------------------------- #
    ontology: Optional[dict] = field(default=None, repr=False)
    exp_dir: str = ""

    @property
    def n_accum_steps(self) -> int:
        # parity: `n_best_asr_bert.py:522`
        return 4 if self.n_layers == 12 else 1

    @property
    def micro_batch(self) -> int:
        # parity: dataloader batch = batchSize / n_accum (ref :527)
        return max(1, int(self.batchSize / self.n_accum_steps))

    @property
    def layout(self) -> str:
        if self.tod_pre_trained_model:
            return "tod"
        if self.without_system_act:
            return "no_system_act"
        return "default"

    def resolve(self) -> "RunOptions":
        if self.ontology_path:
            with open(self.ontology_path) as fp:
                self.ontology = json.load(fp)
        if not self.exp_dir:
            from .utils.exp_dir import get_exp_dir

            self.exp_dir = get_exp_dir(self)
        return self


def parse_arguments(argv=None) -> RunOptions:
    d = RunOptions()
    p = argparse.ArgumentParser(
        description="nbest_asr_tpu trainer (reference-compatible CLI)")

    # model structure
    p.add_argument("--emb_size", type=int, default=d.emb_size)
    p.add_argument("--hidden_size", type=int, default=d.hidden_size)
    p.add_argument("--max_seq_len", type=int, default=None)
    p.add_argument("--n_layers", type=int, default=d.n_layers)
    p.add_argument("--n_head", type=int, default=d.n_head)
    p.add_argument("--d_k", type=int, default=d.d_k)
    p.add_argument("--d_v", type=int, default=d.d_v)
    p.add_argument("--score_util", default=d.score_util,
                   choices=["none", "np", "pp", "mul"])
    p.add_argument("--sent_repr", default=d.sent_repr)
    p.add_argument("--cls_type", default=d.cls_type,
                   choices=["nc", "tf_hd", "stc"])

    # data & vocab
    p.add_argument("--dataset", required=True)
    p.add_argument("--dataroot", required=True)
    p.add_argument("--train_file", default=d.train_file)
    p.add_argument("--valid_file", default=d.valid_file)
    p.add_argument("--test_file", default=d.test_file)
    p.add_argument("--ontology_path", default=None)

    # pretrained model
    p.add_argument("--bert_model_name", default=d.bert_model_name)
    p.add_argument("--fix_bert_model", action="store_true")
    p.add_argument("--pre_trained_model", default=None)
    p.add_argument("--tod_pre_trained_model", default=None)
    p.add_argument("--require_pretrained", action="store_true")

    # training & testing
    p.add_argument("--testing", action="store_true")
    p.add_argument("--deviceId", type=int, default=-1)
    p.add_argument("--random_seed", type=int, default=d.random_seed)
    p.add_argument("--l2", type=float, default=d.l2)
    p.add_argument("--dropout", type=float, default=d.dropout)
    p.add_argument("--bert_dropout", type=float, default=d.bert_dropout)
    p.add_argument("--batchSize", type=int, default=d.batchSize)
    p.add_argument("--max_norm", type=float, default=d.max_norm)
    p.add_argument("--max_epoch", type=int, default=d.max_epoch)
    p.add_argument("--experiment", default=d.experiment)
    p.add_argument("--optim_choice", default=d.optim_choice,
                   choices=["adam", "adamw", "bertadam"])
    p.add_argument("--lr", type=float, default=d.lr)
    p.add_argument("--bert_lr", type=float, default=d.bert_lr)
    p.add_argument("--warmup_proportion", type=float,
                   default=d.warmup_proportion)
    p.add_argument("--init_type", default=d.init_type,
                   choices=["uf", "xuf", "normal"])
    p.add_argument("--init_range", type=float, default=d.init_range)

    # semantics flags
    p.add_argument("--with_system_act", action="store_true")
    p.add_argument("--coverage", type=float, default=None)
    p.add_argument("--add_l2_loss", action="store_true")
    p.add_argument("--without_system_act", action="store_true")
    p.add_argument("--add_segment_ids", action="store_true")

    # TPU-native
    p.add_argument("--compute_dtype", default=d.compute_dtype,
                   choices=["float32", "bfloat16"])
    p.add_argument("--prng_impl", default=d.prng_impl,
                   choices=["rbg", "unsafe_rbg", "threefry2x32"])
    p.add_argument("--use_flash_attention", action="store_true",
                   default=None, help="force the Pallas attention kernel "
                   "on the training path (default: auto — on for TPU)")
    p.add_argument("--no_flash_attention", dest="use_flash_attention",
                   action="store_false", help="force the XLA attention "
                   "path everywhere")
    p.add_argument("--use_fused_ffn", action="store_true", default=None,
                   help="force the Pallas FFN megakernel (default: auto "
                   "— on for TPU)")
    p.add_argument("--no_fused_ffn", dest="use_fused_ffn",
                   action="store_false", help="force the XLA FFN path")
    p.add_argument("--use_fused_attn", dest="use_fused_attn",
                   action="store_true", default=None,
                   help="force the Pallas attention-block megakernel "
                   "(default: auto — on for TPU)")
    p.add_argument("--no_fused_attn", dest="use_fused_attn",
                   action="store_false",
                   help="force the XLA attention path")
    p.add_argument("--int8_train", action="store_true", default=None,
                   help="int8 forward GEMMs in the training FFN "
                   "megakernel (bf16 backward); requires the fused FFN "
                   "kernel + bf16 compute (default: auto — on for "
                   "TPU + bfloat16, quality-neutral at n=10, "
                   "QUALITY.md)")
    p.add_argument("--no_int8_train", dest="int8_train",
                   action="store_false",
                   help="force bf16 GEMMs in the training FFN kernel")
    p.add_argument("--int8_train_attn", action="store_true",
                   default=None,
                   help="also run the attention megakernel's QKV + "
                   "out-proj forward GEMMs int8 (requires "
                   "--fused_attn; independent of --int8_train; "
                   "default: auto — on for TPU + bfloat16)")
    p.add_argument("--no_int8_train_attn", dest="int8_train_attn",
                   action="store_false",
                   help="force bf16 GEMMs in the training attention "
                   "kernel")
    p.add_argument("--int8_train_bwd", action="store_true",
                   default=None,
                   help="also run the FFN/attention backwards' dgrad + "
                   "recompute GEMMs int8 (with --int8_train / "
                   "--int8_train_attn; default: auto — on for "
                   "TPU + bfloat16)")
    p.add_argument("--no_int8_train_bwd", dest="int8_train_bwd",
                   action="store_false",
                   help="force bf16 backward GEMMs")
    p.add_argument("--flash_min_seq", type=int, default=d.flash_min_seq,
                   help="flash-attention routing threshold (bucketed "
                   "seq >= this trains on the Pallas kernel)")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--n_model_parallel", type=int, default=1)
    p.add_argument("--len_multiple", type=int, default=d.len_multiple)
    p.add_argument("--length_buckets", default=d.length_buckets)
    p.add_argument("--memory_file", default=d.memory_file)
    p.add_argument("--no_native_loader", dest="native_loader",
                   action="store_false")
    p.set_defaults(native_loader=True)
    p.add_argument("--eval_batch", type=int, default=None)
    p.add_argument("--steps_per_call", type=int, default=d.steps_per_call)
    p.add_argument("--token_budget", type=int, default=None)
    p.add_argument("--pack_examples", action="store_true",
                   help="pack several train utterances per fixed-shape "
                   "row (block-diagonal segment attention, per-segment "
                   "positions/CLS; per-utterance math unchanged)")
    p.add_argument("--pack_capacity", type=int, default=d.pack_capacity,
                   help="packed row length (widened if an utterance is "
                   "longer; never truncates)")
    p.add_argument("--pack_max_segs", type=int, default=d.pack_max_segs,
                   help="max utterances per packed row")
    p.add_argument("--data_mode", default=d.data_mode,
                   choices=["index", "direct"],
                   help="direct = multi-host per-process data sharding "
                   "(docs/SCALING.md); index = single-controller default")
    p.add_argument("--checkpoint_every", type=int, default=0)
    p.add_argument("--resume", default=None)
    p.add_argument("--profile_dir", default=None)
    p.add_argument("--eval_every", type=int, default=d.eval_every,
                   help="evaluate valid/test every N epochs (always on "
                   "the final epoch); reference behavior is 1")
    p.add_argument("--eval_artifacts", default=d.eval_artifacts,
                   choices=["full", "none"],
                   help="'none' skips the per-epoch dumps/CSVs/"
                   "per-label reports (metrics and best.json are "
                   "unchanged) — for seed sweeps")
    p.add_argument("--save_best", default=d.save_best,
                   choices=["ckpt", "none"],
                   help="'none' tracks/logs the best epoch without "
                   "writing the Orbax checkpoint (--testing needs "
                   "'ckpt')")

    args = p.parse_args(argv)
    opt = RunOptions(**vars(args))
    return opt.resolve()
