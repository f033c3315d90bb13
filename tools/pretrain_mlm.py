"""In-repo MLM pretraining: produce a LOCAL pretrained checkpoint for the
existing ``--tod_pre_trained_model`` init path.

The reference's published protocol fine-tunes a pretrained encoder
(`n_best_asr_bert.py:480-487`; numbers `README.md:74-77`), but no
checkpoints ship with this offline mirror.  This tool closes that gap
end-to-end, offline:

1. trains a REAL WordPiece vocab (HF ``tokenizers`` trainer) on the DSTC2
   corpus text and writes ``vocab.txt`` + BertTokenizer config files,
2. packs the corpus through the repo's own input-builder layouts with the
   new tokenizer (so pretraining sees exactly the fine-tune input
   distribution, both ASR n-best and transcript sides),
3. pretrains the in-repo encoder with the standard BERT MLM objective
   (`nbest_asr_tpu/train/mlm.py`) under BertAdam,
4. exports a HuggingFace-format checkpoint dir
   (`models/hf_convert.py:export_hf_checkpoint`) that the UNMODIFIED
   fine-tune CLI consumes via
   ``--tod_pre_trained_model <dir> --require_pretrained``.

Default corpus: the train portion (first 80%) of the shipped reference
valid shard — the same split `tools/quality_smoke.py` fine-tunes on, so
pretraining never sees the smoke valid/test text.

Run (TPU, ~10 min):  python tools/pretrain_mlm.py --out /tmp/mlm_ckpt
Smoke (CPU, tests):  python tools/pretrain_mlm.py --platform cpu \
    --steps 20 --hidden 64 --n_layers 2 --vocab_size 512 --out /tmp/x
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_RAW = "/root/reference/dstc2_data/processed_data/raw"

SPECIAL_TOKENS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                  "[SYS]", "[USR]"]


def corpus_lines(raw_split) -> list:
    """Plain text lines for vocab training: every utterance contributes its
    ASR n-best side and its transcript side, framing markers stripped (the
    markers are registered as special tokens, never WordPiece-split)."""
    drop = {"[CLS]", "[SYS]", "[USR]", "[SEP]"}
    lines = []
    for seqs in (raw_split.asr_seqs, raw_split.trans_seqs):
        for seq in seqs:
            words = [w for w in seq if w and w not in drop]
            if words:
                lines.append(" ".join(words))
    return lines


def train_wordpiece_vocab(lines, out_dir: str, vocab_size: int,
                          pad_multiple: int = 128) -> str:
    """Train a WordPiece vocab on the corpus and write the three files a
    ``BertTokenizer`` needs.  The vocab is padded with ``[unusedN]`` rows to
    a multiple of ``pad_multiple`` so the tied MLM decoder GEMM and the
    embedding table stay MXU-lane-aligned."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers
    from tokenizers import trainers

    tok = Tokenizer(models.WordPiece(unk_token="[UNK]"))
    tok.normalizer = normalizers.BertNormalizer(lowercase=True)
    tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
    trainer = trainers.WordPieceTrainer(
        vocab_size=vocab_size, special_tokens=SPECIAL_TOKENS,
        continuing_subword_prefix="##")
    tok.train_from_iterator(lines, trainer)

    vocab = tok.get_vocab()  # token -> id
    inv = [None] * len(vocab)
    for t, i in vocab.items():
        inv[i] = t
    n = len(inv)
    target = ((n + pad_multiple - 1) // pad_multiple) * pad_multiple
    inv += [f"[unused{i}]" for i in range(target - n)]

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "vocab.txt"), "w") as fp:
        fp.write("\n".join(inv) + "\n")
    with open(os.path.join(out_dir, "tokenizer_config.json"), "w") as fp:
        json.dump({"tokenizer_class": "BertTokenizer",
                   "do_lower_case": True,
                   "model_max_length": 512}, fp, indent=1)
    with open(os.path.join(out_dir, "special_tokens_map.json"), "w") as fp:
        json.dump({"pad_token": "[PAD]", "unk_token": "[UNK]",
                   "cls_token": "[CLS]", "sep_token": "[SEP]",
                   "mask_token": "[MASK]",
                   "additional_special_tokens": ["[SYS]", "[USR]"]},
                  fp, indent=1)
    return os.path.join(out_dir, "vocab.txt")


def pack_mlm_pool(raw_split, tokenizer, buckets, special_ids):
    """Both text sides -> per-bucket fixed-shape arrays + maskable masks."""
    import numpy as np

    from nbest_asr_tpu.data.input_builder import build_inputs

    seq_pool = []  # (ids, segs)
    for seqs in (raw_split.asr_seqs, raw_split.trans_seqs):
        built = build_inputs(seqs, tokenizer, "default")
        for i, toks in enumerate(built.tokens):
            ids = tokenizer.convert_tokens_to_ids(toks)
            seq_pool.append((ids, built.segment_ids[i]))

    pad_id = tokenizer.pad_token_id
    by_bucket = {b: [] for b in buckets}
    n_dropped = 0
    for ids, segs in seq_pool:
        for b in buckets:
            if len(ids) <= b:
                by_bucket[b].append((ids, segs))
                break
        else:
            n_dropped += 1
    out = {}
    for b, rows in by_bucket.items():
        if not rows:
            continue
        n = len(rows)
        arr_ids = np.full((n, b), pad_id, np.int32)
        arr_seg = np.zeros((n, b), np.int32)
        arr_msk = np.zeros((n, b), np.float32)
        for i, (ids, segs) in enumerate(rows):
            L = len(ids)
            arr_ids[i, :L] = ids
            arr_seg[i, :L] = segs[:L]
            arr_msk[i, :L] = 1.0
        maskable = arr_msk > 0
        for sid in special_ids:
            maskable &= arr_ids != sid
        out[b] = {"input_ids": arr_ids, "segment_ids": arr_seg,
                  "attn_mask": arr_msk, "maskable": maskable}
    return out, n_dropped


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True,
                    help="output checkpoint dir (HF format)")
    ap.add_argument("--dataroot", default=None,
                    help="dataroot with a `train` shard (default: first "
                    "80%% of the shipped reference valid shard — the "
                    "quality_smoke train split)")
    ap.add_argument("--vocab_size", type=int, default=3000)
    ap.add_argument("--hidden", type=int, default=768)
    ap.add_argument("--n_layers", type=int, default=4)
    ap.add_argument("--n_heads", type=int, default=12)
    ap.add_argument("--intermediate", type=int, default=3072)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--warmup", type=float, default=0.1)
    ap.add_argument("--mask_rate", type=float, default=0.15)
    ap.add_argument("--token_budget", type=int, default=8192)
    ap.add_argument("--buckets", default="96,288")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (tests pass 'cpu')")
    ap.add_argument("--log_every", type=int, default=100)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                              os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])

    import numpy as np

    from nbest_asr_tpu.data.dataset import read_sep_data

    # ---- corpus -------------------------------------------------------
    if args.dataroot:
        train_path = os.path.join(args.dataroot, "train")
    else:
        valid_path = os.path.join(REF_RAW, "valid")
        if not os.path.exists(valid_path):
            print("reference valid shard unavailable", file=sys.stderr)
            return 2
        with open(valid_path) as fp:
            lines = fp.readlines()
        os.makedirs(args.out, exist_ok=True)
        train_path = os.path.join(args.out, "pretrain_corpus.txt")
        with open(train_path, "w") as fp:
            fp.writelines(lines[:int(len(lines) * 0.8)])
    raw = read_sep_data(train_path)
    text = corpus_lines(raw)
    print(f"corpus: {len(raw)} utterances, {len(text)} text lines",
          flush=True)

    # ---- vocab + tokenizer -------------------------------------------
    train_wordpiece_vocab(text, args.out, args.vocab_size)
    from nbest_asr_tpu.data.tokenizer import HFTokenizerAdapter

    tokenizer = HFTokenizerAdapter(args.out)
    # vocab.txt was lane-padded; vocab_size must count the padded rows so
    # the embedding table matches the file
    with open(os.path.join(args.out, "vocab.txt")) as fp:
        vocab_size = sum(1 for _ in fp)
    print(f"wordpiece vocab: {vocab_size} (requested {args.vocab_size})",
          flush=True)

    special_ids = tokenizer.convert_tokens_to_ids(SPECIAL_TOKENS)
    mask_id = tokenizer.convert_tokens_to_ids(["[MASK]"])[0]
    buckets = [int(b) for b in args.buckets.split(",")]
    pool, n_dropped = pack_mlm_pool(raw, tokenizer, buckets, special_ids)
    if n_dropped:
        print(f"WARNING: {n_dropped} sequences longer than max bucket "
              f"{max(buckets)} dropped from pretraining", flush=True)
    for b, arrs in pool.items():
        print(f"bucket {b}: {arrs['input_ids'].shape[0]} sequences",
              flush=True)

    # ---- model + optimizer -------------------------------------------
    from nbest_asr_tpu.models.encoder import (EncoderConfig,
                                              init_encoder_params)
    from nbest_asr_tpu.ops.attention import resolve_flash
    from nbest_asr_tpu.train.mlm import (init_mlm_head_params,
                                         make_mlm_train_step)
    from nbest_asr_tpu.train.optimizer import (OptimizerConfig,
                                               make_optimizer)

    cfg = EncoderConfig(
        vocab_size=vocab_size, hidden_size=args.hidden,
        num_layers=args.n_layers, num_heads=args.n_heads,
        intermediate_size=args.intermediate, max_position=512,
        hidden_dropout=0.1, attn_dropout=0.1,
        compute_dtype="bfloat16" if on_tpu else "float32",
        use_flash_attention=resolve_flash(None),
        use_fused_ffn=resolve_flash(None),
        use_fused_attn=resolve_flash(None))

    rng = jax.random.PRNGKey(args.seed)
    r_enc, r_head, r_loop = jax.random.split(rng, 3)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    import contextlib

    with jax.default_device(cpu) if cpu is not None else \
            contextlib.nullcontext():
        params = {"encoder": init_encoder_params(r_enc, cfg),
                  "mlm_head": init_mlm_head_params(r_head, cfg)}
    params = jax.device_put(params)

    opt_cfg = OptimizerConfig(optim_choice="bertadam", lr=args.lr,
                              bert_lr=args.lr, t_total=args.steps,
                              warmup_proportion=args.warmup)
    tx = make_optimizer(opt_cfg, params)
    opt_state = tx.init(params)
    step_fn = make_mlm_train_step(cfg, tx, mask_id, args.mask_rate)

    # ---- loop ---------------------------------------------------------
    # per-bucket batch sizes from the token budget; step schedule visits
    # buckets proportionally to their total token count
    host_rng = np.random.default_rng(args.seed)
    batch_of = {}
    for b, arrs in pool.items():
        n = arrs["input_ids"].shape[0]
        batch_of[b] = min(max(args.token_budget // b, 8), n)
    bucket_ids = sorted(pool)
    bucket_p = np.array([pool[b]["input_ids"].shape[0] * b
                         for b in bucket_ids], dtype=np.float64)
    bucket_p /= bucket_p.sum()

    cursors = {b: None for b in pool}

    def next_batch(b):
        arrs = pool[b]
        n = arrs["input_ids"].shape[0]
        bs = batch_of[b]
        if cursors[b] is None or cursors[b][1] + bs > n:
            cursors[b] = (host_rng.permutation(n), 0)
        perm, pos = cursors[b]
        idx = perm[pos:pos + bs]
        cursors[b] = (perm, pos + bs)
        return {k: v[idx] for k, v in arrs.items()}

    print(f"pretraining: {args.steps} steps, lr {args.lr}, "
          f"batch sizes {batch_of}", flush=True)
    t0 = time.time()
    losses = []
    window = []
    for step in range(args.steps):
        b = bucket_ids[host_rng.choice(len(bucket_ids), p=bucket_p)]
        batch = jax.device_put(next_batch(b))
        params, opt_state, loss = step_fn(
            params, opt_state, batch, jax.random.fold_in(r_loop, step))
        window.append(loss)
        if (step + 1) % args.log_every == 0 or step == args.steps - 1:
            w = [float(x) for x in window]
            losses.append({"step": step + 1,
                           "loss": sum(w) / len(w)})
            print(f"step {step + 1}/{args.steps}  "
                  f"mlm_loss {losses[-1]['loss']:.4f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
            window = []
    wall = time.time() - t0

    # ---- export -------------------------------------------------------
    from nbest_asr_tpu.models.hf_convert import export_hf_checkpoint
    from nbest_asr_tpu.train.mlm import mlm_head_export_state

    params = jax.device_get(params)
    export_hf_checkpoint(
        cfg, params["encoder"], args.out,
        extra_state=mlm_head_export_state(
            params["mlm_head"], params["encoder"]["embeddings"]["word"]))
    with open(os.path.join(args.out, "pretrain_meta.json"), "w") as fp:
        json.dump({"steps": args.steps, "lr": args.lr,
                   "vocab_size": vocab_size, "buckets": buckets,
                   "batch_sizes": batch_of, "seed": args.seed,
                   "mask_rate": args.mask_rate, "wall_s": round(wall, 1),
                   "corpus_utterances": len(raw),
                   "final_loss": losses[-1]["loss"] if losses else None,
                   "loss_curve": losses}, fp, indent=1)
    print(f"exported HF checkpoint to {args.out}  "
          f"(final mlm_loss {losses[-1]['loss']:.4f}, wall {wall:.0f}s)",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
