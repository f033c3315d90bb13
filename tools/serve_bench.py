"""Serving benchmark: batch-inference latency/throughput of the
Predictor on real DSTC2 utterances (one TPU chip).

The reference has no serving path at all (its only inference is the
`--testing` file re-evaluation).  This measures the production surface:
jitted single-stream forward + on-device decode, host string mapping.

Run: python tools/serve_bench.py [--batch 64] [--max_len 256]
Prints one JSON line with latency p50/p95 (ms/batch) and utterances/sec.

Measured decomposition on this environment (batch 64, seq 256, bf16,
BERT-base): ~3 ms host pack (native C++ packer), ~36 ms device compute
when pipelined, ~28 ms synchronous-call round-trip through the axon
tunnel — the tunnel RTT is an artifact of this setup, not of the
framework; direct-attached serving sees the pipelined number.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--max_len", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--quantize", choices=["int8", "none"],
                    default=None,
                    help="weight-only int8 encoder (ops/quant.py; with "
                    "fused kernels on, routes the int8 serving "
                    "megakernels of ops/int8_serving.py).  Default: the "
                    "Predictor's auto rule (int8 on TPU when the "
                    "megakernels route); 'none' forces bf16")
    ap.add_argument("--no_fused", action="store_true",
                    help="force the XLA serving path (for int8: the "
                    "round-2 dense_int8 path with unfused quant)")
    ap.add_argument("--depth", type=int, default=2,
                    help="async pipeline depth (in-flight predict_async "
                    "handles)")
    ap.add_argument("--fused_attn_eval", action="store_true",
                    default=None,
                    help="force the attention megakernel on the bf16 "
                    "deterministic forward (the Predictor already "
                    "auto-enables it on TPU — measured +33%% pipelined "
                    "throughput)")
    ap.add_argument("--no_fused_attn_eval", dest="fused_attn_eval",
                    action="store_false",
                    help="force XLA eval attention (the round-3 "
                    "pre-flip baseline)")
    ap.add_argument("--tokenizer", choices=["word", "wordpiece"],
                    default="word",
                    help="'wordpiece' serves through a BERT WordPiece "
                    "tokenizer (trained offline on the shard text) — "
                    "the pretrained-family packing path, native in C++ "
                    "since round 4")
    ap.add_argument("--no_native_pack", action="store_true",
                    help="disable the C++ packer (measures the Python "
                    "host-packing fallback)")
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nbest_asr_tpu.data.dataset import read_sep_data
    from nbest_asr_tpu.data.tokenizer import WordVocabTokenizer
    from nbest_asr_tpu.data.vocab import Memory
    from nbest_asr_tpu.models.encoder import EncoderConfig
    from nbest_asr_tpu.models.model import ModelConfig, init_model_params
    from nbest_asr_tpu.serve import Predictor

    memory = Memory.from_torch_pt(os.path.join(REF_RAW, "memory.pt"))
    split = read_sep_data(os.path.join(REF_RAW, "valid"))
    vocab_size = 30522
    if args.tokenizer == "wordpiece":
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from pretrain_mlm import corpus_lines, train_wordpiece_vocab

        from nbest_asr_tpu.data.tokenizer import HFTokenizerAdapter

        tok_dir = "/tmp/serve_bench_wp"
        if not os.path.exists(os.path.join(tok_dir, "vocab.txt")):
            train_wordpiece_vocab(corpus_lines(split), tok_dir, 3000)
        tok = HFTokenizerAdapter(tok_dir)
        with open(os.path.join(tok_dir, "vocab.txt")) as fp:
            vocab_size = sum(1 for _ in fp)
    else:
        tok = WordVocabTokenizer(memory)

    from nbest_asr_tpu.ops.attention import resolve_flash

    fused = False if args.no_fused else resolve_flash(None)
    enc = EncoderConfig.bert_base(vocab_size=vocab_size,
                                  compute_dtype="bfloat16",
                                  use_fused_attn=fused,
                                  use_fused_ffn=fused)
    cfg = ModelConfig(encoder=enc, n_top=memory.n_top,
                      n_bottom=memory.n_bottom)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_model_params(jax.random.PRNGKey(0), cfg)
    # commit explicitly to the accelerator: CPU-initialized params stay
    # CPU-committed otherwise, and jit would follow them onto the host
    params = jax.device_put(params, jax.devices()[0])

    pred = Predictor(params, cfg, memory, tok, batch_size=args.batch,
                     max_len=args.max_len, quantize=args.quantize,
                     fused_attn_eval=args.fused_attn_eval)
    if args.no_native_pack:
        pred._native = None
    native_pack = pred._native is not None

    utts = [" ".join(s) for s in split.asr_seqs[: args.batch]]
    pred.predict(utts)  # compile + warmup

    # host packing cost in isolation (tokenize + layout + pad)
    seqs = [u.split() for u in utts]
    pack_ms = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        pred._pack(seqs)
        pack_ms.append((time.perf_counter() - t0) * 1000)

    lat = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = pred.predict(utts)
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1000

    # pipelined mode: keep `depth` calls in flight with predict_async —
    # the per-call tunnel RTT overlaps device compute, so aggregate
    # throughput approaches the pure-compute rate
    depth = args.depth
    handles = []
    t0 = time.perf_counter()
    for _ in range(args.iters):
        handles.append(pred.predict_async(utts))
        if len(handles) > depth:
            handles.pop(0).result()
    for h in handles:
        h.result()
    async_dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "dstc2_serving",
        "quantize": pred.quantize,
        "tokenizer": args.tokenizer,
        "native_pack": native_pack,
        "host_pack_p50_ms": round(float(np.percentile(pack_ms, 50)), 2),
        "batch": args.batch,
        "latency_p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "latency_p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
        "utterances_per_sec": round(
            args.batch / (lat_ms.mean() / 1000), 1),
        "async_depth2_utterances_per_sec": round(
            args.batch * args.iters / async_dt, 1),
        "async_depth2_ms_per_batch": round(
            async_dt / args.iters * 1000, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
