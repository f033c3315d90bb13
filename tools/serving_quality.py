"""Serving-numerics quality gate (VERDICT r3 next #3).

``Predictor(quantize="int8")`` and the serving-default
``use_fused_attn_eval`` both change numerics; rounds 1-3 shipped them with
latency + kernel-value oracles only.  This tool measures what they cost in
ACCURACY: from one trained checkpoint it evaluates the valid and test
shards through

  (a) bf16 XLA eval        (the quality contract: the numerics behind the
                            QUALITY.md protocols — ref eval semantics
                            `n_best_asr_bert.py:297-388`),
  (b) fused-attn-eval      (the serving default on TPU),
  (c) int8 megakernels     (quantize="int8"),

and reports F1 / Acc / prediction-agreement-rate-vs-(a) per arm.  Output:
a markdown table (paste into docs/PERFORMANCE.md) + JSON.

Run (TPU):
  python tools/serving_quality.py --out /tmp/servq          # trains first
  python tools/serving_quality.py --out /tmp/servq --reuse  # reuse ckpt
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_RAW = "/root/reference/dstc2_data/processed_data/raw"


def tuple_f1_acc(preds, golds):
    """String-exact tuple micro-F1 + utterance exact accuracy
    (`utils/fscore.py:2-21` semantics)."""
    tp = fp = fn = correct = 0
    for p, g in zip(preds, golds):
        ps, gs = set(p), set(g)
        tp += len(ps & gs)
        fp += len(ps - gs)
        fn += len(gs - ps)
        correct += ps == gs
    prec = 100.0 * tp / max(tp + fp, 1)
    rec = 100.0 * tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    return f1, 100.0 * correct / max(len(preds), 1)


def agreement(preds_a, preds_b) -> float:
    same = sum(set(a) == set(b) for a, b in zip(preds_a, preds_b))
    return 100.0 * same / max(len(preds_a), 1)


def build_arms(on_tpu: bool):
    """Arm name -> Predictor kwargs.  The Pallas serving kernels are
    TPU-only; on CPU the int8 arm still runs through the XLA dense_int8
    path (same quantized math, different fusion)."""
    # quantize='none' pins the bf16 arms: Predictor's serving default
    # is now AUTO-int8 on TPU (serve.py), and this gate is exactly the
    # bf16-reference measurement that justified the flip
    arms = {"bf16_xla": dict(quantize="none", fused_attn_eval=False),
            "int8": dict(quantize="int8",
                         fused_attn_eval=bool(on_tpu))}
    if on_tpu:
        arms["fused_attn_eval"] = dict(quantize="none",
                                       fused_attn_eval=True)
    return arms


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/serving_quality")
    ap.add_argument("--reuse", action="store_true",
                    help="reuse <out>/exp/model.ckpt instead of training")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--seed", type=int, default=999)
    ap.add_argument("--extra", default="",
                    help="extra CLI args for the training run (e.g. "
                    "'--tod_pre_trained_model <dir> --require_pretrained')")
    ap.add_argument("--batch_size", type=int, default=64)
    args = ap.parse_args()

    import jax

    on_tpu = jax.default_backend() == "tpu"

    valid_path = os.path.join(REF_RAW, "valid")
    if not os.path.exists(valid_path):
        print("reference valid shard unavailable", file=sys.stderr)
        return 2

    os.makedirs(args.out, exist_ok=True)
    dataroot = os.path.join(args.out, "dataroot")
    os.makedirs(dataroot, exist_ok=True)
    with open(valid_path) as fp:
        lines = fp.readlines()
    n = len(lines)
    cut1, cut2 = int(n * 0.8), int(n * 0.9)
    for name, chunk in (("train", lines[:cut1]),
                        ("valid", lines[cut1:cut2]),
                        ("test", lines[cut2:])):
        with open(os.path.join(dataroot, name), "w") as fp:
            fp.writelines(chunk)

    from nbest_asr_tpu.data.vocab import Memory

    mem_path = os.path.join(dataroot, "memory.json")
    Memory.from_torch_pt(os.path.join(REF_RAW, "memory.pt")).save(mem_path)
    memory = Memory.load(mem_path)

    # the CLI derives a nested exp name under --experiment
    # (utils/exp_dir.py) — discover the trained dir by its model.ckpt
    exp_root = os.path.join(args.out, "exp")

    def find_exp_dir():
        hits = sorted(glob.glob(os.path.join(exp_root, "**", "model.ckpt"),
                                recursive=True))
        return os.path.dirname(hits[-1]) if hits else None

    exp_dir = find_exp_dir()
    if not (args.reuse and exp_dir):
        from nbest_asr_tpu.cli import main as cli_main

        rc = cli_main([
            "--dataset", "dstc2_servq", "--dataroot", dataroot,
            "--n_layers", "4", "--n_head", "8",
            "--optim_choice", "bertadam",
            "--lr", "2e-4", "--bert_lr", "2e-4",
            "--warmup_proportion", "0.1",
            "--dropout", "0.1", "--bert_dropout", "0.1",
            "--batchSize", "32", "--max_epoch", str(args.epochs),
            "--random_seed", str(args.seed),
            "--compute_dtype", "bfloat16",
            "--length_buckets", "96,160,256",
            "--token_budget", "8192",
            "--add_segment_ids", "--eval_artifacts", "none",
            "--experiment", exp_root,
        ] + (args.extra.split() if args.extra else []))
        if rc != 0:
            return rc
        exp_dir = find_exp_dir()
        if exp_dir is None:
            print(f"no model.ckpt produced under {exp_root}",
                  file=sys.stderr)
            return 1

    # rebuild the model config exactly like the CLI run did
    from nbest_asr_tpu.config import parse_arguments
    from nbest_asr_tpu.data.dataset import read_sep_data
    from nbest_asr_tpu.data.tokenizer import load_tokenizer
    from nbest_asr_tpu.serve import Predictor, load_predictor
    from nbest_asr_tpu.train.loop import build_model

    with open(os.path.join(exp_dir, "config.json")) as fp:
        snap = json.load(fp)
    argv = ["--dataset", snap["dataset"], "--dataroot", dataroot,
            "--n_layers", str(snap["n_layers"]),
            "--n_head", str(snap["n_head"]),
            "--compute_dtype", snap["compute_dtype"],
            "--experiment", exp_dir]
    if snap.get("tod_pre_trained_model"):
        argv += ["--tod_pre_trained_model", snap["tod_pre_trained_model"]]
    if snap.get("pre_trained_model"):
        argv += ["--pre_trained_model", snap["pre_trained_model"]]
    opt = parse_arguments(argv)
    tokenizer = load_tokenizer(opt.pre_trained_model,
                               opt.tod_pre_trained_model, memory)
    cfg, _ = build_model(opt, memory, tokenizer)

    results = {}
    per_arm_preds = {}
    for split in ("valid", "test"):
        raw = read_sep_data(os.path.join(dataroot, split))
        utts = [" ".join(s) for s in raw.asr_seqs]
        golds = raw.labels
        for arm, kw in build_arms(on_tpu).items():
            pred = load_predictor(
                exp_dir, memory, cfg, tokenizer,
                use_segments=bool(snap.get("add_segment_ids")),
                batch_size=args.batch_size, **kw)
            t0 = time.time()
            preds = pred.predict(utts)
            wall = time.time() - t0
            f1, acc = tuple_f1_acc(preds, golds)
            per_arm_preds[(split, arm)] = preds
            results[f"{split}/{arm}"] = {
                "f1": round(f1, 2), "acc": round(acc, 2),
                "wall_s": round(wall, 2)}
            del pred
        base = per_arm_preds[(split, "bf16_xla")]
        for arm in build_arms(on_tpu):
            results[f"{split}/{arm}"]["agree_vs_bf16"] = round(
                agreement(base, per_arm_preds[(split, arm)]), 2)

    md = ["| split | arm | F1 | Acc | agreement vs bf16 |",
          "|---|---|---|---|---|"]
    for key, r in results.items():
        split, arm = key.split("/")
        md.append(f"| {split} | {arm} | {r['f1']:.2f} | {r['acc']:.2f} "
                  f"| {r['agree_vs_bf16']:.2f}% |")
    table = "\n".join(md)
    print(table)
    with open(os.path.join(args.out, "serving_quality.json"), "w") as fp:
        json.dump({"results": results, "on_tpu": on_tpu,
                   "epochs": args.epochs, "seed": args.seed,
                   "extra": args.extra}, fp, indent=1)
    with open(os.path.join(args.out, "serving_quality.md"), "w") as fp:
        fp.write(table + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
