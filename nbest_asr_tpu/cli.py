"""CLI entry point — `python -m nbest_asr_tpu.cli <flags>`.

Drop-in surface for the reference's `python n_best_asr_bert.py <flags>`
(`n_best_asr_bert.py:476-581`): same flags, same log lines, same artifact
layout under the experiment directory.
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np

from .config import RunOptions, parse_arguments
from .data.dataset import read_sep_data
from .data.input_builder import pack_split
from .data.tokenizer import load_tokenizer
from .data.vocab import Memory


def resolve_memory(opt: RunOptions) -> Memory:
    """memory.json preferred; reference-format memory.pt accepted
    (ref loads `dataroot/memory.pt`, :489)."""
    for candidate in (opt.memory_file, "memory.json", "memory.pt"):
        path = os.path.join(opt.dataroot, candidate)
        if os.path.exists(path):
            return Memory.load(path)
    raise FileNotFoundError(
        f"no memory bundle (memory.json/memory.pt) under {opt.dataroot}")


def prepare_packed_splits(opt: RunOptions, memory: Memory, tokenizer):
    """Read + coverage-sample + tokenize + pack all splits with one shared
    static max_len.  Uses the native (C++) loader when built for the
    word-vocab tokenizer AND BERT-family WordPiece adapters
    (`native/nbest_loader.cpp`, bit-parity tested); the Python packer is
    the oracle and the fallback for BPE/SentencePiece families."""
    use_native = opt.native_loader
    if use_native:
        from .data.native_loader import native_available, native_supported

        use_native = native_supported(tokenizer) and native_available()

    splits = {}
    raw = {}
    paths = {
        "train": os.path.join(opt.dataroot, opt.train_file),
        "valid": os.path.join(opt.dataroot, opt.valid_file),
        "test": os.path.join(opt.dataroot, opt.test_file),
    }

    def pack(name, max_len):
        if use_native:
            from .data.native_loader import pack_file_native

            return pack_file_native(paths[name], memory, tokenizer,
                                    layout=opt.layout, max_len=max_len,
                                    len_multiple=opt.len_multiple)
        return pack_split(raw[name], tokenizer, memory,
                          layout=opt.layout, max_len=max_len,
                          len_multiple=opt.len_multiple)

    for name, path in list(paths.items()):
        if not os.path.exists(path):
            paths.pop(name)
            continue  # tolerate missing shards (e.g. stripped test set)
        coverage = opt.coverage if name == "train" else None  # ref :524-526
        if coverage and use_native:
            # coverage sampling stays in Python (pandas seed-42 parity);
            # write the sampled rows to a temp shard for the native packer
            import tempfile

            sampled = read_sep_data(path, coverage)
            tmp = tempfile.NamedTemporaryFile(
                "w", delete=False, suffix=".shard")
            for a, t, l in zip(sampled.asr_seqs, sampled.trans_seqs,
                               sampled.labels):
                tmp.write("%s\t<=>\t%s\t<=>\t%s\n" % (
                    " ".join(a), " ".join(t), ";".join(l)))
            tmp.close()
            paths[name] = tmp.name
        elif not use_native:
            raw[name] = read_sep_data(path, coverage)

    # one static max_len across splits so every step shares a compilation
    max_len = opt.max_seq_len
    for name in paths:
        splits[name] = pack(name, max_len)
    if max_len is None and splits:
        # unify to the largest packed length, re-pack the shorter ones
        target = max(p.max_len for p in splits.values())
        for name, packed in list(splits.items()):
            if packed.max_len != target:
                splits[name] = pack(name, target)
    return splits


def main(argv=None) -> int:
    opt = parse_arguments(argv)

    import jax

    jax.config.update("jax_default_prng_impl", opt.prng_impl)
    cache_dir = os.environ.get("NBEST_ASR_TPU_CACHE",
                               os.path.expanduser("~/.nbest_asr_tpu_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # global seeding (ref :128-133)
    random.seed(opt.random_seed)
    np.random.seed(opt.random_seed)

    try:
        memory = resolve_memory(opt)
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    try:
        tokenizer = load_tokenizer(
            opt.pre_trained_model, opt.tod_pre_trained_model, memory,
            require_pretrained=opt.require_pretrained)
    except (RuntimeError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    splits = prepare_packed_splits(opt, memory, tokenizer)
    if "valid" not in splits:
        print("missing valid shard", file=sys.stderr)
        return 2
    if "train" not in splits and not opt.testing:
        print("missing train shard (training mode)", file=sys.stderr)
        return 2

    from .train.loop import Trainer, build_model

    try:
        cfg, params = build_model(opt, memory, tokenizer)
    except RuntimeError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    os.makedirs(opt.exp_dir, exist_ok=True)
    trainer = Trainer(opt, memory, cfg, params, splits,
                      family=opt.pre_trained_model)

    if opt.testing:
        trainer.test()
    else:
        if opt.resume == "auto":
            # preemption recovery: pick up the newest checkpoint in the
            # experiment dir (SURVEY.md §5.3 — the reference has none)
            import glob

            ckpts = sorted(
                (p for p in
                 glob.glob(os.path.join(opt.exp_dir, "ckpt_epoch*"))
                 + glob.glob(os.path.join(opt.exp_dir, "model.ckpt"))
                 if not p.endswith(".meta.json")),
                key=os.path.getmtime)
            if ckpts:
                print(f"resuming from {ckpts[-1]}")
                trainer.load_checkpoint(ckpts[-1])
        elif opt.resume:
            trainer.load_checkpoint(opt.resume)
        trainer.train()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
