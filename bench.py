"""Benchmark: DSTC2 fine-tune throughput (utterances/sec/chip).

Measures the full jitted training step on the flagship configuration —
BERT-base-sized encoder (12L/768H/12 heads), hierarchical head over the
real DSTC2 hierarchy (30 top / 161 bottom labels), BertAdam update,
on-device decode+metrics — at the reference's canonical effective batch 16
(`run/train_eval_N_Best_ASR_Transformer_STC.sh:33`) scaled to the
TPU-friendly batch below, seq 256 (covers DSTC2's p95 ≈ 200 subwords,
SURVEY.md §2.2), bf16 compute.

Baseline: the reference publishes no throughput numbers (SURVEY.md §6).
BASELINE.md's target is >=10x the reference single-GPU fine-tune rate.
We use an estimated 40 utt/s for the reference run (BERT-base fwd+bwd,
batch 16, seq ~200, dual encoder pass + per-step CPU tokenization +
per-term .item() syncs on a V100-class GPU) and report
``vs_baseline = measured / 40``.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_UTT_PER_SEC = 40.0
BATCH = 32
SEQ = 256
STEPS = 30
WARMUP = 5


def main() -> None:
    import jax

    # rbg PRNG makes attention-prob dropout ~free on TPU (threefry costs
    # ~20% of the step); same default the CLI trainer uses
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from nbest_asr_tpu.data.vocab import Memory
    from nbest_asr_tpu.models.encoder import EncoderConfig
    from nbest_asr_tpu.models.heads import hierarchy_device_arrays
    from nbest_asr_tpu.models.model import ModelConfig, init_model_params
    from nbest_asr_tpu.parallel.mesh import make_mesh
    from nbest_asr_tpu.parallel.train_step import (TrainState,
                                                   make_train_step)
    from nbest_asr_tpu.train.losses import LossConfig
    from nbest_asr_tpu.train.optimizer import (OptimizerConfig,
                                               make_optimizer)

    # real DSTC2 hierarchy when the reference bundle is present
    import os
    ref_mem = "/root/reference/dstc2_data/processed_data/raw/memory.pt"
    if os.path.exists(ref_mem):
        memory = Memory.from_torch_pt(ref_mem)
    else:
        from nbest_asr_tpu.data.etl import build_memory

        memory = build_memory(["x"], ["inform-food-chinese", "thankyou",
                                      "request-phone"], [])
    hier = hierarchy_device_arrays(memory.arrays())

    enc = EncoderConfig.bert_base(vocab_size=30522,
                                  compute_dtype="bfloat16",
                                  hidden_dropout=0.1, attn_dropout=0.1)
    cfg = ModelConfig(encoder=enc, n_top=memory.n_top,
                      n_bottom=memory.n_bottom)
    params = init_model_params(jax.random.PRNGKey(0), cfg)

    n_train = 10000
    opt_cfg = OptimizerConfig(optim_choice="bertadam", lr=3e-5,
                              bert_lr=3e-5, warmup_proportion=0.1,
                              t_total=(n_train // BATCH + 1) * 50)
    optimizer = make_optimizer(opt_cfg, params)

    mesh = make_mesh()  # all local devices (1 real chip under the driver)
    n_chips = int(np.prod(mesh.devices.shape))

    rng = np.random.RandomState(0)
    n_rows = 4096
    data = {
        "input_ids": jnp.asarray(rng.randint(1, 30522, (n_rows, SEQ)),
                                 jnp.int32),
        "attn_mask": jnp.asarray(
            (np.arange(SEQ)[None, :]
             < rng.randint(64, SEQ, (n_rows, 1))).astype(np.float32)),
        "segment_ids": jnp.zeros((n_rows, SEQ), jnp.int32),
        "trans_input_ids": jnp.asarray(
            rng.randint(1, 30522, (n_rows, SEQ)), jnp.int32),
        "trans_attn_mask": jnp.ones((n_rows, SEQ), jnp.float32),
        "trans_segment_ids": jnp.zeros((n_rows, SEQ), jnp.int32),
        "labels": jnp.asarray(
            (rng.rand(n_rows, memory.n_bottom) < 0.01).astype(np.float32)),
    }

    train_step = make_train_step(
        cfg, LossConfig(add_l2_loss=False), optimizer, hier,
        n_accum=1, mesh=mesh, dual_stream=True, donate=True)

    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.zeros([], jnp.int32))

    def step_indices(s):
        start = (s * BATCH) % (n_rows - BATCH)
        return jnp.asarray(
            np.arange(start, start + BATCH, dtype=np.int32)
            .reshape(1, BATCH))

    key = jax.random.PRNGKey(0)
    for s in range(WARMUP):
        key, k = jax.random.split(key)
        state, stats = train_step(state, data, step_indices(s), k)
    jax.block_until_ready(stats)

    t0 = time.perf_counter()
    for s in range(STEPS):
        key, k = jax.random.split(key)
        state, stats = train_step(state, data, step_indices(s), k)
    jax.block_until_ready(stats)
    dt = time.perf_counter() - t0

    utt_per_sec = BATCH * STEPS / dt / n_chips
    print(json.dumps({
        "metric": "dstc2_finetune_throughput",
        "value": round(utt_per_sec, 2),
        "unit": "utterances/sec/chip",
        "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
