"""Subprocess worker for `test_multiprocess.py` — NOT a test module.

Runs the full Trainer.train() driver in a REAL ``jax.distributed``
runtime: N processes x 4 virtual CPU devices each, gloo cross-process
collectives, ``--data_mode direct`` (the only train path defined for
process_count > 1).  With nproc=1 it runs the same workload on 8 local
virtual devices, so both arms train on an identical 8-device mesh and the
results must agree BIT-exactly (same global arrays, same shard geometry,
same reduction tree).

argv: <proc_id> <nproc> <coordinator_port> <exp_dir> <result_dir>
"""

import hashlib
import json
import os
import sys


def main() -> int:
    proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, exp_dir, result_dir = sys.argv[3], sys.argv[4], sys.argv[5]

    n_local = 8 // nproc
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc, process_id=proc_id)
    assert jax.process_count() == nproc
    assert jax.device_count() == 8

    import numpy as np

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))   # repo root
    sys.path.insert(0, here)                    # tests/
    from test_direct_data import _synthetic_packed

    from nbest_asr_tpu.config import RunOptions
    from nbest_asr_tpu.data.etl import build_memory
    from nbest_asr_tpu.models.encoder import EncoderConfig
    from nbest_asr_tpu.models.model import ModelConfig, init_model_params
    from nbest_asr_tpu.train.loop import Trainer

    labels = ["inform-food-chinese", "inform-food-indian",
              "request-phone", "thankyou", "negate"]
    memory = build_memory("a b c d".split(), labels, ["inform"])
    packed = {
        "train": _synthetic_packed(60, 32, memory.n_bottom, seed=1),
        "valid": _synthetic_packed(16, 32, memory.n_bottom, seed=2),
        "test": _synthetic_packed(16, 32, memory.n_bottom, seed=3),
    }
    enc = EncoderConfig.tiny(vocab_size=64)
    cfg = ModelConfig(encoder=enc, n_top=memory.n_top,
                      n_bottom=memory.n_bottom)

    opt = RunOptions(dataset="dstc2", dataroot="unused",
                     experiment=exp_dir, batchSize=8, max_epoch=2,
                     random_seed=11, lr=1e-3, bert_lr=1e-3,
                     length_buckets="16,32", token_budget=128,
                     data_mode="direct")
    opt.exp_dir = exp_dir

    os.makedirs(result_dir, exist_ok=True)

    # ---- phase 1: ONE optimizer step from a fixed init — must match
    # across process layouts to float noise (no compounding; isolates
    # "the cross-process gradient reduction computes the same math")
    import jax.numpy as jnp

    from nbest_asr_tpu.parallel.data_sharding import process_sharded_batch

    tr1 = Trainer(opt, memory, cfg,
                  init_model_params(jax.random.PRNGKey(0), cfg), packed)
    plans = tr1._shard.epoch_plan(np.random.RandomState(123),
                                  tr1._micro_batch_for_len,
                                  opt.n_accum_steps)
    bi, _, idx = plans[0]
    local = tr1._shard.local_batch(bi, idx[0])
    micros = process_sharded_batch(tr1.mesh, local, lead=1)
    state1, _ = tr1.train_step(
        tr1.state, micros,
        tr1._put_replicated(jnp.zeros((0,), jnp.int32)),
        tr1._put_replicated(jax.random.PRNGKey(7)))
    np.savez(os.path.join(result_dir, f"step1_p{proc_id}.npz"),
             *[np.asarray(l) for l in
               jax.tree.leaves(jax.device_get(state1.params))])
    del tr1, state1

    # ---- phase 2: the full 2-epoch Trainer.train() driver
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    tr = Trainer(opt, memory, cfg, params, packed)
    best = tr.train()
    vm, _ = tr.run_eval_epoch("valid", 0)

    final = jax.device_get(tr.state.params)
    leaves = jax.tree.leaves(final)
    digest = hashlib.sha256()
    for leaf in leaves:
        digest.update(np.ascontiguousarray(leaf).tobytes())

    np.savez(os.path.join(result_dir, f"params_p{proc_id}.npz"),
             *[np.asarray(l) for l in leaves])
    with open(os.path.join(result_dir,
                           f"result_p{proc_id}.json"), "w") as fp:
        json.dump({"best": best, "params_sha": digest.hexdigest(),
                   "eval": {"loss": vm.mean_loss, "p": vm.precision,
                            "r": vm.recall, "f1": vm.f1, "acc": vm.acc},
                   "proc": proc_id, "nproc": nproc}, fp)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
