"""Subprocess worker for the cross-process TENSOR-PARALLEL test — NOT a
test module (VERDICT r4 #7: the model axis had only ever been driven
single-process).

Geometry: ``nproc`` processes x 1 virtual CPU device each, mesh
(data=1, model=nproc) — the model axis IS the process boundary, so the
two per-layer all-reduces XLA inserts (after the attention out-proj and
the FFN out-proj, `parallel/mesh.py` TP specs) ride the gloo
cross-process collectives.  With nproc=1 the same workload runs on
``n_model`` local virtual devices (the in-process TP arm the dp4xtp2
invariance test already covers) so the two arms must agree to reduction
noise; metrics-bearing forward scalars agree exactly.

argv: <proc_id> <nproc> <n_model> <coordinator_port> <result_dir>
"""

import json
import os
import sys


def main() -> int:
    proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
    n_model, port, result_dir = int(sys.argv[3]), sys.argv[4], sys.argv[5]

    n_local = n_model // nproc
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc, process_id=proc_id)
    assert jax.device_count() == n_model

    import jax.numpy as jnp
    import numpy as np

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))

    from nbest_asr_tpu.data.etl import build_memory
    from nbest_asr_tpu.models.encoder import EncoderConfig
    from nbest_asr_tpu.models.heads import hierarchy_device_arrays
    from nbest_asr_tpu.models.model import ModelConfig, init_model_params
    from nbest_asr_tpu.parallel.data_sharding import process_sharded_batch
    from nbest_asr_tpu.parallel.mesh import make_mesh, param_shardings, \
        replicated
    from nbest_asr_tpu.parallel.train_step import TrainState, \
        make_train_step
    from nbest_asr_tpu.train.losses import LossConfig
    from nbest_asr_tpu.train.optimizer import OptimizerConfig, \
        make_optimizer

    labels = ["inform-food-chinese", "inform-food-indian",
              "request-phone", "thankyou", "negate"]
    memory = build_memory("a b c d".split(), labels, ["inform"])
    # TP-shardable tiny config: hidden/heads/intermediate divisible by
    # the model axis
    enc = EncoderConfig.tiny(vocab_size=64, num_heads=4,
                             intermediate_size=128)
    cfg = ModelConfig(encoder=enc, n_top=memory.n_top,
                      n_bottom=memory.n_bottom)

    # mesh (data=1, model=n_model): with one device per process the
    # model pairs span processes
    mesh = make_mesh(n_data=1, n_model=n_model)

    rng = np.random.RandomState(5)
    B, L = 8, 24
    ids = rng.randint(2, 64, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.float32)
    for i in range(B):
        mask[i, rng.randint(6, L):] = 0.0
    lab = (rng.rand(B, memory.n_bottom) < 0.25).astype(np.float32)
    local = {
        "input_ids": ids[None], "attn_mask": mask[None],
        "segment_ids": np.zeros((1, B, L), np.int32),
        "trans_input_ids": ids[None], "trans_attn_mask": mask[None],
        "trans_segment_ids": np.zeros((1, B, L), np.int32),
        "labels": lab[None],
        "example_mask": np.ones((1, B), np.float32),
    }
    # data axis is size 1 -> every process's addressable batch shard is
    # the FULL batch; all processes pass identical host copies
    micros = process_sharded_batch(mesh, local, lead=1)

    params = init_model_params(jax.random.PRNGKey(0), cfg)
    shardings = param_shardings(params, mesh, tensor_parallel=True)
    params = jax.device_put(params, shardings)
    hier = jax.device_put(hierarchy_device_arrays(memory.arrays()),
                          replicated(mesh))

    opt_cfg = OptimizerConfig(optim_choice="bertadam", lr=1e-3,
                              bert_lr=1e-3, t_total=10,
                              warmup_proportion=0.1)
    tx = make_optimizer(opt_cfg, params)
    state = TrainState(params=params,
                       opt_state=jax.jit(tx.init)(params),
                       step=jax.device_put(jnp.zeros([], jnp.int32),
                                           replicated(mesh)))
    step = make_train_step(cfg, LossConfig(), tx, hier, n_accum=1,
                           mesh=mesh, dual_stream=False,
                           data_mode="direct", donate=False)

    dummy_idx = jax.device_put(jnp.zeros((0,), jnp.int32),
                               replicated(mesh))
    stats_first = None
    for it in range(3):
        key = jax.device_put(jax.random.PRNGKey(100 + it),
                             replicated(mesh))
        state, stats = step(state, micros, dummy_idx, key)
        if stats_first is None:
            stats_first = jax.device_get(
                {"loss": stats["loss"]["total"],
                 "counts": stats["counts"]})

    # params are model-sharded ACROSS processes -> fingerprint with
    # replicated on-device reductions instead of device_get
    @jax.jit
    def fingerprints(p):
        return {"/".join(str(getattr(q, "key", q)) for q in path):
                jax.lax.with_sharding_constraint(
                    jnp.sum(leaf.astype(jnp.float64) ** 2), replicated(mesh))
                for path, leaf in jax.tree_util.tree_flatten_with_path(
                    p)[0]}

    sq = {k: float(v) for k, v in
          jax.device_get(fingerprints(state.params)).items()}

    os.makedirs(result_dir, exist_ok=True)
    with open(os.path.join(result_dir,
                           f"tp_result_p{proc_id}.json"), "w") as fp:
        json.dump({"proc": proc_id, "nproc": nproc,
                   "first_loss": float(stats_first["loss"]),
                   "first_counts": {k: float(v) for k, v in
                                    stats_first["counts"].items()},
                   "param_sq": sq}, fp)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
