"""Data-parallel correctness: the same batch stepped on a 1-device mesh
and an 8-device data-parallel mesh must produce identical parameters
(sum-reduced losses + summed grads are device-count invariant), and tp=2
must match as well."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nbest_asr_tpu.models.encoder import EncoderConfig
from nbest_asr_tpu.models.heads import hierarchy_device_arrays
from nbest_asr_tpu.models.model import ModelConfig, init_model_params
from nbest_asr_tpu.parallel.mesh import make_mesh, param_shardings
from nbest_asr_tpu.parallel.train_step import TrainState, make_train_step
from nbest_asr_tpu.train.losses import LossConfig
from nbest_asr_tpu.train.optimizer import OptimizerConfig, make_optimizer


pytestmark = pytest.mark.slow  # CPU-training / subprocess tier


def _setup(tiny_memory):
    mem = tiny_memory
    hier = hierarchy_device_arrays(mem.arrays())
    enc = EncoderConfig.tiny(vocab_size=64, hidden_dropout=0.0,
                             attn_dropout=0.0)
    cfg = ModelConfig(encoder=enc, n_top=mem.n_top, n_bottom=mem.n_bottom)
    params = init_model_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(0)
    n_rows = 16
    s = 16
    labels = np.zeros((n_rows, mem.n_bottom), np.float32)
    labels[np.arange(n_rows), rng.randint(2, mem.n_bottom, n_rows)] = 1
    data = {
        "input_ids": jnp.asarray(rng.randint(1, 64, (n_rows, s)),
                                 jnp.int32),
        "attn_mask": jnp.ones((n_rows, s), jnp.float32),
        "segment_ids": jnp.zeros((n_rows, s), jnp.int32),
        "trans_input_ids": jnp.asarray(rng.randint(1, 64, (n_rows, s)),
                                       jnp.int32),
        "trans_attn_mask": jnp.ones((n_rows, s), jnp.float32),
        "trans_segment_ids": jnp.zeros((n_rows, s), jnp.int32),
        "labels": jnp.asarray(labels),
    }
    return mem, hier, cfg, params, data


def _run_steps(cfg, hier, params, data, mesh, tensor_parallel, n_steps=3):
    opt_cfg = OptimizerConfig(optim_choice="bertadam", lr=1e-3,
                              bert_lr=1e-3, t_total=100)
    optimizer = make_optimizer(opt_cfg, params)
    sharded = jax.device_put(
        params, param_shardings(params, mesh,
                                tensor_parallel=tensor_parallel))
    state = TrainState(params=sharded,
                       opt_state=optimizer.init(sharded),
                       step=jnp.zeros([], jnp.int32))
    step = make_train_step(cfg, LossConfig(add_l2_loss=True), optimizer,
                           hier, n_accum=2, mesh=mesh, dual_stream=True,
                           donate=False)
    idx = jnp.asarray(np.arange(16, dtype=np.int32).reshape(2, 8))
    for i in range(n_steps):
        # deterministic=False but dropout rates are 0; fixed rng
        state, stats = step(state, data, idx, jax.random.PRNGKey(7))
    return jax.device_get(state.params), jax.device_get(stats)


def test_dp8_matches_single_device(tiny_memory):
    assert len(jax.devices()) == 8
    mem, hier, cfg, params, data = _setup(tiny_memory)

    mesh1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    mesh8 = make_mesh(n_data=8, n_model=1)

    p1, s1 = _run_steps(cfg, hier, params, data, mesh1, False)
    p8, s8 = _run_steps(cfg, hier, params, data, mesh8, False)

    flat1 = jax.tree.leaves(p1)
    flat8 = jax.tree.leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(s1["loss"]["total"]),
                               float(s8["loss"]["total"]), rtol=1e-5)
    np.testing.assert_allclose(float(s1["counts"]["tp"]),
                               float(s8["counts"]["tp"]))


def test_dp4_tp2_matches_single_device(tiny_memory):
    mem, hier, cfg, params, data = _setup(tiny_memory)
    mesh1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    mesh42 = make_mesh(n_data=4, n_model=2)

    p1, _ = _run_steps(cfg, hier, params, data, mesh1, False)
    p42, _ = _run_steps(cfg, hier, params, data, mesh42, True)

    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p42)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_step_chaining_matches_single_steps(tiny_memory):
    """K-chained train step == K sequential single steps with the rngs
    from jax.random.split (exact math equality)."""
    mem, hier, cfg, params, data = _setup(tiny_memory)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    opt_cfg = OptimizerConfig(optim_choice="bertadam", lr=1e-3,
                              bert_lr=1e-3, t_total=100)

    def fresh_state(optimizer):
        p = jax.device_put(params, param_shardings(params, mesh, False))
        return TrainState(params=p, opt_state=optimizer.init(p),
                          step=jnp.zeros([], jnp.int32))

    K = 3
    idx = jnp.asarray(
        np.arange(16, dtype=np.int32).reshape(2, 8)[None].repeat(K, 0))
    rng = jax.random.PRNGKey(11)

    opt1 = make_optimizer(opt_cfg, params)
    step1 = make_train_step(cfg, LossConfig(), opt1, hier, n_accum=2,
                            mesh=mesh, dual_stream=True, donate=False)
    s1 = fresh_state(opt1)
    rngs = jax.random.split(rng, K)
    for i in range(K):
        s1, st1 = step1(s1, data, idx[i], rngs[i])

    optK = make_optimizer(opt_cfg, params)
    stepK = make_train_step(cfg, LossConfig(), optK, hier, n_accum=2,
                            mesh=mesh, dual_stream=True, donate=False,
                            steps_per_call=K)
    sK = fresh_state(optK)
    sK, stK = stepK(sK, data, idx, rng)

    assert int(sK.step) == int(s1.step) == K
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sK.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_dcn2_dp2_tp2_matches_single_device(tiny_memory):
    """3-axis mesh (2-slice DCN data parallel x in-slice dp x tensor
    parallel): parameters after 3 steps must equal the single-device run —
    the dcn gradient psum is math-invisible."""
    mem, hier, cfg, params, data = _setup(tiny_memory)
    mesh1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    mesh222 = make_mesh(n_data=2, n_model=2, n_dcn=2)
    assert mesh222.axis_names == ("dcn", "data", "model")

    p1, _ = _run_steps(cfg, hier, params, data, mesh1, False)
    p222, _ = _run_steps(cfg, hier, params, data, mesh222, True)

    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p222)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_direct_mode_matches_index_mode(tiny_memory):
    """Multi-host input path: microbatch stacks assembled with
    process_sharded_batch + data_mode='direct' must produce the exact
    state an index-gathered step produces on the same rows."""
    from nbest_asr_tpu.parallel.data_sharding import process_sharded_batch

    mem, hier, cfg, params, data = _setup(tiny_memory)
    mesh = make_mesh(n_data=4, n_model=2)
    opt_cfg = OptimizerConfig(optim_choice="bertadam", lr=1e-3,
                              bert_lr=1e-3, t_total=100)

    def fresh(optimizer):
        p = jax.device_put(params, param_shardings(params, mesh, True))
        return TrainState(params=p, opt_state=optimizer.init(p),
                          step=jnp.zeros([], jnp.int32))

    idx = jnp.asarray(np.arange(16, dtype=np.int32).reshape(2, 8))
    rng = jax.random.PRNGKey(7)

    opt_a = make_optimizer(opt_cfg, params)
    step_a = make_train_step(cfg, LossConfig(), opt_a, hier, n_accum=2,
                             mesh=mesh, dual_stream=True, donate=False)
    sa, st_a = step_a(fresh(opt_a), data, idx, rng)

    # single-process: local shard == the full global batch
    local = {k: np.asarray(v).reshape((2, 8) + v.shape[1:])
             for k, v in data.items()}
    micros = process_sharded_batch(mesh, local)
    opt_b = make_optimizer(opt_cfg, params)
    step_b = make_train_step(cfg, LossConfig(), opt_b, hier, n_accum=2,
                             mesh=mesh, dual_stream=True, donate=False,
                             data_mode="direct")
    sb, st_b = step_b(fresh(opt_b), micros, idx, rng)

    np.testing.assert_allclose(float(st_a["loss"]["total"]),
                               float(st_b["loss"]["total"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(jax.device_get(sa.params)),
                    jax.tree.leaves(jax.device_get(sb.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_single_stream_matches_dual_without_l2(tiny_memory):
    """Without --add_l2_loss the transcript encoder pass contributes zero
    gradient (its CLS feeds only the MSE term) — the Trainer skips it for
    ~2x encoder FLOPs.  Pin exact math equality of the two step variants."""
    mem, hier, cfg, params, data = _setup(tiny_memory)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    opt_cfg = OptimizerConfig(optim_choice="bertadam", lr=1e-3,
                              bert_lr=1e-3, t_total=100)
    idx = jnp.asarray(np.arange(16, dtype=np.int32).reshape(2, 8))
    rng = jax.random.PRNGKey(7)

    results = {}
    for dual in (True, False):
        opt = make_optimizer(opt_cfg, params)
        p = jax.device_put(params, param_shardings(params, mesh, False))
        st = TrainState(params=p, opt_state=opt.init(p),
                        step=jnp.zeros([], jnp.int32))
        step = make_train_step(cfg, LossConfig(add_l2_loss=False), opt,
                               hier, n_accum=2, mesh=mesh,
                               dual_stream=dual, donate=False)
        st, stats = step(st, data, idx, rng)
        results[dual] = (jax.device_get(st.params),
                         float(stats["loss"]["total"]))

    assert results[True][1] == results[False][1]
    for a, b in zip(jax.tree.leaves(results[True][0]),
                    jax.tree.leaves(results[False][0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
