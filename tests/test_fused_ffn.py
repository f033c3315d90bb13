"""Fused FFN megakernel (ops/fused_ffn.py) vs the XLA oracle chain:
forward, all eight gradients, dropout determinism — interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from nbest_asr_tpu.ops.fused_ffn import fused_ffn_block
from nbest_asr_tpu.ops.layers import gelu, layer_norm

H, INTER = 128, 256
EPS = 1e-12


def _inputs(n=48, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, H) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.randn(H, INTER) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.randn(INTER) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.randn(INTER, H) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.randn(H) * 0.02, jnp.float32)
    ls = jnp.asarray(1.0 + 0.1 * rng.randn(H), jnp.float32)
    lb = jnp.asarray(0.1 * rng.randn(H), jnp.float32)
    return x, w1, b1, w2, b2, ls, lb


def _oracle(x, w1, b1, w2, b2, ls, lb):
    y = gelu(x @ w1 + b1)
    y2 = y @ w2 + b2
    return layer_norm(x + y2, ls, lb, EPS)


def test_forward_matches_oracle():
    args = _inputs()
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        out = fused_ffn_block(*args, eps=EPS)
        ref = _oracle(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_forward_nonmultiple_rows_and_3d():
    """Row padding (n=37 -> 40-pad to block) and (b, s, h) shapes."""
    x, *rest = _inputs(n=37)
    x3 = x.reshape(1, 37, H)
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        out = fused_ffn_block(x3, *rest, eps=EPS)
        ref = _oracle(x, *rest)
    np.testing.assert_allclose(np.asarray(out).reshape(37, H),
                               np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_all_gradients_match_oracle():
    args = _inputs()

    def loss(fn):
        def f(*a):
            out = fn(*a)
            return jnp.sum(out * out)
        return f

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        g_fused = jax.grad(
            loss(lambda *a: fused_ffn_block(*a, eps=EPS)),
            argnums=tuple(range(7)))(*args)
        g_ref = jax.grad(loss(_oracle), argnums=tuple(range(7)))(*args)
    names = ("x", "w1", "b1", "w2", "b2", "ln_scale", "ln_bias")
    for gf, gr, name in zip(g_fused, g_ref, names):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-4, rtol=2e-3,
                                   err_msg=f"d{name}")


def test_dropout_path_traces_and_is_finite():
    """The interpret-mode on-chip PRNG returns all zeros (same
    limitation as flash attention), so mask CORRECTNESS is validated on
    real hardware by tools/tpu_kernel_check.py; here we pin that the
    dropout code path traces, runs, and yields finite outputs/grads."""
    args = _inputs(n=32)
    key = jax.random.PRNGKey(7)

    def f(*a):
        out = fused_ffn_block(*a, dropout_rate=0.25, dropout_rng=key,
                              eps=EPS)
        return jnp.sum(out * out)

    with pltpu.force_tpu_interpret_mode():
        val = f(*args)
        g1 = jax.grad(f, argnums=(0, 1, 3))(*args)
    assert np.isfinite(float(val))
    for a in g1:
        assert np.all(np.isfinite(np.asarray(a)))


def test_mask_ids_block_size_invariant():
    """The dropout-mask tile ids must be identical whether the kernel
    runs 128-row blocks (forward) or 64-row blocks (backward) — the
    round-2 advisor found the ids were keyed on the KERNEL block, which
    silently decorrelated the fwd/bwd dropout masks.  Probe kernels dump
    `_mask_ids` per absolute 64-row sub-tile under both blockings and
    the streams must agree elementwise."""
    import functools
    from jax.experimental import pallas as pl
    from nbest_asr_tpu.ops.fused_ffn import _mask_ids

    N, NJ = 256, 2

    def probe(o_ref, *, bn):
        s1, s2 = _mask_ids(bn)
        n_sub = max(bn // 64, 1)
        o_ref[...] = jnp.stack(
            [jnp.full((128,), s1(s) * 65536 + s2(s), jnp.int32)
             for s in range(n_sub)])

    def run(bn):
        n_sub = bn // 64
        return pl.pallas_call(
            functools.partial(probe, bn=bn),
            grid=(N // bn, NJ),
            out_specs=pl.BlockSpec((n_sub, 128), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((N // 64, NJ * 128),
                                           jnp.int32),
            interpret=True,
        )()

    fwd_ids = np.asarray(run(128))
    bwd_ids = np.asarray(run(64))
    np.testing.assert_array_equal(fwd_ids, bwd_ids)
    # and ids are unique across (sub-tile, j, stream)
    s1 = fwd_ids[:, ::128] // 65536
    s2 = fwd_ids[:, ::128] % 65536
    all_ids = np.concatenate([s1.ravel(), np.unique(s2.ravel())])
    assert len(np.unique(all_ids)) == len(all_ids)


def test_dropout_rng_required():
    args = _inputs(n=16)
    with pytest.raises(ValueError, match="requires dropout_rng"):
        fused_ffn_block(*args, dropout_rate=0.1, eps=EPS)


def test_encoder_path_with_fused_ffn():
    """EncoderConfig.use_fused_ffn routes the layer FFN through the
    megakernel and matches the XLA encoder (deterministic, f32)."""
    from nbest_asr_tpu.models.encoder import (EncoderConfig,
                                              encoder_forward,
                                              init_encoder_params)

    cfg = EncoderConfig(vocab_size=500, hidden_size=H, num_layers=2,
                        num_heads=2, intermediate_size=INTER,
                        max_position=64)
    cfg_f = EncoderConfig(vocab_size=500, hidden_size=H, num_layers=2,
                          num_heads=2, intermediate_size=INTER,
                          max_position=64, use_fused_ffn=True)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 500, (3, 24)), jnp.int32)
    mask = jnp.ones((3, 24), jnp.float32)
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        out_f = encoder_forward(params, ids, mask, None, cfg_f)
    out_x = encoder_forward(params, ids, mask, None, cfg)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=5e-5, rtol=1e-4)
