"""Fused LN / bias-GELU Pallas kernel equivalence vs the XLA oracles
(interpret mode on CPU), values and gradients, plus full-encoder parity
with the fused kernels enabled."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from nbest_asr_tpu.ops.fused_gelu import fused_bias_gelu
from nbest_asr_tpu.ops.fused_ln import fused_residual_layer_norm
from nbest_asr_tpu.ops.layers import gelu, layer_norm


def test_fused_ln_forward():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 40, 256), jnp.float32)
    r = jnp.asarray(rng.randn(2, 40, 256), jnp.float32)
    scale = jnp.asarray(rng.rand(256) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(256), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = fused_residual_layer_norm(x, r, scale, bias)
    ref = layer_norm(x + r, scale, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_fused_ln_grads():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(64, 256), jnp.float32)
    r = jnp.asarray(rng.randn(64, 256), jnp.float32)
    scale = jnp.asarray(rng.rand(256) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(256), jnp.float32)
    w = jnp.asarray(rng.randn(64, 256), jnp.float32)

    def loss_fused(x, r, scale, bias):
        return jnp.sum(fused_residual_layer_norm(x, r, scale, bias) * w)

    def loss_ref(x, r, scale, bias):
        return jnp.sum(layer_norm(x + r, scale, bias) * w)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, r, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, r, scale, bias)
    for a, b, name in zip(g1, g2, ["dx", "dr", "dscale", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4, err_msg=name)


def test_fused_gelu_forward_and_grads():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(3, 50, 128) * 2, jnp.float32)
    b = jnp.asarray(rng.randn(128), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        y = fused_bias_gelu(x, b)
    ref = gelu(x + b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)

    def loss_fused(x, b):
        return jnp.sum(fused_bias_gelu(x, b) ** 2)

    def loss_ref(x, b):
        return jnp.sum(gelu(x + b) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_fused, argnums=(0, 1))(x, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, b)
    for a, bb, name in zip(g1, g2, ["dx", "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=2e-4, rtol=1e-4, err_msg=name)


def test_encoder_with_fused_kernels_matches_xla():
    from nbest_asr_tpu.models.encoder import (EncoderConfig,
                                              encoder_forward,
                                              init_encoder_params)

    cfg_ref = EncoderConfig.tiny(vocab_size=100, hidden_size=128,
                                 intermediate_size=256)
    cfg_fused = EncoderConfig.tiny(vocab_size=100, hidden_size=128,
                                   intermediate_size=256,
                                   use_fused_ln=True, use_fused_gelu=True)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg_ref)
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 100, (2, 16)),
                      jnp.int32)
    mask = jnp.ones((2, 16), jnp.float32)
    ref = encoder_forward(params, ids, mask, None, cfg_ref)
    with pltpu.force_tpu_interpret_mode():
        out = encoder_forward(params, ids, mask, None, cfg_fused)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_embed_lookup_matches_xla():
    from nbest_asr_tpu.ops.fused_embed import fused_embed_lookup

    rng = np.random.RandomState(3)
    V, P, T, h = 50, 32, 2, 128
    word = jnp.asarray(rng.randn(V, h), jnp.float32)
    pos = jnp.asarray(rng.randn(P, h), jnp.float32)
    type_ = jnp.asarray(rng.randn(T, h), jnp.float32)
    scale = jnp.asarray(rng.rand(h) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(h), jnp.float32)
    b, s = 3, 16
    ids = jnp.asarray(rng.randint(0, V, (b, s)), jnp.int32)
    tids = jnp.asarray(rng.randint(0, T, (b, s)), jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        y = fused_embed_lookup(word, pos, type_, scale, bias, ids, tids,
                               s)
    ref = layer_norm(word[ids] + pos[jnp.arange(s)][None] + type_[tids],
                     scale, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_fused_embed_gradients_match_xla():
    from nbest_asr_tpu.ops.fused_embed import fused_embed_lookup

    rng = np.random.RandomState(4)
    V, P, T, h = 30, 16, 2, 128
    word = jnp.asarray(rng.randn(V, h), jnp.float32)
    pos = jnp.asarray(rng.randn(P, h), jnp.float32)
    type_ = jnp.asarray(rng.randn(T, h), jnp.float32)
    scale = jnp.asarray(rng.rand(h) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(h), jnp.float32)
    b, s = 2, 8
    ids = jnp.asarray(rng.randint(0, V, (b, s)), jnp.int32)
    tids = jnp.asarray(rng.randint(0, T, (b, s)), jnp.int32)

    def loss_fused(word, pos, type_, scale, bias):
        y = fused_embed_lookup(word, pos, type_, scale, bias, ids, tids,
                               s)
        return jnp.sum(y ** 2)

    def loss_ref(word, pos, type_, scale, bias):
        y = layer_norm(word[ids] + pos[jnp.arange(s)][None] + type_[tids],
                       scale, bias)
        return jnp.sum(y ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
            word, pos, type_, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        word, pos, type_, scale, bias)
    for a, b_, name in zip(g1, g2, ["dword", "dpos", "dtype", "dscale",
                                    "dbias"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-4, err_msg=name)


def test_encoder_with_fused_embedding_matches_xla():
    from nbest_asr_tpu.models.encoder import (EncoderConfig,
                                              encoder_forward,
                                              init_encoder_params)

    cfg_ref = EncoderConfig.tiny(vocab_size=100, hidden_size=128,
                                 intermediate_size=256)
    cfg_f = EncoderConfig.tiny(vocab_size=100, hidden_size=128,
                               intermediate_size=256,
                               use_fused_embedding=True)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg_ref)
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 100, (2, 16)),
                      jnp.int32)
    segs = jnp.asarray(np.random.RandomState(1).randint(0, 2, (2, 16)),
                       jnp.int32)
    mask = jnp.ones((2, 16), jnp.float32)
    ref = encoder_forward(params, ids, mask, segs, cfg_ref)
    with pltpu.force_tpu_interpret_mode():
        out = encoder_forward(params, ids, mask, segs, cfg_f)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
