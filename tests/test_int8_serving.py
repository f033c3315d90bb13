"""Int8 serving megakernels (`ops/int8_serving.py`) vs the XLA
dense_int8 oracle — interpret mode (the on-chip twin lives in
tools/tpu_kernel_check.py; these kernels are deterministic so interpret
mode covers the full math, unlike the dropout kernels)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from nbest_asr_tpu.ops.int8_serving import (int8_attention_block,
                                            int8_ffn_block)
from nbest_asr_tpu.ops.layers import gelu, layer_norm
from nbest_asr_tpu.ops.quant import dense_int8, quantize_weight

H, INTER, HEADS = 128, 256, 2


def _quant(rng, shape):
    w = jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)
    return quantize_weight(w)


def test_int8_ffn_block_matches_xla_oracle():
    rng = np.random.RandomState(0)
    n = 24  # non-multiple of the row block: exercises padding
    x = jnp.asarray(rng.randn(n, H).astype(np.float32) * 0.5)
    w1q, w1s = _quant(rng, (H, INTER))
    w2q, w2s = _quant(rng, (INTER, H))
    b1 = jnp.asarray(rng.randn(INTER).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    ls = jnp.asarray(1.0 + 0.1 * rng.randn(H).astype(np.float32))
    lb = jnp.asarray(0.1 * rng.randn(H).astype(np.float32))

    y = int8_ffn_block(x, w1q, w1s, b1, w2q, w2s, b2, ls, lb,
                       interpret=True)

    h = dense_int8(x, w1q, w1s, b1)
    g = gelu(h)
    y2 = dense_int8(g, w2q, w2s, b2)
    want = layer_norm(x + y2, ls, lb)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def _attn_oracle(x, wqkvq, wqkvs, bqkv, woq, wos, bo, ls, lb, mask):
    b, s, h = x.shape
    d = h // HEADS
    qkv = dense_int8(x, wqkvq, wqkvs, bqkv)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, HEADS, d)
    k = k.reshape(b, s, HEADS, d)
    v = v.reshape(b, s, HEADS, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
    # segment-equality masking (ops/attention.py): a query attends the
    # keys sharing its mask value
    scores = jnp.where(mask[:, None, None, :] == mask[:, None, :, None],
                       scores, -1e9)
    p = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, s, h)
    out = dense_int8(ctx, woq, wos, bo)
    return layer_norm(x + out, ls, lb)


def test_int8_attention_block_matches_xla_oracle():
    rng = np.random.RandomState(1)
    b, s = 3, 24  # padding on both batch and seq
    x = jnp.asarray(rng.randn(b, s, H).astype(np.float32) * 0.5)
    wqkvq, wqkvs = _quant(rng, (H, 3 * H))
    woq, wos = _quant(rng, (H, H))
    bqkv = jnp.asarray(rng.randn(3 * H).astype(np.float32) * 0.1)
    bo = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    ls = jnp.asarray(1.0 + 0.1 * rng.randn(H).astype(np.float32))
    lb = jnp.asarray(0.1 * rng.randn(H).astype(np.float32))
    mask = np.ones((b, s), np.float32)
    mask[0, 17:] = 0.0
    mask[2, 5:] = 0.0
    mask = jnp.asarray(mask)

    y = int8_attention_block(x, wqkvq, wqkvs, bqkv, woq, wos, bo, ls,
                             lb, mask, n_heads=HEADS, interpret=True)
    want = _attn_oracle(x, wqkvq, wqkvs, bqkv, woq, wos, bo, ls, lb,
                        mask)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_encoder_dispatch_routes_quantized_leaves_to_kernels(monkeypatch):
    """Quantized param tree + use_fused_* + deterministic must route
    through the int8 megakernels (and produce the XLA path's numbers)."""
    from nbest_asr_tpu.models.encoder import (EncoderConfig,
                                              encoder_forward,
                                              init_encoder_params)
    from nbest_asr_tpu.ops.quant import quantize_encoder_params

    cfg_x = EncoderConfig(vocab_size=97, hidden_size=H, num_layers=2,
                          num_heads=HEADS, intermediate_size=INTER,
                          max_position=64)
    cfg_k = EncoderConfig(vocab_size=97, hidden_size=H, num_layers=2,
                          num_heads=HEADS, intermediate_size=INTER,
                          max_position=64, use_fused_attn=True,
                          use_fused_ffn=True)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg_x)
    qparams = quantize_encoder_params({"encoder": params})["encoder"]

    rng = np.random.RandomState(2)
    ids = jnp.asarray(rng.randint(1, 97, (2, 24)), jnp.int32)
    mask = jnp.ones((2, 24), jnp.float32)

    calls = {"ffn": 0, "attn": 0}
    import nbest_asr_tpu.ops.int8_serving as i8

    real_ffn, real_attn = i8.int8_ffn_block, i8.int8_attention_block

    def spy_ffn(*a, **kw):
        calls["ffn"] += 1
        return real_ffn(*a, **kw)

    def spy_attn(*a, **kw):
        calls["attn"] += 1
        return real_attn(*a, **kw)

    monkeypatch.setattr(i8, "int8_ffn_block", spy_ffn)
    monkeypatch.setattr(i8, "int8_attention_block", spy_attn)

    want = encoder_forward(qparams, ids, mask, None, cfg_x,
                           deterministic=True)
    with pltpu.force_tpu_interpret_mode():
        got = encoder_forward(qparams, ids, mask, None, cfg_k,
                              deterministic=True)
    # the scan traces the layer body once; one call per kernel suffices
    assert calls["ffn"] >= 1 and calls["attn"] >= 1
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-5)


def test_training_never_routes_to_int8_kernels():
    """Non-deterministic (training) forwards with quantized leaves must
    NOT take the serving kernels; quantized training is unsupported and
    the XLA path handles the dict leaves."""
    from nbest_asr_tpu.models.encoder import (EncoderConfig,
                                              encoder_forward,
                                              init_encoder_params)
    from nbest_asr_tpu.ops.quant import quantize_encoder_params

    cfg = EncoderConfig(vocab_size=97, hidden_size=H, num_layers=1,
                        num_heads=HEADS, intermediate_size=INTER,
                        max_position=64, use_fused_attn=True,
                        use_fused_ffn=True, hidden_dropout=0.1,
                        attn_dropout=0.1)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_encoder_params({"encoder": params})["encoder"]
    ids = jnp.asarray(np.ones((2, 24), np.int32))
    mask = jnp.ones((2, 24), jnp.float32)
    # no interpret context: would crash if a Pallas path were taken on
    # the CPU backend
    y = encoder_forward(qparams, ids, mask, None, cfg,
                        deterministic=False, rng=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(y)).all()
