"""Flash-attention kernel equivalence vs the XLA oracle, in Pallas
interpret mode on CPU (forward and gradients, padded/ragged masks,
non-multiple-of-128 sequence lengths)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from nbest_asr_tpu.ops.attention import multi_head_attention
from nbest_asr_tpu.ops.flash_attention import flash_attention


def _random_qkv(b=2, s=256, h=4, d=64, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    def mk():
        return jnp.asarray(rng.randn(b, s, h, d).astype(np.float32),
                           dtype)
    q, k, v = mk(), mk(), mk()
    lens = rng.randint(s // 4, s + 1, (b,))
    mask = (np.arange(s)[None, :] < lens[:, None]).astype(np.float32)
    return q, k, v, jnp.asarray(mask)


@pytest.mark.parametrize("s", [256, 200])
def test_forward_matches_xla(s):
    q, k, v, mask = _random_qkv(s=s)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, mask)
    ref = multi_head_attention(q, k, v, mask)
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(np.asarray(out)[m], np.asarray(ref)[m],
                               atol=2e-5, rtol=1e-4)


def test_gradients_match_xla():
    q, k, v, mask = _random_qkv(s=128, b=2, h=2)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, mask)
        return jnp.sum(out * out * mask[:, :, None, None])

    def loss_ref(q, k, v):
        out = multi_head_attention(q, k, v, mask)
        return jnp.sum(out * out * mask[:, :, None, None])

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-4, rtol=1e-3,
                                   err_msg=f"d{name}")


def test_bf16_inputs():
    q, k, v, mask = _random_qkv(s=128, dtype=jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, mask)
    ref = multi_head_attention(q, k, v, mask)
    m = np.asarray(mask).astype(bool)
    diff = np.abs(np.asarray(out, np.float32)[m]
                  - np.asarray(ref, np.float32)[m])
    assert diff.max() < 0.05  # bf16 tolerance


@pytest.mark.parametrize("s", [256, 640])
def test_tiled_path_forward(s):
    """Explicit block sizes (or seq > SB_MAX_SEQ) force the general tiled
    kernels; the single-block specialization must not orphan them."""
    q, k, v, mask = _random_qkv(s=s, b=2, h=2)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, mask, block_q=128, block_k=128)
    ref = multi_head_attention(q, k, v, mask)
    m = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(np.asarray(out)[m], np.asarray(ref)[m],
                               atol=2e-5, rtol=1e-4)


def test_tiled_path_gradients():
    q, k, v, mask = _random_qkv(s=128, b=2, h=2)

    def loss(fn):
        def f(q, k, v):
            out = fn(q, k, v, mask)
            return jnp.sum(out * out * mask[:, :, None, None])
        return f

    with pltpu.force_tpu_interpret_mode():
        g_tiled = jax.grad(
            loss(lambda q, k, v, m: flash_attention(
                q, k, v, m, block_q=128, block_k=128)),
            argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(multi_head_attention), argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_tiled, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-4, rtol=1e-3,
                                   err_msg=f"d{name}")


def test_asymmetric_padding_gradients():
    """seq 100 -> q rows pad to 112, kv to 128 (the short-bucket shape
    class); gradients must match XLA through both paddings."""
    q, k, v, mask = _random_qkv(s=100, b=2, h=2)

    def loss(fn):
        def f(q, k, v):
            out = fn(q, k, v, mask)
            return jnp.sum(out * out * mask[:, :, None, None])
        return f

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(multi_head_attention), argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-4, rtol=1e-3,
                                   err_msg=f"d{name}")


def test_tiled_flash_routing_is_memory_aware():
    """seq <= 512 at/above flash_min_seq routes to flash; in tiled
    territory XLA is preferred unless its ~3x (b,h,s,s) backward
    residency would crowd HBM (measured: XLA 3.47 vs tiled 5.45 ms at
    batch 8 x 1024 with dropout on v5e)."""
    from nbest_asr_tpu.ops.attention import _flash_preferred

    assert _flash_preferred(128, 64, 12)       # single-block: kernel
    assert _flash_preferred(32, 256, 12)
    assert _flash_preferred(8, 512, 12)
    # tiled, fits in HBM comfortably -> XLA (measured faster)
    assert not _flash_preferred(8, 1024, 12)   # ~0.56 GiB residency
    # tiled, residency past the budget -> flash (memory path)
    assert _flash_preferred(64, 1024, 12)      # ~4.5 GiB residency
    assert _flash_preferred(16, 4096, 12)      # long-context regime
