"""Int8-forward training FFN megakernel (VERDICT r3 next #5) —
interpret-mode oracles.

Contract of `fused_ffn_block_int8_train`:
- FORWARD == the int8 XLA chain (quant.dense_int8 for both GEMMs +
  GELU/residual/LN), i.e. real int8 numerics;
- BACKWARD == the bf16/f32 megakernel backward fed the int8 forward's
  saved activations: gradients computed as if the forward were full
  precision (straight-through w.r.t. quantization) except the LN/residual
  head, which differentiates through the ACTUAL int8 y2d.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from nbest_asr_tpu.ops.fused_attention import (
    fused_attention_block, fused_attention_block_int8_train)
from nbest_asr_tpu.ops.fused_ffn import (fused_ffn_block,
                                         fused_ffn_block_int8_train)
from nbest_asr_tpu.ops.layers import gelu, layer_norm
from nbest_asr_tpu.ops.quant import dense_int8, quantize_weight

H, INTER = 128, 256
EPS = 1e-12


pytestmark = pytest.mark.slow  # CPU-training / subprocess tier


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


def _int8_oracle(x, w1, b1, w2, b2, ls, lb):
    """The quantized XLA chain (`ops/quant.py` math)."""
    w1q, w1s = quantize_weight(w1, axis_in=-2)
    w2q, w2s = quantize_weight(w2, axis_in=-2)
    g = gelu(dense_int8(x, w1q, w1s, b1))
    y2 = dense_int8(g, w2q, w2s, b2)
    return layer_norm(x + y2, ls, lb, EPS)


def test_int8_forward_matches_quantized_oracle():
    args = _inputs()
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        out = fused_ffn_block_int8_train(*args, eps=EPS)
        ref = _int8_oracle(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)
    # and it is genuinely quantized: differs from the full-precision
    # block beyond float noise
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        full = fused_ffn_block(*args, eps=EPS)
    assert np.max(np.abs(np.asarray(out) - np.asarray(full))) > 1e-3


def test_int8_backward_is_straight_through():
    """Gradients: LN/residual head differentiates through the int8
    forward's saved y2d; the GEMM chain uses full-precision weights.
    Oracle: the same hybrid computed in XLA."""
    x, w1, b1, w2, b2, ls, lb = _inputs(n=32, seed=3)

    def hybrid_oracle(x, w1, b1, w2, b2, ls, lb):
        # forward values from the int8 chain, backward graph from the
        # full-precision chain — emulated with stop_gradient splicing:
        # y2_used = y2_fp + sg(y2_int8 - y2_fp)
        w1q, w1s = quantize_weight(w1, axis_in=-2)
        w2q, w2s = quantize_weight(w2, axis_in=-2)
        y2_i8 = dense_int8(gelu(dense_int8(x, w1q, w1s, b1)),
                           w2q, w2s, b2)
        y2_fp = gelu(x @ w1 + b1) @ w2 + b2
        y2 = y2_fp + jax.lax.stop_gradient(y2_i8 - y2_fp)
        return layer_norm(x + y2, ls, lb, EPS)

    def loss_kernel(*a):
        return jnp.sum(fused_ffn_block_int8_train(*a, eps=EPS) ** 2)

    def loss_oracle(*a):
        return jnp.sum(hybrid_oracle(*a) ** 2)

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        g_k = jax.grad(loss_kernel, argnums=tuple(range(7)))(
            x, w1, b1, w2, b2, ls, lb)
        g_o = jax.grad(loss_oracle, argnums=tuple(range(7)))(
            x, w1, b1, w2, b2, ls, lb)
    names = ("x", "w1", "b1", "w2", "b2", "ls", "lb")
    for name, a, b in zip(names, g_k, g_o):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3,
            err_msg=f"grad {name}")


def test_int8_ffn_dropout_traces_and_masks_match_bf16():
    """Regression: the int8 forward launches on the same 2-D
    (rows, inter-slice) grid geometry `_mask_ids` expects — with a 1-D
    grid the dropout path failed to TRACE at all ("Axis 1 is out of
    bounds for grid"), so `--int8_train` crashed the CLI the moment
    bert_dropout > 0.  Also pins mask CONSISTENCY with the bf16 kernel:
    same seed => same keep-masks, so i8-vs-bf16 forward outputs differ
    only by quantization error (a mask mismatch zeroes different rows
    and shows up as O(1) diffs), and the shared bf16 backward
    regenerates the right masks (finite, deterministic grads)."""
    args = _inputs(n=128, seed=5)
    key = jax.random.PRNGKey(9)
    kw = dict(dropout_rate=0.5, dropout_rng=key, eps=EPS)
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        y_a = fused_ffn_block_int8_train(*args, **kw)
        y_b = fused_ffn_block_int8_train(*args, **kw)
        y_bf = fused_ffn_block(*args, **kw)
        g = jax.grad(lambda *a: jnp.sum(
            fused_ffn_block_int8_train(*a, **kw) ** 2),
            argnums=tuple(range(7)))(*args)
    np.testing.assert_array_equal(np.asarray(y_a), np.asarray(y_b))
    np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_bf),
                               atol=2e-2,
                               err_msg="dropout masks diverged between "
                               "the int8 and bf16 forwards")
    for a in g:
        assert np.all(np.isfinite(np.asarray(a)))


# --------------------------------------------------------------------- #
# int8 BACKWARD variant (--int8_train_bwd)
# --------------------------------------------------------------------- #


def test_dgrad_int8_scale_folding_is_exact():
    """The per-output weight scales fold exactly into the incoming
    gradient: dgrad_int8 == g @ dequant(wq)^T up to only the per-token
    rounding of the scaled gradient (verified by quantization-free
    inputs where the rounding is exact)."""
    from nbest_asr_tpu.ops.quant import dgrad_int8

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 96), jnp.float32)
    wq, ws = quantize_weight(w, axis_in=-2)
    wdeq = wq.astype(jnp.float32) * ws
    # g whose scaled rows quantize exactly: integer rows with abs-max
    # exactly 127, pre-divided by ws so the fold lands back on them
    # (then g_scale == 1 and every partial product is an exact int32)
    gint = rng.randint(-126, 127, (8, 96)).astype(np.float32)
    gint[:, 0] = 127.0
    with jax.default_matmul_precision("highest"):
        got = dgrad_int8(jnp.asarray(gint) / ws.reshape(1, -1), wq, ws)
        want = (jnp.asarray(gint) / ws.reshape(1, -1)) @ wdeq.T
    # f32 divide/multiply round-trip dust only (gq == gint exactly;
    # g_scale == 1 ± ulp): orders of magnitude inside quantization error
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=0)
    # and on generic inputs it tracks the dequantized matmul closely
    g = jnp.asarray(rng.randn(8, 96), jnp.float32)
    with jax.default_matmul_precision("highest"):
        got = dgrad_int8(g, wq, ws)
        want = g @ wdeq.T
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    ref = np.abs(np.asarray(want)).max()
    assert err < 0.02 * ref, (err, ref)


def test_int8_bwd_matches_quantized_gradient_oracle():
    """--int8_train_bwd gradients == an XLA oracle implementing the same
    quantized backward: int8 dgrads (scale-folded, per-token quantized)
    through both weights, int8 forward recompute for gd/h, exact
    LN/residual head, bf16-path wgrads from the int8 tiles."""
    from nbest_asr_tpu.ops.quant import dgrad_int8

    x, w1, b1, w2, b2, ls, lb = _inputs(n=32, seed=13)

    def kernel_loss(*a):
        return jnp.sum(fused_ffn_block_int8_train(
            *a, eps=EPS, int8_bwd=True) ** 2)

    def oracle_grads(x, w1, b1, w2, b2, ls, lb):
        w1q, w1s = quantize_weight(w1, axis_in=-2)
        w2q, w2s = quantize_weight(w2, axis_in=-2)
        h = dense_int8(x, w1q, w1s, b1)
        gd = gelu(h)
        y2 = dense_int8(gd, w2q, w2s, b2)

        # LN/residual head: exact gradients through the actual int8 y2
        def head(x_, y2_, ls_, lb_):
            return jnp.sum(layer_norm(x_ + y2_, ls_, lb_, EPS) ** 2)

        dxh, dy2, dls, dlb = jax.grad(head, argnums=(0, 1, 2, 3))(
            x, y2, ls, lb)
        db2 = jnp.sum(dy2, axis=0)
        dw2 = gd.T @ dy2
        dgd = dgrad_int8(dy2, w2q, w2s)                  # int8 dgrad A

        def gelu_path(h_):
            return jnp.sum(gelu(h_) * jax.lax.stop_gradient(dgd))

        dh = jax.grad(gelu_path)(h.astype(jnp.float32))
        db1 = jnp.sum(dh, axis=0)
        dw1 = x.T @ dh
        dx = dxh + dgrad_int8(dh, w1q, w1s)              # int8 dgrad B
        return dx, dw1, db1, dw2, db2, dls, dlb

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        g_k = jax.grad(kernel_loss, argnums=tuple(range(7)))(
            x, w1, b1, w2, b2, ls, lb)
        g_o = oracle_grads(x, w1, b1, w2, b2, ls, lb)
    names = ("x", "w1", "b1", "w2", "b2", "ls", "lb")
    for name, a, b in zip(names, g_k, g_o):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-2,
            err_msg=f"grad {name}")


def test_int8_bwd_close_to_bf16_bwd_and_deterministic():
    """The int8 backward's gradients stay quantization-close to the
    bf16 backward's (same forward, same masks) — and with dropout the
    whole thing still traces, is deterministic, and regenerates the
    same masks (dx residual branch flows unquantized)."""
    args = _inputs(n=128, seed=17)
    key = jax.random.PRNGKey(3)
    kw = dict(dropout_rate=0.3, dropout_rng=key, eps=EPS)

    def loss(int8_bwd):
        return lambda *a: jnp.sum(fused_ffn_block_int8_train(
            *a, int8_bwd=int8_bwd, **kw) ** 2)

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        g_i8 = jax.grad(loss(True), argnums=tuple(range(7)))(*args)
        g_i8b = jax.grad(loss(True), argnums=tuple(range(7)))(*args)
        g_bf = jax.grad(loss(False), argnums=tuple(range(7)))(*args)
    for a, b in zip(g_i8, g_i8b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    names = ("x", "w1", "b1", "w2", "b2", "ls", "lb")
    for name, a, b in zip(names, g_i8, g_bf):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
        assert rel < 0.08, (name, rel)
    # ls/lb grads depend only on dy and the saved forward: identical
    for idx in (5, 6):
        np.testing.assert_allclose(np.asarray(g_i8[idx]),
                                   np.asarray(g_bf[idx]), rtol=1e-6,
                                   atol=1e-6)


# --------------------------------------------------------------------- #
# attention megakernel int8-forward variant (--int8_train_attn)
# --------------------------------------------------------------------- #

AH, AHEADS = 128, 2


def _attn_inputs(b=2, s=48, seed=7):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, s, AH) * 0.5, jnp.float32)
    wqkv = jnp.asarray(rng.randn(AH, 3 * AH) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.randn(3 * AH) * 0.02, jnp.float32)
    wo = jnp.asarray(rng.randn(AH, AH) * 0.05, jnp.float32)
    bo = jnp.asarray(rng.randn(AH) * 0.02, jnp.float32)
    ls = jnp.asarray(1.0 + 0.1 * rng.randn(AH), jnp.float32)
    lb = jnp.asarray(0.1 * rng.randn(AH), jnp.float32)
    lens = np.full((b,), s)
    lens[1::2] = s - 9  # alternate full/short rows
    mask = jnp.asarray(
        (np.arange(s)[None, :] < lens[:, None]), jnp.float32)
    return x, wqkv, bqkv, wo, bo, ls, lb, mask


def _attn_core_fp(x, wqkv, bqkv, wo, bo, mask, *, qkv_fn, out_fn):
    """Attention block pre-LN output with pluggable GEMMs (full precision
    or int8 XLA chain); softmax math mirrors the kernel's."""
    b, s, h = x.shape
    d = h // AHEADS
    qkv = qkv_fn(x, wqkv, bqkv)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    outs = []
    for i in range(AHEADS):
        qi = q[..., i * d:(i + 1) * d]
        ki = k[..., i * d:(i + 1) * d]
        vi = v[..., i * d:(i + 1) * d]
        s_ = jnp.einsum("bqd,bkd->bqk", qi, ki) / float(d) ** 0.5
        s_ = jnp.where(mask[:, None, :] > 0, s_, -0.7 * float(
            np.finfo(np.float32).max))
        mx = jnp.max(s_, axis=-1, keepdims=True)
        p = jnp.exp(s_ - mx)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jnp.einsum("bqk,bkd->bqd", p, vi))
    ctx = jnp.concatenate(outs, axis=-1)
    return out_fn(ctx, wo, bo)


def test_int8_attn_forward_matches_quantized_oracle():
    x, wqkv, bqkv, wo, bo, ls, lb, mask = _attn_inputs()
    wq, ws = quantize_weight(wqkv, axis_in=-2)
    woq, wos = quantize_weight(wo, axis_in=-2)
    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        out = fused_attention_block_int8_train(
            x, wqkv, bqkv, wo, bo, ls, lb, mask, n_heads=AHEADS,
            eps=EPS)
        pre = _attn_core_fp(
            x, wqkv, bqkv, wo, bo, mask,
            qkv_fn=lambda a, w, b_: dense_int8(a, wq, ws, b_),
            out_fn=lambda a, w, b_: dense_int8(a, woq, wos, b_))
        ref = layer_norm(x + pre, ls, lb, EPS)
        full = fused_attention_block(
            x, wqkv, bqkv, wo, bo, ls, lb, mask, n_heads=AHEADS,
            eps=EPS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)
    # and it is genuinely quantized
    assert np.max(np.abs(np.asarray(out) - np.asarray(full))) > 1e-3


def test_int8_attn_backward_is_straight_through():
    """Same contract as the FFN variant: gradients as if the forward
    were full precision (the bf16 backward sweep), except the
    LN/residual head which differentiates through the ACTUAL int8
    pre-residual output."""
    x, wqkv, bqkv, wo, bo, ls, lb, mask = _attn_inputs(seed=11)

    def hybrid_oracle(x, wqkv, bqkv, wo, bo, ls, lb):
        wq, ws = quantize_weight(wqkv, axis_in=-2)
        woq, wos = quantize_weight(wo, axis_in=-2)
        out_i8 = _attn_core_fp(
            x, wqkv, bqkv, wo, bo, mask,
            qkv_fn=lambda a, w, b_: dense_int8(a, wq, ws, b_),
            out_fn=lambda a, w, b_: dense_int8(a, woq, wos, b_))
        out_fp = _attn_core_fp(
            x, wqkv, bqkv, wo, bo, mask,
            qkv_fn=lambda a, w, b_: a @ w + b_,
            out_fn=lambda a, w, b_: a @ w + b_)
        out = out_fp + jax.lax.stop_gradient(out_i8 - out_fp)
        return layer_norm(x + out, ls, lb, EPS)

    def loss_kernel(*a):
        return jnp.sum(fused_attention_block_int8_train(
            *a, mask, n_heads=AHEADS, eps=EPS) ** 2)

    def loss_oracle(*a):
        return jnp.sum(hybrid_oracle(*a) ** 2)

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        g_k = jax.grad(loss_kernel, argnums=tuple(range(7)))(
            x, wqkv, bqkv, wo, bo, ls, lb)
        g_o = jax.grad(loss_oracle, argnums=tuple(range(7)))(
            x, wqkv, bqkv, wo, bo, ls, lb)
    names = ("x", "wqkv", "bqkv", "wo", "bo", "ls", "lb")
    for name, a, b in zip(names, g_k, g_o):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3,
            err_msg=f"grad {name}")


def test_int8_attn_bwd_matches_quantized_gradient_oracle():
    """--int8_train_bwd on the attention megakernel: gradients == an
    XLA oracle with int8 dgrads (scale-folded) through Wo and Wqkv, the
    int8 QKV recompute, autodiff f32 attention-middle backward, and the
    exact LN/residual head."""
    from nbest_asr_tpu.ops.quant import dgrad_int8

    x, wqkv, bqkv, wo, bo, ls, lb, mask = _attn_inputs(b=2, s=32,
                                                       seed=21)
    d = AH // AHEADS

    def attn_mid(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        outs = []
        for i in range(AHEADS):
            qi = q[..., i * d:(i + 1) * d]
            ki = k[..., i * d:(i + 1) * d]
            vi = v[..., i * d:(i + 1) * d]
            s_ = jnp.einsum("bqd,bkd->bqk", qi, ki) / float(d) ** 0.5
            s_ = jnp.where(mask[:, None, :] > 0, s_, -0.7 * float(
                np.finfo(np.float32).max))
            mx = jnp.max(s_, axis=-1, keepdims=True)
            p = jnp.exp(s_ - mx)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(jnp.einsum("bqk,bkd->bqd", p, vi))
        return jnp.concatenate(outs, axis=-1)

    def oracle_grads(x, wqkv, bqkv, wo, bo, ls, lb):
        wq, ws = quantize_weight(wqkv, axis_in=-2)
        woq, wos = quantize_weight(wo, axis_in=-2)
        qkv = dense_int8(x, wq, ws, bqkv)
        ctx, attn_vjp = jax.vjp(attn_mid, qkv)
        out = dense_int8(ctx, woq, wos, bo)

        def head(x_, out_, ls_, lb_):
            return jnp.sum(layer_norm(x_ + out_, ls_, lb_, EPS) ** 2)

        dxh, dout, dls, dlb = jax.grad(head, argnums=(0, 1, 2, 3))(
            x, out, ls, lb)
        dbo = jnp.sum(dout, axis=(0, 1))
        dwo = jnp.einsum("bsm,bsk->mk", ctx, dout)
        dctx = dgrad_int8(dout, woq, wos)
        (dqkv,) = attn_vjp(dctx)
        dbqkv = jnp.sum(dqkv, axis=(0, 1))
        dwqkv = jnp.einsum("bsk,bsm->km", x, dqkv)
        dx = dxh + dgrad_int8(dqkv, wq, ws)
        return dx, dwqkv, dbqkv, dwo, dbo, dls, dlb

    def kernel_loss(*a):
        return jnp.sum(fused_attention_block_int8_train(
            *a, mask, n_heads=AHEADS, eps=EPS, int8_bwd=True) ** 2)

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        g_k = jax.grad(kernel_loss, argnums=tuple(range(7)))(
            x, wqkv, bqkv, wo, bo, ls, lb)
        g_o = oracle_grads(x, wqkv, bqkv, wo, bo, ls, lb)
    names = ("x", "wqkv", "bqkv", "wo", "bo", "ls", "lb")
    for name, a, b in zip(names, g_k, g_o):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-2,
            err_msg=f"grad {name}")


def test_int8_attn_bwd_dropout_deterministic_and_close_to_bf16():
    x, wqkv, bqkv, wo, bo, ls, lb, mask = _attn_inputs(b=4, s=48,
                                                       seed=23)
    key = jax.random.PRNGKey(11)
    kw = dict(n_heads=AHEADS, attn_dropout=0.2, hidden_dropout=0.2,
              dropout_rng=key, eps=EPS)

    def loss(int8_bwd):
        return lambda *a: jnp.sum(fused_attention_block_int8_train(
            *a, mask, int8_bwd=int8_bwd, **kw) ** 2)

    with pltpu.force_tpu_interpret_mode(), \
            jax.default_matmul_precision("highest"):
        g1 = jax.grad(loss(True), argnums=tuple(range(7)))(
            x, wqkv, bqkv, wo, bo, ls, lb)
        g2 = jax.grad(loss(True), argnums=tuple(range(7)))(
            x, wqkv, bqkv, wo, bo, ls, lb)
        g_bf = jax.grad(loss(False), argnums=tuple(range(7)))(
            x, wqkv, bqkv, wo, bo, ls, lb)
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    names = ("x", "wqkv", "bqkv", "wo", "bo", "ls", "lb")
    for name, a, b in zip(names, g1, g_bf):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
        assert rel < 0.08, (name, rel)


def test_encoder_routes_int8_train_attn():
    """use_int8_train_attn routes the TRAINING forward through the int8
    attention kernel (close to but measurably off the bf16 path) and
    leaves the deterministic eval forward bit-identical."""
    from nbest_asr_tpu.models.encoder import (EncoderConfig,
                                              encoder_forward,
                                              init_encoder_params)

    cfg_kw = dict(vocab_size=97, hidden_size=128, num_layers=2,
                  num_heads=2, intermediate_size=256, max_position=64,
                  hidden_dropout=0.0, attn_dropout=0.0,
                  use_fused_attn=True)
    cfg_bf = EncoderConfig(**cfg_kw)
    cfg_i8 = EncoderConfig(use_int8_train_attn=True, **cfg_kw)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg_bf)
    rng = np.random.RandomState(5)
    ids = jnp.asarray(rng.randint(0, 97, (2, 24)), jnp.int32)
    mask = jnp.asarray(rng.rand(2, 24) > 0.2, jnp.float32)
    mask = mask.at[:, 0].set(1.0)
    key = jax.random.PRNGKey(1)

    with pltpu.force_tpu_interpret_mode():
        tr_bf = encoder_forward(params, ids, mask, None, cfg_bf,
                                deterministic=False, rng=key)
        tr_i8 = encoder_forward(params, ids, mask, None, cfg_i8,
                                deterministic=False, rng=key)
    d = float(np.max(np.abs(np.asarray(tr_i8, np.float32)
                            - np.asarray(tr_bf, np.float32))))
    assert 1e-6 < d < 0.5, d

    # eval stays on the full-precision XLA path — bit-identical (and a
    # Pallas route here would crash outside the interpret context)
    ev_bf = encoder_forward(params, ids, mask, None, cfg_bf,
                            deterministic=True)
    ev_i8 = encoder_forward(params, ids, mask, None, cfg_i8,
                            deterministic=True)
    np.testing.assert_array_equal(np.asarray(ev_bf), np.asarray(ev_i8))


def test_int8_train_requires_nonstreaming_layout():
    x, w1, b1, w2, b2, ls, lb = _inputs()
    big_w1 = jnp.zeros((H, 3072), jnp.float32)
    big_w2 = jnp.zeros((3072, H), jnp.float32)
    with pytest.raises(ValueError, match="non-streaming"):
        fused_ffn_block_int8_train(x, big_w1, jnp.zeros(3072), big_w2,
                                   b2, ls, lb, eps=EPS)
