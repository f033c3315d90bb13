"""On-chip Pallas kernel validation.

The pytest suite runs kernels in interpret mode on CPU (conftest forces
the CPU platform); real Mosaic lowering has extra constraints (tile
alignment, supported primitives) that interpret mode does not enforce.
This script compiles and checks every kernel against its XLA oracle on
the actual TPU.  Run after touching anything under `nbest_asr_tpu/ops/`.

Usage: python tools/tpu_kernel_check.py [--record [PATH]]
Prints one PASS/FAIL line per kernel and exits nonzero on failure.
`--record` additionally writes a machine-readable TPUCHECK.json
(per-check name/ok/measured value + overall verdict) so each round
ships proof the kernels still pass on real hardware.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

RESULTS: list = []


def main(record_path: "str | None" = None) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.time()
    if jax.devices()[0].platform == "cpu":
        print("SKIP: no accelerator (kernels need real Mosaic lowering)")
        if record_path:
            with open(record_path, "w") as f:
                json.dump({"skipped": True, "reason": "no accelerator"},
                          f, indent=1)
        return 0

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    from nbest_asr_tpu.ops.attention import multi_head_attention
    from nbest_asr_tpu.ops.flash_attention import flash_attention
    from nbest_asr_tpu.ops.fused_embed import _xla_embed, fused_embed_lookup
    from nbest_asr_tpu.ops.fused_gelu import fused_bias_gelu
    from nbest_asr_tpu.ops.fused_ln import fused_residual_layer_norm
    from nbest_asr_tpu.ops.layers import gelu, layer_norm

    rng = np.random.RandomState(0)
    failures = []

    def record(name, ok, value):
        RESULTS.append({"name": name, "ok": bool(ok),
                        "value": float(value)})
        if not ok:
            failures.append(name)

    def check(name, got, want, atol):
        diff = float(np.abs(np.asarray(got, np.float32)
                            - np.asarray(want, np.float32)).max())
        ok = diff <= atol
        print(f"{'PASS' if ok else 'FAIL'}  {name}: max diff {diff:.2e} "
              f"(atol {atol:g})")
        record(name, ok, diff)

    def check_rel(name, got, want, rtol):
        a32 = np.asarray(got, np.float32)
        b32 = np.asarray(want, np.float32)
        rel = float(np.abs(a32 - b32).max()
                    / max(np.abs(b32).max(), 1e-9))
        ok = rel < rtol
        print(f"{'PASS' if ok else 'FAIL'}  {name}: rel max diff "
              f"{rel:.2e} (< {rtol:g})")
        record(name, ok, rel)

    # ---- flash attention (fwd + grads) -------------------------------- #
    b, s, h, d = 4, 256, 4, 64
    q = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    lens = rng.randint(s // 4, s + 1, (b,))
    mask = jnp.asarray((np.arange(s)[None] < lens[:, None])
                       .astype(np.float32))
    out = jax.jit(flash_attention)(q, k, v, mask)
    with jax.default_matmul_precision("highest"):
        ref = multi_head_attention(q, k, v, mask)
    m = np.asarray(mask).astype(bool)
    check("flash_attention fwd (single-block)", np.asarray(out)[m],
          np.asarray(ref)[m], 5e-5)
    out_t = jax.jit(functools.partial(flash_attention, block_q=128,
                                      block_k=128))(q, k, v, mask)
    check("flash_attention fwd (tiled)", np.asarray(out_t)[m],
          np.asarray(ref)[m], 5e-5)

    def loss_f(fn):
        return lambda q, k, v: jnp.sum(
            fn(q, k, v, mask) ** 2 * mask[:, :, None, None])

    gf = jax.jit(jax.grad(loss_f(flash_attention), argnums=(0, 1, 2)))(
        q, k, v)
    with jax.default_matmul_precision("highest"):
        gr = jax.grad(loss_f(multi_head_attention), argnums=(0, 1, 2))(
            q, k, v)
    for a, b_, nm in zip(gf, gr, "qkv"):
        check(f"flash_attention d{nm}", a, b_, 2e-3)

    # ---- flash attention in-kernel dropout ----------------------------- #
    # With v = eye(s) and d == s the flash output IS the dropped
    # normalized prob matrix D = (M/keep) ⊙ softmax(qk^T*scale): extract
    # the exact on-chip keep-mask M, then build an XLA oracle with the
    # same constant mask — forward and all three gradients must match.
    # Run twice: the default routing (single-block kernel at s=128) and
    # the TILED kernels (explicit block_q/block_k), whose dropout
    # fwd/dq/dkv paths use a different tile-id scheme.
    def flash_dropout_oracle_suite(tag, sd, block_kw):
        qd = jnp.asarray(rng.randn(2, sd, 2, sd), jnp.float32)
        kd = jnp.asarray(rng.randn(2, sd, 2, sd), jnp.float32)
        eye = jnp.broadcast_to(
            jnp.eye(sd, dtype=jnp.float32)[None, :, None, :],
            (2, sd, 2, sd))
        mask_d = jnp.ones((2, sd), jnp.float32)
        rate = 0.3
        drng = jax.random.PRNGKey(7)

        flash_drop = jax.jit(functools.partial(
            flash_attention, dropout_rate=rate, dropout_rng=drng,
            **block_kw))
        d_mat = flash_drop(qd, kd, eye, mask_d)   # (b, q, h, k) = D
        d1 = flash_drop(qd, kd, eye, mask_d)
        check(f"flash_dropout{tag} determinism", d1, d_mat, 0.0)

        keep_m = jnp.asarray(np.asarray(d_mat) > 0, jnp.float32)
        frac_dropped = 1.0 - float(np.asarray(keep_m).mean())
        ok_frac = abs(frac_dropped - rate) < 0.01
        print(f"{'PASS' if ok_frac else 'FAIL'}  flash_dropout{tag} "
              f"drop fraction: {frac_dropped:.4f} (want {rate} ± 0.01)")
        record(f"flash_dropout{tag} drop fraction", ok_frac,
               frac_dropped)

        def oracle(q_, k_, v_):
            # same math with the extracted constant mask, XLA autodiff
            s_ = jnp.einsum("bqhd,bkhd->bqhk", q_, k_,
                            preferred_element_type=jnp.float32) \
                / (sd ** 0.5)
            p_ = jax.nn.softmax(s_, axis=-1)
            dmat = keep_m * p_ / (1.0 - rate)
            return jnp.einsum("bqhk,bkhd->bqhd", dmat, v_,
                              preferred_element_type=jnp.float32)

        vd = jnp.asarray(rng.randn(2, sd, 2, sd), jnp.float32)
        with jax.default_matmul_precision("highest"):
            want = oracle(qd, kd, vd)
        got = flash_drop(qd, kd, vd, mask_d)
        check(f"flash_dropout{tag} fwd vs masked oracle", got, want,
              5e-5)

        def loss_d(fn):
            return lambda q_, k_, v_: jnp.sum(fn(q_, k_, v_) ** 2)

        gd = jax.jit(jax.grad(
            loss_d(lambda q_, k_, v_: flash_drop(q_, k_, v_, mask_d)),
            argnums=(0, 1, 2)))(qd, kd, vd)
        with jax.default_matmul_precision("highest"):
            go = jax.grad(loss_d(oracle), argnums=(0, 1, 2))(qd, kd, vd)
        for a, b_, nm in zip(gd, go, "qkv"):
            check(f"flash_dropout{tag} d{nm}", a, b_, 2e-3)

    flash_dropout_oracle_suite("", 128, {})
    flash_dropout_oracle_suite(" (tiled)", 256,
                               {"block_q": 128, "block_k": 128})

    # ---- fused residual LN -------------------------------------------- #
    x = jnp.asarray(rng.randn(2048, 768), jnp.float32)
    r = jnp.asarray(rng.randn(2048, 768), jnp.float32)
    sc = jnp.asarray(rng.rand(768) + 0.5, jnp.float32)
    bi = jnp.asarray(rng.randn(768), jnp.float32)
    y = jax.jit(fused_residual_layer_norm)(x, r, sc, bi)
    check("fused_ln fwd", y, layer_norm(x + r, sc, bi), 1e-4)
    g1 = jax.jit(jax.grad(
        lambda a: jnp.sum(fused_residual_layer_norm(a, r, sc, bi) ** 2)))(x)
    g2 = jax.grad(lambda a: jnp.sum(layer_norm(a + r, sc, bi) ** 2))(x)
    check("fused_ln dx", g1, g2, 2e-3)

    # ---- fused bias GELU ----------------------------------------------- #
    xg = jnp.asarray(rng.randn(2048, 3072), jnp.float32)
    bg = jnp.asarray(rng.randn(3072), jnp.float32)
    yg = jax.jit(fused_bias_gelu)(xg, bg)
    check("fused_gelu fwd", yg, gelu(xg + bg), 1e-4)
    gg1 = jax.jit(jax.grad(lambda a: jnp.sum(fused_bias_gelu(a, bg) ** 2)))(
        xg)
    gg2 = jax.grad(lambda a: jnp.sum(gelu(a + bg) ** 2))(xg)
    check("fused_gelu dx", gg1, gg2, 2e-3)

    # ---- fused embedding ------------------------------------------------ #
    V, P, T, hh = 30522, 512, 2, 768
    word = jnp.asarray(rng.randn(V, hh).astype(np.float32))
    pos = jnp.asarray(rng.randn(P, hh).astype(np.float32))
    typ = jnp.asarray(rng.randn(T, hh).astype(np.float32))
    esc = jnp.asarray(rng.rand(hh).astype(np.float32) + 0.5)
    ebi = jnp.asarray(rng.randn(hh).astype(np.float32))
    bb, ss = 16, 64
    ids = jnp.asarray(rng.randint(0, V, (bb, ss)), jnp.int32)
    tids = jnp.asarray(rng.randint(0, T, (bb, ss)), jnp.int32)
    posids = jnp.broadcast_to(jnp.arange(ss, dtype=jnp.int32)[None],
                              (bb, ss))
    ye = jax.jit(functools.partial(fused_embed_lookup, seq_len=ss))(
        word, pos, typ, esc, ebi, ids, tids)
    yr = _xla_embed(word, pos, typ, esc, ebi, ids, tids, posids, 1e-12)
    check("fused_embed fwd", ye, yr, 1e-4)

    # ---- fused FFN megakernel ------------------------------------------ #
    from nbest_asr_tpu.ops.fused_ffn import fused_ffn_block

    nf, hf, itf = 512, 768, 3072
    xf = jnp.asarray(rng.randn(nf, hf) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.randn(hf, itf) * 0.05, jnp.float32)
    fb1 = jnp.asarray(rng.randn(itf) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.randn(itf, hf) * 0.05, jnp.float32)
    fb2 = jnp.asarray(rng.randn(hf) * 0.02, jnp.float32)
    fls = jnp.asarray(1.0 + 0.1 * rng.randn(hf), jnp.float32)
    flb = jnp.asarray(0.1 * rng.randn(hf), jnp.float32)

    def ffn_oracle(x_, w1_, fb1_, w2_, fb2_):
        yy = gelu(x_ @ w1_ + fb1_)
        return layer_norm(x_ + (yy @ w2_ + fb2_), fls, flb)

    with jax.default_matmul_precision("highest"):
        want_f = ffn_oracle(xf, w1, fb1, w2, fb2)
    got_f = jax.jit(functools.partial(fused_ffn_block))(
        xf, w1, fb1, w2, fb2, fls, flb)
    check("fused_ffn fwd", got_f, want_f, 1e-4)

    def floss(fn):
        return lambda *a: jnp.sum(fn(*a).astype(jnp.float32) ** 2)

    # gradients on chip run in the production dtype (bf16) — the f32
    # backward exceeds the 16M scoped-VMEM budget with the
    # double-buffered f32 weight slices (f32 grads are pinned exactly
    # in interpret mode by tests/test_fused_ffn.py); compare against
    # the f32 oracle with norm-relative bf16 tolerances
    xb, w1b, w2b = (a.astype(jnp.bfloat16) for a in (xf, w1, w2))
    gf = jax.jit(jax.grad(
        floss(lambda x_, a_, c_: fused_ffn_block(
            x_, a_, fb1, c_, fb2, fls, flb)),
        argnums=(0, 1, 2)))(xb, w1b, w2b)
    with jax.default_matmul_precision("highest"):
        gr = jax.grad(floss(ffn_oracle), argnums=(0, 1, 3))(
            xf, w1, fb1, w2, fb2)
    for a, b_, nm in zip(gf, gr, ("dx", "dw1", "dw2")):
        check_rel(f"fused_ffn {nm} (bf16)", a, b_, 0.05)

    # dropout: determinism, key variation, grad finiteness
    ffn_drop = jax.jit(functools.partial(
        fused_ffn_block, dropout_rate=0.3))
    d1 = ffn_drop(xf, w1, fb1, w2, fb2, fls, flb,
                  dropout_rng=jax.random.PRNGKey(3))
    d2 = ffn_drop(xf, w1, fb1, w2, fb2, fls, flb,
                  dropout_rng=jax.random.PRNGKey(3))
    d3 = ffn_drop(xf, w1, fb1, w2, fb2, fls, flb,
                  dropout_rng=jax.random.PRNGKey(4))
    check("fused_ffn dropout determinism", d1, d2, 0.0)
    varies = float(np.abs(np.asarray(d1) - np.asarray(d3)).max()) > 1e-3
    changes = float(np.abs(np.asarray(d1) - np.asarray(got_f)).max()) > 1e-3
    ok_dv = varies and changes
    print(f"{'PASS' if ok_dv else 'FAIL'}  fused_ffn dropout varies by "
          f"key and differs from no-drop")
    record("fused_ffn dropout variation", ok_dv, float(varies and changes))
    gd_ = jax.jit(jax.grad(floss(
        lambda x_, a_, c_: fused_ffn_block(
            x_, a_, fb1, c_, fb2, fls, flb, dropout_rate=0.3,
            dropout_rng=jax.random.PRNGKey(5)))))(xb, w1b, w2b)
    ok_fin = bool(np.all(np.isfinite(np.asarray(gd_, np.float32))))
    print(f"{'PASS' if ok_fin else 'FAIL'}  fused_ffn dropout grads finite")
    record("fused_ffn dropout grads finite", ok_fin, float(ok_fin))

    # ---- fused FFN fwd/bwd dropout-mask consistency oracle ------------- #
    # The advisor's round-2 high finding: fwd ran 128-row blocks, bwd
    # 64-row blocks, and the block-keyed mask ids silently decorrelated
    # the fwd/bwd dropout masks.  This oracle would have caught it:
    # 1) extract the BACKWARD's regenerated masks from `_bwd_call`'s raw
    #    tile outputs under degenerate weights (w1=0, b1=c makes
    #    gd = mask1 * gelu(c)/keep; random dy makes dy2 = mask2 * ds),
    # 2) build an XLA oracle from those masks,
    # 3) the kernel's FORWARD output and custom-VJP gradients must match
    #    it — impossible unless the forward draws the same masks.
    # Production dtype bf16 throughout (blocking, and hence mask ids,
    # are dtype-dependent; the f32 backward does not fit on-chip).
    from nbest_asr_tpu.ops.fused_ffn import _bwd_call, _fwd_call
    from nbest_asr_tpu.ops.layers import dense  # noqa: F401 (parity)

    rate_f = 0.3
    key_f = jax.random.PRNGKey(11)
    seed_f = jax.random.bits(key_f, (1,), "uint32").astype(jnp.int32)
    nf2 = 384        # 3 fwd blocks of 128 = 6 bwd blocks of 64
    xfb = jnp.asarray(rng.randn(nf2, hf) * 0.5, jnp.bfloat16)
    zero_w1 = jnp.zeros((hf, itf), jnp.bfloat16)
    const_b1 = jnp.full((itf,), 4.0, jnp.float32)
    zero_w2 = jnp.zeros((itf, hf), jnp.bfloat16)
    ones_ls = jnp.ones((hf,), jnp.float32)
    zeros_h = jnp.zeros((hf,), jnp.float32)

    _, y2d0, mean0, rstd0 = jax.jit(functools.partial(
        _fwd_call, rate=rate_f, eps=1e-12))(
        xfb, zero_w1, const_b1, zero_w2, zeros_h, ones_ls, zeros_h,
        seed_f)
    dy_rand = jnp.asarray(rng.randn(nf2, hf), jnp.bfloat16)
    _, _, gd_t, dy2_t, _ = jax.jit(functools.partial(
        _bwd_call, rate=rate_f))(
        xfb, zero_w1, const_b1, zero_w2, ones_ls, seed_f,
        mean0, rstd0, y2d0, dy_rand)
    mask1 = jnp.asarray(np.asarray(gd_t, np.float32) != 0.0, jnp.float32)
    mask2 = jnp.asarray(np.asarray(dy2_t, np.float32) != 0.0, jnp.float32)
    for nm, mk in (("mask1", mask1), ("mask2", mask2)):
        frac = 1.0 - float(np.asarray(mk).mean())
        ok_fr = abs(frac - rate_f) < 0.01
        print(f"{'PASS' if ok_fr else 'FAIL'}  fused_ffn {nm} drop "
              f"fraction: {frac:.4f} (want {rate_f} ± 0.01)")
        record(f"fused_ffn {nm} drop fraction", ok_fr, frac)

    inv_keep_f = 1.0 / (1.0 - rate_f)

    def ffn_mask_oracle(x_, w1_, w2_):
        # mirrors the kernel's cast points with the extracted masks
        f32 = jnp.float32
        h32 = jnp.dot(x_, w1_, preferred_element_type=f32) + fb1
        h = h32.astype(jnp.bfloat16)
        g32 = gelu(h.astype(f32))
        gdd = (mask1 * g32 * inv_keep_f).astype(jnp.bfloat16)
        y2_32 = jnp.dot(gdd, w2_, preferred_element_type=f32) + fb2
        y2 = y2_32.astype(jnp.bfloat16).astype(f32)
        y2 = mask2 * y2 * inv_keep_f
        return layer_norm(y2 + x_.astype(f32), fls, flb, 1e-12)

    w1r = (jnp.asarray(rng.randn(hf, itf) * 0.05)).astype(jnp.bfloat16)
    w2r = (jnp.asarray(rng.randn(itf, hf) * 0.05)).astype(jnp.bfloat16)
    got_m = jax.jit(lambda x_, a_, c_: fused_ffn_block(
        x_, a_, fb1, c_, fb2, fls, flb, dropout_rate=rate_f,
        dropout_rng=key_f))(xfb, w1r, w2r)
    want_m = ffn_mask_oracle(xfb, w1r, w2r)
    check_rel("fused_ffn dropout fwd vs extracted-mask oracle",
              got_m, want_m, 0.02)

    gm = jax.jit(jax.grad(floss(
        lambda x_, a_, c_: fused_ffn_block(
            x_, a_, fb1, c_, fb2, fls, flb, dropout_rate=rate_f,
            dropout_rng=key_f)), argnums=(0, 1, 2)))(xfb, w1r, w2r)
    go_m = jax.grad(floss(ffn_mask_oracle), argnums=(0, 1, 2))(
        xfb, w1r, w2r)
    for a, b_, nm in zip(gm, go_m, ("dx", "dw1", "dw2")):
        check_rel(f"fused_ffn dropout {nm} vs extracted-mask oracle",
                  a, b_, 0.05)

    # ---- int8-forward training FFN (ops/fused_ffn int8 variant) -------- #
    # fwd == the quantized XLA chain (quant.dense_int8 math); backward ==
    # the hybrid straight-through oracle (LN head through the actual int8
    # y2d, GEMM chain through full-precision weights).  bf16 production
    # dtype.
    from nbest_asr_tpu.ops.fused_ffn import fused_ffn_block_int8_train
    from nbest_asr_tpu.ops.quant import dense_int8, quantize_weight

    def i8_chain(x_, w1_, w2_):
        w1q, w1s = quantize_weight(w1_.astype(jnp.float32), axis_in=-2)
        w2q, w2s = quantize_weight(w2_.astype(jnp.float32), axis_in=-2)
        g = gelu(dense_int8(x_, w1q, w1s, fb1))
        return dense_int8(g, w2q, w2s, fb2)

    def i8_oracle(x_, w1_, w2_):
        y2_i8 = i8_chain(x_, w1_, w2_).astype(jnp.float32)
        y2_fp = (gelu(jnp.dot(x_, w1_, preferred_element_type=jnp.float32)
                      .astype(jnp.bfloat16).astype(jnp.float32) + fb1)
                 .astype(jnp.bfloat16) @ w2_).astype(jnp.float32) + fb2
        y2 = y2_fp + jax.lax.stop_gradient(y2_i8 - y2_fp)
        return layer_norm(y2 + x_.astype(jnp.float32), fls, flb, 1e-12)

    got_i8 = jax.jit(lambda x_, a_, c_: fused_ffn_block_int8_train(
        x_, a_, fb1, c_, fb2, fls, flb))(xb, w1b, w2b)
    with jax.default_matmul_precision("highest"):
        want_i8 = layer_norm(
            i8_chain(xb, w1b, w2b).astype(jnp.float32)
            + xb.astype(jnp.float32), fls, flb, 1e-12)
    check_rel("int8_train fwd vs quantized XLA chain", got_i8, want_i8,
              0.02)
    # genuinely quantized: far from the bf16 block on the same inputs
    bf16_fwd = jax.jit(lambda x_, a_, c_: fused_ffn_block(
        x_, a_, fb1, c_, fb2, fls, flb))(xb, w1b, w2b)
    diff_q = float(np.abs(np.asarray(got_i8, np.float32)
                          - np.asarray(bf16_fwd, np.float32)).max())
    ok_q = diff_q > 1e-3
    print(f"{'PASS' if ok_q else 'FAIL'}  int8_train is quantized "
          f"(differs from bf16 fwd by {diff_q:.2e})")
    record("int8_train is quantized", ok_q, diff_q)

    g_i8 = jax.jit(jax.grad(floss(
        lambda x_, a_, c_: fused_ffn_block_int8_train(
            x_, a_, fb1, c_, fb2, fls, flb)),
        argnums=(0, 1, 2)))(xb, w1b, w2b)
    with jax.default_matmul_precision("highest"):
        g_i8o = jax.grad(floss(i8_oracle), argnums=(0, 1, 2))(
            xb, w1b, w2b)
    for a, b_, nm in zip(g_i8, g_i8o, ("dx", "dw1", "dw2")):
        check_rel(f"int8_train {nm} vs straight-through oracle", a, b_,
                  0.05)

    i8_drop = jax.jit(functools.partial(
        fused_ffn_block_int8_train, dropout_rate=0.3))
    i1 = i8_drop(xb, w1b, fb1, w2b, fb2, fls, flb,
                 dropout_rng=jax.random.PRNGKey(3))
    i2 = i8_drop(xb, w1b, fb1, w2b, fb2, fls, flb,
                 dropout_rng=jax.random.PRNGKey(3))
    check("int8_train dropout determinism", i1, i2, 0.0)

    # ---- int8 BACKWARD variant (--int8_train_bwd) --------------------- #
    # gradients == the XLA quantized-gradient oracle: int8 dgrads with
    # scale folding (quant.dgrad_int8) through both weights, int8
    # forward recompute for h/gd, exact LN/residual head.
    from nbest_asr_tpu.ops.quant import dgrad_int8

    def i8b_oracle_grads(x_, w1_, w2_):
        f32 = jnp.float32
        w1q, w1s = quantize_weight(w1_.astype(f32), axis_in=-2)
        w2q, w2s = quantize_weight(w2_.astype(f32), axis_in=-2)
        h_ = dense_int8(x_, w1q, w1s, fb1)
        gd_ = gelu(h_)
        y2_ = dense_int8(gd_, w2q, w2s, fb2)

        def head(x2_, y22_):
            return jnp.sum(layer_norm(
                x2_.astype(f32) + y22_.astype(f32), fls, flb,
                1e-12) ** 2)

        dxh, dy2 = jax.grad(head, argnums=(0, 1))(x_, y2_)
        dgd = dgrad_int8(dy2, w2q, w2s)
        # FFN-block tensors are 2D (rows, features) — n is the
        # flattened batch*seq axis
        dw2_ = jnp.einsum("nm,nk->mk", gd_.astype(f32),
                          dy2.astype(f32))

        def gelu_path(h2_):
            return jnp.sum(gelu(h2_) * jax.lax.stop_gradient(dgd))

        dh = jax.grad(gelu_path)(h_.astype(f32))
        dw1_ = jnp.einsum("nk,nm->km", x_.astype(f32), dh)
        dx_ = dxh.astype(f32) + dgrad_int8(dh, w1q, w1s)
        return dx_, dw1_, dw2_

    g_i8b = jax.jit(jax.grad(floss(
        lambda x_, a_, c_: fused_ffn_block_int8_train(
            x_, a_, fb1, c_, fb2, fls, flb, int8_bwd=True)),
        argnums=(0, 1, 2)))(xb, w1b, w2b)
    with jax.default_matmul_precision("highest"):
        g_i8bo = jax.jit(i8b_oracle_grads)(xb, w1b, w2b)
    for a, b_, nm in zip(g_i8b, g_i8bo, ("dx", "dw1", "dw2")):
        check_rel(f"int8_train_bwd {nm} vs quantized-gradient oracle",
                  a, b_, 0.05)

    i8b_drop = jax.jit(lambda k_: jax.grad(floss(
        lambda x_, a_, c_: fused_ffn_block_int8_train(
            x_, a_, fb1, c_, fb2, fls, flb, dropout_rate=0.3,
            dropout_rng=k_, int8_bwd=True)))(xb, w1b, w2b))
    ib1 = i8b_drop(jax.random.PRNGKey(5))
    ib2 = i8b_drop(jax.random.PRNGKey(5))
    check("int8_train_bwd dropout-grad determinism", ib1, ib2, 0.0)

    # ---- fused attention-block megakernel ------------------------------ #
    # Part 1: no-dropout numerics at the asymmetric-padding shape
    # (s=96 -> q rows 96, kv lanes 128) vs the XLA oracle.
    from nbest_asr_tpu.ops.attention import multi_head_attention
    from nbest_asr_tpu.ops.fused_attention import (
        _fab_bwd_call, _fab_fwd_call, fused_attention_block)

    ha, nha, da = 768, 12, 64
    ba, sa = 4, 96
    xa = jnp.asarray(rng.randn(ba, sa, ha) * 0.5, jnp.float32)
    wqkv = jnp.asarray(rng.randn(ha, 3 * ha) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.randn(3 * ha) * 0.02, jnp.float32)
    wo_a = jnp.asarray(rng.randn(ha, ha) * 0.05, jnp.float32)
    bo_a = jnp.asarray(rng.randn(ha) * 0.02, jnp.float32)
    ls_a = jnp.asarray(1.0 + 0.1 * rng.randn(ha), jnp.float32)
    lb_a = jnp.asarray(0.1 * rng.randn(ha), jnp.float32)
    mk_a = jnp.asarray(rng.rand(ba, sa) > 0.2, jnp.float32)
    mk_a = mk_a.at[:, 0].set(1.0)

    def fab_oracle(x_, wq_, wo_):
        qkv_ = x_ @ wq_ + bqkv
        q_, k_, v_ = jnp.split(qkv_, 3, axis=-1)
        ctx_ = multi_head_attention(
            q_.reshape(ba, sa, nha, da), k_.reshape(ba, sa, nha, da),
            v_.reshape(ba, sa, nha, da), mk_a,
            deterministic=True).reshape(ba, sa, ha)
        return layer_norm((ctx_ @ wo_ + bo_a) + x_, ls_a, lb_a)

    with jax.default_matmul_precision("highest"):
        want_a = fab_oracle(xa, wqkv, wo_a)
    got_a = jax.jit(lambda x_: fused_attention_block(
        x_, wqkv, bqkv, wo_a, bo_a, ls_a, lb_a, mk_a,
        n_heads=nha))(xa)
    check("fused_attn fwd (s=96 asym pad)", got_a, want_a, 1e-4)

    xab = xa.astype(jnp.bfloat16)
    wqb = wqkv.astype(jnp.bfloat16)
    wob = wo_a.astype(jnp.bfloat16)
    ga = jax.jit(jax.grad(
        floss(lambda x_, a_, c_: fused_attention_block(
            x_, a_, bqkv, c_, bo_a, ls_a, lb_a, mk_a, n_heads=nha)),
        argnums=(0, 1, 2)))(xab, wqb, wob)
    with jax.default_matmul_precision("highest"):
        gao = jax.grad(floss(fab_oracle), argnums=(0, 1, 2))(
            xa, wqkv, wo_a)
    for a, b_, nm in zip(ga, gao, ("dx", "dwqkv", "dwo")):
        check_rel(f"fused_attn {nm} (bf16)", a, b_, 0.05)

    # Part 2: fwd/bwd dropout-mask consistency oracle (the same recipe
    # as the fused-FFN check).  Degenerate weights make the BACKWARD's
    # emitted tiles reveal the regenerated masks directly:
    #   Wq = Wk = 0  -> uniform probs 1/s, so the emitted ctx tile is
    #   p_dropped @ v; with Wv mapping x's first 64 columns and x = I64
    #   per element, v = I -> ctx[e, :, i*d:(i+1)*d] = p_dropped, whose
    #   zero pattern IS the attention keep-mask of (elem, head);
    #   the emitted dout tile is hid_mask * ds with ds from a random dy.
    # An XLA oracle built from those masks must then match the kernel's
    # FORWARD and custom-VJP gradients with real random weights —
    # impossible unless forward and backward draw identical masks.
    rate_a = 0.3
    key_a = jax.random.PRNGKey(13)
    seed_a = jax.random.bits(key_a, (1,), "uint32").astype(jnp.int32)
    sa2, block_b2 = 64, 2
    b_pad2 = 4
    eye_x = jnp.zeros((b_pad2, sa2, ha), jnp.bfloat16)
    eye_x = eye_x.at[:, :, :sa2].set(jnp.eye(sa2, dtype=jnp.bfloat16))
    x2_eye = eye_x.reshape(b_pad2 * sa2, ha)
    wq_deg = jnp.zeros((ha, 3 * ha), jnp.bfloat16)
    wv_eye = jnp.zeros((ha, da), jnp.bfloat16).at[:da, :].set(
        jnp.eye(da, dtype=jnp.bfloat16))
    for i_ in range(nha):
        wq_deg = wq_deg.at[:, 2 * ha + i_ * da:2 * ha + (i_ + 1) * da
                           ].set(wv_eye)
    zeros_3h = jnp.zeros((3 * ha,), jnp.float32)
    ones_h = jnp.ones((ha,), jnp.float32)
    zeros_ha = jnp.zeros((ha,), jnp.float32)
    mask_full = jnp.ones((b_pad2, sa2), jnp.float32)[:, None, :]

    wo_eye = jnp.eye(ha, dtype=jnp.bfloat16)
    # Run F1 (fwd, both dropouts): with wo=I the saved od tile is
    # hid_mask ⊙ ctx/keep and ctx[r, i*d+c] = p_dropped[r, c] (uniform
    # probs, v=I), so od's zero pattern is the COMBINED attn∧hid mask.
    yC, odC, mean_a, rstd_a = jax.jit(functools.partial(
        _fab_fwd_call, n_heads=nha, attn_rate=rate_a, hid_rate=rate_a,
        eps=1e-12, block_b=block_b2, s_p=sa2))(
        x2_eye, wq_deg, zeros_3h, wo_eye,
        zeros_ha, ones_h, zeros_ha, mask_full, seed_a)
    # Run F2 (fwd, hid only): od = hid_mask ⊙ (1/s)/keep everywhere —
    # deterministic nonzero values, so the extraction cannot be fooled
    # by coincidental bf16 cancellation (extracting from the backward's
    # dout = hid_mask ⊙ ds was: a random-dy ds entry rounding to bf16
    # zero flips a bit ~1 in 2e5 and fails the fwd oracle at one entry)
    _, odH, _, _ = jax.jit(functools.partial(
        _fab_fwd_call, n_heads=nha, attn_rate=0.0, hid_rate=rate_a,
        eps=1e-12, block_b=block_b2, s_p=sa2))(
        x2_eye, wq_deg, zeros_3h, wo_eye,
        zeros_ha, ones_h, zeros_ha, mask_full, seed_a)
    # Run B (bwd, both): the emitted ctx tile is p_dropped per head —
    # the BACKWARD's regenerated attention masks, exact 0.0223 values.
    dy_a = jnp.asarray(rng.randn(b_pad2 * sa2, ha), jnp.bfloat16)
    _, _, ctx_t, dout_t, _ = jax.jit(functools.partial(
        _fab_bwd_call, n_heads=nha, attn_rate=rate_a, hid_rate=rate_a,
        block_b=block_b2, s_p=sa2))(
        x2_eye, wq_deg, zeros_3h, wo_eye,
        ones_h, mask_full, seed_a, mean_a, rstd_a, odC, dy_a)

    ctx_np = np.asarray(ctx_t, np.float32).reshape(b_pad2, sa2, ha)
    attn_keep = np.stack(
        [np.stack([ctx_np[e, :, i_ * da:(i_ + 1) * da] != 0.0
                   for i_ in range(nha)]) for e in range(b_pad2)])
    hid_keep = (np.asarray(odH, np.float32) != 0.0).reshape(
        b_pad2, sa2, ha)
    fr_a = 1.0 - float(attn_keep.mean())
    fr_h = 1.0 - float(hid_keep.mean())
    for nm, fr in (("attn", fr_a), ("hidden", fr_h)):
        ok_fr = abs(fr - rate_a) < 0.01
        print(f"{'PASS' if ok_fr else 'FAIL'}  fused_attn {nm} drop "
              f"fraction: {fr:.4f} (want {rate_a} ± 0.01)")
        record(f"fused_attn {nm} drop fraction", ok_fr, fr)

    # the direct fwd/bwd consistency statement: the FORWARD's combined
    # zero pattern must equal hid(F2-fwd) ∧ attn(B-bwd) elementwise —
    # any fwd/bwd mask decorrelation shows up as a nonzero count here
    attn_flat = np.concatenate(
        [np.concatenate([attn_keep[e, i_] for i_ in range(nha)],
                        axis=1) for e in range(b_pad2)])
    comb_fwd = np.asarray(odC, np.float32) != 0.0
    n_mismatch = int((comb_fwd != (attn_flat
                                   & hid_keep.reshape(-1, ha))).sum())
    ok_cons = n_mismatch == 0
    print(f"{'PASS' if ok_cons else 'FAIL'}  fused_attn fwd/bwd mask "
          f"consistency: {n_mismatch} mismatched bits")
    record("fused_attn fwd/bwd mask consistency", ok_cons, n_mismatch)

    attn_keep_j = jnp.asarray(attn_keep, jnp.float32)  # (b, nh, s, s)
    hid_keep_j = jnp.asarray(hid_keep, jnp.float32)    # (b, s, h)
    inv_a = 1.0 / (1.0 - rate_a)
    xr = jnp.asarray(rng.randn(b_pad2, sa2, ha) * 0.5, jnp.bfloat16)
    wqr = jnp.asarray(rng.randn(ha, 3 * ha) * 0.05, jnp.bfloat16)
    wor = jnp.asarray(rng.randn(ha, ha) * 0.05, jnp.bfloat16)

    def fab_mask_oracle(x_, wq_, wo_):
        f32 = jnp.float32
        bf = jnp.bfloat16
        qkv_ = (jnp.einsum("bsk,km->bsm", x_, wq_,
                           preferred_element_type=f32)
                + bqkv.astype(f32)).astype(bf)
        q_, k_, v_ = jnp.split(qkv_, 3, axis=-1)
        q_ = q_.reshape(b_pad2, sa2, nha, da)
        k_ = k_.reshape(b_pad2, sa2, nha, da)
        v_ = v_.reshape(b_pad2, sa2, nha, da)
        lg = jnp.einsum("bqhd,bkhd->bhqk", q_, k_,
                        preferred_element_type=f32) / (da ** 0.5)
        p_ = jax.nn.softmax(lg, axis=-1)
        p_ = attn_keep_j * p_ * inv_a
        ctx_ = jnp.einsum("bhqk,bkhd->bqhd", p_.astype(bf), v_,
                          preferred_element_type=f32).astype(bf)
        ctx_ = ctx_.reshape(b_pad2, sa2, ha)
        out_ = (jnp.einsum("bsk,km->bsm", ctx_, wo_,
                           preferred_element_type=f32)
                + bo_a.astype(f32)).astype(bf).astype(f32)
        out_ = hid_keep_j * out_ * inv_a
        return layer_norm(out_ + x_.astype(f32), ls_a, lb_a, 1e-12)

    mk_ones = jnp.ones((b_pad2, sa2), jnp.float32)
    got_dm = jax.jit(lambda x_, a_, c_: fused_attention_block(
        x_, a_, bqkv, c_, bo_a, ls_a, lb_a, mk_ones, n_heads=nha,
        attn_dropout=rate_a, hidden_dropout=rate_a,
        dropout_rng=key_a))(xr, wqr, wor)
    want_dm = fab_mask_oracle(xr, wqr, wor)
    check_rel("fused_attn dropout fwd vs extracted-mask oracle",
              got_dm, want_dm, 0.02)

    gm_a = jax.jit(jax.grad(floss(
        lambda x_, a_, c_: fused_attention_block(
            x_, a_, bqkv, c_, bo_a, ls_a, lb_a, mk_ones, n_heads=nha,
            attn_dropout=rate_a, hidden_dropout=rate_a,
            dropout_rng=key_a)), argnums=(0, 1, 2)))(xr, wqr, wor)
    go_a = jax.grad(floss(fab_mask_oracle), argnums=(0, 1, 2))(
        xr, wqr, wor)
    for a, b_, nm in zip(gm_a, go_a, ("dx", "dwqkv", "dwo")):
        check_rel(f"fused_attn dropout {nm} vs extracted-mask oracle",
                  a, b_, 0.05)

    # determinism + key variation through the public API
    fab_drop = jax.jit(lambda k_: fused_attention_block(
        xr, wqr, bqkv, wor, bo_a, ls_a, lb_a, mk_ones, n_heads=nha,
        attn_dropout=rate_a, hidden_dropout=rate_a, dropout_rng=k_))
    da1 = fab_drop(key_a)
    da2 = fab_drop(key_a)
    da3 = fab_drop(jax.random.PRNGKey(14))
    check("fused_attn dropout determinism", da1, da2, 0.0)
    ok_var = float(np.abs(np.asarray(da1, np.float32)
                          - np.asarray(da3, np.float32)).max()) > 1e-3
    print(f"{'PASS' if ok_var else 'FAIL'}  fused_attn dropout varies "
          f"by key")
    record("fused_attn dropout varies by key", ok_var, float(ok_var))

    # ---- int8-forward TRAINING attention megakernel ------------------- #
    # Same contract as the FFN int8-train checks: forward == the
    # quantized XLA chain; gradients == the straight-through hybrid
    # (LN head through the actual int8 out, GEMM/attention chain
    # through full precision); genuinely quantized; dropout
    # deterministic.  bf16 production dtype, reusing the part-1 shapes.
    from nbest_asr_tpu.ops.fused_attention import \
        fused_attention_block_int8_train
    from nbest_asr_tpu.ops.quant import dense_int8 as _di8
    from nbest_asr_tpu.ops.quant import quantize_weight as _qw

    def fab_i8_chain(x_, wq_, wo_):
        wqq_, wqs_ = _qw(wq_.astype(jnp.float32), axis_in=-2)
        woq_, wos_ = _qw(wo_.astype(jnp.float32), axis_in=-2)
        qkv_ = _di8(x_, wqq_, wqs_, bqkv)
        q_, k_, v_ = jnp.split(qkv_, 3, axis=-1)
        ctx_ = multi_head_attention(
            q_.reshape(ba, sa, nha, da), k_.reshape(ba, sa, nha, da),
            v_.reshape(ba, sa, nha, da), mk_a,
            deterministic=True).reshape(ba, sa, ha)
        return _di8(ctx_, woq_, wos_, bo_a)

    def fab_fp_chain(x_, wq_, wo_):
        f32 = jnp.float32
        qkv_ = (jnp.einsum("bsk,km->bsm", x_, wq_,
                           preferred_element_type=f32)
                + bqkv.astype(f32)).astype(x_.dtype)
        q_, k_, v_ = jnp.split(qkv_, 3, axis=-1)
        ctx_ = multi_head_attention(
            q_.reshape(ba, sa, nha, da), k_.reshape(ba, sa, nha, da),
            v_.reshape(ba, sa, nha, da), mk_a,
            deterministic=True).reshape(ba, sa, ha)
        return (jnp.einsum("bsk,km->bsm", ctx_, wo_,
                           preferred_element_type=f32)
                + bo_a.astype(f32)).astype(x_.dtype)

    def fab_i8_oracle(x_, wq_, wo_):
        f32 = jnp.float32
        out_i8 = fab_i8_chain(x_, wq_, wo_).astype(f32)
        out_fp = fab_fp_chain(x_, wq_, wo_).astype(f32)
        out_ = out_fp + jax.lax.stop_gradient(out_i8 - out_fp)
        return layer_norm(out_ + x_.astype(f32), ls_a, lb_a, 1e-12)

    got_ai = jax.jit(lambda x_, a_, c_: fused_attention_block_int8_train(
        x_, a_, bqkv, c_, bo_a, ls_a, lb_a, mk_a, n_heads=nha))(
        xab, wqb, wob)
    with jax.default_matmul_precision("highest"):
        want_ai = layer_norm(
            fab_i8_chain(xab, wqb, wob).astype(jnp.float32)
            + xab.astype(jnp.float32), ls_a, lb_a, 1e-12)
    check_rel("int8_train_attn fwd vs quantized XLA chain", got_ai,
              want_ai, 0.02)
    bf16_afwd = jax.jit(lambda x_, a_, c_: fused_attention_block(
        x_, a_, bqkv, c_, bo_a, ls_a, lb_a, mk_a, n_heads=nha))(
        xab, wqb, wob)
    diff_aq = float(np.abs(np.asarray(got_ai, np.float32)
                           - np.asarray(bf16_afwd, np.float32)).max())
    ok_aq = diff_aq > 1e-3
    print(f"{'PASS' if ok_aq else 'FAIL'}  int8_train_attn is quantized "
          f"(differs from bf16 fwd by {diff_aq:.2e})")
    record("int8_train_attn is quantized", ok_aq, diff_aq)

    g_ai = jax.jit(jax.grad(floss(
        lambda x_, a_, c_: fused_attention_block_int8_train(
            x_, a_, bqkv, c_, bo_a, ls_a, lb_a, mk_a, n_heads=nha)),
        argnums=(0, 1, 2)))(xab, wqb, wob)
    with jax.default_matmul_precision("highest"):
        g_aio = jax.grad(floss(fab_i8_oracle), argnums=(0, 1, 2))(
            xab, wqb, wob)
    for a, b_, nm in zip(g_ai, g_aio, ("dx", "dwqkv", "dwo")):
        check_rel(f"int8_train_attn {nm} vs straight-through oracle",
                  a, b_, 0.05)

    i8a_drop = jax.jit(lambda k_: fused_attention_block_int8_train(
        xab, wqb, bqkv, wob, bo_a, ls_a, lb_a, mk_a, n_heads=nha,
        attn_dropout=rate_a, hidden_dropout=rate_a, dropout_rng=k_))
    ia1 = i8a_drop(key_a)
    ia2 = i8a_drop(key_a)
    check("int8_train_attn dropout determinism", ia1, ia2, 0.0)

    # ---- int8 BACKWARD on the attention megakernel (--int8_train_bwd) - #
    # gradients == the XLA quantized-gradient oracle: int8 dgrads with
    # scale folding through Wo/Wqkv, int8 QKV recompute, autodiff f32
    # attention middle, exact LN/residual head.
    def fab_i8b_oracle_grads(x_, wq_, wo_):
        f32 = jnp.float32
        wqq_, wqs_ = _qw(wq_.astype(f32), axis_in=-2)
        woq_, wos_ = _qw(wo_.astype(f32), axis_in=-2)
        qkv_ = _di8(x_, wqq_, wqs_, bqkv)

        def attn_mid(qkv3):
            q_, k_, v_ = jnp.split(qkv3, 3, axis=-1)
            return multi_head_attention(
                q_.reshape(ba, sa, nha, da), k_.reshape(ba, sa, nha, da),
                v_.reshape(ba, sa, nha, da), mk_a,
                deterministic=True).reshape(ba, sa, ha)

        ctx_, attn_vjp = jax.vjp(attn_mid, qkv_.astype(f32))
        out_ = _di8(ctx_, woq_, wos_, bo_a)

        def head(x2_, o_):
            return jnp.sum(layer_norm(
                x2_.astype(f32) + o_.astype(f32), ls_a, lb_a,
                1e-12) ** 2)

        dxh, dout = jax.grad(head, argnums=(0, 1))(x_, out_)
        dwo_ = jnp.einsum("bsm,bsk->mk", ctx_.astype(f32),
                          dout.astype(f32))
        dctx = dgrad_int8(dout, woq_, wos_)
        (dqkv,) = attn_vjp(dctx)
        dwq_ = jnp.einsum("bsk,bsm->km", x_.astype(f32), dqkv)
        dx_ = dxh.astype(f32) + dgrad_int8(dqkv, wqq_, wqs_)
        return dx_, dwq_, dwo_

    g_aib = jax.jit(jax.grad(floss(
        lambda x_, a_, c_: fused_attention_block_int8_train(
            x_, a_, bqkv, c_, bo_a, ls_a, lb_a, mk_a, n_heads=nha,
            int8_bwd=True)), argnums=(0, 1, 2)))(xab, wqb, wob)
    with jax.default_matmul_precision("highest"):
        g_aibo = jax.jit(fab_i8b_oracle_grads)(xab, wqb, wob)
    for a, b_, nm in zip(g_aib, g_aibo, ("dx", "dwqkv", "dwo")):
        check_rel(f"int8_train_bwd attn {nm} vs quantized-grad oracle",
                  a, b_, 0.05)

    # ---- int8 serving megakernels (vs the XLA dense_int8 oracle) ----- #
    from nbest_asr_tpu.ops.int8_serving import (int8_attention_block,
                                                int8_ffn_block)
    from nbest_asr_tpu.ops.layers import dense as _dense  # noqa: F401
    from nbest_asr_tpu.ops.quant import dense_int8, quantize_weight

    hq, iq, nhq = 768, 3072, 12
    bq, sq = 8, 96
    xi = jnp.asarray(rng.randn(bq, sq, hq) * 0.5, jnp.bfloat16)
    mk_i = jnp.asarray((np.arange(sq)[None]
                        < rng.randint(sq // 2, sq + 1, (bq,))[:, None])
                       .astype(np.float32))
    w1q, w1s = quantize_weight(jnp.asarray(rng.randn(hq, iq) * 0.05,
                                           jnp.float32))
    w2q, w2s = quantize_weight(jnp.asarray(rng.randn(iq, hq) * 0.05,
                                           jnp.float32))
    wqq, wqs = quantize_weight(jnp.asarray(rng.randn(hq, 3 * hq) * 0.05,
                                           jnp.float32))
    woq, wos = quantize_weight(jnp.asarray(rng.randn(hq, hq) * 0.05,
                                           jnp.float32))
    b1q = jnp.asarray(rng.randn(iq) * 0.1, jnp.float32)
    b2q = jnp.asarray(rng.randn(hq) * 0.1, jnp.float32)
    bqk = jnp.asarray(rng.randn(3 * hq) * 0.1, jnp.float32)
    boq = jnp.asarray(rng.randn(hq) * 0.1, jnp.float32)
    lsq = jnp.asarray(1.0 + 0.1 * rng.randn(hq), jnp.float32)
    lbq = jnp.asarray(0.1 * rng.randn(hq), jnp.float32)

    got_f = jax.jit(lambda x_: int8_ffn_block(
        x_, w1q, w1s, b1q, w2q, w2s, b2q, lsq, lbq))(xi)

    def i8_ffn_oracle(x_):
        hh = dense_int8(x_, w1q, w1s, b1q)
        gg = gelu(hh)
        y2 = dense_int8(gg, w2q, w2s, b2q)
        return layer_norm(x_ + y2, lsq, lbq)

    want_f = jax.jit(i8_ffn_oracle)(xi)
    check_rel("int8_ffn_block vs dense_int8 oracle", got_f, want_f,
              0.02)

    got_a = jax.jit(lambda x_: int8_attention_block(
        x_, wqq, wqs, bqk, woq, wos, boq, lsq, lbq, mk_i,
        n_heads=nhq))(xi)

    def i8_attn_oracle(x_):
        qkv = dense_int8(x_, wqq, wqs, bqk)
        dh = hq // nhq
        q_, k_, v_ = jnp.split(qkv, 3, axis=-1)
        q_ = q_.reshape(bq, sq, nhq, dh)
        k_ = k_.reshape(bq, sq, nhq, dh)
        v_ = v_.reshape(bq, sq, nhq, dh)
        ctx = multi_head_attention(q_, k_, v_, mk_i).reshape(bq, sq, hq)
        out_ = dense_int8(ctx, woq, wos, boq)
        return layer_norm(x_ + out_, lsq, lbq)

    want_a = jax.jit(i8_attn_oracle)(xi)
    mrows = np.asarray(mk_i).astype(bool)
    check_rel("int8_attention_block vs dense_int8 oracle",
              np.asarray(got_a, np.float32)[mrows],
              np.asarray(want_a, np.float32)[mrows], 0.02)

    # ---- segment-mask (packed-example) attention — on-chip oracles ---- #
    # Round 5's example packing gives every attention mask SEGMENT
    # semantics (a query attends exactly the keys sharing its positive
    # mask value; ops/attention.py multi_head_attention is the
    # definition), so multi-valued masks produce block-diagonal packed
    # attention in all four routed kernels with no extra inputs.
    # Interpret-mode parity is pinned by tests/test_packing.py; these
    # are the REAL-Mosaic oracles (the in-kernel query-segment column is
    # extracted from the lane-vector mask by a broadcasted-iota diagonal
    # gather — exactly the construct interpret mode can't stress).
    bsg, ssg = 4, 256
    seg_np = np.zeros((bsg, ssg), np.float32)
    seg_np[0, : ssg // 3] = 1.0                      # 2 segs + pad tail
    seg_np[0, ssg // 3: 2 * ssg // 3] = 2.0
    seg_np[1, : ssg // 2] = 1.0                      # 1 seg + pad tail
    for j, lo in enumerate(range(0, ssg, ssg // 4)):  # 4 full segs
        seg_np[2, lo: lo + ssg // 4] = float(j + 1)
    seg_np[3, :] = 1.0                               # unpacked row
    seg_m = jnp.asarray(seg_np)
    vsg = seg_np > 0
    qs = jnp.asarray(rng.randn(bsg, ssg, 4, 64), jnp.float32)
    ks = jnp.asarray(rng.randn(bsg, ssg, 4, 64), jnp.float32)
    vs = jnp.asarray(rng.randn(bsg, ssg, 4, 64), jnp.float32)
    out_sg = jax.jit(flash_attention)(qs, ks, vs, seg_m)
    with jax.default_matmul_precision("highest"):
        ref_sg = multi_head_attention(qs, ks, vs, seg_m)
    check("flash_attention segment fwd (single-block)",
          np.asarray(out_sg)[vsg], np.asarray(ref_sg)[vsg], 5e-5)
    out_sgt = jax.jit(functools.partial(
        flash_attention, block_q=128, block_k=128))(qs, ks, vs, seg_m)
    check("flash_attention segment fwd (tiled)",
          np.asarray(out_sgt)[vsg], np.asarray(ref_sg)[vsg], 5e-5)

    vsg_j = jnp.asarray(vsg.astype(np.float32))

    def loss_sg(fn):
        return lambda q_, k_, v_: jnp.sum(
            fn(q_, k_, v_, seg_m) ** 2 * vsg_j[:, :, None, None])

    gsf = jax.jit(jax.grad(loss_sg(flash_attention),
                           argnums=(0, 1, 2)))(qs, ks, vs)
    with jax.default_matmul_precision("highest"):
        gsr = jax.grad(loss_sg(multi_head_attention),
                       argnums=(0, 1, 2))(qs, ks, vs)
    for a, b_, nm in zip(gsf, gsr, "qkv"):
        check(f"flash_attention segment d{nm}", a, b_, 2e-3)

    # fused attention megakernel (training default): fwd + grads on the
    # packed mask, bf16 production dtype vs the f32 XLA oracle
    seg_a_np = np.zeros((ba, sa), np.float32)
    seg_a_np[0, :40] = 1.0
    seg_a_np[0, 40:88] = 2.0
    seg_a_np[1, :50] = 1.0
    for j, lo in enumerate(range(0, sa, sa // 3)):
        seg_a_np[2, lo: lo + sa // 3] = float(j + 1)
    seg_a_np[3, :] = 1.0
    seg_a = jnp.asarray(seg_a_np)
    vsa = jnp.asarray((seg_a_np > 0).astype(np.float32))

    def fab_seg_oracle(x_, wq_, wo_):
        qkv_ = x_ @ wq_ + bqkv
        q_, k_, v_ = jnp.split(qkv_, 3, axis=-1)
        ctx_ = multi_head_attention(
            q_.reshape(ba, sa, nha, da), k_.reshape(ba, sa, nha, da),
            v_.reshape(ba, sa, nha, da), seg_a,
            deterministic=True).reshape(ba, sa, ha)
        return layer_norm((ctx_ @ wo_ + bo_a) + x_, ls_a, lb_a)

    with jax.default_matmul_precision("highest"):
        want_fs = fab_seg_oracle(xa, wqkv, wo_a)
    got_fs = jax.jit(lambda x_: fused_attention_block(
        x_, wqkv, bqkv, wo_a, bo_a, ls_a, lb_a, seg_a,
        n_heads=nha))(xa)
    check("fused_attn segment fwd",
          np.asarray(got_fs)[seg_a_np > 0],
          np.asarray(want_fs)[seg_a_np > 0], 1e-4)

    def floss_sg(fn):
        return lambda *a_: jnp.sum(
            (fn(*a_).astype(jnp.float32) * vsa[:, :, None]) ** 2)

    gfs = jax.jit(jax.grad(
        floss_sg(lambda x_, a_, c_: fused_attention_block(
            x_, a_, bqkv, c_, bo_a, ls_a, lb_a, seg_a, n_heads=nha)),
        argnums=(0, 1, 2)))(xab, wqb, wob)
    with jax.default_matmul_precision("highest"):
        gfso = jax.grad(floss_sg(fab_seg_oracle), argnums=(0, 1, 2))(
            xa, wqkv, wo_a)
    for a, b_, nm in zip(gfs, gfso, ("dx", "dwqkv", "dwo")):
        check_rel(f"fused_attn segment {nm} (bf16)", a, b_, 0.05)

    # int8-forward training attention on the packed mask
    def fab_i8_seg_chain(x_, wq_, wo_):
        wqq_, wqs_ = _qw(wq_.astype(jnp.float32), axis_in=-2)
        woq_, wos_ = _qw(wo_.astype(jnp.float32), axis_in=-2)
        qkv_ = _di8(x_, wqq_, wqs_, bqkv)
        q_, k_, v_ = jnp.split(qkv_, 3, axis=-1)
        ctx_ = multi_head_attention(
            q_.reshape(ba, sa, nha, da), k_.reshape(ba, sa, nha, da),
            v_.reshape(ba, sa, nha, da), seg_a,
            deterministic=True).reshape(ba, sa, ha)
        return _di8(ctx_, woq_, wos_, bo_a)

    got_is = jax.jit(lambda x_, a_, c_: fused_attention_block_int8_train(
        x_, a_, bqkv, c_, bo_a, ls_a, lb_a, seg_a, n_heads=nha))(
        xab, wqb, wob)
    with jax.default_matmul_precision("highest"):
        want_is = layer_norm(
            fab_i8_seg_chain(xab, wqb, wob).astype(jnp.float32)
            + xab.astype(jnp.float32), ls_a, lb_a, 1e-12)
    check_rel("int8_train_attn segment fwd vs quantized chain",
              np.asarray(got_is, np.float32)[seg_a_np > 0],
              np.asarray(want_is, np.float32)[seg_a_np > 0], 0.02)

    # int8 SERVING attention on the packed mask (Predictor batches stay
    # unpacked today, but the kernel contract is mask-semantics-wide)
    seg_i_np = np.zeros((bq, sq), np.float32)
    seg_i_np[:, : sq // 2] = 1.0
    seg_i_np[:, sq // 2: 3 * sq // 4] = 2.0
    seg_i_np[0, 3 * sq // 4:] = 3.0
    seg_i = jnp.asarray(seg_i_np)

    got_si = jax.jit(lambda x_: int8_attention_block(
        x_, wqq, wqs, bqk, woq, wos, boq, lsq, lbq, seg_i,
        n_heads=nhq))(xi)

    def i8_attn_seg_oracle(x_):
        qkv = dense_int8(x_, wqq, wqs, bqk)
        dh = hq // nhq
        q_, k_, v_ = jnp.split(qkv, 3, axis=-1)
        q_ = q_.reshape(bq, sq, nhq, dh)
        k_ = k_.reshape(bq, sq, nhq, dh)
        v_ = v_.reshape(bq, sq, nhq, dh)
        ctx = multi_head_attention(q_, k_, v_, seg_i).reshape(
            bq, sq, hq)
        out_ = dense_int8(ctx, woq, wos, boq)
        return layer_norm(x_ + out_, lsq, lbq)

    want_si = jax.jit(i8_attn_seg_oracle)(xi)
    check_rel("int8_attention_block segment fwd vs dense_int8 oracle",
              np.asarray(got_si, np.float32)[seg_i_np > 0],
              np.asarray(want_si, np.float32)[seg_i_np > 0], 0.02)

    print("ALL PASS" if not failures else f"FAILURES: {failures}")
    if record_path:
        payload = {
            "skipped": False,
            "platform": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
            "elapsed_s": round(time.time() - t0, 1),
            "all_pass": not failures,
            "n_checks": len(RESULTS),
            "failures": failures,
            "checks": RESULTS,
        }
        with open(record_path, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {record_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--record", nargs="?", const="TPUCHECK.json",
                    default=None, metavar="PATH",
                    help="write machine-readable results JSON "
                         "(default TPUCHECK.json)")
    ns = ap.parse_args()
    raise SystemExit(main(ns.record))
