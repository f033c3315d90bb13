"""On-chip Pallas kernel validation.

The pytest suite runs kernels in interpret mode on CPU (conftest forces
the CPU platform); real Mosaic lowering has extra constraints (tile
alignment, supported primitives) that interpret mode does not enforce.
This script compiles and checks every kernel against its XLA oracle on
the actual TPU.  Run after touching anything under `nbest_asr_tpu/ops/`.

Usage: python tools/tpu_kernel_check.py
Prints one PASS/FAIL line per kernel and exits nonzero on failure.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.devices()[0].platform == "cpu":
        print("SKIP: no accelerator (kernels need real Mosaic lowering)")
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

    def check(name, got, want, atol):
        diff = float(np.abs(np.asarray(got, np.float32)
                            - np.asarray(want, np.float32)).max())
        ok = diff <= atol
        print(f"{'PASS' if ok else 'FAIL'}  {name}: max diff {diff:.2e} "
              f"(atol {atol:g})")
        if not ok:
            failures.append(name)

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
    sd = 128
    qd = jnp.asarray(rng.randn(2, sd, 2, sd), jnp.float32)
    kd = jnp.asarray(rng.randn(2, sd, 2, sd), jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(sd, dtype=jnp.float32)[None, :, None, :],
                           (2, sd, 2, sd))
    mask_d = jnp.ones((2, sd), jnp.float32)
    rate = 0.3
    drng = jax.random.PRNGKey(7)

    flash_drop = jax.jit(functools.partial(
        flash_attention, dropout_rate=rate, dropout_rng=drng))
    d_mat = flash_drop(qd, kd, eye, mask_d)       # (b, q, h, k) = D
    d1 = flash_drop(qd, kd, eye, mask_d)
    check("flash_dropout determinism", d1, d_mat, 0.0)

    keep_m = jnp.asarray(np.asarray(d_mat) > 0, jnp.float32)
    frac_dropped = 1.0 - float(np.asarray(keep_m).mean())
    ok_frac = abs(frac_dropped - rate) < 0.01
    print(f"{'PASS' if ok_frac else 'FAIL'}  flash_dropout drop fraction: "
          f"{frac_dropped:.4f} (want {rate} ± 0.01)")
    if not ok_frac:
        failures.append("flash_dropout drop fraction")

    def oracle(q_, k_, v_):
        # same math with the extracted constant mask, XLA autodiff
        s_ = jnp.einsum("bqhd,bkhd->bqhk", q_, k_,
                        preferred_element_type=jnp.float32) / (sd ** 0.5)
        p_ = jax.nn.softmax(s_, axis=-1)
        dmat = keep_m * p_ / (1.0 - rate)
        return jnp.einsum("bqhk,bkhd->bqhd", dmat, v_,
                          preferred_element_type=jnp.float32)

    vd = jnp.asarray(rng.randn(2, sd, 2, sd), jnp.float32)
    with jax.default_matmul_precision("highest"):
        want = oracle(qd, kd, vd)
    got = flash_drop(qd, kd, vd, mask_d)
    check("flash_dropout fwd vs masked oracle", got, want, 5e-5)

    def loss_d(fn):
        return lambda q_, k_, v_: jnp.sum(fn(q_, k_, v_) ** 2)

    gd = jax.jit(jax.grad(
        loss_d(lambda q_, k_, v_: flash_drop(q_, k_, v_, mask_d)),
        argnums=(0, 1, 2)))(qd, kd, vd)
    with jax.default_matmul_precision("highest"):
        go = jax.grad(loss_d(oracle), argnums=(0, 1, 2))(qd, kd, vd)
    for a, b_, nm in zip(gd, go, "qkv"):
        check(f"flash_dropout d{nm}", a, b_, 2e-3)

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
        a32 = np.asarray(a, np.float32)
        b32 = np.asarray(b_, np.float32)
        rel = float(np.abs(a32 - b32).max() / max(np.abs(b32).max(), 1e-9))
        ok_g = rel < 0.05
        print(f"{'PASS' if ok_g else 'FAIL'}  fused_ffn {nm} (bf16): "
              f"rel max diff {rel:.2e} (< 0.05)")
        if not ok_g:
            failures.append(f"fused_ffn {nm}")

    # dropout: determinism, key variation, grad finiteness (the exact
    # keep-mask mechanism is oracle-validated in the flash section —
    # same _keep_mask helper)
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
    if not ok_dv:
        failures.append("fused_ffn dropout variation")
    gd_ = jax.jit(jax.grad(floss(
        lambda x_, a_, c_: fused_ffn_block(
            x_, a_, fb1, c_, fb2, fls, flb, dropout_rate=0.3,
            dropout_rng=jax.random.PRNGKey(5)))))(xb, w1b, w2b)
    ok_fin = bool(np.all(np.isfinite(np.asarray(gd_, np.float32))))
    print(f"{'PASS' if ok_fin else 'FAIL'}  fused_ffn dropout grads finite")
    if not ok_fin:
        failures.append("fused_ffn dropout grads")

    print("ALL PASS" if not failures else f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
