"""On-chip regression repro: megakernel backward nested in lax.scan.

Round-5 found failure: at the 12-layer reference geometry the trainer
wraps the train step in a grad-accumulation `lax.scan`
(config.n_accum_steps == 4 when n_layers == 12), and nesting the
fused-attention BACKWARD kernel inside that scan body pushed Mosaic's
scoped-VMEM accounting over the compiler's 16 MiB *default* limit at
the seq-240 bucket (16.10 MiB requested vs 16.00 allowed) — even
though the identical kernel shape compiles fine at top level (bench
runs it every round).  The kernels now pass an explicit
`vmem_limit_bytes` (ops/fused_attention.KERNEL_VMEM_LIMIT, 64 MiB —
an allocation ceiling well under the v5e's 128 MiB VMEM; the
weight-residency budget in models/encoder.kernel_vmem_budget still
decides WHAT routes to the megakernels).

Run on the real chip: `python tools/vmem_scan_repro.py` — prints OK.
Before the fix this died in Mosaic with
"Scoped allocation of 16.1M exceeds the scoped vmem limit".
"""
import jax
import jax.numpy as jnp

from nbest_asr_tpu.ops.fused_attention import fused_attention_block


def main():
    print("backend:", jax.default_backend())
    b, s, h, nh = 32, 240, 768, 12
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, b, s, h), jnp.bfloat16)
    wqkv = jax.random.normal(key, (h, 3 * h), jnp.bfloat16) * 0.02
    bqkv = jnp.zeros((3 * h,), jnp.bfloat16)
    wo = jax.random.normal(key, (h, h), jnp.bfloat16) * 0.02
    bo = jnp.zeros((h,), jnp.bfloat16)
    ls = jnp.ones((h,), jnp.float32)
    lb = jnp.zeros((h,), jnp.float32)
    mask = jnp.ones((b, s), jnp.float32)

    def loss(wqkv, wo, xs):
        def body(c, xi):
            y = fused_attention_block(
                xi, wqkv, bqkv, wo, bo, ls, lb, mask, n_heads=nh,
                attn_dropout=0.1, hidden_dropout=0.1,
                dropout_rng=jax.random.PRNGKey(1))
            return c + jnp.sum(y.astype(jnp.float32)), None

        c, _ = jax.lax.scan(body, 0.0, xs)
        return c

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    out = g(wqkv, wo, x)
    jax.block_until_ready(out)
    print("OK grad through 4-step scan at (32,240,768)")


if __name__ == "__main__":
    main()
