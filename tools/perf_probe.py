"""Hot-path micro-benchmarks on the real TPU: step-time decomposition.

Times, at the production configuration (BERT-base 12L/768H, bf16 compute,
micro-batch 64, seq 256):

1. the full jitted train step (fwd+bwd+BertAdam, dual stream),
2. the BertAdam update alone (optimizer HBM traffic),
3. attention XLA vs Pallas flash at the per-bucket shapes.

Each measurement runs N data-dependent iterations inside ONE jitted
`lax.scan`, so executions serialize on-device and the per-dispatch tunnel
latency is amortized — naive loop-and-block timing here overlaps queued
executions and reports impossible numbers.

Usage: python tools/perf_probe.py [--what step,opt,attn] [--batch 64]
One TPU client at a time — don't run while bench/CLI runs.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_scan(body, carry, consts=(), n=20):
    """Seconds per body iteration, measured as (T(2n) - T(n)) / n over two
    scan lengths.  Gotchas this works around on the tunneled backend:
    - ``consts`` MUST carry every big device array the body uses —
      closure-captured arrays are inlined as HLO literals (and blow up the
      remote compile request);
    - the returned value is a REDUCED SCALAR fetched to the host —
      `block_until_ready` on this backend resolves before remote execution
      finishes, so only a data fetch observes completion;
    - the two-length difference cancels the constant dispatch+RTT+fetch
      overhead (~30 ms) that would swamp ms-scale kernels."""
    import jax
    import jax.numpy as jnp

    def make_chain(length):
        @jax.jit
        def chain(carry, consts):
            out, _ = jax.lax.scan(lambda c, _: (body(c, consts), None),
                                  carry, None, length=length)
            # reduce EVERY leaf: any carry component not feeding the
            # fetched scalar is dead code XLA deletes from the loop
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(out))
        return chain

    c1, c2 = make_chain(n), make_chain(2 * n)
    ts = {}
    for tag, chain in (("n", c1), ("2n", c2)):
        float(chain(carry, consts))  # warm/compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(carry, consts))
            best = min(best, time.perf_counter() - t0)
        ts[tag] = best
    return max((ts["2n"] - ts["n"]) / n, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="step,opt,attn")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--flash_dropout", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the layer scan body (step/ablate)")
    ap.add_argument("--fused_attn", action="store_true",
                    help="attention-block megakernel in the step probe")
    ap.add_argument("--fused_ffn", action="store_true",
                    help="Pallas FFN megakernel in the step probe")
    ap.add_argument("--flash_step", action="store_true",
                    help="train-step probe with flash attention enabled")
    ap.add_argument("--dual_stream", action="store_true",
                    help="train-step probe with the transcript stream on "
                    "(--add_l2_loss config); default single-stream")
    ap.add_argument("--int8_train", action="store_true",
                    help="int8 forward GEMMs in the attention + FFN "
                    "megakernels (implies --fused_attn --fused_ffn)")
    ap.add_argument("--int8_train_bwd", action="store_true",
                    help="also the FFN backward's dgrad/recompute GEMMs "
                    "(implies --int8_train)")
    args = ap.parse_args()
    if args.int8_train_bwd:
        args.int8_train = True
    if args.int8_train:
        args.fused_attn = args.fused_ffn = True
    what = set(args.what.split(","))

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nbest_asr_tpu.models.encoder import EncoderConfig
    from nbest_asr_tpu.models.model import ModelConfig, init_model_params
    from nbest_asr_tpu.train.optimizer import OptimizerConfig, make_optimizer

    b, s = args.batch, args.seq
    enc = EncoderConfig(vocab_size=30522, compute_dtype="bfloat16",
                        use_flash_attention=args.flash_step,
                        use_fused_ffn=args.fused_ffn,
                        use_fused_attn=args.fused_attn,
                        use_int8_train=args.int8_train,
                        use_int8_train_attn=args.int8_train,
                        use_int8_train_bwd=args.int8_train_bwd,
                        remat=args.remat)
    cfg = ModelConfig(encoder=enc, n_top=30, n_bottom=161)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = init_model_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params, jax.devices()[0])
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f}M   batch {b} x seq {s}")

    opt_cfg = OptimizerConfig(optim_choice="bertadam", lr=5e-4,
                              bert_lr=3e-5, warmup_proportion=0.1,
                              t_total=1000)
    optimizer = make_optimizer(opt_cfg, params)

    if "opt" in what:
        import optax

        opt_state = jax.jit(optimizer.init)(params)
        grads = jax.tree.map(lambda p: (p * 1e-4).astype(p.dtype), params)

        def body(carry, g):
            p, st = carry
            updates, st = optimizer.update(g, st, p)
            return optax.apply_updates(p, updates), st

        dt = run_scan(body, (params, opt_state), grads, n=20)
        traffic = n_params * 4 * 8  # g,m,v,p reads + m,v,p,u writes (f32)
        print(f"[opt]  BertAdam update+apply: {dt*1e3:.3f} ms   "
              f"(8-pass equivalent BW {traffic/dt/1e9:.0f} GB/s)")

    if "attn" in what:
        from nbest_asr_tpu.ops.attention import multi_head_attention
        from nbest_asr_tpu.ops.flash_attention import flash_attention

        h, d = 12, 64
        kq = jax.random.PRNGKey(1)
        q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
        mask = jnp.ones((b, s), jnp.float32)
        rng = jax.random.PRNGKey(2)
        drop = 0.1 if args.flash_dropout else 0.0

        def attn_impl(fl):
            # call the kernel directly: multi_head_attention's router
            # sends deterministic attention to XLA by design
            if fl:
                return lambda q_, k_, v_, m_: flash_attention(
                    q_, k_, v_, m_, dropout_rate=drop,
                    dropout_rng=rng if drop else None)
            return lambda q_, k_, v_, m_: multi_head_attention(
                q_, k_, v_, m_, dropout_rate=drop, dropout_rng=rng,
                deterministic=drop == 0.0, use_flash=False)

        for tag, flash in (("xla", False), ("flash", True)):
            def fwd_body(qc, consts, fl=flash):
                kk, vv, mm = consts
                out = attn_impl(fl)(qc, kk, vv, mm)
                # sum(out), not out[0]: a single-element probe lets XLA
                # slice the whole computation down to one attention row
                return qc + (jnp.sum(out.astype(jnp.float32))
                             * 1e-30).astype(qc.dtype)

            dt = run_scan(fwd_body, q, (k, v, mask), n=20)
            flops = 4 * b * h * s * s * d  # QK^T + PV
            print(f"[attn fwd{' drop' if drop else ''}] {tag}: "
                  f"{dt*1e3:.3f} ms  ({flops/dt/1e12:.0f} TF/s)")

            def loss(qc, kk, vv, mm, fl=flash):
                return jnp.sum(
                    attn_impl(fl)(qc, kk, vv, mm).astype(jnp.float32))

            def bwd_body(qc, consts, fl=flash):
                kk, vv, mm = consts
                dq = jax.grad(loss)(qc, kk, vv, mm, fl)
                return qc + (jnp.sum(dq.astype(jnp.float32))
                             * 1e-30).astype(qc.dtype)

            dt = run_scan(bwd_body, q, (k, v, mask), n=20)
            print(f"[attn fwd+bwd{' drop' if drop else ''}] {tag}: "
                  f"{dt*1e3:.3f} ms  ({3*flops/dt/1e12:.0f} TF/s)")

    if "step" in what:
        from nbest_asr_tpu.models.heads import hierarchy_device_arrays
        from nbest_asr_tpu.data.vocab import Memory
        from nbest_asr_tpu.parallel.train_step import (TrainState,
                                                       make_train_step)
        from nbest_asr_tpu.train.losses import LossConfig

        mem_path = "/root/reference/dstc2_data/processed_data/raw/memory.pt"
        memory = Memory.from_torch_pt(mem_path)
        hier = hierarchy_device_arrays(memory.arrays())
        rng = np.random.RandomState(0)
        n_rows = 512
        data = {
            "input_ids": jnp.asarray(
                rng.randint(1, 30000, (n_rows, s)), jnp.int32),
            "attn_mask": jnp.ones((n_rows, s), jnp.float32),
            "segment_ids": jnp.zeros((n_rows, s), jnp.int32),
            "trans_input_ids": jnp.asarray(
                rng.randint(1, 30000, (n_rows, s)), jnp.int32),
            "trans_attn_mask": jnp.ones((n_rows, s), jnp.float32),
            "trans_segment_ids": jnp.zeros((n_rows, s), jnp.int32),
            "labels": jnp.asarray(
                (rng.rand(n_rows, 161) < 0.02).astype(np.float32)),
        }
        step_fn = make_train_step(cfg, LossConfig(False), optimizer, hier,
                                  n_accum=1, mesh=None,
                                  dual_stream=args.dual_stream,
                                  donate=False)
        state = TrainState(params=params,
                           opt_state=jax.jit(optimizer.init)(params),
                           step=jnp.zeros([], jnp.int32))
        idx = jnp.asarray(np.arange(b, dtype=np.int32).reshape(1, b))
        key = jax.random.PRNGKey(0)

        def body(st, d):
            new_state, stats = step_fn(st, d, idx, key)
            return new_state

        dt = run_scan(body, state, data, n=10)
        # encoder GEMM FLOPs: 12 layers x (qkv 3h^2 + out h^2 + ffn 8h^2)
        # MACs/token x streams x 3 (fwd + 2x bwd) x 2 (FLOPs/MAC), plus
        # attention einsums 4*s*d MACs/token/layer x same factors
        h_ = 768
        n_streams = 2 if args.dual_stream else 1
        per_tok = 12 * (12 * h_ * h_ + 2 * s * 64 * 12)  # MACs/token
        tokens = b * s
        flops = 2 * 3 * n_streams * per_tok * tokens
        peak = 197e12  # v5e bf16
        print(f"[step] full train step: {dt*1e3:.2f} ms   "
              f"(matmul {flops/dt/1e12:.0f} TF/s, MFU "
              f"{flops/dt/peak*100:.0f}% of v5e bf16 peak)")

    if "ablate" in what:
        # step-time decomposition by differential ablation: the remote
        # profiler is unavailable on this tunneled backend
        # (jax.profiler.start_trace hangs), so each pipeline prefix is
        # timed with the same serialized-scan methodology and the stage
        # costs are the deltas.
        from nbest_asr_tpu.models.heads import hierarchy_device_arrays
        from nbest_asr_tpu.data.vocab import Memory
        from nbest_asr_tpu.models.encoder import encoder_forward
        from nbest_asr_tpu.parallel.train_step import _forward_and_loss
        from nbest_asr_tpu.train.losses import LossConfig

        mem_path = "/root/reference/dstc2_data/processed_data/raw/memory.pt"
        memory = Memory.from_torch_pt(mem_path)
        hier = hierarchy_device_arrays(memory.arrays())
        rng = np.random.RandomState(0)
        micro = {
            "input_ids": jnp.asarray(
                rng.randint(1, 30000, (b, s)), jnp.int32),
            "attn_mask": jnp.ones((b, s), jnp.float32),
            "segment_ids": jnp.zeros((b, s), jnp.int32),
            "trans_input_ids": jnp.asarray(
                rng.randint(1, 30000, (b, s)), jnp.int32),
            "trans_attn_mask": jnp.ones((b, s), jnp.float32),
            "trans_segment_ids": jnp.zeros((b, s), jnp.int32),
            "labels": jnp.asarray(
                (rng.rand(b, 161) < 0.02).astype(np.float32)),
        }
        lcfg = LossConfig(False)
        key = jax.random.PRNGKey(0)

        def loss_of(p, consts):
            mic = consts[0]
            loss, _ = _forward_and_loss(
                p, cfg, lcfg, hier, mic, deterministic=False,
                rng=key, dual_stream=args.dual_stream)
            return loss

        def enc_sum(p, consts, det=False):
            mic = consts[0]
            h_out = encoder_forward(
                p["encoder"], mic["input_ids"], mic["attn_mask"],
                mic["segment_ids"], cfg.encoder, deterministic=det,
                rng=key)
            return jnp.sum(h_out.astype(jnp.float32))

        def enc_sum_det(p, consts):
            return enc_sum(p, consts, det=True)

        def gemm_skeleton(p, consts):
            """The encoder's 4 GEMMs/layer scanned over 12 layers with
            NOTHING else (no LN, attention, dropout, bias): what XLA gets
            on the raw matmul skeleton at this token count."""
            mic = consts[0]
            emb = p["encoder"]["embeddings"]
            x = emb["word"][mic["input_ids"]].astype(jnp.bfloat16)
            x = x.reshape(-1, 768)

            def layer(xc, lw):
                a = jnp.dot(xc, lw["qkv_kernel"].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                bq = a[:, :768].astype(jnp.bfloat16)
                c = jnp.dot(bq, lw["attn_out_kernel"].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                d = jnp.dot(c.astype(jnp.bfloat16),
                            lw["ffn_in_kernel"].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                e = jnp.dot(d.astype(jnp.bfloat16),
                            lw["ffn_out_kernel"].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                return e.astype(jnp.bfloat16), None

            x, _ = jax.lax.scan(layer, x, p["encoder"]["layers"])
            return jnp.sum(x.astype(jnp.float32))

        def emb_sum(p, consts):
            mic = consts[0]
            emb = p["encoder"]["embeddings"]
            x = (emb["word"][mic["input_ids"]]
                 + emb["type"][mic["segment_ids"]])
            return jnp.sum(x.astype(jnp.float32))

        legs = [
            ("enc fwd          ", lambda p, c: enc_sum(p, c), False),
            ("enc fwd+bwd      ", enc_sum, True),
            ("enc fwd DET      ", lambda p, c: enc_sum_det(p, c), False),
            ("enc fwd+bwd DET  ", enc_sum_det, True),
            ("loss fwd         ", lambda p, c: loss_of(p, c), False),
            ("loss fwd+bwd     ", loss_of, True),
            ("embed fwd+bwd    ", emb_sum, True),
            ("gemm-skel fwd    ", lambda p, c: gemm_skeleton(p, c), False),
            ("gemm-skel fwd+bwd", gemm_skeleton, True),
        ]
        for name, fn, grad in legs:
            if grad:
                gfn = jax.grad(lambda p, c: fn(p, c))

                def body(carry, consts, g=gfn):
                    gr = g(carry, consts)
                    # fold grads back into the carry so the scan can't
                    # be collapsed (cheap: one fused axpy over params)
                    return jax.tree.map(
                        lambda x, d: x + 1e-30 * d.astype(x.dtype),
                        carry, gr)
            else:
                def body(carry, consts, f=fn):
                    # perturb every leaf by the (scaled) value to keep
                    # the chain data-dependent; the tree-axpy cost is
                    # identical across legs so deltas stay meaningful
                    val = f(carry, consts).astype(jnp.float32) * 1e-30
                    return jax.tree.map(
                        lambda x: x + val.astype(x.dtype), carry)
            dt = run_scan(body, params, (micro,), n=10)
            print(f"[ablate] {name}: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
