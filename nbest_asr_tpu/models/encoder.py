"""BERT-family transformer encoder, TPU-first pure-JAX implementation.

Replaces the reference's external HF BertModel / XLMRobertaModel
(`models/model.py:19, 42-58`; registry `n_best_asr_bert.py:33-37`).  Design
departures from a torch port, all deliberate:

- **Stacked layer parameters + `lax.scan`**: every layer's weights are
  stacked along a leading ``(num_layers, ...)`` axis and the encoder body is
  a single scanned step.  One trace, one compile, uniform sharding specs
  per-layer; no Python loop over modules.
- **Static shapes, real masks**: attention uses an explicit ``(b, s)`` mask
  from the data pipeline; this *fixes* the reference's ``input_ids > 0``
  quirk that mis-masks XLM-R (pad=1, bos=0 — ref `models/model.py:43`,
  SURVEY.md §7 step 2).
- **bf16 compute / f32 params + LayerNorm**: `config.compute_dtype`
  controls activation/matmul precision; LN and softmax stay f32.
- **RoBERTa/XLM-R position offset** (`position_offset=2`) so the HF
  checkpoint converter maps position tables 1:1.

No pooler: the reference consumes ``sequence_output[:, 0]`` directly
(`models/model.py:47`), so the pooler would be dead weight.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import multi_head_attention
from ..ops.layers import dense, dropout, gelu, layer_norm


@dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    hidden_dropout: float = 0.1     # reference --bert_dropout default
    attn_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    position_offset: int = 0        # 2 for roberta/xlm-roberta
    initializer_range: float = 0.02
    compute_dtype: str = "float32"  # "bfloat16" on TPU hot path
    use_flash_attention: bool = False
    flash_min_seq: int = 160        # route training attention to the
    # Pallas kernel at bucketed seq >= this (measured crossover on v5e,
    # ops/attention.py routing table); NBEST_FLASH_MIN_SEQ env var
    # overrides for probing
    # EXPERIMENTAL correctness-tier kernels (validated on-chip by
    # tools/tpu_kernel_check.py, but measured SLOWER than the XLA path
    # in training: fused LN+GELU encoder fwd+bwd 84.1 ms vs 65.3 ms XLA
    # at 128x64/12L on v5e, and grad-of-scan lowering takes ~230 s per
    # shape — see NOTES_r2.md).  Not exposed on the CLI.
    use_fused_ln: bool = False      # Pallas residual+LayerNorm kernel
    use_fused_gelu: bool = False    # Pallas bias+GELU kernel
    use_fused_embedding: bool = False  # Pallas embed+LN lookup kernel
    use_fused_ffn: bool = False     # Pallas FFN megakernel: both GEMMs
    # + bias/GELU/dropout/residual/LN in one kernel each way
    # (ops/fused_ffn.py) — the whole-block fusion the piecewise kernels
    # above could not deliver
    use_fused_attn: bool = False    # Pallas attention-block megakernel:
    # QKV GEMM + per-head attention (softmax/dropout) + out-proj +
    # bias/dropout/residual/LN in one kernel each way
    # (ops/fused_attention.py); training path, seq <= 512
    use_int8_train: bool = False    # int8 FORWARD GEMMs inside the
    # training FFN megakernel (weights re-quantized per step + per-token
    # activation quant, f32 accumulation) with the unchanged bf16
    # backward — the VERDICT-r3 int8-training probe
    # (ops/fused_ffn.fused_ffn_block_int8_train); CLI --int8_train
    use_int8_train_bwd: bool = False   # ALSO run the megakernel
    # backwards' dgrad + recompute GEMMs int8
    # (ops/fused_ffn._bwd_kernel_i8 with use_int8_train;
    # ops/fused_attention._fab_bwd_kernel_i8 with use_int8_train_attn);
    # CLI --int8_train_bwd
    use_int8_train_attn: bool = False  # same recipe for the attention
    # megakernel's QKV + out-proj forward GEMMs
    # (ops/fused_attention.fused_attention_block_int8_train);
    # CLI --int8_train_attn
    use_fused_attn_eval: bool = False  # also route the DETERMINISTIC
    # (eval/serving) bf16 forward through the attention megakernel
    # (dropout rate 0).  Off by default pending measurement: XLA's
    # dropout-free fused attention forward is near peak, so this must
    # *earn* the default the way the int8 serving kernels did
    # (serve_bench --fused_attn_eval probes it)
    remat: bool = False             # jax.checkpoint the layer scan body
    scan_unroll: int = 1            # lax.scan unroll factor for the
    # layer loop.  Measured on v5e at BERT-base: unroll=4 is ~35% SLOWER
    # than the rolled loop (XLA schedules the while better than the
    # unrolled body) — keep 1 unless re-measured on other hardware

    @property
    def head_dim(self) -> int:
        assert self.hidden_size % self.num_heads == 0
        return self.hidden_size // self.num_heads

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)

    @staticmethod
    def bert_base(vocab_size: int = 30522, **kw) -> "EncoderConfig":
        return EncoderConfig(vocab_size=vocab_size, **kw)

    @staticmethod
    def xlmr_base(**kw) -> "EncoderConfig":
        kw.setdefault("type_vocab_size", 1)
        return EncoderConfig(vocab_size=250002, max_position=514,
                             position_offset=2, layer_norm_eps=1e-5, **kw)

    @staticmethod
    def tiny(vocab_size: int, **kw) -> "EncoderConfig":
        """Test-size config (fast CPU compile)."""
        kw.setdefault("hidden_size", 64)
        kw.setdefault("num_layers", 2)
        kw.setdefault("num_heads", 4)
        kw.setdefault("intermediate_size", 128)
        kw.setdefault("max_position", 320)
        return EncoderConfig(vocab_size=vocab_size, **kw)


def init_encoder_params(rng, cfg: EncoderConfig) -> dict:
    """Truncated-normal(initializer_range) like BERT pretraining; biases and
    LN offsets zero, LN scales one.  Params are f32; stacked per layer."""
    h, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers

    def tn(key, shape):
        return (jax.random.truncated_normal(key, -2.0, 2.0, shape,
                                            dtype=jnp.float32)
                * cfg.initializer_range)

    keys = jax.random.split(rng, 8)
    emb = {
        "word": tn(keys[0], (cfg.vocab_size, h)),
        "position": tn(keys[1], (cfg.max_position, h)),
        "type": tn(keys[2], (max(cfg.type_vocab_size, 1), h)),
        "ln_scale": jnp.ones((h,), jnp.float32),
        "ln_bias": jnp.zeros((h,), jnp.float32),
    }

    lk = jax.random.split(keys[3], 6)
    layers = {
        "qkv_kernel": tn(lk[0], (L, h, 3 * h)),
        "qkv_bias": jnp.zeros((L, 3 * h), jnp.float32),
        "attn_out_kernel": tn(lk[1], (L, h, h)),
        "attn_out_bias": jnp.zeros((L, h), jnp.float32),
        "attn_ln_scale": jnp.ones((L, h), jnp.float32),
        "attn_ln_bias": jnp.zeros((L, h), jnp.float32),
        "ffn_in_kernel": tn(lk[2], (L, h, i)),
        "ffn_in_bias": jnp.zeros((L, i), jnp.float32),
        "ffn_out_kernel": tn(lk[3], (L, i, h)),
        "ffn_out_bias": jnp.zeros((L, h), jnp.float32),
        "ffn_ln_scale": jnp.ones((L, h), jnp.float32),
        "ffn_ln_bias": jnp.zeros((L, h), jnp.float32),
    }
    return {"embeddings": emb, "layers": layers}


def _embed(params: dict, input_ids: jnp.ndarray,
           token_type_ids: Optional[jnp.ndarray], cfg: EncoderConfig,
           rng, deterministic: bool,
           position_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """``position_ids`` (b, s) overrides the default iota positions —
    example packing (data/packing.py) restarts them at every packed
    segment so each utterance sees exactly the positions it would see
    unpacked."""
    emb = params["embeddings"]
    b, s = input_ids.shape
    if cfg.use_fused_embedding and position_ids is None:
        from ..ops.fused_embed import fused_embed_lookup

        tt = token_type_ids if (token_type_ids is not None
                                and cfg.type_vocab_size > 0) else \
            jnp.zeros_like(input_ids)
        pos_table = jax.lax.dynamic_slice_in_dim(
            emb["position"], cfg.position_offset, s, axis=0)
        x = fused_embed_lookup(emb["word"], pos_table, emb["type"],
                               emb["ln_scale"], emb["ln_bias"],
                               input_ids, tt, s, cfg.layer_norm_eps)
    else:
        x = emb["word"][input_ids]
        if position_ids is None:
            positions = (jnp.arange(s, dtype=jnp.int32)
                         + cfg.position_offset)
            x = x + emb["position"][positions][None, :, :]
        else:
            x = x + emb["position"][position_ids + cfg.position_offset]
        if token_type_ids is not None and cfg.type_vocab_size > 0:
            x = x + emb["type"][token_type_ids]
        else:
            x = x + emb["type"][0][None, None, :]
        x = layer_norm(x, emb["ln_scale"], emb["ln_bias"],
                       cfg.layer_norm_eps)
    if not deterministic:
        x = dropout(x, cfg.hidden_dropout, jax.random.fold_in(rng, 0xE),
                    deterministic)
    return x.astype(cfg.cdtype)


# VMEM residency budget for the megakernels' grid-constant weights.
# Derived from the detected device generation instead of hardcoding one
# part's VMEM: v5e/v5p/v4 carry ~16 MiB/core, Trillium (v6e) doubled
# VMEM to ~32 MiB.  The budget leaves 4 MiB of head-room for activation
# tiles + scratch (the 12-of-16 ratio validated on-chip on v5e: BERT-base
# fused FFN holds 9.4 MiB of bf16 weights and compiles; bert-large's
# 16.8 MiB FFN pair does not fit next to the tiles there, but DOES fit
# within a 28 MiB v6e budget).  Over-budget shapes route to the XLA path
# instead of failing Mosaic allocation at compile time (the reference
# accepts arbitrary HF BERT checkpoints via --tod_pre_trained_model, so
# large dims are a supported input, ref n_best_asr_bert.py:480-487).
# `NBEST_KERNEL_VMEM_BUDGET` (bytes) overrides for probing/new parts.
_VMEM_BYTES_BY_KIND = (
    ("v6", 32 * 2 ** 20),   # Trillium: doubled VMEM
    ("v5", 16 * 2 ** 20),   # v5e ("TPU v5 lite") and v5p
    ("v4", 16 * 2 ** 20),
    ("v3", 16 * 2 ** 20),
)
_VMEM_DEFAULT = 16 * 2 ** 20
_VMEM_HEADROOM = 4 * 2 ** 20
_vmem_budget_cache: dict = {}


def _budget_for_kind(kind: str) -> int:
    """Budget for a jax `device_kind` string (e.g. "TPU v5 lite")."""
    kind = kind.lower()
    total = next((v for k, v in _VMEM_BYTES_BY_KIND if k in kind),
                 _VMEM_DEFAULT)
    return total - _VMEM_HEADROOM


def kernel_vmem_budget() -> int:
    """Resident-weight byte budget for megakernel routing on the current
    default device (env `NBEST_KERNEL_VMEM_BUDGET` overrides)."""
    import os

    env = os.environ.get("NBEST_KERNEL_VMEM_BUDGET")
    if env:
        return int(env)
    if "budget" not in _vmem_budget_cache:
        try:
            kind = jax.devices()[0].device_kind
        except Exception:
            kind = ""
        _vmem_budget_cache["budget"] = _budget_for_kind(kind)
    return _vmem_budget_cache["budget"]


def _attn_weight_bytes(cfg: "EncoderConfig", quantized: bool) -> int:
    """Resident bytes of wqkv (h,3h) + wo (h,h) in the attention
    megakernels (bf16, or int8 for the quantized serving kernel)."""
    return 4 * cfg.hidden_size * cfg.hidden_size * (1 if quantized else 2)


def _ffn_weight_bytes(cfg: "EncoderConfig", quantized: bool) -> int:
    """Resident bytes of w1 (h,i) + w2 (i,h) in the FFN megakernels."""
    return (2 * cfg.hidden_size * cfg.intermediate_size
            * (1 if quantized else 2))


def encoder_forward(params: dict, input_ids: jnp.ndarray,
                    attn_mask: jnp.ndarray,
                    token_type_ids: Optional[jnp.ndarray],
                    cfg: EncoderConfig, *, deterministic: bool = True,
                    rng=None,
                    position_ids: Optional[jnp.ndarray] = None
                    ) -> jnp.ndarray:
    """Returns the final hidden states (b, s, h) in compute dtype.

    The per-layer body runs under `lax.scan` over the stacked layer params;
    `cfg.remat` wraps it in `jax.checkpoint` to trade recompute for HBM.

    ``attn_mask`` uses SEGMENT semantics everywhere (0 = pad, k >= 1 =
    packed-segment id; plain 1/0 masks keep their old meaning — see
    ops/attention.py).  ``position_ids`` (b, s) optionally overrides the
    iota positions (example packing restarts them per segment).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    x = _embed(params, input_ids, token_type_ids, cfg, rng, deterministic,
               position_ids=position_ids)
    b, s, h = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    cdt = cfg.cdtype

    if cfg.use_fused_ln:
        from ..ops.fused_ln import fused_residual_layer_norm

        def res_ln(delta, residual, scale, bias):
            return fused_residual_layer_norm(delta, residual, scale, bias,
                                             cfg.layer_norm_eps)
    else:
        def res_ln(delta, residual, scale, bias):
            return layer_norm(residual + delta, scale, bias,
                              cfg.layer_norm_eps)

    def qdense(x_, kernel, bias):
        """dense() that also accepts int8-quantized kernel leaves
        ({"q", "scale"} dicts installed by ops.quant for serving)."""
        if isinstance(kernel, dict):
            from ..ops.quant import dense_int8

            return dense_int8(x_, kernel["q"], kernel["scale"], bias)
        return dense(x_, kernel.astype(cdt), bias)

    def layer_step(carry, scanned):
        x, layer_idx = carry
        p = scanned
        lrng = jax.random.fold_in(rng, layer_idx)

        # attention-block megakernel: training path only (deterministic
        # eval has no backward to pay — XLA's fused attention is ~peak
        # there), one-VMEM-block seqs, 128-lane hidden, 64-lane-sliceable
        # heads (always true for the BERT family; tiny test configs fall
        # back to XLA)
        attn_lanes_ok = (cfg.hidden_size % 128 == 0
                         and cfg.head_dim % 64 == 0)
        qkv_quantized = isinstance(p["qkv_kernel"], dict)
        attn_kernel_ok = (cfg.use_fused_attn and attn_lanes_ok
                          and not qkv_quantized
                          and _attn_weight_bytes(cfg, False)
                          <= kernel_vmem_budget()
                          and (not deterministic
                               or cfg.use_fused_attn_eval))
        if attn_kernel_ok:
            from ..ops.fused_attention import FAB_MAX_SEQ
            attn_kernel_ok = s <= FAB_MAX_SEQ
        # int8 serving megakernel: deterministic forward with quantized
        # leaves — quant chains + int8 dots fused on VMEM-resident tiles
        # (ops/int8_serving.py; the XLA dense_int8 path pays two extra
        # HBM passes per GEMM and measured slower than bf16)
        int8_attn_ok = (cfg.use_fused_attn and deterministic
                        and attn_lanes_ok and qkv_quantized
                        and _attn_weight_bytes(cfg, True)
                        <= kernel_vmem_budget())
        if int8_attn_ok:
            from ..ops.int8_serving import I8_MAX_SEQ
            int8_attn_ok = s <= I8_MAX_SEQ
        if int8_attn_ok:
            from ..ops.int8_serving import int8_attention_block

            x = int8_attention_block(
                x, p["qkv_kernel"]["q"], p["qkv_kernel"]["scale"],
                p["qkv_bias"], p["attn_out_kernel"]["q"],
                p["attn_out_kernel"]["scale"], p["attn_out_bias"],
                p["attn_ln_scale"], p["attn_ln_bias"], attn_mask,
                n_heads=nh, eps=cfg.layer_norm_eps)
        elif attn_kernel_ok and cfg.use_int8_train_attn \
                and not deterministic:
            from ..ops.fused_attention import \
                fused_attention_block_int8_train

            x = fused_attention_block_int8_train(
                x, p["qkv_kernel"].astype(cdt), p["qkv_bias"],
                p["attn_out_kernel"].astype(cdt), p["attn_out_bias"],
                p["attn_ln_scale"], p["attn_ln_bias"], attn_mask,
                n_heads=nh,
                attn_dropout=cfg.attn_dropout,
                hidden_dropout=cfg.hidden_dropout,
                dropout_rng=jax.random.fold_in(lrng, 1),
                eps=cfg.layer_norm_eps,
                int8_bwd=cfg.use_int8_train_bwd)
        elif attn_kernel_ok:
            from ..ops.fused_attention import fused_attention_block

            x = fused_attention_block(
                x, p["qkv_kernel"].astype(cdt), p["qkv_bias"],
                p["attn_out_kernel"].astype(cdt), p["attn_out_bias"],
                p["attn_ln_scale"], p["attn_ln_bias"], attn_mask,
                n_heads=nh,
                attn_dropout=0.0 if deterministic else cfg.attn_dropout,
                hidden_dropout=(0.0 if deterministic
                                else cfg.hidden_dropout),
                dropout_rng=jax.random.fold_in(lrng, 1),
                eps=cfg.layer_norm_eps)
        else:
            qkv = qdense(x, p["qkv_kernel"], p["qkv_bias"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, s, nh, hd)
            k = k.reshape(b, s, nh, hd)
            v = v.reshape(b, s, nh, hd)
            ctx = multi_head_attention(
                q, k, v, attn_mask,
                dropout_rate=cfg.attn_dropout,
                dropout_rng=jax.random.fold_in(lrng, 1),
                deterministic=deterministic,
                use_flash=cfg.use_flash_attention,
                flash_min_seq=cfg.flash_min_seq,
            ).reshape(b, s, h)
            ctx = qdense(ctx, p["attn_out_kernel"], p["attn_out_bias"])
            if not deterministic:
                ctx = dropout(ctx, cfg.hidden_dropout,
                              jax.random.fold_in(lrng, 2), deterministic)
            x = res_ln(ctx, x, p["attn_ln_scale"], p["attn_ln_bias"])

        # lane guard: the megakernel needs 128-multiple dims (always true
        # for the BERT family; tiny test configs fall back to XLA)
        ffn_lanes_ok = (cfg.hidden_size % 128 == 0
                        and cfg.intermediate_size % 128 == 0)
        ffn_quantized = isinstance(p["ffn_in_kernel"], dict)
        ffn_kernel_ok = (cfg.use_fused_ffn and ffn_lanes_ok
                         and _ffn_weight_bytes(cfg, ffn_quantized)
                         <= kernel_vmem_budget())
        if ffn_kernel_ok and deterministic and ffn_quantized:
            from ..ops.int8_serving import int8_ffn_block

            x = int8_ffn_block(
                x, p["ffn_in_kernel"]["q"], p["ffn_in_kernel"]["scale"],
                p["ffn_in_bias"], p["ffn_out_kernel"]["q"],
                p["ffn_out_kernel"]["scale"], p["ffn_out_bias"],
                p["ffn_ln_scale"], p["ffn_ln_bias"],
                eps=cfg.layer_norm_eps)
            return (x, layer_idx + 1), None
        if ffn_kernel_ok and not ffn_quantized and cfg.use_int8_train \
                and not deterministic:
            from ..ops.fused_ffn import fused_ffn_block_int8_train

            x = fused_ffn_block_int8_train(
                x, p["ffn_in_kernel"].astype(cdt), p["ffn_in_bias"],
                p["ffn_out_kernel"].astype(cdt), p["ffn_out_bias"],
                p["ffn_ln_scale"], p["ffn_ln_bias"],
                dropout_rate=cfg.hidden_dropout,
                dropout_rng=jax.random.fold_in(lrng, 3),
                eps=cfg.layer_norm_eps,
                int8_bwd=cfg.use_int8_train_bwd)
            return (x, layer_idx + 1), None
        if ffn_kernel_ok and not ffn_quantized:
            from ..ops.fused_ffn import fused_ffn_block

            x = fused_ffn_block(
                x, p["ffn_in_kernel"].astype(cdt), p["ffn_in_bias"],
                p["ffn_out_kernel"].astype(cdt), p["ffn_out_bias"],
                p["ffn_ln_scale"], p["ffn_ln_bias"],
                dropout_rate=0.0 if deterministic else cfg.hidden_dropout,
                dropout_rng=jax.random.fold_in(lrng, 3),
                eps=cfg.layer_norm_eps)
            return (x, layer_idx + 1), None

        if cfg.use_fused_gelu:
            from ..ops.fused_gelu import fused_bias_gelu

            y = jnp.dot(x, p["ffn_in_kernel"].astype(cdt),
                        preferred_element_type=jnp.float32).astype(cdt)
            y = fused_bias_gelu(y, p["ffn_in_bias"])
        else:
            y = qdense(x, p["ffn_in_kernel"], p["ffn_in_bias"])
            y = gelu(y)
        y = qdense(y, p["ffn_out_kernel"], p["ffn_out_bias"])
        if not deterministic:
            y = dropout(y, cfg.hidden_dropout,
                        jax.random.fold_in(lrng, 3), deterministic)
        x = res_ln(y, x, p["ffn_ln_scale"], p["ffn_ln_bias"])
        return (x, layer_idx + 1), None

    step = layer_step
    if cfg.remat:
        step = jax.checkpoint(layer_step, prevent_cse=False)

    (x, _), _ = jax.lax.scan(step, (x, jnp.int32(0)), params["layers"],
                             unroll=cfg.scan_unroll)
    return x


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))
