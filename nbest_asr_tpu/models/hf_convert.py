"""HuggingFace checkpoint -> nbest_asr_tpu encoder params.

Covers the reference's pretrained-model surface: ``--pre_trained_model``
bert / roberta / xlm-roberta and ``--tod_pre_trained_model`` (arbitrary
BERT-architecture AutoModel checkpoints) — `n_best_asr_bert.py:33-37,
480-487`.  Works from either a live transformers model instance or a raw
state_dict; torch stays an optional, offline-only dependency.

Layout notes:
- torch ``nn.Linear`` stores (out, in); JAX kernels here are (in, out) —
  transposed on conversion.
- q/k/v are fused into one (h, 3h) kernel (see `encoder.py`).
- per-layer tensors are stacked along the leading (num_layers, ...) axis
  for the `lax.scan` encoder body.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .encoder import EncoderConfig


def _np(t) -> np.ndarray:
    # copy=True: torch's .numpy() ALIASES the tensor storage — without the
    # copy, later in-place mutation (or freeing) of the torch model would
    # silently corrupt the converted params
    return np.array(t.detach().cpu().numpy(), dtype=np.float32, copy=True)


def convert_state_dict(sd: Dict, cfg: EncoderConfig,
                       prefix: str = "") -> dict:
    """transformers BERT/RoBERTa/XLM-R state_dict -> encoder param pytree.

    ``prefix`` strips a leading module path (e.g. ``"bert."`` or
    ``"roberta."``) when converting a full downstream checkpoint.
    """
    def g(name):
        key = prefix + name
        if key not in sd:
            raise KeyError(f"missing tensor in checkpoint: {key}")
        return _np(sd[key])

    emb = {
        "word": g("embeddings.word_embeddings.weight"),
        "position": g("embeddings.position_embeddings.weight"),
        "ln_scale": g("embeddings.LayerNorm.weight"),
        "ln_bias": g("embeddings.LayerNorm.bias"),
    }
    tt_key = prefix + "embeddings.token_type_embeddings.weight"
    if tt_key in sd:
        emb["type"] = _np(sd[tt_key])
    else:
        emb["type"] = np.zeros((max(cfg.type_vocab_size, 1),
                                cfg.hidden_size), np.float32)

    L = cfg.num_layers
    stacks: Dict[str, list] = {k: [] for k in (
        "qkv_kernel", "qkv_bias", "attn_out_kernel", "attn_out_bias",
        "attn_ln_scale", "attn_ln_bias", "ffn_in_kernel", "ffn_in_bias",
        "ffn_out_kernel", "ffn_out_bias", "ffn_ln_scale", "ffn_ln_bias")}

    for i in range(L):
        p = f"encoder.layer.{i}."
        q_w = g(p + "attention.self.query.weight").T   # (h, h)
        k_w = g(p + "attention.self.key.weight").T
        v_w = g(p + "attention.self.value.weight").T
        stacks["qkv_kernel"].append(np.concatenate([q_w, k_w, v_w], axis=1))
        stacks["qkv_bias"].append(np.concatenate([
            g(p + "attention.self.query.bias"),
            g(p + "attention.self.key.bias"),
            g(p + "attention.self.value.bias")]))
        stacks["attn_out_kernel"].append(
            g(p + "attention.output.dense.weight").T)
        stacks["attn_out_bias"].append(g(p + "attention.output.dense.bias"))
        stacks["attn_ln_scale"].append(
            g(p + "attention.output.LayerNorm.weight"))
        stacks["attn_ln_bias"].append(
            g(p + "attention.output.LayerNorm.bias"))
        stacks["ffn_in_kernel"].append(g(p + "intermediate.dense.weight").T)
        stacks["ffn_in_bias"].append(g(p + "intermediate.dense.bias"))
        stacks["ffn_out_kernel"].append(g(p + "output.dense.weight").T)
        stacks["ffn_out_bias"].append(g(p + "output.dense.bias"))
        stacks["ffn_ln_scale"].append(g(p + "output.LayerNorm.weight"))
        stacks["ffn_ln_bias"].append(g(p + "output.LayerNorm.bias"))

    layers = {k: np.stack(v, axis=0) for k, v in stacks.items()}
    return {"embeddings": emb, "layers": layers}


def convert_hf_model(model, cfg: EncoderConfig) -> dict:
    """Live transformers model (BertModel/RobertaModel/XLMRobertaModel or an
    AutoModel wrapping one) -> encoder params."""
    sd = model.state_dict()
    # find the encoder prefix: bare models have none, task models nest it
    for prefix in ("", "bert.", "roberta.", "model."):
        if prefix + "embeddings.word_embeddings.weight" in sd:
            return convert_state_dict(sd, cfg, prefix)
    raise KeyError("could not locate a BERT-family encoder in checkpoint")


def config_from_hf(hf_config, **overrides) -> EncoderConfig:
    """transformers config -> EncoderConfig (covers bert/roberta/xlm-r)."""
    is_roberta = getattr(hf_config, "model_type", "bert") in (
        "roberta", "xlm-roberta")
    kw = dict(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position=hf_config.max_position_embeddings,
        type_vocab_size=getattr(hf_config, "type_vocab_size", 2),
        layer_norm_eps=getattr(hf_config, "layer_norm_eps", 1e-12),
        position_offset=2 if is_roberta else 0,
        hidden_dropout=getattr(hf_config, "hidden_dropout_prob", 0.1),
        attn_dropout=getattr(hf_config, "attention_probs_dropout_prob", 0.1),
    )
    kw.update(overrides)
    return EncoderConfig(**kw)


def load_pretrained_encoder(name_or_path: str, **overrides):
    """Resolve + convert a local HF checkpoint.  Returns (EncoderConfig,
    params).  Mirrors `n_best_asr_bert.py:480-487` (AutoModel path covers
    ``--tod_pre_trained_model``)."""
    from transformers import AutoConfig, AutoModel

    hf_cfg = AutoConfig.from_pretrained(name_or_path, local_files_only=True)
    cfg = config_from_hf(hf_cfg, **overrides)
    model = AutoModel.from_pretrained(name_or_path, local_files_only=True)
    return cfg, convert_hf_model(model, cfg)
