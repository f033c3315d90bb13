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


def export_hf_checkpoint(cfg: EncoderConfig, enc_params: dict,
                         out_dir: str, extra_state: Dict | None = None,
                         pooler_seed: int = 0) -> None:
    """Encoder param pytree -> a local HuggingFace BERT checkpoint dir
    (``config.json`` + ``pytorch_model.bin``), the exact inverse of
    :func:`convert_state_dict`.

    This is how the in-repo MLM pretraining stage (`tools/pretrain_mlm.py`)
    produces an artifact consumable through the reference's
    ``--tod_pre_trained_model`` surface (`n_best_asr_bert.py:480-487`,
    AutoModel path): the fine-tune run then loads it through the SAME
    :func:`load_pretrained_encoder` path as any external checkpoint.

    Weights are saved under the ``bert.`` prefix (BertForMaskedLM-style,
    like real TOD-BERT checkpoints); ``extra_state`` may add head tensors
    (e.g. ``cls.predictions.*``) that AutoModel ignores but that allow
    continued pretraining.  A deterministic seeded pooler is included so
    ``BertModel.from_pretrained`` loads without missing-weight warnings
    (our model never reads it — the reference consumes
    ``sequence_output[:, 0]`` directly, `models/model.py:47`).
    """
    import os

    import torch

    def t(a) -> "torch.Tensor":
        return torch.from_numpy(np.array(a, dtype=np.float32, copy=True))

    emb = enc_params["embeddings"]
    lay = enc_params["layers"]
    h = cfg.hidden_size
    sd: Dict[str, "torch.Tensor"] = {
        "bert.embeddings.word_embeddings.weight": t(emb["word"]),
        "bert.embeddings.position_embeddings.weight": t(emb["position"]),
        "bert.embeddings.token_type_embeddings.weight": t(emb["type"]),
        "bert.embeddings.LayerNorm.weight": t(emb["ln_scale"]),
        "bert.embeddings.LayerNorm.bias": t(emb["ln_bias"]),
    }
    for i in range(cfg.num_layers):
        p = f"bert.encoder.layer.{i}."
        qkv_k = np.asarray(lay["qkv_kernel"][i])       # (h, 3h), (in, out)
        qkv_b = np.asarray(lay["qkv_bias"][i])
        for j, name in enumerate(("query", "key", "value")):
            sd[p + f"attention.self.{name}.weight"] = t(
                qkv_k[:, j * h:(j + 1) * h].T)         # back to (out, in)
            sd[p + f"attention.self.{name}.bias"] = t(
                qkv_b[j * h:(j + 1) * h])
        sd[p + "attention.output.dense.weight"] = t(
            np.asarray(lay["attn_out_kernel"][i]).T)
        sd[p + "attention.output.dense.bias"] = t(lay["attn_out_bias"][i])
        sd[p + "attention.output.LayerNorm.weight"] = t(
            lay["attn_ln_scale"][i])
        sd[p + "attention.output.LayerNorm.bias"] = t(lay["attn_ln_bias"][i])
        sd[p + "intermediate.dense.weight"] = t(
            np.asarray(lay["ffn_in_kernel"][i]).T)
        sd[p + "intermediate.dense.bias"] = t(lay["ffn_in_bias"][i])
        sd[p + "output.dense.weight"] = t(
            np.asarray(lay["ffn_out_kernel"][i]).T)
        sd[p + "output.dense.bias"] = t(lay["ffn_out_bias"][i])
        sd[p + "output.LayerNorm.weight"] = t(lay["ffn_ln_scale"][i])
        sd[p + "output.LayerNorm.bias"] = t(lay["ffn_ln_bias"][i])

    g = torch.Generator().manual_seed(pooler_seed)
    sd["bert.pooler.dense.weight"] = torch.empty(h, h).normal_(
        0.0, cfg.initializer_range, generator=g)
    sd["bert.pooler.dense.bias"] = torch.zeros(h)
    if extra_state:
        sd.update({k: t(v) for k, v in extra_state.items()})

    from transformers import BertConfig

    hf_cfg = BertConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position,
        type_vocab_size=cfg.type_vocab_size,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_dropout_prob=cfg.hidden_dropout,
        attention_probs_dropout_prob=cfg.attn_dropout,
        architectures=["BertForMaskedLM"],
    )
    os.makedirs(out_dir, exist_ok=True)
    hf_cfg.to_json_file(os.path.join(out_dir, "config.json"))
    torch.save(sd, os.path.join(out_dir, "pytorch_model.bin"))


def load_pretrained_encoder(name_or_path: str, **overrides):
    """Resolve + convert a local HF checkpoint.  Returns (EncoderConfig,
    params).  Mirrors `n_best_asr_bert.py:480-487` (AutoModel path covers
    ``--tod_pre_trained_model``)."""
    from transformers import AutoConfig, AutoModel

    hf_cfg = AutoConfig.from_pretrained(name_or_path, local_files_only=True)
    cfg = config_from_hf(hf_cfg, **overrides)
    model = AutoModel.from_pretrained(name_or_path, local_files_only=True)
    return cfg, convert_hf_model(model, cfg)
