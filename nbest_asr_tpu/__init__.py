"""nbest_asr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of skit-ai/N-Best-ASR-Transformer.

Built from scratch for TPU: fixed-shape offline data pipeline, jit-compiled
train/eval steps over a `jax.sharding.Mesh`, vectorized hierarchical semantic
tuple classifier, BertAdam-semantics optax optimizer, and Pallas kernels for
the hot ops (flash attention, fused embedding/LayerNorm/bias-GELU).

Reference capability surface: /root/reference (ACL 2021 N-Best ASR
Transformer, single-GPU PyTorch).  This package is a re-design, not a port —
see SURVEY.md for the layer map and the per-component parity citations in the
module docstrings.
"""

__version__ = "0.1.0"

_EXPORTS = {
    "RunOptions": ".config",
    "parse_arguments": ".config",
    "Memory": ".data.vocab",
    "Trainer": ".train.loop",
    "build_model": ".train.loop",
    "Predictor": ".serve",
    "load_predictor": ".serve",
    "EncoderConfig": ".models.encoder",
    "ModelConfig": ".models.model",
}


def __getattr__(name):
    # lazy top-level API (importing the trainer pulls in jax; keep bare
    # `import nbest_asr_tpu` light)
    if name in _EXPORTS:
        import importlib

        mod = importlib.import_module(_EXPORTS[name], __name__)
        return getattr(mod, name)
    raise AttributeError(name)
