"""MLM pretraining stage (VERDICT r3 next #1) — the objective, the HF
export round-trip, and the tools/pretrain_mlm.py pipeline smoke.

Reference counterpart: the protocol's pretrained-encoder init
(`/root/reference/n_best_asr_bert.py:480-487`); the stage itself is
green-field (the reference downloads checkpoints this mirror lacks).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nbest_asr_tpu.models.encoder import EncoderConfig, init_encoder_params
from nbest_asr_tpu.models.hf_convert import (export_hf_checkpoint,
                                             load_pretrained_encoder)
from nbest_asr_tpu.train.mlm import (MLM_IGNORE, apply_mlm_mask,
                                     init_mlm_head_params,
                                     make_mlm_train_step, mlm_loss)

pytestmark = pytest.mark.slow  # CPU-training / subprocess tier


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = dict(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position=32, type_vocab_size=2,
            hidden_dropout=0.0, attn_dropout=0.0)

MASK_ID = 4


def test_apply_mlm_mask_semantics():
    """Devlin-style 15% / 80-10-10: only maskable positions selected,
    labels carry the ORIGINAL ids exactly on selected positions,
    everything else untouched and labeled MLM_IGNORE."""
    rng = jax.random.PRNGKey(0)
    n, s, vocab = 64, 128, 200
    ids = jax.random.randint(jax.random.PRNGKey(1), (n, s), 10, vocab,
                             dtype=jnp.int32)
    maskable = jnp.asarray(
        np.random.RandomState(2).rand(n, s) > 0.25)  # pads excluded
    masked, labels = apply_mlm_mask(rng, ids, maskable, MASK_ID, vocab,
                                    mask_rate=0.15)
    masked, labels = np.asarray(masked), np.asarray(labels)
    ids_np, maskable_np = np.asarray(ids), np.asarray(maskable)
    sel = labels != MLM_IGNORE

    # selection only within maskable, near the 15% rate
    assert not np.any(sel & ~maskable_np)
    rate = sel.sum() / maskable_np.sum()
    assert 0.12 < rate < 0.18, rate
    # labels are the original ids on selection
    np.testing.assert_array_equal(labels[sel], ids_np[sel])
    # non-selected positions pass through untouched
    np.testing.assert_array_equal(masked[~sel], ids_np[~sel])
    # 80/10/10 split over selected positions (random-id draws can
    # collide with [MASK]/original, so bounds are loose but one-sided)
    frac_mask = (masked[sel] == MASK_ID).mean()
    frac_kept = (masked[sel] == ids_np[sel]).mean()
    assert 0.74 < frac_mask < 0.86, frac_mask
    assert 0.05 < frac_kept < 0.16, frac_kept


def test_mlm_training_learns():
    """A tiny encoder + tied-decoder head trains: loss drops well below
    uniform chance (log V) on a memorizable batch."""
    cfg = EncoderConfig(**TINY)
    k = jax.random.PRNGKey(0)
    params = {"encoder": init_encoder_params(k, cfg),
              "mlm_head": init_mlm_head_params(jax.random.PRNGKey(1), cfg)}
    rng = np.random.RandomState(3)
    batch = {
        "input_ids": jnp.asarray(rng.randint(8, 64, (8, 24)), jnp.int32),
        "attn_mask": jnp.ones((8, 24), jnp.float32),
        "segment_ids": jnp.zeros((8, 24), jnp.int32),
        "maskable": jnp.ones((8, 24), bool),
    }
    import optax

    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    step = make_mlm_train_step(cfg, tx, MASK_ID)
    losses = []
    for i in range(150):
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.PRNGKey(i))
        losses.append(float(loss))
    # starts at uniform chance (log V ~ 4.16), learns well below it
    # (masks regenerate every step, so this is generalization within
    # the batch, not single-mask memorization)
    chance = float(np.log(TINY["vocab_size"]))
    assert losses[0] > 0.8 * chance, losses[0]
    assert np.mean(losses[-5:]) < 0.65 * chance, losses[-5:]
    # the loss itself is the masked-mean CE (sanity on the direct call)
    l0, n0 = mlm_loss(params, batch["input_ids"],
                      jnp.full((8, 24), MLM_IGNORE, jnp.int32),
                      batch["attn_mask"], batch["segment_ids"], cfg,
                      jax.random.PRNGKey(0))
    assert float(l0) == 0.0 and int(n0) == 0  # no masked positions


def test_export_hf_checkpoint_roundtrip(tmp_path):
    """export_hf_checkpoint is the exact inverse of the HF import
    converter: encoder pytree -> config.json + pytorch_model.bin ->
    load_pretrained_encoder -> the same pytree (f32-exact)."""
    cfg = EncoderConfig(**TINY)
    params = init_encoder_params(jax.random.PRNGKey(7), cfg)
    out = str(tmp_path / "ckpt")
    export_hf_checkpoint(cfg, params, out)
    assert os.path.exists(os.path.join(out, "config.json"))
    assert os.path.exists(os.path.join(out, "pytorch_model.bin"))

    cfg2, params2 = load_pretrained_encoder(out)
    assert cfg2.hidden_size == cfg.hidden_size
    assert cfg2.num_layers == cfg.num_layers
    assert cfg2.vocab_size == cfg.vocab_size

    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = dict(jax.tree_util.tree_flatten_with_path(params2)[0])
    # identical structure and f32-exact values both ways
    assert set(flat2) == {p for p, _ in flat1}
    for path, leaf in flat1:
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(flat2[path],
                                                     np.float32),
            atol=0, rtol=0, err_msg=str(path))


def test_pretrain_mlm_pipeline_smoke(tmp_path):
    """tools/pretrain_mlm.py end-to-end on CPU: trains a WordPiece
    vocab + a few MLM steps and exports a checkpoint dir that loads
    through the UNMODIFIED pretrained path (tokenizer + encoder)."""
    out = str(tmp_path / "mlm_ckpt")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/pretrain_mlm.py"),
         "--out", out, "--platform", "cpu", "--steps", "8",
         "--hidden", "64", "--n_layers", "2", "--n_heads", "2",
         "--intermediate", "128", "--vocab_size", "512",
         "--buckets", "96", "--log_every", "4"],
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    for f in ("config.json", "pytorch_model.bin", "vocab.txt",
              "pretrain_meta.json"):
        assert os.path.exists(os.path.join(out, f)), f

    meta = json.load(open(os.path.join(out, "pretrain_meta.json")))
    assert meta["steps"] == 8

    cfg, params = load_pretrained_encoder(out)
    assert cfg.hidden_size == 64 and cfg.num_layers == 2
    # the exported vocab drives the HF tokenizer adapter
    from nbest_asr_tpu.data.tokenizer import HFTokenizerAdapter

    tok = HFTokenizerAdapter(out)
    toks = [t for w in "cheap restaurant north part of town".split()
            for t in tok.tokenize(w)]
    ids = tok.convert_tokens_to_ids(toks)
    assert len(ids) > 0 and all(0 <= i < cfg.vocab_size for i in ids)
