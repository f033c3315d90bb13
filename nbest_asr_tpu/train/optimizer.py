"""Optimizers: BertAdam semantics in optax, plus adam/adamw parity modes.

Parity surface:
- ``BertAdam`` (`models/optimization.py:183-302`): Adam **without bias
  correction** (ref :297-300), **per-parameter-tensor** grad-norm clipping
  to ``max_grad_norm=1.0`` (ref :270-271), decoupled weight decay added to
  the update *before* the lr scaling (ref :286-292), and a per-step
  progress schedule (default warmup-linear, `WarmupLinearSchedule`
  :162-171).  The schedule is evaluated at the *pre-increment* step count,
  so step 0 trains at lr 0 exactly like the reference.
- param grouping (`n_best_asr_bert.py:540-549`): weight decay 0.01 except
  bias/LayerNorm tensors; ``--bert_lr`` for encoder params, ``--lr`` for
  the heads.
- ``adam`` / ``adamw`` modes (`n_best_asr_bert.py:553-569`): plain Adam
  (lr, eps 1e-8, L2 into grads via ``--l2``) and AdamW(correct_bias=False)
  with the HF linear-warmup schedule stepped per update.

Everything is a single `optax.GradientTransformation`; the per-leaf lr/wd
masks are computed once from the param-tree paths.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


# --------------------------------------------------------------------- #
# schedules (progress in [0,1] -> multiplier), parity with
# models/optimization.py:35-180
# --------------------------------------------------------------------- #

def warmup_linear(warmup: float) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def f(progress):
        return jnp.where(
            progress < warmup,
            progress / warmup,
            jnp.maximum((progress - 1.0) / (warmup - 1.0), 0.0),
        )
    return f


def warmup_constant(warmup: float):
    def f(progress):
        return jnp.where(progress < warmup, progress / warmup, 1.0)
    return f


def warmup_cosine(warmup: float, cycles: float = 0.5):
    def f(progress):
        warm = progress / warmup
        rest = (progress - warmup) / jnp.maximum(1.0 - warmup, 1e-9)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * cycles * 2.0 * rest))
        return jnp.where(progress < warmup, warm, cos)
    return f


def constant_schedule():
    return lambda progress: jnp.ones_like(progress)


SCHEDULES = {
    None: constant_schedule,
    "none": constant_schedule,
    "warmup_linear": warmup_linear,
    "warmup_constant": warmup_constant,
    "warmup_cosine": warmup_cosine,
}


# --------------------------------------------------------------------- #
# config + tree labelling
# --------------------------------------------------------------------- #

@dataclass(frozen=True)
class OptimizerConfig:
    optim_choice: str = "bertadam"     # bertadam | adam | adamw
    lr: float = 5e-4                   # head lr (reference --lr)
    bert_lr: float = 1e-5              # encoder lr (reference --bert_lr)
    warmup_proportion: float = 0.1
    t_total: int = -1                  # total optimizer steps
    schedule: str = "warmup_linear"
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-6                  # BertAdam default (ref :196)
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0         # BertAdam per-tensor clip (ref :198)
    l2: float = 0.0                    # plain-adam L2 (reference --l2)
    freeze_encoder: bool = False       # --fix_bert_model: exclude
    # encoder leaves from the optimizer entirely (optax.masked), the
    # analog of the reference's requires_grad filtering
    # (`n_best_asr_bert.py:536-538`; its --fix_bert_model flag itself is
    # parsed but dead upstream — this rebuild makes it work).  Masking
    # freezes in EVERY mode: bert_lr=0 alone would leave plain adam
    # (one global lr, ref :554) and its L2 decay still moving encoder
    # weights.


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def is_encoder_leaf(path) -> bool:
    return _path_str(path).startswith("encoder")


def is_no_decay_leaf(path) -> bool:
    """bias / LayerNorm exclusion (`n_best_asr_bert.py:540-542`)."""
    s = _path_str(path)
    return ("bias" in s) or ("ln_scale" in s) or ("ln_bias" in s)


def lr_tree(params, cfg: OptimizerConfig):
    return jax.tree_util.tree_map_with_path(
        lambda p, x: cfg.bert_lr if is_encoder_leaf(p) else cfg.lr, params)


def wd_tree(params, cfg: OptimizerConfig):
    return jax.tree_util.tree_map_with_path(
        lambda p, x: 0.0 if is_no_decay_leaf(p) else cfg.weight_decay,
        params)


# --------------------------------------------------------------------- #
# BertAdam transformation
# --------------------------------------------------------------------- #

class BertAdamState(NamedTuple):
    step: jnp.ndarray
    m: optax.Updates
    v: optax.Updates


def bert_adam(cfg: OptimizerConfig, params_template) -> optax.GradientTransformation:
    lrs = lr_tree(params_template, cfg)
    wds = wd_tree(params_template, cfg)
    sched = SCHEDULES[cfg.schedule](cfg.warmup_proportion) \
        if cfg.schedule not in (None, "none") else constant_schedule()

    def init_fn(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return BertAdamState(step=jnp.zeros([], jnp.int32), m=z,
                             v=jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params):
        assert params is not None
        # schedule multiplier at the pre-increment step (weak-typed
        # division: f32 normally, f64 under jax_enable_x64 so the x64
        # parity tests see full-precision schedule values)
        if cfg.t_total > 0:
            progress = state.step / cfg.t_total
            mult = sched(progress)
        else:
            mult = jnp.asarray(1.0, jnp.float32)

        def clip_one(path, g):
            """Per-*torch-tensor* grad-norm clip (ref :270-271).  The
            reference clips every ``nn.Parameter`` separately; our encoder
            stacks all layers into (L, ...) leaves and fuses q/k/v into one
            (L, h, 3h) kernel, so the clip granularity here is per layer
            (axis 0) and per q/k/v chunk (last-axis thirds) — the exact
            tensor set the reference sees, just batched."""
            if cfg.max_grad_norm <= 0:
                return g
            s = _path_str(path)
            g32 = g.astype(jnp.promote_types(g.dtype, jnp.float32))

            def scaled(x, axes):
                norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axes,
                                        keepdims=True))
                return x * jnp.minimum(
                    1.0, cfg.max_grad_norm / (norm + 1e-6))

            if "layers/" in s:
                if "qkv" in s:
                    q, k, v = jnp.split(g32, 3, axis=-1)
                    chunks = jnp.stack([q, k, v], axis=1)  # (L, 3, ...)
                    axes = tuple(range(2, chunks.ndim))
                    chunks = scaled(chunks, axes)
                    g32 = jnp.concatenate(
                        [chunks[:, 0], chunks[:, 1], chunks[:, 2]],
                        axis=-1)
                else:
                    g32 = scaled(g32, tuple(range(1, g32.ndim)))
            else:
                g32 = scaled(g32, tuple(range(g32.ndim)))
            return g32.astype(g.dtype)

        grads = jax.tree_util.tree_map_with_path(clip_one, grads)
        new_m = jax.tree.map(lambda m, g: cfg.b1 * m + (1 - cfg.b1) * g,
                             state.m, grads)
        new_v = jax.tree.map(lambda v, g: cfg.b2 * v + (1 - cfg.b2) * g * g,
                             state.v, grads)

        def upd(m, v, p, lr, wd):
            u = m / (jnp.sqrt(v) + cfg.eps)
            u = u + wd * p
            return -(lr * mult) * u

        updates = jax.tree.map(upd, new_m, new_v, params, lrs, wds)
        return updates, BertAdamState(step=state.step + 1, m=new_m,
                                      v=new_v)

    return optax.GradientTransformation(init_fn, update_fn)


# --------------------------------------------------------------------- #
# adam / adamw parity modes
# --------------------------------------------------------------------- #

def _plain_adam(cfg: OptimizerConfig) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, betas, eps=1e-8, weight_decay=l2): L2 is folded
    into the gradients (ref `n_best_asr_bert.py:554`).  The global-norm
    clip the reference applies before non-bertadam steps (ref :268-270)
    is chained first."""
    chain = []
    if cfg.max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    if cfg.l2 > 0:
        chain.append(optax.add_decayed_weights(cfg.l2))
    chain.append(optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2, eps=1e-8))
    chain.append(optax.scale(-cfg.lr))
    return optax.chain(*chain)


class AdamWState(NamedTuple):
    step: jnp.ndarray
    m: optax.Updates
    v: optax.Updates


def _adamw(cfg: OptimizerConfig, params_template) -> optax.GradientTransformation:
    """HF AdamW(correct_bias=False) + get_linear_schedule_with_warmup,
    grouped lrs/wd (ref `n_best_asr_bert.py:562-569`), with the reference's
    pre-step global-norm clip for non-bertadam modes (ref :268-270)."""
    lrs = lr_tree(params_template, cfg)
    wds = wd_tree(params_template, cfg)
    warmup_steps = int(cfg.warmup_proportion * max(cfg.t_total, 1))

    def lr_mult(step):
        step = step.astype(jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = jnp.maximum(
            0.0,
            (cfg.t_total - step)
            / jnp.maximum(1.0, cfg.t_total - warmup_steps),
        )
        return jnp.where(step < warmup_steps, warm, decay)

    def init_fn(params):
        return AdamWState(step=jnp.zeros([], jnp.int32),
                          m=jax.tree.map(jnp.zeros_like, params),
                          v=jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params):
        mult = lr_mult(state.step)
        new_m = jax.tree.map(lambda m, g: cfg.b1 * m + (1 - cfg.b1) * g,
                             state.m, grads)
        new_v = jax.tree.map(lambda v, g: cfg.b2 * v + (1 - cfg.b2) * g * g,
                             state.v, grads)

        def upd(m, v, p, lr, wd):
            u = m / (jnp.sqrt(v) + 1e-8)  # HF AdamW default eps 1e-8
            return -(lr * mult) * (u + wd * p)

        updates = jax.tree.map(upd, new_m, new_v, params, lrs, wds)
        return updates, AdamWState(step=state.step + 1, m=new_m, v=new_v)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: OptimizerConfig, params_template
                   ) -> optax.GradientTransformation:
    if cfg.optim_choice == "bertadam":
        tx = bert_adam(cfg, params_template)
    elif cfg.optim_choice == "adam":
        tx = _plain_adam(cfg)
    elif cfg.optim_choice == "adamw":
        if cfg.max_grad_norm > 0:
            tx = optax.chain(
                optax.clip_by_global_norm(cfg.max_grad_norm),
                _adamw(cfg, params_template))
        else:
            tx = _adamw(cfg, params_template)
    else:
        raise ValueError(f"unknown optim_choice: {cfg.optim_choice}")
    if cfg.freeze_encoder:
        tx = _freeze_encoder_leaves(tx, params_template)
    return tx


def _freeze_encoder_leaves(tx: optax.GradientTransformation,
                           params_template
                           ) -> optax.GradientTransformation:
    """Zero encoder grads before `tx` (momenta stay exactly zero, and
    the non-bertadam global-norm clip sees only trainable grads, like
    the reference's requires_grad-filtered parameter list) and zero the
    resulting updates after it (kills decoupled/L2 weight-decay terms,
    which move params even at zero grad).  `u * 0.0` is exact, so frozen
    leaves are bit-identical after any number of steps.  (optax.masked
    is unusable here: bert_adam/_adamw close over full-tree lr/wd maps
    that mismatch its masked subtrees.)"""
    mask = jax.tree_util.tree_map_with_path(
        lambda p, x: 0.0 if is_encoder_leaf(p) else 1.0, params_template)

    def update_fn(grads, state, params):
        grads = jax.tree.map(lambda g, m: g * m, grads, mask)
        updates, state = tx.update(grads, state, params)
        updates = jax.tree.map(lambda u, m: u * m, updates, mask)
        return updates, state

    return optax.GradientTransformation(tx.init, update_fn)


def global_norm_clip(max_norm: float) -> optax.GradientTransformation:
    """Global-norm clip used by the non-bertadam modes before the update
    (ref `n_best_asr_bert.py:268-270`)."""
    return optax.clip_by_global_norm(max_norm)
