"""Decode rule, vectorized on device.

Parity surface: `pred_one_sample` (`n_best_asr_bert.py:198-215`):
- threshold top scores at 0.5 (ref :202) — including the <pad>/<unk>
  singleton groups, which the reference would also emit;
- singleton group  -> emit its sole bottom label (ref :205-206);
- multi group      -> within-group argmax of the group softmax, mapped
  through the sorted member list; labels ending in ``NONE`` are dropped
  (ref :207-213).

Output is a (b, n_bottom) boolean multi-hot; the host maps it to label
strings only at epoch boundaries (`metrics.py`).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def decode_multihot(top_scores: jnp.ndarray, bottom_probs: jnp.ndarray,
                    hier: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """(b, n_top) scores + (b, n_bottom) group softmax -> (b, n_bottom)
    bool predictions."""
    b2t = hier["bottom2top"]
    active_top = top_scores > 0.5                       # (b, n_top)
    active_per_bottom = active_top[:, b2t]              # (b, n_bottom)

    # singleton groups: emit the sole member when its top fires
    pred_single = active_per_bottom & (hier["singleton_onehot"] > 0)

    # multi groups: within-group argmax (argmax of probs == argmax of
    # logits; jnp.argmax takes the first index on ties, like numpy in the
    # reference's .argmax at ref :209)
    M = hier["membership"]                              # (n_top, n_bottom)
    masked = jnp.where(M[None, :, :] > 0,
                       bottom_probs[:, None, :].astype(jnp.float32),
                       -1.0)                            # (b, n_top, n_bot)
    winner = jnp.argmax(masked, axis=-1)                # (b, n_top)
    n_bottom = bottom_probs.shape[1]
    # scatter winners: (b, n_top, n_bottom) one-hot reduced over tops
    onehot = jax.nn.one_hot(winner, n_bottom, dtype=jnp.bool_)
    fire = active_top & hier["is_multi_top"][None, :]
    pred_multi = jnp.any(onehot & fire[:, :, None], axis=1)
    pred_multi = pred_multi & ~hier["is_none_bottom"][None, :]

    return pred_single | pred_multi
