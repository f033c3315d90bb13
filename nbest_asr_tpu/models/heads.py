"""Hierarchical semantic-tuple classifier, vectorized for the MXU.

Same math as the reference's `HierarchicalClassifier`
(`models/modules/hierarchical_classifier.py:6-60`) but with the ragged
ModuleDict of 10 per-group Linear heads (`:18-25, 44-48`) collapsed into
**one** dense ``(h, n_bottom)`` GEMM plus a group-masked softmax driven by
the precomputed membership matrix (`data/vocab.py:HierarchyArrays`):

- top head:     sigmoid(x @ W_top)                    -> (b, n_top)
- bottom head:  x @ W_bot                             -> (b, n_bottom)
- group softmax over each top group's members (segment-softmax via the
  (n_top, n_bottom) membership matrix — two tiny matmuls, fixed shape)
- final_scores[b, j] = top[b, g(j)] * softmax_j   for multi-bottom groups
                       top[b, g(j)]               for singleton groups
  (exact composition of ref `:50-58`).

Initialization matches torch's default ``nn.Linear`` (U(±1/sqrt(fan_in)) for
kernel and bias) — the reference's `init_weight` is never invoked.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..data.vocab import HierarchyArrays


def init_head_params(rng, hidden: int, n_top: int, n_bottom: int) -> dict:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    bound = 1.0 / jnp.sqrt(jnp.asarray(hidden, jnp.float32))

    def u(key, shape):
        return jax.random.uniform(key, shape, jnp.float32, -bound, bound)

    return {
        "top_kernel": u(k1, (hidden, n_top)),
        "top_bias": u(k2, (n_top,)),
        "bottom_kernel": u(k3, (hidden, n_bottom)),
        "bottom_bias": u(k4, (n_bottom,)),
    }


def group_softmax(logits: jnp.ndarray, arr_membership: jnp.ndarray,
                  arr_bottom2top: jnp.ndarray) -> jnp.ndarray:
    """Softmax within each top group over the bottom axis.

    logits: (b, n_bottom) f32.  Returns (b, n_bottom) where each group's
    members sum to 1 (singleton groups get exactly 1.0).
    """
    M = arr_membership                       # (n_top, n_bottom)
    # per-group max for stability: mask non-members to -inf
    neg = jnp.asarray(-1e30, logits.dtype)
    masked = jnp.where(M[None, :, :] > 0, logits[:, None, :], neg)
    gmax = jnp.max(masked, axis=-1)          # (b, n_top)
    m_b = gmax[:, arr_bottom2top]            # (b, n_bottom)
    e = jnp.exp(logits - m_b)
    denom_g = jnp.einsum("bn,tn->bt", e, M)  # (b, n_top)
    denom_b = denom_g[:, arr_bottom2top]
    return e / denom_b


def hierarchical_head(params: dict, features: jnp.ndarray,
                      hier: Dict[str, jnp.ndarray],
                      *, dropout_rate: float = 0.0, rng=None,
                      deterministic: bool = True
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """features (b, h) -> (top_scores (b,n_top), bottom_probs (b,n_bottom),
    final_scores (b,n_bottom)).

    ``bottom_probs`` is the dense stand-in for the reference's
    ``bottom_scores_dict`` (within-group softmax for every bottom label);
    the CE loss and decode consume it through the same membership arrays.
    ``dropout_rate`` mirrors the reference's head dropout on the CLS
    features (`hierarchical_classifier.py:41, 44-48`): the reference calls
    ``self.dropout(x)`` FRESH for the top head and again inside the
    per-group loop, i.e. every group head sees an independent dropout
    sample of the features.  The vectorized equivalent here draws one
    independent (b, h) mask per top group and runs the bottom projection
    as a (n_top)-way batched GEMM, then gathers each bottom column's row
    from its own group's logits.  The extra compute is ~n_top x a
    (b,h)@(h,n_bottom) GEMM — sub-1% of an encoder step — and only exists
    when head dropout is active (training with --dropout > 0).  Masks for
    singleton-top groups are drawn too (superset of the reference's
    multi-group-only loop) but cannot affect any output: singleton
    final_scores use the top score alone and the group CE covers multi
    groups only.
    """
    from ..ops.layers import acc_dtype
    from ..ops.layers import dropout as _dropout

    f32 = features.astype(acc_dtype(features.dtype))
    if not deterministic and dropout_rate > 0.0:
        r1, r2 = jax.random.split(rng)
        f_top = _dropout(f32, dropout_rate, r1, deterministic)
        n_top = params["top_kernel"].shape[1]
        n_bottom = params["bottom_kernel"].shape[1]
        keep = 1.0 - dropout_rate
        masks = jax.random.bernoulli(r2, p=keep,
                                     shape=(n_top,) + f32.shape)
        dropped = jnp.where(masks, f32[None] / keep, 0.0)  # (g, b, h)
        logits_all = (jnp.einsum("gbh,hn->gbn", dropped,
                                 params["bottom_kernel"])
                      + params["bottom_bias"])             # (g, b, n_bot)
        bottom_logits = logits_all[
            hier["bottom2top"], :, jnp.arange(n_bottom)].T  # (b, n_bot)
    else:
        f_top = f32
        bottom_logits = None

    top_logits = f_top @ params["top_kernel"] + params["top_bias"]
    top_scores = jax.nn.sigmoid(top_logits)

    if bottom_logits is None:
        bottom_logits = f32 @ params["bottom_kernel"] + params["bottom_bias"]
    bottom_probs = group_softmax(bottom_logits, hier["membership"],
                                 hier["bottom2top"])

    top_per_bottom = top_scores[:, hier["bottom2top"]]   # (b, n_bottom)
    multi_per_bottom = hier["is_multi_top"][hier["bottom2top"]]
    final_scores = jnp.where(multi_per_bottom,
                             top_per_bottom * bottom_probs,
                             top_per_bottom)
    return top_scores, bottom_probs, final_scores


def hierarchy_device_arrays(arrays: HierarchyArrays) -> Dict[str, jnp.ndarray]:
    """numpy hierarchy arrays -> device constants consumed by the head,
    losses and decode."""
    return {
        "membership": jnp.asarray(arrays.membership),
        "bottom2top": jnp.asarray(arrays.bottom2top),
        "bottom2top_mat": jnp.asarray(arrays.bottom2top_mat),
        "is_multi_top": jnp.asarray(arrays.is_multi_top),
        "group_last_bottom": jnp.asarray(arrays.group_last_bottom),
        "is_none_bottom": jnp.asarray(arrays.is_none_bottom),
        "singleton_onehot": jnp.asarray(arrays.singleton_onehot),
    }
