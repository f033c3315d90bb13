"""jit/pjit-compiled train & eval steps.

This replaces the reference's per-batch Python hot loop
(`n_best_asr_bert.py:232-294`): tokenization is gone (offline), the
`.item()` loss syncs are gone (loss parts are traced scalars fetched once
per epoch), the per-sample host decode is gone (vectorized in
`train/decode.py`), and gradient accumulation is a `lax.scan` over
microbatches inside one compiled step (replacing the reference's
``n_accum_steps`` outer-loop bookkeeping, ref :266-280, :522).

Gradient-accumulation semantics match the reference exactly: per-micro
gradients are **summed** (torch ``.backward()`` accumulates; the losses are
sum-reduced) and the optimizer steps once per ``n_accum`` microbatches.

The dataset lives on device; each step receives only an (n_accum, micro_b)
index array and gathers its microbatches on device — the per-step
host->device traffic of the reference (`bert_xlnet_inputs.py:96,102`) drops
to a few hundred bytes of indices.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.model import ModelConfig, model_forward
from ..train.decode import decode_multihot
from ..train.losses import LossConfig, total_loss
from ..train.metrics import f1_counts_from_multihot


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def _gather_micro(data: Dict[str, jnp.ndarray], idx: jnp.ndarray,
                  mesh: Optional[Mesh]) -> Dict[str, jnp.ndarray]:
    """Gather one microbatch by row index.  Index == n_rows is the padding
    sentinel for fixed-shape partial batches: jnp.take clamps it onto the
    last row and the derived ``example_mask`` zeroes that row out of the
    loss and metrics."""
    n_rows = next(iter(data.values())).shape[0]
    micro = {k: jnp.take(v, idx, axis=0, mode="clip")
             for k, v in data.items()}
    micro["example_mask"] = (idx < n_rows).astype(jnp.float32)
    return _constrain_micro(micro, mesh)


def _constrain_micro(micro: Dict[str, jnp.ndarray], mesh: Optional[Mesh]
                     ) -> Dict[str, jnp.ndarray]:
    """Pin a microbatch's batch dim onto the data-parallel mesh axes and
    make sure an example_mask exists (all-ones when the caller's batches
    are always full, e.g. the process-sharded direct path)."""
    from .mesh import dp_axes

    if "example_mask" not in micro:
        micro = dict(micro)
        micro["example_mask"] = jnp.ones(
            (next(iter(micro.values())).shape[0],), jnp.float32)
    if mesh is not None:
        axes = dp_axes(mesh)
        micro = {
            k: jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, P(axes, *([None] * (v.ndim - 1)))))
            for k, v in micro.items()
        }
    return micro


def _forward_and_loss(params, cfg: ModelConfig, loss_cfg: LossConfig,
                      hier, micro, *, deterministic, rng,
                      dual_stream: bool):
    """Returns ``loss, (parts, top, probs, labels, row_mask)``.

    ``labels``/``row_mask`` are the per-UTTERANCE arrays downstream
    decode/metrics must use: for plain micros they are the micro's own
    labels + example_mask; for PACKED micros (``cls_pos`` present — see
    data/packing.py) every model output already has one row per packed
    segment, labels flatten (b, n_seg, n_bottom) -> (b*n_seg, n_bottom)
    and the mask ANDs the row example_mask with the per-segment mask."""
    packed = "cls_pos" in micro

    top, probs, final, asr_cls, trans_cls = model_forward(
        params, cfg, hier,
        micro["input_ids"], micro["attn_mask"],
        micro.get("segment_ids"),
        trans_input_ids=micro["trans_input_ids"] if dual_stream else None,
        trans_attn_mask=micro.get("trans_attn_mask") if dual_stream else None,
        trans_token_type_ids=micro.get("trans_segment_ids")
        if dual_stream else None,
        deterministic=deterministic, rng=rng,
        position_ids=micro.get("position_ids"),
        trans_position_ids=micro.get("trans_position_ids")
        if dual_stream else None,
        cls_positions=micro.get("cls_pos"),
        trans_cls_positions=micro.get("trans_cls_pos")
        if dual_stream else None)

    if packed:
        labels = micro["labels"].reshape(-1, micro["labels"].shape[-1])
        row_mask = micro["seg_mask"]
        em = micro.get("example_mask")
        if em is not None:
            row_mask = row_mask * em[:, None]
        row_mask = row_mask.reshape(-1)
    else:
        labels = micro["labels"]
        row_mask = micro.get("example_mask")

    loss, parts = total_loss(
        top, probs, final, labels, hier, loss_cfg,
        asr_cls=asr_cls, trans_cls=trans_cls,
        example_mask=row_mask)
    return loss, (parts, top, probs, labels, row_mask)


def make_train_step(cfg: ModelConfig, loss_cfg: LossConfig, optimizer,
                    hier: Dict[str, jnp.ndarray], *, n_accum: int = 1,
                    mesh: Optional[Mesh] = None, dual_stream: bool = True,
                    donate: bool = True, steps_per_call: int = 1,
                    data_mode: str = "index"):
    """Returns ``train_step(state, data, idx, rng) -> (state, stats)``.

    - ``data``: device-resident dict of full-split arrays (input_ids,
      attn_mask, segment_ids, trans_*, labels, example_mask).
    - ``idx``: (n_accum, micro_b) int32 row indices for this step — or
      (steps_per_call, n_accum, micro_b) when step chaining is on.
    - ``stats``: loss parts (summed over micros/steps) + f1 counters.

    ``data_mode="direct"`` is the multi-host path: ``data`` is instead a
    dict of already-assembled microbatch stacks ``(n_accum, micro_b, ...)``
    sharded over the data-parallel mesh axes (built per process with
    `parallel.data_sharding.process_sharded_batch`), and ``idx`` is
    ignored.  Single-controller index gathering can't work there because
    no process holds the full split.

    ``steps_per_call > 1`` chains K optimizer steps into one compiled
    call via `lax.scan` — the classic TPU train-loop-on-device pattern.
    On this environment each dispatch rides a network tunnel to the
    chip, so chaining amortizes per-call latency across K steps.  The
    math is identical to K single calls (verified by test): the
    per-step rngs come from `jax.random.split(rng, K)`.
    """

    def single_step(state: TrainState, data, idx, rng):
        def micro_grads(micro, i):
            micro = _constrain_micro(micro, mesh)
            mrng = jax.random.fold_in(rng, i)

            def loss_fn(p):
                return _forward_and_loss(
                    p, cfg, loss_cfg, hier, micro,
                    deterministic=False, rng=mrng,
                    dual_stream=dual_stream)

            (loss, (parts, top, probs, labels, row_mask)), grads = \
                jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            # train-time monitor (ref :283-288): decode from the training
            # forward outputs
            pred = decode_multihot(top, probs, hier)
            counts = f1_counts_from_multihot(pred, labels, row_mask)
            return grads, parts, counts

        if data_mode == "index":
            def micro_at(sel, i):
                return micro_grads(_gather_micro(data, sel, mesh), i)

            first_sel = idx[0]
            rest_xs = (idx[1:], jnp.arange(1, n_accum, dtype=jnp.int32))
        else:
            def micro_at(sel, i):
                return micro_grads(sel, i)

            first_sel = {k: v[0] for k, v in data.items()}
            rest_xs = ({k: v[1:] for k, v in data.items()},
                       jnp.arange(1, n_accum, dtype=jnp.int32))

        def scan_body(carry, xs):
            grads_acc, parts_acc, counts_acc = carry
            sel, i = xs
            grads, parts, counts = micro_at(sel, i)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            parts_acc = jax.tree.map(jnp.add, parts_acc, parts)
            counts_acc = jax.tree.map(jnp.add, counts_acc, counts)
            return (grads_acc, parts_acc, counts_acc), None

        # init carry from the first micro, scan the rest (avoids a
        # zeros-like pass over the full param tree)
        first = micro_at(first_sel, jnp.int32(0))
        if n_accum > 1:
            (grads, parts, counts), _ = jax.lax.scan(
                scan_body, first, rest_xs)
        else:
            grads, parts, counts = first

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        return new_state, {"loss": parts, "counts": counts}

    if steps_per_call == 1:
        train_step = single_step
    else:
        def train_step(state: TrainState, data, idx, rng):
            rngs = jax.random.split(rng, steps_per_call)

            if data_mode == "index":
                # the split is step-invariant; only indices advance
                def body(st, xs):
                    step_idx, step_rng = xs
                    return single_step(st, data, step_idx, step_rng)

                xs = (idx, rngs)
            else:
                # direct mode: the data stacks themselves carry a leading
                # (steps_per_call,) axis — scan over them
                def body(st, xs):
                    step_data, step_rng = xs
                    return single_step(st, step_data, idx, step_rng)

                xs = (data, rngs)
            state, stats_seq = jax.lax.scan(body, state, xs)
            stats = jax.tree.map(lambda x: jnp.sum(x, axis=0), stats_seq)
            return state, stats

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_eval_step(cfg: ModelConfig, loss_cfg: LossConfig,
                   hier: Dict[str, jnp.ndarray], *,
                   mesh: Optional[Mesh] = None, dual_stream: bool = False):
    """Returns ``eval_step(params, data, idx) -> stats``.

    Eval never adds the MSE term (the reference computes eval loss without
    hidden states, ref :331), so the transcript encoder pass is pure waste
    there — ``dual_stream=False`` skips it with identical loss/metrics.
    Returns the decoded multi-hot so the host can do string-exact F1 and
    the per-utterance dumps at epoch end.
    """
    eval_loss_cfg = LossConfig(add_l2_loss=False)

    # multi-process: the decoded batch outputs come out dp-sharded, but
    # every process's host eval loop consumes the FULL batch — constrain
    # them replicated so the all-gather happens on device (device_get of a
    # non-fully-addressable array is an error under jax.distributed)
    gather_out = jax.process_count() > 1 and mesh is not None

    def eval_step(params, data, idx):
        micro = _gather_micro(data, idx, mesh)
        loss, (parts, top, probs, labels, row_mask) = _forward_and_loss(
            params, cfg, eval_loss_cfg, hier, micro,
            deterministic=True, rng=jax.random.PRNGKey(0),
            dual_stream=dual_stream)
        pred = decode_multihot(top, probs, hier)
        counts = f1_counts_from_multihot(pred, labels, row_mask)
        if gather_out:
            rep = NamedSharding(mesh, P())
            pred = jax.lax.with_sharding_constraint(pred, rep)
            top = jax.lax.with_sharding_constraint(top, rep)
        return {"loss": parts, "counts": counts, "pred": pred,
                "top": top}

    return jax.jit(eval_step)
