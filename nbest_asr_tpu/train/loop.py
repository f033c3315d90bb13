"""Training/eval driver: the epoch loop, checkpointing, dumps, logging.

Parity surface: `train` / `test` / `train_epoch` / `eval_epoch`
(`n_best_asr_bert.py:232-473`) with the TPU-first restructure of
SURVEY.md §7 step 7:

- per-epoch: train -> eval(valid) -> eval(test), with [Train]/[Valid]/
  [Test] metric lines in the reference's log format (ref :405-424);
- per-utterance `valid.iter<i>[.err]` / `test.iter<i>[.err]` dumps in the
  ``input \\t<=>\\t preds \\t<=>\\t golds`` format (ref :357-364, :409-419);
- observability CSVs + per-label classification reports per split
  (`utils/observability.py`);
- best-valid-F1 checkpointing — but via Orbax with **optimizer state and
  step included**, enabling mid-training resume the reference lacks
  (SURVEY.md §5.4), plus a working `--testing` path (the reference's
  crashes on a 4-vs-5 tuple unpack, ref :453 vs :386).

Metric reporting: train-time F1/acc come from on-device counters (decoded
inside the jitted step); eval F1/acc are host-computed from strings, which
is exact reference semantics including OOV gold labels and the ontology
filter.  Reported TRAIN mean loss divides by the fixed micro-batch size
(the reference divides each micro's loss by its actual row count, which
differs only on the final partial batch — reporting-only delta, training
math is identical); EVAL mean loss divides by the real utterance count
(sentinel rows are masked out of the loss sum).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RunOptions
from ..data.input_builder import PackedSplit
from ..data.vocab import Memory
from ..models.heads import hierarchy_device_arrays
from ..models.model import ModelConfig, init_model_params
from ..parallel.mesh import make_mesh, param_shardings
from ..parallel.train_step import (TrainState, make_eval_step,
                                   make_train_step)
from ..train.losses import LossConfig
from ..train.metrics import compute_f1, host_eval_metrics
from ..train.optimizer import OptimizerConfig, make_optimizer
from ..utils.logging import make_logger
from ..utils.observability import EpochInfo, observability_lens


def _is_coordinator() -> bool:
    """True on the one process that owns shared-filesystem artifact writes
    (checkpoint sidecar, prediction dumps, observability CSVs, config/best
    snapshots).  With P > 1 every process runs the same epoch loop on its
    data shard; without this guard they would all write the SAME paths
    concurrently (racy, and on some filesystems corrupting).  Orbax pytree
    saves stay all-process: Orbax coordinates multi-host saves itself."""
    return jax.process_index() == 0


def _host_data(packed: PackedSplit, *, use_asr_segments: bool,
               use_trans_segments: bool) -> Dict[str, np.ndarray]:
    """PackedSplit -> host numpy dict (bucketing slices it on host; each
    bucket is device_put exactly once — per-bucket jnp slicing would cost
    one compile round-trip per array per bucket).  Segment streams the
    layout doesn't use are zeros (== token type 0, identical to passing
    None).  Quirk preserved: the reference drops ASR segment ids unless
    ``--add_segment_ids`` but always passes transcript segment ids
    (`n_best_asr_bert.py:252-255`)."""
    segs = packed.segment_ids if use_asr_segments else \
        np.zeros_like(packed.segment_ids)
    tsegs = packed.trans_segment_ids if use_trans_segments else \
        np.zeros_like(packed.trans_segment_ids)
    return {
        "input_ids": packed.input_ids,
        "attn_mask": packed.attn_mask,
        "segment_ids": segs,
        "trans_input_ids": packed.trans_input_ids,
        "trans_attn_mask": packed.trans_attn_mask,
        "trans_segment_ids": tsegs,
        "labels": packed.labels,
    }


@dataclass
class _Bucket:
    """One length bucket: device arrays truncated to the bucket length,
    plus the original row indices for reassembly."""
    data: Dict[str, jnp.ndarray]
    rows: np.ndarray          # original row indices (host)

    def __len__(self) -> int:
        return len(self.rows)


def _make_buckets(data: Dict[str, np.ndarray], bucket_lens: List[int],
                  put=jnp.asarray) -> List[_Bucket]:
    """Split host data into per-length buckets (`data/bucketing.py` — the
    same assignment the multi-host direct path recomputes per process) and
    device_put each bucket once (``put`` places replicated GLOBAL arrays
    when running multi-process).  Rows are NEVER truncated, whatever
    bucket ladder the user passes."""
    from ..data.bucketing import (bucket_assignment, row_lengths,
                                  slice_rows)

    max_len = int(data["input_ids"].shape[1])
    buckets: List[_Bucket] = []
    for blen, rows in bucket_assignment(row_lengths(data), bucket_lens,
                                        max_len):
        sub = {k: put(v)
               for k, v in slice_rows(data, rows, blen).items()}
        buckets.append(_Bucket(data=sub, rows=rows))
    return buckets


def _epoch_step_indices(n: int, micro_b: int, n_accum: int,
                        perm: np.ndarray) -> np.ndarray:
    """Shuffled row order -> (n_steps, n_accum, micro_b) index tensor.

    Chunks of ``micro_b`` follow the permutation; the final short chunk is
    padded with the sentinel ``n`` (masked on device).  Only full groups of
    ``n_accum`` micros step the optimizer — trailing micros are dropped,
    matching the reference where their accumulated grads are zeroed without
    ever stepping (ref :236, :266-280)."""
    n_micro = -(-n // micro_b)
    padded = np.full((n_micro * micro_b,), n, dtype=np.int32)
    padded[:n] = perm.astype(np.int32)
    micros = padded.reshape(n_micro, micro_b)
    n_steps = n_micro // n_accum
    if n_steps == 0:
        raise ValueError(
            f"dataset too small: {n_micro} microbatches < n_accum={n_accum}")
    return micros[: n_steps * n_accum].reshape(n_steps, n_accum, micro_b)


@dataclass
class EpochMetrics:
    mean_loss: float
    precision: float
    recall: float
    f1: float
    acc: float


class Trainer:
    """Owns the compiled steps, device data, optimizer state, and the
    epoch driver.

    Takes OWNERSHIP of ``params``: the jitted train step donates its
    state, so the caller's arrays may be deleted after the first step
    (device_put is a no-op alias when they are already placed on the
    target device).  Pass a copy if you need them afterwards."""

    def __init__(self, opt: RunOptions, memory: Memory,
                 model_cfg: ModelConfig, params: dict,
                 packed: Dict[str, PackedSplit],
                 mesh=None, logger=None, family: Optional[str] = None):
        self.opt = opt
        self.memory = memory
        self.cfg = model_cfg
        self.packed = packed
        self.family = family or (opt.pre_trained_model or "bert")
        self.mesh = mesh if mesh is not None else make_mesh(
            n_model=opt.n_model_parallel)
        self.logger = logger
        self.hier = hierarchy_device_arrays(memory.arrays())

        # segment-id routing (see _device_data docstring)
        is_xlmr = self.family == "xlm-roberta"
        use_asr_segs = opt.add_segment_ids and not is_xlmr
        use_trans_segs = not is_xlmr
        self.data = {
            name: _host_data(p, use_asr_segments=use_asr_segs,
                             use_trans_segments=use_trans_segs)
            for name, p in packed.items()
        }

        # length bucketing (opt-in): per-bucket fixed shapes; the jitted
        # steps re-specialize per shape automatically
        bucket_lens: List[int] = []
        if opt.length_buckets:
            bucket_lens = sorted(
                int(x) for x in opt.length_buckets.split(",") if x)
        # data_mode="direct" (SURVEY.md §5.8): the train split is NOT made
        # device-resident — each process owns a strided shard and global
        # microbatches are assembled per step with
        # jax.make_array_from_process_local_data.  Eval splits stay on the
        # index path (small; every process holds them, exact host metrics).
        self.direct_data = opt.data_mode == "direct"
        # multi-process runtime (jax.distributed): every host array fed to
        # the jitted steps must be a GLOBAL array — replicated for eval
        # splits / rng / indices, process-sharded (direct mode) for train
        self._multiproc = jax.process_count() > 1
        if self._multiproc and not self.direct_data and "train" in self.data:
            raise ValueError(
                "process_count > 1 requires --data_mode direct: the index "
                "path keeps the whole train split device-resident, which "
                "no single process can provide on a multi-host mesh")
        self._shard = None
        # example packing (train only; data/packing.py): several
        # utterances per fixed-shape row — one packed "bucket", one
        # compiled shape, ~full token occupancy at the long-seq MFU
        self._packed_train = bool(opt.pack_examples) and "train" in self.data
        if self._packed_train and self.direct_data:
            raise ValueError("--pack_examples is an index-mode feature; "
                             "--data_mode direct packs per process shard "
                             "(not implemented)")
        self.buckets: Dict[str, List[_Bucket]] = {}
        for name, d in self.data.items():
            if self.direct_data and name == "train":
                continue
            if name == "train" and self._packed_train:
                from ..data.packing import pack_train_data

                pk, bins = pack_train_data(d, opt.pack_capacity,
                                           opt.pack_max_segs)
                if self.logger:
                    real = int(sum(len(b) for b in bins))
                    cap = pk["input_ids"].shape[1]
                    fill = float(pk["attn_mask"].astype(bool).sum()) / (
                        len(bins) * cap)
                    self.logger.info(
                        "packed train: %d utterances -> %d rows of %d "
                        "tokens (%.1f%% occupancy)"
                        % (real, len(bins), cap, 100 * fill))
                self.buckets[name] = [_Bucket(
                    data={k: self._put_replicated(v)
                          for k, v in pk.items()},
                    rows=np.arange(len(bins)))]
                continue
            if bucket_lens:
                self.buckets[name] = _make_buckets(d, bucket_lens,
                                                   self._put_replicated)
            else:
                n = len(packed[name])
                self.buckets[name] = [_Bucket(
                    data={k: self._put_replicated(v)
                          for k, v in d.items()},
                    rows=np.arange(n))]
        if self.direct_data and "train" in self.data:
            from ..parallel.process_data import ProcessTrainShard

            self._shard = ProcessTrainShard(
                self.data["train"], bucket_lens,
                process_index=jax.process_index(),
                process_count=jax.process_count())

        # optimizer schedule horizon: the reference formula
        # `(n_train // batchSize + 1) * max_epoch` (ref :556) in the parity
        # configuration; when bucketing/token-budget batching changes the
        # real number of optimizer steps per epoch, compute t_total from
        # the actual epoch step plan so warmup-linear peaks/decays at the
        # right progress fraction (the plan is deterministic: shuffling
        # permutes rows, never the per-bucket step counts)
        n_train = len(packed["train"]) if "train" in packed else 1
        if (opt.token_budget or opt.length_buckets
                or self._packed_train) and "train" in packed:
            steps_per_epoch = self._train_steps_per_epoch()
            t_total = max(steps_per_epoch, 1) * opt.max_epoch
        else:
            t_total = (n_train // opt.batchSize + 1) * opt.max_epoch
        # --fix_bert_model freezes the encoder at the optimizer level
        # (grads+updates zeroed for encoder leaves — bit-identical in
        # every optimizer mode, incl. plain adam's global lr + L2
        # decay); bert_lr 0 kept as belt-and-braces for the
        # per-leaf-lr modes
        bert_lr = 0.0 if opt.fix_bert_model else opt.bert_lr
        self.opt_cfg = OptimizerConfig(
            optim_choice=opt.optim_choice, lr=opt.lr, bert_lr=bert_lr,
            warmup_proportion=opt.warmup_proportion, t_total=t_total,
            max_grad_norm=1.0 if opt.optim_choice == "bertadam"
            else opt.max_norm,
            l2=opt.l2, freeze_encoder=opt.fix_bert_model)
        self.optimizer = make_optimizer(self.opt_cfg, params)

        loss_cfg = LossConfig(add_l2_loss=opt.add_l2_loss)
        # the transcript stream feeds ONLY the optional MSE alignment term
        # (ref :166-170); without --add_l2_loss its CLS is unused, so the
        # second encoder pass contributes exactly zero gradient — skip it.
        # (The reference runs it anyway, ref `models/model.py:50-58` — pure
        # waste; dropping it is math-identical and ~2x encoder FLOPs.)
        dual = bool(opt.add_l2_loss)
        dm = "direct" if self.direct_data else "index"
        self.train_step = make_train_step(
            model_cfg, loss_cfg, self.optimizer, self.hier,
            n_accum=opt.n_accum_steps, mesh=self.mesh,
            dual_stream=dual, data_mode=dm)
        self.steps_per_call = max(1, opt.steps_per_call)
        self.train_step_chain = None
        if self.steps_per_call > 1:
            self.train_step_chain = make_train_step(
                model_cfg, loss_cfg, self.optimizer, self.hier,
                n_accum=opt.n_accum_steps, mesh=self.mesh,
                dual_stream=dual, steps_per_call=self.steps_per_call,
                data_mode=dm)
        self.eval_step = make_eval_step(
            model_cfg, loss_cfg, self.hier, mesh=self.mesh,
            dual_stream=False)

        # initial state (sharded params when tensor-parallel)
        shardings = param_shardings(params, self.mesh,
                                    tensor_parallel=opt.n_model_parallel > 1)
        self._param_shardings = shardings
        params = jax.device_put(params, shardings)
        # jit the optimizer init: eager tree_map(zeros_like) is ~30 tiny
        # dispatches, each a round-trip through the remote TPU compiler
        self.state = TrainState(
            params=params,
            opt_state=jax.jit(self.optimizer.init)(params),
            step=self._put_replicated(jnp.zeros([], jnp.int32)),
        )
        self._rng = self._put_replicated(
            jax.random.PRNGKey(opt.random_seed))
        self._shuffle_rng = np.random.RandomState(opt.random_seed)
        # resume bookkeeping (set by load_checkpoint when the checkpoint
        # carries epoch metadata; SURVEY.md §5.4 — the reference has no
        # mid-training resume at all)
        self._start_epoch = 0
        self._best: Optional[Dict[str, float]] = None

    def _put_replicated(self, x):
        """Single-process: plain device array.  Multi-process: a fully
        replicated GLOBAL array over the mesh — every process passes the
        same host value (eval splits, rng keys, index vectors are all
        process-identical by construction), and jit then accepts it next
        to the mesh-global params/batches."""
        if not self._multiproc:
            return jnp.asarray(x)
        from ..parallel.mesh import replicated

        return jax.device_put(x, replicated(self.mesh))

    # ------------------------------------------------------------------ #
    # epochs
    # ------------------------------------------------------------------ #

    def run_train_epoch(self) -> EpochMetrics:
        if self.direct_data:
            return self._run_train_epoch_direct()
        opt = self.opt
        K = self.steps_per_call
        # per-bucket step plans (bucket-local indices): chains of K
        # consecutive optimizer steps per compiled call, leftovers as
        # single-step calls; chain/step order shuffled globally
        plans = []  # ("chain"|"single", bucket, idx)
        n_rows_total = 0
        for bucket in self.buckets["train"]:
            micro_b = self._bucket_micro_batch(bucket)
            perm = self._shuffle_rng.permutation(len(bucket))
            try:
                idx = _epoch_step_indices(len(bucket), micro_b,
                                          opt.n_accum_steps, perm)
            except ValueError:
                continue  # bucket smaller than one accumulation group
            n_steps = idx.shape[0]
            n_rows_total += n_steps * opt.n_accum_steps * micro_b
            n_chains = n_steps // K if K > 1 else 0
            for c in range(n_chains):
                plans.append(("chain", bucket, idx[c * K:(c + 1) * K]))
            for s in range(n_chains * K, n_steps):
                plans.append(("single", bucket, idx[s]))
        self._shuffle_rng.shuffle(plans)

        stats_acc = None
        for kind, bucket, idx_s in plans:
            self._rng, step_rng = jax.random.split(self._rng)
            fn = self.train_step_chain if kind == "chain" else \
                self.train_step
            self.state, stats = fn(self.state, bucket.data,
                                   jnp.asarray(idx_s), step_rng)
            stats_acc = stats if stats_acc is None else jax.tree.map(
                jnp.add, stats_acc, stats)
        stats = jax.device_get(stats_acc)
        return self._metrics_from_counts(
            stats, None if self._packed_train else n_rows_total)

    def _run_train_epoch_direct(self) -> EpochMetrics:
        """Multi-host train epoch: every process runs this same loop,
        assembling its shard of each global microbatch on host and feeding
        the direct-mode step.  Plan construction mirrors the index path
        step for step (same RNG draws, same chain/single grouping, same
        plan shuffle) so one process reproduces index mode bit-exactly
        (`tests/test_direct_data.py`)."""
        opt = self.opt
        K = self.steps_per_call
        from ..parallel.data_sharding import process_sharded_batch

        plans = []  # ("chain"|"single", bucket_id, idx)
        n_rows_total = 0
        for bi, micro_b, idx in self._shard.epoch_plan(
                self._shuffle_rng, self._micro_batch_for_len,
                opt.n_accum_steps):
            n_steps = idx.shape[0]
            n_rows_total += n_steps * opt.n_accum_steps * micro_b
            n_chains = n_steps // K if K > 1 else 0
            for c in range(n_chains):
                plans.append(("chain", bi, idx[c * K:(c + 1) * K]))
            for s in range(n_chains * K, n_steps):
                plans.append(("single", bi, idx[s]))
        self._shuffle_rng.shuffle(plans)

        dummy_idx = self._put_replicated(jnp.zeros((0,), jnp.int32))
        stats_acc = None
        for kind, bi, idx_s in plans:
            self._rng, step_rng = jax.random.split(self._rng)
            local = self._shard.local_batch(bi, idx_s)
            micros = process_sharded_batch(self.mesh, local,
                                           lead=idx_s.ndim - 1)
            fn = self.train_step_chain if kind == "chain" else \
                self.train_step
            self.state, stats = fn(self.state, micros, dummy_idx,
                                   step_rng)
            stats_acc = stats if stats_acc is None else jax.tree.map(
                jnp.add, stats_acc, stats)
        stats = jax.device_get(stats_acc)
        return self._metrics_from_counts(stats, n_rows_total)

    def _micro_batch_for_len(self, blen: int) -> int:
        """Micro-batch for one bucket length: the parity batch by default;
        under --token_budget, ~budget/bucket_len rounded to a multiple of
        8 (never below the parity micro-batch)."""
        opt = self.opt
        if not opt.token_budget:
            return opt.micro_batch
        b = max(opt.micro_batch, (opt.token_budget // blen) // 8 * 8)
        return max(b, 1)

    def _bucket_micro_batch(self, bucket: _Bucket) -> int:
        return self._micro_batch_for_len(
            int(bucket.data["input_ids"].shape[1]))

    def _train_steps_per_epoch(self) -> int:
        """Optimizer steps one train epoch will actually take (independent
        of the shuffle: permutations change row order, never counts)."""
        if self._shard is not None:
            return self._shard.steps_per_epoch(
                self._micro_batch_for_len, self.opt.n_accum_steps)
        steps = 0
        for bucket in self.buckets.get("train", []):
            micro_b = self._bucket_micro_batch(bucket)
            n_micro = -(-len(bucket) // micro_b)
            steps += n_micro // self.opt.n_accum_steps
        return steps

    def run_eval_epoch(self, split: str, epoch: int = 0,
                       dump_prefix: Optional[str] = None
                       ) -> tuple[EpochMetrics, EpochInfo]:
        opt = self.opt
        packed = self.packed[split]
        n = len(packed)
        eval_b = opt.eval_batch or opt.micro_batch

        # Dispatch every eval batch asynchronously and fetch O(buckets)
        # times, not O(batches): the round-2 loop's per-batch
        # `float(loss)` forced a blocking tunnel round-trip per batch
        # (~28 ms RTT x ~56 batches x 2 splits ≈ 3 s/epoch of pure RTT
        # on this environment — the `.item()`-per-step pattern SURVEY
        # §3.1 exists to eliminate).  Loss scalars stay on device until
        # one stacked fetch at epoch end.
        pred_mh = np.zeros((n, self.memory.n_bottom), dtype=bool)
        loss_parts = []
        for bucket in self.buckets[split]:
            nb = len(bucket)
            b_eval = eval_b
            if opt.token_budget:
                blen = int(bucket.data["input_ids"].shape[1])
                b_eval = max(eval_b, (opt.token_budget // blen) // 8 * 8)
            n_batches = -(-nb // b_eval)
            padded = np.full((n_batches * b_eval,), nb, dtype=np.int32)
            padded[:nb] = np.arange(nb, dtype=np.int32)
            bucket_preds = []
            for bidx in padded.reshape(n_batches, b_eval):
                out = self.eval_step(self.state.params, bucket.data,
                                     self._put_replicated(bidx))
                # start the tiny device->host copies at dispatch so the
                # per-bucket device_get below finds the bytes waiting
                # instead of paying a cold fetch RTT (same fix as
                # serve._dispatch, measured ~27.5 ms/call there)
                for leaf in (out["pred"], out["loss"]["total"]):
                    try:
                        leaf.copy_to_host_async()
                    except AttributeError:
                        pass
                bucket_preds.append(out["pred"])
                loss_parts.append(out["loss"]["total"])
            bp = np.concatenate(jax.device_get(bucket_preds))[:nb]
            pred_mh[bucket.rows] = bp
        loss_sum = float(np.sum(jax.device_get(loss_parts))) \
            if loss_parts else 0.0

        (p, r, f), acc, pred_strings, golds = host_eval_metrics(
            pred_mh, packed.raw_labels, self.memory.idx2label,
            ontology=opt.ontology)
        # padded sentinel rows are zeroed out of the loss by example_mask,
        # so the real row count is the right denominator (the round-1
        # version divided by padded totals — reporting-only drift on
        # non-multiple batch sizes)
        mean_loss = loss_sum / max(n, 1)

        raw_inputs = [" ".join(s) for s in packed.raw_asr]
        matches = [set(pc) == set(g) for pc, g in
                   zip(pred_strings, golds)]
        info = EpochInfo(raw_inputs, pred_strings, golds, matches,
                         mean_loss, p, r, f, acc)

        if dump_prefix is not None and _is_coordinator():
            self._write_dumps(dump_prefix, packed, pred_strings, golds)

        return EpochMetrics(mean_loss, p, r, f, acc), info

    def _write_dumps(self, prefix: str, packed: PackedSplit,
                     preds: List[List[str]], golds: List[List[str]]
                     ) -> None:
        """`input \\t<=>\\t preds \\t<=>\\t golds` per line; errors also to
        the .err file (ref :357-364)."""
        with open(prefix, "w") as fp, open(prefix + ".err", "w") as efp:
            for raw, pc, gold in zip(packed.raw_asr, preds, golds):
                line = "%s\t<=>\t%s\t<=>\t%s\n" % (
                    " ".join(raw), ";".join(pc), ";".join(gold))
                fp.write(line)
                if set(pc) != set(gold):
                    efp.write(line)

    def _metrics_from_counts(self, stats,
                             n_rows: Optional[int]) -> EpochMetrics:
        c = stats["counts"]
        p, r, f = compute_f1(float(c["tp"]), float(c["fp"]),
                             float(c["fn"]))
        total = max(float(c["total"]), 1.0)
        acc = float(c["correct"]) / total * 100
        # n_rows None (packed epochs): rows hold several utterances, so
        # the exact on-device utterance count is the loss denominator
        denom = total if n_rows is None else max(n_rows, 1)
        mean_loss = float(stats["loss"]["total"]) / denom
        return EpochMetrics(mean_loss, p, r, f, acc)

    # ------------------------------------------------------------------ #
    # checkpointing (Orbax)
    # ------------------------------------------------------------------ #

    def save_checkpoint(self, path: str, *, epoch: Optional[int] = None,
                        best: Optional[Dict[str, float]] = None) -> None:
        """Orbax pytree (params/opt_state/step) + a JSON sidecar with the
        epoch cursor, best-metrics dict and both RNG states — everything
        `train()` needs to continue a preempted run exactly where it
        stopped.  ``epoch`` is the NEXT epoch to run on resume."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }, force=True)
        if not _is_coordinator():
            return
        mt = self._shuffle_rng.get_state()
        meta = {
            "epoch": epoch,
            "best": best,
            "rng": np.asarray(self._rng).tolist(),
            "shuffle": [mt[0], np.asarray(mt[1]).tolist(), int(mt[2]),
                        int(mt[3]), float(mt[4])],
        }
        with open(path + ".meta.json", "w") as fp:
            json.dump(meta, fp)

    def load_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        template = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        restored = ckptr.restore(path, item=template)
        params = jax.device_put(restored["params"], self._param_shardings)
        self.state = TrainState(params=params,
                                opt_state=restored["opt_state"],
                                step=restored["step"])
        meta_path = path + ".meta.json"
        if os.path.exists(meta_path):  # round-1 checkpoints have no meta
            with open(meta_path) as fp:
                meta = json.load(fp)
            if meta.get("epoch") is not None:
                self._start_epoch = int(meta["epoch"])
            if meta.get("best") is not None:
                self._best = dict(meta["best"])
            if meta.get("rng") is not None:
                self._rng = self._put_replicated(
                    np.asarray(meta["rng"], dtype=np.uint32))
            if meta.get("shuffle") is not None:
                kind, keys, pos, hg, cached = meta["shuffle"]
                self._shuffle_rng.set_state(
                    (kind, np.asarray(keys, dtype=np.uint32), pos, hg,
                     cached))

    # ------------------------------------------------------------------ #
    # full drivers
    # ------------------------------------------------------------------ #

    def train(self, stop_after_epoch: Optional[int] = None
              ) -> Dict[str, float]:
        """Epoch driver.  ``stop_after_epoch`` simulates a preemption after
        that epoch index (same code path as a real SIGTERM) — used by the
        kill/resume tests and operational dry-runs."""
        opt = self.opt
        os.makedirs(opt.exp_dir, exist_ok=True)
        # full config snapshot: every knob (incl. TPU-native ones that the
        # reference-parity dir NAME omits) is machine-readable per run
        from dataclasses import asdict

        if _is_coordinator():
            snap = {k: v for k, v in asdict(opt).items()
                    if k != "ontology"}
            with open(os.path.join(opt.exp_dir, "config.json"),
                      "w") as fp:
                json.dump(snap, fp, indent=1, default=str)
        logger = self.logger or make_logger(
            os.path.join(opt.exp_dir, "log.train"))
        logger.info("Training starts at %s" % time.asctime())

        # preemption handling (SURVEY.md §5.3 — absent in the reference):
        # SIGTERM requests a checkpoint at the next epoch boundary; resume
        # with `--resume auto`
        preempted = {"flag": False}
        try:
            import signal

            prev_handler = signal.signal(
                signal.SIGTERM,
                lambda *_: preempted.update(flag=True))
        except (ValueError, OSError):  # non-main thread etc.
            prev_handler = None
        csv_name = "tod_asr_bert_stc"

        best = self._best or {"epoch": 0, "vf": 0.0, "tef": 0.0,
                              "v_acc": 0.0, "te_acc": 0.0}
        has_test = "test" in self.data
        start_epoch = self._start_epoch
        if start_epoch:
            logger.info("Resuming at epoch %02d (best valid F1 so far "
                        "%.2f @ epoch %02d)" %
                        (start_epoch, best["vf"], best["epoch"]))

        profile_epoch = min(max(1, start_epoch), opt.max_epoch - 1)
        for i in range(start_epoch, opt.max_epoch):
            t0 = time.time()
            if opt.profile_dir and i == profile_epoch:
                from ..utils.profiling import trace

                with trace(opt.profile_dir):
                    tr = self.run_train_epoch()
            else:
                tr = self.run_train_epoch()
            logger.info(
                "[Train]\tEpoch: %02d\tTime: %.2f\tLoss: %.2f\t"
                "(p/r/f): (%.2f/%.2f/%.2f)\tAcc: %.2f" %
                (i, time.time() - t0, tr.mean_loss, tr.precision,
                 tr.recall, tr.f1, tr.acc))

            # --eval_every N: skip the valid/test evals on off-cycle
            # epochs (always evaluate the last); best tracking then sees
            # only evaluated epochs
            if (opt.eval_every > 1 and (i + 1) % opt.eval_every
                    and i != opt.max_epoch - 1):
                if opt.checkpoint_every and \
                        (i + 1) % opt.checkpoint_every == 0:
                    self.save_checkpoint(
                        os.path.join(opt.exp_dir, f"ckpt_epoch{i}"),
                        epoch=i + 1, best=best)
                if stop_after_epoch is not None and i >= stop_after_epoch:
                    preempted["flag"] = True
                if preempted["flag"]:
                    path = os.path.join(opt.exp_dir, f"ckpt_epoch{i}")
                    self.save_checkpoint(path, epoch=i + 1, best=best)
                    logger.info(
                        "SIGTERM: checkpointed to %s after epoch %02d; "
                        "resume with --resume auto" % (path, i))
                    break
                continue

            # per-epoch artifact work (dumps + pandas/sklearn reports —
            # reference parity, tod_asr_util.py:202-223) is host-side
            # and can dominate sweep wall time on small hosts;
            # --eval_artifacts none skips it without touching metrics
            artifacts = opt.eval_artifacts != "none"
            t0 = time.time()
            vm, v_info = self.run_eval_epoch(
                "valid", i,
                dump_prefix=os.path.join(opt.exp_dir, f"valid.iter{i}")
                if artifacts else None)
            logger.info(
                "[Valid]\tEpoch: %02d\tTime: %.2f\tLoss: %.2f\t"
                "(p/r/f): (%.2f/%.2f/%.2f)\tAcc: %.2f" %
                (i, time.time() - t0, vm.mean_loss, vm.precision,
                 vm.recall, vm.f1, vm.acc))
            if artifacts and _is_coordinator():
                observability_lens(v_info, i, "valid", opt.exp_dir,
                                   csv_name)

            tem = EpochMetrics(0, 0, 0, 0, 0)
            if has_test:
                t0 = time.time()
                tem, te_info = self.run_eval_epoch(
                    "test", i,
                    dump_prefix=os.path.join(opt.exp_dir, f"test.iter{i}")
                    if artifacts else None)
                logger.info(
                    "[Test]\tEpoch: %02d\tTime: %.2f\tLoss: %.2f\t"
                    "(p/r/f): (%.2f/%.2f/%.2f)\tAcc: %.2f" %
                    (i, time.time() - t0, tem.mean_loss, tem.precision,
                     tem.recall, tem.f1, tem.acc))
                if artifacts and _is_coordinator():
                    observability_lens(te_info, i, "test", opt.exp_dir,
                                       csv_name)

            if vm.f1 > best["vf"]:
                best.update(epoch=i, vf=vm.f1, tef=tem.f1, v_acc=vm.acc,
                            te_acc=tem.acc)
                if opt.save_best != "none":
                    self.save_checkpoint(
                        os.path.join(opt.exp_dir, "model.ckpt"),
                        epoch=i + 1, best=best)
                logger.info(
                    "NEW BEST:\tEpoch: %02d\tvalid F1/Acc: %.2f/%.2f\t"
                    "test F1/Acc: %.2f/%.2f" %
                    (i, vm.f1, vm.acc, tem.f1, tem.acc))

            if opt.checkpoint_every and (i + 1) % opt.checkpoint_every == 0:
                self.save_checkpoint(
                    os.path.join(opt.exp_dir, f"ckpt_epoch{i}"),
                    epoch=i + 1, best=best)

            if stop_after_epoch is not None and i >= stop_after_epoch:
                preempted["flag"] = True
            if preempted["flag"]:
                path = os.path.join(opt.exp_dir, f"ckpt_epoch{i}")
                self.save_checkpoint(path, epoch=i + 1, best=best)
                logger.info(
                    "SIGTERM: checkpointed to %s after epoch %02d; "
                    "resume with --resume auto" % (path, i))
                break

        logger.info(
            "BEST RESULT:\tEpoch: %02d\tBest valid F1/Acc: %.2f/%.2f\t"
            "test F1/Acc: %.2f/%.2f" %
            (best["epoch"], best["vf"], best["v_acc"], best["tef"],
             best["te_acc"]))
        if _is_coordinator():
            with open(os.path.join(opt.exp_dir, "best.json"), "w") as fp:
                json.dump(best, fp)
        if prev_handler is not None:
            import signal

            signal.signal(signal.SIGTERM, prev_handler)
        return best

    def test(self) -> Dict[str, EpochMetrics]:
        """Working `--testing` mode (the reference's crashes, ref :453):
        loads the best checkpoint and evaluates all available splits."""
        opt = self.opt
        logger = self.logger or make_logger(
            os.path.join(opt.exp_dir, "log.test"))
        ckpt = os.path.join(opt.exp_dir, "model.ckpt")
        if os.path.exists(ckpt):
            self.load_checkpoint(ckpt)
        results = {}
        for split in self.buckets:  # in direct mode train has no buckets
            t0 = time.time()
            m, _ = self.run_eval_epoch(
                split, 0,
                dump_prefix=os.path.join(opt.exp_dir, f"{split}.eval"))
            logger.info(
                "[%s]\tTime: %.2f\tLoss: %.2f\t(p/r/f): "
                "(%.2f/%.2f/%.2f)\tAcc: %.2f" %
                (split.capitalize(), time.time() - t0, m.mean_loss,
                 m.precision, m.recall, m.f1, m.acc))
            results[split] = m
        return results


# --------------------------------------------------------------------- #
# model/config resolution
# --------------------------------------------------------------------- #

def build_model(opt: RunOptions, memory: Memory, tokenizer):
    """Resolve encoder config + initial params per the reference's
    pretrained-model registry semantics (`n_best_asr_bert.py:33-37,
    480-487`).  A *requested* pretrained checkpoint that fails to load is
    never a silent fallback: it raises under ``--require_pretrained`` and
    warns loudly on stderr otherwise (the from-scratch path exists only for
    offline smoke runs in this no-network environment)."""
    from ..models.encoder import EncoderConfig
    from ..models.hf_convert import load_pretrained_encoder

    from ..data.tokenizer import HF_NAMES, resolve_checkpoint

    from ..ops.attention import resolve_flash

    enc_cfg = None
    enc_params = None

    def resolve_int8(flag):
        # None = auto: int8 training GEMMs wherever the bf16 megakernels
        # would route (TPU backend + bfloat16 compute — the int8-train
        # kernels require the non-streaming bf16 weight layout,
        # ops/fused_ffn.fused_ffn_block_int8_train).  Measured
        # quality-neutral at n=10 for +5.7% step throughput (QUALITY.md
        # int8-training table, PERFORMANCE.md); --no_int8_train* forces
        # the bf16 path.
        if flag is not None:
            return bool(flag)
        return resolve_flash(None) and opt.compute_dtype == "bfloat16"

    common = dict(
        hidden_dropout=opt.bert_dropout, attn_dropout=opt.bert_dropout,
        compute_dtype=opt.compute_dtype,
        use_flash_attention=resolve_flash(opt.use_flash_attention),
        use_fused_ffn=resolve_flash(opt.use_fused_ffn),
        use_fused_attn=resolve_flash(opt.use_fused_attn),
        use_int8_train=resolve_int8(opt.int8_train),
        use_int8_train_attn=resolve_int8(opt.int8_train_attn),
        use_int8_train_bwd=resolve_int8(opt.int8_train_bwd),
        flash_min_seq=opt.flash_min_seq,
        remat=opt.remat)

    name = opt.tod_pre_trained_model or HF_NAMES.get(
        opt.pre_trained_model or "")
    if name and not opt.tod_pre_trained_model:
        name = resolve_checkpoint(name)
    if name:
        try:
            enc_cfg, enc_params = load_pretrained_encoder(name, **common)
        except Exception as e:
            msg = (f"could not load pretrained encoder {name!r}: "
                   f"{type(e).__name__}: {e}")
            if opt.require_pretrained:
                raise RuntimeError(
                    msg + " (--require_pretrained set; refusing the "
                    "from-scratch fallback)") from e
            import sys

            print(
                "WARNING: %s\nWARNING: training FROM SCRATCH — results "
                "will not be comparable to the pretrained benchmark. "
                "Pass --require_pretrained to make this fatal." % msg,
                file=sys.stderr, flush=True)
            enc_cfg = None

    if enc_cfg is None:
        # from-scratch: word-vocab tokenizer sizes the embedding; the
        # reference hardcodes fea_dim=768 (`models/model.py:30`) but we
        # honor the CLI structure flags for from-scratch runs
        enc_cfg = EncoderConfig(
            vocab_size=tokenizer.vocab_size,
            hidden_size=768,
            num_layers=opt.n_layers,
            num_heads=max(opt.n_head, 4),
            intermediate_size=3072,
            max_position=512,
            position_offset=0,
            **common)

    n_top, n_bottom = memory.n_top, memory.n_bottom
    cfg = ModelConfig(encoder=enc_cfg, n_top=n_top, n_bottom=n_bottom,
                      head_dropout=opt.dropout)
    # init on the CPU backend: the init graph is dozens of tiny compiles
    # that would each round-trip the remote TPU compiler; the Trainer
    # device_puts the tree onto the mesh afterwards
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    with jax.default_device(cpu) if cpu is not None else \
            contextlib.nullcontext():
        rng = jax.random.PRNGKey(opt.random_seed)
        params = init_model_params(rng, cfg)
    if enc_params is not None:
        params["encoder"] = enc_params
    return cfg, params
