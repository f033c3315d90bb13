"""Per-process train-split shard: the host side of ``data_mode="direct"``.

The single-controller Trainer keeps the whole train split device-resident
and gathers microbatches by row index (`train/loop.py`).  On a multi-host
mesh no process holds the full split, so each process instead owns a
strided subset of rows and contributes its slice of every global
microbatch; `parallel.data_sharding.process_sharded_batch` assembles the
global arrays across processes (the scaling-book data-loading recipe) and
`make_train_step(..., data_mode="direct")` consumes them positionally.

Coordination without communication — every process independently computes
identical epoch plans because everything the plan depends on is global
metadata or a shared seed:

- **bucket assignment** is a pure function of the global per-row lengths
  (`data.bucketing`), an int32 per row that every process can hold
  regardless of split size;
- **ownership** is strided within each bucket: process ``p`` of ``P``
  owns ``bucket_rows[p::P]`` — balanced per bucket (sizes differ by at
  most 1), deterministic, and computable up front so a real deployment
  loads only the rows it owns;
- **the shuffle** draws one global permutation per bucket from the shared
  seeded RNG; each process takes its owned rows *in global-shuffle
  order*.  All processes therefore agree on per-bucket step counts and
  consume the RNG identically, and with one process the sequence is
  bit-identical to the index-mode Trainer's plan (pinned by
  `tests/test_direct_data.py`).

Rows the sentinel pads (a bucket shard rarely divides the local batch)
are clamped onto the last owned row and masked out of loss and metrics by
``example_mask``, exactly like index mode's sentinel gather
(`train_step.py:_gather_micro`).

In this single-controller environment the constructor receives the full
host split and slices out the owned rows; a multi-host deployment passes
the same global ``row_len`` metadata but only needs host arrays for the
owned rows (construct with ``data`` already reduced to them and
``rows_are_local=True``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Tuple

import numpy as np

from ..data.bucketing import bucket_assignment, row_lengths, slice_rows


@dataclass
class _ShardBucket:
    blen: int                     # bucket sequence length
    global_n: int                 # bucket rows across ALL processes
    owned_pos: np.ndarray         # positions of owned rows in the bucket
    data: Dict[str, np.ndarray]   # owned rows, token streams cut to blen

    @property
    def local_n(self) -> int:
        return len(self.owned_pos)


class ProcessTrainShard:
    """This process's share of the train split plus the global plan
    metadata needed to agree with every other process."""

    def __init__(self, data: Dict[str, np.ndarray],
                 bucket_lens: List[int], *, process_index: int = 0,
                 process_count: int = 1,
                 row_len: np.ndarray = None,
                 rows_are_local: bool = False):
        assert 0 <= process_index < process_count
        self.process_index = process_index
        self.process_count = process_count
        if row_len is None:
            row_len = row_lengths(data)
        max_len = int(data["input_ids"].shape[1])
        if not bucket_lens:
            bucket_lens = [max_len]
        assignment = bucket_assignment(row_len, bucket_lens, max_len)
        owned_per_bucket = [
            rows[process_index::process_count] for _, rows in assignment]
        # global ids this process owns, ascending — the storage order a
        # multi-host loader materializes its shard in
        self.owned_rows = np.sort(np.concatenate(owned_per_bucket)) \
            if owned_per_bucket else np.zeros((0,), np.int64)
        self.buckets: List[_ShardBucket] = []
        for (blen, rows), owned in zip(assignment, owned_per_bucket):
            if rows_are_local:
                # ``data`` holds exactly self.owned_rows, in that order:
                # translate global ids to local storage offsets
                store = np.searchsorted(self.owned_rows, owned)
            else:
                store = owned
            self.buckets.append(_ShardBucket(
                blen=blen, global_n=len(rows),
                owned_pos=np.arange(len(rows))[process_index::process_count],
                data=slice_rows(data, store, blen)))

    # ------------------------------------------------------------------ #
    # epoch planning
    # ------------------------------------------------------------------ #

    def local_batch_size(self, micro_b: int) -> int:
        if micro_b % self.process_count:
            raise ValueError(
                f"micro batch {micro_b} not divisible by process count "
                f"{self.process_count} (direct data mode shards the batch "
                "dim across processes)")
        return micro_b // self.process_count

    def epoch_plan(self, shuffle_rng: np.random.RandomState,
                   micro_b_for: Callable[[int], int], n_accum: int
                   ) -> List[Tuple[int, int, np.ndarray]]:
        """One epoch's per-bucket step plans.

        Returns ``[(bucket_id, micro_b, idx), ...]`` with ``idx`` of shape
        (n_steps, n_accum, local_b): indices into this process's owned
        rows, sentinel ``local_n`` marking global-padding slots.  Consumes
        ``shuffle_rng`` identically on every process (one permutation of
        the GLOBAL bucket size per bucket) and, with one process,
        identically to the index-mode Trainer.
        """
        plans = []
        for bi, b in enumerate(self.buckets):
            micro_b = micro_b_for(b.blen)
            local_b = self.local_batch_size(micro_b)
            perm = shuffle_rng.permutation(b.global_n)
            # micro count from the GLOBAL size: every process's shard fits
            # (local_n <= ceil(global_n/P) and ceil(ceil(n/P)/local_b) ==
            # ceil(n/(P*local_b)) for the strided split)
            n_micro = -(-b.global_n // micro_b)
            n_steps = n_micro // n_accum
            if n_steps == 0:
                continue  # bucket smaller than one accumulation group
            own = np.zeros(b.global_n, dtype=bool)
            own[b.owned_pos] = True
            seq = perm[own[perm]]            # owned, in shuffle order
            pos2local = np.full(b.global_n, -1, dtype=np.int64)
            pos2local[b.owned_pos] = np.arange(b.local_n)
            seq_local = pos2local[seq]
            padded = np.full((n_micro * local_b,), b.local_n,
                             dtype=np.int32)
            padded[:min(b.local_n, padded.size)] = \
                seq_local[:padded.size].astype(np.int32)
            idx = padded[: n_steps * n_accum * local_b].reshape(
                n_steps, n_accum, local_b)
            plans.append((bi, micro_b, idx))
        return plans

    def steps_per_epoch(self, micro_b_for: Callable[[int], int],
                        n_accum: int) -> int:
        """Optimizer steps one epoch takes (shuffle-independent)."""
        steps = 0
        for b in self.buckets:
            n_micro = -(-b.global_n // micro_b_for(b.blen))
            steps += n_micro // n_accum
        return steps

    # ------------------------------------------------------------------ #
    # per-step host assembly
    # ------------------------------------------------------------------ #

    def local_batch(self, bucket_id: int, idx: np.ndarray
                    ) -> Dict[str, np.ndarray]:
        """Assemble this process's host stacks for one step (or one
        chained group of steps): ``idx`` of shape (..., local_b) ->
        streams of shape (..., local_b, feat...) plus ``example_mask``.
        Sentinel rows clamp onto the last owned row and mask to 0."""
        b = self.buckets[bucket_id]
        clamped = np.minimum(idx, max(b.local_n - 1, 0))
        out = {k: np.ascontiguousarray(v[clamped])
               for k, v in b.data.items()}
        out["example_mask"] = (idx < b.local_n).astype(np.float32)
        return out
