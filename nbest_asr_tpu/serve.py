"""Batch inference API.

The reference's only inference surface is `--testing` re-evaluation over
files (`n_best_asr_bert.py:442-473`).  This module adds a production-style
predictor: a jit-compiled, fixed-shape, single-stream forward (no
transcript pass, no loss) from raw serialized utterances to semantic-tuple
label strings — suitable for TPU serving.

Input format per utterance: the serialized line form the ETL emits
(`[CLS] [SYS] <sys words> [USR] <hyp1> [SEP] <hyp2> ...`), either as a
string or a word list.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .data.dataset import RawSplit
from .data.input_builder import pack_split
from .data.tokenizer import BaseTokenizer
from .data.vocab import Memory
from .models.heads import hierarchy_device_arrays
from .models.model import ModelConfig, model_forward
from .train.decode import decode_multihot
from .train.metrics import multihot_to_labels


class _PendingPrediction:
    """Handle for an in-flight prediction (all device work already
    enqueued).  ``result()`` fetches and decodes; safe to call once or
    many times."""

    def __init__(self, predictor: "Predictor", n: int, futures):
        self._p = predictor
        self._n = n
        self._futures = futures
        self._out = None

    def result(self) -> List[List[str]]:
        if self._out is None:
            out = np.zeros((self._n, self._p.memory.n_bottom), dtype=bool)
            for start, end, pred in self._futures:
                out[start:end] = np.asarray(pred)[: end - start]
            self._futures = None
            self._out = multihot_to_labels(out, self._p.memory.idx2label)
        return self._out


class Predictor:
    def __init__(self, params: dict, cfg: ModelConfig, memory: Memory,
                 tokenizer: BaseTokenizer, *, layout: str = "default",
                 use_segments: bool = False, batch_size: int = 16,
                 max_len: int = 256,
                 bucket_lens: tuple = (64, 96, 160, 256),
                 quantize: "str | None" = None,
                 fused_attn_eval: "bool | None" = None):
        if quantize not in (None, "none", "int8"):
            raise ValueError(f"quantize: expected None, 'none' or "
                             f"'int8', got {quantize!r}")
        # serving-side default: INT8 on TPU.  The round-4 serving-
        # numerics gate measured zero F1/Acc cost and 100% prediction
        # agreement on both splits (tools/serving_quality.py; CPU
        # red-capable gate tests/test_serving_quality.py), and int8 wins
        # both latency regimes (sync p50 56.5 vs 66.1 ms bf16; async
        # 19.6 vs 23.2-31.0 ms/batch-64 — docs/PERFORMANCE.md).  Auto
        # applies ONLY when the int8 megakernels will actually take the
        # weights (TPU backend, fused kernels on, 128-lane dims, weights
        # under the VMEM residency budget): the XLA dense_int8 fallback
        # measured SLOWER than bf16 and must not be defaulted into.
        # ``quantize='none'`` forces bf16.
        if quantize is None:
            from .models.encoder import (_attn_weight_bytes,
                                         _ffn_weight_bytes,
                                         kernel_vmem_budget)
            from .ops.attention import resolve_flash

            enc = cfg.encoder
            lanes_ok = (enc.hidden_size % 128 == 0
                        and enc.intermediate_size % 128 == 0
                        and enc.head_dim % 64 == 0)
            budget = kernel_vmem_budget()
            fits = (_attn_weight_bytes(enc, True) <= budget
                    and _ffn_weight_bytes(enc, True) <= budget)
            quantize = "int8" if (resolve_flash(None) and lanes_ok
                                  and fits and enc.use_fused_attn
                                  and enc.use_fused_ffn) else "none"
        # serving-side default: route the deterministic bf16 forward
        # through the attention megakernel at rate-0 dropout.  Measured
        # (serve_bench, v5e, batch 64): 23.2 ms/batch pipelined vs 31.0
        # XLA eval attention (+33% throughput), sync p50 59.3 vs 66.1.
        # None = auto-on when the kernels resolve for this backend and
        # the config already uses the training megakernel; the TRAINING
        # eval path keeps XLA attention (its numerics back the 10-seed
        # QUALITY.md protocol) — this flip is scoped to the Predictor.
        if fused_attn_eval is None:
            from .ops.attention import resolve_flash

            fused_attn_eval = bool(cfg.encoder.use_fused_attn
                                   and resolve_flash(None))
        if fused_attn_eval and not cfg.encoder.use_fused_attn_eval:
            import dataclasses

            cfg = dataclasses.replace(
                cfg, encoder=dataclasses.replace(
                    cfg.encoder, use_fused_attn_eval=True))
        self.quantize = quantize            # resolved serving mode
        if quantize == "int8":
            # weight-only int8 of the encoder GEMMs + dynamic per-token
            # activation quant inside the forward (ops/quant.py); int8
            # dots run the MXU at 2x the bf16 rate on v5e
            from .ops.quant import quantize_encoder_params

            params = quantize_encoder_params(params)
        # CPU-committed params (e.g. host-side init) would silently pull
        # the jitted forward onto the host; move them to the accelerator
        leaves = jax.tree.leaves(params)
        if leaves and hasattr(leaves[0], "sharding") and \
                jax.default_backend() != "cpu":
            devs = getattr(leaves[0].sharding, "device_set", set())
            if devs and all(d.platform == "cpu" for d in devs):
                params = jax.device_put(params, jax.devices()[0])
        self.params = params
        self.cfg = cfg
        self.memory = memory
        self.tokenizer = tokenizer
        self.layout = layout
        self.use_segments = use_segments
        self.batch_size = batch_size
        self.max_len = max_len
        # serve-side length buckets: each call packs to the smallest
        # bucket that fits its longest utterance (one compile per bucket,
        # short batches run up to ~4x faster than fixed max_len)
        self.bucket_lens = sorted(
            {min(b, max_len) for b in bucket_lens} | {max_len})
        self.hier = hierarchy_device_arrays(memory.arrays())

        # native (C++) in-memory packer — host packing dominates serving
        # latency otherwise.  Covers the word-vocab tokenizer AND
        # BERT-family WordPiece adapters (the pretrained production
        # path); BPE/SentencePiece families fall back to Python packing.
        self._native = None
        try:
            from .data.native_loader import NativePacker, native_supported

            if native_supported(tokenizer):
                self._native = NativePacker(memory, tokenizer, layout)
        except Exception:
            self._native = None

        def fwd(params, input_ids, attn_mask, segment_ids):
            top, probs, final, _, _ = model_forward(
                params, cfg, self.hier, input_ids, attn_mask,
                segment_ids, deterministic=True)
            return decode_multihot(top, probs, self.hier), final

        self._fwd = jax.jit(fwd)

    # ------------------------------------------------------------------ #
    def _pack(self, seqs):
        """Pack to the smallest serve bucket that fits (single-stream:
        dummy transcript/labels).  Uses the native in-memory packer when
        built; Python packer otherwise.

        SINGLE tokenization pass: pack once at the natural width, then
        pad the arrays up to the chosen bucket — identical output to
        re-packing at the bucket width (ids pad with pad_id, mask/segs
        with zeros, `_pad_to`), without paying host tokenization twice
        on the serving hot path.  Only natural-width > max_len (forced
        truncation) re-packs."""
        def do_pack(max_len):
            if self._native is not None:
                return self._native.pack_lines(seqs, max_len=max_len)
            split = RawSplit(asr_seqs=seqs, trans_seqs=seqs,
                             labels=[[] for _ in seqs])
            return pack_split(split, self.tokenizer, self.memory,
                              layout=self.layout, max_len=max_len)

        packed = do_pack(None)
        target = self.max_len
        for b in self.bucket_lens:
            if packed.max_len <= b:
                target = b
                break
        if packed.max_len > target:     # needs truncation
            return do_pack(target)
        if packed.max_len < target:     # pad up to the bucket width
            d = target - packed.input_ids.shape[1]
            pad_id = self.tokenizer.pad_token_id
            packed = dataclasses.replace(
                packed,
                input_ids=np.pad(packed.input_ids, ((0, 0), (0, d)),
                                 constant_values=pad_id),
                segment_ids=np.pad(packed.segment_ids,
                                   ((0, 0), (0, d))),
                attn_mask=np.pad(packed.attn_mask, ((0, 0), (0, d))),
                max_len=target)
        return packed

    def _dispatch(self, utterances, want: str = "pred"):
        """Pack + enqueue every batch WITHOUT fetching: jax dispatch is
        async, so all batches pipeline on the device while the host moves
        on.  The per-call tunnel RTT (~28 ms on this environment) is paid
        once per *call*, not once per batch.

        ``want`` selects which jitted output the futures carry: "pred"
        (decoded multi-hot bool, the predict path) or "final" (the
        composed (b, n_bottom) final_scores, the scores path).  Returns
        ``(futures, n)`` where futures are (start, end, device_array)."""
        seqs = [u.split() if isinstance(u, str) else list(u)
                for u in utterances]
        n = len(seqs)
        packed = self._pack(seqs)

        segs = packed.segment_ids if self.use_segments else \
            np.zeros_like(packed.segment_ids)

        futures = []
        bs = self.batch_size
        for start in range(0, n, bs):
            end = min(start + bs, n)
            pad = bs - (end - start)
            ids = np.pad(packed.input_ids[start:end], ((0, pad), (0, 0)))
            mask = np.pad(packed.attn_mask[start:end], ((0, pad), (0, 0)))
            sg = np.pad(segs[start:end], ((0, pad), (0, 0)))
            # keep padded rows harmless: mask row 0 position attends self
            mask[end - start:, 0] = 1.0
            pred, final = self._fwd(self.params, jnp.asarray(ids),
                                    jnp.asarray(mask), jnp.asarray(sg))
            out = pred if want == "pred" else final
            # start the device->host copy NOW: the (b, n_bottom)
            # result is tiny, but a cold fetch inside .result() pays a
            # full synchronous tunnel round-trip (~28 ms measured) on
            # the host's critical path — with the copy already in
            # flight, .result() finds the bytes waiting.  This is what
            # lifts the pipelined floor from ~37 ms/batch to the pure
            # device rate.
            try:
                out.copy_to_host_async()
            except AttributeError:
                pass
            futures.append((start, end, out))
        return futures, n

    def predict(self, utterances: Sequence[Union[str, Sequence[str]]]
                ) -> List[List[str]]:
        """Raw serialized utterances -> per-utterance label lists."""
        futures, n = self._dispatch(utterances)
        return _PendingPrediction(self, n, futures).result()

    def predict_async(self, utterances: Sequence[Union[str, Sequence[str]]]
                      ) -> "_PendingPrediction":
        """Non-blocking predict: returns a handle whose ``.result()``
        yields the label lists.  Dispatch happens eagerly, so interleaving
        ``h = p.predict_async(batch_a); work(); h.result()`` overlaps the
        device round-trip with host work — and two in-flight handles
        double-buffer the device."""
        futures, n = self._dispatch(utterances)
        return _PendingPrediction(self, n, futures)

    def scores(self, utterances: Sequence[Union[str, Sequence[str]]]
               ) -> np.ndarray:
        """Raw utterances -> (n, n_bottom) final_scores (top x group
        softmax composition, ref hierarchical_classifier.py:50-58).

        Routed through the same fixed-shape ``batch_size`` dispatch loop
        as ``predict`` (one compile per bucket, batches pipelined with
        dispatch-time host copies) — a whole-request (n, bucket) batch
        would recompile per distinct request size and serialize the
        device."""
        futures, n = self._dispatch(utterances, want="final")
        out = np.zeros((n, self.memory.n_bottom), dtype=np.float32)
        for start, end, arr in futures:
            out[start:end] = np.asarray(arr)[: end - start]
        return out


def load_predictor(exp_dir: str, memory: Memory, cfg: ModelConfig,
                   tokenizer: BaseTokenizer, **kw) -> Predictor:
    """Restore the best checkpoint written by the Trainer and wrap it."""
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(os.path.join(exp_dir, "model.ckpt")))
    params = jax.tree.map(jnp.asarray, restored["params"])
    return Predictor(params, cfg, memory, tokenizer, **kw)
