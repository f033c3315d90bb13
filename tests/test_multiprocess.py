"""REAL multi-process execution (VERDICT r3 next #4 / SURVEY §5.8).

Everything multi-host in rounds 1-3 ran in ONE process on a virtual mesh;
`jax.make_array_from_process_local_data` had only ever seen
process_count == 1.  These tests spawn an actual 2-process
``jax.distributed`` runtime (gloo CPU collectives, 4 virtual devices per
process = one 8-device global mesh), run the FULL Trainer.train() driver
in ``--data_mode direct``, and pin:

- both processes agree on metrics and final params (replication invariant);
- the 2-process run is BIT-identical to a single-process run on the same
  8-device mesh (same global arrays, same shard geometry);
- coordinator artifacts (config/best/checkpoint-meta) exist exactly as in
  single-process runs.

Plus a direct unit test of the `_is_coordinator()` write guards: a
non-zero process must not write dumps or the checkpoint sidecar.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "distributed_worker.py")


pytestmark = pytest.mark.slow  # CPU-training / subprocess tier


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_arm(nproc: int, tmp_path, tag: str):
    exp = str(tmp_path / f"exp_{tag}")
    res = str(tmp_path / f"res_{tag}")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    port = str(_free_port())
    procs = []
    logs = []
    for i in range(nproc):
        log = open(str(tmp_path / f"log_{tag}_p{i}"), "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nproc), port, exp, res],
            env=env, stdout=log, stderr=subprocess.STDOUT))
    rcs = [p.wait(timeout=900) for p in procs]
    for log in logs:
        log.close()
    for i, rc in enumerate(rcs):
        if rc != 0:
            with open(str(tmp_path / f"log_{tag}_p{i}")) as fp:
                tail = fp.read()[-2000:]
            raise AssertionError(f"worker {i}/{nproc} rc={rc}:\n{tail}")
    results = []
    for i in range(nproc):
        with open(os.path.join(res, f"result_p{i}.json")) as fp:
            results.append(json.load(fp))
    return exp, results


@pytest.mark.skipif(sys.platform != "linux",
                    reason="gloo CPU collectives exercised on linux only")
def test_two_process_direct_mode_matches_single_process(tmp_path):
    exp2, res2 = _run_arm(2, tmp_path, "p2")
    exp1, res1 = _run_arm(1, tmp_path, "p1")

    # both processes of the distributed run agree BIT-exactly (replicated
    # state, same reduction tree)
    assert res2[0]["best"] == res2[1]["best"]
    assert res2[0]["params_sha"] == res2[1]["params_sha"]

    # the distributed run reproduces the single-process run.  Three
    # tiers, because the cross-process gradient reduction (gloo) and the
    # in-process XLA reduction order the same sums differently in the
    # last ulps, and BertAdam (divide by sqrt(v), v tiny early) amplifies
    # that chaotically over many steps (measured: 1-ulp step-1 noise
    # grows to ~6e-2 max param delta by epoch 2 on this fixture):
    # 1. ONE optimizer step from the same init: tight float agreement —
    #    the reduction itself computes the same math
    with np.load(os.path.join(str(tmp_path / "res_p2"),
                              "step1_p0.npz")) as z2, \
            np.load(os.path.join(str(tmp_path / "res_p1"),
                                 "step1_p0.npz")) as z1:
        assert sorted(z2.files) == sorted(z1.files)
        for k in z2.files:
            np.testing.assert_allclose(
                z2[k], z1[k], rtol=0, atol=1e-5,
                err_msg=f"single-step {k} beyond reduction-order noise")
    # 2. full-run METRICS (integer tuple counts): exact
    assert res2[0]["best"] == res1[0]["best"]
    for k in ("p", "r", "f1", "acc"):
        assert res2[0]["eval"][k] == res1[0]["eval"][k], k
    # 3. full-run loss: same trajectory modulo the amplified noise
    assert res2[0]["eval"]["loss"] == pytest.approx(
        res1[0]["eval"]["loss"], rel=5e-3)

    # coordinator wrote the shared artifacts (and only sane copies exist)
    for fname in ("config.json", "best.json"):
        assert os.path.exists(os.path.join(exp2, fname)), fname
    with open(os.path.join(exp2, "best.json")) as fp:
        assert json.load(fp) == res2[0]["best"]


TP_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "distributed_tp_worker.py")


def _run_tp_arm(nproc: int, n_model: int, tmp_path, tag: str):
    res = str(tmp_path / f"tpres_{tag}")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    port = str(_free_port())
    procs, logs = [], []
    for i in range(nproc):
        log = open(str(tmp_path / f"tplog_{tag}_p{i}"), "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, TP_WORKER, str(i), str(nproc), str(n_model),
             port, res], env=env, stdout=log, stderr=subprocess.STDOUT))
    rcs = [p.wait(timeout=900) for p in procs]
    for log in logs:
        log.close()
    for i, rc in enumerate(rcs):
        if rc != 0:
            with open(str(tmp_path / f"tplog_{tag}_p{i}")) as fp:
                tail = fp.read()[-2000:]
            raise AssertionError(f"tp worker {i}/{nproc} rc={rc}:\n{tail}")
    results = []
    for i in range(nproc):
        with open(os.path.join(res, f"tp_result_p{i}.json")) as fp:
            results.append(json.load(fp))
    return results


@pytest.mark.skipif(sys.platform != "linux",
                    reason="gloo CPU collectives exercised on linux only")
def test_cross_process_tensor_parallel_matches_in_process(tmp_path):
    """VERDICT r4 #7: drive the MODEL axis across a real process
    boundary.  Mesh (data=1, model=2) with one device per process puts
    each TP pair on two processes, so the per-layer attention-out/FFN-out
    all-reduces ride gloo.  Must agree with the in-process TP arm (one
    process, two local devices, identical mesh shape): forward scalars
    exactly, three-BertAdam-step parameter energies to reduction-order
    noise."""
    res2 = _run_tp_arm(2, 2, tmp_path, "x2")
    res1 = _run_tp_arm(1, 2, tmp_path, "x1")

    # both processes of the TP run observe the same replicated stats
    assert res2[0]["first_loss"] == res2[1]["first_loss"]
    assert res2[0]["param_sq"] == res2[1]["param_sq"]

    # step-1 forward: same params + same batch -> same loss/counts up to
    # collective reduction order (counts are integers: exact)
    assert res2[0]["first_counts"] == res1[0]["first_counts"]
    assert res2[0]["first_loss"] == pytest.approx(res1[0]["first_loss"],
                                                  rel=1e-5)

    # after 3 optimizer steps: per-leaf parameter energy within
    # reduction-order noise of the in-process arm
    sq2, sq1 = res2[0]["param_sq"], res1[0]["param_sq"]
    assert sorted(sq2) == sorted(sq1)
    for k in sq1:
        assert sq2[k] == pytest.approx(sq1[k], rel=1e-4), k


def test_non_coordinator_skips_artifact_writes(tmp_path, monkeypatch):
    """The `_is_coordinator()` guards: a process with index != 0 must not
    write dumps, checkpoint sidecars, or best/config snapshots (it would
    race process 0 on shared storage)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_direct_data import _synthetic_packed

    from nbest_asr_tpu.config import RunOptions
    from nbest_asr_tpu.data.etl import build_memory
    from nbest_asr_tpu.models.encoder import EncoderConfig
    from nbest_asr_tpu.models.model import ModelConfig, init_model_params
    from nbest_asr_tpu.train import loop as loop_mod
    from nbest_asr_tpu.train.loop import Trainer

    memory = build_memory("a b".split(), ["thankyou", "negate"], [])
    packed = {"train": _synthetic_packed(24, 32, memory.n_bottom, seed=1),
              "valid": _synthetic_packed(8, 32, memory.n_bottom, seed=2)}
    cfg = ModelConfig(encoder=EncoderConfig.tiny(vocab_size=64),
                      n_top=memory.n_top, n_bottom=memory.n_bottom)
    opt = RunOptions(dataset="dstc2", dataroot="unused",
                     experiment=str(tmp_path), batchSize=8, max_epoch=1,
                     random_seed=3, lr=1e-3, bert_lr=1e-3)
    opt.exp_dir = str(tmp_path / "exp")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    tr = Trainer(opt, memory, cfg, params, packed)

    # simulate being a non-coordinator process AFTER construction.  Patch
    # the guard predicate itself, NOT jax.process_index: Orbax also reads
    # process_index and would wait on multi-host coordination that a
    # single-process runtime doesn't have (the predicate's own wiring is
    # exercised for real by the 2-process test above)
    monkeypatch.setattr(loop_mod, "_is_coordinator", lambda: False)

    dump = str(tmp_path / "valid.dump")
    tr.run_eval_epoch("valid", 0, dump_prefix=dump)
    assert not os.path.exists(dump)
    assert not os.path.exists(dump + ".err")

    ckpt = str(tmp_path / "ckpt")
    tr.save_checkpoint(ckpt, epoch=1, best={"epoch": 0, "vf": 0.0})
    assert os.path.exists(ckpt)            # Orbax save is all-process
    assert not os.path.exists(ckpt + ".meta.json")  # sidecar is p0-only

    best = tr.train()
    assert not os.path.exists(os.path.join(opt.exp_dir, "config.json"))
    assert not os.path.exists(os.path.join(opt.exp_dir, "best.json"))
    assert isinstance(best, dict)

    # back to coordinator: the same calls DO write
    monkeypatch.setattr(loop_mod, "_is_coordinator", lambda: True)
    tr.run_eval_epoch("valid", 0, dump_prefix=dump)
    assert os.path.exists(dump)
    tr.save_checkpoint(ckpt, epoch=1, best={"epoch": 0, "vf": 0.0})
    assert os.path.exists(ckpt + ".meta.json")
