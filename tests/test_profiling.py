"""Profiling utilities: step timer stats and a jax.profiler trace smoke
(CPU)."""

import os

import jax
import jax.numpy as jnp

from nbest_asr_tpu.utils.profiling import StepTimer, annotate, trace


def test_step_timer_summary():
    import time

    t = StepTimer(warmup=1)
    for _ in range(4):
        with t.step():
            time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 3
    assert 0.005 < s["mean_s"] < 0.5
    assert s["p95_s"] >= s["p50_s"]


def test_trace_smoke(tmp_path):
    logdir = str(tmp_path / "trace")
    f = jax.jit(lambda x: jnp.tanh(x) @ x)
    x = jnp.ones((64, 64), jnp.float32)
    with trace(logdir):
        with annotate("matmul_phase"):
            f(x).block_until_ready()
    # a trace directory with at least one event file appears
    found = []
    for dirpath, _, files in os.walk(logdir):
        found += files
    assert found, "no trace artifacts written"
