"""Profiling utilities: trace capture produces artifacts; StepTimer stats."""

import glob
import os
import time

import jax
import jax.numpy as jnp

from ant_quantization_tpu.utils import profiling as prof


def test_trace_writes_artifacts(tmp_path):
    logdir = str(tmp_path / "trace")
    with prof.trace(logdir):
        with prof.annotate("square"):
            x = jnp.arange(128.0)
            y = jax.jit(lambda v: (v * v).sum())(x)
            prof.fence(y)
    files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), files


def test_maybe_trace_noop():
    with prof.maybe_trace(None) as d:
        assert d is None


def test_step_timer_summary():
    t = prof.StepTimer()
    for i in range(5):
        with t.step():
            time.sleep(0.002)
        t.fence(jnp.ones(4) * i)
    s = t.summary()
    assert s["steps"] == 4          # first step dropped as warmup
    assert s["mean_s"] >= 0.002
    assert s["p95_s"] >= s["p50_s"] > 0


def test_profile_dir_from_env(monkeypatch):
    monkeypatch.delenv("ANT_TPU_PROFILE", raising=False)
    assert prof.profile_dir_from_env() is None
    monkeypatch.setenv("ANT_TPU_PROFILE", "/tmp/x")
    assert prof.profile_dir_from_env() == "/tmp/x"
