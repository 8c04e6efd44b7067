"""Profiling utilities smoke tests (CPU backend)."""

import os

import numpy as np
import jax.numpy as jnp

from mpc_iris_tpu.utils.profiling import (
    StageTimers,
    annotate,
    device_memory_stats,
    device_trace,
)


def test_device_trace_writes_files(tmp_path):
    out = str(tmp_path / "trace")
    with device_trace(out):
        with annotate("test-region"):
            np.asarray(jnp.arange(128) * 2)
    files = [os.path.join(r, f) for r, _, fs in os.walk(out) for f in fs]
    assert files, "no trace files written"


def test_stage_timers_report():
    t = StageTimers()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert "a" in rep and "x2" in rep and "b" in rep


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert set(stats) == {"bytes_in_use", "peak_bytes_in_use", "bytes_limit"}
