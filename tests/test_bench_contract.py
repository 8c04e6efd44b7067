"""Driver contract: bench.py must print exactly ONE JSON line on stdout with
the agreed keys, for every mode (the driver records it as BENCH_r{N}.json)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("mode", ["packed", "share-keyed"])
def test_bench_prints_one_json_line(mode):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--mode", mode,
         "--db", "1024", "--chunk", "512", "--batch", "8", "--iters", "1"],
        capture_output=True, text=True, env=env, timeout=900, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0 and rec["unit"] == "comparisons/s"
    assert rec["vs_baseline"] == pytest.approx(rec["value"] / 1e9)
    # criterion-grade companions (dispersion + sample count + warmup)
    assert rec["samples"] >= 1 and rec["mad_s"] >= 0 and rec["warmup_s"] >= 0


def test_bench_latency_mode_one_json_line():
    """--latency reports p50 seconds/query (B=1) and still prints exactly one
    JSON line with the agreed keys."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--latency",
         "--db", "1024", "--chunk", "512", "--iters", "2"],
        capture_output=True, text=True, env=env, timeout=900, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0 and rec["unit"] == "s/query"
    assert rec["vs_baseline"] == pytest.approx(
        1024 * 31 / rec["value"] / 1e9
    )
    # B=1 is rejected as an explicit contradiction only when --batch is given.
    out2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--latency",
         "--batch", "8", "--db", "1024"],
        capture_output=True, text=True, env=env, timeout=60, cwd=REPO,
    )
    assert out2.returncode != 0


class TestStats:
    """Criterion-grade statistics (utils/stats.py): robust summaries, Tukey
    outlier rejection, and the regression ledger."""

    def test_summary_median_mad(self):
        from mpc_iris_tpu.utils.stats import summarize_timings

        s = summarize_timings([3.0, 1.0, 2.0])
        assert s["n"] == 3 and s["min"] == 1.0 and s["max"] == 3.0
        assert s["median"] == 2.0 and s["mad"] == 1.0
        assert s["outliers_rejected"] == 0 and s["median_clean"] == 2.0
        # even-N median interpolates
        assert summarize_timings([1.0, 2.0, 3.0, 4.0])["median"] == 2.5

    def test_outlier_rejection_tukey(self):
        from mpc_iris_tpu.utils.stats import summarize_timings

        # a 100x straggler (GC pause / cache miss) must not move the
        # post-rejection median
        s = summarize_timings([1.0, 1.01, 0.99, 1.02, 0.98, 100.0])
        assert s["outliers_rejected"] == 1
        assert abs(s["median_clean"] - 1.0) < 0.02
        assert s["max"] == 100.0  # raw extremes still reported

    def test_summary_rejects_empty(self):
        from mpc_iris_tpu.utils.stats import summarize_timings

        with pytest.raises(ValueError):
            summarize_timings([])

    def test_history_ledger_roundtrip(self, tmp_path, monkeypatch):
        from mpc_iris_tpu.utils import stats

        monkeypatch.delenv("MPC_IRIS_NO_BENCH_HISTORY", raising=False)
        path = str(tmp_path / "hist.jsonl")
        e1 = {"key": "packed/db1024/b8/c512", "value": 100.0,
              "date": "2026-08-19"}
        assert stats.append_history(e1, path) is None  # no prior entry
        e2 = {"key": "packed/db1024/b8/c512", "value": 103.0,
              "date": "2026-08-20"}
        prev = stats.append_history(e2, path)
        assert prev["value"] == 100.0
        line = stats.delta_line(e2, prev)
        assert "+3.0%" in line and "2026-08-19" in line
        # other keys don't cross-match
        e3 = {"key": "share/db1024/b8/c512", "value": 50.0}
        assert stats.append_history(e3, path)is None
        assert len(stats.load_history(path)) == 3

    def test_history_disabled_by_env(self, tmp_path, monkeypatch):
        from mpc_iris_tpu.utils import stats

        monkeypatch.setenv("MPC_IRIS_NO_BENCH_HISTORY", "1")
        path = str(tmp_path / "hist.jsonl")
        assert stats.append_history({"key": "k", "value": 1.0}, path) is None
        assert stats.load_history(path) == []
