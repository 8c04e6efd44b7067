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
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0 and rec["unit"] == "comparisons/s"
    assert rec["vs_baseline"] == pytest.approx(rec["value"] / 1e9)


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
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
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
