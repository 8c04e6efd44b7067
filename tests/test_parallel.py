"""Sharded-engine tests on a virtual 8-device CPU mesh: sharded results must be
identical to the single-chip engines (and therefore to the scalar oracle)."""

import numpy as np
import pytest

import jax

from mpc_iris_tpu.models import MasksEngine, PlaintextEngine, ShareEngine
from mpc_iris_tpu.parallel import (
    ShardedMasksEngine,
    ShardedPlaintextEngine,
    ShardedShareEngine,
    make_mesh,
    mesh_shape_for,
)
from mpc_iris_tpu.types import EncodedBits, Template


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    queries = [Template.random(rng) for _ in range(2)]
    db = [Template.random(rng) for _ in range(19)]
    # plant a near-match so the argmin is meaningful
    db[11] = queries[1].rotated(-4)
    qpat = np.stack([t.pattern.data for t in queries])
    qmsk = np.stack([t.mask.data for t in queries])
    dpat = np.stack([t.pattern.data for t in db])
    dmsk = np.stack([t.mask.data for t in db])
    shares = np.stack([EncodedBits.random(rng).data for _ in range(19)])
    return qpat, qmsk, dpat, dmsk, shares


def test_mesh_shape_for():
    assert mesh_shape_for(8) == (8, 1)
    assert mesh_shape_for(8, batch_size=64) == (2, 4)
    assert mesh_shape_for(4, batch_size=2) == (2, 2)
    assert mesh_shape_for(1, batch_size=128) == (1, 1)


def test_devices_available():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"


def test_sharded_plaintext_matches_single(data):
    qpat, qmsk, dpat, dmsk, _ = data
    mesh = make_mesh(db=4, batch=2)
    sharded = ShardedPlaintextEngine(dpat, dmsk, mesh, chunk=4)
    single = PlaintextEngine(dpat, dmsk, chunk=16)
    rs = sharded.match(qpat, qmsk)
    r1 = single.match(qpat, qmsk)
    for a, b in zip(rs, r1):
        assert (a.index, a.numerator, a.denominator) == (
            b.index,
            b.numerator,
            b.denominator,
        )
        assert a.distance == b.distance


def test_sharded_plaintext_db_only_mesh(data):
    qpat, qmsk, dpat, dmsk, _ = data
    mesh = make_mesh(db=8, batch=1)
    sharded = ShardedPlaintextEngine(dpat, dmsk, mesh, chunk=2)
    single = PlaintextEngine(dpat, dmsk)
    rs = sharded.match(qpat, qmsk)
    r1 = single.match(qpat, qmsk)
    for a, b in zip(rs, r1):
        assert (a.index, a.distance) == (b.index, b.distance)


def test_sharded_share_stream_order_and_values(data):
    qpat, qmsk, _, _, shares = data
    mesh = make_mesh(db=4, batch=2)
    sharded = ShardedShareEngine(shares, mesh, chunk=2)
    single = ShareEngine(shares, chunk=16)
    out_s = sharded.dots(qpat, qmsk)
    out_1 = single.dots(qpat, qmsk)
    assert out_s.shape == out_1.shape
    np.testing.assert_array_equal(out_s, out_1)


def test_sharded_masks_matches_single(data):
    _, qmsk, _, dmsk, _ = data
    mesh = make_mesh(db=8, batch=1)
    sharded = ShardedMasksEngine(dmsk, mesh, chunk=2)
    single = MasksEngine(dmsk, chunk=16)
    np.testing.assert_array_equal(sharded.dots(qmsk), single.dots(qmsk))


def test_cross_shard_tie_prefers_lower_global_index():
    """Duplicate winners on different shards: the LOWER global index must win even
    when it lives on a higher-rank device (strided-by-chunk layout puts global
    chunk j on device j % D, so rank order is not index order)."""
    rng = np.random.default_rng(21)
    db = [Template.random(rng) for _ in range(32)]
    q = [Template.random(rng)]
    # chunk=4, D=4: global chunks 0..7; device of entry g = (g // 4) % 4.
    # Put identical best entries at g1=4 (device 1) and g2=16 (device 0).
    best = q[0].rotated(3)
    db[4] = best
    db[16] = best
    qpat = np.stack([t.pattern.data for t in q])
    qmsk = np.stack([t.mask.data for t in q])
    dpat = np.stack([t.pattern.data for t in db])
    dmsk = np.stack([t.mask.data for t in db])

    single = PlaintextEngine(dpat, dmsk, chunk=32).match(qpat, qmsk)
    mesh = make_mesh(db=4, batch=1, devices=jax.devices()[:4])
    sharded = ShardedPlaintextEngine(dpat, dmsk, mesh, chunk=4).match(qpat, qmsk)
    assert single[0].index == 4
    assert sharded[0].index == 4
    assert sharded[0].distance == single[0].distance


def test_sharded_packed_matches_dense(data):
    qpat, qmsk, dpat, dmsk, _ = data
    mesh = make_mesh(db=4, batch=2)
    dense = ShardedPlaintextEngine(dpat, dmsk, mesh, chunk=4, storage="dense")
    packed = ShardedPlaintextEngine(dpat, dmsk, mesh, chunk=4, storage="packed")
    rd = dense.match(qpat, qmsk)
    rp = packed.match(qpat, qmsk)
    for a, b in zip(rd, rp):
        assert (a.index, a.distance) == (b.index, b.distance)


def test_sharded_masks_packed_matches_dense(data):
    qpat, qmsk, dpat, dmsk, _ = data
    mesh = make_mesh(db=4, batch=2)
    dense = ShardedMasksEngine(dmsk, mesh, chunk=4, storage="dense")
    packed = ShardedMasksEngine(dmsk, mesh, chunk=4, storage="packed")
    np.testing.assert_array_equal(dense.dots(qmsk), packed.dots(qmsk))


def test_local_spans_tile_strided_layout():
    """Single-process: local_db_span covers the whole "db" axis and
    local_entry_spans enumerates exactly the strided-by-chunk blocks, tiling
    [0, N) without gaps or overlap (the multi-host loading contract)."""
    from mpc_iris_tpu.parallel import multihost
    from mpc_iris_tpu.parallel.sharded import local_db_span

    mesh = make_mesh(db=4, batch=2)
    lo, hi = local_db_span(mesh)
    assert (lo, hi) == (0, 4)  # one process addresses everything

    n, chunk = 37, 4  # deliberately ragged tail
    spans = multihost.local_entry_spans(n, chunk, mesh)
    seen = np.zeros(n, dtype=int)
    for s, e in spans:
        assert 0 <= s < e <= n
        seen[s:e] += 1
    assert (seen == 1).all()
    # block structure: spans start at multiples of chunk*D
    d = mesh.shape["db"]
    assert all(s % (chunk * d) == 0 for s, _ in spans)


def test_local_spans_apply_engine_chunk_clamp(monkeypatch):
    """Regression: the engines clamp oversized chunks
    (sharded.effective_chunk), and local_entry_spans must apply the SAME
    clamp — a rank prefetching at unclamped offsets would zero-fill every
    row the engine actually reads. Simulates rank 1 of a 2-host, 8-device
    party: requested chunk 32768 over n=100,000 clamps to 12,500, so rank 1
    (devices 4..7) must fetch rows [50,000, 100,000)."""
    from types import SimpleNamespace

    import jax as _jax

    from mpc_iris_tpu.parallel import multihost
    from mpc_iris_tpu.parallel.sharded import effective_chunk

    devs = np.array(
        [SimpleNamespace(process_index=i // 4) for i in range(8)]
    ).reshape(8, 1)
    mesh = SimpleNamespace(
        axis_names=("db", "batch"), devices=devs, shape={"db": 8, "batch": 1}
    )
    monkeypatch.setattr(_jax, "process_index", lambda: 1)

    n, requested = 100_000, 32_768
    c = effective_chunk(requested, n, 8)
    assert c == 12_500
    spans = multihost.local_entry_spans(n, requested, mesh)
    assert spans == [(4 * c, n)]  # pre-fix: [] (start 131072 > n)
    # and rank 0 gets the complementary prefix
    monkeypatch.setattr(_jax, "process_index", lambda: 0)
    assert multihost.local_entry_spans(n, requested, mesh) == [(0, 4 * c)]


def test_graft_entry_dryrun_serving_stack():
    """The driver contract (__graft_entry__.dryrun_multichip) must keep
    compiling AND executing the full serving stack on the virtual mesh:
    sharded-party TCP serving (solo + micro-batched), the audit wire, the
    chain wire, and an enroll append+requery — each asserted bit-exact
    against the single-chip oracles inside the dryrun itself."""
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(len(jax.devices()))


def test_multihost_two_process_party():
    """A REAL 2-process jax.distributed universe (Gloo over localhost) runs
    the sharded match step with process-local DB loading — the multi-host
    party path (SURVEY §5 distributed comm) executed, not just unit-tested.
    Subprocess-isolated because jax.distributed.initialize is process-global
    and this test process already owns an 8-device local backend."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    script = Path(__file__).resolve().parents[1] / "scripts" / "multihost_smoke.py"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # the forked ranks size their own devices
    env["PYTHONPATH"] = str(script.parents[1])
    out = subprocess.run(
        [sys.executable, str(script), "--procs", "2"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "multihost smoke: OK" in out.stdout


def test_sharded_packed_small_b_kernel(data):
    """B < 8 with a tile-aligned chunk routes each shard through the packed
    small-batch kernel (ops/packed_match.py) inside shard_map — winners must
    equal the single-chip engine's (which uses the same dispatch policy)."""
    rng = np.random.default_rng(77)
    n = 1024  # >= 512/shard so effective_chunk keeps the 512 tile alignment
    dpat = rng.integers(0, 256, (n, 1600), dtype=np.uint8)
    dmsk = rng.integers(0, 256, (n, 1600), dtype=np.uint8)
    qpat, qmsk = dpat[[3, 700, 41]].copy(), dmsk[[3, 700, 41]].copy()
    mesh = make_mesh(db=2, batch=1)
    sharded = ShardedPlaintextEngine(dpat, dmsk, mesh, chunk=512,
                                     storage="packed")
    assert sharded.chunk % 512 == 0  # the small-b kernel tile must divide
    single = PlaintextEngine(dpat, dmsk, chunk=512, storage="packed")
    rs = sharded.match(qpat, qmsk)
    r1 = single.match(qpat, qmsk)
    for a, b, want in zip(rs, r1, (3, 700, 41)):
        assert (a.index, a.numerator, a.denominator, a.distance) == (
            b.index, b.numerator, b.denominator, b.distance)
        assert a.index == want and a.distance == 0.0


def test_sharded_cross_shard_duplicate_tie(data):
    """Exact duplicates living on DIFFERENT shards must tie to the lower
    GLOBAL index. Adversarial under the strided-by-chunk layout: shard rank
    order is NOT index order, so the cross-shard fold must compare carried
    indices (fraction_allmin), not gather slots — entry 5 (shard 1) must
    beat its duplicate at entry 16 (shard 0)."""
    rng = np.random.default_rng(11)
    n, chunk, d_shards = 32, 4, 4
    dpat = rng.integers(0, 256, (n, 1600), dtype=np.uint8)
    dmsk = rng.integers(0, 256, (n, 1600), dtype=np.uint8)
    # global chunk of entry e = e // 4; shard of chunk g = g % 4 (strided):
    # 5 -> chunk 1 -> shard 1;  16 -> chunk 4 -> shard 0
    dpat[16], dmsk[16] = dpat[5], dmsk[5]
    qpat, qmsk = dpat[5:6].copy(), dmsk[5:6].copy()
    mesh = make_mesh(db=d_shards, batch=1)
    sharded = ShardedPlaintextEngine(dpat, dmsk, mesh, chunk=chunk,
                                     storage="dense")
    single = PlaintextEngine(dpat, dmsk, chunk=8)
    rs = sharded.match(qpat, qmsk)[0]
    r1 = single.match(qpat, qmsk)[0]
    assert (rs.index, rs.distance) == (r1.index, r1.distance) == (5, 0.0)
