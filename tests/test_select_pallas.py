"""Fused Pallas selection kernel == pure-XLA selection (interpret mode on CPU).

The kernel is exercised on TPU hardware via the bench/engines; here we pin its
semantics — exact rational argmin with d == 0 treated as +inf and ties keeping the
earlier rotation / lower DB index — against the XLA `_match_scan` path and against
a NumPy oracle, mirroring the reference's fast-vs-slow kernel parity test
(src/arch/sve.rs:79-109).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_iris_tpu.constants import BITS, N_ROTATIONS
from mpc_iris_tpu.models.engines import _match_scan, _match_scan_fused
from mpc_iris_tpu.ops.select_pallas import select_chunk


def _random_case(rng, b=8, chunk=2048, n_chunks=1, masked_fraction=0.0):
    enc = rng.integers(-1, 2, size=(b, N_ROTATIONS, BITS)).astype(np.int8)
    if masked_fraction:
        drop = rng.random((b, 1, BITS)) < masked_fraction
        enc = np.where(drop, 0, enc)
    q_enc = jnp.asarray(enc)
    q_mask = (q_enc != 0).astype(jnp.int8)
    db = rng.integers(-1, 2, size=(n_chunks, chunk, BITS)).astype(np.int8)
    db_enc = jnp.asarray(db)
    db_mask = (db_enc != 0).astype(jnp.int8)
    return q_enc, q_mask, db_enc, db_mask


def test_fused_matches_xla(rng):
    q_enc, q_mask, db_enc, db_mask = _random_case(rng)
    ref = np.asarray(_match_scan(q_enc, q_mask, db_enc, db_mask))
    got = np.asarray(
        _match_scan_fused(q_enc, q_mask, db_enc, db_mask, interpret=True)
    )
    np.testing.assert_array_equal(ref, got)


def test_fused_matches_xla_with_invalid_entries(rng):
    """Fully-masked queries/entries (den == 0 everywhere) behave as +inf."""
    q_enc, q_mask, db_enc, db_mask = _random_case(rng, masked_fraction=0.4)
    # Make one DB entry and one query completely invalid.
    db_enc = db_enc.at[0, 3].set(0)
    db_mask = db_mask.at[0, 3].set(0)
    q_enc = q_enc.at[2].set(0)
    q_mask = q_mask.at[2].set(0)
    ref = np.asarray(_match_scan(q_enc, q_mask, db_enc, db_mask))
    got = np.asarray(
        _match_scan_fused(q_enc, q_mask, db_enc, db_mask, interpret=True)
    )
    np.testing.assert_array_equal(ref, got)


def test_select_chunk_ties_prefer_low_index(rng):
    """Duplicate winning entries: the lower DB index must win."""
    b, chunk = 8, 2048
    q_enc, q_mask, db_enc, db_mask = _random_case(rng, b=b, chunk=chunk)
    # Duplicate entry 100 at positions 700 and 1500 -> distances tie exactly.
    for pos in (700, 1500):
        db_enc = db_enc.at[0, pos].set(db_enc[0, 100])
        db_mask = db_mask.at[0, pos].set(db_mask[0, 100])
    ref = np.asarray(_match_scan(q_enc, q_mask, db_enc, db_mask))
    got = np.asarray(
        _match_scan_fused(q_enc, q_mask, db_enc, db_mask, interpret=True)
    )
    np.testing.assert_array_equal(ref, got)


def test_select_chunk_oracle(rng):
    """select_chunk against a direct NumPy rational-argmin oracle."""
    b, n = 8, 2048
    den = rng.integers(0, 12801, size=(b, 32, n)).astype(np.int64)
    num = np.minimum(rng.integers(0, 12801, size=(b, 32, n)), den).astype(np.int64)
    den[:, 31, :] = 0  # padded dummy rotation
    dot = den - 2 * num

    offset = 37
    got = np.asarray(
        select_chunk(
            jnp.asarray(dot.reshape(b * 32, n), jnp.int32),
            jnp.asarray(den.reshape(b * 32, n), jnp.int32),
            offset,
            tile_b=8,
            tile_n=512,
            interpret=True,
        )
    )

    with np.errstate(divide="ignore", invalid="ignore"):
        frac = np.where(den > 0, num / den, np.inf)
    best_rot = frac.min(axis=1)  # [b, n]
    for q in range(b):
        i = int(np.argmin(best_rot[q]))  # first occurrence = lowest index
        assert got[2][q] == i + offset
        nq, dq = int(got[0][q]), int(got[1][q])
        if dq > 0:
            assert nq / dq == best_rot[q][i]
        else:
            assert np.isinf(best_rot[q][i])


# -------------------------------------------------- packed small-batch kernel


class TestPackedSmallB:
    """ops/packed_match.py: the B=1..7 serving-latency kernel (in-VMEM
    bit-plane unpack + slab dots + fused exact selection) must be
    bit-identical to the packed scan at every small batch size, including
    planted self-matches, all-invalid entries, ties, and padded tail
    chunks."""

    @staticmethod
    def _world(rng, n):
        from mpc_iris_tpu.constants import BITS_BYTES

        pat = rng.integers(0, 256, (n, BITS_BYTES), dtype=np.uint8)
        msk = rng.integers(0, 256, (n, BITS_BYTES), dtype=np.uint8)
        msk[5] = 0  # all-invalid entry: d == 0 -> +inf, never wins
        return pat, msk

    @pytest.mark.parametrize("b", [1, 2, 3, 8])
    def test_matches_packed_scan(self, rng, b):
        from mpc_iris_tpu.models.engines import (
            _match_scan_packed,
            prepare_query_planes,
        )
        from mpc_iris_tpu.ops.packed_match import match_packed_small_b

        n, chunk = 2048, 1024
        pat, msk = self._world(rng, n)
        qpat = pat[rng.integers(0, n, b)].copy()  # planted exact matches
        qmsk = msk[rng.integers(0, n, b)].copy()
        qpat[0], qmsk[0] = pat[17], msk[17]       # self-match for query 0
        q_enc, q_mask = prepare_query_planes(qpat, qmsk)
        db_pat = jnp.asarray(pat).reshape(n // chunk, chunk, -1)
        db_msk = jnp.asarray(msk).reshape(n // chunk, chunk, -1)
        want = np.asarray(_match_scan_packed(
            q_enc, q_mask, db_pat, db_msk, fused=False))
        got = np.asarray(match_packed_small_b(
            q_enc, q_mask, db_pat, db_msk, tile_n=512, interpret=True))
        assert np.array_equal(got, want)
        assert got[2, 0] == 17 and got[0, 0] == 0  # exact self-match

    def test_padded_tail_and_duplicate_tie(self, rng):
        """Zero-padded tail rows never win (mask 0 = invalid) and duplicate
        entries tie to the LOWER DB index, matching the scan semantics."""
        from mpc_iris_tpu.models.engines import (
            _match_scan_packed,
            _pad_chunks,
            prepare_query_planes,
        )
        from mpc_iris_tpu.ops.packed_match import match_packed_small_b

        n, chunk = 1500, 1024  # pads to 2048 with 548 zero rows
        pat, msk = self._world(rng, n)
        pat[700], msk[700] = pat[300], msk[300]  # duplicate pair
        qpat, qmsk = pat[300:301].copy(), msk[300:301].copy()
        q_enc, q_mask = prepare_query_planes(qpat, qmsk)
        pat_c, _ = _pad_chunks(pat, chunk)
        msk_c, _ = _pad_chunks(msk, chunk)
        db_pat, db_msk = jnp.asarray(pat_c), jnp.asarray(msk_c)
        want = np.asarray(_match_scan_packed(
            q_enc, q_mask, db_pat, db_msk, fused=False))
        got = np.asarray(match_packed_small_b(
            q_enc, q_mask, db_pat, db_msk, tile_n=512, interpret=True))
        assert np.array_equal(got, want)
        assert got[2, 0] == 300  # lower index of the duplicate pair

    def test_engine_dispatches_small_b(self, rng):
        """PlaintextEngine packed storage routes B<8 through the kernel and
        returns scan-identical results (CPU: interpret mode)."""
        from mpc_iris_tpu.models.engines import PlaintextEngine

        n = 1024
        pat, msk = self._world(rng, n)
        eng = PlaintextEngine(pat, msk, chunk=512, storage="packed")
        r = eng.match(pat[:3], msk[:3])
        assert [m.index for m in r] == [0, 1, 2]
        assert all(m.distance == 0.0 for m in r)

    def test_small_b_ok_policy(self):
        from mpc_iris_tpu.ops.packed_match import small_b_ok

        assert small_b_ok(1, 512) and small_b_ok(7, 1024)
        assert small_b_ok(8, 512)           # beats the fused scan at B=8 too
        assert not small_b_ok(9, 512)       # >8 row blocks stop compiling
        assert not small_b_ok(16, 512)      # batched fused path instead
        assert not small_b_ok(1, 500)       # tile must divide the chunk
        assert not small_b_ok(0, 512)
        assert small_b_ok(1, 512, 1_048_576)       # 1M: copies fit
        assert not small_b_ok(1, 512, 3_145_728)   # 3M: dense copies OOM

    @pytest.mark.parametrize("b", [1, 8])
    def test_fractions_kernel_matches_scan(self, rng, b):
        """The audit-spectrum variant (fractions_packed_small_b) must equal
        _fractions_scan_packed element for element, including the d == 0
        invalid entry and padded tail rows, and the fused compaction over it
        must produce identical find_under results."""
        from mpc_iris_tpu.models.engines import (
            PlaintextEngine,
            _fractions_scan_packed,
            _pad_chunks,
            prepare_query_planes,
        )
        from mpc_iris_tpu.ops.packed_match import fractions_packed_small_b

        n, chunk = 1500, 1024  # padded tail
        pat, msk = self._world(rng, n)
        qpat = pat[rng.integers(0, n, b)].copy()
        qmsk = msk[rng.integers(0, n, b)].copy()
        q_enc, q_mask = prepare_query_planes(qpat, qmsk)
        pat_c, _ = _pad_chunks(pat, chunk)
        msk_c, _ = _pad_chunks(msk, chunk)
        db_pat, db_msk = jnp.asarray(pat_c), jnp.asarray(msk_c)
        want = np.asarray(_fractions_scan_packed(
            q_enc, q_mask, db_pat, db_msk))
        got = np.asarray(fractions_packed_small_b(
            q_enc, q_mask, db_pat, db_msk, interpret=True))
        assert np.array_equal(got, want)

        # end-to-end: find_under through the engine dispatch (small-B
        # compaction jit) vs the big-batch scan path at the same threshold
        eng = PlaintextEngine(pat, msk, chunk=chunk, storage="packed")
        t = 0.47
        fast = eng.find_under(qpat, qmsk, t, compact_k=256)
        full = eng.find_under(qpat, qmsk, t)
        as_t = lambda rows: [
            [(m.index, m.distance, m.numerator, m.denominator) for m in r]
            for r in rows]
        assert as_t(fast) == as_t(full)
        assert sum(len(r) for r in full) > 0  # non-vacuous threshold


def test_congruent_duplicate_index_tie(rng):
    """Exact duplicates at columns congruent mod 128 WITHIN one selection
    tile (129 and 257 of a 512/2048 tile) must tie to the LOWER index.
    Round-5 regression: the (i, i+half) keep-first column tree covered a
    non-contiguous congruence class and kept 257 — latent since round 1;
    the column reduce now uses the index-aware compare."""
    from mpc_iris_tpu.models.engines import (
        _match_scan,
        _match_scan_fused,
        prepare_query_planes,
    )
    from mpc_iris_tpu.ops.encode import encode_grid_i8, unpack_bits

    n, b = 2048, 8
    dpat = rng.integers(0, 256, (n, 1600), dtype=np.uint8)
    dmsk = rng.integers(0, 256, (n, 1600), dtype=np.uint8)
    for lo, hi in ((129, 257), (1, 1025), (640, 1920)):
        dpat[hi], dmsk[hi] = dpat[lo], dmsk[lo]
    p = unpack_bits(jnp.asarray(dpat)).astype(jnp.int8)
    m = unpack_bits(jnp.asarray(dmsk)).astype(jnp.int8)
    enc = encode_grid_i8(p, m).reshape(1, n, -1)
    mask = m.reshape(1, n, -1)
    for lo in (129, 1, 640):
        qpat = dpat[[lo] * b].copy()
        qmsk = dmsk[[lo] * b].copy()
        q_enc, q_mask = prepare_query_planes(qpat, qmsk)
        want = np.asarray(_match_scan(q_enc, q_mask, enc, mask))
        got = np.asarray(_match_scan_fused(q_enc, q_mask, enc, mask,
                                           interpret=True))
        assert np.array_equal(got, want)
        assert (got[2] == lo).all(), (lo, got[2])
