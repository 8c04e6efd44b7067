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
