"""Direct unit tests of the wire helpers (the protocol tests cover them through
live servers; these pin the byte-level math, especially batched entry-group
truncation)."""

import asyncio

import numpy as np
import pytest

from mpc_iris_tpu.protocol.coordinator import _rechunk
from mpc_iris_tpu.protocol.wire import (
    BATCHED_MAGIC,
    batched_query_bytes,
    batched_records_to_bytes,
    read_batched_query,
    read_batched_records,
    read_records,
)


def _run_with(data: bytes, fn):
    """Build a fed StreamReader inside a running loop and await fn(reader)."""

    async def go():
        r = asyncio.StreamReader()
        r.feed_data(data)
        r.feed_eof()
        return await fn(r)

    return asyncio.run(go())


def test_batched_query_roundtrip(rng):
    pats = rng.integers(0, 256, (5, 1600), dtype=np.uint8)
    msks = rng.integers(0, 256, (5, 1600), dtype=np.uint8)
    raw = batched_query_bytes(pats, msks)
    assert raw.startswith(BATCHED_MAGIC)
    p2, m2 = _run_with(raw, read_batched_query)
    np.testing.assert_array_equal(p2, pats)
    np.testing.assert_array_equal(m2, msks)


def test_batched_query_rejects_reference_bytes(rng):
    raw = rng.integers(0, 256, 3200, dtype=np.uint8).tobytes()
    with pytest.raises(ValueError, match="batched-wire"):
        _run_with(raw, read_batched_query)


def test_batched_records_roundtrip_and_partial_group_truncation(rng):
    b, n = 3, 7
    block = rng.integers(0, 1 << 16, (n, b, 31), dtype=np.uint16)
    raw = batched_records_to_bytes(block)
    assert len(raw) == n * b * 62

    got, eof = _run_with(raw, lambda r: read_batched_records(r, b, max_records=100))
    assert eof  # stream ended
    np.testing.assert_array_equal(got, block)

    # Drop half an entry-group: the partial group must be discarded whole.
    cut = raw[: (n - 1) * b * 62 + b * 31]  # mid-group
    got, eof = _run_with(cut, lambda r: read_batched_records(r, b, max_records=100))
    assert eof and got.shape == (n - 1, b, 31)
    np.testing.assert_array_equal(got, block[: n - 1])


def test_read_records_partial_record_truncation(rng):
    recs = rng.integers(0, 1 << 16, (4, 31), dtype=np.uint16)
    raw = recs.astype("<u2").tobytes()
    got, eof = _run_with(raw[:-5], lambda r: read_records(r, max_records=100))
    assert eof and got.shape == (3, 31)
    np.testing.assert_array_equal(got, recs[:3])


def test_rechunk_entry_major(rng):
    chunks = [rng.integers(0, 9, (n, 2, 31), dtype=np.uint16) for n in (5, 3, 9, 1)]
    out = list(_rechunk(iter(chunks), 7, squeeze=False, entry_axis=0))
    assert [o.shape[0] for o in out] == [7, 7, 4]
    np.testing.assert_array_equal(
        np.concatenate(chunks, axis=0), np.concatenate(out, axis=0)
    )
