"""Wire-format helpers shared by coordinator and participant."""

from __future__ import annotations

import asyncio

import numpy as np

from mpc_iris_tpu.constants import N_ROTATIONS, REPLY_RECORD_BYTES, TEMPLATE_BYTES

# Records per network batch (reference BATCH_SIZE, src/main.rs:473).
BATCH_RECORDS = 20_000


async def read_records(
    reader: asyncio.StreamReader, max_records: int
) -> tuple[np.ndarray, bool]:
    """Read up to ``max_records`` 62-byte reply records; tolerate EOF.

    Returns (records u16 [n, 31], eof). Partial trailing records are dropped with the
    same whole-record truncation as the reference (src/main.rs:538-555).
    """
    want = max_records * REPLY_RECORD_BYTES
    chunks = []
    got = 0
    eof = False
    while got < want:
        data = await reader.read(want - got)
        if not data:
            eof = True
            break
        chunks.append(data)
        got += len(data)
    raw = b"".join(chunks)
    n = len(raw) // REPLY_RECORD_BYTES
    if len(raw) % REPLY_RECORD_BYTES:
        # partial record at EOF — reference warns and truncates
        raw = raw[: n * REPLY_RECORD_BYTES]
    arr = np.frombuffer(raw, dtype="<u2").reshape(n, N_ROTATIONS)
    return arr, eof


async def read_template_bytes(reader: asyncio.StreamReader) -> bytes:
    """Read the fixed 3,200-byte query (src/main.rs:417-420)."""
    return await reader.readexactly(TEMPLATE_BYTES)


def records_to_bytes(records: np.ndarray) -> bytes:
    """u16 [n, 31] -> wire bytes (little-endian, row-major)."""
    return np.ascontiguousarray(records).astype("<u2").tobytes()
