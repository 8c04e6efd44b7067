"""End-to-end N-party protocol tests on localhost — the integration coverage the
reference lacks entirely (SURVEY.md section 4: "the multi-process protocol path is
entirely untested").

Spins up in-process asyncio participant servers holding real share DBs, runs
coordinator queries against them, and checks the reconstructed min-distance winner
against the plaintext scalar oracle.
"""

import asyncio

import numpy as np
import pytest

from mpc_iris_tpu.models import MasksEngine, ShareEngine
from mpc_iris_tpu.ops.encode import encode_template
from mpc_iris_tpu.protocol import Coordinator, ParticipantServer
from mpc_iris_tpu.protocol.coordinator import _rechunk
from mpc_iris_tpu.types import Template


def build_party_data(rng, db, n_parties):
    mats = [
        np.zeros((len(db), 12800), dtype=np.uint16) for _ in range(n_parties)
    ]
    for i, t in enumerate(db):
        for p, s in enumerate(encode_template(t).share(n_parties, rng)):
            mats[p][i] = s.data
    return mats


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(99)
    db = [Template.random(rng) for _ in range(23)]
    query = Template.random(rng)
    db[17] = query.rotated(5)  # plant the winner
    masks = np.stack([t.mask.data for t in db])
    return rng, db, query, masks


def run_protocol(world, n_parties, local_share=False, batch_records=7, chunk=8):
    rng, db, query, masks = world
    mats = build_party_data(rng, db, n_parties)

    async def go():
        local_engine = None
        remote_mats = mats
        if local_share:
            local_engine = ShareEngine(mats[0], chunk=chunk)
            remote_mats = mats[1:]
        servers = [
            ParticipantServer(ShareEngine(m, chunk=chunk), "127.0.0.1", 0)
            for m in remote_mats
        ]
        addrs = [await s.start() for s in servers]
        coord = Coordinator(
            MasksEngine(masks, chunk=chunk),
            addrs,
            local_engine=local_engine,
            batch_records=batch_records,
        )
        try:
            return await coord.query(query)
        finally:
            for s in servers:
                await s.close()

    return asyncio.run(go())


class TestProtocol:
    def test_two_party_matches_oracle(self, world):
        rng, db, query, masks = world
        outcome = run_protocol(world, 2)
        oracle = np.array([query.distance(t) for t in db])
        assert outcome.total == len(db)
        assert outcome.index == int(np.argmin(oracle))
        assert outcome.distance == oracle.min()

    def test_three_party(self, world):
        rng, db, query, masks = world
        outcome = run_protocol(world, 3, batch_records=23)
        oracle = np.array([query.distance(t) for t in db])
        assert (outcome.index, outcome.distance) == (
            int(np.argmin(oracle)),
            oracle.min(),
        )

    def test_coordinator_holds_share(self, world):
        """--share mode: coordinator is also a participant (unimplemented in the
        reference, src/main.rs:482)."""
        rng, db, query, masks = world
        outcome = run_protocol(world, 3, local_share=True)
        oracle = np.array([query.distance(t) for t in db])
        assert (outcome.index, outcome.distance) == (
            int(np.argmin(oracle)),
            oracle.min(),
        )

    def test_coordinator_holds_keyed_share(self, world):
        """--share keyed:... mode: the coordinator's own share is PRF-backed
        (SPEC section 4.2) and regenerated from the 32-byte key — no share
        data at all on the coordinator. Winner must match both the oracle and
        the file-served run above."""
        from mpc_iris_tpu import native
        from mpc_iris_tpu.models import KeyedShareEngine

        rng, db, query, masks = world
        enc = np.stack([encode_template(t).data for t in db])
        key = native.derive_insecure_key(31)
        shares = native.share_split(enc, 3, key)

        async def go():
            servers = [
                ParticipantServer(ShareEngine(m, chunk=8), "127.0.0.1", 0)
                for m in shares[1:]
            ]
            addrs = [await s.start() for s in servers]
            coord = Coordinator(
                MasksEngine(masks, chunk=8), addrs,
                local_engine=KeyedShareEngine(key, 0, len(db), chunk=8),
                batch_records=7,
            )
            try:
                return await coord.query(query)
            finally:
                for s in servers:
                    await s.close()

        outcome = asyncio.run(go())
        oracle = np.array([query.distance(t) for t in db])
        assert (outcome.index, outcome.distance) == (
            int(np.argmin(oracle)), oracle.min(),
        )

    def test_single_party_is_plaintext(self, world):
        """One party holds the whole encoding: protocol == plaintext pipeline."""
        rng, db, query, masks = world
        outcome = run_protocol(world, 1)
        oracle = np.array([query.distance(t) for t in db])
        assert outcome.distance == oracle.min()

    def test_shorter_party_truncates(self, world):
        """A party with fewer entries truncates the comparison to the common
        prefix (reference src/main.rs:565-569)."""
        rng, db, query, masks = world
        mats = build_party_data(rng, db, 2)

        async def go():
            servers = [
                ParticipantServer(ShareEngine(mats[0], chunk=8), "127.0.0.1", 0),
                ParticipantServer(ShareEngine(mats[1][:11], chunk=8), "127.0.0.1", 0),
            ]
            addrs = [await s.start() for s in servers]
            coord = Coordinator(MasksEngine(masks, chunk=8), addrs, batch_records=7)
            try:
                return await coord.query(query)
            finally:
                for s in servers:
                    await s.close()

        outcome = asyncio.run(go())
        assert outcome.total == 11
        oracle = np.array([query.distance(t) for t in db[:11]])
        assert outcome.index == int(np.argmin(oracle))
        assert outcome.distance == oracle.min()


class TestRechunk:
    def test_rechunk_sizes(self):
        chunks = [np.ones((1, n, 31), dtype=np.uint16) * i
                  for i, n in enumerate([5, 3, 9, 1])]
        out = list(_rechunk(iter(chunks), 7))
        sizes = [o.shape[0] for o in out]
        assert sizes == [7, 7, 4]
        total_in = np.concatenate([c[0] for c in chunks], axis=0)
        total_out = np.concatenate(out, axis=0)
        np.testing.assert_array_equal(total_in, total_out)


class TestBatchedWire:
    def test_batched_matches_oracle_and_single(self, world):
        """Batched wire: B queries in one round, each winner == scalar oracle."""
        rng, db, query, masks = world
        mats = build_party_data(rng, db, 2)
        queries = [query, Template.random(np.random.default_rng(5)), db[3]]

        async def go():
            servers = [
                ParticipantServer(ShareEngine(m, chunk=8), "127.0.0.1", 0,
                                  wire="batched")
                for m in mats
            ]
            addrs = [await s.start() for s in servers]
            coord = Coordinator(MasksEngine(masks, chunk=8), addrs,
                                batch_records=7)
            try:
                return await coord.query_batch(queries)
            finally:
                for s in servers:
                    await s.close()

        outcomes = asyncio.run(go())
        assert len(outcomes) == 3
        for q, outcome in zip(queries, outcomes):
            oracle = np.array([q.distance(t) for t in db])
            assert outcome.total == len(db)
            assert outcome.index == int(np.argmin(oracle))
            assert outcome.distance == oracle.min()

    def test_byte_budgeted_records_per_read(self):
        """Read rounds are sized in bytes, not entry-groups: large B shrinks
        the per-round group count so coordinator memory stays bounded
        (VERDICT weak #3 / ADVICE coordinator.py:286)."""
        from mpc_iris_tpu.constants import REPLY_RECORD_BYTES
        from mpc_iris_tpu.protocol.wire import (
            BATCH_RECORDS, READ_BYTE_BUDGET, records_per_read,
        )

        assert records_per_read(1) == BATCH_RECORDS  # reference batching kept
        for b in (256, 4096, 65536):
            r = records_per_read(b)
            assert 1 <= r <= BATCH_RECORDS
            assert r * b * REPLY_RECORD_BYTES <= READ_BYTE_BUDGET
        assert records_per_read(65536) >= 1  # never stalls at the B cap

    def test_batched_b256_multi_round(self, world, monkeypatch):
        """B=256 end-to-end with a budget that forces multiple byte-budgeted
        read rounds; every winner matches the scalar oracle."""
        import mpc_iris_tpu.protocol.wire as wire_mod

        rng, db, query, masks = world
        mats = build_party_data(rng, db, 2)
        qrng = np.random.default_rng(11)
        queries = [query] + [Template.random(qrng) for _ in range(255)]
        queries[100] = db[4]  # plant a mid-batch exact hit
        # 7 entry-groups per round at B=256 -> 4 rounds over the 23-entry DB.
        monkeypatch.setattr(
            wire_mod, "READ_BYTE_BUDGET", 7 * 256 * 62, raising=True
        )

        async def go():
            servers = [
                ParticipantServer(ShareEngine(m, chunk=8), "127.0.0.1", 0,
                                  wire="batched")
                for m in mats
            ]
            addrs = [await s.start() for s in servers]
            coord = Coordinator(MasksEngine(masks, chunk=8), addrs)
            try:
                return await coord.query_batch(queries)
            finally:
                for s in servers:
                    await s.close()

        outcomes = asyncio.run(go())
        assert len(outcomes) == 256
        for q, outcome in zip(queries, outcomes):
            oracle = np.array([q.distance(t) for t in db])
            assert outcome.total == len(db)
            assert outcome.index == int(np.argmin(oracle))
            assert outcome.distance == oracle.min()

    def test_batched_with_local_share(self, world):
        rng, db, query, masks = world
        mats = build_party_data(rng, db, 3)
        queries = [query, db[2]]

        async def go():
            servers = [
                ParticipantServer(ShareEngine(m, chunk=8), "127.0.0.1", 0,
                                  wire="batched")
                for m in mats[1:]
            ]
            addrs = [await s.start() for s in servers]
            coord = Coordinator(
                MasksEngine(masks, chunk=8), addrs,
                local_engine=ShareEngine(mats[0], chunk=8), batch_records=23,
            )
            try:
                return await coord.query_batch(queries)
            finally:
                for s in servers:
                    await s.close()

        outcomes = asyncio.run(go())
        for q, outcome in zip(queries, outcomes):
            oracle = np.array([q.distance(t) for t in db])
            assert (outcome.index, outcome.distance) == (
                int(np.argmin(oracle)), oracle.min(),
            )


class TestRobustness:
    def test_masks_only_coordinator_rejected(self, world):
        rng, db, query, masks = world
        with pytest.raises(ValueError):
            Coordinator(MasksEngine(masks, chunk=8), participants=[])

    def test_oversized_batch_rejected(self, world):
        rng, db, query, masks = world
        coord = Coordinator.__new__(Coordinator)  # skip __init__ checks
        coord.participants = []
        coord.masks_engine = None
        coord.local_engine = None
        coord.batch_records = 7
        with pytest.raises(ValueError):
            asyncio.run(coord.query_batch([query] * 0))

    def test_client_disconnect_releases_worker(self, world):
        """Dropping the connection mid-stream must not strand the producer
        thread (pre-fix it blocked forever on the full queue)."""
        import threading
        import time as _time

        rng, db, query, masks = world
        mats = build_party_data(rng, db, 1)

        async def go():
            server = ParticipantServer(ShareEngine(mats[0], chunk=4), "127.0.0.1", 0)
            host, port = await server.start()
            reader, writer = await asyncio.open_connection(host, port)
            writer.write(query.to_bytes())
            await writer.drain()
            await reader.read(62)  # first bytes arrive, then hang up
            writer.close()
            await writer.wait_closed()
            await asyncio.sleep(1.0)  # let the pump notice and exit
            await server.close()

        before = threading.active_count()
        asyncio.run(go())
        deadline = _time.monotonic() + 5
        while threading.active_count() > before and _time.monotonic() < deadline:
            _time.sleep(0.1)
        assert threading.active_count() <= before

    def test_unreachable_participant_clear_error(self, world):
        rng, db, query, masks = world
        coord = Coordinator(MasksEngine(masks, chunk=8), [("127.0.0.1", 1)])
        with pytest.raises(ConnectionError, match="cannot reach"):
            asyncio.run(coord.query(query))

    def test_wire_mode_mismatch_fails_fast(self, world):
        """A reference-wire client hitting a batched server gets a clean
        rejection (magic mismatch) instead of garbage records."""
        rng, db, query, masks = world
        mats = build_party_data(rng, db, 1)

        async def go():
            server = ParticipantServer(ShareEngine(mats[0], chunk=8),
                                       "127.0.0.1", 0, wire="batched")
            host, port = await server.start()
            reader, writer = await asyncio.open_connection(host, port)
            writer.write(query.to_bytes())  # reference-wire bytes
            await writer.drain()
            data = await reader.read(62)  # server must close without records
            writer.close()
            await writer.wait_closed()
            await server.close()
            return data

        assert asyncio.run(go()) == b""
