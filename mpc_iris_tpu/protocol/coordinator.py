"""Coordinator/resolver role: query fan-out, share aggregation, distance decode
(reference src/main.rs:453-644).

Per query: connect to every participant, send the 3,200-byte template, then per
read round (20,000 records, byte-budgeted down for large batches — wire.py
``records_per_read``) (a) read each party's dot-share stream, (b) pull locally
computed denominators from the masks engine (device compute overlapping network
reads — the reference's `join!`, src/main.rs:560), (c) one fused device dispatch:
wrapping share sum + distance decode + rotation-min + entry-argmin. EOF-tolerant:
streams are truncated to whole records and all sources aligned to the shortest
prefix (src/main.rs:538-569).

Optionally the coordinator also holds a share itself (``local_engine``) — the
reference declares this but leaves it unimplemented (src/main.rs:136, 482).
"""

from __future__ import annotations

import asyncio
import logging
import math
import struct
import time
from collections import deque
from dataclasses import dataclass

import jax
import numpy as np

from mpc_iris_tpu.constants import N_ROTATIONS
from mpc_iris_tpu.ops.decode import fraction_argmin, fraction_min_rotations, fraction_to_f64
from mpc_iris_tpu.protocol.drain import ConnectionTracker, drain_server
from mpc_iris_tpu.protocol.pump import StreamPump
from mpc_iris_tpu.protocol.wire import read_records, records_per_read
from mpc_iris_tpu.types import Template

log = logging.getLogger("mpc_iris_tpu.coordinator")


class StalledPartyError(ConnectionError):
    """A connected participant produced no complete read round within the
    coordinator's per-round deadline.

    Policy (docs/SPEC.md section 5): the query is ABORTED loudly, naming the
    stalled part(ies) — never silently truncated. A uniqueness check over a
    truncated scan could falsely report "unique" while the unseen tail holds a
    match, so availability failures must surface to the operator, not to the
    verdict. The reference has no deadline at all (a silent participant hangs
    its coordinator forever, src/main.rs:538-555); this is the refinement."""


class TruncatedScanError(ConnectionError):
    """The reply streams ended before the full masks DB was scanned
    (strict-scan mode).

    The reference tolerates early EOF by truncating to the shortest common
    prefix (src/main.rs:538-569) — correct for its self-generated throughput
    loop, but a uniqueness VERDICT over a truncated scan can falsely report
    "unique" while the unseen tail holds a match (a participant that crashes
    mid-stream looks exactly like a clean early EOF). ``strict_scan=True``
    turns that silent truncation into this loud failure. It stays opt-in
    because --watch DB growth makes transiently unequal counts legitimate
    (masks may run ahead of a party's share file between syncs — SPEC
    section 6.2)."""


class _Stalled:
    """Sentinel read result marking the party whose round timed out."""

    __slots__ = ("party",)

    def __init__(self, party: str):
        self.party = party


@jax.jit
def _sum_decode_argmin_device_batch(shares, dens):
    """Batched single-dispatch step: tuple of P uint16 [n, B, 31] ENTRY-major
    dot-share batches + denominators -> int32 [3, B] winners (same semantics
    as :func:`_sum_decode_argmin_device`, vectorized over queries; entry-major
    in = zero host transposes on the batched path)."""
    import jax.numpy as jnp

    dots = shares[0]
    for s in shares[1:]:  # additive reconstruction wraps mod 2^16 (uint16 add)
        dots = dots + s
    den = dens.astype(jnp.int32)
    num = ((den - dots.astype(jnp.int32)) & jnp.int32(0xFFFF)) >> 1
    n_r, d_r, _ = fraction_min_rotations(num, den, axis=2)  # [n, B]
    n_b, d_b, i_b = fraction_argmin(n_r, d_r, axis=0)  # over entries -> [B]
    return jnp.stack([n_b, d_b, i_b])


@jax.jit
def _sum_decode_argmin_device(shares, dens):
    """Single-dispatch step for one received batch: tuple of P uint16 [n, 31]
    per-party dot-share batches + denominators -> stacked int32 [3] winner
    (num, den, batch-local index).

    Share reconstruction (wrapping sum mod 2^16, reference src/main.rs:597-612),
    numerator = ((d - dot) mod 2^16) >> 1 (the wrapping sub of reference
    src/lib.rs:104), rotation-min and entry-argmin all fuse into ONE device
    dispatch per batch — the 1-vCPU host only moves bytes. Selection is the
    exact rational argmin with d == 0 as +inf — provably bit-identical
    (index AND value) to the reference's f64 compare chain on this domain:
    distinct fractions with d <= 12,800 are >= 1/12,800^2 apart while the
    correctly-rounded f64 quotients are perturbed < 2^-52, so f64 order ==
    exact rational order (docs/SPEC.md section 5.1).
    """
    import jax.numpy as jnp

    dots = shares[0]
    for s in shares[1:]:
        dots = dots + s
    den = dens.astype(jnp.int32)
    num = ((den - dots.astype(jnp.int32)) & jnp.int32(0xFFFF)) >> 1
    n_r, d_r, _ = fraction_min_rotations(num, den, axis=1)
    n_b, d_b, i_b = fraction_argmin(n_r, d_r, axis=0)
    return jnp.stack([n_b, d_b, i_b])


@jax.jit
def _sum_decode_minfrac_device_batch(shares, dens):
    """Batched threshold-audit step: tuple of P uint16 [n, B, 31] ENTRY-major
    dot-share batches + denominators -> int32 [2, n, B] per-entry minimal
    (numerator, denominator) fractions (the per-entry sibling of
    :func:`_sum_decode_argmin_device_batch`)."""
    import jax.numpy as jnp

    dots = shares[0]
    for s in shares[1:]:
        dots = dots + s
    den = dens.astype(jnp.int32)
    num = ((den - dots.astype(jnp.int32)) & jnp.int32(0xFFFF)) >> 1
    n_r, d_r, _ = fraction_min_rotations(num, den, axis=2)  # [n, B]
    return jnp.stack([n_r, d_r])


@jax.jit
def _sum_decode_minfrac_device(shares, dens):
    """Single-dispatch per-entry decode for the threshold-audit path: tuple of
    P uint16 [n, 31] per-party dot-share batches + denominators -> int32
    [2, n] per-entry minimal (numerator, denominator) fractions.

    Identical share reconstruction and wrapping decode as
    :func:`_sum_decode_argmin_device`, but the entry axis is kept (only the
    rotation axis is min-folded) so the host can list EVERY entry under a
    threshold instead of just the argmin winner."""
    import jax.numpy as jnp

    dots = shares[0]
    for s in shares[1:]:
        dots = dots + s
    den = dens.astype(jnp.int32)
    num = ((den - dots.astype(jnp.int32)) & jnp.int32(0xFFFF)) >> 1
    n_r, d_r, _ = fraction_min_rotations(num, den, axis=1)  # [n]
    return jnp.stack([n_r, d_r])


def _frac_less_host(n1: int, d1: int, n2: int, d2: int) -> bool:
    """Exact n1/d1 < n2/d2 on Python ints, d == 0 as +inf."""
    if d1 == 0:
        return False
    if d2 == 0:
        return True
    return n1 * d2 < n2 * d1


async def _close_all(conns, pumps):
    """Release worker pumps (they may be blocked on full queues) and sockets."""
    for p in pumps:
        if p is not None:
            p.close()
    for _, w in conns:
        w.close()
    await asyncio.gather(
        *[w.wait_closed() for _, w in conns], return_exceptions=True
    )


@dataclass
class QueryOutcome:
    index: int
    distance: float
    total: int  # entries compared


@dataclass
class MatchAt:
    """One under-threshold hit from a dedup audit."""

    index: int
    distance: float  # reference-exact f64 decode of the winning fraction


@dataclass
class UnderThresholdOutcome:
    """Result of `Coordinator.query_under`: every DB entry whose distance is
    strictly under the threshold (ascending distance, index within ties).

    ``limit_exceeded``: the audit found MORE matches than the caller's
    ``limit`` allowed; ``matches`` is empty and must not be treated as "no
    duplicates" (the serving front closes such clients without a reply)."""

    matches: list[MatchAt]
    total: int  # entries compared
    limit_exceeded: bool = False


def _rechunk(stream, size: int, squeeze: bool = True, entry_axis: int = 1):
    """Re-buffer a stream of u16 arrays into exactly-``size``-entry batches
    along the entry axis (the final batch may be short). With ``squeeze`` the
    leading B=1 axis is dropped (reference-wire [1, n, 31] layout); batched
    entry-major streams pass squeeze=False, entry_axis=0 ([n, B, 31])."""
    buf = []
    have = 0

    def view(chunk):
        return chunk[0] if squeeze else chunk

    ax = 0 if squeeze else entry_axis
    for chunk in stream:
        arr = view(chunk)
        buf.append(arr)
        have += arr.shape[ax]
        while have >= size:
            cat = np.concatenate(buf, axis=ax) if len(buf) > 1 else buf[0]
            head, rest = np.split(cat, [size], axis=ax)
            yield head
            buf = [rest] if rest.shape[ax] else []
            have = rest.shape[ax]
    if have:
        yield np.concatenate(buf, axis=ax) if len(buf) > 1 else buf[0]


class Coordinator:
    def __init__(self, masks_engine, participants: list[tuple[str, int]],
                 local_engine=None, batch_records: int | None = None,
                 ssl_context=None, round_timeout: float | None = None,
                 strict_scan: bool = False, chain: bool = False):
        """masks_engine: MasksEngine/ShardedMasksEngine over the public masks DB.
        participants: (host, port) of each share-holding party.
        local_engine: optional ShareEngine if this process also holds a share.
        batch_records: optional override of entry-groups per read round; by
        default sized per batch from the wire's byte budget
        (:func:`records_per_read`) so per-round memory stays bounded for any B.
        ssl_context: optional `ssl.SSLContext` (tlsutil.client_context) used
        for every participant connection — the wire inside is unchanged.
        round_timeout: per-read-round deadline in seconds for each remote
        party's byte stream (one round buffers at most READ_BYTE_BUDGET
        bytes, so a healthy party always finishes a round in bounded time).
        On expiry the query is aborted with :class:`StalledPartyError` naming
        the silent part(ies) — see SPEC section 5. None (default) waits
        forever, matching the reference's behavior (src/main.rs:538-555).
        strict_scan: when True, a query whose aligned streams end before the
        masks DB is fully scanned raises :class:`TruncatedScanError` (per-
        party record counts included) instead of returning a verdict over the
        prefix. Default False == the reference's EOF-tolerant truncation;
        see TruncatedScanError for when each is right.
        chain: chained reply aggregation (SPEC section 5.4). The coordinator
        contacts ONLY the last participant (the chain head), which recursively
        pulls, sums, and forwards the rest of the chain's dot shares — reply
        ingress becomes one stream regardless of party count. Requires
        ``local_engine``: the coordinator's own share must stay out of the
        chain so every partial sum any party sees is missing at least one
        share and stays uniformly random. Participants must run
        ``--wire chain``.
        """
        if not participants and local_engine is None:
            raise ValueError(
                "coordinator needs at least one participant or a local share "
                "engine — masks alone cannot answer queries"
            )
        if chain and local_engine is None:
            raise ValueError(
                "chain mode requires the coordinator to hold a share "
                "(local_engine / --share): without it the chain head would "
                "reconstruct the full dot sums — plaintext distances — "
                "which only the coordinator may see"
            )
        if chain and not participants:
            raise ValueError("chain mode needs at least one participant")
        self.masks_engine = masks_engine
        self.participants = participants
        self.local_engine = local_engine
        self.batch_records = batch_records
        self.ssl_context = ssl_context
        self.round_timeout = round_timeout
        self.strict_scan = strict_scan
        self.chain = chain

    async def _read_round(self, coro, party: str):
        """Run one party's read-round coroutine under the deadline; a timeout
        yields a ``(_Stalled, False)`` marker instead of raising so the
        concurrent gather finishes and ALL stalled parties get named."""
        if not self.round_timeout:
            return await coro
        try:
            return await asyncio.wait_for(coro, self.round_timeout)
        except asyncio.TimeoutError:
            return _Stalled(party), False

    def _check_stalled(self, read_results) -> None:
        stalled = [r.party for r, _eof in read_results
                   if isinstance(r, _Stalled)]
        if stalled:
            raise StalledPartyError(
                f"participant(s) {', '.join(stalled)} produced no complete "
                f"read round within {self.round_timeout}s — aborting the "
                "query (connected-but-silent party; see SPEC section 5)"
            )

    async def _connect_all(self):
        """Open one connection per participant with a clear error on failure.
        Connections that did succeed are closed before raising — a single
        rejected TLS handshake must not leak the other parties' sockets."""
        results = await asyncio.gather(
            *[asyncio.open_connection(h, p, ssl=self.ssl_context)
              for h, p in self._endpoints()],
            return_exceptions=True,
        )
        errs = [r for r in results if isinstance(r, BaseException)]
        if errs:
            for r in results:
                if not isinstance(r, BaseException):
                    r[1].close()
                    try:
                        # Drive the close to completion (TLS close_notify)
                        # so the event loop doesn't warn about unclosed
                        # transports; best-effort on an error path.
                        await r[1].wait_closed()
                    except (OSError, asyncio.TimeoutError):
                        pass
            raise ConnectionError(
                f"cannot reach all participants {self._endpoints()}: {errs[0]}"
            ) from errs[0]
        return results

    async def _stream_rounds(self, template: Template, records: int):
        """Async generator over aligned read rounds for ONE query: yields
        ``(offset, share_batches, denom)`` per round, where share_batches is a
        tuple of uint16 [n, 31] per-party dot batches (plus the local engine's,
        if any) and denom the matching denominators.

        Owns the whole protocol round-trip: participant fan-out, the local
        denominator/share device pumps (compute overlapping network reads —
        the reference's `join!`, src/main.rs:560), per-round deadlines,
        shortest-prefix alignment (src/main.rs:565-569), connection/pump
        teardown, and the zero-record dead-party check. `query` folds the
        yielded rounds to the argmin winner; `query_under` collects the full
        under-threshold match list from the same stream."""
        qmsk = template.mask.data[None]
        qpat = template.pattern.data[None]

        # Fan out to participants.
        conns = await self._connect_all()
        raw = template.to_bytes()
        for _, writer in conns:
            writer.write(raw)
        await asyncio.gather(*[w.drain() for _, w in conns])

        # Local denominator (and optional local share) streams: device compute in
        # worker threads feeding bounded cancellable queues.
        loop = asyncio.get_running_loop()
        denom_pump = StreamPump(
            _rechunk(self.masks_engine.stream(qmsk), records), loop
        )
        local_pump = (
            StreamPump(
                _rechunk(self.local_engine.stream(qpat, qmsk), records),
                loop,
            )
            if self.local_engine is not None
            else None
        )

        processed = 0
        party_records = [0] * len(conns)

        try:
            while True:
                # Read one batch from every source concurrently (join!,
                # main.rs:560), each remote read under the round deadline.
                reads = [
                    self._read_round(read_records(r, records), f"{h}:{p}")
                    for (r, _w), (h, p) in zip(conns, self._endpoints())
                ]
                gathered = await asyncio.gather(
                    denom_pump.next_item(),
                    *( [local_pump.next_item()] if local_pump is not None else [] ),
                    *reads,
                )
                denom = gathered[0]
                off = 1
                local = None
                if local_pump is not None:
                    local = gathered[1]
                    off = 2
                self._check_stalled(gathered[off:])
                share_batches = [arr for arr, _eof in gathered[off:]]
                for k, arr in enumerate(share_batches):
                    party_records[k] += arr.shape[0]
                if local is not None:
                    share_batches.append(local)
                if denom is None:
                    denom = np.zeros((0, N_ROTATIONS), dtype=np.uint16)
                if local is None and local_pump is not None:
                    share_batches[-1] = np.zeros((0, N_ROTATIONS), dtype=np.uint16)

                # Align to shortest prefix (main.rs:565-569).
                n = min([denom.shape[0]] + [b.shape[0] for b in share_batches])
                if n == 0:
                    break

                yield (
                    processed,
                    tuple(b[:n] for b in share_batches),
                    denom[:n].astype(np.uint16, copy=False),
                )
                processed += n
                if n < records:
                    break
        finally:
            await _close_all(conns, [denom_pump, local_pump])

        self._check_dead_parties(processed, party_records)
        self._check_truncated(processed, party_records)

    async def query(self, template: Template) -> QueryOutcome:
        if self.chain:
            # Chain replies are entry-major batched-wire streams; at B=1 the
            # bytes coincide with the reference record stream, and the
            # batched round path already speaks the chain wire.
            return (await self.query_batch([template]))[0]
        records = self.batch_records or records_per_read(1)
        best = (0, 0, -1)  # (num, den, index); den == 0 means +inf
        pending = []  # (batch offset, async device winner triple)
        processed = 0

        # ONE device dispatch per round batch: wrapping share reconstruction
        # (main.rs:597-612), decode and argmin fused — the host never touches
        # the payload bytes. Dispatch is async: winners are fetched after the
        # stream drains, so decode overlaps the next batch's reads.
        async for offset, shares, denom in self._stream_rounds(template, records):
            pending.append((offset, _sum_decode_argmin_device(shares, denom)))
            processed = offset + denom.shape[0]

        for offset, triple in pending:
            nb, db_, jb = (int(x) for x in np.asarray(triple))
            if _frac_less_host(nb, db_, best[0], best[1]):
                best = (nb, db_, offset + jb)
        return QueryOutcome(best[2], fraction_to_f64(best[0], best[1]), processed)

    def _check_audit_size(self, b: int) -> None:
        """The audit keeps every round's [2, n(, B)] int32 min-fraction block
        on device until the stream drains (threshold-independent) — guard the
        blow-up like PlaintextEngine.min_fractions does."""
        expected = getattr(self.masks_engine, "count", None)
        if expected is not None and 8 * expected * b > 4 * (1 << 30):
            raise ValueError(
                f"audit spectrum would be {8 * expected * b / 2**30:.1f} GiB "
                f"of device blocks (B={b}, {expected} entries); split the "
                "query batch"
            )

    async def query_under(self, template: Template, threshold: float,
                          limit: int | None = None) -> UnderThresholdOutcome:
        """ALL DB entries with distance strictly under ``threshold`` — the
        MPC dedup audit (plaintext sibling: PlaintextEngine.find_under).

        Same protocol rounds and wire bytes as :meth:`query`; the per-round
        device dispatch keeps every entry's minimal exact fraction instead of
        folding to the argmin, and the threshold comparison is exact in the
        rational order (shared epilogue engines.hits_under_from_fractions).
        Matches are returned ascending by reported f64 distance
        (index-ordered within equal-f64 ties). ``limit``: more matches than
        this returns ``limit_exceeded=True`` with no match list (the serving
        front's guard against huge client-chosen thresholds)."""
        from mpc_iris_tpu.models.engines import (
            AuditLimitExceeded,
            hits_under_from_fractions,
        )

        if self.chain:
            return (await self.query_batch_under(
                [template], [threshold], limit=limit
            ))[0]
        self._check_audit_size(1)
        records = self.batch_records or records_per_read(1)
        pending = []  # (batch offset, async device [2, n] min-fraction block)
        processed = 0
        async for offset, shares, denom in self._stream_rounds(template, records):
            pending.append((offset, _sum_decode_minfrac_device(shares, denom)))
            processed = offset + denom.shape[0]

        # Rounds arrive in offset order with contiguous offsets, so the
        # concatenated position IS the global DB index.
        nd = (
            np.concatenate([np.asarray(b) for _, b in pending], axis=1)
            if pending else np.zeros((2, 0), np.int32)
        )
        try:
            idx, dist, _n, _d = hits_under_from_fractions(
                nd[0], nd[1], threshold, limit=limit
            )
        except AuditLimitExceeded:
            return UnderThresholdOutcome([], processed, limit_exceeded=True)
        matches = [MatchAt(int(i), float(v)) for i, v in zip(idx, dist)]
        return UnderThresholdOutcome(matches, processed)

    def _endpoints(self) -> list[tuple[str, int]]:
        """The participants this coordinator actually connects to: all of
        them, or only the chain head in chain mode."""
        return [self.participants[-1]] if self.chain else self.participants

    def _check_truncated(self, processed: int, party_records: list[int]):
        """strict_scan: the aligned streams must have covered the WHOLE masks
        DB (its count at round end), else the verdict is unsafe — raise with
        per-party record counts so the short party is identifiable."""
        if not self.strict_scan:
            return
        expected = getattr(self.masks_engine, "count", None)
        if expected is None or processed >= expected:
            return
        per_party = ", ".join(
            f"{h}:{p} sent {c}"
            for (h, p), c in zip(self._endpoints(), party_records)
        ) or "local share only"
        raise TruncatedScanError(
            f"scan truncated at {processed}/{expected} entries — a verdict "
            f"over a prefix is unsafe (strict_scan; SPEC section 5). "
            f"Reply records: {per_party}"
        )

    def _check_dead_parties(self, processed: int, party_records: list[int]):
        """A remote party that produced ZERO reply records is a failed
        connection (TLS handshake rejection, wire-mode mismatch, crashed
        server), not the reference's partial-batch truncation
        (src/main.rs:538-555, which this refines) — fail loudly instead of
        returning an empty result."""
        if processed == 0 and any(c == 0 for c in party_records):
            dead = [
                f"{h}:{p}"
                for (h, p), c in zip(self._endpoints(), party_records)
                if c == 0
            ]
            raise ConnectionError(
                f"no reply records from participant(s) {', '.join(dead)} — "
                "connection, TLS, or wire-mode failure"
                + (" (chain mode: a failed upstream aborts through the "
                   "chain head)" if self.chain else "")
            )

    async def _stream_rounds_batched(self, templates: list[Template]):
        """Batched-wire sibling of :meth:`_stream_rounds`: yields
        ``(offset, share_batches, denom)`` per aligned read round, entry-major
        ([n, B, 31] uint16 per party). Participants must run
        ``wire="batched"``. One connection round carries all B queries;
        replies stream as entry-major B-groups; denominators and decode are
        vectorized over the batch on device. Amortizes connection,
        rotation-expansion and dispatch overheads ~B-fold vs :meth:`query`.
        """
        from mpc_iris_tpu.protocol.wire import (
            batched_query_bytes,
            chain_query_bytes,
            read_batched_records,
        )

        b = len(templates)
        if not 0 < b <= 65536:
            raise ValueError(f"batch size {b} outside the wire's 1..65536 range")
        qpat = np.stack([t.pattern.data for t in templates])
        qmsk = np.stack([t.mask.data for t in templates])
        # Byte-budgeted read rounds: one round buffers ≤ READ_BYTE_BUDGET per
        # party regardless of B (B=65,536 would otherwise buffer ~81 GB).
        records = self.batch_records or records_per_read(b)

        conns = await self._connect_all()
        if self.chain:
            # One connection to the chain head; its request names the rest
            # of the chain, which self-assembles recursively (SPEC 5.4). The
            # single reply stream already carries the remote parties' SUM.
            payload = chain_query_bytes(
                qpat, qmsk, [f"{h}:{p}" for h, p in self.participants[:-1]]
            )
        else:
            payload = batched_query_bytes(qpat, qmsk)
        for _, writer in conns:
            writer.write(payload)
        await asyncio.gather(*[w.drain() for _, w in conns])

        loop = asyncio.get_running_loop()
        denom_pump = StreamPump(
            _rechunk(self.masks_engine.stream(qmsk, entry_major=True),
                     records, squeeze=False, entry_axis=0),
            loop,
        )
        local_pump = (
            StreamPump(
                _rechunk(self.local_engine.stream(qpat, qmsk, entry_major=True),
                         records, squeeze=False, entry_axis=0),
                loop,
            )
            if self.local_engine is not None
            else None
        )

        processed = 0
        party_records = [0] * len(conns)

        try:
            while True:
                reads = [
                    self._read_round(
                        read_batched_records(r, b, records), f"{h}:{p}"
                    )
                    for (r, _w), (h, p) in zip(conns, self._endpoints())
                ]
                gathered = await asyncio.gather(
                    denom_pump.next_item(),
                    *( [local_pump.next_item()] if local_pump is not None else [] ),
                    *reads,
                )
                denom = gathered[0]
                off = 1
                local = None
                if local_pump is not None:
                    local = gathered[1]
                    off = 2
                self._check_stalled(gathered[off:])
                share_batches = [arr for arr, _eof in gathered[off:]]
                for k, arr in enumerate(share_batches):
                    party_records[k] += arr.shape[0]
                if local is not None:
                    share_batches.append(local)
                if denom is None:
                    denom = np.zeros((0, b, N_ROTATIONS), dtype=np.uint16)
                if local is None and local_pump is not None:
                    share_batches[-1] = np.zeros(
                        (0, b, N_ROTATIONS), dtype=np.uint16
                    )

                # Entry-major everywhere: align along axis 0 (entries).
                n = min([denom.shape[0]] + [s.shape[0] for s in share_batches])
                if n == 0:
                    break

                yield (
                    processed,
                    tuple(s[:n] for s in share_batches),
                    denom[:n].astype(np.uint16, copy=False),
                )
                processed += n
                if n < records:
                    break
        finally:
            await _close_all(conns, [denom_pump, local_pump])

        self._check_dead_parties(processed, party_records)
        self._check_truncated(processed, party_records)

    async def query_batch(self, templates: list[Template]) -> list[QueryOutcome]:
        """Batched uniqueness check over the batched wire extension: one
        connection round carries B queries; each round's fused dispatch is
        the batched sibling of `query`'s (share reconstruction + decode +
        rotation-min + per-query entry-argmin in ONE device call)."""
        b = len(templates)
        best = [(0, 0, -1)] * b
        pending = []
        processed = 0
        async for offset, shares, denom in self._stream_rounds_batched(
            templates
        ):
            pending.append(
                (offset, _sum_decode_argmin_device_batch(shares, denom))
            )
            processed = offset + denom.shape[0]

        for offset, triples in pending:
            arr = np.asarray(triples)  # [3, B]
            for q in range(b):
                nb, db_, jb = int(arr[0, q]), int(arr[1, q]), int(arr[2, q])
                if _frac_less_host(nb, db_, best[q][0], best[q][1]):
                    best[q] = (nb, db_, offset + jb)
        return [
            QueryOutcome(i, fraction_to_f64(nn, dd), processed)
            for (nn, dd, i) in best
        ]

    async def query_batch_under(self, templates: list[Template], threshold,
                                limit: int | None = None
                                ) -> list[UnderThresholdOutcome]:
        """Batched MPC dedup audit: one batched-wire round audits B templates,
        returning per query EVERY entry with distance strictly under the
        threshold (`query_under` ⊗ `query_batch`; same wire bytes as
        query_batch, per-entry min fractions kept on device).

        ``threshold``: one float for the whole batch, or a per-query sequence
        (the device pass is threshold-independent — per-entry min fractions —
        so micro-batched audit clients may each bring their own threshold).
        ``limit`` applies per query: an over-limit query gets
        ``limit_exceeded=True`` (empty match list) without affecting the
        other queries in the round."""
        from mpc_iris_tpu.models.engines import (
            AuditLimitExceeded,
            hits_under_from_fractions,
        )

        b = len(templates)
        thresholds = (
            list(threshold) if isinstance(threshold, (list, tuple))
            else [float(threshold)] * b
        )
        if len(thresholds) != b:
            raise ValueError(
                f"{len(thresholds)} thresholds for {b} templates"
            )
        self._check_audit_size(b)

        pending = []
        processed = 0
        async for offset, shares, denom in self._stream_rounds_batched(
            templates
        ):
            pending.append(
                (offset, _sum_decode_minfrac_device_batch(shares, denom))
            )
            processed = offset + denom.shape[0]

        # Contiguous offset-ordered rounds: concatenated position == index.
        nd = (
            np.concatenate([np.asarray(blk) for _, blk in pending], axis=1)
            if pending else np.zeros((2, 0, b), np.int32)
        )
        outcomes = []
        for q, t in enumerate(thresholds):
            try:
                idx, dist, _n, _d = hits_under_from_fractions(
                    nd[0, :, q], nd[1, :, q], t, limit=limit
                )
            except AuditLimitExceeded:
                outcomes.append(
                    UnderThresholdOutcome([], processed, limit_exceeded=True)
                )
                continue
            outcomes.append(UnderThresholdOutcome(
                [MatchAt(int(i), float(v)) for i, v in zip(idx, dist)],
                processed,
            ))
        return outcomes


# ------------------------------------------------------------- serving front

# Reply record of the query-serving wire (SPEC section 5.2): little-endian
# i64 winning index, f64 distance (bit-identical to the reference decode),
# u64 entries compared. 24 fixed bytes; the request is the raw 3,200-byte
# template, exactly the participant wire's query format.
SERVE_REPLY = struct.Struct("<qdQ")

# Audit-serving wire (SPEC section 5.3): request = the raw 3,200-byte
# template ‖ one little-endian f64 threshold (the client's policy); reply =
# <u64 match count> <u64 entries compared> header, then count 16-byte
# <i64 index> <f64 distance> records ascending by distance. A short read of
# the header is the client's failure signal (never a fabricated outcome).
AUDIT_THRESHOLD = struct.Struct("<d")
AUDIT_HEAD = struct.Struct("<QQ")
AUDIT_REC = struct.Struct("<qd")

# Persistent query wire (SPEC 5.5): a client opening with these 8 bytes keeps
# the connection for MANY query/reply records (same per-record formats as the
# one-shot wire), amortizing the TCP/TLS handshake. A raw template whose
# first 8 bytes collide with the magic would be misrouted — probability 2^-64
# per one-shot query against adversarially chosen bytes; persistent-capable
# clients simply always send the magic, and the reference one-shot wire stays
# byte-compatible for everyone else.
PERSIST_MAGIC = b"MPCIRSQ1"


class QueryServer:
    """Network front for the uniqueness service: accepts one raw 3,200-byte
    query template per connection and replies with the 24-byte outcome record;
    a client opening with the 8-byte PERSIST_MAGIC instead keeps the
    connection for many query/reply records (SPEC 5.5), amortizing the
    TCP/TLS handshake.

    The reference resolver DECLARES a bind address but never serves on it —
    queries are self-generated in a loop (src/main.rs:139, 476-639). This
    implements the serving half: each inbound connection runs one full MPC
    round over the wrapped :class:`Coordinator` (fan-out to participants,
    fused decode, exact argmin). Concurrent connections are served
    concurrently — participants handle simultaneous coordinator rounds
    bit-exactly (pinned by TestConcurrentConnections).
    """

    def __init__(self, coordinator: Coordinator, host: str = "127.0.0.1",
                 port: int = 8080, ssl_context=None,
                 read_timeout: float | None = None, refresh=None,
                 max_batch: int = 1, batch_window: float = 0.005,
                 audit: bool = False, max_matches: int = 65536,
                 max_inflight: int = 32, rounds_inflight: int = 1):
        """coordinator: the configured Coordinator to run rounds on.
        ssl_context: optional server-side TLS for the client-facing socket
        (independent of the coordinator's participant-facing TLS).
        read_timeout: deadline for receiving the 3,200 query bytes after a
        client connects (None = wait forever).
        refresh: optional zero-arg callable run before each query (the same
        --watch DB-sync hook participants use), serialized server-wide.

        max_batch > 1 enables MICRO-BATCHING: concurrent client queries are
        aggregated (up to max_batch, waiting at most batch_window seconds
        after the first) into ONE MPC round over the batched wire — the
        participants must run ``--wire batched``. Each client still sees the
        single-query serving wire; outcomes are identical to solo rounds
        (the batched protocol is bit-exact per query). This converts P
        concurrent clients from P full DB scans into one ~P-amortized scan —
        the serving analogue of the bench's batch-throughput curve.

        audit=True serves the AUDIT wire instead (SPEC section 5.3): each
        request carries a template ‖ f64 threshold, and the reply lists EVERY
        DB entry under that threshold (`Coordinator.query_under`). Audit and
        argmin modes are distinct services (their request formats differ);
        micro-batching composes — the per-entry device pass is threshold-
        independent, so batched clients may each bring their own threshold.
        max_matches guards the audit path: a client whose threshold matches
        more entries is closed WITHOUT a reply (per client; co-batched
        clients are unaffected) instead of forcing an O(N) match list and
        reply buffer onto the server.

        max_inflight bounds CONCURRENT MPC rounds in solo mode (max_batch=1):
        every connection costs a full DB scan, so an unbounded accept loop
        would launch arbitrarily many rounds timesharing the device; excess
        clients queue on the semaphore (still served, in order) instead.
        Micro-batched mode is bounded by rounds_inflight (below), so the
        gate applies only to solo rounds.

        rounds_inflight (micro-batched mode only) allows up to K batched MPC
        rounds in flight at once. At the default 1 the dispatcher runs one
        round at a time, so while a round's reply streams drain no other
        batch makes progress; at K≥2 the next batch's round starts while the
        previous one is still reading, overlapping each round's wire reads
        with the others' device dispatches (participants serve concurrent
        rounds bit-exactly — pinned by TestConcurrentConnections). Outcomes
        are per-client futures, so completion order never matters."""
        self.audit = audit
        self.max_matches = max_matches
        import contextlib

        # nullcontext supports `async with` (3.10+): max_inflight=0 disables.
        self._round_gate = (
            asyncio.Semaphore(max_inflight) if max_inflight
            else contextlib.nullcontext()
        )
        self.coordinator = coordinator
        # Serving stats (observability parity+: the reference's indicatif
        # throughput lines, src/main.rs:178-183, for the serving front).
        # Monotonic counters + a bounded latency window; logged every
        # `stats_every` completed queries and readable any time via stats().
        self.served = 0
        self.failed = 0
        self.stats_every = 100
        self._lat_window: deque[float] = deque(maxlen=512)
        self.host = host
        self.port = port
        self.ssl_context = ssl_context
        self.read_timeout = read_timeout
        self.refresh = refresh
        self.max_batch = max_batch
        self.batch_window = batch_window
        self.rounds_inflight = max(1, rounds_inflight)
        self._refresh_lock = asyncio.Lock()
        self._server: asyncio.AbstractServer | None = None
        self._queue: asyncio.Queue | None = None
        self._dispatcher: asyncio.Task | None = None
        self._round_tasks: set[asyncio.Task] = set()
        self._tracker = ConnectionTracker()
        # Persistent sessions parked between records (SPEC 5.5): drained
        # immediately at shutdown — nothing is in flight on them.
        self._idle_persistent: set[asyncio.StreamWriter] = set()
        self._draining = False

    async def start(self) -> tuple[str, int]:
        self._server = await asyncio.start_server(
            self._tracker.wrap(self._handle), self.host, self.port,
            ssl=self.ssl_context,
        )
        if self.max_batch > 1:
            self._queue = asyncio.Queue()
            self._dispatcher = asyncio.get_running_loop().create_task(
                self._dispatch_loop()
            )
        sock = self._server.sockets[0].getsockname()
        log.info("query server listening on %s:%s", sock[0], sock[1])
        self.port = sock[1]
        return sock[0], sock[1]

    async def serve_forever(self) -> None:
        if self._server is None:
            await self.start()
        async with self._server:
            await self._server.serve_forever()

    async def drain(self, grace: float | None = None) -> bool:
        """Graceful shutdown: stop accepting new clients, wait up to `grace`
        seconds for every in-flight query (including queued micro-batch
        members — their handlers hold the connection until the shared round
        resolves) to be answered. Persistent sessions parked BETWEEN records
        are ended immediately (EOF between records is the wire's clean
        end-of-session — nothing of theirs is in flight); a persistent
        client unlucky enough to be mid-record sees a short read and
        retries against the replacement server. Returns False if the
        deadline expired with queries still running — call
        :meth:`abort_connections` then :meth:`close` to finish shutdown
        (close also stops the dispatcher)."""
        self._draining = True
        if self._server is not None:
            self._server.close()  # stop accepting before ending idle sessions
        for w in list(self._idle_persistent):
            w.close()  # graceful FIN: the parked record read ends cleanly
        return await drain_server(self._server, grace, tracker=self._tracker)

    def abort_connections(self) -> int:
        """Hard-close every live client connection (post-grace force path)."""
        return self._tracker.abort_all()

    async def close(self) -> None:
        if self._dispatcher is not None:
            self._dispatcher.cancel()
            try:
                await self._dispatcher
            except asyncio.CancelledError:
                pass
            self._dispatcher = None
        for task in list(self._round_tasks):
            task.cancel()
        for task in list(self._round_tasks):
            try:
                await task
            except asyncio.CancelledError:
                pass
        # Queries enqueued but never collected into a round: cancel their
        # futures so the waiting handlers unwind instead of hanging.
        while self._queue is not None and not self._queue.empty():
            _t, _th, fut = self._queue.get_nowait()
            if not fut.done():
                fut.cancel()
        # Persistent sessions parked between records would keep their
        # handler alive forever (read_timeout defaults to None), and
        # wait_closed() on >=3.12.1 waits for every handler — end them like
        # drain() does, or close() deadlocks on one idle keep-alive client.
        self._draining = True
        for w in list(self._idle_persistent):
            w.close()
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()

    async def _dispatch_loop(self):
        """Collect queued (template, threshold, future) triples into batched
        MPC rounds (threshold is None in argmin mode); run up to
        ``rounds_inflight`` rounds concurrently."""
        loop = asyncio.get_running_loop()
        gate = asyncio.Semaphore(self.rounds_inflight)
        while True:
            batch = [await self._queue.get()]
            try:
                deadline = loop.time() + self.batch_window
                while len(batch) < self.max_batch:
                    remaining = deadline - loop.time()
                    if remaining <= 0:
                        break
                    try:
                        batch.append(
                            await asyncio.wait_for(self._queue.get(),
                                                   remaining)
                        )
                    except asyncio.TimeoutError:
                        break
                # Acquire BEFORE spawning so the dispatcher back-pressures at
                # rounds_inflight instead of piling unbounded rounds onto the
                # participants; the task releases when its round finishes.
                await gate.acquire()
            except asyncio.CancelledError:
                # Cancelled mid-collection (or parked on the gate): the
                # already-collected triples must not be abandoned — their
                # handlers await these futures and would hang forever.
                for _t, _th, fut in batch:
                    if not fut.done():
                        fut.cancel()
                raise
            task = loop.create_task(self._run_round(batch, gate))
            self._round_tasks.add(task)
            task.add_done_callback(self._round_tasks.discard)

    async def _run_round(self, batch, gate: asyncio.Semaphore):
        """One batched MPC round; resolves each client's future."""
        try:
            try:
                if self.audit:
                    outcomes = await self.coordinator.query_batch_under(
                        [t for t, _th, _f in batch],
                        [th for _t, th, _f in batch],
                        limit=self.max_matches,
                    )
                else:
                    outcomes = await self.coordinator.query_batch(
                        [t for t, _th, _f in batch]
                    )
            except asyncio.CancelledError:
                for _t, _th, fut in batch:
                    if not fut.done():
                        fut.cancel()
                raise
            except Exception as e:
                for _t, _th, fut in batch:
                    if not fut.done():
                        fut.set_exception(
                            ConnectionError(f"batched MPC round failed: {e}")
                        )
            else:
                for (_t, _th, fut), outcome in zip(batch, outcomes):
                    if not fut.done():
                        fut.set_result(outcome)
        finally:
            gate.release()

    def stats(self) -> dict:
        """Serving counters + latency quantiles over the recent window."""
        lat = sorted(self._lat_window)
        q = lambda p: lat[min(len(lat) - 1, int(p * len(lat)))] if lat else 0.0
        return {
            "served": self.served,
            "failed": self.failed,
            "p50_s": q(0.50),
            "p95_s": q(0.95),
            "window": len(lat),
        }

    def _count_query(self, dt: float) -> None:
        self.served += 1
        self._lat_window.append(dt)
        if self.stats_every and self.served % self.stats_every == 0:
            s = self.stats()
            log.info(
                "served %d queries (%d failed) — p50 %.3fs p95 %.3fs "
                "over the last %d",
                s["served"], s["failed"], s["p50_s"], s["p95_s"], s["window"],
            )

    async def _serve_one(self, raw: bytes, threshold, peer, writer) -> bool:
        """Run one query round and write its reply. Returns False when the
        connection must close WITHOUT a reply (invalid threshold /
        max_matches exceeded) — the client's failure signal is the short
        read, never a fabricated outcome."""
        if self.audit and not math.isfinite(threshold):
            # A NaN threshold would make under_threshold_mask_np return
            # an all-false mask — a well-formed "0 matches" reply that
            # reads as "no duplicates" for a nonsense policy value; +inf
            # matches the whole DB. Reject non-finite thresholds like
            # the limit_exceeded path: close without a reply. (0.0 stays
            # legal: "strictly under 0" is a well-defined empty probe.)
            self.failed += 1
            log.error("audit from %s sent invalid threshold %r — "
                      "closing without a reply", peer, threshold)
            return False
        if self.refresh is not None:
            async with self._refresh_lock:
                await asyncio.to_thread(self.refresh)
        template = Template.from_bytes(raw)
        t0 = time.monotonic()
        try:
            if self._queue is not None:
                fut = asyncio.get_running_loop().create_future()
                await self._queue.put((template, threshold, fut))
                outcome = await fut
            elif self.audit:
                async with self._round_gate:
                    outcome = await self.coordinator.query_under(
                        template, threshold, limit=self.max_matches
                    )
            else:
                async with self._round_gate:
                    outcome = await self.coordinator.query(template)
        except (asyncio.IncompleteReadError, ConnectionResetError) as e:
            # A PARTICIPANT stream breaking mid-round must count and log
            # as a failed query, not be mistaken for the client dropping
            # (the caller's except clause would otherwise win).
            raise ConnectionError(f"participant stream failed: {e}") from e
        if getattr(outcome, "limit_exceeded", False):
            # Close without a reply: an empty match list would read as
            # "no duplicates", and streaming an over-limit list is the
            # resource hole max_matches exists to plug.
            self.failed += 1
            log.error(
                "audit from %s exceeded max_matches=%d (threshold %r) — "
                "closing without a reply", peer, self.max_matches,
                threshold,
            )
            return False
        self._count_query(time.monotonic() - t0)
        if self.audit:
            writer.write(AUDIT_HEAD.pack(
                len(outcome.matches), outcome.total
            ))
            writer.write(b"".join(
                AUDIT_REC.pack(m.index, m.distance)
                for m in outcome.matches
            ))
        else:
            writer.write(SERVE_REPLY.pack(
                outcome.index, outcome.distance, outcome.total
            ))
        await writer.drain()
        return True

    async def _handle(self, reader, writer):
        from mpc_iris_tpu.protocol.wire import TEMPLATE_BYTES

        peer = writer.get_extra_info("peername")
        try:
            def timed(coro):
                return (asyncio.wait_for(coro, self.read_timeout)
                        if self.read_timeout else coro)

            async def read_first():
                """First request under ONE deadline (a slow-loris client
                must not get a fresh budget per partial read): the 8-byte
                persistent magic, or a complete one-shot request."""
                head = await reader.readexactly(len(PERSIST_MAGIC))
                if head == PERSIST_MAGIC:
                    return None
                raw = head + await reader.readexactly(
                    TEMPLATE_BYTES - len(head))
                if not self.audit:
                    return raw, None
                t_raw = await reader.readexactly(AUDIT_THRESHOLD.size)
                return raw, AUDIT_THRESHOLD.unpack(t_raw)[0]

            async def read_record():
                """One persistent record under one deadline. Returns None on
                a clean end-of-session (EOF at the record boundary); EOF
                anywhere INSIDE the record — including between an audit
                template and its threshold — raises (torn record)."""
                try:
                    raw = await reader.readexactly(TEMPLATE_BYTES)
                except asyncio.IncompleteReadError as e:
                    if e.partial:
                        raise
                    return None
                if not self.audit:
                    return raw, None
                t_raw = await reader.readexactly(AUDIT_THRESHOLD.size)
                return raw, AUDIT_THRESHOLD.unpack(t_raw)[0]

            first = await timed(read_first())
            if first is not None:
                # One-shot wire (default, reference-shaped).
                await self._serve_one(first[0], first[1], peer, writer)
                return
            # Persistent wire (SPEC 5.5): many queries per connection —
            # amortizes the TCP/TLS handshake at serving. Each query is the
            # same fixed-size record as the one-shot wire; clean EOF between
            # records ends the session. read_timeout applies per record, so
            # an idle keep-alive connection is reclaimed like a silent
            # client (reconnect is cheap exactly because it is rare). While
            # parked between records the session registers as IDLE so a
            # graceful drain can end it immediately instead of burning the
            # whole grace on a connection with nothing in flight.
            while True:
                self._idle_persistent.add(writer)
                if self._draining:
                    self._idle_persistent.discard(writer)
                    break
                try:
                    rec = await timed(read_record())
                finally:
                    self._idle_persistent.discard(writer)
                if rec is None:
                    break
                if not await self._serve_one(rec[0], rec[1], peer, writer):
                    return  # close-without-reply policy ends the session
        except asyncio.TimeoutError:
            log.warning("client %s sent no complete query within %.1fs — "
                        "closing", peer, self.read_timeout)
        except (asyncio.IncompleteReadError, ConnectionResetError) as e:
            log.warning("client %s dropped: %s", peer, e)
        except (ConnectionError, OSError) as e:
            # Participant-side failure (unreachable/stalled party): surface it
            # to the client as a closed connection with no reply record, and
            # loudly in the server log — never a fabricated outcome.
            self.failed += 1
            log.error("query from %s failed: %s", peer, e)
        finally:
            try:
                writer.close()
                await writer.wait_closed()
            except (ConnectionResetError, BrokenPipeError):
                pass


async def query_remote_under(host: str, port: int, template: Template,
                             threshold: float,
                             ssl_context=None,
                             max_matches: int = 65536) -> UnderThresholdOutcome:
    """Client half of the AUDIT serving wire (SPEC section 5.3): send one
    template ‖ f64 threshold, read the (count, total) header + match records.

    `max_matches` bounds the server-claimed match count before the body is
    read — a buggy or malicious server must not be able to drive the client
    into a multi-exabyte readexactly() allocation. The default mirrors the
    server-side max_matches guard."""
    reader, writer = await asyncio.open_connection(host, port, ssl=ssl_context)
    try:
        writer.write(template.to_bytes())
        writer.write(AUDIT_THRESHOLD.pack(float(threshold)))
        await writer.drain()
        head = await reader.readexactly(AUDIT_HEAD.size)
        count, total = AUDIT_HEAD.unpack(head)
        if count > max_matches:
            raise ConnectionError(
                f"audit server claims {count} matches > client cap "
                f"{max_matches} — refusing to read the body"
            )
        body = await reader.readexactly(count * AUDIT_REC.size)
    finally:
        writer.close()
        try:
            await writer.wait_closed()
        except (ConnectionResetError, BrokenPipeError):
            pass
    matches = [
        MatchAt(*AUDIT_REC.unpack_from(body, k * AUDIT_REC.size))
        for k in range(count)
    ]
    return UnderThresholdOutcome(matches, total)


async def query_remote(host: str, port: int, template: Template,
                       ssl_context=None) -> QueryOutcome:
    """Client half of the serving wire: send one template, read the 24-byte
    outcome record."""
    reader, writer = await asyncio.open_connection(host, port, ssl=ssl_context)
    try:
        writer.write(template.to_bytes())
        await writer.drain()
        raw = await reader.readexactly(SERVE_REPLY.size)
    finally:
        writer.close()
        try:
            await writer.wait_closed()
        except (ConnectionResetError, BrokenPipeError):
            pass
    index, distance, total = SERVE_REPLY.unpack(raw)
    return QueryOutcome(index, distance, total)


class PersistentQueryClient:
    """Client for the persistent serving wire (SPEC 5.5): ONE connection
    carrying many query/reply records — the per-query TCP (and TLS)
    handshake of the one-shot wire disappears from the serving path.

    Usage (argmin service)::

        client = await PersistentQueryClient.connect(host, port)
        try:
            for t in templates:
                outcome = await client.query(t)
        finally:
            await client.close()

    For an audit service construct with ``audit=True`` and call
    :meth:`query_under`. Queries are strictly sequential per connection
    (the wire has no record ids); open several clients for parallelism —
    the server micro-batches concurrent connections when configured to."""

    def __init__(self, reader, writer, audit: bool = False,
                 max_matches: int = 65536):
        self._reader = reader
        self._writer = writer
        self.audit = audit
        self.max_matches = max_matches

    @classmethod
    async def connect(cls, host: str, port: int, ssl_context=None,
                      audit: bool = False, max_matches: int = 65536):
        reader, writer = await asyncio.open_connection(
            host, port, ssl=ssl_context)
        writer.write(PERSIST_MAGIC)
        # Flush now so a transport failure surfaces HERE (where callers
        # report "cannot connect"), not as an opaque error on the first query.
        await writer.drain()
        return cls(reader, writer, audit=audit, max_matches=max_matches)

    async def query(self, template: Template) -> QueryOutcome:
        assert not self.audit, "audit client: use query_under"
        self._writer.write(template.to_bytes())
        await self._writer.drain()
        raw = await self._reader.readexactly(SERVE_REPLY.size)
        return QueryOutcome(*SERVE_REPLY.unpack(raw))

    async def query_under(self, template: Template,
                          threshold: float) -> UnderThresholdOutcome:
        assert self.audit, "argmin client: use query"
        self._writer.write(template.to_bytes())
        self._writer.write(AUDIT_THRESHOLD.pack(float(threshold)))
        await self._writer.drain()
        head = await self._reader.readexactly(AUDIT_HEAD.size)
        count, total = AUDIT_HEAD.unpack(head)
        if count > self.max_matches:
            raise ConnectionError(
                f"audit server claims {count} matches > client cap "
                f"{self.max_matches} — refusing to read the body"
            )
        body = await self._reader.readexactly(count * AUDIT_REC.size)
        matches = [
            MatchAt(*AUDIT_REC.unpack_from(body, k * AUDIT_REC.size))
            for k in range(count)
        ]
        return UnderThresholdOutcome(matches, total)

    async def close(self) -> None:
        self._writer.close()
        try:
            await self._writer.wait_closed()
        except (ConnectionResetError, BrokenPipeError):
            pass
