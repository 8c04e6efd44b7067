"""Graceful-drain support for the serving roles (SPEC section 5).

The reference leaves clean shutdown as TODOs (src/main.rs:449, 631, 641) —
a signal kills the process mid-reply and the peer sees a torn stream. Here
every server can DRAIN: stop accepting new connections, let in-flight
requests finish under a grace deadline, then exit; if the grace expires the
remaining connections are force-aborted so shutdown is bounded. The CLI
roles wire this to SIGTERM/SIGINT (second signal force-quits).

The authoritative "every connection finished" wait is the event loop's own
``Server.wait_closed()`` (Python >=3.12.1 semantics: returns once every
accepted connection has detached — including connections the listener
accepted moments before closing whose handler has not started yet, which a
handler-side counter would race past). Handlers always close their writer
when done, so connections never outlive their reply.
"""

from __future__ import annotations

import asyncio


class ConnectionTracker:
    """Registers each live connection's writer so a draining server can
    force-abort whatever outlived the grace deadline. The wrapper never
    REFUSES a connection: anything the listener accepted before it closed
    deserves its reply; aborting is an explicit, logged last resort."""

    def __init__(self) -> None:
        self._writers: set[asyncio.StreamWriter] = set()

    @property
    def active(self) -> int:
        return len(self._writers)

    def wrap(self, handler):
        async def tracked(reader, writer):
            self._writers.add(writer)
            try:
                await handler(reader, writer)
            finally:
                self._writers.discard(writer)

        return tracked

    def abort_all(self) -> int:
        """Hard-close every tracked connection (RST, no flush). Returns the
        number aborted. In-flight handlers see connection errors on their
        next read/write and unwind through their normal cleanup."""
        n = 0
        for w in list(self._writers):
            transport = w.transport
            if transport is not None:
                transport.abort()
                n += 1
        return n


async def drain_server(server: asyncio.AbstractServer | None,
                       grace: float | None = None) -> bool:
    """Stop accepting and wait up to `grace` seconds for every accepted
    connection to finish. True = drained clean; False = deadline expired
    with connections still open (caller should abort_all + close)."""
    if server is None:
        return True
    server.close()
    try:
        await asyncio.wait_for(server.wait_closed(), grace)
        return True
    except asyncio.TimeoutError:
        return False
