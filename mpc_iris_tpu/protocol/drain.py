"""Graceful-drain support for the serving roles (SPEC section 5).

The reference leaves clean shutdown as TODOs (src/main.rs:449, 631, 641) —
a signal kills the process mid-reply and the peer sees a torn stream. Here
every server can DRAIN: stop accepting new connections, let in-flight
requests finish under a grace deadline, then exit. The CLI roles wire this
to SIGTERM/SIGINT (second signal force-quits).
"""

from __future__ import annotations

import asyncio


class ConnectionTracker:
    """Counts in-flight connection handlers so a server can drain.

    `wrap(handler)` returns a handler that maintains the count; `wait_idle`
    resolves when the count reaches zero (or the deadline expires). The
    wrapper never REFUSES a connection: anything the listener accepted
    before it closed deserves its reply, so draining only stops the accept
    loop and waits.
    """

    def __init__(self) -> None:
        self._active = 0
        self._idle = asyncio.Event()
        self._idle.set()

    @property
    def active(self) -> int:
        return self._active

    def wrap(self, handler):
        async def tracked(reader, writer):
            self._active += 1
            self._idle.clear()
            try:
                await handler(reader, writer)
            finally:
                self._active -= 1
                if self._active == 0:
                    self._idle.set()

        return tracked

    async def wait_idle(self, timeout: float | None = None) -> bool:
        """True once no handler is in flight; False if `timeout` (seconds)
        expired first. A couple of zero-sleeps first let connections the
        listener accepted moments before it closed enter their handlers, so
        they are waited on rather than raced past."""
        for _ in range(2):
            await asyncio.sleep(0)
        if self._active == 0:
            return True
        try:
            await asyncio.wait_for(self._idle.wait(), timeout)
            return True
        except asyncio.TimeoutError:
            return False
