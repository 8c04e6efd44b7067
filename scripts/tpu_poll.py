"""Tiny fixed jit to poll remote-compile service health (constant cache key).

After Mosaic SIGABRTs the remote compile service can degrade for an hour+
(CLAUDE.md). This polls with the SAME trivial program every time (persistent
compile cache enabled), so a healthy service answers in ~1 s and a wedged one
blocks — the wall time IS the health signal.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_poll.py
"""

import time

import numpy as np

from mpc_iris_tpu.utils.config import enable_compile_cache


def main():
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    t0 = time.monotonic()
    val = float(np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros(8))).sum())
    dt = time.monotonic() - t0
    assert val == 8.0
    print(f"tpu ok: round trip {dt:.1f}s", flush=True)


if __name__ == "__main__":
    main()
