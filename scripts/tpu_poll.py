"""Tiny FRESH jit to poll remote-compile service health.

After Mosaic SIGABRTs the remote compile service can degrade for an hour+
(CLAUDE.md). Each poll compiles a program with a unique baked-in constant so
the persistent compile cache can never satisfy it locally — a cache hit
would report "ok" while real compiles still hang, which is exactly the
failure mode this probe exists to catch. A healthy service answers in a few
seconds and a wedged one blocks — the wall time IS the health signal.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_poll.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    salt = time.time_ns() % (1 << 30)  # unique constant -> unique cache key
    t0 = time.monotonic()
    val = float(
        np.asarray(jax.jit(lambda x: x + salt)(jnp.zeros(8, jnp.int32))).sum()
    )
    dt = time.monotonic() - t0
    assert val == 8.0 * salt
    print(f"tpu ok: fresh-compile round trip {dt:.1f}s", flush=True)


if __name__ == "__main__":
    main()
