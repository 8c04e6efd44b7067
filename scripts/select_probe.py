"""Isolate select_chunk cost on TPU and split rotation-tree vs column-tree cost."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpc_iris_tpu.ops.select_pallas import select_chunk


def timeit(fn, *args, iters=5):
    jax.tree.map(np.asarray, fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.monotonic()
        jax.tree.map(np.asarray, fn(*args))
        ts.append(time.monotonic() - t0)
    return min(ts)


def main():
    b, n = 128, 32768
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    dot = jax.random.randint(k1, (b * 32, n), -12800, 12800, dtype=jnp.int32)
    den = jax.random.randint(k2, (b * 32, n), 0, 12801, dtype=jnp.int32)

    gbs = 2 * dot.size * 4 / 1e9
    f = jax.jit(functools.partial(select_chunk, tile_b=8, tile_n=2048))
    dt = timeit(f, dot, den, 0)
    print(f"select_chunk (8,2048): {dt*1e3:.2f}ms  ({gbs/dt:.0f} GB/s)", flush=True)

    # Pure streaming reference: elementwise sum reduce of the same inputs in XLA.
    @jax.jit
    def stream_ref(dot, den):
        return (dot + den).sum()

    dt = timeit(stream_ref, dot, den)
    print(f"XLA elementwise-sum:   {dt*1e3:.2f}ms  ({gbs/dt:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()


def overhead():
    import jax, jax.numpy as jnp, numpy as np, time
    x = jnp.ones((8, 128), jnp.int32)
    f = jax.jit(lambda x: x + 1)
    np.asarray(f(x))
    ts = []
    for _ in range(10):
        t0 = time.monotonic()
        np.asarray(f(x))
        ts.append(time.monotonic() - t0)
    print(f"dispatch overhead: min {min(ts)*1e3:.2f}ms  median {sorted(ts)[5]*1e3:.2f}ms")
