"""Sweep select_chunk tile configs at the bench shape (B=256, chunk=8192,
int16 inputs) on the real TPU, then time the full packed match step with the
best candidates. Guides _FUSED_TILE_B/_FUSED_TILE_N (VERDICT round-1 next #8).
"""

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
    b, n = 256, 8192
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    dot = jax.random.randint(k1, (b * 32, n), -12800, 12800, dtype=jnp.int16)
    den = jax.random.randint(k2, (b * 32, n), 0, 12801, dtype=jnp.int16)
    gbs = 2 * dot.size * 2 / 1e9

    for tb, tn in [(8, 2048), (8, 1024), (8, 512), (8, 256), (8, 128)]:
        if (b % tb) or (n % tn):
            continue
        try:
            f = jax.jit(functools.partial(select_chunk, tile_b=tb, tile_n=tn))
            dt = timeit(f, dot, den, 0)
            print(f"select ({tb:2d},{tn:5d}): {dt*1e3:7.2f}ms "
                  f"({gbs/dt:5.0f} GB/s)", flush=True)
        except Exception as e:  # oversized VMEM configs abort remotely
            print(f"select ({tb:2d},{tn:5d}): FAILED {type(e).__name__} "
                  f"{str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
