"""Where does on-device ChaCha regen time go? rounds vs serialization.

Times (a) full share_rows (rounds + u16 serialization), (b) rounds only
(fold the 16 word arrays, no stack/reshape), (c) a serialization-shaped
stack/reshape on precomputed words. Guides whether a Pallas kernel or an
XLA layout change is the right lever for the keyed engine.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpc_iris_tpu.ops import chacha

R = 32768


def timeit(fn, *a, iters=4):
    np.asarray(fn(*a))
    ts = []
    for _ in range(iters):
        t0 = time.monotonic()
        np.asarray(fn(*a))
        ts.append(time.monotonic() - t0)
    return min(ts)


def main():
    kw = jnp.zeros(8, jnp.uint32)

    full = jax.jit(lambda kw: chacha.share_rows(kw, 0, 0, R)
                   .astype(jnp.uint32).sum())
    dt = timeit(full, kw)
    gb = R * 25600 / 1e9
    print(f"full share_rows({R}):      {dt*1e3:7.1f}ms  {gb/dt:5.1f} GB/s")

    @jax.jit
    def rounds_only(kw):
        idx = jnp.arange(R, dtype=jnp.uint32)
        lo = idx[:, None]
        ctr = jnp.arange(chacha.BLOCKS_PER_ROW, dtype=jnp.uint32)[None, :]
        shape = jnp.broadcast_shapes(lo.shape, ctr.shape)
        init = [jnp.broadcast_to(jnp.uint32(c), shape) for c in chacha._CONSTS]
        init += [jnp.broadcast_to(kw[i], shape) for i in range(8)]
        init += [jnp.broadcast_to(ctr, shape), jnp.broadcast_to(jnp.uint32(0), shape),
                 jnp.broadcast_to(lo, shape), jnp.broadcast_to(jnp.uint32(0), shape)]
        words = chacha._block_words(init)
        acc = words[0]
        for w in words[1:]:
            acc = acc + w
        return acc.sum()

    dt = timeit(rounds_only, kw)
    print(f"rounds only:               {dt*1e3:7.1f}ms  {gb/dt:5.1f} GB/s")

    @jax.jit
    def serialize_only(x):
        # x: [R, B] u32 -> the same stack/bitcast shape share_rows emits
        words = [x + jnp.uint32(i) for i in range(16)]
        stacked = jnp.stack(words, axis=-1)
        lo = (stacked & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        hi = (stacked >> jnp.uint32(16)).astype(jnp.uint16)
        return jnp.stack([lo, hi], axis=-1).reshape(R, 12800).astype(jnp.uint32).sum()

    x = jnp.ones((R, chacha.BLOCKS_PER_ROW), jnp.uint32)
    dt = timeit(serialize_only, x)
    print(f"serialize only (16x +i):   {dt*1e3:7.1f}ms  {gb/dt:5.1f} GB/s")


if __name__ == "__main__":
    main()


def natural():
    kw = jnp.zeros(8, jnp.uint32)
    f = jax.jit(lambda kw: sum(
        x.astype(jnp.uint32).sum() for x in
        chacha.share_planes_natural(kw, 0, 0, R)
    ))
    dt = timeit(f, kw)
    gb = R * 25600 / 1e9
    print(f"share_planes_natural({R}): {dt*1e3:7.1f}ms  {gb/dt:5.1f} GB/s")


if __name__ == "__main__":
    natural()
