"""Decompose the natural-plane assembly cost and test a K-major layout.

(a) concat of raw u32 word arrays      — is the 400-lane concat the cost?
(b) byte-extract summed (no concat)    — is the extract chain the cost?
(c) K-major planes [12800, R] (concat on sublane-aligned axis 0)
(d) matmul with transposed RHS [K, N] vs standard [N, K]
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mpc_iris_tpu.ops import chacha

R = 32768
GB = R * 25600 / 1e9


def timeit(fn, *a, iters=4):
    np.asarray(fn(*a))
    ts = []
    for _ in range(iters):
        t0 = time.monotonic()
        np.asarray(fn(*a))
        ts.append(time.monotonic() - t0)
    return min(ts)


def _words(kw, kmajor=False):
    idx = jnp.arange(R, dtype=jnp.uint32)
    ctr = jnp.arange(chacha.BLOCKS_PER_ROW, dtype=jnp.uint32)
    if kmajor:
        n_lo, c = idx[None, :], ctr[:, None]   # [400, R]
    else:
        n_lo, c = idx[:, None], ctr[None, :]   # [R, 400]
    shape = jnp.broadcast_shapes(n_lo.shape, c.shape)
    init = [jnp.broadcast_to(jnp.uint32(x), shape) for x in chacha._CONSTS]
    init += [jnp.broadcast_to(kw[i], shape) for i in range(8)]
    init += [jnp.broadcast_to(c, shape), jnp.broadcast_to(jnp.uint32(0), shape),
             jnp.broadcast_to(n_lo, shape), jnp.broadcast_to(jnp.uint32(0), shape)]
    return chacha._block_words(init)


def main():
    kw = jnp.zeros(8, jnp.uint32)

    @jax.jit
    def concat_raw(kw):
        w = _words(kw)
        return jnp.concatenate(w, axis=1).astype(jnp.uint32).sum()

    print(f"(a) rounds+concat u32 [R,6400]: {timeit(concat_raw, kw)*1e3:7.1f}ms")

    @jax.jit
    def extract_nosum(kw):
        w = _words(kw)
        acc = None
        for x in w:
            for sh in (0, 16):
                v = x >> jnp.uint32(sh)
                lo = ((v & jnp.uint32(0xFF)).astype(jnp.int32) - 128).astype(jnp.int8)
                hi = (((v >> jnp.uint32(8)) & jnp.uint32(0xFF)).astype(jnp.int32)
                      - 128).astype(jnp.int8)
                s = lo.astype(jnp.int32).sum() + hi.astype(jnp.int32).sum()
                acc = s if acc is None else acc + s
        return acc

    print(f"(b) rounds+extract (no concat): {timeit(extract_nosum, kw)*1e3:7.1f}ms")

    @jax.jit
    def kmajor_planes(kw):
        w = _words(kw, kmajor=True)  # 16 x [400, R]
        lo_parts, hi_parts = [], []
        for sh in (0, 16):
            for x in w:
                v = x >> jnp.uint32(sh)
                lo_parts.append(((v & jnp.uint32(0xFF)).astype(jnp.int32)
                                 - 128).astype(jnp.int8))
                hi_parts.append((((v >> jnp.uint32(8)) & jnp.uint32(0xFF))
                                 .astype(jnp.int32) - 128).astype(jnp.int8))
        lo = jnp.concatenate(lo_parts, axis=0)  # [12800, R]
        hi = jnp.concatenate(hi_parts, axis=0)
        return lo.astype(jnp.int32).sum() + hi.astype(jnp.int32).sum()

    print(f"(c) K-major planes [12800, R]:  {timeit(kmajor_planes, kw)*1e3:7.1f}ms")

    # (d) matmul orientation: q [M, K] x db [N, K] vs db_t [K, N]
    M, N, K = 992, 8192, 12800
    kq, kd = jax.random.split(jax.random.key(1))
    q = jax.random.randint(kq, (M, K), -1, 2, dtype=jnp.int8)
    db = jax.random.randint(kd, (N, K), -128, 128, dtype=jnp.int8)
    db_t = jnp.asarray(np.asarray(db).T)

    std = jax.jit(lambda q, db: lax.dot_general(
        q, db, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int16).astype(jnp.int32).sum())
    tra = jax.jit(lambda q, db_t: lax.dot_general(
        q, db_t, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int16).astype(jnp.int32).sum())
    macs = M * N * K
    dt = timeit(std, q, db)
    print(f"(d) dot std  [N,K]: {dt*1e3:7.1f}ms  {macs/dt/1e12:5.0f} TMAC/s")
    dt = timeit(tra, q, db_t)
    print(f"(d) dot tran [K,N]: {dt*1e3:7.1f}ms  {macs/dt/1e12:5.0f} TMAC/s")


if __name__ == "__main__":
    main()
