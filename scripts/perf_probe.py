"""Perf probe: decompose the match-step time into matmul vs epilogue.

Times, on one chip:
  1. raw 2x int8 matmul (dot + den) with trivial fold  -> MXU ceiling
  2. full _match_scan                                  -> current headline step
  3. variants (int4 operands, no-transpose epilogue)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpc_iris_tpu.constants import BITS, N_ROTATIONS


def _sync(out):
    # On the axon remote backend block_until_ready does not synchronize; force a
    # host transfer of the (tiny) outputs.
    return jax.tree.map(np.asarray, out)


def timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        _sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.monotonic()
        _sync(fn(*args))
        ts.append(time.monotonic() - t0)
    return min(ts)


def main():
    b = 128
    chunk = 32768
    n_chunks = 4
    n = chunk * n_chunks
    M = b * N_ROTATIONS

    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    qe = jax.random.randint(k1, (M, BITS), -1, 2, dtype=jnp.int8)
    qm = (qe != 0).astype(jnp.int8)
    db_enc = jax.random.randint(k2, (n_chunks, chunk, BITS), -1, 2, dtype=jnp.int8)
    db_mask = (db_enc != 0).astype(jnp.int8)
    jax.block_until_ready((qe, qm, db_enc, db_mask))

    dims = (((1,), (1,)), ((), ()))

    # 1. raw matmuls only, scalar fold
    @jax.jit
    def raw(qe, qm, db_enc, db_mask):
        def step(c, xs):
            e, m = xs
            dot = jax.lax.dot_general(qe, e, dims, preferred_element_type=jnp.int32)
            den = jax.lax.dot_general(qm, m, dims, preferred_element_type=jnp.int32)
            return c + dot.sum() + den.sum(), None

        acc, _ = jax.lax.scan(step, jnp.int32(0), (db_enc, db_mask))
        return acc

    dt = timeit(raw, qe, qm, db_enc, db_mask)
    macs = 2 * M * n * BITS
    print(f"raw 2-matmul scan: {dt:.3f}s  {macs/dt/1e12:.1f} TOP/s", flush=True)

    # 1b. single matmul only
    @jax.jit
    def raw1(qe, db_enc):
        def step(c, e):
            dot = jax.lax.dot_general(qe, e, dims, preferred_element_type=jnp.int32)
            return c + dot.sum(), None

        acc, _ = jax.lax.scan(step, jnp.int32(0), db_enc)
        return acc

    dt = timeit(raw1, qe, db_enc)
    print(f"raw 1-matmul scan: {dt:.3f}s  {macs/2/dt/1e12:.1f} TOP/s", flush=True)

    # 1c. bigger LHS rows (M=8192) single matmul, one chunk, no scan
    for Mbig in (3968, 8192):
        qeb = jax.random.randint(k3, (Mbig, BITS), -1, 2, dtype=jnp.int8)

        @jax.jit
        def one(qeb, e):
            return jax.lax.dot_general(qeb, e, dims, preferred_element_type=jnp.int32).sum()

        e0 = db_enc[0]
        dt = timeit(one, qeb, e0)
        m1 = Mbig * chunk * BITS
        print(f"single matmul M={Mbig}, N={chunk}: {dt*1e3:.1f}ms  {m1/dt/1e12:.1f} TOP/s", flush=True)

    # 2. full match scan
    from mpc_iris_tpu.models.engines import _match_scan

    qe3 = qe.reshape(b, N_ROTATIONS, BITS)
    qm3 = qm.reshape(b, N_ROTATIONS, BITS)
    dt = timeit(_match_scan, qe3, qm3, db_enc, db_mask)
    print(f"full _match_scan:  {dt:.3f}s  -> {b*n*N_ROTATIONS/dt:.3e} cmp/s", flush=True)

    # 3. int4 experiment
    try:
        qe4 = qe.astype(jnp.int4)
        db4 = db_enc.astype(jnp.int4)
        jax.block_until_ready((qe4, db4))

        @jax.jit
        def raw4(qe4, db4):
            def step(c, e):
                dot = jax.lax.dot_general(qe4, e, dims, preferred_element_type=jnp.int32)
                return c + dot.sum(), None

            acc, _ = jax.lax.scan(step, jnp.int32(0), db4)
            return acc

        dt = timeit(raw4, qe4, db4)
        print(f"raw int4 matmul scan: {dt:.3f}s  {macs/2/dt/1e12:.1f} TOP/s", flush=True)
    except Exception as ex:
        print(f"int4 failed: {type(ex).__name__}: {str(ex)[:200]}", flush=True)


if __name__ == "__main__":
    main()
