"""Does the v5e MXU run int4 x int4 -> int32 matmuls faster than int8?"""

import time

import jax
import jax.numpy as jnp
import numpy as np

BITS = 12800
DIMS = (((1,), (1,)), ((), ()))


def timeit(fn, *args, iters=3):
    jax.tree.map(np.asarray, fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.monotonic()
        jax.tree.map(np.asarray, fn(*args))
        ts.append(time.monotonic() - t0)
    return min(ts)


def main():
    M, N = 4096, 32768
    n_chunks = 4
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    q8 = jax.random.randint(k1, (M, BITS), -1, 2, dtype=jnp.int8)
    db8 = jax.random.randint(k2, (n_chunks, N, BITS), -1, 2, dtype=jnp.int8)
    macs = n_chunks * M * N * BITS

    @jax.jit
    def mm8(q, db):
        def step(c, e):
            o = jax.lax.dot_general(q, e, DIMS, preferred_element_type=jnp.int32)
            return c + o.sum(), None
        acc, _ = jax.lax.scan(step, jnp.int32(0), db)
        return acc

    dt = timeit(mm8, q8, db8)
    print(f"int8:   {dt*1e3:6.1f}ms  {macs/max(dt-0.027,1e-9)/1e12:.0f} TMAC/s net", flush=True)

    # int4 operands (converted once, outside the timed loop)
    try:
        @jax.jit
        def to4(x):
            return x.astype(jnp.int4)

        q4 = to4(q8)
        db4 = to4(db8)

        @jax.jit
        def mm4(q, db):
            def step(c, e):
                o = jax.lax.dot_general(q, e, DIMS, preferred_element_type=jnp.int32)
                return c + o.sum(), None
            acc, _ = jax.lax.scan(step, jnp.int32(0), db)
            return acc

        ref = np.asarray(mm8(q8, db8))
        got = np.asarray(mm4(q4, db4))
        print(f"int4 == int8 result: {ref == got}", flush=True)
        dt = timeit(mm4, q4, db4)
        print(f"int4:   {dt*1e3:6.1f}ms  {macs/max(dt-0.027,1e-9)/1e12:.0f} TMAC/s net", flush=True)
    except Exception as ex:
        print(f"int4 failed: {type(ex).__name__}: {str(ex)[:300]}", flush=True)

    # bf16 for reference
    qb = q8.astype(jnp.bfloat16)
    dbb = db8.astype(jnp.bfloat16)

    @jax.jit
    def mmb(q, db):
        def step(c, e):
            o = jax.lax.dot_general(q, e, DIMS, preferred_element_type=jnp.float32)
            return c + o.sum(), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), db)
        return acc

    dt = timeit(mmb, qb, dbb)
    print(f"bf16:   {dt*1e3:6.1f}ms  {macs/max(dt-0.027,1e-9)/1e12:.0f} TMAC/s net", flush=True)


if __name__ == "__main__":
    main()


def main2():
    M, N = 4096, 32768
    n_chunks = 4
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    q8 = jax.random.randint(k1, (M, BITS), -1, 2, dtype=jnp.int8)
    db8 = jax.random.randint(k2, (n_chunks, N, BITS), -1, 2, dtype=jnp.int8)
    macs = n_chunks * M * N * BITS

    @jax.jit
    def mm4_inline(q, db):
        q4 = q.astype(jnp.int4)
        def step(c, e):
            o = jax.lax.dot_general(q4, e.astype(jnp.int4), DIMS,
                                    preferred_element_type=jnp.int32)
            return c + o.sum(), None
        acc, _ = jax.lax.scan(step, jnp.int32(0), db)
        return acc

    got = np.asarray(mm4_inline(q8, db8))
    dt = timeit(mm4_inline, q8, db8)
    print(f"int4(inline cvt): {dt*1e3:6.1f}ms  {macs/max(dt-0.027,1e-9)/1e12:.0f} TMAC/s net", flush=True)

    @jax.jit
    def mm4_pre(q, db):
        # convert whole DB to int4 first (materialized), then scan
        q4 = q.astype(jnp.int4)
        db4 = db.astype(jnp.int4)
        def step(c, e):
            o = jax.lax.dot_general(q4, e, DIMS, preferred_element_type=jnp.int32)
            return c + o.sum(), None
        acc, _ = jax.lax.scan(step, jnp.int32(0), db4)
        return acc

    dt = timeit(mm4_pre, q8, db8)
    print(f"int4(pre cvt):    {dt*1e3:6.1f}ms  {macs/max(dt-0.027,1e-9)/1e12:.0f} TMAC/s net", flush=True)
