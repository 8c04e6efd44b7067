"""Chase int4 MXU efficiency: layout, conversion, and chunk-size variants."""

import time

import jax
import jax.numpy as jnp
import numpy as np

K = 12800
M = 8192  # batch 256 x 32 rot rows
DIMS_NT = (((1,), (1,)), ((), ()))  # [M,K] x [N,K]
DIMS_NN = (((1,), (0,)), ((), ()))  # [M,K] x [K,N]


def timeit(fn, *args, iters=3):
    jax.tree.map(np.asarray, fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.monotonic()
        jax.tree.map(np.asarray, fn(*args))
        ts.append(time.monotonic() - t0)
    return min(ts) - 0.027


def main():
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    q8 = jax.random.randint(k1, (M, K), -1, 2, dtype=jnp.int8)

    for chunk, n_chunks in ((32768, 4), (16384, 8), (8192, 16)):
        db = jax.random.randint(k2, (n_chunks, chunk, K), -1, 2, dtype=jnp.int8)
        macs = 2 * M * n_chunks * chunk * K

        @jax.jit
        def scan_i4(q, db):
            q4 = q.astype(jnp.int4)

            def step(c, e):
                e4 = e.astype(jnp.int4)
                d1 = jax.lax.dot_general(q4, e4, DIMS_NT, preferred_element_type=jnp.int16)
                d2 = jax.lax.dot_general(q4, e4, DIMS_NT, preferred_element_type=jnp.int16)
                return c + d1.astype(jnp.int32).sum() + d2.astype(jnp.int32).sum(), None

            acc, _ = jax.lax.scan(step, jnp.int32(0), db)
            return acc

        dt = timeit(scan_i4, q8, db)
        print(f"i4 NT scan chunk={chunk}: {dt*1e3:7.1f}ms  {macs/dt/1e12:5.0f} TMAC/s", flush=True)

    # transposed RHS layout [K, N]
    chunk, n_chunks = 32768, 4
    dbT = jax.random.randint(k2, (n_chunks, K, chunk), -1, 2, dtype=jnp.int8)
    macs = 2 * M * n_chunks * chunk * K

    @jax.jit
    def scan_i4_nn(q, db):
        q4 = q.astype(jnp.int4)

        def step(c, e):
            e4 = e.astype(jnp.int4)
            d1 = jax.lax.dot_general(q4, e4, DIMS_NN, preferred_element_type=jnp.int16)
            d2 = jax.lax.dot_general(q4, e4, DIMS_NN, preferred_element_type=jnp.int16)
            return c + d1.astype(jnp.int32).sum() + d2.astype(jnp.int32).sum(), None

        acc, _ = jax.lax.scan(step, jnp.int32(0), dbT)
        return acc

    dt = timeit(scan_i4_nn, q8, dbT)
    print(f"i4 NN scan (RHS [K,N]): {dt*1e3:7.1f}ms  {macs/dt/1e12:5.0f} TMAC/s", flush=True)

    # packed-unpack path: unpack bits -> int4 directly vs via int8
    from mpc_iris_tpu.ops.encode import unpack_bits, encode_grid_i8

    dbp = jax.random.randint(k1, (4, 32768, 1600), 0, 256, dtype=jnp.uint8)
    dbm = jax.random.randint(k2, (4, 32768, 1600), 0, 256, dtype=jnp.uint8)
    macs = 2 * M * 4 * 32768 * K

    def make_packed(direct4):
        @jax.jit
        def f(q, dbp, dbm):
            q4 = q.astype(jnp.int4)

            def step(c, xs):
                pc, mc = xs
                p = unpack_bits(pc)
                m = unpack_bits(mc)
                if direct4:
                    mi = m.astype(jnp.int4)
                    enc = mi - jnp.int4(2) * (p.astype(jnp.int4) & mi)
                else:
                    enc = encode_grid_i8(p.astype(jnp.int8), m.astype(jnp.int8)).astype(jnp.int4)
                    mi = m.astype(jnp.int4)
                d1 = jax.lax.dot_general(q4, enc, DIMS_NT, preferred_element_type=jnp.int16)
                d2 = jax.lax.dot_general(q4, mi, DIMS_NT, preferred_element_type=jnp.int16)
                return c + d1.astype(jnp.int32).sum() + d2.astype(jnp.int32).sum(), None

            acc, _ = jax.lax.scan(step, jnp.int32(0), (dbp, dbm))
            return acc

        return f

    for direct4, name in ((False, "unpack->i8->i4"), (True, "unpack->i4 direct")):
        try:
            dt = timeit(make_packed(direct4), q8, dbp, dbm)
            print(f"packed {name}: {dt*1e3:7.1f}ms  {macs/dt/1e12:5.0f} TMAC/s", flush=True)
        except Exception as ex:
            print(f"packed {name}: FAILED {type(ex).__name__} {str(ex)[:100]}", flush=True)


if __name__ == "__main__":
    main()
