"""Probe: (a) Pallas in-kernel matmul rates (int8/int4) vs XLA, (b) int16 outputs."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 12800
M = 4096
N = 32768


def timeit(fn, *args, iters=3):
    jax.tree.map(np.asarray, fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.monotonic()
        jax.tree.map(np.asarray, fn(*args))
        ts.append(time.monotonic() - t0)
    return min(ts) - 0.027  # net of dispatch


def main():
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    q = jax.random.randint(k1, (M, K), -1, 2, dtype=jnp.int8)
    db = jax.random.randint(k2, (N, K), -1, 2, dtype=jnp.int8)
    macs = M * N * K
    dims = (((1,), (1,)), ((), ()))

    # XLA baselines
    for name, f in [
        ("xla int8->i32", lambda q, db: jax.lax.dot_general(q, db, dims, preferred_element_type=jnp.int32).sum()),
        ("xla int4->i32", lambda q, db: jax.lax.dot_general(q.astype(jnp.int4), db.astype(jnp.int4), dims, preferred_element_type=jnp.int32).sum()),
        ("xla int4->i16", lambda q, db: jax.lax.dot_general(q.astype(jnp.int4), db.astype(jnp.int4), dims, preferred_element_type=jnp.int16).astype(jnp.int32).sum()),
        ("xla int8->i16", lambda q, db: jax.lax.dot_general(q, db, dims, preferred_element_type=jnp.int16).astype(jnp.int32).sum()),
    ]:
        try:
            dt = timeit(jax.jit(f), q, db)
            print(f"{name}: {dt*1e3:7.1f}ms  {macs/dt/1e12:6.0f} TMAC/s", flush=True)
        except Exception as ex:
            print(f"{name}: FAILED {type(ex).__name__} {str(ex)[:120]}", flush=True)

    # Pallas matmul: grid over (M/tile_m, N/tile_n), full K panels in VMEM.
    def make_pallas(dtype, tile_m=256, tile_n=256):
        def kernel(q_ref, db_ref, out_ref):
            a = q_ref[...]
            b = db_ref[...]
            if dtype == "int4":
                a = a.astype(jnp.int4)
                b = b.astype(jnp.int4)
            out_ref[...] = jax.lax.dot_general(
                a, b, dims, preferred_element_type=jnp.int32
            )

        @jax.jit
        def run(q, db):
            out = pl.pallas_call(
                kernel,
                grid=(M // tile_m, N // tile_n),
                in_specs=[
                    pl.BlockSpec((tile_m, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile_n, K), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
            )(q, db)
            return out.sum()

        return run

    for dtype in ("int8", "int4"):
        for tiles in ((256, 256), (512, 256)):
            try:
                dt = timeit(make_pallas(dtype, *tiles), q, db)
                print(f"pallas {dtype} {tiles}: {dt*1e3:7.1f}ms  {macs/dt/1e12:6.0f} TMAC/s", flush=True)
            except Exception as ex:
                print(f"pallas {dtype} {tiles}: FAILED {type(ex).__name__} {str(ex)[:100]}", flush=True)


if __name__ == "__main__":
    main()
