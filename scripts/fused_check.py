"""TPU check: fused Pallas selection == XLA selection, and its speed."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from mpc_iris_tpu.constants import BITS, N_ROTATIONS
from mpc_iris_tpu.models.engines import _match_scan, _match_scan_fused


def timeit(fn, *args, iters=3):
    jax.tree.map(np.asarray, fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.monotonic()
        jax.tree.map(np.asarray, fn(*args))
        ts.append(time.monotonic() - t0)
    return min(ts)


def main():
    b = 128
    chunk = 32768
    n_chunks = 4
    n = chunk * n_chunks

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    qe = jax.random.randint(k1, (b, N_ROTATIONS, BITS), -1, 2, dtype=jnp.int8)
    qm = (qe != 0).astype(jnp.int8)
    db_enc = jax.random.randint(k2, (n_chunks, chunk, BITS), -1, 2, dtype=jnp.int8)
    db_mask = (db_enc != 0).astype(jnp.int8)

    ref = [np.asarray(x) for x in _match_scan(qe, qm, db_enc, db_mask)]
    got = [np.asarray(x) for x in _match_scan_fused(qe, qm, db_enc, db_mask)]
    for name, r, g in zip("ndi", ref, got):
        assert np.array_equal(r, g), (name, r[:8], g[:8])
    print("fused == XLA on random data OK", flush=True)

    dt_ref = timeit(_match_scan, qe, qm, db_enc, db_mask)
    cmps = b * n * N_ROTATIONS
    print(f"XLA   step: {dt_ref:.3f}s -> {cmps/dt_ref:.3e} cmp/s", flush=True)

    for tb, tn in [(8, 512), (8, 2048), (16, 1024), (8, 4096), (32, 512), (16, 2048)]:
        try:
            f = lambda *a: _match_scan_fused(*a, tile_b=tb, tile_n=tn)
            got = [np.asarray(x) for x in f(qe, qm, db_enc, db_mask)]
            assert all(np.array_equal(r, g) for r, g in zip(ref, got))
            dt = timeit(f, qe, qm, db_enc, db_mask)
            print(f"fused ({tb},{tn}): {dt:.3f}s -> {cmps/dt:.3e} cmp/s", flush=True)
        except Exception as ex:
            print(f"fused ({tb},{tn}): FAILED {type(ex).__name__} {str(ex)[:120]}", flush=True)


if __name__ == "__main__":
    main()
