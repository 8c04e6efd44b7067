"""B=1 latency decomposition + attack probes (VERDICT r04 next #3).

The one-query serving shape (reference src/main.rs:411-447) measured 104.5 ms
p50 at 1M packed, ~29 ms of which is the axon tunnel. This probe decomposes
the remaining ~75 ms scan into its stages and times the attack variants:

  full-unfused     the shipped B=1 path (_match_scan_packed, XLA epilogue)
  fused-tb1        same matmuls + the Pallas selection kernel at tile_b=1
                   (today gated off by _fused_ok's B % 8 == 0)
  unpack-only      per-chunk unpack+encode, matmuls and selection elided
  dots-only        unpack+encode+both matmuls, selection elided
  (full - dots-only = selection epilogue; dots-only - unpack-only = matmuls)

Each variant is ONE jitted dispatch per pass over the same device-resident
packed DB; times are wall clock including the ~29 ms tunnel round trip
(subtract for the pure-scan number).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/latency_probe.py \
        [--db 1048576] [--chunk 65536] [--iters 10] [--variants ...]
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from mpc_iris_tpu.constants import BITS, BITS_BYTES, N_ROTATIONS
from mpc_iris_tpu.models.engines import (
    _match_scan_packed,
    prepare_query_planes,
)
from mpc_iris_tpu.ops.dot import dot_bits_batch_i4
from mpc_iris_tpu.ops.encode import encode_grid_i8, unpack_bits
from mpc_iris_tpu.ops.select_pallas import select_chunk


@functools.partial(jax.jit, static_argnames=("tile_b", "tile_n", "interpret"))
def _match_scan_packed_fused_tb(q_enc, q_mask, db_pat, db_msk, *,
                                tile_b, tile_n=2048, interpret=False):
    """_match_scan_packed's fused branch with a parametric selection tile."""
    from mpc_iris_tpu.ops.decode import running_min
    from mpc_iris_tpu.ops.select_pallas import ROT_BITREV

    b = q_enc.shape[0]
    rev = jnp.asarray(ROT_BITREV)  # _rotation_min requires bitrev order
    pad = jnp.zeros((b, 1, BITS), q_enc.dtype)
    qe = jnp.concatenate([q_enc, pad], axis=1)[:, rev].reshape(b * 32, BITS)
    qm = jnp.concatenate([q_mask, pad], axis=1)[:, rev].reshape(b * 32, BITS)

    def step(carry, xs):
        pat_c, msk_c, offset = xs
        p = unpack_bits(pat_c).astype(jnp.int8)
        m = unpack_bits(msk_c).astype(jnp.int8)
        enc_c = encode_grid_i8(p, m)
        dot = dot_bits_batch_i4(qe, enc_c, out_dtype=jnp.int16)
        den = dot_bits_batch_i4(qm, m, out_dtype=jnp.int16)
        n_c, d_c, i_c = select_chunk(dot, den, offset, tile_b=tile_b,
                                     tile_n=tile_n, interpret=interpret)
        return running_min(carry, n_c, d_c, i_c), None

    init = (jnp.zeros(b, jnp.int32), jnp.zeros(b, jnp.int32),
            jnp.full(b, 2**31 - 1, jnp.int32))
    offsets = jnp.arange(db_pat.shape[0], dtype=jnp.int32) * db_pat.shape[1]
    (n, d, i), _ = jax.lax.scan(step, init, (db_pat, db_msk, offsets))
    return jnp.stack([n, d, i])


@jax.jit
def _unpack_only(db_pat, db_msk):
    def step(acc, xs):
        pat_c, msk_c = xs
        p = unpack_bits(pat_c).astype(jnp.int8)
        m = unpack_bits(msk_c).astype(jnp.int8)
        enc_c = encode_grid_i8(p, m)
        # fold to a scalar so nothing can be dead-code-eliminated
        return acc + enc_c.astype(jnp.int32).sum() + m.astype(jnp.int32).sum(), None

    acc, _ = jax.lax.scan(step, jnp.int32(0), (db_pat, db_msk))
    return acc


@jax.jit
def _dots_only(q_enc, q_mask, db_pat, db_msk):
    b = q_enc.shape[0]
    qe = q_enc.reshape(b * N_ROTATIONS, BITS)
    qm = q_mask.reshape(b * N_ROTATIONS, BITS)

    def step(acc, xs):
        pat_c, msk_c = xs
        p = unpack_bits(pat_c).astype(jnp.int8)
        m = unpack_bits(msk_c).astype(jnp.int8)
        enc_c = encode_grid_i8(p, m)
        dot = dot_bits_batch_i4(qe, enc_c, out_dtype=jnp.int16)
        den = dot_bits_batch_i4(qm, m, out_dtype=jnp.int16)
        return acc + dot.astype(jnp.int32).sum() + den.astype(jnp.int32).sum(), None

    acc, _ = jax.lax.scan(step, jnp.int32(0), (db_pat, db_msk))
    return acc


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--db", type=int, default=1_048_576)
    p.add_argument("--chunk", type=int, default=65_536)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--tile-n", type=int, default=2048)
    p.add_argument("--variants", nargs="*", default=None,
                   help="subset of: full-unfused fused-tb1 unpack-only "
                   "dots-only")
    args = p.parse_args()

    n, chunk = args.db, args.chunk
    n_chunks = n // chunk
    assert n_chunks * chunk == n
    dev = jax.devices()[0]
    print(f"device {dev.device_kind}; DB {n_chunks}x{chunk} packed, B=1",
          flush=True)

    rng = np.random.default_rng(0)
    qpat = rng.integers(0, 256, (1, BITS_BYTES), dtype=np.uint8)
    qmsk = rng.integers(0, 256, (1, BITS_BYTES), dtype=np.uint8)
    q_enc, q_mask = prepare_query_planes(qpat, qmsk)

    genp = jax.jit(
        lambda k: jax.random.bits(k, (n_chunks, chunk, BITS_BYTES), jnp.uint8)
    )
    db_pat = jax.block_until_ready(genp(jax.random.PRNGKey(1)))
    db_msk = jax.block_until_ready(genp(jax.random.PRNGKey(2)))

    interp = jax.default_backend() != "tpu"
    variants = {
        "full-unfused": lambda: np.asarray(_match_scan_packed(
            q_enc, q_mask, db_pat, db_msk, fused=False)),
        "fused-tb1": lambda: np.asarray(_match_scan_packed_fused_tb(
            q_enc, q_mask, db_pat, db_msk, tile_b=1, tile_n=args.tile_n,
            interpret=interp)),
        "unpack-only": lambda: np.asarray(_unpack_only(db_pat, db_msk)),
        "dots-only": lambda: np.asarray(_dots_only(
            q_enc, q_mask, db_pat, db_msk)),
    }
    selected = args.variants or list(variants)

    results = {}
    for name in selected:
        fn = variants[name]
        t0 = time.monotonic()
        out = fn()
        print(f"{name}: warmup {time.monotonic() - t0:.1f}s", flush=True)
        ts = []
        for _ in range(args.iters):
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
        med = sorted(ts)[len(ts) // 2]
        results[name] = med
        extra = ""
        if name in ("full-unfused", "fused-tb1"):
            extra = f"  winner={np.asarray(out)[:, 0].tolist()}"
        print(f"{name}: p50 {med * 1e3:.1f} ms (min {min(ts) * 1e3:.1f})"
              f"{extra}", flush=True)

    if "full-unfused" in results and "fused-tb1" in results:
        # cross-check identical winners
        a = np.asarray(variants["full-unfused"]())
        b_ = np.asarray(variants["fused-tb1"]())
        assert np.array_equal(a, b_), (a, b_)
        print("winners identical (unfused == fused-tb1)", flush=True)
    if "dots-only" in results and "full-unfused" in results:
        print(f"decomposition: selection ~= "
              f"{(results['full-unfused'] - results['dots-only']) * 1e3:.1f} ms; "
              f"matmuls ~= "
              f"{(results['dots-only'] - results.get('unpack-only', 0)) * 1e3:.1f} ms; "
              f"unpack+encode ~= {results.get('unpack-only', 0) * 1e3:.1f} ms "
              f"(each incl. ~29 ms tunnel once)", flush=True)


if __name__ == "__main__":
    main()
