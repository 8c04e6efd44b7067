"""Probe: single-dispatch keyed share pass vs the per-chunk dispatch loop.

The keyed bench loop (bench.py --mode share-keyed) pays ~27 ms dispatch +
~27 ms scalar fetch per chunk on the axon tunnel (16 chunks at 1M entries
-> ~0.9 s of pure overhead on a ~2.2 s pass). This probe folds the whole
pass into ONE jitted dispatch:

  - resident head: lax.scan over a stacked [R, 2, chunk, K] plane array
  - regenerated tail: lax.scan over row offsets, ChaCha regen inside the body

and sweeps the resident head size to find the OOM boundary now that the
Pallas word generator uses less workspace than the XLA emitter it replaced.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/keyed_pass_probe.py
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from mpc_iris_tpu.constants import BITS, BITS_BYTES
from mpc_iris_tpu.models.engines import (
    _keyed_planes_chunk,
    _queries_to_natural_k,
    _share_dots_chunk,
    _share_dots_chunk_keyed,
    prepare_query_planes,
)


def build_pass(chunk: int, n_res: int, n_tail: int):
    """One device dispatch: fold dots over resident planes + regenerated tail.

    Resident chunks are separate [2, chunk, K] args (unrolled in the jit) —
    stacking them would transiently double the head's HBM footprint.
    Returns uint32 scalar checksum (keeps the pass compute-bound on device).
    """
    @jax.jit
    def run(q_nat, kw, sid, *resident):
        acc = jnp.uint32(0)
        for planes in resident:
            out = _share_dots_chunk(q_nat, planes[0], planes[1])
            acc = acc + out.astype(jnp.uint32).sum()

        if n_tail:
            def tail_step(acc, t):
                row0 = (n_res + t) * chunk
                out = _share_dots_chunk_keyed(q_nat, kw, sid, row0, chunk)
                return acc + out.astype(jnp.uint32).sum(), None

            acc, _ = jax.lax.scan(
                tail_step, acc, jnp.arange(n_tail, dtype=jnp.uint32)
            )
        return acc

    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--db", type=int, default=1048576)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--chunk", type=int, default=65536)
    p.add_argument("--resident", type=int, nargs="*", default=None,
                   help="resident chunk counts to sweep (default 0,5,6,7)")
    p.add_argument("--iters", type=int, default=2)
    args = p.parse_args()

    n = args.db
    chunk = args.chunk
    n_chunks = n // chunk
    resident_counts = args.resident if args.resident is not None else [0, 5, 6, 7]

    rng = np.random.default_rng(0)
    qpat = rng.integers(0, 256, size=(args.batch, BITS_BYTES), dtype=np.uint8)
    qmsk = rng.integers(0, 256, size=(args.batch, BITS_BYTES), dtype=np.uint8)
    q_enc, _ = prepare_query_planes(qpat, qmsk)
    q_nat = jax.block_until_ready(_queries_to_natural_k(q_enc))

    kw = jnp.asarray(np.arange(8, dtype=np.uint32))
    sid = 0

    for n_res in resident_counts:
        n_res = min(n_res, n_chunks)
        n_tail = n_chunks - n_res
        try:
            t0 = time.monotonic()
            resident = [
                jax.block_until_ready(_keyed_planes_chunk(kw, sid, c * chunk, chunk))
                for c in range(n_res)
            ]
            build_s = time.monotonic() - t0
            run = build_pass(chunk, n_res, n_tail)
            t0 = time.monotonic()
            np.asarray(run(q_nat, kw, sid, *resident))
            warm_s = time.monotonic() - t0
            times = []
            for _ in range(args.iters):
                t0 = time.monotonic()
                np.asarray(run(q_nat, kw, sid, *resident))
                times.append(time.monotonic() - t0)
            dt = min(times)
            rate = args.batch * n * 31 / dt
            print(f"resident={n_res}/{n_chunks} chunks "
                  f"({n_res * chunk} rows, {n_res * 2 * BITS * chunk / 2**30:.1f} GiB): "
                  f"build {build_s:.1f}s warm {warm_s:.1f}s "
                  f"pass {dt:.3f}s -> {rate:.3e} cmp/s", flush=True)
            del resident
        except Exception as e:  # OOM boundary probing
            msg = str(e).splitlines()[0][:160]
            print(f"resident={n_res}: FAILED: {type(e).__name__}: {msg}",
                  flush=True)


if __name__ == "__main__":
    main()
