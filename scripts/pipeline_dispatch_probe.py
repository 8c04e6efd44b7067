#!/usr/bin/env python
"""Measure whether HOST-PIPELINED alternating dispatches overlap ChaCha regen
(VPU) with share matmuls (MXU) on the keyed path — VERDICT r2 next-step #5.

Context (docs/RESULTS.md): the keyed participant sits ~12% below its 7.7e9
share roofline because tail-chunk regeneration serializes against the matmuls
inside one XLA program, and the fully fused Mosaic kernel was measured a dead
end (commit a2372e5). The remaining idea: split regen and matmul into SEPARATE
jit dispatches and keep two chunks in flight (dispatch regen(c+1) before the
result of matmul(c) is consumed), hoping the TPU runtime overlaps queued
programs.

Three timings over the same T tail chunks (B queries, chunk rows each):

  fused      — `_share_dots_chunk_keyed` per chunk (regen+mm in ONE dispatch;
               this is what the engine's fold pass runs inside lax.scan)
  serial2    — regen dispatch then mm dispatch per chunk (two programs,
               no lookahead) — isolates the program-split cost
  pipelined  — regen(c+1) dispatched BEFORE mm(c) (two programs, one chunk of
               lookahead, donated plane buffers)

All dispatches are async; one np.asarray on a folded scalar syncs the run.
If the TPU executes queued programs strictly in order (the expected
single-core behavior), pipelined ~= serial2 >= fused and the approach is
closed; a pipelined win < serial2 would mean inter-program overlap exists.

Run:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/pipeline_dispatch_probe.py
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpc_iris_tpu.constants import BITS_BYTES
from mpc_iris_tpu.models.engines import (
    _keyed_planes_chunk,
    _queries_to_natural_k,
    _share_dots_chunk,
    _share_dots_chunk_keyed,
    prepare_query_planes,
)
from mpc_iris_tpu.ops.chacha import key_words


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=32768)
    p.add_argument("--tail-chunks", type=int, default=8)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    chunk, T, b = args.chunk, args.tail_chunks, args.batch

    rng = np.random.default_rng(0)
    qpat = rng.integers(0, 256, (b, BITS_BYTES), dtype=np.uint8)
    qmsk = rng.integers(0, 256, (b, BITS_BYTES), dtype=np.uint8)
    q_enc, _ = prepare_query_planes(qpat, qmsk)
    q_nat = jax.block_until_ready(_queries_to_natural_k(q_enc))
    kw = jnp.asarray(key_words(bytes(range(32))))
    sid = jnp.uint32(0)

    fold = jax.jit(lambda x: x.astype(jnp.uint32).sum())
    mm = jax.jit(lambda q, planes: _share_dots_chunk(q, planes[0], planes[1]))

    # Every variant defers ALL host fetches to the end (one scalar per chunk,
    # summed after the loop): a per-chunk np.asarray would add a ~27 ms
    # tunnel round trip per chunk and masquerade as pipelining gains.
    @functools.partial(jax.jit, static_argnames=("t", "c"))
    def scan_pass(q, *, t, c):
        def step(acc, i):
            out = _share_dots_chunk_keyed(q, kw, sid, i * c, c)
            return acc + out.astype(jnp.uint32).sum(), None

        acc, _ = jax.lax.scan(step, jnp.uint32(0),
                              jnp.arange(t, dtype=jnp.uint32))
        return acc

    def run_scan1():
        # The engine's current shape: ONE dispatch, tail in lax.scan.
        return np.uint64(np.asarray(scan_pass(q_nat, t=T, c=chunk)))

    def run_fused_loop():
        sums = [fold(_share_dots_chunk_keyed(q_nat, kw, sid,
                                             np.uint32(c * chunk), chunk))
                for c in range(T)]
        return sum(np.uint64(np.asarray(s)) for s in sums)

    def run_split_loop():
        # regen then mm as two programs per chunk, queue order r0,m0,r1,m1…
        sums = []
        for c in range(T):
            planes = _keyed_planes_chunk(kw, sid, np.uint32(c * chunk), chunk)
            sums.append(fold(mm(q_nat, planes)))
        return sum(np.uint64(np.asarray(s)) for s in sums)

    def run_pipelined():
        # One chunk of lookahead: regen(c+1) enqueued before mm(c),
        # queue order r0,r1,m0,r2,m1,…
        sums = []
        planes = _keyed_planes_chunk(kw, sid, np.uint32(0), chunk)
        for c in range(T):
            nxt = (_keyed_planes_chunk(kw, sid, np.uint32((c + 1) * chunk), chunk)
                   if c + 1 < T else None)
            sums.append(fold(mm(q_nat, planes)))
            planes = nxt
        return sum(np.uint64(np.asarray(s)) for s in sums)

    runs = {"scan1": run_scan1, "fused-loop": run_fused_loop,
            "split-loop": run_split_loop, "pipelined": run_pipelined}
    checks = {}
    for name, fn in runs.items():
        checks[name] = fn()  # compile + warm
        times = []
        for _ in range(args.iters):
            t0 = time.monotonic()
            fn()
            times.append(time.monotonic() - t0)
        dt = min(times)
        rate = b * T * chunk * 31 / dt
        print(f"{name:10s}: {dt:.3f}s  ({dt / T * 1e3:.1f} ms/chunk, "
              f"{rate:.3e} cmp/s)")
    # scan1 accumulates in uint32 on device (wraps); loop variants sum uint64
    # on host — compare mod 2^32.
    mods = {int(v) & 0xFFFFFFFF for v in checks.values()}
    assert len(mods) == 1, f"checksum mismatch: {checks}"
    print("checksums identical across variants (mod 2^32)")


if __name__ == "__main__":
    main()
