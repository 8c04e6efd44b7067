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
    # Donated planes: the mm consumes the regen output so the runtime can
    # reuse the (2, chunk, K) buffer across in-flight chunks.
    mm = jax.jit(lambda q, planes: _share_dots_chunk(q, planes[0], planes[1]),
                 donate_argnums=(1,))

    def run_fused():
        acc = np.uint64(0)
        for c in range(T):
            out = _share_dots_chunk_keyed(q_nat, kw, sid,
                                          np.uint32(c * chunk), chunk)
            acc += np.uint64(np.asarray(fold(out)))
        return acc

    def run_serial2():
        acc = np.uint64(0)
        for c in range(T):
            planes = _keyed_planes_chunk(kw, sid, np.uint32(c * chunk), chunk)
            acc += np.uint64(np.asarray(fold(mm(q_nat, planes))))
        return acc

    def run_pipelined():
        # One chunk of lookahead: regen(c+1) is dispatched before mm(c)'s
        # result is touched; the only host sync is the final scalar fetches.
        sums = []
        planes = _keyed_planes_chunk(kw, sid, np.uint32(0), chunk)
        for c in range(T):
            nxt = (_keyed_planes_chunk(kw, sid, np.uint32((c + 1) * chunk), chunk)
                   if c + 1 < T else None)
            sums.append(fold(mm(q_nat, planes)))
            planes = nxt
        return sum(np.uint64(np.asarray(s)) for s in sums)

    runs = {"fused": run_fused, "serial2": run_serial2,
            "pipelined": run_pipelined}
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
    assert len(set(checks.values())) == 1, f"checksum mismatch: {checks}"
    print("checksums identical across variants")


if __name__ == "__main__":
    main()
