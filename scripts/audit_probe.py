"""Measure the threshold-audit (find_under) pass at scale on the real TPU.

The audit keeps per-entry min fractions (uint16 [2, B, N] device output)
instead of folding to the argmin, so vs a match pass it adds one 4·B·N-byte
device->host fetch plus the host threshold filter. This probe times both
passes at the same shapes for the RESULTS table.

Run from the repo root: PYTHONPATH=/root/.axon_site:/root/repo \
    python scripts/audit_probe.py [--db 1048576] [--batch 8] [--iters 3]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpc_iris_tpu.constants import BITS_BYTES
from mpc_iris_tpu.models.engines import (
    _fractions_scan_packed,
    _match_scan_packed,
    prepare_query_planes,
)
from mpc_iris_tpu.ops.decode import under_threshold_mask_np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--db", type=int, default=1_048_576)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--chunk", type=int, default=32_768)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--threshold", type=float, default=0.375)
    p.add_argument("--compact-k", type=int, default=65536)
    args = p.parse_args()

    n, b, chunk = args.db, args.batch, args.chunk
    n_chunks = -(-n // chunk)
    rng = np.random.default_rng(0)
    qpat = rng.integers(0, 256, (b, BITS_BYTES), dtype=np.uint8)
    qmsk = rng.integers(0, 256, (b, BITS_BYTES), dtype=np.uint8)
    q_enc, q_mask = prepare_query_planes(qpat, qmsk)

    genp = jax.jit(
        lambda k: jax.random.bits(k, (n_chunks, chunk, BITS_BYTES), jnp.uint8)
    )
    db_pat = jax.block_until_ready(genp(jax.random.PRNGKey(1)))
    db_msk = jax.block_until_ready(genp(jax.random.PRNGKey(2)))
    print(f"DB {n_chunks}x{chunk} packed planes on device")

    interp = jax.default_backend() != "tpu"

    def audit_pass():
        nd = np.asarray(
            _fractions_scan_packed(q_enc, q_mask, db_pat, db_msk)
        )
        hits = under_threshold_mask_np(nd[0], nd[1], args.threshold)
        return int(hits.sum())

    def audit_pass_compact():
        # O(matches) fetch: device-side conservative prefilter + compaction
        # (engines._fractions_under_compact_packed); exact settle over the
        # candidates on host.
        from mpc_iris_tpu.models.engines import (
            _fractions_under_compact_packed,
        )

        t_hi = np.float32(args.threshold * (1.0 + 1e-4))
        meta, nd_c = _fractions_under_compact_packed(
            q_enc, q_mask, db_pat, db_msk, t_hi, args.compact_k)
        meta = np.asarray(meta)
        nd_c = np.asarray(nd_c)
        total = 0
        for q in range(b):
            c = int(meta[q, 0])
            assert c <= args.compact_k, "raise --compact-k for this threshold"
            total += int(under_threshold_mask_np(
                nd_c[0, q, :c].astype(np.int64),
                nd_c[1, q, :c].astype(np.int64), args.threshold).sum())
        return total

    def match_pass():
        return np.asarray(
            _match_scan_packed(q_enc, q_mask, db_pat, db_msk,
                               fused=b % 8 == 0 and chunk % 2048 == 0,
                               interpret=interp and b % 8 == 0)
        )

    for name, fn in (("match", match_pass), ("audit", audit_pass),
                     ("audit-compact", audit_pass_compact)):
        fn()  # compile + warm
        times = []
        for _ in range(args.iters):
            t0 = time.monotonic()
            out = fn()
            times.append(time.monotonic() - t0)
        rate = b * n * 31 / min(times)
        print(f"{name}: best {min(times):.3f}s over {args.iters} iters "
              f"({rate:.3e} cmp/s at B={b}; last result: "
              f"{out if np.isscalar(out) or isinstance(out, int) else out.shape})")


if __name__ == "__main__":
    main()
