"""Probe: entry-major share blocks — transpose epilogue vs entry-major-native
matmul.

The participant's PROTOCOL path must materialize entry-major uint16
[chunk, B, 31] reply blocks (the batched wire's byte order). Today that is
dot_general(Q [B*31, K], DB [chunk, K]) -> [B*31, chunk] followed by a
transpose; the alternative computes dot_general(DB, Q) -> [chunk, B*31]
which IS entry-major natively (reshape is free). This times both shapes of
the full exact-Z_2^16 pipeline (2 int8 matmuls + offset correction) with the
blocks materialized as program outputs in HBM, per chunk over a scanned DB.

PYTHONPATH=/root/.axon_site:/root/repo python scripts/sharewire_probe.py
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mpc_iris_tpu.constants import BITS, N_ROTATIONS

_DIMS = (((1,), (1,)), ((), ()))


@functools.partial(jax.jit, static_argnames=("variant",))
def chunk_block(q_i8, lo_c, hi_c, *, variant: str):
    """ONE chunk's entry-major uint16 block [chunk, B*31] (materialized as a
    program output) + a tiny checksum to fetch without pulling the block."""

    def step_transpose(lo_c, hi_c):
        d_lo = lax.dot_general(q_i8, lo_c, dimension_numbers=_DIMS,
                               preferred_element_type=jnp.int16)
        d_hi = lax.dot_general(q_i8, hi_c, dimension_numbers=_DIMS,
                               preferred_element_type=jnp.int16)
        rowsum = jnp.sum(q_i8.astype(jnp.int32), axis=1, keepdims=True)
        corr = (jnp.int32(128) * rowsum).astype(jnp.int16)
        total = (d_lo + corr) + ((d_hi + corr) << 8)  # [B*31, chunk]
        return total.astype(jnp.uint16).T  # entry-major via transpose

    def step_native(lo_c, hi_c):
        d_lo = lax.dot_general(lo_c, q_i8, dimension_numbers=_DIMS,
                               preferred_element_type=jnp.int16)
        d_hi = lax.dot_general(hi_c, q_i8, dimension_numbers=_DIMS,
                               preferred_element_type=jnp.int16)
        colsum = jnp.sum(q_i8.astype(jnp.int32), axis=1)  # [B*31]
        corr = (jnp.int32(128) * colsum).astype(jnp.int16)[None, :]
        total = (d_lo + corr) + ((d_hi + corr) << 8)  # [chunk, B*31]
        return total.astype(jnp.uint16)  # entry-major natively

    step = step_transpose if variant == "transpose" else step_native
    ys = step(lo_c, hi_c)
    return ys, ys[0, :4].astype(jnp.uint32).sum()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--db", type=int, default=131_072)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--chunk", type=int, default=32_768)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    n, b, chunk = args.db, args.batch, args.chunk
    c = n // chunk
    m = b * N_ROTATIONS
    rng = np.random.default_rng(0)
    q = rng.integers(-1, 2, (m, BITS)).astype(np.int8)

    gen = jax.jit(lambda k: lax.bitcast_convert_type(
        jax.random.bits(k, (chunk, BITS), jnp.uint8), jnp.int8))
    # Device-resident inputs, transferred ONCE: per-call host arrays would
    # re-upload ~100 MB of query rows over the tunnel every dispatch.
    lo_list = [jax.block_until_ready(gen(jax.random.PRNGKey(2 * j)))
               for j in range(c)]
    hi_list = [jax.block_until_ready(gen(jax.random.PRNGKey(2 * j + 1)))
               for j in range(c)]
    qd = jax.block_until_ready(jax.device_put(q))
    out_gb = c * chunk * m * 2 / 2**30
    print(f"{c}x{chunk} entries, B={b}: {out_gb:.2f} GiB of blocks per pass",
          flush=True)

    results = {}
    for variant in ("transpose", "native"):
        np.asarray(chunk_block(qd, lo_list[0], hi_list[0], variant=variant)[1])
        print(f"{variant}: compiled", flush=True)
        times = []
        for _ in range(args.iters):
            t0 = time.monotonic()
            chks = [chunk_block(qd, lo_list[j], hi_list[j], variant=variant)[1]
                    for j in range(c)]
            for chk in chks:
                np.asarray(chk)
            times.append(time.monotonic() - t0)
        best = min(times)
        rate = 2 * m * n * BITS / best / 1e12
        results[variant] = best
        print(f"{variant:10s}: best {best*1e3:8.1f} ms/pass "
              f"({rate:.1f} int8-TMAC/s, {b * n * 31 / best:.3e} cmp/s)",
              flush=True)

    # parity: same uint16 blocks up to layout
    ya, _ = chunk_block(qd, lo_list[0], hi_list[0], variant="transpose")
    yb, _ = chunk_block(qd, lo_list[0], hi_list[0], variant="native")
    a0 = np.asarray(ya[:64])
    b0 = np.asarray(yb[:64])
    assert np.array_equal(a0, b0), "variant outputs differ!"
    print(f"parity OK; native/transpose = "
          f"{results['native'] / results['transpose']:.3f}")


if __name__ == "__main__":
    main()
