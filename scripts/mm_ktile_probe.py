"""Probe: K-tiled in-kernel Mosaic matmuls (prerequisite for a fused
ChaCha+matmul keyed kernel).

mm_probe.py showed whole-K (12,800) `lax.dot_general` inside a Pallas kernel
SIGABRTs the Mosaic compiler at every tile tried (and repeated aborts wedge
the remote-compile service). This probes the two standard alternatives ONE
config per invocation (pass --variant/--tiles), so a failure never cascades:

  grid-k:  grid (m, n, k) with K as a revisited-accumulator grid axis
  slab:    whole-K operands in VMEM, internal fori_loop over K slabs

Run (one at a time, check scripts/tpu_poll.py between runs):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/mm_ktile_probe.py \
      --variant grid-k --tile-m 256 --tile-n 256 --tile-k 3200
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 12800
M = 1984  # 64 queries x 31 rotations
N = 32768
DIMS = (((1,), (1,)), ((), ()))


def make_grid_k(tile_m, tile_n, tile_k):
    def kernel(q_ref, db_ref, out_ref):
        k = pl.program_id(2)
        part = jax.lax.dot_general(
            q_ref[...], db_ref[...], DIMS, preferred_element_type=jnp.int32
        )

        @pl.when(k == 0)
        def _():
            out_ref[...] = part

        @pl.when(k != 0)
        def _():
            out_ref[...] += part

    @jax.jit
    def run(q, db):
        out = pl.pallas_call(
            kernel,
            grid=(M // tile_m, N // tile_n, K // tile_k),
            in_specs=[
                pl.BlockSpec((tile_m, tile_k), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, tile_k), lambda i, j, k: (j, k),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, k: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        )(q, db)
        return out.astype(jnp.uint32).sum()

    return run


def make_slab(tile_m, tile_n, tile_k):
    n_slabs = K // tile_k

    def kernel(q_ref, db_ref, out_ref):
        def body(s, acc):
            sl = pl.dslice(s * tile_k, tile_k)
            return acc + jax.lax.dot_general(
                q_ref[:, sl], db_ref[:, sl], DIMS,
                preferred_element_type=jnp.int32,
            )

        out_ref[...] = jax.lax.fori_loop(
            0, n_slabs, body, jnp.zeros((q_ref.shape[0], db_ref.shape[0]),
                                        jnp.int32)
        )

    @jax.jit
    def run(q, db):
        out = pl.pallas_call(
            kernel,
            grid=(M // tile_m, N // tile_n),
            in_specs=[
                pl.BlockSpec((tile_m, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, K), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        )(q, db)
        return out.astype(jnp.uint32).sum()

    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", choices=["grid-k", "slab", "xla"],
                   default="grid-k")
    p.add_argument("--tile-m", type=int, default=256)
    p.add_argument("--tile-n", type=int, default=256)
    p.add_argument("--tile-k", type=int, default=3200)
    p.add_argument("--reps", type=int, default=8,
                   help="in-jit repetitions per dispatch (lax.scan with a "
                   "per-step perturbed LHS). A single sub-27 ms kernel hides "
                   "entirely inside the tunnel round trip — wall time stays "
                   "~27 ms however fast the kernel is, and subtracting the "
                   "dispatch cost yields garbage (measured r05); amortizing "
                   "R kernels over one dispatch restores a real rate")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-1, 2, (M, K), dtype=np.int8))
    db = jnp.asarray(rng.integers(-128, 128, (N, K), dtype=np.int8))
    macs = M * N * K * args.reps

    if args.variant == "xla":
        base = jax.jit(lambda q, db: jax.lax.dot_general(
            q, db, DIMS, preferred_element_type=jnp.int32
        ).astype(jnp.uint32).sum())
    elif args.variant == "grid-k":
        base = make_grid_k(args.tile_m, args.tile_n, args.tile_k)
    else:
        base = make_slab(args.tile_m, args.tile_n, args.tile_k)

    reps = args.reps

    @jax.jit
    def run(q, db):
        def step(acc, i):
            # per-step LHS perturbation defeats CSE across repetitions
            qi = (q.astype(jnp.int32) + i % 2).astype(jnp.int8)
            return acc + base(qi, db), None

        acc, _ = jax.lax.scan(
            step, jnp.uint32(0), jnp.arange(reps, dtype=jnp.int32))
        return acc

    np.asarray(run(q, db))  # compile
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        np.asarray(run(q, db))
        ts.append(time.monotonic() - t0)
    dt = min(ts) - 0.027
    print(f"{args.variant} m{args.tile_m} n{args.tile_n} k{args.tile_k} "
          f"x{reps}: {dt*1e3:.1f}ms  {macs/dt/1e12:.0f} TMAC/s", flush=True)


if __name__ == "__main__":
    main()
