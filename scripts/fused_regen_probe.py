"""Probe: fully fused ChaCha20-regen + share-matmul Mosaic kernel.

The keyed tail pays ~18 ms/65k-chunk of serial ChaCha regen because XLA
executes one op at a time (VPU regen cannot overlap the MXU matmuls) plus
the HBM round trip of the regenerated planes. This kernel regenerates a
DB row tile's lo/hi planes in VMEM scratch (m==0) and runs the two share
matmuls over them in-kernel, so planes never touch HBM and the Mosaic
scheduler may overlap VPU and MXU work.

    grid = (n_rows/tile_n, M/tile_m)   # m innermost; regen once per n-tile
    scratch: lo/hi int8 [tile_n, K] (natural K order, offset -128)
    per step: out[m,n] = ((q@lo + corr) + ((q@hi + corr) << 8)) mod 2^16

Correctness: interpret mode vs ops.chacha.share_planes_natural +
ops.dot.dot_share_batch (CPU, small shapes). Perf: one config per
invocation (remote-compile wedge hygiene; see scripts/tpu_poll.py).

Run:
  # CPU correctness:
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/fused_regen_probe.py --check
  # TPU timing (one config):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/fused_regen_probe.py \
      --batch 16 --rows 4096 --tile-m 496 --tile-n 1024 --tile-k 1600
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_iris_tpu.constants import BITS
from mpc_iris_tpu.ops.chacha import _CONSTS, _block_words, BLOCKS_PER_ROW

K = BITS  # 12,800 natural-order u16 lanes per row


def _regen_subtile(kw, sid, row0, off0, rows):
    """ChaCha planes for `rows` consecutive rows at global offset off0 from
    row0 -> (lo, hi) int8 [rows, K] in natural K order (mirrors ops.chacha
    word-major layout in registers). The u64-nonce carry must compare
    against the GLOBAL offset (off0 + iota), so row0 and the offset are
    threaded separately instead of pre-adding them at the call site."""
    shape = (rows, BLOCKS_PER_ROW)
    row_iota = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    off = off0 + row_iota
    r = row0 + off
    carry = (r < off).astype(jnp.uint32)
    ctr = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    init = [jnp.full(shape, jnp.uint32(c)) for c in _CONSTS]
    init += [jnp.full(shape, kw[k].astype(jnp.uint32)) for k in range(8)]
    init += [ctr, jnp.full(shape, sid), r, carry]
    words = _block_words(init)  # 16 x u32 [rows, 400]
    # natural order: column j = l*6400 + w*400 + b
    lo_parts, hi_parts = [], []
    for lane_shift in (0, 16):
        for w in words:
            v = w >> jnp.uint32(lane_shift)
            lo_parts.append(((v & jnp.uint32(0xFF)).astype(jnp.int32) - 128
                             ).astype(jnp.int8))
            hi_parts.append((((v >> jnp.uint32(8)) & jnp.uint32(0xFF)
                              ).astype(jnp.int32) - 128).astype(jnp.int8))
    return (jnp.concatenate(lo_parts, axis=1),
            jnp.concatenate(hi_parts, axis=1))


def make_kernel(m_rows, n_rows, tile_m, tile_n, tile_k, regen_rows=128,
                vmem_mb=None, interleave=False, interpret=False):
    n_slabs = K // tile_k
    n_sub = tile_n // regen_rows
    n_tiles = n_rows // tile_n
    m_tiles = m_rows // tile_m
    if interleave:
        assert m_tiles >= n_sub, (
            f"need >= {n_sub} m-steps to spread regen ({m_tiles})")

    def _regen_tile_sub(kw, sid, row0, tile_off, s, lo_ref, hi_ref):
        lo, hi = _regen_subtile(
            kw, sid, row0,
            tile_off + jnp.uint32(s) * jnp.uint32(regen_rows),
            regen_rows,
        )
        sl = pl.dslice(s * regen_rows, regen_rows)
        lo_ref[sl, :] = lo
        hi_ref[sl, :] = hi

    def _matmuls(q_ref, rs_ref, out_ref, lo_ref, hi_ref):
        # Static unroll over K slabs: Mosaic must statically prove slice
        # alignment (a dynamic fori_loop index fails inside pl.when regions),
        # and the unrolled independent dot chains schedule better anyway.
        d_lo = jnp.zeros((tile_m, tile_n), jnp.int32)
        d_hi = jnp.zeros((tile_m, tile_n), jnp.int32)
        for s in range(n_slabs):
            sl = pl.dslice(s * tile_k, tile_k)
            q = q_ref[:, sl]
            d_lo = d_lo + jax.lax.dot_general(
                q, lo_ref[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            d_hi = d_hi + jax.lax.dot_general(
                q, hi_ref[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        corr = rs_ref[...][:, :1] * jnp.int32(128)  # 128 * rowsum(q)
        total = (d_lo + corr) + ((d_hi + corr) << 8)
        out_ref[...] = total.astype(jnp.uint16)

    def kernel(scal_ref, q_ref, rs_ref, out_ref, lo_ref, hi_ref):
        i = pl.program_id(0)  # n tile
        j = pl.program_id(1)  # m tile (innermost)
        kw = [scal_ref[k] for k in range(8)]
        sid = scal_ref[8].astype(jnp.uint32)
        row0 = scal_ref[9].astype(jnp.uint32)
        tile_off = jnp.uint32(i * tile_n)

        @pl.when(j == 0)
        def _():  # regenerate this n-tile's planes into VMEM scratch
            def body(s, carry):
                _regen_tile_sub(kw, sid, row0, tile_off, s, lo_ref, hi_ref)
                return carry

            jax.lax.fori_loop(0, n_sub, body, 0)

        _matmuls(q_ref, rs_ref, out_ref, lo_ref, hi_ref)

    def kernel_interleave(scal_ref, q_ref, rs_ref, out_ref,
                          lo0_ref, hi0_ref, lo1_ref, hi1_ref):
        # Software-pipelined: tile i's matmuls read scratch pair i%2 while
        # m-steps j < n_sub regenerate ONE subtile of tile i+1 into pair
        # (i+1)%2 — the regen (VPU) and the dots (MXU) inside a step are
        # independent chains the Mosaic scheduler can overlap.
        i = pl.program_id(0)  # n tile
        j = pl.program_id(1)  # m tile (innermost)
        kw = [scal_ref[k] for k in range(8)]
        sid = scal_ref[8].astype(jnp.uint32)
        row0 = scal_ref[9].astype(jnp.uint32)
        pairs = ((lo0_ref, hi0_ref), (lo1_ref, hi1_ref))

        @pl.when((i == 0) & (j == 0))
        def _():  # prime: tile 0 fully into pair 0 (serial, once per call)
            def body(s, carry):
                _regen_tile_sub(kw, sid, row0, jnp.uint32(0), s,
                                lo0_ref, hi0_ref)
                return carry

            jax.lax.fori_loop(0, n_sub, body, 0)

        @pl.when((i < n_tiles - 1) & (j < n_sub))
        def _():  # pipeline: subtile j of tile i+1 into the other pair
            nxt_off = (jnp.uint32(i) + 1) * jnp.uint32(tile_n)
            for par in range(2):

                @pl.when((i + 1) % 2 == par)
                def _():
                    _regen_tile_sub(kw, sid, row0, nxt_off, j, *pairs[par])

        for par in range(2):

            @pl.when(i % 2 == par)
            def _():
                _matmuls(q_ref, rs_ref, out_ref, *pairs[par])

    def run(q_nat, kw, sid, row0):
        as_i32 = lambda v: jax.lax.bitcast_convert_type(
            jnp.asarray(v, jnp.uint32).reshape(-1), jnp.int32
        )
        scal = jnp.concatenate([
            as_i32(jnp.asarray(kw, jnp.uint32).reshape(8)),
            as_i32(sid), as_i32(row0),
        ])
        rowsum = q_nat.astype(jnp.int32).sum(axis=1, keepdims=True)
        rowsum = jnp.broadcast_to(rowsum, (m_rows, 128)).astype(jnp.int32)
        grid = (n_rows // tile_n, m_rows // tile_m)
        n_scratch = 4 if interleave else 2
        return pl.pallas_call(
            kernel_interleave if interleave else kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((tile_m, K), lambda i, j, _s: (j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile_m, 128), lambda i, j, _s: (j, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (tile_m, tile_n), lambda i, j, _s: (j, i),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[pltpu.VMEM((tile_n, K), jnp.int8)] * n_scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((m_rows, n_rows), jnp.uint16),
            compiler_params=None if vmem_mb is None else pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024
            ),
            interpret=interpret,
        )(scal, q_nat, rowsum)

    return jax.jit(run)


def check():
    from mpc_iris_tpu.ops.chacha import key_words, share_planes_natural
    from mpc_iris_tpu.ops.dot import dot_share_batch, planes_to_shares

    rng = np.random.default_rng(3)
    m_rows, n_rows = 16, 256
    q = jnp.asarray(rng.integers(-1, 2, (m_rows, K), dtype=np.int8))
    kw = jnp.asarray(key_words(bytes(range(32))))
    sid, row0 = 1, 7 * 256

    # Second case: row0 near 2^32 so the u64-nonce carry flips mid-range —
    # regression for the carry comparing against the local iota instead of
    # the global offset from row0.
    for row0_case in (row0, np.uint32(0xFFFFFF90)):
        lo, hi = share_planes_natural(kw, sid, np.uint32(row0_case), n_rows)
        want = np.asarray(dot_share_batch(q, lo, hi))
        for interleave in (False, True):
            fn = make_kernel(m_rows, n_rows, tile_m=8, tile_n=64, tile_k=1600,
                             regen_rows=32, interleave=interleave,
                             interpret=True)
            got = np.asarray(fn(q, kw, sid, row0_case))
            np.testing.assert_array_equal(got, want)
            print(f"fused regen+matmul kernel (interleave={interleave}, "
                  f"row0={int(row0_case):#x}) == reference path (interpret)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--check", action="store_true")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--rows", type=int, default=4096)
    p.add_argument("--tile-m", type=int, default=496)
    p.add_argument("--tile-n", type=int, default=1024)
    p.add_argument("--tile-k", type=int, default=1600)
    p.add_argument("--regen-rows", type=int, default=128)
    p.add_argument("--vmem-mb", type=int, default=None,
                   help="raise the Mosaic scoped-VMEM limit (default 16)")
    p.add_argument("--reps", type=int, default=8,
                   help="in-jit repetitions per dispatch (see fold())")
    p.add_argument("--interleave", action="store_true",
                   help="software-pipelined variant: regen tile i+1 during "
                   "tile i's matmul steps (double-buffered scratch)")
    args = p.parse_args()

    if args.check:
        check()
        return

    from mpc_iris_tpu.ops.chacha import key_words

    m_rows = args.batch * 31
    assert m_rows % args.tile_m == 0, (m_rows, args.tile_m)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-1, 2, (m_rows, K), dtype=np.int8))
    kw = jnp.asarray(key_words(bytes(range(32))))

    fn = make_kernel(m_rows, args.rows, args.tile_m, args.tile_n,
                     args.tile_k, regen_rows=args.regen_rows,
                     vmem_mb=args.vmem_mb, interleave=args.interleave)
    reps = args.reps

    # R in-jit repetitions per dispatch (perturbed query per step, defeating
    # CSE): a single sub-27 ms pass hides entirely inside the tunnel round
    # trip and yields garbage rates after subtracting the dispatch cost.
    @jax.jit
    def fold(q, kw):
        def step(acc, i):
            qi = (q.astype(jnp.int32) + i % 2).astype(jnp.int8)
            return acc + fn(qi, kw, 0, 0).astype(jnp.uint32).sum(), None

        acc, _ = jax.lax.scan(
            step, jnp.uint32(0), jnp.arange(reps, dtype=jnp.int32))
        return acc

    s = int(np.asarray(fold(q, kw)))  # compile + sync + sanity
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        np.asarray(fold(q, kw))
        ts.append(time.monotonic() - t0)
    dt = min(ts) - 0.027
    macs = 2 * m_rows * args.rows * K * reps
    cmps = (m_rows // 31) * args.rows * 31 * reps
    tag = "interleave" if args.interleave else "serial"
    print(f"{tag} tiles m{args.tile_m} n{args.tile_n} k{args.tile_k} "
          f"x{reps}: {dt*1e3:.1f}ms  {macs/dt/1e12:.0f} TMAC/s  "
          f"{cmps/dt:.2e} cmp/s  (checksum {s})", flush=True)


if __name__ == "__main__":
    main()
