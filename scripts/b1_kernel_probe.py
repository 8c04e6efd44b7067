"""B=1 packed-dot Pallas kernel probe: in-VMEM unpack + slab dots (+ fused
selection) for the single-query serving shape (VERDICT r04 next #3).

latency_probe.py decomposed the 104.5 ms B=1 p50 at 1M packed into ~29 ms
tunnel + ~46 ms unpack+encode + ~30 ms low-M matmuls + ~2 ms selection: the
floor is the B-independent HBM traffic of MATERIALIZING the int8 planes
(~29 GB/pass written+read) that B=1536 amortizes over the whole batch. This
kernel never materializes them: each grid step reads one [tile_n, 1600]
packed tile (pattern + mask), unpacks all 8 bit-planes in VMEM, and
accumulates 8 slab dots of K=1600 per operand against the 32-row query —
exploiting the dot's K-permutation invariance (DESIGN.md 6.1) with the
BIT-PLANE-MAJOR order k = bit * 1600 + byte, so each unpacked bit-plane IS
a contiguous K slab. DB read: 3.2 KB/entry, the packed storage itself.

Variants:
  pk-dot     kernel emits packed (den << 16 | num) int32 [32, N]; the cheap
             XLA epilogue (measured ~2 ms) selects.
  pk-select  selection fused in-kernel too (select_pallas's reduction over
             VMEM scratch); output is one [1, 384] winner block — the pass
             writes nothing else to HBM.

Correctness: both variants vs _match_scan_packed in interpret mode (CPU)
and on TPU against the live unfused winner.

Run:
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/b1_kernel_probe.py --check
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/b1_kernel_probe.py \
      [--db 1048576] [--tile-n 512] [--variant pk-select]
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_iris_tpu.constants import BITS, BITS_BYTES, N_ROTATIONS
from mpc_iris_tpu.ops.select_pallas import (
    _LANES,
    _column_min_to_lanes,
    _keep_first_select,
    _lane_argmin,
    _rotation_min,
)

DIMS = (((1,), (1,)), ((), ()))
N_ROT_PAD = 32
PLANE = BITS_BYTES  # 1600 columns per bit-plane slab


def bitplane_perm() -> np.ndarray:
    """K permutation natural -> bit-plane-major: position j = bit*1600 + byte
    holds natural index byte*8 + bit."""
    j = np.arange(BITS)
    return (j % PLANE) * 8 + j // PLANE


def _unpack_planes(pat32, msk32, b):
    """One bit-plane: i32-widened packed bytes [tn, 1600] -> (enc_b, m_b)
    int8 [tn, 1600].

    The bit arithmetic runs in i32 lanes: Mosaic does not legalize int8
    vector shifts/multiplies (arith.shrui / arith.muli on vector<i8>), so
    i8 is only the final dot-operand cast. The encode m - 2*(p & m) is a
    select for the same reason."""
    one = jnp.int32(1)
    p_b = (jax.lax.shift_right_logical(pat32, jnp.int32(b)) & one)
    m_b = (jax.lax.shift_right_logical(msk32, jnp.int32(b)) & one)
    m_i = m_b.astype(jnp.int8)
    enc_b = jnp.where((p_b & m_b) != 0, jnp.int8(-1), m_i)
    return enc_b, m_i


def _acc_dots(qe_ref, qm_ref, pat_t, msk_t, tile_n, int4=False):
    pat32 = pat_t.astype(jnp.int32)
    msk32 = msk_t.astype(jnp.int32)
    acc_dot = jnp.zeros((N_ROT_PAD, tile_n), jnp.int32)
    acc_den = jnp.zeros((N_ROT_PAD, tile_n), jnp.int32)
    cast = (lambda x: x.astype(jnp.int4)) if int4 else (lambda x: x)
    for b in range(8):
        enc_b, m_b = _unpack_planes(pat32, msk32, b)
        sl = pl.dslice(b * PLANE, PLANE)
        acc_dot = acc_dot + jax.lax.dot_general(
            cast(qe_ref[:, sl]), cast(enc_b), DIMS,
            preferred_element_type=jnp.int32)
        acc_den = acc_den + jax.lax.dot_general(
            cast(qm_ref[:, sl]), cast(m_b), DIMS,
            preferred_element_type=jnp.int32)
    return acc_dot, acc_den


def make_pk_dot(n_rows, tile_n, interpret=False, vmem_mb=None):
    """Packed-dot kernel: out int32 [32, N] = (den << 16) | num."""

    def kernel(qe_ref, qm_ref, pat_ref, msk_ref, out_ref):
        acc_dot, acc_den = _acc_dots(
            qe_ref, qm_ref, pat_ref[...], msk_ref[...], tile_n)
        num = (acc_den - acc_dot) >> 1
        out_ref[...] = num | (acc_den << 16)

    @jax.jit
    def run(qe_bp, qm_bp, pat, msk):
        out = pl.pallas_call(
            kernel,
            grid=(n_rows // tile_n,),
            in_specs=[
                pl.BlockSpec((N_ROT_PAD, BITS), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_ROT_PAD, BITS), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, PLANE), lambda j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, PLANE), lambda j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((N_ROT_PAD, tile_n), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_ROT_PAD, n_rows), jnp.int32),
            compiler_params=None if vmem_mb is None else pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024),
            interpret=interpret,
        )(qe_bp, qm_bp, pat, msk)
        # cheap XLA epilogue (measured ~2 ms at B=1): exact rational argmin
        num = (out & 0xFFFF)[None, :N_ROTATIONS]      # [1, 31, N]
        den = (jax.lax.shift_right_logical(out, 16))[None, :N_ROTATIONS]
        from mpc_iris_tpu.ops.decode import (
            fraction_argmin,
            fraction_min_rotations,
        )

        n_r, d_r, _ = fraction_min_rotations(num, den, axis=1)
        n_c, d_c, i_c = fraction_argmin(n_r, d_r, axis=-1,
                                        index_offset=jnp.int32(0))
        return jnp.stack([n_c, d_c, i_c])

    return run


def make_pk_select(n_rows, tile_n, interpret=False, vmem_mb=None, int4=False):
    """Fully fused: packed-dot + exact selection; out [1, 384] winners."""

    def kernel(qe_ref, qm_ref, pat_ref, msk_ref, out_ref, ns, ds, idxs):
        j = pl.program_id(0)
        acc_dot, acc_den = _acc_dots(
            qe_ref, qm_ref, pat_ref[...], msk_ref[...], tile_n, int4=int4)
        num3 = ((acc_den - acc_dot) >> 1).reshape(1, N_ROT_PAD, tile_n)
        den3 = acc_den.reshape(1, N_ROT_PAD, tile_n)
        n, d = _rotation_min(num3, den3)
        col = (jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
               + j * tile_n)
        n, d, idx = _column_min_to_lanes(n, d, col)

        @pl.when(j == 0)
        def _():
            ns[...], ds[...], idxs[...] = n, d, idx

        @pl.when(j != 0)
        def _():
            ns[...], ds[...], idxs[...] = _keep_first_select(
                ns[...], ds[...], n, d, idxs[...], idx)

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            n1, d1, i1 = _lane_argmin(ns[...], ds[...], idxs[...])
            out_ref[...] = jnp.concatenate(
                [jnp.broadcast_to(v, (1, _LANES)) for v in (n1, d1, i1)],
                axis=1)

    @jax.jit
    def run(qe_bp, qm_bp, pat, msk):
        packed = pl.pallas_call(
            kernel,
            grid=(n_rows // tile_n,),
            in_specs=[
                pl.BlockSpec((N_ROT_PAD, BITS), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_ROT_PAD, BITS), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, PLANE), lambda j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, PLANE), lambda j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 3 * _LANES), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 3 * _LANES), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, _LANES), jnp.int32)] * 3,
            compiler_params=None if vmem_mb is None else pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024),
            interpret=interpret,
        )(qe_bp, qm_bp, pat, msk)
        return jnp.stack([packed[:, 0], packed[:, _LANES],
                          packed[:, 2 * _LANES]])

    return run


def prep_query(qpat, qmsk):
    """Packed query -> bit-plane-major padded [32, K] int8 LHS pair."""
    from mpc_iris_tpu.models.engines import prepare_query_planes

    from mpc_iris_tpu.ops.select_pallas import ROT_BITREV

    q_enc, q_mask = prepare_query_planes(qpat, qmsk)  # [1, 31, K] natural
    perm = jnp.asarray(bitplane_perm())
    rev = jnp.asarray(ROT_BITREV)  # _rotation_min requires bitrev order
    pad = jnp.zeros((1, 1, BITS), q_enc.dtype)
    qe = jnp.concatenate([q_enc, pad], axis=1)[0][rev][:, perm]
    qm = jnp.concatenate([q_mask, pad], axis=1)[0][rev][:, perm]
    return qe, qm


def check():
    from mpc_iris_tpu.models.engines import (
        _match_scan_packed,
        prepare_query_planes,
    )

    rng = np.random.default_rng(5)
    n = 4096
    pat = rng.integers(0, 256, (n, BITS_BYTES), dtype=np.uint8)
    msk = rng.integers(0, 256, (n, BITS_BYTES), dtype=np.uint8)
    qpat, qmsk = pat[17:18].copy(), msk[17:18].copy()  # planted self-match
    q_enc, q_mask = prepare_query_planes(qpat, qmsk)
    want = np.asarray(_match_scan_packed(
        q_enc, q_mask,
        jnp.asarray(pat).reshape(2, n // 2, BITS_BYTES),
        jnp.asarray(msk).reshape(2, n // 2, BITS_BYTES), fused=False))

    qe, qm = prep_query(qpat, qmsk)
    for name, mk in (("pk-dot", make_pk_dot), ("pk-select", make_pk_select)):
        fn = mk(n, tile_n=512, interpret=True)
        got = np.asarray(fn(qe, qm, jnp.asarray(pat), jnp.asarray(msk)))
        assert np.array_equal(got.ravel(), want.ravel()), (name, got, want)
        print(f"{name} == _match_scan_packed (interpret) "
              f"[winner idx {got.ravel()[2]}]")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--check", action="store_true")
    p.add_argument("--db", type=int, default=1_048_576)
    p.add_argument("--tile-n", type=int, default=512)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--vmem-mb", type=int, default=None)
    p.add_argument("--int4", action="store_true")
    p.add_argument("--variant", choices=["pk-dot", "pk-select"],
                   default="pk-select")
    args = p.parse_args()

    if args.check:
        check()
        return

    from mpc_iris_tpu.models.engines import _match_scan_packed, \
        prepare_query_planes

    n = args.db
    rng = np.random.default_rng(0)
    qpat = rng.integers(0, 256, (1, BITS_BYTES), dtype=np.uint8)
    qmsk = rng.integers(0, 256, (1, BITS_BYTES), dtype=np.uint8)
    gen = jax.jit(lambda k: jax.random.bits(k, (n, BITS_BYTES), jnp.uint8))
    pat = jax.block_until_ready(gen(jax.random.PRNGKey(1)))
    msk = jax.block_until_ready(gen(jax.random.PRNGKey(2)))
    qe, qm = prep_query(qpat, qmsk)

    mk = make_pk_dot if args.variant == "pk-dot" else make_pk_select
    kw = dict(tile_n=args.tile_n, vmem_mb=args.vmem_mb)
    if args.variant == "pk-select":
        kw["int4"] = args.int4
    fn = mk(n, **kw)
    t0 = time.monotonic()
    out = np.asarray(fn(qe, qm, pat, msk))
    print(f"{args.variant} tile_n={args.tile_n}: warmup "
          f"{time.monotonic() - t0:.1f}s, winner {out.ravel().tolist()}",
          flush=True)

    # live parity vs the shipped unfused path at the same DB
    q_enc, q_mask = prepare_query_planes(qpat, qmsk)
    chunk = 65536
    want = np.asarray(_match_scan_packed(
        q_enc, q_mask, pat.reshape(n // chunk, chunk, BITS_BYTES),
        msk.reshape(n // chunk, chunk, BITS_BYTES), fused=False))
    assert np.array_equal(out.ravel(), want.ravel()), (out, want)
    print("winner == shipped unfused path (live TPU)", flush=True)

    ts = []
    for _ in range(args.iters):
        t0 = time.monotonic()
        np.asarray(fn(qe, qm, pat, msk))
        ts.append(time.monotonic() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{args.variant} tile_n={args.tile_n}: p50 {med * 1e3:.1f} ms "
          f"(min {min(ts) * 1e3:.1f}) over {args.iters} "
          f"(vs 104.5 ms shipped B=1 p50)", flush=True)


if __name__ == "__main__":
    main()
