"""Pallas TPU kernel: small-batch match directly over BIT-PACKED DB planes.

The serving-latency shape — one query (or a handful) per dispatch, the
reference's connection-per-query loop (src/main.rs:411-447) — is floored not
by FLOPs but by HBM traffic: the batched path materializes the unpacked int8
encoding planes (25.6 KB/entry written + read back per pass, ~29 GB at 1M
entries), which B=1536 amortizes across the batch and B=1 pays in full.
Measured decomposition at 1M packed, B=1 (scripts/latency_probe.py, TPU
v5e): ~29 ms tunnel + ~46 ms unpack+encode + ~30 ms low-M matmuls + ~2 ms
selection = 104.5 ms p50.

This kernel never materializes the planes. Each grid step reads one
[tile_n, 1600] PACKED tile pair (pattern + mask bytes — the storage format
itself, 3.2 KB/entry total), unpacks all 8 bit-planes in VMEM, and
accumulates 8 slab dots of K=1600 per operand against the (padded) 32-row
query block, then folds the exact rational selection in-kernel
(select_pallas's reduction helpers over VMEM scratch). The only HBM write
of the whole pass is the [B, 384] winner block.

The K order is BIT-PLANE-MAJOR (k = bit * 1600 + byte): the dot is
invariant under any fixed permutation applied to both operands' K axes
(same trick as the keyed engine's natural-K order, DESIGN.md 6.1), and in
this order each unpacked bit-plane IS a contiguous K slab, so the query
side is permuted once per batch and the DB side needs no interleave at all.

Mosaic constraints baked in (discovered on metal): int8 vector shifts /
multiplies do not legalize (bit arithmetic runs in i32 lanes, i8 only as
the final dot-operand cast); int4 in-kernel dots do not legalize ("Expected
mask vector type"); tile_n=512 needs the scoped-VMEM limit raised to 32 MB.

Measured (1M entries, B=1, TPU v5e): p50 73.7 ms end-to-end vs 104.5 ms for
the unfused packed scan — bit-identical winners (scripts/b1_kernel_probe.py
sweep: tile_n 128 -> 77.5 ms, 256 -> 76.3, 512 -> 73.7, 1024 -> 76.0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_iris_tpu.constants import BITS, BITS_BYTES, N_ROTATIONS
from mpc_iris_tpu.ops.select_pallas import (
    _LANES,
    N_ROT_PAD,
    ROT_BITREV,
    _column_min_to_lanes,
    _keep_first_select,
    _lane_argmin,
    _rotation_min,
)

DIMS = (((1,), (1,)), ((), ()))
PLANE = BITS_BYTES  # 1600 packed bytes per entry = one bit-plane's K slab

# Production config, validated on metal (see module docstring sweep).
SMALL_B_TILE_N = 512
_VMEM_LIMIT_MB = 32

# Measured dispatch boundary (1M entries, TPU v5e): the kernel beats the
# batched fused scan through B=8 (91.8 ms vs 114.6 ms — the scan's
# materialized-planes traffic still dominates at 8 queries); B=12 and B=16
# (LHS row blocks of 384/512) SIGABRT the remote Mosaic compiler, so the
# boundary sits exactly where the kernel stops compiling. B=9..15 fall back
# to the XLA scan; B % 8 == 0 past 8 uses the batched fused scan.
SMALL_B_MAX = 8


@functools.cache
def _bitplane_perm() -> np.ndarray:
    """K permutation natural -> bit-plane-major: position j = bit*1600 + byte
    holds natural index byte*8 + bit (natural order per bits.rs:44-57:
    bit i lives at byte i//8, bit i%8, LSB-first). Cached as a HOST array:
    caching a jnp array would capture the first jit trace's tracer."""
    j = np.arange(BITS)
    return (j % PLANE) * 8 + j // PLANE


def _unpack_planes(pat32, msk32, b):
    """One bit-plane: i32-widened packed bytes [tn, 1600] -> (enc_b, m_b)
    int8 [tn, 1600] with enc in {-1, 0, 1}, mask in {0, 1}.

    i32 lanes because Mosaic does not legalize int8 vector shifts
    (arith.shrui) or multiplies (arith.muli); the encode m - 2*(p & m) is
    expressed as a select for the same reason."""
    one = jnp.int32(1)
    p_b = jax.lax.shift_right_logical(pat32, jnp.int32(b)) & one
    m_b = jax.lax.shift_right_logical(msk32, jnp.int32(b)) & one
    m_i = m_b.astype(jnp.int8)
    enc_b = jnp.where((p_b & m_b) != 0, jnp.int8(-1), m_i)
    return enc_b, m_i


def _acc_dots(qe_ref, qm_ref, pat_t, msk_t, rows, tile_n):
    """8 slab dots per operand: int32 (dot, den) [rows, tile_n]."""
    pat32 = pat_t.astype(jnp.int32)
    msk32 = msk_t.astype(jnp.int32)
    acc_dot = jnp.zeros((rows, tile_n), jnp.int32)
    acc_den = jnp.zeros((rows, tile_n), jnp.int32)
    for b in range(8):
        enc_b, m_b = _unpack_planes(pat32, msk32, b)
        sl = pl.dslice(b * PLANE, PLANE)
        acc_dot = acc_dot + jax.lax.dot_general(
            qe_ref[:, sl], enc_b, DIMS, preferred_element_type=jnp.int32)
        acc_den = acc_den + jax.lax.dot_general(
            qm_ref[:, sl], m_b, DIMS, preferred_element_type=jnp.int32)
    return acc_dot, acc_den


def _pk_select_kernel(qe_ref, qm_ref, pat_ref, msk_ref, out_ref,
                      ns, ds, idxs, *, b, tile_n):
    # 2D grid (chunk, tile-within-chunk): the DB stays in its original
    # [C, c, 1600] layout — flattening it on the XLA side forced a full
    # HBM copy of both operands into the custom call (measured 2x4.9 GB at
    # 3M entries, an OOM). j = flat tile counter in ascending column order
    # (row-major grid iteration).
    tiles_per_chunk = pl.num_programs(1)
    j = pl.program_id(0) * tiles_per_chunk + pl.program_id(1)
    acc_dot, acc_den = _acc_dots(
        qe_ref, qm_ref, pat_ref[0], msk_ref[0], b * N_ROT_PAD, tile_n)
    num3 = ((acc_den - acc_dot) >> 1).reshape(b, N_ROT_PAD, tile_n)
    den3 = acc_den.reshape(b, N_ROT_PAD, tile_n)
    n, d = _rotation_min(num3, den3)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1) + j * tile_n
    n, d, idx = _column_min_to_lanes(n, d, col)

    # Running per-lane best in VMEM scratch; one tiny output write at the end
    # (per-step writes to a small revisited block serialize the pipeline).
    @pl.when(j == 0)
    def _():
        ns[...], ds[...], idxs[...] = n, d, idx

    @pl.when(j != 0)
    def _():
        ns[...], ds[...], idxs[...] = _keep_first_select(
            ns[...], ds[...], n, d, idxs[...], idx)

    @pl.when(j == pl.num_programs(0) * tiles_per_chunk - 1)
    def _():
        n1, d1, i1 = _lane_argmin(ns[...], ds[...], idxs[...])
        out_ref[...] = jnp.concatenate(
            [jnp.broadcast_to(v, (b, _LANES)) for v in (n1, d1, i1)], axis=1)


# XLA stages both packed operands into DENSE copies for the Pallas custom
# call (the [.., 1600] lane dim is not 128-aligned, so the resident arrays
# carry ~4% tile padding the call must strip — 2 x 4.9 GB temps at 3M
# entries, an HBM OOM next to the 9.6 GB residents). The copies fit
# comfortably through ~2M entries (1M: 2 x 1.6 GB, ~5 ms each at HBM
# bandwidth); past the cap the scan path — which reads the padded layout in
# place — takes over.
SMALL_B_MAX_ROWS = 2_097_152


def small_b_ok(b: int, chunk: int, total_rows: int | None = None) -> bool:
    """True when the packed small-batch kernel applies: 1..SMALL_B_MAX
    queries, a chunk the tile divides (the flat DB is chunk-padded, so
    chunk divisibility implies total divisibility), and a DB small enough
    that the custom call's dense operand copies fit HBM (see
    SMALL_B_MAX_ROWS; None skips the size check)."""
    if total_rows is not None and total_rows > SMALL_B_MAX_ROWS:
        return False
    return 1 <= b <= SMALL_B_MAX and chunk % SMALL_B_TILE_N == 0


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def match_packed_small_b(q_enc, q_mask, db_pat, db_msk, *,
                         tile_n=SMALL_B_TILE_N, interpret=False):
    """Small-batch match over a bit-packed DB, one fused dispatch.

    Args:
      q_enc, q_mask: int8 [B, 31, K] prepared query planes (natural K order,
        engines.prepare_query_planes), 1 <= B <= SMALL_B_MAX.
      db_pat, db_msk: uint8 [C, c, 1600] packed chunks (c % tile_n == 0;
        padded entries must be all-zero: mask 0 -> den 0 -> invalid).

    Returns int32 [3, B] stacked (numerator, denominator, index) — identical
    semantics (exact rational argmin, earliest-rotation/lowest-index ties)
    and bit-identical results to `_match_scan_packed`.
    """
    b = q_enc.shape[0]
    n_chunks, chunk = db_pat.shape[0], db_pat.shape[1]
    tiles = chunk // tile_n

    # Pad each query's 31 rotation rows to 32 (dummy row: mask 0 = invalid),
    # bit-reverse the rotation order (earliest-rotation ties in the kernel's
    # halving tree; select_pallas.ROT_BITREV), and permute K to
    # bit-plane-major.
    perm = jnp.asarray(_bitplane_perm())
    rev = jnp.asarray(ROT_BITREV)
    pad = jnp.zeros((b, 1, BITS), q_enc.dtype)
    qe = jnp.concatenate([q_enc, pad], axis=1)[:, rev][:, :, perm].reshape(
        b * N_ROT_PAD, BITS)
    qm = jnp.concatenate([q_mask, pad], axis=1)[:, rev][:, :, perm].reshape(
        b * N_ROT_PAD, BITS)

    rows = b * N_ROT_PAD
    packed = pl.pallas_call(
        functools.partial(_pk_select_kernel, b=b, tile_n=tile_n),
        grid=(n_chunks, tiles),
        in_specs=[
            pl.BlockSpec((rows, BITS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, BITS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, PLANE), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, PLANE), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, 3 * _LANES), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3 * _LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b, _LANES), jnp.int32)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_MB * 1024 * 1024),
        interpret=interpret,
    )(qe, qm, db_pat, db_msk)
    return jnp.stack(
        [packed[:, 0], packed[:, _LANES], packed[:, 2 * _LANES]])


def _pk_fractions_kernel(qe_ref, qm_ref, pat_ref, msk_ref, out_ref, *,
                         b, tile_n):
    """Per-entry min-over-rotations fractions, same in-VMEM unpack + slab
    dots as the argmin kernel; out int32 [B, tile_n] = n | (d << 16)
    (both <= 12,800, so the pack is lossless and sign-free). 2D grid over
    the original [C, c, 1600] layout (see _pk_select_kernel)."""
    acc_dot, acc_den = _acc_dots(
        qe_ref, qm_ref, pat_ref[0], msk_ref[0], b * N_ROT_PAD, tile_n)
    num3 = ((acc_den - acc_dot) >> 1).reshape(b, N_ROT_PAD, tile_n)
    den3 = acc_den.reshape(b, N_ROT_PAD, tile_n)
    n, d = _rotation_min(num3, den3)  # padded rotation row: den 0 = invalid
    out_ref[...] = n | (d << 16)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def fractions_packed_small_b(q_enc, q_mask, db_pat, db_msk, *,
                             tile_n=SMALL_B_TILE_N, interpret=False):
    """Small-batch audit spectrum over a bit-packed DB, one fused dispatch.

    The audit sibling of :func:`match_packed_small_b` (same measured floor:
    at small B the scan's materialized int8 planes dominate): returns the
    per-entry min-over-31-rotations exact (numerator, denominator) pairs as
    uint16 [2, B, N_padded] — identical values to
    `engines._fractions_scan_packed` (padded DB rows report d == 0; callers
    trim to the true count). Feeds the same device compaction
    (`engines._compact_under_device`) as the scan path.
    """
    b = q_enc.shape[0]
    n_chunks, chunk = db_pat.shape[0], db_pat.shape[1]
    tiles = chunk // tile_n
    n_rows = n_chunks * chunk

    perm = jnp.asarray(_bitplane_perm())
    rev = jnp.asarray(ROT_BITREV)
    pad = jnp.zeros((b, 1, BITS), q_enc.dtype)
    qe = jnp.concatenate([q_enc, pad], axis=1)[:, rev][:, :, perm].reshape(
        b * N_ROT_PAD, BITS)
    qm = jnp.concatenate([q_mask, pad], axis=1)[:, rev][:, :, perm].reshape(
        b * N_ROT_PAD, BITS)

    rows = b * N_ROT_PAD
    out = pl.pallas_call(
        functools.partial(_pk_fractions_kernel, b=b, tile_n=tile_n),
        grid=(n_chunks, tiles),
        in_specs=[
            pl.BlockSpec((rows, BITS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, BITS), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, PLANE), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, PLANE), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (b, tile_n),
            lambda i, j, _tiles=tiles: (0, i * _tiles + j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_rows), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_MB * 1024 * 1024),
        interpret=interpret,
    )(qe, qm, db_pat, db_msk)
    n = (out & 0xFFFF).astype(jnp.uint16)
    d = jax.lax.shift_right_logical(out, 16).astype(jnp.uint16)
    return jnp.stack([n, d])
