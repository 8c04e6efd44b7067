"""Pallas TPU kernel: fused exact min-fraction selection over matmul outputs.

The plaintext match step is two int8 MXU matmuls (numerator dot + denominator dot)
followed by an exact rational argmin over (31 rotations x chunk entries) per query
(reference decode semantics, src/lib.rs:97-107 + src/main.rs:581-621). Expressed as
jnp elementwise trees, that selection materializes O(chunk) int32 intermediates in HBM
and dominates the step time. This kernel instead streams the two matmul outputs
through VMEM once and performs the whole reduction on-chip:

    dot, den : int32 [B*31, N]   (query-major rows: row b*31 + r)
      -> per query b: argmin over (r, n) of fraction ((den-dot)/2) / den
      -> partial winners (num, den, index) int32 [B, N/tile_n]

The tiny partial-winner fold across tiles happens in XLA afterwards. Comparison
semantics are identical to ops/decode.py (`_frac_select`): exact int32 cross products
(values <= 12,800 so products < 2^28), d == 0 behaves as +inf, ties keep the earlier
rotation / lower DB index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_iris_tpu.ops.decode import _frac_select


# Matmul LHS rows are padded to 32 rotation rows per query (the dummy row has
# mask = 0 so den = 0 = invalid): 32 divides the 8-sublane tiling, so the
# (tile_b*32, tn) -> (tile_b, 32, tn) reshape is a free view instead of a relayout.
N_ROT_PAD = 32


def _bitrev5(x):
    x = np.asarray(x)
    out = np.zeros_like(x)
    for i in range(5):
        out |= ((x >> i) & 1) << (4 - i)
    return out


# Rotation rows are fed to the kernels in BIT-REVERSED order: position p
# holds rotation bitrev5(p). Under that order the tree's (i, i+half)
# keep-first pairing is exactly the contiguous adjacent tournament on the
# ORIGINAL rotation indices (FFT decimation-in-time duality), whose
# keep-first ties provably keep the earliest rotation — matching the XLA
# path's index-aware tree (decode.fraction_min_rotations). Natural order
# does NOT have that property: ties between equal fractions at rotations
# {1, 2} of 4 would keep 2 — same value, different (n, d) representation
# (caught round 5 by the fractions-kernel parity test). A strided in-kernel
# slice was rejected by Mosaic ("Only 2D gather is supported"), so the
# reorder happens on the tiny query side, once per batch, in XLA.
# bitrev5(31) == 31, so the all-zero dummy pad row stays the last row.
ROT_BITREV = _bitrev5(np.arange(N_ROT_PAD))


def _keep_first_select(n1, d1, n2, d2, *extras):
    """Select the smaller fraction, ties keep the FIRST operand.

    Keep-first equals lower-index tie-breaking ONLY where the first
    operand's covered indices are ALL lower than the second's: the
    bit-reversed rotation tree (see ROT_BITREV), and the cross-tile scratch
    fold (tile j's scratch covers tiles 0..j-1, all lower columns). The
    column-congruence reduce is NOT such a case and uses the index-aware
    `_frac_select` instead (see `_column_min_to_lanes`). ``extras`` are
    (a1, b1, ...) pairs selected alongside.
    """
    v1 = d1 > 0
    v2 = d2 > 0
    greater = (v2 & ~v1) | (v1 & v2 & (n2 * d1 < n1 * d2))
    pick2 = greater
    out = (
        jnp.where(pick2, n2, n1),
        jnp.where(pick2, d2, d1),
    )
    for a1, a2 in zip(extras[::2], extras[1::2]):
        out += (jnp.where(pick2, a2, a1),)
    return out


_LANES = 128


def _rotation_min(num, den):
    """[tb, 32, tn] -> (n, d) [tb, tn]: exact min fraction over the (padded)
    rotation axis, ties to the earlier ORIGINAL rotation.

    REQUIRES the rotation axis in bit-reversed order (see ROT_BITREV): the
    contiguous-half (i, i+half) pairing below — the only slicing Mosaic
    lowers without a gather — is then the adjacent tournament on original
    indices, whose keep-first ties keep the earliest rotation."""
    k = num.shape[1]
    while k > 1:
        half = k // 2
        num, den = _keep_first_select(
            num[:, :half], den[:, :half], num[:, half:], den[:, half:]
        )
        k = half
    return num[:, 0], den[:, 0]


def _column_min_to_lanes(n, d, col):
    """[tb, tn] halving tree -> (n, d, idx) [tb, 128].

    Stops at the VPU lane width: lane l keeps the best among columns == l
    (mod 128). The compare is the INDEX-AWARE `_frac_select` on the carried
    column plane, not keep-first: under (i, i+half) pairing a slot covers a
    NON-contiguous congruence class, where keep-first can retain the higher
    index on exact-fraction ties (duplicates at columns 129 and 257 of a
    512 tile kept 257 — caught round 5 by the adversarial congruent-
    duplicate test; latent since round 1). The extra index compare is a few
    VPU ops per level on data already in registers. The final cross-lane
    reduce happens once per query tile (see `_lane_argmin`), not per grid
    step.
    """
    tn = n.shape[1]
    first_level = True
    while tn > _LANES:
        half = tn // 2
        if first_level:
            # level 1 is the one level where keep-first IS lowest-index:
            # operand 1's column (i) is strictly below operand 2's (i+half)
            n, d, col = _keep_first_select(
                n[:, :half], d[:, :half], n[:, half:], d[:, half:],
                col[:, :half], col[:, half:],
            )
            first_level = False
        else:
            n, d, col = _frac_select(
                n[:, :half], d[:, :half], col[:, :half],
                n[:, half:], d[:, half:], col[:, half:],
            )
        tn = half
    return n, d, col


def _lane_argmin(n, d, idx):
    """[tb, 128] -> (n, d, idx) [tb, 1]: cross-lane reduce with true index
    tie-breaks (lane order does not follow global index order)."""
    w = n.shape[1]
    while w > 1:
        half = w // 2
        n, d, idx = _frac_select(
            n[:, :half], d[:, :half], idx[:, :half],
            n[:, half:], d[:, half:], idx[:, half:],
        )
        w = half
    return n, d, idx


def _select_kernel(
    off_ref, dot_ref, den_ref, out_ref, ns, ds, idxs, *, tile_b, tile_n
):
    j = pl.program_id(1)
    # int16 matmul outputs halve the input streaming traffic; widen in VMEM.
    dot = dot_ref[...].astype(jnp.int32).reshape(tile_b, N_ROT_PAD, tile_n)
    den = den_ref[...].astype(jnp.int32).reshape(tile_b, N_ROT_PAD, tile_n)
    # Plaintext path: den - dot = 2 * #unequal >= 0, exact in int32.
    num = (den - dot) >> 1
    n, d = _rotation_min(num, den)
    col = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_b, tile_n), 1)
        + off_ref[0]
        + j * tile_n
    )
    n, d, idx = _column_min_to_lanes(n, d, col)

    # Per-lane running best lives in VMEM scratch; outputs are written once per
    # query tile. (Per-step writes to a tiny revisited output block serialize the
    # whole input pipeline — measured 15x slower.)
    @pl.when(j == 0)
    def _():
        ns[...], ds[...], idxs[...] = n, d, idx

    @pl.when(j != 0)
    def _():
        ns[...], ds[...], idxs[...] = _keep_first_select(
            ns[...], ds[...], n, d, idxs[...], idx
        )

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        n1, d1, i1 = _lane_argmin(ns[...], ds[...], idxs[...])
        # Single packed (tile_b, 3*128) output block: multiple (or sub-lane-width)
        # output arrays collapse the Mosaic input pipeline (measured 3x slower).
        # Lanes 0/128/256 carry n/d/idx; the rest is broadcast filler.
        out_ref[...] = jnp.concatenate(
            [jnp.broadcast_to(v, (tile_b, _LANES)) for v in (n1, d1, i1)], axis=1
        )


@functools.partial(jax.jit, static_argnames=("tile_b", "tile_n", "interpret"))
def select_chunk(dot, den, index_offset, *, tile_b=8, tile_n=2048, interpret=False):
    """Fused selection over one DB chunk's matmul outputs.

    Args:
      dot, den: int32 or int16 [B*32, N] numerator-dot and denominator matmul
        outputs with rows padded to 32 rotations per query (row 32b+31 must have
        den == 0). int16 inputs stream at half the HBM cost and are widened
        on-chip.
      index_offset: traced int32 scalar added to global DB indices (chunked scans).
      tile_b: queries per grid step (B must divide).
      tile_n: DB entries per grid step (N must divide; multiple of 128).

    Returns:
      (n, d, idx) int32 [B] chunk winners (exact rational argmin, ties to the
      earlier rotation / lower DB index — identical to the XLA path).
    """
    m, n_cols = dot.shape
    assert m % N_ROT_PAD == 0
    b = m // N_ROT_PAD
    assert b % tile_b == 0 and n_cols % tile_n == 0, (b, n_cols, tile_b, tile_n)
    # The column halving tree requires tile_n = 128 * 2^k (plain divisibility by
    # 128 is not enough: halving must land exactly on the 128-lane width).
    assert tile_n >= _LANES and (tile_n & (tile_n - 1)) == 0, tile_n
    grid = (b // tile_b, n_cols // tile_n)
    off = jnp.asarray(index_offset, jnp.int32).reshape(1)

    kernel = functools.partial(_select_kernel, tile_b=tile_b, tile_n=tile_n)
    out_shape = jax.ShapeDtypeStruct((b, 3 * _LANES), jnp.int32)
    # Index maps receive the scalar-prefetch ref as a trailing argument.
    in_spec = pl.BlockSpec(
        (tile_b * N_ROT_PAD, tile_n),
        lambda i, j, _off: (i, j),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (tile_b, 3 * _LANES), lambda i, j, _off: (i, 0), memory_space=pltpu.VMEM
    )
    packed = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[in_spec, in_spec],
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((tile_b, _LANES), jnp.int32)] * 3,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(off, dot, den)
    return packed[:, 0], packed[:, _LANES], packed[:, 2 * _LANES]


def fold_candidates(n, d, idx, axis=-1):
    """Fold per-tile winner triples along ``axis`` (ties keep the lower idx)."""
    axis = axis % n.ndim
    size = n.shape[axis]
    n = jnp.moveaxis(n, axis, -1)
    d = jnp.moveaxis(d, axis, -1)
    idx = jnp.moveaxis(idx, axis, -1)
    pow2 = 1 << (size - 1).bit_length()
    if pow2 != size:
        pad = [(0, 0)] * (n.ndim - 1) + [(0, pow2 - size)]
        n = jnp.pad(n, pad)
        d = jnp.pad(d, pad)  # d == 0 pads lose every compare
        idx = jnp.pad(idx, pad, constant_values=2**31 - 1)
    while pow2 > 1:
        half = pow2 // 2
        n, d, idx = _frac_select(
            n[..., :half], d[..., :half], idx[..., :half],
            n[..., half:], d[..., half:], idx[..., half:],
        )
        pow2 = half
    return n[..., 0], d[..., 0], idx[..., 0]
