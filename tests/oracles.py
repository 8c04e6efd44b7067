"""Slow, independent pure-Python oracles for cross-checking the NumPy/JAX paths.

Deliberately written bit-by-bit (no NumPy vectorization) so they share no code with
the implementations under test — the same role the reference's scalar `generic.rs`
kernels play against its SVE assembly (src/arch/sve.rs:79-109).
"""

from __future__ import annotations

from mpc_iris_tpu.constants import BITS, COLS, MAX_ROTATION, ROWS


def bit_at(raw: bytes, i: int) -> int:
    """Bit i of a packed plane: byte i//8, position i%8 (src/bits.rs:218-232)."""
    return (raw[i >> 3] >> (i & 7)) & 1


def rotate_bits_slow(raw: bytes, amount: int) -> list:
    """Rotated bit list: new col j holds old col (j - amount) mod 200."""
    out = []
    for i in range(BITS):
        row, col = divmod(i, COLS)
        src = row * COLS + (col - amount) % COLS
        out.append(bit_at(raw, src))
    return out

def fraction_hamming_slow(a_pattern, a_mask, b_pattern, b_mask):
    """(num, den) integer pair of the masked Hamming distance at rotation 0."""
    num = den = 0
    for i in range(BITS):
        m = bit_at(a_mask, i) & bit_at(b_mask, i)
        den += m
        num += m & (bit_at(a_pattern, i) ^ bit_at(b_pattern, i))
    return num, den


def dot_u16_slow(a, b) -> int:
    """Wrapping-u16 dot product, element by element (src/arch/generic.rs:11-16)."""
    acc = 0
    for x, y in zip(a, b):
        acc = (acc + int(x) * int(y)) & 0xFFFFFFFF
    return acc & 0xFFFF


def distance_slow(a_pattern, a_mask, b_pattern, b_mask) -> float:
    """Min fractional Hamming distance over rotations, f64 (src/template.rs:43-47)."""
    best = float("inf")
    for r in range(-MAX_ROTATION, MAX_ROTATION + 1):
        ap = rotate_bits_slow(a_pattern, r)
        am = rotate_bits_slow(a_mask, r)
        num = den = 0
        for i in range(BITS):
            m = am[i] & bit_at(b_mask, i)
            den += m
            num += m & (ap[i] ^ bit_at(b_pattern, i))
        if den > 0:
            v = num / den
            if v < best:
                best = v
    return best
