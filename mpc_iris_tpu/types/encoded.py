"""`EncodedBits` — a vector over Z_2^16 on the 64x200 grid; the unit of secret sharing.

Layout parity with the reference (src/encoded_bits.rs:13-15): 12,800 u16 values,
25,600 bytes, row-major over the grid, little-endian on disk/wire (the reference uses
native-endian bytemuck casts and targets little-endian CPUs; we make LE explicit).

Semantics reproduced here:

- ``share(n)``: additive secret sharing — n-1 uniformly random u16 vectors plus a final
  share equal to ``self - sum(others) mod 2^16`` (reference src/encoded_bits.rs:22-38).
- ``rotate(amount)``: circular shift of each 200-element grid row; new column ``j`` takes
  the old column ``(j - amount) mod 200`` (reference src/encoded_bits.rs:40-58, pinned by
  test_rotated_number src/encoded_bits.rs:205-219). Equals ``np.roll(axis=-1)``.
- ``dot``: wrapping-u16 multiply-accumulate over all 12,800 lanes (reference
  `arch::dot_u16`, src/arch/generic.rs:11-16).
- ring ops: all elementwise, wrapping mod 2^16 (reference src/encoded_bits.rs:89-183).
"""

from __future__ import annotations

import numpy as np

from mpc_iris_tpu.constants import BITS, COLS, ROWS


class EncodedBits:
    """Z_2^16 vector. Wraps an owned ``np.uint16`` array of 12,800 elements."""

    __slots__ = ("data",)

    def __init__(self, data: np.ndarray | None = None):
        if data is None:
            self.data = np.zeros(BITS, dtype=np.uint16)
        else:
            arr = np.asarray(data).reshape(-1)
            if arr.size != BITS:
                raise ValueError(f"EncodedBits requires {BITS} values, got {arr.size}")
            self.data = arr.astype(np.uint16).copy()

    # ---------------------------------------------------------------- codecs

    def to_bytes(self) -> bytes:
        """25,600 bytes, little-endian u16s (reference disk/wire format)."""
        return self.data.astype("<u2").tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "EncodedBits":
        return cls(np.frombuffer(raw, dtype="<u2").astype(np.uint16))

    # ---------------------------------------------------------------- views

    def grid(self) -> np.ndarray:
        """View as a [64, 200] u16 grid."""
        return self.data.reshape(ROWS, COLS)

    # ---------------------------------------------------------------- secret sharing

    def share(self, n: int, rng: np.random.Generator | None = None) -> list["EncodedBits"]:
        """Split into ``n`` additive shares summing to ``self`` mod 2^16.

        Reference: src/encoded_bits.rs:22-38 (n-1 uniform random shares, last share is
        the wrapping difference).
        """
        if n <= 0:
            raise ValueError("n must be positive")
        rng = rng if rng is not None else np.random.default_rng()
        shares = [
            EncodedBits(rng.integers(0, 1 << 16, size=BITS, dtype=np.uint16))
            for _ in range(n - 1)
        ]
        total = np.zeros(BITS, dtype=np.uint16)
        for s in shares:
            total += s.data  # uint16 wraps mod 2^16 in NumPy
        shares.append(EncodedBits(self.data - total))
        return shares

    @classmethod
    def reconstruct(cls, shares: list["EncodedBits"]) -> "EncodedBits":
        """Wrapping sum of shares — the inverse of :meth:`share`."""
        total = np.zeros(BITS, dtype=np.uint16)
        for s in shares:
            total += s.data
        return cls(total)

    # ---------------------------------------------------------------- ops

    def rotate(self, amount: int) -> None:
        self.data = self.rotated(amount).data

    def rotated(self, amount: int) -> "EncodedBits":
        if amount % COLS == 0:
            return EncodedBits(self.data)
        return EncodedBits(np.roll(self.grid(), amount, axis=1).reshape(-1))

    def sum(self) -> int:
        """Wrapping sum of all lanes (reference src/encoded_bits.rs:60-62)."""
        return int(np.sum(self.data, dtype=np.uint64) & 0xFFFF)

    def dot(self, other: "EncodedBits") -> int:
        """Wrapping-u16 dot product (reference `arch::dot_u16`). Exact scalar oracle:
        accumulate in int64 and reduce mod 2^16."""
        prod = self.data.astype(np.int64) * other.data.astype(np.int64)
        return int(np.sum(prod) & 0xFFFF)

    # ---------------------------------------------------------------- ring algebra

    def __add__(self, other: "EncodedBits") -> "EncodedBits":
        return EncodedBits(self.data + other.data)

    def __sub__(self, other: "EncodedBits") -> "EncodedBits":
        return EncodedBits(self.data - other.data)

    def __mul__(self, other: "EncodedBits") -> "EncodedBits":
        return EncodedBits(self.data * other.data)

    def __neg__(self) -> "EncodedBits":
        return EncodedBits(np.zeros(BITS, dtype=np.uint16) - self.data)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, EncodedBits) and bool(
            np.array_equal(self.data, other.data)
        )

    def __hash__(self) -> int:
        return hash(self.data.tobytes())

    def __repr__(self) -> str:
        return f"EncodedBits({self.data[:8]}...)"

    # ---------------------------------------------------------------- constructors

    @classmethod
    def from_bits(cls, bits) -> "EncodedBits":
        """0/1 lift of a bit plane (reference `From<&Bits>`, src/encoded_bits.rs:75-79)."""
        return cls(
            np.unpackbits(bits.data, bitorder="little").astype(np.uint16)
        )

    @classmethod
    def random(cls, rng: np.random.Generator | None = None) -> "EncodedBits":
        rng = rng if rng is not None else np.random.default_rng()
        return cls(rng.integers(0, 1 << 16, size=BITS, dtype=np.uint16))
