"""`Bits` — a packed 12,800-bit plane on the 64x200 iris grid.

Byte layout parity with the reference (src/bits.rs:10-15): 1,600 bytes, bit ``i`` lives
at byte ``i // 8``, bit position ``i % 8`` (LSB-first within each byte; this equals the
reference's little-endian u64-limb layout, pinned by its `test_index`,
src/bits.rs:218-232). Grid rows are 25-byte / 200-bit chunks.

Rotation semantics: ``rotate(amount)`` circularly shifts every 200-bit grid row such
that the new column ``j`` holds the old column ``(j - amount) mod 200`` — the exact
column permutation pinned by the reference's `test_rotated_number`
(src/encoded_bits.rs:205-219) and the Bits/EncodedBits rotation-equivalence test
(src/encoded_bits.rs:221-236). This is ``np.roll(grid, amount, axis=-1)``.
"""

from __future__ import annotations

import numpy as np

from mpc_iris_tpu.constants import BITS, BITS_BYTES, COLS, ROWS


class Bits:
    """Packed bit plane. Wraps an owned ``np.uint8`` array of 1,600 bytes."""

    __slots__ = ("data",)

    def __init__(self, data: np.ndarray | bytes | None = None):
        if data is None:
            self.data = np.zeros(BITS_BYTES, dtype=np.uint8)
        else:
            arr = np.frombuffer(data, dtype=np.uint8).copy() if isinstance(
                data, (bytes, bytearray, memoryview)
            ) else np.asarray(data, dtype=np.uint8).reshape(-1).copy()
            if arr.size != BITS_BYTES:
                raise ValueError(f"Bits requires {BITS_BYTES} bytes, got {arr.size}")
            self.data = arr

    # ---------------------------------------------------------------- codecs

    def to_bytes(self) -> bytes:
        """Raw 1,600-byte serialization (== reference `bytemuck::bytes_of`)."""
        return self.data.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "Bits":
        return cls(raw)

    def to_hex(self) -> str:
        """Lowercase hex of the raw bytes (reference serde, src/bits.rs:74-81)."""
        return self.data.tobytes().hex()

    @classmethod
    def from_hex(cls, s: str) -> "Bits":
        return cls(bytes.fromhex(s))

    # ---------------------------------------------------------------- views

    def grid(self) -> np.ndarray:
        """Unpacked view as a bool [64, 200] grid (bit i -> [i//200, i%200])."""
        return np.unpackbits(self.data, bitorder="little").astype(bool).reshape(ROWS, COLS)

    @classmethod
    def from_grid(cls, grid: np.ndarray) -> "Bits":
        grid = np.asarray(grid)
        if grid.shape != (ROWS, COLS):
            raise ValueError(f"grid must be [{ROWS}, {COLS}], got {grid.shape}")
        packed = np.packbits(grid.astype(bool).reshape(-1), bitorder="little")
        return cls(packed)

    # ---------------------------------------------------------------- ops

    def rotate(self, amount: int) -> None:
        """In-place row rotation; see module docstring for the permutation."""
        self.data = self.rotated(amount).data

    def rotated(self, amount: int) -> "Bits":
        if amount % COLS == 0:
            return Bits(self.data)
        return Bits.from_grid(np.roll(self.grid(), amount, axis=1))

    def count_ones(self) -> int:
        """Popcount over all 12,800 bits (reference src/bits.rs:31-33)."""
        return int(np.unpackbits(self.data).sum())

    def dot(self, other: "Bits") -> int:
        """AND-popcount: ``popcount(self & other)`` (reference `arch::dot_bool`,
        src/arch/generic.rs:4-9). Result fits u16 (max 12,800)."""
        return int(np.unpackbits(self.data & other.data).sum())

    # ---------------------------------------------------------------- bit algebra

    def __and__(self, other: "Bits") -> "Bits":
        return Bits(self.data & other.data)

    def __or__(self, other: "Bits") -> "Bits":
        return Bits(self.data | other.data)

    def __xor__(self, other: "Bits") -> "Bits":
        return Bits(self.data ^ other.data)

    def __invert__(self) -> "Bits":
        return Bits(~self.data)

    def __getitem__(self, index: int) -> bool:
        """Bit test at flat index (reference Index impl, src/bits.rs:44-57)."""
        if not 0 <= index < BITS:
            raise IndexError(index)
        return bool((self.data[index >> 3] >> (index & 7)) & 1)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Bits) and bool(np.array_equal(self.data, other.data))

    def __hash__(self) -> int:
        return hash(self.data.tobytes())

    def __repr__(self) -> str:
        return f"Bits({self.to_hex()[:32]}...)"

    # ---------------------------------------------------------------- random

    @classmethod
    def random(cls, rng: np.random.Generator | None = None) -> "Bits":
        rng = rng if rng is not None else np.random.default_rng()
        return cls(rng.integers(0, 256, size=BITS_BYTES, dtype=np.uint8))
