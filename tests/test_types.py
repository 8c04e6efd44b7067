"""L1 data-type tests, mirroring the reference's unit suite (SURVEY.md section 4):
bit layout, rotation semantics, secret sharing, codecs."""

import numpy as np
import pytest

from mpc_iris_tpu.constants import BITS, BITS_BYTES, COLS, ROWS, TEMPLATE_BYTES
from mpc_iris_tpu.types import Bits, EncodedBits, Template

from oracles import bit_at, dot_u16_slow, rotate_bits_slow


class TestBits:
    def test_index_matches_byte_layout(self, rng):
        """Mirror of reference test_index (src/bits.rs:218-232)."""
        for _ in range(5):
            b = Bits.random(rng)
            raw = b.to_bytes()
            for i in rng.integers(0, BITS, size=200):
                assert b[int(i)] == bool(bit_at(raw, int(i)))

    def test_grid_roundtrip(self, rng):
        b = Bits.random(rng)
        assert Bits.from_grid(b.grid()) == b

    def test_grid_bit_order(self, rng):
        b = Bits.random(rng)
        g = b.grid()
        raw = b.to_bytes()
        for i in rng.integers(0, BITS, size=100):
            i = int(i)
            assert g[i // COLS, i % COLS] == bool(bit_at(raw, i))

    def test_rotated_inverse(self, rng):
        """Mirror of reference test_rotated_inverse (src/bits.rs:234-247)."""
        b = Bits.random(rng)
        for amount in range(-15, 16):
            assert b.rotated(amount).rotated(-amount) == b, amount

    def test_rotated_permutation(self, rng):
        """New col j holds old col (j - amount) mod 200 — the permutation pinned by
        reference test_rotated_number (src/encoded_bits.rs:205-219)."""
        b = Bits.random(rng)
        raw = b.to_bytes()
        for amount in (-15, -7, -1, 1, 8, 15):
            rot = b.rotated(amount)
            expected = rotate_bits_slow(raw, amount)
            got = np.unpackbits(rot.data, bitorder="little")
            assert got.tolist() == expected, amount

    def test_count_ones_and_dot(self, rng):
        a, b = Bits.random(rng), Bits.random(rng)
        assert a.count_ones() == sum(bit_at(a.to_bytes(), i) for i in range(BITS))
        assert a.dot(b) == sum(
            bit_at(a.to_bytes(), i) & bit_at(b.to_bytes(), i) for i in range(BITS)
        )

    def test_bit_algebra(self, rng):
        a, b = Bits.random(rng), Bits.random(rng)
        assert (a & b).count_ones() == a.dot(b)
        assert ((a ^ b) & (a & b)) == Bits()
        assert (a | b) == ~(~a & ~b)

    def test_hex_roundtrip(self, rng):
        b = Bits.random(rng)
        h = b.to_hex()
        assert len(h) == 2 * BITS_BYTES
        assert Bits.from_hex(h) == b

    def test_size_validation(self):
        with pytest.raises(ValueError):
            Bits(b"\x00" * 10)


class TestEncodedBits:
    def test_rotated_number(self):
        """Direct port of reference test_rotated_number (src/encoded_bits.rs:205-219)."""
        vals = np.array(
            [(row << 8 | col) for row in range(ROWS) for col in range(COLS)],
            dtype=np.uint16,
        )
        secret = EncodedBits(vals)
        for amount in range(-15, 16):
            rot = secret.rotated(amount)
            for i in (0, 1, 37, 199, 200, 12799, 6400):
                row, col = divmod(i, COLS)
                src_col = (col - amount) % COLS
                assert rot.data[i] == (row << 8 | src_col), (amount, i)

    def test_rotated_inverse(self, rng):
        e = EncodedBits.random(rng)
        for amount in range(-15, 16):
            assert e.rotated(amount).rotated(-amount) == e

    def test_rotated_bits_equivalence(self, rng):
        """Mirror of reference test_rotated_bits (src/encoded_bits.rs:221-236)."""
        b = Bits.random(rng)
        e = EncodedBits.from_bits(b)
        for amount in (-15, -3, 0, 5, 15):
            assert EncodedBits.from_bits(b.rotated(amount)) == e.rotated(amount)

    def test_share_reconstruct(self, rng):
        """Mirror of sharing semantics (src/encoded_bits.rs:22-38)."""
        e = EncodedBits.random(rng)
        for n in (1, 2, 3, 5):
            shares = e.share(n, rng)
            assert len(shares) == n
            assert EncodedBits.reconstruct(shares) == e
        # n=1 share is the value itself
        assert e.share(1, rng)[0] == e

    def test_share_invalid(self, rng):
        with pytest.raises(ValueError):
            EncodedBits.random(rng).share(0)

    def test_dot_oracle(self, rng):
        a = EncodedBits.random(rng)
        b = EncodedBits.random(rng)
        assert a.dot(b) == dot_u16_slow(a.data, b.data)

    def test_ring_ops_wrap(self, rng):
        a, b = EncodedBits.random(rng), EncodedBits.random(rng)
        assert (a + b) - b == a
        assert -(-a) == a
        assert (a - b) + b == a
        s = a + b
        assert np.array_equal(
            s.data, (a.data.astype(np.uint32) + b.data) & 0xFFFF
        )

    def test_sum_wraps(self):
        e = EncodedBits(np.full(BITS, 0xFFFF, dtype=np.uint16))
        assert e.sum() == (0xFFFF * BITS) & 0xFFFF

    def test_bytes_roundtrip_le(self, rng):
        e = EncodedBits.random(rng)
        raw = e.to_bytes()
        assert len(raw) == 2 * BITS
        assert raw[0] == e.data[0] & 0xFF and raw[1] == e.data[0] >> 8
        assert EncodedBits.from_bytes(raw) == e


class TestTemplate:
    def test_bytes_roundtrip(self, rng):
        t = Template.random(rng)
        raw = t.to_bytes()
        assert len(raw) == TEMPLATE_BYTES
        assert Template.from_bytes(raw) == t
        assert raw[:BITS_BYTES] == t.pattern.to_bytes()

    def test_json_roundtrip(self, rng):
        t = Template.random(rng)
        assert Template.from_json(t.to_json()) == t
        obj = t.to_json_obj()
        assert set(obj) == {"pattern", "mask"}
        assert len(obj["pattern"]) == 2 * BITS_BYTES

    def test_fraction_hamming_identity(self, rng):
        t = Template.random(rng)
        assert t.fraction_hamming(t) == 0.0

    def test_fraction_hamming_zero_mask_is_nan(self):
        t = Template()
        assert np.isnan(t.fraction_hamming(t))

    def test_distance_all_masked_is_inf(self):
        assert Template().distance(Template()) == float("inf")

    def test_distance_rotation_recovery(self, rng):
        """A rotated copy of a template should match at (near) zero distance."""
        t = Template.random(rng)
        shifted = t.rotated(7)
        assert shifted.distance(t) == 0.0
        # and the unrotated fraction is large for random data
        assert shifted.fraction_hamming(t) > 0.3
