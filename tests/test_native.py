"""Native C++ codec core == NumPy/Python reference paths.

Mirrors the reference's fast-vs-slow kernel parity testing discipline
(src/arch/sve.rs:79-109) for the runtime ETL components: hex codec, streaming
template JSON parse/render, additive share split/sum, ring encode.
"""

import io
import json

import numpy as np
import pytest

from mpc_iris_tpu import native
from mpc_iris_tpu.constants import BITS
from mpc_iris_tpu.io.formats import write_templates_json
from mpc_iris_tpu.types import Bits, Template

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)


def _planes(rng, n):
    pats = rng.integers(0, 256, (n, 1600), dtype=np.uint8)
    msks = rng.integers(0, 256, (n, 1600), dtype=np.uint8)
    return pats, msks


def test_hex_roundtrip(rng):
    data = rng.integers(0, 256, 4321, dtype=np.uint8)
    h = native.hex_encode(data)
    assert h == data.tobytes().hex().encode()
    assert np.array_equal(native.hex_decode(h), data)
    assert np.array_equal(native.hex_decode(h.upper()), data)
    with pytest.raises(ValueError):
        native.hex_decode(b"zx")
    with pytest.raises(ValueError):
        native.hex_decode(b"abc")


def test_render_matches_python_writer(rng):
    pats, msks = _planes(rng, 5)
    buf = io.BytesIO()
    write_templates_json(buf, [Template(Bits(p), Bits(m)) for p, m in zip(pats, msks)])
    nat = b"[" + native.render_templates(pats, msks) + b"]\n"
    assert buf.getvalue() == nat


@pytest.mark.parametrize("chunk_size", [137, 1 << 14])
def test_parse_stream_chunked(rng, chunk_size):
    pats, msks = _planes(rng, 9)
    buf = io.BytesIO()
    write_templates_json(buf, [Template(Bits(p), Bits(m)) for p, m in zip(pats, msks)])
    buf.seek(0)
    got = list(native.parse_templates_stream(buf, batch=4, chunk_size=chunk_size))
    gp = np.concatenate([p for p, _ in got])
    gm = np.concatenate([m for _, m in got])
    assert np.array_equal(gp, pats)
    assert np.array_equal(gm, msks)


def test_parse_accepts_reordered_fields_and_whitespace(rng):
    pats, msks = _planes(rng, 2)
    objs = [
        {"mask": m.tobytes().hex(), "pattern": p.tobytes().hex()}
        for p, m in zip(pats, msks)
    ]
    raw = ("  [ " + " , ".join(json.dumps(o) for o in objs) + " ]\n").encode()
    got = list(native.parse_templates_stream(io.BytesIO(raw)))
    gp = np.concatenate([p for p, _ in got])
    gm = np.concatenate([m for _, m in got])
    assert np.array_equal(gp, pats)
    assert np.array_equal(gm, msks)


def test_parse_rejects_malformed():
    with pytest.raises(ValueError):
        list(native.parse_templates_stream(io.BytesIO(b'{"not": "array"}')))
    with pytest.raises(ValueError):
        list(native.parse_templates_stream(io.BytesIO(b'[{"pattern": "ab"}]')))
    with pytest.raises(ValueError):  # premature EOF
        list(native.parse_templates_stream(io.BytesIO(b"[")))


K1 = native.derive_insecure_key(123)
K2 = native.derive_insecure_key(124)


def test_share_split_sums_to_encoding_and_is_batch_invariant(rng):
    enc = rng.integers(0, 1 << 16, (6, BITS), dtype=np.uint16)
    shares = native.share_split(enc, 4, K1)
    assert shares.shape == (4, 6, BITS)
    assert np.array_equal(native.share_sum(list(shares)), enc)
    # batching/threading-invariant streams (keyed by key + share + global row)
    a = native.share_split(enc[:2], 4, K1, row_offset=0)
    b = native.share_split(enc[2:], 4, K1, row_offset=2)
    assert np.array_equal(np.concatenate([a, b], axis=1), shares)
    # different key -> different shares, same reconstruction
    other = native.share_split(enc, 4, K2)
    assert not np.array_equal(other, shares)
    assert np.array_equal(native.share_sum(list(other)), enc)
    # keys must be exactly 32 bytes (no silent truncation of key material)
    with pytest.raises(ValueError):
        native.share_split(enc, 4, b"short")


def test_share_randomness_is_uniformish(rng):
    enc = np.zeros((4, BITS), dtype=np.uint16)
    shares = native.share_split(enc, 3, native.derive_insecure_key(7))
    r = shares[0].astype(np.float64)
    mean = r.mean()
    assert abs(mean - 32767.5) < 300  # ~4 sigma for 51200 samples
    # all 16 bit positions active
    assert all(int((shares[0] >> b & 1).sum()) > 0 for b in range(16))


def test_encode_u16_matches_numpy(rng):
    from mpc_iris_tpu.ops.encode import encode_grid_u16, unpack_bits

    pats, msks = _planes(rng, 3)
    ref = encode_grid_u16(
        unpack_bits(pats, xp=np), unpack_bits(msks, xp=np), xp=np
    ).reshape(3, BITS).astype(np.uint16)
    assert np.array_equal(native.encode_u16_native(pats, msks), ref)


def test_parse_rejects_duplicate_keys(rng):
    """Duplicate-key elements must error, never emit uninitialized memory."""
    p = rng.integers(0, 256, 1600, dtype=np.uint8).tobytes().hex()
    raw = ('[{"pattern": "%s", "pattern": "%s"}]' % (p, p)).encode()
    with pytest.raises(ValueError):
        list(native.parse_templates_stream(io.BytesIO(raw)))


def test_parser_fuzz_no_crash(rng):
    """Mutated/truncated inputs must either parse or raise ValueError — never
    crash the process or emit wrong-sized output (the parser is the trust
    boundary for externally supplied template files)."""
    pats, msks = _planes(rng, 3)
    base = bytearray(b"[" + native.render_templates(pats, msks) + b"]\n")
    for trial in range(300):
        buf = bytearray(base)
        kind = trial % 3
        if kind == 0:  # random byte flips
            for _ in range(int(rng.integers(1, 6))):
                buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        elif kind == 1:  # truncation
            buf = buf[: int(rng.integers(0, len(buf)))]
        else:  # random insertion
            pos = int(rng.integers(0, len(buf)))
            buf[pos:pos] = bytes(rng.integers(0, 256, int(rng.integers(1, 4)),
                                              dtype=np.uint8))
        try:
            for p, m in native.parse_templates_stream(
                io.BytesIO(bytes(buf)), chunk_size=257
            ):
                assert p.shape[1] == 1600 and m.shape[1] == 1600
        except ValueError:
            pass  # rejection is the expected failure mode


def test_rerandomize_zero_sum_and_refresh(rng):
    """Pairwise re-randomization: reconstruction invariant, shares refreshed,
    batch-size independent."""
    enc = rng.integers(0, 1 << 16, (5, BITS), dtype=np.uint16)
    shares = native.share_split(enc, 3, native.derive_insecure_key(11))
    s0, s1, s2 = (s.copy() for s in shares)
    # pairs: (0,1) key A, (0,2) key B, (1,2) key C; lower index adds.
    A, B, C = (native.derive_insecure_key(s) for s in (101, 202, 303))
    native.rerandomize(s0, A, +1)
    native.rerandomize(s0, B, +1)
    native.rerandomize(s1, A, -1)
    native.rerandomize(s1, C, +1)
    native.rerandomize(s2, B, -1)
    native.rerandomize(s2, C, -1)
    # noise cancels: reconstruction unchanged
    assert np.array_equal(native.share_sum([s0, s1, s2]), enc)
    # every share actually changed
    for old, new in zip(shares, (s0, s1, s2)):
        assert not np.array_equal(old, new)
    # batch-size independence (row_offset keying)
    t0 = shares[0].copy()
    native.rerandomize(t0[:2], A, +1, row_offset=0)
    native.rerandomize(t0[2:], A, +1, row_offset=2)
    u0 = shares[0].copy()
    native.rerandomize(u0, A, +1)
    # t0 was refreshed only with pair A; compare against u0
    assert np.array_equal(t0, u0)


# --------------------------------------------------------------- CSPRNG pinning
# The share/rerandomize randomness is ChaCha20 (RFC 8439). These tests pin the
# native C++ generator and the NumPy fallback against (a) the independently
# maintained `cryptography` library (OpenSSL-backed) and (b) a from-the-RFC
# scalar Python implementation, so all producers of share material are
# bit-identical and actually ChaCha20 — the security property the reference
# gets from thread_rng (src/encoded_bits.rs:27-33).


def _chacha20_scalar(key: bytes, counter: int, nonce12: bytes, n: int) -> bytes:
    """Independent scalar ChaCha20 written directly from RFC 8439 pseudocode
    (structure deliberately unlike the C++/NumPy implementations)."""
    import struct

    def rotl(v, c):
        return ((v << c) | (v >> (32 - c))) & 0xFFFFFFFF

    def quarter(state, a, b, c, d):
        state[a] = (state[a] + state[b]) & 0xFFFFFFFF
        state[d] = rotl(state[d] ^ state[a], 16)
        state[c] = (state[c] + state[d]) & 0xFFFFFFFF
        state[b] = rotl(state[b] ^ state[c], 12)
        state[a] = (state[a] + state[b]) & 0xFFFFFFFF
        state[d] = rotl(state[d] ^ state[a], 8)
        state[c] = (state[c] + state[d]) & 0xFFFFFFFF
        state[b] = rotl(state[b] ^ state[c], 7)

    out = bytearray()
    block_i = counter
    while len(out) < n:
        init = (
            [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574]
            + list(struct.unpack("<8I", key))
            + [block_i & 0xFFFFFFFF]
            + list(struct.unpack("<3I", nonce12))
        )
        st = list(init)
        for _ in range(10):
            quarter(st, 0, 4, 8, 12)
            quarter(st, 1, 5, 9, 13)
            quarter(st, 2, 6, 10, 14)
            quarter(st, 3, 7, 11, 15)
            quarter(st, 0, 5, 10, 15)
            quarter(st, 1, 6, 11, 12)
            quarter(st, 2, 7, 8, 13)
            quarter(st, 3, 4, 9, 14)
        words = [(s + i) & 0xFFFFFFFF for s, i in zip(st, init)]
        out += struct.pack("<16I", *words)
        block_i += 1
    return bytes(out[:n])


def _openssl_chacha20(key: bytes, counter: int, nonce12: bytes, n: int):
    cryptography = pytest.importorskip("cryptography")  # noqa: F841
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms

    full_nonce = counter.to_bytes(4, "little") + nonce12
    enc = Cipher(algorithms.ChaCha20(key, full_nonce), mode=None).encryptor()
    return np.frombuffer(enc.update(b"\x00" * n), np.uint8)


def test_chacha20_vs_openssl_and_rfc_scalar():
    key = bytes(range(32))
    nonce = bytes([0, 0, 0, 9, 0, 0, 0, 0x4A, 0, 0, 0, 0])  # RFC 8439 2.3.2
    for counter, n in [(1, 64), (0, 64), (0, 25600), (7, 100)]:
        got = native.chacha20_stream(key, counter, nonce, n)
        assert np.array_equal(got, _openssl_chacha20(key, counter, nonce, n))
        assert got.tobytes() == _chacha20_scalar(key, counter, nonce, n)
    # Counter wraparound: RFC 8439's counter is 32-bit (OpenSSL instead carries
    # into a 64-bit counter there, so compare the scalar impl only). Our usage
    # never exceeds 400 blocks per stream, far from the boundary.
    got = native.chacha20_stream(key, 2**32 - 2, nonce, 130)
    assert got.tobytes() == _chacha20_scalar(key, 2**32 - 2, nonce, 130)
    # RFC 8439 2.3.2: first four keystream bytes of block 1 under this key/nonce
    assert native.chacha20_stream(key, 1, nonce, 4).tobytes() == bytes.fromhex(
        "10f1e7e4"
    )


def test_chacha20_numpy_fallback_bit_identical():
    key = bytes(range(1, 33))
    nonce = bytes(range(12))
    nat = native.chacha20_stream(key, 5, nonce, 333)
    fb = native._chacha20_blocks_np(
        key, 5, np.frombuffer(nonce, "<u4"), (333 + 63) // 64
    )[:333]
    assert np.array_equal(nat, fb)


def test_share_split_stream_is_addressed_chacha(rng):
    """Share s of global row R must be exactly ChaCha20(key, nonce=[s,R],
    ctr=0) — verified against the independent scalar implementation — and the
    last share the wrapping complement."""
    enc = rng.integers(0, 1 << 16, (3, BITS), dtype=np.uint16)
    key = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    shares = native.share_split(enc, 3, key, row_offset=40)
    total = np.zeros_like(enc)
    for s in range(2):
        for r in range(3):
            nonce = np.array([s, 40 + r, 0], "<u4").tobytes()
            want = np.frombuffer(
                _chacha20_scalar(key, 0, nonce, 2 * BITS), "<u2"
            )
            assert np.array_equal(shares[s, r], want), (s, r)
        total = (total + shares[s]).astype(np.uint16)
    assert np.array_equal(shares[2], (enc - total).astype(np.uint16))


def test_share_split_and_rerandomize_fallback_parity(rng, monkeypatch):
    """NumPy fallback must be bit-identical to native: mixed native/fallback
    parties still produce canceling rerandomize streams and identical files."""
    import mpc_iris_tpu.native as N

    enc = rng.integers(0, 1 << 16, (4, BITS), dtype=np.uint16)
    key = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    pair = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    nat_shares = native.share_split(enc, 3, key, row_offset=9)
    nat_rr = nat_shares[0].copy()
    native.rerandomize(nat_rr, pair, -1, row_offset=9)

    monkeypatch.setattr(N, "_lib", None)
    monkeypatch.setattr(N, "_tried", True)
    fb_shares = native.share_split(enc, 3, key, row_offset=9)
    fb_rr = nat_shares[0].copy()
    native.rerandomize(fb_rr, pair, -1, row_offset=9)
    assert np.array_equal(fb_shares, nat_shares)
    assert np.array_equal(fb_rr, nat_rr)


def test_rerandomize_stream_disjoint_from_share_streams(rng):
    """The rerandomize stream id (0xFFFFFFFF) can never collide with a share
    index, so even (discouraged) key reuse yields independent streams."""
    key = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    enc = np.zeros((1, BITS), np.uint16)
    shares = native.share_split(enc, 2, key)
    noise = np.zeros((1, BITS), np.uint16)
    native.rerandomize(noise, key, +1)
    assert not np.array_equal(noise[0], shares[0, 0])
