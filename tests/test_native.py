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


def test_share_split_sums_to_encoding_and_is_batch_invariant(rng):
    enc = rng.integers(0, 1 << 16, (6, BITS), dtype=np.uint16)
    shares = native.share_split(enc, 4, seed=123)
    assert shares.shape == (4, 6, BITS)
    assert np.array_equal(native.share_sum(list(shares)), enc)
    # batching/threading-invariant streams (keyed by seed + global row)
    a = native.share_split(enc[:2], 4, seed=123, row_offset=0)
    b = native.share_split(enc[2:], 4, seed=123, row_offset=2)
    assert np.array_equal(np.concatenate([a, b], axis=1), shares)
    # different seed -> different shares, same reconstruction
    other = native.share_split(enc, 4, seed=124)
    assert not np.array_equal(other, shares)
    assert np.array_equal(native.share_sum(list(other)), enc)


def test_share_randomness_is_uniformish(rng):
    enc = np.zeros((4, BITS), dtype=np.uint16)
    shares = native.share_split(enc, 3, seed=7)
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
    shares = native.share_split(enc, 3, seed=11)
    s0, s1, s2 = (s.copy() for s in shares)
    # pairs: (0,1) seed A, (0,2) seed B, (1,2) seed C; lower index adds.
    A, B, C = 101, 202, 303
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
