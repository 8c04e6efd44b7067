"""ctypes bindings for the native C++ codec/ETL core (native/iris_codec.cpp).

The library is compiled on demand with g++ (no pybind11 in the image; plain C ABI
via ctypes). Every entry point has a NumPy fallback so the framework works without
a toolchain; `available()` reports which path is active.

Covers the reference's Rust runtime hot paths: hex codec (src/bits.rs:74-93),
streaming template JSON parse (src/json_stream.rs; the ~20k templates/s prepare
bottleneck, src/main.rs:312), template render (src/main.rs:186-267), additive
share split (src/encoded_bits.rs:22-38) and share-sum reconstruction
(src/main.rs:598-611).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

from mpc_iris_tpu.constants import BITS, BITS_BYTES

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "iris_codec.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "build", "libiris_codec.so")

_lock = threading.Lock()
_lib = None
_tried = False

_u8p = ctypes.POINTER(ctypes.c_uint8)
_u16p = ctypes.POINTER(ctypes.c_uint16)
_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(_SRC)],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return os.path.exists(_SO)
    except Exception as e:  # toolchain missing / compile error -> fallback
        print(f"mpc_iris_tpu.native: build failed ({e}); using NumPy fallbacks",
              file=sys.stderr)
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        lib = ctypes.CDLL(_SO)
        lib.ic_version.restype = ctypes.c_int
        lib.ic_hex_decode.restype = ctypes.c_int
        lib.ic_hex_decode.argtypes = [_u8p, ctypes.c_int64, _u8p]
        lib.ic_hex_encode.restype = None
        lib.ic_hex_encode.argtypes = [_u8p, ctypes.c_int64, ctypes.c_char_p]
        lib.ic_parse_templates.restype = ctypes.c_int64
        lib.ic_parse_templates.argtypes = [
            _u8p, ctypes.c_int64, ctypes.c_int, _u8p, _u8p, ctypes.c_int64,
            _i64p, _i32p,
        ]
        lib.ic_rendered_size.restype = ctypes.c_int64
        lib.ic_rendered_size.argtypes = [ctypes.c_int64]
        lib.ic_render_templates.restype = ctypes.c_int64
        lib.ic_render_templates.argtypes = [_u8p, _u8p, ctypes.c_int64, ctypes.c_char_p]
        lib.ic_share_split.restype = None
        lib.ic_share_split.argtypes = [
            _u16p, ctypes.c_int64, ctypes.c_int, ctypes.c_uint64, ctypes.c_int64,
            _u16p,
        ]
        lib.ic_share_sum.restype = None
        lib.ic_share_sum.argtypes = [
            ctypes.POINTER(_u16p), ctypes.c_int, ctypes.c_int64, _u16p,
        ]
        lib.ic_rerandomize.restype = None
        lib.ic_rerandomize.argtypes = [
            _u16p, ctypes.c_int64, ctypes.c_uint64, ctypes.c_int, ctypes.c_int64,
        ]
        lib.ic_encode_u16.restype = None
        lib.ic_encode_u16.argtypes = [_u8p, _u8p, ctypes.c_int64, _u16p]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the compiled C++ core is loadable."""
    return _load() is not None


def _as_u8p(a: np.ndarray):
    return a.ctypes.data_as(_u8p)


def _as_u16p(a: np.ndarray):
    return a.ctypes.data_as(_u16p)


# ------------------------------------------------------------------ hex codec


def hex_decode(hex_bytes: bytes) -> np.ndarray:
    """Lower/upper hex string bytes -> uint8 array."""
    if len(hex_bytes) % 2:
        raise ValueError("odd-length hex string")
    n = len(hex_bytes) // 2
    lib = _load()
    if lib is None:
        return np.frombuffer(bytes.fromhex(hex_bytes.decode("ascii")), np.uint8).copy()
    src = np.frombuffer(hex_bytes, np.uint8)
    out = np.empty(n, np.uint8)
    if lib.ic_hex_decode(_as_u8p(src), n, _as_u8p(out)) != 0:
        raise ValueError("invalid hex")
    return out


def hex_encode(data: np.ndarray) -> bytes:
    """uint8 array -> lowercase hex bytes."""
    data = np.ascontiguousarray(data, np.uint8).ravel()
    lib = _load()
    if lib is None:
        return data.tobytes().hex().encode("ascii")
    out = ctypes.create_string_buffer(2 * data.size)
    lib.ic_hex_encode(_as_u8p(data), data.size, out)
    return out.raw


# ---------------------------------------------------------- template streaming


class TemplateParser:
    """Incremental parser for template-JSON byte streams (native-accelerated).

    Feed arbitrary byte chunks; collect (patterns, masks) uint8 [n, 1600] batches.
    Semantics match io.json_stream + Template.from_json_obj for well-formed
    reference-format files; malformed input raises ValueError.
    """

    def __init__(self, max_batch: int = 4096):
        self._lib = _load()
        self._state = ctypes.c_int32(0)
        self._tail = b""
        self._done = False
        self.max_batch = max_batch
        if self._lib is None:
            raise RuntimeError("native library unavailable")

    @property
    def finished(self) -> bool:
        return self._done

    def feed(self, data: bytes, final: bool = False):
        """Yield (patterns, masks) batches parsed from buffered + new bytes."""
        buf = self._tail + data
        view = np.frombuffer(buf, np.uint8)
        offset = 0
        while True:
            pats = np.empty((self.max_batch, BITS_BYTES), np.uint8)
            msks = np.empty((self.max_batch, BITS_BYTES), np.uint8)
            consumed = ctypes.c_int64(0)
            remaining = view[offset:]
            n = self._lib.ic_parse_templates(
                _as_u8p(remaining), remaining.size, int(final),
                _as_u8p(pats), _as_u8p(msks), self.max_batch,
                ctypes.byref(consumed), ctypes.byref(self._state),
            )
            if n < 0:
                raise ValueError("malformed template JSON")
            offset += consumed.value
            if n > 0:
                yield pats[:n], msks[:n]
            if self._state.value == 2:
                self._done = True
                self._tail = b""
                return
            if n < self.max_batch:
                break
        if final and not self._done:
            raise ValueError("premature EOF in template JSON")
        self._tail = buf[offset:]


def parse_templates_stream(fp, batch: int = 4096, chunk_size: int = 1 << 22):
    """Yield (patterns, masks) uint8 [n<=batch, 1600] batches from a file object.

    Uses the native streaming parser when available, else the Python
    json_stream fallback.
    """
    lib = _load()
    if lib is None:
        from mpc_iris_tpu.io.formats import read_templates_json

        pats, msks = [], []
        for t in read_templates_json(fp):
            pats.append(t.pattern.data)
            msks.append(t.mask.data)
            if len(pats) == batch:
                yield np.stack(pats), np.stack(msks)
                pats, msks = [], []
        if pats:
            yield np.stack(pats), np.stack(msks)
        return

    parser = TemplateParser(max_batch=batch)
    while True:
        data = fp.read(chunk_size)
        final = not data
        yield from parser.feed(data, final=final)
        if parser.finished:
            return
        if final:
            raise ValueError("premature EOF in template JSON")


def render_templates(patterns: np.ndarray, masks: np.ndarray) -> bytes:
    """Render [n, 1600] planes to the comma-joined pretty JSON objects (no
    surrounding brackets) — byte-identical to io.formats.write_templates_json's
    per-element output."""
    patterns = np.ascontiguousarray(patterns, np.uint8)
    masks = np.ascontiguousarray(masks, np.uint8)
    n = patterns.shape[0]
    lib = _load()
    if lib is None:
        import json

        parts = []
        for p, m in zip(patterns, masks):
            parts.append(json.dumps(
                {"pattern": p.tobytes().hex(), "mask": m.tobytes().hex()},
                indent=2, separators=(",", ": "),
            ))
        return ",".join(parts).encode()
    size = lib.ic_rendered_size(n)
    out = ctypes.create_string_buffer(max(size, 1))
    written = lib.ic_render_templates(_as_u8p(patterns), _as_u8p(masks), n, out)
    return out.raw[:written]


# ------------------------------------------------------------------ sharing


def share_split(enc: np.ndarray, n_shares: int, seed: int, row_offset: int = 0):
    """Additive Z_2^16 share split: u16 [n, 12800] -> u16 [n_shares, n, 12800].

    Deterministic per (seed, row_offset + row): batching/threading independent.
    """
    enc = np.ascontiguousarray(enc, np.uint16)
    n = enc.shape[0]
    lib = _load()
    if lib is None:
        rng = np.random.default_rng(seed)
        out = np.empty((n_shares, n, BITS), np.uint16)
        # (fallback stream differs from native — both are valid uniform splits)
        for i, row in enumerate(enc):
            r = np.random.default_rng((seed, row_offset + i))
            total = np.zeros(BITS, np.uint16)
            for s in range(n_shares - 1):
                v = r.integers(0, 1 << 16, size=BITS, dtype=np.uint16)
                out[s, i] = v
                total += v
            out[n_shares - 1, i] = row - total
        return out
    out = np.empty((n_shares, n, BITS), np.uint16)
    lib.ic_share_split(_as_u16p(enc), n, n_shares, seed & (2**64 - 1),
                       row_offset, _as_u16p(out))
    return out


def share_sum(shares) -> np.ndarray:
    """Wrapping u16 sum of N same-shaped share arrays (reconstruction)."""
    arrs = [np.ascontiguousarray(s, np.uint16) for s in shares]
    lib = _load()
    if lib is None:
        total = arrs[0].copy()
        for a in arrs[1:]:
            total += a
        return total
    flat = [a.ravel() for a in arrs]
    out = np.empty_like(flat[0])
    ptrs = (_u16p * len(flat))(*[_as_u16p(a) for a in flat])
    lib.ic_share_sum(ptrs, len(flat), flat[0].size, _as_u16p(out))
    return out.reshape(arrs[0].shape)


def rerandomize(shares: np.ndarray, pair_seed: int, sign: int,
                row_offset: int = 0) -> np.ndarray:
    """Refresh a share matrix in place with a pairwise zero-sum PRF stream.

    Two parties sharing ``pair_seed`` apply opposite ``sign``; the noise cancels
    in reconstruction while each stored share becomes a fresh uniform value
    (the reference spec's "re-randomization via correlated PRNGs" future work).
    Streams are keyed by (seed, row_offset + row): batch-size independent.
    Returns the (mutated) array.
    """
    shares = np.ascontiguousarray(shares, np.uint16)
    if shares.ndim != 2 or shares.shape[1] != BITS:
        raise ValueError(f"expected [n, {BITS}] u16 shares, got {shares.shape}")
    if not shares.flags.writeable:
        # In-place semantics: a silent copy would discard the refresh; writing
        # through the raw pointer into read-only (memmap) pages segfaults.
        raise ValueError("rerandomize requires a writeable array (copy memmap "
                         "slices first)")
    lib = _load()
    if lib is None:
        # No NumPy fallback on purpose: the two parties' streams must cancel
        # bit-for-bit, so a differing fallback stream would silently corrupt
        # the shared database.
        raise RuntimeError(
            "rerandomize requires the native library (streams must be "
            "byte-identical across parties)"
        )
    lib.ic_rerandomize(_as_u16p(shares), shares.shape[0],
                       pair_seed & (2**64 - 1), 1 if sign >= 0 else -1,
                       row_offset)
    return shares


def encode_u16_native(patterns: np.ndarray, masks: np.ndarray) -> np.ndarray:
    """Packed planes [n, 1600] -> ring encoding u16 [n, 12800]
    (enc = mask - 2*(pattern & mask) per bit, reference src/lib.rs:16-26)."""
    patterns = np.ascontiguousarray(patterns, np.uint8)
    masks = np.ascontiguousarray(masks, np.uint8)
    n = patterns.shape[0]
    lib = _load()
    if lib is None:
        from mpc_iris_tpu.ops.encode import encode_grid_u16, unpack_bits

        p = unpack_bits(patterns, xp=np)
        m = unpack_bits(masks, xp=np)
        return encode_grid_u16(p, m, xp=np).reshape(n, BITS)
    out = np.empty((n, BITS), np.uint16)
    lib.ic_encode_u16(_as_u8p(patterns), _as_u8p(masks), n, _as_u16p(out))
    return out
