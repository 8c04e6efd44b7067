"""IO-layer tests: streaming JSON parsing, binary store roundtrips, CLI pipelines
(generate -> prepare -> decrypt)."""

import io
import json

import numpy as np
import pytest

from mpc_iris_tpu.constants import BITS, BITS_BYTES
from mpc_iris_tpu.io.formats import (
    open_masks,
    open_share,
    read_templates_json,
    write_masks,
    write_share,
    write_templates_json,
)
from mpc_iris_tpu.io.json_stream import JsonStreamError, iter_json_array
from mpc_iris_tpu.types import EncodedBits, Template


class TestJsonStream:
    def _parse(self, s, **kw):
        return list(iter_json_array(io.BytesIO(s.encode()), **kw))

    def test_basic(self):
        assert self._parse('[1, 2, 3]') == [1, 2, 3]
        assert self._parse('[]') == []
        assert self._parse('[ ]') == []
        assert self._parse('[{"a": 1}, {"b": [2, 3]}]') == [{"a": 1}, {"b": [2, 3]}]

    def test_strings_with_specials(self):
        assert self._parse('["a,b", "c]d", "e\\"f"]') == ["a,b", "c]d", 'e"f']

    def test_nested(self):
        assert self._parse('[[1,[2]],{"x":{"y":[3]}}]') == [[1, [2]], {"x": {"y": [3]}}]

    def test_small_chunks(self):
        data = json.dumps([{"k": "v" * 50, "n": i} for i in range(20)])
        out = list(iter_json_array(io.BytesIO(data.encode()), chunk_size=7))
        assert out == json.loads(data)

    def test_errors(self):
        for bad in ("", "{", "[1, 2", "[1,, 2]", "[1 2]", "[1,]"):
            with pytest.raises(JsonStreamError):
                self._parse(bad)

    def test_whitespace_pretty(self):
        data = json.dumps([{"a": i} for i in range(5)], indent=2)
        assert self._parse(data) == [{"a": i} for i in range(5)]


class TestFormats:
    def test_templates_json_roundtrip(self, rng, tmp_path):
        ts = [Template.random(rng) for _ in range(7)]
        path = tmp_path / "t.json"
        with open(path, "wb") as f:
            assert write_templates_json(f, ts) == 7
        # also parseable by a plain json.load (format compatibility)
        with open(path) as f:
            plain = json.load(f)
        assert len(plain) == 7 and set(plain[0]) == {"pattern", "mask"}
        with open(path, "rb") as f:
            back = list(read_templates_json(f))
        assert back == ts

    def test_masks_share_roundtrip(self, rng, tmp_path):
        masks = rng.integers(0, 256, size=(5, BITS_BYTES), dtype=np.uint8)
        shares = rng.integers(0, 1 << 16, size=(5, BITS), dtype=np.uint16)
        mp, sp = tmp_path / "x.masks", tmp_path / "x.share-0"
        write_masks(mp, masks)
        write_share(sp, shares)
        assert mp.stat().st_size == 5 * BITS_BYTES
        assert sp.stat().st_size == 5 * 2 * BITS
        np.testing.assert_array_equal(open_masks(mp), masks)
        np.testing.assert_array_equal(open_share(sp), shares)

    def test_share_file_record_layout(self, rng, tmp_path):
        """First record's bytes must be the EncodedBits LE serialization
        (interop with the reference's bytemuck casts)."""
        e = EncodedBits.random(rng)
        sp = tmp_path / "y.share-0"
        write_share(sp, e.data[None])
        assert sp.read_bytes() == e.to_bytes()

    def test_invalid_sizes(self, tmp_path):
        p = tmp_path / "bad.masks"
        p.write_bytes(b"\x00" * 100)
        with pytest.raises(ValueError):
            open_masks(p)
        with pytest.raises(ValueError):
            open_share(p)


class TestCliPipeline:
    def test_generate_prepare_decrypt(self, tmp_path):
        from mpc_iris_tpu.cli import main

        db = tmp_path / "db.json"
        assert main(["generate", str(db), "12", "--seed", "3"]) == 0
        with open(db, "rb") as f:
            templates = list(read_templates_json(f))
        assert len(templates) == 12

        base = tmp_path / "mpc"
        assert main(["prepare", str(db), "3", str(base), "--insecure-seed", "4",
                     "--batch", "5"]) == 0
        masks = open_masks(f"{base}.masks")
        assert masks.shape[0] == 12
        np.testing.assert_array_equal(masks[4], templates[4].mask.data)

        # share sum reconstructs the ring encoding
        from mpc_iris_tpu.ops.encode import encode_template

        shares = [open_share(f"{base}.share-{i}") for i in range(3)]
        total = sum(s[7].astype(np.int64) for s in shares) & 0xFFFF
        np.testing.assert_array_equal(total, encode_template(templates[7]).data)

        out = tmp_path / "dec.json"
        assert main(["decrypt"] + [f"{base}.share-{i}" for i in range(3)]
                    + ["--output", str(out), "--batch", "5"]) == 0
        with open(out, "rb") as f:
            decoded = list(read_templates_json(f))
        assert len(decoded) == 12
        for d, t in zip(decoded, templates):
            assert d.mask == t.mask
            assert (d.pattern & d.mask) == (t.pattern & t.mask)

    def test_generate_no_overwrite(self, tmp_path):
        from mpc_iris_tpu.cli import main

        db = tmp_path / "db.json"
        db.write_text("[]")
        assert main(["generate", str(db), "1"]) == 1
        assert main(["generate", str(db), "1", "--replace", "--seed", "0"]) == 0
