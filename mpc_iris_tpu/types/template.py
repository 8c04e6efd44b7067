"""`Template` — a plaintext iris code: a pattern bit plane plus a validity mask plane.

Layout parity with the reference (src/template.rs:11-29): 3,200 bytes on disk/wire,
pattern plane first then mask plane. JSON form is ``{"pattern": "<hex>", "mask":
"<hex>"}`` with 3,200 lowercase hex chars per plane (reference serde,
src/bits.rs:74-93).

`fraction_hamming` and `distance` are the normative plaintext oracle
(reference src/template.rs:43-64): distance is the minimum over query rotations
r in [-15, 15] of ``popcount((a.pattern ^ b.pattern) & m) / popcount(m)`` with
``m = a.mask & b.mask``, computed in f64. This scalar path is the golden reference
against which every device engine is tested (the reference holds the encoded pipeline
to within 1 ulp of it, src/lib.rs:165-193).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

from mpc_iris_tpu.constants import BITS_BYTES, MAX_ROTATION, TEMPLATE_BYTES
from mpc_iris_tpu.types.bits import Bits


@dataclass
class Template:
    pattern: Bits = field(default_factory=Bits)
    mask: Bits = field(default_factory=Bits)

    # ---------------------------------------------------------------- codecs

    def to_bytes(self) -> bytes:
        """3,200-byte wire/disk form: pattern then mask (reference src/main.rs:419)."""
        return self.pattern.to_bytes() + self.mask.to_bytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "Template":
        if len(raw) != TEMPLATE_BYTES:
            raise ValueError(f"Template requires {TEMPLATE_BYTES} bytes, got {len(raw)}")
        return cls(Bits.from_bytes(raw[:BITS_BYTES]), Bits.from_bytes(raw[BITS_BYTES:]))

    def to_json_obj(self) -> dict:
        return {"pattern": self.pattern.to_hex(), "mask": self.mask.to_hex()}

    @classmethod
    def from_json_obj(cls, obj: dict) -> "Template":
        return cls(Bits.from_hex(obj["pattern"]), Bits.from_hex(obj["mask"]))

    def to_json(self) -> str:
        return json.dumps(self.to_json_obj())

    @classmethod
    def from_json(cls, s: str) -> "Template":
        return cls.from_json_obj(json.loads(s))

    # ---------------------------------------------------------------- ops

    def rotate(self, amount: int) -> None:
        self.pattern.rotate(amount)
        self.mask.rotate(amount)

    def rotated(self, amount: int) -> "Template":
        return Template(self.pattern.rotated(amount), self.mask.rotated(amount))

    def fraction_hamming(self, other: "Template") -> float:
        """Masked fractional Hamming distance at rotation 0 (src/template.rs:49-64).

        Returns f64 ``num/den``; 0/0 yields NaN exactly as the reference's f64 division
        does.
        """
        m = self.mask.data & other.mask.data
        p = (self.pattern.data ^ other.pattern.data) & m
        num = int(np.unpackbits(p).sum())
        den = int(np.unpackbits(m).sum())
        with np.errstate(invalid="ignore", divide="ignore"):
            return float(np.float64(num) / np.float64(den))

    def distance(self, other: "Template") -> float:
        """Minimum fraction_hamming over query rotations r in [-15, 15]
        (src/template.rs:43-47). NaN terms are skipped by the min fold, matching Rust's
        ``f64::min`` NaN semantics; all-NaN yields +inf.
        """
        best = float("inf")
        for r in range(-MAX_ROTATION, MAX_ROTATION + 1):
            d = self.rotated(r).fraction_hamming(other)
            if d < best:  # NaN compares false, so NaN is skipped like f64::min
                best = d
        return best

    # ---------------------------------------------------------------- random

    @classmethod
    def random(cls, rng: np.random.Generator | None = None) -> "Template":
        rng = rng if rng is not None else np.random.default_rng()
        return cls(Bits.random(rng), Bits.random(rng))

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, Template)
            and self.pattern == other.pattern
            and self.mask == other.mask
        )
