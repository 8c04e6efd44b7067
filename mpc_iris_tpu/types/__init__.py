"""Host-side data types and codecs (layer L1 of SURVEY.md).

These are NumPy-backed value types whose byte layouts are exactly compatible with the
reference's on-disk and wire formats (bytemuck raw casts of `Bits`, `EncodedBits` and
`Template`; reference src/bits.rs, src/encoded_bits.rs, src/template.rs). Device compute
operates on the raw arrays these types expose; the classes themselves stay off the hot
path.
"""

from mpc_iris_tpu.types.bits import Bits
from mpc_iris_tpu.types.encoded import EncodedBits
from mpc_iris_tpu.types.template import Template

__all__ = ["Bits", "EncodedBits", "Template"]
