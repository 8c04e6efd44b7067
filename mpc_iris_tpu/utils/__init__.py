"""Cross-cutting utilities: progress reporting, SI-number parsing, profiling."""

from mpc_iris_tpu.utils.progress import Progress
from mpc_iris_tpu.utils.config import parse_si, device_banner

__all__ = ["Progress", "parse_si", "device_banner"]
