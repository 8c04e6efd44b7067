"""CLI helpers: SI-suffixed counts and a device banner.

The reference prints a CPU-feature banner and parses counts like "1M"
(src/main.rs:96, 168-176); here the banner reports the JAX backend and devices.
"""

from __future__ import annotations

_SI = {"k": 10**3, "M": 10**6, "G": 10**9, "T": 10**12}


def parse_si(s: str) -> int:
    """Parse '1M', '100k', '3000000' into an int."""
    s = s.strip()
    if s and s[-1] in _SI:
        return int(float(s[:-1]) * _SI[s[-1]])
    return int(s)


def device_banner() -> str:
    import jax

    devs = jax.devices()
    kinds = {d.device_kind for d in devs}
    return (
        f"JAX {jax.__version__} backend={devs[0].platform} "
        f"devices={len(devs)} ({', '.join(sorted(kinds))})"
    )
