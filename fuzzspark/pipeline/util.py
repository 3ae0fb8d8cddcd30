"""Small shared helpers for the pipeline stages."""

from __future__ import annotations

__all__ = ["parse_bytes"]


def parse_bytes(v: str) -> int:
    """Spark size-conf string -> bytes ('16m', '128MB', '134217728')."""
    s = str(v).strip().lower()
    mult = 1
    for suf, m in (("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20),
                   ("kb", 1 << 10), ("t", 1 << 40), ("g", 1 << 30),
                   ("m", 1 << 20), ("k", 1 << 10), ("b", 1)):
        if s.endswith(suf):
            s, mult = s[: -len(suf)], m
            break
    try:
        return int(float(s) * mult)
    except ValueError:
        return 0
