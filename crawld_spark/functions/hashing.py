"""Portable, process-stable hashing.

Two families, each with a reason:

- **JVM side** (hot path, shard routing, dedup keys): Spark's built-in
  ``xxhash64`` — stable across executors/JVM restarts, vectorized in
  whole-stage codegen. Python's builtin ``hash()`` is per-process salted and
  must never be used (SURVEY.md §7.7.5).
- **Cross-engine side** (anything an oracle/DuckDB query must reproduce):
  MD5 — the only hash both Spark (``F.md5``) and DuckDB (``md5``) compute
  identically. Helpers below derive 64-bit ints / fingerprints from it for
  the Python-side operators (seen-set, simulator).
"""

from __future__ import annotations

import hashlib

import numpy as np


def md5_u64(s: str | bytes) -> int:
    """First 8 bytes of md5 as an unsigned 64-bit int (big-endian)."""
    b = s.encode("utf-8") if isinstance(s, str) else s
    return int.from_bytes(hashlib.md5(b).digest()[:8], "big")


def md5_u64_array(values) -> np.ndarray:
    """Vectorized-ish md5_u64 over an iterable of strings → uint64 ndarray."""
    return np.fromiter((md5_u64(v) for v in values), dtype=np.uint64, count=len(values))


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Cheap avalanche over uint64 ndarrays — derives independent hash
    streams from one base hash (double-hashing for the bloom filter)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    x ^= x >> np.uint64(31)
    return x
