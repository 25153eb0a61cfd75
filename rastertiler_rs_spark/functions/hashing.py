"""Deterministic 64-bit hashes.

- xxhash64: standard XXH64; with seed=42 it matches Spark's builtin
  ``F.xxhash64`` on BinaryType (verified in tests/test_hashing.py), so
  the numpy oracle and driver-side MBTiles materialization produce
  tile_hash values bit-identical to the distributed plan. Plays the
  role of seahash in the reference's content-dedup sink
  (/root/reference/src/mbtiles.rs:104 — exact algorithm is not part of
  the contract, only internal consistency; see SURVEY.md S9).
- splitmix64: the fixture-generator hash (FIXTURES.md: phash and the
  footprint rule derive from it).
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64(data: bytes, seed: int = 42) -> int:
    """XXH64, returned as a SIGNED 64-bit int (Spark's LongType view)."""
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        i = 0
        limit = n - 32
        while i <= limit:
            lanes = np.frombuffer(data[i : i + 32], dtype="<u8")
            v1 = (_rotl((v1 + int(lanes[0]) * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + int(lanes[1]) * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + int(lanes[2]) * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + int(lanes[3]) * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _M64, 31) * _P1) & _M64)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
        i = 0
    h = (h + n) & _M64
    while i + 8 <= n:
        (lane,) = np.frombuffer(data[i : i + 8], dtype="<u8")
        h = ((_rotl(h ^ ((_rotl((int(lane) * _P2) & _M64, 31) * _P1) & _M64), 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (lane,) = np.frombuffer(data[i : i + 4], dtype="<u4")
        h = ((_rotl(h ^ ((int(lane) * _P1) & _M64), 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = ((_rotl(h ^ ((data[i] * _P5) & _M64), 11)) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def splitmix64(x):
    """SplitMix64 finalizer over uint64 input(s); vectorized.

    Returns np.uint64 array (or scalar). Used by the fixture generator
    (phash + footprint derivation) — pinned so goldens are reproducible.
    """
    with np.errstate(over="ignore"):
        z = (np.asarray(x, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))
