"""Pure-Python XXH64 — the driver-side twin of Spark's ``xxhash64``.

The ordering contract (crawl/oracle.py) breaks remaining slice ties on
the frontier's 64-bit state key ``_key = xxhash64(run_id || '\\x00' ||
url)`` so the engine's rank-sort comparisons stay 8-byte (see
operators/wave.py).  The single-threaded oracle therefore needs the
SAME hash without a JVM: this module implements the public XXH64
algorithm (Yann Collet, github.com/Cyan4973/xxHash — also the exact
algorithm behind Spark's ``org.apache.spark.sql.catalyst.expressions
.XXH64``, whose test suite pins it to the reference vectors).

``spark_xxhash64(s)`` reproduces ``F.xxhash64(string_col)`` bit-for-bit:
XXH64 over the UTF-8 bytes with Spark's fixed seed 42, returned as a
SIGNED 64-bit value (Spark longs are signed).  Parity with the JVM is
asserted in tests/test_urls.py::test_python_xxh64_matches_spark.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def xxh64(data: bytes, seed: int = 0) -> int:
    """Unsigned XXH64 of ``data`` with ``seed`` (reference algorithm)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            lanes = struct.unpack_from("<4Q", data, i)
            v1 = _round(v1, lanes[0])
            v2 = _round(v2, lanes[1])
            v3 = _round(v3, lanes[2])
            v4 = _round(v4, lanes[3])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h = ((_rotl(h ^ _round(0, k), 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = ((_rotl(h ^ (k * _P1) & _M, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def spark_xxhash64(s: str) -> int:
    """``F.xxhash64(lit(s))`` without a JVM: XXH64(UTF-8, seed 42),
    signed 64-bit."""
    h = xxh64(s.encode("utf-8"), 42)
    return h - (1 << 64) if h >= (1 << 63) else h


def state_key(run_id: str, url: str) -> int:
    """Driver-side twin of ``engine._seen_key()``:
    ``xxhash64(concat_ws('\\x00', run_id, url))``."""
    return spark_xxhash64(run_id + "\x00" + url)
