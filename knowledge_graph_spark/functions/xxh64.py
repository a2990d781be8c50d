# -*- coding: utf-8 -*-
"""Pure-Python twin of Spark's ``xxhash64`` SQL function.

XXH64 is a public, public-domain hash algorithm (Yann Collet,
https://github.com/Cyan4973/xxHash — spec in doc/xxhash_spec.md); Spark
implements it JVM-side with fixed seed 42 and per-type dispatch
(int -> 4-byte path, long -> 8-byte path, string -> UTF-8 bytes) and
CHAINS multiple arguments by using each column's hash as the seed of
the next (org.apache.spark.sql.catalyst.expressions.XxHash64 semantics).

This twin exists so that test oracles and golden-fixture generators can
reproduce Spark's hash-sketch operators (minhash, simhash, LSH band
keys, fingerprints) without Spark — an independent implementation path
for the correctness gate. Verified equal to Spark's output in
tests/test_xxh64.py.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_int(i: int, seed: int) -> int:
    """4-byte path (Spark IntegerType/..<=32-bit types)."""
    h = (seed + _P5 + 4) & _M
    h ^= ((i & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_long(v: int, seed: int) -> int:
    """8-byte path (Spark LongType)."""
    h = (seed + _P5 + 8) & _M
    k1 = (_rotl((v & _M) * _P2 & _M, 31) * _P1) & _M
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """Byte-stream path (Spark StringType via UTF-8 / BinaryType)."""
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while off + 32 <= n:
            w1 = int.from_bytes(data[off:off + 8], "little")
            w2 = int.from_bytes(data[off + 8:off + 16], "little")
            w3 = int.from_bytes(data[off + 16:off + 24], "little")
            w4 = int.from_bytes(data[off + 24:off + 32], "little")
            v1 = (_rotl((v1 + w1 * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + w2 * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + w3 * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + w4 * _P2) & _M, 31) * _P1) & _M
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while off + 8 <= n:
        w = int.from_bytes(data[off:off + 8], "little")
        h ^= (_rotl((w * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        off += 8
    if off + 4 <= n:
        w = int.from_bytes(data[off:off + 4], "little")
        h ^= (w * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        off += 4
    while off < n:
        h ^= (data[off] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        off += 1
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(*values, seed: int = SPARK_SEED) -> int:
    """Replicates ``F.xxhash64(c1, c2, ...)``: per-value typed hash,
    chained through the seed; returns Spark's SIGNED 64-bit long.

    Value typing mirrors Spark's literal rules: Python int in 32-bit
    range passed as ``int`` hashes via the 4-byte path (Spark int
    literal); pass ``("long", v)`` to force the 8-byte path (Spark
    bigint columns); str hashes UTF-8 bytes; bytes hash raw."""
    h = seed
    for v in values:
        if isinstance(v, tuple) and v[0] == "long":
            h = hash_long(v[1], h)
        elif isinstance(v, bool):
            h = hash_int(int(v), h)
        elif isinstance(v, int):
            if -(2 ** 31) <= v < 2 ** 31:
                h = hash_int(v, h)
            else:
                h = hash_long(v, h)
        elif isinstance(v, str):
            h = hash_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (bytes, bytearray)):
            h = hash_bytes(bytes(v), h)
        else:
            raise TypeError(f"unsupported type for xxhash64 twin: {type(v)}")
    return _to_signed(h)
