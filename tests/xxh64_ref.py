"""Pure-Python XXH64 reference implementation (public algorithm,
github.com/Cyan4973/xxHash spec) — the independent oracle for Spark's
`xxhash64` in the DSIR production fast path, which DuckDB cannot
reproduce (no xxhash64 twin; see LIMITATIONS §6).  Validated
bit-for-bit against Spark's expression — including the struct-field
chaining (seed 42, each non-NULL field's hash seeds the next) and
NULL-skip semantics — in tests/test_text_ops.py."""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(h: int, acc: int) -> int:
    h ^= _round(0, acc)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 0) -> int:
    """Unsigned 64-bit XXH64 of `data` with `seed` (seed taken as the
    low 64 bits, so Spark's signed-long running hash passes through)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _M
        a2 = (seed + _P2) & _M
        a3 = seed
        a4 = (seed - _P1) & _M
        while i + 32 <= n:
            a1 = _round(a1, int.from_bytes(data[i:i + 8], "little"))
            a2 = _round(a2, int.from_bytes(data[i + 8:i + 16], "little"))
            a3 = _round(a3, int.from_bytes(data[i + 16:i + 24], "little"))
            a4 = _round(a4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12)
             + _rotl(a4, 18)) & _M
        for a in (a1, a2, a3, a4):
            h = _merge(h, a)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def signed64(u: int) -> int:
    """Two's-complement view — what Spark's xxhash64 column carries."""
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(*fields: str | None, seed: int = 42) -> int:
    """Spark `xxhash64(f1, f2, ...)` over STRING fields: the running
    hash (initially 42) seeds each non-NULL field's UTF-8 hash; NULL
    fields are skipped."""
    h = seed
    for f in fields:
        if f is not None:
            h = xxh64(f.encode("utf-8"), h)
    return signed64(h & _M)
