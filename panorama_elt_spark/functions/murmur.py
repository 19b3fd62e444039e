"""Pure-Python Spark-compatible Murmur3 key hashing.

``LakeTable`` buckets rows with ``pmod(hash(*keys), n_buckets)`` where
``hash`` is Spark's Murmur3_x86_32 (seed 42) — the same family Spark's
``HashPartitioning`` uses, which is why the merge's single exchange also
produces the file layout. This module replicates that hash bit-for-bit
on the driver so metadata-only paths (the ``panorama`` DataSource's
filter pushdown, point-lookup planning) can map a key *value* to its
bucket without launching a Spark job.

Semantics mirror Spark's Murmur3Hash expression:

* multiple columns chain — column i's hash becomes column i+1's seed;
* NULL leaves the running seed unchanged;
* int/date hash as a 4-byte block, long/timestamp as two 4-byte blocks,
  boolean as int 1/0, strings as UTF-8 bytes (4-byte LE blocks, then
  per-byte tail mixes — Spark's ``hashUnsafeBytes``, which differs from
  canonical Murmur3's tail).

Parity with ``F.hash`` is pinned by ``tests/test_datasource.py``.
"""

from __future__ import annotations

_MASK32 = 0xFFFFFFFF

# types this module can hash — pruning is only legal when every key
# column's declared type is in this set
SUPPORTED_TYPES = {"int", "bigint", "string", "boolean", "date", "timestamp"}


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _MASK32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & _MASK32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK32
    h1 ^= h1 >> 16
    return h1


def _hash_int(value: int, seed: int) -> int:
    return _fmix(_mix_h1(seed, _mix_k1(value & _MASK32)), 4)


def _hash_long(value: int, seed: int) -> int:
    low = value & _MASK32
    high = (value >> 32) & _MASK32
    h1 = _mix_h1(seed, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _fmix(h1, 8)


def _hash_bytes(data: bytes, seed: int) -> int:
    h1 = seed
    n = len(data)
    aligned = n - (n % 4)
    for i in range(0, aligned, 4):
        block = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(block))
    for i in range(aligned, n):
        b = data[i]
        if b >= 0x80:  # java bytes are signed; sign-extend to int
            b -= 0x100
        h1 = _mix_h1(h1, _mix_k1(b & _MASK32))
    return _fmix(h1, n)


def _to_signed32(x: int) -> int:
    x &= _MASK32
    return x - (1 << 32) if x >= (1 << 31) else x


def murmur3_hash(values: list, types: list[str], seed: int = 42) -> int:
    """Spark ``F.hash(*cols)`` of one row of key values (signed int32).

    ``types`` are the table-schema DDL names (``SUPPORTED_TYPES``);
    date values may be ``datetime.date`` (hashed as epoch days) and
    timestamp values ``datetime.datetime`` (hashed as epoch micros),
    matching Spark's internal representations.
    """
    import datetime

    h = seed & _MASK32
    for value, tname in zip(values, types):
        if tname not in SUPPORTED_TYPES:
            raise ValueError(f"unsupported key type for python-side hashing: {tname}")
        if value is None:
            continue  # null leaves the seed unchanged
        if tname == "int":
            h = _hash_int(int(value) & _MASK32, h)
        elif tname == "bigint":
            h = _hash_long(int(value) & 0xFFFFFFFFFFFFFFFF, h)
        elif tname == "boolean":
            h = _hash_int(1 if value else 0, h)
        elif tname == "date":
            if isinstance(value, datetime.date):
                days = (value - datetime.date(1970, 1, 1)).days
            else:
                days = int(value)
            h = _hash_int(days & _MASK32, h)
        elif tname == "timestamp":
            if isinstance(value, datetime.datetime):
                epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
                if value.tzinfo is None:
                    value = value.replace(tzinfo=datetime.timezone.utc)
                micros = int((value - epoch).total_seconds() * 1_000_000)
            else:
                micros = int(value)
            h = _hash_long(micros & 0xFFFFFFFFFFFFFFFF, h)
        else:  # string
            h = _hash_bytes(str(value).encode("utf-8"), h)
    return _to_signed32(h)


def bucket_of(values: list, types: list[str], n_buckets: int) -> int:
    """``pmod(murmur3_hash(values), n_buckets)`` — the bucket the lake
    table stores this key in (``table.bucket_expr`` parity)."""
    return murmur3_hash(values, types) % n_buckets
