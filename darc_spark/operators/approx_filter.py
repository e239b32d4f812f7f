"""Partitioned URL-seen prefilter: numpy Bloom + Cuckoo filters.

North-rule component: darc's URL-seen set is a forever-growing Redis
sorted set with ``ZADD NX`` insert-if-absent (``darc/db.py:555-568,
644-651``). At 10^10 URLs the exact set is a big table; the scalable
shape is a **per-bucket approximate filter prefilter** in front of the
exact ``left_anti`` join:

* candidate link  →  ``xxhash64(name)``  (computed JVM-side)
* ``might_contain`` == False  →  *definitely new*: enqueue directly,
  no join at all (the overwhelmingly common case for a crawl).
* ``might_contain`` == True   →  *maybe seen*: exact anti-join against
  ``url_seen`` decides (bloom false positives never lose URLs —
  SURVEY.md §7 hard part (b)).

Filters are partitioned by ``bucket = pmod(xxhash64(name), n_buckets)``
and maintained **distributively** (cogrouped ``applyInPandas`` per
bucket) — no driver-side key collection. The Cuckoo variant supports
deletions (``drop_requests`` semantics, ``darc/db.py:321-467``); Bloom
is the cheaper insert-only default. A saturated bucket degrades to
"maybe seen for everything" (payload=None) — correctness unaffected.

Both filters are implemented vectorized over numpy uint64 arrays; the
only Python-side work per batch is bit indexing on Arrow-transferred
columns.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

# uint64 wraparound is intentional everywhere in this module
np.seterr(over="ignore")

_MIX = np.uint64(0xFF51AFD7ED558CCD)


def _mix64(keys: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche for a second independent hash."""
    k = keys.astype(np.uint64, copy=True)
    k ^= k >> np.uint64(33)
    k *= _MIX
    k ^= k >> np.uint64(33)
    k *= np.uint64(0xC4CEB9FE1A85EC53)
    k ^= k >> np.uint64(33)
    return k


class BloomFilter:
    """Bit-array bloom filter keyed on pre-hashed 64-bit values."""

    MAGIC = b"BLM1"

    def __init__(self, n_bits: int, n_hashes: int = 7, bits: np.ndarray | None = None):
        self.n_bits = int(n_bits)
        self.n_hashes = int(n_hashes)
        self.bits = (
            bits
            if bits is not None
            else np.zeros((self.n_bits + 7) // 8, dtype=np.uint8)
        )

    @classmethod
    def for_capacity(cls, n: int, fpp: float = 0.01) -> "BloomFilter":
        n = max(n, 64)
        m = int(-n * np.log(fpp) / (np.log(2) ** 2)) + 1
        k = max(1, round(m / n * np.log(2)))
        return cls(m, k)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1 = keys.astype(np.uint64)
        h2 = _mix64(keys) | np.uint64(1)
        i = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.n_bits)).astype(
            np.int64
        )

    def add(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(np.asarray(keys)).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(keys))
        probe = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return probe.all(axis=0)

    def to_bytes(self) -> bytes:
        return self.MAGIC + struct.pack("<qi", self.n_bits, self.n_hashes) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        assert data[:4] == cls.MAGIC, "not a bloom payload"
        n_bits, n_hashes = struct.unpack_from("<qi", data, 4)
        bits = np.frombuffer(data[16:], dtype=np.uint8).copy()
        return cls(n_bits, n_hashes, bits)


class CuckooFilter:
    """Partial-key cuckoo filter (4-slot buckets, 16-bit fingerprints).

    Supports delete — required for the reference's permanent-drop path
    (``LinkNoReturn`` → ``drop_requests``, ``darc/db.py:406-417``): a
    dropped URL must be removable from the seen-filter so a later
    legitimate re-add is not prefiltered away.
    """

    MAGIC = b"CKF1"
    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, n_buckets: int, table: np.ndarray | None = None):
        # power-of-two bucket count so XOR relocation stays in range
        self.n_buckets = 1 << int(n_buckets - 1).bit_length()
        self.table = (
            table
            if table is not None
            else np.zeros((self.n_buckets, self.SLOTS), dtype=np.uint16)
        )
        self._mask = np.uint64(self.n_buckets - 1)

    @classmethod
    def for_capacity(cls, n: int) -> "CuckooFilter":
        # 4 slots/bucket at ~95% load
        return cls(max(16, int(n / (cls.SLOTS * 0.95)) + 1))

    def _fp(self, keys: np.ndarray) -> np.ndarray:
        fp = (_mix64(keys) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 means empty slot
        return fp

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (keys.astype(np.uint64) & self._mask).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        fph = _mix64(fp.astype(np.uint64))
        return ((i1.astype(np.uint64) ^ fph) & self._mask).astype(np.int64)

    def insert(self, keys: np.ndarray) -> bool:
        """Insert all keys; returns False if the filter saturated."""
        keys = np.asarray(keys)
        fps, i1s = self._fp(keys), self._i1(keys)
        i2s = self._i2(i1s, fps)
        rng_state = np.uint64(0x9E3779B97F4A7C15)
        ok = True
        for fp, i1, i2 in zip(fps, i1s, i2s):
            if self._insert_one(int(fp), int(i1), int(i2)):
                continue
            # evict loop
            cur_fp, cur_i = int(fp), int(i1)
            placed = False
            for kick in range(self.MAX_KICKS):
                rng_state = (rng_state * np.uint64(6364136223846793005)) + np.uint64(
                    1442695040888963407
                )
                slot = int(rng_state >> np.uint64(60)) % self.SLOTS
                cur_fp, self.table[cur_i, slot] = int(self.table[cur_i, slot]), cur_fp
                cur_i = int(
                    self._i2(np.array([cur_i]), np.array([cur_fp], dtype=np.uint16))[0]
                )
                empty = np.where(self.table[cur_i] == 0)[0]
                if len(empty):
                    self.table[cur_i, empty[0]] = cur_fp
                    placed = True
                    break
            if not placed:
                ok = False
        return ok

    def _insert_one(self, fp: int, i1: int, i2: int) -> bool:
        for i in (i1, i2):
            empty = np.where(self.table[i] == 0)[0]
            if len(empty):
                self.table[i, empty[0]] = fp
                return True
        return False

    def delete(self, keys: np.ndarray) -> np.ndarray:
        """Remove one fingerprint copy per key; returns per-key success."""
        keys = np.asarray(keys)
        fps, i1s = self._fp(keys), self._i1(keys)
        i2s = self._i2(i1s, fps)
        out = np.zeros(len(keys), dtype=bool)
        for n, (fp, i1, i2) in enumerate(zip(fps, i1s, i2s)):
            for i in (int(i1), int(i2)):
                hit = np.where(self.table[i] == fp)[0]
                if len(hit):
                    self.table[i, hit[0]] = 0
                    out[n] = True
                    break
        return out

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fps, i1s = self._fp(keys), self._i1(keys)
        i2s = self._i2(i1s, fps)
        in1 = (self.table[i1s] == fps[:, None]).any(axis=1)
        in2 = (self.table[i2s] == fps[:, None]).any(axis=1)
        return in1 | in2

    def to_bytes(self) -> bytes:
        return self.MAGIC + struct.pack("<q", self.n_buckets) + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        assert data[:4] == cls.MAGIC, "not a cuckoo payload"
        (n_buckets,) = struct.unpack_from("<q", data, 4)
        table = (
            np.frombuffer(data[12:], dtype=np.uint16)
            .reshape(n_buckets, cls.SLOTS)
            .copy()
        )
        return cls(n_buckets, table)


def load_filter(data: bytes | None):
    if data is None:
        return None
    if data[:4] == BloomFilter.MAGIC:
        return BloomFilter.from_bytes(bytes(data))
    if data[:4] == CuckooFilter.MAGIC:
        return CuckooFilter.from_bytes(bytes(data))
    raise ValueError("unknown filter payload")
