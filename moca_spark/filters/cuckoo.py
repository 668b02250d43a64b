"""Cuckoo filter — the deletable fallback for the approximate seen-set.

North rule: "bloom-filter (with cuckoo-filter fallback) URL-seen set".
The bloom filter (filters/bloom.py) cannot delete; the reference's
depth-qualified membership (a URL re-surfacing at a SMALLER depth must
be re-admitted — PgRunControl.scala:327-337, SURVEY §7.3) means an
approximate-filter deployment that encodes "url seen at depth <= d"
may need evictions when entries are re-queued. The cuckoo filter
supports delete with the same may-only-pass-never-drop discipline:
a MISS is definitive, a HIT goes to the exact join.

Standard design (Fan et al., "Cuckoo Filter: Practically Better Than
Bloom", CoNEXT'14 — public paper): 16-bit fingerprints, 4-slot
buckets, partial-key cuckoo hashing (alternate bucket = bucket XOR
hash(fingerprint)), bounded eviction chains.
"""

from __future__ import annotations

import numpy as np

from moca_spark.filters.bloom import _splitmix64

_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, n_expected: int, bucket_size: int = 4):
        n_buckets = 1
        while n_buckets * bucket_size < int(n_expected / 0.95) + 1:
            n_buckets <<= 1  # power of two for cheap masking
        self.n_buckets = max(n_buckets, 2)
        self.bucket_size = bucket_size
        # 0 = empty slot; fingerprints are 1..65535
        self.table = np.zeros((self.n_buckets, bucket_size), dtype=np.uint16)
        self.size = 0
        self._rng = np.random.RandomState(42)  # deterministic kicks

    def _fp_and_index(self, key: int) -> tuple[int, int]:
        h = int(_splitmix64(np.array([key], dtype=np.int64).view(np.uint64))[0])
        fp = (h & 0xFFFF) or 1
        i1 = (h >> 16) & (self.n_buckets - 1)
        return fp, i1

    def _alt_index(self, i: int, fp: int) -> int:
        h = int(_splitmix64(np.array([fp], dtype=np.int64).view(np.uint64))[0])
        return (i ^ h) & (self.n_buckets - 1)

    def _try_put(self, i: int, fp: int) -> bool:
        row = self.table[i]
        empty = np.where(row == 0)[0]
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def add(self, key: int) -> bool:
        fp, i1 = self._fp_and_index(key)
        i2 = self._alt_index(i1, fp)
        if self._try_put(i1, fp) or self._try_put(i2, fp):
            self.size += 1
            return True
        i = i1 if self._rng.randint(2) else i2
        for _ in range(_MAX_KICKS):
            slot = self._rng.randint(self.bucket_size)
            fp, self.table[i][slot] = int(self.table[i][slot]), fp
            i = self._alt_index(i, fp)
            if self._try_put(i, fp):
                self.size += 1
                return True
        return False  # filter full — caller should resize/rebuild

    def contains(self, key: int) -> bool:
        fp, i1 = self._fp_and_index(key)
        i2 = self._alt_index(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete(self, key: int) -> bool:
        fp, i1 = self._fp_and_index(key)
        for i in (i1, self._alt_index(i1, fp)):
            hit = np.where(self.table[i] == fp)[0]
            if len(hit):
                self.table[i][hit[0]] = 0
                self.size -= 1
                return True
        return False

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized lookup for Arrow-batch pre-filtering."""
        keys = np.asarray(keys, dtype=np.int64).view(np.uint64)
        h = _splitmix64(keys)
        fp = (h & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)
        mask = np.uint64(self.n_buckets - 1)
        i1 = ((h >> np.uint64(16)) & mask).astype(np.int64)
        hfp = _splitmix64(fp.astype(np.int64).view(np.uint64) & np.uint64(0xFFFFFFFFFFFFFFFF))
        i2 = (i1.view(np.uint64) ^ hfp) & mask
        t = self.table
        hit1 = (t[i1] == fp[:, None]).any(axis=1)
        hit2 = (t[i2.astype(np.int64)] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def to_bytes(self) -> bytes:
        head = np.array([self.n_buckets, self.bucket_size, self.size],
                        dtype=np.int64).tobytes()
        return head + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        nb, bs, size = np.frombuffer(data[:24], dtype=np.int64)
        obj = cls.__new__(cls)
        obj.n_buckets, obj.bucket_size, obj.size = int(nb), int(bs), int(size)
        obj.table = (
            np.frombuffer(data[24:], dtype=np.uint16)
            .reshape(obj.n_buckets, obj.bucket_size)
            .copy()
        )
        obj._rng = np.random.RandomState(42)
        return obj
