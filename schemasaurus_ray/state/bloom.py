"""Bloom filter — the fixed-size mergeable membership sketch for the
referential check's 100-TB path.

The exact broadcast anti-join (stages/referential.py) ships 64 bits per
distinct reference key; at 10^10 clip_ids that is an 80 GB object. A Bloom
filter at 1% fp is ~9.6 bits/key (~12 GB) and is built the same way every
sketch here is: per-batch partial bitmaps OR-merged (associative +
commutative → tree-reducible), broadcast once with ``ray.put``.

Guarantee direction: membership has NO false negatives, so a key the
filter rejects is a DEFINITE orphan. False positives (rate ``p``) are
orphans that slip through; callers either accept the bounded miss rate
(approximate mode) or route the surviving keys through the exact shuffle
anti-join (exact mode — stages/referential.orphan_rows(method="bloom")).

Probes use Kirsch–Mitzenmacher double hashing over the column's existing
64-bit hash (util.hash_column): pos_i = (h1 + i·h2) mod m with h2 forced
odd and m a multiple of 64, which keeps all k probes full-period.
"""

from __future__ import annotations

import math

import numpy as np

from ..util import splitmix64


class BloomFilter:
    def __init__(self, num_bits: int, num_hashes: int):
        self.m = ((num_bits + 63) // 64) * 64
        self.k = num_hashes
        self.words = np.zeros(self.m // 64, dtype=np.uint64)

    @classmethod
    def sized_for(cls, expected_keys: int, fp_rate: float = 0.01) -> "BloomFilter":
        """Optimal sizing: m = -n·ln(p)/ln(2)^2, k = (m/n)·ln(2)."""
        n = max(1, expected_keys)
        m = int(-n * math.log(fp_rate) / (math.log(2) ** 2)) + 1
        k = max(1, round(m / n * math.log(2)))
        return cls(m, k)

    def _positions(self, hashes: np.ndarray, i: int) -> np.ndarray:
        h1 = hashes
        h2 = splitmix64(hashes) | np.uint64(1)
        return (h1 + np.uint64(i) * h2) % np.uint64(self.m)

    def add_hashes(self, hashes: np.ndarray) -> None:
        h = np.ascontiguousarray(hashes, dtype=np.uint64)
        for i in range(self.k):
            idx = self._positions(h, i)
            np.bitwise_or.at(self.words, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Boolean mask: True = maybe-member, False = DEFINITELY absent."""
        h = np.ascontiguousarray(hashes, dtype=np.uint64)
        out = np.ones(len(h), dtype=bool)
        for i in range(self.k):
            idx = self._positions(h, i)
            bits = (self.words[(idx >> np.uint64(6)).astype(np.int64)]
                    >> (idx & np.uint64(63))) & np.uint64(1)
            out &= bits.astype(bool)
            if not out.any():
                break
        return out

    def merge(self, other: "BloomFilter") -> None:
        if other.m != self.m or other.k != self.k:
            raise ValueError("cannot merge Bloom filters of different geometry")
        self.words |= other.words

    def to_bytes(self) -> bytes:
        head = np.array([self.m, self.k], dtype=np.uint64).tobytes()
        return head + self.words.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        m, k = np.frombuffer(data[:16], dtype=np.uint64)
        bf = cls(int(m), int(k))
        bf.words = np.frombuffer(data[16:], dtype=np.uint64).copy()
        return bf
