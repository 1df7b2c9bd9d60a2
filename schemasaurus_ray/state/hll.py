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
        # rank = leading zeros of remaining 64-p bits, +1; zeros → max rank
        nz = rest != 0
        lz = np.full(len(hashes), 64 - self.p + 1, dtype=np.uint8)
        if nz.any():
            # count leading zeros via float64 exponent trick is lossy; use
            # bit-length: lz = 64 - bit_length(rest)
            r = rest[nz]
            bl = np.zeros(len(r), dtype=np.int64)
            v = r.copy()
            for shift in (32, 16, 8, 4, 2, 1):
                ge = v >= (np.uint64(1) << np.uint64(shift))
                bl[ge] += shift
                v[ge] >>= np.uint64(shift)
            bl += 1  # bit_length
            lz[nz] = (64 - bl + 1).astype(np.uint8)
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
