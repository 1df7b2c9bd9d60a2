"""Count-min sketch — mergeable approximate per-key counts, numpy.

Standard CMS (Cormode & Muthukrishnan 2005): d rows × w counters; a key
increments one counter per row (row-specific hash); its estimate is the
MIN over its d counters — always an OVERestimate, with
P[err > ε·N] ≤ δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. Mergeable by elementwise
sum, so it composes with the per-shard-partial / tree-combine shape every
other sketch here uses (SURVEY.md §2E) — the streaming complement to the
EXACT heavy-hitter shuffle (stages/shuffle.heavy_hitters_shuffled): the
sketch answers point queries on keys that were never shuffled at all.

Row hashes are derived from one 64-bit key hash (util.hash_column) split
into d independent (h1 + i·h2) combinations — the standard double-hashing
construction. Updates are vectorized ``np.add.at`` per row.
"""

from __future__ import annotations

import numpy as np

from ..util import hash_column


class CountMinSketch:
    def __init__(self, width: int = 2048, depth: int = 4, table: np.ndarray | None = None):
        self.width = width
        self.depth = depth
        self.table = (
            table if table is not None else np.zeros((depth, width), dtype=np.int64)
        )

    # -- hashing ----------------------------------------------------------
    def _indices(self, hashes: np.ndarray) -> np.ndarray:
        """(depth, n) counter indices via double hashing of the 64-bit key
        hash: h_i = h1 + i·(h2|1) mod width."""
        h1 = hashes & np.uint64(0xFFFFFFFF)
        h2 = (hashes >> np.uint64(32)) | np.uint64(1)
        i = np.arange(self.depth, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.width)).astype(np.int64)

    # -- updates ----------------------------------------------------------
    def add_hashes(self, hashes: np.ndarray, counts: np.ndarray | None = None) -> None:
        idx = self._indices(hashes)
        c = counts if counts is not None else np.ones(len(hashes), dtype=np.int64)
        for r in range(self.depth):
            np.add.at(self.table[r], idx[r], c)

    def add_column(self, col) -> None:
        self.add_hashes(hash_column(col))

    # -- queries ----------------------------------------------------------
    def estimate_hashes(self, hashes: np.ndarray) -> np.ndarray:
        idx = self._indices(hashes)
        est = self.table[0][idx[0]]
        for r in range(1, self.depth):
            est = np.minimum(est, self.table[r][idx[r]])
        return est

    def estimate_column(self, col) -> np.ndarray:
        return self.estimate_hashes(hash_column(col))

    # -- merge ------------------------------------------------------------
    def merge(self, other: "CountMinSketch") -> None:
        assert self.table.shape == other.table.shape
        self.table += other.table

    @property
    def total(self) -> int:
        """N (total updates) — every row sums to it, take row 0."""
        return int(self.table[0].sum())
