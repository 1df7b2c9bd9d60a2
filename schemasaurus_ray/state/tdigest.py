"""t-digest quantile sketch (Dunning & Ertl, 'Computing extremely accurate
quantiles using t-digests') — numpy implementation, mergeable, serializable
to JSON for drift snapshots (SURVEY.md §2E)."""

from __future__ import annotations

import json

import numpy as np


class TDigest:
    """Merging-variant t-digest with the k1 scale function approximated by
    capped centroid weights. Accurate in the tails, compact (≤ ~2·delta
    centroids), and associative under merge."""

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.zeros(0, dtype=np.float64)
        self.weights = np.zeros(0, dtype=np.float64)
        self._buf_means: list[np.ndarray] = []
        self._buf_weights: list[np.ndarray] = []
        self.count = 0.0
        self.min = np.inf
        self.max = -np.inf

    def add(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        w = np.ones(len(values)) if weights is None else np.asarray(weights, dtype=np.float64)
        self._buf_means.append(values)
        self._buf_weights.append(w)
        self.count += float(w.sum())
        self.min = min(self.min, float(values.min()))
        self.max = max(self.max, float(values.max()))
        if sum(len(b) for b in self._buf_means) > 8 * self.delta:
            self._compress()

    def _compress(self) -> None:
        if not self._buf_means and len(self.means) <= 2 * self.delta:
            return
        means = np.concatenate([self.means] + self._buf_means) if self._buf_means else self.means
        weights = np.concatenate([self.weights] + self._buf_weights) if self._buf_weights else self.weights
        self._buf_means, self._buf_weights = [], []
        if len(means) == 0:
            return
        # Fully vectorized merge: map each point's mid-quantile through the
        # k2 scale function k(q) = (asin(2q-1)/π + 1/2)·δ (Dunning & Ertl's
        # scale family — fine clusters at the tails) and coalesce points
        # sharing a k-cell with one bincount. No Python loop.
        unit = bool(weights.size) and bool((weights == 1.0).all())
        if unit:
            # raw-batch case (one digest per batch in the stats/drift
            # partials): all-ones weights need no argsort+double-gather —
            # one direct sort, and the quantile grid is closed-form
            means = np.sort(means)
            q_mid = (np.arange(len(means)) + 0.5) / len(means)
        else:
            order = np.argsort(means, kind="stable")
            means, weights = means[order], weights[order]
            total = weights.sum()
            q_right = np.cumsum(weights) / total
            q_mid = q_right - weights / (2 * total)
        k = (np.arcsin(np.clip(2 * q_mid - 1, -1, 1)) / np.pi + 0.5) * self.delta
        cluster = np.floor(k).astype(np.int64)
        cluster = np.maximum.accumulate(cluster)  # monotone under float noise
        ncl = int(cluster[-1]) + 1
        if unit:
            new_w = np.bincount(cluster, minlength=ncl).astype(np.float64)
            new_sum = np.bincount(cluster, weights=means, minlength=ncl)
        else:
            new_w = np.bincount(cluster, weights=weights, minlength=ncl)
            new_sum = np.bincount(cluster, weights=weights * means, minlength=ncl)
        nz = new_w > 0
        self.means = new_sum[nz] / new_w[nz]
        self.weights = new_w[nz]

    def merge(self, other: "TDigest") -> "TDigest":
        other._compress()
        if len(other.means):
            self.add(other.means, other.weights)
        self.count = self.count  # add() already accumulated
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        return self

    def quantile(self, q: float | np.ndarray) -> np.ndarray:
        self._compress()
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if len(self.means) == 0:
            return np.full(len(qs), np.nan)
        cum = np.cumsum(self.weights) - self.weights / 2
        cum /= self.weights.sum()
        out = np.interp(qs, cum, self.means)
        out = np.clip(out, self.min, self.max)
        return out if np.ndim(q) else float(out[0])

    def cdf(self, x: np.ndarray) -> np.ndarray:
        self._compress()
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if len(self.means) == 0:
            return np.full(len(xs), np.nan)
        cum = np.cumsum(self.weights) - self.weights / 2
        cum /= self.weights.sum()
        lo, hi = self.min, self.max
        pts = np.concatenate([[lo], self.means, [hi]])
        cdf = np.concatenate([[0.0], cum, [1.0]])
        return np.interp(xs, pts, cdf)

    def to_json(self) -> str:
        self._compress()
        return json.dumps(
            {
                "delta": self.delta,
                "means": self.means.tolist(),
                "weights": self.weights.tolist(),
                "count": self.count,
                "min": None if np.isinf(self.min) else self.min,
                "max": None if np.isinf(self.max) else self.max,
            }
        )

    @classmethod
    def from_json(cls, blob: str) -> "TDigest":
        d = json.loads(blob)
        td = cls(d["delta"])
        td.means = np.array(d["means"], dtype=np.float64)
        td.weights = np.array(d["weights"], dtype=np.float64)
        td.count = d["count"]
        td.min = d["min"] if d["min"] is not None else np.inf
        td.max = d["max"] if d["max"] is not None else -np.inf
        return td


def ks_statistic(a: TDigest, b: TDigest, n_points: int = 256) -> float:
    """Approximate two-sample KS statistic from two t-digests: max |CDF_a -
    CDF_b| over a merged quantile grid."""
    lo = min(a.min, b.min)
    hi = max(a.max, b.max)
    if not np.isfinite(lo) or not np.isfinite(hi):
        return float("nan")
    grid = np.linspace(lo, hi, n_points)
    return float(np.nanmax(np.abs(a.cdf(grid) - b.cdf(grid))))


def psi(expected: dict[str, float], actual: dict[str, float], eps: float = 1e-6) -> float:
    """Population Stability Index over categorical histograms (standard
    credit-scoring drift metric): sum((p_a - p_e) * ln(p_a / p_e))."""
    keys = set(expected) | set(actual)
    e_total = sum(expected.values()) or 1.0
    a_total = sum(actual.values()) or 1.0
    out = 0.0
    for k in keys:
        pe = max(expected.get(k, 0.0) / e_total, eps)
        pa_ = max(actual.get(k, 0.0) / a_total, eps)
        out += (pa_ - pe) * np.log(pa_ / pe)
    return float(out)
