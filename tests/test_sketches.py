"""HLL + t-digest accuracy and mergeability."""

import numpy as np
import pyarrow as pa

from schemasaurus_ray.state.hll import HyperLogLog
from schemasaurus_ray.state.tdigest import TDigest, ks_statistic, psi


def test_hll_accuracy_ints():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1_000_000, size=200_000)
    true = len(np.unique(vals))
    h = HyperLogLog()
    h.add_column(pa.array(vals))
    assert abs(h.estimate() - true) / true < 0.03


def test_hll_strings_and_merge():
    a = HyperLogLog()
    b = HyperLogLog()
    a.add_column(pa.array([f"id-{i}" for i in range(5000)]))
    b.add_column(pa.array([f"id-{i}" for i in range(2500, 7500)]))
    a.merge(b)
    assert abs(a.estimate() - 7500) / 7500 < 0.05


def test_hll_serialization():
    h = HyperLogLog()
    h.add_column(pa.array(list(range(1000))))
    h2 = HyperLogLog.from_bytes(h.to_bytes())
    assert h2.estimate() == h.estimate()


def test_tdigest_quantiles():
    rng = np.random.default_rng(1)
    vals = rng.lognormal(7.3, 0.6, size=100_000)
    td = TDigest()
    for chunk in np.array_split(vals, 20):
        td.add(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        exact = np.quantile(vals, q)
        approx = td.quantile(q)
        assert abs(approx - exact) / exact < 0.02, (q, exact, approx)


def test_tdigest_merge_and_json():
    rng = np.random.default_rng(2)
    a_vals = rng.normal(0, 1, 50_000)
    b_vals = rng.normal(0, 1, 50_000)
    a, b = TDigest(), TDigest()
    a.add(a_vals)
    b.add(b_vals)
    a.merge(b)
    allv = np.concatenate([a_vals, b_vals])
    assert abs(a.quantile(0.5) - np.median(allv)) < 0.02
    rt = TDigest.from_json(a.to_json())
    assert abs(rt.quantile(0.9) - a.quantile(0.9)) < 1e-9


def test_ks_same_vs_shifted():
    rng = np.random.default_rng(3)
    a, b, c = TDigest(), TDigest(), TDigest()
    a.add(rng.normal(0, 1, 50_000))
    b.add(rng.normal(0, 1, 50_000))
    c.add(rng.normal(1.0, 1, 50_000))
    assert ks_statistic(a, b) < 0.05
    assert ks_statistic(a, c) > 0.3


def test_psi():
    e = {"wav": 700, "flac": 200, "opus": 100}
    same = {"wav": 690, "flac": 210, "opus": 100}
    shifted = {"wav": 100, "flac": 100, "opus": 800}
    assert psi(e, same) < 0.02
    assert psi(e, shifted) > 1.0
