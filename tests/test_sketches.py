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


def test_exact_quantiles_match_duckdb_convention():
    """exact_quantiles_from_counts pins DuckDB quantile_disc (rank =
    ceil(q*n), 1-indexed) on random multisets."""
    import duckdb
    import numpy as np

    from schemasaurus_ray.stages.stats import (
        batch_value_counts,
        exact_quantiles_from_counts,
        merge_value_counts,
    )
    import pyarrow as pa

    rng = np.random.default_rng(7)
    con = duckdb.connect()
    bps = [100, 2500, 5000, 7500, 9500, 9999, 10000]
    for trial in range(20):
        n = int(rng.integers(1, 2000))
        vals = rng.integers(-50, 50, size=n).astype(np.float64)
        # split into uneven batches and merge partials
        cuts = sorted(rng.integers(0, n, size=3))
        parts = []
        prev = 0
        for c in [*cuts, n]:
            t = pa.table({"x": pa.array(vals[prev:c], pa.float64())})
            parts.append(batch_value_counts(t, ["x"]))
            prev = c
        merged = merge_value_counts(parts)
        got = exact_quantiles_from_counts(merged["x"], bps)
        con.register("t", pa.table({"x": pa.array(vals)}))
        want = [
            con.sql(f"SELECT quantile_disc(x, {bp / 10000}) FROM t").fetchone()[0]
            for bp in bps
        ]
        con.unregister("t")
        assert got == want, (trial, got, want)


def test_exact_quantiles_empty_and_cap():
    import pyarrow as pa
    import pytest

    from schemasaurus_ray.stages.stats import (
        batch_value_counts,
        exact_quantiles_from_counts,
    )

    assert exact_quantiles_from_counts({}, [5000]) == [None]
    t = pa.table({"x": pa.array(list(range(100)), pa.int64())})
    with pytest.raises(ValueError, match="max_distinct"):
        batch_value_counts(t, ["x"], max_distinct=10)


def test_grouped_quantiles_vectorized_matches_scalar():
    """grouped_quantiles_from_count_table (vectorized lexsort+cumsum path)
    must agree with exact_quantiles_from_counts per group on random
    grouped multisets, including single-row groups and q=1/10000."""
    import numpy as np
    import pyarrow as pa

    from schemasaurus_ray.stages.stats import (
        exact_quantiles_from_counts,
        grouped_quantiles_from_count_table,
    )

    rng = np.random.default_rng(11)
    bps = [1, 100, 5000, 9900, 10000]
    for trial in range(20):
        n = int(rng.integers(1, 500))
        groups = rng.choice(["A", "B", "C", "z"], size=n)
        vals = np.round(rng.normal(0, 100, size=n), 2)
        cnts = rng.integers(1, 5, size=n)
        # collapse duplicates like a real count table
        per: dict[str, dict[float, int]] = {}
        for g, v, c in zip(groups, vals, cnts):
            d = per.setdefault(g, {})
            d[float(v)] = d.get(float(v), 0) + int(c)
        rows = [(g, v, c) for g, d in per.items() for v, c in d.items()]
        t = pa.table(
            {
                "g": pa.array([r[0] for r in rows], pa.string()),
                "x": pa.array([r[1] for r in rows], pa.float64()),
                "cnt": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        got = grouped_quantiles_from_count_table(t, "g", "x", bps)
        assert set(got) == set(per), trial
        for g, d in per.items():
            want = exact_quantiles_from_counts(d, bps)
            assert [float(x) for x in got[g]] == [float(w) for w in want], (trial, g)
    assert grouped_quantiles_from_count_table(
        pa.table({"g": pa.array([], pa.string()), "x": pa.array([], pa.float64()),
                  "cnt": pa.array([], pa.int64())}), "g", "x", bps
    ) == {}


def test_cms_overestimate_and_bound():
    """CMS never underestimates; error ≤ ε·N with overwhelming margin at
    these sizes; merged partials ≡ one-shot sketch (exact table equality)."""
    import pyarrow as pa

    from schemasaurus_ray.state.cms import CountMinSketch

    rng = np.random.default_rng(13)
    keys = rng.zipf(1.4, size=30_000) % 5000
    col = pa.array([f"k{v}" for v in keys], pa.string())
    cms = CountMinSketch(width=2048, depth=4)
    cms.add_column(col)
    assert cms.total == 30_000

    uniq, true_counts = np.unique(keys, return_counts=True)
    qcol = pa.array([f"k{v}" for v in uniq], pa.string())
    est = cms.estimate_column(qcol)
    assert (est >= true_counts).all()  # never under
    eps = np.e / 2048
    assert (est - true_counts <= eps * cms.total + 1).all()
    # heavy hitters keep near-exact counts
    hot = np.argsort(true_counts)[::-1][:10]
    assert (est[hot] - true_counts[hot] <= 0.002 * cms.total).all()

    # mergeability: sharded partials sum to the one-shot table bit-exactly
    merged = CountMinSketch(width=2048, depth=4)
    for part in np.array_split(keys, 7):
        p = CountMinSketch(width=2048, depth=4)
        p.add_column(pa.array([f"k{v}" for v in part], pa.string()))
        merged.merge(p)
    assert np.array_equal(merged.table, cms.table)
    assert np.array_equal(
        merged.estimate_column(qcol), cms.estimate_column(qcol)
    )


def test_cms_weighted_updates():
    import pyarrow as pa

    from schemasaurus_ray.state.cms import CountMinSketch
    from schemasaurus_ray.util import hash_column

    cms = CountMinSketch(width=512, depth=3)
    h = hash_column(pa.array(["a", "b"], pa.string()))
    cms.add_hashes(h, counts=np.array([5, 11], dtype=np.int64))
    est = cms.estimate_hashes(h)
    assert est[0] >= 5 and est[1] >= 11 and cms.total == 16


def test_heavy_hitters_approx_query_golden(ray_session):
    """Driver surface: CMS top-10-by-estimate contains the true top-5;
    estimates never underestimate and respect the ε·N bound."""
    import duckdb
    import pyarrow as pa  # noqa: F401

    from schemasaurus_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.001"
    got = q.heavy_hitters_approx_events(sf)
    con = duckdb.connect()
    true = dict(
        con.sql(
            f"SELECT user_id, count(*) FROM read_parquet('{sf}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    total = sum(true.values())
    top5 = [u for u, _ in sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:5]]
    rows = {int(r["user_id"]): int(r["est_cnt"]) for r in got.to_pylist()}
    assert set(top5) <= set(rows)
    eps = np.e / 2048
    for u, est in rows.items():
        assert est >= true.get(u, 0)
        assert est - true.get(u, 0) <= eps * total + 1


def test_distinct_by_group_hll_vs_exact(ray_session):
    """Keyed HLL partials: per-group estimates within 5% of the exact
    pair-shuffle counts, and deterministic across runs."""
    from schemasaurus_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.01"
    approx = {r["event_type"]: r["n_users_est"] for r in q.distinct_users_by_type_approx(sf).to_pylist()}
    exact = {r["event_type"]: r["n_users"] for r in q.distinct_users_by_type(sf).to_pylist()}
    assert set(approx) == set(exact)
    for g, n in exact.items():
        assert abs(approx[g] - n) / max(n, 1) < 0.05, (g, approx[g], n)
    again = {r["event_type"]: r["n_users_est"] for r in q.distinct_users_by_type_approx(sf).to_pylist()}
    assert again == approx
