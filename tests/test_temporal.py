"""Temporal operators (stages/temporal.py): kernel parity vs brute force
(fixed + hypothesis) and the distributed shuffled variants vs a single
in-memory kernel run."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from schemasaurus_ray.stages.temporal import (
    asof_last_indices,
    count_before,
    count_in_range,
    session_ordinals,
)

# ---------------------------------------------------------------------------
# brute-force references
# ---------------------------------------------------------------------------


def _brute_asof(kl, tl, kr, tr, strict=False):
    out = []
    for k, t in zip(kl, tl):
        best, best_t = -1, None
        for j, (rk, rt) in enumerate(zip(kr, tr)):
            if rk != k:
                continue
            ok = rt < t if strict else rt <= t
            if ok and (best_t is None or rt > best_t or (rt == best_t)):
                # maximal ts; any index with that ts is acceptable for the
                # ts-value contract (we compare matched TS, not index)
                if best_t is None or rt >= best_t:
                    best, best_t = j, rt
        out.append(best)
    return out


def _brute_count_before(kp, tp, kr, tr):
    return [
        sum(1 for rk, rt in zip(kr, tr) if rk == k and rt < t)
        for k, t in zip(kp, tp)
    ]


def _brute_sessions(keys, ts, tiebreak, gap):
    """session ordinal per row, in input order"""
    rows = sorted(range(len(keys)), key=lambda i: (keys[i], ts[i], tiebreak[i]))
    out = [0] * len(keys)
    prev_key, prev_ts, ordinal = None, None, 0
    for i in rows:
        if keys[i] != prev_key:
            ordinal = 1
        elif ts[i] - prev_ts > gap:
            ordinal += 1
        out[i] = ordinal
        prev_key, prev_ts = keys[i], ts[i]
    return out


# ---------------------------------------------------------------------------
# kernel tests
# ---------------------------------------------------------------------------

ARR = lambda xs: np.asarray(xs, dtype=np.int64)  # noqa: E731


def test_asof_basic():
    kl, tl = ARR([1, 1, 2, 3]), ARR([10, 5, 7, 9])
    kr, tr = ARR([1, 1, 2]), ARR([4, 8, 7])
    idx = asof_last_indices(kl, tl, kr, tr)
    # event(1,10) -> right(1,8)=idx1; (1,5)->(1,4)=idx0; (2,7)->(2,7)=idx2 inclusive; (3,9)->none
    assert idx.tolist() == [1, 0, 2, -1]
    idx_s = asof_last_indices(kl, tl, kr, tr, strict=True)
    assert idx_s.tolist() == [1, 0, -1, -1]  # strict drops the equal-ts match


def test_asof_empty_sides():
    e = ARR([])
    assert asof_last_indices(e, e, ARR([1]), ARR([1])).tolist() == []
    assert asof_last_indices(ARR([1]), ARR([1]), e, e).tolist() == [-1]


def test_count_before_basic():
    kp, tp = ARR([1, 1, 2]), ARR([10, 4, 8])
    kr, tr = ARR([1, 1, 1, 2]), ARR([4, 6, 10, 7])
    # strict <: probe(1,10) sees ts 4,6 => 2 ; probe(1,4) sees none (4 not <4)
    assert count_before(kp, tp, kr, tr).tolist() == [2, 0, 1]


def test_count_in_range_window():
    kp, tp = ARR([7, 7]), ARR([100, 50])
    kr, tr = ARR([7, 7, 7, 7]), ARR([90, 99, 100, 40])
    # window [t-10, t): probe@100 -> ts in [90,100) = {90,99}; probe@50 -> [40,50)={40}
    lo = tp - 10
    assert count_in_range(kp, lo, tp, kr, tr).tolist() == [2, 1]


def test_session_ordinals_basic():
    keys = ARR([5, 5, 5, 9, 5])
    ts = ARR([0, 10, 100, 7, 11])
    tb = ARR([0, 1, 2, 3, 4])
    # key5 sorted ts: 0,10,11,100 with gap>30 → sessions 1,1,1,2 ; key9 → 1
    assert session_ordinals(keys, ts, tb, 30).tolist() == [1, 1, 2, 1, 1]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 50)), max_size=40),
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 50)), max_size=40),
    st.booleans(),
)
def test_asof_matches_brute(left, right, strict):
    kl = ARR([k for k, _ in left])
    tl = ARR([t for _, t in left])
    kr = ARR([k for k, _ in right])
    tr = ARR([t for _, t in right])
    got = asof_last_indices(kl, tl, kr, tr, strict=strict)
    want = _brute_asof(kl.tolist(), tl.tolist(), kr.tolist(), tr.tolist(), strict)
    # compare matched TS values (ties on ts make the index ambiguous)
    got_ts = [tr[i] if i >= 0 else None for i in got]
    want_ts = [tr[i] if i >= 0 else None for i in want]
    assert got_ts == want_ts


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 50)), max_size=40),
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 50)), max_size=40),
)
def test_count_before_matches_brute(probes, right):
    kp = ARR([k for k, _ in probes])
    tp = ARR([t for _, t in probes])
    kr = ARR([k for k, _ in right])
    tr = ARR([t for _, t in right])
    got = count_before(kp, tp, kr, tr).tolist()
    assert got == _brute_count_before(kp, tp, kr, tr)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 100)), max_size=50),
    st.integers(1, 20),
)
def test_sessions_match_brute(rows, gap):
    keys = ARR([k for k, _ in rows])
    ts = ARR([t for _, t in rows])
    tb = ARR(range(len(rows)))
    got = session_ordinals(keys, ts, tb, gap).tolist()
    assert got == _brute_sessions(keys.tolist(), ts.tolist(), tb.tolist(), gap)


# ---------------------------------------------------------------------------
# distributed variants (need the shared Ray session)
# ---------------------------------------------------------------------------


def _events_table(n=500, n_keys=13, seed=7) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.integers(0, n_keys, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 10_000, n), pa.timestamp("us")),
            "event_type": pa.array(
                rng.choice(["click", "purchase", "view"], n).tolist(), pa.string()
            ),
        }
    )


@pytest.fixture()
def events_ds(ray_session):
    import ray.data as rd

    return _events_table(), rd.from_arrow(_events_table())


def test_asof_join_shuffled(events_ds):
    import ray.data as rd

    from schemasaurus_ray.stages.temporal import asof_join_shuffled

    tbl, ds = events_ds
    right_tbl = tbl.filter(pa.compute.equal(tbl.column("event_type"), "purchase"))
    right = rd.from_arrow(right_tbl)
    out = asof_join_shuffled(
        ds, "user_id", "ts", ["event_id"], right, "user_id", "ts",
        out_col="last_purchase_ts", strict=True, num_buckets=3,
    ).sort_by("event_id")
    kl = np.asarray(tbl.column("user_id"), dtype=np.int64)
    tl = np.asarray(tbl.column("ts").cast(pa.int64()), dtype=np.int64)
    kr = np.asarray(right_tbl.column("user_id"), dtype=np.int64)
    tr = np.asarray(right_tbl.column("ts").cast(pa.int64()), dtype=np.int64)
    idx = asof_last_indices(kl, tl, kr, tr, strict=True)
    want = [int(tr[i]) if i >= 0 else None for i in idx]
    got = out.column("last_purchase_ts").cast(pa.int64()).to_pylist()
    assert got == want
    assert out.num_rows == tbl.num_rows


def test_range_count_shuffled(events_ds):
    from schemasaurus_ray.stages.temporal import range_count_shuffled

    tbl, ds = events_ds
    out = range_count_shuffled(
        ds, "user_id", "ts", ["event_id"], ds, "user_id", "ts",
        lo_offset=-1000, hi_offset=0, out_col="n_prev", num_buckets=3,
    ).sort_by("event_id")
    kl = np.asarray(tbl.column("user_id"), dtype=np.int64)
    tl = np.asarray(tbl.column("ts").cast(pa.int64()), dtype=np.int64)
    want = count_in_range(kl, tl - 1000, tl, kl, tl).tolist()
    assert out.column("n_prev").to_pylist() == want


def test_sessionize_shuffled(events_ds):
    from schemasaurus_ray.stages.temporal import sessionize_shuffled

    tbl, ds = events_ds
    out = sessionize_shuffled(ds, "user_id", "ts", "event_id", gap=500, num_buckets=3)
    out = out.sort_by([("user_id", "ascending"), ("session_no", "ascending")])
    keys = np.asarray(tbl.column("user_id"), dtype=np.int64)
    ts = np.asarray(tbl.column("ts").cast(pa.int64()), dtype=np.int64)
    tb = np.asarray(tbl.column("event_id"), dtype=np.int64)
    ords = session_ordinals(keys, ts, tb, 500)
    ref = pa.table(
        {"user_id": pa.array(keys), "session_no": pa.array(ords), "ts": tbl.column("ts")}
    )
    want = (
        ref.group_by(["user_id", "session_no"])
        .aggregate([([], "count_all"), ("ts", "min"), ("ts", "max")])
        .rename_columns(["user_id", "session_no", "n_events", "session_start", "session_end"])
        .sort_by([("user_id", "ascending"), ("session_no", "ascending")])
    )
    assert out.equals(want)
    # total events conserved across sessions
    assert sum(out.column("n_events").to_pylist()) == tbl.num_rows


def test_interarrival_shuffled_edges(ray_session, tmp_path):
    """interarrival_shuffled: single-event keys absent, ties ordered by
    tiebreak (gap 0 allowed), partials merged across shards."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.temporal import interarrival_shuffled

    s1 = pa.table(
        {
            "k": pa.array([1, 1, 2, 3], pa.int64()),
            "ts": pa.array([100, 250, 10, 7], pa.int64()),
            "tb": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    s2 = pa.table(
        {
            "k": pa.array([1, 2, 2], pa.int64()),
            "ts": pa.array([400, 10, 40], pa.int64()),
            "tb": pa.array([5, 0, 6], pa.int64()),
        }
    )
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(s1, p1)
    pq.write_table(s2, p2)
    out = interarrival_shuffled([p1, p2], "k", "ts", "tb", num_buckets=4).sort_by("k")
    # k=1: 100,250,400 -> gaps 150,150 ; k=2: ts 10(tb0),10(tb3),40 -> gaps 0,30
    # k=3: single event -> absent
    assert out.column("k").to_pylist() == [1, 2]
    assert out.column("n_gaps").to_pylist() == [2, 2]
    assert out.column("min_gap").to_pylist() == [150, 0]
    assert out.column("max_gap").to_pylist() == [150, 30]
    assert out.column("sum_gap").to_pylist() == [300, 30]


def test_interarrival_random_vs_duckdb(ray_session, tmp_path):
    """interarrival_shuffled on random shards (with ts ties) vs the LAG
    window oracle."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.temporal import interarrival_shuffled

    rng = np.random.default_rng(9)
    paths, parts = [], []
    eid = 0
    for s in range(3):
        n = int(rng.integers(40, 200))
        t = pa.table(
            {
                "k": pa.array(rng.integers(0, 25, size=n), pa.int64()),
                "ts": pa.array(rng.integers(0, 50, size=n), pa.int64()),  # many ties
                "eid": pa.array(np.arange(eid, eid + n), pa.int64()),
            }
        )
        eid += n
        p = str(tmp_path / f"i{s}.parquet")
        pq.write_table(t, p)
        paths.append(p)
        parts.append(t)
    got = interarrival_shuffled(paths, "k", "ts", "eid", num_buckets=4).sort_by("k")
    con = duckdb.connect()
    con.register("t", pa.concat_tables(parts))
    want = con.sql(
        """
        WITH d AS (
            SELECT k, ts - lag(ts) OVER (PARTITION BY k ORDER BY ts, eid) AS gap FROM t
        )
        SELECT k, COUNT(gap) n_gaps, CAST(MIN(gap) AS BIGINT) min_gap,
               CAST(MAX(gap) AS BIGINT) max_gap, CAST(SUM(gap) AS BIGINT) sum_gap
          FROM d WHERE gap IS NOT NULL GROUP BY k ORDER BY k
        """
    ).arrow()
    for c in ("k", "n_gaps", "min_gap", "max_gap", "sum_gap"):
        assert [int(x) for x in got.column(c).to_pylist()] == [
            int(x) for x in want.column(c).to_pylist()
        ], c


def test_funnel_shuffled_stalls_and_equal_ts(ray_session, tmp_path):
    """Funnel: stalls stop progression; an equal-ts next-stage event does
    NOT advance (strictly-after semantics); duplicates don't double-count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.temporal import funnel_shuffled

    rows = [
        # user 1: full funnel
        (1, 10, "a"), (1, 20, "b"), (1, 30, "c"),
        # user 2: b before a -> stalls after a
        (2, 10, "b"), (2, 20, "a"),
        # user 3: b at SAME ts as a -> no advance past a
        (3, 10, "a"), (3, 10, "b"),
        # user 4: a only, repeated
        (4, 5, "a"), (4, 6, "a"),
        # user 5: no funnel events at all (noise type)
        (5, 1, "x"),
        # user 6: a, c (skips b) -> stalls at a
        (6, 1, "a"), (6, 2, "c"),
        # user 7: a,b,c but c before b -> reaches a>b only
        (7, 1, "a"), (7, 3, "c"), (7, 5, "b"),
    ]
    t = pa.table(
        {
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "et": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(t.slice(0, 8), p1)
    pq.write_table(t.slice(8), p2)
    out = funnel_shuffled([p1, p2], "u", "ts", "et", ["a", "b", "c"], num_buckets=4)
    assert out.column("stage_idx").to_pylist() == [0, 1, 2]
    # stage a: users 1,2,3,4,6,7 = 6; stage a>b: users 1,7 = 2; a>b>c: user 1
    assert out.column("n_keys").to_pylist() == [6, 2, 1]


def test_cohort_retention_shuffled_dedup_and_offsets(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.temporal import cohort_retention_shuffled

    US = 86_400_000_000
    rows = [
        # user 1: days 0 (twice), 2
        (1, 0), (1, US // 2), (1, 2 * US),
        # user 2: days 1, 1, 3
        (2, US + 5), (2, US + 9), (2, 3 * US),
        # user 3: day 2 only
        (3, 2 * US + 1),
    ]
    t = pa.table(
        {
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    p = str(tmp_path / "e.parquet")
    pq.write_table(t, p)
    out = cohort_retention_shuffled([p], "u", "ts", num_buckets=3)
    got = list(
        zip(
            out.column("cohort_day").to_pylist(),
            out.column("day_offset").to_pylist(),
            out.column("n_keys").to_pylist(),
        )
    )
    assert got == [(0, 0, 1), (0, 2, 1), (1, 0, 1), (1, 2, 1), (2, 0, 1)]


def test_funnel_random_vs_duckdb(ray_session, tmp_path):
    """funnel_shuffled on random shards (dense ts ties, noise types) vs the
    chained min-after-join oracle."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.temporal import funnel_shuffled

    rng = np.random.default_rng(17)
    paths, parts = [], []
    types = np.array(["a", "b", "c", "x", "y"])
    for s in range(3):
        n = int(rng.integers(100, 400))
        t = pa.table(
            {
                "k": pa.array(rng.integers(0, 40, size=n), pa.int64()),
                "ts": pa.array(rng.integers(0, 30, size=n), pa.int64()),  # heavy ties
                "et": pa.array(types[rng.integers(0, 5, size=n)], pa.string()),
            }
        )
        p = str(tmp_path / f"f{s}.parquet")
        pq.write_table(t, p)
        paths.append(p)
        parts.append(t)
    got = funnel_shuffled(paths, "k", "ts", "et", ["a", "b", "c"], num_buckets=4)
    con = duckdb.connect()
    con.register("t", pa.concat_tables(parts))
    want = con.sql(
        """
        WITH s1 AS (SELECT k, min(ts) t1 FROM t WHERE et='a' GROUP BY 1),
        s2 AS (SELECT e.k, min(e.ts) t2 FROM t e JOIN s1 ON e.k=s1.k AND e.ts > s1.t1
                WHERE e.et='b' GROUP BY 1),
        s3 AS (SELECT e.k, min(e.ts) t3 FROM t e JOIN s2 ON e.k=s2.k AND e.ts > s2.t2
                WHERE e.et='c' GROUP BY 1)
        SELECT (SELECT count(*) FROM s1), (SELECT count(*) FROM s2), (SELECT count(*) FROM s3)
        """
    ).fetchone()
    assert got.column("n_keys").to_pylist() == list(want)


def test_cohort_retention_random_vs_duckdb(ray_session, tmp_path):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.temporal import cohort_retention_shuffled

    US = 86_400_000_000
    rng = np.random.default_rng(23)
    paths, parts = [], []
    for s in range(3):
        n = int(rng.integers(100, 300))
        t = pa.table(
            {
                "k": pa.array(rng.integers(0, 30, size=n), pa.int64()),
                "ts": pa.array(rng.integers(0, 10 * US, size=n), pa.int64()),
            }
        )
        p = str(tmp_path / f"c{s}.parquet")
        pq.write_table(t, p)
        paths.append(p)
        parts.append(t)
    got = cohort_retention_shuffled(paths, "k", "ts", num_buckets=4)
    con = duckdb.connect()
    con.register("t", pa.concat_tables(parts))
    want = con.sql(
        f"""
        WITH f AS (SELECT k, min(ts) // {US} AS d0 FROM t GROUP BY 1),
        a AS (SELECT DISTINCT k, ts // {US} AS d FROM t)
        SELECT f.d0 AS cohort_day, a.d - f.d0 AS day_offset, count(*) AS n_keys
          FROM a JOIN f USING (k) GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).arrow()
    for c in ("cohort_day", "day_offset", "n_keys"):
        assert [int(x) for x in got.column(c).to_pylist()] == [
            int(x) for x in want.column(c).to_pylist()
        ], c


def test_rolling_minmax_kernel_basic():
    """Window=3 trailing min/max with segment boundaries, ties and an
    all-NaN (null) window."""
    from schemasaurus_ray.stages.temporal import rolling_minmax

    k = np.array([1, 1, 1, 1, 2, 2], dtype=np.int64)
    t = np.array([10, 20, 30, 40, 10, 20], dtype=np.int64)
    tb = np.arange(6, dtype=np.int64)
    v = np.array([5.0, 1.0, 9.0, 2.0, np.nan, 7.0])
    rmin, rmax, n_in = rolling_minmax(k, t, tb, v, window=3)
    assert rmin[:4].tolist() == [5.0, 1.0, 1.0, 1.0] and rmin[5] == 7.0
    assert np.isnan(rmin[4]) and np.isnan(rmax[4])  # all-null window
    assert rmax[:4].tolist() == [5.0, 5.0, 9.0, 9.0]
    assert n_in.tolist() == [1, 2, 3, 3, 1, 2]


def test_rolling_minmax_random_vs_duckdb(ray_session, tmp_path):
    """rolling_minmax_shuffled on random shards (ts ties, nulls) vs the
    ROWS BETWEEN window oracle."""
    import duckdb
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.temporal import rolling_minmax_shuffled

    rng = np.random.default_rng(31)
    paths, parts = [], []
    eid = 0
    for s in range(3):
        n = int(rng.integers(40, 200))
        vals = np.round(rng.normal(size=n), 3)
        mask = rng.random(n) < 0.15  # nulls exercise the NaN path
        t = pa.table(
            {
                "k": pa.array(rng.integers(0, 25, size=n), pa.int64()),
                "ts": pa.array(rng.integers(0, 50, size=n), pa.int64()),
                "eid": pa.array(np.arange(eid, eid + n), pa.int64()),
                "v": pa.array(vals, pa.float64(), mask=mask),
            }
        )
        eid += n
        p = str(tmp_path / f"r{s}.parquet")
        pq.write_table(t, p)
        paths.append(p)
        parts.append(t)
    got = rolling_minmax_shuffled(paths, "k", "ts", "eid", "v", window=4, num_buckets=4)
    got = got.sort_by("eid")
    con = duckdb.connect()
    con.register("t", pa.concat_tables(parts))
    want = con.sql(
        """
        SELECT eid, MIN(v) OVER w AS roll_min, MAX(v) OVER w AS roll_max,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_in_window
          FROM t
        WINDOW w AS (PARTITION BY k ORDER BY ts, eid
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         ORDER BY eid
        """
    ).arrow()
    assert got.column("eid").to_pylist() == want.column("eid").to_pylist()
    assert got.column("n_in_window").to_pylist() == want.column("n_in_window").to_pylist()
    for c in ("roll_min", "roll_max"):
        assert got.column(c).to_pylist() == want.column(c).to_pylist(), c


def test_late_events_shuffled_vs_duckdb(ray_session, tmp_path):
    """Distributed prefix-scan watermark on interleaved shards (seq values
    deliberately split across files) vs the running-max window oracle,
    heavy out-of-orderness."""
    import duckdb
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.temporal import late_events_shuffled

    rng = np.random.default_rng(17)
    n = 900
    seq = rng.permutation(5000)[:n].astype(np.int64)
    t = (np.sort(rng.integers(0, 10**9, size=n)) - rng.integers(0, 10**8, size=n)).astype(
        np.int64
    )  # broadly increasing with heavy jitter
    tbl = pa.table({"seq": pa.array(seq, pa.int64()), "t": pa.array(t, pa.int64())})
    paths = []
    for s in range(4):  # interleave: shard s takes rows s, s+4, s+8, ...
        part = tbl.take(pa.array(np.arange(s, n, 4), pa.int64()))
        p = str(tmp_path / f"l{s}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    W = 50_000_000
    got = late_events_shuffled(paths, "seq", "t", watermark_us=W, num_ranges=5)
    got = got.sort_by("seq")
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.sql(
        f"""
        WITH w AS (SELECT seq, t, MAX(t) OVER (ORDER BY seq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) wm FROM t)
        SELECT seq, t, CAST(wm - t AS BIGINT) AS late_us
          FROM w WHERE t < wm - {W} ORDER BY seq
        """
    ).arrow()
    assert got.num_rows == want.num_rows and got.num_rows > 0
    for c in ("seq", "t", "late_us"):
        assert got.column(c).to_pylist() == want.column(c).to_pylist(), c


def test_funnel_window_random_vs_duckdb(ray_session, tmp_path):
    """Windowed funnel (attribution window between consecutive stages) on
    random shards vs the bounded-join oracle; tight window so it actually
    discriminates."""
    import duckdb
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.temporal import funnel_shuffled

    rng = np.random.default_rng(23)
    paths, parts = [], []
    types = np.array(["a", "b", "c", "x"], dtype=object)
    for s in range(3):
        n = int(rng.integers(80, 250))
        t = pa.table(
            {
                "k": pa.array(rng.integers(0, 40, size=n), pa.int64()),
                "ts": pa.array(rng.integers(0, 1000, size=n), pa.int64()),
                "ty": pa.array(types[rng.integers(0, 4, size=n)].tolist(), pa.string()),
            }
        )
        p = str(tmp_path / f"fw{s}.parquet")
        pq.write_table(t, p)
        paths.append(p)
        parts.append(t)
    W = 60
    got = funnel_shuffled(paths, "k", "ts", "ty", ["a", "b", "c"], num_buckets=4, max_gap_us=W)
    con = duckdb.connect()
    con.register("t", pa.concat_tables(parts))
    want = con.sql(
        f"""
        WITH s1 AS (SELECT k, min(ts) t1 FROM t WHERE ty='a' GROUP BY 1),
        s2 AS (SELECT e.k, min(e.ts) t2 FROM t e JOIN s1 ON e.k=s1.k
                 AND e.ts > s1.t1 AND e.ts <= s1.t1 + {W}
                WHERE e.ty='b' GROUP BY 1),
        s3 AS (SELECT e.k, min(e.ts) t3 FROM t e JOIN s2 ON e.k=s2.k
                 AND e.ts > s2.t2 AND e.ts <= s2.t2 + {W}
                WHERE e.ty='c' GROUP BY 1)
        SELECT * FROM (
          SELECT 0 i, count(*) n FROM s1
          UNION ALL SELECT 1, count(*) FROM s2
          UNION ALL SELECT 2, count(*) FROM s3) ORDER BY i
        """
    ).fetchall()
    got_counts = dict(zip(got.column("stage_idx").to_pylist(), got.column("n_keys").to_pylist()))
    for i, n in want:
        assert got_counts[i] == n, (i, got_counts, want)
    # windowed counts must be <= unwindowed at stages > 0
    plain = funnel_shuffled(paths, "k", "ts", "ty", ["a", "b", "c"], num_buckets=4)
    pc_counts = dict(zip(plain.column("stage_idx").to_pylist(), plain.column("n_keys").to_pylist()))
    assert got_counts[0] == pc_counts[0]
    assert got_counts[1] <= pc_counts[1] and got_counts[2] <= pc_counts[2]


def test_ontime_window_counts_complement(ray_session, tmp_path):
    """Watermark-gated window counts + late rows = total rows, and the
    counts match a brute-force recomputation."""
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.temporal import late_events_shuffled

    rng = np.random.default_rng(29)
    n = 600
    seq = np.arange(n, dtype=np.int64)
    t = (np.sort(rng.integers(0, 10**9, size=n)) - rng.integers(0, 10**8, size=n)).astype(
        np.int64
    )
    tbl = pa.table({"seq": pa.array(seq), "t": pa.array(t)})
    paths = []
    for s in range(3):
        part = tbl.take(pa.array(np.arange(s, n, 3), pa.int64()))
        p = str(tmp_path / f"ow{s}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    W, WIN = 40_000_000, 10**8
    late = late_events_shuffled(paths, "seq", "t", watermark_us=W, num_ranges=4)
    wins = late_events_shuffled(
        paths, "seq", "t", watermark_us=W, num_ranges=4, ontime_window_us=WIN
    )
    assert int(pa.compute.sum(wins.column("n")).as_py()) + late.num_rows == n
    # brute force
    wm = np.r_[np.iinfo(np.int64).min, np.maximum.accumulate(t)[:-1]]
    ontime = ~(wm > t + W)
    ot = t[ontime]
    # DuckDB // truncates toward zero (the engine matches it exactly) —
    # this synthetic stream has negative times, unlike epoch data
    ids, cnts = np.unique(np.where(ot >= 0, ot // WIN, -((-ot) // WIN)), return_counts=True)
    got = dict(zip(wins.column("window_id").to_pylist(), wins.column("n").to_pylist()))
    assert got == {int(i): int(c) for i, c in zip(ids, cnts)}


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 30), st.integers(0, 3)),
        max_size=40,
    ),
    st.integers(1, 6),
)
def test_rolling_minmax_matches_brute(rows, window):
    """Hypothesis: trailing-window min/max ≡ a per-row brute force over
    random (key, ts, value-class) rows with heavy ties."""
    from schemasaurus_ray.stages.temporal import rolling_minmax

    keys = ARR([k for k, _, _ in rows])
    ts = ARR([t for _, t, _ in rows])
    vals = np.asarray([float(v) for _, _, v in rows])
    tb = ARR(range(len(rows)))
    rmin, rmax, n_in = rolling_minmax(keys, ts, tb, vals, window)
    order = sorted(range(len(rows)), key=lambda i: (keys[i], ts[i], tb[i]))
    pos_in_order = {i: p for p, i in enumerate(order)}
    for i in range(len(rows)):
        p = pos_in_order[i]
        prior = [
            order[j]
            for j in range(max(0, p - window + 1), p + 1)
            if keys[order[j]] == keys[i]
        ]
        # same key is guaranteed within the window slice only while the
        # segment is contiguous — keys are sorted so it always is
        w = [vals[j] for j in prior]
        assert n_in[i] == len(prior)
        assert rmin[i] == min(w) and rmax[i] == max(w), (i, rows, window)


def test_transition_counts_random_vs_duckdb(ray_session, tmp_path):
    """transition_counts_shuffled on random shards — MANY ts ties, so the
    event-id tiebreak path is actually exercised (the sf fixtures have
    near-unique timestamps) — vs the lead() window oracle."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.temporal import transition_counts_shuffled

    rng = np.random.default_rng(11)
    types = ["view", "cart", "purchase"]
    paths = []
    eid = 0
    for s in range(3):
        n = int(rng.integers(50, 250))
        t = pa.table(
            {
                "k": pa.array(rng.integers(0, 20, size=n), pa.int64()),
                "ts": pa.array(rng.integers(0, 30, size=n), pa.int64()),  # heavy ties
                "eid": pa.array(np.arange(eid, eid + n), pa.int64()),
                "et": pa.array([types[i] for i in rng.integers(0, 3, size=n)], pa.string()),
            }
        )
        eid += n
        p = str(tmp_path / f"t{s}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    got = transition_counts_shuffled(paths, "k", "ts", "eid", "et", num_buckets=4).sort_by(
        [("prev_type", "ascending"), ("next_type", "ascending")]
    )
    con = duckdb.connect()
    files = ",".join(f"'{p}'" for p in paths)
    exp = con.sql(
        f"""
        WITH seq AS (
            SELECT k, et,
                   lead(et) OVER (PARTITION BY k ORDER BY ts, eid) AS nxt
              FROM read_parquet([{files}])
        )
        SELECT et AS prev_type, nxt AS next_type, count(*) AS n
          FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).arrow()
    assert got.column("prev_type").to_pylist() == exp.column("prev_type").to_pylist()
    assert got.column("next_type").to_pylist() == exp.column("next_type").to_pylist()
    assert got.column("n").to_pylist() == exp.column("n").to_pylist()

    # single-event keys and an empty source produce no transitions
    lone = pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([0, 0, 0], pa.int64()),
            "eid": pa.array([0, 1, 2], pa.int64()),
            "et": pa.array(["view"] * 3, pa.string()),
        }
    )
    p = str(tmp_path / "lone.parquet")
    pq.write_table(lone, p)
    assert transition_counts_shuffled([p], "k", "ts", "eid", "et", num_buckets=2).num_rows == 0


def test_path_ngram_counts_random_vs_duckdb(ray_session, tmp_path):
    """path_ngram_counts_shuffled (n=3 and n=4) on random shards with
    HEAVY ts ties vs the lead(type, i) window oracle — the same adversarial
    regime the transition-matrix test pins, one window order up."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.temporal import path_ngram_counts_shuffled

    rng = np.random.default_rng(23)
    types = ["view", "cart", "purchase", "refund"]
    paths = []
    eid = 0
    for s in range(3):
        n = int(rng.integers(60, 220))
        t = pa.table(
            {
                "k": pa.array(rng.integers(0, 15, size=n), pa.int64()),
                "ts": pa.array(rng.integers(0, 25, size=n), pa.int64()),  # heavy ties
                "eid": pa.array(np.arange(eid, eid + n), pa.int64()),
                "et": pa.array([types[i] for i in rng.integers(0, 4, size=n)], pa.string()),
            }
        )
        eid += n
        p = str(tmp_path / f"p{s}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    con = duckdb.connect()
    files = ",".join(f"'{p}'" for p in paths)
    for order in (3, 4):
        got = path_ngram_counts_shuffled(
            paths, "k", "ts", "eid", "et", n=order, num_buckets=4
        )
        names = [f"t{i}" for i in range(order)]
        got = got.sort_by([(c, "ascending") for c in names])
        leads = ",\n".join(
            f"lead(et, {i}) OVER (PARTITION BY k ORDER BY ts, eid) AS t{i}"
            for i in range(1, order)
        )
        exp = con.sql(
            f"""
            WITH seq AS (
                SELECT et AS t0, {leads}
                  FROM read_parquet([{files}])
            )
            SELECT {", ".join(names)}, count(*) AS n
              FROM seq WHERE t{order - 1} IS NOT NULL
             GROUP BY ALL ORDER BY {", ".join(names)}
            """
        ).arrow()
        for c in names + ["n"]:
            assert got.column(c).to_pylist() == exp.column(c).to_pylist(), (order, c)


def test_path_ngram_counts_edges(ray_session, tmp_path):
    """Keys shorter than the window emit nothing; n<2 raises; a window
    never crosses two keys even when their rows interleave in ts."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from schemasaurus_ray.stages.temporal import path_ngram_counts_shuffled

    t = pa.table(
        {
            "k": pa.array([1, 2, 1, 2, 3], pa.int64()),
            "ts": pa.array([0, 0, 1, 1, 2], pa.int64()),
            "eid": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "et": pa.array(["a", "a", "b", "b", "c"], pa.string()),
        }
    )
    p = str(tmp_path / "short.parquet")
    pq.write_table(t, p)
    # every key has < 3 events: no trigram may appear (cross-key windows
    # would wrongly produce one if the mask used adjacency, not key runs)
    assert path_ngram_counts_shuffled([p], "k", "ts", "eid", "et", n=3).num_rows == 0
    out = path_ngram_counts_shuffled([p], "k", "ts", "eid", "et", n=2, num_buckets=2)
    assert sorted(
        zip(
            out.column("t0").to_pylist(),
            out.column("t1").to_pylist(),
            out.column("n").to_pylist(),
        )
    ) == [("a", "b", 2)]
    with _pytest.raises(ValueError):
        path_ngram_counts_shuffled([p], "k", "ts", "eid", "et", n=1)
