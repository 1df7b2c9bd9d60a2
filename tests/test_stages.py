"""Stage-level tests: normalizer stage, uniqueness (incl. composite keys and
the duplicate_rows view), referential shuffle variant."""

import pyarrow as pa
import pytest

from schemasaurus_ray.stages.normalize import NormalizeStage
from schemasaurus_ray.stages.referential import orphan_rows
from schemasaurus_ray.stages.unique import duplicate_keys, duplicate_rows


def test_normalize_stage_defaults_casts_projection():
    batch = pa.table(
        {
            "i": pa.array(["10", "3", None], pa.string()),
            "b": pa.array(["false", "on", "x"], pa.string()),
            "n": pa.array([1, 2, None], pa.int64()),
            "extra": pa.array([1, 2, 3], pa.int64()),
        }
    )
    spec = {
        "columns": {
            "i": {"type": "integer", "default": 0},
            "b": {"type": "boolean"},
            "n": {"type": "number", "default": 1.5},
            "s": {"type": "string", "default": "missing"},
        }
    }
    out = NormalizeStage(spec)(batch)
    assert out.column_names == ["i", "b", "n", "s"]  # extra dropped, s added
    assert out.column("i").to_pylist() == [10, 3, 0]
    assert out.column("b").to_pylist() == [False, True, True]
    assert out.column("n").to_pylist() == [1.0, 2.0, 1.5]
    assert out.column("s").to_pylist() == ["missing"] * 3


def test_normalize_float_to_int():
    batch = pa.table({"x": pa.array([1.9, 2.0, None], pa.float64())})
    out = NormalizeStage({"columns": {"x": {"type": "integer"}}})(batch)
    # parseInt-style truncation toward -inf via floor
    assert out.column("x").to_pylist() == [1, 2, None]


def test_duplicate_keys_composite(ray_session):
    import ray.data as rd

    tbl = pa.table(
        {
            "a": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "b": pa.array(["x", "x", "y", "z", "x"], pa.string()),
        }
    )
    dups = duplicate_keys(rd.from_arrow(tbl), ["a", "b"])
    out = pa.concat_tables(list(dups.iter_batches(batch_format="pyarrow", batch_size=None)))
    assert out.num_rows == 1
    assert out.column("a").to_pylist() == [1]
    assert out.column("cnt").to_pylist() == [2]


def test_duplicate_keys_cross_block(ray_session):
    """Duplicates that never share a block (one occurrence per block) must
    still sum across the bucket shuffle — the map-side precount is a
    per-BLOCK combiner, so the cross-block merge is where the raw-shuffle
    routing (round 5) could silently undercount."""
    import ray.data as rd

    # key "hot" once in each of 8 blocks; "pair" in exactly two blocks;
    # every other key unique corpus-wide
    blocks = [
        pa.table(
            {
                "k": pa.array(
                    ["hot"] + (["pair"] if b in (2, 5) else []) + [f"u{b}-{i}" for i in range(20)],
                    pa.string(),
                )
            }
        )
        for b in range(8)
    ]
    ds = rd.from_arrow(blocks)
    out = pa.concat_tables(
        list(duplicate_keys(ds, ["k"]).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    got = dict(zip(out.column("k").to_pylist(), out.column("cnt").to_pylist()))
    assert got == {"hot": 8, "pair": 2}


def test_duplicate_rows_view(ray_session):
    import ray.data as rd

    tbl = pa.table({"k": pa.array(["a", "b", "a", "c", "a"], pa.string())})
    rows = duplicate_rows(rd.from_arrow(tbl), ["k"])
    out = pa.concat_tables(list(rows.iter_batches(batch_format="pyarrow", batch_size=None)))
    assert out.num_rows == 3  # every occurrence of the duplicated key
    assert set(out.column("row_ref").to_pylist()) == {"a"}
    assert set(out.column("code").to_pylist()) == {"unique"}


def test_orphan_rows_shuffle_matches_broadcast(ray_session):
    import ray.data as rd

    left = pa.table({"fk": pa.array([1, 2, 3, 4, 5, None], pa.int64())})
    right = pa.table({"pk": pa.array([1, 2, 3], pa.int64())})
    lds, rds = rd.from_arrow(left), rd.from_arrow(right)

    def collect(ds):
        t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow", batch_size=None)))
        return sorted(t.column("row_ref").to_pylist())

    bc = collect(orphan_rows(lds, "fk", rds, "pk", method="broadcast"))
    sh = collect(orphan_rows(lds, "fk", rds, "pk", method="shuffle"))
    assert bc == ["4", "5"]
    assert sh == ["4", "5"]


def test_grouped_topk_table_kernel():
    import numpy as np
    import pyarrow as pa

    from schemasaurus_ray.stages.stats import grouped_topk_table

    t = pa.table(
        {
            "g": pa.array(["a", "b", "a", "a", None, "b", "a"]),
            "v": pa.array([5, 9, 7, 7, 3, 1, 2], pa.int64()),
            "id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        }
    )
    out = grouped_topk_table(t, "g", "v", "id", 2)
    rows = sorted(zip(*[out.column(c).to_pylist() for c in ("g", "v", "id", "rnk")]), key=str)
    # group a: v=7 ids 3,4 (tie -> id asc); group b: 9 then 1; null group kept
    assert (("a", 7, 3, 1) in rows) and (("a", 7, 4, 2) in rows)
    assert (("b", 9, 2, 1) in rows) and (("b", 1, 6, 2) in rows)
    assert ((None, 3, 5, 1) in rows)
    assert len(rows) == 5
    # two-phase (per-slice local winners -> final) == single pass
    whole = grouped_topk_table(t, "g", "v", "id", 2)
    cands = pa.concat_tables(
        [grouped_topk_table(t.slice(o, 3), "g", "v", "id", 2).drop_columns(["rnk"]) for o in (0, 3, 6)]
    )
    two = grouped_topk_table(cands, "g", "v", "id", 2)
    key = lambda tb: sorted(zip(*[tb.column(c).to_pylist() for c in ("g", "v", "id", "rnk")]), key=str)
    assert key(two) == key(whole)
    # empty input passes through
    assert len(grouped_topk_table(t.slice(0, 0), "g", "v", "id", 2)) == 0


def test_bloom_filter_basics():
    import numpy as np

    from schemasaurus_ray.state.bloom import BloomFilter

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    bf = BloomFilter.sized_for(len(keys), fp_rate=0.01)
    bf.add_hashes(keys)
    # NO false negatives, ever
    assert bf.contains_hashes(keys).all()
    # fp rate in the right ballpark (generous 5x bound)
    probe = rng.integers(0, 2**63, size=20000, dtype=np.uint64)
    fresh = probe[~np.isin(probe, keys)]
    fp = bf.contains_hashes(fresh).mean()
    assert fp < 0.05, fp
    # merge == build-once
    a = BloomFilter(bf.m, bf.k)
    b = BloomFilter(bf.m, bf.k)
    a.add_hashes(keys[:2500])
    b.add_hashes(keys[2500:])
    a.merge(b)
    assert (a.words == bf.words).all()
    # serialization round-trip
    rt = BloomFilter.from_bytes(bf.to_bytes())
    assert rt.m == bf.m and rt.k == bf.k and (rt.words == bf.words).all()


def test_orphan_rows_bloom_matches_broadcast(ray_session):
    import ray.data as rd

    from schemasaurus_ray.stages.referential import orphan_rows

    # duplicate orphan keys + nulls: per-occurrence semantics must hold
    left = rd.from_arrow(
        pa.table({"x": pa.array([1, 2, 2, 3, 7, 7, 7, None, 4], pa.int64())})
    )
    ref = rd.from_arrow(pa.table({"r": pa.array([1, 3, 4, 5], pa.int64())}))

    def rows(ds):
        t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow", batch_size=None)))
        return sorted(zip(t.column("row_ref").to_pylist(), t.column("code").to_pylist()))

    want = rows(orphan_rows(left, "x", ref, "r", method="broadcast"))
    got = rows(orphan_rows(left, "x", ref, "r", method="bloom"))
    assert got == want and len(want) == 5  # 2,2,7,7,7
    # approx mode reports a SUBSET of true orphans (definite ones only)
    approx = rows(orphan_rows(left, "x", ref, "r", method="bloom_approx"))
    assert set(approx) <= set(want)
    # empty ref side: everything non-null is a definite orphan
    empty_ref = rd.from_arrow(pa.table({"r": pa.array([], pa.int64())}))
    got = rows(orphan_rows(left, "x", empty_ref, "r", method="bloom"))
    assert len(got) == 8


def test_grouped_topk_property_vs_bruteforce():
    import numpy as np
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from schemasaurus_ray.stages.stats import grouped_topk_table

    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(1, 80),
        k=st.integers(1, 5),
        ngroups=st.integers(1, 6),
        seed=st.integers(0, 10**6),
    )
    def check(n, k, ngroups, seed):
        rng = np.random.default_rng(seed)
        g = rng.integers(0, ngroups, size=n)
        v = rng.integers(-5, 5, size=n)  # heavy ties
        t = pa.table(
            {
                "g": pa.array([f"g{x}" for x in g]),
                "v": pa.array(v, pa.int64()),
                "id": pa.array(np.arange(n), pa.int64()),
            }
        )
        out = grouped_topk_table(t, "g", "v", "id", k)
        got = sorted(zip(*[out.column(c).to_pylist() for c in ("g", "v", "id", "rnk")]))
        want = []
        for grp in sorted(set(f"g{x}" for x in g)):
            rows = sorted(
                [(int(vv), int(i)) for gg, vv, i in zip(g, v, range(n)) if f"g{gg}" == grp],
                key=lambda r: (-r[0], r[1]),
            )[:k]
            want.extend((grp, vv, i, r + 1) for r, (vv, i) in enumerate(rows))
        assert got == sorted(want)

    check()


def test_bloom_no_false_negatives_property():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from schemasaurus_ray.state.bloom import BloomFilter

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(1, 3000),
        fp=st.sampled_from([0.001, 0.01, 0.1]),
        seed=st.integers(0, 10**6),
        splits=st.integers(1, 5),
    )
    def check(n, fp, seed, splits):
        rng = np.random.default_rng(seed)
        keys = rng.integers(0, 2**64, size=n, dtype=np.uint64)
        bf = BloomFilter.sized_for(n, fp)
        merged = BloomFilter(bf.m, bf.k)
        for part in np.array_split(keys, splits):  # mergeable partials
            p = BloomFilter(bf.m, bf.k)
            p.add_hashes(part)
            merged.merge(p)
        assert merged.contains_hashes(keys).all()

    check()


def test_grouped_median_mad_vs_duckdb():
    """(median, MAD) from a count table vs DuckDB's quantile_disc on the
    expanded multiset, random weighted values per group."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from schemasaurus_ray.stages.stats import grouped_median_mad_from_count_table

    rng = np.random.default_rng(11)
    rows_g, rows_v = [], []
    for g in ("a", "b", "c"):
        vals = np.round(rng.normal(size=rng.integers(5, 40)) * 10, 1)
        reps = rng.integers(1, 4, size=len(vals))
        for v, r in zip(vals, reps):
            rows_g += [g] * int(r)
            rows_v += [float(v)] * int(r)
    tbl = pa.table({"g": pa.array(rows_g), "v": pa.array(rows_v, pa.float64())})
    counts = (
        tbl.group_by(["g", "v"]).aggregate([([], "count_all")]).rename_columns(["g", "v", "cnt"])
    )
    got = grouped_median_mad_from_count_table(counts, "g", "v")
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.sql(
        """
        WITH med AS (SELECT g, quantile_disc(v, 0.5) m FROM t GROUP BY 1)
        SELECT med.g, med.m,
               (SELECT quantile_disc(abs(t.v - med.m), 0.5) FROM t WHERE t.g = med.g) md
          FROM med ORDER BY med.g
        """
    ).fetchall()
    assert {g: (m, md) for g, m, md in want} == got
