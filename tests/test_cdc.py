"""stages/cdc.snapshot_diff — keyed CDC row diff between two snapshots."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from schemasaurus_ray.stages.cdc import row_content_hash, snapshot_diff


def _write(tmp_path, name, tbl, shards=2):
    paths = []
    per = -(-tbl.num_rows // shards)
    for s in range(shards):
        p = str(tmp_path / f"{name}-{s}.parquet")
        pq.write_table(tbl.slice(s * per, per), p)
        paths.append(p)
    return paths


def test_snapshot_diff_added_removed_changed(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    n = 5000
    keys = np.arange(n, dtype=np.int64)
    vals = rng.integers(0, 1000, n).astype(np.int64)
    names = pa.array([f"n{i%97}" for i in range(n)], pa.string())
    old = pa.table({"k": pa.array(keys), "v": pa.array(vals), "s": names})
    # new: drop k%11==0, change v for k%13==0 (not dropped), add 100 fresh keys
    keep = keys % 11 != 0
    nv = vals.copy()
    nv[keys % 13 == 0] += 1
    new = pa.table({"k": pa.array(keys[keep]), "v": pa.array(nv[keep]), "s": names.filter(pa.array(keep))})
    fresh = pa.table(
        {
            "k": pa.array(np.arange(n, n + 100, dtype=np.int64)),
            "v": pa.array(np.zeros(100, np.int64)),
            "s": pa.array(["zz"] * 100, pa.string()),
        }
    )
    new = pa.concat_tables([new, fresh])
    out = snapshot_diff(
        _write(tmp_path, "old", old, 3),
        _write(tmp_path, "new", new, 2),
        key_cols=["k"],
        value_cols=["v", "s"],
    )
    got = {}
    for k, c in zip(out.column("k").to_pylist(), out.column("change").to_pylist()):
        got[k] = c
    expect_removed = set(keys[~keep].tolist())
    expect_changed = set(keys[(keys % 13 == 0) & keep].tolist())
    expect_added = set(range(n, n + 100))
    assert {k for k, c in got.items() if c == "removed"} == expect_removed
    assert {k for k, c in got.items() if c == "changed"} == expect_changed
    assert {k for k, c in got.items() if c == "added"} == expect_added
    assert len(got) == len(expect_removed) + len(expect_changed) + len(expect_added)


def test_snapshot_diff_identical_and_multiset(ray_session, tmp_path):
    # identical snapshots -> empty diff, even with duplicate keys
    t = pa.table(
        {
            "k": pa.array([1, 1, 2, 3], pa.int64()),
            "v": pa.array([10, 20, 30, 40], pa.int64()),
        }
    )
    out = snapshot_diff(
        _write(tmp_path, "a", t, 2), _write(tmp_path, "b", t, 1), ["k"], ["v"]
    )
    assert out.num_rows == 0
    # duplicate-key MULTISET change: same key set, one copy's value differs
    t2 = pa.table(
        {
            "k": pa.array([1, 1, 2, 3], pa.int64()),
            "v": pa.array([10, 21, 30, 40], pa.int64()),
        }
    )
    out2 = snapshot_diff(
        _write(tmp_path, "c", t, 1), _write(tmp_path, "d", t2, 2), ["k"], ["v"]
    )
    assert sorted(zip(out2.column("k").to_pylist(), out2.column("change").to_pylist())) == [
        (1, "changed")
    ]
    # count change at same key (one copy dropped) is 'changed' too
    t3 = pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": pa.array([10, 30, 40], pa.int64())})
    out3 = snapshot_diff(
        _write(tmp_path, "e", t, 1), _write(tmp_path, "f", t3, 1), ["k"], ["v"]
    )
    assert sorted(zip(out3.column("k").to_pylist(), out3.column("change").to_pylist())) == [
        (1, "changed")
    ]


def test_snapshot_diff_composite_key_and_floats(ray_session, tmp_path):
    old = pa.table(
        {
            "a": pa.array([1, 1, 2], pa.int64()),
            "b": pa.array(["x", "y", "x"], pa.string()),
            "v": pa.array([1.5, 2.5, 3.5], pa.float64()),
        }
    )
    new = pa.table(
        {
            "a": pa.array([1, 1, 2], pa.int64()),
            "b": pa.array(["x", "y", "x"], pa.string()),
            "v": pa.array([1.5, 2.5, 3.75], pa.float64()),
        }
    )
    out = snapshot_diff(
        _write(tmp_path, "o", old, 1), _write(tmp_path, "n", new, 1), ["a", "b"], ["v"]
    )
    assert out.column_names == ["a", "b", "change"]
    assert out.to_pylist() == [{"a": 2, "b": "x", "change": "changed"}]


def test_row_content_hash_column_order_and_nulls():
    t = pa.table(
        {
            "x": pa.array([1, None, 3], pa.int64()),
            "y": pa.array(["a", "b", None], pa.string()),
        }
    )
    h1 = row_content_hash(t, ["x", "y"])
    h2 = row_content_hash(t, ["y", "x"])
    assert len(set(h1.tolist())) == 3
    assert not np.array_equal(h1, h2)  # order is part of the signature
    # stability: same table twice
    assert np.array_equal(h1, row_content_hash(t, ["x", "y"]))


def test_snapshot_diff_random_vs_duckdb(ray_session, tmp_path):
    """snapshot_diff on random keyed tables (unique keys per side, string +
    float values, disjoint-ish key ranges) vs the FULL JOIN oracle."""
    import duckdb
    import numpy as np
    import pyarrow.parquet as pq

    rng = np.random.default_rng(31)

    def mk(keys):
        return pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "v": pa.array(rng.integers(0, 4, size=len(keys)), pa.int64()),
                "s": pa.array([f"s{int(x)}" for x in rng.integers(0, 3, size=len(keys))], pa.string()),
            }
        )

    old_keys = rng.choice(2000, size=800, replace=False).astype(np.int64)
    new_keys = rng.choice(2000, size=800, replace=False).astype(np.int64)
    old, new = mk(old_keys), mk(new_keys)
    po, pn = str(tmp_path / "o.parquet"), str(tmp_path / "n.parquet")
    pq.write_table(old, po)
    pq.write_table(new, pn)
    got = snapshot_diff([po], [pn], ["k"], ["v", "s"], num_buckets=4).sort_by("k")
    con = duckdb.connect()
    con.register("o", old)
    con.register("n", new)
    want = con.sql(
        """
        SELECT k, change FROM (
          SELECT COALESCE(o.k, n.k) AS k,
                 CASE WHEN o.k IS NULL THEN 'added'
                      WHEN n.k IS NULL THEN 'removed'
                      WHEN o.v <> n.v OR o.s <> n.s THEN 'changed' END AS change
            FROM o FULL JOIN n ON o.k = n.k
        ) WHERE change IS NOT NULL ORDER BY k
        """
    ).arrow()
    assert got.column("k").to_pylist() == want.column("k").to_pylist()
    assert got.column("change").to_pylist() == want.column("change").to_pylist()
