"""Distributed exact NTILE (stages/rank.py): closed-form bucket formula vs
SQL, rank_start decomposition, and the two-shuffle operator vs DuckDB on
random shards with heavy value ties."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from schemasaurus_ray.stages.rank import (
    ntile_bucket,
    ntile_assign_shuffled,
    rank_starts_from_count_table,
)


def test_ntile_bucket_formula_vs_duckdb():
    """The closed-form bucket for every (n, k) on a grid equals DuckDB's
    NTILE over a 1..n sequence."""
    import duckdb

    con = duckdb.connect()
    for n in (1, 2, 3, 7, 10, 11, 23):
        for k in (1, 2, 3, 4, 10, 25):
            want = con.sql(
                f"SELECT NTILE({k}) OVER (ORDER BY x) FROM range({n}) t(x)"
            ).fetchnumpy()
            got = ntile_bucket(np.arange(n), np.full(n, n), k)
            assert got.tolist() == list(next(iter(want.values()))), (n, k)


def test_rank_starts_from_count_table():
    counts = pa.table(
        {
            "g": ["a", "a", "a", "b"],
            "v": [10, 5, 7, 5],
            "cnt": [2, 3, 1, 4],
        }
    )
    ugroups, gc, v, rs, ng = rank_starts_from_count_table(counts, "g", "v")
    assert ugroups == ["a", "b"]
    # sorted by (group, value): a5(3) a7(1) a10(2) b5(4)
    assert v.tolist() == [5, 7, 10, 5]
    assert rs.tolist() == [0, 3, 4, 0]
    assert ng.tolist() == [6, 6, 6, 4]


def test_ntile_shuffled_random_vs_duckdb(ray_session, tmp_path):
    """ntile_assign_shuffled on random shards (values drawn from a tiny
    domain so tie blocks span shards) vs the NTILE window oracle."""
    import duckdb

    rng = np.random.default_rng(47)
    paths, parts = [], []
    rid = 0
    for s in range(4):
        n = int(rng.integers(30, 120))
        t = pa.table(
            {
                "g": pa.array(
                    np.array(["x", "y", "z"], dtype=object)[
                        rng.integers(0, 3, size=n)
                    ].tolist(),
                    pa.string(),
                ),
                "v": pa.array(rng.integers(0, 8, size=n), pa.int64()),  # heavy ties
                "rid": pa.array(np.arange(rid, rid + n), pa.int64()),
            }
        )
        rid += n
        p = str(tmp_path / f"n{s}.parquet")
        pq.write_table(t, p)
        paths.append(p)
        parts.append(t)
    for k in (1, 4, 1000):  # k > n exercises the small==0 branch
        got = ntile_assign_shuffled(paths, "g", "v", "rid", k=k, num_buckets=4)
        got = got.sort_by("rid")
        con = duckdb.connect()
        con.register("t", pa.concat_tables(parts))
        want = con.sql(
            f"""
            SELECT rid, g, CAST(NTILE({k}) OVER (PARTITION BY g ORDER BY v, rid)
                           AS BIGINT) AS ntile
              FROM t ORDER BY rid
            """
        ).arrow()
        assert got.column("rid").to_pylist() == want.column("rid").to_pylist()
        assert got.column("ntile").to_pylist() == want.column("ntile").to_pylist(), k


def test_ntile_shuffled_empty(ray_session, tmp_path):
    p = str(tmp_path / "e.parquet")
    pq.write_table(
        pa.table({"g": pa.array([], pa.string()), "v": pa.array([], pa.int64()),
                  "rid": pa.array([], pa.int64())}),
        p,
    )
    out = ntile_assign_shuffled([p], "g", "v", "rid", k=4, num_buckets=2)
    assert out.num_rows == 0


def test_hash_order_positions_vs_duckdb(ray_session, tmp_path):
    """Range-partitioned epoch-shuffle rank ≡ ROW_NUMBER over md5 order;
    positions are a bijection and salts give distinct permutations."""
    import duckdb

    from schemasaurus_ray.stages.rank import hash_order_positions

    rng = np.random.default_rng(3)
    paths = []
    all_ids = rng.permutation(5000)[:700].astype(np.int64)
    for s, chunk in enumerate(np.array_split(all_ids, 3)):
        p = str(tmp_path / f"o{s}.parquet")
        pq.write_table(pa.table({"doc_id": pa.array(chunk, pa.int64())}), p)
        paths.append(p)
    got = hash_order_positions(paths, "doc_id", "ep1:").sort_by("doc_id")
    con = duckdb.connect()
    con.register("t", pa.table({"doc_id": pa.array(all_ids, pa.int64())}))
    want = con.sql(
        """
        SELECT doc_id, CAST(ROW_NUMBER() OVER (
               ORDER BY md5('ep1:' || CAST(doc_id AS VARCHAR))) - 1 AS BIGINT) AS position
          FROM t ORDER BY doc_id
        """
    ).arrow()
    assert got.column("doc_id").to_pylist() == want.column("doc_id").to_pylist()
    assert got.column("position").to_pylist() == want.column("position").to_pylist()
    pos = got.column("position").to_pylist()
    assert sorted(pos) == list(range(len(all_ids)))  # bijection
    other = hash_order_positions(paths, "doc_id", "ep2:").sort_by("doc_id")
    assert other.column("position").to_pylist() != pos  # fresh permutation


@pytest.mark.parametrize("num_buckets", [1, 5, 8, 13, 32])
def test_hash_order_positions_nondefault_buckets(ray_session, tmp_path, num_buckets):
    """ANY bucket count must return every row with the SAME global order as
    the default (the old fixed-nibble split silently dropped codes >=
    num_buckets when num_buckets < 16 — ADVICE r3)."""
    from schemasaurus_ray.stages.rank import hash_order_positions

    rng = np.random.default_rng(7)
    ids = rng.permutation(4000)[:200].astype(np.int64)
    p = str(tmp_path / "ids.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}), p)
    base = hash_order_positions([p], "doc_id", "epX:").sort_by("doc_id")
    got = hash_order_positions([p], "doc_id", "epX:", num_buckets=num_buckets).sort_by("doc_id")
    assert got.num_rows == len(ids)  # no silent drops
    assert got.column("doc_id").to_pylist() == base.column("doc_id").to_pylist()
    assert got.column("position").to_pylist() == base.column("position").to_pylist()


def test_hash_order_positions_bucket_bounds(ray_session, tmp_path):
    from schemasaurus_ray.stages.rank import hash_order_positions

    p = str(tmp_path / "one.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([1, 2], pa.int64())}), p)
    with pytest.raises(ValueError, match="num_buckets"):
        hash_order_positions([p], "doc_id", "e:", num_buckets=0)
    with pytest.raises(ValueError, match="num_buckets"):
        hash_order_positions([p], "doc_id", "e:", num_buckets=257)
