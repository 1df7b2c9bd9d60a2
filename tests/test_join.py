"""stages/join.py equi_join_shuffled vs a single in-memory pyarrow join."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture()
def sides(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 40, 300), pa.int64()),
            "lv": pa.array(np.arange(300), pa.int64()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array(np.arange(0, 35, dtype=np.int64), pa.int64()),
            "rv": pa.array(np.arange(0, 35, dtype=np.int64) * 10, pa.int64()),
        }
    )
    return left, right, rd.from_arrow(left), rd.from_arrow(right)


def test_equi_join_inner_matches_local(sides):
    from schemasaurus_ray.stages.join import equi_join_shuffled

    left, right, lds, rds = sides
    got = equi_join_shuffled(
        lds, "k", ["k", "lv"], rds, "rk", ["rk", "rv"], num_buckets=3
    ).sort_by([("lv", "ascending")])
    want = left.join(right, keys=["k"], right_keys=["rk"], join_type="inner").sort_by(
        [("lv", "ascending")]
    )
    assert got.select(sorted(got.column_names)).equals(want.select(sorted(want.column_names)))


def test_equi_join_reduce_fn_aggregates_in_task(sides):
    from schemasaurus_ray.stages.join import equi_join_shuffled

    left, right, lds, rds = sides

    def agg(joined: pa.Table) -> pa.Table:
        if joined.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        g = joined.group_by(["k"]).aggregate([([], "count_all")])
        return g.rename_columns(["k", "n"])

    got = equi_join_shuffled(
        lds, "k", ["k", "lv"], rds, "rk", ["rk", "rv"], num_buckets=3, reduce_fn=agg
    ).sort_by("k")
    local = left.join(right, keys=["k"], right_keys=["rk"], join_type="inner")
    want = (
        local.group_by(["k"]).aggregate([([], "count_all")]).rename_columns(["k", "n"]).sort_by("k")
    )
    assert got.equals(want)


def test_equi_join_empty_right(sides):
    from schemasaurus_ray.stages.join import equi_join_shuffled

    _, _, lds, rds = sides
    empty = rds.filter(lambda row: False)
    got = equi_join_shuffled(lds, "k", ["k", "lv"], empty, "rk", ["rk", "rv"], num_buckets=2)
    assert got.num_rows == 0
