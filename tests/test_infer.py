"""Spec inference (stages/infer.py): partial merge semantics, enum/format
detection, and the round-trip invariant — a spec inferred FROM a table
must validate that table with zero violations."""

import pyarrow as pa
import pytest

from schemasaurus_ray.stages.infer import (
    ENUM_CAP,
    batch_infer_partial,
    merge_infer_partials,
    profile_to_spec,
    profile_to_table,
)
from schemasaurus_ray.stages.rulepack import RowRuleStage


def _profile(table: pa.Table, batch_rows: int | None = None, **kw):
    if batch_rows is None:
        parts = batch_infer_partial(table, **kw)
    else:
        parts = []
        for off in range(0, len(table), batch_rows):
            parts.extend(batch_infer_partial(table.slice(off, batch_rows), **kw))
    return merge_infer_partials(parts, **kw)


def test_types_ranges_required():
    t = pa.table(
        {
            "i": pa.array([1, 5, 3], pa.int64()),
            "f": pa.array([0.5, None, 2.5], pa.float64()),
            "s": pa.array(["ab", "cdef", "x"], pa.string()),
        }
    )
    p = _profile(t)
    assert p["i"]["type"] == "integer" and p["i"]["min"] == 1 and p["i"]["max"] == 5
    assert p["i"]["nulls"] == 0
    assert p["f"]["type"] == "number" and p["f"]["nulls"] == 1
    assert p["f"]["min"] == 0.5 and p["f"]["max"] == 2.5
    assert p["s"]["min_len"] == 1 and p["s"]["max_len"] == 4


def test_enum_detection_and_cross_batch_overflow():
    vals = ["a", "b", "c"] * 10
    p = _profile(pa.table({"s": pa.array(vals)}), batch_rows=7)
    assert p["s"]["distinct"] == ["a", "b", "c"] and p["s"]["n_distinct"] == 3
    # per-batch sets stay under the cap but the UNION overflows → no enum
    many = [f"v{i:03d}" for i in range(4 * ENUM_CAP)]
    p = _profile(pa.table({"s": pa.array(many)}), batch_rows=8)
    assert p["s"]["distinct"] is None and p["s"]["n_distinct"] is None


def test_format_priority_and_length_gate():
    # every value matches both ipv4 and hostname → ipv4 (more specific) wins
    p = _profile(pa.table({"s": pa.array(["10.0.0.1", "192.168.1.2"])}))
    assert p["s"]["format"] == "ipv4"
    p = _profile(pa.table({"s": pa.array(["host1.example", "a.b"])}))
    assert p["s"]["format"] == "hostname"
    # one long-batch value flips the GLOBAL length gate even though the
    # short batch matched (merge must gate on merged max_len, not per-batch)
    long = "x" * 300
    p = _profile(pa.table({"s": pa.array(["10.0.0.1", long])}), batch_rows=1)
    assert p["s"]["format"] is None
    # a non-matching value in any batch kills the format
    p = _profile(pa.table({"s": pa.array(["10.0.0.1", "not an ip"])}), batch_rows=1)
    assert p["s"]["format"] is None


def test_all_null_and_list_columns():
    t = pa.table(
        {
            "n": pa.array([None, None], pa.string()),
            "v": pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64())),
        }
    )
    p = _profile(t)
    assert p["n"]["format"] is None and p["n"]["min_len"] is None
    assert p["n"]["nulls"] == 2
    assert p["v"]["type"] == "array" and p["v"]["min_len"] == 1 and p["v"]["max_len"] == 2


def test_timestamp_epoch_micros():
    import datetime as dt

    ts = [dt.datetime(2026, 1, 1), dt.datetime(2026, 6, 1)]
    p = _profile(pa.table({"ts": pa.array(ts, pa.timestamp("us"))}))
    assert p["ts"]["type"] == "date-time"
    assert p["ts"]["min"] == int(ts[0].replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def test_batched_equals_whole_table():
    t = pa.table(
        {
            "i": pa.array(list(range(40)), pa.int64()),
            "s": pa.array([f"10.0.0.{i % 5}" for i in range(40)]),
        }
    )
    whole = profile_to_table(_profile(t))
    split = profile_to_table(_profile(t, batch_rows=7))
    assert whole.equals(split)


def test_round_trip_inferred_spec_validates_clean():
    """The flagship invariant: infer(table) → compile_plan → zero
    violations on the very table it was inferred from."""
    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "kind": pa.array(["a", "b", "a", "b"]),
            "score": pa.array([0.1, 0.9, None, 0.5], pa.float64()),
            "host": pa.array(["n1.example", "n2.example", "n3.example", "n4.example"]),
        }
    )
    spec = profile_to_spec(_profile(t, batch_rows=2))
    c = spec["columns"]
    assert c["id"]["required"] and c["id"]["minimum"] == 1 and c["id"]["maximum"] == 4
    assert c["kind"]["enum"] == ["a", "b"]
    assert c["host"]["format"] == "hostname"
    assert "required" not in c["score"]
    out = RowRuleStage(spec)(t)
    viols = out.filter(pa.compute.equal(out.column("kind"), "violation"))
    assert len(viols) == 0
    # and the spec actually bites: a row outside every inferred bound
    bad = pa.table(
        {
            "id": pa.array([99], pa.int64()),
            "kind": pa.array(["zz"]),
            "score": pa.array([5.0], pa.float64()),
            "host": pa.array(["-bad-"]),
        }
    )
    out = RowRuleStage(spec)(bad)
    viols = out.filter(pa.compute.equal(out.column("kind"), "violation"))
    codes = set(zip(viols.column("column").to_pylist(), viols.column("code").to_pylist()))
    assert ("id", "maximum") in codes
    assert ("kind", "enum") in codes
    assert ("score", "maximum") in codes
    assert any(col == "host" for col, _ in codes)


def test_round_trip_on_documents_fixture(ray_session):
    """End-to-end on the sf0.001 documents table through the Dataset path."""
    from schemasaurus_ray.pipelines.queries import _read, _violations, infer_spec_documents

    import pyarrow.parquet as pq

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    spec = profile_to_spec(_profile(tbl, batch_rows=97))
    ds = _read("/root/testdata/sf0.001", "documents")
    assert len(_violations(ds, spec)) == 0
    out = infer_spec_documents("/root/testdata/sf0.001")
    prof = {r["col_name"]: r for r in out.to_pylist()}
    assert prof["lang"]["enum_vals"] is not None
    assert prof["source"]["fmt"] == "hostname"
    assert prof["doc_id"]["required"] == 1


def test_spec_diff_profiles_field_kinds():
    from schemasaurus_ray.stages.infer import merge_infer_partials, spec_diff_profiles

    def prof(table):
        return merge_infer_partials(batch_infer_partial(table))

    a = prof(
        pa.table(
            {
                "i": pa.array([1, 2, 3], pa.int64()),
                "s": pa.array(["a", "b", "a"]),
                "gone": pa.array([1.0, 2.0, 3.0], pa.float64()),
                "ip": pa.array(["10.0.0.1", "10.0.0.2", "10.0.0.3"]),
            }
        )
    )
    b = prof(
        pa.table(
            {
                "i": pa.array([1.5, 2.0, None], pa.float64()),  # type + required + max flip
                "s": pa.array(["a", "b", "c"]),                 # enum + n_distinct + len same
                "ip": pa.array(["10.0.0.1", "not an ip", "x"]),  # fmt lost (space kills all)
                "new": pa.array([True, False, True], pa.bool_()),  # added column
            }
        )
    )
    out = spec_diff_profiles(a, b)
    rows = {(r["col_name"], r["field"]): r for r in out.to_pylist()}
    assert rows[("gone", "presence")]["val_a_str"] == "present"
    assert rows[("gone", "presence")]["val_b_str"] is None
    assert rows[("new", "presence")]["val_b_str"] == "present"
    assert rows[("i", "inferred_type")]["val_a_str"] == "integer"
    assert rows[("i", "inferred_type")]["val_b_str"] == "number"
    assert rows[("i", "required")]["val_a_num"] == 1.0
    assert rows[("i", "required")]["val_b_num"] == 0.0
    assert rows[("i", "max_v")]["val_b_num"] == 2.0
    assert rows[("s", "enum_vals")]["val_a_str"] == "a,b"
    assert rows[("s", "enum_vals")]["val_b_str"] == "a,b,c"
    assert rows[("s", "n_distinct")]["val_b_num"] == 3.0
    assert rows[("ip", "fmt")]["val_a_str"] == "ipv4"
    assert rows[("ip", "fmt")]["val_b_str"] is None
    # no spurious rows: presence-diffing columns contribute exactly one row
    assert not any(c == "gone" and f != "presence" for c, f in rows)
    # self-diff is empty
    assert len(spec_diff_profiles(a, a)) == 0


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    ints=st.lists(st.one_of(st.none(), st.integers(-10**9, 10**9)), min_size=1, max_size=60),
    floats=st.lists(
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=64)),
        min_size=1,
        max_size=60,
    ),
    strs=st.lists(st.one_of(st.none(), st.text(max_size=30)), min_size=1, max_size=60),
    batch_rows=st.integers(1, 20),
)
def test_infer_round_trip_property(ints, floats, strs, batch_rows):
    """PROPERTY: for any table, the spec inferred from it validates it with
    zero violations (the inference bounds are, by construction, satisfied
    by the data that produced them)."""
    n = max(len(ints), len(floats), len(strs))
    pad = lambda xs: xs + [None] * (n - len(xs))
    t = pa.table(
        {
            "i": pa.array(pad(ints), pa.int64()),
            "f": pa.array(pad(floats), pa.float64()),
            "s": pa.array(pad(strs), pa.string()),
        }
    )
    spec = profile_to_spec(_profile(t, batch_rows=batch_rows))
    out = RowRuleStage(spec)(t)
    viols = out.filter(pa.compute.equal(out.column("kind"), "violation"))
    assert len(viols) == 0, viols.to_pylist()[:5]


@settings(max_examples=60, deadline=None)
@given(
    vals_a=st.lists(st.one_of(st.none(), st.integers(-50, 50)), min_size=1, max_size=40),
    vals_b=st.lists(st.one_of(st.none(), st.integers(-50, 50)), min_size=1, max_size=40),
    seed=st.integers(0, 10**6),
)
def test_spec_diff_swap_property(vals_a, vals_b, seed):
    """PROPERTY: swapping the diff's sides swaps the val_a/val_b columns
    row-for-row and changes nothing else; self-diff is always empty."""
    from schemasaurus_ray.stages.infer import spec_diff_profiles

    a = _profile(pa.table({"x": pa.array(vals_a, pa.int64())}))
    b = _profile(pa.table({"x": pa.array(vals_b, pa.int64())}))
    ab = spec_diff_profiles(a, b).to_pylist()
    ba = spec_diff_profiles(b, a).to_pylist()
    flip = [
        {**r, "val_a_num": r["val_b_num"], "val_b_num": r["val_a_num"],
         "val_a_str": r["val_b_str"], "val_b_str": r["val_a_str"]}
        for r in ba
    ]
    assert sorted(map(str, ab)) == sorted(map(str, flip))
    assert spec_diff_profiles(a, a).num_rows == 0
