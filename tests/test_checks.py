"""Cross-column CHECK constraints (spec.CheckRule → plan.compile_expr).

SQL three-valued CHECK semantics: a row violates only when the expression
is definitively FALSE; NULL operands make it pass — pinned here against
DuckDB (`WHERE NOT (expr)`) on the same table, plus grammar/error cases
and the flagship audio spec's transcript_rate check end-to-end.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from schemasaurus_ray.errors import SpecError
from schemasaurus_ray.plan import compile_expr, compile_plan


def _bad_rows(spec: dict, table: pa.Table) -> dict[str, list[int]]:
    bound = compile_plan(spec).bind(table.schema)
    _, hits = bound.evaluate(table)
    return {rule.column: sorted(idx.tolist()) for rule, idx in hits}


def test_expr_arithmetic_and_compare():
    fn, cols = compile_expr(["<", ["/", ["-", ["col", "a"], 1], 2], ["col", "b"]])
    assert cols == {"a", "b"}
    t = pa.table({"a": [1.0, 9.0], "b": [1.0, 1.0]})
    # (1-1)/2=0 < 1 true; (9-1)/2=4 < 1 false
    assert fn(t).to_pylist() == [True, False]


def test_expr_null_passes_check():
    spec = {
        "columns": {"a": {"type": "number"}, "b": {"type": "number"}},
        "table": {"checks": [{"name": "cap", "expr": ["<=", ["+", ["col", "a"], ["col", "b"]], 1.0]}]},
    }
    t = pa.table({"a": [0.5, 0.9, None], "b": [0.4, 0.5, 0.9]})
    assert _bad_rows(spec, t) == {"cap": [1]}  # NULL row 2 passes


def test_expr_kleene_or_null_arm():
    # NULL or TRUE == TRUE (passes); NULL or FALSE == NULL (passes too)
    spec = {
        "columns": {"a": {"type": "number"}, "g": {"type": "number"}},
        "table": {
            "checks": [
                {"name": "k", "expr": ["or", ["<=", ["col", "a"], 1.0], [">", ["col", "g"], 0]]}
            ]
        },
    }
    t = pa.table({"a": [None, None, 2.0], "g": [1.0, -1.0, -1.0]})
    assert _bad_rows(spec, t) == {"k": [2]}


def test_expr_len_and_not():
    fn, _ = compile_expr(["not", [">", ["len", ["col", "s"]], 3]])
    t = pa.table({"s": ["ab", "abcd", None]})
    assert fn(t).to_pylist() == [True, False, None]


def test_expr_errors():
    for bad in (
        [],
        ["frobnicate", 1, 2],
        ["+", 1],
        ["col", 7],
        {"col": "a"},
        ["and", ["col", "a"]],
    ):
        with pytest.raises(SpecError):
            compile_expr(bad)


def test_check_unbound_column_schema_issue():
    spec = {
        "columns": {"a": {"type": "number"}},
        "table": {"checks": [{"name": "ghost", "expr": [">", ["col", "zzz"], 0]}]},
    }
    bound = compile_plan(spec).bind(pa.schema([("a", pa.float64())]))
    issues = [(i.column, i.code) for i in bound.schema_issues]
    assert ("ghost", "check.unbound") in issues
    # and the rule was dropped, not evaluated
    _, hits = bound.evaluate(pa.table({"a": [1.0]}))
    assert hits == []


def test_check_custom_message_and_arg():
    spec = {
        "columns": {"a": {"type": "number"}},
        "table": {"checks": [{"name": "pos", "expr": [">", ["col", "a"], 0], "message": "a must be positive"}]},
    }
    bound = compile_plan(spec).bind(pa.schema([("a", pa.float64())]))
    _, hits = bound.evaluate(pa.table({"a": [-1.0]}))
    (rule, idx), = hits
    assert rule.code == "check" and rule.message == "a must be positive"
    assert "col" in rule.arg  # serialized expression for debuggability
    assert idx.tolist() == [0]


@settings(max_examples=40, deadline=None)
@given(
    a=st.lists(st.one_of(st.none(), st.floats(-10, 10, allow_nan=False)), min_size=1, max_size=30),
    b=st.lists(st.one_of(st.none(), st.floats(-10, 10, allow_nan=False)), min_size=1, max_size=30),
)
def test_check_matches_duckdb_three_valued(a, b):
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    t = pa.table({"a": pa.array(a, pa.float64()), "b": pa.array(b, pa.float64())})
    spec = {
        "columns": {"a": {"type": "number"}, "b": {"type": "number"}},
        "table": {"checks": [{"name": "c", "expr": ["<=", ["+", ["col", "a"], ["col", "b"]], 1.0]}]},
    }
    got = _bad_rows(spec, t).get("c", [])
    con = duckdb.connect()
    con.register("t", t.append_column("i", pa.array(np.arange(n), pa.int64())))
    want = [r[0] for r in con.sql("SELECT i FROM t WHERE NOT (a + b <= 1.0) ORDER BY i").fetchall()]
    assert got == want


def test_audio_spec_transcript_rate_fires():
    from schemasaurus_ray.specs import AUDIO_CLIP_SPEC_NO_BYTES

    t = pa.table(
        {
            "clip_id": ["clip-0000000001", "clip-0000000002", "clip-0000000003"],
            "sr_hz": pa.array([16000, 16000, 16000], pa.int32()),
            # 1000 ms for 200 chars = 200 chars/sec > 80 → row 1 violates;
            # dur 0 is quiet for THIS check (minimum.exclusive owns it)
            "dur_ms": pa.array([5000, 1000, 0], pa.int32()),
            "codec": ["wav", "wav", "wav"],
            "transcript": ["ok " * 10, "x" * 200, "y" * 50],
        }
    )
    bound = compile_plan(AUDIO_CLIP_SPEC_NO_BYTES).bind(t.schema)
    _, hits = bound.evaluate(t)
    by_rule = {rule.column: idx.tolist() for rule, idx in hits}
    assert by_rule["transcript_rate"] == [1]
    assert by_rule["dur_ms"] == [2]  # exclusiveMinimum untouched
