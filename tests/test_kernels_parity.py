"""Vectorized Arrow kernels must agree with the row-level reference evaluator
(the engine's 'noinline' cross-check, SURVEY.md §5 test plan item 1)."""

import numpy as np
import pyarrow as pa
import pytest

from schemasaurus_ray import MISSING, new_validator
from schemasaurus_ray.plan import compile_plan
from schemasaurus_ray.spec import parse_table_spec

RNG = np.random.default_rng(42)
N = 2000


def make_table() -> pa.Table:
    codecs = np.array(["wav", "flac", "opus", "mp3", None], dtype=object)
    ids = np.array(
        [f"clip-{i:010d}" if i % 17 else f"CLIP_{i}" for i in range(N)], dtype=object
    )
    sr = RNG.choice([8000, 16000, 44100, 3000, 96001], size=N).astype(np.int32)
    dur = RNG.integers(-5, 40000, size=N).astype(np.int32)
    quality = RNG.uniform(-0.5, 1.5, size=N)
    quality[RNG.random(N) < 0.05] = np.nan
    transcript = np.array(
        ["" if i % 31 == 0 else "word " * (i % 7) for i in range(N)], dtype=object
    )
    transcript[RNG.random(N) < 0.03] = None
    mults = RNG.integers(0, 100, size=N)
    return pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            "sr_hz": pa.array(sr),
            "dur_ms": pa.array(dur),
            "codec": pa.array(RNG.choice(codecs, size=N), pa.string()),
            "quality": pa.array(quality, pa.float64()),
            "transcript": pa.array(transcript, pa.string()),
            "mult": pa.array(mults, pa.int64()),
        }
    )


SPEC = {
    "columns": {
        "clip_id": {"type": "string", "required": True, "pattern": "^clip-[0-9]{10}$"},
        "sr_hz": {"type": "integer", "enum": [8000, 16000, 22050, 44100]},
        "dur_ms": {"type": "integer", "minimum": 0, "exclusiveMinimum": True, "maximum": 30000},
        "codec": {"type": "string", "enum": ["wav", "flac", "opus"], "required": True},
        "quality": {"type": "number", "minimum": 0, "maximum": 1},
        "transcript": {"type": "string", "minLength": 1, "required": True},
        "mult": {"type": "integer", "multipleOf": 7},
    },
    "table": {"key": "clip_id"},
}


def row_codes(cspec: dict, value) -> set[str]:
    """Row-level truth for one column value under columnar semantics: null ↔
    absent; `required` = non-null."""
    out = set()
    if value is None:
        if cspec.get("required"):
            out.add("required")
        return out
    sub = {k: v for k, v in cspec.items() if k != "required"}
    v = new_validator(sub)
    res = v(value)
    for e in res.errors:
        # typed columns can't produce type-code errors (plan-time check);
        # except integer-valuedness on float columns
        out.add(e.code)
    return out


@pytest.fixture(scope="module")
def evaluated():
    table = make_table()
    plan = compile_plan(parse_table_spec(SPEC))
    bound = plan.bind(table.schema)
    row_bad, hits = bound.evaluate(table)
    return table, row_bad, hits


def test_vectorized_matches_row_level(evaluated):
    table, row_bad, hits = evaluated
    # rebuild per-row code sets from vectorized hits
    vec_codes: list[set] = [set() for _ in range(table.num_rows)]
    for rule, idx in hits:
        for i in idx:
            vec_codes[i].add((rule.column, rule.code))

    for i in range(table.num_rows):
        expected = set()
        for col, cspec in SPEC["columns"].items():
            val = table.column(col)[i].as_py()
            for code in row_codes(cspec, val):
                expected.add((col, code))
        assert vec_codes[i] == expected, f"row {i}: {vec_codes[i]} != {expected}"


def test_row_bad_mask_consistent(evaluated):
    table, row_bad, hits = evaluated
    flagged = np.zeros(table.num_rows, dtype=bool)
    for _, idx in hits:
        flagged[idx] = True
    assert (row_bad == flagged).all()
    assert row_bad.any() and not row_bad.all()


def test_schema_type_mismatch_block_level():
    t = pa.table({"clip_id": pa.array(["a"]), "sr_hz": pa.array(["not-int"])})
    plan = compile_plan(parse_table_spec({
        "columns": {"sr_hz": {"type": "integer", "minimum": 0}},
        "table": {"key": "clip_id"},
    }))
    bound = plan.bind(t.schema)
    assert [i.code for i in bound.schema_issues] == ["schema.type"]
    # value kernels for the dead column are dropped
    assert all(r.column != "sr_hz" for r in bound.rules)


def test_missing_required_column():
    t = pa.table({"a": pa.array([1])})
    plan = compile_plan(parse_table_spec({"columns": {"b": {"type": "integer", "required": True}}}))
    bound = plan.bind(t.schema)
    assert [i.code for i in bound.schema_issues] == ["schema.missing"]


def test_integer_spec_on_float_column():
    t = pa.table({"x": pa.array([1.0, 2.5, None, 3.0])})
    plan = compile_plan(parse_table_spec({"columns": {"x": {"type": "integer"}}}))
    bound = plan.bind(t.schema)
    row_bad, hits = bound.evaluate(t)
    assert list(row_bad) == [False, True, False, False]
    assert hits[0][0].code == "integer"


def test_cross_column_dependency():
    # codec=="flac" rows must have non-null bytes: dependencies on a sibling
    t = pa.table({
        "codec": pa.array(["flac", "wav", "flac", None]),
        "bytes_len": pa.array([10, None, None, None], pa.int64()),
    })
    plan = compile_plan(parse_table_spec({
        "columns": {
            "codec": {"type": "string", "dependencies": {"bytes_len": {"required": True}}},
        },
    }))
    bound = plan.bind(t.schema)
    row_bad, hits = bound.evaluate(t)
    assert list(row_bad) == [False, True, True, False]


def test_combinators_on_column():
    t = pa.table({"x": pa.array([5, 15, 25, None], pa.int64())})
    plan = compile_plan(parse_table_spec({
        "columns": {"x": {"oneOf": [{"minimum": 10}, {"maximum": 20}]}},
    }))
    bound = plan.bind(t.schema)
    row_bad, hits = bound.evaluate(t)
    # 5: only maximum→1 ok; 15: both ok → oneOf; 25: only minimum → ok; null skips
    assert list(row_bad) == [False, True, False, False]
    codes = {r.code for r, _ in hits}
    assert codes == {"oneOf"}


def test_unique_items_kernel():
    t = pa.table({"tags": pa.array([["a", "b"], ["a", "a"], [], None], pa.list_(pa.string()))})
    plan = compile_plan(parse_table_spec({"columns": {"tags": {"uniqueItems": True}}}))
    bound = plan.bind(t.schema)
    row_bad, _ = bound.evaluate(t)
    assert list(row_bad) == [False, True, False, False]


def test_unique_items_per_occurrence_arg():
    """Vectorized path must match the reference's error detail
    (v4validator.js:277-290): one violation PER duplicate occurrence beyond
    the first, with arg = the duplicate value (row path already does)."""
    t = pa.table(
        {"tags": pa.array([["a", "a", "a", "b", "b"], ["x"], ["z", "z"]], pa.list_(pa.string()))}
    )
    plan = compile_plan(parse_table_spec({"columns": {"tags": {"uniqueItems": True}}}))
    bound = plan.bind(t.schema)
    row_bad, hits = bound.evaluate(t)
    assert list(row_bad) == [True, False, True]
    (rule, idx), = hits
    # row 0: "a"×3 → 2 errors, "b"×2 → 1 error; row 2: "z"×2 → 1 error
    assert idx.tolist() == [0, 0, 0, 2]
    assert rule.occ_args == ["a", "a", "b", "z"]


def test_unique_items_with_null_elements():
    t = pa.table({"tags": pa.array([["a", None, "a"], [None, None], ["x"]], pa.list_(pa.string()))})
    plan = compile_plan(parse_table_spec({"columns": {"tags": {"uniqueItems": True}}}))
    bound = plan.bind(t.schema)
    row_bad, _ = bound.evaluate(t)
    # duplicate "a" flags row 0; duplicate nulls flag row 1 (stringify-keyed
    # like the reference's toComparable)
    assert list(row_bad) == [True, True, False]


def test_json_mode_column_missing_from_batch():
    plan = compile_plan(parse_table_spec({
        "columns": {
            "a": {"type": "integer"},
            "props": {"mode": "json", "required": True,
                      "schema": {"type": "object"}},
        },
    }))
    t = pa.table({"a": pa.array([1, 2], pa.int64())})
    bound = plan.bind(t.schema)
    assert [i.code for i in bound.schema_issues] == ["schema.missing"]
    row_bad, hits = bound.evaluate(t)  # must not raise KeyError
    assert not row_bad.any()
