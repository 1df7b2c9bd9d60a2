"""Spec inference — profile a table into a validation spec (the inverse of
the validator).

The reference ships a schema→iterator compiler (src/iterate.js); a
validation *engine* also needs the reverse arrow: given a table nobody wrote
a spec for, derive one (types, required, ranges, length bounds, enum
candidates, string formats) that the compiler (plan.compile_plan) can
immediately evaluate. This is the standard "profile → suggested schema"
loop of data-quality systems.

Execution shape (same as stages/stats.py): ONE streaming ``map_batches``
pass emits tiny per-batch per-column partials (min/max, length bounds, a
*capped* distinct-value set for enum detection, an AND-mask of which
registry formats every non-null value matched); the driver merges
O(batches × columns) records — no shuffle, nothing proportional to rows
ever leaves the tasks. At 10^12 rows the exact-capped distinct set is
bounded by ``enum_cap + 1`` values per column per batch; unbounded
cardinality questions belong to the HLL sketch in stages/stats.py.

Format detection reuses messages.FORMATS (the reference's
fillDefaultFormats registry, src/v4validator.js:8-33) evaluated with RE2
(`pc.match_substring_regex`) — the same engine DuckDB uses, so the oracle
cascade generated from the same registry (queries.infer_spec_*) cannot
drift. Columns whose max length exceeds ``format_max_len`` are free text:
the regexes are skipped in-task and the merged gate nulls the format.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from ..messages import FORMATS

# detection priority: specific → general (a value set matching ipv4 also
# matches hostname; report ipv4)
FORMAT_PRIORITY = ("date-time", "ipv4", "ipv6", "email", "uri", "hostname")

ENUM_CAP = 16          # ≤ this many distinct non-null values → enum candidate
FORMAT_MAX_LEN = 256   # longer strings are prose, not formatted tokens


def _spec_type(t: pa.DataType) -> str:
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_integer(t):
        return "integer"
    if pa.types.is_floating(t):
        return "number"
    if pa.types.is_timestamp(t):
        return "date-time"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return "array"
    return "unknown"


def batch_infer_partial(
    table: pa.Table,
    columns: list[str] | None = None,
    enum_cap: int = ENUM_CAP,
    format_max_len: int = FORMAT_MAX_LEN,
) -> list[dict[str, Any]]:
    """One JSON-serializable partial per column for this batch."""
    out: list[dict[str, Any]] = []
    for col in columns or table.column_names:
        if col not in table.column_names:
            continue
        arr = table.column(col)
        t = arr.type
        kind = _spec_type(t)
        rec: dict[str, Any] = {
            "column": col,
            "type": kind,
            "count": len(arr),
            "nulls": arr.null_count,
        }
        valid = arr.drop_null()
        n_valid = len(valid)
        if n_valid == 0:
            out.append(rec)
            continue
        if kind in ("integer", "number"):
            mm = pc.min_max(valid)
            rec["min"] = mm["min"].as_py()
            rec["max"] = mm["max"].as_py()
        elif kind == "date-time":
            mm = pc.min_max(valid)
            rec["min"] = mm["min"].value  # epoch micros (timestamp[us])
            rec["max"] = mm["max"].value
        elif kind == "string":
            lens = pc.utf8_length(valid)
            mm = pc.min_max(lens)
            rec["min_len"] = mm["min"].as_py()
            rec["max_len"] = mm["max"].as_py()
            if rec["max_len"] <= format_max_len:
                # AND-mask: format f survives this batch iff every non-null
                # value matches. Merged mask is gated on the GLOBAL max_len
                # so a skipping batch can report nothing and stay exact.
                mask = []
                for name in FORMAT_PRIORITY:
                    m = pc.match_substring_regex(valid, FORMATS[name]["regexp"])
                    mask.append(bool(pc.all(m).as_py()))
                rec["fmt_mask"] = mask
        elif kind == "array":
            lens = pc.list_value_length(valid)
            mm = pc.min_max(lens)
            rec["min_len"] = mm["min"].as_py()
            rec["max_len"] = mm["max"].as_py()
        # capped exact distinct set (enum detection). Floats excluded from
        # *enum values* downstream but still counted (bit-equality distinct,
        # same as DuckDB COUNT(DISTINCT double)).
        if kind in ("integer", "number", "string", "boolean", "date-time"):
            uniq = valid.unique() if isinstance(valid, pa.Array) else valid.combine_chunks().unique()
            if len(uniq) <= enum_cap:
                vals = uniq.to_pylist()
                if kind == "date-time":
                    vals = [v.isoformat() for v in vals]
                rec["distinct"] = vals
            else:
                rec["distinct_overflow"] = True
        out.append(rec)
    return out


def merge_infer_partials(
    partials: list[dict[str, Any]], enum_cap: int = ENUM_CAP, format_max_len: int = FORMAT_MAX_LEN
) -> dict[str, dict[str, Any]]:
    """Driver-side merge → per-column profile dicts."""
    prof: dict[str, dict[str, Any]] = {}
    for rec in partials:
        col = rec["column"]
        p = prof.setdefault(
            col,
            {
                "type": rec["type"],
                "count": 0,
                "nulls": 0,
                "min": None,
                "max": None,
                "min_len": None,
                "max_len": None,
                "distinct": set(),
                "distinct_overflow": False,
                "fmt_mask": [True] * len(FORMAT_PRIORITY),
            },
        )
        p["count"] += rec["count"]
        p["nulls"] += rec["nulls"]
        for lo, hi in (("min", "max"), ("min_len", "max_len")):
            if rec.get(lo) is not None:
                p[lo] = rec[lo] if p[lo] is None else min(p[lo], rec[lo])
                p[hi] = rec[hi] if p[hi] is None else max(p[hi], rec[hi])
        if rec.get("distinct_overflow"):
            p["distinct_overflow"] = True
        else:
            p["distinct"].update(rec.get("distinct", ()))
            if len(p["distinct"]) > enum_cap:
                p["distinct_overflow"] = True
        if "fmt_mask" in rec:
            p["fmt_mask"] = [a and b for a, b in zip(p["fmt_mask"], rec["fmt_mask"])]
    for p in prof.values():
        if p["distinct_overflow"]:
            p["distinct"] = None
            p["n_distinct"] = None
        else:
            p["n_distinct"] = len(p["distinct"])
            p["distinct"] = sorted(p["distinct"], key=str)
        fmt = None
        if (
            p["type"] == "string"
            and p["count"] > p["nulls"]
            and p["max_len"] is not None
            and p["max_len"] <= format_max_len
        ):
            for name, ok in zip(FORMAT_PRIORITY, p["fmt_mask"]):
                if ok:
                    fmt = name
                    break
        p["format"] = fmt
        del p["fmt_mask"]
    return prof


def profile_to_spec(prof: dict[str, dict[str, Any]]) -> dict[str, Any]:
    """Suggested spec dict, directly consumable by plan.compile_plan /
    RowRuleStage — the round-trip invariant (validate(table, infer(table))
    → zero violations) is pinned in tests/test_infer.py."""
    columns: dict[str, Any] = {}
    for col, p in prof.items():
        kind = p["type"]
        c: dict[str, Any] = {}
        if kind in ("integer", "number", "string", "boolean", "array"):
            c["type"] = kind
        elif kind == "date-time":
            c["type"] = "integer"  # validated as epoch micros range
        if p["nulls"] == 0 and p["count"] > 0:
            c["required"] = True
        if kind in ("integer", "number", "date-time") and p["min"] is not None:
            c["minimum"] = p["min"]
            c["maximum"] = p["max"]
        if kind == "string" and p["min_len"] is not None:
            c["minLength"] = p["min_len"]
            c["maxLength"] = p["max_len"]
            if p["format"]:
                c["format"] = p["format"]
        if kind == "array" and p["min_len"] is not None:
            c["minItems"] = p["min_len"]
            c["maxItems"] = p["max_len"]
        if kind in ("integer", "string", "boolean") and p["distinct"]:
            # note: empty distinct (all-null column) must NOT become enum []
            # — draft-4 enums are non-empty, and [] would reject any future
            # non-null value
            c["enum"] = p["distinct"]
        columns[col] = c
    return {"columns": columns}


# field → (kind, extractor); the single source of truth for the flat
# profile row, shared by profile_to_table and spec_diff_profiles
def _field_values(p: dict[str, Any]) -> dict[str, Any]:
    def enum_vals():
        if p["distinct"] is None or p["type"] not in ("integer", "string", "boolean"):
            return None
        return ",".join(str(v) for v in p["distinct"])

    def numeric_mm(which):
        if p["type"] in ("integer", "number", "date-time") and p[which] is not None:
            return float(p[which])
        return None

    len_ok = p["type"] in ("string", "array")
    return {
        "inferred_type": p["type"],
        "required": 1 if (p["nulls"] == 0 and p["count"] > 0) else 0,
        "min_v": numeric_mm("min"),
        "max_v": numeric_mm("max"),
        "min_len": p["min_len"] if len_ok else None,
        "max_len": p["max_len"] if len_ok else None,
        "n_distinct": p["n_distinct"],
        "enum_vals": enum_vals(),
        "fmt": p["format"],
    }


NUM_FIELDS = ("required", "min_v", "max_v", "min_len", "max_len", "n_distinct")
STR_FIELDS = ("inferred_type", "enum_vals", "fmt")


def profile_to_json(prof: dict[str, dict[str, Any]]) -> str:
    """Persistable snapshot of a merged profile (the spec-space analogue of
    the drift snapshot): JSON round-trips every field spec_diff_profiles
    reads — distinct lists are already materialized by merge, date-time
    distincts are isoformat strings, min/max are plain numbers."""
    import json

    return json.dumps(prof, sort_keys=True)


def profile_from_json(s: str) -> dict[str, dict[str, Any]]:
    import json

    return json.loads(s)


def profile_to_table(prof: dict[str, dict[str, Any]]) -> pa.Table:
    """Flat profile (one row per column, sorted by name) — the oracle-facing
    product. enum_vals is the ','-joined str()-sorted distinct list
    (strings/ints/bools only), matching DuckDB
    string_agg(CAST(v AS VARCHAR), ',' ORDER BY CAST(v AS VARCHAR))."""
    cols = sorted(prof)
    rows = {c: _field_values(prof[c]) for c in cols}
    return pa.table(
        {
            "col_name": pa.array(cols, pa.string()),
            "inferred_type": pa.array([rows[c]["inferred_type"] for c in cols], pa.string()),
            "required": pa.array([rows[c]["required"] for c in cols], pa.int64()),
            "min_v": pa.array([rows[c]["min_v"] for c in cols], pa.float64()),
            "max_v": pa.array([rows[c]["max_v"] for c in cols], pa.float64()),
            "min_len": pa.array([rows[c]["min_len"] for c in cols], pa.int64()),
            "max_len": pa.array([rows[c]["max_len"] for c in cols], pa.int64()),
            "n_distinct": pa.array([rows[c]["n_distinct"] for c in cols], pa.int64()),
            "enum_vals": pa.array([rows[c]["enum_vals"] for c in cols], pa.string()),
            "fmt": pa.array([rows[c]["fmt"] for c in cols], pa.string()),
        }
    )


def spec_diff_profiles(
    prof_a: dict[str, dict[str, Any]], prof_b: dict[str, dict[str, Any]]
) -> pa.Table:
    """Schema drift in SPEC space: field-level diff of two profiles
    (today's table vs a persisted snapshot profile) — the structural
    sibling of the distribution-drift (KS/PSI) checks. One row per
    (column, field) whose value changed (IS DISTINCT FROM semantics);
    numeric fields land in val_*_num, string fields in val_*_str, so no
    float→string rendering ever has to match an oracle's. A column present
    on only one side yields a single field='presence' row and its field
    diffs are suppressed (the presence row subsumes them)."""
    rows: list[tuple] = []
    for col in sorted(set(prof_a) | set(prof_b)):
        a = prof_a.get(col)
        b = prof_b.get(col)
        if a is None or b is None:
            rows.append(
                (col, "presence", None, None,
                 "present" if a is not None else None,
                 "present" if b is not None else None)
            )
            continue
        fa, fb = _field_values(a), _field_values(b)
        for f in NUM_FIELDS:
            va, vb = fa[f], fb[f]
            if (va is None) != (vb is None) or (va is not None and float(va) != float(vb)):
                rows.append((col, f,
                             None if va is None else float(va),
                             None if vb is None else float(vb), None, None))
        for f in STR_FIELDS:
            va, vb = fa[f], fb[f]
            if va != vb:
                rows.append((col, f, None, None, va, vb))
    rows.sort(key=lambda r: (r[0], r[1]))
    return pa.table(
        {
            "col_name": pa.array([r[0] for r in rows], pa.string()),
            "field": pa.array([r[1] for r in rows], pa.string()),
            "val_a_num": pa.array([r[2] for r in rows], pa.float64()),
            "val_b_num": pa.array([r[3] for r in rows], pa.float64()),
            "val_a_str": pa.array([r[4] for r in rows], pa.string()),
            "val_b_str": pa.array([r[5] for r in rows], pa.string()),
        }
    )
