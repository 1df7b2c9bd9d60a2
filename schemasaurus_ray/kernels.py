"""Vectorized Arrow kernels — one per validator keyword (SURVEY.md §2B
right-hand column). Each kernel factory takes the column spec and returns a
function ``table -> np.ndarray[bool]`` where True marks a VIOLATING row.

Invariants:
- null rows never violate keyword checks (the ``[^required]`` short-circuit,
  reference src/v4validator.js:81-86) — only the ``required`` kernel flags
  nulls;
- kernels are pyarrow.compute / numpy over whole columns, no Python row loops
  (except documented list-column fallbacks);
- constants (enum sets, compiled regexes) are folded once at plan time — the
  analogue of the reference's {prepare}/inline specialization
  (src/compiler.js:206-233).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .errors import SpecError
from .messages import MESSAGES, render, resolve_formats
from .util import single_chunk

BoolMask = np.ndarray  # shape (n,), dtype bool — True = violation


@dataclass
class KernelRule:
    """One compiled column rule."""

    column: str
    code: str
    arg: Any
    message: str
    fn: Callable[[pa.Table], BoolMask]
    # whether this rule fires on null rows (only `required` does)
    fires_on_null: bool = False
    # optional rich evaluator: table -> (occurrence_row_indices (may repeat),
    # per-occurrence arg strings, row_bad mask). Rules with per-occurrence
    # error detail (uniqueItems: one error per duplicate with arg = the
    # duplicate value, v4validator.js:277-290) set this; plain rules don't.
    detail_fn: Callable[[pa.Table], tuple[np.ndarray, list, BoolMask]] | None = None
    # per-batch occurrence args, set by BoundPlan.evaluate on a rule CLONE
    occ_args: list | None = None


def _np_bool(mask: pa.ChunkedArray | pa.Array) -> BoolMask:
    """Arrow boolean (possibly with nulls) → numpy bool, nulls → False."""
    mask = single_chunk(mask)
    return np.asarray(mask.fill_null(False))


def _valid_and(col: pa.ChunkedArray, bad: pa.ChunkedArray | pa.Array) -> BoolMask:
    """bad AND is_valid(col) — nulls never violate keyword checks."""
    return _np_bool(pc.and_kleene(bad, pc.is_valid(col)))


def _col(table: pa.Table, name: str) -> pa.ChunkedArray:
    return table.column(name)


def _numeric_np(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Numeric column → (float64 values with nulls as nan, valid mask)."""
    arr = single_chunk(col)
    valid = np.asarray(pc.is_valid(arr))
    vals = np.asarray(arr.cast(pa.float64()).fill_null(np.nan))
    return vals, valid


def _message(spec: dict, code: str, arg: Any, gettext) -> str:
    node_messages = spec.get("messages") or {}
    if code in node_messages:
        return gettext(node_messages[code])
    return render(MESSAGES.get(code, code), _fmt_arg(arg))


def _fmt_arg(arg: Any) -> Any:
    if isinstance(arg, list):
        import json

        return json.dumps(arg)
    return arg


# --- kernel factories -------------------------------------------------------

def k_required(column: str, spec: dict, opts: dict) -> KernelRule:
    """required = non-null (reference processRequired, v4validator.js:292-321
    lifted to column nullability)."""
    return KernelRule(
        column=column,
        code="required",
        arg=column,
        message=_message(spec, "required", column, opts["gettext"]),
        fn=lambda t: _np_bool(pc.is_null(_col(t, column))),
        fires_on_null=True,
    )


def k_integer_valued(column: str, spec: dict, opts: dict) -> KernelRule:
    """type:integer on a float column: value % 1 == 0 (1.0 is a valid
    integer — reference v4validator.js:97-101)."""

    def fn(t: pa.Table) -> BoolMask:
        vals, valid = _numeric_np(_col(t, column))
        with np.errstate(invalid="ignore"):
            bad = np.mod(vals, 1.0) != 0.0
        return bad & valid

    return KernelRule(column, "integer", None, _message(spec, "integer", None, opts["gettext"]), fn)


def k_enum(column: str, spec: dict, opts: dict) -> KernelRule:
    """enum membership via a folded value set (reference precompiles a hash
    set, v4validator.js:223-232) → pc.is_in."""
    enum = spec["enum"]
    value_set = pa.array(enum)

    def fn(t: pa.Table) -> BoolMask:
        col = _col(t, column)
        ok = pc.is_in(col, value_set=value_set)
        return _valid_and(col, pc.invert(ok))

    return KernelRule(column, "enum", enum, _message(spec, "enum", enum, opts["gettext"]), fn)


def k_min_length(column: str, spec: dict, opts: dict) -> KernelRule:
    n = spec["minLength"]

    def fn(t: pa.Table) -> BoolMask:
        col = _col(t, column)
        return _valid_and(col, pc.less(pc.utf8_length(col), n))

    return KernelRule(column, "minLength", n, _message(spec, "minLength", n, opts["gettext"]), fn)


def k_max_length(column: str, spec: dict, opts: dict) -> KernelRule:
    n = spec["maxLength"]

    def fn(t: pa.Table) -> BoolMask:
        col = _col(t, column)
        return _valid_and(col, pc.greater(pc.utf8_length(col), n))

    return KernelRule(column, "maxLength", n, _message(spec, "maxLength", n, opts["gettext"]), fn)


def k_pattern(column: str, spec: dict, opts: dict) -> KernelRule:
    """Unanchored regex search (reference _.match(...), v4validator.js:246-248)
    via the RE2 kernel."""
    pattern = spec["pattern"]

    def fn(t: pa.Table) -> BoolMask:
        col = _col(t, column)
        ok = pc.match_substring_regex(col, pattern)
        return _valid_and(col, pc.invert(ok))

    return KernelRule(column, "pattern", pattern, _message(spec, "pattern", pattern, opts["gettext"]), fn)


def k_format(column: str, spec: dict, opts: dict) -> KernelRule:
    name = spec["format"]
    formats = opts["formats"]
    if name not in formats:
        raise SpecError(f"unknown format: {name}")
    rx = formats[name]["regexp"]
    code = "format." + name
    msg = spec.get("messages", {}).get(code) or formats[name]["message"]

    def fn(t: pa.Table) -> BoolMask:
        col = _col(t, column)
        ok = pc.match_substring_regex(col, rx)
        return _valid_and(col, pc.invert(ok))

    return KernelRule(column, code, name, msg, fn)


def _bound(column: str, spec: dict, opts: dict, kind: str) -> KernelRule:
    """minimum/maximum with draft-4 boolean exclusives
    (v4validator.js:344-352): typed comparison on the column."""
    bound = spec[kind]
    excl = spec.get("exclusiveMinimum" if kind == "minimum" else "exclusiveMaximum", False)
    code = kind + (".exclusive" if excl else "")
    if kind == "minimum":
        cmp = pc.less_equal if excl else pc.less
    else:
        cmp = pc.greater_equal if excl else pc.greater

    def fn(t: pa.Table) -> BoolMask:
        col = _col(t, column)
        return _valid_and(col, cmp(col, bound))

    return KernelRule(column, code, bound, _message(spec, code, bound, opts["gettext"]), fn)


def k_minimum(column: str, spec: dict, opts: dict) -> KernelRule:
    return _bound(column, spec, opts, "minimum")


def k_maximum(column: str, spec: dict, opts: dict) -> KernelRule:
    return _bound(column, spec, opts, "maximum")


def k_multiple_of(column: str, spec: dict, opts: dict) -> KernelRule:
    """(v / k) % 1 != 0, floating-division semantics (v4validator.js:340-342)."""
    k = spec["multipleOf"]

    def fn(t: pa.Table) -> BoolMask:
        vals, valid = _numeric_np(_col(t, column))
        with np.errstate(invalid="ignore", divide="ignore"):
            bad = np.mod(vals / k, 1.0) != 0.0
        return bad & valid

    return KernelRule(column, "multipleOf", k, _message(spec, "multipleOf", k, opts["gettext"]), fn)


def k_min_items(column: str, spec: dict, opts: dict) -> KernelRule:
    n = spec["minItems"]

    def fn(t: pa.Table) -> BoolMask:
        col = _col(t, column)
        return _valid_and(col, pc.less(pc.list_value_length(col), n))

    return KernelRule(column, "minItems", n, _message(spec, "minItems", n, opts["gettext"]), fn)


def k_max_items(column: str, spec: dict, opts: dict) -> KernelRule:
    n = spec["maxItems"]

    def fn(t: pa.Table) -> BoolMask:
        col = _col(t, column)
        return _valid_and(col, pc.greater(pc.list_value_length(col), n))

    return KernelRule(column, "maxItems", n, _message(spec, "maxItems", n, opts["gettext"]), fn)


_NULL_SENTINEL = "\x00__null__"


def k_unique_items(column: str, spec: dict, opts: dict) -> KernelRule:
    """Within-row list dedup (v4validator.js:277-290). Vectorized via a single
    flatten + lexsort over (row_index, value) — no Python loop over rows.
    ``detail_fn`` matches the reference's error detail: one violation PER
    duplicate occurrence beyond the first, arg = the duplicate value."""

    def core(t: pa.Table) -> tuple[np.ndarray, np.ndarray, BoolMask]:
        col = _col(t, column)
        n = len(col)
        lengths = np.asarray(pc.list_value_length(col).fill_null(0), dtype=np.int64)
        flat = pc.list_flatten(col)
        if len(flat) == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, np.zeros(0, dtype=object), np.zeros(n, dtype=bool)
        parents = np.repeat(np.arange(n), lengths)
        # null list elements must sort/compare like any value (the reference
        # stringify-keys them); sentinel avoids None-vs-str TypeError
        vals = np.asarray(flat.cast(pa.string()).fill_null(_NULL_SENTINEL))
        order = np.lexsort((vals, parents))
        sp, sv = parents[order], vals[order]
        dup = np.zeros(len(sv), dtype=bool)
        dup[1:] = (sp[1:] == sp[:-1]) & (sv[1:] == sv[:-1])
        bad = np.zeros(n, dtype=bool)
        bad[sp[dup]] = True
        return sp[dup], sv[dup], bad

    def fn(t: pa.Table) -> BoolMask:
        return core(t)[2]

    def detail_fn(t: pa.Table) -> tuple[np.ndarray, list, BoolMask]:
        occ_rows, occ_vals, bad = core(t)
        args = ["null" if v == _NULL_SENTINEL else str(v) for v in occ_vals.tolist()]
        return occ_rows, args, bad

    return KernelRule(
        column,
        "uniqueItems",
        None,
        _message(spec, "uniqueItems", None, opts["gettext"]),
        fn,
        detail_fn=detail_fn,
    )


def k_conform(column: str, spec: dict, opts: dict) -> list[KernelRule]:
    """Custom batch UDF hook (reference conform, v4validator.js:355-373).
    The UDF is VECTORIZED here: ``fn(values: pa.Array, batch: pa.Table, *args)
    -> bool array-like`` (True = valid). The batch argument is the engine's
    ``ctx.parent`` — sibling columns for cross-column checks."""
    conform = spec["conform"]
    rules: list[KernelRule] = []

    def make(fn_user, code: str, extra_args: tuple) -> KernelRule:
        def fn(t: pa.Table) -> BoolMask:
            col = _col(t, column)
            ok = fn_user(col, t, *extra_args)
            ok = np.asarray(ok, dtype=bool)
            # is_valid on the UNcombined column: combine_chunks copied the
            # whole payload (binary conform columns = the full audio bytes)
            return (~ok) & _np_bool(pc.is_valid(col))

        return KernelRule(column, code, None, _message(spec, code if code in MESSAGES else "custom", None, opts["gettext"]), fn)

    if callable(conform):
        rules.append(make(conform, "custom", ()))
    else:
        for name, args in conform.items():
            fn_user = opts.get("custom", {}).get(name)
            if fn_user is None:
                raise SpecError(f"unknown custom validator: {name}")
            rules.append(make(fn_user, "custom." + name, () if args is True else tuple(args)))
    return rules


# registry: selector → factory; ordering mirrors the reference method order
KERNEL_FACTORIES: list[tuple[str, Callable]] = [
    ("[enum]", k_enum),
    ("[minLength]", k_min_length),
    ("[maxLength]", k_max_length),
    ("[pattern]", k_pattern),
    ("[format]", k_format),
    ("[multipleOf]", k_multiple_of),
    ("[minimum]", k_minimum),
    ("[maximum]", k_maximum),
    ("[minItems]", k_min_items),
    ("[maxItems]", k_max_items),
    ("[uniqueItems=true]", k_unique_items),
    ("[conform]", k_conform),
]
