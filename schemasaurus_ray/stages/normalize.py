"""NormalizeStage — the reference normalizer's operators (SURVEY.md §2C)
as vectorized column transforms producing a NEW Arrow table (the reference
mutates in place, normalizer.js:8-45; Arrow is immutable):

- ``[default]``            → ``pc.fill_null(col, default)``  (:8-12)
- ``[additionalProperty]`` → projection to spec columns       (:13-15)
- ``[type]`` coercion      → ``pc.cast`` + the reference's string/boolean
  coercion table (:16-44): 'true'/'on'→true, 'false'/'off'→false,
  string→parse number, number→string, etc.

Use: ``ds.map_batches(NormalizeStage, fn_constructor_args=(spec,),
batch_format="pyarrow")``.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from ..spec import TableSpec, parse_table_spec

_TARGETS = {
    "string": pa.string(),
    "integer": pa.int64(),
    "number": pa.float64(),
    "boolean": pa.bool_(),
}


class NormalizeStage:
    def __init__(self, spec: TableSpec | dict[str, Any], keep_extra: bool = False):
        if isinstance(spec, dict):
            spec = parse_table_spec(spec)
        self.spec = spec
        self.keep_extra = keep_extra

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, pa.ChunkedArray | pa.Array] = {}
        for name, cspec in self.spec.columns.items():
            if name in batch.column_names:
                col = batch.column(name)
            else:
                col = pa.nulls(batch.num_rows, pa.null())
            col = self._coerce(col, cspec.get("type"))
            if "default" in cspec:
                default = cspec["default"]
                col = pc.fill_null(col, pa.scalar(default))
            out[name] = col
        if self.keep_extra:
            for name in batch.column_names:
                if name not in out:
                    out[name] = batch.column(name)
        # columns not in the spec are dropped — the [additionalProperty]
        # removal (normalizer_spec.js:33-42: fires even without
        # additionalProperties:false)
        return pa.table(out)

    @staticmethod
    def _coerce(col, target: str | None):
        if target is None or target not in _TARGETS:
            return col
        t = col.type
        want = _TARGETS[target]
        if t.equals(want):
            return col
        try:
            if target == "boolean" and (pa.types.is_string(t) or pa.types.is_large_string(t)):
                # 'true'/'on' → true, 'false'/'off' → false, else null-safe
                # truthiness of non-empty strings (reference normalizer.js:31-39)
                lower = pc.utf8_lower(col)
                is_true = pc.is_in(lower, value_set=pa.array(["true", "on"]))
                is_false = pc.is_in(lower, value_set=pa.array(["false", "off"]))
                truthy = pc.greater(pc.utf8_length(col), 0)
                return pc.if_else(is_true, True, pc.if_else(is_false, False, truthy))
            if target == "integer" and (pa.types.is_string(t) or pa.types.is_large_string(t)):
                return pc.cast(pc.cast(col, pa.float64()), pa.int64())
            if target == "integer" and pa.types.is_floating(t):
                # parseInt truncates toward zero (matches RowNormalizer)
                return pc.cast(pc.trunc(col), pa.int64())
            return pc.cast(col, want)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            return col
