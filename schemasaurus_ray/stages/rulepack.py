"""RowRuleStage — the hot per-row validation stage.

A callable CLASS for ``Dataset.map_batches(RowRuleStage, fn_constructor_args=
(spec,), batch_format="pyarrow", zero_copy_batch=True, concurrency=N)``:
the spec is compiled ONCE per actor in ``__init__`` (the engine analogue of
the reference's one-selector-per-compiled-closure, src/compiler.js:294-311 —
see SURVEY.md §3.4) and each ``__call__`` evaluates all folded kernels on one
zero-copy Arrow batch.

Output: a union table of violation rows + per-(batch, partition) summary
rows, discriminated by ``kind`` — one pass over the data yields both the
violations sink and the per-partition verdict aggregate (reference result
model ``{valid, errors}``, v4validator.js:377-380, lifted to partitions).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from ..plan import BoundPlan, RowRulePlan, compile_plan
from ..spec import TableSpec
from ..util import partition_ids, single_chunk, stringify_column

VIOLATION_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # "violation" | "summary"
        ("partition_id", pa.int32()),
        ("row_ref", pa.string()),
        ("column", pa.string()),
        ("code", pa.string()),
        ("message", pa.string()),
        ("arg", pa.string()),
        ("value", pa.string()),
        ("rows", pa.int64()),
        ("bad_rows", pa.int64()),
        ("payload", pa.string()),  # serialized stats/drift partials
    ]
)


def _empty_out() -> pa.Table:
    return VIOLATION_SCHEMA.empty_table()


class RowRuleStage:
    """Evaluate a compiled rule plan per batch → violations ∪ summaries.

    Partition assignment (``partition_id``):
    - ``path_map`` given (input read with ``include_paths=True``): partition
      = input shard index — the resumable/lineage unit (SURVEY.md §4);
    - else: content-based ``hash(key) % num_partitions``.
    """

    def __init__(
        self,
        spec: TableSpec | dict[str, Any],
        num_partitions: int = 64,
        path_map: dict[str, int] | None = None,
    ):
        self.plan: RowRulePlan = compile_plan(spec)
        self.num_partitions = num_partitions
        self.path_map = path_map
        self._bound: BoundPlan | None = None
        self._bound_schema: pa.Schema | None = None

    def _bind(self, schema: pa.Schema) -> BoundPlan:
        if self._bound is None or not schema.equals(self._bound_schema):
            self._bound = self.plan.bind(schema)
            self._bound_schema = schema
        return self._bound

    def partitions_of(self, batch: pa.Table) -> np.ndarray:
        if self.path_map is not None and "path" in batch.column_names:
            paths = batch.column("path")
            n = len(paths)
            # lineage batches are contiguous per-file segments in file order,
            # so first==last proves the whole batch is ONE file — the
            # standard case, where dictionary-encoding 250k identical
            # strings was pure overhead
            if n and paths[0].as_py() == paths[n - 1].as_py():
                return np.full(n, self.path_map.get(paths[0].as_py(), -1), dtype=np.int32)
            enc = paths.combine_chunks().dictionary_encode()
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
                if isinstance(enc, pa.ChunkedArray):
                    enc = enc.chunk(0)
            lut = np.array(
                [self.path_map.get(d, -1) for d in enc.dictionary.to_pylist()], dtype=np.int32
            )
            return lut[np.asarray(enc.indices)]
        key_col = self.plan.spec.row_ref_column
        col = key_col if key_col and key_col in batch.column_names else batch.column_names[0]
        return partition_ids(batch.column(col), self.num_partitions)

    def __call__(self, batch: pa.Table, pids: np.ndarray | None = None) -> pa.Table:
        if pids is None:
            pids = self.partitions_of(batch)
        lineage_cols = [
            c for c in ("path", "row_start") if c in batch.column_names and c not in self.plan.spec.columns
        ]
        if lineage_cols:
            batch = batch.drop_columns(lineage_cols)
        n = batch.num_rows
        if n == 0:
            return _empty_out()
        bound = self._bind(batch.schema)

        key_col = self.plan.spec.row_ref_column
        if key_col and key_col in batch.column_names:
            refs = single_chunk(batch.column(key_col)).cast(pa.string())
        else:
            refs = None

        row_bad, hits = bound.evaluate(batch)

        out_kind: list[pa.Array] = []
        chunks: list[dict[str, pa.Array]] = []

        for rule, idx in hits:
            m = len(idx)
            idx_arr = pa.array(idx, pa.int64())
            if rule.column in batch.column_names:
                values = stringify_column(batch.column(rule.column), idx)
            else:
                values = pa.nulls(m, pa.string())
            if rule.occ_args is not None:
                # per-occurrence args (uniqueItems: arg = the duplicate value)
                arg_arr = pa.array([_argstr(a) for a in rule.occ_args], pa.string())
            else:
                arg_arr = pa.array([_argstr(rule.arg)] * m, pa.string())
            chunks.append(
                {
                    "kind": pa.array(["violation"] * m, pa.string()),
                    "partition_id": pa.array(pids[idx], pa.int32()),
                    "row_ref": refs.take(idx_arr) if refs is not None else pa.nulls(m, pa.string()),
                    "column": pa.array([rule.column] * m, pa.string()),
                    "code": pa.array([rule.code] * m, pa.string()),
                    "message": pa.array([rule.message] * m, pa.string()),
                    "arg": arg_arr,
                    "value": values,
                    "rows": pa.nulls(m, pa.int64()),
                    "bad_rows": pa.nulls(m, pa.int64()),
                    "payload": pa.nulls(m, pa.string()),
                }
            )

        # block-level schema issues: one violation row per issue per batch,
        # attributed to every partition seen in the batch via partition -1
        for issue in bound.schema_issues:
            chunks.append(
                {
                    "kind": pa.array(["violation"]),
                    "partition_id": pa.array([-1], pa.int32()),
                    "row_ref": pa.nulls(1, pa.string()),
                    "column": pa.array([issue.column]),
                    "code": pa.array([issue.code]),
                    "message": pa.array([issue.message]),
                    "arg": pa.array([_argstr(issue.arg)], pa.string()),
                    "value": pa.nulls(1, pa.string()),
                    "rows": pa.nulls(1, pa.int64()),
                    "bad_rows": pa.nulls(1, pa.int64()),
                    "payload": pa.nulls(1, pa.string()),
                }
            )

        # per-partition summary rows for this batch
        seen, inverse = np.unique(pids, return_inverse=True)
        rows_per = np.bincount(inverse, minlength=len(seen)).astype(np.int64)
        bad_per = (
            np.bincount(inverse[row_bad], minlength=len(seen)).astype(np.int64)
            if row_bad.any()
            else np.zeros(len(seen), dtype=np.int64)
        )
        m = len(seen)
        chunks.append(
            {
                "kind": pa.array(["summary"] * m, pa.string()),
                "partition_id": pa.array(seen, pa.int32()),
                "row_ref": pa.nulls(m, pa.string()),
                "column": pa.nulls(m, pa.string()),
                "code": pa.nulls(m, pa.string()),
                "message": pa.nulls(m, pa.string()),
                "arg": pa.nulls(m, pa.string()),
                "value": pa.nulls(m, pa.string()),
                "rows": pa.array(rows_per, pa.int64()),
                "bad_rows": pa.array(bad_per, pa.int64()),
                "payload": pa.nulls(m, pa.string()),
            }
        )

        tables = [pa.table(c, schema=VIOLATION_SCHEMA) for c in chunks]
        return pa.concat_tables(tables) if len(tables) > 1 else tables[0]


def _argstr(arg: Any) -> str | None:
    if arg is None:
        return None
    if isinstance(arg, str):
        return arg
    import json

    try:
        return json.dumps(arg)
    except (TypeError, ValueError):
        return str(arg)
