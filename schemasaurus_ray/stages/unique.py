"""Global uniqueness — the explicit shuffle rule (SURVEY.md §2E:
uniqueItems v4validator.js:277-290 globalized).

Two-phase salted aggregation:
1. per-block pre-aggregation inside the raw-shuffle map tasks: value-count
   the key WITHIN the block (vectorized) and emit one (key, cnt) row per
   distinct key — caps shuffle rows at distinct-keys-per-block and strips
   every other column (the wide ``bytes`` payload never enters the shuffle);
2. key-hash bucket shuffle + reduce-side sum over the pre-aggregated rows
   (stages/shuffle.agg_keys_shuffled — raw Ray, not Dataset.groupby); skew
   is bounded because phase 1 already collapsed duplicates within each
   block (a pathological hot key contributes at most one row per block).

Composite keys are supported by hashing the tuple into a single key column
and keeping the original columns for reporting.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def duplicate_keys(
    ds: "ray.data.Dataset", columns: list[str], shuffle_partitions: int | None = None
) -> "ray.data.Dataset":
    """→ Dataset(key columns..., cnt) of keys occurring more than once.

    Routed through the raw bucket shuffle (stages/shuffle.agg_keys_shuffled;
    VERDICT r4 #3): the streaming map_batches pass value-counts each block
    (the combiner — a hot key contributes at most one row per block, and
    only those tiny (key, cnt) blocks are ever pinned as refs; any other
    column never leaves its block), then the shuffle sums counts per key
    and the count>1 HAVING runs inside the reduce tasks, so only violating
    keys exist anywhere. Replaces the former repartition → Ray Data
    sort-groupby (measured 60× slower on string keys, CLAUDE.md).
    ``shuffle_partitions`` maps to the reduce-bucket count (None = derived
    from block count)."""
    import ray.data as rd

    from ..util import arrow_block_refs
    from .shuffle import _precount_table, agg_keys_shuffled

    pre = ds.select_columns(columns).map_batches(
        lambda b: _precount_table(b, columns), batch_format="pyarrow"
    )
    refs = arrow_block_refs(pre)
    if not refs:
        sch = ds.schema()  # empty input: trivial plan
        empty = pa.schema(
            [(c, sch.field(c).type) for c in columns] + [("cnt", pa.int64())]
        ).empty_table()
        return rd.from_arrow(empty)

    def having(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("sum_cnt"), 1))
        return t.rename_columns(columns + ["cnt"])

    out = agg_keys_shuffled(
        refs,
        columns,
        [("cnt", "sum")],
        num_buckets=shuffle_partitions,
        having_fn=having,
        read_cols=columns + ["cnt"],
        output="refs",
    )
    return rd.from_arrow_refs(out)


def duplicate_rows(ds: "ray.data.Dataset", columns: list[str]) -> "ray.data.Dataset":
    """Violation view: every row whose key occurs more than once, as
    (row_ref, column, code) violation rows. Broadcast-free: reuses
    duplicate_keys then semi-joins by key hash inside map_batches."""
    import ray

    from ..util import hash_column

    dups = duplicate_keys(ds, columns)
    dup_tbl = pa.concat_tables(
        [pa.table(b) if isinstance(b, dict) else b for b in dups.iter_batches(batch_format="pyarrow")]
        or [pa.schema([(c, pa.string()) for c in columns]).empty_table()]
    )
    if dup_tbl.num_rows == 0:
        empty = pa.schema(
            [("row_ref", pa.string()), ("column", pa.string()), ("code", pa.string()), ("cnt", pa.int64())]
        ).empty_table()
        return ray.data.from_arrow(empty)
    key_hashes = np.sort(_combined_hash(dup_tbl, columns))
    ref = ray.put(key_hashes)
    colname = "+".join(columns)

    def mark(batch: pa.Table) -> pa.Table:
        from ..util import sorted_lookup

        hashes = _combined_hash(batch, columns)
        # key_hashes is pre-sorted: one searchsorted probe per batch beats
        # np.isin's per-call re-sort (util.sorted_lookup convention)
        _pos, hits = sorted_lookup(ray.get(ref), hashes)
        idx = np.nonzero(hits)[0]
        refs = _row_refs(batch, columns, idx)
        return pa.table(
            {
                "row_ref": refs,
                "column": pa.array([colname] * len(idx), pa.string()),
                "code": pa.array(["unique"] * len(idx), pa.string()),
            }
        )

    return ds.select_columns(columns).map_batches(mark, batch_format="pyarrow")


def _combined_hash(table: pa.Table, columns: list[str]) -> np.ndarray:
    from .shuffle import _combined_hash as _impl  # single source of truth

    return _impl(table, columns)


def _row_refs(table: pa.Table, columns: list[str], idx: np.ndarray) -> pa.Array:
    ind = pa.array(idx, pa.int64())
    if len(columns) == 1:
        return table.column(columns[0]).combine_chunks().cast(pa.string()).take(ind)
    parts = [table.column(c).combine_chunks().cast(pa.string()).take(ind) for c in columns]
    out = parts[0]
    for p in parts[1:]:
        out = pc.binary_join_element_wise(out, p, "|")
    return out
