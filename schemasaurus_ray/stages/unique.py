"""Global uniqueness — the explicit shuffle rule (SURVEY.md §2E:
uniqueItems v4validator.js:277-290 globalized).

Two-phase salted aggregation:
1. per-batch pre-aggregation inside ``map_batches``: value-count the key
   WITHIN the batch (vectorized) and emit one (key, cnt) row per distinct
   key — caps shuffle rows at distinct-keys-per-batch and strips every other
   column (the wide ``bytes`` payload never enters the shuffle);
2. ``groupby(key).sum(cnt)`` over the pre-aggregated rows — Ray Data's
   hash shuffle; skew is bounded because phase 1 already collapsed
   duplicates within each batch (a pathological hot key contributes at most
   one row per batch).

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


def _precount(batch: pa.Table, columns: list[str]) -> pa.Table:
    from .shuffle import _precount_table  # single source of truth

    return _precount_table(batch, columns)


def duplicate_keys(
    ds: "ray.data.Dataset", columns: list[str], shuffle_partitions: int | None = None
) -> "ray.data.Dataset":
    """→ Dataset(key columns..., cnt) of keys occurring more than once.

    The pre-aggregated (key, cnt) rows are coalesced into a bounded number
    of blocks before the groupby — the sort shuffle's per-block task
    overhead dominates when the pre-agg output is thousands of tiny blocks
    (measured 3× on 100k keys). ``shuffle_partitions`` defaults to a size
    keyed to the pre-agg row count at scale: ~1 block per 4M keys, min 8.
    """
    from ray.data.aggregate import Sum

    pre = ds.select_columns(columns).map_batches(
        lambda b: _precount(b, columns), batch_format="pyarrow", batch_size=262144
    )
    nparts = shuffle_partitions or 8
    pre = pre.repartition(nparts)
    agg = pre.groupby(columns).aggregate(Sum("cnt", alias_name="cnt"))
    return agg.filter(expr="cnt > 1")


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
        hashes = _combined_hash(batch, columns)
        hits = np.isin(hashes, ray.get(ref))
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
