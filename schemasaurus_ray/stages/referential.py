"""Referential integrity — anti-join between two datasets (SURVEY.md §2E:
the reference's only cross-field operator, ``dependencies``
v4validator.js:147-166, lifted cross-table).

Two physical strategies, chosen by the caller (auto by ref-side size):

- ``broadcast``: the referenced key set is hashed to a sorted uint64 array,
  ``ray.put`` ONCE, and every task filters its batch with a vectorized
  ``np.isin`` against the shared object — no shuffle at all. Right whenever
  the dimension side fits in memory (8 bytes/key ⇒ 100M keys = 800 MB).
- ``shuffle``: both sides are reduced to (key, side) rows, unioned, and
  co-grouped with ``groupby(key).map_groups`` — the explicit hash-partitioned
  anti-join for two large fact tables. Only key columns enter the shuffle.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

from ..util import hash_column

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

ORPHAN_SCHEMA = pa.schema(
    [("row_ref", pa.string()), ("column", pa.string()), ("code", pa.string())]
)


def orphan_rows(
    ds: "ray.data.Dataset",
    column: str,
    ref_ds: "ray.data.Dataset",
    ref_column: str,
    method: str = "broadcast",
) -> "ray.data.Dataset":
    """Rows of ``ds`` whose ``column`` value does not exist in
    ``ref_ds.ref_column`` → violation rows (row_ref, column, code)."""
    if method == "broadcast":
        return _orphans_broadcast(ds, column, ref_ds, ref_column)
    return _orphans_shuffle(ds, column, ref_ds, ref_column)


def _orphans_broadcast(ds, column, ref_ds, ref_column):
    import ray

    # hash+dedup the reference keys IN PARALLEL (a map stage emitting
    # uint64 hashes), then union on the driver — only 8 bytes/distinct key
    # ever reach the driver
    def to_hashes(batch: pa.Table) -> pa.Table:
        h = np.unique(hash_column(batch.column(ref_column)))
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64())})

    hashes: list[np.ndarray] = [np.zeros(0, dtype=np.uint64)]
    hash_ds = ref_ds.select_columns([ref_column]).map_batches(
        to_hashes, batch_format="pyarrow", batch_size=262144
    )
    for batch in hash_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        hashes.append(np.asarray(batch.column("h").combine_chunks()).view(np.uint64))
    key_set = np.unique(np.concatenate(hashes))
    ref = ray.put(key_set)

    def mark(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)  # zero-copy shared-memory read per task
        col = batch.column(column)
        h = hash_column(col)
        valid = ~np.asarray(
            pa.compute.is_null(col.combine_chunks()) if col.null_count else pa.array([False] * len(col))
        )
        # keys is sorted (np.unique) → binary search instead of np.isin,
        # which would re-sort the whole key set per batch
        if len(keys):
            pos = np.searchsorted(keys, h).clip(max=len(keys) - 1)
            member = keys[pos] == h
        else:
            member = np.zeros(len(h), dtype=bool)
        orphan = (~member) & valid
        idx = np.nonzero(orphan)[0]
        refs = col.combine_chunks().cast(pa.string()).take(pa.array(idx, pa.int64()))
        n = len(idx)
        return pa.table(
            {
                "row_ref": refs,
                "column": pa.array([column] * n, pa.string()),
                "code": pa.array(["reference"] * n, pa.string()),
            },
            schema=ORPHAN_SCHEMA,
        )

    return ds.select_columns([column]).map_batches(mark, batch_format="pyarrow")


def _orphans_shuffle(ds, column, ref_ds, ref_column):
    """Explicit co-partitioned anti-join: union tagged key rows, group by
    key, emit left keys whose group has no right row."""

    def tag_left(batch: pa.Table) -> pa.Table:
        col = batch.column(column).combine_chunks().cast(pa.string())
        return pa.table({"k": col.drop_null(), "side": pa.array([0] * (len(col) - col.null_count), pa.int8())})

    def tag_right(batch: pa.Table) -> pa.Table:
        col = batch.column(ref_column).combine_chunks().cast(pa.string())
        uniq = col.drop_null().unique()
        return pa.table({"k": uniq, "side": pa.array([1] * len(uniq), pa.int8())})

    left = ds.select_columns([column]).map_batches(tag_left, batch_format="pyarrow")
    right = ref_ds.select_columns([ref_column]).map_batches(tag_right, batch_format="pyarrow")
    both = left.union(right)

    def anti(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("side").combine_chunks())
        if (side == 1).any():
            return ORPHAN_SCHEMA.empty_table()
        ks = group.column("k").combine_chunks()
        n = len(ks)
        return pa.table(
            {
                "row_ref": ks,
                "column": pa.array([column] * n, pa.string()),
                "code": pa.array(["reference"] * n, pa.string()),
            },
            schema=ORPHAN_SCHEMA,
        )

    return both.groupby("k").map_groups(anti, batch_format="pyarrow")
