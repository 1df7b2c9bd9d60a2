"""Length-bucketed sequence packing — assign documents to fixed
token-budget bins for training-batch construction.

The exactly-reproducible (and SQL-expressible) packing discipline used by
bucketed batching: docs are classed into power-of-two length buckets
(bucket b holds docs with 2^(b-1) < n_tokens <= 2^b), each bucket has a
fixed per-bin capacity ``max(budget // 2^b, 1)``, and bin membership is
rank arithmetic over the bucket's docs ordered by id. Guarantees: every
bin's token sum <= budget (docs longer than the budget become singleton
bins for downstream truncation), utilization >= 50% on full bins (each doc
is > half its bucket's upper bound), and the assignment is deterministic
and layout-independent (pure function of the (id, n_tokens) multiset).

Scale shape: the only shuffle carries (bucket int64, id int64) = 16 B/doc;
one reduce task per length bucket (cardinality ~ log2(max_len) ~ 20) sorts
its ids and emits bins. At 10^12 docs a single bucket's ids outgrow one
task — split each bucket's reduce by id range and offset each range's bins
by the prefix sum of per-range counts (counts come free from the map
partials); the rank arithmetic is unchanged. Engine-native op (no
reference counterpart; the reference validates one document at a time).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import arrow_block_refs

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_MAX_BUCKETS = 24  # supports docs up to 2^23 tokens


def length_buckets(n_tokens: np.ndarray) -> np.ndarray:
    """Power-of-two length class: ceil(log2(max(n, 1))). Exact for the
    integer inputs in range (log2 of a power of two is exact in IEEE
    double — same result as the DuckDB oracle's CEIL(LOG2(...)))."""
    nt = np.maximum(np.asarray(n_tokens, dtype=np.int64), 1)
    return np.ceil(np.log2(nt)).astype(np.int64)


def bucket_capacity(bucket: np.ndarray, budget: int) -> np.ndarray:
    """Docs per bin for each bucket: max(budget // 2^b, 1)."""
    b = np.asarray(bucket, dtype=np.int64)
    return np.maximum(budget >> np.minimum(b, 62), 1)


def pack_by_length_buckets(
    keys_ds: "ray.data.Dataset",
    budget: int,
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
) -> pa.Table:
    """Distributed bin assignment from a (id, bucket) dataset: one raw-Ray
    reduce per length bucket sorts the bucket's ids and emits
    ``bin = rank // capacity``. Returns (id, bucket, bin)."""
    import ray

    from ..stages.shuffle import _tree_combine

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            bucket_col: pa.array([], pa.int64()),
            "bin": pa.array([], pa.int64()),
        }
    )

    @ray.remote(num_returns=_MAX_BUCKETS)
    def map_block(tbl: pa.Table) -> list[pa.Table]:
        e = pa.table({id_col: pa.array([], pa.int64())})
        if tbl.num_rows == 0 or bucket_col not in tbl.column_names:
            # union/empty sentinel blocks can carry an empty schema
            return [e] * _MAX_BUCKETS
        b = np.asarray(tbl.column(bucket_col).combine_chunks(), dtype=np.int64)
        ids = np.asarray(tbl.column(id_col).combine_chunks(), dtype=np.int64)
        order = np.argsort(b, kind="stable")
        bs, is_ = b[order], ids[order]
        bounds = np.searchsorted(bs, np.arange(_MAX_BUCKETS + 1))
        return [
            pa.table({id_col: pa.array(is_[bounds[x] : bounds[x + 1]], pa.int64())})
            for x in range(_MAX_BUCKETS)
        ]

    @ray.remote
    def combine_bucket(*tables: pa.Table) -> pa.Table:
        return pa.concat_tables(tables)

    @ray.remote
    def reduce_bucket(k: int, *tables: pa.Table) -> pa.Table:
        if not tables:
            return empty
        t = pa.concat_tables(tables)
        if t.num_rows == 0:
            return empty
        ids = np.sort(np.asarray(t.column(id_col).combine_chunks(), dtype=np.int64))
        cap = max(budget >> min(k, 62), 1)
        bins = np.arange(len(ids), dtype=np.int64) // cap
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                bucket_col: pa.array(np.full(len(ids), k, dtype=np.int64), pa.int64()),
                "bin": pa.array(bins, pa.int64()),
            }
        )

    refs = [map_block.remote(r) for r in arrow_block_refs(keys_ds)]
    if not refs:
        return empty
    reduced = [
        reduce_bucket.remote(k, *_tree_combine([refs[m][k] for m in range(len(refs))], combine_bucket))
        for k in range(_MAX_BUCKETS)
    ]
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return empty
    return pa.concat_tables(tables)


def pack_documents_ds(
    ds: "ray.data.Dataset",
    budget: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """End-to-end: tokenize (whitespace \\S+ count, the engine's proven
    token basis), bucket, pack. Text never leaves the map tasks."""
    from .text import TOKEN_RE

    def to_keys(batch: pa.Table) -> pa.Table:
        nt = pc.cast(pc.count_substring_regex(batch.column(text_col), TOKEN_RE), pa.int64())
        b = length_buckets(np.asarray(nt.combine_chunks() if isinstance(nt, pa.ChunkedArray) else nt))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "bucket": pa.array(b, pa.int64()),
            }
        )

    keys_ds = ds.select_columns([id_col, text_col]).map_batches(to_keys, batch_format="pyarrow")
    return pack_by_length_buckets(keys_ds, budget, id_col=id_col)
