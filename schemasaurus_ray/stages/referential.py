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
    fp_rate: float = 0.01,
) -> "ray.data.Dataset":
    """Rows of ``ds`` whose ``column`` value does not exist in
    ``ref_ds.ref_column`` → violation rows (row_ref, column, code).

    Methods: ``broadcast`` (exact 64-bit key set, 8 B/key), ``shuffle``
    (co-partitioned anti-join), ``bloom`` (EXACT: fixed ~10-bit/key sketch
    classifies rows — definite orphans emitted with zero shuffle, only the
    filter-passing keys enter the exact confirm), ``bloom_approx``
    (definite orphans only: zero shuffle, misses ≤ ``fp_rate`` of orphan
    keys — the bounded-error mode for advisory checks)."""
    if method == "broadcast":
        return _orphans_broadcast(ds, column, ref_ds, ref_column)
    if method in ("bloom", "bloom_approx"):
        return _orphans_bloom(ds, column, ref_ds, ref_column, fp_rate, exact=method == "bloom")
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


def _violations_from_keys(keys: pa.Array, counts: np.ndarray, column: str) -> pa.Table:
    """Expand (key, cnt) → one violation row per original occurrence."""
    idx = np.repeat(np.arange(len(keys), dtype=np.int64), counts)
    refs = keys.take(pa.array(idx, pa.int64()))
    n = len(idx)
    return pa.table(
        {
            "row_ref": refs,
            "column": pa.array([column] * n, pa.string()),
            "code": pa.array(["reference"] * n, pa.string()),
        },
        schema=ORPHAN_SCHEMA,
    )


def _orphans_bloom(ds, column, ref_ds, ref_column, fp_rate, exact):
    """Bloom-summarized referential check (state/bloom.py).

    Build: per-batch partial bitmaps over the ref keys OR-merged on the
    driver (associative — switch to a tree reduce when batches × m/8
    outgrows the driver), broadcast ONCE via ``ray.put`` (tasks read the
    word array zero-copy from the object store). Probe: one map_batches
    over the dirty side classifies every row — filter-rejected keys are
    DEFINITE orphans (no false negatives) and never touch a shuffle;
    filter-passing keys are pre-aggregated to per-batch (key, cnt) rows.
    Exact mode routes ONLY those survivors through the co-partitioned
    anti-join (carrying cnt so per-occurrence violation semantics are
    preserved); approx mode stops at the definite orphans, missing at most
    ``fp_rate`` of orphan *keys* — zero shuffle, fixed memory."""
    import ray

    from ..state.bloom import BloomFilter

    n_ref = ref_ds.count()
    proto = BloomFilter.sized_for(max(n_ref, 1), fp_rate)
    m, k = proto.m, proto.k

    def build(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(m, k)
        col = batch.column(ref_column).drop_null()
        if len(col):
            bf.add_hashes(np.unique(hash_column(col)))
        return pa.table({"words": pa.array([bf.words.tobytes()], pa.binary())})

    merged = BloomFilter(m, k)
    built = ref_ds.select_columns([ref_column]).map_batches(
        build, batch_format="pyarrow", batch_size=262144
    )
    for b in built.iter_batches(batch_format="pyarrow", batch_size=None):
        for w in b.column("words").to_pylist():
            merged.words |= np.frombuffer(w, dtype=np.uint64)
    words_ref = ray.put(merged.words)

    def probe(batch: pa.Table) -> pa.Table:
        shell = BloomFilter(m, k)
        shell.words = ray.get(words_ref)  # zero-copy shared-memory view
        col = batch.column(column).combine_chunks()
        valid = ~np.asarray(pa.compute.is_null(col)) if col.null_count else np.ones(len(col), bool)
        h = hash_column(col)
        maybe = shell.contains_hashes(h) & valid
        definite = ~maybe & valid
        ks = col.cast(pa.string())
        parts = []
        for mask, flag in ((definite, 1), (maybe, 0)):
            if not mask.any() or (flag == 0 and not exact):
                continue
            sub = ks.filter(pa.array(mask))
            vc = sub.value_counts()
            parts.append(
                pa.table(
                    {
                        "k": vc.field("values"),
                        "cnt": vc.field("counts"),
                        "definite": pa.array([flag] * len(vc), pa.int8()),
                    }
                )
            )
        if not parts:
            return pa.table(
                {"k": pa.array([], pa.string()), "cnt": pa.array([], pa.int64()),
                 "definite": pa.array([], pa.int8())}
            )
        return pa.concat_tables(parts)

    marked = ds.select_columns([column]).map_batches(probe, batch_format="pyarrow")

    def expand_definite(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pa.compute.equal(batch.column("definite"), 1))
        return _violations_from_keys(
            sel.column("k").combine_chunks(),
            np.asarray(sel.column("cnt").combine_chunks(), dtype=np.int64),
            column,
        )

    definite_viol = marked.map_batches(expand_definite, batch_format="pyarrow")
    if not exact:
        return definite_viol

    # exact confirm of the filter-passing keys: co-partitioned anti-join at
    # (key, cnt) granularity — false positives are orphans, members vanish
    cand = marked.filter(expr="definite == 0")

    def tag_cand(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": batch.column("k").combine_chunks(),
                "cnt": batch.column("cnt").combine_chunks().cast(pa.int64()),
                "side": pa.array([0] * len(batch), pa.int8()),
            }
        )

    def tag_ref(batch: pa.Table) -> pa.Table:
        col = batch.column(ref_column).combine_chunks().cast(pa.string())
        uniq = col.drop_null().unique()
        return pa.table(
            {
                "k": uniq,
                "cnt": pa.array([0] * len(uniq), pa.int64()),
                "side": pa.array([1] * len(uniq), pa.int8()),
            }
        )

    left = cand.map_batches(tag_cand, batch_format="pyarrow")
    right = ref_ds.select_columns([ref_column]).map_batches(tag_ref, batch_format="pyarrow")
    both = left.union(right)

    def anti(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("side").combine_chunks())
        if (side == 1).any():
            return ORPHAN_SCHEMA.empty_table()
        total = int(np.asarray(group.column("cnt").combine_chunks()).sum())
        key = group.column("k").combine_chunks().slice(0, 1)
        return _violations_from_keys(key, np.array([total], dtype=np.int64), column)

    confirmed = both.groupby("k").map_groups(anti, batch_format="pyarrow")
    return definite_viol.union(confirmed)


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
