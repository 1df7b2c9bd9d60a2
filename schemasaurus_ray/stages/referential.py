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

from ..util import arrow_block_refs, hash_column

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

    Each side is scanned ONCE. Ref side: one prep pass emits per-batch
    distinct keys as tiny (k, h) blocks, materialized; the filter is sized
    from their count (an upper bound — only over-provisions bits), built
    from the in-memory blocks (per-partial bitmaps OR-merged; switch to a
    tree reduce when batches × m/8 outgrows the driver) and broadcast ONCE
    via ``ray.put`` (tasks read the word array zero-copy). Probe: one
    map_batches over the dirty side classifies every row — filter-rejected
    keys are DEFINITE orphans (no false negatives) and never touch a
    shuffle; filter-passing keys are pre-aggregated to per-batch (key,
    cnt) rows. The probe output is materialized (it is the pre-agg, tiny)
    because both the definite-expansion and the confirm consume it — two
    lazy consumers would re-run the probe. Exact mode routes ONLY the
    survivors through a raw-Ray bucketed anti-join against the prepped ref
    keys (NOT Dataset.groupby — measured 60× slower on string keys),
    carrying cnt so per-occurrence violation semantics are preserved;
    approx mode stops at the definite orphans, missing at most ``fp_rate``
    of orphan *keys* — zero shuffle, fixed memory."""
    import ray
    import ray.data as rd

    from ..state.bloom import BloomFilter
    from .shuffle import _split_buckets, _tree_combine

    def prep_ref(batch: pa.Table) -> pa.Table:
        col = batch.column(ref_column).drop_null()
        uniq = (col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col).unique()
        return pa.table(
            {
                "k": uniq.cast(pa.string()),
                "h": pa.array(hash_column(uniq).view(np.int64), pa.int64()),
            }
        )

    ref_keys = (
        ref_ds.select_columns([ref_column])
        .map_batches(prep_ref, batch_format="pyarrow", batch_size=262144)
        .materialize()
    )
    n_upper = ref_keys.count()  # metadata count on materialized blocks
    proto = BloomFilter.sized_for(max(n_upper, 1), fp_rate)
    m, k = proto.m, proto.k

    def build(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(m, k)
        if len(batch):
            bf.add_hashes(np.asarray(batch.column("h").combine_chunks()).view(np.uint64))
        return pa.table({"words": pa.array([bf.words.tobytes()], pa.binary())})

    merged = BloomFilter(m, k)
    for b in ref_keys.map_batches(build, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
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

    marked = (
        ds.select_columns([column]).map_batches(probe, batch_format="pyarrow").materialize()
    )

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

    # exact confirm of the filter-passing keys: raw-Ray bucketed anti-join
    # at (key, cnt) granularity — false positives are orphans, members
    # vanish; both sides are already per-batch-distinct blocks
    num_buckets = 4

    _EMPTY_KC = pa.table({"k": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
    _EMPTY_K = pa.table({"k": pa.array([], pa.string())})

    @ray.remote(num_returns=num_buckets)
    def map_cand(tbl: pa.Table):
        if "k" not in tbl.column_names:  # schema-less empty block
            return [_EMPTY_KC] * num_buckets if num_buckets > 1 else _EMPTY_KC
        sel = tbl.filter(pa.compute.equal(tbl.column("definite"), 0))
        counts = pa.table(
            {"k": sel.column("k"), "cnt": sel.column("cnt").cast(pa.int64())}
        )
        out = _split_buckets(counts, ["k"], num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote(num_returns=num_buckets)
    def map_ref(tbl: pa.Table):
        if "k" not in tbl.column_names:  # schema-less empty block
            return [_EMPTY_K] * num_buckets if num_buckets > 1 else _EMPTY_K
        keys = pa.table({"k": tbl.column("k")})
        out = _split_buckets(keys, ["k"], num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote
    def combine(*tables: pa.Table) -> pa.Table:
        return pa.concat_tables(tables)

    @ray.remote
    def reduce_bucket(n_cand: int, *tables: pa.Table) -> pa.Table:
        cand = pa.concat_tables(tables[:n_cand])
        refk = pa.concat_tables(tables[n_cand:])
        if cand.num_rows == 0:
            return ORPHAN_SCHEMA.empty_table()
        agg = cand.group_by(["k"]).aggregate([("cnt", "sum")]).rename_columns(["k", "cnt"])
        member = pa.compute.is_in(agg.column("k"), value_set=refk.column("k").combine_chunks())
        orphans = agg.filter(pa.compute.invert(member))
        return _violations_from_keys(
            orphans.column("k").combine_chunks(),
            np.asarray(orphans.column("cnt").combine_chunks(), dtype=np.int64),
            column,
        )

    cand_refs = [map_cand.remote(r) for r in arrow_block_refs(marked)]
    ref_refs = [map_ref.remote(r) for r in arrow_block_refs(ref_keys)]
    if num_buckets == 1:
        cand_refs = [[r] for r in cand_refs]
        ref_refs = [[r] for r in ref_refs]
    reduced = []
    for b in range(num_buckets):
        lc = _tree_combine([cand_refs[i][b] for i in range(len(cand_refs))], combine)
        rc = _tree_combine([ref_refs[i][b] for i in range(len(ref_refs))], combine)
        reduced.append(reduce_bucket.remote(len(lc), *lc, *rc))
    confirmed = [t for t in ray.get(reduced) if t.num_rows]
    conf_tbl = pa.concat_tables(confirmed) if confirmed else ORPHAN_SCHEMA.empty_table()
    return definite_viol.union(rd.from_arrow(conf_tbl))


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
