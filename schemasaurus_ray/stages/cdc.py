"""Snapshot diff (CDC): row-level change detection between two keyed
table snapshots — the incremental sibling of spec-space drift
(stages/infer.spec_diff_profiles compares PROFILES; this compares ROWS).

A 100-TB lakehouse re-validates snapshots daily; recomputing everything is
wasteful and "what changed since the blessed snapshot" is itself a
first-class validation product (the reference's closest surface is its
whole-table revalidation — this is the engine-native incremental form).

Scale shape (the only one that survives 100 TB):
- each side's shards map INDEPENDENTLY: read only key+value columns, fold
  every row's value columns into ONE 64-bit content hash
  (util.hash_column per column, splitmix64-mixed in fixed column order),
  then pre-agg per key to (cnt, xor(content), sum(content)) — O(distinct
  keys/shard) rows of 32 bytes enter the shuffle, never the row payload;
- partials bucket by key hash (same bucketing as stages/shuffle) and
  tree-combine: cnt/sum add, xor xors — all associative, so the merge is
  a pure combiner tree with no ordering requirement;
- each reduce bucket compares sides per key: key only in new → 'added',
  only in old → 'removed', present in both with differing (cnt, xor, sum)
  multiset signature → 'changed'; unchanged keys are NEVER emitted (the
  common case at 100 TB is ~0.1% churn — output is O(changes)).

Multiset semantics: duplicate keys per side are folded into the (cnt,
xor, sum) signature, so "changed" means the key's row MULTISET differs.
Signature equality is probabilistic in principle (64-bit hashes) with
collision odds ~n/2^64 per key — the standard CDC trade (content hashes,
not byte comparison).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..util import hash_column, splitmix64
from .shuffle import _default_buckets, _split_buckets, _tree_combine

_PARTIAL_COLS = ("__cnt", "__xh", "__sh")


def row_content_hash(tbl: pa.Table, value_cols: list[str]) -> np.ndarray:
    """One uint64 per row folding the listed columns in fixed order:
    h = splitmix64(h ^ hash_column(col, seed=i)). Column order matters and
    is pinned by the caller's list; nulls hash via hash_column's sentinel
    rules (null == -1 for ints, NaN bits for floats, b'' for strings)."""
    h = np.zeros(tbl.num_rows, dtype=np.uint64)
    for i, c in enumerate(value_cols):
        h = splitmix64(h ^ hash_column(tbl.column(c), seed=i + 1))
    return h


def _preagg_side(tbl: pa.Table, key_cols: list[str], value_cols: list[str]) -> pa.Table:
    """(key..., cnt, xor, sum) per key for one shard — numpy group-fold via
    lexsort on the key hash (xor has no Arrow group_by kernel)."""
    if tbl.num_rows == 0:
        cols = {c: tbl.column(c) for c in key_cols}
        for p in _PARTIAL_COLS:
            cols[p] = pa.array([], pa.int64())
        return pa.table(cols)
    ch = row_content_hash(tbl, value_cols)
    kh = np.zeros(tbl.num_rows, dtype=np.uint64)
    for i, c in enumerate(key_cols):
        kh = splitmix64(kh ^ hash_column(tbl.column(c), seed=101 + i))
    order = np.argsort(kh, kind="stable")
    kh_s, ch_s = kh[order], ch[order]
    bounds = np.flatnonzero(np.r_[True, kh_s[1:] != kh_s[:-1]])
    cnt = np.diff(np.r_[bounds, len(kh_s)]).astype(np.int64)
    xh = np.bitwise_xor.reduceat(ch_s, bounds) if len(ch_s) else np.zeros(0, np.uint64)
    with np.errstate(over="ignore"):
        sh = np.add.reduceat(ch_s, bounds) if len(ch_s) else np.zeros(0, np.uint64)
    first = order[bounds]  # representative row per key (carries key values)
    cols = {c: tbl.column(c).take(pa.array(first, pa.int64())) for c in key_cols}
    cols["__cnt"] = pa.array(cnt, pa.int64())
    cols["__xh"] = pa.array(xh.view(np.int64), pa.int64())
    cols["__sh"] = pa.array(sh.view(np.int64), pa.int64())
    return pa.table(cols)


def _merge_partials(tables: tuple, key_cols: list[str]) -> pa.Table:
    live = [t for t in tables if t.num_rows]
    if not live:
        return tables[0]
    merged = pa.concat_tables(live).combine_chunks()
    kh = np.zeros(merged.num_rows, dtype=np.uint64)
    for i, c in enumerate(key_cols):
        kh = splitmix64(kh ^ hash_column(merged.column(c), seed=101 + i))
    order = np.argsort(kh, kind="stable")
    kh_s = kh[order]
    bounds = np.flatnonzero(np.r_[True, kh_s[1:] != kh_s[:-1]])
    cnt = np.asarray(merged.column("__cnt").combine_chunks(), dtype=np.int64)[order]
    xh = np.asarray(merged.column("__xh").combine_chunks()).view(np.uint64)[order]
    sh = np.asarray(merged.column("__sh").combine_chunks()).view(np.uint64)[order]
    seg_cnt = np.add.reduceat(cnt, bounds)
    seg_xh = np.bitwise_xor.reduceat(xh, bounds)
    with np.errstate(over="ignore"):
        seg_sh = np.add.reduceat(sh, bounds)
    first = order[bounds]
    cols = {c: merged.column(c).take(pa.array(first, pa.int64())) for c in key_cols}
    cols["__cnt"] = pa.array(seg_cnt, pa.int64())
    cols["__xh"] = pa.array(seg_xh.view(np.int64), pa.int64())
    cols["__sh"] = pa.array(seg_sh.view(np.int64), pa.int64())
    return pa.table(cols)


def snapshot_diff(
    old_paths: list[str],
    new_paths: list[str],
    key_cols: list[str],
    value_cols: list[str],
    num_buckets: int | None = None,
    old_transform=None,
    new_transform=None,
) -> pa.Table:
    """Distributed keyed snapshot diff over parquet shards. Returns
    (key..., change) rows, change ∈ {'added','removed','changed'},
    unsorted (callers sort the small result). ``*_transform(tbl) -> tbl``
    runs per shard before hashing (derive/cast columns in-flight — the
    'new snapshot' can be a pure function of the old shards, no
    materialization)."""
    import ray

    num_buckets = num_buckets or _default_buckets(len(old_paths) + len(new_paths))
    read_cols = sorted(set(key_cols) | set(value_cols))

    @ray.remote(num_returns=num_buckets)
    def map_shard(path: str, side: int):
        tbl = pq.read_table(path, columns=read_cols)
        tf = old_transform if side == 0 else new_transform
        if tf is not None:
            tbl = tf(tbl)
        parts = _preagg_side(tbl, key_cols, value_cols)
        out = _split_buckets(parts, key_cols, num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote
    def combine_bucket(*tables: pa.Table) -> pa.Table:
        return _merge_partials(tables, key_cols)

    @ray.remote
    def diff_bucket(n_old: int, *tables: pa.Table) -> pa.Table:
        o = _merge_partials(tables[:n_old], key_cols)
        n = _merge_partials(tables[n_old:], key_cols)

        def sig(t: pa.Table):
            kh = np.zeros(t.num_rows, dtype=np.uint64)
            for i, c in enumerate(key_cols):
                kh = splitmix64(kh ^ hash_column(t.column(c), seed=101 + i))
            return kh

        def lookup(hay_sorted: np.ndarray, needles: np.ndarray):
            """(found_mask, position_in_hay) — safe for empty arrays."""
            if len(hay_sorted) == 0 or len(needles) == 0:
                return np.zeros(len(needles), dtype=bool), np.zeros(len(needles), np.int64)
            pos = np.minimum(np.searchsorted(hay_sorted, needles), len(hay_sorted) - 1)
            return hay_sorted[pos] == needles, pos

        okh, nkh = sig(o), sig(n)
        oo, no_ = np.argsort(okh, kind="stable"), np.argsort(nkh, kind="stable")
        okh_s, nkh_s = okh[oo], nkh[no_]
        in_new, pos = lookup(nkh_s, okh_s)
        removed_idx = oo[~in_new]
        om, nm = oo[in_new], no_[pos[in_new]]
        changed = np.zeros(len(om), dtype=bool)
        for col in _PARTIAL_COLS:
            ov = np.asarray(o.column(col).combine_chunks())[om]
            nv = np.asarray(n.column(col).combine_chunks())[nm]
            changed |= ov != nv
        changed_idx = om[changed]
        in_old, _ = lookup(okh_s, nkh_s)
        added_idx = no_[~in_old]

        def emit(t: pa.Table, idx: np.ndarray, label: str) -> pa.Table:
            sel = t.select(key_cols).take(pa.array(idx, pa.int64()))
            return sel.append_column("change", pa.array([label] * len(idx), pa.string()))

        outs = [
            emit(n, added_idx, "added"),
            emit(o, removed_idx, "removed"),
            emit(o, changed_idx, "changed"),
        ]
        return pa.concat_tables([t for t in outs if t.num_rows] or outs[:1])

    old_refs = [map_shard.remote(p, 0) for p in sorted(old_paths)]
    new_refs = [map_shard.remote(p, 1) for p in sorted(new_paths)]
    if num_buckets == 1:
        old_refs = [[r] for r in old_refs]
        new_refs = [[r] for r in new_refs]
    reduced = []
    for b in range(num_buckets):
        ob = _tree_combine([old_refs[m][b] for m in range(len(old_refs))], combine_bucket)
        nb = _tree_combine([new_refs[m][b] for m in range(len(new_refs))], combine_bucket)
        reduced.append(diff_bucket.remote(len(ob), *ob, *nb))
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return pa.table(
            {**{c: pa.array([], pa.int64()) for c in key_cols}, "change": pa.array([], pa.string())}
        )
    return pa.concat_tables(tables)
