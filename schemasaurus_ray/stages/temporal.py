"""Temporal keyed operators — as-of join, bounded-range counting and
sessionization — as hash-partitioned shuffles with fully vectorized
merged-sort kernels.

These are the point-in-time operators a training-data pipeline needs
(\"seconds since last purchase\", \"events in the preceding hour\",
\"session id\") that Ray Data has no primitive for. Reference counterpart:
none (SURVEY.md §2G custom operators); the reference's per-row visitor
could only express these as O(n²) row loops.

Physical plan (same raw-Ray map/reduce shape as stages/shuffle.py, and for
the same measured reason — Ray Data's sort-based groupby is ~60× slower on
this machine for key shuffles):

- **map** (one task per input shard / block): project ONLY
  (key, ts, carry…) columns, split rows by ``splitmix64(key) % B`` into B
  bucket tables. No pre-aggregation is possible (the ops are row-level),
  but nothing except the projected columns ever moves.
- **reduce** (one task per bucket): concat both sides' bucket slices,
  run ONE vectorized numpy kernel (lexsort + cumulative scan — O(n log n),
  no per-row Python), emit result rows.

Co-partitioning comes from the shared key hash, so every key's full
history lands in exactly one reduce task — the partitioning assumption
these semantics require. Skew note for 100 TB: a single pathological key
(one user with a billion events) serializes into one reduce; the
mitigation is time-sliced sub-partitioning with a one-window overlap
(carry the last `max_gap`/`window` of each slice into the next), which
composes with these kernels but is not needed at the test scales.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .shuffle import _default_buckets, _split_buckets, _tree_combine

from ..util import arrow_block_refs

# ---------------------------------------------------------------------------
# vectorized kernels (pure numpy; unit-tested against brute force)
# ---------------------------------------------------------------------------


def _segment_starts(sorted_keys: np.ndarray) -> np.ndarray:
    """Boolean mask: True where a new key segment begins in a key-sorted
    array."""
    new = np.empty(sorted_keys.shape[0], dtype=bool)
    if sorted_keys.shape[0]:
        new[0] = True
        np.not_equal(sorted_keys[1:], sorted_keys[:-1], out=new[1:])
    return new


def asof_last_indices(
    keys_l: np.ndarray,
    ts_l: np.ndarray,
    keys_r: np.ndarray,
    ts_r: np.ndarray,
    strict: bool = False,
) -> np.ndarray:
    """For each left row i, the index j into the RIGHT arrays of the row
    with ``keys_r[j] == keys_l[i]`` and maximal ``ts_r[j] <= ts_l[i]``
    (``<`` when ``strict``); -1 where no such row exists.

    Merged-sort trick, fully vectorized: sort right by (key, ts), merge
    both sides sorted by (key, ts, side-flag), then a single
    ``np.maximum.accumulate`` over right-row positions gives each left row
    its latest preceding right row. A maximum carried across a key-segment
    boundary is detected (and nulled) by re-checking the matched row's key
    — the carried position always belongs to a different key.
    """
    n_r, n_l = keys_r.shape[0], keys_l.shape[0]
    out = np.full(n_l, -1, dtype=np.int64)
    if n_r == 0 or n_l == 0:
        return out
    order_r = np.lexsort((ts_r, keys_r))
    rk, rt = keys_r[order_r], ts_r[order_r]

    keys = np.concatenate([rk, keys_l])
    ts = np.concatenate([rt, ts_l])
    # at equal ts: inclusive ⇒ right rows sort BEFORE left probes (flag 0<1);
    # strict ⇒ probes first, so an equal-ts right row is not visible to them
    rflag, lflag = (1, 0) if strict else (0, 1)
    flag = np.concatenate(
        [np.full(n_r, rflag, np.int8), np.full(n_l, lflag, np.int8)]
    )
    marker = np.concatenate(
        [np.arange(n_r, dtype=np.int64), np.full(n_l, -1, np.int64)]
    )
    lidx = np.concatenate(
        [np.full(n_r, -1, np.int64), np.arange(n_l, dtype=np.int64)]
    )
    perm = np.lexsort((flag, ts, keys))
    m = np.maximum.accumulate(marker[perm])
    lperm = lidx[perm]
    sel = lperm >= 0
    lpos = lperm[sel]
    mm = m[sel]
    valid = mm >= 0
    matched = np.clip(mm, 0, None)
    valid &= rk[matched] == keys_l[lpos]
    out[lpos[valid]] = order_r[mm[valid]]
    return out


def count_before(
    keys_p: np.ndarray,
    ts_p: np.ndarray,
    keys_r: np.ndarray,
    ts_r: np.ndarray,
) -> np.ndarray:
    """For each probe row i, the number of right rows with
    ``keys_r == keys_p[i]`` and ``ts_r < ts_p[i]`` (strict).

    Merge both sides sorted by (key, ts, probe-first-at-ties); an exclusive
    cumulative count of right rows, rebased at each key-segment start,
    gives every probe its in-segment rank — one lexsort + one cumsum.
    """
    n_r, n_p = keys_r.shape[0], keys_p.shape[0]
    if n_r == 0 or n_p == 0:
        return np.zeros(n_p, dtype=np.int64)
    keys = np.concatenate([keys_r, keys_p])
    ts = np.concatenate([ts_r, ts_p])
    # probes sort before right rows at equal ts ⇒ equal-ts rows not counted
    flag = np.concatenate([np.ones(n_r, np.int8), np.zeros(n_p, np.int8)])
    pidx = np.concatenate(
        [np.full(n_r, -1, np.int64), np.arange(n_p, dtype=np.int64)]
    )
    perm = np.lexsort((flag, ts, keys))
    f = flag[perm].astype(np.int64)
    cum = np.cumsum(f) - f  # exclusive: right rows strictly before this pos
    kk = keys[perm]
    new_seg = _segment_starts(kk)
    seg_id = np.cumsum(new_seg) - 1
    base = cum[new_seg][seg_id]
    cnt = cum - base
    pperm = pidx[perm]
    sel = pperm >= 0
    out = np.zeros(n_p, dtype=np.int64)
    out[pperm[sel]] = cnt[sel]
    return out


def count_in_range(
    keys_p: np.ndarray,
    lo_p: np.ndarray,
    hi_p: np.ndarray,
    keys_r: np.ndarray,
    ts_r: np.ndarray,
) -> np.ndarray:
    """Per probe: count of right rows with same key and ``lo <= ts < hi``
    — two :func:`count_before` passes (count(<hi) − count(<lo))."""
    return count_before(keys_p, hi_p, keys_r, ts_r) - count_before(
        keys_p, lo_p, keys_r, ts_r
    )


def session_ordinals(
    keys: np.ndarray,
    ts: np.ndarray,
    tiebreak: np.ndarray,
    gap: int,
) -> np.ndarray:
    """Per-row session ordinal (1-based within key): a new session starts at
    each key's first event and whenever the gap to the previous event of the
    same key exceeds ``gap`` (same units as ``ts``). Returned in INPUT row
    order. Rows are ordered by (key, ts, tiebreak); equal-ts rows always
    share a session (gap 0), so the tiebreak only fixes determinism."""
    n = keys.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    perm = np.lexsort((tiebreak, ts, keys))
    kk, tt = keys[perm], ts[perm]
    new_key = _segment_starts(kk)
    new_sess = new_key.copy()
    np.logical_or(new_sess[1:], (tt[1:] - tt[:-1]) > gap, out=new_sess[1:])
    sess_glob = np.cumsum(new_sess)
    seg_id = np.cumsum(new_key) - 1
    ordinal_sorted = sess_glob - sess_glob[new_key][seg_id] + 1
    out = np.empty(n, dtype=np.int64)
    out[perm] = ordinal_sorted
    return out


# ---------------------------------------------------------------------------
# distributed wiring (two-sided keyed bucket shuffle, raw Ray)
# ---------------------------------------------------------------------------


def _np_col(tbl: pa.Table, name: str) -> np.ndarray:
    """int64 view of a key/timestamp column (timestamps are us-since-epoch
    int64 underneath; zero-copy when null-free)."""
    col = tbl.column(name)
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.int64())
    return np.asarray(col.combine_chunks(), dtype=np.int64)


def _bucket_map_refs(
    src: Any, cols: list[str], key_col: str, num_buckets: int, pre_fn=None
) -> list:
    """Map side: one task per parquet path (column-pruned read) or per
    Dataset block; each returns ``num_buckets`` row tables split by
    hash(key). ``pre_fn(tbl) -> tbl`` runs before the split (row filters /
    derived columns — prune the shuffle at the map, not the reduce)."""
    import ray

    @ray.remote(num_returns=num_buckets)
    def map_path(path: str):
        tbl = pq.read_table(path, columns=cols)
        if pre_fn is not None:
            tbl = pre_fn(tbl)
        out = _split_buckets(tbl, [key_col], num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote(num_returns=num_buckets)
    def map_table(tbl: pa.Table):
        if tbl.num_rows == 0 and not set(cols) <= set(tbl.column_names):
            # schema-less empty block (e.g. a fully-filtered Dataset)
            e = pa.table({})
            return [e] * num_buckets if num_buckets > 1 else e
        tbl = tbl.select(cols)
        if pre_fn is not None:
            tbl = pre_fn(tbl)
        out = _split_buckets(tbl, [key_col], num_buckets)
        return out if num_buckets > 1 else out[0]

    if isinstance(src, list):
        refs = [map_path.remote(p) for p in sorted(src)]
    else:
        refs = [map_table.remote(ref) for ref in arrow_block_refs(src)]
    if num_buckets == 1:
        refs = [[r] for r in refs]
    return refs


def _concat_remote():
    import ray

    @ray.remote
    def combine(*tables: pa.Table) -> pa.Table:
        nonempty = [t for t in tables if t.num_rows]
        return pa.concat_tables(nonempty) if nonempty else tables[0]

    return combine


def asof_join_shuffled(
    left: Any,
    left_key: str,
    left_ts: str,
    left_carry: list[str],
    right: Any,
    right_key: str,
    right_ts: str,
    out_col: str,
    strict: bool = False,
    num_buckets: int | None = None,
) -> pa.Table:
    """Distributed as-of join: for every left row, attach the greatest
    ``right_ts`` of the same key at/before (``strict``: strictly before)
    the left row's ``left_ts`` as column ``out_col`` (null when no match).
    ``left``/``right`` are parquet path lists or ray.data Datasets."""
    import ray

    lsrcs = left if isinstance(left, list) else None
    num_buckets = num_buckets or _default_buckets(
        len(lsrcs) if lsrcs is not None else 8
    )
    lcols = [left_key, left_ts, *left_carry]
    rcols = [right_key, right_ts]

    @ray.remote
    def reduce_bucket(n_left: int, *tables: pa.Table) -> pa.Table:
        lparts = [t for t in tables[:n_left] if t.num_rows]
        rparts = [t for t in tables[n_left:] if t.num_rows]
        if not lparts:
            typed = [t for t in tables[:n_left] if t.num_columns]
            if not typed:
                return pa.table({})
            return typed[0].slice(0, 0).append_column(
                out_col, pa.array([], typed[0].schema.field(left_ts).type)
            )
        ltbl = pa.concat_tables(lparts)
        ts_type = ltbl.schema.field(left_ts).type
        if rparts:
            rtbl = pa.concat_tables(rparts)
            idx = asof_last_indices(
                _np_col(ltbl, left_key),
                _np_col(ltbl, left_ts),
                _np_col(rtbl, right_key),
                _np_col(rtbl, right_ts),
                strict=strict,
            )
            matched_ts = _np_col(rtbl, right_ts)[np.clip(idx, 0, None)]
            matched = pa.array(matched_ts, pa.int64(), mask=idx < 0).cast(ts_type)
        else:
            matched = pa.nulls(ltbl.num_rows, ts_type)
        return ltbl.append_column(out_col, matched)

    combine = _concat_remote()
    lrefs = _bucket_map_refs(left, lcols, left_key, num_buckets)
    rrefs = _bucket_map_refs(right, rcols, right_key, num_buckets)
    reduced = []
    for b in range(num_buckets):
        lc = _tree_combine([lrefs[m][b] for m in range(len(lrefs))], combine)
        rc = _tree_combine([rrefs[m][b] for m in range(len(rrefs))], combine)
        reduced.append(reduce_bucket.remote(len(lc), *lc, *rc))
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables)


def range_count_shuffled(
    probe: Any,
    probe_key: str,
    probe_ts: str,
    probe_carry: list[str],
    right: Any,
    right_key: str,
    right_ts: str,
    lo_offset: int,
    hi_offset: int,
    out_col: str = "cnt",
    num_buckets: int | None = None,
) -> pa.Table:
    """Per probe row: count of right rows with the same key and
    ``probe_ts + lo_offset <= right_ts < probe_ts + hi_offset`` (offsets in
    the timestamp's integer unit, e.g. microseconds)."""
    import ray

    psrcs = probe if isinstance(probe, list) else None
    num_buckets = num_buckets or _default_buckets(
        len(psrcs) if psrcs is not None else 8
    )
    pcols = [probe_key, probe_ts, *probe_carry]
    rcols = [right_key, right_ts]

    @ray.remote
    def reduce_bucket(n_probe: int, *tables: pa.Table) -> pa.Table:
        pparts = [t for t in tables[:n_probe] if t.num_rows]
        rparts = [t for t in tables[n_probe:] if t.num_rows]
        if not pparts:
            typed = [t for t in tables[:n_probe] if t.num_columns]
            if not typed:
                return pa.table({})
            return typed[0].slice(0, 0).append_column(
                out_col, pa.array([], pa.int64())
            )
        ptbl = pa.concat_tables(pparts)
        if rparts:
            rtbl = pa.concat_tables(rparts)
            pk, pt = _np_col(ptbl, probe_key), _np_col(ptbl, probe_ts)
            cnt = count_in_range(
                pk,
                pt + np.int64(lo_offset),
                pt + np.int64(hi_offset),
                _np_col(rtbl, right_key),
                _np_col(rtbl, right_ts),
            )
        else:
            cnt = np.zeros(ptbl.num_rows, dtype=np.int64)
        return ptbl.append_column(out_col, pa.array(cnt, pa.int64()))

    combine = _concat_remote()
    prefs = _bucket_map_refs(probe, pcols, probe_key, num_buckets)
    rrefs = _bucket_map_refs(right, rcols, right_key, num_buckets)
    reduced = []
    for b in range(num_buckets):
        pc_ = _tree_combine([prefs[m][b] for m in range(len(prefs))], combine)
        rc = _tree_combine([rrefs[m][b] for m in range(len(rrefs))], combine)
        reduced.append(reduce_bucket.remote(len(pc_), *pc_, *rc))
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables)


def sessionize_shuffled(
    src: Any,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    gap: int,
    num_buckets: int | None = None,
) -> pa.Table:
    """Gap-based sessionization: assign per-key 1-based session ordinals
    (new session when the gap to the previous event of the key exceeds
    ``gap``, in the timestamp's integer unit) and aggregate per session:
    (key, session_no, n_events, session_start, session_end)."""
    import ray

    srcs = src if isinstance(src, list) else None
    num_buckets = num_buckets or _default_buckets(
        len(srcs) if srcs is not None else 8
    )
    cols = [key_col, ts_col, tiebreak_col]

    @ray.remote
    def reduce_bucket(*tables: pa.Table) -> pa.Table:
        parts = [t for t in tables if t.num_rows]
        if not parts:
            typed = [t for t in tables if t.num_columns]
            if not typed:
                return pa.table({})
            t0 = typed[0]
            return pa.table(
                {
                    key_col: pa.array([], t0.schema.field(key_col).type),
                    "session_no": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "session_start": pa.array([], t0.schema.field(ts_col).type),
                    "session_end": pa.array([], t0.schema.field(ts_col).type),
                }
            )
        tbl = pa.concat_tables(parts)
        ords = session_ordinals(
            _np_col(tbl, key_col),
            _np_col(tbl, ts_col),
            _np_col(tbl, tiebreak_col),
            gap,
        )
        with_s = pa.table(
            {
                key_col: tbl.column(key_col),
                "session_no": pa.array(ords, pa.int64()),
                "ts": tbl.column(ts_col),
            }
        )
        g = with_s.group_by([key_col, "session_no"]).aggregate(
            [([], "count_all"), ("ts", "min"), ("ts", "max")]
        )
        return g.rename_columns(
            [key_col, "session_no", "n_events", "session_start", "session_end"]
        )

    combine = _concat_remote()
    refs = _bucket_map_refs(src, cols, key_col, num_buckets)
    reduced = []
    for b in range(num_buckets):
        c = _tree_combine([refs[m][b] for m in range(len(refs))], combine)
        reduced.append(reduce_bucket.remote(*c))
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables)


def interarrival_shuffled(
    src: Any,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    num_buckets: int | None = None,
) -> pa.Table:
    """Per-key INTER-ARRIVAL statistics — the ordered-window primitive
    behind freshness/heartbeat validation (is this entity emitting at its
    expected cadence?): for each key, the gaps between consecutive events
    in (ts, tiebreak) order, aggregated to (key, n_gaps, min/max/sum gap)
    in the timestamp's integer unit. Exactly SQL's
    ``ts - lag(ts) OVER (PARTITION BY key ORDER BY ts, tiebreak)``.

    Same one-shuffle shape as sessionize_shuffled: hash-partition rows by
    key so each key's full history is co-located, then ONE lexsort per
    reduce + a vectorized adjacent-difference (gaps where the sorted
    neighbor shares the key) and a tiny per-key groupby. Keys with a
    single event have no gaps and are absent from the output (SQL WHERE
    gap IS NOT NULL parity). All-integer arithmetic — exact."""
    import ray

    srcs = src if isinstance(src, list) else None
    num_buckets = num_buckets or _default_buckets(len(srcs) if srcs is not None else 8)
    cols = [key_col, ts_col, tiebreak_col]

    @ray.remote
    def reduce_bucket(*tables: pa.Table) -> pa.Table:
        parts = [t for t in tables if t.num_rows]
        if not parts:
            typed = [t for t in tables if t.num_columns]
            kt = typed[0].schema.field(key_col).type if typed else pa.int64()
            return pa.table(
                {
                    key_col: pa.array([], kt),
                    "n_gaps": pa.array([], pa.int64()),
                    "min_gap": pa.array([], pa.int64()),
                    "max_gap": pa.array([], pa.int64()),
                    "sum_gap": pa.array([], pa.int64()),
                }
            )
        tbl = pa.concat_tables(parts)
        k = _np_col(tbl, key_col)
        t = _np_col(tbl, ts_col)
        tb = _np_col(tbl, tiebreak_col)
        order = np.lexsort((tb, t, k))
        ks, ts_ = k[order], t[order]
        same = ks[1:] == ks[:-1]
        gaps = (ts_[1:] - ts_[:-1])[same]
        idx = pa.array(order[1:][same].astype(np.int64), pa.int64())
        g = pa.table(
            {
                key_col: tbl.column(key_col).take(idx),
                "gap": pa.array(gaps, pa.int64()),
            }
        )
        out = g.group_by(key_col).aggregate(
            [([], "count_all"), ("gap", "min"), ("gap", "max"), ("gap", "sum")]
        )
        return out.rename_columns([key_col, "n_gaps", "min_gap", "max_gap", "sum_gap"])

    combine = _concat_remote()
    refs = _bucket_map_refs(src, cols, key_col, num_buckets)
    reduced = []
    for b in range(num_buckets):
        c = _tree_combine([refs[m][b] for m in range(len(refs))], combine)
        reduced.append(reduce_bucket.remote(*c))
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables)


def transition_counts_shuffled(
    src: Any,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    type_col: str,
    num_buckets: int | None = None,
) -> pa.Table:
    """Per-key event-TRANSITION counts (the first-order Markov matrix of
    the stream — the behavioral-drift signal that catches a reordered or
    dropped step even when per-type volumes look flat): for every
    consecutive pair of events of one key in (ts, tiebreak) order, count
    (prev_type, next_type). Exactly SQL's
    ``lead(type) OVER (PARTITION BY key ORDER BY ts, tiebreak)`` pair
    counts.

    Same one-shuffle shape as :func:`interarrival_shuffled`: hash-partition
    rows by key so each key's full history is co-located, ONE lexsort per
    reduce, a vectorized same-key adjacency mask, and a per-bucket
    (prev, next) count partial — the driver only sums O(buckets × types²)
    rows."""
    import ray

    srcs = src if isinstance(src, list) else None
    num_buckets = num_buckets or _default_buckets(len(srcs) if srcs is not None else 8)
    cols = [key_col, ts_col, tiebreak_col, type_col]

    @ray.remote
    def reduce_bucket(*tables: pa.Table) -> pa.Table:
        parts = [t for t in tables if t.num_rows]
        empty = pa.table(
            {
                "prev_type": pa.array([], pa.string()),
                "next_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if not parts:
            return empty
        tbl = pa.concat_tables(parts)
        k = _np_col(tbl, key_col)
        t = _np_col(tbl, ts_col)
        tb = _np_col(tbl, tiebreak_col)
        order = np.lexsort((tb, t, k))
        same = k[order][1:] == k[order][:-1]
        if not same.any():
            return empty
        prev_idx = pa.array(order[:-1][same].astype(np.int64), pa.int64())
        next_idx = pa.array(order[1:][same].astype(np.int64), pa.int64())
        g = pa.table(
            {
                "prev_type": tbl.column(type_col).take(prev_idx),
                "next_type": tbl.column(type_col).take(next_idx),
            }
        )
        out = g.group_by(["prev_type", "next_type"]).aggregate([([], "count_all")])
        return out.rename_columns(["prev_type", "next_type", "n"])

    combine = _concat_remote()
    refs = _bucket_map_refs(src, cols, key_col, num_buckets)
    reduced = []
    for b in range(num_buckets):
        c = _tree_combine([refs[m][b] for m in range(len(refs))], combine)
        reduced.append(reduce_bucket.remote(*c))
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return pa.table(
            {
                "prev_type": pa.array([], pa.string()),
                "next_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    out = pa.concat_tables(tables).group_by(["prev_type", "next_type"]).aggregate([("n", "sum")])
    return out.rename_columns(["prev_type", "next_type", "n"])


def path_ngram_counts_shuffled(
    src: Any,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    type_col: str,
    n: int = 3,
    num_buckets: int | None = None,
) -> pa.Table:
    """Per-key event-PATH n-gram counts (path mining — the order-n
    generalization of :func:`transition_counts_shuffled`): for every run
    of ``n`` consecutive events of one key in (ts, tiebreak) order, count
    the type tuple (t0, …, t{n-1}). Exactly SQL's
    ``lead(type, i) OVER (PARTITION BY key ORDER BY ts, tiebreak)`` for
    i = 1..n-1, counted where the last lead is non-null *within the key
    partition* (a window never crosses keys).

    Same one-shuffle shape as the transition matrix: hash-partition rows
    by key so each key's full history is co-located, ONE lexsort per
    reduce, a vectorized same-key window mask (rows i and i+n-1 sharing
    the key implies the whole window does — identical keys are contiguous
    after the sort), and a per-bucket n-gram count partial. The driver
    sums O(buckets × types^n) rows — exact because counts are associative,
    bounded because the type domain is an enum (the engine's enum/format
    validation upstream is what makes this safe at corpus scale)."""
    import ray

    if n < 2:
        raise ValueError("path n-gram order must be >= 2")
    srcs = src if isinstance(src, list) else None
    num_buckets = num_buckets or _default_buckets(len(srcs) if srcs is not None else 8)
    cols = [key_col, ts_col, tiebreak_col, type_col]
    names = [f"t{i}" for i in range(n)]

    def _empty() -> pa.Table:
        data: dict = {nm: pa.array([], pa.string()) for nm in names}
        data["n"] = pa.array([], pa.int64())
        return pa.table(data)

    @ray.remote
    def reduce_bucket(*tables: pa.Table) -> pa.Table:
        parts = [t for t in tables if t.num_rows]
        if not parts:
            return _empty()
        tbl = pa.concat_tables(parts)
        if tbl.num_rows < n:
            return _empty()
        k = _np_col(tbl, key_col)
        t = _np_col(tbl, ts_col)
        tb = _np_col(tbl, tiebreak_col)
        order = np.lexsort((tb, t, k))
        ks = k[order]
        same = ks[n - 1 :] == ks[: len(ks) - (n - 1)]
        if not same.any():
            return _empty()
        start = np.flatnonzero(same)
        types = tbl.column(type_col)
        g = pa.table(
            {
                nm: types.take(pa.array((order[start + i]).astype(np.int64), pa.int64()))
                for i, nm in enumerate(names)
            }
        )
        out = g.group_by(names).aggregate([([], "count_all")])
        return out.rename_columns(names + ["n"])

    combine = _concat_remote()
    refs = _bucket_map_refs(src, cols, key_col, num_buckets)
    reduced = []
    for b in range(num_buckets):
        c = _tree_combine([refs[m][b] for m in range(len(refs))], combine)
        reduced.append(reduce_bucket.remote(*c))
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return _empty()
    out = pa.concat_tables(tables).group_by(names).aggregate([("n", "sum")])
    return out.rename_columns(names + ["n"])


def funnel_shuffled(
    src: Any,
    key_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    num_buckets: int | None = None,
    max_gap_us: int | None = None,
) -> pa.Table:
    """ORDERED FUNNEL: how many keys reached stage i — where reaching
    stage i means an event of type stages[i] STRICTLY AFTER the time the
    key reached stage i-1 (earliest-completion semantics, the standard
    conversion-funnel definition; equal timestamps do NOT advance).

    One hash-partition shuffle by key; rows of non-funnel types are
    dropped AT THE MAP (pre_fn), so only funnel events move. Each reduce
    runs len(stages) vectorized masked-min passes over its key-sorted
    bucket (np.minimum.reduceat per key segment, candidates = events of
    the stage's type strictly after the key's previous-stage time) and
    returns only a (stage_idx, n_keys) pair table; the driver sums B×S
    tiny rows. Keys that stall at stage i stay at +inf for every later
    stage, so later counts are monotonically ≤ earlier ones.

    ``max_gap_us`` adds an ATTRIBUTION WINDOW: stage i must occur within
    that many µs of reaching stage i-1 (greedy earliest-completion — the
    standard analytics semantics, mirrored exactly by the oracle's
    ``ts > t_prev AND ts <= t_prev + T`` joins; greedy can differ from
    the optimal-assignment funnel, by design)."""
    import ray

    srcs = src if isinstance(src, list) else None
    num_buckets = num_buckets or _default_buckets(len(srcs) if srcs is not None else 8)
    cols = [key_col, ts_col, type_col]
    stage_list = list(stages)

    def keep_funnel(tbl: pa.Table) -> pa.Table:
        return tbl.filter(
            pc.is_in(tbl.column(type_col), value_set=pa.array(stage_list, pa.string()))
        )

    @ray.remote
    def reduce_bucket(*tables: pa.Table) -> pa.Table:
        parts = [t for t in tables if t.num_rows]
        empty = pa.table(
            {"stage_idx": pa.array([], pa.int64()), "n_keys": pa.array([], pa.int64())}
        )
        if not parts:
            return empty
        tbl = pa.concat_tables(parts)
        k = _np_col(tbl, key_col)
        t = _np_col(tbl, ts_col)
        et = tbl.column(type_col).combine_chunks()
        code = np.full(len(k), -1, dtype=np.int64)
        for i, s in enumerate(stage_list):
            code[np.asarray(pc.equal(et, s).fill_null(False))] = i
        order = np.lexsort((t, k))
        ks, ts_, cs = k[order], t[order], code[order]
        seg = np.flatnonzero(_segment_starts(ks))
        n_keys = len(seg)
        seg_of_row = np.cumsum(_segment_starts(ks)) - 1
        INF = np.iinfo(np.int64).max
        t_prev = np.full(n_keys, np.iinfo(np.int64).min, dtype=np.int64)
        counts = np.zeros(len(stage_list), dtype=np.int64)
        for i in range(len(stage_list)):
            tp = t_prev[seg_of_row]
            ok = (cs == i) & (ts_ > tp)
            if max_gap_us is not None and i > 0:
                # ts − tp is exact for real tp; for tp = +inf (stage i−1
                # unreached) the strict > above is already False
                ok &= (ts_ - tp) <= max_gap_us
            cand = np.where(ok, ts_, INF)
            t_stage = np.minimum.reduceat(cand, seg) if n_keys else cand[:0]
            counts[i] = int((t_stage < INF).sum())
            t_prev = t_stage
        return pa.table(
            {
                "stage_idx": pa.array(np.arange(len(stage_list), dtype=np.int64), pa.int64()),
                "n_keys": pa.array(counts, pa.int64()),
            }
        )

    combine = _concat_remote()
    refs = _bucket_map_refs(src, cols, key_col, num_buckets, pre_fn=keep_funnel)
    reduced = []
    for b in range(num_buckets):
        c = _tree_combine([refs[m][b] for m in range(len(refs))], combine)
        reduced.append(reduce_bucket.remote(*c))
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return pa.table(
            {"stage_idx": pa.array([], pa.int64()), "n_keys": pa.array([], pa.int64())}
        )
    merged = pa.concat_tables(tables)
    out = merged.group_by(["stage_idx"]).aggregate([("n_keys", "sum")])
    return out.rename_columns(["stage_idx", "n_keys"]).sort_by("stage_idx")


def cohort_retention_shuffled(
    src: Any,
    key_col: str,
    ts_col: str,
    num_buckets: int | None = None,
) -> pa.Table:
    """COHORT RETENTION: keys grouped by their first-activity day, counted
    on each later active day as (cohort_day, day_offset, n_keys) — the
    standard retention triangle, exact. One hash-partition shuffle by key
    (only (key, ts) moves); each reduce key-sorts its bucket once, takes
    per-key first day as the cohort, dedups (key, day) pairs by adjacency
    in the same sort, and pre-aggregates to (cohort_day, offset, n) — the
    driver merges B tiny pre-agg tables. Day = floor(ts / 86_400s) on the
    raw integer timestamps (naive UTC, matching SQL CAST(ts AS DATE))."""
    import ray

    srcs = src if isinstance(src, list) else None
    num_buckets = num_buckets or _default_buckets(len(srcs) if srcs is not None else 8)
    cols = [key_col, ts_col]
    US_PER_DAY = 86_400_000_000

    @ray.remote
    def reduce_bucket(*tables: pa.Table) -> pa.Table:
        parts = [t for t in tables if t.num_rows]
        empty = pa.table(
            {
                "cohort_day": pa.array([], pa.int64()),
                "day_offset": pa.array([], pa.int64()),
                "n_keys": pa.array([], pa.int64()),
            }
        )
        if not parts:
            return empty
        tbl = pa.concat_tables(parts)
        k = _np_col(tbl, key_col)
        day = np.floor_divide(_np_col(tbl, ts_col), US_PER_DAY)
        order = np.lexsort((day, k))
        ks, ds = k[order], day[order]
        new_key = _segment_starts(ks)
        # dedup (key, day): first row of each (key, day) run in the sort
        first_pair = new_key | np.r_[False, (ds[1:] != ds[:-1])]
        kk, dd = ks[first_pair], ds[first_pair]
        seg_of = np.cumsum(_segment_starts(kk)) - 1
        cohort = dd[_segment_starts(kk)][seg_of]  # per-pair cohort day
        g = pa.table(
            {
                "cohort_day": pa.array(cohort, pa.int64()),
                "day_offset": pa.array(dd - cohort, pa.int64()),
            }
        )
        out = g.group_by(["cohort_day", "day_offset"]).aggregate([([], "count_all")])
        return out.rename_columns(["cohort_day", "day_offset", "n_keys"])

    combine = _concat_remote()
    refs = _bucket_map_refs(src, cols, key_col, num_buckets)
    reduced = []
    for b in range(num_buckets):
        c = _tree_combine([refs[m][b] for m in range(len(refs))], combine)
        reduced.append(reduce_bucket.remote(*c))
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return pa.table(
            {
                "cohort_day": pa.array([], pa.int64()),
                "day_offset": pa.array([], pa.int64()),
                "n_keys": pa.array([], pa.int64()),
            }
        )
    merged = pa.concat_tables(tables)
    out = merged.group_by(["cohort_day", "day_offset"]).aggregate([("n_keys", "sum")])
    return out.rename_columns(["cohort_day", "day_offset", "n_keys"]).sort_by(
        [("cohort_day", "ascending"), ("day_offset", "ascending")]
    )

def rolling_minmax(
    keys: np.ndarray,
    ts: np.ndarray,
    tiebreak: np.ndarray,
    values: np.ndarray,
    window: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-row TRAILING-WINDOW min/max — exactly SQL's
    ``MIN/MAX(v) OVER (PARTITION BY key ORDER BY ts, tiebreak
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)`` — plus the number
    of rows actually inside each window. Returned in INPUT row order as
    ``(roll_min, roll_max, n_in_window)``.

    Fully vectorized: one lexsort, then ``window - 1`` shifted
    ``np.fmin``/``np.fmax`` passes masked by key equality (a row ``s``
    positions back is in-window iff it carries the same key — the sort
    groups keys contiguously). Null values must be pre-encoded as NaN;
    ``fmin``/``fmax`` skip NaN operands, matching SQL's null-ignoring
    window MIN/MAX, and an all-null window stays NaN (caller maps back to
    null). ``window`` is a small constant, so this is O(window · n) with
    no per-row Python.
    """
    n = keys.shape[0]
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        e = values.astype(np.float64, copy=True)
        return e, e.copy(), z
    perm = np.lexsort((tiebreak, ts, keys))
    kk = keys[perm]
    vv = values[perm].astype(np.float64, copy=True)
    rmin = vv.copy()
    rmax = vv.copy()
    new_key = _segment_starts(kk)
    seg_id = np.cumsum(new_key) - 1
    rank = np.arange(n, dtype=np.int64)
    rank -= rank[new_key][seg_id]  # 0-based rank within key
    n_in = np.minimum(rank + 1, window)
    shifted = np.empty(n, dtype=np.float64)
    for s in range(1, window):
        in_window = np.zeros(n, dtype=bool)
        in_window[s:] = kk[s:] == kk[:-s]
        shifted[s:] = vv[:-s]
        np.fmin(rmin, shifted, out=rmin, where=in_window)
        np.fmax(rmax, shifted, out=rmax, where=in_window)
    out_min = np.empty(n, dtype=np.float64)
    out_max = np.empty(n, dtype=np.float64)
    out_n = np.empty(n, dtype=np.int64)
    out_min[perm] = rmin
    out_max[perm] = rmax
    out_n[perm] = n_in
    return out_min, out_max, out_n


def rolling_minmax_shuffled(
    src: Any,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    window: int,
    num_buckets: int | None = None,
) -> pa.Table:
    """Distributed trailing-window MIN/MAX per key (the spike / freshness
    monitor primitive: "is this reading a new trailing-3 peak?"). One
    hash-partition shuffle by key co-locates each key's history; each
    reduce runs the :func:`rolling_minmax` kernel once and emits
    ``(tiebreak, roll_min, roll_max, n_in_window)`` rows. Only the four
    projected columns ever move. Same skew caveat as the other keyed
    windows (see module docstring)."""
    import ray

    srcs = src if isinstance(src, list) else None
    num_buckets = num_buckets or _default_buckets(len(srcs) if srcs is not None else 8)
    cols = [key_col, ts_col, tiebreak_col, value_col]

    @ray.remote
    def reduce_bucket(*tables: pa.Table) -> pa.Table:
        parts = [t for t in tables if t.num_rows]
        empty = pa.table(
            {
                tiebreak_col: pa.array([], pa.int64()),
                "roll_min": pa.array([], pa.float64()),
                "roll_max": pa.array([], pa.float64()),
                "n_in_window": pa.array([], pa.int64()),
            }
        )
        if not parts:
            return empty
        tbl = pa.concat_tables(parts)
        vals = tbl.column(value_col).combine_chunks()
        v = np.asarray(vals.cast(pa.float64()), dtype=np.float64)
        if vals.null_count:
            v = v.copy()
            v[np.asarray(pc.is_null(vals))] = np.nan
        rmin, rmax, n_in = rolling_minmax(
            _np_col(tbl, key_col),
            _np_col(tbl, ts_col),
            _np_col(tbl, tiebreak_col),
            v,
            window,
        )
        return pa.table(
            {
                tiebreak_col: tbl.column(tiebreak_col),
                # NaN (all-null window) maps back to null for SQL parity
                "roll_min": pa.array(rmin, pa.float64(), mask=np.isnan(rmin)),
                "roll_max": pa.array(rmax, pa.float64(), mask=np.isnan(rmax)),
                "n_in_window": pa.array(n_in, pa.int64()),
            }
        )

    combine = _concat_remote()
    refs = _bucket_map_refs(src, cols, key_col, num_buckets)
    reduced = []
    for b in range(num_buckets):
        c = _tree_combine([refs[m][b] for m in range(len(refs))], combine)
        reduced.append(reduce_bucket.remote(*c))
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return pa.table(
            {
                tiebreak_col: pa.array([], pa.int64()),
                "roll_min": pa.array([], pa.float64()),
                "roll_max": pa.array([], pa.float64()),
                "n_in_window": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(tables)


def late_events_shuffled(
    paths: list[str],
    seq_col: str,
    ts_col: str,
    watermark_us: int,
    pre_fn=None,
    read_cols: list[str] | None = None,
    num_ranges: int = 16,
    ontime_window_us: int | None = None,
) -> pa.Table:
    """WATERMARK / LATE-DATA detection — the §2G streaming category over a
    replayed stream: with arrival order = ``seq_col`` and event time =
    ``ts_col`` (µs int64; ``pre_fn`` may derive it), the watermark at row
    i is max(t of all rows with smaller seq); a row is LATE when
    ``t < watermark − watermark_us``. Exactly SQL's
    ``MAX(t) OVER (ORDER BY seq ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)``.

    A running max over arrival order is a PREFIX SCAN, not a shuffle —
    and the plan is the classic two-phase distributed scan: (1) one tiny
    pass for per-shard seq ranges → B equal RANGE buckets; (2) rows move
    once into their range bucket; each bucket sorts locally and computes
    its exclusive cumulative max; buckets report one max each, the driver
    prefix-maxes B scalars, and a finalize task per bucket merges the
    incoming watermark and emits only the late rows. No global sort, rows
    shipped exactly once, O(B) driver state."""
    import ray

    INT64_MIN = np.iinfo(np.int64).min

    @ray.remote
    def seq_range(path: str):
        tbl = pq.read_table(path, columns=[seq_col])
        if tbl.num_rows == 0:
            return None
        s = _np_col(tbl, seq_col)
        return (int(s.min()), int(s.max()))

    ranges = [r for r in ray.get([seq_range.remote(p) for p in sorted(paths)]) if r]
    empty = pa.table(
        {
            seq_col: pa.array([], pa.int64()),
            "t": pa.array([], pa.int64()),
            "late_us": pa.array([], pa.int64()),
        }
    )
    if not ranges:
        return empty
    lo = min(r[0] for r in ranges)
    hi = max(r[1] for r in ranges) + 1
    bounds = np.linspace(lo, hi, num_ranges + 1).astype(np.int64)
    bounds[0], bounds[-1] = lo, hi

    cols = read_cols if read_cols is not None else sorted({seq_col, ts_col})

    @ray.remote(num_returns=num_ranges)
    def map_shard(path: str):
        tbl = pq.read_table(path, columns=cols)
        if pre_fn is not None:
            tbl = pre_fn(tbl)  # derives ts_col (e.g. jittered event time)
        s = _np_col(tbl, seq_col)
        b = np.clip(np.searchsorted(bounds, s, side="right") - 1, 0, num_ranges - 1)
        order = np.argsort(b, kind="stable")
        st = tbl.take(pa.array(order, pa.int64()))
        cuts = np.searchsorted(b[order], np.arange(num_ranges + 1))
        out = [st.slice(cuts[i], cuts[i + 1] - cuts[i]) for i in range(num_ranges)]
        return out if num_ranges > 1 else out[0]

    @ray.remote(num_returns=2)
    def scan_bucket(*tables: pa.Table):
        parts = [t for t in tables if t.num_rows]
        if not parts:
            return empty.append_column("wm_local", pa.array([], pa.int64())), INT64_MIN
        tbl = pa.concat_tables(parts)
        s = _np_col(tbl, seq_col)
        t = _np_col(tbl, ts_col)
        order = np.argsort(s, kind="stable")
        ts_sorted = t[order]
        cm = np.maximum.accumulate(ts_sorted)
        excl = np.empty_like(cm)
        excl[0] = INT64_MIN
        excl[1:] = cm[:-1]
        out = pa.table(
            {
                seq_col: pa.array(s[order], pa.int64()),
                "t": pa.array(ts_sorted, pa.int64()),
                "wm_local": pa.array(excl, pa.int64()),
            }
        )
        return out, int(cm[-1])

    empty_win = pa.table(
        {"window_id": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )

    @ray.remote
    def finalize(tbl: pa.Table, incoming: int) -> pa.Table:
        if tbl.num_rows == 0:
            return empty_win if ontime_window_us else empty
        t = np.asarray(tbl.column("t").combine_chunks(), dtype=np.int64)
        wm = np.maximum(
            np.asarray(tbl.column("wm_local").combine_chunks(), dtype=np.int64), incoming
        )
        # INT64_MIN wm (no prior row anywhere) can never flag late
        late = wm > t + watermark_us
        if ontime_window_us:
            # DuckDB's integer // TRUNCATES toward zero; numpy floors.
            # Event times here are positive epochs, but keep the pinned
            # SQL parity exact for any sign
            ot = t[~late]
            win = np.where(ot >= 0, ot // ontime_window_us, -((-ot) // ontime_window_us))
            ids, cnts = np.unique(win, return_counts=True)
            return pa.table(
                {
                    "window_id": pa.array(ids, pa.int64()),
                    "n": pa.array(cnts.astype(np.int64), pa.int64()),
                }
            )
        sel = pa.array(late)
        return pa.table(
            {
                seq_col: tbl.column(seq_col).filter(sel),
                "t": tbl.column("t").filter(sel),
                "late_us": pa.array((wm - t)[late], pa.int64()),
            }
        )

    refs = [map_shard.remote(p) for p in sorted(paths)]
    if num_ranges == 1:
        refs = [[r] for r in refs]
    combine = _concat_remote()
    scanned = [
        scan_bucket.remote(*_tree_combine([refs[m][b] for m in range(len(refs))], combine))
        for b in range(num_ranges)
    ]
    maxima = ray.get([s[1] for s in scanned])
    incoming = INT64_MIN
    finals = []
    for b in range(num_ranges):
        finals.append(finalize.remote(scanned[b][0], incoming))
        incoming = max(incoming, maxima[b])
    tables = [t for t in ray.get(finals) if t.num_rows]
    if ontime_window_us:
        if not tables:
            return empty_win
        merged = pa.concat_tables(tables)
        out = merged.group_by("window_id").aggregate([("n", "sum")])
        return out.rename_columns(["window_id", "n"]).sort_by("window_id")
    if not tables:
        return empty
    return pa.concat_tables(tables)
