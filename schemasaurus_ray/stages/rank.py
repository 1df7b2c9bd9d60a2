"""Distributed EXACT rank assignment — NTILE(k) bucketing per group
without ever sorting a whole group in one task.

The training-data use: length-decile stratification (curriculum order,
packing bins, per-decile quality review) — SQL's
``NTILE(k) OVER (PARTITION BY group ORDER BY value, tiebreak)``, exact at
any group size.

A per-group sort is the naive plan and serializes each partition into one
task — the opposite of what a 100 TB table with a handful of partitions
needs. This plan never does it. Global ranks decompose:

    rank(row) = rank_start(group, value) + j(row)

where ``rank_start`` is the number of group rows with a SMALLER value
(exclusive cumulative count over the (group, value) count table — the same
tiny table the exact-quantile surfaces already shuffle,
stages/shuffle.count_keys_shuffled), and ``j`` is the row's rank among its
exact ties, fixed by the tiebreak column. So:

- **shuffle 1** (tiny): (group, value) → cnt; driver computes per-value
  ``rank_start`` and per-group ``n`` with one lexsort + exclusive cumsum,
  broadcast once via ``ray.put`` (bounded by the distinct (group, value)
  domain — the same assumption the quantile surfaces document).
- **shuffle 2** (key-only): rows keyed by (group, value) — every tie block
  lands in one reduce, which sorts ONLY within tie blocks (one lexsort per
  bucket), adds the broadcast rank_start, and applies the closed-form
  NTILE bucket formula. No group is ever co-located whole.

Reference counterpart: none (SURVEY.md §2G custom operators).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .shuffle import _default_buckets, _split_buckets, _tree_combine
from .temporal import _concat_remote, _segment_starts

from ..util import arrow_block_refs


def ntile_bucket(r: np.ndarray, n: np.ndarray, k: int) -> np.ndarray:
    """Closed-form SQL NTILE: 0-based global rank ``r`` in a partition of
    ``n`` rows → 1-based bucket. The first ``n % k`` buckets hold
    ``n // k + 1`` rows, the rest ``n // k`` (ISO/DuckDB semantics)."""
    r = np.asarray(r, dtype=np.int64)
    n = np.asarray(n, dtype=np.int64)
    small = n // k
    big = n % k
    cut = big * (small + 1)
    # small == 0 ⇒ cut == n ⇒ the first branch always taken; the maximum
    # guard only silences the division, it is never selected.
    return (
        np.where(r < cut, r // (small + 1), big + (r - cut) // np.maximum(small, 1)) + 1
    )


def rank_starts_from_count_table(
    counts: pa.Table, group_col: str, value_col: str
) -> tuple[list, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """From a (group, value, cnt) count table: per (group, value) the
    EXCLUSIVE cumulative count (``rank_start`` = rows of the group with a
    strictly smaller value) and the group's total ``n``. Fully vectorized
    (one lexsort + cumsum). Returns ``(ugroups, gcode, value, rank_start,
    n_group)`` sorted by (gcode, value) — ready for searchsorted lookups."""
    if counts.num_rows == 0:
        z = np.zeros(0, dtype=np.int64)
        return [], z, z, z, z
    groups = counts.column(group_col).to_numpy(zero_copy_only=False)
    vals = counts.column(value_col).to_numpy(zero_copy_only=False)
    cnt = counts.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    try:
        ugroups, gcode = np.unique(groups, return_inverse=True)
        ugroups = list(ugroups)
    except TypeError:
        # object keys with None (SQL's NULL partition): np.unique can't
        # compare None<str — factorize with NULL coded last (group codes
        # only name partitions; their order never reaches the output)
        glist = groups.tolist()
        uniq: list = sorted({x for x in glist if x is not None})
        if any(x is None for x in glist):
            uniq.append(None)
        pos = {x: i for i, x in enumerate(uniq)}
        gcode = np.array([pos[x] for x in glist], dtype=np.int64)
        ugroups = uniq
    order = np.lexsort((vals, gcode))
    gc, v, c = gcode[order], vals[order], cnt[order]
    cum = np.cumsum(c)
    new_g = _segment_starts(gc)
    seg_id = np.cumsum(new_g) - 1
    base = np.where(new_g, np.r_[0, cum[:-1]], 0)[new_g][seg_id]
    rank_start = np.r_[0, cum[:-1]] - base
    ends = np.r_[np.flatnonzero(new_g)[1:], len(gc)] - 1
    n_group = (cum[ends] - base[np.flatnonzero(new_g)])[seg_id]
    return list(ugroups), gc, v, rank_start, n_group


def hash_order_positions(
    paths: list[str],
    id_col: str,
    salt: str,
    num_buckets: int = 16,
) -> pa.Table:
    """(id, position): the DETERMINISTIC GLOBAL SHUFFLE a training run
    needs per epoch — every row's position in the order sorted by
    ``md5(salt + id)`` — WITHOUT a global sort. Hex md5 is uniform, so
    bucketing rows by the first hex nibble RANGE-partitions the order:
    bucket b holds exactly the positions [offset_b, offset_b + n_b).
    One map round (vectorized md5 + nibble split), one reduce per bucket
    (local fixed-width byte sort + rank), driver adds 16 offsets. A new
    ``salt`` (epoch number) is a fresh permutation; re-runs are
    bit-identical — the property RNG-per-block shuffles cannot give.
    SQL-checkable: position ≡ ROW_NUMBER() OVER (ORDER BY md5(salt||id))
    − 1 (hex strings sort like the hashes)."""
    import ray

    from ..util import md5_hex

    if not 1 <= num_buckets <= 256:
        raise ValueError(f"num_buckets must be in [1, 256], got {num_buckets}")

    @ray.remote(num_returns=num_buckets)
    def map_path(path: str):
        tbl = pq.read_table(path, columns=[id_col])
        ids = tbl.column(id_col).combine_chunks()
        h = md5_hex(pc.binary_join_element_wise(salt, ids.cast(pa.string()), ""))
        keyed = pa.table({"h": h, id_col: tbl.column(id_col)})
        # range split by the first hex byte (00-ff): bucket = byte·B//256 is
        # a RANGE partition of the hash order for ANY num_buckets ≤ 256
        # (each bucket's hex prefixes are a contiguous interval), so no code
        # can fall outside [0, num_buckets) — the old fixed-nibble split
        # silently dropped codes ≥ num_buckets when num_buckets < 16.
        byte0 = pc.utf8_slice_codeunits(h, start=0, stop=2)
        codes = np.asarray(
            pc.index_in(byte0, value_set=pa.array([f"{i:02x}" for i in range(256)])),
            dtype=np.int64,
        )
        codes = codes * num_buckets // 256
        order = np.argsort(codes, kind="stable")
        sorted_tbl = keyed.take(pa.array(order, pa.int64()))
        bounds = np.searchsorted(codes[order], np.arange(num_buckets + 1))
        out = [
            sorted_tbl.slice(bounds[b], bounds[b + 1] - bounds[b])
            for b in range(num_buckets)
        ]
        return out if num_buckets > 1 else out[0]

    @ray.remote
    def rank_bucket(*tables: pa.Table) -> pa.Table:
        parts = [t for t in tables if t.num_rows]
        if not parts:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "local_rank": pa.array([], pa.int64())}
            )
        tbl = pa.concat_tables(parts)
        h = np.asarray(tbl.column("h").to_numpy(zero_copy_only=False), dtype="S32")
        order = np.argsort(h, kind="stable")  # md5 collisions: none in practice
        rank = np.empty(len(h), dtype=np.int64)
        rank[order] = np.arange(len(h), dtype=np.int64)
        return pa.table({id_col: tbl.column(id_col), "local_rank": pa.array(rank, pa.int64())})

    @ray.remote
    def add_offset(tbl: pa.Table, off: int) -> pa.Table:
        pos = pc.add(tbl.column("local_rank"), off)
        return pa.table({id_col: tbl.column(id_col), "position": pos})

    refs = [map_path.remote(p) for p in sorted(paths)]
    if num_buckets == 1:
        refs = [[r] for r in refs]
    combine = _concat_remote()
    ranked = [
        rank_bucket.remote(*_tree_combine([refs[m][b] for m in range(len(refs))], combine))
        for b in range(num_buckets)
    ]
    num_rows = _num_rows_remote()
    sizes = ray.get([num_rows.remote(r) for r in ranked])
    offsets = np.concatenate([[0], np.cumsum(sizes)])[:-1]
    finals = [add_offset.remote(r, int(offsets[b])) for b, r in enumerate(ranked)]
    tables = [t for t in ray.get(finals) if t.num_rows]
    if not tables:
        return pa.table(
            {id_col: pa.array([], pa.int64()), "position": pa.array([], pa.int64())}
        )
    return pa.concat_tables(tables)


def _num_rows_remote():
    import ray

    @ray.remote
    def num_rows(tbl: pa.Table) -> int:
        return tbl.num_rows

    return num_rows


def ntile_assign_shuffled(
    src: Any,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    k: int,
    num_buckets: int | None = None,
) -> pa.Table:
    """``(tiebreak, group, ntile)`` for every input row — exact
    ``NTILE(k) OVER (PARTITION BY group ORDER BY value, tiebreak)``.
    ``src`` is a list of parquet paths or a Dataset. See module docstring
    for the two-shuffle plan; no per-group sort, no per-row Python."""
    import ray

    from .shuffle import count_keys_shuffled

    srcs = src if isinstance(src, list) else None
    num_buckets = num_buckets or _default_buckets(len(srcs) if srcs is not None else 8)
    cols = [group_col, value_col, tiebreak_col]

    if srcs is not None:
        counts = count_keys_shuffled(srcs, [group_col, value_col], min_count=1)
    else:
        # Dataset source: pre-count per block, merge on the driver (count
        # tables are tiny relative to rows — same shape as the path flavor)
        from .shuffle import _precount_table

        @ray.remote
        def precount(tbl: pa.Table) -> pa.Table:
            return _precount_table(tbl.select([group_col, value_col]), [group_col, value_col])

        parts = ray.get([precount.remote(r) for r in arrow_block_refs(src)])
        merged = pa.concat_tables([t for t in parts if t.num_rows])
        from .shuffle import group_agg_fixed_first

        counts = (
            group_agg_fixed_first(merged, [group_col, value_col], [("cnt", "sum")])
            .rename_columns([group_col, value_col, "cnt"])
            if merged.num_rows
            else pa.table({group_col: [], value_col: [], "cnt": []})
        )

    ugroups, bg, bv, brs, bn = rank_starts_from_count_table(counts, group_col, value_col)
    empty = pa.table(
        {
            tiebreak_col: pa.array([], pa.int64()),
            group_col: pa.array([], pa.string()),
            "ntile": pa.array([], pa.int64()),
        }
    )
    if not ugroups:
        return empty
    rank_ref = ray.put((ugroups, bg, bv, brs, bn))

    @ray.remote(num_returns=num_buckets)
    def map_path(path: str):
        tbl = pq.read_table(path, columns=cols)
        out = _split_buckets(tbl, [group_col, value_col], num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote(num_returns=num_buckets)
    def map_table(tbl: pa.Table):
        if tbl.num_rows == 0 and not set(cols) <= set(tbl.column_names):
            e = pa.table({})
            return [e] * num_buckets if num_buckets > 1 else e
        out = _split_buckets(tbl.select(cols), [group_col, value_col], num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote
    def reduce_bucket(rank_pack, *tables: pa.Table) -> pa.Table:
        parts = [t for t in tables if t.num_rows]
        if not parts:
            return empty
        tbl = pa.concat_tables(parts)
        ugroups, bg, bv, brs, bn = rank_pack
        garr = tbl.column(group_col).combine_chunks()
        idx_arr = pc.index_in(garr, value_set=pa.array(ugroups, garr.type))
        # index_in yields NULL for a NULL group even when ugroups contains
        # None — fill with the NULL partition's code (always coded last by
        # rank_starts_from_count_table) instead of letting NaT-style
        # garbage through np.asarray
        null_code = ugroups.index(None) if None in ugroups else 0
        code = np.asarray(idx_arr.fill_null(null_code), dtype=np.int64)
        v = tbl.column(value_col).to_numpy(zero_copy_only=False)
        tb = tbl.column(tiebreak_col).to_numpy(zero_copy_only=False)
        # j: rank within the exact (group, value) tie block, by tiebreak
        order = np.lexsort((tb, v, code))
        cs, vs = code[order], v[order]
        new_seg = _segment_starts(cs) | np.r_[True, vs[1:] != vs[:-1]]
        seg_id = np.cumsum(new_seg) - 1
        pos = np.arange(len(cs), dtype=np.int64)
        j_sorted = pos - pos[new_seg][seg_id]
        j = np.empty(len(cs), dtype=np.int64)
        j[order] = j_sorted
        # broadcast lookup: per distinct group code present (few — NTILE
        # partitions), searchsorted inside that code's slice of the sorted
        # rank table; per-SEGMENT work, never per-row Python
        rank_start = np.empty(len(code), dtype=np.int64)
        n_row = np.empty(len(code), dtype=np.int64)
        for c in np.unique(code):
            sel = code == c
            lo, hi = np.searchsorted(bg, [c, c + 1])
            idx = lo + np.searchsorted(bv[lo:hi], v[sel])
            rank_start[sel] = brs[idx]
            n_row[sel] = bn[idx]
        buckets = ntile_bucket(rank_start + j, n_row, k)
        return pa.table(
            {
                tiebreak_col: tbl.column(tiebreak_col),
                group_col: tbl.column(group_col),
                "ntile": pa.array(buckets, pa.int64()),
            }
        )

    if srcs is not None:
        refs = [map_path.remote(p) for p in sorted(srcs)]
    else:
        refs = [map_table.remote(r) for r in arrow_block_refs(src)]
    if num_buckets == 1:
        refs = [[r] for r in refs]
    combine = _concat_remote()
    reduced = []
    for b in range(num_buckets):
        c = _tree_combine([refs[m][b] for m in range(len(refs))], combine)
        reduced.append(reduce_bucket.remote(rank_ref, *c))
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return empty
    return pa.concat_tables(tables)
