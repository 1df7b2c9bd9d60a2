"""Per-column statistics — streamed partial aggregates.

Per-batch partials (count / nulls / min / max / sum + HLL registers +
t-digest centroids) are computed inside the combined map_batches stage and
emitted as tiny serialized rows; the driver merges them (sketches are
mergeable — SURVEY.md §2E: 'per-batch partial stats → tree-reduce of
partials'). No shuffle: the partial rows are O(batches × columns), not
O(rows).
"""

from __future__ import annotations

import base64
import json
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..state.hll import HyperLogLog
from ..state.tdigest import TDigest
from ..util import hash_column


def batch_stats_partial(table: pa.Table, columns: list[str], digest_delta: int = 200) -> list[dict[str, Any]]:
    """One partial record per column for this batch; serialized compactly."""
    out = []
    for col in columns:
        if col not in table.column_names:
            continue
        arr = table.column(col)
        t = arr.type
        n = len(arr)
        nulls = arr.null_count
        rec: dict[str, Any] = {"column": col, "count": n, "nulls": nulls}
        is_num = pa.types.is_integer(t) or pa.types.is_floating(t)
        if is_num and n > nulls:
            vals = np.asarray(arr.combine_chunks().cast(pa.float64()).drop_null())
            rec["min"] = float(vals.min())
            rec["max"] = float(vals.max())
            rec["sum"] = float(vals.sum())
            td = TDigest(digest_delta)
            td.add(vals)
            rec["tdigest"] = td.to_json()
        elif (pa.types.is_string(t) or pa.types.is_large_string(t)) and n > nulls:
            lens = pc.utf8_length(arr)
            rec["min"] = float(pc.min(lens).as_py())
            rec["max"] = float(pc.max(lens).as_py())
            rec["sum"] = float(pc.sum(lens).as_py())
        hashable = (
            pa.types.is_integer(t)
            or pa.types.is_floating(t)
            or pa.types.is_boolean(t)
            or pa.types.is_timestamp(t)
            or pa.types.is_string(t)
            or pa.types.is_large_string(t)
        )
        if hashable:  # lists/structs/binary have no per-value HLL
            h = HyperLogLog()
            valid = arr.drop_null()
            if len(valid):
                h.add_hashes(hash_column(valid))
            rec["hll"] = base64.b64encode(h.to_bytes()).decode()
        out.append(rec)
    return out


def merge_stats_partials(partials: list[dict[str, Any]]) -> dict[str, dict[str, Any]]:
    """Driver-side merge of per-batch partials → final per-column stats."""
    agg: dict[str, dict[str, Any]] = {}
    hlls: dict[str, HyperLogLog] = {}
    tds: dict[str, TDigest] = {}
    for rec in partials:
        col = rec["column"]
        a = agg.setdefault(
            col, {"count": 0, "nulls": 0, "min": None, "max": None, "sum": 0.0}
        )
        a["count"] += rec["count"]
        a["nulls"] += rec["nulls"]
        if "min" in rec:
            a["min"] = rec["min"] if a["min"] is None else min(a["min"], rec["min"])
            a["max"] = rec["max"] if a["max"] is None else max(a["max"], rec["max"])
            a["sum"] += rec.get("sum", 0.0)
        if "hll" in rec:
            h = HyperLogLog.from_bytes(base64.b64decode(rec["hll"]))
            if col in hlls:
                hlls[col].merge(h)
            else:
                hlls[col] = h
        if "tdigest" in rec:
            td = TDigest.from_json(rec["tdigest"])
            if col in tds:
                tds[col].merge(td)
            else:
                tds[col] = td
    for col, a in agg.items():
        non_null = a["count"] - a["nulls"]
        a["null_rate"] = a["nulls"] / a["count"] if a["count"] else 0.0
        a["mean"] = a["sum"] / non_null if non_null else None
        if col in hlls:
            a["approx_distinct"] = hlls[col].estimate()
        if col in tds:
            td = tds[col]
            qs = td.quantile(np.array([0.01, 0.25, 0.5, 0.75, 0.99]))
            a["quantiles"] = {"p01": qs[0], "p25": qs[1], "p50": qs[2], "p75": qs[3], "p99": qs[4]}
            a["_tdigest"] = td
    return agg


class DomainTooLargeError(ValueError):
    """An exact count-table quantile path would materialize more than
    ``max_distinct`` (group, value) rows — the 'tiny shuffle' would be
    O(input distinct) ≈ O(rows) for a continuous column at scale (VERDICT
    r3 #4). Callers either surface this loudly (quantiles_lineitem) or
    route to the mergeable keyed t-digest fallback
    (:func:`grouped_quantiles_auto` / :func:`grouped_median_mad_auto`)."""


def batch_value_counts(
    table: pa.Table, columns: list[str], max_distinct: int = 100_000
) -> dict[str, dict[Any, int]]:
    """Per-batch exact value→count maps (nulls dropped) — the partial for
    EXACT quantiles over bounded-domain columns (dur_ms/sr_hz/codec-style
    discrete domains). Each batch contributes O(domain) entries, so the
    driver merge is O(batches × domain), never O(rows). For unbounded
    domains the mergeable t-digest above is the right tool; ``max_distinct``
    trips a loud error instead of a silent driver blow-up."""
    out: dict[str, dict[Any, int]] = {}
    for col in columns:
        vc = table.column(col).drop_null().value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        if len(vc) > max_distinct:
            raise ValueError(
                f"column {col!r}: {len(vc)} distinct values in one batch exceeds "
                f"max_distinct={max_distinct}; use the t-digest quantile path"
            )
        out[col] = dict(zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()))
    return out


def merge_value_counts(
    partials: list[dict[str, dict[Any, int]]], max_distinct: int = 100_000
) -> dict[str, dict[Any, int]]:
    merged: dict[str, dict[Any, int]] = {}
    for part in partials:
        for col, counts in part.items():
            m = merged.setdefault(col, {})
            for v, c in counts.items():
                m[v] = m.get(v, 0) + c
            if len(m) > max_distinct:
                raise ValueError(
                    f"column {col!r}: merged domain exceeds max_distinct={max_distinct}; "
                    "use the t-digest quantile path"
                )
    return merged


def exact_quantiles_from_counts(counts: dict[Any, int], q_bps: list[int]) -> list[Any]:
    """Discrete quantile with DuckDB quantile_disc semantics — the value at
    1-indexed rank ceil(q·n) of the sorted multiset (pinned empirically;
    exact integer arithmetic in basis points, no float rank drift)."""
    vals = sorted(counts)
    n = sum(counts.values())
    if n == 0:
        return [None] * len(q_bps)
    out = []
    cum = 0
    it = iter(vals)
    v = None
    for q_bp in sorted(q_bps):
        rank = max(1, -(-q_bp * n // 10000))
        while cum < rank:
            v = next(it)
            cum += counts[v]
        out.append((q_bp, v))
    by_bp = dict(out)
    return [by_bp[q] for q in q_bps]


def grouped_quantiles_from_count_table(
    counts: pa.Table, group_col: str, value_col: str, q_bps: list[int]
) -> dict[Any, list[Any]]:
    """Per-group exact quantile_disc from a (group, value, cnt) count table,
    fully vectorized: lexsort by (group, value), per-group cumulative counts,
    rank lookup via searchsorted. Same rank arithmetic as
    exact_quantiles_from_counts (1-indexed rank ceil(q·n), basis points) but
    O(rows log rows) numpy instead of a Python dict loop over every distinct
    value — the count table for a continuous column can be nearly as large
    as the input's distinct domain."""
    import numpy as np

    n_rows = counts.num_rows
    if n_rows == 0:
        return {}
    # dictionary_encode is C-speed; np.unique over an object array of
    # strings was ~0.3 s per call on a 600k-row count table (measured)
    enc = counts.column(group_col).combine_chunks().dictionary_encode()
    gcode = np.asarray(enc.indices, dtype=np.int64)
    ugroup = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    vals = counts.column(value_col).to_numpy(zero_copy_only=False)
    cnt = counts.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((vals, gcode))
    gc, v, c = gcode[order], vals[order], cnt[order]
    starts = np.flatnonzero(np.r_[True, gc[1:] != gc[:-1]])
    ends = np.r_[starts[1:], len(gc)]
    out: dict[Any, list[Any]] = {}
    for s, e in zip(starts, ends):
        cs = np.cumsum(c[s:e])
        n = int(cs[-1])
        qs = []
        for q_bp in q_bps:
            rank = max(1, -(-q_bp * n // 10000))
            qs.append(v[s + int(np.searchsorted(cs, rank, side="left"))])
        out[ugroup[gc[s]]] = qs
    return out


def grouped_median_mad_from_count_table(
    counts: pa.Table, group_col: str, value_col: str
) -> dict[Any, tuple[float, float]]:
    """Per-group (median, MAD) — MAD = quantile_disc(|v − median|, 0.5) —
    entirely from the (group, value, cnt) count table, NO second scan of
    the input: the absolute deviations of a weighted multiset are just a
    value transform of the same count rows, so the second weighted median
    reuses :func:`grouped_quantiles_from_count_table`'s kernel on a
    re-valued copy of the tiny table. Both medians use the pinned DuckDB
    quantile_disc rank convention; |v − m| is one exactly-rounded IEEE
    subtraction, so floats match DuckDB bit-for-bit."""
    med = {
        g: m
        for g, (m,) in grouped_quantiles_from_count_table(
            counts, group_col, value_col, [5000]
        ).items()
    }
    if not med:
        return {}
    enc = counts.column(group_col).combine_chunks().dictionary_encode()
    gcode = np.asarray(enc.indices, dtype=np.int64)
    ugroup = enc.dictionary.to_pylist()
    vals = counts.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
    med_by_code = np.array([float(med[g]) for g in ugroup], dtype=np.float64)
    absdev = np.abs(vals - med_by_code[gcode])
    dev_counts = pa.table(
        {
            group_col: counts.column(group_col),
            value_col: pa.array(absdev, pa.float64()),
            "cnt": counts.column("cnt"),
        }
    )
    mad = grouped_quantiles_from_count_table(dev_counts, group_col, value_col, [5000])
    return {g: (float(med[g]), float(mad[g][0])) for g in med}


def grouped_topk_table(
    table: pa.Table, group_col: str, order_col: str, tiebreak_col: str, k: int
) -> pa.Table:
    """Top-k rows PER GROUP (order_col desc, tiebreak asc) — one vectorized
    kernel: dictionary-encode the group, lexsort, rank-within-group via a
    repeated-boundary subtraction, keep rank < k. Used per batch (local
    candidates) and once on the driver over the O(batches × groups × k)
    candidate set — a grouped top-k with NO global sort shuffle."""
    if len(table) == 0:
        return table
    codes_arr = table.column(group_col).combine_chunks().dictionary_encode()
    codes = np.asarray(codes_arr.indices.fill_null(-1), dtype=np.int64)
    order_c = table.column(order_col)
    tie_c = table.column(tiebreak_col)
    if order_c.null_count or tie_c.null_count:
        raise ValueError("grouped_topk_table: order/tiebreak columns must be non-null")
    order_v = np.asarray(order_c.combine_chunks(), dtype=np.int64)
    tie_v = np.asarray(tie_c.combine_chunks(), dtype=np.int64)
    perm = np.lexsort((tie_v, -order_v, codes))
    c = codes[perm]
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    group_start = np.repeat(starts, np.diff(np.r_[starts, len(c)]))
    rank = np.arange(len(c)) - group_start
    keep = rank < k
    out = table.take(pa.array(perm[keep], pa.int64()))
    return out.append_column("rnk", pa.array(rank[keep] + 1, pa.int64()))


def grouped_tdigest_quantiles_shuffled(
    paths: list[str],
    group_col: str,
    value_col: str,
    q_bps: list[int],
    delta: int = 400,
    center: dict[Any, float] | None = None,
) -> dict[Any, list[float]]:
    """Per-group APPROXIMATE quantiles via mergeable t-digests — the scale
    path for unbounded/continuous domains: one raw-Ray map per shard emits
    O(groups) serialized digests (never O(distinct) rows), the driver
    merges per group. ``center`` (group → m) digests |v − m| instead of v —
    the MAD second pass without a count table. Groups are assumed few
    (the engine's grouped checks key on low-cardinality flags); a digest
    per (shard × group) is what crosses the wire."""
    import ray

    cpaths = sorted(paths)

    @ray.remote
    def map_shard(path: str, center_arg: dict[Any, float] | None) -> pa.Table:
        tbl = pq.read_table(path, columns=[group_col, value_col])
        mask = pc.and_(
            tbl.column(group_col).combine_chunks().is_valid(),
            tbl.column(value_col).combine_chunks().is_valid(),
        )
        tbl = tbl.filter(mask)
        if tbl.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()), "td": pa.array([], pa.string())})
        enc = tbl.column(group_col).combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        groups = enc.dictionary.to_pylist()
        vals = np.asarray(tbl.column(value_col).combine_chunks().cast(pa.float64()))
        order = np.argsort(codes, kind="stable")
        codes_s, vals_s = codes[order], vals[order]
        starts = np.flatnonzero(np.r_[True, codes_s[1:] != codes_s[:-1]])
        ends = np.r_[starts[1:], len(codes_s)]
        out_g, out_td = [], []
        for s, e in zip(starts, ends):
            g = groups[codes_s[s]]
            seg = vals_s[s:e]
            if center_arg is not None:
                seg = np.abs(seg - float(center_arg[g]))
            td = TDigest(delta)
            td.add(seg)
            out_g.append(g)
            out_td.append(td.to_json())
        return pa.table({group_col: pa.array(out_g), "td": pa.array(out_td, pa.string())})

    parts = ray.get([map_shard.remote(p, center) for p in cpaths])
    merged: dict[Any, TDigest] = {}
    for t in parts:
        for g, tj in zip(t.column(group_col).to_pylist(), t.column("td").to_pylist()):
            td = TDigest.from_json(tj)
            if g in merged:
                merged[g].merge(td)
            else:
                merged[g] = td
    q = np.array([bp / 10000.0 for bp in q_bps])
    return {g: [float(x) for x in td.quantile(q)] for g, td in merged.items()}


def grouped_quantiles_auto(
    paths: list[str],
    group_col: str,
    value_col: str,
    q_bps: list[int],
    max_distinct: int = 1_000_000,
) -> tuple[str, dict[Any, list[Any]]]:
    """Domain-guarded router (VERDICT r3 #4): EXACT per-group quantile_disc
    from the (group, value) count-table shuffle while the merged domain
    stays ≤ ``max_distinct`` rows; when a continuous column would blow
    that bound (count table ≈ O(rows)), routes LOUDLY (warning) to the
    keyed t-digest fallback. Returns ("exact"|"tdigest", group → values);
    bounded-domain results are bit-identical to the non-routed path."""
    import warnings

    import ray

    from .shuffle import count_keys_shuffled

    try:
        counts = count_keys_shuffled(
            paths, [group_col, value_col], min_count=1, max_key_rows=max_distinct
        )
    except DomainTooLargeError as e:
        reason = str(e)
    except ray.exceptions.RayTaskError as e:
        if not isinstance(e.cause, DomainTooLargeError):
            raise
        reason = str(e.cause)
    else:
        return "exact", grouped_quantiles_from_count_table(
            counts, group_col, value_col, q_bps
        )
    warnings.warn(
        f"grouped quantiles on {value_col!r}: {reason} — routing to the "
        "approximate keyed t-digest path",
        stacklevel=2,
    )
    return "tdigest", grouped_tdigest_quantiles_shuffled(paths, group_col, value_col, q_bps)


def grouped_median_mad_auto(
    paths: list[str],
    group_col: str,
    value_col: str,
    max_distinct: int = 1_000_000,
) -> tuple[str, dict[Any, tuple[float, float]]]:
    """Domain-guarded (median, MAD) router: exact from one count-table
    shuffle on bounded domains; on :class:`DomainTooLargeError` routes to
    TWO t-digest passes (median, then |v − median| with the medians
    broadcast as remote-call args) — no count table ever materializes."""
    import warnings

    import ray

    from .shuffle import count_keys_shuffled

    try:
        counts = count_keys_shuffled(
            paths, [group_col, value_col], min_count=1, max_key_rows=max_distinct
        )
    except DomainTooLargeError as e:
        reason = str(e)
    except ray.exceptions.RayTaskError as e:
        if not isinstance(e.cause, DomainTooLargeError):
            raise
        reason = str(e.cause)
    else:
        return "exact", grouped_median_mad_from_count_table(counts, group_col, value_col)
    warnings.warn(
        f"grouped median/MAD on {value_col!r}: {reason} — routing to the "
        "approximate keyed t-digest path",
        stacklevel=2,
    )
    med = {
        g: v[0]
        for g, v in grouped_tdigest_quantiles_shuffled(
            paths, group_col, value_col, [5000]
        ).items()
    }
    mad = grouped_tdigest_quantiles_shuffled(
        paths, group_col, value_col, [5000], center=med
    )
    return "tdigest", {g: (float(med[g]), float(mad[g][0])) for g in med}


def stats_to_table(stats: dict[str, dict[str, Any]]) -> pa.Table:
    """Final stats as an Arrow table (column, count, nulls, min, max, mean,
    approx_distinct)."""
    cols = sorted(stats)
    return pa.table(
        {
            "column": pa.array(cols, pa.string()),
            "count": pa.array([stats[c]["count"] for c in cols], pa.int64()),
            "nulls": pa.array([stats[c]["nulls"] for c in cols], pa.int64()),
            "min": pa.array([stats[c].get("min") for c in cols], pa.float64()),
            "max": pa.array([stats[c].get("max") for c in cols], pa.float64()),
            "mean": pa.array([stats[c].get("mean") for c in cols], pa.float64()),
            "approx_distinct": pa.array(
                [stats[c].get("approx_distinct") for c in cols], pa.float64()
            ),
        }
    )
