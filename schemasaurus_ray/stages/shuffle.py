"""Explicit hash-partitioned shuffle aggregation — raw Ray tasks.

Why raw Ray here (the documented last-resort case): Ray Data's
sort-based ``groupby().aggregate()`` measured ~65 s for a 2M-string-key
count on this machine (~30k rows/s) — two orders of magnitude off a plain
hash aggregation. Uniqueness/referential checks over key columns are the
engine's hottest shuffles (north_rule: "explicit hash-partitioned
groupby-aggregate shuffles with salted-key skew mitigation"), so they get a
hand-rolled map/reduce:

- **map** (one task per input shard): read ONLY the key columns from the
  parquet shard, pre-aggregate within the shard (vectorized pyarrow
  ``group_by`` — a pathological hot key collapses to one row per shard =
  the salt/combiner step), split the (key, cnt) rows by
  ``splitmix64(key) % B`` into B bucket tables;
- **reduce** (one task per bucket): concat its bucket slice from every map
  task, ``group_by`` once more, emit the final (key, cnt) rows.

Data through the object store = the pre-aggregated key rows only (no wide
columns). At large shard counts M the per-bucket reduce does NOT take M
arguments: inputs are tree-combined in fan-in-``_FAN_IN`` layers first
(each layer concat+group_by-sums its slice), so no single task ever holds
more than ``_FAN_IN`` inputs and the final reduce sees ≤ ``_FAN_IN`` refs.

Resume: ``combined_key_checks_async`` can persist each shard's key-count
pre-agg to ``partials_dir`` and, for shards listed in ``done_paths``,
reload the persisted partial instead of re-reading the shard's key column
— uniqueness/referential on resume then costs only the NEW shards' reads.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..util import arrow_block_refs, hash_column, splitmix64

# max inputs per combine/reduce task — bounds task-arg counts and keeps the
# reduce tree ~2 levels deep up to ~4k shards, 3 levels to ~260k
_FAN_IN = 64


_BUCKETS_PER_NODE = 16


def _cluster_nodes() -> int:
    """Alive Ray node count (1 when Ray isn't initialized) — factored out
    so tests can mock a multi-node resource map, and cached per process:
    the node set of a fixed-size cluster doesn't change mid-pipeline and
    ray.nodes() is a GCS round-trip we don't want per shuffle."""
    global _CLUSTER_NODES_CACHE
    if _CLUSTER_NODES_CACHE is None:
        try:
            import ray

            if not ray.is_initialized():
                return 1  # don't cache pre-init: ray.init may follow
            _CLUSTER_NODES_CACHE = max(1, sum(1 for n in ray.nodes() if n.get("Alive")))
        except Exception:
            return 1
    return _CLUSTER_NODES_CACHE


_CLUSTER_NODES_CACHE: "int | None" = None


def _default_buckets(n_shards: int) -> int:
    """Reduce-bucket count: shards/4, floor 4, capped at 16 PER NODE.

    The per-node clamp is measured, twice: raising buckets to the CPU
    count (32) on this one box made the 16M-key scaling wall WORSE (4.2 s
    -> 4.9-5.9 s pre-malloc-tuning; re-confirmed post-tuning round 3:
    3.0 s @ 16 vs 3.4 s @ 32) — per-map object multiplication
    (maps × buckets tiny objects) costs more than the extra reduce
    parallelism buys on a single machine. On a multi-node cluster the
    reduce bandwidth scales with nodes, so the cap does too
    (16 × alive nodes, VERDICT r4 #6) while the floor/ratio stay the
    same. GRAFT_SHUFFLE_BUCKETS overrides for experiments."""
    import os

    env = os.environ.get("GRAFT_SHUFFLE_BUCKETS")
    if env:
        return int(env)
    return min(_BUCKETS_PER_NODE * _cluster_nodes(), max(4, n_shards // 4))


def _tree_combine(refs: list, combine_remote, fan_in: int | None = None) -> list:
    """Collapse a list of per-map object refs for ONE bucket into ≤ fan_in
    refs by layering combine tasks. Returns the surviving refs (callers pass
    them to the final reduce)."""
    fan_in = fan_in if fan_in is not None else _FAN_IN
    while len(refs) > fan_in:
        refs = [
            combine_remote.remote(*refs[i : i + fan_in]) for i in range(0, len(refs), fan_in)
        ]
    return refs


def partial_key_files(partials_dir: str, key_col: str, pid: int) -> list[str]:
    """Persisted key-pre-agg files for ONE shard: the single-file form
    (keys_<col>_p<pid>.parquet, written by map_left) plus the row pass's
    content-hashed chunk files (keys_<col>_p<pid>-<hash>.parquet).
    The patterns are EXACT on the pid: an open-ended ``p{pid:05d}*`` glob
    would let pid 3 swallow pid 31's files (p00003 is a string prefix of
    p00031) and double-count keys across shards."""
    import glob as _glob

    base = os.path.join(partials_dir, f"keys_{key_col}_p{pid:05d}")
    return sorted(_glob.glob(base + ".parquet") + _glob.glob(base + "-*.parquet"))


def _combined_hash(table: pa.Table, columns: list[str]) -> np.ndarray:
    h = hash_column(table.column(columns[0]))
    for c in columns[1:]:
        h = splitmix64(h ^ hash_column(table.column(c)))
    return h


def group_agg_fixed_first(tbl: pa.Table, key_cols: list[str], specs: list) -> pa.Table:
    """Multi-key hash aggregate with the key columns reordered
    FIXED-WIDTH-FIRST for the kernel call, then restored to the caller's
    order. Works around a pyarrow 16 grouper defect: when a fixed-width
    key FOLLOWS a null-bearing varlen (string/binary) key, the row
    encoder emits the NULL group once per internal batch instead of
    merging it (measured: ['event_type', 'hod'] with NULL types over 4k
    rows → 100+ output rows for the 5 true groups; ['s1','s2','i1'] at
    20k rows → 5281 rows for 525 true groups). Key order never changes
    the induced partition, so results are identical on null-free inputs
    (regression-pinned in test_shuffle). EVERY multi-key group_by in the
    engine must route through this helper."""
    if len(key_cols) <= 1:
        return tbl.group_by(key_cols).aggregate(specs)

    def _fixed(name: str) -> bool:
        t = tbl.schema.field(name).type
        return not (
            pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_binary(t)
            or pa.types.is_large_binary(t)
        )

    ordered = [k for k in key_cols if _fixed(k)] + [k for k in key_cols if not _fixed(k)]
    out = tbl.group_by(ordered).aggregate(specs)
    agg_names = out.column_names[len(ordered):]
    return out.select(key_cols + agg_names)


def _precount_table(tbl: pa.Table, columns: list[str]) -> pa.Table:
    sub = pa.table({c: tbl.column(c) for c in columns})
    counts = group_agg_fixed_first(sub, columns, [([], "count_all")])
    return counts.rename_columns(columns + ["cnt"])


def _split_buckets(counts: pa.Table, columns: list[str], num_buckets: int) -> list[pa.Table]:
    h = _combined_hash(counts, columns)
    buckets = (h % np.uint64(num_buckets)).astype(np.int64)
    order = np.argsort(buckets, kind="stable")
    sorted_tbl = counts.take(pa.array(order, pa.int64()))
    sorted_buckets = buckets[order]
    bounds = np.searchsorted(sorted_buckets, np.arange(num_buckets + 1))
    return [
        sorted_tbl.slice(bounds[b], bounds[b + 1] - bounds[b]) for b in range(num_buckets)
    ]


def _typed_key_empty(paths, columns: list[str], extra: list[tuple[str, "pa.DataType"]]) -> pa.Table:
    """Empty result with key columns typed from the first shard's parquet
    footer (string fallback only when no shard exists to ask) — a
    string-typed fallback flips the output schema with data content
    (review r3 fixed this in heavy_hitters; generalized to every shuffle's
    zero-result/zero-input path in round 5)."""
    sch = None
    str_paths = sorted(p for p in paths if isinstance(p, (str, os.PathLike)))
    if str_paths:
        try:
            sch = pq.read_schema(str_paths[0])
        except Exception:
            sch = None
    cols = {
        c: pa.array([], sch.field(c).type if sch is not None and c in sch.names else pa.string())
        for c in columns
    }
    for name, typ in extra:
        cols[name] = pa.array([], typ)
    return pa.table(cols)


def count_keys_shuffled(
    paths: list[str],
    columns: list[str],
    num_buckets: int | None = None,
    min_count: int = 2,
    path_pids: dict[str, int] | None = None,
    partials_dir: str | None = None,
    max_key_rows: int | None = None,
) -> pa.Table:
    """(key columns..., cnt) for keys with total count ≥ ``min_count``
    across all parquet shards. min_count=2 → duplicate keys (uniqueness
    violations); min_count=1 → full distinct key counts.

    With ``partials_dir``/``path_pids`` set, shards whose row-pass key
    pre-agg chunks exist on disk (written by CombinedStage._sink_key_partials
    under the '+'-joined column name) are served from those tiny files —
    including COMPOSITE keys — so this shuffle re-reads NOTHING from the
    heavy input (one-scan invariant, VERDICT r2 #10).

    ``max_key_rows`` trips :class:`stats.DomainTooLargeError` LOUDLY — in
    the map tasks (per-shard domain) and on the driver (merged total) —
    instead of silently shuffling an O(rows) 'count table' for a
    continuous column; the grouped-quantile routers catch it and fall back
    to keyed t-digests (VERDICT r3 #4)."""
    import ray

    from .stats import DomainTooLargeError

    if not paths:  # all shards quarantined/skipped: report, don't crash
        return _typed_key_empty(paths, columns, [("cnt", pa.int64())])
    num_buckets = num_buckets or _default_buckets(len(paths))
    key_name = "+".join(columns)

    @ray.remote(num_returns=num_buckets)
    def map_shard(path: str):
        tbl = pq.read_table(path, columns=columns)
        counts = _precount_table(tbl, columns)
        if max_key_rows is not None and counts.num_rows > max_key_rows:
            raise DomainTooLargeError(
                f"shard {path!r}: {counts.num_rows} distinct {columns} keys exceed "
                f"max_key_rows={max_key_rows}"
            )
        out = _split_buckets(counts, columns, num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote(num_returns=num_buckets)
    def load_partial(files: list[str]):
        merged = pa.concat_tables([pq.read_table(f, columns=columns + ["cnt"]) for f in files])
        counts = (
            group_agg_fixed_first(merged, columns, [("cnt", "sum")]).rename_columns(columns + ["cnt"])
        )
        out = _split_buckets(counts, columns, num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote
    def combine_bucket(*tables: pa.Table) -> pa.Table:
        merged = pa.concat_tables(tables)
        if merged.num_rows == 0:
            return merged
        return group_agg_fixed_first(merged, columns, [("cnt", "sum")]).rename_columns(columns + ["cnt"])

    @ray.remote
    def reduce_bucket(*tables: pa.Table) -> pa.Table:
        merged = pa.concat_tables(tables)
        if merged.num_rows == 0:
            return merged
        agg = group_agg_fixed_first(merged, columns, [("cnt", "sum")])
        agg = agg.rename_columns(columns + ["cnt"])
        if min_count > 1:
            agg = agg.filter(pc.greater_equal(agg.column("cnt"), min_count))
        return agg

    refs = []
    for p in sorted(paths):
        files = (
            partial_key_files(partials_dir, key_name, path_pids[p])
            if partials_dir is not None and path_pids is not None and p in path_pids
            else []
        )
        refs.append(load_partial.remote(files) if files else map_shard.remote(p))
    if num_buckets == 1:
        refs = [[r] for r in refs]
    reduced = [
        reduce_bucket.remote(*_tree_combine([refs[m][b] for m in range(len(refs))], combine_bucket))
        for b in range(num_buckets)
    ]
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return _typed_key_empty(paths, columns, [("cnt", pa.int64())])
    if max_key_rows is not None:
        total = sum(t.num_rows for t in tables)
        if total > max_key_rows:
            raise DomainTooLargeError(
                f"{total} merged distinct {columns} keys exceed max_key_rows={max_key_rows}"
            )
    return pa.concat_tables(tables)


def _precount_map_fns(columns: list[str], num_buckets: int):
    """(map_shard, combine_bucket) pair shared by the key-audit shuffles
    (heavy hitters / count histogram): per-shard pre-agg + key-hash bucket
    split, and a group-by-sum bucket combiner."""
    import ray

    @ray.remote(num_returns=num_buckets)
    def map_shard(path: str):
        tbl = pq.read_table(path, columns=columns)
        counts = _precount_table(tbl, columns)
        out = _split_buckets(counts, columns, num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote
    def combine_bucket(*tables: pa.Table) -> pa.Table:
        merged = pa.concat_tables(tables)
        if merged.num_rows == 0:
            return merged
        return group_agg_fixed_first(merged, columns, [("cnt", "sum")]).rename_columns(columns + ["cnt"])

    return map_shard, combine_bucket


def heavy_hitters_shuffled(
    paths: list[str],
    columns: list[str],
    mult_num: int,
    mult_den: int,
    num_buckets: int | None = None,
) -> pa.Table:
    """Keys whose row count exceeds ``mult_num/mult_den`` × the FAIR SHARE
    (total rows ÷ distinct keys) — the shuffle-skew / hot-key audit that
    decides which keys need salting. Exact integer predicate
    ``cnt · n_keys · mult_den > total · mult_num``.

    Scale shape: the global (total, n_keys) needed for the threshold are
    NOT known until every key is counted, but the full key-count table must
    never land on the driver (billions of keys at 100 TB). So: the standard
    per-shard pre-agg + key-hash bucket shuffle builds per-bucket count
    tables that STAY in the object store; each bucket reports only a
    (n_keys, total) pair; the driver sums B pairs and launches one filter
    task per bucket with the two global scalars. Only the (few) hot keys
    ever leave the reduce tasks."""
    import ray

    if not paths:
        return _typed_key_empty(paths, columns, [("cnt", pa.int64())])
    num_buckets = num_buckets or _default_buckets(len(paths))
    map_shard, combine_bucket = _precount_map_fns(columns, num_buckets)

    @ray.remote
    def bucket_stats(tbl: pa.Table) -> tuple[int, int]:
        if tbl.num_rows == 0:
            return (0, 0)
        return (tbl.num_rows, int(pc.sum(tbl.column("cnt")).as_py()))

    @ray.remote
    def filter_bucket(tbl: pa.Table, thr: int) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        return tbl.filter(pc.greater_equal(tbl.column("cnt"), thr))

    refs = [map_shard.remote(p) for p in sorted(paths)]
    if num_buckets == 1:
        refs = [[r] for r in refs]
    bucket_refs = [
        combine_bucket.remote(
            *_tree_combine([refs[m][b] for m in range(len(refs))], combine_bucket)
        )
        for b in range(num_buckets)
    ]
    def _typed_empty() -> pa.Table:
        return _typed_key_empty(paths, columns, [("cnt", pa.int64())])

    stats = ray.get([bucket_stats.remote(r) for r in bucket_refs])
    n_keys = sum(s[0] for s in stats)
    total = sum(s[1] for s in stats)
    if total == 0:
        return _typed_empty()
    # cnt·n_keys·den > total·num ⟺ cnt ≥ ⌊total·num / (n_keys·den)⌋ + 1 —
    # the division happens ONCE in driver bigints, so the per-row predicate
    # is a plain int64 compare (no overflow at any scale)
    thr = (total * mult_num) // (n_keys * mult_den) + 1
    tables = [
        t
        for t in ray.get([filter_bucket.remote(r, thr) for r in bucket_refs])
        if t.num_rows
    ]
    if not tables:
        return _typed_empty()
    return pa.concat_tables(tables)


def key_count_histogram_shuffled(
    paths: list[str],
    columns: list[str],
    num_buckets: int | None = None,
) -> pa.Table:
    """(cnt, n_keys): how many keys occur exactly cnt times — the key-
    DISTRIIBUTION audit behind partitioning decisions (is this key column
    uniform, Zipfian, or degenerate?), companion to
    :func:`heavy_hitters_shuffled`. Same per-shard pre-agg + key-hash
    bucket shuffle; each bucket collapses its exact per-key counts to a
    (cnt, n_keys) histogram IN THE REDUCE, so only ≤ B tiny histograms
    reach the driver — never a key table."""
    import ray

    if not paths:
        return pa.table({"cnt": pa.array([], pa.int64()), "n_keys": pa.array([], pa.int64())})
    num_buckets = num_buckets or _default_buckets(len(paths))
    map_shard, combine_bucket = _precount_map_fns(columns, num_buckets)

    @ray.remote
    def histogram_bucket(*tables: pa.Table) -> pa.Table:
        merged = pa.concat_tables(tables)
        empty = pa.table(
            {"cnt": pa.array([], pa.int64()), "n_keys": pa.array([], pa.int64())}
        )
        if merged.num_rows == 0:
            return empty
        agg = group_agg_fixed_first(merged, columns, [("cnt", "sum")])
        agg = agg.rename_columns(columns + ["cnt"])
        h = agg.group_by("cnt").aggregate([([], "count_all")])
        return h.rename_columns(["cnt", "n_keys"])

    refs = [map_shard.remote(p) for p in sorted(paths)]
    if num_buckets == 1:
        refs = [[r] for r in refs]
    hists = ray.get(
        [
            histogram_bucket.remote(
                *_tree_combine([refs[m][b] for m in range(len(refs))], combine_bucket)
            )
            for b in range(num_buckets)
        ]
    )
    tables = [t for t in hists if t.num_rows]
    if not tables:
        return pa.table({"cnt": pa.array([], pa.int64()), "n_keys": pa.array([], pa.int64())})
    merged = pa.concat_tables(tables)
    out = merged.group_by("cnt").aggregate([("n_keys", "sum")])
    return out.rename_columns(["cnt", "n_keys"]).sort_by("cnt")


def _right_map_fns(right_col: str, num_buckets: int):
    """Remote fns for the right (reference) side of a key shuffle — built by
    both the early-overlap launcher and combined_key_checks_async."""
    import ray

    @ray.remote(num_returns=num_buckets)
    def map_right_path(path: str):
        tbl = pq.read_table(path, columns=[right_col])
        keys = pa.table({right_col: tbl.column(right_col).combine_chunks().unique()})
        keys = keys.append_column("cnt", pa.array([1] * keys.num_rows, pa.int64()))
        out = _split_buckets(keys, [right_col], num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote(num_returns=num_buckets)
    def map_right_table(tbl: pa.Table):
        if tbl.num_rows == 0 or right_col not in tbl.column_names:
            # empty/union-sentinel blocks can carry an empty schema; type the
            # sentinel from the block when possible (a string-typed sentinel
            # crashed concat for int reference keys). Schema-less sentinels
            # are safe only because combine/reduce FILTER empty tables out.
            ktype = tbl.schema.field(right_col).type if right_col in tbl.column_names else pa.string()
            e = pa.table({right_col: pa.array([], ktype), "cnt": pa.array([], pa.int64())})
            return [e] * num_buckets if num_buckets > 1 else e
        keys = pa.table({right_col: tbl.column(right_col).combine_chunks().unique()})
        keys = keys.append_column("cnt", pa.array([1] * keys.num_rows, pa.int64()))
        out = _split_buckets(keys, [right_col], num_buckets)
        return out if num_buckets > 1 else out[0]

    return map_right_path, map_right_table


def launch_right_maps(right: "Any", right_col: str, num_buckets: int) -> list:
    """Launch the reference-side key maps NOW. They have no dependency on
    the left row pass, so calling this BEFORE the row pass overlaps the
    reference table's read+hash+bucket-split with it (the streaming
    executor and these raw tasks share the CPU pool) — measured ~40% idle
    CPU during the 32-CPU row pass that this fills. Pass the result to
    ``combined_key_checks_async(..., right_refs=...)`` with the same
    ``num_buckets``."""
    map_right_path, map_right_table = _right_map_fns(right_col, num_buckets)
    if isinstance(right, list):
        return [map_right_path.remote(p) for p in sorted(right)]
    return [map_right_table.remote(ref) for ref in arrow_block_refs(right)]


class FusedLeftStreamer:
    """Overlap the fused key check's LEFT side with the row pass.

    The row pass writes each batch's (key, cnt, pid) pre-agg chunk to
    ``partials_dir`` (atomic rename, so every visible file is complete).
    The driver calls :meth:`poll` between drained row-pass batches — it is
    otherwise idle-waiting there — and each new chunk file immediately gets
    a bucket-split task, so by the time the row pass finishes most of the
    shuffle's map side is already done. Pass :meth:`refs` as ``left_refs``
    to :func:`combined_key_checks_async` (same ``num_buckets``); duplicate
    (key, pid) rows across one shard's chunk files are collapsed in the
    reduce's attribution step."""

    def __init__(self, key_col: str, num_buckets: int, partials_dir: str):
        import glob as _glob
        import re as _re

        import ray

        self._glob = _glob
        self._pattern = os.path.join(partials_dir, f"keys_{key_col}_p*.parquet")
        # exact-name check behind the glob: a column literally named
        # "<key>_p00003" must not have its files swallowed by this key
        self._re = _re.compile(
            _re.escape(os.path.join(partials_dir, f"keys_{key_col}_p"))
            + r"\d{5}(-[^/]+)?\.parquet$"
        )
        self._seen: set[str] = set()
        self._refs: list = []
        self._num_buckets = num_buckets

        @ray.remote(num_returns=num_buckets)
        def split_chunk(path: str):
            tbl = pq.read_table(path)  # (key, cnt, pid) rows
            out = _split_buckets(tbl, [key_col], num_buckets)
            return out if num_buckets > 1 else out[0]

        self._split = split_chunk

    def poll(self) -> int:
        """Launch split tasks for chunk files that appeared since the last
        call; returns the number launched."""
        new = 0
        for f in self._glob.glob(self._pattern):
            if f not in self._seen and self._re.match(f):
                self._seen.add(f)
                self._refs.append(self._split.remote(f))
                new += 1
        return new

    def refs(self) -> list:
        self.poll()
        return self._refs


def combined_key_checks(
    left_paths: list[str],
    key_col: str,
    right: "Any",
    right_col: str | None,
    num_buckets: int | None = None,
    path_pids: dict[str, int] | None = None,
) -> tuple[pa.Table, pa.Table]:
    return combined_key_checks_async(
        left_paths, key_col, right, right_col, num_buckets, path_pids
    )()


def combined_key_checks_async(
    left_paths: list[str],
    key_col: str,
    right: "Any",  # list[str] parquet paths | ray.data.Dataset | None
    right_col: str | None,
    num_buckets: int | None = None,
    path_pids: dict[str, int] | None = None,
    partials_dir: str | None = None,
    done_paths: "set[str] | None" = None,
    right_refs: list | None = None,
    left_refs: list | None = None,
):
    """ONE shuffle for both key rules when uniqueness and referential share
    the key column (the common case: clip_id): the left key column is read
    and pre-aggregated once per shard; each bucket reduce emits both
    (key, cnt>1) duplicates and keys absent from the right side — each with
    a ``pid`` column attributing every violating key occurrence back to its
    source shard/partition (so global key rules feed per-partition verdicts;
    ``path_pids`` maps shard path → partition id, default = sort index).

    ASYNC: all map/reduce tasks are launched immediately and run concurrently
    with whatever the caller does next (e.g. the row-rule pass — the streaming
    executor and these raw tasks share the CPU pool with no barrier between
    them). Call the returned closure to block for the
    (duplicates, orphans) tables: (key, cnt, pid) rows, one per
    (violating key, source partition).

    INCREMENTAL RESUME: with ``partials_dir`` set, each map task persists its
    shard's (key, cnt, pid) pre-agg as parquet (atomic rename); shards in
    ``done_paths`` whose partial exists are served by reloading that tiny
    file instead of re-reading the shard's key column — on resume only NEW
    shards touch the heavy input."""
    import ray

    num_buckets = num_buckets or _default_buckets(len(left_paths))
    ordered = sorted(left_paths)
    pids = {p: (path_pids.get(p, -1) if path_pids else i) for i, p in enumerate(ordered)}

    def _partial_path(pid: int) -> str:
        return os.path.join(partials_dir, f"keys_{key_col}_p{pid:05d}.parquet")

    def _partial_files(pid: int) -> list[str]:
        return partial_key_files(partials_dir, key_col, pid)

    @ray.remote(num_returns=num_buckets)
    def map_left(path: str, pid: int):
        tbl = pq.read_table(path, columns=[key_col])
        counts = _precount_table(tbl, [key_col])
        counts = counts.append_column("pid", pa.array([pid] * counts.num_rows, pa.int32()))
        if partials_dir is not None:
            os.makedirs(partials_dir, exist_ok=True)
            final = _partial_path(pid)
            tmp = final + f".tmp{os.getpid()}"
            pq.write_table(counts, tmp)
            os.replace(tmp, final)
        out = _split_buckets(counts, [key_col], num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote(num_returns=num_buckets)
    def load_left_partial(files: list[str]):
        counts = pa.concat_tables([pq.read_table(f) for f in files])
        if len(files) > 1:
            # chunked partials (one per row-pass batch): collapse to one row
            # per (key, pid) so downstream attribution stays one-per-pair
            counts = (
                group_agg_fixed_first(counts, [key_col, "pid"], [("cnt", "sum")])
                .rename_columns([key_col, "pid", "cnt"])
                .select([key_col, "cnt", "pid"])
            )
        out = _split_buckets(counts, [key_col], num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote(num_returns=2)
    def reduce_bucket(n_left: int, *tables: pa.Table):
        left = [t for t in tables[:n_left] if t.num_rows]
        rights = [t for t in tables[n_left:] if t.num_rows]
        empty = pa.table(
            {
                key_col: pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
                "pid": pa.array([], pa.int32()),
            }
        )
        if not left:
            return empty, empty
        per_pid = pa.concat_tables(left)  # (key, cnt, pid) rows
        lagg = (
            per_pid.group_by([key_col])
            .aggregate([("cnt", "sum")])
            .rename_columns([key_col, "cnt_total"])
        )

        def attribute(bad_keys: pa.Table) -> pa.Table:
            """→ one (key, cnt, pid) row per (violating key, source shard),
            cnt = total occurrences of the key across ALL shards."""
            if bad_keys.num_rows == 0:
                return empty
            hit = per_pid.filter(
                pc.is_in(per_pid.column(key_col), value_set=bad_keys.column(key_col).combine_chunks())
            )
            # collapse to ONE row per (key, pid): streamed per-FILE inputs
            # (FusedLeftStreamer) can carry the same (key, pid) in several
            # chunk files of one shard — cheap here because `hit` is only
            # the violating keys, not the bucket
            hit = (
                group_agg_fixed_first(hit, [key_col, "pid"], [("cnt", "sum")])
                .rename_columns([key_col, "pid", "cnt"])
            )
            totals = {
                k: c
                for k, c in zip(
                    bad_keys.column(key_col).to_pylist(), bad_keys.column("cnt_total").to_pylist()
                )
            }
            keys = hit.column(key_col).to_pylist()
            return pa.table(
                {
                    key_col: hit.column(key_col),
                    "cnt": pa.array([totals[k] for k in keys], pa.int64()),
                    "pid": hit.column("pid"),
                }
            )

        dups = attribute(lagg.filter(pc.greater_equal(lagg.column("cnt_total"), 2)))
        if right_col is None:
            return dups, empty
        if rights:
            # no .unique() on the right side: is_in accepts duplicate value
            # sets, and uniquing 16M strings per bucket was a full hash pass.
            # Keep pc.is_in here: a polars semi-join microbenches 3x faster
            # but measured 2x SLOWER inside 16 concurrent reduce workers —
            # pl.from_arrow copies the string data through polars' internal
            # mimalloc, which the glibc page-reuse tuning cannot reach, so
            # every concurrent task re-pays the kernel page-zeroing tax.
            rkeys = pa.concat_tables(rights).column(right_col).combine_chunks()
            mask = pc.invert(
                pc.is_in(lagg.column(key_col), value_set=rkeys.cast(lagg.column(key_col).type))
            )
            orphans = attribute(lagg.filter(pc.fill_null(mask, True)))
        else:
            orphans = attribute(lagg)
        return dups, orphans

    @ray.remote
    def combine_left(*tables: pa.Table) -> pa.Table:
        """Tree-combine layer for the left side: CONCAT ONLY. The inputs are
        per-shard (key, cnt, pid) pre-aggs whose (key, pid) pairs are
        already unique across shards (distinct pids; chunked partials were
        collapsed at load), so the former group_by here was a full-size
        string hash-agg that shrank nothing — one entire pass over every
        key deleted from the shuffle phase (VERDICT r2 #2). The reduce's
        own group_by does the real counting; combine layers exist to bound
        task fan-in, not data size."""
        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            return tables[0]
        return pa.concat_tables(nonempty)

    @ray.remote
    def combine_right(*tables: pa.Table) -> pa.Table:
        """Concat only — same rationale: per-shard right keys are already
        unique per shard, and the reduce's is_in membership test tolerates
        duplicates in its value set, so re-uniquing here paid a full string
        hash pass for nothing."""
        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            return tables[0]
        return pa.concat_tables(nonempty)

    done = set(done_paths or ()) if partials_dir is not None else set()
    if left_refs is not None:
        # per-chunk-file split tasks launched DURING the row pass by
        # FusedLeftStreamer; add a read-the-shard fallback for any shard
        # with no partial on disk (e.g. key column absent from its batches)
        lrefs = list(left_refs)
        for p in ordered:
            if not _partial_files(pids[p]):
                lrefs.append(map_left.remote(p, pids[p]))
    else:
        lrefs = []
        for p in ordered:
            files = _partial_files(pids[p]) if p in done else []
            lrefs.append(
                load_left_partial.remote(files) if files else map_left.remote(p, pids[p])
            )
    if right_refs is not None:
        rrefs = right_refs  # launched early by the caller (launch_right_maps)
    elif right is None:
        rrefs = []
    else:
        rrefs = launch_right_maps(right, right_col, num_buckets)
    if num_buckets == 1:
        lrefs = [[r] for r in lrefs]
        rrefs = [[r] for r in rrefs]
    dup_refs, orphan_refs = [], []
    for b in range(num_buckets):
        lcombined = _tree_combine([lrefs[m][b] for m in range(len(lrefs))], combine_left)
        rcombined = _tree_combine([rrefs[m][b] for m in range(len(rrefs))], combine_right)
        d, o = reduce_bucket.remote(len(lcombined), *lcombined, *rcombined)
        dup_refs.append(d)
        orphan_refs.append(o)

    def finish() -> tuple[pa.Table, pa.Table]:
        dup_tables = [t for t in ray.get(dup_refs) if t.num_rows]
        orphan_tables = [t for t in ray.get(orphan_refs) if t.num_rows]
        empty = _typed_key_empty(
            ordered, [key_col], [("cnt", pa.int64()), ("pid", pa.int32())]
        )
        dups = pa.concat_tables(dup_tables) if dup_tables else empty
        orphans = pa.concat_tables(orphan_tables) if orphan_tables else empty
        return dups, orphans

    return finish


def anti_join_shuffled(
    left_paths: list[str],
    left_col: str,
    right: "Any",  # list[str] of parquet paths OR a ray.data.Dataset
    right_col: str,
    num_buckets: int | None = None,
    path_pids: dict[str, int] | None = None,
    partials_dir: str | None = None,
) -> pa.Table:
    """Hash-partitioned anti-join (referential check): left keys with no
    match in right → (key, cnt) rows. Same raw-Ray map/reduce shape as
    :func:`count_keys_shuffled` — both sides reduced to per-bucket key
    tables, verified per bucket with one vectorized ``is_in``. Only key
    columns move; co-partitioning comes from the shared hash. With
    ``partials_dir``/``path_pids``, left shards whose row-pass key pre-aggs
    exist are served from those files (one-scan invariant)."""
    import ray

    if not left_paths:
        return _typed_key_empty(left_paths, [left_col], [("cnt", pa.int64())])
    num_buckets = num_buckets or _default_buckets(len(left_paths))

    @ray.remote(num_returns=num_buckets)
    def map_left(path: str):
        tbl = pq.read_table(path, columns=[left_col])
        counts = _precount_table(tbl, [left_col])
        out = _split_buckets(counts, [left_col], num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote(num_returns=num_buckets)
    def load_left_partial(files: list[str]):
        merged = pa.concat_tables(
            [pq.read_table(f, columns=[left_col, "cnt"]) for f in files]
        )
        counts = (
            merged.group_by([left_col]).aggregate([("cnt", "sum")]).rename_columns([left_col, "cnt"])
        )
        out = _split_buckets(counts, [left_col], num_buckets)
        return out if num_buckets > 1 else out[0]

    # right-side maps shared with the early-overlap launcher — one copy of
    # the unique+cnt+sentinel-guard logic to keep in sync (review r5)
    map_right_path, map_right_table = _right_map_fns(right_col, num_buckets)

    @ray.remote
    def reduce_bucket(n_left: int, *tables: pa.Table) -> pa.Table:
        left = [t for t in tables[:n_left] if t.num_rows]
        rights = [t for t in tables[n_left:] if t.num_rows]
        if not left:
            return pa.table({left_col: pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
        lmerged = pa.concat_tables(left)
        lagg = lmerged.group_by([left_col]).aggregate([("cnt", "sum")]).rename_columns([left_col, "cnt"])
        if rights:
            # combine layers already uniqued per input; is_in tolerates any
            # residual duplicates in the value set — no final unique pass
            # (pc.is_in over a polars semi-join for the same reason as the
            # fused reduce: polars' from_arrow copy thrashes concurrently)
            rkeys = pa.concat_tables(rights).column(right_col).combine_chunks()
            mask = pc.invert(pc.is_in(lagg.column(left_col), value_set=rkeys.cast(lagg.column(left_col).type)))
            lagg = lagg.filter(pc.fill_null(mask, True))
        return lagg

    @ray.remote
    def combine_left(*tables: pa.Table) -> pa.Table:
        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            return tables[0]
        merged = pa.concat_tables(nonempty)
        return merged.group_by([left_col]).aggregate([("cnt", "sum")]).rename_columns([left_col, "cnt"])

    @ray.remote
    def combine_right(*tables: pa.Table) -> pa.Table:
        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            return tables[0]
        merged = pa.concat_tables(nonempty)
        keys = pa.table({right_col: merged.column(right_col).combine_chunks().unique()})
        return keys.append_column("cnt", pa.array([1] * keys.num_rows, pa.int64()))

    lrefs = []
    for p in sorted(left_paths):
        files = (
            partial_key_files(partials_dir, left_col, path_pids[p])
            if partials_dir is not None and path_pids is not None and p in path_pids
            else []
        )
        lrefs.append(load_left_partial.remote(files) if files else map_left.remote(p))
    if isinstance(right, list):
        rrefs = [map_right_path.remote(p) for p in sorted(right)]
    else:
        rrefs = [map_right_table.remote(ref) for ref in arrow_block_refs(right)]
    if num_buckets == 1:
        lrefs = [[r] for r in lrefs]
        rrefs = [[r] for r in rrefs]
    reduced = []
    for b in range(num_buckets):
        lcombined = _tree_combine([lrefs[m][b] for m in range(len(lrefs))], combine_left)
        rcombined = _tree_combine([rrefs[m][b] for m in range(len(rrefs))], combine_right)
        reduced.append(reduce_bucket.remote(len(lcombined), *lcombined, *rcombined))
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return _typed_key_empty(left_paths, [left_col], [("cnt", pa.int64())])
    return pa.concat_tables(tables)


def agg_keys_shuffled(
    paths: list,
    key_cols: list[str],
    aggs: list[tuple[str, str]],
    num_buckets: int | None = None,
    transform_fn=None,
    having_fn=None,
    read_cols: list[str] | None = None,
    output: str = "table",
    bucket_cols: list[str] | None = None,
):
    """Generic keyed aggregate over parquet shards — the engine's grouped
    aggregate-constraint primitive (sum/min/max/count per key, then an
    optional HAVING predicate applied INSIDE the reduce tasks).

    Same raw-Ray map/reduce shape as :func:`count_keys_shuffled`: every map
    task pre-aggregates its shard (the combiner — only O(distinct keys per
    shard) partial rows enter the bucket shuffle), buckets tree-combine at
    fan-in 64, and each reduce finalizes + filters, so the driver receives
    only violating keys. All listed aggregates are mergeable (sum of sums,
    min of mins, max of maxes, count as summed counts); non-associative
    float means belong to the stats/t-digest path — for exactness cast
    value columns to integers in ``transform_fn`` (CLAUDE.md float rule).

    aggs: (column, fn) with fn ∈ {sum, min, max, count}; output column
    names are ``{fn}_{column}`` (``cnt`` for count, column ignored).
    transform_fn(tbl) -> tbl runs per shard BEFORE the pre-agg (casts,
    derived columns). having_fn(tbl) -> tbl runs per reduce bucket
    (including empty buckets, so it may reshape the schema uniformly).

    ``paths`` may alternatively be Arrow-block ObjectRefs
    (``util.arrow_block_refs`` of an upstream Dataset) — the map tasks then
    pre-aggregate the plasma blocks zero-copy instead of reading parquet;
    this is how the Dataset-signature entry points (functions/dedup
    exact_dedup*, stages/unique.duplicate_keys) reuse the raw shuffle
    instead of Ray Data's sort-based groupby (VERDICT r4 #3; string-key
    groupby measured 60× slower, CLAUDE.md).

    ``output="refs"`` returns the per-reduce-bucket ObjectRefs WITHOUT
    driver materialization (feed ``ray.data.from_arrow_refs``) — required
    when the aggregate itself is corpus-sized (e.g. survivor ids).

    ``bucket_cols`` (default: ``key_cols``) picks which PREFIX of the key
    actually routes rows to buckets: with ``key_cols=[primary, sub]`` and
    ``bucket_cols=[primary]`` every (primary, sub) partial of one primary
    key lands in the SAME reduce task, so ``having_fn`` can compute
    per-primary-key aggregates over its sub-keys (entropy of a user's
    event-type distribution, distinct-label conflicts per content hash,
    within-user pair expansion) without a second shuffle. Must be a subset
    of ``key_cols``; the reduce still merges on the full key.
    """
    import ray

    bucket_cols = bucket_cols or key_cols
    if not set(bucket_cols) <= set(key_cols):
        raise ValueError(f"bucket_cols {bucket_cols} must be a subset of key_cols {key_cols}")
    num_buckets = num_buckets or _default_buckets(len(paths))
    out_names = [("cnt" if f == "count" else f"{f}_{c}") for c, f in aggs]
    value_cols = sorted({c for c, f in aggs if f != "count"})
    merge_specs = [
        (name, "sum" if f in ("sum", "count") else f) for name, (c, f) in zip(out_names, aggs)
    ]

    def _preagg(tbl: pa.Table) -> pa.Table:
        if transform_fn is not None:
            tbl = transform_fn(tbl)
        sub = tbl.select(key_cols + [c for c in value_cols if c not in key_cols])
        specs = [([], "count_all") if f == "count" else (c, f) for c, f in aggs]
        out = group_agg_fixed_first(sub, key_cols, specs)
        return out.rename_columns(key_cols + out_names)

    def _merge(tables: tuple) -> pa.Table:
        if not tables:  # zero map inputs (empty paths/refs list)
            return pa.table({})
        merged = pa.concat_tables([t for t in tables if t.num_rows] or list(tables))
        if merged.num_rows == 0:
            return merged
        out = group_agg_fixed_first(merged, key_cols, [(n, f) for n, f in merge_specs])
        return out.rename_columns(key_cols + out_names)

    cols_to_read = read_cols or sorted(set(key_cols) | set(value_cols))

    @ray.remote(num_returns=num_buckets)
    def map_shard(shard):
        # str = parquet shard path; otherwise a plasma Arrow block
        # (ObjectRef arg auto-dereferenced), selected zero-copy
        tbl = pq.read_table(shard, columns=cols_to_read) if isinstance(shard, str) else shard.select(cols_to_read)
        parts = _preagg(tbl)
        out = _split_buckets(parts, bucket_cols, num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote
    def combine_bucket(*tables: pa.Table) -> pa.Table:
        return _merge(tables)

    @ray.remote
    def reduce_bucket(*tables: pa.Table) -> pa.Table:
        out = _merge(tables)
        # empty buckets still run having_fn (it may reshape the schema);
        # only the zero-INPUT schemaless table skips it
        if having_fn is not None and out.num_columns:
            out = having_fn(out)
        return out

    # coerce PathLike → str so pathlib callers stay on the parquet branch
    # (a PosixPath misrouted to the block branch fails only inside the task)
    paths = [os.fspath(p) if isinstance(p, os.PathLike) else p for p in paths]
    inputs = sorted(paths) if all(isinstance(p, str) for p in paths) else list(paths)
    refs = [map_shard.remote(p) for p in inputs]
    if num_buckets == 1:
        refs = [[r] for r in refs]
    reduced = [
        reduce_bucket.remote(*_tree_combine([refs[m][b] for m in range(len(refs))], combine_bucket))
        for b in range(num_buckets)
    ]
    if output == "refs":
        return reduced
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables)


def distinct_count_by_group(
    paths: list[str],
    group_col: str,
    distinct_col: str,
    num_buckets: int | None = None,
) -> pa.Table:
    """Distributed exact COUNT(DISTINCT distinct_col) GROUP BY group_col.

    Map: each shard reduces to its DISTINCT (group, value) pairs (the
    combiner — duplicates within a shard never leave it) and bucket-splits
    on the combined PAIR hash, so every global duplicate of a pair lands
    in the same bucket. Reduce: re-distinct the pairs, then count per
    group — a group's values span buckets disjointly, so the driver just
    sums the tiny (group, partial_count) rows. Never materializes the
    global distinct-pair set anywhere."""
    import ray

    if not paths:
        return _typed_key_empty(paths, [group_col], [("cnt", pa.int64())])
    num_buckets = num_buckets or _default_buckets(len(paths))
    cols = [group_col, distinct_col]

    @ray.remote(num_returns=num_buckets)
    def map_shard(path: str):
        tbl = pq.read_table(path, columns=cols)
        # SQL semantics: COUNT(DISTINCT x) skips null x but GROUP BY still
        # returns every group — KEEP null-value pairs through the shuffle
        # (a group whose values are all null is one (g, null) pair) and
        # count only valid values in the reduce, so such groups emit
        # (g, 0) exactly like the SQL instead of vanishing
        pairs = group_agg_fixed_first(tbl, cols, []).select(cols)
        out = _split_buckets(pairs, cols, num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote
    def combine_bucket(*tables: pa.Table) -> pa.Table:
        merged = pa.concat_tables(tables)
        if merged.num_rows == 0:
            return merged
        return group_agg_fixed_first(merged, cols, []).select(cols)

    @ray.remote
    def reduce_bucket(*tables: pa.Table) -> pa.Table:
        merged = pa.concat_tables(tables)
        if merged.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
        pairs = group_agg_fixed_first(merged, cols, [])
        # (distinct_col, "count") counts only valid values: all-null groups
        # survive with cnt 0
        counts = pairs.group_by([group_col]).aggregate([(distinct_col, "count")])
        return counts.rename_columns([group_col, "cnt"])

    refs = [map_shard.remote(p) for p in sorted(paths)]
    if num_buckets == 1:
        refs = [[r] for r in refs]
    reduced = [
        reduce_bucket.remote(*_tree_combine([refs[m][b] for m in range(len(refs))], combine_bucket))
        for b in range(num_buckets)
    ]
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return _typed_key_empty(paths, [group_col], [("cnt", pa.int64())])
    merged = pa.concat_tables(tables)
    out = merged.group_by([group_col]).aggregate([("cnt", "sum")])
    return out.rename_columns([group_col, "cnt"])


def mode_by_group(
    paths: list[str],
    group_col: str,
    value_col: str,
    num_buckets: int | None = None,
) -> pa.Table:
    """Distributed exact MODE: the most frequent ``value_col`` per
    ``group_col`` (ties → lexicographically smallest value, the
    deterministic convention the oracle's ``row_number() OVER (ORDER BY
    cnt DESC, value)`` pins — DuckDB's own mode() leaves ties undefined).

    Map: each shard pre-counts its (group, value) pairs (combiner — at most
    groups×domain partial rows leave a shard) and bucket-splits on the
    GROUP hash so a group's whole value domain lands in one reduce.
    Reduce: sum the partial counts per pair, then one vectorized sort
    (group asc, cnt desc, value asc) + first-row-per-group slice. Driver
    concatenates disjoint (group, value, cnt) winners — no merge logic.
    Scale note: per-reduce work is O(groups_in_bucket × domain); a value
    domain too large for one task belongs to the top-k path
    (stats.grouped_topk_table), not mode."""
    import ray

    if not paths:
        return _typed_key_empty(paths, [group_col, value_col], [("cnt", pa.int64())])
    num_buckets = num_buckets or _default_buckets(len(paths))
    cols = [group_col, value_col]

    @ray.remote(num_returns=num_buckets)
    def map_shard(path: str):
        tbl = pq.read_table(path, columns=cols)
        tbl = tbl.filter(pc.is_valid(tbl.column(value_col)))
        pairs = group_agg_fixed_first(tbl, cols, [([], "count_all")]).rename_columns([*cols, "cnt"])
        out = _split_buckets(pairs, [group_col], num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote
    def combine_bucket(*tables: pa.Table) -> pa.Table:
        merged = pa.concat_tables(tables)
        if merged.num_rows == 0:
            return merged
        out = group_agg_fixed_first(merged, cols, [("cnt", "sum")])
        return out.rename_columns([*cols, "cnt"])

    @ray.remote
    def reduce_bucket(*tables: pa.Table) -> pa.Table:
        merged = pa.concat_tables(tables)
        if merged.num_rows == 0:
            return merged
        summed = group_agg_fixed_first(merged, cols, [("cnt", "sum")])
        summed = summed.rename_columns([*cols, "cnt"])
        s = summed.sort_by(
            [(group_col, "ascending"), ("cnt", "descending"), (value_col, "ascending")]
        )
        g = s.column(group_col).combine_chunks()
        import numpy as np

        # group-change detection must treat null == null as the SAME group
        # (pc.equal(null, null) is null → fill_null(False) would mark every
        # null-group row as a new group and emit one row per distinct value
        # for the null group, where SQL's PARTITION BY returns one winner)
        a, b = g.slice(1), g.slice(0, len(g) - 1)
        same = pc.or_(
            pc.fill_null(pc.equal(a, b), False), pc.and_(pc.is_null(a), pc.is_null(b))
        )
        first = np.flatnonzero(np.r_[True, ~np.asarray(same)])
        return s.take(pa.array(first, pa.int64()))

    bucket_parts: list[list] = [[] for _ in range(num_buckets)]
    for path in paths:
        refs = map_shard.remote(path)
        if num_buckets == 1:
            refs = [refs]
        for b, r in enumerate(refs):
            bucket_parts[b].append(r)
    reduced = [
        reduce_bucket.remote(*_tree_combine(parts, combine_bucket))
        for parts in bucket_parts
        if parts
    ]
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return _typed_key_empty(paths, [group_col, value_col], [("cnt", pa.int64())])
    return pa.concat_tables(tables)
