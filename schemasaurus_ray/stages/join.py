"""Distributed hash equi-join — the shuffle-join counterpart to the
broadcast lookup in pipelines/queries.enrich_events_customer.

Same raw-Ray map/reduce shape as stages/shuffle.py (and for the same
measured reason — see that module's header): both sides are split by
``splitmix64(hash(key)) % B`` into the same B buckets, so matching keys
co-locate; each reduce task runs ONE pyarrow ``Table.join`` (C++ hash
join) over its bucket. Only the projected columns move. Use this when
BOTH sides are large; for a small dimension side, broadcast it with
``ray.put`` + searchsorted lookup instead (no shuffle at all).

Reference counterpart: none (the reference validates one document at a
time); this is the engine-native join the north_rule's referential checks
generalize to when the caller needs matched rows, not just orphan keys.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

from .shuffle import _default_buckets, _split_buckets, _tree_combine

from ..util import arrow_block_refs


def _map_refs(src: Any, cols: list[str], key_col: str, num_buckets: int) -> list:
    import ray

    @ray.remote(num_returns=num_buckets)
    def map_path(path: str):
        tbl = pq.read_table(path, columns=cols)
        out = _split_buckets(tbl, [key_col], num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote(num_returns=num_buckets)
    def map_table(tbl: pa.Table):
        if tbl.num_rows == 0 and not set(cols) <= set(tbl.column_names):
            # schema-less empty block (e.g. a fully-filtered Dataset)
            e = pa.table({})
            return [e] * num_buckets if num_buckets > 1 else e
        tbl = tbl.select(cols)
        out = _split_buckets(tbl, [key_col], num_buckets)
        return out if num_buckets > 1 else out[0]

    if isinstance(src, list):
        refs = [map_path.remote(p) for p in sorted(src)]
    else:
        refs = [map_table.remote(ref) for ref in arrow_block_refs(src)]
    if num_buckets == 1:
        refs = [[r] for r in refs]
    return refs


def equi_join_shuffled(
    left: Any,
    left_key: str,
    left_cols: list[str],
    right: Any,
    right_key: str,
    right_cols: list[str],
    join_type: str = "inner",
    num_buckets: int | None = None,
    reduce_fn=None,
) -> pa.Table:
    """Hash-partitioned equi-join of two parquet-path lists / Datasets.
    ``left_cols`` / ``right_cols`` include the keys. Per-bucket result =
    ``left_bucket.join(right_bucket)``; pass ``reduce_fn(joined) -> Table``
    to aggregate INSIDE each reduce task (the combiner position — e.g. a
    group_by — so only partials return to the driver)."""
    import ray

    lsrc = left if isinstance(left, list) else None
    num_buckets = num_buckets or _default_buckets(len(lsrc) if lsrc is not None else 8)

    @ray.remote
    def combine(*tables: pa.Table) -> pa.Table:
        nonempty = [t for t in tables if t.num_rows]
        return pa.concat_tables(nonempty) if nonempty else tables[0]

    @ray.remote
    def reduce_bucket(n_left: int, *tables: pa.Table) -> pa.Table:
        def side(parts: tuple) -> pa.Table | None:
            nonempty = [t for t in parts if t.num_rows]
            if nonempty:
                return pa.concat_tables(nonempty)
            schemas = [t for t in parts if t.num_columns]  # typed empty
            return schemas[0].slice(0, 0) if schemas else None

        ltbl = side(tables[:n_left])
        rtbl = side(tables[n_left:])
        if ltbl is None:
            return pa.table({})
        if rtbl is None:
            # right side had no schema at all (fully empty source): inner /
            # semi joins produce nothing; left-outer degenerates to the left
            # rows without the (unknowable) right columns
            if join_type not in ("left outer",):
                return pa.table({})
            joined = ltbl
        else:
            joined = ltbl.join(
                rtbl.combine_chunks(),
                keys=[left_key],
                right_keys=[right_key],
                join_type=join_type,
            )
        return reduce_fn(joined) if reduce_fn is not None else joined

    lrefs = _map_refs(left, left_cols, left_key, num_buckets)
    rrefs = _map_refs(right, right_cols, right_key, num_buckets)
    reduced = []
    for b in range(num_buckets):
        lc = _tree_combine([lrefs[m][b] for m in range(len(lrefs))], combine)
        rc = _tree_combine([rrefs[m][b] for m in range(len(rrefs))], combine)
        reduced.append(reduce_bucket.remote(len(lc), *lc, *rc))
    tables = [t for t in ray.get(reduced) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables)
