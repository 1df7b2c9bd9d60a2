"""Driver-facing query implementations over the TPC-H-ish test tables
(FIXTURES.md F4) — one per operator family in SURVEY.md §2. Each takes
``sf_dir`` and returns a pyarrow Table / Dataset whose schema matches the
DuckDB oracle in __ray_entry__.oracle_sql() column-for-column.

Ray is initialised by the caller — nothing here calls ray.init().
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.dedup import (
    minhash_candidates,
    simhash_signatures,
)
from ..functions.similarity import (
    brute_force_topk,
    ivf_build_index,
    ivf_topk_indexed,
)
from ..functions.text import TOKEN_RE, LangIdStage, fingerprint, quality_scores, token_count
from ..specs import LINEITEM_STRICT_SPEC
from ..stages.referential import orphan_rows
from ..stages.rulepack import RowRuleStage
from ..stages.stats import batch_stats_partial, merge_stats_partials
from ..stages.unique import duplicate_keys

from ..util import arrow_block_refs

DOCUMENTS_SPEC: dict = {
    "columns": {
        "doc_id": {"type": "integer", "required": True, "minimum": 0},
        "text": {"type": "string", "required": True, "minLength": 1},
        "lang": {"type": "string", "enum": ["en", "de", "fr", "es"]},
        "n_chars": {"type": "integer", "maximum": 400},
    },
    "table": {"key": "doc_id"},
}


def _strip_meta(batch: pa.Table) -> pa.Table:
    """Zero-copy drop of parquet/pandas schema metadata: a pa.Schema with a
    metadata dict is unhashable, so every Ray Data schema-dedup on such
    blocks logs 'Failed to hash the schemas' and skips its fast path
    (VERDICT r2 #8). Fuses with the read stage — no extra pass."""
    return batch.replace_schema_metadata(None)


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    """Column-pruned parquet read with a METADATA-STRIPPED schema passed to
    the reader, so every block leaves the scan with a hashable pa.Schema —
    kills the 'Failed to hash the schemas' warning at the source instead of
    in a fused map stage (_strip_meta kept for non-parquet entry points)."""
    import pyarrow.parquet as pq_
    import ray.data as rd

    path = os.path.join(sf_dir, f"{table}.parquet")
    schema = pq_.read_schema(path).remove_metadata()
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=schema)


def _drop_null_ts(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.is_valid(batch.column("ts")))


def _events_with_ts(sf_dir: str, columns: list[str]):
    """events read with NULL-ts rows dropped at the scan: an event without
    a time carries no temporal information, so EVERY temporal operator
    (ordering, windows, gaps, funnels, watermarks) defines its semantics
    over timed events only — the oracles mirror it as WHERE ts IS NOT
    NULL. This is a correctness fence, not a convenience: an unfiltered
    NaT becomes INT64_MIN in the numpy kernels, which sorts FIRST where
    SQL sorts NULL LAST (and degrades lexsorts to object dtype) — caught
    by scripts/stress_parity.py, invisible in the null-free sf fixtures."""
    ds = _read(sf_dir, "events", columns)
    return ds.map_batches(_drop_null_ts, batch_format="pyarrow", zero_copy_batch=True)


def _collect(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches)


# per-worker cache of compiled rule stages, keyed by spec hash — stateless
# tasks (all free CPUs, no actor spawn) with one plan compile per worker
_RULE_STAGE_CACHE: dict[str, RowRuleStage] = {}


def _violations(ds, spec: dict) -> pa.Table:
    import functools
    import json

    key = json.dumps(spec, sort_keys=True, default=str)

    def run_rules(batch: pa.Table, *, key: str, spec: dict) -> pa.Table:
        stage = _RULE_STAGE_CACHE.get(key)
        if stage is None:
            stage = RowRuleStage(spec)
            _RULE_STAGE_CACHE[key] = stage
        return stage(batch)

    out = ds.map_batches(
        functools.partial(run_rules, key=key, spec=spec),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tbl = _collect(out)
    viol = tbl.filter(pc.equal(tbl.column("kind"), "violation"))
    return viol.select(["row_ref", "column", "code"]).rename_columns(["row_ref", "col", "code"])


# ---- validator rule-pack ----------------------------------------------------
def validate_lineitem(sf_dir: str) -> pa.Table:
    cols = list(LINEITEM_STRICT_SPEC["columns"].keys())
    return _violations(_read(sf_dir, "lineitem", cols), LINEITEM_STRICT_SPEC)


def validate_documents(sf_dir: str) -> pa.Table:
    cols = list(DOCUMENTS_SPEC["columns"].keys())
    return _violations(_read(sf_dir, "documents", cols), DOCUMENTS_SPEC)


def validate_documents_jsonl(sf_dir: str) -> pa.Table:
    """SOURCE-FORMAT PARITY: the same documents rule pack through the JSONL
    source (sources/io.read_jsonl_tasks) — the reference's native input is
    one JSON document per record, so the engine must produce IDENTICAL
    violations whether the corpus arrives as parquet or raw JSONL. The
    parquet table is converted once per sf_dir to sharded JSONL under /tmp
    (fixture prep, not an engine path); the oracle is the same SQL as
    validate_documents."""
    import hashlib
    import json as _json
    import tempfile

    import pyarrow.parquet as pq_

    from ..sources.io import read_jsonl_tasks

    src = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:10]
    out_dir = os.path.join(tempfile.gettempdir(), f"schemasaurus_docs_jsonl_{tag}")
    cols = list(DOCUMENTS_SPEC["columns"].keys())
    if not os.path.isdir(out_dir):
        tmp_dir = f"{out_dir}.tmp.{os.getpid()}"
        os.makedirs(tmp_dir, exist_ok=True)
        tbl = pq_.read_table(src, columns=cols)
        shards = 4
        per = -(-tbl.num_rows // shards)
        for s in range(shards):
            part = tbl.slice(s * per, per)
            rows = [dict(zip(cols, vals)) for vals in zip(*(part.column(c).to_pylist() for c in cols))]
            with open(os.path.join(tmp_dir, f"docs-{s:04d}.jsonl"), "w") as f:
                for r in rows:
                    f.write(_json.dumps(r) + "\n")
        try:
            os.rename(tmp_dir, out_dir)
        except OSError:  # concurrent creator won
            import shutil

            shutil.rmtree(tmp_dir, ignore_errors=True)
    import glob as glob_

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    ds = read_jsonl_tasks(
        sorted(glob_.glob(os.path.join(out_dir, "*.jsonl"))), schema=schema, columns=cols
    )
    return _violations(ds, DOCUMENTS_SPEC)


def validate_documents_csv(sf_dir: str) -> pa.Table:
    """SOURCE-FORMAT PARITY #2: the same documents rule pack through the CSV
    source (sources/io.read_csv_tasks) — identical violation multiset as the
    parquet and JSONL paths. The parquet table is converted once per sf_dir
    to sharded CSV under /tmp (fixture prep, not an engine path; arrow
    csv.write_csv keeps null-vs-empty-string fidelity via quoting). The
    oracle is the same SQL as validate_documents."""
    import hashlib
    import tempfile

    import pyarrow.csv as pcsv_
    import pyarrow.parquet as pq_

    from ..sources.io import read_csv_tasks

    src = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:10]
    out_dir = os.path.join(tempfile.gettempdir(), f"schemasaurus_docs_csv_{tag}")
    cols = list(DOCUMENTS_SPEC["columns"].keys())
    if not os.path.isdir(out_dir):
        tmp_dir = f"{out_dir}.tmp.{os.getpid()}"
        os.makedirs(tmp_dir, exist_ok=True)
        tbl = pq_.read_table(src, columns=cols)
        shards = 4
        per = -(-tbl.num_rows // shards)
        for s in range(shards):
            pcsv_.write_csv(tbl.slice(s * per, per), os.path.join(tmp_dir, f"docs-{s:04d}.csv"))
        try:
            os.rename(tmp_dir, out_dir)
        except OSError:  # concurrent creator won
            import shutil

            shutil.rmtree(tmp_dir, ignore_errors=True)
    import glob as glob_

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    ds = read_csv_tasks(
        sorted(glob_.glob(os.path.join(out_dir, "*.csv"))), schema=schema, columns=cols
    )
    return _violations(ds, DOCUMENTS_SPEC)


# Cross-column CHECK constraints (spec.CheckRule → plan.compile_expr):
# arithmetic + comparison predicates over sibling columns, SQL three-valued
# CHECK semantics (violation only when definitively FALSE). The reference's
# closest surface is `dependencies` (v4validator.js:147-166); this is the
# engine-native generalization the audio flagship uses for transcript-rate.
CHECKS_SPEC: dict = {
    "columns": {
        "l_orderkey": {"type": "integer", "required": True},
        "l_quantity": {"type": "number"},
        "l_extendedprice": {"type": "number"},
        "l_discount": {"type": "number"},
        "l_tax": {"type": "number"},
    },
    "table": {
        "key": "l_orderkey",
        "checks": [
            # combined surcharge cap: discount + tax must stay <= 0.12
            {"name": "discount_tax_cap", "expr": ["<=", ["+", ["col", "l_discount"], ["col", "l_tax"]], 0.12]},
            # price floor: extendedprice >= quantity * 950 (unit price sanity)
            {"name": "price_floor", "expr": [">=", ["col", "l_extendedprice"], ["*", ["col", "l_quantity"], 950]]},
        ],
    },
}


def check_constraints_lineitem(sf_dir: str) -> pa.Table:
    """Cross-column CHECK violations on lineitem. Both predicates are pure
    IEEE-double binary-op chains, so Arrow and DuckDB agree bit-for-bit;
    NULL operands pass (both engines)."""
    cols = [c for c in CHECKS_SPEC["columns"]]
    return _violations(_read(sf_dir, "lineitem", cols), CHECKS_SPEC)


FORMATS_SPEC: dict = {
    "columns": {
        "doc_id": {"type": "integer", "required": True},
        # exercises the [format] kernel (registry regexes, code "format.<name>"):
        # "srcN" is a valid hostname (no violations) but not a URI (no scheme
        # colon → every row violates)
        "source": {"type": "string", "format": "uri"},
    },
    "table": {"key": "doc_id"},
}


def validate_documents_formats(sf_dir: str) -> pa.Table:
    """[format] keyword end-to-end with an oracle: the registry's uri regex
    (messages.py, mirroring v4validator.js fillDefaultFormats) evaluated by
    the RE2 kernel must match DuckDB's regexp_matches of the same literal."""
    cols = list(FORMATS_SPEC["columns"].keys())
    return _violations(_read(sf_dir, "documents", cols), FORMATS_SPEC)


# ---- stats ------------------------------------------------------------------
STATS_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _stats_partial_batch(batch: pa.Table) -> pa.Table:
    import json

    recs = batch_stats_partial(batch, STATS_COLS)
    return pa.table({"payload": pa.array([json.dumps(recs)], pa.string())})


def stats_lineitem(sf_dir: str) -> pa.Table:
    import json

    ds = _read(sf_dir, "lineitem", STATS_COLS)
    partials = []
    for batch in ds.map_batches(_stats_partial_batch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for p in batch.column("payload").to_pylist():
            partials.extend(json.loads(p))
    merged = merge_stats_partials(partials)
    cols = sorted(merged)
    return pa.table(
        {
            "col_name": pa.array(cols, pa.string()),
            "cnt": pa.array([merged[c]["count"] for c in cols], pa.int64()),
            "nulls": pa.array([merged[c]["nulls"] for c in cols], pa.int64()),
            "min_v": pa.array([merged[c]["min"] for c in cols], pa.float64()),
            "max_v": pa.array([merged[c]["max"] for c in cols], pa.float64()),
            "mean_v": pa.array([round(merged[c]["mean"], 2) for c in cols], pa.float64()),
        }
    )


def distinct_orderkeys(sf_dir: str) -> pa.Table:
    """Exact distinct count via two-phase groupby (per-batch unique →
    shuffle over distinct keys only)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey"])

    def uniq(batch: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": batch.column("l_orderkey").combine_chunks().unique()})

    n = ds.map_batches(uniq, batch_format="pyarrow").unique("l_orderkey")
    return pa.table({"n_distinct": pa.array([len(n)], pa.int64())})


# ---- uniqueness / referential ----------------------------------------------
def unique_lineitem_orderkey(sf_dir: str) -> pa.Table:
    from ..stages.shuffle import count_keys_shuffled

    tbl = count_keys_shuffled(
        [os.path.join(sf_dir, "lineitem.parquet")], ["l_orderkey"], min_count=2
    )
    return tbl.select(["l_orderkey", "cnt"]).sort_by("l_orderkey")


def unique_events_composite(sf_dir: str) -> pa.Table:
    """COMPOSITE-key uniqueness through the same raw-Ray shuffle as the
    single-column check: (user_id, event_type) pairs occurring ≥5 times —
    per-shard (key…, cnt) combiner pre-agg, bucket split on the combined
    key hash, threshold applied in the reduce."""
    from ..stages.shuffle import count_keys_shuffled

    tbl = count_keys_shuffled(
        [os.path.join(sf_dir, "events.parquet")], ["user_id", "event_type"], min_count=5
    )
    return tbl.select(["user_id", "event_type", "cnt"]).sort_by(
        [("user_id", "ascending"), ("event_type", "ascending")]
    )


def referential_chain_supplier(sf_dir: str) -> pa.Table:
    """CHAINED (multi-hop) referential integrity in ONE pass over the fact
    side: supplier.s_nationkey must exist in nation (narrowed to
    n_nationkey < 15 so orphans exist), and the nation's n_regionkey must
    exist in region (narrowed to r_regionkey < 2). Both dimension hops are
    composed driver-side into a single VALID-KEY set (nations that exist
    AND whose region exists) plus a first-hop set, broadcast once — the
    supplier scan classifies each row as 'reference' (nation missing) or
    'reference.chain' (nation ok, region missing) without any shuffle."""
    import pyarrow.parquet as pq_
    import ray

    nation = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_regionkey"]
    )
    nation = nation.filter(pc.less(nation.column("n_nationkey"), 15))
    region = pq_.read_table(os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey"])
    region = region.filter(pc.less(region.column("r_regionkey"), 2))
    rkeys = set(region.column("r_regionkey").to_pylist())
    nk = np.asarray(nation.column("n_nationkey").combine_chunks(), dtype=np.int64)
    rk = np.asarray(nation.column("n_regionkey").combine_chunks(), dtype=np.int64)
    hop1 = np.sort(nk)  # nation exists
    hop2 = np.sort(nk[np.isin(rk, np.array(sorted(rkeys), dtype=np.int64))])  # region too
    dims = ray.put((hop1, hop2))

    def classify(batch: pa.Table) -> pa.Table:
        h1, h2 = ray.get(dims)
        keys = np.asarray(batch.column("s_nationkey").combine_chunks(), dtype=np.int64)
        ids = batch.column("s_suppkey").combine_chunks().cast(pa.string())

        def member(sorted_arr: np.ndarray) -> np.ndarray:
            if not len(sorted_arr):
                return np.zeros(len(keys), bool)
            pos = np.searchsorted(sorted_arr, keys).clip(max=len(sorted_arr) - 1)
            return sorted_arr[pos] == keys

        in1, in2 = member(h1), member(h2)
        code = np.where(~in1, "reference", np.where(~in2, "reference.chain", ""))
        bad = code != ""
        return pa.table(
            {
                "row_ref": ids.filter(pa.array(bad)),
                "col": pa.array(["s_nationkey"] * int(bad.sum()), pa.string()),
                "code": pa.array(code[bad].tolist(), pa.string()),
            }
        )

    ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    return _collect(ds.map_batches(classify, batch_format="pyarrow")).sort_by("row_ref")


def fd_violations_events(sf_dir: str) -> pa.Table:
    """FUNCTIONAL-DEPENDENCY audit (the dbt `unique` generalization a
    profiler suggests before declaring a key): LHS keys whose RHS is not
    single-valued — here user_id → event_type, returning every user seen
    with >1 distinct event type and the distinct count. Same distributed
    exact distinct-pair machinery as distinct_users_by_type
    (stages/shuffle.distinct_count_by_group: per-shard distinct pairs,
    pair-hash buckets, per-group partial counts summed on the driver),
    with the HAVING > 1 applied to the tiny (group, cnt) result. A held
    FD returns zero rows — the check output IS the violation list."""
    from ..stages.shuffle import distinct_count_by_group

    tbl = distinct_count_by_group(
        [os.path.join(sf_dir, "events.parquet")], "user_id", "event_type"
    )
    out = tbl.filter(pc.greater(tbl.column("cnt"), 1))
    return out.rename_columns(["user_id", "n_types"]).sort_by("user_id")


def coverage_customer_events(sf_dir: str) -> pa.Table:
    """COVERAGE / completeness check — the REVERSE of the referential
    orphan audit: parent entities with zero children (customers never
    seen in the event stream — the standard "does every entity have
    telemetry?" validation). Runs as the same co-partitioned anti-join as
    the referential family with the roles swapped (stages/referential.
    orphan_rows, method='shuffle': the event keys are the big side so
    nothing broadcasts), emitting (row_ref, col, code='coverage')
    violation rows; zero rows ⇔ the check holds."""
    from ..stages.referential import orphan_rows

    cust = _read(sf_dir, "customer", ["c_custkey"])
    events = _read(sf_dir, "events", ["user_id"])
    out = _collect(orphan_rows(cust, "c_custkey", events, "user_id", method="shuffle"))
    if out.num_rows == 0:
        return pa.table(
            {
                "row_ref": pa.array([], pa.string()),
                "col": pa.array([], pa.string()),
                "code": pa.array([], pa.string()),
            }
        )
    out = out.rename_columns(["row_ref", "col", "code"])
    code = pa.array(["coverage"] * out.num_rows, pa.string())
    return out.set_column(2, "code", code).sort_by("row_ref")


def distinct_users_by_type(sf_dir: str) -> pa.Table:
    """Distributed exact COUNT(DISTINCT user_id) GROUP BY event_type
    (stages/shuffle.distinct_count_by_group): per-shard distinct pairs
    (combiner) bucket-split on the PAIR hash so global duplicates
    co-locate; per-bucket re-distinct + per-group count; the driver sums
    tiny partials — the global distinct-pair set never materializes."""
    from ..stages.shuffle import distinct_count_by_group

    tbl = distinct_count_by_group(
        [os.path.join(sf_dir, "events.parquet")], "event_type", "user_id"
    )
    return tbl.rename_columns(["event_type", "n_users"]).sort_by("event_type")


def distinct_users_by_type_approx(sf_dir: str) -> pa.Table:
    """APPROXIMATE per-group distinct via keyed HLL partials — the scale
    path when groups × distinct keys make the exact pair shuffle
    (distinct_users_by_type) too wide: each batch emits one (group,
    registers) row per group present (2^10 registers = 1 KB each);
    merging is an elementwise register MAX, so the estimate is exactly
    ORDER-INDEPENDENT — deterministic regardless of block layout,
    parallelism or resume. Nothing keyed ever shuffles; the driver folds
    B × groups KB-sized rows. Rows-only surface (approximate by design);
    the pytest golden pins relative error < 5% vs the exact shuffle."""
    from ..state.hll import HyperLogLog
    from ..util import hash_column

    P = 10
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def hll_partials(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").combine_chunks()
        h = hash_column(batch.column("user_id").combine_chunks())
        enc = types.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        groups, regs = [], []
        for c in range(len(enc.dictionary)):
            hll = HyperLogLog(p=P)
            hll.add_hashes(h[codes == c])
            groups.append(enc.dictionary[c].as_py())
            regs.append(hll.registers.tobytes())
        return pa.table(
            {
                "event_type": pa.array(groups, pa.string()),
                "regs": pa.array(regs, pa.binary()),
            }
        )

    parts = _collect(ds.map_batches(hll_partials, batch_format="pyarrow"))
    merged: dict[str, np.ndarray] = {}
    for row in parts.to_pylist():
        r = np.frombuffer(row["regs"], dtype=np.uint8)
        g = row["event_type"]
        merged[g] = np.maximum(merged[g], r) if g in merged else r.copy()
    groups = sorted(merged)
    ests = [
        int(round(HyperLogLog(p=P, registers=merged[g]).estimate())) for g in groups
    ]
    return pa.table(
        {
            "event_type": pa.array(groups, pa.string()),
            "n_users_est": pa.array(ests, pa.int64()),
        }
    )


def referential_events_customer(sf_dir: str) -> pa.Table:
    """Orphan events: user_id not among customers with c_custkey > 10 —
    the ref side is intentionally narrowed so the anti-join is non-empty."""
    events = _read(sf_dir, "events", ["user_id"])
    customers = _read(sf_dir, "customer", ["c_custkey"]).filter(expr="c_custkey > 10")
    orphans = orphan_rows(events, "user_id", customers, "c_custkey", method="broadcast")
    return _collect(orphans).rename_columns(["row_ref", "col", "code"])


def referential_bloom_orders(sf_dir: str) -> pa.Table:
    """Referential check via the Bloom scale path (exact mode): the ref
    side (customers with c_custkey > 1000) is summarized into a ~10-bit/key
    bitmap broadcast once; most orders fail the filter and stream out as
    definite orphans with NO shuffle — only filter-passing keys enter the
    exact confirm. Same output contract as referential_events_customer."""
    from ..stages.referential import orphan_rows

    orders = _read(sf_dir, "orders", ["o_custkey"])
    customers = _read(sf_dir, "customer", ["c_custkey"]).filter(expr="c_custkey > 1000")
    orphans = orphan_rows(orders, "o_custkey", customers, "c_custkey", method="bloom")
    return _collect(orphans).rename_columns(["row_ref", "col", "code"])


def agg_constraint_orders(sf_dir: str) -> pa.Table:
    """Grouped aggregate constraint (dbt-style HAVING check): orders whose
    total lineitem quantity exceeds 120 — per-shard combiner pre-agg, key
    shuffle via stages/shuffle.agg_keys_shuffled, HAVING applied inside the
    reduce so only violating keys reach the driver. Quantities cast to
    int64 in the map (whole-valued doubles) so distributed sums stay
    associative/exact (CLAUDE.md float rule)."""
    from ..stages.shuffle import agg_keys_shuffled

    def cast_qty(tbl: pa.Table) -> pa.Table:
        q = tbl.column("l_quantity").cast(pa.int64())
        return tbl.drop_columns(["l_quantity"]).append_column("l_quantity", q)

    out = agg_keys_shuffled(
        [os.path.join(sf_dir, "lineitem.parquet")],
        ["l_orderkey"],
        [("l_quantity", "sum"), ("l_quantity", "count")],
        transform_fn=cast_qty,
        having_fn=lambda t: t.filter(pc.greater(t.column("sum_l_quantity"), 120)),
    )
    out = out.rename_columns(["l_orderkey", "sum_qty", "n_lines"])
    return out.sort_by("l_orderkey")


def revenue_by_segment(sf_dir: str) -> pa.Table:
    """Join + rollup: orders revenue per customer market segment — the
    dimension broadcast once (ray.put sorted keys + segment codes), one
    map_batches over orders doing searchsorted lookup and a WEIGHTED
    bincount partial (integer cents — associative), tiny final groupby
    over segments × batches. No all-to-all shuffle anywhere."""
    import pyarrow.parquet as pq_
    import ray
    from ray.data.aggregate import Sum

    cust = pq_.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    keys = np.asarray(cust.column("c_custkey").combine_chunks(), dtype=np.int64)
    seg_dict = cust.column("c_mktsegment").combine_chunks().dictionary_encode()
    codes = np.asarray(seg_dict.indices, dtype=np.int64)
    segments = seg_dict.dictionary.to_pylist()
    order = np.argsort(keys)
    dim_ref = ray.put((keys[order], codes[order]))

    def lookup_sum(batch: pa.Table) -> pa.Table:
        skeys, scodes = ray.get(dim_ref)
        ck = np.asarray(batch.column("o_custkey").combine_chunks(), dtype=np.int64)
        # floor(x*100 + 0.5): same double ops as the oracle SQL — avoids the
        # np.round (banker's) vs DuckDB round (half-away) convention split
        cents = np.floor(
            np.asarray(batch.column("o_totalprice").combine_chunks(), dtype=np.float64) * 100 + 0.5
        ).astype(np.int64)
        pos = np.searchsorted(skeys, ck).clip(max=max(len(skeys) - 1, 0))
        hit = skeys[pos] == ck if len(skeys) else np.zeros(len(ck), bool)
        seg = scodes[pos[hit]]
        rev = np.bincount(seg, weights=cents[hit].astype(np.float64), minlength=len(segments))
        cnt = np.bincount(seg, minlength=len(segments))
        return pa.table(
            {
                "c_mktsegment": pa.array(segments, pa.string()),
                "revenue_cents": pa.array(rev.astype(np.int64), pa.int64()),
                "n_orders": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    pre = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lookup_sum, batch_format="pyarrow"
    )
    agg = pre.groupby("c_mktsegment").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"), Sum("n_orders", alias_name="n_orders")
    )
    out = _collect(agg)
    out = pa.table(
        {
            "c_mktsegment": out.column("c_mktsegment"),
            "revenue_cents": out.column("revenue_cents").cast(pa.int64()),
            "n_orders": out.column("n_orders").cast(pa.int64()),
        }
    )
    return out.filter(pc.greater(out.column("n_orders"), 0)).sort_by("c_mktsegment")


def revenue_by_segment_flag(sf_dir: str) -> pa.Table:
    """TWO-HOP join rollup: lineitem ⋈ orders on orderkey through the
    raw-Ray bucketed equi-join with the aggregation pushed INTO the reduce
    (each bucket returns only (custkey, returnflag, cents) partials), then
    the customer dimension applied batch-free on the tiny partial table
    via one sorted-key lookup. Revenue in integer cents end-to-end — the
    canonical fact⋈fact⋈dim plan with one bucket shuffle total."""
    import pyarrow.parquet as pq_

    from ..stages.join import equi_join_shuffled

    def reduce_fn(joined: pa.Table) -> pa.Table:
        cents = np.floor(
            np.asarray(joined.column("l_extendedprice").combine_chunks(), dtype=np.float64)
            * 100
            + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "o_custkey": joined.column("o_custkey"),
                "l_returnflag": joined.column("l_returnflag"),
                "cents": pa.array(cents, pa.int64()),
            }
        )
        out = t.group_by(["o_custkey", "l_returnflag"]).aggregate([("cents", "sum")])
        return out.rename_columns(["o_custkey", "l_returnflag", "cents"])

    partial = equi_join_shuffled(
        [os.path.join(sf_dir, "lineitem.parquet")],
        "l_orderkey",
        ["l_orderkey", "l_extendedprice", "l_returnflag"],
        [os.path.join(sf_dir, "orders.parquet")],
        "o_orderkey",
        ["o_orderkey", "o_custkey"],
        join_type="inner",
        reduce_fn=reduce_fn,
    )
    cust = pq_.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    keys = np.asarray(cust.column("c_custkey").combine_chunks(), dtype=np.int64)
    seg_dict = cust.column("c_mktsegment").combine_chunks().dictionary_encode()
    codes = np.asarray(seg_dict.indices, dtype=np.int64)
    segments = seg_dict.dictionary.to_pylist()
    order = np.argsort(keys)
    skeys, scodes = keys[order], codes[order]

    ck = np.asarray(partial.column("o_custkey").combine_chunks(), dtype=np.int64)
    pos = np.searchsorted(skeys, ck).clip(max=max(len(skeys) - 1, 0))
    hit = skeys[pos] == ck if len(skeys) else np.zeros(len(ck), bool)
    seg = pa.DictionaryArray.from_arrays(
        pa.array(scodes[pos].astype(np.int32), pa.int32(), mask=~hit),
        pa.array(segments, pa.string()),
    ).cast(pa.string())
    t = pa.table(
        {
            "c_mktsegment": seg,
            "l_returnflag": partial.column("l_returnflag").combine_chunks(),
            "cents": partial.column("cents").combine_chunks(),
        }
    ).filter(pc.is_valid(seg))
    out = t.group_by(["c_mktsegment", "l_returnflag"]).aggregate([("cents", "sum")])
    out = out.rename_columns(["c_mktsegment", "l_returnflag", "revenue_cents"])
    return out.sort_by([("c_mktsegment", "ascending"), ("l_returnflag", "ascending")])


def daily_volume_events(sf_dir: str) -> pa.Table:
    """FRESHNESS / COMPLETENESS check — per-day event volume with an
    anomalous-volume verdict (a day under half / over double the median
    daily count): the partition-completeness monitor every ingestion
    pipeline runs. Streaming map partials (date-cast + per-batch counts
    over a bounded day domain) summed in one tiny final groupby — no
    shuffle; the median is exact integer rank arithmetic on the ≤days-long
    count table (same quantile_disc convention as the quantile surfaces)."""
    from ..stages.stats import exact_quantiles_from_counts

    ds = _read(sf_dir, "events", ["ts"])

    def day_counts(batch: pa.Table) -> pa.Table:
        days = pc.strftime(batch.column("ts"), "%Y-%m-%d")
        out = pa.table({"day": days}).group_by("day").aggregate([([], "count_all")])
        return out.rename_columns(["day", "cnt"])

    partial = _collect(ds.map_batches(day_counts, batch_format="pyarrow"))
    total = partial.group_by("day").aggregate([("cnt", "sum")]).rename_columns(["day", "cnt"])
    cnt = np.asarray(total.column("cnt").combine_chunks())
    counts_map: dict[int, int] = {}
    for c in cnt:
        counts_map[int(c)] = counts_map.get(int(c), 0) + 1
    (med,) = exact_quantiles_from_counts(counts_map, [5000])
    volume = np.where(2 * cnt < med, "low", np.where(cnt > 2 * med, "high", "ok"))
    return pa.table(
        {
            "day": total.column("day"),
            "cnt": total.column("cnt"),
            "volume": pa.array(volume.tolist(), pa.string()),
        }
    ).sort_by("day")


def corr_moments_lineitem(sf_dir: str) -> pa.Table:
    """Grouped CORRELATION / COVARIANCE MOMENTS — the distributed profiling
    primitive behind relationship-drift checks (a corr(x, y) shift between
    snapshots flags upstream logic changes even when each marginal looks
    stable): per (l_returnflag, l_linestatus), the exact integer sufficient
    statistics of (quantity, discount basis points): n, Σx, Σy, Σxy, Σx²,
    Σy². Every sum is associative int64 (quantity ≤ 50, disc_bp ≤ 10⁴ →
    Σy² ≤ 10⁸·n, int64-safe past 10¹⁰ rows), so the raw bucket shuffle of
    per-shard pre-aggregated partials is exact at any parallelism — the
    CLAUDE.md float rule (sum integers, never distribute float sums).
    Pearson r and the regression slope derive from these six numbers on
    the driver in O(groups); the oracle checks the moments themselves.
    disc_bp uses floor(x·10⁴ + 0.5) ≡ DuckDB ROUND(x·10000) (the
    revenue_by_segment convention — avoids numpy's banker's rounding)."""
    from ..stages.shuffle import agg_keys_shuffled

    def derive(tbl: pa.Table) -> pa.Table:
        x = np.asarray(tbl.column("l_quantity").combine_chunks(), dtype=np.float64).astype(
            np.int64
        )
        y = np.floor(
            np.asarray(tbl.column("l_discount").combine_chunks(), dtype=np.float64) * 10000 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": tbl.column("l_returnflag"),
                "l_linestatus": tbl.column("l_linestatus"),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
                "xy": pa.array(x * y, pa.int64()),
                "x2": pa.array(x * x, pa.int64()),
                "y2": pa.array(y * y, pa.int64()),
            }
        )

    out = agg_keys_shuffled(
        [os.path.join(sf_dir, "lineitem.parquet")],
        ["l_returnflag", "l_linestatus"],
        [
            ("x", "count"),
            ("x", "sum"),
            ("y", "sum"),
            ("xy", "sum"),
            ("x2", "sum"),
            ("y2", "sum"),
        ],
        transform_fn=derive,
        read_cols=["l_returnflag", "l_linestatus", "l_quantity", "l_discount"],
    )
    out = out.rename_columns(
        [
            "l_returnflag",
            "l_linestatus",
            "n",
            "sum_qty",
            "sum_disc_bp",
            "sum_qty_disc",
            "sum_qty2",
            "sum_disc_bp2",
        ]
    )
    return out.sort_by([("l_returnflag", "ascending"), ("l_linestatus", "ascending")])


def benford_lineitem(sf_dir: str) -> pa.Table:
    """Benford's-law profile of l_extendedprice — the classic fraud /
    generator-artifact screen: observed first-significant-digit counts vs
    the Benford expectation. First digit via pure integer division (six
    vectorized halving-by-10 rounds — no float log10, whose last-ulp
    differences vs the oracle could flip a digit); per-batch bincount
    partials sum on the driver (9 rows). expected_bp = FLOOR(10000·
    log10(1+1/d)), whose values sit far from integer boundaries, so the
    float log is representation-safe."""
    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def digit_counts(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch.column("l_extendedprice").combine_chunks(), dtype=np.float64)
        d = np.floor(x[x >= 1.0]).astype(np.int64)
        while (d >= 10).any():
            big = d >= 10
            d[big] //= 10
        counts = np.bincount(d, minlength=10)[1:10]
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10, dtype=np.int64), pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    partial = _collect(ds.map_batches(digit_counts, batch_format="pyarrow"))
    total = partial.group_by("digit").aggregate([("n", "sum")]).rename_columns(["digit", "n"])
    total = total.sort_by("digit")
    digits = np.arange(1, 10, dtype=np.float64)
    expected_bp = np.floor(10000 * np.log10(1 + 1 / digits)).astype(np.int64)
    return total.append_column("expected_bp", pa.array(expected_bp, pa.int64()))


def mode_event_type_by_user(sf_dir: str) -> pa.Table:
    """Per-entity MODE — each user's dominant event_type (ties broken by
    the smallest value, pinned against the oracle's row_number window;
    DuckDB's own mode() leaves ties undefined). One group-hash shuffle of
    per-shard (user, type, cnt) combiner partials (stages/shuffle.
    mode_by_group); the winner per user is a vectorized sort +
    first-row-per-group slice inside each reduce."""
    from ..stages.shuffle import mode_by_group

    out = mode_by_group(
        [os.path.join(sf_dir, "events.parquet")], "user_id", "event_type"
    )
    return out.rename_columns(["user_id", "top_event_type", "cnt"]).sort_by("user_id")


def reconcile_orders_lineitem(sf_dir: str) -> pa.Table:
    """CROSS-TABLE AGGREGATE CONSISTENCY — the reconciliation check a
    warehouse runs between a header table and its detail table: does
    o_totalprice equal SUM(l_extendedprice·(1−l_discount)·(1+l_tax)) over
    the order's lines? One raw-Ray bucketed equi-join (orders LEFT OUTER
    lineitem, hash-partitioned by orderkey so every order's lines land in
    exactly one reduce) with the per-order delta AND the per-status rollup
    both computed inside the reduce — only (status, counts, cents) partials
    return to the driver. Integer cents via the proven FLOOR(x·100+0.5)
    recipe; the three-factor product uses the same left-to-right IEEE
    double ops as the oracle SQL, so cents are bit-exact. Orders with no
    lines are their own violation class (n_no_lines)."""
    from ..stages.join import equi_join_shuffled

    def reduce_fn(joined: pa.Table) -> pa.Table:
        ext_a = joined.column("l_extendedprice").combine_chunks()
        has_line = np.asarray(pc.is_valid(ext_a))
        ext = np.asarray(ext_a.fill_null(0.0), dtype=np.float64)
        disc = np.asarray(joined.column("l_discount").combine_chunks().fill_null(0.0))
        tax = np.asarray(joined.column("l_tax").combine_chunks().fill_null(0.0))
        cents = np.floor(ext * (1 - disc) * (1 + tax) * 100 + 0.5).astype(np.int64)
        cents[~has_line] = 0
        stored = np.floor(
            np.asarray(joined.column("o_totalprice").combine_chunks(), dtype=np.float64) * 100
            + 0.5
        ).astype(np.int64)
        per_line = pa.table(
            {
                "o_orderkey": joined.column("o_orderkey"),
                "o_orderstatus": joined.column("o_orderstatus"),
                "cents": pa.array(cents, pa.int64()),
                "has_line": pa.array(has_line),
                "stored_cents": pa.array(stored, pa.int64()),
            }
        )
        per_order = per_line.group_by(["o_orderkey", "o_orderstatus"]).aggregate(
            [("cents", "sum"), ("has_line", "max"), ("stored_cents", "max")]
        )
        line_cents = np.asarray(per_order.column("cents_sum").combine_chunks())
        has = np.asarray(per_order.column("has_line_max").combine_chunks())
        st = np.asarray(per_order.column("stored_cents_max").combine_chunks())
        stats = pa.table(
            {
                "o_orderstatus": per_order.column("o_orderstatus"),
                "n_orders": pa.array(np.ones(len(st), np.int64), pa.int64()),
                "n_no_lines": pa.array((~has).astype(np.int64), pa.int64()),
                "n_mismatch": pa.array((has & (line_cents != st)).astype(np.int64), pa.int64()),
                "abs_delta_cents": pa.array(np.abs(st - line_cents), pa.int64()),
            }
        )
        out = stats.group_by("o_orderstatus").aggregate(
            [("n_orders", "sum"), ("n_no_lines", "sum"), ("n_mismatch", "sum"),
             ("abs_delta_cents", "sum")]
        )
        return out.rename_columns(
            ["o_orderstatus", "n_orders", "n_no_lines", "n_mismatch", "abs_delta_cents"]
        )

    partial = equi_join_shuffled(
        [os.path.join(sf_dir, "orders.parquet")],
        "o_orderkey",
        ["o_orderkey", "o_orderstatus", "o_totalprice"],
        [os.path.join(sf_dir, "lineitem.parquet")],
        "l_orderkey",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
        join_type="left outer",
        reduce_fn=reduce_fn,
    )
    out = partial.group_by("o_orderstatus").aggregate(
        [("n_orders", "sum"), ("n_no_lines", "sum"), ("n_mismatch", "sum"),
         ("abs_delta_cents", "sum")]
    )
    return out.rename_columns(
        ["o_orderstatus", "n_orders", "n_no_lines", "n_mismatch", "abs_delta_cents"]
    ).sort_by("o_orderstatus")


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_events_user(sf_dir: str) -> pa.Table:
    """PIVOT / one-hot count featurization — per user, one count column
    per event_type plus the total (the per-entity feature vector a
    training pipeline derives from an event stream). Per-batch Arrow
    group_by partials shrink each batch to its (user, type) counts; the
    final pivot is one vectorized scatter into a (users × types) int64
    matrix on the merged partial table. The type list is the table's
    fixed enum (validate_events pins it), so columns are static."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def part(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        return out.rename_columns(["user_id", "event_type", "cnt"])

    merged = _collect(ds.map_batches(part, batch_format="pyarrow"))
    total = merged.group_by(["user_id", "event_type"]).aggregate([("cnt", "sum")])
    users_arr = total.column("user_id").combine_chunks()
    uids, ucodes = np.unique(np.asarray(users_arr, dtype=np.int64), return_inverse=True)
    tcodes = np.asarray(
        pc.index_in(
            total.column("event_type").combine_chunks(),
            value_set=pa.array(EVENT_TYPES, pa.string()),
        ).fill_null(len(EVENT_TYPES))
    )
    cnt = np.asarray(total.column("cnt_sum").combine_chunks(), dtype=np.int64)
    mat = np.zeros((len(uids), len(EVENT_TYPES) + 1), dtype=np.int64)
    np.add.at(mat, (ucodes, tcodes.astype(np.int64)), cnt)
    cols: dict[str, pa.Array] = {"user_id": pa.array(uids, pa.int64())}
    for j, t in enumerate(EVENT_TYPES):
        cols[f"n_{t}"] = pa.array(mat[:, j], pa.int64())
    cols["n_total"] = pa.array(mat.sum(axis=1), pa.int64())
    return pa.table(cols)  # np.unique output is already sorted by user_id


def revenue_rollup(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP — subtotal levels (segment, flag) → (segment, ALL)
    → (ALL, ALL) derived from the FINEST aggregate only (the fine level is
    the one bucket-shuffled pass of revenue_by_segment_flag; every coarser
    level is a driver-side re-aggregation of that tiny partial table —
    rollups never rescan the fact table). 'ALL' stands in for the ROLLUP
    NULL so the value compare is null-free."""
    fine = revenue_by_segment_flag(sf_dir)
    seg = fine.group_by("c_mktsegment").aggregate([("revenue_cents", "sum")])
    seg = seg.rename_columns(["c_mktsegment", "revenue_cents"]).append_column(
        "l_returnflag", pa.array(["ALL"] * seg.num_rows, pa.string())
    )
    grand = pa.table(
        {
            "c_mktsegment": pa.array(["ALL"], pa.string()),
            "l_returnflag": pa.array(["ALL"], pa.string()),
            "revenue_cents": pa.array(
                [pc.sum(fine.column("revenue_cents")).as_py()], pa.int64()
            ),
        }
    )
    order = ["c_mktsegment", "l_returnflag", "revenue_cents"]
    out = pa.concat_tables([fine.select(order), seg.select(order), grand.select(order)])
    return out.sort_by([("c_mktsegment", "ascending"), ("l_returnflag", "ascending")])


def props_sum_by_type(sf_dir: str) -> pa.Table:
    """JSON-mode dynamic column in an AGGREGATION context (the validator
    consumes $.k in validate_events; here it rolls up): vectorized
    extraction via polars json_path_match over the whole batch, per-batch
    integer partial sums by event_type (dictionary codes + bincount),
    tiny final groupby. Exact: k is integral, sums stay int64."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def part(batch: pa.Table) -> pa.Table:
        import polars as pl

        ks = (
            pl.from_arrow(batch.column("props").combine_chunks())
            .str.json_path_match("$.k")
            .cast(pl.Int64, strict=False)
            .fill_null(0)
            .to_numpy()
        )
        et = batch.column("event_type").combine_chunks().dictionary_encode()
        codes = np.asarray(et.indices.fill_null(-1), dtype=np.int64)
        types = et.dictionary.to_pylist()
        valid = codes >= 0
        sums = np.bincount(codes[valid], weights=ks[valid].astype(np.float64), minlength=len(types))
        cnts = np.bincount(codes[valid], minlength=len(types))
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "k_sum": pa.array(sums.astype(np.int64), pa.int64()),
                "n": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    agg = ds.map_batches(part, batch_format="pyarrow").groupby("event_type").aggregate(
        Sum("k_sum", alias_name="k_sum"), Sum("n", alias_name="n")
    )
    out = _collect(agg)
    out = pa.table(
        {
            "event_type": out.column("event_type"),
            "k_sum": out.column("k_sum").cast(pa.int64()),
            "n": out.column("n").cast(pa.int64()),
        }
    )
    return out.filter(pc.greater(out.column("n"), 0)).sort_by("event_type")


def top_parts_by_quantity(sf_dir: str, k: int = 10) -> pa.Table:
    """Composite plan: keyed aggregate shuffle (sum of int-cast quantities
    per l_partkey) with a PER-BUCKET top-k pushed into the reduce (the
    global top-k is a subset of bucket winners since each key lives in
    exactly one bucket), driver re-top-k over buckets × k rows, then the
    part-name dim applied to just k keys. Deterministic tie-break on
    partkey."""
    from ..stages.shuffle import agg_keys_shuffled

    def cast_qty(tbl: pa.Table) -> pa.Table:
        return tbl.drop_columns(["l_quantity"]).append_column(
            "l_quantity", tbl.column("l_quantity").cast(pa.int64())
        )

    def bucket_topk(t: pa.Table) -> pa.Table:
        qty = np.asarray(t.column("sum_l_quantity").combine_chunks(), dtype=np.int64)
        keys = np.asarray(t.column("l_partkey").combine_chunks(), dtype=np.int64)
        return t.take(pa.array(np.lexsort((keys, -qty))[:k], pa.int64()))

    agg = agg_keys_shuffled(
        [os.path.join(sf_dir, "lineitem.parquet")],
        ["l_partkey"],
        [("l_quantity", "sum")],
        transform_fn=cast_qty,
        having_fn=bucket_topk,
    )
    qty = np.asarray(agg.column("sum_l_quantity").combine_chunks(), dtype=np.int64)
    keys = np.asarray(agg.column("l_partkey").combine_chunks(), dtype=np.int64)
    top = np.lexsort((keys, -qty))[:k]
    keys, qty = keys[top], qty[top]

    import pyarrow.parquet as pq_

    part = pq_.read_table(os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"])
    pk = np.asarray(part.column("p_partkey").combine_chunks(), dtype=np.int64)
    order = np.argsort(pk)
    pos = np.searchsorted(pk[order], keys)
    names = part.column("p_name").combine_chunks().take(
        pa.array(order[pos.clip(max=max(len(pk) - 1, 0))], pa.int64())
    )
    return pa.table(
        {
            "p_partkey": pa.array(keys, pa.int64()),
            "p_name": names,
            "qty": pa.array(qty, pa.int64()),
        }
    ).sort_by([("qty", "descending"), ("p_partkey", "ascending")])


# ---- grouped histogram (PSI input) -----------------------------------------
def histogram_events_type(sf_dir: str) -> pa.Table:
    """GROUP BY count over a string key through the raw bucket shuffle
    (stages/shuffle.count_keys_shuffled, min_count=1): per-shard pre-agg
    combiners mean only O(distinct types per shard) rows move, and string
    keys avoid Ray Data's native groupby (measured 60x slower on strings —
    CLAUDE.md invariant)."""
    from ..stages.shuffle import count_keys_shuffled

    out = count_keys_shuffled(
        [os.path.join(sf_dir, "events.parquet")], ["event_type"], min_count=1
    )
    return out.sort_by("event_type")


# ---- dedup ------------------------------------------------------------------
def dedup_exact_documents(sf_dir: str) -> pa.Table:
    from ..functions.dedup import exact_dedup_paths

    out = exact_dedup_paths([os.path.join(sf_dir, "documents.parquet")])
    return out.sort_by("doc_id")


def minhash_neardup_documents(sf_dir: str) -> pa.Table:
    """LSH candidates → DISTRIBUTED exact-Jaccard verify: only the candidate
    id set is broadcast; shingle sets are computed by a semi-join map_batches
    over the corpus and pairs verified in parallel tasks. No document text
    ever reaches the driver (round-1 materialized the whole corpus here).

    Oracle-backed: the DuckDB oracle computes EXACT all-pairs word-trigram
    Jaccard ≥ 0.8; the engine's banding (b=16, r=4) has miss probability
    (1-j^4)^16 ≈ 1e-4 at j=0.8 and < 1e-15 at the j≥0.9 pairs present in
    this data, so the outputs match exactly (verified sf0.001 + sf0.01).
    jacc_bp is multiply-first floored basis points per CLAUDE.md."""
    from ..functions.dedup import (
        _dedupe_pairs,
        expand_candidate_pairs,
        verify_pairs_shuffled,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # transitive closure of the star-capped candidates: without it a hot
    # bucket's (x, y) pairs never reach the verify and the all-pairs oracle
    # would see more rows (ADVICE r2)
    pairs = expand_candidate_pairs(_dedupe_pairs(_collect(minhash_candidates(ds))))
    if pairs.num_rows == 0:
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jacc_bp": pa.array([], pa.int64()),
            }
        )
    # shingle-bucket shuffle verify: candidate shingle sets never leave
    # their workers (the fetch-then-broadcast path is O(corpus) on the
    # driver when candidates ≈ corpus — VERDICT r3 #1's anti-pattern)
    out = verify_pairs_shuffled(
        [os.path.join(sf_dir, "documents.parquet")], pairs, threshold=0.8
    )
    return out.select(["id_a", "id_b", "jacc_bp"]).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


def ngram_jaccard_neardup_documents(sf_dir: str) -> pa.Table:
    """EXACT word-trigram Jaccard >= 0.8 self-join via prefix filtering
    (All-Pairs/PPJoin candidate generation — deterministic, unlike MinHash
    banding's ~1e-4 miss probability) → distributed exact-Jaccard verify.
    Same output product and DuckDB oracle as minhash_neardup_documents,
    through an entirely different candidate path: each doc ships only its
    |S| - ceil(0.8|S|) + 1 order-smallest shingles into the bucket shuffle
    (hot/boilerplate shingles ordered last from a sampled df pass)."""
    from ..functions.dedup import (
        _dedupe_pairs,
        expand_candidate_pairs,
        ngram_jaccard_pairs,
        verify_pairs_shuffled,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    doc_paths = [os.path.join(sf_dir, "documents.parquet")]
    # paths= routes the df-ORDERING pass through the shard-sampled reader
    # (reads ~1/4 of shards instead of every text byte for a 5 % doc sample)
    pairs = expand_candidate_pairs(
        _dedupe_pairs(ngram_jaccard_pairs(ds, threshold=0.8, paths=doc_paths))
    )
    if pairs.num_rows == 0:
        return pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "jacc_bp": pa.array([], pa.int64()),
            }
        )
    # PPJoin candidates cover ~the whole corpus, so the verify MUST be the
    # shingle-bucket shuffle — fetching candidate shingle sets to the
    # driver would re-materialize O(corpus) (VERDICT r3 #1's anti-pattern)
    out = verify_pairs_shuffled(doc_paths, pairs, threshold=0.8)
    return out.select(["id_a", "id_b", "jacc_bp"]).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


def dup_passages_documents(sf_dir: str) -> pa.Table:
    """Exact duplicate-PASSAGE detection (Lee et al.-style substring dedup
    at L=8 token windows): per doc, the count of 8-token windows whose
    exact token sequence also appears in another document — the
    boilerplate/contamination-span audit that whole-doc dedup misses.
    One O(corpus tokens) window-hash shuffle, per-(hash,doc) combiners,
    only the O(duplicated windows) counts reach the driver
    (functions/text.duplicate_passage_counts)."""
    from ..functions.text import duplicate_passage_counts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return duplicate_passage_counts(ds, L=8).sort_by("doc_id")


def dedup_neardup_survivors_documents(sf_dir: str) -> pa.Table:
    """Keep-one-per-cluster near-dup dedup: MinHash-LSH pairs → connected
    components (union-by-min) → survivors = corpus minus non-minimal
    component members. Oracle: the exact all-pairs trigram-Jaccard edge set
    closed transitively with a recursive CTE — a doc is dropped iff it can
    reach a smaller doc_id."""
    from ..functions.dedup import (
        _dedupe_pairs,
        neardup_survivors,
        verify_pairs_shuffled,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _dedupe_pairs(_collect(minhash_candidates(ds)))
    if pairs.num_rows:
        pairs = verify_pairs_shuffled(
            [os.path.join(sf_dir, "documents.parquet")], pairs, threshold=0.8
        )
    return neardup_survivors(ds, pairs)


def dedup_neardup_keep_best_documents(sf_dir: str) -> pa.Table:
    """QUALITY-PRIORITY near-dup dedup (keep-best survivor policy — the
    FineWeb/Dolma curation shape): per near-dup component keep the member
    with the MOST tokens (ties → smallest doc_id) instead of keep-min.
    Same MinHash-LSH → shingle-shuffle verify pair path as
    dedup_neardup_survivors_documents; adds one O(members) distributed
    token-count gather and a driver argmax over the label rows. Oracle:
    the recursive-CTE reachability closure, dropping a doc iff it can
    reach a strictly-better member ((n_tokens, -doc_id) lexicographic)."""
    from ..functions.dedup import (
        _dedupe_pairs,
        neardup_survivors_keep_best,
        verify_pairs_shuffled,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _dedupe_pairs(_collect(minhash_candidates(ds)))
    if pairs.num_rows:
        pairs = verify_pairs_shuffled(
            [os.path.join(sf_dir, "documents.parquet")], pairs, threshold=0.8
        )
    return neardup_survivors_keep_best(ds, pairs)


def simhash_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = _collect(simhash_signatures(ds, concurrency=2))
    return out.select(["doc_id", "simhash"]).sort_by("doc_id")


def simhash_neardup_documents(sf_dir: str) -> pa.Table:
    """Banded SimHash near-dup pairs (hamming ≤ 3; 4×16-bit bands give
    exact recall at that radius by pigeonhole) — rows-only (bit signatures
    are not SQL-expressible); golden counts in test_functions."""
    from ..functions.dedup import simhash_near_dups

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_near_dups(ds)


def _with_planted_vec_copies(batch: pa.Table) -> pa.Table:
    """Originals + planted duplicate vectors (vec_id+100000 copies of
    vec_id<50) in ONE output table — a Dataset.union here emitted
    schema-divergent sentinel blocks and a second operator for what is a
    per-batch append. Shared by the embedding near-dup / semantic-dedup
    queries so their oracles see the identical augmented relation."""
    sub = batch.filter(pc.less(batch.column("vec_id"), 50))
    extra = pa.table(
        {
            "vec_id": pc.add(sub.column("vec_id"), 100000),
            "embedding": sub.column("embedding"),
        }
    )
    return pa.concat_tables([batch.select(["vec_id", "embedding"]), extra]).combine_chunks()


def embedding_neardup(sf_dir: str) -> pa.Table:
    """Cosine near-dup over the embeddings table AUGMENTED with planted
    duplicates (vec_id+100000 copies of vec_id<50) so the positive path is
    exercised and oracle-checkable: identical vectors collide in every LSH
    table by construction, so recall on the planted pairs is exactly 1.0
    and the output matches the DuckDB cross-join oracle bit-for-bit (the
    organic max pairwise cosine in this data is ~0.51, far below 0.95)."""
    from ..functions.dedup import embedding_near_dups

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    aug = ds.map_batches(_with_planted_vec_copies, batch_format="pyarrow")
    out = embedding_near_dups(aug, threshold=0.95, concurrency=2)
    return out.select(["id_a", "id_b"])


def semdedup_embeddings(sf_dir: str) -> pa.Table:
    """SemDeDup-style semantic dedup (cluster the embedding space, prune
    within-cluster cosine near-dups — functions/dedup.semantic_dedup) over
    the embeddings table with the SAME planted duplicates as
    embedding_neardup. Centroids are deterministic exemplar rows
    (vec_id % 97 == 0, id-sorted — the oracle-reproducible centroid rule;
    k-means centroids are the real-curation path but not SQL-expressible),
    so the DuckDB oracle reproduces the argmax-cosine assignment exactly:
    each planted copy lands in its original's cluster with cosine 1.0 and
    is dropped (copy id > original id), while the organic max pairwise
    cosine (~0.51) keeps every original. Output (vec_id, cluster_id)."""
    from ..functions.dedup import semantic_dedup
    from ..functions.similarity import _as_matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def pick_exemplars(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").combine_chunks(), dtype=np.int64)
        return batch.filter(pa.array(ids % 97 == 0))

    cent_tbl = _collect(ds.map_batches(pick_exemplars, batch_format="pyarrow")).sort_by(
        "vec_id"
    )
    centroids = _as_matrix(cent_tbl.column("embedding"))
    cent_ids = np.asarray(cent_tbl.column("vec_id").combine_chunks(), dtype=np.int64)

    aug = ds.map_batches(_with_planted_vec_copies, batch_format="pyarrow")
    return semantic_dedup(aug, centroids, cent_ids, threshold=0.95)


def cluster_prototypes_embeddings(sf_dir: str) -> pa.Table:
    """Per-cluster prototype selection (functions/similarity.
    cluster_prototypes — the curation dual of semdedup_embeddings, same
    deterministic exemplar centroids): each cluster's 3 vectors nearest
    its centroid, ranked. Per-batch local top-k partials reduce to the
    exact global answer; matches the DuckDB row_number-over-cosine oracle
    bit-for-bit."""
    from ..functions.similarity import _as_matrix, cluster_prototypes

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def pick_exemplars(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").combine_chunks(), dtype=np.int64)
        return batch.filter(pa.array(ids % 97 == 0))

    cent_tbl = _collect(ds.map_batches(pick_exemplars, batch_format="pyarrow")).sort_by(
        "vec_id"
    )
    centroids = _as_matrix(cent_tbl.column("embedding"))
    cent_ids = np.asarray(cent_tbl.column("vec_id").combine_chunks(), dtype=np.int64)
    return cluster_prototypes(ds, centroids, cent_ids, k=3)


# ---- text analysis ----------------------------------------------------------
def chunk_documents(sf_dir: str) -> pa.Table:
    """Sliding-window chunking with overlap (functions/text.chunk_texts):
    every document flat-mapped to 200-char chunks at stride 150 (50-char
    overlap) — the RAG / context-window training-prep shape. Pure
    batch-local flat map (zero shuffles); output
    (doc_id, chunk_idx, chunk) matches the DuckDB
    generate_series × substring oracle bit-for-bit."""
    from ..functions.text import chunk_texts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = _collect(
        ds.map_batches(
            lambda b: chunk_texts(b, chunk_chars=200, stride=150), batch_format="pyarrow"
        )
    )
    return out.sort_by([("doc_id", "ascending"), ("chunk_idx", "ascending")])


def token_count_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _collect(ds.map_batches(token_count, batch_format="pyarrow")).sort_by("doc_id")


def quality_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def bp(batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        n_chars = pc.cast(pc.utf8_length(col), pa.float64())
        safe = pc.max_element_wise(n_chars, 1.0)
        n_alpha = pc.cast(pc.count_substring_regex(col, "[A-Za-z]"), pa.float64())
        n_digit = pc.cast(pc.count_substring_regex(col, "[0-9]"), pa.float64())
        # multiply-first (10000·n/len) so basis points match the oracle's
        # FLOOR(10000.0 * n / len) bit-for-bit
        alpha_bp = pc.cast(pc.floor(pc.divide(pc.multiply(n_alpha, 10000.0), safe)), pa.int64())
        digit_bp = pc.cast(pc.floor(pc.divide(pc.multiply(n_digit, 10000.0), safe)), pa.int64())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pc.cast(pc.utf8_length(col), pa.int64()),
                "alpha_bp": alpha_bp,
                "digit_bp": digit_bp,
            }
        )

    return _collect(ds.map_batches(bp, batch_format="pyarrow")).sort_by("doc_id")


def pack_documents(sf_dir: str) -> pa.Table:
    """Length-bucketed sequence packing (functions/packing.py): documents
    assigned to 64-token training bins — power-of-two length buckets with
    fixed per-bin capacity, bin = rank // capacity over the bucket's ids.
    Deterministic and layout-independent, so it is fully SQL-expressible
    (row_number window over the same CEIL(LOG2(...)) bucket)."""
    from ..functions.packing import pack_documents_ds

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return pack_documents_ds(ds, budget=64).sort_by("doc_id")


def export_packed_documents(sf_dir: str) -> pa.Table:
    """TRAINING-EXAMPLE EXPORT — the step after bin assignment: each bin's
    member documents concatenated (doc_id order, single-space joined) into
    one packed sequence with its token count. The tiny (doc, bucket, bin)
    assignment from the packing shuffle is broadcast once (ray.put +
    searchsorted per batch); texts then shuffle ONCE keyed by (bucket,
    bin) so each reduce assembles whole bins — document text never touches
    the driver. Scale note: the assignment table is corpus-row-sized; when
    it outgrows one object, replace the broadcast with the bucketed
    equi-join (stages/join.py) on doc_id — the reduce side is unchanged."""
    import ray

    from ..functions.packing import pack_documents_ds
    from ..stages.shuffle import _tree_combine
    from ..stages.temporal import _bucket_map_refs, _concat_remote

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    packed = pack_documents_ds(ds, budget=64)
    ids = np.asarray(packed.column("doc_id").combine_chunks(), dtype=np.int64)
    order = np.argsort(ids)
    asg_ref = ray.put(
        (
            ids[order],
            np.asarray(packed.column("bucket").combine_chunks(), dtype=np.int64)[order],
            np.asarray(packed.column("bin").combine_chunks(), dtype=np.int64)[order],
        )
    )

    def tag(batch: pa.Table) -> pa.Table:
        sids, sb, sbin = ray.get(asg_ref)
        d = np.asarray(batch.column("doc_id").combine_chunks(), dtype=np.int64)
        pos = np.searchsorted(sids, d).clip(max=max(len(sids) - 1, 0))
        hit = sids[pos] == d if len(sids) else np.zeros(len(d), bool)
        n_tok = pc.cast(pc.count_substring_regex(batch.column("text"), TOKEN_RE), pa.int64())
        t = pa.table(
            {
                # composite shuffle key: bins per bucket < 2^40 at any scale
                "bk": pa.array(sb[pos] * (1 << 40) + sbin[pos], pa.int64()),
                "doc_id": batch.column("doc_id"),
                "text": batch.column("text"),
                "n": n_tok,
            }
        )
        return t.filter(pa.array(hit))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    @ray.remote
    def reduce_bins(*tables: pa.Table) -> pa.Table:
        t = pa.concat_tables([x for x in tables if x.num_rows])
        if t.num_rows == 0:
            return pa.table({})
        s = t.sort_by([("bk", "ascending"), ("doc_id", "ascending")])
        bk = np.asarray(s.column("bk").combine_chunks(), dtype=np.int64)
        texts = s.column("text").to_pylist()
        n = np.asarray(s.column("n").combine_chunks(), dtype=np.int64)
        firsts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        ends = np.r_[firsts[1:], len(bk)]
        return pa.table(
            {
                "bucket": pa.array(bk[firsts] >> 40, pa.int64()),
                "bin": pa.array(bk[firsts] & ((1 << 40) - 1), pa.int64()),
                "n_docs": pa.array(ends - firsts, pa.int64()),
                "n_tokens": pa.array(np.add.reduceat(n, firsts), pa.int64()),
                "packed_text": pa.array(
                    [" ".join(texts[a:b]) for a, b in zip(firsts, ends)], pa.string()
                ),
            }
        )

    num_buckets = 8
    refs = _bucket_map_refs(tagged, ["bk", "doc_id", "text", "n"], "bk", num_buckets)
    combine = _concat_remote()
    reduced = [
        reduce_bins.remote(*_tree_combine([refs[m][b] for m in range(len(refs))], combine))
        for b in range(num_buckets)
    ]
    tables = [t for t in ray.get(reduced) if t.num_rows]
    out = pa.concat_tables(tables)
    return out.sort_by([("bucket", "ascending"), ("bin", "ascending")])


def normalize_text_documents(sf_dir: str) -> pa.Table:
    """Canonical text-cleaning pass (the unicode-lowercase + whitespace-
    collapse + trim normalization every dedup/tokenize stage wants run
    first): three vectorized Arrow kernels per batch, streaming, no
    shuffle. RE2 `\\s` is ASCII-only in BOTH Arrow and DuckDB, so the
    collapse step matches regexp_replace(text, '\\s+', ' ', 'g') exactly;
    the final trim strips the single leading/trailing space the collapse
    can leave."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        col = pc.utf8_lower(batch.column("text"))
        col = pc.replace_substring_regex(col, r"\s+", " ")
        col = pc.utf8_trim(col, " ")
        return pa.table({"doc_id": batch.column("doc_id"), "norm_text": col})

    return _collect(ds.map_batches(norm, batch_format="pyarrow")).sort_by("doc_id")


def best_doc_per_stratum(sf_dir: str) -> pa.Table:
    """Per-(lang, source) canonical exemplar: the highest-alpha-ratio doc,
    ties broken by min doc_id — distributed ARGMAX as a plain keyed max of
    a packed rank (util.pack_argmax_rank: score·2^40 + (2^40-1-id)) through
    the raw-Ray combiner shuffle. Only (lang, source, rank int64) rows leave
    the map tasks; document text never shuffles. SQL equivalent:
    row_number() OVER (PARTITION BY lang, source ORDER BY bp DESC, id) = 1."""
    from ..stages.shuffle import agg_keys_shuffled
    from ..util import pack_argmax_rank, unpack_argmax_rank

    def rank_rows(tbl: pa.Table) -> pa.Table:
        col = tbl.column("text")
        n_chars = pc.cast(pc.utf8_length(col), pa.float64())
        safe = pc.max_element_wise(n_chars, 1.0)
        n_alpha = pc.cast(pc.count_substring_regex(col, "[A-Za-z]"), pa.float64())
        bp = pc.cast(pc.floor(pc.divide(pc.multiply(n_alpha, 10000.0), safe)), pa.int64())
        rank = pack_argmax_rank(
            np.asarray(bp.combine_chunks() if isinstance(bp, pa.ChunkedArray) else bp),
            np.asarray(tbl.column("doc_id").combine_chunks()),
        )
        return pa.table(
            {
                "lang": tbl.column("lang"),
                "source": tbl.column("source"),
                "rank": pa.array(rank, pa.int64()),
            }
        )

    out = agg_keys_shuffled(
        [os.path.join(sf_dir, "documents.parquet")],
        ["lang", "source"],
        [("rank", "max")],
        transform_fn=rank_rows,
        read_cols=["doc_id", "text", "lang", "source"],
    )
    bp, doc_id = unpack_argmax_rank(np.asarray(out.column("max_rank").combine_chunks()))
    res = pa.table(
        {
            "lang": out.column("lang"),
            "source": out.column("source"),
            "doc_id": pa.array(doc_id, pa.int64()),
            "alpha_bp": pa.array(bp, pa.int64()),
        }
    )
    return res.sort_by([("lang", "ascending"), ("source", "ascending")])


def curate_documents(sf_dir: str) -> pa.Table:
    """End-to-end corpus CURATION — the canonical LLM-training-data shape
    (dedup → quality floor → language filter → keep list) composed as one
    streaming pass: the exact-dup groupby-min shuffle (the only shuffle)
    emits only DUPLICATE groups (h, min_id), broadcast once via ``ray.put``
    — O(duplicates), not O(corpus) (VERDICT r3 #1; the old survivor-id
    broadcast was ~the whole corpus). The keep pass re-hashes text
    batch-local and drops a row iff its content hash is in a duplicate
    group and its id is not the group min; quality basis points and
    stopword language-ID are computed batch-local inside the SAME
    ``map_batches``, so document text never leaves the workers and no
    second shuffle happens. Keep = survivor ∧ alpha_bp >= 6000 ∧
    n_chars >= 20 ∧ lang_pred = 'en'. Fully oracle-backed: the SQL
    composes the identical three predicates (min-per-text-group, the
    quality ratios, the generated stopword scoring)."""
    import ray

    from ..functions.dedup import exact_dedup_dup_groups_paths
    from ..util import cached_stage, hash_column

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    dup = exact_dedup_dup_groups_paths([os.path.join(sf_dir, "documents.parquet")])
    if dup.num_rows:
        dup_h = np.asarray(dup.column("h").combine_chunks(), dtype=np.int64)
        dup_min = np.asarray(dup.column("min_id").combine_chunks(), dtype=np.int64)
        order = np.argsort(dup_h)
        dup_ref = ray.put((dup_h[order], dup_min[order]))
    else:
        dup_ref = ray.put((np.zeros(0, np.int64), np.zeros(0, np.int64)))
    langid = cached_stage(LangIdStage)

    def keep(batch: pa.Table) -> pa.Table:
        from ..util import single_chunk

        ids = np.asarray(single_chunk(batch.column("doc_id")), dtype=np.int64)
        col = single_chunk(batch.column("text"))
        dup_h, dup_min = ray.get(dup_ref)  # zero-copy shared read
        if len(dup_h):
            h = hash_column(col).view(np.int64)
            pos = np.searchsorted(dup_h, h).clip(max=len(dup_h) - 1)
            in_dup = dup_h[pos] == h
            m = ~(in_dup & (ids != dup_min[pos]))
        else:
            m = np.ones(len(ids), bool)
        n_chars = pc.cast(pc.utf8_length(col), pa.float64())
        safe = pc.max_element_wise(n_chars, 1.0)
        n_alpha = pc.cast(pc.count_substring_regex(col, "[A-Za-z]"), pa.float64())
        alpha_bp = pc.cast(pc.floor(pc.divide(pc.multiply(n_alpha, 10000.0), safe)), pa.int64())
        lang = single_chunk(langid(batch).column("lang_pred"))
        m &= np.asarray(pc.fill_null(pc.equal(lang, "en"), False))
        m &= np.asarray(pc.fill_null(alpha_bp, 0)) >= 6000
        m &= np.asarray(pc.fill_null(pc.greater_equal(n_chars, 20.0), False))
        sel = pa.array(m)
        return pa.table(
            {
                "doc_id": pa.array(ids[m], pa.int64()),
                "n_chars": pc.cast(n_chars, pa.int64()).filter(sel),
                "alpha_bp": alpha_bp.filter(sel),
            }
        )

    return _collect(ds.map_batches(keep, batch_format="pyarrow")).sort_by("doc_id")


def dup_rate_by_source_documents(sf_dir: str) -> pa.Table:
    """Per-SOURCE duplication-rate report — the curation dashboard metric
    that tells you WHICH ingest feed is re-crawling content (a rising dup
    rate on one source flags its fetcher, not the corpus): per source,
    total docs, docs that are non-surviving members of an exact-dup group
    (keep-min policy, same as dedup_exact_documents), and the rate in
    multiply-first basis points. One dup-group shuffle (O(duplicate
    groups) broadcast — the curate_documents shape), then one streaming
    pass emitting per-batch (source, n, n_dup) partials; the final
    groupby is over O(batches × sources) tiny rows."""
    import ray

    from ..functions.dedup import exact_dedup_dup_groups_paths
    from ..util import hash_column, single_chunk, sorted_lookup

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    dup = exact_dedup_dup_groups_paths([os.path.join(sf_dir, "documents.parquet")])
    if dup.num_rows:
        dup_h = np.asarray(dup.column("h").combine_chunks(), dtype=np.int64)
        dup_min = np.asarray(dup.column("min_id").combine_chunks(), dtype=np.int64)
        order = np.argsort(dup_h)
        dup_ref = ray.put((dup_h[order], dup_min[order]))
    else:
        dup_ref = ray.put((np.zeros(0, np.int64), np.zeros(0, np.int64)))

    def partials(batch: pa.Table) -> pa.Table:
        dup_h, dup_min = ray.get(dup_ref)  # zero-copy shared read
        ids = np.asarray(single_chunk(batch.column("doc_id")), dtype=np.int64)
        if len(dup_h):
            h = hash_column(single_chunk(batch.column("text"))).view(np.int64)
            pos, found = sorted_lookup(dup_h, h)
            is_dup = found & (ids != dup_min[pos])
        else:
            is_dup = np.zeros(len(ids), bool)
        t = pa.table(
            {
                "source": batch.column("source"),
                "n_dup": pa.array(is_dup.astype(np.int64)),
            }
        )
        out = t.group_by(["source"]).aggregate([([], "count_all"), ("n_dup", "sum")])
        return out.rename_columns(["source", "n", "n_dup"])

    parts = _collect(ds.map_batches(partials, batch_format="pyarrow"))
    out = parts.group_by(["source"]).aggregate([("n", "sum"), ("n_dup", "sum")])
    n = np.asarray(out.column("n_sum"), dtype=np.int64)
    nd = np.asarray(out.column("n_dup_sum"), dtype=np.int64)
    return pa.table(
        {
            "source": out.column("source"),
            "n_docs": pa.array(n, pa.int64()),
            "n_dups": pa.array(nd, pa.int64()),
            "dup_bp": pa.array(10000 * nd // np.maximum(n, 1), pa.int64()),
        }
    ).sort_by("source")


def fingerprint_documents(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _collect(ds.map_batches(fingerprint, batch_format="pyarrow")).sort_by("doc_id")


def winnow_passages_documents(sf_dir: str) -> pa.Table:
    """Corpus-level copied-passage detection via winnowing fingerprints
    (Schleimer/Wilkerson/Aiken): explode each doc to (doc_id, fp) rows in
    map_batches, groupby fp across the corpus, star-capped pairs per
    fingerprint bucket, then count shared fps per doc pair. Returns
    (id_a, id_b, n_shared) for pairs sharing ≥8 fingerprints — rows-only
    (winnowing is not SQL-expressible); golden counts in test_functions."""
    from ..functions.dedup import lsh_bucket_pairs
    from ..functions.text import winnow_fingerprints

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # k=20-char grams / window=8 picked for selectivity: on sf0.01 this
    # recovers exactly the 25 planted near-dup pairs (k=8 matched almost
    # all-pairs on the shared synthetic vocabulary). Bucketing goes through
    # the raw-Ray lsh_bucket_pairs shuffle (Dataset.groupby was ~10x slower
    # on these key row counts).
    fps = ds.map_batches(
        lambda b: winnow_fingerprints(b, k=20, window=8), batch_format="pyarrow"
    )
    tbl = lsh_bucket_pairs(fps, "doc_id", key_col="fp")
    empty = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "n_shared": pa.array([], pa.int64()),
        }
    )
    if tbl.num_rows == 0:
        return empty
    counted = (
        tbl.group_by(["id_a", "id_b"])
        .aggregate([([], "count_all")])
        .rename_columns(["id_a", "id_b", "n_shared"])
    )
    counted = counted.filter(pc.greater_equal(counted.column("n_shared"), 8))
    return counted.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def langid_documents(sf_dir: str) -> pa.Table:
    from ..util import cached_stage

    """Stopword-table language ID — oracle-backed: the scoring (token
    fraction per language's stopword list, first-max tie-break, 0.05
    threshold) is reproduced in SQL generated from the same tables."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = _collect(
        ds.repartition(8).map_batches(cached_stage(LangIdStage), batch_format="pyarrow")
    )
    return out.select(["doc_id", "lang_pred"]).sort_by("doc_id")


def langid_confusion_documents(sf_dir: str) -> pa.Table:
    """Language-ID CONFUSION MATRIX vs the labeled lang column — the
    model-vs-label evaluation table every classifier-driven curation
    stage needs before its output is trusted: (lang, lang_pred, n).
    One map_batches (same cached LangIdStage) emits per-batch (label,
    pred) count partials; the driver merges ≤ languages² tiny rows. The
    oracle reproduces the prediction in SQL generated from the SAME
    stopword tables (cannot drift)."""
    from ..util import cached_stage

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def count_pairs(batch: pa.Table) -> pa.Table:
        pred = cached_stage(LangIdStage)(batch.select(["doc_id", "text"]))
        t = pa.table(
            {
                "lang": batch.column("lang"),
                # null (below-threshold) → 'und' so both sides group/sort
                # identically
                "lang_pred": pc.fill_null(pred.column("lang_pred"), "und"),
            }
        )
        g = t.group_by(["lang", "lang_pred"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "lang_pred", "n"])

    parts = _collect(ds.map_batches(count_pairs, batch_format="pyarrow"))
    out = parts.group_by(["lang", "lang_pred"]).aggregate([("n", "sum")])
    return out.rename_columns(["lang", "lang_pred", "n"]).sort_by(
        [("lang", "ascending"), ("lang_pred", "ascending")]
    )


# ---- similarity search ------------------------------------------------------
def _query_vectors(sf_dir: str, n: int = 4) -> tuple[np.ndarray, list[int]]:
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    mask = pc.less(tbl.column("vec_id"), n)
    sub = tbl.filter(mask)
    ids = sub.column("vec_id").to_pylist()
    vecs = np.asarray(sub.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return vecs[order], [ids[i] for i in order]


def ann_topk_embeddings(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q, qids = _query_vectors(sf_dir)
    out = brute_force_topk(ds, q, qids, k=10)
    return out.select(["query_id", "vec_id"])


def _src_stat_key(*paths: str) -> str:
    """Cheap content fingerprint of the source files backing a persisted
    index: (count, total bytes, max mtime_ns) over the paths (dirs walk
    their parquet files). Folded into every index-dir key so a REGENERATED
    fixture at the same path gets a fresh index instead of silently probing
    the stale one (the param-only meta markers are content-blind)."""
    import glob as glob_

    files: list[str] = []
    for p_ in paths:
        if os.path.isdir(p_):
            files.extend(sorted(glob_.glob(os.path.join(p_, "**", "*.parquet"), recursive=True)))
        else:
            files.append(p_)
    total = 0
    mt = 0
    for f in files:
        st = os.stat(f)
        total += st.st_size
        mt = max(mt, st.st_mtime_ns)
    return f"{len(files)}b{total}m{mt}"


def _ivf_index_dir(sf_dir: str) -> str:
    import hashlib

    src = _src_stat_key(os.path.join(sf_dir, "embeddings.parquet"))
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{src}|n16|s4096|seed42".encode()
    ).hexdigest()[:12]
    return os.path.join("/tmp/schemasaurus_ray/ivf_index", key)


def ann_ivf_embeddings(sf_dir: str) -> pa.Table:
    """IVF top-k through the PERSISTED centroid-partitioned layout: the
    index is built once (hive-partitioned parquet, bucket = nearest
    centroid; idempotent — reused when the marker + params match) and the
    query path reads ONLY the probed bucket directories, pruning I/O to
    ~nprobe/n_clusters of the bytes (VERDICT r3 #3). Identical math —
    and therefore identical output — to the one-shot ivf_topk scan."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q, qids = _query_vectors(sf_dir)
    idx = _ivf_index_dir(sf_dir)
    ivf_build_index(ds, idx, n_clusters=16)
    return ivf_topk_indexed(idx, q, qids, k=10, nprobe=6)


def ann_recall_embeddings(sf_dir: str) -> pa.Table:
    """QUALITY EVAL of the approximate index: recall@10 of the IVF path
    against the exact brute-force top-10 on the same queries — the number
    you check before trusting an ANN index for dedup/retrieval. Both
    paths are deterministic (seeded k-means, fixed query set), so this
    rows-only surface is stable; the pytest golden enforces a floor.
    Output (query_id, recall_bp) in basis points — integers only."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q, qids = _query_vectors(sf_dir)
    exact = brute_force_topk(ds, q, qids, k=10)
    idx = _ivf_index_dir(sf_dir)
    ivf_build_index(_read(sf_dir, "embeddings", ["vec_id", "embedding"]), idx, n_clusters=16)
    approx = ivf_topk_indexed(idx, q, qids, k=10, nprobe=6)
    truth: dict[int, set[int]] = {}
    for r in exact.to_pylist():
        truth.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    got: dict[int, set[int]] = {}
    for r in approx.to_pylist():
        got.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    rows = sorted(truth)
    recall = [
        (10000 * len(truth[qid] & got.get(qid, set()))) // max(len(truth[qid]), 1)
        for qid in rows
    ]
    return pa.table(
        {
            "query_id": pa.array(rows, pa.int64()),
            "recall_bp": pa.array(recall, pa.int64()),
        }
    )


# ---- normalizer -------------------------------------------------------------
def normalize_lineitem(sf_dir: str) -> pa.Table:
    """NormalizeStage: type coercion (number→integer) + projection to spec
    columns — the reference normalizer's [type]/[additionalProperty] ops
    (normalizer.js:16-44,13-15) vectorized over columns."""
    from ..stages.normalize import NormalizeStage

    spec = {
        "columns": {
            "l_orderkey": {"type": "integer"},
            "l_linenumber": {"type": "integer"},
            "l_quantity": {"type": "integer"},  # 1.0-valued doubles → int64
        }
    }
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity", "l_tax"])
    out = _collect(
        ds.map_batches(NormalizeStage(spec), batch_format="pyarrow")
    )
    return out.rename_columns(["l_orderkey", "l_linenumber", "qty_int"])


def normalize_events_defaults(sf_dir: str) -> pa.Table:
    """Normalizer [default] fill + [additionalProperty] removal, oracle-
    backed: value is first masked to null where > 100 (simulating missing
    data in a SQL-expressible way), then NormalizeStage fills the spec
    default 0.0 and drops the props column (absent from the spec) — the
    reference normalizer's two core ops (normalizer.js:16-44)."""
    from ..stages.normalize import NormalizeStage

    spec = {
        "columns": {
            "event_id": {"type": "integer"},
            "value": {"type": "number", "default": 0.0},
        }
    }
    ds = _read(sf_dir, "events", ["event_id", "value", "props"])

    def mask(batch: pa.Table) -> pa.Table:
        v = batch.column("value")
        masked = pc.if_else(pc.greater(v, 100.0), pa.nulls(batch.num_rows, pa.float64()), v)
        return pa.table(
            {"event_id": batch.column("event_id"), "value": masked, "props": batch.column("props")}
        )

    out = _collect(
        ds.map_batches(mask, batch_format="pyarrow").map_batches(
            NormalizeStage(spec), batch_format="pyarrow"
        )
    )
    return out.select(["event_id", "value"]).sort_by("event_id")


# ---- audio flagship (rows-only; fixture-synthesized) ------------------------
_AUDIO_CACHE: dict[str, str] = {}


def _audio_fixture(n: int = 2000) -> str:
    key = f"n{n}"
    if key not in _AUDIO_CACHE:
        import tempfile

        from ..sources.fixtures import write_fixture

        # 16 shards: read_parquet_tasks parallelism is path-grain, and
        # operator fusion bundles path rows up to the downstream batch_size
        # — with 4 shards every fixture audio query collapsed to ≤4 (often
        # 1) tasks regardless of CPUs (measured via ds.stats: one 5.35 s
        # task). 16 one-row path bundles keep 16-way task parallelism.
        out = os.path.join(tempfile.gettempdir(), f"schemasaurus_audio_{n}_s16")
        if not os.path.exists(os.path.join(out, "clips")):
            write_fixture(out, n=n, shards=16, with_audio=True, inject=True)
        _AUDIO_CACHE[key] = out
    return _AUDIO_CACHE[key]


def validate_audio_clips(sf_dir: str) -> pa.Table:
    """Flagship audio validation on the deterministic synthetic fixture
    (sf_dir ignored — audio is not part of the driver tables). Returns
    violation counts by (column, code); golden counts in FIXTURES.md."""
    import tempfile

    from ..specs import AUDIO_CLIP_SPEC
    from .validate import ValidationPipeline

    fix = _audio_fixture()
    import ray.data as rd

    out_dir = tempfile.mkdtemp(prefix="schemasaurus_val_")
    pipe = ValidationPipeline(AUDIO_CLIP_SPEC, out_dir)
    pipe.run(
        os.path.join(fix, "clips"),
        ref_datasets={"transcripts": rd.read_parquet(os.path.join(fix, "transcripts"))},
        resume=False,
    )
    import glob

    import pyarrow.parquet as pq

    tables = [
        pq.read_table(f, columns=["column", "code"])
        for f in glob.glob(os.path.join(out_dir, "violations", "**", "*.parquet"), recursive=True)
    ]
    allv = pa.concat_tables([t for t in tables if t.num_rows] or [pa.table({"column": pa.array([], pa.string()), "code": pa.array([], pa.string())})])
    agg = allv.group_by(["column", "code"]).aggregate([([], "count_all")])
    return agg.rename_columns(["column", "code", "cnt"]).sort_by([("column", "ascending"), ("code", "ascending")])


def audio_dedup_clips(sf_dir: str) -> pa.Table:
    """EXACT payload dedup over the audio clip table: 64-bit content hash
    of the WAV bytes → min(clip_id) per identical payload — the audio
    analogue of dedup_exact_documents, through the same exact_dedup
    machinery (hash_column handles binary via the ahash path; the blob
    itself never enters the shuffle). Duplicates are PLANTED in-stream
    (every clip whose id ends in '7' gains a 'zdup_' copy — the planted-id
    pattern the embedding near-dup oracle uses), so the golden is exact:
    removed ids == the planted ones. Returns the removed duplicate ids."""
    import glob as glob_

    import ray

    from ..functions.dedup import exact_dedup_dup_groups
    from ..sources.io import read_parquet_tasks
    from ..util import hash_column

    fix = _audio_fixture()
    ds = read_parquet_tasks(
        sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))),
        columns=["clip_id", "bytes"],
    )

    def plant(batch: pa.Table) -> pa.Table:
        ends7 = pc.ends_with(batch.column("clip_id").combine_chunks(), pattern="7")
        dups = batch.filter(ends7)
        dup_ids = pc.binary_join_element_wise(
            pa.array(["zdup_"] * dups.num_rows, pa.string()),
            dups.column("clip_id").combine_chunks().cast(pa.string()),
            "",
        )
        dups = dups.set_column(dups.column_names.index("clip_id"), "clip_id", dup_ids)
        return pa.concat_tables([batch, dups]).combine_chunks()

    planted = ds.map_batches(plant, batch_format="pyarrow")
    # DROPPED-set shape (VERDICT r3 #2): the groupby-min shuffle emits only
    # duplicate payload groups (h, min_id); the driver/broadcast product is
    # O(duplicates), never the O(corpus) survivor set. min(clip_id) per
    # payload keeps the original ('zdup_' sorts after it), so removed =
    # members of duplicate groups whose id is not the group min, found by a
    # second streaming pass that re-hashes bytes batch-local.
    dup = _collect(exact_dedup_dup_groups(planted, text_col="bytes", id_col="clip_id"))
    if dup.num_rows == 0:
        return pa.table({"removed_id": pa.array([], pa.string())})
    dup_h = np.asarray(dup.column("h").combine_chunks(), dtype=np.int64)
    order = np.argsort(dup_h)
    min_idh = hash_column(dup.column("min_id").combine_chunks()).view(np.int64)
    dup_ref = ray.put((dup_h[order], min_idh[order]))

    def removed_ids(batch: pa.Table) -> pa.Table:
        d_h, d_min = ray.get(dup_ref)
        h = hash_column(batch.column("bytes").combine_chunks()).view(np.int64)
        pos = np.searchsorted(d_h, h).clip(max=len(d_h) - 1)
        idh = hash_column(batch.column("clip_id").combine_chunks()).view(np.int64)
        m = (d_h[pos] == h) & (idh != d_min[pos])
        return pa.table(
            {"removed_id": batch.column("clip_id").filter(pa.array(m)).cast(pa.string())}
        )

    out = _collect(planted.map_batches(removed_ids, batch_format="pyarrow"))
    return out.sort_by("removed_id")


def _planted_neardup_clips_ds(fix: str):
    """The shared planted-duplicate clip stream of audio_neardup_clips and
    audio_neardup_incremental_clips: well-formed clips plus a gain-halved
    copy (key+1e9) of every key ≡ 3 (mod 10) and a 0.15 %-noise copy
    (key+2e9, ≈56 dB SNR) of every key ≡ 9 (mod 10)."""
    import glob as glob_

    from ..audio import wav_decode, wav_encode
    from ..sources.io import read_parquet_tasks

    ds = read_parquet_tasks(
        sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))),
        columns=["clip_id", "bytes"],
    )

    def plant(batch: pa.Table) -> pa.Table:
        # the fixture injects spec-violating rows (bad ids, null ids) —
        # near-dup runs over the well-formed clips only
        ids = batch.column("clip_id").combine_chunks()
        ok = pc.fill_null(pc.match_substring_regex(ids, r"^clip-[0-9]{10}$"), False)
        batch = batch.filter(ok)
        key = pc.cast(
            pc.utf8_slice_codeunits(batch.column("clip_id").combine_chunks(), -10, None),
            pa.int64(),
        )
        base = pa.table({"clip_key": key, "bytes": batch.column("bytes")})
        k = np.asarray(key)
        blobs = batch.column("bytes").combine_chunks()
        out = [base]
        # fixture augmentation only — O(planted) Python, not a corpus path
        for mod, offset, mk in ((3, 10**9, "gain"), (9, 2 * 10**9, "noise")):
            idx = np.nonzero((k % 10) == mod)[0]
            copies = []
            for i in idx:
                x, sr = wav_decode(blobs[int(i)].as_py())
                if mk == "gain":
                    y = (x.astype(np.int32) // 2).astype(np.int16)
                else:
                    rng = np.random.Generator(np.random.PCG64(7000 + int(k[i])))
                    y = np.clip(
                        x.astype(np.float64) + 0.0015 * 32767 * rng.standard_normal(len(x)),
                        -32768,
                        32767,
                    ).astype(np.int16)
                copies.append(wav_encode(y, sr))
            out.append(
                pa.table(
                    {
                        "clip_key": pa.array(k[idx] + offset, pa.int64()),
                        "bytes": pa.array(copies, pa.binary()),
                    }
                )
            )
        return pa.concat_tables(out).combine_chunks()

    return ds.map_batches(plant, batch_format="pyarrow")


def audio_neardup_clips(sf_dir: str) -> pa.Table:
    """PERCEPTUAL near-duplicate clips (functions/audio_fp.py): gain- and
    requantization-invariant envelope fingerprints → banded-hamming LSH →
    exact-hamming verify, the audio-axis sibling of
    simhash_neardup_documents. Duplicates are PLANTED in-stream so the
    golden is exact: clips with numeric key ≡ 3 (mod 10) gain a
    gain-halved copy (key + 1e9), keys ≡ 9 (mod 10) a 0.15 %-noise copy
    (key + 2e9, ≈56 dB SNR). Expected pairs == the planted (base, copy)
    set: copies land within hamming ≤ 3 (pigeonhole-exact recall) and
    distinct clips sit ≥ 14 bits apart, so organic band collisions die in
    the verify. Returns (id_a, id_b, hamming)."""
    from ..functions.audio_fp import audio_near_dups

    planted = _planted_neardup_clips_ds(_audio_fixture())
    return audio_near_dups(planted, key_col="clip_key", max_hamming=3)


def audio_neardup_incremental_clips(sf_dir: str) -> pa.Table:
    """INCREMENTAL perceptual near-dup — the audio-axis sibling of
    neardup_incremental_documents: the base clips (key < 1e9) are the
    indexed snapshot, the planted copies the incoming drop. The snapshot's
    banded 64-bit fingerprints persist ONCE (dedup.banded_index_build —
    and because the SIGNATURE rides in the index rows, the probe verifies
    exact hamming without re-reading or re-fingerprinting ANY old audio
    byte); each ingest fingerprints only the incoming clips and probes
    only the touched bucket dirs (dedup.banded_probe_pairs). Output =
    verified pairs touching the drop — exactly the planted (base, copy)
    golden of audio_neardup_clips. Rows-only (bit signatures are not
    SQL-expressible); golden + full-run parity + io pruning in pytest."""
    import functools
    import hashlib

    from ..functions.audio_fp import AudioFingerprintStage
    from ..functions.dedup import banded_index_build, banded_probe_pairs
    from ..util import cached_stage

    fix = _audio_fixture()

    def side(batch: pa.Table, *, new: bool) -> pa.Table:
        m = pc.greater_equal(batch.column("clip_key"), 10**9)
        return batch.filter(m if new else pc.invert(m))

    def side_sigs_ds(new: bool):
        # filter on clip_key BEFORE fingerprinting: each leg decodes only
        # its own clips' audio (the warm probe fingerprints the DROP only —
        # the incremental contract; the key split is fixture mechanics, a
        # real pipeline gets snapshot and drop as separate inputs)
        return (
            _planted_neardup_clips_ds(fix)
            .map_batches(
                functools.partial(side, new=new),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .map_batches(
                cached_stage(AudioFingerprintStage, key_col="clip_key", bytes_col="bytes"),
                batch_format="pyarrow",
            )
        )

    # snapshot signatures STREAM into the one-time build; only the drop's
    # signatures are driver-collected — O(ingest)
    idx = os.path.join(
        "/tmp/schemasaurus_ray/banded_index",
        hashlib.md5(
            f"{os.path.abspath(fix)}|{_src_stat_key(os.path.join(fix, 'clips'))}|n64".encode()
        ).hexdigest()[:12],
    )
    banded_index_build(side_sigs_ds(new=False), idx, id_col="clip_key")
    new = _collect(side_sigs_ds(new=True))
    out = banded_probe_pairs(idx, new, id_col="clip_key", max_hamming=3)
    has_new = pc.or_(
        pc.greater_equal(out.column("id_a"), 10**9),
        pc.greater_equal(out.column("id_b"), 10**9),
    )
    return out.filter(has_new).sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def audio_repeated_segments_clips(sf_dir: str) -> pa.Table:
    """Repeated-PCM-SEGMENT audit — the audio analogue of
    dup_passages_documents (axes A+B): per clip, the count of 1024-sample
    non-overlapping PCM segments whose exact int16 content also appears in
    a DIFFERENT clip (shared jingles / silence boilerplate / spliced
    copies that whole-clip dedup misses). Segment hashes ride the same
    generic shared-window shuffle as the text operator
    (functions/text.shared_window_counts); audio bytes never leave the map
    tasks, and only the O(shared segments) counts reach the driver.
    Cross-clip sharing is PLANTED in-stream (ids ending '7' gain a
    'zseg_' whole-payload copy — the zdup pattern) so the golden is
    exact: each planted pair reports floor(samples/1024) shared segments
    on both sides. Rows-only (the audio fixture is not a driver view);
    the segment-level (partial-overlap) semantics are pinned by the
    constructed-WAV brute-force test."""
    import glob as glob_

    from ..functions.audio_fp import pcm_segment_hash_rows
    from ..functions.text import preagg_window_rows, shared_window_counts
    from ..sources.io import read_parquet_tasks
    from ..util import hash_column

    fix = _audio_fixture()
    paths = sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet")))
    ds = read_parquet_tasks(paths, columns=["clip_id", "bytes"])

    def plant(batch: pa.Table) -> pa.Table:
        ends7 = pc.ends_with(batch.column("clip_id").combine_chunks(), pattern="7")
        dups = batch.filter(ends7)
        dup_ids = pc.binary_join_element_wise(
            pa.array(["zseg_"] * dups.num_rows, pa.string()),
            dups.column("clip_id").combine_chunks().cast(pa.string()),
            "",
        )
        dups = dups.set_column(dups.column_names.index("clip_id"), "clip_id", dup_ids)
        return pa.concat_tables([batch, dups]).combine_chunks()

    def stage(batch: pa.Table) -> pa.Table:
        batch = plant(batch)
        keys = hash_column(batch.column("clip_id").combine_chunks()).view(np.int64)
        wh, ck = pcm_segment_hash_rows(batch.column("bytes"), keys, seg_samples=1024)
        return preagg_window_rows(wh, ck)

    counts = shared_window_counts(
        ds.map_batches(stage, batch_format="pyarrow"), id_col="clip_key"
    )
    if counts.num_rows == 0:
        return pa.table(
            {
                "clip_id": pa.array([], pa.string()),
                "n_dup_segments": pa.array([], pa.int64()),
            }
        )
    meta = _collect(read_parquet_tasks(paths, columns=["clip_id"]))
    ids = meta.column("clip_id").combine_chunks().cast(pa.string())
    planted_ids = pc.binary_join_element_wise(
        pa.array(["zseg_"] * len(ids), pa.string()), ids, ""
    ).filter(pc.ends_with(ids, pattern="7"))
    ids = pa.concat_arrays([ids, planted_ids])
    mk = hash_column(ids).view(np.int64)
    order = np.argsort(mk, kind="stable")
    ck = np.asarray(counts.column("clip_key").combine_chunks(), dtype=np.int64)
    pos = np.searchsorted(mk[order], ck)
    out = pa.table(
        {
            "clip_id": ids.take(pa.array(order[pos])),
            "n_dup_segments": counts.column("n_dup_windows"),
        }
    )
    return out.sort_by("clip_id")


def audio_decontaminate_segments_clips(sf_dir: str) -> pa.Table:
    """Audio segment-level DECONTAMINATION — the axis-B mirror of
    decontaminate_passages_documents: per TRAINING clip, the count of its
    1024-sample PCM segments whose exact int16 content appears in the
    evaluation set (benchmark = well-formed clip ids ending '3'). Leakage
    is PLANTED in-stream ('zdec_' whole-payload copies of benchmark clips
    under training ids — the zdup pattern) so the golden is exact: each
    copy reports floor(decodable_samples/1024) leaked segments and the
    fixture has no organic cross-clip segment sharing.

    Scale shape: ONE pass collects the benchmark's segment hashes (8 B per
    eval segment — the eval set is the small side by definition),
    broadcast sorted once; a second streaming pass counts matching
    segments per training clip via sorted_lookup. Zero shuffles; audio
    bytes never leave the map tasks; counts map back to clip ids
    BATCH-LOCALLY (row-index keys), no global key table. Rows-only (the
    audio fixture is not a driver view); independent per-clip wav_decode
    golden in tests/test_audio_fp.py."""
    import glob as glob_

    import ray

    from ..functions.audio_fp import pcm_segment_hash_rows
    from ..sources.io import read_parquet_tasks
    from ..util import sorted_lookup

    fix = _audio_fixture()
    paths = sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet")))

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("clip_id").combine_chunks()
        is_b = pc.and_(
            pc.fill_null(pc.ends_with(ids, pattern="3"), False),
            pc.fill_null(pc.match_substring_regex(ids, r"^clip-"), False),
        )
        dups = batch.filter(is_b)
        dup_ids = pc.binary_join_element_wise(
            pa.array(["zdec_"] * dups.num_rows, pa.string()),
            dups.column("clip_id").combine_chunks().cast(pa.string()),
            "",
        )
        dups = dups.set_column(dups.column_names.index("clip_id"), "clip_id", dup_ids)
        return pa.concat_tables([batch, dups]).combine_chunks()

    def _is_bench(ids) -> pa.Array:
        return pc.and_(
            pc.fill_null(pc.ends_with(ids, pattern="3"), False),
            pc.fill_null(pc.match_substring_regex(ids, r"^clip-"), False),
        )

    ds = read_parquet_tasks(paths, columns=["clip_id", "bytes"])

    def bench_segments(batch: pa.Table) -> pa.Table:
        sub = batch.filter(_is_bench(batch.column("clip_id").combine_chunks()))
        wh, _ck = pcm_segment_hash_rows(
            sub.column("bytes"), np.zeros(sub.num_rows, dtype=np.int64), seg_samples=1024
        )
        return pa.table({"wh": pa.array(np.unique(wh), pa.int64())})

    hs = [np.zeros(0, dtype=np.int64)]
    for b in ds.map_batches(bench_segments, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        hs.append(np.asarray(b.column("wh").combine_chunks(), dtype=np.int64))
    bench_ref = ray.put(np.unique(np.concatenate(hs)))
    empty = pa.table(
        {"clip_id": pa.array([], pa.string()), "n_leaked_segments": pa.array([], pa.int64())}
    )

    def count_leaks(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        batch = plant(batch)
        ids = batch.column("clip_id").combine_chunks()
        train = batch.filter(pc.invert(_is_bench(ids)))
        if train.num_rows == 0:
            return empty
        # batch-local row indices as keys: segments never cross batches
        wh, rows = pcm_segment_hash_rows(
            train.column("bytes"),
            np.arange(train.num_rows, dtype=np.int64),
            seg_samples=1024,
        )
        if not len(wh):
            return empty
        _pos, found = sorted_lookup(bench, wh)
        if not found.any():
            return empty
        u, c = np.unique(rows[found], return_counts=True)
        return pa.table(
            {
                "clip_id": train.column("clip_id").combine_chunks().cast(pa.string()).take(
                    pa.array(u, pa.int64())
                ),
                "n_leaked_segments": pa.array(c, pa.int64()),
            }
        )

    return _collect(ds.map_batches(count_leaks, batch_format="pyarrow")).sort_by("clip_id")


def audio_curate_clips(sf_dir: str) -> pa.Table:
    """End-to-end AUDIO curation — the audio-axis sibling of
    curate_documents: the exact payload-dedup groupby-min shuffle (the
    only shuffle) emits only DUPLICATE payload groups (h, min_id),
    broadcast once via ``ray.put`` — O(duplicates), not O(corpus)
    (VERDICT r3 #2) — then ONE streaming map_batches pass re-hashes bytes
    batch-local for the dedup mask and applies the spec window (sr_hz
    enum, dur_ms bounds from AUDIO_CLIP_SPEC — predicates derive from the
    spec, not re-typed constants) + signal-quality floor (decodable, not
    silent, clipping ≤ 5%) computed batch-local from the PCM. Returns the
    kept (clip_id, sr_hz, dur_ms); blobs never leave the tasks."""
    import glob as glob_

    import ray

    from ..audio import pcm_segment_stats
    from ..functions.dedup import exact_dedup_dup_groups_paths
    from ..sources.io import read_parquet_tasks
    from ..specs import AUDIO_CLIP_SPEC
    from ..util import hash_column

    fix = _audio_fixture()
    paths = sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet")))
    meta_cols = ["clip_id", "sr_hz", "dur_ms"]

    dup = exact_dedup_dup_groups_paths(
        paths, text_col="bytes", id_col="clip_id", id_type=pa.large_string()
    )
    if dup.num_rows:
        dup_h = np.asarray(dup.column("h").combine_chunks(), dtype=np.int64)
        order = np.argsort(dup_h)
        min_idh = hash_column(dup.column("min_id").combine_chunks()).view(np.int64)
        dup_ref = ray.put((dup_h[order], min_idh[order]))
    else:
        dup_ref = ray.put((np.zeros(0, np.int64), np.zeros(0, np.int64)))

    sr_rule = AUDIO_CLIP_SPEC["columns"]["sr_hz"]
    dur_rule = AUDIO_CLIP_SPEC["columns"]["dur_ms"]
    sr_enum = np.array(sr_rule["enum"], dtype=np.int64)
    dur_lo, dur_hi = dur_rule["minimum"], dur_rule["maximum"]

    def curate(batch: pa.Table) -> pa.Table:
        d_h, d_min = ray.get(dup_ref)  # zero-copy shared read
        if len(d_h):
            h = hash_column(batch.column("bytes").combine_chunks()).view(np.int64)
            pos = np.searchsorted(d_h, h).clip(max=len(d_h) - 1)
            idh = hash_column(batch.column("clip_id").combine_chunks()).view(np.int64)
            surviving = ~((d_h[pos] == h) & (idh != d_min[pos]))
        else:
            surviving = np.ones(batch.num_rows, bool)
        sr = np.asarray(batch.column("sr_hz").combine_chunks(), dtype=np.int64)
        dur = np.asarray(batch.column("dur_ms").combine_chunks(), dtype=np.int64)
        window = np.isin(sr, sr_enum) & (dur > dur_lo) & (dur <= dur_hi)
        st = pcm_segment_stats(batch.column("bytes"))
        quality = st["valid"] & (st["rms"] >= 1e-3) & (st["clip_ratio"] <= 0.05)
        keep = surviving & window & quality
        return batch.select(meta_cols).filter(pa.array(keep))

    ds = read_parquet_tasks(paths, columns=meta_cols + ["bytes"])
    out = _collect(ds.map_batches(curate, batch_format="pyarrow"))
    return out.sort_by("clip_id")


def audio_features(sf_dir: str) -> pa.Table:
    """Actor-pool audio decode + feature extraction over the fixture."""
    import ray.data as rd

    from ..functions.multimodal import AudioFeatureStage

    fix = _audio_fixture()
    # Ray's parquet scanner burns CPU on binary columns (CLAUDE.md quirk) —
    # the clip payload must go through the task-based reader
    import glob as glob_

    from ..sources.io import read_parquet_tasks

    ds = read_parquet_tasks(sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))))
    out = ds.map_batches(
        AudioFeatureStage(), batch_format="pyarrow"
    )
    tbl = _collect(out)
    # undecodable clips (truncated bytes in the fixture) yield NaN features →
    # keep them as nulls, not a cast crash
    rms = np.asarray(tbl.column("rms").combine_chunks(), dtype=np.float64)
    ms = np.asarray(tbl.column("measured_ms").combine_chunks(), dtype=np.float64)

    def int_or_null(vals: np.ndarray) -> pa.Array:
        mask = np.isnan(vals)
        return pa.array(np.where(mask, 0, vals).astype(np.int64), pa.int64(), mask=mask)

    return pa.table(
        {
            "clip_id": tbl.column("clip_id"),
            "rms_bp": int_or_null(np.floor(rms * 10000.0)),
            "measured_ms": int_or_null(ms),
        }
    ).sort_by("clip_id")


def audio_quality_clips(sf_dir: str) -> pa.Table:
    """Audio quality validation over the clip fixture: decodability,
    clipping ratio, DC offset, silence flag — actor-pool AudioQualityStage
    (vectorized pcm_segment_stats core, no per-row decode loop). The audio
    analogue of quality_documents; returns per-quality-signal counts so the
    result is a compact verdict table."""
    import ray.data as rd

    from ..functions.multimodal import AudioQualityStage

    fix = _audio_fixture()
    import glob as glob_

    from ..sources.io import read_parquet_tasks

    ds = read_parquet_tasks(sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))))
    out = ds.map_batches(
        AudioQualityStage(), batch_format="pyarrow"
    )
    tbl = _collect(out)
    dec = np.asarray(tbl.column("decodable").combine_chunks(), dtype=bool)
    sil = np.asarray(tbl.column("silence").combine_chunks(), dtype=bool)
    clip_bp = tbl.column("clip_bp").combine_chunks()
    clipped = pc.sum(pc.and_(pc.is_valid(clip_bp), pc.greater(clip_bp, 0))).as_py() or 0
    return pa.table(
        {
            "n_clips": pa.array([len(dec)], pa.int64()),
            "n_undecodable": pa.array([int((~dec).sum())], pa.int64()),
            "n_silent": pa.array([int(sil.sum())], pa.int64()),
            "n_clipped": pa.array([int(clipped)], pa.int64()),
        }
    )


EVENTS_SPEC: dict = {
    "columns": {
        "event_id": {"type": "integer", "required": True, "minimum": 0},
        "event_type": {
            "type": "string",
            "required": True,
            "enum": ["click", "signup", "error", "view", "purchase"],
        },
        # deliberately strict bound → non-empty violations
        "value": {"type": "number", "minimum": 0, "maximum": 100},
        # dynamically-typed JSON column: per-row RowValidator fallback (the
        # reference's runtime-typed semantics preserved, SURVEY.md §1.2)
        "props": {
            "mode": "json",
            "schema": {"type": "object", "properties": {"k": {"type": "integer", "maximum": 50}}},
        },
    },
    "table": {"key": "event_id"},
}


def validate_events(sf_dir: str) -> pa.Table:
    cols = list(EVENTS_SPEC["columns"].keys())
    return _violations(_read(sf_dir, "events", cols), EVENTS_SPEC)


EMBEDDINGS_SPEC: dict = {
    "columns": {
        "vec_id": {"type": "integer", "required": True, "minimum": 0},
        "embedding": {"type": "array", "required": True, "minItems": 64, "maxItems": 64},
        # deliberately strict: label 9 violates → non-empty oracle output
        "label": {"type": "integer", "required": True, "minimum": 0, "maximum": 8},
    },
    "table": {"key": "vec_id"},
}


def validate_embeddings(sf_dir: str) -> pa.Table:
    """List-column kernels (minItems/maxItems via pc.list_value_length) +
    ranges on the embeddings table."""
    cols = list(EMBEDDINGS_SPEC["columns"].keys())
    return _violations(_read(sf_dir, "embeddings", cols), EMBEDDINGS_SPEC)


# ---- windowed aggregate (engine-native; ray_guide streaming-shaped) --------
def windowed_events(sf_dir: str) -> pa.Table:
    """Tumbling 1-hour windows over the events stream: (window_start,
    event_type, cnt, sum_v). Implemented as a vectorized per-batch partial
    (floor ts to the hour, group within batch) + a small groupby over
    partials — the pre-aggregate-then-shuffle shape."""
    ds = _events_with_ts(sf_dir, ["ts", "event_type", "value"])

    def to_window(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch.column("ts"), unit="hour")
        # exact integer cents so the distributed sum is associative and
        # matches the oracle bit-for-bit (double sums are order-dependent)
        cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)), pa.int64())
        t = pa.table(
            {
                "window_start": win,
                "event_type": batch.column("event_type"),
                "cents": cents,
            }
        )
        g = t.group_by(["window_start", "event_type"]).aggregate(
            [([], "count_all"), ("cents", "sum")]
        )
        return g.rename_columns(["window_start", "event_type", "cnt", "sum_cents"])

    # driver-side final combine over the tiny per-batch partials: Ray
    # Data's sort-based groupby raises comparing a NULL event_type (the
    # stress sweep's TypeError) and is the slow path on string keys anyway
    from ..stages.shuffle import group_agg_fixed_first

    parts = _collect(ds.map_batches(to_window, batch_format="pyarrow"))
    out = group_agg_fixed_first(
        parts, ["window_start", "event_type"], [("cnt", "sum"), ("sum_cents", "sum")]
    ).rename_columns(["window_start", "event_type", "cnt", "sum_cents"])
    return out.sort_by(
        [("window_start", "ascending"), ("event_type", "ascending")]
    )


def window_unique_users_events(sf_dir: str) -> pa.Table:
    """EXACT distinct users per tumbling 1-hour window — the DAU/WAU
    streaming-analytics op, which plain pre-aggregation cannot express
    (distinct is not a sum of per-batch distincts). Shape: per-block
    (window, user) DISTINCT partials hash-bucketed BY USER, per-bucket
    global distinct + per-window count, driver sum of the tiny (window,
    cnt) bucket rows — exact because a (window, user) pair lands wholly
    in one bucket (the df_topk_terms_documents guarantee). The approx
    twin is distinct_users_by_type_approx's HLL path; this is the exact
    path for when the audit demands it. Oracle: count(DISTINCT user_id)
    GROUP BY date_trunc hour."""
    import ray

    from ..stages.shuffle import _default_buckets, _split_buckets, _tree_combine

    ds = _events_with_ts(sf_dir, ["ts", "user_id"])
    block_refs = arrow_block_refs(ds)
    # cluster-derived fan-out (16 × nodes cap): the per-bucket distinct
    # table is O(|distinct pairs| / buckets) — the bucket count must grow
    # with the cluster, not sit at a single-box constant
    num_buckets = _default_buckets(len(block_refs))

    @ray.remote(num_returns=num_buckets)
    def map_pairs(tbl: pa.Table):
        win = pc.floor_temporal(tbl.column("ts").combine_chunks(), unit="hour")
        pairs = (
            pa.table({"w": win, "user_id": tbl.column("user_id")})
            .group_by(["w", "user_id"])
            .aggregate([])  # block-local DISTINCT (window, user)
        )
        out = _split_buckets(pairs, ["user_id"], num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote
    def reduce_count(*tables: pa.Table) -> pa.Table:
        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            return pa.table(
                {"w": pa.array([], pa.timestamp("us")), "cnt": pa.array([], pa.int64())}
            )
        distinct = pa.concat_tables(nonempty).group_by(["w", "user_id"]).aggregate([])
        g = distinct.group_by(["w"]).aggregate([([], "count_all")])
        return g.rename_columns(["w", "cnt"])

    @ray.remote
    def combine(*tables: pa.Table) -> pa.Table:
        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            return tables[0]
        return pa.concat_tables(nonempty).group_by(["w", "user_id"]).aggregate([])

    refs = [map_pairs.remote(r) for r in block_refs]
    if num_buckets == 1:
        refs = [[r] for r in refs]
    reduced = []
    for b in range(num_buckets):
        c = _tree_combine([refs[m][b] for m in range(len(refs))], combine)
        reduced.append(reduce_count.remote(*c))
    parts = [t for t in ray.get(reduced) if t.num_rows]
    if not parts:
        return pa.table(
            {"window_start": pa.array([], pa.timestamp("us")), "n_users": pa.array([], pa.int64())}
        )
    out = pa.concat_tables(parts).group_by(["w"]).aggregate([("cnt", "sum")])
    return pa.table(
        {
            "window_start": out.column("w"),
            "n_users": out.column("cnt_sum").cast(pa.int64()),
        }
    ).sort_by("window_start")


def drift_psi_events(sf_dir: str) -> pa.Table:
    """PSI of the event_type distribution, second half of the stream vs
    first half (by event_id median) — the drift operator with a SQL oracle.
    Returns one row (psi_bp: PSI in basis points, floored)."""
    import pyarrow.parquet as pq_

    from ..stages.shuffle import agg_keys_shuffled
    from ..state.tdigest import psi

    # split point from parquet metadata (no Ray count() job), counts via
    # the raw bucket shuffle — Ray Data's sort-based groupby on a string
    # key is the measured-slow path and emits schema-divergent blocks
    path = os.path.join(sf_dir, "events.parquet")
    half = pq_.read_metadata(path).num_rows // 2

    def tf(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": tbl.column("event_type"),
                "is_new": pc.cast(
                    pc.greater_equal(tbl.column("event_id"), half), pa.int64()
                ),
            }
        )

    agg = agg_keys_shuffled(
        [path],
        ["event_type", "is_new"],
        [("event_type", "count")],
        transform_fn=tf,
        read_cols=["event_id", "event_type"],
    )
    expected: dict[str, float] = {}
    actual: dict[str, float] = {}
    for et, is_new, cnt in zip(
        agg.column("event_type").to_pylist(),
        agg.column("is_new").to_pylist(),
        agg.column("cnt").to_pylist(),
    ):
        (actual if is_new else expected)[et] = float(cnt)
    value = psi(expected, actual)
    import math

    return pa.table({"psi_bp": pa.array([int(math.floor(value * 10000))], pa.int64())})


def drift_ks_events(sf_dir: str) -> pa.Table:
    """EXACT two-sample Kolmogorov–Smirnov statistic on the `value`
    distribution, second half of the stream vs first half (same
    metadata-derived split as drift_psi_events) — the numeric-drift twin
    of the categorical PSI check, and the exact counterpart of the
    t-digest KS in the snapshot path (stages/drift.py). All-integer after
    the counts: KS = max over distinct values of |F̂₁−F̂₂|, evaluated
    multiply-first as |cum1·n2 − cum2·n1| with ONE floor division at the
    end (ks_bp = ⌊10000·max/(n1·n2)⌋), so the oracle's BIGINT window sums
    match bit-for-bit — no float CDFs anywhere. One (value, is_new)
    count-table shuffle; the driver sorts the O(distinct values) count
    table and runs two cumsums. Nulls are excluded from both samples (a
    null has no place on a CDF); the domain note of the grouped-quantile
    router applies — near-unique doubles make the count table O(rows),
    which is fine at audit scales and loud at 10¹² (route through the
    t-digest snapshot path instead)."""
    import pyarrow.parquet as pq_

    from ..stages.shuffle import agg_keys_shuffled

    path = os.path.join(sf_dir, "events.parquet")
    half = pq_.read_metadata(path).num_rows // 2

    def tf(tbl: pa.Table) -> pa.Table:
        keep = pc.is_valid(tbl.column("value"))
        tbl = tbl.filter(keep)
        return pa.table(
            {
                "value": tbl.column("value"),
                "is_new": pc.cast(
                    pc.greater_equal(tbl.column("event_id"), half), pa.int64()
                ),
            }
        )

    agg = agg_keys_shuffled(
        [path],
        ["value", "is_new"],
        [("value", "count")],
        transform_fn=tf,
        read_cols=["event_id", "value"],
    )
    if agg.num_rows == 0:
        return pa.table({"ks_bp": pa.array([0], pa.int64())})
    v = np.asarray(agg.column("value").to_numpy(zero_copy_only=False), dtype=np.float64)
    is_new = np.asarray(agg.column("is_new").to_numpy(zero_copy_only=False), dtype=np.int64)
    cnt = np.asarray(agg.column("cnt").to_numpy(zero_copy_only=False), dtype=np.int64)
    order = np.argsort(v, kind="stable")
    v, is_new, cnt = v[order], is_new[order], cnt[order]
    c1 = np.where(is_new == 0, cnt, 0)
    c2 = np.where(is_new == 1, cnt, 0)
    # collapse duplicate values ((v, 0) and (v, 1) rows are adjacent after
    # the sort) — the CDF steps once per DISTINCT value
    boundary = np.ones(len(v), dtype=bool)
    boundary[1:] = v[1:] != v[:-1]
    seg = np.cumsum(boundary) - 1
    c1 = np.bincount(seg, weights=c1).astype(np.int64)
    c2 = np.bincount(seg, weights=c2).astype(np.int64)
    n1, n2 = int(c1.sum()), int(c2.sum())
    if n1 == 0 or n2 == 0:
        return pa.table({"ks_bp": pa.array([0], pa.int64())})
    f1 = np.cumsum(c1)
    f2 = np.cumsum(c2)
    d = int(np.max(np.abs(f1 * n2 - f2 * n1)))
    return pa.table({"ks_bp": pa.array([(10000 * d) // (n1 * n2)], pa.int64())})


def drift_partition_verdicts(sf_dir: str) -> pa.Table:
    """PER-PARTITION drift verdicts (the north rule's 'flag drift per
    partition'): each partition's event_type distribution PSI'd against
    the GLOBAL distribution, pass/fail at 250 bp. One scan: per-batch
    (pid, event_type, cnt) partials → tiny groupby (partitions × types
    rows); the global histogram is the partition sum — no second pass."""
    import math

    from ..state.tdigest import psi

    n_parts = 8
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def part(batch: pa.Table) -> pa.Table:
        pid = pc.bit_wise_and(batch.column("user_id"), n_parts - 1)  # user_id % 8
        t = pa.table({"pid": pid, "event_type": batch.column("event_type")})
        g = t.group_by(["pid", "event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["pid", "event_type", "cnt"])

    # driver-side final combine (tiny partials; Ray Data's sort-based
    # groupby raises on NULL event_type — stress-sweep TypeError)
    from ..stages.shuffle import group_agg_fixed_first

    agg = group_agg_fixed_first(
        _collect(ds.map_batches(part, batch_format="pyarrow")),
        ["pid", "event_type"],
        [("cnt", "sum")],
    ).rename_columns(["pid", "event_type", "cnt"])
    per_pid: dict[int, dict[str, float]] = {}
    glob: dict[str, float] = {}
    for pid, et, cnt in zip(
        agg.column("pid").to_pylist(),
        agg.column("event_type").to_pylist(),
        agg.column("cnt").to_pylist(),
    ):
        per_pid.setdefault(int(pid), {})[et] = float(cnt)
        glob[et] = glob.get(et, 0.0) + float(cnt)
    pids = sorted(per_pid)
    bps = [int(math.floor(psi(glob, per_pid[p]) * 10000)) for p in pids]
    return pa.table(
        {
            "pid": pa.array(pids, pa.int64()),
            "psi_bp": pa.array(bps, pa.int64()),
            "verdict": pa.array(["fail" if b >= 250 else "pass" for b in bps], pa.string()),
        }
    )


def dedup_incremental_documents(sf_dir: str) -> pa.Table:
    """Incremental (snapshot) dedup: odd-doc_id documents are the incoming
    crawl drop, even-doc_id documents the existing corpus snapshot; keep
    incoming ids whose text is NOT in the snapshot. Only (hash, id) pairs
    shuffle — the ingest-side anti-join of a continuously-fed corpus."""
    from ..functions.dedup import incremental_dedup_shuffled

    def parity(batch: pa.Table, *, odd: bool) -> pa.Table:
        ids = batch.column("doc_id")
        is_odd = pc.equal(pc.bit_wise_and(ids, 1), 1)
        return batch.filter(is_odd if odd else pc.invert(is_odd))

    import functools

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    incoming = docs.map_batches(
        functools.partial(parity, odd=True), batch_format="pyarrow", zero_copy_batch=True
    )
    snapshot = docs.map_batches(
        functools.partial(parity, odd=False), batch_format="pyarrow", zero_copy_batch=True
    )
    out = incremental_dedup_shuffled(incoming, snapshot)
    return out.sort_by("doc_id")


def _lsh_index_dir(sf_dir: str) -> str:
    import hashlib

    src = _src_stat_key(os.path.join(sf_dir, "documents.parquet"))
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{src}|p64|b16|n64".encode()
    ).hexdigest()[:12]
    return os.path.join("/tmp/schemasaurus_ray/lsh_index", key)


def neardup_incremental_documents(sf_dir: str) -> pa.Table:
    """INCREMENTAL near-dup: even doc_ids are the indexed corpus snapshot,
    odd doc_ids the incoming crawl drop (the split convention of
    dedup_incremental_documents, lifted from exact to NEAR duplicates).
    The snapshot's MinHash band rows persist ONCE in a bucket-partitioned
    layout (dedup.lsh_build_index, idempotent); each ingest signs only the
    incoming docs and probes only the bucket dirs its band keys hash into
    (dedup.lsh_probe_pairs — snapshot rows for untouched band keys never
    even enter the shuffle), so the nightly cost scales with the DROP, not
    the corpus. Candidates expand transitively and verify exactly through
    the shingle-bucket shuffle (the one full-text pass — exact Jaccard
    needs both texts by definition); output keeps pairs with ≥1 incoming
    endpoint. Oracle: exact all-pairs trigram Jaccard ≥ 0.8 restricted to
    pairs with an odd endpoint — same banding-miss budget as
    minhash_neardup_documents (≈1e-4 at j=0.8, ≪1e-15 at the j≥0.9 pairs
    in this data)."""
    from ..functions.dedup import (
        _dedupe_pairs,
        expand_candidate_pairs,
        lsh_build_index,
        lsh_probe_pairs,
        minhash_bkey_rows,
        verify_pairs_shuffled,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def parity(batch: pa.Table, *, odd: bool) -> pa.Table:
        is_odd = pc.equal(pc.bit_wise_and(batch.column("doc_id"), 1), 1)
        return batch.filter(is_odd if odd else pc.invert(is_odd))

    import functools

    snapshot = docs.map_batches(
        functools.partial(parity, odd=False), batch_format="pyarrow", zero_copy_batch=True
    )
    incoming = docs.map_batches(
        functools.partial(parity, odd=True), batch_format="pyarrow", zero_copy_batch=True
    )
    idx = _lsh_index_dir(sf_dir)
    lsh_build_index(snapshot, idx)
    new_keyed = _collect(minhash_bkey_rows(incoming))
    pairs = expand_candidate_pairs(_dedupe_pairs(lsh_probe_pairs(idx, new_keyed)))
    empty = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jacc_bp": pa.array([], pa.int64()),
        }
    )
    if pairs.num_rows == 0:
        return empty
    out = verify_pairs_shuffled(
        [os.path.join(sf_dir, "documents.parquet")], pairs, threshold=0.8
    )
    # transitive expansion can add snapshot-internal pairs for connectivity;
    # the incremental product is pairs touching the incoming drop
    has_new = pc.or_(
        pc.equal(pc.bit_wise_and(out.column("id_a"), 1), 1),
        pc.equal(pc.bit_wise_and(out.column("id_b"), 1), 1),
    )
    out = out.filter(has_new)
    return out.select(["id_a", "id_b", "jacc_bp"]).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


def vocab_topk_documents(sf_dir: str, k: int = 100) -> pa.Table:
    """Corpus vocabulary top-k: the k most frequent whitespace tokens
    (ties broken by token asc). Per-batch vectorized tokenize + local
    count (the combiner), hash-bucket shuffle of (token, cnt) partials,
    per-bucket sum + local top-k — exact, because a token lives wholly in
    one bucket — then a tiny driver re-top-k over B×k candidate rows."""
    import ray

    from ..stages.shuffle import _split_buckets, _tree_combine

    num_buckets = 8
    ds = _read(sf_dir, "documents", ["text"])

    @ray.remote(num_returns=num_buckets)
    def map_tokens(tbl: pa.Table):
        flat = pc.list_flatten(pc.ascii_split_whitespace(tbl.column("text")))
        # drop the '' tokens split padding emits ('a b ' → ['a','b','']) —
        # the \S+ oracle can never produce an empty term (r5 review fix,
        # same as df_topk_terms_documents)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = (
            pa.table({"token": flat})
            .group_by(["token"])
            .aggregate([([], "count_all")])
            .rename_columns(["token", "cnt"])
        )
        out = _split_buckets(g, ["token"], num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote
    def combine(*tables: pa.Table) -> pa.Table:
        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            return tables[0]
        merged = pa.concat_tables(nonempty)
        return (
            merged.group_by(["token"]).aggregate([("cnt", "sum")]).rename_columns(["token", "cnt"])
        )

    @ray.remote
    def reduce_topk(*tables: pa.Table) -> pa.Table:
        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            return pa.table({"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
        g = (
            pa.concat_tables(nonempty)
            .group_by(["token"])
            .aggregate([("cnt", "sum")])
            .rename_columns(["token", "cnt"])
        )
        top = g.sort_by([("cnt", "descending"), ("token", "ascending")])
        return top.slice(0, k)

    refs = [map_tokens.remote(r) for r in arrow_block_refs(ds)]
    if num_buckets == 1:
        refs = [[r] for r in refs]
    reduced = []
    for b in range(num_buckets):
        c = _tree_combine([refs[m][b] for m in range(len(refs))], combine)
        reduced.append(reduce_topk.remote(*c))
    parts = [t for t in ray.get(reduced) if t.num_rows]
    if not parts:  # zero blocks / all-empty corpus
        return pa.table({"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
    cand = pa.concat_tables(parts)
    return cand.sort_by([("cnt", "descending"), ("token", "ascending")]).slice(0, k)


def enrich_events_customer(sf_dir: str) -> pa.Table:
    """Broadcast-join enrichment: events joined to the small customer
    dimension (user_id → c_mktsegment) with the dimension ``ray.put`` ONCE
    as sorted key + code arrays (never re-shipped per batch), lookup via
    searchsorted inside map_batches, per-batch count partials (combiner),
    tiny final groupby — the dimension-join shape that avoids an
    all-to-all shuffle entirely."""
    import pyarrow.parquet as pq_
    import ray

    cust = pq_.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    keys = np.asarray(cust.column("c_custkey").combine_chunks(), dtype=np.int64)
    seg_dict = cust.column("c_mktsegment").combine_chunks().dictionary_encode()
    codes = np.asarray(seg_dict.indices, dtype=np.int64)
    segments = seg_dict.dictionary.to_pylist()
    order = np.argsort(keys)
    dim_ref = ray.put((keys[order], codes[order]))

    def lookup_count(batch: pa.Table) -> pa.Table:
        skeys, scodes = ray.get(dim_ref)
        uid = np.asarray(batch.column("user_id").combine_chunks(), dtype=np.int64)
        pos = np.searchsorted(skeys, uid)
        pos_c = np.clip(pos, 0, len(skeys) - 1)
        hit = skeys[pos_c] == uid
        cnt = np.bincount(scodes[pos_c[hit]], minlength=len(segments))
        return pa.table(
            {
                "c_mktsegment": pa.array(segments, pa.string()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    pre = _read(sf_dir, "events", ["user_id"]).map_batches(lookup_count, batch_format="pyarrow")
    # partials are |segments| rows per batch — sum the tiny table on the
    # driver (a Ray Data string-key groupby here is the measured-slow path
    # and emits schema-divergent sentinel blocks)
    parts = _collect(pre)
    out = (
        parts.group_by("c_mktsegment")
        .aggregate([("cnt", "sum")])
        .rename_columns(["c_mktsegment", "cnt"])
    )
    return out.filter(pc.greater(out.column("cnt"), 0)).sort_by("c_mktsegment")


def join_orders_customer(sf_dir: str) -> pa.Table:
    """Shuffle hash join (both sides large): orders ⋈ customer on custkey,
    revenue by market segment. Each side is hash-partitioned by key into
    shared buckets; every reduce runs ONE pyarrow C++ hash join and
    aggregates INSIDE the task (integer cents so the distributed sum is
    associative), so only 5-segment partials return to the driver."""
    from ray.data.aggregate import Sum

    from ..stages.join import equi_join_shuffled

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def seg_partial(joined: pa.Table) -> pa.Table:
        if joined.num_rows == 0:
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                    "sum_cents": pa.array([], pa.int64()),
                }
            )
        cents = pc.cast(pc.round(pc.multiply(joined.column("o_totalprice"), 100.0)), pa.int64())
        t = pa.table({"c_mktsegment": joined.column("c_mktsegment"), "cents": cents})
        g = t.group_by(["c_mktsegment"]).aggregate([([], "count_all"), ("cents", "sum")])
        return g.rename_columns(["c_mktsegment", "cnt", "sum_cents"])

    partials = equi_join_shuffled(
        orders,
        "o_custkey",
        ["o_custkey", "o_totalprice"],
        customer,
        "c_custkey",
        ["c_custkey", "c_mktsegment"],
        reduce_fn=seg_partial,
    )
    g = partials.group_by(["c_mktsegment"]).aggregate([("cnt", "sum"), ("sum_cents", "sum")])
    return g.rename_columns(["c_mktsegment", "cnt", "sum_cents"]).sort_by("c_mktsegment")


# ---- temporal keyed operators (stages/temporal.py; SURVEY.md §2G custom) ----
_US_PER_HOUR = 3_600_000_000


def asof_events_purchase(sf_dir: str) -> pa.Table:
    """Point-in-time feature join: for every event, the timestamp of the
    same user's most recent PRIOR 'purchase' event (strictly before — an
    event never sees itself). Distributed as-of join: both sides hash-
    partitioned by user_id, one vectorized merged-sort kernel per bucket."""
    from ..stages.temporal import asof_join_shuffled

    events = _events_with_ts(sf_dir, ["event_id", "user_id", "ts"])
    purchases = _events_with_ts(sf_dir, ["user_id", "ts", "event_type"]).filter(
        expr="event_type == 'purchase'"
    )
    out = asof_join_shuffled(
        events,
        "user_id",
        "ts",
        ["event_id"],
        purchases,
        "user_id",
        "ts",
        out_col="last_purchase_ts",
        strict=True,
    )
    return out.select(["event_id", "user_id", "last_purchase_ts"]).sort_by("event_id")


def activity_window_events(sf_dir: str) -> pa.Table:
    """Bounded-range count feature: per event, how many events the same
    user generated in the preceding hour [ts-1h, ts) — the sliding-window
    activity feature of a training pipeline, as a co-partitioned range
    join (two cumulative-rank passes per bucket, no pair materialization)."""
    from ..stages.temporal import range_count_shuffled

    events = _events_with_ts(sf_dir, ["event_id", "user_id", "ts"])
    out = range_count_shuffled(
        events,
        "user_id",
        "ts",
        ["event_id"],
        events,
        "user_id",
        "ts",
        lo_offset=-_US_PER_HOUR,
        hi_offset=0,
        out_col="n_prev_hour",
    )
    return out.select(["event_id", "n_prev_hour"]).sort_by("event_id")


def sessionize_events(sf_dir: str) -> pa.Table:
    """Gap-based sessionization of the events stream (new session after
    >2h of inactivity per user): per-session (user_id, session_no,
    n_events, session_start, session_end). One hash-partitioned pass;
    per-key history is co-located by the shuffle."""
    from ..stages.temporal import sessionize_shuffled

    events = _events_with_ts(sf_dir, ["event_id", "user_id", "ts"])
    out = sessionize_shuffled(events, "user_id", "ts", "event_id", gap=2 * _US_PER_HOUR)
    return out.sort_by([("user_id", "ascending"), ("session_no", "ascending")])


def transitions_events(sf_dir: str) -> pa.Table:
    """Event-type TRANSITION matrix of the stream (first-order Markov
    counts): per (prev_type, next_type), how many consecutive same-user
    event pairs make that step — the behavioral-drift signal that catches
    a reordered or dropped funnel step even when per-type volumes look
    flat. One hash-partitioned shuffle co-locates each user's history
    (stages/temporal.transition_counts_shuffled); the driver sums
    O(buckets × types²) count rows. Oracle: lead() OVER (PARTITION BY
    user ORDER BY ts, event_id) pair counts."""
    from ..stages.temporal import transition_counts_shuffled

    # the chain is over LABELED timed events: an unlabeled (NULL-type)
    # event carries no transition information, so it is skipped — the
    # oracle's WHERE event_type IS NOT NULL, mirrored here
    events = _events_with_ts(sf_dir, ["event_id", "user_id", "ts", "event_type"]).map_batches(
        lambda t: t.filter(pc.is_valid(t.column("event_type"))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = transition_counts_shuffled(events, "user_id", "ts", "event_id", "event_type")
    return out.sort_by([("prev_type", "ascending"), ("next_type", "ascending")])


def trigram_paths_events(sf_dir: str, k: int = 25) -> pa.Table:
    """TOP-K behavioral PATHS (order-3 path mining over the event stream):
    the k most frequent per-user event-type trigrams in (ts, event_id)
    order — the sequence-level signal funnel/transition matrices miss (a
    path view→click→error spiking while every pairwise transition looks
    flat). One hash-partitioned shuffle co-locates each user's history
    (stages/temporal.path_ngram_counts_shuffled); the driver sums
    O(buckets × types³) exact count rows and top-ks with a total-order
    tie-break (n desc, then t0/t1/t2 asc), so the k-boundary is
    deterministic. Oracle: lead(type,1)/lead(type,2) OVER (PARTITION BY
    user ORDER BY ts, event_id) trigram counts, same LIMIT and order."""
    from ..stages.temporal import path_ngram_counts_shuffled

    events = _events_with_ts(sf_dir, ["event_id", "user_id", "ts", "event_type"]).map_batches(
        lambda t: t.filter(pc.is_valid(t.column("event_type"))),  # labeled events only
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = path_ngram_counts_shuffled(events, "user_id", "ts", "event_id", "event_type", n=3)
    top = out.sort_by(
        [("n", "descending"), ("t0", "ascending"), ("t1", "ascending"), ("t2", "ascending")]
    )
    return top.slice(0, k)


def interarrival_events(sf_dir: str) -> pa.Table:
    """Per-user inter-arrival (heartbeat/cadence) statistics — exactly
    SQL's ts − lag(ts) OVER (PARTITION BY user ORDER BY ts, event_id),
    aggregated to (n_gaps, min/max/sum gap in µs). One hash-partitioned
    shuffle co-locates each user's history; gaps are a vectorized
    adjacent-difference after one lexsort per reduce
    (stages/temporal.interarrival_shuffled). All-integer → exact."""
    from ..stages.temporal import interarrival_shuffled

    events = _events_with_ts(sf_dir, ["event_id", "user_id", "ts"])
    out = interarrival_shuffled(events, "user_id", "ts", "event_id")
    return out.rename_columns(
        ["user_id", "n_gaps", "min_gap_us", "max_gap_us", "sum_gap_us"]
    ).sort_by("user_id")


def _md5_delivery_jitter(tbl: pa.Table) -> pa.Table:
    """(event_id, t): event time = ts − md5-derived delivery jitter
    (first 3 hex chars of md5(event_id) × 30 s, 0–34 h). ONE definition
    shared by late_events and ontime_windowed_events — the constants must
    mirror their oracle SQL bit-for-bit, so there is exactly one copy."""
    from ..util import md5_digests

    tbl = _drop_null_ts(tbl)  # timeless events carry no watermark signal
    eid = tbl.column("event_id").combine_chunks()
    dig = md5_digests(eid.cast(pa.string()))
    # 12 bits = byte0·16 + byte1>>4 ≡ CAST(concat('0x', substr(md5(id),1,3)) AS INT)
    j12 = dig[:, 0].astype(np.int64) * 16 + (dig[:, 1].astype(np.int64) >> 4)
    t = np.asarray(tbl.column("ts").cast(pa.int64())) - j12 * 30_000_000
    return pa.table({"event_id": tbl.column("event_id"), "t": pa.array(t, pa.int64())})


def late_events(sf_dir: str) -> pa.Table:
    """WATERMARK / LATE-DATA audit over a replayed stream (§2G's last
    category): arrival order = event_id, event time = ts minus a
    deterministic md5-derived delivery jitter (0–34 h — the synthetic
    events are strictly in-order, so the jitter simulates at-least-once
    delivery; it is reproduced verbatim in the oracle SQL). An event is
    LATE when its event time trails the watermark (running max of event
    time over arrival order) by > 12 h. The running max is a distributed
    PREFIX SCAN, not a shuffle: range-bucket by event_id, exclusive
    cummax per bucket, B scalar maxima prefix-maxed on the driver
    (stages/temporal.late_events_shuffled). Rows move exactly once."""
    from ..stages.temporal import late_events_shuffled

    W = 12 * 3_600_000_000
    out = late_events_shuffled(
        [os.path.join(sf_dir, "events.parquet")], "event_id", "t",
        watermark_us=W, pre_fn=_md5_delivery_jitter, read_cols=["event_id", "ts"],
    )
    return out.sort_by("event_id")


def ontime_windowed_events(sf_dir: str) -> pa.Table:
    """Watermark-GATED hourly aggregate — what a streaming engine would
    have emitted at each window close: per event-time hour the count of
    ON-TIME events only (same replayed stream, jitter and 12 h watermark
    as late_events; on-time + late = total). Same distributed prefix
    scan; the finalize collapses each bucket to a tiny (window, n)
    histogram, so only B × hours rows reach the driver."""
    from ..stages.temporal import late_events_shuffled

    W = 12 * 3_600_000_000
    HOUR = 3_600_000_000
    return late_events_shuffled(
        [os.path.join(sf_dir, "events.parquet")], "event_id", "t",
        watermark_us=W, pre_fn=_md5_delivery_jitter, read_cols=["event_id", "ts"],
        ontime_window_us=HOUR,
    )


def rolling_minmax_events(sf_dir: str) -> pa.Table:
    """Trailing-3-event min/max of `value` per user — exactly SQL's
    MIN/MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS
    BETWEEN 2 PRECEDING AND CURRENT ROW), the spike / freshness window
    monitor. One hash-partitioned shuffle co-locates each user's history;
    per reduce: ONE lexsort + two masked shifted fmin/fmax passes
    (stages/temporal.rolling_minmax — no per-row Python). min/max SELECT
    existing doubles (no accumulation), so floats match DuckDB
    bit-for-bit."""
    from ..stages.temporal import rolling_minmax_shuffled

    events = _events_with_ts(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = rolling_minmax_shuffled(events, "user_id", "ts", "event_id", "value", window=3)
    return out.sort_by("event_id")


def ntile_documents(sf_dir: str) -> pa.Table:
    """Length-DECILE assignment per language — exact SQL
    NTILE(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id), the
    stratification primitive for curriculum order / packing bins. Never
    sorts a whole language in one task: global rank = rank_start(lang,
    n_chars) from the tiny (lang, n_chars) count-table shuffle + tie rank
    from a (lang, n_chars)-keyed row shuffle (stages/rank.py — closed-form
    NTILE bucket arithmetic, no per-group sort)."""
    from ..stages.rank import ntile_assign_shuffled

    out = ntile_assign_shuffled(
        [os.path.join(sf_dir, "documents.parquet")], "lang", "n_chars", "doc_id", k=10
    )
    return out.rename_columns(["doc_id", "lang", "decile"]).sort_by("doc_id")


def percentile_outliers_lineitem(sf_dir: str) -> pa.Table:
    """Robust per-group outlier detection (winsorization bounds): rows
    whose l_extendedprice falls strictly outside the group's exact
    [p1, p99] — the standard data-quality trim for heavy tails. Two-phase:
    the per-group bounds come from the SAME raw-Ray (group, value) count
    shuffle as grouped_quantiles (exact quantile_disc rank arithmetic,
    stages/stats.exact_quantiles_from_counts), then one streaming filter
    pass with the tiny bounds table applied batch-local. Quantiles are
    SELECTED values, so float comparisons match DuckDB bit-for-bit.
    Domain-guarded: continuous domains route loudly to keyed t-digests
    (grouped_quantiles_auto, VERDICT r3 #4)."""
    from ..stages.stats import grouped_quantiles_auto

    _, per_group = grouped_quantiles_auto(
        [os.path.join(sf_dir, "lineitem.parquet")],
        "l_returnflag",
        "l_extendedprice",
        [100, 9900],
    )
    bounds = {flag: (float(p1), float(p99)) for flag, (p1, p99) in per_group.items()}

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice"])

    def flag_outliers(batch: pa.Table, *, bounds=bounds) -> pa.Table:
        flags = batch.column("l_returnflag").combine_chunks()
        price = np.asarray(batch.column("l_extendedprice").combine_chunks())
        lo = np.full(batch.num_rows, -np.inf)
        hi = np.full(batch.num_rows, np.inf)
        for f, (p1, p99) in bounds.items():
            sel = np.asarray(pc.equal(flags, f).fill_null(False))
            lo[sel], hi[sel] = p1, p99
        low = price < lo
        keep = low | (price > hi)
        out = batch.filter(pa.array(keep))
        side = np.where(low[keep], "low", "high")
        return out.append_column("side", pa.array(side.tolist(), pa.string()))

    res = _collect(ds.map_batches(flag_outliers, batch_format="pyarrow"))
    return res.sort_by(
        [("l_returnflag", "ascending"), ("l_extendedprice", "ascending"), ("l_orderkey", "ascending")]
    )


def mad_outliers_lineitem(sf_dir: str) -> pa.Table:
    """Robust per-group anomaly detection: rows whose l_extendedprice
    deviates from the group median by more than 2× the MAD (median
    absolute deviation) — the outlier rule that, unlike mean/stddev, is
    not itself dragged by the outliers. Both medians come from ONE tiny
    (group, value) count-table shuffle (stats.grouped_median_mad_from_
    count_table — the deviation multiset is a value transform of the same
    count rows, no second scan), then one streaming filter pass with the
    broadcast (median, 2·MAD) thresholds. |v−m| and 2·mad are single
    exactly-rounded IEEE ops → bit-exact vs DuckDB. Domain-guarded:
    continuous domains route loudly to two keyed t-digest passes
    (grouped_median_mad_auto, VERDICT r3 #4)."""
    from ..stages.stats import grouped_median_mad_auto

    _, med_mad = grouped_median_mad_auto(
        [os.path.join(sf_dir, "lineitem.parquet")],
        "l_returnflag",
        "l_extendedprice",
    )
    thr = {g: (m, 2.0 * mad) for g, (m, mad) in med_mad.items()}

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"])

    def flag_mad(batch: pa.Table, *, thr=thr) -> pa.Table:
        flags = batch.column("l_returnflag").combine_chunks()
        price = np.asarray(batch.column("l_extendedprice").combine_chunks())
        med = np.zeros(batch.num_rows)
        cut = np.full(batch.num_rows, np.inf)
        for f, (m, c) in thr.items():
            sel = np.asarray(pc.equal(flags, f).fill_null(False))
            med[sel], cut[sel] = m, c
        return batch.filter(pa.array(np.abs(price - med) > cut))

    res = _collect(ds.map_batches(flag_mad, batch_format="pyarrow"))
    if "l_orderkey" not in res.column_names:  # zero outliers: typed empty
        return pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "l_linenumber": pa.array([], pa.int32()),
                "l_returnflag": pa.array([], pa.string()),
                "l_extendedprice": pa.array([], pa.float64()),
            }
        )
    return res.sort_by(
        [("l_orderkey", "ascending"), ("l_linenumber", "ascending")]
    )


def histogram_prices_lineitem(sf_dir: str) -> pa.Table:
    """Equi-width numeric histogram of l_extendedprice (5000-wide bins) —
    the numeric companion to the categorical histogram surface: per batch
    one vectorized floor-divide + bincount partial; the driver merges
    B × bins tiny rows. floor(x/5000) on positive doubles is the same
    exactly-rounded IEEE op in numpy and DuckDB."""
    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def hist(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch.column("l_extendedprice").combine_chunks())
        bins = np.floor(x / 5000.0).astype(np.int64)
        ids, cnts = np.unique(bins, return_counts=True)
        return pa.table(
            {"bin": pa.array(ids, pa.int64()), "n": pa.array(cnts.astype(np.int64))}
        )

    parts = _collect(ds.map_batches(hist, batch_format="pyarrow"))
    out = parts.group_by("bin").aggregate([("n", "sum")])
    return out.rename_columns(["bin", "n"]).sort_by("bin")


def heavy_hitters_events(sf_dir: str) -> pa.Table:
    """Hot-key (shuffle-skew) audit: users whose event count exceeds 1.2×
    the fair share (total/distinct users) — the keys that would need
    salting before any user_id-partitioned stage. Per-shard pre-agg +
    key-hash bucket shuffle where the per-bucket count tables STAY in the
    object store; buckets report only (n_keys, total) pairs, the driver
    derives one exact integer threshold, and a filter task per bucket
    emits just the hot keys (stages/shuffle.heavy_hitters_shuffled) —
    the full key-count table never lands on the driver."""
    from ..stages.shuffle import heavy_hitters_shuffled

    out = heavy_hitters_shuffled(
        [os.path.join(sf_dir, "events.parquet")], ["user_id"], mult_num=12, mult_den=10
    )
    return out.sort_by("user_id")


def quantize_embeddings(sf_dir: str) -> pa.Table:
    """Symmetric int8 QUANTIZATION audit of the embedding column — the
    compression step before ANN index shipping: per vector the max-abs
    scale (a SELECTED float — bit-exact vs SQL) and the checksum of the
    quantized codes sum(⌊127·x/scale⌋) (floor is exact; the ≤64·127 sum
    is integer-exact in doubles). One vectorized pass per batch: Arrow
    list_flatten + two reduceat segment reductions, float32 widened
    losslessly to float64 so numpy and DuckDB round identically."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def quantize(batch: pa.Table) -> pa.Table:
        col = batch.column("embedding").combine_chunks()
        # null embedding rows → len 0 → (scale 0.0, qsum 0), exactly the
        # oracle's coalesce(list_max(...), 0.0) + CASE scale=0 path
        lens = np.asarray(pc.fill_null(pc.list_value_length(col), 0), dtype=np.int64)
        flat = np.asarray(pc.list_flatten(col), dtype=np.float64)
        starts = np.cumsum(lens) - lens
        nonempty = lens > 0
        scale = np.zeros(len(lens))
        qsum = np.zeros(len(lens), dtype=np.int64)
        if nonempty.any():
            seg = starts[nonempty]
            mx = np.maximum.reduceat(np.abs(flat), seg)
            rep = np.repeat(np.where(mx == 0, 1.0, mx), lens[nonempty])
            q = np.floor(127.0 * flat / rep)
            qs = np.add.reduceat(q, seg)
            scale[nonempty] = mx
            qsum[nonempty] = np.where(mx == 0, 0, qs).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "scale": pa.array(scale, pa.float64()),
                "qsum": pa.array(qsum, pa.int64()),
            }
        )

    return _collect(ds.map_batches(quantize, batch_format="pyarrow")).sort_by("vec_id")


def key_distribution_events(sf_dir: str) -> pa.Table:
    """Key-distribution audit for the user_id partition key: (cnt,
    n_keys) — how many users have exactly cnt events. Decides salting /
    partitioning strategy together with heavy_hitters_events; the reduce
    collapses per-key counts to tiny histograms so the driver only merges
    B (cnt, n_keys) tables (stages/shuffle.key_count_histogram_shuffled)."""
    from ..stages.shuffle import key_count_histogram_shuffled

    return key_count_histogram_shuffled(
        [os.path.join(sf_dir, "events.parquet")], ["user_id"]
    )


def column_profile_documents(sf_dir: str) -> pa.Table:
    """Categorical COLUMN-PROFILE audit (the per-column stats block a
    validation report opens with, extended past count/null-rate to the
    information content): for each declared categorical column of
    documents (lang, source) → row count, null count, exact distinct
    count and Shannon entropy of the value distribution (NULL is its own
    category, as the oracle's GROUP BY keeps it). ONE melted count-table
    shuffle: the per-shard transform projects both columns into (col,
    val) rows, so the exact per-(col, val) counts arrive in a single
    agg_keys_shuffled pass — driver work is O(Σ column domains), never
    O(rows). Entropy is reported in µbits via floor(1e6·H + 0.5) — the
    same double ops as the oracle SQL (np.round is banker's, DuckDB
    ROUND is half-away; floor(+0.5) sidesteps the convention split, the
    revenue_by_segment cents precedent). Domain guard: categorical
    profiling presumes enum-like columns; the count table is
    O(distinct), the same bound grouped_quantiles' count-table router
    documents."""
    from ..stages.shuffle import agg_keys_shuffled

    cols = ["lang", "source"]

    def melt(tbl: pa.Table) -> pa.Table:
        parts = [
            pa.table(
                {
                    "col": pa.array([name] * tbl.num_rows, pa.string()),
                    "val": tbl.column(name).cast(pa.string()),
                }
            )
            for name in cols
        ]
        return pa.concat_tables(parts)

    agg = agg_keys_shuffled(
        [os.path.join(sf_dir, "documents.parquet")],
        ["col", "val"],
        [("val", "count")],
        transform_fn=melt,
        read_cols=cols,
    )
    # canonical row order BEFORE the float entropy sum: the shuffle's
    # bucket concatenation order is an implementation detail, and double
    # summation is order-sensitive in the last ulp
    agg = agg.sort_by([("col", "ascending"), ("val", "ascending")])
    col_np = np.asarray(agg.column("col").to_numpy(zero_copy_only=False), dtype=object)
    val_np = np.asarray(agg.column("val").to_numpy(zero_copy_only=False), dtype=object)
    cnt_np = np.asarray(agg.column("cnt").to_numpy(zero_copy_only=False), dtype=np.int64)
    out_rows = []
    for name in sorted(cols):
        m = col_np == name
        cnts = cnt_np[m]
        vals = val_np[m]
        n = int(cnts.sum())
        null_mask = np.array([v is None for v in vals], dtype=bool)
        n_null = int(cnts[null_mask].sum())
        n_distinct = int((~null_mask).sum())
        if n:
            p = cnts.astype(np.float64) / n
            ent = float(np.sum(-p * np.log2(p)))
        else:
            ent = 0.0
        out_rows.append((name, n, n_null, n_distinct, int(np.floor(1e6 * ent + 0.5))))
    return pa.table(
        {
            "column": pa.array([r[0] for r in out_rows], pa.string()),
            "n_rows": pa.array([r[1] for r in out_rows], pa.int64()),
            "n_null": pa.array([r[2] for r in out_rows], pa.int64()),
            "n_distinct": pa.array([r[3] for r in out_rows], pa.int64()),
            "entropy_ubits": pa.array([r[4] for r in out_rows], pa.int64()),
        }
    )


def mutual_info_documents(sf_dir: str) -> pa.Table:
    """MUTUAL INFORMATION between the lang and source columns — the
    cross-column dependence audit (MI ≈ 0 says the corpus mixes languages
    uniformly across sources; a high MI flags source-language lock-in
    that a stratified split must account for). Exact joint counts from
    ONE (lang, source) agg_keys_shuffled count-table pass (domain =
    |langs| × |sources|, enum-bounded); marginals are row/column sums of
    the joint table on the driver, so nothing beyond the tiny count table
    ever moves. NULL categories stay (the oracle joins marginals with IS
    NOT DISTINCT FROM). Reported in µbits via floor(1e6·MI + 0.5) — the
    same double ops as the oracle SQL."""
    from ..stages.shuffle import agg_keys_shuffled

    agg = agg_keys_shuffled(
        [os.path.join(sf_dir, "documents.parquet")],
        ["lang", "source"],
        [("lang", "count")],
        read_cols=["lang", "source"],
    )
    # canonical row order BEFORE the float MI sum (last-ulp determinism)
    agg = agg.sort_by([("lang", "ascending"), ("source", "ascending")])
    lang = np.asarray(agg.column("lang").to_numpy(zero_copy_only=False), dtype=object)
    src = np.asarray(agg.column("source").to_numpy(zero_copy_only=False), dtype=object)
    cnt = np.asarray(agg.column("cnt").to_numpy(zero_copy_only=False), dtype=np.float64)
    n = cnt.sum()
    if n == 0:
        return pa.table({"mi_ubits": pa.array([0], pa.int64())})
    # marginals by category position (None-safe: positions, not dict keys)
    lang_cats = {v: i for i, v in enumerate({v for v in lang})}
    src_cats = {v: i for i, v in enumerate({v for v in src})}
    li = np.array([lang_cats[v] for v in lang], dtype=np.int64)
    si = np.array([src_cats[v] for v in src], dtype=np.int64)
    cl = np.bincount(li, weights=cnt, minlength=len(lang_cats))
    cs = np.bincount(si, weights=cnt, minlength=len(src_cats))
    mi = float(np.sum((cnt / n) * np.log2(cnt * n / (cl[li] * cs[si]))))
    return pa.table({"mi_ubits": pa.array([int(np.floor(1e6 * mi + 0.5))], pa.int64())})


def gini_user_activity_events(sf_dir: str) -> pa.Table:
    """GINI coefficient of per-user event volume — the one-number skew /
    concentration audit behind partitioning and salting decisions (0 =
    uniform keys, →1 = one user owns the stream), companion to
    key_distribution_events and heavy_hitters. EXACT and all-integer:
    Gini depends only on the MULTISET of per-key counts, so the engine
    consumes the (cnt, n_keys) histogram from the key-count shuffle —
    driver work is O(distinct count values), never O(keys) — and
    evaluates Σ(2i−k−1)·xᵢ over each equal-count run in closed form with
    Python ints (no overflow at any scale). Reported in basis points via
    integer floor division (multiply-first, the CLAUDE.md ratio rule), so
    the oracle's BIGINT // matches bit-for-bit."""
    from ..stages.shuffle import key_count_histogram_shuffled

    hist = key_count_histogram_shuffled(
        [os.path.join(sf_dir, "events.parquet")], ["user_id"]
    ).sort_by("cnt")
    cnts = hist.column("cnt").to_pylist()
    n_keys = hist.column("n_keys").to_pylist()
    twosum = 0  # Σ 2i·xᵢ over ranks i (1-based, counts ascending)
    tot = 0
    k = 0
    start = 1  # rank of the first key in the current equal-count run
    for c, m in zip(cnts, n_keys):
        # Σ_{i=start}^{start+m-1} 2i = m·(2·start + m − 1)
        twosum += c * m * (2 * start + m - 1)
        tot += c * m
        k += m
        start += m
    if k == 0 or tot == 0:
        return pa.table({"gini_bp": pa.array([0], pa.int64())})
    gini_bp = (10000 * (twosum - (k + 1) * tot)) // (k * tot)
    return pa.table({"gini_bp": pa.array([int(gini_bp)], pa.int64())})


def heavy_hitters_approx_events(sf_dir: str) -> pa.Table:
    """APPROXIMATE heavy hitters via count-min sketch — the streaming
    complement to the exact shuffle (heavy_hitters_events): per batch one
    mergeable CMS partial (4×2048 int64, ~64 KB) + that batch's top-64
    local candidates; the driver sums B sketches and ranks the candidate
    union by estimated count. Nothing is ever shuffled by key — at 100 TB
    this costs one narrow column scan and B tiny blobs. Rows-only
    surface (approximate by design); the pytest golden pins the CMS
    guarantees: top-10-by-estimate ⊇ true top-5, estimates ≥ truth and
    within ε·N."""
    from ..state.cms import CountMinSketch
    from ..util import hash_column

    width, depth, topk = 2048, 4, 10
    ds = _read(sf_dir, "events", ["user_id"])

    def sketch_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("user_id").combine_chunks()
        cms = CountMinSketch(width=width, depth=depth)
        cms.add_hashes(hash_column(ids))
        vals, counts = np.unique(
            np.asarray(ids, dtype=np.int64), return_counts=True
        )
        top = np.argsort(-counts, kind="stable")[:64]
        return pa.table(
            {
                "cms": pa.array([cms.table.tobytes()], pa.binary()),
                "candidates": pa.array([vals[top].tolist()], pa.list_(pa.int64())),
            }
        )

    parts = _collect(ds.map_batches(sketch_batch, batch_format="pyarrow"))
    merged = CountMinSketch(width=width, depth=depth)
    cand: set[int] = set()
    for row in parts.to_pylist():
        merged.merge(
            CountMinSketch(
                width,
                depth,
                np.frombuffer(row["cms"], dtype=np.int64).reshape(depth, width).copy(),
            )
        )
        cand.update(row["candidates"])
    cands = np.array(sorted(cand), dtype=np.int64)
    est = merged.estimate_column(pa.array(cands, pa.int64()))
    take = np.lexsort((cands, -est))[:topk]
    return pa.table(
        {
            "user_id": pa.array(cands[take], pa.int64()),
            "est_cnt": pa.array(est[take], pa.int64()),
        }
    )


def prefix_dedup_documents(sf_dir: str) -> pa.Table:
    """Truncation-duplicate detection: documents sharing their first 64
    CHARACTERS (the classic boilerplate/re-crawl signature that exact
    full-text hashing misses). Per batch: one vectorized
    utf8_slice_codeunits + the numpy MD5 over the prefixes; then a
    key-only (prefix_md5, doc_id) shuffle; per group with >1 member emit
    (prefix_md5, keep_id = min doc_id, n_copies). Only 32-byte hashes and
    ids ever move — never text."""
    from ray.data.aggregate import Count, Min

    from ..util import hash_column, md5_hex

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def prefix_hash(batch: pa.Table) -> pa.Table:
        pref = pc.utf8_slice_codeunits(
            batch.column("text").combine_chunks(), start=0, stop=64
        )
        # int64 ahash is the SHUFFLE key (never group by strings — CLAUDE.md);
        # the md5 hex rides along for the output/oracle. Same collision
        # caveat as exact_dedup (~1e-13/n² merges a group — oracle-checked).
        h = hash_column(pref).view(np.int64)
        return pa.table(
            {
                "h": pa.array(h, pa.int64()),
                "prefix_md5": md5_hex(pref),
                "doc_id": batch.column("doc_id"),
            }
        )

    pre = ds.map_batches(prefix_hash, batch_format="pyarrow")
    agg = pre.groupby("h").aggregate(
        Min("prefix_md5", alias_name="prefix_md5"),
        Min("doc_id", alias_name="keep_id"),
        Count(alias_name="n_copies"),
    )
    g = _collect(agg)
    g = g.filter(pc.greater(g.column("n_copies"), 1))
    return g.select(["prefix_md5", "keep_id", "n_copies"]).sort_by("prefix_md5")


def audio_pitch_clips(sf_dir: str) -> pa.Table:
    """Per-clip fundamental frequency (f0, millihertz) + voiced ratio
    (basis points) over the clip fixture — short-time autocorrelation
    with octave guard and parabolic refinement (audio.pcm_pitch_stats),
    batched FFTs, zero per-row Python. The fixture's sines make this
    engine-verifiable without SQL: f_i = 200 + (i mod 37)·20 Hz is
    recovered within 4% wherever sr ≥ 8 kHz (pytest golden)."""
    import glob as glob_

    from ..functions.multimodal import AudioPitchStage
    from ..sources.io import read_parquet_tasks

    fix = _audio_fixture()
    ds = read_parquet_tasks(sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))))
    out = ds.map_batches(AudioPitchStage(), batch_format="pyarrow")
    return _collect(out).sort_by("clip_id")


def audio_spectral_clips(sf_dir: str) -> pa.Table:
    """Spectral features over the clip fixture (sf_dir ignored — audio is
    fixture-synthesized): per-clip dominant frequency / centroid / 85%
    rolloff from the batched-rFFT kernel. For the fixture's sine clips the
    dominant frequency recovers f_i = 200 + (i mod 37)·20 Hz to one bin —
    the pytest golden pins that, making this engine-verifiable without SQL
    (FFTs aren't SQL-expressible)."""
    import glob as glob_

    from ..functions.multimodal import AudioSpectralStage
    from ..sources.io import read_parquet_tasks

    fix = _audio_fixture()
    ds = read_parquet_tasks(sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))))
    out = ds.map_batches(
        AudioSpectralStage(), batch_format="pyarrow"
    )
    return _collect(out).sort_by("clip_id")


def audio_normalize_clips(sf_dir: str) -> pa.Table:
    """Audio NORMALIZER over the clip fixture (sf_dir ignored — audio is
    fixture-synthesized): silence-trim + loudness-normalize to RMS 0.1 as
    an actor-pool transform emitting NEW wav bytes
    (functions/multimodal.AudioNormalizeStage). Returns the per-clip
    normalization record (clip_id, action, dur_ms, gain_bp) — the payload
    invariants (output RMS == target, trim bounds, silent/invalid
    passthrough, near-idempotence) are pinned in tests/test_audio_fp.py."""
    import glob as glob_

    from ..functions.multimodal import AudioNormalizeStage
    from ..sources.io import read_parquet_tasks

    fix = _audio_fixture()
    ds = read_parquet_tasks(
        sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))),
        columns=["clip_id", "bytes"],
    )
    out = ds.map_batches(
        AudioNormalizeStage(), batch_format="pyarrow"
    ).select_columns(["clip_id", "action", "dur_ms", "gain_bp"])
    return _collect(out).sort_by("clip_id")


def segment_audio_clips(sf_dir: str) -> pa.Table:
    """VAD utterance segmentation — the audio flat_map splitter (one clip
    row → N segment rows) over the deterministic burst fixture
    (sources/fixtures.make_burst_clips; sf_dir ignored — audio is not a
    driver table). Expected boundaries are exact by construction and
    golden-tested per clip in tests/test_audio_fp.py; the driver records
    the rows-only check. Returns (clip_id, seg_no, start_ms, end_ms,
    dur_ms, sr_hz) sorted by (clip_id, seg_no)."""
    import ray.data as rd

    from ..functions.multimodal import AudioSegmentStage
    from ..sources.fixtures import make_burst_clips

    clips = make_burst_clips(512)
    ds = rd.from_arrow(clips).repartition(8)
    out = ds.map_batches(
        AudioSegmentStage,
        fn_constructor_kwargs={"emit_bytes": False},
        batch_format="pyarrow",
        concurrency=2,
        batch_size=128,
    )
    return _collect(out).sort_by([("clip_id", "ascending"), ("seg_no", "ascending")])


def audio_augment_clips(sf_dir: str) -> pa.Table:
    """Training-set augmentation fan-out: each fixture clip → speed
    0.9/1.1 and gain −3 dB variants through the actor-pool
    AudioAugmentStage (one clip row → N variant rows, reproducible — no
    randomness, so re-runs dedup cleanly). Returns per-variant metadata
    (payload invariants — duration scaling, RMS gain ratio, identity
    variant equality — pinned in tests/test_audio_fp.py)."""
    import glob as glob_

    import ray.data as rd

    from ..functions.multimodal import AudioAugmentStage
    from ..sources.io import read_parquet_tasks

    fix = _audio_fixture()
    ds = read_parquet_tasks(
        sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))),
        columns=["clip_id", "bytes"],
    )
    # stateless stage (a variant list is not actor-worthy state): instance
    # as a plain callable → task pool, no actor spawn latency (CLAUDE.md).
    # NO batch_size on stages fed by the path-grain reader: fusion bundles
    # path ROWS up to batch_size, collapsing the whole fixture into one
    # task (measured; the reader already emits ≤128 MiB blocks per shard)
    out = ds.map_batches(
        AudioAugmentStage(), batch_format="pyarrow"
    ).select_columns(["clip_id", "variant", "sr_hz", "dur_ms"])
    return _collect(out).sort_by(
        [("clip_id", "ascending"), ("variant", "ascending")]
    )


def audio_denoise_clips(sf_dir: str) -> pa.Table:
    """Spectral-subtraction denoise over the clip fixture: per-clip
    noise-floor estimate (basis points of full scale) from the cleaned
    payload pass (audio.pcm_denoise via the actor-pool
    AudioDenoiseStage). Rows-only surface; the pytest golden pins SNR
    improvement on gated signal + noise and exact passthrough of
    unmodified spectra."""
    import glob as glob_

    from ..functions.multimodal import AudioDenoiseStage
    from ..sources.io import read_parquet_tasks

    fix = _audio_fixture()
    ds = read_parquet_tasks(
        sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))),
        columns=["clip_id", "bytes"],
    )
    out = ds.map_batches(
        AudioDenoiseStage(), batch_format="pyarrow"
    ).select_columns(["clip_id", "noise_bp"])
    return _collect(out).sort_by("clip_id")


def audio_tempo_clips(sf_dir: str) -> pa.Table:
    """Pitch-preserving tempo augmentation fan-out: each fixture clip →
    0.9×/1.1× rate variants via period-synchronized overlap-add
    (audio.pcm_time_stretch — duration scales, the fundamental does NOT,
    unlike the speed variants). Per-variant metadata; the payload
    invariants (duration ratio, f0 preserved within 3%, RMS within 10%)
    are pinned in tests/test_audio.py against the pitch kernel — two
    independent DSP paths cross-validating each other."""
    import glob as glob_

    from ..functions.multimodal import AudioTempoStage
    from ..sources.io import read_parquet_tasks

    fix = _audio_fixture()
    ds = read_parquet_tasks(
        sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))),
        columns=["clip_id", "bytes"],
    )
    # stateless stage → task pool; no batch_size after path-grain readers
    # (fusion bundling invariant, CLAUDE.md)
    out = ds.map_batches(
        AudioTempoStage(), batch_format="pyarrow"
    ).select_columns(["clip_id", "rate_pct", "sr_hz", "dur_ms"])
    return _collect(out).sort_by(
        [("clip_id", "ascending"), ("rate_pct", "ascending")]
    )


def image_features_stub(sf_dir: str) -> pa.Table:
    """Multimodal plumbing surface: opaque binary column → feature vector
    through the actor-pool decode stage (StubImageDecodeStage fake=True —
    no image libs in this container; the REAL parts are the Ray-side
    schema, batch sizing and actor signature, which this query pins).
    Input blobs are the deterministic burst-clip payloads treated as
    opaque binaries."""
    import ray.data as rd

    from ..functions.multimodal import StubImageDecodeStage
    from ..sources.fixtures import make_burst_clips

    clips = make_burst_clips(256).rename_columns(["id", "bytes", "sr_hz"])
    ds = rd.from_arrow(clips.select(["id", "bytes"])).repartition(4)
    out = ds.map_batches(
        StubImageDecodeStage,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        concurrency=2,
        batch_size=64,
    )
    tbl = _collect(out).sort_by("id")
    feats = tbl.column("features").combine_chunks()
    return pa.table(
        {
            "id": tbl.column("id"),
            "f_mean_milli": pc.cast(pc.floor(pc.multiply(pc.list_element(feats, 0), 1000.0)), pa.int64()),
            "f_len": pc.cast(pc.list_element(feats, 2), pa.int64()),
        }
    )


def video_frames_stub(sf_dir: str) -> pa.Table:
    """Multimodal fan-out surface: one blob row → N sampled-frame rows
    (StubVideoFrameSampleStage fake=True) — the flat_map layout a real
    ffmpeg decoder would produce, with frame bytes zero-copy slices of the
    input blob. Returns per-frame (id, frame_idx, frame_ms, frame_len)."""
    import ray.data as rd

    from ..functions.multimodal import StubVideoFrameSampleStage
    from ..sources.fixtures import make_burst_clips

    clips = make_burst_clips(128).rename_columns(["id", "bytes", "sr_hz"])
    ds = rd.from_arrow(clips.select(["id", "bytes"])).repartition(4)
    out = ds.map_batches(
        StubVideoFrameSampleStage,
        fn_constructor_kwargs={"fake": True, "every_nth": 20, "frame_size": 4096},
        batch_format="pyarrow",
        concurrency=2,
        batch_size=32,
    )
    tbl = _collect(out)
    return pa.table(
        {
            "id": tbl.column("id"),
            "frame_idx": tbl.column("frame_idx"),
            "frame_ms": tbl.column("frame_ms"),
            "frame_len": pc.cast(pc.binary_length(tbl.column("frame_bytes")), pa.int64()),
        }
    ).sort_by([("id", "ascending"), ("frame_idx", "ascending")])


def pack_audio_segments(sf_dir: str) -> pa.Table:
    """Training-example assembly for speech: VAD utterance segments packed
    into fixed 4000 ms duration-budget bins — the composition of the
    segmentation flat_map (segment_audio_clips) with the length-bucketed
    packing operator (functions/packing.py, budget in ms instead of
    tokens). Segment identity is the packed int64 ``clip_ordinal·64 +
    seg_no`` so the assignment is deterministic and layout-independent;
    segment audio never shuffles — only (id, bucket) = 16 B/segment
    leaves the map tasks. Returns (clip_id, seg_no, dur_bucket, bin)
    sorted; bin invariants (duration sum ≤ budget, ≥50% utilization on
    full bins) are pinned in tests/test_packing.py."""
    import ray.data as rd

    from ..functions.multimodal import AudioSegmentStage
    from ..functions.packing import length_buckets, pack_by_length_buckets
    from ..sources.fixtures import make_burst_clips

    clips = make_burst_clips(512)
    segs = rd.from_arrow(clips).repartition(8).map_batches(
        AudioSegmentStage,
        fn_constructor_kwargs={"emit_bytes": False},
        batch_format="pyarrow",
        concurrency=2,
        batch_size=128,
    )

    def to_keys(batch: pa.Table) -> pa.Table:
        idx = pc.cast(pc.utf8_slice_codeunits(batch.column("clip_id"), 5, 15), pa.int64())
        seg_id = pc.add(pc.multiply(idx, 64), pc.cast(batch.column("seg_no"), pa.int64()))
        bucket = length_buckets(np.asarray(batch.column("dur_ms").combine_chunks()))
        return pa.table({"seg_id": seg_id, "bucket": pa.array(bucket, pa.int64())})

    packed = pack_by_length_buckets(
        segs.select_columns(["clip_id", "seg_no", "dur_ms"]).map_batches(
            to_keys, batch_format="pyarrow"
        ),
        budget=4000,
        id_col="seg_id",
    )
    seg_id = np.asarray(packed.column("seg_id").combine_chunks())
    return pa.table(
        {
            "clip_id": pa.array([f"clip-{i:010d}" for i in seg_id // 64], pa.string()),
            "seg_no": pa.array((seg_id % 64).astype(np.int32), pa.int32()),
            "dur_bucket": packed.column("bucket"),
            "bin": packed.column("bin"),
        }
    ).sort_by([("clip_id", "ascending"), ("seg_no", "ascending")])


def export_packed_audio(sf_dir: str) -> pa.Table:
    """AUDIO TRAINING-EXAMPLE EXPORT — the full curation composition:
    VAD-segment the burst clips → resample every utterance to 16 kHz
    (AudioResampleStage) → duration-bucket bin assignment (the same
    packing operator as the text path) → ONE shuffle of segment payloads
    keyed by (bucket, bin) whose reduces concatenate each bin's PCM in
    segment order into a single training WAV. Returns per-bin metadata
    (payload stays in the reduce; the pcm-concat golden is pinned in
    tests/test_packing.py). Linear resample preserves duration, so the
    pack uses the segments' own dur_ms."""
    import ray
    import ray.data as rd

    from ..audio import wav_decode, wav_encode
    from ..functions.multimodal import AudioResampleStage, AudioSegmentStage
    from ..functions.packing import length_buckets, pack_by_length_buckets
    from ..stages.shuffle import _tree_combine
    from ..stages.temporal import _bucket_map_refs, _concat_remote

    from ..sources.fixtures import make_burst_clips

    clips = make_burst_clips(256)
    segs = (
        rd.from_arrow(clips).repartition(8)
        .map_batches(AudioSegmentStage, batch_format="pyarrow", concurrency=2, batch_size=64)
        .map_batches(
            AudioResampleStage(target_sr=16000, bytes_col="bytes"), batch_format="pyarrow"
        )
    )

    def to_keys(batch: pa.Table) -> pa.Table:
        idx = pc.cast(pc.utf8_slice_codeunits(batch.column("clip_id"), 5, 15), pa.int64())
        seg_id = pc.add(pc.multiply(idx, 64), pc.cast(batch.column("seg_no"), pa.int64()))
        bucket = length_buckets(np.asarray(batch.column("dur_ms").combine_chunks()))
        return pa.table({"seg_id": seg_id, "bucket": pa.array(bucket, pa.int64())})

    segs_mat = segs.materialize()  # two consumers (keys + payload shuffle); segment table is tiny next to the corpus
    packed = pack_by_length_buckets(
        segs_mat.map_batches(to_keys, batch_format="pyarrow"), budget=4000, id_col="seg_id"
    )
    sid = np.asarray(packed.column("seg_id").combine_chunks(), dtype=np.int64)
    order = np.argsort(sid)
    asg_ref = ray.put(
        (
            sid[order],
            np.asarray(packed.column("bucket").combine_chunks(), dtype=np.int64)[order],
            np.asarray(packed.column("bin").combine_chunks(), dtype=np.int64)[order],
        )
    )

    def tag(batch: pa.Table) -> pa.Table:
        sids, sb, sbin = ray.get(asg_ref)
        idx = pc.cast(pc.utf8_slice_codeunits(batch.column("clip_id"), 5, 15), pa.int64())
        d = np.asarray(
            pc.add(pc.multiply(idx, 64), pc.cast(batch.column("seg_no"), pa.int64())).combine_chunks()
            if batch.num_rows
            else pa.chunked_array([pa.array([], pa.int64())]),
            dtype=np.int64,
        )
        pos = np.searchsorted(sids, d).clip(max=max(len(sids) - 1, 0))
        hit = sids[pos] == d if len(sids) else np.zeros(len(d), bool)
        t = pa.table(
            {
                "bk": pa.array(sb[pos] * (1 << 40) + sbin[pos], pa.int64()),
                "seg_id": pa.array(d, pa.int64()),
                "bytes": batch.column("bytes"),
                "dur_ms": pc.cast(batch.column("dur_ms"), pa.int64()),
            }
        )
        return t.filter(pa.array(hit))

    tagged = segs_mat.map_batches(tag, batch_format="pyarrow")

    @ray.remote
    def reduce_bins(*tables: pa.Table) -> pa.Table:
        t = pa.concat_tables([x for x in tables if x.num_rows])
        if t.num_rows == 0:
            return pa.table({})
        s = t.sort_by([("bk", "ascending"), ("seg_id", "ascending")])
        bk = np.asarray(s.column("bk").combine_chunks(), dtype=np.int64)
        dur = np.asarray(s.column("dur_ms").combine_chunks(), dtype=np.int64)
        blobs = s.column("bytes").to_pylist()
        firsts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        ends = np.r_[firsts[1:], len(bk)]
        n_samples = []
        for a, b in zip(firsts, ends):
            pcm = np.concatenate([wav_decode(blobs[k])[0] for k in range(a, b)])
            n_samples.append(len(wav_encode(pcm, 16000)) // 2 - 22)  # payload samples
        return pa.table(
            {
                "bucket": pa.array(bk[firsts] >> 40, pa.int64()),
                "bin": pa.array(bk[firsts] & ((1 << 40) - 1), pa.int64()),
                "n_segments": pa.array(ends - firsts, pa.int64()),
                "dur_ms_total": pa.array(np.add.reduceat(dur, firsts), pa.int64()),
                "n_samples": pa.array(n_samples, pa.int64()),
            }
        )

    num_buckets = 8
    refs = _bucket_map_refs(tagged, ["bk", "seg_id", "bytes", "dur_ms"], "bk", num_buckets)
    combine = _concat_remote()
    reduced = [
        reduce_bins.remote(*_tree_combine([refs[m][b] for m in range(len(refs))], combine))
        for b in range(num_buckets)
    ]
    tables = [t for t in ray.get(reduced) if t.num_rows]
    out = pa.concat_tables(tables)
    return out.sort_by([("bucket", "ascending"), ("bin", "ascending")])


def speech_rate_clips(sf_dir: str) -> pa.Table:
    """Audio↔transcript consistency: tokens-per-second of each clip's
    transcript vs its duration — the cross-modal validation a speech
    corpus needs (too-slow rates signal duration drift / wrong alignment,
    dur=0 signals corrupt metadata). clips(dur_ms) ⋈ transcripts(text) via
    the hash equi-join (bytes column never read); token counts + rate
    thresholds computed vectorized INSIDE each reduce. Emits
    (clip_id, code, rate_milli) violations, rate in tokens/s × 1000."""
    import glob as glob_

    import ray.data as rd

    from ..stages.join import equi_join_shuffled

    fix = _audio_fixture()
    clips = rd.read_parquet(
        sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))),
        columns=["clip_id", "dur_ms"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    transcripts = rd.read_parquet(
        os.path.join(fix, "transcripts"), columns=["clip_id", "transcript"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table(
        {
            "clip_id": pa.array([], pa.string()),
            "code": pa.array([], pa.string()),
            "rate_milli": pa.array([], pa.int64()),
        }
    )

    def rate_violations(joined: pa.Table) -> pa.Table:
        if joined.num_rows == 0:
            return empty
        toks_a = pc.count_substring_regex(joined.column("transcript"), r"\S+")
        toks = np.asarray(toks_a.combine_chunks().cast(pa.int64()).fill_null(-1))
        dur = np.asarray(joined.column("dur_ms").combine_chunks().cast(pa.int64()))
        known = toks >= 0
        rate = (toks * 1_000_000) // np.maximum(dur, 1)  # tokens/s × 1000, floored
        undef = known & (dur <= 0)
        low = known & ~undef & (rate < 1500)
        high = known & ~undef & (rate > 8000)
        parts = []
        for mask, code in ((undef, "speechRate.undefined"), (low, "speechRate.low"), (high, "speechRate.high")):
            if mask.any():
                sel = joined.filter(pa.array(mask))
                parts.append(
                    pa.table(
                        {
                            "clip_id": sel.column("clip_id"),
                            "code": pa.array([code] * sel.num_rows, pa.string()),
                            "rate_milli": pa.array(rate[mask], pa.int64()),
                        }
                    )
                )
        return pa.concat_tables(parts) if parts else empty

    out = equi_join_shuffled(
        clips,
        "clip_id",
        ["clip_id", "dur_ms"],
        transcripts,
        "clip_id",
        ["clip_id", "transcript"],
        reduce_fn=rate_violations,
    )
    if out.num_rows == 0:
        return empty
    return out.sort_by([("clip_id", "ascending"), ("code", "ascending")])


# ---- sort / top-k / sampling (SURVEY.md §2G: optional surfaces) -------------
def top_docs_by_length(sf_dir: str) -> pa.Table:
    """Global top-5 by n_chars via per-batch local top-k + tiny driver
    re-top-k ('top-N example violations' shape, SURVEY.md §2G) — no
    all-to-all sort of the full table (round 1 used ds.sort().limit(), an
    O(table) range shuffle for a top-5). Deterministic tie-break on doc_id."""
    k = 5
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def local_topk(batch: pa.Table) -> pa.Table:
        nc = np.asarray(batch.column("n_chars").combine_chunks(), dtype=np.int64)
        ids = np.asarray(batch.column("doc_id").combine_chunks(), dtype=np.int64)
        take = np.lexsort((ids, -nc))[:k]
        return batch.take(pa.array(take))

    cand = _collect(ds.map_batches(local_topk, batch_format="pyarrow"))
    nc = np.asarray(cand.column("n_chars").combine_chunks(), dtype=np.int64)
    ids = np.asarray(cand.column("doc_id").combine_chunks(), dtype=np.int64)
    return cand.take(pa.array(np.lexsort((ids, -nc))[:k]))


QUANTILE_COLS = ["l_quantity", "l_discount", "l_tax"]
QUANTILE_BPS = [2500, 5000, 7500, 9500]


def quantiles_lineitem(sf_dir: str) -> pa.Table:
    """EXACT distributed quantiles over bounded-domain columns: per-batch
    value→count partials (O(domain) each, stages/stats.py) merged on the
    driver, quantile_disc picked by integer rank arithmetic — the exact
    sibling of the t-digest sketch in stats_lineitem, for the dur_ms /
    sr_hz-style discrete domains where exactness is free."""
    import json

    from ..stages.stats import (
        batch_value_counts,
        exact_quantiles_from_counts,
        merge_value_counts,
    )

    ds = _read(sf_dir, "lineitem", QUANTILE_COLS)

    def part(batch: pa.Table) -> pa.Table:
        vc = batch_value_counts(batch, QUANTILE_COLS)
        return pa.table({"payload": pa.array([json.dumps(vc)], pa.string())})

    partials = []
    for b in ds.map_batches(part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for p in b.column("payload").to_pylist():
            # JSON keys are strings; restore the float domain
            partials.append({c: {float(k): v for k, v in m.items()} for c, m in json.loads(p).items()})
    merged = merge_value_counts(partials)
    names, bps, vals = [], [], []
    for col in QUANTILE_COLS:
        for q_bp, v in zip(QUANTILE_BPS, exact_quantiles_from_counts(merged[col], QUANTILE_BPS)):
            names.append(col)
            bps.append(q_bp)
            vals.append(v)
    return pa.table(
        {
            "col_name": pa.array(names, pa.string()),
            "q_bp": pa.array(bps, pa.int64()),
            "val": pa.array(vals, pa.float64()),
        }
    )


def grouped_quantiles_lineitem(sf_dir: str) -> pa.Table:
    """EXACT quantiles PER GROUP over a bounded domain: quantile_disc of
    l_quantity per l_returnflag. The (group, value) count table comes out
    of the same raw-Ray key shuffle as the uniqueness checks (min_count=1
    → full distinct counts, O(groups × domain) rows), then the per-group
    discrete quantile is integer rank arithmetic on the driver. DOMAIN
    GUARDED: an unbounded/continuous domain trips max_key_rows in the
    shuffle and routes loudly to the keyed t-digest fallback
    (stages/stats.grouped_quantiles_auto, VERDICT r3 #4)."""
    from ..stages.stats import grouped_quantiles_auto

    _, per_group = grouped_quantiles_auto(
        [os.path.join(sf_dir, "lineitem.parquet")],
        "l_returnflag",
        "l_quantity",
        QUANTILE_BPS,
    )
    flags, bps, vals = [], [], []
    for flag in sorted(per_group):
        qs = per_group[flag]
        for bp, v in zip(QUANTILE_BPS, qs):
            flags.append(flag)
            bps.append(bp)
            vals.append(v)
    return pa.table(
        {
            "l_returnflag": pa.array(flags, pa.string()),
            "q_bp": pa.array(bps, pa.int64()),
            "val": pa.array(vals, pa.float64()),
        }
    )


def repetition_documents(sf_dir: str) -> pa.Table:
    """Word-repetition quality signal per doc (functions/text.py
    repetition_stats): distinct/total words in floored basis points,
    batch-local — no shuffle at all."""
    from ..functions.text import repetition_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _collect(ds.map_batches(repetition_stats, batch_format="pyarrow")).sort_by("doc_id")


_REDACT_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
_REDACT_URL = r"https?://[^\s]+"


def redact_documents(sf_dir: str) -> pa.Table:
    """PII/URL scrubbing — the text-TRANSFORM curation op (vs the filters):
    emails then URLs replaced with fixed tags via RE2 kernels inside one
    map_batches; n_redactions counted per doc so the oracle can hash both
    the rewritten text and the count. Stream-safe: pure batch-local."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def scrub(batch: pa.Table) -> pa.Table:
        # plant redactable tokens deterministically from the row's own
        # source column (the corpus has no natural emails/URLs), exactly as
        # the SQL oracle does — then scrub them back out
        text = pc.binary_join_element_wise(
            batch.column("text").combine_chunks().fill_null(""),
            pc.binary_join_element_wise(
                pa.array(["contact: user@"] * batch.num_rows, pa.string()),
                batch.column("source").combine_chunks().fill_null("x"),
                pa.array([" via https://"] * batch.num_rows, pa.string()),
                batch.column("source").combine_chunks().fill_null("x"),
                pa.array(["/path"] * batch.num_rows, pa.string()),
                "",
            ),
            " ",
        )
        n_email = pc.count_substring_regex(text, _REDACT_EMAIL)
        red = pc.replace_substring_regex(text, _REDACT_EMAIL, "<EMAIL>")
        n_url = pc.count_substring_regex(red, _REDACT_URL)
        red = pc.replace_substring_regex(red, _REDACT_URL, "<URL>")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text_redacted": red,
                "n_redactions": pc.add(n_email, n_url).cast(pa.int64()),
            }
        )

    return _collect(ds.map_batches(scrub, batch_format="pyarrow")).sort_by("doc_id")


SPLIT_BOUNDS = (0xE6, 0xF2)  # ≈90% train, ≈5% val, rest test (first md5 byte)


def split_assign_documents(sf_dir: str) -> pa.Table:
    """Deterministic train/val/test assignment by content-independent id
    hash (md5 first byte vs fixed bounds) — reproducible across block
    layout, parallelism and cluster size, and disjoint by construction."""
    from ..util import md5_digests

    ds = _read(sf_dir, "documents", ["doc_id"])
    lo, hi = SPLIT_BOUNDS

    def assign(batch: pa.Table) -> pa.Table:
        b0 = md5_digests(batch.column("doc_id").cast(pa.string()))[:, 0]
        split = np.where(b0 < lo, "train", np.where(b0 < hi, "val", "test"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return _collect(ds.map_batches(assign, batch_format="pyarrow")).sort_by("doc_id")


def decontaminate_documents(sf_dir: str) -> pa.Table:
    """Benchmark DECONTAMINATION — the training-data op of removing corpus
    documents whose text appears in an evaluation set. Benchmark = docs
    with doc_id%7==0 PLUS planted copies of doc_id%11==3 texts under new
    ids (the corpus has no natural exact dupes, so leakage is planted the
    same oracle-expressible way embedding_neardup plants its positives).
    Shape: ONE pass collects the benchmark's 64-bit text hashes (8 B per
    benchmark item on the driver — the eval set is the small side by
    definition), broadcast once; a second streaming pass marks corpus
    rows whose hash is in the set and which are not benchmark members."""
    import ray

    from ..util import hash_column

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def bench_hashes(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").combine_chunks(), dtype=np.int64)
        sel = ((ids % 7) == 0) | ((ids % 11) == 3)
        texts = batch.column("text").combine_chunks().filter(pa.array(sel))
        h = np.unique(hash_column(texts)) if len(texts) else np.zeros(0, np.uint64)
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64())})

    hs = [np.zeros(0, np.uint64)]
    for b in ds.map_batches(bench_hashes, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        hs.append(np.asarray(b.column("h").combine_chunks()).view(np.uint64))
    bench_ref = ray.put(np.unique(np.concatenate(hs)))

    def mark(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids = np.asarray(batch.column("doc_id").combine_chunks(), dtype=np.int64)
        h = hash_column(batch.column("text"))
        pos = np.searchsorted(bench, h).clip(max=max(len(bench) - 1, 0))
        leaked = (bench[pos] == h) if len(bench) else np.zeros(len(h), bool)
        contaminated = leaked & ((ids % 7) != 0)
        return pa.table({"doc_id": pa.array(ids[contaminated], pa.int64())})

    return _collect(ds.map_batches(mark, batch_format="pyarrow")).sort_by("doc_id")


def contamination_by_split_documents(sf_dir: str) -> pa.Table:
    """Per-SPLIT benchmark-leak audit — the release-gate metric a training
    run checks before shipping a mix: for each deterministic train/val/test
    split (split_assign_documents' md5-byte bounds), how many non-benchmark
    docs carry text that appears in the evaluation set
    (decontaminate_documents' bench definition), and the rate in
    multiply-first basis points. Composes the two certified primitives in
    ONE extra streaming pass: bench hashes broadcast once (8 B/item, the
    small side by definition), split + membership computed batch-local,
    only (split, n, n_hit) partials reach the driver. Zero shuffles."""
    import ray

    from ..util import hash_column, md5_digests, sorted_lookup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def bench_hashes(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").combine_chunks(), dtype=np.int64)
        sel = ((ids % 7) == 0) | ((ids % 11) == 3)
        texts = batch.column("text").combine_chunks().filter(pa.array(sel))
        h = np.unique(hash_column(texts)) if len(texts) else np.zeros(0, np.uint64)
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64())})

    hs = [np.zeros(0, np.uint64)]
    for b in ds.map_batches(bench_hashes, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        hs.append(np.asarray(b.column("h").combine_chunks()).view(np.uint64))
    bench_ref = ray.put(np.unique(np.concatenate(hs)))
    lo, hi = SPLIT_BOUNDS

    def partials(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)  # zero-copy shared read
        ids = np.asarray(batch.column("doc_id").combine_chunks(), dtype=np.int64)
        keep = (ids % 7) != 0  # benchmark members are not audited rows
        h = hash_column(batch.column("text"))
        _pos, found = sorted_lookup(bench, h)
        b0 = md5_digests(batch.column("doc_id").cast(pa.string()))[:, 0]
        split = np.where(b0 < lo, "train", np.where(b0 < hi, "val", "test"))
        t = pa.table(
            {
                "split": pa.array(split[keep].tolist(), pa.string()),
                "n_hit": pa.array(found[keep].astype(np.int64)),
            }
        )
        out = t.group_by(["split"]).aggregate([([], "count_all"), ("n_hit", "sum")])
        return out.rename_columns(["split", "n", "n_hit"])

    parts = _collect(ds.map_batches(partials, batch_format="pyarrow"))
    out = parts.group_by(["split"]).aggregate([("n", "sum"), ("n_hit", "sum")])
    n = np.asarray(out.column("n_sum"), dtype=np.int64)
    nh = np.asarray(out.column("n_hit_sum"), dtype=np.int64)
    return pa.table(
        {
            "split": out.column("split"),
            "n_docs": pa.array(n, pa.int64()),
            "n_contaminated": pa.array(nh, pa.int64()),
            "contam_bp": pa.array(10000 * nh // np.maximum(n, 1), pa.int64()),
        }
    ).sort_by("split")


def decontaminate_passages_documents(sf_dir: str) -> pa.Table:
    """PASSAGE-level benchmark decontamination — per NON-benchmark doc, the
    count of its 8-token windows whose exact token sequence appears
    anywhere in the evaluation set (benchmark = doc_id%7==0, as in
    decontaminate_documents). This is the span-level leakage audit
    whole-doc hashing misses: a training doc that QUOTES an eval item
    inside otherwise-novel text hashes differently but still leaks the
    answer (Lee et al.'s contamination-span framing, applied cross-corpus
    rather than within-corpus like dup_passages_documents).

    Scale shape: ONE pass collects the benchmark's window hashes (8 B per
    eval window — the eval set is the small side by definition), broadcast
    sorted once; a second streaming pass counts matching windows per
    corpus doc via sorted_lookup. No shuffle at all."""
    import ray

    from ..functions.text import window_hash_rows
    from ..util import sorted_lookup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    L = 8

    def bench_windows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").combine_chunks(), dtype=np.int64)
        sel = (ids % 7) == 0
        sub = batch.filter(pa.array(sel))
        wh, _docs = window_hash_rows(sub.column("text"), ids[sel], L)
        return pa.table({"wh": pa.array(np.unique(wh), pa.int64())})

    hs = [np.zeros(0, dtype=np.int64)]
    for b in ds.map_batches(bench_windows, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        hs.append(np.asarray(b.column("wh").combine_chunks(), dtype=np.int64))
    bench_ref = ray.put(np.unique(np.concatenate(hs)))
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "n_leaked_windows": pa.array([], pa.int64())}
    )

    def count_leaks(batch: pa.Table) -> pa.Table:
        bw = ray.get(bench_ref)
        ids = np.asarray(batch.column("doc_id").combine_chunks(), dtype=np.int64)
        sel = (ids % 7) != 0
        sub = batch.filter(pa.array(sel))
        wh, docs = window_hash_rows(sub.column("text"), ids[sel], L)
        if not len(wh):
            return empty
        _pos, found = sorted_lookup(bw, wh)
        if not found.any():
            return empty
        u, c = np.unique(docs[found], return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(u, pa.int64()),
                "n_leaked_windows": pa.array(c, pa.int64()),
            }
        )

    return _collect(ds.map_batches(count_leaks, batch_format="pyarrow")).sort_by("doc_id")


def _infer_spec_table(sf_dir: str, table: str) -> pa.Table:
    """Spec inference (stages/infer.py): ONE streaming pass of per-batch
    per-column partials (min/max, length bounds, capped distinct set,
    format AND-mask) merged on the driver — O(batches × columns) driver
    bytes, nothing proportional to rows. The inverse of the reference's
    schema→iterator compiler: table → suggested spec."""
    import json

    from ..stages.infer import batch_infer_partial, merge_infer_partials, profile_to_table

    ds = _read(sf_dir, table)

    def part(batch: pa.Table) -> pa.Table:
        recs = batch_infer_partial(batch)
        return pa.table({"payload": pa.array([json.dumps(recs)], pa.string())})

    partials: list[dict] = []
    for b in ds.map_batches(part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for p in b.column("payload").to_pylist():
            partials.extend(json.loads(p))
    return profile_to_table(merge_infer_partials(partials))


def infer_spec_documents(sf_dir: str) -> pa.Table:
    """Profile → spec over documents: lang becomes an enum candidate,
    source detects format=hostname via the reference format registry,
    text stays free-form (length gate)."""
    return _infer_spec_table(sf_dir, "documents")


def infer_spec_events(sf_dir: str) -> pa.Table:
    """Profile → spec over events: event_type enum, ts epoch-micros range,
    high-cardinality ids/value overflow the enum cap → range-only."""
    return _infer_spec_table(sf_dir, "events")


def spec_diff_documents(sf_dir: str) -> pa.Table:
    """Schema drift in SPEC space (stages/infer.spec_diff_profiles):
    today's documents table profiled against a simulated snapshot (even
    doc_ids, `source` column dropped) — field-level diff rows plus a
    'presence' row for the removed column. The structural sibling of the
    KS/PSI distribution-drift checks; at scale side B is the persisted
    profile of yesterday's run, not a second scan."""
    import json

    from ..stages.infer import batch_infer_partial, merge_infer_partials, spec_diff_profiles

    def prof(ds) -> dict:
        def part(batch: pa.Table) -> pa.Table:
            recs = batch_infer_partial(batch)
            return pa.table({"payload": pa.array([json.dumps(recs)], pa.string())})

        partials: list[dict] = []
        for b in ds.map_batches(part, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            for p in b.column("payload").to_pylist():
                partials.extend(json.loads(p))
        return merge_infer_partials(partials)

    def evens(batch: pa.Table) -> pa.Table:
        keep = pc.equal(pc.bit_wise_and(batch.column("doc_id"), 1), 0)
        return batch.filter(keep)

    a = prof(_read(sf_dir, "documents"))
    snap_cols = ["doc_id", "text", "lang", "n_chars"]  # source dropped
    b = prof(_read(sf_dir, "documents", snap_cols).map_batches(evens, batch_format="pyarrow"))
    return spec_diff_profiles(a, b)


def top_docs_per_lang(sf_dir: str, k: int = 3) -> pa.Table:
    """Grouped top-k (top-3 docs per lang by n_chars, doc_id tie-break):
    per-batch per-group local top-k then one driver re-rank over the
    O(batches × groups × k) candidates — the global per-group top-k is
    always a subset of the local winners, so no global sort shuffle.
    Groups = full lang domain including out-of-enum values."""
    from ..stages.stats import grouped_topk_table

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def local(batch: pa.Table) -> pa.Table:
        return grouped_topk_table(batch, "lang", "n_chars", "doc_id", k).drop_columns(["rnk"])

    cand = _collect(ds.map_batches(local, batch_format="pyarrow"))
    out = grouped_topk_table(cand, "lang", "n_chars", "doc_id", k)
    return out.sort_by([("lang", "ascending"), ("rnk", "ascending")])


STRATA_THRESHOLDS = {"en": 0x1A, "de": 0x80, "fr": 0xFF, "es": 0x40}  # ≈10/50/100/25%


def stratified_sample_documents(sf_dir: str) -> pa.Table:
    """Per-group deterministic sampling (class balancing for training
    mixes): each language keeps rows where md5(doc_id)[:2] < its own
    threshold — reproducible across block layout / cluster size like
    sample_documents, with per-stratum rates. Unlisted/null langs drop."""
    from ..util import md5_digests

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def pick(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang").combine_chunks().dictionary_encode()
        codes = np.asarray(lang.indices.fill_null(-1), dtype=np.int64)
        lut = np.zeros(len(lang.dictionary) + 1, dtype=np.uint8)
        for i, v in enumerate(lang.dictionary.to_pylist()):
            lut[i] = STRATA_THRESHOLDS.get(v, 0)
        thresh = lut[codes]  # -1 (null) indexes the trailing 0 slot
        ids_str = batch.column("doc_id").cast(pa.string())
        keep = md5_digests(ids_str)[:, 0] < thresh
        return batch.filter(pa.array(keep))

    return _collect(ds.map_batches(pick, batch_format="pyarrow")).sort_by("doc_id")


def evolved_union_documents(sf_dir: str) -> pa.Table:
    """Schema-evolution read (sources/io.read_parquet_aligned): an old
    snapshot written WITHOUT the `source` column streams into one dataset
    with today's shards, null-filled per batch (UNION-BY-NAME semantics at
    the source). Counts prove the alignment; the snapshot is materialized
    once under /tmp keyed by sf_dir."""
    import hashlib
    import pyarrow.parquet as pq_

    from ..sources.io import read_parquet_aligned

    src = os.path.join(sf_dir, "documents.parquet")
    snap_dir = os.path.join(
        "/tmp", f"schemasaurus_evolved_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}"
    )
    snap = os.path.join(snap_dir, "snapshot_v1.parquet")
    if not os.path.exists(snap):
        os.makedirs(snap_dir, exist_ok=True)
        t = pq_.read_table(src, columns=["doc_id", "text", "lang", "n_chars"])
        evens = t.filter(pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), 0))
        tmp = snap + ".tmp"
        pq_.write_table(evens, tmp)
        os.replace(tmp, snap)

    ds = read_parquet_aligned([snap, src])

    def counts(batch: pa.Table) -> pa.Table:
        src_col = batch.column("source")
        return pa.table(
            {
                "n_rows": pa.array([batch.num_rows], pa.int64()),
                "n_source_null": pa.array([src_col.null_count], pa.int64()),
                "sum_n_chars": pa.array(
                    [pc.sum(batch.column("n_chars")).as_py() or 0], pa.int64()
                ),
            }
        )

    parts = _collect(ds.map_batches(counts, batch_format="pyarrow"))
    return pa.table(
        {
            "n_rows": pa.array([pc.sum(parts.column("n_rows")).as_py()], pa.int64()),
            "n_source_null": pa.array([pc.sum(parts.column("n_source_null")).as_py()], pa.int64()),
            "sum_n_chars": pa.array([pc.sum(parts.column("sum_n_chars")).as_py()], pa.int64()),
        }
    )


def epoch_order_documents(sf_dir: str) -> pa.Table:
    """Deterministic EPOCH SHUFFLE order: every document's global position
    in the permutation sorted by md5('ep1:' + doc_id) — the reproducible
    training order a 100-TB run needs (new epoch = new salt = fresh
    permutation; re-runs and resumes bit-identical). NO global sort: hex
    md5 is uniform, so first-nibble buckets ARE order ranges — local sort
    per bucket + 16 driver offsets (stages/rank.hash_order_positions)."""
    from ..stages.rank import hash_order_positions

    out = hash_order_positions(
        [os.path.join(sf_dir, "documents.parquet")], "doc_id", "ep1:"
    )
    return out.sort_by("doc_id")


def sample_k_documents(sf_dir: str) -> pa.Table:
    """EXACTLY-k deterministic uniform sample: the k documents with the
    smallest md5('sk:' + doc_id) — unlike rate-based sampling the output
    size is fixed, and unlike random_sample it is independent of block
    layout / scan order / resume. No global sort: per-batch local
    BOTTOM-k on the 32-hex-digit hash + one tiny driver re-top-k over
    O(batches·k) candidates. Oracle: ORDER BY md5(...) LIMIT k."""
    from ..util import md5_hex

    k = 100
    ds = _read(sf_dir, "documents", ["doc_id"])

    def local_bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").combine_chunks()
        h = md5_hex(pc.binary_join_element_wise("sk:", ids.cast(pa.string()), ""))
        hb = np.asarray(h.to_numpy(zero_copy_only=False), dtype="S32")
        take = np.argsort(hb, kind="stable")[:k]
        return pa.table(
            {"doc_id": ids.take(pa.array(take, pa.int64())), "h": h.take(pa.array(take, pa.int64()))}
        )

    cand = _collect(ds.map_batches(local_bottomk, batch_format="pyarrow"))
    hb = np.asarray(cand.column("h").to_numpy(zero_copy_only=False), dtype="S32")
    take = np.argsort(hb, kind="stable")[:k]
    return cand.select(["doc_id"]).take(pa.array(take, pa.int64())).sort_by("doc_id")


def weighted_sample_documents(sf_dir: str) -> pa.Table:
    """Deterministic WEIGHTED sampling — the dataset-MIXING primitive
    (sample long/high-quality documents at higher rates): keep a row iff
    u16(md5(doc_id)[:2 bytes]) < min(60000, 64·n_chars), i.e. acceptance
    probability ∝ length, capped. Like sample_documents the selection is
    a pure function of the row — reproducible across block layout,
    parallelism and resume, and SQL-checkable; per-row thresholds are
    exact integer compares (no float rates)."""
    from ..util import md5_digests

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def pick(batch: pa.Table) -> pa.Table:
        ids_str = batch.column("doc_id").cast(pa.string())
        dig = md5_digests(ids_str)
        u16 = dig[:, 0].astype(np.int64) << 8 | dig[:, 1].astype(np.int64)
        n_chars = np.asarray(batch.column("n_chars").combine_chunks(), dtype=np.int64)
        keep = u16 < np.minimum(60000, 64 * n_chars)
        return batch.filter(pa.array(keep))

    return _collect(ds.map_batches(pick, batch_format="pyarrow")).sort_by("doc_id")


def sample_documents(sf_dir: str) -> pa.Table:
    """Deterministic hash-based ~10% sample: keep rows where
    md5(doc_id)[:2] < '1a' (26/256 ≈ 10.2%). Unlike RNG-per-block
    random_sample, the selection is reproducible regardless of block
    layout, parallelism or cluster size — the property a resumable 100-TB
    pipeline actually needs — and it is SQL-checkable (oracle-backed)."""
    from ..util import md5_digests

    ds = _read(sf_dir, "documents", ["doc_id"])

    def pick(batch: pa.Table) -> pa.Table:
        # md5(doc_id)[:2] < '1a'  ⇔  first digest byte < 0x1a; vectorized
        ids_str = batch.column("doc_id").cast(pa.string())
        keep = md5_digests(ids_str)[:, 0] < 0x1A
        return batch.filter(pa.array(keep))

    return _collect(ds.map_batches(pick, batch_format="pyarrow")).sort_by("doc_id")


# Target mixture for mixture_balance_documents: exact per-language doc counts
# (the dataset-MIXING spec a training run pins — human-written, so the group
# set is small by construction; groups smaller than their target keep all).
MIXTURE_TARGETS = {"en": 40, "zh": 25, "es": 25, "de": 25, "fr": 25}


def _mixture_bottomk(tbl: pa.Table) -> pa.Table:
    """Per-group bottom-k over (doc_id, lang, h) rows by the 32-hex hash —
    IDEMPOTENT UNDER MERGE (bottomk(concat(bottomk(A), bottomk(B))) ==
    bottomk(concat(A, B)), pinned in pytest), which is what lets the tree
    combine collapse partials in any order/grouping."""
    hb = np.asarray(tbl.column("h").to_numpy(zero_copy_only=False), dtype="S32")
    lang_np = np.asarray(tbl.column("lang").to_numpy(zero_copy_only=False), dtype=object)
    order = np.argsort(hb, kind="stable")
    keep: list[np.ndarray] = []
    for g, k in MIXTURE_TARGETS.items():  # loop over GROUPS, never rows
        members = order[lang_np[order] == g]
        keep.append(members[:k])
    take = pa.array(np.sort(np.concatenate(keep)), pa.int64())
    return tbl.take(take)


def mixture_balance_documents(sf_dir: str) -> pa.Table:
    """EXACT per-group k selection (mixture balancing for training mixes):
    each language keeps its MIXTURE_TARGETS[lang] documents with the
    smallest md5('mb:' + doc_id) — exact output sizes per group (unlike
    the rate-based stratified_sample) and reproducible across block
    layout / parallelism / resume (unlike any RNG sampler). Langs outside
    the spec drop. No global or per-group sort: per-block local BOTTOM-k
    PER GROUP on the 32-hex hash (each partial ≤ Σk rows), TREE-combined
    at fan-in 64 with the same select — bottom-k is idempotent under
    merge, so the driver receives ONE ≤ Σk-row table regardless of block
    count (the first version collected O(blocks · groups · k) candidate
    rows to the driver: ~2×10⁸ rows at 10¹² docs). Oracle: row_number()
    OVER (PARTITION BY lang ORDER BY md5(...)) <= k_lang."""
    import ray

    from ..stages.shuffle import _tree_combine
    from ..util import md5_hex

    @ray.remote
    def map_bottomk(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").combine_chunks()
        h = md5_hex(pc.binary_join_element_wise("mb:", ids.cast(pa.string()), ""))
        return _mixture_bottomk(
            pa.table({"doc_id": ids, "lang": tbl.column("lang").combine_chunks(), "h": h})
        )

    @ray.remote
    def combine_bottomk(*tables: pa.Table) -> pa.Table:
        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            return tables[0]
        return _mixture_bottomk(pa.concat_tables(nonempty))

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    refs = [map_bottomk.remote(r) for r in arrow_block_refs(ds)]
    if not refs:
        return pa.table({"doc_id": pa.array([], pa.int64()), "lang": pa.array([], pa.string())})
    final = ray.get(_tree_combine(refs, combine_bottomk, fan_in=64))
    nonempty = [t for t in final if t.num_rows]
    if not nonempty:
        return pa.table({"doc_id": pa.array([], pa.int64()), "lang": pa.array([], pa.string())})
    cand = _mixture_bottomk(pa.concat_tables(nonempty))
    return cand.select(["doc_id", "lang"]).sort_by("doc_id")


def df_topk_terms_documents(sf_dir: str, k: int = 20) -> pa.Table:
    """Per-language DOCUMENT-FREQUENCY top-k terms (the df side of tf-idf,
    and the per-domain vocabulary drift signal a curation run watches):
    df(lang, token) = number of documents of that language containing the
    token at least once. Per-batch vectorized tokenize → within-doc
    DISTINCT (a doc lives wholly in one row/batch, so batch-local dedup is
    exact) → (lang, token) partial counts (the combiner), hash-bucket
    shuffle of the tiny partials, per-bucket sum + per-lang local top-k —
    exact because a (lang, token) pair lives wholly in one bucket — then a
    driver re-top-k over O(buckets · langs · k) candidate rows. The
    vocab_topk_documents shape with a group dimension and a distinct-per-
    doc pre-step."""
    import ray

    from ..stages.shuffle import _default_buckets, _split_buckets, _tree_combine

    ds = _read(sf_dir, "documents", ["text", "lang"])
    block_refs = arrow_block_refs(ds)
    # cluster-derived fan-out (16 × nodes cap, vocab partials per bucket)
    num_buckets = _default_buckets(len(block_refs))

    def _topk_per_lang(g: pa.Table) -> pa.Table:
        top = g.sort_by([("df", "descending"), ("token", "ascending")])
        langs_np = np.asarray(top.column("lang").to_numpy(zero_copy_only=False), dtype=object)
        # group set includes a NULL lang (the oracle's PARTITION BY lang
        # keeps a NULL partition; object-array `== None` is elementwise)
        lang_list = langs_np.tolist()
        groups = sorted({x for x in lang_list if x is not None})
        if any(x is None for x in lang_list):
            groups.append(None)
        keep: list[np.ndarray] = []
        for lg in groups:  # loop over GROUPS present, never rows
            keep.append(np.flatnonzero(langs_np == lg)[:k])
        take = pa.array(np.sort(np.concatenate(keep)) if keep else [], pa.int64())
        return top.take(take)

    @ray.remote(num_returns=num_buckets)
    def map_df(tbl: pa.Table):
        toks = pc.ascii_split_whitespace(tbl.column("text").combine_chunks())
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        # drop the '' tokens split padding emits ('a b ' → ['a','b','']) —
        # the \S+ oracle can never produce an empty term
        nonempty_tok = pc.not_equal(flat, "")
        flat = flat.filter(nonempty_tok)
        parent = parent.filter(nonempty_tok)
        lang_flat = tbl.column("lang").combine_chunks().take(parent)
        per_doc = (
            pa.table({"d": parent, "lang": lang_flat, "token": flat})
            .group_by(["d", "lang", "token"])
            .aggregate([])  # DISTINCT (doc, lang, token): one df unit per doc
        )
        g = (
            per_doc.group_by(["lang", "token"])
            .aggregate([([], "count_all")])
            .rename_columns(["lang", "token", "df"])
        )
        out = _split_buckets(g, ["token"], num_buckets)
        return out if num_buckets > 1 else out[0]

    @ray.remote
    def combine(*tables: pa.Table) -> pa.Table:
        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            return tables[0]
        merged = pa.concat_tables(nonempty)
        return (
            merged.group_by(["lang", "token"])
            .aggregate([("df", "sum")])
            .rename_columns(["lang", "token", "df"])
        )

    @ray.remote
    def reduce_topk(*tables: pa.Table) -> pa.Table:
        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "token": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                }
            )
        g = (
            pa.concat_tables(nonempty)
            .group_by(["lang", "token"])
            .aggregate([("df", "sum")])
            .rename_columns(["lang", "token", "df"])
        )
        return _topk_per_lang(g)

    refs = [map_df.remote(r) for r in block_refs]
    if num_buckets == 1:
        refs = [[r] for r in refs]
    reduced = []
    for b in range(num_buckets):
        c = _tree_combine([refs[m][b] for m in range(len(refs))], combine)
        reduced.append(reduce_topk.remote(*c))
    parts = [t for t in ray.get(reduced) if t.num_rows]
    if not parts:  # zero blocks / all-empty corpus
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "token": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
            }
        )
    cand = pa.concat_tables(parts)
    return _topk_per_lang(cand).sort_by(
        [("lang", "ascending"), ("df", "descending"), ("token", "ascending")]
    )


def doc_keywords_documents(sf_dir: str, max_vocab_rows: int = 1 << 22) -> pa.Table:
    """Per-document DISTINCTIVE-KEYWORD extraction (the per-doc dual of
    df_topk_terms_documents, and the crude-but-exact tf-idf: the doc's
    rarest term): for every document, the token with minimum corpus
    document frequency, ties broken by tf DESC then token ASC — all
    integer comparisons, so the argmin is bit-exact against the oracle's
    row_number() (no float idf whose last-ulp could flip near-equal
    scores between engines). Two passes: (1) the global df count table
    from ONE agg_keys_shuffled pass whose per-shard transform emits
    within-doc-DISTINCT tokens (a doc lives wholly in one shard, so
    shard-local dedup is exact — the df_topk guarantee); (2) the df table
    broadcast once (ray.put — small side by the vocabulary bound, loud
    DomainTooLargeError above ``max_vocab_rows``, the grouped-quantiles
    budget pattern) and one streaming map_batches that computes per-doc
    tf, hash-joins df in-batch, and keeps the first row per doc after a
    single vectorized sort. Docs with no tokens (null/empty text) emit no
    row, exactly as the oracle's unnest produces nothing for them."""
    import ray

    from ..stages.shuffle import agg_keys_shuffled
    from ..stages.stats import DomainTooLargeError

    def melt_distinct(tbl: pa.Table) -> pa.Table:
        toks = pc.ascii_split_whitespace(tbl.column("text").combine_chunks())
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ne = pc.not_equal(flat, "")
        per_doc = (
            pa.table({"d": parent.filter(ne), "token": flat.filter(ne)})
            .group_by(["d", "token"])
            .aggregate([])  # within-doc DISTINCT: one df unit per doc
        )
        return pa.table({"token": per_doc.column("token")})

    df_tbl = agg_keys_shuffled(
        [os.path.join(sf_dir, "documents.parquet")],
        ["token"],
        [("token", "count")],
        transform_fn=melt_distinct,
        read_cols=["text"],
    )
    if df_tbl.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
            }
        )
    df_tbl = df_tbl.rename_columns(["token", "df"]).combine_chunks()
    if df_tbl.num_rows > max_vocab_rows:
        raise DomainTooLargeError(
            f"vocabulary has {df_tbl.num_rows} terms > max_vocab_rows={max_vocab_rows}; "
            "the df broadcast presumes a bounded vocabulary — raise the budget "
            "explicitly or pre-prune the token stream"
        )
    df_ref = ray.put(df_tbl)

    def keywords(batch: pa.Table) -> pa.Table:
        df = ray.get(df_ref)
        toks = pc.ascii_split_whitespace(batch.column("text").combine_chunks())
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ne = pc.not_equal(flat, "")
        flat = flat.filter(ne)
        parent = parent.filter(ne)
        doc_ids = batch.column("doc_id").combine_chunks().take(parent)
        tf = (
            pa.table({"doc_id": doc_ids, "token": flat})
            .group_by(["doc_id", "token"])
            .aggregate([([], "count_all")])
            .rename_columns(["doc_id", "token", "tf"])
        )
        j = tf.join(df, keys="token", join_type="inner").sort_by(
            [
                ("doc_id", "ascending"),
                ("df", "ascending"),
                ("tf", "descending"),
                ("token", "ascending"),
            ]
        )
        d = np.asarray(j.column("doc_id").combine_chunks(), dtype=np.int64)
        first = np.ones(len(d), dtype=bool)
        if len(d) > 1:
            first[1:] = d[1:] != d[:-1]
        return j.filter(pa.array(first)).select(["doc_id", "token", "tf", "df"])

    out = _collect(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            keywords, batch_format="pyarrow"
        )
    )
    if out.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
            }
        )
    return out.sort_by("doc_id")


# ---- snapshot diff (CDC) -----------------------------------------------------
def _orders_next_snapshot(tbl: pa.Table) -> pa.Table:
    """Deterministic 'next snapshot' of the orders table, derived in-flight
    per shard (no materialization): drop keys ≡3 (mod 17), bump
    o_totalprice by 1.0 for keys ≡1 (mod 13), append copies of keys ≡2
    (mod 19) re-keyed +10_000_000 (outside the key range at tested SFs).
    The oracle SQL derives the identical snapshot in a CTE."""
    k = np.asarray(tbl.column("o_orderkey").combine_chunks(), dtype=np.int64)
    price = np.array(tbl.column("o_totalprice").combine_chunks(), dtype=np.float64)
    price[k % 13 == 1] += 1.0
    base = pa.table(
        {
            "o_orderkey": pa.array(k, pa.int64()),
            "o_custkey": tbl.column("o_custkey").combine_chunks(),
            "o_orderstatus": tbl.column("o_orderstatus").combine_chunks(),
            "o_totalprice": pa.array(price, pa.float64()),
        }
    ).filter(pa.array(k % 17 != 3))
    add_mask = pa.array(k % 19 == 2)
    added = pa.table(
        {
            "o_orderkey": pa.array(k + 10_000_000, pa.int64()),
            "o_custkey": tbl.column("o_custkey").combine_chunks(),
            "o_orderstatus": tbl.column("o_orderstatus").combine_chunks(),
            "o_totalprice": tbl.column("o_totalprice").combine_chunks(),
        }
    ).filter(add_mask)
    return pa.concat_tables([base, added])


def snapshot_diff_orders(sf_dir: str) -> pa.Table:
    """INCREMENTAL VALIDATION (CDC): row-level diff between the orders
    snapshot and a deterministically-derived next snapshot — which keys
    were added / removed / changed. Both sides map independently over
    parquet shards folding each row into a 64-bit content signature;
    only (key, cnt, xor, sum) partials shuffle (stages/cdc.snapshot_diff),
    so output and shuffle are O(churn), never O(table). The reference
    revalidates whole tables; this is the engine-native incremental form
    a daily 100-TB lake actually runs."""
    from ..stages.cdc import snapshot_diff

    path = os.path.join(sf_dir, "orders.parquet")
    out = snapshot_diff(
        [path],
        [path],
        key_cols=["o_orderkey"],
        value_cols=["o_custkey", "o_orderstatus", "o_totalprice"],
        new_transform=_orders_next_snapshot,
    )
    return out.sort_by("o_orderkey")


def lm_bigram_oov_documents(sf_dir: str) -> pa.Table:
    """CORPUS-LM QUALITY SIGNAL: train a top-500 bigram model over the
    corpus itself (distributed count via the bucketed aggregate shuffle,
    min_df=2 floor, deterministic count-desc/bigram-asc head), broadcast
    it once (ray.put), then score every document's out-of-vocabulary
    bigram rate in basis points — the Gopher/KenLM-style 'does this text
    look like the corpus' filter, exact-integer so the DuckDB oracle
    matches bit-for-bit. Docs with <2 tokens have no bigrams and are
    excluded (the oracle's join produces no rows for them)."""
    import ray

    from ..functions.text import batch_bigrams, bigram_lm_topk

    path = os.path.join(sf_dir, "documents.parquet")
    lm = bigram_lm_topk([path], k=500, min_df=2)
    lm_ref = ray.put(lm)

    def score(batch: pa.Table) -> pa.Table:
        lm_arr = ray.get(lm_ref)
        bg, doc_idx = batch_bigrams(batch.column("text"))
        n = batch.num_rows
        total = np.bincount(doc_idx, minlength=n).astype(np.int64)
        if len(bg):
            known = np.asarray(pc.is_in(bg, value_set=lm_arr))
            oov = np.bincount(doc_idx[~known], minlength=n).astype(np.int64)
        else:
            oov = np.zeros(n, dtype=np.int64)
        has = total > 0
        bp = (10000 * oov[has]) // total[has]
        return pa.table(
            {
                "doc_id": batch.column("doc_id").combine_chunks().filter(pa.array(has)),
                "n_bigrams": pa.array(total[has], pa.int64()),
                "oov_bp": pa.array(bp, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _collect(ds.map_batches(score, batch_format="pyarrow")).sort_by("doc_id")


def funnel_events(sf_dir: str) -> pa.Table:
    """ORDERED CONVERSION FUNNEL over the event stream: users who did a
    'view', then a 'click' strictly after it, then a 'purchase' strictly
    after that (earliest-completion semantics). Events are deterministically
    thinned to event_id%8==0 so stages actually discriminate at test
    density (the oracle applies the same filter). One per-user hash
    shuffle; non-funnel rows are dropped at the map; reduces return only
    (stage, count) pairs (stages/temporal.funnel_shuffled)."""
    from ..stages.temporal import funnel_shuffled

    stages = ["view", "click", "purchase"]

    def thin(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("event_id").combine_chunks(), dtype=np.int64)
        return batch.filter(pa.array(ids % 8 == 0)).drop_columns(["event_id"])

    ds = _events_with_ts(sf_dir, ["event_id", "user_id", "ts", "event_type"]).map_batches(
        thin, batch_format="pyarrow", zero_copy_batch=True
    )
    out = funnel_shuffled(ds, "user_id", "ts", "event_type", stages)
    labels = [">".join(stages[: i + 1]) for i in range(len(stages))]
    idx = out.column("stage_idx").to_pylist()
    return pa.table(
        {
            "stage": pa.array([labels[i] for i in idx], pa.string()),
            "n_users": out.column("n_keys"),
        }
    ).sort_by("stage")


def funnel_window_events(sf_dir: str) -> pa.Table:
    """Conversion funnel with a 24 h ATTRIBUTION WINDOW: each stage must
    occur strictly after AND within 24 h of reaching the previous stage
    (greedy earliest-completion — the standard analytics semantics, and
    exactly what the oracle's bounded joins compute). Same one-shuffle
    plan as funnel_events; the window is one extra vectorized mask per
    stage in the reduce kernel (stages/temporal.funnel_shuffled
    max_gap_us)."""
    from ..stages.temporal import funnel_shuffled

    stages = ["view", "click", "purchase"]

    def thin(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("event_id").combine_chunks(), dtype=np.int64)
        return batch.filter(pa.array(ids % 8 == 0)).drop_columns(["event_id"])

    ds = _events_with_ts(sf_dir, ["event_id", "user_id", "ts", "event_type"]).map_batches(
        thin, batch_format="pyarrow", zero_copy_batch=True
    )
    out = funnel_shuffled(
        ds, "user_id", "ts", "event_type", stages, max_gap_us=24 * 3_600_000_000
    )
    labels = [">".join(stages[: i + 1]) for i in range(len(stages))]
    idx = out.column("stage_idx").to_pylist()
    return pa.table(
        {
            "stage": pa.array([labels[i] for i in idx], pa.string()),
            "n_users": out.column("n_keys"),
        }
    ).sort_by("stage")


def cohort_retention_events(sf_dir: str) -> pa.Table:
    """COHORT RETENTION TRIANGLE: users grouped by first-activity day,
    counted on each active day offset — (cohort, day_offset, n_users),
    exact. One per-user hash shuffle carrying only (user_id, ts); each
    reduce dedups (user, day) in one lexsort and pre-aggregates, so the
    driver merges B tiny triangles (stages/temporal.cohort_retention_shuffled)."""
    from ..stages.temporal import cohort_retention_shuffled

    ds = _events_with_ts(sf_dir, ["user_id", "ts"])
    out = cohort_retention_shuffled(ds, "user_id", "ts")
    days = np.asarray(out.column("cohort_day").combine_chunks(), dtype=np.int64)
    cohort = days.astype("datetime64[D]").astype(str)
    return pa.table(
        {
            "cohort": pa.array(cohort, pa.string()),
            "day_offset": out.column("day_offset"),
            "n_users": out.column("n_keys"),
        }
    )


def audio_logmel_clips(sf_dir: str) -> pa.Table:
    """LOG-MEL FEATURE EXPORT over the clip fixture (sf_dir ignored —
    audio is fixture-synthesized): per-clip (n_frames × 24) log-mel
    matrices as flat list<float32>, the featurization an ASR trainer
    consumes. Batched-rFFT + per-sample-rate mel matmuls
    (functions/multimodal.AudioLogMelStage); the pytest golden pins the
    dominant mel band against each sine clip's known f_i (FFTs aren't
    SQL-expressible — rows-only driver check)."""
    import glob as glob_

    from ..functions.multimodal import AudioLogMelStage
    from ..sources.io import read_parquet_tasks

    fix = _audio_fixture()
    ds = read_parquet_tasks(sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))))
    out = ds.map_batches(AudioLogMelStage(), batch_format="pyarrow")
    return _collect(out).sort_by("clip_id")


def audio_corpus_inventory(sf_dir: str) -> pa.Table:
    """CORPUS INVENTORY by sample rate — the first audio-QA dashboard
    row: per sr_hz the clip count, decodable count, total decoded
    samples (exact integers — hours = samples/sr/3600) and count of
    header-vs-payload duration mismatches. One map_batches emits tiny
    per-batch pre-agg tables (pcm_segment_stats for measured lengths);
    the driver folds B × |sr values| rows. Rows-only surface (audio
    payloads aren't SQL); the pytest golden recomputes it per clip with
    wav_decode."""
    import glob as glob_

    from ..audio import pcm_segment_stats
    from ..sources.io import read_parquet_tasks

    fix = _audio_fixture()
    ds = read_parquet_tasks(sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))))

    def inventory(batch: pa.Table) -> pa.Table:
        st = pcm_segment_stats(batch.column("bytes"))
        valid = st["valid"]
        # measured_ms is exact: n_samples = measured_ms * sr / 1000 is the
        # decoded length; recover integer samples from the stats kernel
        sr_meta = np.asarray(batch.column("sr_hz").combine_chunks(), dtype=np.int64)
        n_samp = np.where(
            valid, np.rint(st["measured_ms"] * sr_meta / 1000.0), 0
        ).astype(np.int64)
        dur_meta = np.asarray(batch.column("dur_ms").combine_chunks(), dtype=np.int64)
        mismatch = valid & (np.abs(st["measured_ms"] - dur_meta) > 1.0)
        t = pa.table(
            {
                "sr_hz": pa.array(sr_meta, pa.int64()),
                "n_clips": pa.array(np.ones(len(sr_meta), np.int64)),
                "n_decodable": pa.array(valid.astype(np.int64)),
                "total_samples": pa.array(n_samp, pa.int64()),
                "n_mismatch": pa.array(mismatch.astype(np.int64)),
            }
        )
        return t.group_by("sr_hz").aggregate(
            [
                ("n_clips", "sum"),
                ("n_decodable", "sum"),
                ("total_samples", "sum"),
                ("n_mismatch", "sum"),
            ]
        ).rename_columns(
            ["sr_hz", "n_clips", "n_decodable", "total_samples", "n_mismatch"]
        )

    parts = _collect(ds.map_batches(inventory, batch_format="pyarrow"))
    agg = parts.group_by("sr_hz").aggregate(
        [
            ("n_clips", "sum"),
            ("n_decodable", "sum"),
            ("total_samples", "sum"),
            ("n_mismatch", "sum"),
        ]
    )
    return agg.rename_columns(
        ["sr_hz", "n_clips", "n_decodable", "total_samples", "n_mismatch"]
    ).sort_by("sr_hz")


def audio_codec_sniff_clips(sf_dir: str) -> pa.Table:
    """DECLARED-CODEC vs PAYLOAD-CONTAINER audit: the `codec` column is a
    metadata assertion; the payload's file magic is the fact — a corpus
    whose rows say 'flac' over RIFF bytes has a broken ingest upstream,
    and every decode stage downstream will dispatch to the wrong library.
    Per batch: one vectorized magic sniff over the flat binary buffer
    (audio.container_sniff — no per-row Python, bytes never copied) + a
    tiny (codec, sniffed) group count; the driver folds B × |codecs|²
    rows. `mismatch` marks pairs where the declaration disagrees with the
    container ('opus' declared over an Ogg container counts as a match —
    Opus ships in Ogg). Rows-only surface (binary payloads aren't SQL);
    the pytest golden re-derives expected counts from the fixture's
    declared-label generator."""
    import glob as glob_

    from ..audio import container_sniff
    from ..sources.io import read_parquet_tasks

    fix = _audio_fixture()
    ds = read_parquet_tasks(
        sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))),
        columns=["clip_id", "codec", "bytes"],
    )

    def sniff(batch: pa.Table) -> pa.Table:
        labels = container_sniff(batch.column("bytes"))
        t = pa.table(
            {
                "codec": batch.column("codec"),
                "sniffed": pa.array(labels, pa.string()),
            }
        )
        return (
            t.group_by(["codec", "sniffed"])
            .aggregate([([], "count_all")])
            .rename_columns(["codec", "sniffed", "n"])
        )

    parts = _collect(ds.map_batches(sniff, batch_format="pyarrow"))
    if parts.num_rows == 0:
        return pa.table(
            {
                "codec": pa.array([], pa.string()),
                "sniffed": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "mismatch": pa.array([], pa.bool_()),
            }
        )
    agg = (
        parts.group_by(["codec", "sniffed"])
        .aggregate([("n", "sum")])
        .rename_columns(["codec", "sniffed", "n"])
        .sort_by([("codec", "ascending"), ("sniffed", "ascending")])
    )
    dec = np.asarray(agg.column("codec").to_numpy(zero_copy_only=False), dtype=object)
    sn = np.asarray(agg.column("sniffed").to_numpy(zero_copy_only=False), dtype=object)
    match = (dec == sn) | ((dec == "opus") & (sn == "ogg"))
    return agg.append_column("mismatch", pa.array(~match, pa.bool_()))


def audio_reference_parity_clips(sf_dir: str, snr_floor_db: float = 30.0) -> pa.Table:
    """PER-ROW REFERENCE-PARITY audit — the acceptance invariant of the
    engine (decoded-PCM ≥ 30 dB SNR against the reference synthesis for
    the row's (clip_id, sr_hz, dur_ms), plus transcript equality against
    the side table) surfaced as a corpus-level report instead of only a
    pytest assertion. Two streaming passes: (1) one map_batches over the
    clip shards decodes each payload (per-clip wav_decode loop — the
    AudioResampleStage-measured shape for variable-length payloads; the
    sample math inside is numpy), re-synthesizes the reference from the
    index embedded in clip_id, and emits ONE partial-count row per batch;
    (2) the clip_id hash equi-join against the transcript side table
    counts (pairs, equal) INSIDE each reduce. The driver folds B tiny
    rows per pass. A clip whose id was stomped by a duplicate fails SNR
    parity by construction (its payload encodes the original index) —
    exactly the 'id contradicts payload' defect this audit exists to
    catch. Rows-only surface; the pytest golden recomputes both passes
    independently per row."""
    import glob as glob_
    import re

    import ray.data as rd

    from ..audio import snr_db, synth_samples, wav_decode
    from ..sources.io import read_parquet_tasks
    from ..stages.join import equi_join_shuffled

    fix = _audio_fixture()
    idx_re = re.compile(r"(\d+)")
    ds = read_parquet_tasks(
        sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))),
        columns=["clip_id", "bytes", "sr_hz", "dur_ms"],
    )

    def snr_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("clip_id").to_pylist()
        blobs = batch.column("bytes")
        srs = batch.column("sr_hz").to_pylist()
        durs = batch.column("dur_ms").to_pylist()
        n_dec = n_pass = 0
        for j in range(batch.num_rows):
            blob = blobs[j].as_py()
            if blob is None:
                continue
            try:
                pcm, _sr = wav_decode(blob)
            except ValueError:
                continue
            if len(pcm) == 0:
                continue
            n_dec += 1
            m = idx_re.search(ids[j] or "")
            if m is None:
                continue
            ref = synth_samples(int(m.group(1)), int(srs[j]), int(durs[j]))
            if snr_db(pcm, ref) >= snr_floor_db:
                n_pass += 1
        return pa.table(
            {
                "n_clips": pa.array([batch.num_rows], pa.int64()),
                "n_decodable": pa.array([n_dec], pa.int64()),
                "n_snr_pass": pa.array([n_pass], pa.int64()),
            }
        )

    snr_parts = _collect(ds.map_batches(snr_partial, batch_format="pyarrow"))

    clips_tr = rd.read_parquet(
        sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))),
        columns=["clip_id", "transcript"],
    ).map_batches(
        lambda b: b.rename_columns(["clip_id", "transcript_clip"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    transcripts = rd.read_parquet(
        os.path.join(fix, "transcripts"), columns=["clip_id", "transcript"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def pair_counts(joined: pa.Table) -> pa.Table:
        eq = pc.equal(joined.column("transcript_clip"), joined.column("transcript"))
        n_eq = int(pc.sum(pc.cast(eq, pa.int64())).as_py() or 0)  # null-safe: null ≠
        return pa.table(
            {
                "n_transcript_pairs": pa.array([joined.num_rows], pa.int64()),
                "n_transcript_equal": pa.array([n_eq], pa.int64()),
            }
        )

    pairs = equi_join_shuffled(
        clips_tr,
        "clip_id",
        ["clip_id", "transcript_clip"],
        transcripts,
        "clip_id",
        ["clip_id", "transcript"],
        reduce_fn=pair_counts,
    )

    def total(tbl: pa.Table, col: str) -> int:
        if tbl.num_rows == 0 or col not in tbl.column_names:
            return 0
        return int(pc.sum(tbl.column(col)).as_py() or 0)

    return pa.table(
        {
            "n_clips": pa.array([total(snr_parts, "n_clips")], pa.int64()),
            "n_decodable": pa.array([total(snr_parts, "n_decodable")], pa.int64()),
            "n_snr_pass": pa.array([total(snr_parts, "n_snr_pass")], pa.int64()),
            "n_transcript_pairs": pa.array([total(pairs, "n_transcript_pairs")], pa.int64()),
            "n_transcript_equal": pa.array([total(pairs, "n_transcript_equal")], pa.int64()),
        }
    )


def audio_cmvn_clips(sf_dir: str) -> pa.Table:
    """CORPUS CMVN STATS (cepstral mean/variance normalization): the
    per-mel-bin frame count, mean and standard deviation over every
    log-mel frame in the corpus — what a trainer standardizes inputs
    with. Two chained map_batches (logmel features → mergeable moment
    partials); the driver folds B × n_mels tiny rows. Values are rounded
    to 3 decimals for a stable rows-only surface (float sums across
    shards are order-dependent in the last ulps)."""
    import glob as glob_

    from ..functions.multimodal import AudioLogMelStage, logmel_moment_partials
    from ..sources.io import read_parquet_tasks

    n_mels = 24
    fix = _audio_fixture()
    ds = read_parquet_tasks(sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))))
    parts = ds.map_batches(AudioLogMelStage(n_mels=n_mels), batch_format="pyarrow").map_batches(
        lambda b: logmel_moment_partials(b, n_mels), batch_format="pyarrow"
    )
    tbl = _collect(parts)
    agg = tbl.group_by("mel_bin").aggregate([("n", "sum"), ("s1", "sum"), ("s2", "sum")])
    n = np.asarray(agg.column("n_sum").combine_chunks(), dtype=np.float64)
    s1 = np.asarray(agg.column("s1_sum").combine_chunks())
    s2 = np.asarray(agg.column("s2_sum").combine_chunks())
    mean = s1 / np.maximum(n, 1)
    var = np.maximum(s2 / np.maximum(n, 1) - mean * mean, 0.0)
    return pa.table(
        {
            "mel_bin": agg.column("mel_bin"),
            "n_frames": pa.array(n.astype(np.int64), pa.int64()),
            "mean_q3": pa.array(np.round(mean, 3), pa.float64()),
            "std_q3": pa.array(np.round(np.sqrt(var), 3), pa.float64()),
        }
    ).sort_by("mel_bin")


def k_anonymity_customer(sf_dir: str, k: int = 5) -> pa.Table:
    """PRIVACY VALIDATION (k-anonymity): quasi-identifier combinations —
    (market segment, nation, account-balance band) — that identify fewer
    than k customers, i.e. the re-identifiable cells a release gate must
    flag. Rides the generic bucketed aggregate shuffle: each shard
    pre-counts its combos (combiner), the k-floor HAVING runs inside the
    reduce, so the driver receives only violating cells — O(violations),
    not O(groups)."""
    from ..stages.shuffle import agg_keys_shuffled

    def derive(tbl: pa.Table) -> pa.Table:
        bal = np.asarray(tbl.column("c_acctbal").combine_chunks(), dtype=np.float64)
        band = np.floor(bal / 2000.0).astype(np.int64)
        return tbl.append_column("bal_band", pa.array(band, pa.int64()))

    out = agg_keys_shuffled(
        [os.path.join(sf_dir, "customer.parquet")],
        key_cols=["c_mktsegment", "c_nationkey", "bal_band"],
        aggs=[("c_mktsegment", "count")],
        transform_fn=derive,
        having_fn=lambda t: t.filter(pc.less(t.column("cnt"), k)),
        read_cols=["c_mktsegment", "c_nationkey", "c_acctbal"],
    )
    if out.num_rows == 0:
        return pa.table(
            {
                "c_mktsegment": pa.array([], pa.string()),
                "c_nationkey": pa.array([], pa.int64()),
                "bal_band": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
    return out.rename_columns(["c_mktsegment", "c_nationkey", "bal_band", "n"]).sort_by(
        [("c_mktsegment", "ascending"), ("c_nationkey", "ascending"), ("bal_band", "ascending")]
    )


def _user_type_pairs(t: pa.Table):
    """Shared within-user pair-expansion kernel for the user-bucketed
    association reduces (cooccurrence_events, assoc_rules_events): sort a
    non-null (user_id, event_type) table by (user, type), then expand the
    distinct within-user UNORDERED type pairs with at most |type-domain|
    shifted-mask passes (rows of one user are contiguous after the sort;
    the distance-d mask matches iff some user group spans d, and once no
    group spans d none spans d+1 — so the loop breaks early; never a
    per-user Python loop). Pair key = left_code·|T| + right_code, where
    the LEFT endpoint's type string is strictly below the right's along
    the sort order. Returns (uid, codes, types, pair_keys, pair_counts);
    pair_keys is empty when no user has two types."""
    srt = t.sort_by([("user_id", "ascending"), ("event_type", "ascending")])
    uid = np.asarray(srt.column("user_id").combine_chunks(), dtype=np.int64)
    tdict = srt.column("event_type").combine_chunks().dictionary_encode()
    codes = np.asarray(tdict.indices, dtype=np.int64)
    types = tdict.dictionary
    nt = len(types)
    lefts: list[np.ndarray] = []
    rights: list[np.ndarray] = []
    d = 1
    while d < len(uid):
        m = uid[:-d] == uid[d:]
        if not m.any():
            break
        idx = np.nonzero(m)[0]
        lefts.append(codes[idx])
        rights.append(codes[idx + d])
        d += 1
    if lefts:
        key, counts = np.unique(
            np.concatenate(lefts) * nt + np.concatenate(rights), return_counts=True
        )
    else:
        key = np.zeros(0, dtype=np.int64)
        counts = np.zeros(0, dtype=np.int64)
    return uid, codes, types, key, counts


def cooccurrence_events(sf_dir: str) -> pa.Table:
    """Event-type CO-OCCURRENCE mining (market-basket association counts):
    for each unordered pair of event types (t1 < t2), the number of USERS
    who performed both — the feature-correlation signal behind funnel
    design and negative-sampling decisions that per-type volumes and the
    transition matrix (order-sensitive, adjacency-only) both miss. ONE
    shuffle keyed by (user, type) but BUCKETED by user only
    (agg_keys_shuffled bucket_cols), so every user's distinct-type rows
    land in one reduce task; the reduce expands within-user pairs with at
    most |type-domain| shifted-mask passes over the sorted rows (never a
    per-user Python loop) and emits an O(types²) count table; the driver
    sums B such tables. Oracle: self-join of SELECT DISTINCT user, type
    on user with t1 < t2."""
    from ..stages.shuffle import agg_keys_shuffled

    def _empty() -> pa.Table:
        return pa.table(
            {
                "t1": pa.array([], pa.string()),
                "t2": pa.array([], pa.string()),
                "n_users": pa.array([], pa.int64()),
            }
        )

    def pairs_per_bucket(t: pa.Table) -> pa.Table:
        # rows: one (user_id, event_type) per user×type after the merge —
        # the count column is ignored (presence = the user did the type).
        t = t.filter(pc.is_valid(t.column("event_type")))  # NULL type: a.t < b.t drops it
        if t.num_rows == 0:
            return _empty()
        _, _, types, key, counts = _user_type_pairs(t)
        if len(key) == 0:
            return _empty()
        nt = len(types)
        return pa.table(
            {
                "t1": types.take(pa.array(key // nt, pa.int64())),
                "t2": types.take(pa.array(key % nt, pa.int64())),
                "n_users": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    out = agg_keys_shuffled(
        [os.path.join(sf_dir, "events.parquet")],
        key_cols=["user_id", "event_type"],
        aggs=[("event_type", "count")],
        bucket_cols=["user_id"],
        having_fn=pairs_per_bucket,
        read_cols=["user_id", "event_type"],
    )
    if out.num_rows == 0:
        return _empty()
    # buckets partition users — the same pair can surface in several
    # buckets; the final sum is over an O(types²) table on the driver
    out = (
        out.group_by(["t1", "t2"])
        .aggregate([("n_users", "sum")])
        .rename_columns(["t1", "t2", "n_users"])
    )
    return out.sort_by([("t1", "ascending"), ("t2", "ascending")])


def user_entropy_events(sf_dir: str, k: int = 25) -> pa.Table:
    """Per-user BEHAVIORAL ENTROPY (Shannon entropy of the user's
    event-type distribution, µbits): the bot / monoculture detector —
    near-zero entropy flags single-action accounts, maximal entropy flags
    uniform scripted sweeps. Same single user-bucketed shuffle as
    cooccurrence_events; each reduce computes H per user with two
    reduceat passes over its sorted count rows and keeps only its local
    top-k, so the driver merges B×k candidate rows (the per-bucket top-k
    is exact: a user lives wholly in one bucket). Total order
    (entropy_ubits desc, user_id asc) makes the k-boundary deterministic;
    floor(1e6·H + 0.5) is the repo's float-reporting convention."""
    from ..stages.shuffle import agg_keys_shuffled

    def _empty() -> pa.Table:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_types": pa.array([], pa.int64()),
                "entropy_ubits": pa.array([], pa.int64()),
            }
        )

    def entropy_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty()
        # canonical (user, type) order before the float sum — same
        # last-ulp discipline as mutual_info_documents
        srt = t.sort_by([("user_id", "ascending"), ("event_type", "ascending")])
        uid = np.asarray(srt.column("user_id").combine_chunks(), dtype=np.int64)
        cnt = np.asarray(srt.column("cnt").combine_chunks(), dtype=np.int64)
        starts = np.flatnonzero(np.concatenate(([True], uid[1:] != uid[:-1])))
        n_ev = np.add.reduceat(cnt, starts)
        n_ty = np.diff(np.concatenate((starts, [len(uid)])))
        p = cnt.astype(np.float64) / np.repeat(n_ev, n_ty).astype(np.float64)
        h = np.add.reduceat(-p * np.log2(p), starts)
        ubits = np.floor(1e6 * h + 0.5).astype(np.int64)
        take = np.lexsort((uid[starts], -ubits))[:k]
        return pa.table(
            {
                "user_id": pa.array(uid[starts][take], pa.int64()),
                "n_events": pa.array(n_ev[take], pa.int64()),
                "n_types": pa.array(n_ty[take].astype(np.int64), pa.int64()),
                "entropy_ubits": pa.array(ubits[take], pa.int64()),
            }
        )

    out = agg_keys_shuffled(
        [os.path.join(sf_dir, "events.parquet")],
        key_cols=["user_id", "event_type"],
        aggs=[("event_type", "count")],
        bucket_cols=["user_id"],
        having_fn=entropy_topk,
        read_cols=["user_id", "event_type"],
    )
    if out.num_rows == 0:
        return _empty()
    srt = out.sort_by([("entropy_ubits", "descending"), ("user_id", "ascending")])
    return srt.slice(0, k)


def _ws_tokens(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """ASCII-whitespace tokenizer ≡ the oracle's regexp_extract_all(text,
    '\\S+') (RE2 \\s is ASCII-only): ascii_trim + run-collapsing
    ascii_split — utf8_trim would eat Unicode whitespace (NBSP, em-space)
    that \\S+ keeps inside tokens. Sole divergence: the all-ASCII-whitespace
    string yields [''] here vs [] in SQL — every caller is ''-safe (len-1
    lists make no n-grams; flat unigram counts filter ''; the prefix join
    of [''] is '' on both sides). ONE definition for all tokenizing query
    sites — do not inline the kernel pair again."""
    return pc.ascii_split_whitespace(pc.ascii_trim_whitespace(text))


def _prefix_tokens_joined(text: pa.ChunkedArray | pa.Array, n: int) -> pa.Array:
    """First-n-token fingerprint string (tokens joined by one space) —
    equals the oracle's
    array_to_string(list_slice(regexp_extract_all(text,'\\S+'),1,n),' ')
    on every input including the all-whitespace document ('' both sides)."""
    head = pc.list_slice(_ws_tokens(text), 0, n)
    return pc.binary_join(head.cast(pa.list_(pa.string())), " ")


def label_conflicts_documents(sf_dir: str, n_tokens: int = 8) -> pa.Table:
    """LABEL-CONFLICT detection (the training-label hygiene audit): groups
    of documents that share their first-8-token fingerprint but carry
    MORE THAN ONE lang label — the same content labeled two ways poisons
    a classifier in a way plain dedup never reports. One shuffle keyed by
    (fingerprint, lang) but BUCKETED by fingerprint hash only, so every
    label of one fingerprint meets in one reduce task; the reduce keeps
    only conflicted groups, so the driver receives O(conflicts) rows —
    never the fingerprint table. Distinct-label count excludes NULL
    (count(DISTINCT lang) semantics); n_docs and keep_id cover all
    members. Only 16-byte hashes, 32-char hex and ids ever move — text
    stays in the map tasks."""
    from ..stages.shuffle import agg_keys_shuffled
    from ..util import hash_column, md5_hex

    def _empty() -> pa.Table:
        return pa.table(
            {
                "prefix_md5": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "n_langs": pa.array([], pa.int64()),
                "keep_id": pa.array([], pa.int64()),
            }
        )

    def fingerprint_rows(tbl: pa.Table) -> pa.Table:
        pre = _prefix_tokens_joined(tbl.column("text").combine_chunks(), n_tokens)
        # int64 ahash is the SHUFFLE key (never group by strings —
        # CLAUDE.md); the md5 hex rides along for the output/oracle.
        h = hash_column(pre).view(np.int64)
        return pa.table(
            {
                "h": pa.array(h, pa.int64()),
                "prefix_md5": md5_hex(pre),
                "lang": tbl.column("lang"),
                "doc_id": tbl.column("doc_id"),
            }
        )

    def conflicts_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty()
        srt = t.sort_by([("h", "ascending"), ("prefix_md5", "ascending")])
        h = np.asarray(srt.column("h").combine_chunks(), dtype=np.int64)
        # group on (h, md5), not h alone: the exact md5 is already
        # co-sorted, so an ahash collision can't merge two fingerprints
        md5 = srt.column("prefix_md5").combine_chunks()
        md5_brk = np.asarray(
            pc.not_equal(md5.slice(1), md5.slice(0, max(len(md5) - 1, 0))), dtype=bool
        )
        starts = np.flatnonzero(np.concatenate(([True], (h[1:] != h[:-1]) | md5_brk)))
        ends = np.concatenate((starts[1:], [len(h)]))
        cnt = np.asarray(srt.column("cnt").combine_chunks(), dtype=np.int64)
        mid = np.asarray(srt.column("min_doc_id").combine_chunks(), dtype=np.int64)
        valid_lang = np.asarray(
            pc.is_valid(srt.column("lang").combine_chunks()), dtype=np.int64
        )
        n_docs = np.add.reduceat(cnt, starts)
        n_langs = np.add.reduceat(valid_lang, starts)  # one row per (h, lang)
        keep = np.minimum.reduceat(mid, starts)
        mask = n_langs > 1
        if not mask.any():
            return _empty()
        idx = starts[mask]
        return pa.table(
            {
                "prefix_md5": srt.column("prefix_md5").take(pa.array(idx, pa.int64())),
                "n_docs": pa.array(n_docs[mask], pa.int64()),
                "n_langs": pa.array(n_langs[mask], pa.int64()),
                "keep_id": pa.array(keep[mask], pa.int64()),
            }
        )

    out = agg_keys_shuffled(
        [os.path.join(sf_dir, "documents.parquet")],
        key_cols=["h", "prefix_md5", "lang"],
        aggs=[("doc_id", "min"), ("doc_id", "count")],
        bucket_cols=["h"],
        transform_fn=fingerprint_rows,
        having_fn=conflicts_only,
        read_cols=["doc_id", "text", "lang"],
    )
    if out.num_rows == 0:
        return _empty()
    return out.sort_by("prefix_md5")


def ttr_documents(sf_dir: str, k: int = 25, min_tokens: int = 10) -> pa.Table:
    """LEXICAL DIVERSITY ranking: per-document type-token ratio (distinct
    tokens ÷ tokens, basis points, integer multiply-first) with the k
    most diverse documents reported — the low-information/boilerplate
    complement to repetition_documents (which hunts the bottom of this
    scale). Entirely batch-local: one vectorized tokenize, one
    dictionary-encode, one np.unique over (doc, token-code) keys per
    batch, a per-batch top-k (exact — a document lives wholly in one
    batch), then a driver re-top-k over B×k candidate rows. Total order
    (ttr_bp desc, doc_id asc) pins the k-boundary."""

    def _empty() -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
                "ttr_bp": pa.array([], pa.int64()),
            }
        )

    def ttr_topk(batch: pa.Table) -> pa.Table:
        text = batch.column("text").combine_chunks()
        toks = _ws_tokens(text)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        doc_id = np.asarray(batch.column("doc_id").combine_chunks(), dtype=np.int64)
        keep = lens >= min_tokens  # also drops the [''] all-whitespace doc
        if not keep.any():
            return _empty()
        flat = pc.list_flatten(toks).dictionary_encode()
        codes = np.asarray(flat.indices, dtype=np.int64)
        vocab = len(flat.dictionary)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        uniq = np.unique(doc_idx * max(vocab, 1) + codes)
        n_distinct = np.bincount((uniq // max(vocab, 1)), minlength=len(lens))
        n_tok = lens[keep]
        n_dis = n_distinct[keep].astype(np.int64)
        ids = doc_id[keep]
        ttr_bp = (10000 * n_dis) // n_tok
        take = np.lexsort((ids, -ttr_bp))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[take], pa.int64()),
                "n_tokens": pa.array(n_tok[take], pa.int64()),
                "n_distinct": pa.array(n_dis[take], pa.int64()),
                "ttr_bp": pa.array(ttr_bp[take], pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    cand = _collect(ds.map_batches(ttr_topk, batch_format="pyarrow"))
    if cand.num_rows == 0:
        return _empty()
    srt = cand.sort_by([("ttr_bp", "descending"), ("doc_id", "ascending")])
    return srt.slice(0, k)


def zscore_outliers_documents(sf_dir: str, z: int = 2) -> pa.Table:
    """GROUPED Z-SCORE anomaly detection, EXACT: documents whose n_chars
    sits more than z population standard deviations from their language's
    mean. No floats anywhere — z·σ < |x−μ| is evaluated as
    (n·x − S₁)² > z²·(n·S₂ − S₁²) over integer moments, and the per-row
    test uses the integer square root T = isqrt(z²·(n·S₂ − S₁²)):
    |n·x − S₁| > T is EXACTLY equivalent (T = ⌊√R⌋ ⇒ d² > R ⇔ |d| > T),
    so the engine's int64 row kernel matches the oracle's HUGEINT algebra
    bit-for-bit with no widening multiply on the hot path. Pass 1: one
    tiny per-lang moment shuffle; pass 2: broadcast {lang: (n, S₁, T)}
    dict into a streaming filter. NULL langs form their own group; NULL
    n_chars rows are excluded (both sides)."""
    import math

    from ..stages.shuffle import agg_keys_shuffled

    def with_square(tbl: pa.Table) -> pa.Table:
        x = np.asarray(tbl.column("n_chars").combine_chunks(), dtype=np.int64)
        return tbl.append_column("nc2", pa.array(x * x, pa.int64()))

    moments = agg_keys_shuffled(
        [os.path.join(sf_dir, "documents.parquet")],
        key_cols=["lang"],
        aggs=[("n_chars", "count"), ("n_chars", "sum"), ("nc2", "sum")],
        transform_fn=lambda t: with_square(t.filter(pc.is_valid(t.column("n_chars")))),
        read_cols=["lang", "n_chars"],
    )
    bounds: dict = {}
    for row in moments.to_pylist():
        n, s1, s2 = int(row["cnt"]), int(row["sum_n_chars"]), int(row["sum_nc2"])
        r = z * z * (n * s2 - s1 * s1)  # Python ints: exact at any scale
        bounds[row["lang"]] = (n, s1, math.isqrt(max(r, 0)))

    def keep_outliers(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column("n_chars")))
        if batch.num_rows == 0:
            return batch
        langs = batch.column("lang").combine_chunks()
        x = np.asarray(batch.column("n_chars").combine_chunks(), dtype=np.int64)
        ld = langs.dictionary_encode()
        cats = ld.dictionary.to_pylist()
        cats = cats or [None]  # all-NULL batch: keep the lookup arrays non-empty
        nn = np.array([bounds.get(c, (0, 0, 0))[0] for c in cats], dtype=np.int64)
        ss = np.array([bounds.get(c, (0, 0, 0))[1] for c in cats], dtype=np.int64)
        tt = np.array([bounds.get(c, (0, 0, 0))[2] for c in cats], dtype=np.int64)
        code = np.asarray(ld.indices.fill_null(0), dtype=np.int64)
        null_grp = bounds.get(None, (0, 0, 0))
        is_null = ~np.asarray(pc.is_valid(langs), dtype=bool)
        n_r = np.where(is_null, null_grp[0], nn[code])
        s_r = np.where(is_null, null_grp[1], ss[code])
        t_r = np.where(is_null, null_grp[2], tt[code])
        d = n_r * x - s_r
        return batch.filter(pa.array(np.abs(d) > t_r))

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    out = _collect(ds.map_batches(keep_outliers, batch_format="pyarrow"))
    if out.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "lang": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        )
    return out.select(["doc_id", "lang", "n_chars"]).sort_by("doc_id")


def bigram_pmi_documents(sf_dir: str, k: int = 25, min_count: int = 5) -> pa.Table:
    """COLLOCATION mining: the k adjacent-token bigrams with the highest
    pointwise mutual information among those seen ≥ min_count times — the
    multi-word-expression / template detector behind tokenizer-merge and
    boilerplate decisions (raw bigram counts rank stopword pairs first;
    PMI ranks genuinely associated pairs). Two key shuffles, both with
    per-shard combiners: (1) bigram counts — the map derives within-doc
    adjacent pairs from ONE flatten + boundary mask (no per-row loop);
    (2) unigram counts. Each reduce applies the min_count floor (a token
    inside a frequent bigram is itself frequent: c(a) ≥ c(a,b), so the
    unigram floor drops nothing the join needs) and emits its bucket's
    PRE-FILTER total as a NULL-keyed sentinel row, so the driver sees
    O(frequent) rows plus exact corpus totals, never the tail. PMI is one
    log2 of a ratio of double products, ordered exactly as the oracle SQL;
    floor(1e6·x + 0.5) µbits, total order (pmi_ubits desc, t0, t1).
    At larger corpora raise min_count (the driver-side result is
    O(bigrams above the floor))."""
    from ..stages.shuffle import agg_keys_shuffled

    def bigram_rows(tbl: pa.Table) -> pa.Table:
        toks = _ws_tokens(tbl.column("text").combine_chunks())
        flat = pc.list_flatten(toks)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        n = len(flat)
        left = np.ones(n, dtype=bool)
        ends = np.cumsum(lens)
        last = ends[lens > 0] - 1  # last token of each nonempty doc
        left[last] = False
        idx = np.nonzero(left)[0]
        return pa.table(
            {
                "t0": flat.take(pa.array(idx, pa.int64())),
                "t1": flat.take(pa.array(idx + 1, pa.int64())),
            }
        )

    def unigram_rows(tbl: pa.Table) -> pa.Table:
        toks = _ws_tokens(tbl.column("text").combine_chunks())
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))  # the [''] all-whitespace doc
        return pa.table({"token": flat})

    def floor_with_total(key_cols: list[str]):
        def having(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            total = pc.sum(t.column("cnt")).as_py() or 0
            kept = t.filter(pc.greater_equal(t.column("cnt"), min_count))
            sentinel = pa.table(
                {
                    **{c: pa.array([None], t.schema.field(c).type) for c in key_cols},
                    "cnt": pa.array([total], pa.int64()),
                }
            )
            return pa.concat_tables([kept.select(key_cols + ["cnt"]), sentinel])

        return having

    import ray

    paths = [os.path.join(sf_dir, "documents.parquet")]
    # launch BOTH shuffles before materializing either (output="refs" is
    # non-blocking), so the bigram and unigram corpus scans overlap
    # instead of running back-to-back (review r5 session-5)
    bc_refs = agg_keys_shuffled(
        paths, key_cols=["t0", "t1"], aggs=[("t0", "count")],
        transform_fn=bigram_rows, having_fn=floor_with_total(["t0", "t1"]),
        read_cols=["text"], output="refs",
    )
    uc_refs = agg_keys_shuffled(
        paths, key_cols=["token"], aggs=[("token", "count")],
        transform_fn=unigram_rows, having_fn=floor_with_total(["token"]),
        read_cols=["text"], output="refs",
    )

    def _gather(refs) -> pa.Table:
        tables = [t for t in ray.get(refs) if t.num_rows]
        return pa.concat_tables(tables) if tables else pa.table({})

    bc = _gather(bc_refs)
    uc = _gather(uc_refs)

    def _empty() -> pa.Table:
        return pa.table(
            {
                "t0": pa.array([], pa.string()),
                "t1": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
                "pmi_ubits": pa.array([], pa.int64()),
            }
        )

    if bc.num_rows == 0 or uc.num_rows == 0:
        return _empty()
    bi_sent = pc.is_null(bc.column("t0"))
    n_bi = pc.sum(bc.filter(bi_sent).column("cnt")).as_py() or 0
    bc = bc.filter(pc.invert(bi_sent))
    uni_sent = pc.is_null(uc.column("token"))
    n_tok = pc.sum(uc.filter(uni_sent).column("cnt")).as_py() or 0
    uc = uc.filter(pc.invert(uni_sent))
    if bc.num_rows == 0 or n_bi == 0 or n_tok == 0:
        return _empty()
    lookup = dict(
        zip(uc.column("token").to_pylist(), uc.column("cnt").to_pylist())
    )
    t0 = bc.column("t0").to_pylist()
    t1 = bc.column("t1").to_pylist()
    cab = np.asarray(bc.column("cnt").combine_chunks(), dtype=np.float64)
    ca = np.array([lookup[t] for t in t0], dtype=np.float64)
    cb = np.array([lookup[t] for t in t1], dtype=np.float64)
    # same double-op order as the oracle: (cnt·n_tok·n_tok)/(n_bi·c_a·c_b)
    ratio = (cab * float(n_tok) * float(n_tok)) / (float(n_bi) * ca * cb)
    ubits = np.floor(1e6 * np.log2(ratio) + 0.5).astype(np.int64)
    out = pa.table(
        {
            "t0": bc.column("t0"),
            "t1": bc.column("t1"),
            "cnt": bc.column("cnt").cast(pa.int64()),
            "pmi_ubits": pa.array(ubits, pa.int64()),
        }
    )
    srt = out.sort_by(
        [("pmi_ubits", "descending"), ("t0", "ascending"), ("t1", "ascending")]
    )
    return srt.slice(0, k)


RELEVANCE_TERMS = ("scan", "merge", "window", "spill")  # mirrored in the oracle SQL


def relevance_topk_documents(sf_dir: str, k: int = 25) -> pa.Table:
    """KEYWORD RELEVANCE SEARCH (vector-free retrieval): the k documents
    scoring highest against a fixed query-term set under tf·idf with
    add-one smoothing, idf_t = log2((N+1)/(df_t+1)) — the lexical
    retrieval baseline every RAG/eval pipeline needs beside the
    embedding ANN path. Pass 1 is one streaming scan producing FIVE
    integers (corpus N + per-term df via a per-batch isin + (doc, term)
    dedupe); pass 2 re-scans, bincounts per-term tf per doc, scores with
    the idf vector and keeps a per-batch top-k (exact — a doc lives
    wholly in one batch); the driver re-top-ks B×k rows. The float score
    is a fixed-length sum in DECLARED term order (left-to-right, exactly
    the op order the oracle SQL spells out term by term), reported in
    µunits via floor(1e6·s + 0.5); zero-match docs are dropped by an
    integer tf-sum test, never by the float."""
    terms = RELEVANCE_TERMS

    def _tok(batch: pa.Table):
        return _ws_tokens(batch.column("text").combine_chunks())

    def df_partial(batch: pa.Table) -> pa.Table:
        toks = _tok(batch)
        flat = pc.list_flatten(toks)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        out = {"n_docs": pa.array([batch.num_rows], pa.int64())}
        for t in terms:
            hit = np.asarray(pc.equal(flat, t).fill_null(False), dtype=bool)
            out[f"df_{t}"] = pa.array(
                [int(len(np.unique(doc_idx[hit])))], pa.int64()
            )
        return pa.table(out)

    parts = _collect(_read(sf_dir, "documents", ["text"]).map_batches(
        df_partial, batch_format="pyarrow"
    ))
    n_docs = int(pc.sum(parts.column("n_docs")).as_py() or 0)
    df = {t: int(pc.sum(parts.column(f"df_{t}")).as_py() or 0) for t in terms}
    idf = np.array(
        [np.log2((n_docs + 1.0) / (df[t] + 1.0)) for t in terms], dtype=np.float64
    )

    def _empty() -> pa.Table:
        cols = {"doc_id": pa.array([], pa.int64())}
        for t in terms:
            cols[f"tf_{t}"] = pa.array([], pa.int64())
        cols["score_uunits"] = pa.array([], pa.int64())
        return pa.table(cols)

    def score_topk(batch: pa.Table) -> pa.Table:
        toks = _tok(batch)
        flat = pc.list_flatten(toks)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        tf = np.zeros((len(lens), len(terms)), dtype=np.int64)
        for j, t in enumerate(terms):
            hit = np.asarray(pc.equal(flat, t).fill_null(False), dtype=bool)
            tf[:, j] = np.bincount(doc_idx[hit], minlength=len(lens))
        keep = tf.sum(axis=1) > 0  # integer drop test, never the float
        if not keep.any():
            return _empty()
        tfk = tf[keep]
        # fixed-length left-to-right sum in declared term order — the
        # exact op sequence the oracle writes out term by term
        score = tfk[:, 0].astype(np.float64) * idf[0]
        for j in range(1, len(terms)):
            score = score + tfk[:, j].astype(np.float64) * idf[j]
        uunits = np.floor(1e6 * score + 0.5).astype(np.int64)
        ids = np.asarray(batch.column("doc_id").combine_chunks(), dtype=np.int64)[keep]
        take = np.lexsort((ids, -uunits))[:k]
        cols = {"doc_id": pa.array(ids[take], pa.int64())}
        for j, t in enumerate(terms):
            cols[f"tf_{t}"] = pa.array(tfk[take, j], pa.int64())
        cols["score_uunits"] = pa.array(uunits[take], pa.int64())
        return pa.table(cols)

    cand = _collect(_read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score_topk, batch_format="pyarrow"
    ))
    if cand.num_rows == 0:
        return _empty()
    srt = cand.sort_by([("score_uunits", "descending"), ("doc_id", "ascending")])
    return srt.slice(0, k)


def burst_events(sf_dir: str) -> pa.Table:
    """BURST DETECTION (temporal anomaly): (hour, event_type) cells whose
    volume exceeds 3× that type's per-hour average — the incident/replay
    spike monitor a per-type daily total hides. One (hour, type)
    count-table shuffle (domain = stream hours × types, the bounded-
    domain convention of drift_ks/grouped_quantiles); the threshold is
    ALL-INTEGER multiply-first (cnt·n_hours > 3·type_total, n_hours =
    distinct hours in the whole stream), so no float average ever
    exists. The driver evaluates the filter over the tiny count table."""
    from ..stages.shuffle import agg_keys_shuffled

    def hour_of(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": _floor_time_bucket(tbl.column("ts"), 3_600_000_000),
                "event_type": tbl.column("event_type"),
            }
        )

    c = agg_keys_shuffled(
        [os.path.join(sf_dir, "events.parquet")],
        key_cols=["h", "event_type"],
        aggs=[("h", "count")],
        transform_fn=hour_of,
        read_cols=["ts", "event_type"],
    )

    def _empty() -> pa.Table:
        return pa.table(
            {
                "h": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )

    if c.num_rows == 0:
        return _empty()
    h_col = c.column("h").combine_chunks()
    h_valid = np.asarray(pc.is_valid(h_col), dtype=bool)
    hv = np.asarray(h_col.fill_null(0))
    cnt = np.asarray(c.column("cnt").combine_chunks(), dtype=np.int64)
    # COUNT(DISTINCT h) skips the NULL hour; its (NULL, type) cells still
    # count toward totals and are tested like any other cell (SQL join)
    n_hours = len(np.unique(hv[h_valid]))
    et = c.column("event_type").combine_chunks().dictionary_encode()
    codes = np.asarray(et.indices.fill_null(len(et.dictionary)), dtype=np.int64)
    totals = np.zeros(len(et.dictionary) + 1, dtype=np.int64)
    np.add.at(totals, codes, cnt)  # integer accumulate (bincount weights are float)
    mask = cnt * n_hours > 3 * totals[codes]
    if not mask.any():
        return _empty()
    out = c.filter(pa.array(mask)).select(["h", "event_type", "cnt"])
    return out.sort_by([("h", "ascending"), ("event_type", "ascending")])


def ngram_novelty_documents(sf_dir: str, n: int = 3) -> pa.Table:
    """DISTINCT-n DIVERSITY / NOVELTY report: over all within-doc token
    trigrams, how many distinct trigram TYPES exist, how many are
    singletons (seen exactly once), and the two basis-point ratios
    (types/instances, singletons/instances) — the standard repetition /
    memorization corpus metric (distinct-n). The trigram domain is
    corpus-sized, so the driver NEVER sees it: one (t0,t1,t2)-keyed count
    shuffle whose reduces collapse to three scalars each (types,
    singletons, instances — a trigram type lives wholly in one bucket);
    the driver sums B scalar rows. Trigram derivation is one flatten +
    per-doc boundary exclusion (no row loop)."""
    from ..stages.shuffle import agg_keys_shuffled

    def trigram_rows(tbl: pa.Table) -> pa.Table:
        toks = _ws_tokens(tbl.column("text").combine_chunks())
        flat = pc.list_flatten(toks)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        left = np.ones(len(flat), dtype=bool)
        ends = np.cumsum(lens)
        left[ends[lens > 0] - 1] = False  # last token of each doc
        left[ends[lens > 1] - 2] = False  # second-to-last (len ≥ 2 only)
        idx = np.nonzero(left)[0]
        return pa.table(
            {
                "t0": flat.take(pa.array(idx, pa.int64())),
                "t1": flat.take(pa.array(idx + 1, pa.int64())),
                "t2": flat.take(pa.array(idx + 2, pa.int64())),
            }
        )

    def scalars(t: pa.Table) -> pa.Table:
        cnt = np.asarray(t.column("cnt").combine_chunks(), dtype=np.int64)
        return pa.table(
            {
                "n_types": pa.array([len(cnt)], pa.int64()),
                "n_singletons": pa.array([int((cnt == 1).sum())], pa.int64()),
                "n_total": pa.array([int(cnt.sum())], pa.int64()),
            }
        )

    parts = agg_keys_shuffled(
        [os.path.join(sf_dir, "documents.parquet")],
        key_cols=["t0", "t1", "t2"],
        aggs=[("t0", "count")],
        transform_fn=trigram_rows,
        having_fn=scalars,
        read_cols=["text"],
    )
    n_types = int(pc.sum(parts.column("n_types")).as_py() or 0)
    n_single = int(pc.sum(parts.column("n_singletons")).as_py() or 0)
    n_total = int(pc.sum(parts.column("n_total")).as_py() or 0)
    return pa.table(
        {
            "n_types": pa.array([n_types], pa.int64()),
            "n_singletons": pa.array([n_single], pa.int64()),
            "n_total": pa.array([n_total], pa.int64()),
            "distinct_bp": pa.array(
                [(10000 * n_types) // n_total if n_total else 0], pa.int64()
            ),
            "novelty_bp": pa.array(
                [(10000 * n_single) // n_total if n_total else 0], pa.int64()
            ),
        }
    )


def assoc_rules_events(sf_dir: str, min_users: int = 5) -> pa.Table:
    """ASSOCIATION-RULE mining over user behavior (the full market-basket
    triple behind cooccurrence_events' raw counts): for every ORDERED
    event-type pair a→b, support / confidence / lift in basis points —
    all integer multiply-first, so no float probability ever exists.
    ONE user-bucketed shuffle (same bucket_cols route as cooccurrence):
    each reduce emits its unordered pair counts, per-type user counts and
    its distinct-user total in one discriminated (t_a, t_b, n) table
    (t_b NULL → type row, both NULL → user total — users partition across
    buckets, so all three sum). The driver mirrors pairs into both
    directions and evaluates the O(types²) rule table. NULL event_type
    never forms a rule (matching the oracle's non-null DISTINCT set)."""
    from ..stages.shuffle import agg_keys_shuffled

    def bucket_partials(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "t_a": pa.array([], pa.string()),
                "t_b": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        t = t.filter(pc.is_valid(t.column("event_type")))
        if t.num_rows == 0:
            return empty
        uid, codes, types, key, counts = _user_type_pairs(t)
        nt = len(types)
        ta, tb, n = [], [], []
        if len(key):
            ta.extend(types.take(pa.array(key // nt, pa.int64())).to_pylist())
            tb.extend(types.take(pa.array(key % nt, pa.int64())).to_pylist())
            n.extend(counts.astype(np.int64).tolist())
        # per-type distinct-user counts (one row per (user, type))
        tkey, tcnt = np.unique(codes, return_counts=True)
        ta.extend(types.take(pa.array(tkey, pa.int64())).to_pylist())
        tb.extend([None] * len(tkey))
        n.extend(tcnt.astype(np.int64).tolist())
        # this bucket's distinct users
        ta.append(None)
        tb.append(None)
        n.append(int(len(np.unique(uid))))
        return pa.table(
            {
                "t_a": pa.array(ta, pa.string()),
                "t_b": pa.array(tb, pa.string()),
                "n": pa.array(n, pa.int64()),
            }
        )

    parts = agg_keys_shuffled(
        [os.path.join(sf_dir, "events.parquet")],
        key_cols=["user_id", "event_type"],
        aggs=[("event_type", "count")],
        bucket_cols=["user_id"],
        having_fn=bucket_partials,
        read_cols=["user_id", "event_type"],
    )

    def _empty() -> pa.Table:
        cols = ["t_a", "t_b", "n_a", "n_b", "n_both", "support_bp", "conf_bp", "lift_bp"]
        types_ = [pa.string(), pa.string()] + [pa.int64()] * 6
        return pa.table({c: pa.array([], t) for c, t in zip(cols, types_)})

    if parts.num_rows == 0:
        return _empty()
    rows = parts.to_pylist()
    n_users = sum(r["n"] for r in rows if r["t_a"] is None and r["t_b"] is None)
    type_n: dict = {}
    pair_n: dict = {}
    for r in rows:
        if r["t_a"] is None:
            continue
        if r["t_b"] is None:
            type_n[r["t_a"]] = type_n.get(r["t_a"], 0) + r["n"]
        else:
            k = (r["t_a"], r["t_b"])
            pair_n[k] = pair_n.get(k, 0) + r["n"]
    out = []
    for (a, b), nb in pair_n.items():
        if nb < min_users:
            continue
        for ta, tb in ((a, b), (b, a)):  # mirror into ordered rules
            na, nbb = type_n[ta], type_n[tb]
            out.append(
                {
                    "t_a": ta,
                    "t_b": tb,
                    "n_a": na,
                    "n_b": nbb,
                    "n_both": nb,
                    "support_bp": (10000 * nb) // n_users,
                    "conf_bp": (10000 * nb) // na,
                    "lift_bp": (10000 * nb * n_users) // (na * nbb),
                }
            )
    if not out:
        return _empty()
    out.sort(key=lambda r: (r["t_a"], r["t_b"]))
    return pa.table(
        {c: pa.array([r[c] for r in out]) for c in
         ["t_a", "t_b", "n_a", "n_b", "n_both", "support_bp", "conf_bp", "lift_bp"]}
    )


def conversion_latency_events(sf_dir: str, cap_hours: int = 48) -> pa.Table:
    """CONVERSION-LATENCY histogram: for every user with at least one
    'view' and one 'purchase', hours between FIRST view and FIRST
    purchase, bucketed (capped at 48 h; first-purchase-before-first-view
    lands in bucket −1) — the time-to-convert distribution the ordered
    funnel count hides. Map tasks thin to the two relevant types before
    the shuffle (the combiner then carries at most two min-ts rows per
    user); one user-bucketed min-aggregate shuffle; each reduce emits its
    (gap_hours, n_users) histogram rows — a user lives wholly in one
    bucket, so driver summation is exact. All integer µs arithmetic."""
    from ..stages.shuffle import agg_keys_shuffled

    HOUR = 3_600_000_000

    def thin(tbl: pa.Table) -> pa.Table:
        et = tbl.column("event_type")
        keep = pc.or_kleene(pc.equal(et, "view"), pc.equal(et, "purchase"))
        sub = tbl.filter(pc.fill_null(keep, False))
        return pa.table(
            {
                "user_id": sub.column("user_id"),
                "event_type": sub.column("event_type"),
                "t": sub.column("ts").cast(pa.int64()),
            }
        )

    def gap_hist(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"gap_hours": pa.array([], pa.int64()), "n_users": pa.array([], pa.int64())}
        )
        # a user whose every ts for a type is NULL has min_t NULL — the
        # oracle's v/p IS NOT NULL drops them, so drop the rows here too
        t = t.filter(pc.is_valid(t.column("min_t")))
        if t.num_rows == 0:
            return empty
        srt = t.sort_by([("user_id", "ascending"), ("event_type", "ascending")])
        uid = np.asarray(srt.column("user_id").combine_chunks(), dtype=np.int64)
        mt = np.asarray(srt.column("min_t").combine_chunks(), dtype=np.int64)
        starts = np.flatnonzero(np.concatenate(([True], uid[1:] != uid[:-1])))
        sizes = np.diff(np.concatenate((starts, [len(uid)])))
        both = sizes == 2  # exactly one purchase row + one view row
        if not both.any():
            return empty
        s = starts[both]
        # event_type sorts 'purchase' < 'view', so row s is the purchase
        gap = mt[s] - mt[s + 1]  # p − v
        hours = np.where(gap >= 0, np.minimum(gap // HOUR, cap_hours), -1)
        vals, counts = np.unique(hours, return_counts=True)
        return pa.table(
            {
                "gap_hours": pa.array(vals.astype(np.int64), pa.int64()),
                "n_users": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    parts = agg_keys_shuffled(
        [os.path.join(sf_dir, "events.parquet")],
        key_cols=["user_id", "event_type"],
        aggs=[("t", "min")],
        bucket_cols=["user_id"],
        transform_fn=thin,
        having_fn=gap_hist,
        read_cols=["user_id", "event_type", "ts"],
    )
    if parts.num_rows == 0:
        return pa.table(
            {"gap_hours": pa.array([], pa.int64()), "n_users": pa.array([], pa.int64())}
        )
    out = (
        parts.group_by(["gap_hours"])
        .aggregate([("n_users", "sum")])
        .rename_columns(["gap_hours", "n_users"])
    )
    return out.sort_by("gap_hours")


def vocab_growth_documents(sf_dir: str, buckets: int = 10) -> pa.Table:
    """VOCABULARY-GROWTH curve (Heaps' law audit): split the corpus into
    10 doc-id deciles and report how many NEW distinct tokens each decile
    introduces plus the cumulative vocabulary — the diminishing-returns
    signal behind 'will more data still grow the tokenizer's coverage?'.
    The token domain is corpus-sized, so it never reaches the driver
    whole: one token-keyed shuffle whose pre-aggs carry min(first decile)
    per token (mergeable), and whose reduces collapse to a ≤buckets-row
    (decile, new_tokens) histogram each; the driver sums B histograms and
    prefix-sums. Decile = doc_id·10 // N with N read from the parquet
    footer — the same metadata-count convention as drift_ks_events."""
    import pyarrow.parquet as pq_

    from ..stages.shuffle import agg_keys_shuffled

    path = os.path.join(sf_dir, "documents.parquet")
    n_docs = pq_.read_metadata(path).num_rows

    def token_decile(tbl: pa.Table) -> pa.Table:
        toks = _ws_tokens(tbl.column("text").combine_chunks())
        flat = pc.list_flatten(toks)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        ids = np.asarray(tbl.column("doc_id").combine_chunks(), dtype=np.int64)
        dec = np.repeat(ids * buckets // max(n_docs, 1), lens)
        keep = np.asarray(pc.not_equal(flat, ""), dtype=bool)  # [''] docs
        return pa.table(
            {
                "token": flat.filter(pa.array(keep)),
                "dec": pa.array(dec[keep], pa.int64()),
            }
        )

    def decile_hist(t: pa.Table) -> pa.Table:
        dec = np.asarray(t.column("min_dec").combine_chunks(), dtype=np.int64)
        vals, counts = np.unique(dec, return_counts=True)
        return pa.table(
            {
                "decile": pa.array(vals, pa.int64()),
                "new_tokens": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    parts = agg_keys_shuffled(
        [path],
        key_cols=["token"],
        aggs=[("dec", "min")],
        transform_fn=token_decile,
        having_fn=decile_hist,
        read_cols=["doc_id", "text"],
    )
    if parts.num_rows == 0:
        return pa.table(
            {
                "decile": pa.array([], pa.int64()),
                "new_tokens": pa.array([], pa.int64()),
                "cum_vocab": pa.array([], pa.int64()),
            }
        )
    per = (
        parts.group_by(["decile"])
        .aggregate([("new_tokens", "sum")])
        .rename_columns(["decile", "new_tokens"])
        .sort_by("decile")
    )
    new = np.asarray(per.column("new_tokens").combine_chunks(), dtype=np.int64)
    return pa.table(
        {
            "decile": per.column("decile"),
            "new_tokens": per.column("new_tokens"),
            "cum_vocab": pa.array(np.cumsum(new), pa.int64()),
        }
    )


def _floor_time_bucket(ts_col, div_us: int, mod: int | None = None) -> pa.Array:
    """int64 FLOOR-division time bucket (numpy's native semantics): the
    physically meaningful binning — floor assigns (−1 h, 0) and (0, 1 h)
    to DIFFERENT hours, and floor-mod keeps hour-of-day in 0..23 for
    pre-1970 timestamps too. DuckDB's integer // truncates toward zero
    and % follows the dividend, so the oracles spell floor out with an
    integer CASE adjustment (`x // d − (x < 0 AND x % d ≠ 0)`), never a
    float division (epoch µs exceed 2^53). NULL ts stays NULL (its own
    group on both sides where the query keeps it)."""
    ts = ts_col.cast(pa.int64())
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    null_mask = ~np.asarray(pc.is_valid(ts), dtype=bool)
    q = np.asarray(ts.fill_null(0)) // div_us
    if mod is not None:
        q = q % mod
    return pa.array(q, pa.int64(), mask=null_mask)


def seasonality_chisq_events(sf_dir: str) -> pa.Table:
    """SEASONALITY / UNIFORMITY goodness-of-fit: per event type, the
    chi-square statistic of its hour-of-day histogram against the uniform
    profile — the replay/bot detector (organic traffic has a daily cycle;
    a uniform or single-spike profile flags synthetic streams). EXACT and
    all-integer via the algebraic identity
    χ² = Σ_h (o_h·24 − T)² / (T·24) over ALL 24 hours (absent hours
    contribute T²), reported ×100 with one floor division — scaled Python
    ints, so no overflow at any corpus size. One bounded (type, hour)
    count-table shuffle; the driver evaluates O(types) rows."""
    from ..stages.shuffle import agg_keys_shuffled

    H = 24

    def hod(tbl: pa.Table) -> pa.Table:
        # NULL ts carries no hour information — excluded on both sides
        tbl = tbl.filter(pc.is_valid(tbl.column("ts")))
        return pa.table(
            {
                "event_type": tbl.column("event_type"),
                "hod": _floor_time_bucket(tbl.column("ts"), 3_600_000_000, H),
            }
        )

    c = agg_keys_shuffled(
        [os.path.join(sf_dir, "events.parquet")],
        key_cols=["event_type", "hod"],
        aggs=[("hod", "count")],
        transform_fn=hod,
        read_cols=["ts", "event_type"],
    )

    def _empty() -> pa.Table:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "n_hours_present": pa.array([], pa.int64()),
                "chisq_centi": pa.array([], pa.int64()),
            }
        )

    if c.num_rows == 0:
        return _empty()
    per: dict = {}
    for r in c.to_pylist():  # O(types × 24) rows
        t = per.setdefault(r["event_type"], [0, 0, []])
        t[0] += r["cnt"]
        t[1] += 1
        t[2].append(r["cnt"])
    types = sorted((k for k in per if k is not None)) + (
        [None] if None in per else []
    )
    rows = []
    for k in types:
        n, hrs, os_ = per[k]
        sp = sum((o * H - n) * (o * H - n) for o in os_)  # Python ints: exact
        chisq = (100 * (sp + (H - hrs) * n * n)) // (n * H)
        rows.append({"event_type": k, "n": n, "n_hours_present": hrs, "chisq_centi": chisq})
    return pa.table(
        {
            "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
            "n_hours_present": pa.array([r["n_hours_present"] for r in rows], pa.int64()),
            "chisq_centi": pa.array([r["chisq_centi"] for r in rows], pa.int64()),
        }
    )
