#!/usr/bin/env python
"""Null-heavy medium-scale oracle-parity stress sweep.

The sf fixtures carry NO NULL keys, NO pre-epoch timestamps and a tiny
vocabulary, so several engine paths (NULL grouping through the raw
shuffles, floor-vs-truncation time bucketing, top-k boundaries over a
real vocabulary) are only exercised here: 1M events (zipf users, NULL
event_type and NULL/pre-epoch ts) + 50k documents (2000-token vocab,
NULL langs, planted conflicting-label prefix groups), EVERY oracle-backed
query over these two tables compared against its registered DuckDB oracle
(the list is derived from oracle_sql()'s table references).

This sweep caught six real defect classes on first runs: the pyarrow
multi-key NULL-group split, truncation-vs-floor time bucketing, NaT →
INT64_MIN ordering in the temporal kernels (fixed by the timed-events
contract), Ray-Data sort-groupby crashes on NULL string keys, a missing
required-violation clause in the validate_events oracle, and NULL-unsafe
category joins/factorization in drift verdicts and NTILE. Run it after
touching the shuffle layer or any time-bucketed/tokenizing query.

Usage: python scripts/stress_parity.py   (~2 min, owns its Ray session)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Heavy near-dup / decontamination pipelines are excluded by default:
# their DuckDB verification oracles are quadratic-ish at this volume
# (--full measured 28+ min INSIDE one near-dup oracle before being
# stopped; the ENGINE sides run in seconds and carry their own pytest
# goldens + sf0.1 oracle coverage). asof/activity_window are gated for
# the same reason (inequality self-join, ~5 min under zipf skew).
SLOW = {
    "minhash_neardup_documents", "ngram_jaccard_neardup_documents",
    "dedup_neardup_survivors_documents", "dedup_neardup_keep_best_documents",
    "neardup_incremental_documents", "dup_passages_documents",
    "decontaminate_passages_documents", "decontaminate_documents",
    "curate_documents", "dedup_incremental_documents",
    "contamination_by_split_documents", "winnow_passages_documents",
    "asof_events_purchase", "activity_window_events",
    "langid_documents", "langid_confusion_documents",
}


def derive_queries(entry) -> list[str]:
    """Every oracle-backed query whose SQL touches ONLY the events /
    documents tables (the two this fixture synthesizes)."""
    import re

    tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
    out = []
    for name, sql in entry.oracle_sql().items():
        deps = {t for t in tables if re.search(rf"\b{t}\b", sql)}
        if deps <= {"events", "documents"}:
            out.append(name)
    return out


def build_fixture(base: str, n_events: int = 1_000_000, n_docs: int = 50_000) -> None:
    rng = np.random.default_rng(123)
    uid = rng.zipf(1.3, n_events) % 20_000
    types = np.array(["view", "click", "purchase", "error", "share", None], dtype=object)
    et = types[rng.integers(0, 6, n_events)]
    ts = rng.integers(-3_600_000_000 * 10, 3_600_000_000 * 400, n_events)
    ts_obj = np.where(rng.random(n_events) < 0.002, None, ts).tolist()
    ev = pa.table(
        {
            "event_id": pa.array(np.arange(n_events, dtype=np.int64)),
            "ts": pa.array(
                [None if v is None else int(v) for v in ts_obj], pa.timestamp("us")
            ),
            "user_id": pa.array(uid.astype(np.int64)),
            "event_type": pa.array(et.tolist(), pa.string()),
            "value": pa.array(rng.normal(size=n_events)),
            "props": pa.array(['{"k": 1}'] * n_events),
        }
    )
    pq.write_table(ev, os.path.join(base, "events.parquet"))

    vocab = np.array([f"w{i}" for i in range(2000)], dtype=object)
    langs = np.array(["en", "de", "fr", "es", "zh", None], dtype=object)
    doc_lens = rng.integers(5, 60, n_docs)
    texts = [" ".join(vocab[rng.integers(0, 2000, L)]) for L in doc_lens]
    for i in range(0, 3000, 3):  # conflicting-label prefix groups
        pre = " ".join(vocab[rng.integers(0, 2000, 8)])
        texts[i] = pre + " tail" + str(i)
        texts[i + 1] = pre + " tail" + str(i + 1)
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs[rng.integers(0, 6, n_docs)].tolist(), pa.string()),
            "source": pa.array([f"s{int(i)}" for i in rng.integers(0, 30, n_docs)]),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        }
    )
    pq.write_table(docs, os.path.join(base, "documents.parquet"))


def main() -> int:
    import ray

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    base = "/tmp/schemasaurus_ray/stress_parity"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    build_fixture(base)

    import __ray_entry__ as entry

    full = "--full" in sys.argv
    qs, osql = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{base}/events.parquet'")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{base}/documents.parquet'")

    def canon(t):
        # the driver's compare: sort columns by name, then rows
        t = t.select(sorted(t.column_names))
        return sorted(
            t.to_pylist(),
            key=lambda r: tuple((v is None, str(v)) for v in r.values()),
        )

    failures = 0
    for name in derive_queries(entry):
        if name in SLOW and not full:
            continue
        t0 = time.time()
        try:
            got = qs[name](base)
            want = con.execute(osql[name]).arrow()
            ok = canon(got) == canon(want)
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:120]}", flush=True)
            failures += 1
            continue
        print(f"{'ok  ' if ok else 'FAIL'} {name}: {got.num_rows} rows "
              f"({time.time() - t0:.2f}s)", flush=True)
        failures += 0 if ok else 1
    print("STRESS:", "ALL PASS" if failures == 0 else f"{failures} FAILURES")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
