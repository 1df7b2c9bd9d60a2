"""Distribution-drift checks — per-partition KS / PSI vs a reference
snapshot (SURVEY.md §2E; verdict model follows the reference's per-document
{valid, errors} lifted to partitions, v4validator.js:377-380).

Per-batch partials (t-digest per numeric column, value-counts per
categorical column, keyed by partition) are emitted by the combined stage;
the driver merges per (partition, column) — O(partitions × columns), tiny —
and compares against the snapshot.
"""

from __future__ import annotations

import json
from collections import Counter
from typing import Any

import numpy as np
import pyarrow as pa

from ..spec import DriftRule
from ..state.tdigest import TDigest, ks_statistic, psi
from ..util import single_chunk


def batch_drift_partials(
    table: pa.Table, pids: np.ndarray, rule: DriftRule, digest_delta: int = 100
) -> list[dict[str, Any]]:
    """[{partition_id, column, kind: 'td'|'hist', payload}] for one batch."""
    out = []
    for pid in np.unique(pids):
        sel = pids == pid
        # one file = one pid is the common case: the whole batch belongs to
        # this pid, and take(arange(n)) would copy every column for nothing
        full = bool(sel.all())
        idx = None if full else pa.array(np.nonzero(sel)[0], pa.int64())
        for col in rule.numeric:
            if col not in table.column_names:
                continue
            c = single_chunk(table.column(col))
            vals = np.asarray((c if full else c.take(idx)).cast(pa.float64()).drop_null())
            if len(vals) == 0:
                continue
            td = TDigest(digest_delta)
            td.add(vals)
            out.append({"partition_id": int(pid), "column": col, "kind": "td", "payload": td.to_json()})
        for col in rule.categorical:
            if col not in table.column_names:
                continue
            c = single_chunk(table.column(col))
            arr = c if full else c.take(idx)
            counts = arr.drop_null().value_counts()
            hist = {str(v["values"]): int(v["counts"]) for v in counts.to_pylist()}
            out.append(
                {"partition_id": int(pid), "column": col, "kind": "hist", "payload": json.dumps(hist)}
            )
    return out


def merge_drift_partials(partials: list[dict[str, Any]]) -> dict[tuple[int, str], Any]:
    merged: dict[tuple[int, str], Any] = {}
    for rec in partials:
        key = (rec["partition_id"], rec["column"])
        if rec["kind"] == "td":
            td = TDigest.from_json(rec["payload"])
            if key in merged:
                merged[key].merge(td)
            else:
                merged[key] = td
        else:
            hist = Counter(json.loads(rec["payload"]))
            if key in merged:
                merged[key].update(hist)
            else:
                merged[key] = hist
    return merged


def build_snapshot(merged: dict[tuple[int, str], Any], rule: DriftRule) -> dict[str, Any]:
    """Collapse per-partition sketches into a global reference snapshot."""
    numeric: dict[str, TDigest] = {}
    categorical: dict[str, Counter] = {}
    for (pid, col), sketch in merged.items():
        if isinstance(sketch, TDigest):
            if col in numeric:
                numeric[col].merge(sketch)
            else:
                clone = TDigest.from_json(sketch.to_json())
                numeric[col] = clone
        else:
            categorical.setdefault(col, Counter()).update(sketch)
    return {
        "numeric": {c: td.to_json() for c, td in numeric.items()},
        "categorical": {c: dict(h) for c, h in categorical.items()},
    }


def compare_drift(
    merged: dict[tuple[int, str], Any], snapshot: dict[str, Any], rule: DriftRule
) -> list[dict[str, Any]]:
    """→ per-(partition, column) drift records with KS/PSI + pass/fail."""
    snap_num = {c: TDigest.from_json(s) for c, s in snapshot.get("numeric", {}).items()}
    snap_cat = snapshot.get("categorical", {})
    out = []
    for (pid, col), sketch in sorted(merged.items()):
        if isinstance(sketch, TDigest):
            if col not in snap_num:
                continue
            ks = ks_statistic(sketch, snap_num[col])
            out.append(
                {
                    "partition_id": pid,
                    "column": col,
                    "metric": "ks",
                    "value": ks,
                    "threshold": rule.ks_threshold,
                    "drifted": bool(ks > rule.ks_threshold),
                }
            )
        else:
            if col not in snap_cat:
                continue
            p = psi(snap_cat[col], dict(sketch))
            out.append(
                {
                    "partition_id": pid,
                    "column": col,
                    "metric": "psi",
                    "value": p,
                    "threshold": rule.psi_threshold,
                    "drifted": bool(p > rule.psi_threshold),
                }
            )
    return out
