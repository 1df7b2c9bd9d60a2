"""Spec model: declarative validation specs + local $ref resolution.

A *column spec* is a JSON-Schema-draft-4-shaped dict (the reference's schema
language: type/enum/min*/max*/pattern/format/multipleOf/required/conform/
messages/default/items/properties/dependencies/allOf/anyOf/oneOf/not).

A *table spec* wraps per-column specs with table-level constraints the
reference cannot express (SURVEY.md §2E): ``unique``, ``references``,
``stats``, ``drift``.

$ref resolution follows the reference exactly: local JSON-Pointer only with
``~0``/``~1`` un-escaping; remote refs raise (src/compiler.js:10-34).
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Any

from .errors import SpecError


def detilde(part: str) -> str:
    """JSON-Pointer un-escaping (reference: src/compiler.js:14-18)."""
    return part.replace("~1", "/").replace("~0", "~")


def resolve_ref(root: dict[str, Any], ref: str) -> Any:
    """Local $ref lookup (reference defaultLoader, src/compiler.js:10-34)."""
    if not ref.startswith("#"):
        raise SpecError("Remote refs are not supported")
    node: Any = root
    for part in ref.lstrip("#").strip("/").split("/"):
        if not part:
            continue
        key = detilde(part)
        if isinstance(node, list):
            node = node[int(key)]
        elif isinstance(node, dict):
            if key not in node:
                raise SpecError(f"$ref target not found: {ref}")
            node = node[key]
        else:
            raise SpecError(f"$ref target not found: {ref}")
    return node


def inline_refs(schema: dict[str, Any], root: dict[str, Any] | None = None, _depth: int = 0) -> dict[str, Any]:
    """Return a copy of ``schema`` with local $refs inlined. Self-recursive
    schemas are rejected beyond a fixed depth (the reference guards root
    recursion with $$visited, src/compiler.js:236-242; a typed columnar table
    cannot be unboundedly recursive so we cap instead)."""
    root = root if root is not None else schema
    if _depth > 64:
        raise SpecError("$ref recursion too deep (recursive schemas unsupported)")

    def walk(node: Any, depth: int) -> Any:
        if isinstance(node, dict):
            if "$ref" in node:
                target = resolve_ref(root, node["$ref"])
                merged = {k: v for k, v in node.items() if k != "$ref"}
                resolved = walk(copy.deepcopy(target), depth + 1)
                if isinstance(resolved, dict):
                    resolved.update(merged)
                    return resolved
                return resolved
            return {k: walk(v, depth + 1) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, depth + 1) for v in node]
        return node

    if _depth == 0 and _count_refs(schema) == 0:
        return schema
    out = walk(copy.deepcopy(schema), _depth)
    if _count_refs(out):
        # nested refs-of-refs: iterate to fixpoint with the depth cap
        return inline_refs(out, root, _depth + 1)
    return out


def _count_refs(node: Any) -> int:
    if isinstance(node, dict):
        return ("$ref" in node) + sum(_count_refs(v) for v in node.values())
    if isinstance(node, list):
        return sum(_count_refs(v) for v in node)
    return 0


@dataclass
class UniqueRule:
    """Global uniqueness over one or more key columns (SURVEY.md §2E —
    uniqueItems v4validator.js:277-290 globalized to a shuffle)."""

    columns: tuple[str, ...]

    @property
    def name(self) -> str:
        return "+".join(self.columns)


@dataclass
class ReferenceRule:
    """Referential integrity: every value of ``column`` must exist in
    ``ref_table``.``ref_column`` (SURVEY.md §2E — dependencies
    v4validator.js:147-166 lifted cross-table)."""

    column: str
    ref_table: str
    ref_column: str


@dataclass
class DriftRule:
    """Per-partition distribution drift vs a reference snapshot:
    KS on numeric columns (via t-digest quantiles), PSI on categorical
    histograms (SURVEY.md §2E)."""

    numeric: tuple[str, ...] = ()
    categorical: tuple[str, ...] = ()
    snapshot: dict[str, Any] | None = None  # inline snapshot or None
    ks_threshold: float = 0.15
    psi_threshold: float = 0.25


@dataclass
class CheckRule:
    """Cross-column row-level CHECK constraint: a vectorized boolean
    expression over sibling columns (SQL ``CHECK`` semantics — a row
    violates only when the expression is definitively FALSE; NULL operands
    make the check pass, matching three-valued logic). The reference's
    ``dependencies`` keyword (v4validator.js:147-166) is the closest
    surface — this is its engine-native generalization to arbitrary
    arithmetic/comparison predicates, compiled at plan time into
    ``pyarrow.compute`` closures (plan.compile_expr)."""

    name: str
    expr: Any  # JSON S-expression, e.g. ["<=", ["+", ["col","a"], ["col","b"]], 1]
    message: str | None = None


@dataclass
class QuantileCheck:
    """Table-level percentile constraint (e.g. 'p99 of dur_ms ≤ 50000') —
    evaluated on the merged t-digest from the stats pass (mergeable and
    already persisted per shard, so it is resume-safe for free). The
    quantile is the t-digest approximation; use the exact bounded-domain
    path (stages/stats.exact_quantiles_from_counts) when exactness beats
    streaming."""

    column: str
    q: float
    minimum: float | None = None
    maximum: float | None = None


@dataclass
class TableSpec:
    """Compiled table-level spec."""

    columns: dict[str, dict[str, Any]] = field(default_factory=dict)
    unique: list[UniqueRule] = field(default_factory=list)
    references: list[ReferenceRule] = field(default_factory=list)
    stats: list[str] = field(default_factory=list)
    drift: DriftRule | None = None
    quantile_checks: list[QuantileCheck] = field(default_factory=list)
    checks: list[CheckRule] = field(default_factory=list)
    key_column: str | None = None  # row_ref source; default: first unique col
    extra_columns: str = "ignore"  # "ignore" | "error" (additionalProperties:false)
    options: dict[str, Any] = field(default_factory=dict)  # formats/custom/gettext/messages

    @property
    def row_ref_column(self) -> str | None:
        if self.key_column:
            return self.key_column
        if self.unique:
            return self.unique[0].columns[0]
        return None


def parse_table_spec(raw: dict[str, Any], options: dict[str, Any] | None = None) -> TableSpec:
    """Parse + $ref-inline a declarative table spec:

    ``{"columns": {name: columnschema}, "table": {"unique": [...],
    "references": [...], "stats": [...], "drift": {...}, "key": col,
    "additionalColumns": false}}``
    """
    raw = inline_refs(raw)
    cols = raw.get("columns", {})
    t = raw.get("table", {})
    unique = []
    for u in t.get("unique", []):
        unique.append(UniqueRule(tuple([u] if isinstance(u, str) else u)))
    refs = [
        ReferenceRule(column=r["column"], ref_table=r["table"], ref_column=r.get("key", r["column"]))
        for r in t.get("references", [])
    ]
    drift = None
    if "drift" in t:
        d = t["drift"]
        drift = DriftRule(
            numeric=tuple(d.get("numeric", [])),
            categorical=tuple(d.get("categorical", [])),
            snapshot=d.get("snapshot"),
            ks_threshold=d.get("ks_threshold", 0.15),
            psi_threshold=d.get("psi_threshold", 0.25),
        )
    qchecks = [
        QuantileCheck(
            column=qc["column"],
            q=float(qc["q"]),
            minimum=qc.get("minimum"),
            maximum=qc.get("maximum"),
        )
        for qc in t.get("quantile_checks", [])
    ]
    checks = [
        CheckRule(name=c["name"], expr=c["expr"], message=c.get("message"))
        for c in t.get("checks", [])
    ]
    return TableSpec(
        columns=cols,
        unique=unique,
        references=refs,
        stats=list(t.get("stats", [])),
        drift=drift,
        quantile_checks=qchecks,
        checks=checks,
        key_column=t.get("key"),
        extra_columns="error" if t.get("additionalColumns") is False else "ignore",
        options=options or raw.get("options", {}),
    )
