"""Spec compiler: declarative TableSpec → executable rule plan.

The engine analogue of the reference compiler (src/compiler.js:294-319): the
spec is walked ONCE at plan time; each spec node is matched against the
selector registry (same grammar) and each match contributes a folded kernel
closure. The "compiled program" is a :class:`RowRulePlan` — a list of
column kernels plus plan-time schema checks — executed by
``stages/rulepack.RowRuleStage`` inside ``Dataset.map_batches``.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .errors import SpecError
from .kernels import KERNEL_FACTORIES, BoolMask, KernelRule, k_integer_valued, k_required, _message
from .messages import resolve_formats
from .refeval import RowValidator
from .selector import RuleRegistry
from .spec import TableSpec, parse_table_spec

# spec type → acceptable Arrow type predicates
_TYPE_OK: dict[str, Callable[[pa.DataType], bool]] = {
    "string": lambda t: pa.types.is_string(t) or pa.types.is_large_string(t),
    "integer": lambda t: pa.types.is_integer(t),
    "number": lambda t: pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t),
    "boolean": pa.types.is_boolean,
    "null": pa.types.is_null,
    "array": lambda t: pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t),
    "object": lambda t: pa.types.is_struct(t) or pa.types.is_map(t),
    # engine-native types the reference cannot express (SURVEY.md §1.2)
    "binary": lambda t: pa.types.is_binary(t) or pa.types.is_large_binary(t),
    "timestamp": pa.types.is_timestamp,
}


# Cross-column CHECK expression language (spec.CheckRule): JSON
# S-expressions compiled once at plan time into pyarrow.compute closures.
_EXPR_BINOPS: dict[str, Callable] = {
    "+": pc.add,
    "-": pc.subtract,
    "*": pc.multiply,
    "/": pc.divide,
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
    "==": pc.equal,
    "!=": pc.not_equal,
}


def compile_expr(expr: Any) -> tuple[Callable[[pa.Table], Any], set[str]]:
    """Compile a JSON S-expression into ``fn(table) -> pa.Array`` plus the
    set of referenced column names.

    Grammar: ``["col", name]`` column ref · scalar literals (int/float/
    str/bool) · binary ``+ - * / < <= > >= == !=`` · n-ary ``and``/``or``
    (Kleene three-valued, matching SQL) · unary ``not`` · unary ``len``
    (utf8 length). All kernels are vectorized ``pyarrow.compute`` calls;
    NULL propagates (SQL semantics) and is resolved by the caller."""
    cols: set[str] = set()

    def build(e: Any) -> Callable[[pa.Table], Any]:
        if isinstance(e, (list, tuple)):
            if not e:
                raise SpecError("empty check expression")
            op = e[0]
            if op == "col":
                if len(e) != 2 or not isinstance(e[1], str):
                    raise SpecError(f"bad column ref {e!r}")
                name = e[1]
                cols.add(name)
                return lambda t: t.column(name).combine_chunks()
            if op == "len":
                sub = build(e[1])
                return lambda t: pc.utf8_length(sub(t))
            if op == "not":
                sub = build(e[1])
                return lambda t: pc.invert(sub(t))
            if op in ("and", "or"):
                if len(e) < 3:
                    raise SpecError(f"{op} needs >= 2 operands")
                subs = [build(x) for x in e[1:]]
                kern = pc.and_kleene if op == "and" else pc.or_kleene

                def nary(t: pa.Table, subs=subs, kern=kern):
                    acc = subs[0](t)
                    for s in subs[1:]:
                        acc = kern(acc, s(t))
                    return acc

                return nary
            if op in _EXPR_BINOPS:
                if len(e) != 3:
                    raise SpecError(f"operator {op!r} takes exactly 2 operands")
                lhs, rhs = build(e[1]), build(e[2])
                kern = _EXPR_BINOPS[op]
                return lambda t: kern(lhs(t), rhs(t))
            raise SpecError(f"unknown check-expression op {op!r}")
        if isinstance(e, (bool, int, float, str)):
            return lambda t: e
        raise SpecError(f"bad check-expression node {e!r}")

    return build(expr), cols


@dataclass
class CompiledCheck:
    """A compiled cross-column CHECK: rule fires where the expression is
    definitively FALSE (NULL passes — SQL three-valued CHECK semantics)."""

    name: str
    columns: set[str]
    rule: KernelRule


@dataclass
class SchemaIssue:
    """Block-level violation: the whole column fails at plan time."""

    column: str
    code: str  # schema.type | schema.missing | schema.unexpected
    message: str
    arg: Any = None


@dataclass
class CombinatorRule:
    """allOf/anyOf/oneOf/not over sub-rule mask groups on one column
    (reference processAggregate, src/compiler.js:275-281; combinator
    semantics v4validator.js:170-219 → boolean mask algebra)."""

    column: str
    code_base: str  # allOf | anyOf | oneOf | not
    message: str
    sub_groups: list[list[KernelRule]] = field(default_factory=list)

    def evaluate(self, table: pa.Table, valid: BoolMask) -> list[tuple[str, BoolMask]]:
        """Returns [(code, bad_mask)]. ``valid`` = non-null row mask for the
        column (absent values skip combinators too)."""
        n = table.num_rows
        sub_bad = []
        for group in self.sub_groups:
            bad = np.zeros(n, dtype=bool)
            for rule in group:
                bad |= rule.fn(table)
            sub_bad.append(bad)
        if self.code_base == "allOf":
            bad = np.zeros(n, dtype=bool)
            for sb in sub_bad:
                bad |= sb
            return [("allOf", bad & valid)]
        if self.code_base == "anyOf":
            bad = np.ones(n, dtype=bool)
            for sb in sub_bad:
                bad &= sb
            return [("anyOf", bad & valid)]
        if self.code_base == "oneOf":
            ok_count = np.zeros(n, dtype=np.int32)
            for sb in sub_bad:
                ok_count += (~sb).astype(np.int32)
            return [
                ("oneOf.zero", (ok_count == 0) & valid),
                ("oneOf", (ok_count > 1) & valid),
            ]
        if self.code_base == "not":
            return [("not", (~sub_bad[0]) & valid)]
        raise SpecError(self.code_base)


@dataclass
class DependencyRule:
    """Cross-column conditional (reference dependencies,
    v4validator.js:147-166): when ``trigger`` column is non-null, the
    sub-rules (over sibling columns) must hold."""

    trigger: str
    message: str
    sub_rules: list[KernelRule] = field(default_factory=list)
    arg: Any = None

    def evaluate(self, table: pa.Table) -> BoolMask:
        trig = np.asarray(pc.is_valid(table.column(self.trigger).combine_chunks()))
        bad = np.zeros(table.num_rows, dtype=bool)
        for rule in self.sub_rules:
            rb = rule.fn(table)
            if rule.fires_on_null:
                # required-inside-dependency fires on nulls of the target col
                bad |= rb
            else:
                bad |= rb
        return bad & trig


@dataclass
class RowRulePlan:
    """Compiled per-row rule plan for one table."""

    spec: TableSpec
    opts: dict[str, Any]
    rules: list[KernelRule] = field(default_factory=list)
    combinators: list[CombinatorRule] = field(default_factory=list)
    dependencies: list[DependencyRule] = field(default_factory=list)
    json_columns: dict[str, RowValidator] = field(default_factory=dict)
    check_rules: list[CompiledCheck] = field(default_factory=list)
    # columns that require a per-row integer-valuedness check when the arrow
    # column is floating (resolved in bind())
    _integer_specs: dict[str, dict] = field(default_factory=dict)
    _type_specs: dict[str, Any] = field(default_factory=dict)
    _required_cols: list[str] = field(default_factory=list)

    def bind(self, schema: pa.Schema) -> "BoundPlan":
        """Resolve plan-time schema checks against the actual Arrow schema —
        the engine's 'type violations become schema mismatches' shift
        (SURVEY.md §1.2). Returns an executable BoundPlan."""
        issues: list[SchemaIssue] = []
        gettext = self.opts["gettext"]
        present = set(schema.names)
        dead_columns: set[str] = set()
        extra_rules: list[KernelRule] = []

        for col, cspec in self.spec.columns.items():
            if col not in present:
                if col in self._required_cols or cspec.get("required"):
                    issues.append(SchemaIssue(col, "schema.missing", _message(cspec, "schema.missing", None, gettext)))
                dead_columns.add(col)
                continue
            t = self._type_specs.get(col)
            if t is None:
                continue
            atype = schema.field(col).type
            alts = t if isinstance(t, list) else [t]
            ok = any(_TYPE_OK.get(alt, lambda _: True)(atype) for alt in alts)
            if not ok and "integer" in alts and pa.types.is_floating(atype):
                # float column can hold integers — per-row check instead
                extra_rules.append(k_integer_valued(col, cspec, self.opts))
                ok = True
            if not ok and "number" in alts and (pa.types.is_string(atype)):
                ok = False  # strings are not numbers; block-level issue
            if not ok:
                issues.append(
                    SchemaIssue(col, "schema.type", _message(cspec, "schema.type", t, gettext), arg=json.dumps(t))
                )
                dead_columns.add(col)

        if self.spec.extra_columns == "error":
            for name in schema.names:
                if name not in self.spec.columns and not name.startswith("__"):
                    issues.append(SchemaIssue(name, "schema.unexpected", _message({}, "schema.unexpected", None, gettext)))

        live = [r for r in self.rules if r.column not in dead_columns] + extra_rules
        for chk in self.check_rules:
            absent = sorted(c for c in chk.columns if c not in present)
            if absent:
                issues.append(
                    SchemaIssue(
                        chk.name,
                        "check.unbound",
                        f"check references missing column(s) {', '.join(absent)}",
                        arg=json.dumps(absent),
                    )
                )
            elif not any(c in dead_columns for c in chk.columns):
                live.append(chk.rule)
        combos = [c for c in self.combinators if c.column not in dead_columns]
        deps = [d for d in self.dependencies if d.trigger not in dead_columns]
        # json-mode columns absent from the batch are dropped here (the main
        # loop above already emitted schema.missing when required)
        live_json = {j: v for j, v in self.json_columns.items() if j in present}
        return BoundPlan(self, live, combos, deps, issues, live_json)


@dataclass
class BoundPlan:
    plan: RowRulePlan
    rules: list[KernelRule]
    combinators: list[CombinatorRule]
    dependencies: list[DependencyRule]
    schema_issues: list[SchemaIssue]
    json_columns: dict[str, RowValidator] = field(default_factory=dict)

    def evaluate(self, table: pa.Table) -> tuple[BoolMask, list[tuple[KernelRule, np.ndarray]]]:
        """Evaluate all rules on one Arrow batch.

        Returns (row_bad_mask, [(rule, violating_row_indices)]).
        """
        n = table.num_rows
        row_bad = np.zeros(n, dtype=bool)
        hits: list[tuple[KernelRule, np.ndarray]] = []

        for rule in self.rules:
            if rule.detail_fn is not None:
                # per-occurrence detail (uniqueItems): idx may repeat a row,
                # args carried on a per-batch clone of the rule
                occ_idx, occ_args, bad = rule.detail_fn(table)
                if bad.any():
                    row_bad |= bad
                    hits.append((dataclasses.replace(rule, occ_args=occ_args), occ_idx))
                continue
            bad = rule.fn(table)
            if bad.any():
                row_bad |= bad
                hits.append((rule, np.nonzero(bad)[0]))

        for combo in self.combinators:
            col = table.column(combo.column).combine_chunks()
            valid = np.asarray(pc.is_valid(col))
            for code, bad in combo.evaluate(table, valid):
                if bad.any():
                    row_bad |= bad
                    rule = KernelRule(combo.column, code, None, combo.message, lambda t: None)
                    hits.append((rule, np.nonzero(bad)[0]))

        for dep in self.dependencies:
            bad = dep.evaluate(table)
            if bad.any():
                row_bad |= bad
                rule = KernelRule(dep.trigger, "dependency", dep.arg, dep.message, lambda t: None)
                hits.append((rule, np.nonzero(bad)[0]))

        for col, validator in self.json_columns.items():
            vals = table.column(col).to_pylist()
            bad = np.zeros(n, dtype=bool)
            for i, raw in enumerate(vals):
                if raw is None:
                    continue
                try:
                    doc = json.loads(raw) if isinstance(raw, str) else raw
                except (ValueError, TypeError):
                    bad[i] = True
                    continue
                if not validator(doc).valid:
                    bad[i] = True
            if bad.any():
                row_bad |= bad
                rule = KernelRule(col, "json", None, "shall conform to the JSON schema", lambda t: None)
                hits.append((rule, np.nonzero(bad)[0]))

        return row_bad, hits


def _resolve_opts(spec_opts: dict[str, Any]) -> dict[str, Any]:
    gettext = spec_opts.get("gettext") or (lambda s: s)
    return {
        "gettext": gettext,
        "formats": resolve_formats(spec_opts.get("formats")),
        "custom": spec_opts.get("custom", {}),
    }


def compile_plan(spec: TableSpec | dict[str, Any], registry: RuleRegistry | None = None) -> RowRulePlan:
    """Compile a table spec into a RowRulePlan. ``registry`` allows
    user-extension: new selectors → kernel factories (the engine's
    V4Validator.extend / newIterator surface, SURVEY.md §2F)."""
    if isinstance(spec, dict):
        spec = parse_table_spec(spec)
    opts = _resolve_opts(spec.options)
    reg = registry or RuleRegistry(dict(KERNEL_FACTORIES))
    plan = RowRulePlan(spec=spec, opts=opts)

    for col, cspec in spec.columns.items():
        if not isinstance(cspec, dict):
            raise SpecError(f"column spec for {col} must be a dict")
        if cspec.get("mode") == "json":
            plan.json_columns[col] = RowValidator(cspec.get("schema", {}), spec.options)
            continue
        if cspec.get("required"):
            plan.rules.append(k_required(col, cspec, opts))
            plan._required_cols.append(col)
        if "type" in cspec:
            plan._type_specs[col] = cspec["type"]
        for raw, factory in reg.matching(cspec):
            made = factory(col, cspec, opts)
            plan.rules.extend(made if isinstance(made, list) else [made])
        for base in ("allOf", "anyOf", "oneOf"):
            if base in cspec:
                combo = CombinatorRule(col, base, _message(cspec, base, None, opts["gettext"]))
                for sub in cspec[base]:
                    combo.sub_groups.append(_compile_sub(col, sub, opts, reg))
                plan.combinators.append(combo)
        if "not" in cspec:
            combo = CombinatorRule(col, "not", _message(cspec, "not", None, opts["gettext"]))
            combo.sub_groups.append(_compile_sub(col, cspec["not"], opts, reg))
            plan.combinators.append(combo)
        if "dependencies" in cspec:
            # {"dependencies": {other_col: subspec-over-columns}} — when THIS
            # column is non-null, each dependent column spec must hold.
            # Array form (reference v4validator.js:147-156: dep list → rewritten
            # to {required: [...]}): every listed column must be non-null.
            deps = cspec["dependencies"]
            if isinstance(deps, list):  # ["colB", "colC"] → each required
                deps = {other: {"required": True} for other in deps}
            for other, sub in deps.items():
                if isinstance(sub, list):  # {"colB": ["colC", ...]} form
                    for o2 in sub:
                        plan.dependencies.append(
                            DependencyRule(
                                trigger=col,
                                message=_message(cspec, "dependency", o2, opts["gettext"]),
                                arg=o2,
                                sub_rules=[k_required(o2, {"required": True}, opts)],
                            )
                        )
                    continue
                dep = DependencyRule(
                    trigger=col,
                    message=_message(cspec, "dependency", other, opts["gettext"]),
                    arg=other,
                )
                if isinstance(sub, dict):
                    dep.sub_rules = _compile_sub(other, sub, opts, reg)
                    if sub.get("required"):
                        dep.sub_rules.append(k_required(other, sub, opts))
                plan.dependencies.append(dep)

    for chk in spec.checks:
        fn, chk_cols = compile_expr(chk.expr)
        msg = opts["gettext"](chk.message or f"shall satisfy check '{chk.name}'")

        def bad_fn(t: pa.Table, fn=fn) -> BoolMask:
            res = fn(t)
            if isinstance(res, pa.ChunkedArray):
                res = res.combine_chunks()
            # SQL CHECK: violation only when definitively FALSE (NULL passes)
            return ~np.asarray(pc.fill_null(res, True))

        plan.check_rules.append(
            CompiledCheck(
                name=chk.name,
                columns=chk_cols,
                rule=KernelRule(chk.name, "check", json.dumps(chk.expr), msg, bad_fn),
            )
        )
    return plan


def _compile_sub(col: str, sub: dict[str, Any], opts: dict, reg: RuleRegistry) -> list[KernelRule]:
    rules: list[KernelRule] = []
    for raw, factory in reg.matching(sub):
        made = factory(col, sub, opts)
        rules.extend(made if isinstance(made, list) else [made])
    return rules
