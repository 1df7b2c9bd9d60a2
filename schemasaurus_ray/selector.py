"""Selector DSL — the rule-matching grammar of the reference iterator.

Grammar (reference: README.md:378-387, parser src/compiler.js:74-112):

- ``[attr]``          — node has attribute ``attr``
- ``[^attr]``         — node lacks attribute ``attr``
- ``[attr=value]``    — node attribute equals value (string compare of the literal)
- ``[^attr=value]``   — node attribute does not equal value
- ``[a][b]...``       — conjunction of clauses
- ``:start`` / ``:end`` / ``:item`` / ``:item-end`` — traversal-phase hooks

Instead of generating JS source, a matched rule contributes a *rule factory*
to the plan (SURVEY.md §2A: "Rule registry"). Matching is pure Python over
spec-node dicts; no Ray involvement.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Any, Callable

# one clause: [^?attr(=value)?]  — same shape as the reference's two regexes
# at src/compiler.js:54-55.
_CLAUSE = re.compile(r"\[(\^?)([^\[\]=]+)(?:=([^\[\]]*))?\]")
_PHASE = re.compile(r":(start|end|item|item-end)$")


@dataclass(frozen=True)
class Clause:
    negate: bool
    attr: str
    value: str | None  # raw literal; compared against str(node[attr])

    def matches(self, node: dict[str, Any]) -> bool:
        present = isinstance(node, dict) and self.attr in node
        if self.value is None:
            return present != self.negate
        if not present:
            # [attr=v] needs presence; [^attr=v] passes on absence
            return self.negate
        eq = _literal_eq(node[self.attr], self.value)
        return eq != self.negate


def _literal_eq(actual: Any, literal: str) -> bool:
    """Compare a node attribute against a selector literal. The reference
    splices the literal into generated JS and relies on ``==``; we compare
    against the JSON and string renderings of the value."""
    if isinstance(actual, bool):
        return literal in ("true", "false") and (literal == "true") == actual
    if isinstance(actual, (int, float)):
        try:
            return float(literal) == float(actual)
        except ValueError:
            return False
    if isinstance(actual, str):
        return actual == literal
    try:
        return json.dumps(actual) == literal
    except (TypeError, ValueError):  # pragma: no cover
        return False


@dataclass(frozen=True)
class Selector:
    """A parsed selector: conjunction of clauses + optional phase."""

    raw: str
    clauses: tuple[Clause, ...]
    phase: str  # "" | "start" | "end" | "item" | "item-end"

    def matches(self, node: Any) -> bool:
        if not isinstance(node, dict):
            return False
        return all(c.matches(node) for c in self.clauses)


def parse_selector(raw: str) -> Selector | None:
    """Parse a selector string; returns None for non-selector names (plain
    method names on a rule class that aren't selectors)."""
    phase = ""
    body = raw
    m = _PHASE.search(body)
    if m:
        phase = m.group(1)
        body = body[: m.start()]
    clauses = []
    pos = 0
    while pos < len(body):
        m = _CLAUSE.match(body, pos)
        if not m:
            return None
        clauses.append(Clause(negate=m.group(1) == "^", attr=m.group(2), value=m.group(3)))
        pos = m.end()
    if not clauses and not phase:
        return None
    return Selector(raw=raw, clauses=tuple(clauses), phase=phase)


class RuleRegistry:
    """Ordered registry of ``selector → handler``; the engine analogue of a
    selector class passed to newIterator (reference: src/iterator.js:12,
    prepareMatchers src/compiler.js:175-186). Handlers fire in registration
    order for every spec node they match — the ordering contract the
    reference tests via spy selectors (test/iterator_spec.js:12-157).

    Subclass-style extension (the reference's V4Validator.extend,
    src/v4validator.js:391-416) is ``registry.extend({selector: handler})`` →
    a new registry with overrides applied."""

    def __init__(self, handlers: dict[str, Callable] | None = None):
        self._order: list[tuple[Selector, str, Callable]] = []
        self._by_raw: dict[str, Callable] = {}
        for raw, fn in (handlers or {}).items():
            self.register(raw, fn)

    def register(self, raw: str, fn: Callable) -> None:
        sel = parse_selector(raw)
        if sel is None:
            raise ValueError(f"not a selector: {raw!r}")
        if raw in self._by_raw:  # override keeps original position
            self._order = [
                (s, r, fn if r == raw else f) for (s, r, f) in self._order
            ]
        else:
            self._order.append((sel, raw, fn))
        self._by_raw[raw] = fn

    def extend(self, overrides: dict[str, Callable]) -> "RuleRegistry":
        child = RuleRegistry()
        child._order = list(self._order)
        child._by_raw = dict(self._by_raw)
        for raw, fn in overrides.items():
            child.register(raw, fn)
        return child

    def matching(self, node: Any, phase: str = "") -> list[tuple[str, Callable]]:
        """All handlers whose selector matches ``node`` at ``phase``, in
        registration order."""
        return [
            (raw, fn)
            for (sel, raw, fn) in self._order
            if sel.phase == phase and (not sel.clauses or sel.matches(node))
        ]
