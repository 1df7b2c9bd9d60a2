"""Spec walker — the engine analogue of the reference's ``newIterator``
(src/iterator.js:10-19): pre-order co-traversal of a schema with
selector-matched callbacks in the reference's firing order
*attr → start → plain → children → end → attr-end*
(stepProcess, src/compiler.js:256-273), including the ``schemaOnly`` walk
(no document — every items-schema visited once, src/int/processor.js:43-47).

Used for plan building and for user tools (the reference's form-generator
example, examples/formgen.js): a tool is a RuleRegistry whose handlers
accumulate state on a context object; ``walk`` drives them over the spec.
"""

from __future__ import annotations

from typing import Any, Callable

from .selector import RuleRegistry
from .spec import inline_refs


class WalkContext:
    """Per-walk state handed to every callback: path, parent, property,
    stop() short-circuit (reference CurrentObject, src/int/context.js:3-51 —
    minus the runtime value plumbing, which is plan-time here)."""

    def __init__(self) -> None:
        self.path: list[str] = []
        self.parent: dict | None = None
        self.property: str | None = None
        self._stopped = False

    def stop(self) -> None:
        self._stopped = True

    @property
    def is_stopped(self) -> bool:
        return self._stopped


def walk(schema: dict[str, Any], registry: RuleRegistry, state: Any = None) -> Any:
    """Walk the (inlined) schema firing registry handlers; returns ``state``.

    Handler signature: ``fn(node, ctx, state)``. Phases: handlers registered
    with ``:start`` fire before attribute handlers; ``:end`` after children;
    ``:item`` / ``:item-end`` around each items-schema visit.
    """
    schema = inline_refs(schema)
    ctx = WalkContext()

    def fire(node: Any, phase: str) -> None:
        if ctx.is_stopped:
            return
        for _raw, fn in registry.matching(node, phase):
            fn(node, ctx, state)
            if ctx.is_stopped:
                return

    def step(node: Any) -> None:
        if not isinstance(node, dict) or ctx.is_stopped:
            return
        fire(node, "start")
        fire(node, "")
        if ctx.is_stopped:
            return
        items = node.get("items")
        if isinstance(items, dict):
            fire(node, "item")
            _descend(items, "0", node)
            fire(node, "item-end")
        elif isinstance(items, list):
            for i, sub in enumerate(items):
                fire(node, "item")
                _descend(sub, str(i), node)
                fire(node, "item-end")
        for name, sub in (node.get("properties") or {}).items():
            _descend(sub, name, node)
        fire(node, "end")

    def _descend(sub: Any, prop: str, parent: dict | None = None) -> None:
        if ctx.is_stopped:
            return
        saved = (ctx.parent, ctx.property)
        ctx.path.append(prop)
        ctx.property = prop
        ctx.parent = parent
        step(sub)
        ctx.path.pop()
        ctx.parent, ctx.property = saved

    step(schema)
    return state
