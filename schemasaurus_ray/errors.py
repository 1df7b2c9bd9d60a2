"""Error-record model.

Mirrors the reference's error shape ``{code, message, value, arg, path}``
(reference: src/v4validator.js:57-67) as an immutable Python record, plus the
``MISSING`` sentinel distinguishing *absent* values (JS ``undefined``) from
JSON ``null`` — the distinction that drives the ``[^required]`` short-circuit
(reference: src/v4validator.js:81-86).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any


class _Missing:
    """Sentinel for an absent value (JS ``undefined``)."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:  # pragma: no cover
        return "MISSING"

    def __bool__(self) -> bool:
        return False


MISSING = _Missing()


@dataclass(frozen=True)
class ValidationError:
    """One violation. ``path`` components are stringified (the reference is
    inconsistent about int vs str indices in paths — see SURVEY.md §2B note on
    test/validator_spec.js:203 vs :245; we normalize to str)."""

    code: str
    message: str
    value: Any
    arg: Any
    path: tuple[str, ...]

    def as_row(self) -> dict[str, Any]:
        return {
            "code": self.code,
            "message": self.message,
            "value": _json_safe(self.value),
            "arg": _json_safe(self.arg),
            "path": "/".join(self.path),
        }


def _json_safe(v: Any) -> str | None:
    if v is MISSING:
        return None
    try:
        return json.dumps(v, sort_keys=True, default=repr)
    except (TypeError, ValueError):  # pragma: no cover
        return repr(v)


@dataclass
class ValidationResult:
    """``{valid, errors}`` — reference: src/v4validator.js:377-380 (we return a
    fresh object per call instead of the reference's reused one)."""

    valid: bool = True
    errors: list[ValidationError] = field(default_factory=list)

    def codes(self) -> list[str]:
        return [e.code for e in self.errors]


class SpecError(Exception):
    """Raised at compile time for malformed specs (unknown format, remote
    $ref, ...) — mirrors the reference's compile-time throws
    (src/compiler.js:10-12, src/v4validator.js:252)."""
