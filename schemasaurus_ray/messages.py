"""Message catalog + format registry.

Catalog transcribed from the reference's src/messages.js:3-37 (same codes,
same texts). Formats from src/v4validator.js:8-33 (same built-in names and
regex semantics, translated to Python ``re``). ``%d``/``%s`` placeholders are
kept verbatim in the catalog; :func:`render` interpolates them with the error
arg (the reference leaves messages uninterpolated in the error record — we
interpolate for the violation sink but keep ``code``/``arg`` authoritative).
"""

from __future__ import annotations

import re
from typing import Any

MESSAGES: dict[str, str] = {
    "string": "shall be a string",
    "null": "shall be null",
    "minLength": "shall have length at least %d",
    "maxLength": "shall have length no more than %d",
    "pattern": "shall match pattern %s",
    "integer": "shall be an integer",
    "multipleOf": "shall be multiple of %d",
    "number": "shall be a number",
    "minimum": "shall be >= %d",
    "minimum.exclusive": "shall be > %d",
    "maximum": "shall be <= %d",
    "maximum.exclusive": "shall be < %d",
    "boolean": "shall be boolean",
    "object": "shall be object",
    "additionalProperties": "shall not have additional properties",
    "minProperties": "shall have at least %d properties",
    "maxProperties": "shall have no more than %d properties",
    "array": "shall be array",
    "additionalItems": "shall not have additional items",
    "minItems": "shall have at least %d items",
    "maxItems": "shall have no more %d items",
    "uniqueItems": "shall have unique items",
    "enum": "shall be one of values %s",
    "required": "is required",
    "dependency": "does not meet additional requirements for %s",
    "not": "does not meet 'not' requirement",
    "oneOf": "does not meet exactly one requirement",
    "oneOf.zero": "does not meet any requirement",
    "allOf": "does not meet all requirements",
    "anyOf": "does not meet any requirement",
    "custom": "is not valid",
    # engine-native table-level codes (no reference counterpart, SURVEY.md §2E)
    "unique": "shall be globally unique",
    "reference": "shall reference an existing %s",
    "drift.ks": "distribution drifted (KS=%s)",
    "drift.psi": "distribution drifted (PSI=%s)",
    "schema.type": "column type shall be %s",
    "schema.missing": "column is missing from the table",
    "schema.unexpected": "column is not declared in the spec",
}

# Built-in formats: same names + patterns as the reference
# (src/v4validator.js:8-33). JS regexes are unanchored-search by default but
# these are all self-anchored with ^...$ in the source; Python re.search keeps
# identical semantics.
FORMATS: dict[str, dict[str, str]] = {
    "email": {"regexp": r"^[^@]+@[^@]+$", "message": "shall be valid email"},
    "date-time": {
        "regexp": r"^\d{4}-(?:0[0-9]{1}|1[0-2]{1})-[0-9]{2}[tT ]\d{2}:\d{2}:\d{2}(\.\d+)?([zZ]|[+-]\d{2}:\d{2})$",
        "message": "shall be valid date",
    },
    "ipv4": {
        "regexp": r"^(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$",
        "message": "shall be valid ipv4 address",
    },
    "ipv6": {
        "regexp": (
            r"^\s*((([0-9A-Fa-f]{1,4}:){7}([0-9A-Fa-f]{1,4}|:))|(([0-9A-Fa-f]{1,4}:){6}(:[0-9A-Fa-f]{1,4}"
            r"|((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3})|:))"
            r"|(([0-9A-Fa-f]{1,4}:){5}(((:[0-9A-Fa-f]{1,4}){1,2})|:((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
            r"(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3})|:))|(([0-9A-Fa-f]{1,4}:){4}(((:[0-9A-Fa-f]{1,4}){1,3})"
            r"|((:[0-9A-Fa-f]{1,4})?:((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:))"
            r"|(([0-9A-Fa-f]{1,4}:){3}(((:[0-9A-Fa-f]{1,4}){1,4})|((:[0-9A-Fa-f]{1,4}){0,2}"
            r":((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:))"
            r"|(([0-9A-Fa-f]{1,4}:){2}(((:[0-9A-Fa-f]{1,4}){1,5})|((:[0-9A-Fa-f]{1,4}){0,3}"
            r":((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:))"
            r"|(([0-9A-Fa-f]{1,4}:){1}(((:[0-9A-Fa-f]{1,4}){1,6})|((:[0-9A-Fa-f]{1,4}){0,4}"
            r":((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:))"
            r"|(:(((:[0-9A-Fa-f]{1,4}){1,7})|((:[0-9A-Fa-f]{1,4}){0,5}"
            r":((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:)))(%.+)?\s*$"
        ),
        "message": "shall be valid ipv6 address",
    },
    "uri": {"regexp": r"^[a-zA-Z][a-zA-Z0-9+-.]*:[^\s]*$", "message": "shall be valid URI"},
    "hostname": {
        "regexp": r"^([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])(\.([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9]))*$",
        "message": "shall be valid host name",
    },
}

_PLACEHOLDER = re.compile(r"%[ds]")


def render(template: str, arg: Any) -> str:
    """Splice ``arg`` into the first %d/%s placeholder (reference keeps these
    raw; analogue of src/interpolate.js used by renderers)."""
    if arg is None or not _PLACEHOLDER.search(template):
        return template
    # function replacement: a plain-string repl is parsed for \-escapes by
    # re (an arg containing a literal "\u..." raises re.error); the lambda
    # splices the text verbatim, matching the reference's string splice
    return _PLACEHOLDER.sub(lambda _m: str(arg), template, count=1)


def resolve_formats(user_formats: dict[str, dict[str, str]] | None) -> dict[str, dict[str, Any]]:
    """Merge user formats over built-ins and compile regexes once (the
    reference's fillDefaultFormats, src/v4validator.js:8-33 + options.formats
    src/v4validator.js:44-45)."""
    merged: dict[str, dict[str, Any]] = {}
    for name, f in {**FORMATS, **(user_formats or {})}.items():
        rx = f["regexp"]
        merged[name] = {
            "regexp": rx,
            "compiled": re.compile(rx) if isinstance(rx, str) else rx,
            "message": f.get("message", "shall match format " + name),
        }
    return merged
