"""Row-level reference evaluator — the engine's ``noinline`` analogue.

Implements the reference's exact draft-4 keyword semantics over one Python
value (parsed JSON), per the verified semantics table in SURVEY.md §2B:

- absent optional values short-circuit ALL checks (src/v4validator.js:81-86)
- ``type`` union copies all alternatives' errors on total failure (:122-143)
- ``integer`` = number with ``% 1 == 0`` so ``1.0`` passes (:97-101)
- ``enum`` canonicalizes objects via JSON (toComparable, :54-56)
- guarded string/array/object keywords silently pass other types (:236-333)
- ``minimum``/``maximum`` + draft-4 boolean exclusives (:344-352) — applied
  to numbers only (typed semantics; the reference's JS-coercion quirk on
  non-numbers is intentionally NOT replicated, SURVEY.md §7 hard-part (a))
- combinators copy sub-errors (allOf/anyOf/oneOf/not, :170-219)
- ``dependencies`` property- and schema-form (:147-166)
- tuple ``items`` + ``additionalItems`` (:259-261, processor.js:49-61)
- ``additionalProperties`` with patternProperties exemption (processor.js:66-123)
- ``conform`` direct fn + named registry (:355-373)
- per-node ``messages`` override + gettext (:72-76, :37-41)

Used three ways: (1) conformance tests vs transcribed reference cases,
(2) cross-check of the vectorized Arrow kernels, (3) JSON-mode fallback for
dynamically-typed columns inside map_batches.
"""

from __future__ import annotations

import json
import re
from typing import Any, Callable

from .errors import MISSING, SpecError, ValidationError, ValidationResult
from .messages import MESSAGES, resolve_formats
from .spec import inline_refs

Number = (int, float)


def _is_number(v: Any) -> bool:
    return isinstance(v, Number) and not isinstance(v, bool)


def _is_object(v: Any) -> bool:
    return isinstance(v, dict)


def to_comparable(v: Any) -> Any:
    """Reference toComparable (src/v4validator.js:54-56): canonical JSON for
    objects/arrays, identity otherwise. booleans are kept distinct from 0/1
    (JS ``{}[true]`` keying uses "true", not 1)."""
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, (dict, list)):
        return json.dumps(v, sort_keys=True, separators=(",", ":"))
    return v


class RowValidator:
    """Compiled row-level validator for one schema. Construct once, call per
    value — the analogue of the reference's compiled closure
    (src/compiler.js:294-311) minus codegen."""

    def __init__(self, schema: dict[str, Any], options: dict[str, Any] | None = None):
        self.options = dict(options or {})
        self.gettext: Callable[[str], str] = self.options.get("gettext") or (lambda s: s)
        self.messages = {k: self.gettext(v) for k, v in MESSAGES.items()}
        if self.options.get("messages"):
            self.messages.update(self.options["messages"])
        self.custom = self.options.get("custom", {})
        self.formats = resolve_formats(self.options.get("formats"))
        # $refs resolve LAZILY during validation (reference resolveRef runs
        # during iteration with a $$visited guard, src/compiler.js:18-34):
        # recursion is bounded by VALUE depth, so self-recursive schemas
        # ($ref: "#") terminate naturally — eager inlining diverges on them.
        self.schema = schema
        self.root = schema
        self._check_known_formats(self.schema)
        self.errors: list[ValidationError] = []

    # -- compile-time validation -------------------------------------------
    def _check_known_formats(self, node: Any) -> None:
        """Unknown format → compile-time error (reference src/v4validator.js:252)."""
        if isinstance(node, dict):
            fmt = node.get("format")
            if isinstance(fmt, str) and fmt not in self.formats:
                raise SpecError(f"unknown format: {fmt}")
            for v in node.values():
                self._check_known_formats(v)
        elif isinstance(node, list):
            for v in node:
                self._check_known_formats(v)

    # -- error plumbing ------------------------------------------------------
    def _error(self, schema: dict, code: str, value: Any, path: list[str], arg: Any = None) -> None:
        node_messages = schema.get("messages") or {}
        if code in node_messages:
            msg = self.gettext(node_messages[code])
        else:
            msg = self.messages.get(code)
            if msg is None:
                msg = arg if arg else None
            if msg is None:
                raise SpecError(f"There is no message registered for error '{code}'")
        self.errors.append(
            ValidationError(code=code, message=msg, value=value, arg=arg, path=tuple(path))
        )

    # -- public API ----------------------------------------------------------
    def __call__(self, value: Any) -> ValidationResult:
        self.errors = []
        self._validate(self.schema, value, [], is_root=True)
        return ValidationResult(valid=not self.errors, errors=list(self.errors))

    def sub_validate(self, schema: dict[str, Any], value: Any, path: list[str]) -> ValidationResult:
        """Compile-and-run a sub-schema capturing its own error list
        (reference subCompile, src/compiler.js:156-173)."""
        saved = self.errors
        self.errors = []
        self._validate(schema, value, list(path), is_root=True)
        res = ValidationResult(valid=not self.errors, errors=list(self.errors))
        self.errors = saved
        return res

    # -- core recursion --------------------------------------------------------
    def _validate(
        self,
        schema: dict[str, Any],
        value: Any,
        path: list[str],
        is_root: bool = False,
        _refs_seen: tuple = (),
    ) -> None:
        if not isinstance(schema, dict):
            return
        if "$ref" in schema:
            from .spec import resolve_ref

            ref = schema["$ref"]
            # pure ref-to-ref cycles consume no value depth: without this
            # guard {"a": {"$ref": "#/b"}, "b": {"$ref": "#/a"}} recurses
            # forever. The guard resets (default ()) on every hop that
            # descends into the VALUE, so self-recursive schemas like
            # $ref:"#" under properties still validate.
            if ref in _refs_seen:
                raise SpecError(f"$ref cycle with no value progress: {ref}")
            target = resolve_ref(self.root, ref)
            siblings = {k: v for k, v in schema.items() if k != "$ref"}
            if isinstance(target, dict) and siblings:
                # sibling keys overlay the target (reference inlining merge)
                target = {**target, **siblings}
            return self._validate(
                target, value, path, is_root=is_root, _refs_seen=_refs_seen + (ref,)
            )
        # [^required] short-circuit: absent + not required → skip everything
        # (src/v4validator.js:81-86; not applied at root)
        if value is MISSING:
            if not is_root and not schema.get("required"):
                return
            if not is_root and schema.get("required") is True:
                # v3 per-property required is reported by the parent; the
                # child still runs its type check on undefined in the
                # reference (double-error quirk) — we emit single errors
                # (documented divergence, SURVEY.md §2B "required merged").
                return
            if is_root:
                # schemaOnly walk — nothing to check against
                return

        self._check_type(schema, value, path)
        self._check_enum(schema, value, path)
        self._check_string(schema, value, path)
        self._check_number(schema, value, path)
        self._check_array_bounds(schema, value, path)
        self._check_object_bounds(schema, value, path)
        self._check_required(schema, value, path)
        self._check_dependencies(schema, value, path)
        self._check_combinators(schema, value, path)
        self._check_conform(schema, value, path)
        self._recurse_items(schema, value, path)
        self._recurse_properties(schema, value, path)

    # -- type ------------------------------------------------------------------
    def _type_ok(self, t: str, value: Any) -> bool:
        if t == "string":
            return isinstance(value, str)
        if t == "number":
            return _is_number(value)
        if t == "integer":
            return _is_number(value) and float(value) % 1 == 0
        if t == "boolean":
            return isinstance(value, bool)
        if t == "null":
            return value is None
        if t == "array":
            return isinstance(value, list)
        if t == "object":
            return _is_object(value)
        return True

    def _type_code(self, t: str) -> str:
        return t  # codes equal type names (src/v4validator.js:87-143)

    def _check_type(self, schema: dict, value: Any, path: list[str]) -> None:
        t = schema.get("type")
        if t is None or value is MISSING:
            return
        if isinstance(t, str):
            if not self._type_ok(t, value):
                self._error(schema, self._type_code(t), value, path)
        elif isinstance(t, list):
            # union: fails only if every alternative fails; then copy ALL
            # alternatives' errors (src/v4validator.js:122-143)
            if not any(self._type_ok(alt, value) for alt in t):
                for alt in t:
                    self._error(schema, self._type_code(alt), value, path)

    # -- enum --------------------------------------------------------------------
    def _check_enum(self, schema: dict, value: Any, path: list[str]) -> None:
        if "enum" not in schema or value is MISSING:
            return
        allowed = {to_comparable(e) for e in schema["enum"]}
        if to_comparable(value) not in allowed:
            self._error(schema, "enum", value, path, arg=schema["enum"])

    # -- strings -------------------------------------------------------------------
    def _check_string(self, schema: dict, value: Any, path: list[str]) -> None:
        if not isinstance(value, str):
            return  # guarded: non-strings silently pass (src/v4validator.js:236-245)
        if "minLength" in schema and len(value) < schema["minLength"]:
            self._error(schema, "minLength", value, path, arg=schema["minLength"])
        if "maxLength" in schema and len(value) > schema["maxLength"]:
            self._error(schema, "maxLength", value, path, arg=schema["maxLength"])
        if "pattern" in schema and not re.search(schema["pattern"], value):
            self._error(schema, "pattern", value, path, arg=schema["pattern"])
        if "format" in schema:
            fmt = self.formats[schema["format"]]
            if not fmt["compiled"].search(value):
                self._error(schema, "format." + schema["format"], value, path, arg=fmt["message"])

    # -- numbers ----------------------------------------------------------------------
    def _check_number(self, schema: dict, value: Any, path: list[str]) -> None:
        if not _is_number(value):
            return  # typed semantics (divergence from JS coercion, documented)
        if "multipleOf" in schema and (value / schema["multipleOf"]) % 1 != 0:
            self._error(schema, "multipleOf", value, path, arg=schema["multipleOf"])
        if "minimum" in schema:
            lo, excl = schema["minimum"], schema.get("exclusiveMinimum", False)
            if value < lo or (excl and value == lo):
                self._error(schema, "minimum.exclusive" if excl else "minimum", value, path, arg=lo)
        if "maximum" in schema:
            hi, excl = schema["maximum"], schema.get("exclusiveMaximum", False)
            if value > hi or (excl and value == hi):
                self._error(schema, "maximum.exclusive" if excl else "maximum", value, path, arg=hi)

    # -- arrays ------------------------------------------------------------------------
    def _check_array_bounds(self, schema: dict, value: Any, path: list[str]) -> None:
        if not isinstance(value, list):
            return
        if "minItems" in schema and len(value) < schema["minItems"]:
            self._error(schema, "minItems", value, path, arg=schema["minItems"])
        if "maxItems" in schema and len(value) > schema["maxItems"]:
            self._error(schema, "maxItems", value, path, arg=schema["maxItems"])
        if schema.get("uniqueItems"):
            seen: set = set()
            for item in value:
                key = to_comparable(item)
                if key in seen:
                    # one error per duplicate occurrence, arg = dup value
                    # (src/v4validator.js:277-290)
                    self._error(schema, "uniqueItems", value, path, arg=item)
                seen.add(key)

    def _recurse_items(self, schema: dict, value: Any, path: list[str]) -> None:
        items = schema.get("items")
        if items is None or not isinstance(value, list):
            return
        if isinstance(items, dict):
            for i, item in enumerate(value):
                self._validate(items, item, path + [str(i)])
        elif isinstance(items, list):
            for i, sub in enumerate(items):
                if i < len(value):
                    self._validate(sub, value[i], path + [str(i)])
            if self.options.get("ignoreAdditionalItems"):
                # reference option: skip the whole "additional" traversal
                # (src/int/processor.js:54,71-86; compiler.js:135)
                return
            extra = schema.get("additionalItems", True)
            if extra is False:
                for i in range(len(items), len(value)):
                    self._error(schema, "additionalItems", value[i], path + [str(i)])
            elif isinstance(extra, dict):
                for i in range(len(items), len(value)):
                    self._validate(extra, value[i], path + [str(i)])

    # -- objects ------------------------------------------------------------------------
    def _check_object_bounds(self, schema: dict, value: Any, path: list[str]) -> None:
        if not _is_object(value):
            return
        if "minProperties" in schema and len(value) < schema["minProperties"]:
            self._error(schema, "minProperties", value, path, arg=schema["minProperties"])
        if "maxProperties" in schema and len(value) > schema["maxProperties"]:
            self._error(schema, "maxProperties", value, path, arg=schema["maxProperties"])

    def _required_names(self, schema: dict) -> list[str]:
        """draft-4 array form ∪ v3 per-property required:true
        (src/v4validator.js:310-321)."""
        reqs = list(schema.get("required", []) if isinstance(schema.get("required"), list) else [])
        for k, sub in (schema.get("properties") or {}).items():
            if isinstance(sub, dict) and sub.get("required") is True and k not in reqs:
                reqs.append(k)
        return reqs

    def _check_required(self, schema: dict, value: Any, path: list[str]) -> None:
        reqs = self._required_names(schema)
        if not reqs or not _is_object(value):
            return
        for name in reqs:
            if name not in value:
                self._error(schema, "required", value, path, arg=name)

    def _recurse_properties(self, schema: dict, value: Any, path: list[str]) -> None:
        if not _is_object(value):
            return
        props = schema.get("properties") or {}
        patterns = schema.get("patternProperties") or {}
        for name, sub in props.items():
            self._validate(sub, value.get(name, MISSING), path + [name])
        compiled = [(re.compile(p), sub) for p, sub in patterns.items()]
        for key, v in value.items():
            matched_pattern = False
            for rx, sub in compiled:
                if rx.search(key):
                    matched_pattern = True
                    self._validate(sub, v, path + [key])
            if key in props or matched_pattern:
                continue
            if self.options.get("ignoreAdditionalItems"):
                # reference option skips additional-property handling too
                # (src/int/processor.js:71-86)
                continue
            extra = schema.get("additionalProperties", True)
            if extra is False:
                # one error per unexpected key, path = key, value = extra value
                # (processor.js:112-123, v4validator.js:335-337)
                self._error(schema, "additionalProperties", v, path + [key])
            elif isinstance(extra, dict):
                self._validate(extra, v, path + [key])

    # -- dependencies ---------------------------------------------------------------------
    def _check_dependencies(self, schema: dict, value: Any, path: list[str]) -> None:
        deps = schema.get("dependencies")
        if not deps or not _is_object(value):
            return
        for prop, dep in deps.items():
            if prop not in value:
                continue
            dep_schema = {"required": dep} if isinstance(dep, list) else dep
            res = self.sub_validate(dep_schema, value, path)
            if not res.valid:
                self._error(schema, "dependency", value, path, arg=dep)
                self.errors.extend(res.errors)

    # -- combinators -----------------------------------------------------------------------
    def _check_combinators(self, schema: dict, value: Any, path: list[str]) -> None:
        if value is MISSING:
            return
        if "allOf" in schema:
            for sub in schema["allOf"]:
                res = self.sub_validate(sub, value, path)
                if not res.valid:
                    self._error(schema, "allOf", value, path)
                    self.errors.extend(res.errors)
        if "anyOf" in schema:
            collected: list[ValidationError] = []
            ok = False
            for sub in schema["anyOf"]:
                res = self.sub_validate(sub, value, path)
                collected.extend(res.errors)
                if res.valid:
                    ok = True
                    break  # short-circuit (src/v4validator.js:181-194)
            if not ok:
                self._error(schema, "anyOf", value, path)
                self.errors.extend(collected)
        if "oneOf" in schema:
            collected = []
            count = 0
            for sub in schema["oneOf"]:
                res = self.sub_validate(sub, value, path)
                collected.extend(res.errors)
                if res.valid:
                    count += 1
            if count == 0:
                self._error(schema, "oneOf.zero", value, path)
                self.errors.extend(collected)
            elif count != 1:
                self._error(schema, "oneOf", value, path)
        if "not" in schema:
            if self.sub_validate(schema["not"], value, path).valid:
                self._error(schema, "not", value, path)

    # -- custom -------------------------------------------------------------------------------
    def _check_conform(self, schema: dict, value: Any, path: list[str]) -> None:
        conform = schema.get("conform")
        if conform is None or value is MISSING:
            return
        ctx = {"path": list(path), "property": path[-1] if path else None}
        if callable(conform):
            if not conform(value, ctx):
                self._error(schema, "custom", value, path)
            return
        for name, args in conform.items():
            fn = self.custom.get(name)
            if fn is None:
                raise SpecError(f"unknown custom validator: {name}")
            call_args = [] if args is True else list(args)
            if not fn(value, *call_args, ctx):
                self._error(schema, "custom." + name, value, path, arg=self.messages.get("custom"))


class RowNormalizer:
    """Row-level normalizer with the reference's semantics
    (src/normalizer.js:8-45), returning a NEW value (the reference mutates in
    place — our data is immutable Arrow, SURVEY.md §2C):

    - ``default`` fills null/absent values (:8-12)
    - properties not in the schema are REMOVED (:13-15 — fires even without
      additionalProperties:false, test/normalizer_spec.js:33-42)
    - ``type`` coercion matrix (:16-44): string→str(), integer→parseInt,
      number→parseFloat, boolean truthy-string table, array wraps scalars,
      null→None, object no-op; null/absent values skip coercion
    """

    def __init__(self, schema: dict[str, Any]):
        self.schema = inline_refs(schema)

    def __call__(self, value: Any) -> Any:
        return self._norm(self.schema, value)

    def _norm(self, schema: dict[str, Any], value: Any) -> Any:
        if not isinstance(schema, dict):
            return value
        if value is None or value is MISSING:
            if "default" in schema:
                return schema["default"]
            if value is None and schema.get("type") == "null":
                return None
            return MISSING if value is MISSING else None
        value = self._coerce(schema.get("type"), value)
        props = schema.get("properties")
        if props is not None and _is_object(value):
            out = {}
            for name, sub in props.items():
                v = self._norm(sub, value.get(name, MISSING))
                if v is not MISSING:
                    out[name] = v
            # additional properties removed (normalizer.js:13-15)
            return out
        items = schema.get("items")
        if isinstance(items, dict) and isinstance(value, list):
            return [self._norm(items, v) for v in value]
        if isinstance(items, list) and isinstance(value, list):
            out_list = []
            for i, v in enumerate(value):
                sub = items[i] if i < len(items) else schema.get("additionalItems")
                out_list.append(self._norm(sub, v) if isinstance(sub, dict) else v)
            return out_list
        return value

    @staticmethod
    def _coerce(t: Any, value: Any) -> Any:
        if not isinstance(t, str):
            return value
        try:
            if t == "string":
                if isinstance(value, str):
                    return value
                if isinstance(value, bool):
                    return "true" if value else "false"
                return str(value)
            if t == "integer":
                if isinstance(value, bool):
                    return int(value)
                # parseInt semantics: leading numeric prefix
                return int(float(_scalarize(value)))
            if t == "number":
                if isinstance(value, bool):
                    return float(value)
                return float(_scalarize(value))
            if t == "boolean":
                if isinstance(value, bool):
                    return value
                if isinstance(value, str):
                    if value in ("true", "on"):
                        return True
                    if value in ("false", "off"):
                        return False
                return bool(value)
            if t == "array":
                return value if isinstance(value, list) else [value]
            if t == "null":
                return None
        except (TypeError, ValueError):
            return value
        return value


def _scalarize(value: Any) -> Any:
    """JS parseInt/parseFloat of an array coerces via toString: ["22.2"] →
    "22.2" (test/normalizer_spec.js:55-58)."""
    if isinstance(value, list) and len(value) == 1:
        return _scalarize(value[0])
    return value
