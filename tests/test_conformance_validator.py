"""Conformance: row-level evaluator vs cases transcribed from the reference's
own suite (/root/reference/test/validator_spec.js — codes, paths, values,
messages; /root/reference/test/normalizer_spec.js — defaults, removal,
coercion). These are the 'matching schemasaurus's own validation semantics on
its test-suite cases' gate (BASELINE.md)."""

import pytest

from schemasaurus_ray import MISSING, SpecError, new_normalizer, new_validator


def codes(schema, value, options=None):
    return new_validator(schema, options)(value).codes()


def paths(schema, value, options=None):
    return [list(e.path) for e in new_validator(schema, options)(value).errors]


def values(schema, value, options=None):
    return [e.value for e in new_validator(schema, options)(value).errors]


def msgs(schema, value, options=None):
    return [e.message for e in new_validator(schema, options)(value).errors]


# ---- boolean type (validator_spec.js:53-66) ----
def test_boolean_pass():
    assert codes({"type": "boolean"}, True) == []
    assert codes({"type": "boolean"}, False) == []


def test_boolean_reject():
    assert codes({"type": "boolean"}, 1) == ["boolean"]
    assert codes({"type": "boolean"}, "hello") == ["boolean"]
    assert codes({"type": "boolean"}, {}) == ["boolean"]


# ---- numeric types (validator_spec.js:68-112) ----
def test_integer():
    assert codes({"type": "integer"}, 1) == []
    assert codes({"type": "integer"}, 1.1) == ["integer"]
    # 1.0 is a valid integer (number % 1 === 0, v4validator.js:97-101)
    assert codes({"type": "integer"}, 1.0) == []


def test_number():
    assert codes({"type": "number"}, 1) == []
    assert codes({"type": "number"}, 1.1) == []


def test_non_numeric():
    assert codes({"type": "integer"}, "string") == ["integer"]
    assert codes({"type": "integer"}, True) == ["integer"]
    assert codes({"type": "integer"}, "1") == ["integer"]


def test_multiple_of():
    s = {"type": "integer", "multipleOf": 11}
    assert codes(s, 11) == []
    assert codes(s, 0) == []
    assert codes(s, 22) == []
    assert codes(s, 12) == ["multipleOf"]
    assert codes(s, 10) == ["multipleOf"]
    assert codes(s, 1) == ["multipleOf"]


def test_minimum():
    s = {"type": "number", "minimum": 3}
    assert codes(s, 3) == []
    assert codes(s, 2) == ["minimum"]
    assert codes(s, 4) == []


def test_maximum():
    s = {"type": "number", "maximum": 3}
    assert codes(s, 3) == []
    assert codes(s, 4) == ["maximum"]
    assert codes(s, 2) == []


def test_range():
    s = {"type": "number", "minimum": 1, "maximum": 2}
    assert codes(s, 0) == ["minimum"]
    assert codes(s, 1) == []
    assert codes(s, 2) == []
    assert codes(s, 3) == ["maximum"]


def test_exclusive_bounds():
    # draft-4 boolean exclusives → distinct codes (v4validator.js:344-352)
    s = {"type": "number", "minimum": 1, "exclusiveMinimum": True}
    assert codes(s, 1) == ["minimum.exclusive"]
    assert codes(s, 2) == []
    s = {"type": "number", "maximum": 5, "exclusiveMaximum": True}
    assert codes(s, 5) == ["maximum.exclusive"]
    assert codes(s, 4) == []


# ---- strings (validator_spec.js:114-172) ----
def test_string_pass():
    assert codes({"type": "string"}, "str") == []
    assert codes({"type": "string"}, "") == []


def test_string_reject():
    assert codes({"type": "string"}, 10) == ["string"]
    assert codes({"type": "string"}, True) == ["string"]
    assert codes({"type": "string"}, {}) == ["string"]


def test_min_length():
    s = {"type": "string", "minLength": 3}
    assert codes(s, "123") == []
    assert codes(s, "1234") == []
    assert codes(s, "12") == ["minLength"]


def test_max_length_guarded():
    # no type — maxLength silently passes non-strings (guarded,
    # v4validator.js:236-245)
    s = {"maxLength": 3}
    assert codes(s, "123") == []
    assert codes(s, "12") == []
    assert codes(s, "1234") == ["maxLength"]
    assert codes(s, 12345) == []


def test_pattern():
    s = {"type": "string", "pattern": "^[ab][12]$"}
    assert codes(s, "a1") == []
    assert codes(s, "b2") == []
    assert codes(s, "c1") == ["pattern"]
    assert codes(s, "a3") == ["pattern"]


def test_email_format():
    s = {"type": "string", "format": "email"}
    assert codes(s, "a@b.com") == []
    assert codes(s, "ab.com") == ["format.email"]


def test_custom_format():
    opts = {"formats": {"pet": {"regexp": r"(dog|cat|rat)", "message": "shall be pet"}}}
    s = {"type": "string", "format": "pet"}
    assert codes(s, "cat", opts) == []
    assert codes(s, "dog", opts) == []
    assert codes(s, "rat", opts) == []
    assert codes(s, "crow", opts) == ["format.pet"]


def test_unknown_format_throws():
    with pytest.raises(SpecError):
        new_validator({"type": "string", "format": "unknown"})


# ---- paths & values (validator_spec.js:175-255) ----
def test_path_value_root():
    assert paths({"type": "boolean"}, 10) == [[]]
    assert values({"type": "boolean"}, 10) == [10]


def test_path_nested_objects():
    s = {
        "type": "object",
        "properties": {
            "a": {"type": "object", "properties": {
                "b": {"type": "object", "properties": {"c": {"type": "number"}}}
            }}
        },
    }
    assert paths(s, {"a": {"b": {"c": "fail"}}}) == [["a", "b", "c"]]
    assert values(s, {"a": {"b": {"c": "fail"}}}) == ["fail"]


def test_path_arrays():
    s = {"type": "array", "items": {"type": "array", "items": {"type": "number"}}}
    assert paths(s, [[1, 2], [3, "4"]]) == [["1", "1"]]
    assert values(s, [[1, 2], [3, "4"]]) == ["4"]


def test_additional_items():
    s = {"type": "array", "items": [{"type": "number"}], "additionalItems": False}
    assert paths(s, [1, 2, 3]) == [["1"], ["2"]]
    assert values(s, [1, 2, 3]) == [2, 3]
    assert codes(s, [1, 2, 3]) == ["additionalItems", "additionalItems"]


def test_additional_properties():
    s = {"type": "object", "properties": {"a": {"type": "number"}}, "additionalProperties": False}
    assert paths(s, {"a": 10, "b": 20}) == [["b"]]
    assert values(s, {"a": 10, "b": 20}) == [20]
    assert codes(s, {"a": 10, "b": 20}) == ["additionalProperties"]


def test_nested_schemas_oneof_paths():
    s = {
        "type": "object",
        "properties": {
            "a": {"oneOf": [{"type": "object", "properties": {"b": {"type": "string"}}}]}
        },
    }
    assert paths(s, {"a": {"b": 5}}) == [["a"], ["a", "b"]]
    assert codes(s, {"a": {"b": 5}}) == ["oneOf.zero", "string"]


def test_nested_schemas_in_arrays_paths():
    s = {
        "type": "object",
        "properties": {
            "a": {"type": "array", "items": {"oneOf": [{"properties": {"b": {"type": "string"}}}]}}
        },
    }
    # reference expects [["a", 1], ["a", 1, "b"]] with a numeric index — we
    # normalize path components to strings (documented divergence)
    assert paths(s, {"a": [{"b": "valid"}, {"b": False}]}) == [["a", "1"], ["a", "1", "b"]]


# ---- custom validators & messages (validator_spec.js:258-311) ----
def test_conform_fn():
    s = {"type": "number", "conform": lambda v, ctx: v > 5}
    assert codes(s, 6) == []
    assert codes(s, 5) == ["custom"]


def test_conform_named():
    opts = {"custom": {"larger": lambda value, arg, ctx: value > arg}}
    s = {"type": "number", "conform": {"larger": [5]}}
    assert codes(s, 6, opts) == []
    assert codes(s, 5, opts) == ["custom.larger"]


def test_user_messages():
    s = {
        "type": "number", "minimum": 3, "maximum": 10,
        "messages": {"minimum": ":(", "maximum": ":O", "number": ":/"},
    }
    assert msgs(s, 2) == [":("]
    assert msgs(s, 11) == [":O"]
    assert msgs(s, "5") == [":/"]
    assert msgs(s, 4) == []


def test_messages_through_gettext():
    s = {"type": "number", "conform": lambda o, ctx: o == -1, "messages": {"custom": "hello"}}
    assert msgs(s, 1, {"gettext": lambda x: "~" + x}) == ["~hello"]


# ---- probe-verified quirky cases (SURVEY.md §2B / FIXTURES.md F3) ----
def test_absent_optional_skips_all_checks():
    s = {"type": "object", "properties": {"x": {"type": "string", "minLength": 3}}}
    assert codes(s, {}) == []


def test_type_union_copies_all_errors():
    assert codes({"type": ["string", "number"]}, True) == ["string", "number"]
    assert codes({"type": ["string", "number"]}, "ok") == []
    assert codes({"type": ["string", "number"]}, 5) == []


def test_enum_object_members_canonical_json():
    s = {"enum": [{"a": 1, "b": 2}, "x"]}
    assert codes(s, {"b": 2, "a": 1}) == []
    assert codes(s, {"a": 1}) == ["enum"]
    assert codes(s, "x") == []


def test_enum_bool_not_number():
    # JS keys "true"/1 differ; True must not match enum [1]
    assert codes({"enum": [1, 2]}, True) == ["enum"]
    assert codes({"enum": [True]}, True) == []


def test_pattern_properties_not_additional():
    s = {
        "type": "object",
        "properties": {"a": {"type": "number"}},
        "patternProperties": {"^x_": {"type": "string"}},
        "additionalProperties": False,
    }
    assert codes(s, {"a": 1, "x_foo": "s"}) == []
    assert codes(s, {"a": 1, "x_foo": 5}) == ["string"]
    assert codes(s, {"a": 1, "zzz": 5}) == ["additionalProperties"]


def test_required_draft4():
    s = {"type": "object", "required": ["a", "b"]}
    assert codes(s, {"a": 1, "b": 2}) == []
    assert sorted(codes(s, {})) == ["required", "required"]


def test_required_v3_merged():
    s = {"type": "object", "properties": {"a": {"type": "number", "required": True}}}
    assert codes(s, {"a": 1}) == []
    assert codes(s, {}) == ["required"]


def test_ignore_additional_items_option():
    """Reference option {ignoreAdditionalItems: true} skips the whole
    'additional' traversal — both additionalItems and additionalProperties
    (src/int/processor.js:54,71-86; used by examples/formgen_compiled.js:51)."""
    s_items = {"type": "array", "items": [{"type": "integer"}], "additionalItems": False}
    assert codes(s_items, [1, "extra"]) == ["additionalItems"]
    assert codes(s_items, [1, "extra"], {"ignoreAdditionalItems": True}) == []
    s_props = {"type": "object", "properties": {"a": {}}, "additionalProperties": False}
    assert codes(s_props, {"a": 1, "b": 2}) == ["additionalProperties"]
    assert codes(s_props, {"a": 1, "b": 2}, {"ignoreAdditionalItems": True}) == []
    # additionalProperties as schema is skipped too
    s_schema = {"type": "object", "additionalProperties": {"type": "integer"}}
    assert codes(s_schema, {"x": "nope"}) == ["integer"]
    assert codes(s_schema, {"x": "nope"}, {"ignoreAdditionalItems": True}) == []


def test_unique_items():
    s = {"type": "array", "uniqueItems": True}
    assert codes(s, [1, 2, 3]) == []
    assert codes(s, [1, 2, 1, 1]) == ["uniqueItems", "uniqueItems"]
    errs = new_validator(s)([1, 2, 1]).errors
    assert errs[0].arg == 1


def test_min_max_items():
    s = {"minItems": 2, "maxItems": 3}
    assert codes(s, [1]) == ["minItems"]
    assert codes(s, [1, 2]) == []
    assert codes(s, [1, 2, 3, 4]) == ["maxItems"]
    assert codes(s, "not-an-array") == []  # guarded


def test_min_max_properties():
    s = {"minProperties": 1, "maxProperties": 2}
    assert codes(s, {}) == ["minProperties"]
    assert codes(s, {"a": 1}) == []
    assert codes(s, {"a": 1, "b": 2, "c": 3}) == ["maxProperties"]


def test_dependencies_property_form():
    s = {"type": "object", "dependencies": {"a": ["b"]}}
    assert codes(s, {"a": 1, "b": 2}) == []
    assert codes(s, {"x": 1}) == []
    assert codes(s, {"a": 1}) == ["dependency", "required"]


def test_dependencies_schema_form():
    s = {"type": "object", "dependencies": {"a": {"properties": {"b": {"type": "number"}}}}}
    assert codes(s, {"a": 1, "b": 2}) == []
    assert codes(s, {"a": 1, "b": "x"}) == ["dependency", "number"]


def test_allof():
    s = {"allOf": [{"type": "number"}, {"minimum": 3}]}
    assert codes(s, 4) == []
    assert codes(s, 2) == ["allOf", "minimum"]
    assert codes(s, "x") == ["allOf", "number"]


def test_anyof():
    s = {"anyOf": [{"type": "string"}, {"type": "number"}]}
    assert codes(s, "x") == []
    assert codes(s, 5) == []
    assert codes(s, True) == ["anyOf", "string", "number"]


def test_oneof_zero_and_multi():
    s = {"oneOf": [{"type": "number", "minimum": 3}, {"type": "number", "maximum": 5}]}
    assert codes(s, 10) == []  # matches only first
    assert codes(s, 1) == []  # matches only second
    assert codes(s, 4) == ["oneOf"]  # matches both
    assert codes(s, "x") == ["oneOf.zero", "number", "number"]


def test_not():
    s = {"not": {"type": "string"}}
    assert codes(s, 5) == []
    assert codes(s, "x") == ["not"]


def test_ref_resolution():
    s = {
        "definitions": {"pos": {"type": "number", "minimum": 0}},
        "type": "object",
        "properties": {"x": {"$ref": "#/definitions/pos"}},
    }
    assert codes(s, {"x": 5}) == []
    assert codes(s, {"x": -1}) == ["minimum"]


def test_remote_ref_throws():
    with pytest.raises(SpecError):
        new_validator({"$ref": "http://example.com/schema"})({})


# ---- normalizer (normalizer_spec.js:7-65) ----
def test_normalizer_defaults():
    n = new_normalizer({
        "properties": {
            "intProp": {"default": 10},
            "strProp": {"default": "test"},
            "arrProp": {"type": "array", "items": {"default": {"obj": True}}},
        }
    })
    assert n({}) == {"intProp": 10, "strProp": "test"}
    assert n({"intProp": 5, "strProp": "str", "arrProp": [None, "test"]}) == {
        "intProp": 5,
        "strProp": "str",
        "arrProp": [{"obj": True}, "test"],
    }


def test_normalizer_removes_additional():
    n = new_normalizer({"properties": {"oneProp": {"type": "integer"}}})
    assert n({"oneProp": 10}) == {"oneProp": 10}
    assert n({"oneProp": 10, "secondProp": 5}) == {"oneProp": 10}


def test_normalizer_converts_types():
    n = new_normalizer({
        "properties": {
            "i": {"type": "integer"},
            "n": {"type": "number"},
            "s": {"type": "string"},
            "b": {"type": "boolean"},
            "a": {"type": "array"},
            "u": {"type": "null"},
            "o": {"type": "object"},
        }
    })
    out = n({"i": "10", "n": ["22.2"], "s": 1, "b": "false", "a": 77, "u": 33, "o": -5})
    assert out == {"i": 10, "n": 22.2, "s": "1", "b": False, "a": [77], "u": None, "o": -5}


def test_normalizer_returns_new_object():
    n = new_normalizer({"properties": {"a": {"default": 1}}})
    src = {}
    out = n(src)
    assert out == {"a": 1}
    assert src == {}  # input NOT mutated (divergence from reference, documented)


# ---- additional official-suite-style edge cases ----
def test_enum_with_null_member():
    assert codes({"enum": [None, 1]}, None) == []
    assert codes({"enum": [1, 2]}, None) == ["enum"]


def test_nested_allof_anyof():
    s = {"allOf": [{"anyOf": [{"type": "integer"}, {"minLength": 2}]}, {"not": {"enum": [3]}}]}
    assert codes(s, 5) == []
    assert codes(s, "ab") == []
    assert codes(s, 3) == ["allOf", "not"]


def test_exclusive_bounds_equal_band():
    s = {"minimum": 2, "maximum": 2}
    assert codes(s, 2) == []
    s = {"minimum": 2, "exclusiveMinimum": True, "maximum": 2}
    assert codes(s, 2) == ["minimum.exclusive"]


def test_multiple_of_fractional():
    # floating-division semantics: 0.0075 % 0.0001 leaves residue in IEEE754
    s = {"multipleOf": 0.5}
    assert codes(s, 1.5) == []
    assert codes(s, 1.3) == ["multipleOf"]


def test_pattern_special_chars():
    s = {"pattern": r"^\d{3}-\d{2}$"}
    assert codes(s, "123-45") == []
    assert codes(s, "12-345") == ["pattern"]


def test_items_nested_combinator_paths():
    s = {"items": {"anyOf": [{"type": "integer"}, {"type": "string"}]}}
    assert codes(s, [1, "a", True]) == ["anyOf", "integer", "string"]
    assert paths(s, [1, "a", True]) == [["2"], ["2"], ["2"]]


def test_dependencies_multiple_triggers():
    s = {"dependencies": {"a": ["b"], "c": ["d"]}}
    assert codes(s, {"a": 1, "b": 2}) == []
    assert codes(s, {"a": 1, "c": 2}) == ["dependency", "required", "dependency", "required"]


def test_min_properties_guarded():
    assert codes({"minProperties": 2}, "str") == []  # guarded: non-object passes
    assert codes({"minProperties": 2}, {"a": 1}) == ["minProperties"]


def test_message_interpolation():
    # row evaluator keeps the reference's raw %d/%s templates in the error
    # record (exactly what src/v4validator.js:57-67 stores)...
    errs = new_validator({"minimum": 3})(1).errors
    assert errs[0].message == "shall be >= %d"
    assert errs[0].arg == 3
    # ...the engine's violation sink interpolates via messages.render
    from schemasaurus_ray.messages import render

    assert render(errs[0].message, errs[0].arg) == "shall be >= 3"
    assert render("shall have length no more than %d", 2) == "shall have length no more than 2"
    assert render("shall match pattern %s", "^a$") == "shall match pattern ^a$"
    assert render("is required", None) == "is required"
    # args containing regex-escape-looking text splice VERBATIM (a plain
    # re.sub repl string would raise 'bad escape \\u' — hypothesis-found)
    assert render("shall be one of %s", r"A\d") == r"shall be one of A\d"
    assert render("shall be %s", "a\\b") == "shall be a\\b"


def test_additional_properties_schema_form():
    s = {"properties": {"a": {"type": "number"}}, "additionalProperties": {"type": "string"}}
    assert codes(s, {"a": 1, "x": "ok"}) == []
    assert codes(s, {"a": 1, "x": 5}) == ["string"]
    assert paths(s, {"a": 1, "x": 5}) == [["x"]]


def test_required_and_v4_list_union():
    # draft-4 list + v3 per-property flags merge (v4validator.js:315-321)
    s = {"required": ["a"], "properties": {"b": {"type": "number", "required": True}}}
    assert sorted(codes(s, {})) == ["required", "required"]
    assert codes(s, {"a": 1, "b": 2}) == []
