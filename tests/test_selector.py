"""Selector DSL unit tests — matching semantics of the reference grammar
(/root/reference/README.md:378-387, parser src/compiler.js:74-112; ordering
contract test/iterator_spec.js:12-157)."""

from schemasaurus_ray.selector import RuleRegistry, parse_selector


def test_attr_presence():
    s = parse_selector("[minimum]")
    assert s.matches({"minimum": 3})
    assert not s.matches({"maximum": 3})


def test_attr_absence():
    s = parse_selector("[^required]")
    assert s.matches({"type": "string"})
    assert not s.matches({"required": True})


def test_attr_equals():
    s = parse_selector("[type=string]")
    assert s.matches({"type": "string"})
    assert not s.matches({"type": "number"})
    assert not s.matches({})


def test_attr_not_equals():
    s = parse_selector("[^type=string]")
    assert not s.matches({"type": "string"})
    assert s.matches({"type": "number"})
    assert s.matches({})  # absent attr != value


def test_conjunction():
    s = parse_selector("[required][^properties]")
    assert s.matches({"required": ["a"]})
    assert not s.matches({"required": ["a"], "properties": {}})


def test_bool_and_number_literals():
    assert parse_selector("[additionalProperty=false]").matches({"additionalProperty": False})
    assert not parse_selector("[additionalProperty=false]").matches({"additionalProperty": True})
    assert parse_selector("[minimum=3]").matches({"minimum": 3})


def test_phase_parse():
    s = parse_selector("[items]:item-end")
    assert s.phase == "item-end"
    assert parse_selector(":start").phase == "start"
    assert parse_selector("not a selector") is None


def test_registry_order_and_extend():
    calls = []
    reg = RuleRegistry({
        "[minimum]": lambda: calls.append("min"),
        "[maximum]": lambda: calls.append("max"),
    })
    matched = reg.matching({"minimum": 1, "maximum": 2})
    assert [raw for raw, _ in matched] == ["[minimum]", "[maximum]"]

    # extend overrides in place, preserving order (V4Validator.extend analogue)
    child = reg.extend({"[minimum]": lambda: calls.append("min2")})
    matched2 = child.matching({"minimum": 1})
    assert [raw for raw, _ in matched2] == ["[minimum]"]
    matched2[0][1]()
    assert calls == ["min2"]
    # parent untouched
    reg.matching({"minimum": 1})[0][1]()
    assert calls == ["min2", "min"]
