"""Iterator-surface tests (reference test/iterator_spec.js semantics) + the
user-extension surface: custom tools over the walker, custom kernel rules
registered on the plan compiler (SURVEY.md §2F)."""

import numpy as np
import pyarrow as pa

from schemasaurus_ray.kernels import KERNEL_FACTORIES, KernelRule
from schemasaurus_ray.plan import compile_plan
from schemasaurus_ray.selector import RuleRegistry
from schemasaurus_ray.spec import parse_table_spec
from schemasaurus_ray.walk import walk


def test_walk_order_and_paths():
    """attr handlers fire per matching node in pre-order; :end after
    children (stepProcess firing order, compiler.js:256-273)."""
    calls = []
    reg = RuleRegistry({
        "[type]": lambda node, ctx, st: calls.append(("type", node["type"], list(ctx.path))),
        "[type=object]:end": lambda node, ctx, st: calls.append(("end", node["type"], list(ctx.path))),
    })
    schema = {
        "type": "object",
        "properties": {
            "a": {"type": "string"},
            "b": {"type": "object", "properties": {"c": {"type": "number"}}},
        },
    }
    walk(schema, reg)
    assert calls == [
        ("type", "object", []),
        ("type", "string", ["a"]),
        ("type", "object", ["b"]),
        ("type", "number", ["b", "c"]),
        ("end", "object", ["b"]),
        ("end", "object", []),
    ]


def test_walk_items_schema_only():
    """schemaOnly walk visits each items-schema once (processor.js:43-47)."""
    seen = []
    reg = RuleRegistry({"[type]": lambda n, c, s: seen.append((n["type"], list(c.path)))})
    walk({"type": "array", "items": {"type": "number"}}, reg)
    assert seen == [("array", []), ("number", ["0"])]
    # tuple form: positional visits
    seen.clear()
    walk({"type": "array", "items": [{"type": "number"}, {"type": "string"}]}, reg)
    assert seen == [("array", []), ("number", ["0"]), ("string", ["1"])]


def test_walk_stop_short_circuits():
    seen = []

    def stopper(n, ctx, st):
        seen.append(n["type"])
        if n["type"] == "string":
            ctx.stop()

    reg = RuleRegistry({"[type]": stopper})
    walk(
        {"type": "object", "properties": {"a": {"type": "string"}, "b": {"type": "number"}}},
        reg,
    )
    assert seen == ["object", "string"]  # number never visited


def test_form_generator_tool():
    """A user tool = registry + accumulator (the reference's primary product:
    examples/formgen.js — HTML form from a schema, no document needed)."""
    reg = RuleRegistry({
        "[title]:start": lambda n, c, st: st.append(f"<fieldset><legend>{n['title']}</legend>"),
        "[type=string][^enum]": lambda n, c, st: st.append(f"<input name={'.'.join(c.path)}>"),
        "[enum]": lambda n, c, st: st.append(
            "<select>" + "".join(f"<option>{v}</option>" for v in n["enum"]) + "</select>"
        ),
        "[title]:end": lambda n, c, st: st.append("</fieldset>"),
    })
    schema = {
        "title": "Clip",
        "type": "object",
        "properties": {
            "clip_id": {"type": "string"},
            "codec": {"type": "string", "enum": ["wav", "flac"]},
        },
    }
    html = "".join(walk(schema, reg, []))
    assert html == (
        "<fieldset><legend>Clip</legend>"
        "<input name=clip_id>"
        "<select><option>wav</option><option>flac</option></select>"
        "</fieldset>"
    )


def test_custom_kernel_rule_registration():
    """Engine analogue of V4Validator.extend (v4validator.js:391-416):
    register a new selector → kernel factory and compile a plan with it."""

    def k_positive(column, spec, opts):
        def fn(t: pa.Table) -> np.ndarray:
            col = t.column(column)
            import pyarrow.compute as pc

            bad = pc.less_equal(col, 0)
            return np.asarray(pc.and_kleene(bad, pc.is_valid(col)).fill_null(False))

        return KernelRule(column, "custom.positive", None, "shall be positive", fn)

    reg = RuleRegistry(dict(KERNEL_FACTORIES)).extend({"[positive=true]": k_positive})
    plan = compile_plan(parse_table_spec({"columns": {"x": {"type": "integer", "positive": True}}}), registry=reg)
    bound = plan.bind(pa.schema([("x", pa.int64())]))
    t = pa.table({"x": pa.array([5, 0, -3, None], pa.int64())})
    row_bad, hits = bound.evaluate(t)
    assert list(row_bad) == [False, True, True, False]
    assert hits[0][0].code == "custom.positive"
