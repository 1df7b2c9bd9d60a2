"""Property-based parity: for randomized column specs and randomized data,
the vectorized Arrow kernels must emit exactly the same violation codes per
row as the row-level reference evaluator (the `noinline` cross-check,
SURVEY.md §5) — hypothesis explores the constraint/value space the
hand-written tests don't."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from schemasaurus_ray import new_validator
from schemasaurus_ray.plan import compile_plan
from schemasaurus_ray.spec import parse_table_spec

SAFE_PATTERNS = ["^a", "b$", "abc", "[0-9]+", "^[ab]{1,2}$"]


@st.composite
def int_spec(draw):
    spec = {"type": "integer"}
    if draw(st.booleans()):
        spec["minimum"] = draw(st.integers(-5, 5))
        if draw(st.booleans()):
            spec["exclusiveMinimum"] = True
    if draw(st.booleans()):
        spec["maximum"] = draw(st.integers(-2, 10))
        if draw(st.booleans()):
            spec["exclusiveMaximum"] = True
    if draw(st.booleans()):
        spec["multipleOf"] = draw(st.integers(1, 7))
    if draw(st.booleans()):
        spec["enum"] = draw(st.lists(st.integers(-5, 10), min_size=1, max_size=4))
    if draw(st.booleans()):
        spec["required"] = True
    return spec


@st.composite
def float_spec(draw):
    spec = {"type": "number"}
    if draw(st.booleans()):
        spec["minimum"] = draw(st.floats(-5, 5, allow_nan=False))
    if draw(st.booleans()):
        spec["maximum"] = draw(st.floats(-2, 10, allow_nan=False))
    if draw(st.booleans()):
        spec["required"] = True
    return spec


@st.composite
def str_spec(draw):
    spec = {"type": "string"}
    if draw(st.booleans()):
        spec["minLength"] = draw(st.integers(0, 4))
    if draw(st.booleans()):
        spec["maxLength"] = draw(st.integers(1, 6))
    if draw(st.booleans()):
        spec["pattern"] = draw(st.sampled_from(SAFE_PATTERNS))
    if draw(st.booleans()):
        spec["enum"] = draw(st.lists(st.text("abc012", max_size=4), min_size=1, max_size=4))
    if draw(st.booleans()):
        spec["required"] = True
    return spec


def row_codes(cspec, value):
    out = set()
    if value is None:
        if cspec.get("required"):
            out.add("required")
        return out
    sub = {k: v for k, v in cspec.items() if k != "required"}
    for e in new_validator(sub)(value).errors:
        out.add(e.code)
    return out


def check_parity(cspec, values, arrow_type):
    t = pa.table({"x": pa.array(values, arrow_type)})
    plan = compile_plan(parse_table_spec({"columns": {"x": cspec}}))
    bound = plan.bind(t.schema)
    row_bad, hits = bound.evaluate(t)
    vec = [set() for _ in values]
    for rule, idx in hits:
        for i in idx:
            vec[i].add(rule.code)
    for i, v in enumerate(values):
        expected = row_codes(cspec, v)
        assert vec[i] == expected, f"value {v!r} spec {cspec}: {vec[i]} != {expected}"


@settings(max_examples=80, deadline=None)
@given(
    int_spec(),
    st.lists(st.one_of(st.integers(-10, 15), st.none()), min_size=1, max_size=30),
)
def test_integer_columns(cspec, values):
    check_parity(cspec, values, pa.int64())


@settings(max_examples=80, deadline=None)
@given(
    float_spec(),
    st.lists(
        st.one_of(st.floats(-10, 15, allow_nan=False), st.none()),
        min_size=1,
        max_size=30,
    ),
)
def test_float_columns(cspec, values):
    check_parity(cspec, values, pa.float64())


@settings(max_examples=80, deadline=None)
@given(
    str_spec(),
    st.lists(st.one_of(st.text("abc012", max_size=6), st.none()), min_size=1, max_size=30),
)
def test_string_columns(cspec, values):
    check_parity(cspec, values, pa.string())


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.one_of(st.floats(-4, 4, allow_nan=False), st.none()), min_size=1, max_size=20),
    st.floats(0.1, 3, allow_nan=False),
)
def test_multiple_of_float_semantics(values, k):
    """multipleOf floating-division semantics ((v/k) % 1 != 0) must agree
    between numpy kernel and the row evaluator bit-for-bit."""
    cspec = {"type": "number", "multipleOf": k}
    check_parity(cspec, values, pa.float64())


@st.composite
def combinator_spec(draw):
    kind = draw(st.sampled_from(["anyOf", "oneOf", "allOf", "not"]))
    subs = draw(
        st.lists(
            st.one_of(
                st.builds(lambda lo: {"minimum": lo}, st.integers(-5, 5)),
                st.builds(lambda hi: {"maximum": hi}, st.integers(-2, 10)),
                st.builds(lambda k: {"multipleOf": k}, st.integers(1, 5)),
                st.builds(lambda e: {"enum": e}, st.lists(st.integers(-5, 10), min_size=1, max_size=3)),
            ),
            min_size=1,
            max_size=3,
        )
    )
    if kind == "not":
        return {"type": "integer", "not": subs[0]}
    return {"type": "integer", kind: subs}


@settings(max_examples=120, deadline=None)
@given(
    combinator_spec(),
    st.lists(st.one_of(st.integers(-10, 15), st.none()), min_size=1, max_size=25),
)
def test_combinator_columns(cspec, values):
    """anyOf/oneOf/allOf/not mask algebra must match the reference's
    sub-validation semantics for every generated spec (only the combinator
    verdict codes are compared — the vectorized path intentionally skips
    copying sub-errors, SURVEY.md §2B)."""
    t = pa.table({"x": pa.array(values, pa.int64())})
    plan = compile_plan(parse_table_spec({"columns": {"x": cspec}}))
    bound = plan.bind(t.schema)
    row_bad, hits = bound.evaluate(t)
    vec = [set() for _ in values]
    for rule, idx in hits:
        for i in idx:
            vec[i].add(rule.code)
    combinator_codes = {"anyOf", "oneOf", "oneOf.zero", "allOf", "not"}
    for i, v in enumerate(values):
        expected = row_codes(cspec, v) & combinator_codes
        got = vec[i] & combinator_codes
        assert got == expected, f"value {v!r} spec {cspec}: {got} != {expected}"


# ---- batch shingle hashing ≡ per-doc reference (round-2 primitive) ----------
@given(
    st.lists(
        st.text(alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs")), max_size=80),
        min_size=0,
        max_size=12,
    )
)
@settings(max_examples=60, deadline=None)
def test_shingle_hash_batch_matches_per_doc(texts):
    """_shingle_hash_arrays over a column must equal hashing each doc
    alone: same multiset of shingle hashes per doc, no cross-doc bleed."""
    import numpy as np
    import pyarrow as pa

    from schemasaurus_ray.functions.dedup import _shingle_hash_arrays

    col = pa.array(texts, pa.string())
    flat, parents = _shingle_hash_arrays(col, n=3)
    by_doc: dict[int, list] = {}
    for h, p in zip(flat.tolist(), parents.tolist()):
        by_doc.setdefault(p, []).append(h)
    for i, t in enumerate(texts):
        solo, _ = _shingle_hash_arrays(pa.array([t], pa.string()), n=3)
        assert sorted(by_doc.get(i, [])) == sorted(solo.tolist()), f"doc {i}: {t!r}"
