"""Official JSON-Schema-Test-Suite (draft4) slice, vendored under
tests/data/draft4/ (public corpus, github.com/json-schema-org/JSON-Schema-Test-Suite).
Mirrors the reference's runner (/root/reference/test/official_suite_spec.js:8-47):
every (schema, data, valid) triple runs through the row-level evaluator; the
reference's ignore list (/root/reference/test/ignored.json) is applied."""

import glob
import json
import os

import pytest

from schemasaurus_ray import new_validator

DATA_DIR = os.path.join(os.path.dirname(__file__), "data", "draft4")

# /root/reference/test/ignored.json
IGNORED = [
    "Unicode",
    "definition",
    "remote ref",
    "change resolution",
    "some languages do not distinguish between different types of numeric value",
]


def _ignored(desc: str) -> bool:
    return any(i in desc for i in IGNORED)


def load_cases():
    cases = []
    for path in sorted(glob.glob(os.path.join(DATA_DIR, "*.json"))):
        fname = os.path.basename(path)
        with open(path) as f:
            groups = json.load(f)
        for group in groups:
            if _ignored(group["description"]):
                continue
            for t in group["tests"]:
                if _ignored(t["description"]):
                    continue
                cases.append(
                    pytest.param(
                        group["schema"],
                        t["data"],
                        t["valid"],
                        id=f"{fname}::{group['description']}::{t['description']}",
                    )
                )
    return cases


CASES = load_cases()


def test_suite_nonempty():
    assert len(CASES) > 150


@pytest.mark.parametrize("schema,data,valid", CASES)
def test_official_draft4(schema, data, valid):
    result = new_validator(schema)(data)
    assert result.valid == valid, f"errors: {[ (e.code, list(e.path)) for e in result.errors ]}"
