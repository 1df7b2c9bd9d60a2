"""Mimics the driver's correctness gate: run each queries() entry and its
oracle_sql() DuckDB equivalent on the same parquet tables; compare row count,
schema (sorted column names) and order-insensitive values."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def to_pandas(result):
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


# Auto-derived from oracle_sql() so every new oracle-backed query is
# covered here without touching this file (importing __ray_entry__ does not
# start Ray; the ray_session fixture owns the session).
def _oracle_names():
    import __ray_entry__ as m

    return sorted(m.oracle_sql())


ORACLE_NAMES = _oracle_names()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(name, entrymod, con):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    mine = normalize(to_pandas(fn(SF_DIR)))
    theirs = normalize(con.sql(sql).df())
    assert list(mine.columns) == list(theirs.columns), f"{name}: column mismatch"
    assert len(mine) == len(theirs), f"{name}: row count {len(mine)} != {len(theirs)}"
    # Same dtype KIND per column (int vs int, float vs float, object vs object):
    # the driver hashes raw values, so e.g. DuckDB HUGEINT -> decimal128 ->
    # pandas object(Decimal) vs engine int64 is a real hash mismatch even when
    # check_dtype=False equality passes (bit us in round 1, windowed_events).
    for c in mine.columns:
        mk, tk = mine[c].dtype.kind, theirs[c].dtype.kind
        assert mk == tk, f"{name}.{c}: dtype kind {mine[c].dtype} != {theirs[c].dtype}"
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False, check_exact=True)


# Auto-derived: every queries() entry without an oracle gets a rows-only
# smoke run (golden-value coverage for these lives in the dedicated suites).
def _rows_only_names():
    import __ray_entry__ as m

    return sorted(set(m.queries()) - set(m.oracle_sql()))


ROWS_ONLY = _rows_only_names()


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, entrymod):
    out = to_pandas(entrymod.queries()[name](SF_DIR))
    assert out is not None and len(out) >= 0


def test_entry_smoke(entrymod):
    out = to_pandas(entrymod.entry())
    assert len(out) >= 0
    assert sorted(out.columns) == ["code", "col", "row_ref"]


def test_queries_dict_has_no_duplicate_literal_keys():
    """The queries() dict is an ORDER contract (the driver certifies only
    the first-50 prefix): a duplicated key literal silently collapses to
    its FIRST position, so every positional displacement after it is
    off-by-one and a future rotation can drop a query believing its twin
    remains. Parse the source AST and reject duplicates outright (caught
    live in round 5: funnel_events listed twice)."""
    import ast
    import collections

    import __ray_entry__ as m

    src = open(m.__file__).read()
    tree = ast.parse(src)
    fn = next(
        n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name == "queries"
    )
    ret = next(n for n in ast.walk(fn) if isinstance(n, ast.Return))
    keys = [k.value for k in ret.value.keys if isinstance(k, ast.Constant)]
    dupes = [k for k, c in collections.Counter(keys).items() if c > 1]
    assert not dupes, f"duplicate queries() keys: {dupes}"
    assert len(keys) == len(m.queries())


def test_padded_text_and_null_lang_edgecases(ray_session, tmp_path):
    """Regression for the r5 review findings: split-padding '' tokens and
    the NULL-lang group must match the \\S+ / PARTITION-BY-lang oracle
    semantics — df top-k keeps a NULL-lang partition and never counts an
    empty term; keep-best scores ignore padding (so padded exact near-dups
    tie and fall back to keep-min, like the oracle)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as m

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(8)), pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma ",  # trailing pad — near-dup of 1/2
                    " alpha  beta gamma",  # leading + double pad
                    "alpha beta gamma",  # clean copy
                    "delta epsilon",
                    "delta epsilon ",  # padded copy
                    "zeta",  # NULL lang
                    "",  # empty doc, NULL lang
                    "eta theta iota kappa",
                ]
            ),
            "lang": pa.array(["en", "en", "en", "de", "de", None, None, "fr"]),
            "source": pa.array(["s"] * 8),
            "n_chars": pa.array([17, 18, 16, 13, 14, 4, 0, 20], pa.int64()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(docs, os.path.join(sf, "documents.parquet"))
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")

    for name in ("df_topk_terms_documents", "dedup_neardup_keep_best_documents"):
        got = normalize(to_pandas(m.queries()[name](sf)))
        exp = normalize(c.sql(m.oracle_sql()[name]).df())
        pd.testing.assert_frame_equal(got, exp, check_dtype=False), name

    # the NULL-lang partition is present and '' never appears as a term
    df_topk = to_pandas(m.queries()["df_topk_terms_documents"](sf))
    assert df_topk["lang"].isna().any()
    assert not (df_topk["token"] == "").any()


def test_mixture_bottomk_merge_idempotent():
    """The tree combine collapses per-block bottom-k partials in arbitrary
    order/grouping — valid only because bottomk(concat(bottomk(A),
    bottomk(B))) == bottomk(concat(A, B)). Pin that algebra on random
    splits (the ≤64-block fixtures never layer the tree, so the combine
    path is otherwise unexercised)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from schemasaurus_ray.pipelines.queries import MIXTURE_TARGETS, _mixture_bottomk

    rng = np.random.default_rng(7)
    langs = list(MIXTURE_TARGETS) + ["xx", None]
    n = 3000
    ids = np.arange(n, dtype=np.int64)
    lang_col = [langs[i] for i in rng.integers(0, len(langs), size=n)]
    h = [hashlib.md5(f"mb:{i}".encode()).hexdigest() for i in range(n)]
    tbl = pa.table(
        {"doc_id": pa.array(ids), "lang": pa.array(lang_col, pa.string()), "h": pa.array(h)}
    )
    direct = _mixture_bottomk(tbl)
    # group sizes are exactly min(target, group population)
    pops = {g: lang_col.count(g) for g in MIXTURE_TARGETS}
    got_sizes = {
        g: direct.filter(pa.compute.equal(direct.column("lang"), g)).num_rows
        for g in MIXTURE_TARGETS
    }
    assert got_sizes == {g: min(k, pops[g]) for g, k in MIXTURE_TARGETS.items()}

    for n_parts in (2, 7, 64):
        cuts = np.sort(rng.integers(0, n, size=n_parts - 1))
        parts = []
        prev = 0
        for c in list(cuts) + [n]:
            parts.append(tbl.slice(prev, c - prev))
            prev = c
        # simulate a multi-level tree: pairwise combines, then a final merge
        level = [_mixture_bottomk(p) if p.num_rows else p for p in parts]
        while len(level) > 1:
            nxt = []
            for i in range(0, len(level), 2):
                grp = [t for t in level[i : i + 2] if t.num_rows]
                nxt.append(_mixture_bottomk(pa.concat_tables(grp)) if grp else level[i])
            level = nxt
        merged = level[0].sort_by("doc_id")
        assert merged.equals(direct.sort_by("doc_id")), n_parts
