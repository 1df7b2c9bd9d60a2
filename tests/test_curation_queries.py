"""Edge-case tests for the round-5 session-5 curation/profiling queries
(cooccurrence, user entropy, label conflicts, TTR, grouped z-score, PMI
collocations) on synthetic tables the sf fixtures can't produce: NULL
labels/types, all-whitespace and empty documents, single-type users,
zero-variance groups, and key groups deliberately split across shards.
Each case cross-checks the engine against the SAME DuckDB oracle SQL
registered in __ray_entry__.oracle_sql(), so the edge semantics stay
pinned to the driver protocol, not to a hand-written expectation."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _oracle(name: str, sf_dir: str) -> pa.Table:
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in ("documents", "events"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.execute(entry.oracle_sql()[name]).arrow()


def _match(got: pa.Table, want: pa.Table):
    assert got.column_names == want.column_names
    assert got.to_pylist() == want.to_pylist()


@pytest.fixture(scope="module")
def edge_events(tmp_path_factory):
    """Events with NULL event_type, single-type users, and every user's
    history split across two shards (the bucket-completeness trap)."""
    d = tmp_path_factory.mktemp("edge_events")
    rng = np.random.default_rng(55)
    n = 4000
    uid = rng.integers(0, 60, size=n).astype(np.int64)
    types = np.array(["view", "click", "buy", "error", None], dtype=object)
    et = types[rng.integers(0, 5, size=n)]
    uid[:40] = 7  # guarantee user 7 exists …
    et[uid == 7] = "view"  # … with a single event type (H = 0)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(np.arange(n, dtype=np.int64) * 1000).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array(uid),
            "event_type": pa.array(et.tolist(), pa.string()),
            "value": pa.array(rng.normal(size=n)),
            "props": pa.array(["{}"] * n),
        }
    )
    # one canonical file (the queries take sf_dir); multi-shard key
    # completeness is pinned separately in test_shuffle's bucket_cols test
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_docs(tmp_path_factory):
    """Documents with NULL lang, empty / all-whitespace text, short docs,
    conflicting labels on a shared prefix, and a zero-variance lang."""
    d = tmp_path_factory.mktemp("edge_docs")
    rows = []
    # conflict group: same 8-token prefix, three langs incl. NULL
    base = "alpha beta gamma delta epsilon zeta eta theta tail%d extra"
    rows.append((0, base % 0, "en", len(base % 0)))
    rows.append((1, base % 1, "de", len(base % 1)))
    rows.append((2, base % 2, None, len(base % 2)))
    # same prefix, same lang → no conflict
    rows.append((3, "one two three four five six seven eight x", "fr", 41))
    rows.append((4, "one two three four five six seven eight y", "fr", 41))
    # degenerate texts
    rows.append((5, "", "en", 0))
    rows.append((6, "   \t  ", "en", 6))
    rows.append((7, "short doc", "en", 9))
    # zero-variance lang group (all n_chars equal)
    for i in range(8, 14):
        rows.append((i, f"zz{i} " * 12, "zz", 777))
    # a diverse + a repetitive long doc for TTR
    rows.append((14, " ".join(f"w{j}" for j in range(40)), "en", 200))
    rows.append((15, " ".join(["dup"] * 40), "en", 160))
    # an extreme-length outlier inside lang en
    rows.append((16, "x " * 50, "en", 9000))
    # Unicode whitespace INSIDE and AT THE EDGE of the text: \S+ keeps
    # NBSP/em-space inside tokens, so the engine tokenizer must too
    # (ascii_trim, not utf8_trim — review r5 session-5 finding)
    rows.append((17, " lead mid dle one two three four five six seven", "en", 60))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array(["s0"] * len(rows), pa.string()),
            "n_chars": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_cooccurrence_null_types_and_split_users(ray_session, edge_events):
    from schemasaurus_ray.pipelines import queries as q

    got = q.cooccurrence_events(edge_events)
    _match(got, _oracle("cooccurrence_events", edge_events))
    # NULL event_type must never pair
    assert all(r["t1"] is not None and r["t2"] is not None for r in got.to_pylist())


def test_user_entropy_single_type_user(ray_session, edge_events):
    from schemasaurus_ray.pipelines import queries as q

    got = q.user_entropy_events(edge_events)
    _match(got, _oracle("user_entropy_events", edge_events))
    full = q.user_entropy_events(edge_events, k=10**9)
    by_user = {r["user_id"]: r for r in full.to_pylist()}
    assert by_user[7]["entropy_ubits"] == 0  # single-type user: H = 0
    assert by_user[7]["n_types"] == 1


def test_label_conflicts_null_lang_excluded(ray_session, edge_docs):
    from schemasaurus_ray.pipelines import queries as q

    got = q.label_conflicts_documents(edge_docs)
    _match(got, _oracle("label_conflicts_documents", edge_docs))
    assert got.num_rows == 1  # only the en/de(/NULL) prefix group
    row = got.to_pylist()[0]
    # NULL lang counts as a member but NOT as a distinct label
    assert (row["n_docs"], row["n_langs"], row["keep_id"]) == (3, 2, 0)


def test_ttr_degenerate_texts(ray_session, edge_docs):
    from schemasaurus_ray.pipelines import queries as q

    got = q.ttr_documents(edge_docs)
    _match(got, _oracle("ttr_documents", edge_docs))
    ids = [r["doc_id"] for r in got.to_pylist()]
    assert 5 not in ids and 6 not in ids and 7 not in ids  # below min_tokens
    by_id = {r["doc_id"]: r for r in got.to_pylist()}
    assert by_id[14]["ttr_bp"] == 10000  # fully diverse
    assert by_id[15]["ttr_bp"] == 250  # 1 distinct / 40 tokens


def test_zscore_zero_variance_group(ray_session, edge_docs):
    from schemasaurus_ray.pipelines import queries as q

    got = q.zscore_outliers_documents(edge_docs)
    _match(got, _oracle("zscore_outliers_documents", edge_docs))
    langs = {r["lang"] for r in got.to_pylist()}
    assert "zz" not in langs  # zero variance: strict > never fires
    assert 16 in [r["doc_id"] for r in got.to_pylist()]  # the planted outlier


def test_bigram_pmi_empty_and_single_token_docs(ray_session, edge_docs):
    from schemasaurus_ray.pipelines import queries as q

    got = q.bigram_pmi_documents(edge_docs, min_count=2)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{edge_docs}/documents.parquet'"
    )
    import __ray_entry__ as entry

    sql = entry.oracle_sql()["bigram_pmi_documents"].replace(
        "bc.cnt >= 5", "bc.cnt >= 2"
    )
    _match(got, con.execute(sql).arrow())
    assert got.num_rows > 0  # the repeated 'dup dup' / 'zzN zzN' bigrams


def test_relevance_zero_match_corpus(ray_session, edge_docs):
    """No query term occurs in the edge corpus → empty result on BOTH
    sides (zero-row parity), and the zero-df smoothing path never
    divides by zero."""
    from schemasaurus_ray.pipelines import queries as q

    got = q.relevance_topk_documents(edge_docs)
    _match(got, _oracle("relevance_topk_documents", edge_docs))
    assert got.num_rows == 0


def test_relevance_topk_sf(ray_session):
    """At sf0.001 the terms DO occur: ranking, tf columns and the µunit
    scores match the oracle including the df=0 'spill' smoothing term."""
    from schemasaurus_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.001"
    got = q.relevance_topk_documents(sf)
    _match(got, _oracle("relevance_topk_documents", sf))
    assert got.num_rows > 0


def test_burst_null_event_type_group(ray_session, edge_events):
    from schemasaurus_ray.pipelines import queries as q

    got = q.burst_events(edge_events)
    _match(got, _oracle("burst_events", edge_events))


def test_ngram_novelty_short_docs(ray_session, edge_docs):
    """Docs with <3 tokens (incl. empty/whitespace) contribute no
    trigrams; counts and both basis-point ratios match the oracle."""
    from schemasaurus_ray.pipelines import queries as q

    got = q.ngram_novelty_documents(edge_docs)
    _match(got, _oracle("ngram_novelty_documents", edge_docs))
    row = got.to_pylist()[0]
    assert row["n_total"] > 0 and row["n_types"] <= row["n_total"]


def test_assoc_rules_null_types(ray_session, edge_events):
    """Association rules over a stream with NULL event_type: rules exist
    only between non-null types; support/confidence/lift stay all-integer
    and match the oracle; every unordered pair surfaces mirrored."""
    from schemasaurus_ray.pipelines import queries as q

    got = q.assoc_rules_events(edge_events)
    _match(got, _oracle("assoc_rules_events", edge_events))
    rows = got.to_pylist()
    assert rows, "edge fixture has co-active users"
    pairs = {(r["t_a"], r["t_b"]) for r in rows}
    assert all((b, a) in pairs for a, b in pairs)  # mirrored rules
    for r in rows:
        assert r["conf_bp"] == (10000 * r["n_both"]) // r["n_a"]


def test_conversion_latency_no_converters(ray_session, edge_events):
    """The edge stream has no 'purchase' type at all → empty histogram on
    BOTH sides (zero-row parity through the thinned min-aggregate)."""
    from schemasaurus_ray.pipelines import queries as q

    got = q.conversion_latency_events(edge_events)
    _match(got, _oracle("conversion_latency_events", edge_events))
    assert got.num_rows == 0


def test_conversion_latency_sf(ray_session):
    from schemasaurus_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.001"
    got = q.conversion_latency_events(sf)
    _match(got, _oracle("conversion_latency_events", sf))
    assert got.num_rows > 0


def test_ngram_novelty_trigram_free_corpus(ray_session, tmp_path_factory):
    """A corpus where no doc reaches 3 tokens: both sides report the
    all-zero row (the oracle coalesces its empty-aggregate NULLs — review
    r5 session-5 finding)."""
    from schemasaurus_ray.pipelines import queries as q

    d = tmp_path_factory.mktemp("no_trigrams")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["one two", "single"], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
                "source": pa.array(["s", "s"], pa.string()),
                "n_chars": pa.array([7, 6], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = q.ngram_novelty_documents(str(d))
    _match(got, _oracle("ngram_novelty_documents", str(d)))
    assert got.to_pylist() == [
        {"n_types": 0, "n_singletons": 0, "n_total": 0, "distinct_bp": 0, "novelty_bp": 0}
    ]


def test_vocab_growth_edge_corpus(ray_session, edge_docs):
    """Vocabulary growth over the edge corpus (empty/whitespace docs,
    Unicode-whitespace tokens): deciles, new-token counts and the
    cumulative prefix sum match the oracle."""
    from schemasaurus_ray.pipelines import queries as q

    got = q.vocab_growth_documents(edge_docs)
    _match(got, _oracle("vocab_growth_documents", edge_docs))
    rows = got.to_pylist()
    assert rows and rows[-1]["cum_vocab"] == sum(r["new_tokens"] for r in rows)


def test_seasonality_chisq_null_type(ray_session, edge_events):
    """Per-type hour-of-day chi-square with a NULL event_type group:
    NULL is its own row, placed last on both sides; counts and the
    ×100-scaled statistic match the oracle exactly."""
    from schemasaurus_ray.pipelines import queries as q

    got = q.seasonality_chisq_events(edge_events)
    _match(got, _oracle("seasonality_chisq_events", edge_events))
    rows = got.to_pylist()
    assert rows[-1]["event_type"] is None  # NULLS LAST, mirrored
    for r in rows:
        assert r["chisq_centi"] >= 0


def test_user_type_pairs_matches_bruteforce(ray_session):
    """Property: the shifted-mask pair expansion equals the brute-force
    within-user unordered pair sets on random (user, type) tables."""
    import itertools

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from schemasaurus_ray.pipelines.queries import _user_type_pairs

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 8), st.sampled_from("abcdefg")),
            min_size=0,
            max_size=60,
        )
    )
    def check(pairs):
        distinct = sorted(set(pairs))
        if not distinct:
            return
        t = pa.table(
            {
                "user_id": pa.array([u for u, _ in distinct], pa.int64()),
                "event_type": pa.array([c for _, c in distinct], pa.string()),
            }
        )
        _, _, types, key, counts = _user_type_pairs(t)
        nt = len(types)
        got = {}
        for k, c in zip(key.tolist(), counts.tolist()):
            a = types[k // nt].as_py()
            b = types[k % nt].as_py()
            got[(a, b)] = got.get((a, b), 0) + c
        want = {}
        by_user = {}
        for u, c in distinct:
            by_user.setdefault(u, []).append(c)
        for u, cs in by_user.items():
            for a, b in itertools.combinations(sorted(cs), 2):
                want[(a, b)] = want.get((a, b), 0) + 1
        assert got == want

    check()


def test_zscore_isqrt_threshold_equivalence():
    """Property: |d| > isqrt(R) ⇔ d² > R for every non-negative R (the
    exact-integer z-score trick) — including perfect squares, R = 0, and
    values straddling the float64 sqrt precision cliff."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(min_value=-(10**18), max_value=10**18),
        st.integers(min_value=0, max_value=10**36),
    )
    def check(d, r):
        assert (abs(d) > math.isqrt(r)) == (d * d > r)

    check()


@pytest.fixture(scope="module")
def preepoch_events(tmp_path_factory):
    """Events with pre-1970 and NULL timestamps: DuckDB's integer //
    truncates toward zero and % follows the dividend (numpy floors), so
    every time-bucketing query must go through _duckdb_time_bucket; NULL
    ts forms its own bucket group (review r5 session-5 finding)."""
    d = tmp_path_factory.mktemp("preepoch")
    rng = np.random.default_rng(9)
    n = 3000
    ts = rng.integers(-5 * 3_600_000_000, 5 * 3_600_000_000, size=n)
    ts_obj = [None if i % 97 == 0 else int(v) for i, v in enumerate(ts)]
    types = np.array(["view", "purchase", "click", None], dtype=object)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts_obj, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 40, n).astype(np.int64)),
            "event_type": pa.array(types[rng.integers(0, 4, n)].tolist(), pa.string()),
            "value": pa.array(rng.normal(size=n)),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def test_seasonality_preepoch_and_null_ts(ray_session, preepoch_events):
    from schemasaurus_ray.pipelines import queries as q

    got = q.seasonality_chisq_events(preepoch_events)
    _match(got, _oracle("seasonality_chisq_events", preepoch_events))


def test_burst_preepoch_and_null_ts(ray_session, preepoch_events):
    from schemasaurus_ray.pipelines import queries as q

    got = q.burst_events(preepoch_events)
    _match(got, _oracle("burst_events", preepoch_events))


def test_conversion_latency_preepoch_and_null_ts(ray_session, preepoch_events):
    from schemasaurus_ray.pipelines import queries as q

    got = q.conversion_latency_events(preepoch_events)
    _match(got, _oracle("conversion_latency_events", preepoch_events))
    assert got.num_rows > 0


def test_ws_tokens_vertical_tab_parity(ray_session, tmp_path_factory):
    """Arrow's ASCII whitespace includes \\v, RE2's \\s does not — the
    oracles therefore tokenize with the explicit [^ \\t\\n\\x0b\\f\\r]+
    class. Pin the parity on \\v-bearing documents end-to-end."""
    from schemasaurus_ray.pipelines import queries as q

    d = tmp_path_factory.mktemp("vtab")
    texts = [
        "a\x0bb c d e f g h i j",
        "\x0b lead one two three four five six seven eight",
        "plain one two three four five six seven eight nine",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en", "en", "de"], pa.string()),
                "source": pa.array(["s"] * 3, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    for name in ("ttr_documents", "ngram_novelty_documents", "vocab_growth_documents"):
        got = q.__dict__[name](str(d))
        _match(got, _oracle(name, str(d)))


def test_floor_time_bucket_property():
    """Property: _floor_time_bucket (numpy floor semantics) equals the
    oracle's spelled-out integer floor expression — DuckDB's // truncates
    toward zero, so the SQL carries the CASE adjustment — on random µs
    values spanning both epoch sides, including exact hour boundaries.
    Floor-mod keeps hour-of-day in 0..23 for pre-1970 timestamps."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from schemasaurus_ray.pipelines.queries import _floor_time_bucket

    D = 3_600_000_000
    con = duckdb.connect()

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.integers(min_value=-10 * D, max_value=10 * D),
                st.sampled_from([0, -1, 1, D, -D, 2 * D - 1, -2 * D + 1]),
            ),
            min_size=1,
            max_size=50,
        )
    )
    def check(vals):
        got = _floor_time_bucket(
            pa.array(vals, pa.int64()).cast(pa.timestamp("us")), D, 24
        ).to_pylist()
        want = [
            r[0]
            for r in con.execute(
                """SELECT ((((x // ?1) - CASE WHEN x < 0 AND x % ?1 <> 0 THEN 1 ELSE 0 END)
                            % 24) + 24) % 24
                     FROM (SELECT unnest(?2) AS x)""",
                {"1": D, "2": vals},
            ).fetchall()
        ]
        assert got == want
        assert all(0 <= v < 24 for v in got)

    check()
