"""Raw-Ray hash shuffle units: uniqueness counts, anti-join, composite keys,
hot-key skew boundedness (north_rule: 'salted-key skew mitigation' — the
per-shard pre-aggregation IS the salt/combiner: a pathological hot key
contributes at most one row per shard to the exchange)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from schemasaurus_ray.stages.shuffle import (
    anti_join_shuffled,
    combined_key_checks,
    count_keys_shuffled,
)


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("shards")
    # 4 shards; key "dup" appears twice in shard 0; key "hot" appears 10000
    # times in EVERY shard (hot key); unique keys elsewhere
    for s in range(4):
        keys = [f"k{s}-{i}" for i in range(500)] + ["hot"] * 10000
        if s == 0:
            keys += ["dup", "dup", "crossdup"]
        if s == 1:
            keys += ["crossdup"]
        pq.write_table(
            pa.table({"k": pa.array(keys, pa.string()), "v": pa.array(range(len(keys)))}),
            str(d / f"s{s}.parquet"),
        )
    return str(d)


def _paths(d):
    return sorted(os.path.join(d, f) for f in os.listdir(d))


def test_count_keys_duplicates(shard_dir):
    out = count_keys_shuffled(_paths(shard_dir), ["k"], min_count=2)
    got = dict(zip(out.column("k").to_pylist(), out.column("cnt").to_pylist()))
    assert got == {"hot": 40000, "dup": 2, "crossdup": 2}


def test_count_keys_all(shard_dir):
    out = count_keys_shuffled(_paths(shard_dir), ["k"], min_count=1)
    assert out.num_rows == 4 * 500 + 3  # uniques + hot + dup + crossdup
    total = sum(out.column("cnt").to_pylist())
    assert total == 4 * 10500 + 3 + 1


def test_skew_bounded_map_output(shard_dir):
    """The hot key collapses to ONE pre-aggregated row per shard — the
    exchange sees 4 rows for 40k occurrences."""
    from schemasaurus_ray.stages.shuffle import _precount_table

    t = pq.read_table(_paths(shard_dir)[0], columns=["k"])
    pre = _precount_table(t, ["k"])
    hot_rows = pre.filter(pa.compute.equal(pre.column("k"), "hot"))
    assert hot_rows.num_rows == 1
    assert hot_rows.column("cnt")[0].as_py() == 10000


def test_anti_join_paths_right(shard_dir, tmp_path_factory):
    rd_dir = tmp_path_factory.mktemp("right")
    # right side contains every k0-* key and "hot" — everything else orphans
    right_keys = [f"k0-{i}" for i in range(500)] + ["hot"]
    pq.write_table(pa.table({"rk": pa.array(right_keys, pa.string())}), str(rd_dir / "r.parquet"))
    out = anti_join_shuffled(_paths(shard_dir), "k", [str(rd_dir / "r.parquet")], "rk")
    orphan_keys = set(out.column("k").to_pylist())
    assert "hot" not in orphan_keys
    assert all(not k.startswith("k0-") for k in orphan_keys)
    assert "dup" in orphan_keys and "crossdup" in orphan_keys
    assert len(orphan_keys) == 3 * 500 + 2


def test_combined_matches_separate(shard_dir, tmp_path_factory):
    rd_dir = tmp_path_factory.mktemp("right2")
    pq.write_table(
        pa.table({"rk": pa.array(["hot", "dup"], pa.string())}), str(rd_dir / "r.parquet")
    )
    right = [str(rd_dir / "r.parquet")]
    dups, orphans = combined_key_checks(_paths(shard_dir), "k", right, "rk")
    sep_dups = count_keys_shuffled(_paths(shard_dir), ["k"], min_count=2)
    sep_orph = anti_join_shuffled(_paths(shard_dir), "k", right, "rk")
    # combined is pid-attributed: one row per (key, source shard)
    assert set(dups.column("k").to_pylist()) == set(sep_dups.column("k").to_pylist())
    assert set(orphans.column("k").to_pylist()) == set(sep_orph.column("k").to_pylist())
    # "hot" appears in every one of the 4 shards → 4 attributed rows
    hot_rows = dups.filter(pa.compute.equal(dups.column("k"), "hot"))
    assert sorted(hot_rows.column("pid").to_pylist()) == [0, 1, 2, 3]
    assert set(hot_rows.column("cnt").to_pylist()) == {40000}
    # "dup" lives only in shard 0
    dup_rows = dups.filter(pa.compute.equal(dups.column("k"), "dup"))
    assert dup_rows.column("pid").to_pylist() == [0]


def test_composite_key_counts(shard_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("composite")
    t = pa.table(
        {
            "a": pa.array([1, 1, 1, 2], pa.int64()),
            "b": pa.array(["x", "x", "y", "x"], pa.string()),
        }
    )
    pq.write_table(t, str(d / "c.parquet"))
    out = count_keys_shuffled([str(d / "c.parquet")], ["a", "b"], min_count=2)
    assert out.num_rows == 1
    assert out.column("a").to_pylist() == [1]
    assert out.column("b").to_pylist() == ["x"]
    assert out.column("cnt").to_pylist() == [2]


def test_empty_and_no_dups(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("nodups")
    pq.write_table(pa.table({"k": pa.array(["a", "b"], pa.string())}), str(d / "x.parquet"))
    out = count_keys_shuffled([str(d / "x.parquet")], ["k"], min_count=2)
    assert out.num_rows == 0


def test_incremental_partials_skip_source_reads(shard_dir, tmp_path_factory, ray_session):
    """With partials_dir set, a re-run with done_paths=all must reload the
    persisted per-shard key pre-aggs and NOT re-read the shards — proven by
    replacing the source shards with different data and asserting the
    results are unchanged from the first run."""
    import shutil

    from schemasaurus_ray.stages.shuffle import combined_key_checks_async

    work = tmp_path_factory.mktemp("incr")
    src = work / "shards"
    src.mkdir()
    for f in os.listdir(shard_dir):
        shutil.copy(os.path.join(shard_dir, f), str(src / f))
    partials = str(work / "partials")
    paths = sorted(str(src / f) for f in os.listdir(str(src)))

    dups1, orphans1 = combined_key_checks_async(
        paths, "k", None, None, partials_dir=partials, done_paths=set()
    )()
    assert sorted(os.listdir(partials)) == [f"keys_k_p{i:05d}.parquet" for i in range(4)]

    # clobber the sources: if the second run read them, counts would change
    for p in paths:
        pq.write_table(pa.table({"k": pa.array(["POISON"] * 5, pa.string())}), p)

    dups2, _ = combined_key_checks_async(
        paths, "k", None, None, partials_dir=partials, done_paths=set(paths)
    )()

    def as_set(t):
        return set(zip(t.column("k").to_pylist(), t.column("cnt").to_pylist(), t.column("pid").to_pylist()))

    assert as_set(dups2) == as_set(dups1)
    assert "POISON" not in set(dups2.column("k").to_pylist())


def test_tree_combine_many_shards(tmp_path_factory, ray_session):
    """Fan-in layering: >_FAN_IN shards per bucket still reduce correctly
    (synthetic many-shard smoke for the 10k-shard driver-blowup caveat)."""
    from schemasaurus_ray.stages import shuffle as sh

    d = tmp_path_factory.mktemp("many")
    paths = []
    n_shards = 20
    for s in range(n_shards):
        t = pa.table({"k": pa.array(["shared", f"u{s}"], pa.string())})
        p = str(d / f"m{s}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    old = sh._FAN_IN
    sh._FAN_IN = 3  # force a multi-layer tree with a small shard count
    try:
        out = sh.count_keys_shuffled(paths, ["k"], num_buckets=2, min_count=2)
    finally:
        sh._FAN_IN = old
    assert out.column("k").to_pylist() == ["shared"]
    assert out.column("cnt").to_pylist() == [n_shards]


def test_partial_key_files_pid_prefix_no_collision(tmp_path):
    """pid 3's file list must NOT include pid 31's files (p00003 is a
    string prefix of p00031 — an open-ended glob double-counted keys)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.shuffle import partial_key_files

    t = pa.table({"k": pa.array(["a"], pa.string()), "cnt": pa.array([1], pa.int64())})
    names = [
        "keys_k_p00003.parquet",
        "keys_k_p00003-abc123.parquet",
        "keys_k_p00031.parquet",
        "keys_k_p00031-def456.parquet",
        "keys_other_p00003.parquet",
    ]
    for n in names:
        pq.write_table(t, str(tmp_path / n))
    got = [os.path.basename(f) for f in partial_key_files(str(tmp_path), "k", 3)]
    assert got == ["keys_k_p00003-abc123.parquet", "keys_k_p00003.parquet"]
    got31 = [os.path.basename(f) for f in partial_key_files(str(tmp_path), "k", 31)]
    assert got31 == ["keys_k_p00031-def456.parquet", "keys_k_p00031.parquet"]


def test_agg_keys_shuffled_mergeable_and_having(tmp_path_factory, ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.shuffle import agg_keys_shuffled

    d = tmp_path_factory.mktemp("aggshards")
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 40, size=600).astype(np.int64)
    vals = rng.integers(-5, 50, size=600).astype(np.int64)
    for i in range(3):  # keys deliberately span shards
        pq.write_table(
            pa.table({"k": pa.array(keys[i::3]), "v": pa.array(vals[i::3])}),
            str(d / f"s{i}.parquet"),
        )
    paths = sorted(str(p) for p in d.glob("*.parquet"))
    out = agg_keys_shuffled(
        paths, ["k"], [("v", "sum"), ("v", "min"), ("v", "max"), ("v", "count")]
    )
    got = {
        r["k"]: (r["sum_v"], r["min_v"], r["max_v"], r["cnt"]) for r in out.to_pylist()
    }
    for k in np.unique(keys):
        sel = vals[keys == k]
        assert got[k] == (sel.sum(), sel.min(), sel.max(), len(sel)), k
    # HAVING inside the reduce
    out = agg_keys_shuffled(
        paths,
        ["k"],
        [("v", "sum")],
        having_fn=lambda t: t.filter(pa.compute.greater(t.column("sum_v"), 300)),
    )
    want = {int(k) for k in np.unique(keys) if vals[keys == k].sum() > 300}
    assert {r["k"] for r in out.to_pylist()} == want and want
    # transform_fn derives the value column; empty result returns cleanly
    out = agg_keys_shuffled(
        paths,
        ["k"],
        [("v2", "sum")],
        transform_fn=lambda t: t.append_column(
            "v2", pa.compute.multiply(t.column("v"), 2)
        ),
        having_fn=lambda t: t.filter(pa.compute.greater(t.column("sum_v2"), 10**9)),
        read_cols=["k", "v"],
    )
    assert out.num_rows == 0


def test_distinct_count_by_group(tmp_path_factory, ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.shuffle import distinct_count_by_group

    d = tmp_path_factory.mktemp("dcshards")
    rng = np.random.default_rng(5)
    groups = rng.choice(["a", "b", "c"], size=500).astype(object)
    vals = rng.integers(0, 60, size=500).astype(np.int64)
    # sprinkle nulls: null value rows are skipped, null group is its own group
    g_list = [None if i % 97 == 0 else g for i, g in enumerate(groups)]
    v_list = [None if i % 53 == 0 else int(v) for i, v in enumerate(vals)]
    for i in range(3):  # duplicates of the same pair span shards
        pq.write_table(
            pa.table({"g": pa.array(g_list[i::3], pa.string()),
                      "v": pa.array(v_list[i::3], pa.int64())}),
            str(d / f"s{i}.parquet"),
        )
    paths = sorted(str(p) for p in d.glob("*.parquet"))
    out = distinct_count_by_group(paths, "g", "v")
    got = {r["g"]: r["cnt"] for r in out.to_pylist()}
    want: dict = {}
    for g, v in zip(g_list, v_list):
        if v is not None:
            want.setdefault(g, set()).add(v)
    assert got == {g: len(s) for g, s in want.items()}


def test_argmax_rank_pack_roundtrip_and_ordering():
    """util.pack_argmax_rank: max(rank) == (max score, then MIN id) — pinned
    against a brute-force lexicographic sort, plus exact round-trip."""
    import numpy as np

    from schemasaurus_ray.util import pack_argmax_rank, unpack_argmax_rank

    rng = np.random.default_rng(7)
    score = rng.integers(0, 10001, size=500)
    ids = rng.permutation(500).astype(np.int64)
    rank = pack_argmax_rank(score, ids)
    s2, i2 = unpack_argmax_rank(rank)
    assert (s2 == score).all() and (i2 == ids).all()
    # winner by packed max == winner by (score DESC, id ASC)
    order = np.lexsort((ids, -score))
    assert ids[rank.argmax()] == ids[order[0]]
    # bounds enforced
    import pytest

    with pytest.raises(ValueError):
        pack_argmax_rank(np.array([1]), np.array([-1]))
    with pytest.raises(ValueError):
        pack_argmax_rank(np.array([1 << 23]), np.array([0]))


def test_mode_by_group_ties_and_partials(ray_session, tmp_path):
    """mode_by_group: exact counts merged across shards; ties go to the
    lexicographically smallest value; null values skipped."""
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.shuffle import mode_by_group

    # user 1: b×3 (split across shards) vs a×2 -> b
    # user 2: tie a×2 / c×2 -> a (smallest)
    # user 3: only nulls -> absent; user 4: single row -> that value
    s1 = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "event_type": pa.array(["b", "b", "a", "c", "a", None], pa.string()),
        }
    )
    s2 = pa.table(
        {
            "user_id": pa.array([1, 1, 2, 2, 3, 4], pa.int64()),
            "event_type": pa.array(["b", "a", "c", "a", None, "z"], pa.string()),
        }
    )
    p1, p2 = str(tmp_path / "s1.parquet"), str(tmp_path / "s2.parquet")
    pq.write_table(s1, p1)
    pq.write_table(s2, p2)
    out = mode_by_group([p1, p2], "user_id", "event_type", num_buckets=4).sort_by("user_id")
    assert out.column("user_id").to_pylist() == [1, 2, 4]
    assert out.column("event_type").to_pylist() == ["b", "a", "z"]
    assert out.column("cnt").to_pylist() == [3, 2, 1]


def test_mode_by_group_random_vs_duckdb(ray_session, tmp_path):
    """mode_by_group on random shards vs the row_number-window oracle."""
    import duckdb
    import numpy as np
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.shuffle import mode_by_group

    rng = np.random.default_rng(5)
    paths = []
    all_parts = []
    for s in range(4):
        n = int(rng.integers(50, 300))
        t = pa.table(
            {
                "g": pa.array(rng.integers(0, 40, size=n), pa.int64()),
                "v": pa.array(rng.choice(list("abcdefgh"), size=n), pa.string()),
            }
        )
        p = str(tmp_path / f"m{s}.parquet")
        pq.write_table(t, p)
        paths.append(p)
        all_parts.append(t)
    got = mode_by_group(paths, "g", "v", num_buckets=4).sort_by("g")
    con = duckdb.connect()
    con.register("t", pa.concat_tables(all_parts))
    want = con.sql(
        """
        SELECT g, v, cnt FROM (
            SELECT g, v, COUNT(*) AS cnt,
                   row_number() OVER (PARTITION BY g ORDER BY COUNT(*) DESC, v) rn
              FROM t GROUP BY g, v
        ) WHERE rn = 1 ORDER BY g
        """
    ).arrow()
    assert got.column("g").to_pylist() == want.column("g").to_pylist()
    assert got.column("v").to_pylist() == want.column("v").to_pylist()
    assert [int(x) for x in got.column("cnt").to_pylist()] == [
        int(x) for x in want.column("cnt").to_pylist()
    ]


def test_heavy_hitters_shuffled_vs_duckdb(ray_session, tmp_path):
    """Fair-share hot-key filter on random skewed shards vs the HAVING
    oracle; the full count table never returns to the driver."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.shuffle import heavy_hitters_shuffled

    rng = np.random.default_rng(5)
    paths, parts = [], []
    for s in range(4):
        n = int(rng.integers(100, 400))
        keys = rng.zipf(1.6, size=n) % 97  # skewed
        t = pa.table({"k": pa.array(keys.astype(np.int64), pa.int64())})
        p = str(tmp_path / f"h{s}.parquet")
        pq.write_table(t, p)
        paths.append(p)
        parts.append(t)
    got = heavy_hitters_shuffled(paths, ["k"], mult_num=3, mult_den=2, num_buckets=4)
    got = got.sort_by("k")
    con = duckdb.connect()
    con.register("t", pa.concat_tables(parts))
    want = con.sql(
        """
        SELECT k, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY k
        HAVING count(*) * (SELECT count(DISTINCT k) FROM t) * 2
               > (SELECT count(*) FROM t) * 3
         ORDER BY k
        """
    ).arrow()
    assert got.column("k").to_pylist() == want.column("k").to_pylist()
    assert got.column("cnt").to_pylist() == want.column("cnt").to_pylist()


def test_count_keys_max_key_rows_guard(ray_session, tmp_path):
    """max_key_rows trips DomainTooLargeError LOUDLY — map-side when one
    shard's local domain exceeds it, driver-side when only the merged
    total does — instead of silently shuffling an O(rows) count table
    (VERDICT r3 #4)."""
    import ray

    from schemasaurus_ray.stages.shuffle import count_keys_shuffled
    from schemasaurus_ray.stages.stats import DomainTooLargeError

    # one shard with 500 distinct keys: map-side trip at max_key_rows=100
    p_big = str(tmp_path / "big.parquet")
    pq.write_table(
        pa.table({"k": pa.array(np.arange(500, dtype=np.int64), pa.int64())}), p_big
    )
    with pytest.raises(ray.exceptions.RayTaskError) as ei:
        count_keys_shuffled([p_big], ["k"], min_count=1, max_key_rows=100)
    assert isinstance(ei.value.cause, DomainTooLargeError)

    # two shards, 300 disjoint keys each: per-shard OK, merged 600 > 500
    paths = []
    for s in range(2):
        p = str(tmp_path / f"s{s}.parquet")
        ks = np.arange(s * 300, (s + 1) * 300, dtype=np.int64)
        pq.write_table(pa.table({"k": pa.array(ks, pa.int64())}), p)
        paths.append(p)
    with pytest.raises(DomainTooLargeError, match="merged"):
        count_keys_shuffled(paths, ["k"], min_count=1, max_key_rows=500)

    # and untripped it still returns the exact counts
    out = count_keys_shuffled(paths, ["k"], min_count=1, max_key_rows=10_000)
    assert out.num_rows == 600


def test_grouped_quantiles_auto_routes_to_tdigest(ray_session, tmp_path):
    """The domain-guarded router: bounded domains stay EXACT (bit-identical
    to the unrouted count-table path); a high-cardinality continuous
    column routes loudly (warning) to the keyed t-digest fallback with
    small relative error. Same for the median/MAD router."""
    from schemasaurus_ray.stages.stats import (
        exact_quantiles_from_counts,
        grouped_median_mad_auto,
        grouped_quantiles_auto,
    )

    rng = np.random.default_rng(23)
    g = np.where(rng.random(20_000) < 0.5, "A", "B")
    bounded = rng.integers(0, 40, size=20_000).astype(np.float64)
    continuous = rng.normal(1000.0, 100.0, size=20_000)  # ~all-distinct
    paths = []
    for s, sl in enumerate(np.array_split(np.arange(20_000), 4)):
        p = str(tmp_path / f"q{s}.parquet")
        pq.write_table(
            pa.table(
                {
                    "g": pa.array(g[sl].tolist(), pa.string()),
                    "vb": pa.array(bounded[sl], pa.float64()),
                    "vc": pa.array(continuous[sl], pa.float64()),
                }
            ),
            p,
        )
        paths.append(p)
    bps = [100, 5000, 9900]

    method, got = grouped_quantiles_auto(paths, "g", "vb", bps, max_distinct=1000)
    assert method == "exact"
    for grp in ("A", "B"):
        vals = bounded[g == grp]
        counts: dict[float, int] = {}
        for v in vals:
            counts[float(v)] = counts.get(float(v), 0) + 1
        assert [float(x) for x in got[grp]] == [
            float(x) for x in exact_quantiles_from_counts(counts, bps)
        ]

    with pytest.warns(UserWarning, match="t-digest"):
        method, got = grouped_quantiles_auto(paths, "g", "vc", bps, max_distinct=1000)
    assert method == "tdigest"
    for grp in ("A", "B"):
        vals = np.sort(continuous[g == grp])
        for bp, approx in zip(bps, got[grp]):
            exact = vals[min(len(vals) - 1, max(0, -(-bp * len(vals) // 10000) - 1))]
            assert abs(approx - exact) / max(abs(exact), 1e-9) < 0.02, (grp, bp)

    with pytest.warns(UserWarning, match="t-digest"):
        method, mm = grouped_median_mad_auto(paths, "g", "vc", max_distinct=1000)
    assert method == "tdigest"
    for grp in ("A", "B"):
        vals = continuous[g == grp]
        true_med = float(np.median(vals))
        true_mad = float(np.median(np.abs(vals - true_med)))
        m, mad = mm[grp]
        assert abs(m - true_med) / abs(true_med) < 0.01
        assert abs(mad - true_mad) / max(true_mad, 1e-9) < 0.05

    method, mm = grouped_median_mad_auto(paths, "g", "vb", max_distinct=1000)
    assert method == "exact"


def test_default_buckets_cluster_shape(ray_session, monkeypatch):
    """Reduce fan-out derives from cluster shape (VERDICT r4 #6): pinned to
    the measured 16-bucket optimum on this single box regardless of shard
    count, floor 4 / shards-over-4 ratio below the cap, scaled 16-per-node
    under a mocked multi-node resource map, env override wins outright."""
    from schemasaurus_ray.stages import shuffle as sh

    monkeypatch.delenv("GRAFT_SHUFFLE_BUCKETS", raising=False)
    monkeypatch.setattr(sh, "_CLUSTER_NODES_CACHE", None)
    assert sh._cluster_nodes() == 1  # the test box is one node
    assert sh._default_buckets(4096) == 16  # single-node clamp (CLAUDE.md)
    assert sh._default_buckets(16) == 4  # floor
    assert sh._default_buckets(40) == 10  # shards/4 under the cap

    monkeypatch.setattr(sh, "_cluster_nodes", lambda: 8)
    assert sh._default_buckets(4096) == 128  # 16 × 8 nodes
    assert sh._default_buckets(40) == 10  # ratio unchanged below the cap

    monkeypatch.setenv("GRAFT_SHUFFLE_BUCKETS", "5")
    assert sh._default_buckets(4096) == 5


def test_mode_by_group_null_group_single_winner(ray_session, tmp_path):
    """A NULL group is ONE group (SQL PARTITION BY semantics): its mode is
    a single winner row, not one row per distinct value (pc.equal(null,
    null) is null — the group-change detection must not split it)."""
    from schemasaurus_ray.stages.shuffle import mode_by_group

    tbl = pa.table(
        {
            "g": pa.array([None, None, None, "a", "a"], pa.string()),
            "v": pa.array(["y", "y", "x", "p", "q"], pa.string()),
        }
    )
    p = str(tmp_path / "m.parquet")
    pq.write_table(tbl, p)
    out = mode_by_group([p], "g", "v", num_buckets=1)
    rows = {g: (v, c) for g, v, c in zip(
        out.column("g").to_pylist(), out.column("v").to_pylist(), out.column("cnt").to_pylist()
    )}
    assert rows[None] == ("y", 2)  # one winner for the null group
    assert rows["a"] == ("p", 1)  # tie -> lexicographically smallest
    assert out.num_rows == 2


def test_distinct_count_by_group_all_null_values(ray_session, tmp_path):
    """COUNT(DISTINCT x) GROUP BY g returns (g, 0) for a group whose x is
    all NULL — the group must survive the shuffle, not vanish."""
    from schemasaurus_ray.stages.shuffle import distinct_count_by_group

    tbl = pa.table(
        {
            "g": pa.array(["only_nulls", "only_nulls", "mixed", "mixed", None], pa.string()),
            "x": pa.array([None, None, "u1", None, "u2"], pa.string()),
        }
    )
    p = str(tmp_path / "d.parquet")
    pq.write_table(tbl, p)
    out = distinct_count_by_group([p], "g", "x", num_buckets=2)
    rows = dict(zip(out.column("g").to_pylist(), out.column("cnt").to_pylist()))
    assert rows == {"only_nulls": 0, "mixed": 1, None: 1}


def test_shuffles_zero_input_paths(ray_session):
    """Every path-driven shuffle must return an empty result on ZERO input
    shards (the all-quarantined resume case) instead of raising
    ArrowInvalid from a zero-table concat inside a remote task."""
    from schemasaurus_ray.stages.shuffle import (
        distinct_count_by_group,
        heavy_hitters_shuffled,
        key_count_histogram_shuffled,
        mode_by_group,
    )

    assert count_keys_shuffled([], ["k"]).num_rows == 0
    assert anti_join_shuffled([], "k", [], "r").num_rows == 0
    assert heavy_hitters_shuffled([], ["k"], 10, 1).num_rows == 0
    assert key_count_histogram_shuffled([], ["k"]).num_rows == 0
    assert distinct_count_by_group([], "g", "x").num_rows == 0
    assert mode_by_group([], "g", "v").num_rows == 0


def test_count_keys_zero_result_keeps_key_type(ray_session, tmp_path):
    """No-violation results must keep the key column's real type — a
    string-typed fallback flipped the schema with data content."""
    tbl = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    p = str(tmp_path / "t.parquet")
    pq.write_table(tbl, p)
    out = count_keys_shuffled([p], ["k"], min_count=2)
    assert out.num_rows == 0 and out.schema.field("k").type == pa.int64()
    aj = anti_join_shuffled([p], "k", [p], "k")
    assert aj.num_rows == 0 and aj.schema.field("k").type == pa.int64()


def test_agg_keys_shuffled_bucket_cols(tmp_path_factory, ray_session):
    """bucket_cols=[primary] co-locates every (primary, sub) partial of one
    primary key in ONE reduce task, so having_fn can compute per-primary
    aggregates over its sub-keys (the cooccurrence / user-entropy /
    label-conflict shape). Verified by a having_fn that REQUIRES
    completeness: per-primary distinct-sub counts, cross-checked against
    a driver-side recompute; plus the subset guard."""
    import numpy as np
    import pyarrow.parquet as pq
    import pytest

    from schemasaurus_ray.stages.shuffle import agg_keys_shuffled

    d = tmp_path_factory.mktemp("bucketcols")
    rng = np.random.default_rng(7)
    users = rng.integers(0, 50, size=900).astype(np.int64)
    subs = rng.integers(0, 6, size=900).astype(np.int64)
    for i in range(4):  # every user spans shards
        pq.write_table(
            pa.table({"u": pa.array(users[i::4]), "s": pa.array(subs[i::4])}),
            str(d / f"s{i}.parquet"),
        )
    paths = sorted(str(p) for p in d.glob("*.parquet"))

    def per_user_subcount(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"u": pa.array([], pa.int64()), "n_subs": pa.array([], pa.int64())}
            )
        srt = t.sort_by("u")
        u = np.asarray(srt.column("u").combine_chunks(), dtype=np.int64)
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        n = np.diff(np.concatenate((starts, [len(u)])))
        return pa.table(
            {
                "u": pa.array(u[starts], pa.int64()),
                "n_subs": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    out = agg_keys_shuffled(
        paths,
        ["u", "s"],
        [("s", "count")],
        bucket_cols=["u"],
        having_fn=per_user_subcount,
        num_buckets=8,
    )
    got = {r["u"]: r["n_subs"] for r in out.to_pylist()}
    want = {
        int(u): len(np.unique(subs[users == u])) for u in np.unique(users)
    }
    assert got == want  # a split user would surface as a duplicate key
    assert len(got) == len(out)  # no primary key appears in two buckets

    with pytest.raises(ValueError, match="subset"):
        agg_keys_shuffled(paths, ["u"], [("u", "count")], bucket_cols=["s"])


def test_group_agg_fixed_first_null_string_keys(tmp_path_factory, ray_session):
    """Regression for the pyarrow 16 grouper defect: a fixed-width key
    FOLLOWING a null-bearing string key makes multi-key group_by emit the
    NULL group once per internal batch (measured 2646 rows for 35 true
    groups at 20k rows). group_agg_fixed_first reorders the kernel call
    fixed-width-first and restores caller order, and every engine
    group_by routes through it — pinned end-to-end via agg_keys_shuffled
    with a (string-with-NULLs, int64) key."""
    import collections

    import numpy as np
    import pyarrow.parquet as pq

    from schemasaurus_ray.stages.shuffle import agg_keys_shuffled, group_agg_fixed_first

    rng = np.random.default_rng(3)
    n = 20000
    vals = np.array(["a", "b", "c", "d", None], dtype=object)
    k = pa.array(vals[rng.integers(0, 5, n)].tolist(), pa.string())
    h = pa.array(rng.integers(0, 7, n).astype(np.int64), pa.int64())
    t = pa.table({"k": k, "h": h})

    # helper level: exact group count, no duplicate keys, caller order kept
    g = group_agg_fixed_first(t, ["k", "h"], [([], "count_all")])
    assert g.column_names[:2] == ["k", "h"]
    keys = [(r["k"], r["h"]) for r in g.to_pylist()]
    assert len(keys) == len(set(keys)) == 35  # 5 k-values × 7 h-values
    assert sum(r["count_all"] for r in g.to_pylist()) == n

    # end-to-end: the same data through the raw shuffle (string key FIRST)
    d = tmp_path_factory.mktemp("nullkeys")
    for i in range(3):
        pq.write_table(t.slice(i * 7000, 7000), str(d / f"s{i}.parquet"))
    out = agg_keys_shuffled(
        sorted(str(p) for p in d.glob("*.parquet")), ["k", "h"], [("h", "count")]
    )
    got = collections.Counter((r["k"], r["h"]) for r in out.to_pylist())
    assert len(got) == 35 and max(got.values()) == 1
    total = sum(r["cnt"] for r in out.to_pylist())
    assert total == n
