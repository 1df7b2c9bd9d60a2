"""Training-data operators: dedup (exact/minhash/simhash/embedding), text
analysis, similarity search, multimodal stages."""

import numpy as np
import pyarrow as pa
import pytest

from schemasaurus_ray.functions.dedup import (
    MinHashStage,
    SimHashStage,
    embedding_near_dups,
    exact_dedup,
    hamming64,
    jaccard,
    minhash_candidates,
    verify_pairs_jaccard,
)
from schemasaurus_ray.functions.multimodal import (
    AudioFeatureStage,
    AudioResampleStage,
    StubImageDecodeStage,
)
from schemasaurus_ray.functions.similarity import brute_force_topk, ivf_topk
from schemasaurus_ray.functions.text import LangIdStage, fingerprint, quality_scores, token_count

RNG = np.random.default_rng(7)
WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def make_docs(n=400, dup_every=20, near_every=25):
    """Deterministic docs with planted exact dups + near dups. Words are
    index-derived so shingle sets are distinct across docs (near-dup =
    1 changed word of 40 → Jaccard ≈ 0.85)."""
    texts = []
    for i in range(n):
        words = [f"w{(i * 13 + j * 7) % 997}" for j in range(40)]
        texts.append(" ".join(words))
    for i in range(0, n, dup_every):
        if i + 1 < n:
            texts[i + 1] = texts[i]  # exact dup
    for i in range(0, n, near_every):
        if i + 2 < n:
            words = texts[i].split()
            words[5] = "CHANGED"
            texts[i + 2] = " ".join(words)  # near dup (1/28 shingles changed)
    return pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts, pa.string())})


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(make_docs()), make_docs()


def test_exact_dedup(docs_ds):
    ds, tbl = docs_ds
    survivors = exact_dedup(ds).to_pandas()["doc_id"].tolist()
    texts = tbl.column("text").to_pylist()
    expected = {}
    for i, t in enumerate(texts):
        expected.setdefault(t, i)
    assert sorted(survivors) == sorted(expected.values())


def test_exact_dedup_dup_groups_broadcast_is_o_duplicates(docs_ds):
    """The dropped-set basis (VERDICT r3 #1): the driver-collected /
    broadcast table holds ONLY count>1 content groups — O(duplicate
    groups), never O(corpus) — and (h, min_id) reconstructs the exact
    keep decision: drop iff hash matches and id != group min."""
    from schemasaurus_ray.functions.dedup import exact_dedup_dup_groups
    from schemasaurus_ray.util import hash_column

    ds, tbl = docs_ds
    dup = pa.concat_tables(
        list(exact_dedup_dup_groups(ds).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    texts = tbl.column("text").to_pylist()
    groups: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        groups.setdefault(t, []).append(i)
    dup_groups = {t: ids for t, ids in groups.items() if len(ids) > 1}
    # broadcast size == number of duplicate GROUPS (20 of 400 docs here)
    assert dup.num_rows == len(dup_groups)
    assert dup.num_rows < len(texts) // 10
    got = dict(zip(dup.column("h").to_pylist(), dup.column("min_id").to_pylist()))
    for t, ids in dup_groups.items():
        h = int(hash_column(pa.array([t], pa.string())).view(np.int64)[0])
        assert got[h] == min(ids)
    # keep mask reconstructed from the broadcast == brute-force survivors
    all_h = hash_column(tbl.column("text").combine_chunks()).view(np.int64)
    dup_h = np.sort(np.asarray(dup.column("h").to_pylist(), dtype=np.int64))
    dup_min = np.asarray(
        [got[int(h)] for h in dup_h], dtype=np.int64
    )
    ids_np = np.arange(len(texts), dtype=np.int64)
    pos = np.searchsorted(dup_h, all_h).clip(max=len(dup_h) - 1)
    keep = ~((dup_h[pos] == all_h) & (ids_np != dup_min[pos]))
    expected_keep = sorted(min(ids) for ids in groups.values())
    assert sorted(ids_np[keep].tolist()) == expected_keep


def test_minhash_finds_near_dups(docs_ds):
    ds, tbl = docs_ds
    pairs_ds = minhash_candidates(ds)
    pairs = pa.concat_tables(list(pairs_ds.iter_batches(batch_format="pyarrow", batch_size=None)))
    texts = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    verified = verify_pairs_jaccard(pairs, texts, threshold=0.8)
    found = set(zip(verified.column("id_a").to_pylist(), verified.column("id_b").to_pylist()))
    # every planted near-dup pair must be found (exact dups too)
    for i in range(0, 400, 25):
        if i + 2 < 400:
            assert (i, i + 2) in found or (i + 2, i) in found, f"missing near-dup {i}"
    for i in range(0, 400, 20):
        if i + 1 < 400:
            assert (i, i + 1) in found, f"missing exact dup {i}"


def test_minhash_distributed_verify_parity(docs_ds):
    """The distributed verify (broadcast candidate ids → semi-join shingles
    → parallel pair tasks) must return exactly the same verified pairs as
    the in-memory reference verify — same ids, same jaccard values."""
    from schemasaurus_ray.functions.dedup import (
        _dedupe_pairs,
        candidate_shingles,
        verify_pairs_distributed,
    )

    ds, tbl = docs_ds
    pairs_raw = pa.concat_tables(
        list(minhash_candidates(ds).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    texts = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    ref = verify_pairs_jaccard(pairs_raw, texts, threshold=0.8)

    pairs = _dedupe_pairs(pairs_raw)
    cand_ids = set(pairs.column("id_a").to_pylist()) | set(pairs.column("id_b").to_pylist())
    shingles = candidate_shingles(ds, cand_ids)
    dist = verify_pairs_distributed(pairs, shingles, threshold=0.8)

    def as_dict(t):
        return {
            (a, b): j
            for a, b, j in zip(
                t.column("id_a").to_pylist(), t.column("id_b").to_pylist(), t.column("jaccard").to_pylist()
            )
        }

    assert as_dict(dist) == as_dict(ref)
    assert len(dist) > 0


def test_lsh_index_probe_parity_and_pruning(docs_ds, tmp_path):
    """The persisted LSH band-bucket index: (1) probing with an incoming
    batch finds exactly the verified near-dup pairs a full re-run emits
    for pairs touching that batch; (2) a SMALL incoming batch reads only
    the bucket dirs its band keys hash into (io_stats pruning audit — the
    point of persisting the index); (3) the build is idempotent (second
    call with matching params reuses the marker without rewriting)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from schemasaurus_ray.functions.dedup import (
        _dedupe_pairs,
        expand_candidate_pairs,
        lsh_build_index,
        lsh_probe_pairs,
        minhash_bkey_rows,
        minhash_candidates,
        verify_pairs_jaccard,
        verify_pairs_shuffled,
    )

    ds, tbl = docs_ds
    shard = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, shard)
    # snapshot = even ids, incoming = odd ids
    even = tbl.filter(pa.array([i % 2 == 0 for i in tbl.column("doc_id").to_pylist()]))
    odd = tbl.filter(pa.array([i % 2 == 1 for i in tbl.column("doc_id").to_pylist()]))
    idx = str(tmp_path / "lsh_idx")
    lsh_build_index(rd.from_arrow(even), idx, n_parts=64)
    marker = os.path.join(idx, "lsh_meta.json")
    mtimes = {f: os.path.getmtime(os.path.join(r, f)) for r, _, fs in os.walk(idx) for f in fs}
    lsh_build_index(rd.from_arrow(even), idx, n_parts=64)  # idempotent reuse
    assert mtimes == {
        f: os.path.getmtime(os.path.join(r, f)) for r, _, fs in os.walk(idx) for f in fs
    }
    assert os.path.exists(marker)

    new_keyed = pa.concat_tables(
        list(
            minhash_bkey_rows(rd.from_arrow(odd)).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
    )
    cand = expand_candidate_pairs(_dedupe_pairs(lsh_probe_pairs(idx, new_keyed)))
    got_tbl = verify_pairs_shuffled([shard], cand, threshold=0.8)
    got = {
        (a, b)
        for a, b in zip(got_tbl.column("id_a").to_pylist(), got_tbl.column("id_b").to_pylist())
        if a % 2 == 1 or b % 2 == 1
    }
    # reference: full-corpus LSH + exact verify, restricted to odd-touching
    full_pairs = pa.concat_tables(
        list(minhash_candidates(ds).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    texts = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    ref_tbl = verify_pairs_jaccard(_dedupe_pairs(full_pairs), texts, threshold=0.8)
    ref = {
        (a, b)
        for a, b in zip(ref_tbl.column("id_a").to_pylist(), ref_tbl.column("id_b").to_pylist())
        if a % 2 == 1 or b % 2 == 1
    }
    assert got == ref and len(got) > 0

    # pruning: a 3-doc incoming batch touches ≤ 3·bands band keys → far
    # fewer than all 64 bucket dirs are opened
    tiny = odd.slice(0, 3)
    tiny_keyed = pa.concat_tables(
        list(
            minhash_bkey_rows(rd.from_arrow(tiny)).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
    )
    stats: dict = {}
    lsh_probe_pairs(idx, tiny_keyed, io_stats=stats)
    assert 0 < stats["files_read"] < stats["files_total"]
    assert stats["bytes_read"] < stats["bytes_total"]


def test_pairs_from_key_rows_semi_randomized_bruteforce():
    """Randomized parity for the semi pair kernel (new×all per key group):
    against a brute-force enumeration — old-only groups emit nothing,
    small groups emit exactly {canonical (a,b): a or b is new, same key
    group}, hot groups star around the group min (the documented cap
    bound), duplicate (key,id) rows collapse first."""
    from schemasaurus_ray.functions.dedup import _pairs_from_key_rows_semi

    rng = np.random.default_rng(31)
    for trial in range(40):
        n = int(rng.integers(1, 400))
        keys = rng.integers(0, 12, n).astype(np.int64)
        ids = rng.integers(0, 60, n).astype(np.int64)
        # flags must be consistent per id (a doc is either old or new)
        id_flag = {int(i): int(rng.integers(0, 2)) for i in set(ids.tolist())}
        flags = np.array([id_flag[int(i)] for i in ids], dtype=np.int8)
        cap = int(rng.integers(2, 8)) if trial % 3 == 0 else 1 << 20
        got = _pairs_from_key_rows_semi(keys, ids, flags, cap)
        got_set = set(
            zip(got.column("id_a").to_pylist(), got.column("id_b").to_pylist())
        )
        expect = set()
        groups: dict[int, set[int]] = {}
        for k, i in zip(keys.tolist(), ids.tolist()):
            groups.setdefault(k, set()).add(i)
        for members in groups.values():
            news = [i for i in members if id_flag[i]]
            if len(members) < 2 or not news:
                continue
            if len(members) <= cap:
                for a in news:
                    for b in members:
                        if a != b:
                            expect.add((min(a, b), max(a, b)))
            else:
                m = min(members)
                expect.update((m, x) for x in members if x != m)
        assert got_set == expect, trial


def test_index_dir_key_tracks_source_content(tmp_path):
    """Persisted-index dir keys fold a source stat fingerprint: rewriting
    the backing file at the SAME path must change the key (a stale index
    would otherwise be silently probed — its param-only meta marker is
    content-blind), while an untouched file keeps the key stable."""
    import pyarrow.parquet as pq

    from schemasaurus_ray.pipelines.queries import _src_stat_key

    f = tmp_path / "documents.parquet"
    pq.write_table(pa.table({"x": pa.array([1, 2, 3], pa.int64())}), str(f))
    k1 = _src_stat_key(str(f))
    assert k1 == _src_stat_key(str(f))  # stable while untouched
    import os as _os
    import time as _time

    _time.sleep(0.01)
    pq.write_table(pa.table({"x": pa.array([1, 2, 3, 4], pa.int64())}), str(f))
    _os.utime(str(f))
    assert _src_stat_key(str(f)) != k1
    # directory form walks the parquet files
    d = tmp_path / "clips"
    d.mkdir()
    pq.write_table(pa.table({"x": pa.array([1], pa.int64())}), str(d / "a.parquet"))
    kd = _src_stat_key(str(d))
    pq.write_table(pa.table({"x": pa.array([1, 2], pa.int64())}), str(d / "b.parquet"))
    assert _src_stat_key(str(d)) != kd


def test_lsh_append_ingest_loop(ray_session, tmp_path):
    """The probe → verify → append ingest loop across TWO drops: a doc in
    drop 2 that duplicates a doc from drop 1 is only findable if drop 1's
    band rows were appended to the index — the cross-drop pair must appear
    after append and must NOT appear against the snapshot-only index."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from schemasaurus_ray.functions.dedup import (
        _dedupe_pairs,
        lsh_append_index,
        lsh_build_index,
        lsh_probe_pairs,
        minhash_bkey_rows,
    )

    rng = np.random.default_rng(5)
    words = [f"w{k}" for k in range(200)]
    mk = lambda: " ".join(rng.choice(words, 30).tolist())
    snap_ids = list(range(0, 100, 2))
    snap = pa.table(
        {
            "doc_id": pa.array(snap_ids, pa.int64()),
            "text": pa.array([mk() for _ in snap_ids], pa.string()),
        }
    )
    d1_texts = [mk() for _ in range(10)]
    drop1 = pa.table(
        {
            "doc_id": pa.array(list(range(1, 21, 2)), pa.int64()),
            "text": pa.array(d1_texts, pa.string()),
        }
    )
    # drop 2: one exact copy of a drop-1 doc + one copy of a snapshot doc
    drop2 = pa.table(
        {
            "doc_id": pa.array([201, 203], pa.int64()),
            "text": pa.array([d1_texts[4], snap.column("text")[0].as_py()], pa.string()),
        }
    )
    idx = str(tmp_path / "idx")
    lsh_build_index(rd.from_arrow(snap), idx, n_parts=32)

    def keyed(tbl):
        return pa.concat_tables(
            list(
                minhash_bkey_rows(rd.from_arrow(tbl)).iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            )
        )

    k1, k2 = keyed(drop1), keyed(drop2)

    def pairs_of(k):
        t = _dedupe_pairs(lsh_probe_pairs(idx, k))
        return set(zip(t.column("id_a").to_pylist(), t.column("id_b").to_pylist()))

    # without append: drop 2 only matches the snapshot copy
    before = pairs_of(k2)
    assert (0, 203) in before and (9, 201) not in before
    # probe drop 1 (its own ingest), then append it; idempotent re-append
    lsh_probe_pairs(idx, k1)
    lsh_append_index(idx, k1, ingest_id="drop1")
    lsh_append_index(idx, k1, ingest_id="drop1")
    after = pairs_of(k2)
    assert (0, 203) in after and (9, 201) in after  # cross-drop pair surfaced
    # no spurious pair duplication: probe output is a set after dedupe
    assert len(after) == len({(a, b) for a, b in after})
    # rows keyed under different banding must be REJECTED, not appended or
    # probed (mis-keyed rows silently lose recall against future drops)
    with pytest.raises(ValueError, match="recall"):
        lsh_append_index(idx, k1, ingest_id="bad", bands=8)
    with pytest.raises(ValueError, match="recall"):
        lsh_probe_pairs(idx, k2, num_perm=128)


def test_decontaminate_passages_planted_quote(ray_session, tmp_path):
    """Span-level leakage semantics: a training doc QUOTING an 8-token
    benchmark span inside otherwise-novel text is caught with the exact
    window count (windows fully inside the quote), docs sharing < 8
    consecutive tokens are NOT, and benchmark docs themselves are never
    reported."""
    import pyarrow.parquet as pq

    from schemasaurus_ray.pipelines.queries import decontaminate_passages_documents

    bench_text = " ".join(f"ev{i}" for i in range(12))  # doc_id 0 (0%7==0)
    quote = " ".join(f"ev{i}" for i in range(2, 11))  # 9 consecutive tokens
    texts = {
        0: bench_text,
        1: "novel alpha " + quote + " novel beta",  # 9-token quote → 2 windows
        2: " ".join(f"ev{i}" for i in range(7)) + " unrelated tail words here",  # 7 shared < L
        3: "totally unrelated document with enough words to have windows ok",
        7: "another benchmark doc " + quote,  # 7%7==0 → benchmark, never reported
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    out = decontaminate_passages_documents(str(d))
    got = dict(
        zip(out.column("doc_id").to_pylist(), out.column("n_leaked_windows").to_pylist())
    )
    # doc 1: the 9-token quote contains 2 distinct 8-token windows, both in
    # the benchmark doc's window set
    assert got == {1: 2}


def test_incremental_three_drops_equals_full_run(docs_ds, tmp_path):
    """END-TO-END ingest loop over three sequential drops: probe → exact
    verify → append per drop; the union of drop-touching verified pairs
    must equal the FULL-corpus near-dup product minus snapshot-internal
    pairs — i.e. sequential ingests find exactly what one big re-run
    would, with no pair lost to indexing or append order."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from schemasaurus_ray.functions.dedup import (
        _dedupe_pairs,
        expand_candidate_pairs,
        lsh_append_index,
        lsh_build_index,
        lsh_probe_pairs,
        minhash_bkey_rows,
        minhash_candidates,
        verify_pairs_jaccard,
        verify_pairs_shuffled,
    )

    ds, tbl = docs_ds
    n = tbl.num_rows
    ids = np.asarray(tbl.column("doc_id"), dtype=np.int64)
    # snapshot = ids % 4 == 0; drops 1..3 = the other residues
    snap = tbl.filter(pa.array(ids % 4 == 0))
    drops = [tbl.filter(pa.array(ids % 4 == r)) for r in (1, 2, 3)]
    paths = [str(tmp_path / "snap.parquet")]
    pq.write_table(snap, paths[0])
    idx = str(tmp_path / "idx")
    lsh_build_index(rd.from_arrow(snap), idx, n_parts=32)

    got: set = set()
    for di, drop in enumerate(drops):
        p = str(tmp_path / f"drop{di}.parquet")
        pq.write_table(drop, p)
        paths.append(p)
        keyed = pa.concat_tables(
            list(
                minhash_bkey_rows(rd.from_arrow(drop)).iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            )
        )
        cand = expand_candidate_pairs(_dedupe_pairs(lsh_probe_pairs(idx, keyed)))
        if cand.num_rows:
            ver = verify_pairs_shuffled(paths, cand, threshold=0.8)
            drop_ids = set(np.asarray(drop.column("doc_id"), dtype=np.int64).tolist())
            got |= {
                (a, b)
                for a, b in zip(
                    ver.column("id_a").to_pylist(), ver.column("id_b").to_pylist()
                )
                if a in drop_ids or b in drop_ids
            }
        lsh_append_index(idx, keyed, ingest_id=f"drop{di}")

    # full re-run ground truth
    texts = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    full = verify_pairs_jaccard(
        _dedupe_pairs(
            pa.concat_tables(
                list(minhash_candidates(ds).iter_batches(batch_format="pyarrow", batch_size=None))
            )
        ),
        texts,
        threshold=0.8,
    )
    snap_ids = set(np.asarray(snap.column("doc_id"), dtype=np.int64).tolist())
    expect = {
        (a, b)
        for a, b in zip(full.column("id_a").to_pylist(), full.column("id_b").to_pylist())
        if not (a in snap_ids and b in snap_ids)
    }
    assert got == expect and len(got) > 0 and n == snap.num_rows + sum(d.num_rows for d in drops)


def test_verify_pairs_shuffled_parity(docs_ds, tmp_path):
    """The shingle-bucket shuffle verify (no candidate shingle set ever
    leaves its worker — the 100-TB path for PPJoin-sized candidate sets)
    must return exactly the reference verify's pairs and jaccards, across
    bucket counts, multi-shard inputs, and forced probe-chunk boundaries."""
    import pyarrow.parquet as pq

    from schemasaurus_ray.functions.dedup import _dedupe_pairs, verify_pairs_shuffled

    ds, tbl = docs_ds
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(tbl.slice(0, 173), p1)
    pq.write_table(tbl.slice(173), p2)
    pairs_raw = pa.concat_tables(
        list(minhash_candidates(ds).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    texts = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    ref = verify_pairs_jaccard(_dedupe_pairs(pairs_raw), texts, threshold=0.8)
    expect = {
        (a, b): j
        for a, b, j in zip(
            ref.column("id_a").to_pylist(),
            ref.column("id_b").to_pylist(),
            ref.column("jaccard").to_pylist(),
        )
    }
    assert expect  # fixture plants real near-dups
    # last case also forces multi-chunk map reads (map_chunk_rows=41) so
    # per-chunk shingle extraction must agree with the whole-shard pass
    for buckets, chunk, rows in ((1, 1 << 22, 16384), (5, 1 << 22, 16384), (None, 131, 41)):
        got = verify_pairs_shuffled(
            [p1, p2],
            pairs_raw,
            threshold=0.8,
            num_buckets=buckets,
            probe_chunk=chunk,
            map_chunk_rows=rows,
        )
        got_d = {
            (a, b): j
            for a, b, j in zip(
                got.column("id_a").to_pylist(),
                got.column("id_b").to_pylist(),
                got.column("jaccard").to_pylist(),
            )
        }
        assert got_d == expect, (buckets, chunk)


def test_verify_pairs_shuffled_pair_budget(docs_ds, tmp_path):
    """A pathological candidate density (here: a budget below the pair
    count, as a t≈0.3 threshold would produce at corpus scale) must trip
    the loud PairBudgetExceededError BEFORE any CSR allocation, and the
    same call with max_pairs=None must still verify (VERDICT r4 #4)."""
    import pytest
    import pyarrow.parquet as pq

    from schemasaurus_ray.functions.dedup import (
        PairBudgetExceededError,
        _dedupe_pairs,
        verify_pairs_shuffled,
    )

    ds, tbl = docs_ds
    shard = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, shard)
    pairs_raw = pa.concat_tables(
        list(minhash_candidates(ds).iter_batches(batch_format="pyarrow", batch_size=None))
    )
    n_pairs = _dedupe_pairs(pairs_raw).num_rows
    assert n_pairs > 3
    with pytest.raises(PairBudgetExceededError, match="max_pairs"):
        verify_pairs_shuffled([shard], pairs_raw, threshold=0.8, max_pairs=n_pairs - 1)
    # budget == pair count passes; None disables the guard entirely
    at_budget = verify_pairs_shuffled([shard], pairs_raw, threshold=0.8, max_pairs=n_pairs)
    unguarded = verify_pairs_shuffled([shard], pairs_raw, threshold=0.8, max_pairs=None)
    assert at_budget.equals(unguarded)
    # the packaged escape hatch: slicing into per-budget CSR calls must
    # reproduce the single-shot result exactly (pairs verify independently)
    from schemasaurus_ray.functions.dedup import verify_pairs_shuffled_sharded

    key = [("id_a", "ascending"), ("id_b", "ascending")]
    sharded = verify_pairs_shuffled_sharded([shard], pairs_raw, max_pairs=3, threshold=0.8)
    assert sharded.sort_by(key).equals(unguarded.sort_by(key))


def test_verify_pairs_shuffled_randomized_edges(ray_session, tmp_path):
    """Randomized-text brute-force parity for the shuffled verify,
    covering the adversarial edges: pair ids absent from the corpus
    (skipped), two empty texts (J=1 via the empty∩empty convention),
    short (<n words) docs, duplicate pair rows (deduped), and a low
    threshold so mid-range jaccards exercise the filter."""
    import pyarrow.parquet as pq

    from schemasaurus_ray.functions.dedup import (
        _dedupe_pairs,
        verify_pairs_jaccard,
        verify_pairs_shuffled,
    )

    rng = np.random.default_rng(23)
    words = [f"tok{i}" for i in range(12)]  # tiny vocab → shared trigrams
    texts = [" ".join(rng.choice(words, int(rng.integers(0, 25))).tolist()) for _ in range(240)]
    texts[1] = texts[0]  # exact dup
    texts[3] = texts[2] + " tail"  # near dup
    texts[5], texts[6] = "", ""  # empty∩empty
    texts[7] = "one two"  # short doc (< n words)
    # mid-range jaccard pair: overlapping slices of one sequence (J ≈ 0.3)
    seq = [f"u{i}" for i in range(60)]
    texts[10], texts[11] = " ".join(seq[:40]), " ".join(seq[20:])
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(240)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(tbl.slice(0, 120), p1)
    pq.write_table(tbl.slice(120), p2)
    a = rng.choice(240, 600).astype(np.int64)
    b = rng.choice(240, 600).astype(np.int64)
    a = np.concatenate([a, [0, 2, 5, 10, 9000], a[:20]])  # planted + absent + dup rows
    b = np.concatenate([b, [1, 3, 6, 11, 0], b[:20]])
    pairs = pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})
    texts_by_id = dict(zip(range(240), texts))
    n_by_th = {}
    for th in (0.2, 0.8):
        ref = verify_pairs_jaccard(_dedupe_pairs(pairs), texts_by_id, threshold=th)
        expect = set(
            zip(
                ref.column("id_a").to_pylist(),
                ref.column("id_b").to_pylist(),
                [round(j, 6) for j in ref.column("jaccard").to_pylist()],
            )
        )
        got_tbl = verify_pairs_shuffled(
            [p1, p2], pairs, threshold=th, num_buckets=3, probe_chunk=89
        )
        got = set(
            zip(
                got_tbl.column("id_a").to_pylist(),
                got_tbl.column("id_b").to_pylist(),
                got_tbl.column("jaccard").to_pylist(),
            )
        )
        assert got == expect, th
        assert (0, 1, 1.0) in got and (5, 6, 1.0) in got
        n_by_th[th] = len(got)
    # the low threshold must surface mid-range jaccards beyond the planted
    # identical pairs, or the >= threshold filter edge isn't exercised
    assert n_by_th[0.2] > n_by_th[0.8]


def test_winnow_shared_passages_corpus(docs_ds, tmp_path):
    """Corpus-level winnowing: exact-dup pairs share (nearly) all
    fingerprints; near-dup pairs share most; unrelated docs share ~none."""
    import pyarrow.parquet as pq

    from schemasaurus_ray.pipelines.queries import winnow_passages_documents

    _, tbl = docs_ds
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = winnow_passages_documents(str(tmp_path))
    shared = {
        (a, b): n
        for a, b, n in zip(
            out.column("id_a").to_pylist(), out.column("id_b").to_pylist(), out.column("n_shared").to_pylist()
        )
    }
    for i in range(0, 400, 20):  # exact dups (i, i+1)
        if i + 1 < 400:
            assert shared.get((i, i + 1), 0) >= 10, f"exact dup {i} not detected"
    for i in range(0, 400, 25):  # near dups (i, i+2): 1 changed word of 40
        if i + 2 < 400:
            assert shared.get((i, i + 2), 0) >= 5, f"near dup {i} not detected"


def test_winnow_batch_matches_reference_rows():
    """The batch-vectorized winnowing kernel (one concatenated buffer +
    boundary masks) must emit exactly the per-doc reference's (id, fp) set:
    same rolling hashes, same window minima, same short-doc handling, same
    char-vs-byte length skip quirk."""
    from schemasaurus_ray.functions.text import winnow_fingerprints
    from schemasaurus_ray.util import splitmix64

    k, window = 8, 4
    rng = np.random.default_rng(5)
    texts = [
        None, "", "short", "exactly8", "九字の文字列です",  # multibyte ≥8 bytes, <8 chars
        "just over the k threshold", "x" * 7, "y" * 8, "z" * 12,
    ] + ["".join(rng.choice(list("abcdef "), size=int(rng.integers(1, 120)))) for _ in range(60)]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts, pa.string())}
    )

    # transcribed reference (the former per-doc implementation)
    ref_pairs = set()
    for doc_id, text in zip(range(len(texts)), texts):
        if not text or len(text) < k:
            continue
        b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) < k:
            continue
        P = np.uint64(1099511628211)
        powers = P ** np.arange(k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            grams = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
            h = splitmix64((grams * powers[None, :]).sum(axis=1))
        if len(h) < window:
            sel = np.unique(h.min(keepdims=True))
        else:
            sel = np.unique(np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1))
        for fp in sel.view(np.int64).tolist():
            ref_pairs.add((doc_id, fp))

    out = winnow_fingerprints(tbl, k=k, window=window)
    got = set(zip(out.column("doc_id").to_pylist(), out.column("fp").to_pylist()))
    assert got == ref_pairs and len(got) > 0


def test_jaccard():
    assert jaccard("a b c d e", "a b c d e") == 1.0
    assert jaccard("a b c d e", "x y z w v") == 0.0


def test_simhash_near_dups(docs_ds):
    ds, tbl = docs_ds
    stage = SimHashStage()
    out = stage(make_docs(100))
    sigs = np.array(out.column("simhash").to_pylist(), dtype=np.int64).view(np.uint64)
    # identical docs → identical simhash
    texts = tbl.column("text").to_pylist()[:100]
    for i in range(0, 100, 20):
        if i + 1 < 100:
            assert sigs[i] == sigs[i + 1]
    # near-dup → small hamming distance; unrelated → large
    d_near = hamming64(sigs[0:1], sigs[2:3])[0]
    d_far = hamming64(sigs[0:1], sigs[7:8])[0]
    assert d_near < d_far


def test_simhash_batch_matches_reference_rows():
    """The vectorized batch kernel (one Arrow split + flat hash + reduceat
    votes) must equal a transcribed per-doc reference implementation —
    word hashes, bit votes, ties — including empty docs and nulls."""
    from schemasaurus_ray.util import hash_column

    stage = SimHashStage()
    rng = np.random.default_rng(11)
    texts = ["", None, "one", "a b c", "alpha beta alpha", "  padded   spaces  "] + [
        " ".join(f"w{rng.integers(0, 50)}" for _ in range(int(rng.integers(1, 30))))
        for _ in range(40)
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts, pa.string())}
    )
    sigs = np.asarray(stage(tbl).column("simhash"), dtype=np.int64).view(np.uint64)
    masks = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for t, s in zip(texts, sigs):
        words = (t or "").split()
        if not words:
            assert s == 0
            continue
        h = hash_column(pa.array(words, pa.string()))
        bits = (h[:, None] & masks[None, :]) != 0
        votes = bits.sum(axis=0) * 2 - len(words)
        ref = int(np.packbits((votes > 0)[::-1]).view(">u8")[0])
        assert int(s) == ref


def test_simhash_banded_pairs_equal_bruteforce(docs_ds):
    """Engine-independent second path (VERDICT r2 #9): the banded pair set
    at hamming ≤ 3 must equal brute-force all-pairs hamming over the same
    signatures (pigeonhole: ≤3 flipped bits leave ≥1 of 4 16-bit bands
    intact, so banding is exact at this radius)."""
    from schemasaurus_ray.functions.dedup import simhash_near_dups

    ds, tbl = docs_ds
    out = simhash_near_dups(ds)
    banded = set(zip(out.column("id_a").to_pylist(), out.column("id_b").to_pylist()))

    sig_t = SimHashStage()(tbl)
    ids = np.asarray(sig_t.column("doc_id"), dtype=np.int64)
    sigs = np.asarray(sig_t.column("simhash"), dtype=np.int64).view(np.uint64)
    ia, ib = np.triu_indices(len(ids), k=1)
    d = hamming64(sigs[ia], sigs[ib])
    keep = d <= 3
    brute = set(zip(ids[ia[keep]].tolist(), ids[ib[keep]].tolist()))
    assert banded == brute and len(brute) > 0


def test_hamming64_swar_matches_loop():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2**63, 1000, dtype=np.int64).view(np.uint64)
    b = rng.integers(0, 2**63, 1000, dtype=np.int64).view(np.uint64)
    got = hamming64(a, b)
    exp = np.array([bin(int(x) ^ int(y)).count("1") for x, y in zip(a, b)], dtype=np.int32)
    assert (got == exp).all()
    assert hamming64(np.array([0], np.uint64), np.array([np.uint64(2**64 - 1)], np.uint64))[0] == 64


def test_index_layers_file_uri(ray_session, tmp_path):
    """All three persisted index families (LSH band-bucket, banded
    signature, IVF) accept pyarrow.fs URIs end-to-end — build, probe,
    append, and io_stats listing through ``file://`` produce byte-identical
    results to the plain-local-path twin (VERDICT r4 #2: no glob, no
    shared-/tmp assumption)."""
    import ray.data as rd

    from schemasaurus_ray.functions.dedup import (
        _dedupe_pairs,
        banded_index_build,
        banded_probe_pairs,
        lsh_append_index,
        lsh_build_index,
        lsh_probe_pairs,
        minhash_bkey_rows,
        simhash_signatures,
    )
    from schemasaurus_ray.functions.similarity import ivf_build_index, ivf_topk_indexed

    rng = np.random.default_rng(11)
    words = [f"w{k}" for k in range(200)]
    mk = lambda: " ".join(rng.choice(words, 30).tolist())
    snap_texts = [mk() for _ in range(60)]
    snap = pa.table(
        {
            "doc_id": pa.array(range(0, 120, 2), pa.int64()),
            "text": pa.array(snap_texts, pa.string()),
        }
    )
    # the drop holds one exact copy of a snapshot doc → a guaranteed pair
    drop = pa.table(
        {
            "doc_id": pa.array([501, 503], pa.int64()),
            "text": pa.array([snap_texts[7], mk()], pa.string()),
        }
    )
    keyed = pa.concat_tables(
        list(
            minhash_bkey_rows(rd.from_arrow(drop)).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
    )

    def pairset(t):
        t = _dedupe_pairs(t)
        return set(zip(t.column("id_a").to_pylist(), t.column("id_b").to_pylist()))

    # --- LSH: build + probe + append through file:// ≡ plain path
    plain, uri_root = str(tmp_path / "lsh_plain"), f"file://{tmp_path}/lsh_uri"
    lsh_build_index(rd.from_arrow(snap), plain, n_parts=32)
    lsh_build_index(rd.from_arrow(snap), uri_root, n_parts=32)
    io_p, io_u = {}, {}
    got_p = pairset(lsh_probe_pairs(plain, keyed, io_stats=io_p))
    got_u = pairset(lsh_probe_pairs(uri_root, keyed, io_stats=io_u))
    assert got_p == got_u and got_p  # the planted copy collides
    assert io_u == io_p and 0 < io_u["files_read"] <= io_u["files_total"]
    lsh_append_index(uri_root, keyed, "drop1")
    # after append, the drop's own rows are snapshot rows: probing the same
    # keys again must surface the drop×drop self-collisions from the index
    assert pairset(lsh_probe_pairs(uri_root, keyed)) >= got_u

    # --- banded signature index through file://
    sigs = simhash_signatures(rd.from_arrow(snap))
    b_uri = f"file://{tmp_path}/banded_uri"
    banded_index_build(sigs, b_uri)
    new_sigs = pa.concat_tables(
        list(
            simhash_signatures(rd.from_arrow(drop)).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
    )
    got_b = banded_probe_pairs(b_uri, new_sigs, max_hamming=3)
    pairs_b = set(zip(got_b.column("id_a").to_pylist(), got_b.column("id_b").to_pylist()))
    assert any(501 in p for p in pairs_b)  # exact copy ⇒ hamming 0

    # --- IVF through file:// ≡ plain path, with io pruning intact
    mat = rng.standard_normal((500, 8))
    vt = pa.table(
        {
            "vec_id": pa.array(range(500), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        }
    )
    queries = mat[:3].astype(np.float64)
    iv_p, iv_u = str(tmp_path / "ivf_plain"), f"file://{tmp_path}/ivf_uri"
    cent_p = ivf_build_index(rd.from_arrow(vt), iv_p, n_clusters=8, sample_size=256)
    cent_u = ivf_build_index(rd.from_arrow(vt), iv_u, n_clusters=8, sample_size=256)
    assert np.allclose(cent_p, cent_u)
    io_i: dict = {}
    top_p = ivf_topk_indexed(iv_p, queries, [0, 1, 2], k=5, nprobe=3)
    top_u = ivf_topk_indexed(iv_u, queries, [0, 1, 2], k=5, nprobe=3, io_stats=io_i)
    key = [("query_id", "ascending"), ("vec_id", "ascending")]
    assert top_u.sort_by(key).equals(top_p.sort_by(key))
    assert 0 < io_i["files_read"] < io_i["files_total"]


def test_banded_append_ingest_loop(ray_session, tmp_path):
    """banded_append_index completes the probe → verify → append loop on
    the signature axis: a drop-2 doc that duplicates a drop-1 doc is only
    findable if drop 1's band rows (signatures riding) were appended —
    the cross-drop pair must appear after append and must NOT appear
    against the snapshot-only index. Param-mismatch appends raise."""
    import ray.data as rd

    from schemasaurus_ray.functions.dedup import (
        banded_append_index,
        banded_index_build,
        banded_probe_pairs,
        simhash_signatures,
    )

    rng = np.random.default_rng(17)
    words = [f"w{k}" for k in range(300)]
    mk = lambda: " ".join(rng.choice(words, 40).tolist())
    snap = pa.table(
        {
            "doc_id": pa.array(range(0, 80, 2), pa.int64()),
            "text": pa.array([mk() for _ in range(40)], pa.string()),
        }
    )
    d1_text = mk()
    drop1 = pa.table(
        {"doc_id": pa.array([901], pa.int64()), "text": pa.array([d1_text], pa.string())}
    )
    drop2 = pa.table(
        {"doc_id": pa.array([902], pa.int64()), "text": pa.array([d1_text], pa.string())}
    )
    idx = str(tmp_path / "banded_idx")
    banded_index_build(simhash_signatures(rd.from_arrow(snap)), idx)

    def sigs(tbl):
        return pa.concat_tables(
            list(
                simhash_signatures(rd.from_arrow(tbl)).iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            )
        )

    s1, s2 = sigs(drop1), sigs(drop2)

    def pairs_of(s):
        t = banded_probe_pairs(idx, s, max_hamming=3)
        return set(zip(t.column("id_a").to_pylist(), t.column("id_b").to_pylist()))

    assert (901, 902) not in pairs_of(s2)  # snapshot-only: drop1 invisible
    banded_append_index(idx, s1, "drop1")
    assert (901, 902) in pairs_of(s2)  # exact copy ⇒ hamming 0 pair
    with pytest.raises(ValueError, match="appended to an index built with"):
        banded_append_index(idx, s1.rename_columns(["other_id", "simhash", "band0", "band1", "band2", "band3"]), "bad", id_col="other_id")


def test_ivf_append_ingest(ray_session, tmp_path):
    """ivf_append_index: appended vectors are assigned to the EXISTING
    centroids and become visible to ivf_topk_indexed with no rebuild; a
    re-run of the same ingest_id is idempotent (no duplicate candidates);
    param mismatch raises; appending to a missing index raises."""
    import ray.data as rd

    from schemasaurus_ray.functions.similarity import (
        ivf_append_index,
        ivf_build_index,
        ivf_topk_indexed,
    )

    rng = np.random.default_rng(23)
    mat = rng.standard_normal((400, 8))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(400), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        }
    )
    idx = str(tmp_path / "ivf")
    ivf_build_index(rd.from_arrow(tbl), idx, n_clusters=8, sample_size=256)
    queries = mat[42:43].astype(np.float64)

    def hits():
        t = ivf_topk_indexed(idx, queries, [0], k=5, nprobe=8)  # probe all: exactness
        return t.column("vec_id").to_pylist(), t.column("score").to_pylist()

    ids0, _ = hits()
    assert 1000 not in ids0 and 42 in ids0
    new = pa.table(
        {
            "vec_id": pa.array([1000], pa.int64()),
            "embedding": pa.array([mat[42].tolist()], pa.list_(pa.float32())),
        }
    )
    ivf_append_index(idx, new, "drop1")
    ivf_append_index(idx, new, "drop1")  # idempotent overwrite
    ids1, scores1 = hits()
    assert 1000 in ids1 and ids1.count(1000) == 1
    assert scores1[ids1.index(1000)] == pytest.approx(1.0, abs=1e-9)
    with pytest.raises(ValueError, match="cannot be appended"):
        ivf_append_index(idx, new.rename_columns(["id", "embedding"]), "x", id_col="id")
    with pytest.raises(FileNotFoundError):
        ivf_append_index(str(tmp_path / "nope"), new, "x")


def test_minhash_signature_empty_text():
    """signature() mirrors the batch path on shingle-less texts: None, not
    a zero-size-reduction ValueError."""
    from schemasaurus_ray.functions.dedup import MinHashStage

    st = MinHashStage()
    assert st.signature("") is None
    assert st.signature("   ") is None
    assert st.signature("three plain words").shape == (st.num_perm,)


def test_verify_pairs_shuffled_empty_paths(ray_session):
    """Zero corpus shards ⇒ every pair endpoint is absent ⇒ all pairs
    skipped (documented semantics), not an ArrowInvalid crash."""
    from schemasaurus_ray.functions.dedup import verify_pairs_shuffled

    pairs = pa.table(
        {"id_a": pa.array([1, 2], pa.int64()), "id_b": pa.array([3, 4], pa.int64())}
    )
    out = verify_pairs_shuffled([], pairs)
    assert out.num_rows == 0 and out.column_names == ["id_a", "id_b", "jaccard", "jacc_bp"]


def test_connected_component_convergence_guard(ray_session):
    """A chain whose diameter exceeds max_iters must raise loudly instead
    of silently returning non-converged labels; with enough rounds the
    same chain converges to the single min root."""
    from schemasaurus_ray.functions.dedup import connected_component_min_sharded

    n = 12  # path graph 0-1-2-...-11: diameter 11
    pairs = pa.table(
        {
            "id_a": pa.array(list(range(n - 1)), pa.int64()),
            "id_b": pa.array(list(range(1, n)), pa.int64()),
        }
    )
    with pytest.raises(RuntimeError, match="max_iters"):
        connected_component_min_sharded(pairs, num_shards=2, max_iters=3)
    labels = connected_component_min_sharded(pairs, num_shards=2, max_iters=64)
    assert set(labels.column("root").to_pylist()) == {0}


def test_lsh_bucket_pairs_empty_input(ray_session):
    """Empty dataset → empty pairs table, not a concat crash (ADVICE r2)."""
    import ray.data as rd

    from schemasaurus_ray.functions.dedup import lsh_bucket_pairs

    empty = rd.from_arrow(
        pa.table({"bkey": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())})
    )
    out = lsh_bucket_pairs(empty, "doc_id")
    assert out.num_rows == 0
    assert out.column_names == ["id_a", "id_b"]


def _true_jaccard_pairs(tbl, threshold=0.8, n=3):
    """Brute-force ground truth: one shingle pass over the whole column,
    then all-pairs set Jaccard (exact, engine-independent of the join)."""
    from schemasaurus_ray.functions.dedup import _shingle_hash_arrays

    flat, parents = _shingle_hash_arrays(tbl.column("text"), n)
    ids = tbl.column("doc_id").to_pylist()
    sets: dict[int, set] = {}
    for h, p in zip(flat.tolist(), parents.tolist()):
        sets.setdefault(ids[p], set()).add(h)
    out = set()
    keys = sorted(sets)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            sa, sb = sets[a], sets[b]
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union == 0 or inter / union >= threshold:
                out.add((a, b))
    return out


def test_ngram_jaccard_exact_join(docs_ds):
    """Prefix-filter candidates + exact verify must equal brute-force
    all-pairs Jaccard EXACTLY — no banding miss probability to tolerate."""
    from schemasaurus_ray.functions.dedup import (
        _dedupe_pairs,
        candidate_shingles,
        expand_candidate_pairs,
        ngram_jaccard_pairs,
        verify_pairs_distributed,
    )

    ds, tbl = docs_ds
    truth = _true_jaccard_pairs(tbl, 0.8)
    assert len(truth) > 10  # planted dups present
    pairs = expand_candidate_pairs(_dedupe_pairs(ngram_jaccard_pairs(ds, threshold=0.8)))
    cand = set(zip(pairs.column("id_a").to_pylist(), pairs.column("id_b").to_pylist()))
    assert truth <= cand  # candidate generation is a superset — the guarantee
    shingles = candidate_shingles(ds, {x for p in cand for x in p})
    verified = verify_pairs_distributed(pairs, shingles, threshold=0.8)
    got = set(zip(verified.column("id_a").to_pylist(), verified.column("id_b").to_pylist()))
    assert got == truth


def test_ngram_jaccard_boilerplate_hot_shingles(ray_session):
    """Docs sharing a long boilerplate header (hot shingles) must still join
    exactly: the hot-set ordering only reshapes prefixes, never correctness,
    and near-dup pairs whose overlap is mostly boilerplate still surface."""
    import ray.data as rd

    from schemasaurus_ray.functions.dedup import (
        _dedupe_pairs,
        candidate_shingles,
        expand_candidate_pairs,
        ngram_jaccard_pairs,
        verify_pairs_distributed,
    )

    header = " ".join(f"boiler{j}" for j in range(30))
    texts = [header + f" unique{i}a unique{i}b unique{i}c" for i in range(120)]
    texts[7] = texts[3]  # exact dup on top of shared boilerplate
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts, pa.string())}
    )
    truth = _true_jaccard_pairs(tbl, 0.8)
    ds = rd.from_arrow(tbl)
    # the sampled-df pass must see the boilerplate shingles as frequent
    from schemasaurus_ray.functions import dedup as dd

    sh, df = dd.sampled_df_table(ds, sample_mod=1)
    assert len(sh) > 0 and df.max() >= 100  # boilerplate trigram df ≈ n_docs
    pairs = expand_candidate_pairs(_dedupe_pairs(ngram_jaccard_pairs(ds, threshold=0.8)))
    shingles = candidate_shingles(
        ds, set(pairs.column("id_a").to_pylist()) | set(pairs.column("id_b").to_pylist())
    )
    verified = verify_pairs_distributed(pairs, shingles, threshold=0.8)
    got = set(zip(verified.column("id_a").to_pylist(), verified.column("id_b").to_pylist()))
    assert got == truth and (3, 7) in got


def test_sampled_df_table_paths_shard_sample(docs_ds, tmp_path):
    """The shard-sampled df pass (the 100-TB ordering pass): the shard pick
    is deterministic and listing-order independent, NON-sampled shards are
    never opened (poison-file proof), the within-shard doc mod rescales so
    the overall sampling rate stays ≈ 1/sample_mod, and on a single shard
    the output is bit-identical to the full-scan df pass."""
    import pyarrow.parquet as pq

    from schemasaurus_ray.functions import dedup as dd

    ds, tbl = docs_ds
    one = str(tmp_path / "only.parquet")
    pq.write_table(tbl, one)
    # single shard: kept == all, within_mod == sample_mod → exact parity
    sh_p, df_p = dd.sampled_df_table_paths([one], sample_mod=4)
    sh_f, df_f = dd.sampled_df_table(ds, sample_mod=4)
    assert np.array_equal(sh_p, sh_f) and np.array_equal(df_p, df_f)

    # 8 shards, denom 4 → exactly 2 read; the other 6 are POISON (not
    # parquet) so any attempt to open them raises
    paths = []
    for i in range(8):
        p = str(tmp_path / f"s{i}.parquet")
        paths.append(p)
    kept = dd.sample_shard_paths(paths, 4)
    assert len(kept) == 2
    assert kept == dd.sample_shard_paths(list(reversed(paths)), 4)  # order-free
    n_shard = len(tbl) // 8
    for i, p in enumerate(paths):
        if p in kept:
            pq.write_table(tbl.slice(i * n_shard, n_shard), p)
        else:
            with open(p, "wb") as fh:
                fh.write(b"NOT A PARQUET FILE")
    sh_s, df_s = dd.sampled_df_table_paths(paths, sample_mod=4, shard_denom=4)
    # within_mod = 4 * 2 // 8 = 1 → every doc of the 2 kept shards counted
    expect = {}
    for p in kept:
        t = pq.read_table(p)
        flat, parents = dd._shingle_hash_arrays(t.column("text"), 3)
        for d in range(t.num_rows):
            for v in set(flat[parents == d].tolist()):
                expect[v] = expect.get(v, 0) + 1
    expect = {v: c for v, c in expect.items() if c >= 2}
    got = dict(zip(sh_s.tolist(), df_s.tolist()))
    assert got == expect


def test_ngram_jaccard_pairs_paths_df_same_verified_output(docs_ds, tmp_path):
    """Routing the df pass through the shard sample only reorders the
    prefix filter — the verified near-dup output must stay EXACTLY the
    brute-force truth (the PPJoin guarantee holds for any consistent total
    order), and candidates must stay a superset of the truth."""
    import pyarrow.parquet as pq

    from schemasaurus_ray.functions.dedup import (
        _dedupe_pairs,
        expand_candidate_pairs,
        ngram_jaccard_pairs,
        verify_pairs_shuffled,
    )

    ds, tbl = docs_ds
    paths = []
    for i in range(4):
        p = str(tmp_path / f"d{i}.parquet")
        pq.write_table(tbl.slice(i * 100, 100), p)
        paths.append(p)
    truth = _true_jaccard_pairs(tbl, 0.8)
    pairs = expand_candidate_pairs(
        _dedupe_pairs(ngram_jaccard_pairs(ds, threshold=0.8, paths=paths))
    )
    cand = set(zip(pairs.column("id_a").to_pylist(), pairs.column("id_b").to_pylist()))
    assert truth <= cand
    verified = verify_pairs_shuffled(paths, pairs, threshold=0.8)
    got = set(zip(verified.column("id_a").to_pylist(), verified.column("id_b").to_pylist()))
    assert got == truth


def test_ngram_jaccard_empty_input(ray_session):
    import ray.data as rd

    from schemasaurus_ray.functions.dedup import ngram_jaccard_pairs

    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    out = ngram_jaccard_pairs(empty)
    assert out.num_rows == 0 and out.column_names == ["id_a", "id_b"]


def test_expand_candidate_pairs_closes_star_caps():
    """A star-shaped candidate set (hot-bucket cap artifact) must be closed
    to all intra-component pairs so the verify sees (x, y), while huge
    components stay star-only (documented bound)."""
    from schemasaurus_ray.functions.dedup import expand_candidate_pairs

    star = pa.table(
        {"id_a": pa.array([1, 1, 1], pa.int64()), "id_b": pa.array([2, 3, 4], pa.int64())}
    )
    out = expand_candidate_pairs(star)
    got = set(zip(out.column("id_a").to_pylist(), out.column("id_b").to_pylist()))
    assert got == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    big = pa.table(
        {
            "id_a": pa.array([0] * 600, pa.int64()),
            "id_b": pa.array(range(1, 601), pa.int64()),
        }
    )
    out_big = expand_candidate_pairs(big, max_component=512)
    assert out_big.num_rows == 600  # unchanged: component of 601 > cap


def test_expand_candidate_pairs_sharded_dispatch(ray_session):
    """Above the pair threshold, expansion labels through the distributed
    min-label propagation — the expanded pair set must be identical to the
    driver union-find path on a mixed graph (stars, a chain, pairs)."""
    from schemasaurus_ray.functions.dedup import expand_candidate_pairs

    rng = np.random.default_rng(13)
    a = [1, 1, 1, 10, 11, 12, 20, 30, 30]
    b = [2, 3, 4, 11, 12, 13, 21, 31, 32]
    a += rng.integers(100, 160, 80).tolist()
    b += rng.integers(100, 160, 80).tolist()
    pairs = pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})

    def as_set(t):
        return set(zip(t.column("id_a").to_pylist(), t.column("id_b").to_pylist()))

    driver = as_set(expand_candidate_pairs(pairs))
    sharded = as_set(expand_candidate_pairs(pairs, shard_threshold=0))
    assert driver == sharded and len(driver) > len(set(zip(a, b)))


def test_sharded_cc_matches_union_find(ray_session):
    """Distributed min-label propagation must drop exactly the ids the
    driver union-find drops — random graph with chains, stars, and
    singletons-by-absence (VERDICT r2 #5)."""
    from schemasaurus_ray.functions.dedup import (
        connected_component_dropped,
        connected_component_min,
        connected_component_min_sharded,
    )

    rng = np.random.default_rng(17)
    # chains of length 2..40 over disjoint id ranges + random cross edges
    a_list, b_list = [], []
    base = 0
    for L in rng.integers(2, 40, size=200):
        ids = np.arange(base, base + L, dtype=np.int64)
        rng.shuffle(ids)
        a_list.append(ids[:-1])
        b_list.append(ids[1:])
        base += L + int(rng.integers(1, 5))  # gaps → absent ids
    a = np.concatenate(a_list)
    b = np.concatenate(b_list)
    pairs = pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})

    comp = connected_component_min(pairs)
    exp_dropped = np.asarray(sorted(x for x, r in comp.items() if x != r), dtype=np.int64)

    labels = connected_component_min_sharded(pairs, num_shards=4)
    ids = np.asarray(labels.column("id"), dtype=np.int64)
    roots = np.asarray(labels.column("root"), dtype=np.int64)
    assert (np.sort(ids[ids != roots]) == exp_dropped).all()
    # every root is its component's minimum
    for x, r in comp.items():
        assert roots[np.searchsorted(np.sort(ids), x)] is not None
    lut = dict(zip(ids.tolist(), roots.tolist()))
    assert all(lut[x] == r for x, r in comp.items())

    # the threshold dispatch picks the sharded path and agrees
    got = connected_component_dropped(pairs, shard_threshold=0)
    assert (got == exp_dropped).all()


def test_neardup_keep_best_dropped(ray_session):
    """Keep-best argmax per component vs a brute-force reference; constant
    scores must degrade EXACTLY to keep-min; a missing member score raises
    loudly (never a silent default)."""
    import pytest

    from schemasaurus_ray.functions.dedup import (
        connected_component_dropped,
        connected_component_min,
        neardup_keep_best_dropped,
    )

    rng = np.random.default_rng(23)
    a_list, b_list = [], []
    base = 0
    for L in rng.integers(2, 12, size=60):
        ids = np.arange(base, base + L, dtype=np.int64)
        rng.shuffle(ids)
        a_list.append(ids[:-1])
        b_list.append(ids[1:])
        base += L + int(rng.integers(1, 4))
    a, b = np.concatenate(a_list), np.concatenate(b_list)
    pairs = pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})
    members = np.unique(np.concatenate([a, b]))
    scores = rng.integers(0, 5, size=len(members)).astype(np.int64)  # dense ties
    stbl = pa.table(
        {"doc_id": pa.array(members, pa.int64()), "n_tokens": pa.array(scores, pa.int64())}
    )

    got = neardup_keep_best_dropped(pairs, stbl)
    # brute force: group members by component root, keep (max score, min id)
    comp = connected_component_min(pairs)
    by_root: dict[int, list[int]] = {}
    for x, r in comp.items():
        by_root.setdefault(r, []).append(x)
    lut = dict(zip(members.tolist(), scores.tolist()))
    exp = []
    for mem in by_root.values():
        best = min(mem, key=lambda x: (-lut[x], x))
        exp.extend(x for x in mem if x != best)
    assert got.tolist() == sorted(exp)

    # constant scores ≡ keep-min
    const = pa.table(
        {
            "doc_id": pa.array(members, pa.int64()),
            "n_tokens": pa.array(np.full(len(members), 7), pa.int64()),
        }
    )
    keep_min = connected_component_dropped(pairs)
    assert neardup_keep_best_dropped(pairs, const).tolist() == keep_min.tolist()

    with pytest.raises(ValueError, match="no score row"):
        neardup_keep_best_dropped(pairs, stbl.slice(0, len(members) - 1))

    # empty pairs → nothing dropped
    assert len(neardup_keep_best_dropped(pairs.slice(0, 0), stbl)) == 0


def test_neardup_survivors_keep_best_e2e(docs_ds):
    """End-to-end keep-best survivors on the fixture dataset: survivors =
    corpus minus dropped; every component keeps exactly one member, and it
    is the (max tokens, min id) member."""
    import ray.data as rd

    from schemasaurus_ray.functions.dedup import (
        member_token_counts,
        neardup_survivors_keep_best,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 10, 11, 20], pa.int64()),
            "text": pa.array(
                [
                    "a b c",  # comp {1,2,3}: 3 has most tokens → kept
                    "a b c d",
                    "a b c d e",
                    "x y",  # comp {10,11}: equal tokens → min id kept
                    "p q",
                    "solo doc here",
                ]
            ),
        }
    )
    ds = rd.from_arrow(tbl)
    pairs = pa.table(
        {"id_a": pa.array([1, 2, 10], pa.int64()), "id_b": pa.array([2, 3, 11], pa.int64())}
    )
    out = neardup_survivors_keep_best(ds, pairs)
    assert out.column("doc_id").to_pylist() == [3, 10, 20]

    # the score gather returns members only, with \S+-equivalent counts
    sc = member_token_counts(ds, np.array([1, 3, 11], dtype=np.int64))
    got = dict(zip(sc.column("doc_id").to_pylist(), sc.column("n_tokens").to_pylist()))
    assert got == {1: 3, 3: 5, 11: 2}

    # no pairs → identity
    out2 = neardup_survivors_keep_best(ds, pairs.slice(0, 0))
    assert out2.column("doc_id").to_pylist() == [1, 2, 3, 10, 11, 20]


def test_simhash_near_dup_pairs(docs_ds):
    """Banded candidates + exact-hamming verify: exact dup pairs (i, i+1)
    have hamming 0 and MUST all be found (pigeonhole recall at radius 3)."""
    from schemasaurus_ray.functions.dedup import simhash_near_dups

    ds, _ = docs_ds
    out = simhash_near_dups(ds)
    found = {
        (a, b): h
        for a, b, h in zip(
            out.column("id_a").to_pylist(), out.column("id_b").to_pylist(), out.column("hamming").to_pylist()
        )
    }
    for i in range(0, 400, 20):
        if i + 1 < 400:
            assert found.get((i, i + 1)) == 0, f"missing exact dup {i}"
    assert all(h <= 3 for h in found.values())


def test_embedding_near_dups(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    base = rng.standard_normal((50, 16))
    vecs = list(base)
    # plant near-dups: 5 vectors + tiny noise
    for i in range(5):
        vecs.append(base[i] + 0.01 * rng.standard_normal(16))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    pairs = embedding_near_dups(rd.from_arrow(tbl), threshold=0.98)
    found = set(zip(pairs.column("id_a").to_pylist(), pairs.column("id_b").to_pylist()))
    for i in range(5):
        assert (i, 50 + i) in found


def _semdedup_reference(vecs: np.ndarray, cent: np.ndarray, cids: np.ndarray, t: float):
    """O(n²) numpy reference for semantic_dedup's NOT-EXISTS semantics."""
    u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cu = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    assign = cids[(u @ cu.T).argmax(axis=1)]
    keep = []
    for i in range(len(u)):
        sims = u[:i] @ u[i]
        if not ((assign[:i] == assign[i]) & (sims >= t)).any():
            keep.append((i, int(assign[i])))
    return keep


def test_semantic_dedup_matches_bruteforce(ray_session):
    import ray.data as rd

    from schemasaurus_ray.functions.dedup import semantic_dedup

    rng = np.random.default_rng(11)
    base = rng.standard_normal((60, 16))
    vecs = list(base)
    for i in range(8):  # planted near-dups of the first 8 rows
        vecs.append(base[i] + 0.005 * rng.standard_normal(16))
    mat = np.asarray(vecs)
    cent = base[:5]  # exemplar centroids (rows 0..4)
    cids = np.array([10, 20, 30, 40, 50], dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    # float32 round-trip like the real column, then the float64 reference
    mat32 = np.asarray(mat, dtype=np.float32).astype(np.float64)
    expected = _semdedup_reference(mat32, cent.astype(np.float32).astype(np.float64), cids, 0.98)
    # tiny chunk_bytes forces the chunked lower-triangle path
    out = semantic_dedup(
        rd.from_arrow(tbl), cent, cids, threshold=0.98, chunk_bytes=256
    )
    got = list(zip(out.column("vec_id").to_pylist(), out.column("cluster_id").to_pylist()))
    assert got == expected
    # every planted copy must have been dropped (cos≈1 to its original)
    kept_ids = {i for i, _ in got}
    assert kept_ids.isdisjoint(range(60, 68))


def test_semantic_dedup_cluster_budget(ray_session):
    import ray.data as rd

    from schemasaurus_ray.functions.dedup import ClusterBudgetExceededError, semantic_dedup

    vecs = np.eye(4, 8) + 0.01  # all land in one centroid's cluster
    tbl = pa.table(
        {
            "vec_id": pa.array(range(4), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    cent = np.ones((1, 8))
    with pytest.raises(ClusterBudgetExceededError, match="max_cluster_rows"):
        semantic_dedup(rd.from_arrow(tbl), cent, threshold=0.99, max_cluster_rows=2)


def test_semantic_dedup_empty_and_refs(ray_session):
    import ray
    import ray.data as rd

    from schemasaurus_ray.functions.dedup import semantic_dedup

    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
        }
    )
    out = semantic_dedup(rd.from_arrow(empty), np.ones((2, 8)))
    assert out.num_rows == 0
    assert out.column_names == ["vec_id", "cluster_id"]

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((20, 8))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(20), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    cent = vecs[:3]
    direct = semantic_dedup(rd.from_arrow(tbl), cent, threshold=0.99)
    refs = semantic_dedup(rd.from_arrow(tbl), cent, threshold=0.99, output="refs")
    via_refs = pa.concat_tables([t for t in ray.get(refs) if t.num_rows]).sort_by(
        [("vec_id", "ascending")]
    )
    assert direct.equals(via_refs)


def test_cluster_prototypes_matches_bruteforce(ray_session):
    import ray.data as rd

    from schemasaurus_ray.functions.similarity import cluster_prototypes

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((80, 12))
    cent = vecs[:4]
    cids = np.array([100, 200, 300, 400], dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(80), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    # many small blocks so the per-batch local-topk partial path is real
    ds = rd.from_arrow(tbl).repartition(8)
    out = cluster_prototypes(ds, cent, cids, k=3)

    v32 = vecs.astype(np.float32).astype(np.float64)
    u = v32 / np.linalg.norm(v32, axis=1, keepdims=True)
    cu = cent.astype(np.float32).astype(np.float64)
    cu = cu / np.linalg.norm(cu, axis=1, keepdims=True)
    sims = u @ cu.T
    nearest = sims.argmax(axis=1)
    expected = []
    for ci, cid in enumerate(cids):
        members = np.flatnonzero(nearest == ci)
        ranked = sorted(members, key=lambda i: (-sims[i, ci], i))[:3]
        expected.extend((int(cid), int(i), r) for r, i in enumerate(ranked))
    got = list(
        zip(
            out.column("cluster_id").to_pylist(),
            out.column("vec_id").to_pylist(),
            out.column("prototype_rank").to_pylist(),
        )
    )
    assert got == expected
    # exemplar centroids rank themselves first in their own cluster
    for cid, exemplar in zip(cids, range(4)):
        assert (int(cid), exemplar, 0) in got

    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
        }
    )
    out0 = cluster_prototypes(rd.from_arrow(empty), cent, cids, k=3)
    assert out0.num_rows == 0
    assert out0.column_names == ["cluster_id", "vec_id", "prototype_rank"]


def test_chunk_texts_parity_and_edges():
    from schemasaurus_ray.functions.text import chunk_texts

    texts = ["", "short", "a" * 200, "b" * 201, "c" * 577, "x" * 44]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )

    def ref(texts, C, S, ids):
        out = []
        for i, s in zip(ids, texts):
            nch = 1 if len(s) <= C else (len(s) - C + S - 1) // S + 1
            out.extend((i, j, s[j * S : j * S + C]) for j in range(nch))
        return out

    for C, S in ((200, 150), (10, 3), (10, 200)):  # overlap / dense / gap stride
        got = chunk_texts(t, chunk_chars=C, stride=S)
        rows = list(
            zip(
                got.column("doc_id").to_pylist(),
                got.column("chunk_idx").to_pylist(),
                got.column("chunk").to_pylist(),
            )
        )
        assert rows == ref(texts, C, S, range(len(texts))), (C, S)

    # sliced column (non-zero array offset) must gather the right bytes
    sl = chunk_texts(t.slice(2, 3), chunk_chars=200, stride=150)
    assert sl.column("doc_id").to_pylist()[0] == 2
    assert sl.column("chunk").to_pylist()[0] == "a" * 200

    with pytest.raises(ValueError, match="ASCII"):
        chunk_texts(
            pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["héllo"])})
        )
    with pytest.raises(ValueError, match="positive"):
        chunk_texts(t, chunk_chars=0)
    out0 = chunk_texts(t.slice(0, 0))
    assert out0.num_rows == 0 and out0.column_names == ["doc_id", "chunk_idx", "chunk"]


def test_token_count_and_quality():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["hello world", "  a  b  c ", ""], pa.string())})
    out = token_count(t)
    assert out.column("n_tokens").to_pylist() == [2, 3, 0]
    q = quality_scores(t)
    assert q.column("n_chars").to_pylist() == [11, 10, 0]
    assert 0.8 < q.column("alpha_ratio").to_pylist()[0] <= 1.0


def test_fingerprint_matches_md5():
    import hashlib

    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["hello"], pa.string())})
    out = fingerprint(t)
    assert out.column("fp").to_pylist() == [hashlib.md5(b"hello").hexdigest()]


def test_langid():
    stage = LangIdStage()
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "the cat and the dog are in the house with all of them",
                    "der Hund und die Katze sind nicht in dem Haus mit ihnen",
                    "le chat et le chien sont dans la maison avec les autres",
                ],
                pa.string(),
            ),
        }
    )
    out = stage(t)
    assert out.column("lang_pred").to_pylist() == ["en", "de", "fr"]


def test_brute_force_topk(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    mat = rng.standard_normal((500, 8))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(500), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tbl)
    queries = mat[:3].astype(np.float64)
    out = brute_force_topk(ds, queries, [0, 1, 2], k=5)
    got = out.to_pydict()
    # exact: compute with numpy directly (float32-rounded inputs like the ds)
    mat32 = mat.astype(np.float32).astype(np.float64)
    unit = mat32 / np.linalg.norm(mat32, axis=1, keepdims=True)
    q = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = q @ unit.T
    for qi in range(3):
        expected = set(np.argsort(-sims[qi])[:5].tolist())
        mine = {v for g, v in zip(got["query_id"], got["vec_id"]) if g == qi}
        assert mine == expected
        # each query's own vector is its top hit
        top = [v for g, v in zip(got["query_id"], got["vec_id"]) if g == qi][0]
        assert top == qi


def test_ivf_topk_recall(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(6)
    mat = rng.standard_normal((1000, 8))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(1000), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tbl)
    queries = mat[:4].astype(np.float64)
    exact = brute_force_topk(ds, queries, [0, 1, 2, 3], k=10).to_pydict()
    approx = ivf_topk(ds, queries, [0, 1, 2, 3], k=10, n_clusters=8, nprobe=4).to_pydict()
    recall_num = recall_den = 0
    for qi in range(4):
        e = {v for g, v in zip(exact["query_id"], exact["vec_id"]) if g == qi}
        a = {v for g, v in zip(approx["query_id"], approx["vec_id"]) if g == qi}
        recall_num += len(e & a)
        recall_den += len(e)
    assert recall_num / recall_den >= 0.6  # nprobe=4 of 8 clusters


def test_audio_feature_stage():
    from schemasaurus_ray.sources.fixtures import make_clips

    clips = make_clips(20, inject=False)
    stage = AudioFeatureStage()
    out = stage(clips)
    rms = out.column("rms").to_pylist()
    measured = out.column("measured_ms").to_pylist()
    durs = clips.column("dur_ms").to_pylist()
    assert all(0.1 < r < 0.6 for r in rms)  # 0.5·sin + 0.1·noise
    for m, d in zip(measured, durs):
        assert abs(m - d) <= 1.0


def test_audio_resample_stage():
    from schemasaurus_ray.audio import wav_decode
    from schemasaurus_ray.sources.fixtures import make_clips

    clips = make_clips(5, inject=False)
    stage = AudioResampleStage(target_sr=16000)
    out = stage(clips)
    for i in range(5):
        pcm, sr = wav_decode(out.column("bytes")[i].as_py())
        assert sr == 16000
        dur = clips.column("dur_ms")[i].as_py()
        assert abs(len(pcm) / 16000 * 1000 - dur) < 5


def test_stub_image_decode():
    t = pa.table({"id": pa.array([1], pa.int64()), "bytes": pa.array([b"\x00\x01\x02"], pa.binary())})
    out = StubImageDecodeStage(fake=True)(t)
    assert out.column("features").to_pylist() == [[1.0, pytest.approx(0.8164965, rel=1e-5), 3.0]]


def test_image_decode_real_or_gated():
    """Real decode lights up automatically wherever Pillow exists (the
    pylance gate pattern): with PIL installed the default path decodes a
    real PNG into (w, h, channels, mean, std); without it the stage raises
    NotImplementedError naming the dependency (VERDICT r4 #5)."""
    t = pa.table({"id": pa.array([1], pa.int64()), "bytes": pa.array([b"\x00\x01\x02"], pa.binary())})
    try:
        from PIL import Image
    except ImportError:
        with pytest.raises(NotImplementedError, match="Pillow"):
            StubImageDecodeStage()(t)
        pytest.skip("Pillow not installed: NotImplementedError gate verified, real decode skipped")
    import io as _io

    im = Image.new("RGB", (4, 2), (10, 20, 30))
    buf = _io.BytesIO()
    im.save(buf, format="PNG")
    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "bytes": pa.array([buf.getvalue(), b"not-an-image", None], pa.binary()),
        }
    )
    out = StubImageDecodeStage()(tbl)
    feats = out.column("features").to_pylist()
    assert feats[0] == [4.0, 2.0, 3.0, pytest.approx(20.0), pytest.approx(8.1649658, rel=1e-6)]
    assert feats[1] is None and feats[2] is None  # undecodable / null → null


def test_duplicate_passage_counts(ray_session):
    """Exact L-token duplicate passages: cross-doc shared windows count per
    OCCURRENCE on each side; windows repeated only WITHIN one doc are
    excluded (>1 distinct doc, matching the oracle's HAVING); docs shorter
    than L contribute nothing; disjoint docs report nothing."""
    import ray.data as rd

    from schemasaurus_ray.functions.text import duplicate_passage_counts

    passage = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    docs = {
        # doc 1 and 2 share the full 10-token passage → 3 shared 8-windows each
        1: passage + " alpha beta gamma delta epsilon zeta eta theta",
        2: "intro words here now okay then so forth " + passage,
        # doc 3 repeats ITS OWN 8-token phrase twice but shares nothing
        3: ("unique phrase only in three repeated again " * 2).strip(),
        # doc 4: shorter than 8 tokens
        4: "too short to window at all",
        # doc 5: shares the passage too, TWICE → its windows count per occurrence
        5: passage + " mid filler words pad pad pad pad pad " + passage,
    }
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array(list(docs.values()), pa.string()),
            }
        )
    )
    out = duplicate_passage_counts(ds, L=8)
    got = dict(
        zip(out.column("doc_id").to_pylist(), out.column("n_dup_windows").to_pylist())
    )
    # 10-token passage → 3 distinct 8-token windows shared across docs 1/2/5.
    # Docs 1 and 2 also share nothing else; doc 5 contains each window twice.
    assert got[1] == 3 and got[2] == 3
    assert got[5] == 6
    assert 3 not in got and 4 not in got


def test_duplicate_passage_counts_randomized_bruteforce(ray_session):
    """duplicate_passage_counts vs a pure-Python sliding-window brute force
    on random small-vocab docs (small vocab ⇒ organic cross-doc window
    collisions), including whitespace-noise docs and L-boundary lengths."""
    import ray.data as rd

    from schemasaurus_ray.functions.text import duplicate_passage_counts

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(3)]  # 3^6=729 possible windows ⇒ collisions
    texts = []
    for i in range(120):
        k = int(rng.integers(0, 24))  # many below the L=6 boundary
        toks = [vocab[int(v)] for v in rng.integers(0, len(vocab), k)]
        sep = "  " if i % 7 == 0 else " "  # double-space noise
        texts.append(("  " if i % 11 == 0 else "") + sep.join(toks))
    L = 6
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    out = duplicate_passage_counts(ds, L=L)
    got = dict(zip(out.column("doc_id").to_pylist(), out.column("n_dup_windows").to_pylist()))

    from collections import Counter, defaultdict

    owners = defaultdict(set)
    windows = {}
    for i, t in enumerate(texts):
        toks = t.split()
        ws = [tuple(toks[j : j + L]) for j in range(len(toks) - L + 1)]
        windows[i] = ws
        for w in set(ws):
            owners[w].add(i)
    expect = {}
    for i, ws in windows.items():
        n = sum(1 for w in ws if len(owners[w]) > 1)
        if n:
            expect[i] = n
    assert got == expect
    assert len(expect) > 0  # small vocab guarantees collisions


def test_winnow_fingerprints_detect_shared_passages():
    from schemasaurus_ray.functions.text import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog again and again"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "prefix one " + shared + " suffix alpha",
                    "different opening " + shared + " another ending",
                    "totally unrelated content with no overlap whatsoever here",
                ],
                pa.string(),
            ),
        }
    )
    out = winnow_fingerprints(t)
    by_doc = {}
    for d, f in zip(out.column("doc_id").to_pylist(), out.column("fp").to_pylist()):
        by_doc.setdefault(d, set()).add(f)
    overlap_12 = len(by_doc[1] & by_doc[2]) / min(len(by_doc[1]), len(by_doc[2]))
    overlap_13 = len(by_doc[1] & by_doc[3]) / min(len(by_doc[1]), len(by_doc[3]))
    assert overlap_12 > 0.4          # shared passage detected
    assert overlap_13 < 0.1          # unrelated docs share ~nothing
    # deterministic
    out2 = winnow_fingerprints(t)
    assert out.equals(out2)


def test_verify_pairs_kernel_randomized_bruteforce(ray_session):
    """The rank-encoded searchsorted intersection kernel vs a frozenset
    brute force on randomized set tables, covering the adversarial edges:
    pair ids missing from the shingle table (skipped), both-empty sets
    (J=1), identical sets, disjoint sets, and BOTH dispatch paths (the
    driver-local small-table path and the forced distributed fan-out)."""
    import numpy as np

    from schemasaurus_ray.functions.dedup import verify_pairs_distributed

    rng = np.random.default_rng(7)
    n_docs, vocab = 120, 60
    sets = {}
    for i in range(n_docs):
        k = int(rng.integers(0, 25))
        # hash-like spread values in RANDOM order (the kernel must not
        # depend on callers passing sorted lists); include empty sets
        vals = list({int(v) * 0x9E3779B97F4A7C15 % (1 << 62) for v in rng.integers(0, vocab, k)})
        rng.shuffle(vals)
        if vals and i % 5 == 0:
            vals = vals + vals[:2]  # duplicated entries: set semantics must hold
        sets[i] = vals
    # two identical non-empty sets and a planted big-overlap pair
    sets[1] = sets[0] or [42]
    sets[0] = sets[1]
    sets[2], sets[3] = list(sets[1]), list(sets[1])[:-1] + [999]
    shingle_tbl = pa.table(
        {
            "doc_id": pa.array(list(sets), pa.int64()),
            "shingles": pa.array([sets[i] for i in sets], pa.list_(pa.int64())),
        }
    )
    ids = list(sets)
    a = rng.choice(ids, 400).astype(np.int64)
    b = rng.choice(ids, 400).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    # pairs referencing ids absent from the shingle table must be skipped
    a[:5] = 10_000 + np.arange(5)
    # force the planted identical / near-identical pairs into the batch
    a = np.concatenate([a, [0, 2]]).astype(np.int64)
    b = np.concatenate([b, [1, 3]]).astype(np.int64)
    pairs = pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})

    def brute(th):
        out = set()
        seen = set()
        for x, y in zip(a.tolist(), b.tolist()):
            if (x, y) in seen or x == y:
                continue
            seen.add((x, y))
            if x not in sets or y not in sets:
                continue
            sx, sy = frozenset(sets[x]), frozenset(sets[y])
            inter = len(sx & sy)
            union = len(sx) + len(sy) - inter
            j = 1.0 if union == 0 else inter / union
            if j >= th:
                bp = 10000 if union == 0 else int(np.floor(10000.0 * inter / union))
                out.add((x, y, bp))
        return out

    for th in (0.3, 0.8):
        expect = brute(th)
        for driver_rows in (1 << 14, 0):  # driver-local path, then forced fan-out
            got_tbl = verify_pairs_distributed(
                pairs, shingle_tbl, threshold=th, driver_verify_rows=driver_rows
            )
            got = set(
                zip(
                    got_tbl.column("id_a").to_pylist(),
                    got_tbl.column("id_b").to_pylist(),
                    got_tbl.column("jacc_bp").to_pylist(),
                )
            )
            assert got == expect, (th, driver_rows)
        assert len(expect) > 0  # planted identical/overlap pairs qualify


def test_pairs_from_key_rows_star_cap_and_dedupe():
    """Hot buckets emit O(n) star pairs; duplicate (key, id) rows collapse;
    groups segment correctly across key boundaries."""
    import numpy as np

    from schemasaurus_ray.functions.dedup import _pairs_from_key_rows

    # key 1: ids {1,2,3} (+ dup row) -> 3 pairs; key 2: single id -> none;
    # key 3: 100 ids with cap 10 -> star = 99 pairs around min id
    keys = np.array([1, 1, 1, 1, 2] + [3] * 100, dtype=np.int64)
    ids = np.array([1, 2, 3, 2, 9] + list(range(100, 200)), dtype=np.int64)
    out = _pairs_from_key_rows(keys, ids, cap=10)
    pairs = set(zip(out.column("id_a").to_pylist(), out.column("id_b").to_pylist()))
    assert {(1, 2), (1, 3), (2, 3)} <= pairs
    star = [(a, b) for a, b in pairs if a == 100]
    assert len(star) == 99
    assert len(pairs) == 3 + 99
    # empty input
    empty = _pairs_from_key_rows(np.array([], dtype=np.int64), np.array([], dtype=np.int64), cap=10)
    assert empty.num_rows == 0


def test_connected_component_min():
    from schemasaurus_ray.functions.dedup import connected_component_min

    pairs = pa.table(
        {
            "id_a": pa.array([1, 2, 10, 20, 7], pa.int64()),
            "id_b": pa.array([2, 3, 11, 10, 7], pa.int64()),
        }
    )
    comp = connected_component_min(pairs)
    # chain 1-2-3 -> min 1; chain 10-11, 20-10 -> min 10; self-pair ignored
    assert comp[2] == 1 and comp[3] == 1 and comp[1] == 1
    assert comp[11] == 10 and comp[20] == 10 and comp[10] == 10


def test_video_frame_sample_stub(ray_session):
    """Frame-sampling plumbing: actor-pool map_batches fan-out of (id,
    frame_idx, frame_ms, frame_bytes) rows; real decode raises with the
    missing dependency named."""
    import ray.data as rd

    from schemasaurus_ray.functions.multimodal import StubVideoFrameSampleStage

    blobs = [bytes(range(256)) * 40, b"x" * 1024, None]  # 10240B, 1024B, null
    tbl = pa.table({"id": pa.array([1, 2, 3], pa.int64()), "bytes": pa.array(blobs, pa.binary())})
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            StubVideoFrameSampleStage,
            fn_constructor_kwargs={"fake": True, "every_nth": 3, "frame_size": 1024},
            batch_format="pyarrow",
            concurrency=1,
            batch_size=2,
        )
        .to_pandas()
    )
    # blob 1: 10 frames, every 3rd -> idx 0,3,6,9; blob 2: 1 frame; null skipped
    assert out[out.id == 1].frame_idx.tolist() == [0, 3, 6, 9]
    assert out[out.id == 2].frame_idx.tolist() == [0]
    assert 3 not in set(out.id)
    assert (out[out.id == 1].frame_ms == [0, 120, 240, 360]).all()
    assert all(len(b) == 1024 for b in out[out.id == 1].frame_bytes)


def test_video_frame_sample_real_or_gated():
    """Real frame sampling lights up wherever PyAV exists; without it the
    default path raises NotImplementedError naming the dependency."""
    from schemasaurus_ray.functions.multimodal import StubVideoFrameSampleStage

    tbl = pa.table(
        {"id": pa.array([1], pa.int64()), "bytes": pa.array([b"nota-video"], pa.binary())}
    )
    try:
        import av
    except ImportError:
        with pytest.raises(NotImplementedError, match="PyAV"):
            StubVideoFrameSampleStage()(tbl)
        pytest.skip("PyAV not installed: NotImplementedError gate verified, real decode skipped")
    import io as _io

    import numpy as _np

    # synthesize a 12-frame rgb24 video in memory, sample every 5th
    buf = _io.BytesIO()
    with av.open(buf, mode="w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=25)
        stream.width, stream.height, stream.pix_fmt = 16, 16, "yuv420p"
        for k in range(12):
            frame = av.VideoFrame.from_ndarray(
                _np.full((16, 16, 3), k * 20, dtype=_np.uint8), format="rgb24"
            )
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    vid = pa.table({"id": pa.array([7], pa.int64()), "bytes": pa.array([buf.getvalue()], pa.binary())})
    out = StubVideoFrameSampleStage(every_nth=5)(vid)
    assert out.column("frame_idx").to_pylist() == [0, 5, 10]
    assert all(len(b) == 16 * 16 * 3 for b in out.column("frame_bytes").to_pylist())


def test_md5_vectorized_parity():
    """util.md5_hex must be bit-exact with hashlib across lengths spanning
    1..8 blocks, nulls and unicode."""
    import hashlib

    from schemasaurus_ray.util import md5_hex

    cases = ["", "a", "abc", "x" * 55, "y" * 56, "z" * 63, "w" * 64, "v" * 65,
             "u" * 119, "t" * 120, "s" * 400, None, "ünïcode ✓  "]
    got = md5_hex(pa.array(cases, pa.string())).to_pylist()
    for s, g in zip(cases, got):
        if s is None:
            assert g is None
        else:
            assert g == hashlib.md5(s.encode("utf-8")).hexdigest(), s


def test_md5_length_class_passes_bound_memory():
    """One outlier-long row among many short ones must not inflate the
    padded buffer to n×max_len (ADVICE r2 medium): with a tiny pass budget
    the length-class path splits rows into several passes yet stays
    bit-exact with hashlib, outputs in the ORIGINAL row order."""
    import hashlib

    from schemasaurus_ray.util import md5_digests

    rows = [b"s%d" % i for i in range(500)] + [b"L" * 200_000] + [b"tail"]
    digs = md5_digests(pa.array(rows, pa.binary()), pass_budget=16_384)
    assert digs.shape == (502, 16)
    for r, d in zip(rows, digs):
        assert bytes(d) == hashlib.md5(r).digest()


def test_ngram_jaccard_property_random_corpora(ray_session, tmp_path):
    """Property harness for the prefix-filter join's exactness guarantee:
    random small-vocabulary corpora (forcing heavy shingle sharing, the
    hard case for prefix filtering) across thresholds — the join must equal
    brute-force all-pairs Jaccard EXACTLY every time, through BOTH verify
    kernels (broadcast-CSR and shingle-bucket shuffle). Deterministic seeds
    rather than hypothesis: each example spins Ray datasets, so a bounded
    fixed set keeps the suite fast while still sweeping corpus shapes."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from schemasaurus_ray.functions.dedup import (
        _dedupe_pairs,
        candidate_shingles,
        expand_candidate_pairs,
        ngram_jaccard_pairs,
        verify_pairs_distributed,
        verify_pairs_shuffled,
    )

    rng = np.random.default_rng(7)
    for case, (vocab, n_docs, lo_w, hi_w, thresh) in enumerate(
        [
            (8, 40, 3, 10, 0.8),    # tiny vocab: every shingle shared
            (30, 60, 5, 14, 0.7),   # moderate sharing, lower threshold
            (12, 50, 1, 4, 0.9),    # short docs (<n words → single shingle)
            (50, 60, 6, 12, 0.5),   # low threshold → long prefixes
        ]
    ):
        words = [f"v{case}w{k}" for k in range(vocab)]
        texts = [
            " ".join(rng.choice(words, size=rng.integers(lo_w, hi_w + 1)))
            for _ in range(n_docs)
        ]
        texts[5] = texts[2]  # plant one exact dup
        tbl = pa.table(
            {"doc_id": pa.array(range(n_docs), pa.int64()), "text": pa.array(texts, pa.string())}
        )
        truth = _true_jaccard_pairs(tbl, thresh)
        ds = rd.from_arrow(tbl)
        pairs = expand_candidate_pairs(
            _dedupe_pairs(ngram_jaccard_pairs(ds, threshold=thresh))
        )
        cand = set(zip(pairs.column("id_a").to_pylist(), pairs.column("id_b").to_pylist()))
        assert truth <= cand, f"case {case}: prefix filter missed {truth - cand}"
        sh = candidate_shingles(ds, {x for p in cand for x in p})
        ver = verify_pairs_distributed(pairs, sh, threshold=thresh)
        got = set(zip(ver.column("id_a").to_pylist(), ver.column("id_b").to_pylist()))
        assert got == truth, f"case {case}: {got ^ truth}"
        assert (2, 5) in got or (5, 2) in got  # planted dup found
        # the shuffled verify must agree, jaccards included
        shard = str(tmp_path / f"case{case}.parquet")
        pq.write_table(tbl, shard)
        ver2 = verify_pairs_shuffled([shard], pairs, threshold=thresh, num_buckets=3)
        got2 = {
            (a, b): j
            for a, b, j in zip(
                ver2.column("id_a").to_pylist(),
                ver2.column("id_b").to_pylist(),
                ver2.column("jaccard").to_pylist(),
            )
        }
        ref2 = {
            (a, b): j
            for a, b, j in zip(
                ver.column("id_a").to_pylist(),
                ver.column("id_b").to_pylist(),
                ver.column("jaccard").to_pylist(),
            )
        }
        assert got2 == ref2, f"case {case}: shuffled verify diverged"


def test_prefix_pairs_hot_group_guard():
    """A prefix-token group beyond the 4096 hot limit must star around the
    min id WITHOUT the O(g^2) triu allocation (scale guard); small groups
    keep exact filtered pair emission."""
    import numpy as np

    from schemasaurus_ray.functions.dedup import _pairs_from_prefix_rows

    g = 5000
    keys = np.concatenate([np.zeros(g, np.int64), np.full(3, 7, np.int64)])
    ids = np.concatenate([np.arange(100, 100 + g, dtype=np.int64),
                          np.array([1, 2, 3], np.int64)])
    pos = np.zeros(g + 3, np.int64)
    size = np.full(g + 3, 10, np.int64)
    out = _pairs_from_prefix_rows(keys, ids, pos, size, tb=8000, cap=64)
    a = np.asarray(out.column("id_a"))
    b = np.asarray(out.column("id_b"))
    hot = a == 100
    assert hot.sum() == g - 1  # star: (min, x) for every other member
    assert set(b[hot].tolist()) == set(range(101, 100 + g))
    # the small group still emits its exact pairs
    small = set(zip(a[~hot].tolist(), b[~hot].tolist()))
    assert small == {(1, 2), (1, 3), (2, 3)}


def test_batch_bigrams_boundaries_and_empties():
    import pyarrow as pa

    from schemasaurus_ray.functions.text import batch_bigrams

    col = pa.chunked_array([pa.array(["a b c", "", None, "x", " q  r ", "one"], pa.string())])
    bg, doc = batch_bigrams(col)
    # no cross-document pairs, no empty tokens, 1-token docs yield nothing
    assert bg.to_pylist() == ["a b", "b c", "q r"]
    assert doc.tolist() == [0, 0, 4]


def test_bigram_lm_topk_deterministic_head(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schemasaurus_ray.functions.text import bigram_lm_topk

    # 'a b' x3, 'b a' x3 (tie -> asc), 'c d' x2, 'z z' x1 (below min_df)
    texts = ["a b", "a b", "a b", "b a", "b a", "b a", "c d", "c d", "z z"]
    t = pa.table({"text": pa.array(texts, pa.string())})
    p1, p2 = str(tmp_path / "s1.parquet"), str(tmp_path / "s2.parquet")
    pq.write_table(t.slice(0, 5), p1)
    pq.write_table(t.slice(5), p2)
    lm = bigram_lm_topk([p1, p2], k=2, min_df=2)
    assert lm.to_pylist() == ["a b", "b a"]
    lm3 = bigram_lm_topk([p1, p2], k=10, min_df=2)
    assert lm3.to_pylist() == ["a b", "b a", "c d"]


def test_ann_recall_query_floor(ray_session):
    """IVF recall@10 vs exact brute force: deterministic and above the
    floor that makes the approximate path trustworthy for dedup."""
    from schemasaurus_ray.pipelines import queries as q

    out = q.ann_recall_embeddings("/root/testdata/sf0.001")
    rows = out.to_pylist()
    assert rows and all(0 <= r["recall_bp"] <= 10000 for r in rows)
    mean_bp = sum(r["recall_bp"] for r in rows) / len(rows)
    assert mean_bp >= 7000, rows  # nprobe=6/16 on clustered synthetic data
    # deterministic: second run identical
    again = q.ann_recall_embeddings("/root/testdata/sf0.001").to_pylist()
    assert again == rows


def test_ivf_indexed_prunes_io_and_matches_scan(ray_session, tmp_path):
    """The persisted centroid-partitioned layout (VERDICT r3 #3): queries
    read ONLY probed bucket directories (files/bytes strictly < the full
    index), results are IDENTICAL to the one-shot full-scan ivf_topk
    (same centroids → same assignment → same candidates), and a rebuild
    with matching params reuses the finished index."""
    import os

    import ray.data as rd

    from schemasaurus_ray.functions.similarity import ivf_build_index, ivf_topk_indexed

    rng = np.random.default_rng(6)
    mat = rng.standard_normal((1000, 8))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(1000), pa.int64()),
            "embedding": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tbl)
    queries = mat[:4].astype(np.float64)
    idx = str(tmp_path / "ivf")
    cent = ivf_build_index(ds, idx, n_clusters=8, sample_size=512)
    io: dict = {}
    got = ivf_topk_indexed(idx, queries, [0, 1, 2, 3], k=10, nprobe=3, io_stats=io)
    assert io["files_total"] > 0 and io["files_read"] < io["files_total"]
    assert 0 < io["bytes_read"] < io["bytes_total"]
    want = ivf_topk(
        rd.from_arrow(tbl), queries, [0, 1, 2, 3], k=10, n_clusters=8, nprobe=3,
        sample_size=512,
    )
    assert got.sort_by([("query_id", "ascending"), ("vec_id", "ascending")]).equals(
        want.sort_by([("query_id", "ascending"), ("vec_id", "ascending")])
    )
    # idempotent reuse: marker + params match → same centroids, no rewrite
    mtimes = {
        f: os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(idx) for f in fs
    }
    cent2 = ivf_build_index(rd.from_arrow(tbl), idx, n_clusters=8, sample_size=512)
    assert np.allclose(cent, cent2)
    mtimes2 = {
        f: os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(idx) for f in fs
    }
    assert mtimes == mtimes2


def _doc_profile_dir(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sfp"
    d.mkdir(exist_ok=True)
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(rows))), pa.int64()),
            "text": pa.array([r[2] if len(r) > 2 else "x" for r in rows], pa.string()),
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "source": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_column_profile_nulls_vs_duckdb(ray_session, tmp_path):
    """NULL categories: n_null counts them, n_distinct excludes them,
    entropy keeps them as a category — engine vs the shipped oracle SQL
    on a corpus the sf fixtures don't have (they are null-free)."""
    import duckdb

    import __ray_entry__ as entry
    from schemasaurus_ray.pipelines.queries import column_profile_documents

    rows = [
        ("en", "web"), ("en", "web"), ("de", None), (None, "web"),
        (None, None), ("fr", "books"), ("en", None), ("de", "web"),
    ]
    d = _doc_profile_dir(tmp_path, rows)
    got = column_profile_documents(d).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    exp = con.sql(entry.oracle_sql()["column_profile_documents"]).df()
    assert got.values.tolist() == exp.values.tolist()
    lang_row = got[got["column"] == "lang"].iloc[0]
    assert int(lang_row.n_null) == 2 and int(lang_row.n_distinct) == 3


def test_mutual_info_closed_form(ray_session, tmp_path):
    """MI(lang; source) = 0 exactly for an independent product corpus;
    = H(lang) for a bijective lang↔source corpus (1.5 bits for the
    {1/2, 1/4, 1/4} marginal) — closed forms, not just oracle echo."""
    from schemasaurus_ray.pipelines.queries import mutual_info_documents

    indep = [(lg, sc) for lg in ("en", "en", "de", "fr") for sc in ("web", "books")]
    d = _doc_profile_dir(tmp_path, indep)
    assert mutual_info_documents(d).column("mi_ubits").to_pylist() == [0]

    dep = [("en", "web"), ("en", "web"), ("de", "books"), ("fr", "news")]
    d2 = tmp_path / "dep"
    d2.mkdir()
    d = _doc_profile_dir(d2, dep)
    # H = 1/2·1 + 1/4·2 + 1/4·2 = 1.5 bits
    assert mutual_info_documents(d).column("mi_ubits").to_pylist() == [1_500_000]


def test_gini_user_activity_closed_form(ray_session, tmp_path):
    """Gini from the count histogram vs the direct rank formula: uniform
    keys → 0; one dominant key → the closed-form Σ(2i−k−1)xᵢ/(k·Σx)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schemasaurus_ray.pipelines.queries import gini_user_activity_events

    def write(counts, name):
        d = tmp_path / name
        d.mkdir()
        uid = [u for u, c in enumerate(counts) for _ in range(c)]
        pq.write_table(
            pa.table({"user_id": pa.array(uid, pa.int64())}),
            str(d / "events.parquet"),
        )
        return str(d)

    assert gini_user_activity_events(write([5, 5, 5, 5], "uni")).column(
        "gini_bp"
    ).to_pylist() == [0]

    counts = [1, 1, 2, 3, 13]
    xs = sorted(counts)
    k, tot = len(xs), sum(xs)
    s = sum((2 * (i + 1) - k - 1) * x for i, x in enumerate(xs))
    want = (10000 * s) // (k * tot)
    got = gini_user_activity_events(write(counts, "skew")).column("gini_bp").to_pylist()
    assert got == [want] and want > 3000


def test_doc_keywords_ties_and_guard(ray_session, tmp_path):
    """Per-doc rarest term: df ASC beats tf DESC beats token ASC, all
    integer; tokenless docs emit no row; the vocabulary budget raises
    loudly instead of silently broadcasting an unbounded df table."""
    import pytest as _pytest

    import pyarrow as pa
    import pyarrow.parquet as pq

    from schemasaurus_ray.pipelines.queries import doc_keywords_documents
    from schemasaurus_ray.stages.stats import DomainTooLargeError

    d = tmp_path / "kw"
    d.mkdir()
    texts = {
        # rare appears in 1 doc, common in 3 → doc 0 keyword = rare
        0: "common common rare common",
        # all terms df=2 here: tf decides (beta beta alpha) → beta
        1: "beta alpha beta",
        # tie on df AND tf → lexicographically smallest token
        2: "beta alpha",
        3: "",  # tokenless: no row
    }
    # make alpha/beta df=2 exactly (docs 1,2); common df=2 (docs 0,4)
    texts[4] = "common"
    tbl = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    out = doc_keywords_documents(str(d))
    got = {
        r["doc_id"]: (r["token"], r["tf"], r["df"]) for r in out.to_pylist()
    }
    assert got == {
        0: ("rare", 1, 1),
        1: ("beta", 2, 2),
        2: ("alpha", 1, 2),
        4: ("common", 1, 2),
    }
    with _pytest.raises(DomainTooLargeError):
        doc_keywords_documents(str(d), max_vocab_rows=2)


def test_drift_ks_closed_form(ray_session, tmp_path):
    """Exact KS: identical halves → 0 bp; disjoint supports → 10000 bp;
    a half-overlap case vs the hand-computed max |F1−F2|; nulls excluded."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from schemasaurus_ray.pipelines.queries import drift_ks_events

    def write(first, second, name, nulls=0):
        d = tmp_path / name
        d.mkdir()
        vals = list(first) + [None] * nulls + list(second)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(list(range(len(vals))), pa.int64()),
                    "value": pa.array(vals, pa.float64()),
                }
            ),
            str(d / "events.parquet"),
        )
        return str(d)

    same = [1.0, 2.0, 3.0, 4.0]
    assert drift_ks_events(write(same, same, "same")).column("ks_bp").to_pylist() == [0]

    lo = [1.0, 2.0, 3.0]
    hi = [10.0, 11.0, 12.0]
    assert drift_ks_events(write(lo, hi, "disj")).column("ks_bp").to_pylist() == [10000]

    # halves of 4: first = {1,2,2,3}, second = {2,3,3,4}
    # F1 at v=2: 3/4, F2: 1/4 → D = 1/2 → 5000 bp
    a = [1.0, 2.0, 2.0, 3.0]
    b = [2.0, 3.0, 3.0, 4.0]
    assert drift_ks_events(write(a, b, "half")).column("ks_bp").to_pylist() == [5000]

    # nulls sit between the halves: count//2 split keeps samples uneven
    # (first = {1,2,2,3,None} → n1=4 after null drop, second 4) but the
    # null never lands on the CDF; statistic unchanged vs the duckdb oracle
    import duckdb

    import __ray_entry__ as entry

    d = write(a, b, "nulls", nulls=2)
    got = drift_ks_events(d).column("ks_bp").to_pylist()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    exp = con.sql(entry.oracle_sql()["drift_ks_events"]).df()["ks_bp"].tolist()
    assert got == exp
