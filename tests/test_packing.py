"""Length-bucketed sequence packing (functions/packing.py): budget
invariant, determinism/layout-independence, brute-force parity, empties."""

import numpy as np
import pyarrow as pa

from schemasaurus_ray.functions.packing import (
    bucket_capacity,
    length_buckets,
    pack_by_length_buckets,
    pack_documents_ds,
)


def test_length_buckets_exact_powers():
    n = np.array([0, 1, 2, 3, 4, 63, 64, 65, 1 << 20])
    assert length_buckets(n).tolist() == [0, 0, 1, 2, 2, 6, 6, 7, 20]


def test_bucket_capacity_floor_one():
    caps = bucket_capacity(np.array([0, 1, 6, 7, 23]), budget=64)
    assert caps.tolist() == [64, 32, 1, 1, 1]


def _words(k: int) -> str:
    return " ".join(["w"] * k)


def test_pack_budget_invariant_and_brute_force(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n_tok = rng.integers(1, 200, size=400)
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(400), pa.int64()),
            "text": pa.array([_words(int(k)) for k in n_tok], pa.string()),
        }
    )
    budget = 64
    out = pack_documents_ds(rd.from_arrow(docs), budget=budget)
    assert out.num_rows == 400

    ids = np.asarray(out.column("doc_id"))
    buckets = np.asarray(out.column("bucket"))
    bins = np.asarray(out.column("bin"))
    tok = n_tok[ids]

    # budget invariant: full bins never exceed the budget; docs longer than
    # the budget are singleton bins
    for b in np.unique(buckets):
        cap = max(budget >> int(b), 1)
        sel = buckets == b
        for bin_id in np.unique(bins[sel]):
            members = tok[sel & (bins == bin_id)]
            if (1 << int(b)) <= budget:
                assert members.sum() <= budget
            else:
                assert len(members) == 1

    # brute-force parity: rank // capacity over ids sorted within bucket
    want_bucket = length_buckets(n_tok)
    for b in np.unique(want_bucket):
        sel_ids = np.sort(np.nonzero(want_bucket == b)[0])
        cap = max(budget >> int(b), 1)
        want_bins = np.arange(len(sel_ids)) // cap
        got = {int(i): int(x) for i, x in zip(ids[buckets == b], bins[buckets == b])}
        assert [got[int(i)] for i in sel_ids] == want_bins.tolist()


def test_pack_layout_independent(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    n_tok = rng.integers(1, 100, size=120)
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(120), pa.int64()),
            "text": pa.array([_words(int(k)) for k in n_tok], pa.string()),
        }
    )
    a = pack_documents_ds(rd.from_arrow(docs), budget=32).sort_by("doc_id")
    # same rows, different block layout and order
    perm = rng.permutation(120)
    shuffled = docs.take(pa.array(perm))
    b = pack_documents_ds(rd.from_arrow(shuffled).repartition(7), budget=32).sort_by("doc_id")
    assert a.equals(b)


def test_pack_empty(ray_session):
    import ray.data as rd

    empty = pa.table({"doc_id": pa.array([], pa.int64()), "bucket": pa.array([], pa.int64())})
    out = pack_by_length_buckets(rd.from_arrow(empty), budget=64)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "bucket", "bin"]


def test_pack_audio_segments_composition(ray_session):
    """The audio composition: every VAD segment appears exactly once, each
    bin's true duration sum stays within the 4000 ms budget, and full bins
    clear 50% utilization."""
    import numpy as np

    from schemasaurus_ray.pipelines.queries import (
        pack_audio_segments,
        segment_audio_clips,
    )

    segs = segment_audio_clips("ignored")
    packed = pack_audio_segments("ignored")
    assert packed.num_rows == segs.num_rows
    key = lambda t: list(zip(t.column("clip_id").to_pylist(), t.column("seg_no").to_pylist()))
    assert key(packed) == key(segs)  # both sorted by (clip_id, seg_no)
    dur = {k: d for k, d in zip(key(segs), segs.column("dur_ms").to_pylist())}
    sums: dict[tuple[int, int], int] = {}
    counts: dict[tuple[int, int], int] = {}
    for k, b, bn in zip(
        key(packed), packed.column("dur_bucket").to_pylist(), packed.column("bin").to_pylist()
    ):
        assert (1 << (b - 1)) < dur[k] <= (1 << b)
        sums[(b, bn)] = sums.get((b, bn), 0) + dur[k]
        counts[(b, bn)] = counts.get((b, bn), 0) + 1
    for (b, bn), s in sums.items():
        assert s <= 4000, (b, bn, s)
        cap = max(4000 >> b, 1)
        assert counts[(b, bn)] <= cap
        if counts[(b, bn)] == cap:  # full bin -> >= 50% utilization
            assert s * 2 > 4000 * (cap * (1 << b) >= 4000), (b, bn, s)
    # at least one genuinely full multi-segment bin exists in the fixture
    assert any(c > 1 for c in counts.values())


def test_export_packed_audio_invariants(ray_session):
    """Audio export bins: duration within budget, 16 kHz sample math exact,
    every expected utterance appears in exactly one bin."""
    from schemasaurus_ray.pipelines.queries import export_packed_audio

    out = export_packed_audio("ignored")
    assert out.num_rows > 0
    dur = out.column("dur_ms_total").to_pylist()
    samp = out.column("n_samples").to_pylist()
    nseg = out.column("n_segments").to_pylist()
    buckets = out.column("dur_bucket").to_pylist() if "dur_bucket" in out.column_names else out.column("bucket").to_pylist()
    for d, s, ns, b in zip(dur, samp, nseg, buckets):
        assert d <= 4000
        assert s == d * 16  # resampled to 16 kHz, durations are exact ms
        assert ns <= max(4000 >> b, 1)
    # total segments across bins == expected VAD segment count over 256 clips
    def n_expected(i):
        return 0 if (i % 17 == 0 or i % 19 == 0) else 1 + i % 3
    assert sum(nseg) == sum(n_expected(i) for i in range(256))
