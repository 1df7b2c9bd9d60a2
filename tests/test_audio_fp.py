"""Perceptual audio fingerprints (functions/audio_fp.py): kernel parity
vs a per-row reference, gain/noise invariances, planted near-dup golden."""

import numpy as np
import pyarrow as pa

from schemasaurus_ray.audio import synth_samples, wav_decode, wav_encode
from schemasaurus_ray.functions.audio_fp import (
    FRAMES,
    AudioFingerprintStage,
    audio_near_dups,
    envelope_signature,
    pcm_envelope_features,
)
from schemasaurus_ray.functions.dedup import hamming64


def _clip(i: int, dur_ms: int = 600) -> tuple[bytes, int]:
    sr = [8000, 16000, 22050, 44100][i % 4]
    return wav_encode(synth_samples(i, sr, dur_ms), sr), sr


def _ref_features(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Per-row reference implementation (independent of the batch kernel)."""
    x, _sr = wav_decode(blob)
    L = len(x)
    env = np.zeros(FRAMES)
    zcr = np.zeros(FRAMES)
    b = (L * np.arange(FRAMES + 1)) // FRAMES
    sgn = x >= 0
    for f in range(FRAMES):
        p, q = int(b[f]), int(b[f + 1])
        ln = max(q - p, 1)
        seg = x[p:q].astype(np.int64)
        env[f] = np.abs(seg).sum() / ln
        if q - p > 1:
            zcr[f] = (sgn[p + 1 : q] != sgn[p : q - 1]).sum() / ln
    return env, zcr


def test_envelope_features_match_per_row_reference():
    blobs = [_clip(i, dur_ms=200 + 150 * (i % 5))[0] for i in range(30)]
    env, zcr, valid = pcm_envelope_features(pa.array(blobs, pa.binary()))
    assert valid.all()
    for i, blob in enumerate(blobs):
        re, rz = _ref_features(blob)
        np.testing.assert_allclose(env[i], re, rtol=0, atol=1e-9)
        np.testing.assert_allclose(zcr[i], rz, rtol=0, atol=1e-9)


def test_envelope_features_edge_blobs():
    good, _ = _clip(1)
    header_only = wav_encode(np.array([], dtype=np.int16), 16000)
    blobs = pa.array([good, None, b"junk", header_only], pa.binary())
    env, zcr, valid = pcm_envelope_features(blobs)
    assert valid.tolist() == [True, False, False, False]
    assert (env[1:] == 0).all()


def test_signature_gain_invariant_noise_robust():
    base, gain, noise = [], [], []
    for i in range(40):
        blob, sr = _clip(i)
        x, _ = wav_decode(blob)
        base.append(blob)
        gain.append(wav_encode((x.astype(np.int32) // 2).astype(np.int16), sr))
        rng = np.random.Generator(np.random.PCG64(50 + i))
        y = np.clip(
            x.astype(np.float64) + 0.0015 * 32767 * rng.standard_normal(len(x)), -32768, 32767
        ).astype(np.int16)
        noise.append(wav_encode(y, sr))
    env, zcr, valid = pcm_envelope_features(pa.array(base + gain + noise, pa.binary()))
    assert valid.all()
    sig = envelope_signature(env)
    sb, sg, sn = sig[:40], sig[40:80], sig[80:]
    # gain halving requantizes to int16, so near-tie frames may flip a bit
    # or two — the contract is the banding radius, with most copies exact
    hg = hamming64(sb, sg)
    assert (hg <= 3).all() and (hg == 0).mean() >= 0.9
    assert (hamming64(sb, sn) <= 3).all()  # ~50 dB SNR copy: inside banding radius
    # distinct clips are far apart
    d = hamming64(np.repeat(sb, 40), np.tile(sb, 40)).reshape(40, 40)
    np.fill_diagonal(d, 99)
    assert d.min() > 3


def test_stage_schema_and_validity_filter():
    blobs = [_clip(i)[0] for i in range(5)] + [b"junk"]
    t = pa.table(
        {
            "clip_key": pa.array(np.arange(6), pa.int64()),
            "bytes": pa.array(blobs, pa.binary()),
        }
    )
    out = AudioFingerprintStage()(t)
    assert out.column_names == ["clip_key", "simhash", "band0", "band1", "band2", "band3"]
    assert out.num_rows == 5  # junk row dropped


def test_audio_near_dups_planted_golden(ray_session):
    import ray.data as rd

    rows_k, rows_b = [], []
    expected = set()
    for i in range(60):
        blob, sr = _clip(i)
        x, _ = wav_decode(blob)
        rows_k.append(i)
        rows_b.append(blob)
        if i % 3 == 0:
            rows_k.append(i + 1_000_000)
            rows_b.append(wav_encode((x.astype(np.int32) // 2).astype(np.int16), sr))
            expected.add((i, i + 1_000_000))
        if i % 5 == 0:
            rng = np.random.Generator(np.random.PCG64(400 + i))
            y = np.clip(
                x.astype(np.float64) + 0.0015 * 32767 * rng.standard_normal(len(x)), -32768, 32767
            ).astype(np.int16)
            rows_k.append(i + 2_000_000)
            rows_b.append(wav_encode(y, sr))
            expected.add((i, i + 2_000_000))
        if i % 15 == 0:
            # both copies exist: they are near-dups of each other too
            expected.add((i + 1_000_000, i + 2_000_000))
    ds = rd.from_arrow(
        pa.table(
            {
                "clip_key": pa.array(rows_k, pa.int64()),
                "bytes": pa.array(rows_b, pa.binary()),
            }
        )
    ).repartition(4)
    pairs = audio_near_dups(ds, key_col="clip_key", max_hamming=3)
    got = set(
        zip(
            np.asarray(pairs.column("id_a"), dtype=np.int64).tolist(),
            np.asarray(pairs.column("id_b"), dtype=np.int64).tolist(),
        )
    )
    assert got == expected


def test_banded_index_incremental_probe_golden(ray_session, tmp_path):
    """Incremental perceptual near-dup: index the BASE clips' banded
    fingerprints once, then probe with only the planted copies — the
    verified pairs must equal the full-run planted golden (every expected
    pair touches a copy), the probe must verify hamming from index-carried
    signatures without touching any audio bytes, and a tiny drop must read
    only its touched bucket dirs (io pruning)."""
    import ray.data as rd

    from schemasaurus_ray.functions.dedup import banded_index_build, banded_probe_pairs

    rows_k, rows_b = [], []
    expected = set()
    for i in range(60):
        blob, sr = _clip(i)
        x, _ = wav_decode(blob)
        rows_k.append(i)
        rows_b.append(blob)
        if i % 3 == 0:
            rows_k.append(i + 1_000_000)
            rows_b.append(wav_encode((x.astype(np.int32) // 2).astype(np.int16), sr))
            expected.add((i, i + 1_000_000))
        if i % 5 == 0:
            rng = np.random.Generator(np.random.PCG64(400 + i))
            y = np.clip(
                x.astype(np.float64) + 0.0015 * 32767 * rng.standard_normal(len(x)), -32768, 32767
            ).astype(np.int16)
            rows_k.append(i + 2_000_000)
            rows_b.append(wav_encode(y, sr))
            expected.add((i, i + 2_000_000))
        if i % 15 == 0:
            expected.add((i + 1_000_000, i + 2_000_000))
    tbl = pa.table(
        {"clip_key": pa.array(rows_k, pa.int64()), "bytes": pa.array(rows_b, pa.binary())}
    )
    sigs = AudioFingerprintStage(key_col="clip_key", bytes_col="bytes")(tbl)
    keys = np.asarray(sigs.column("clip_key"), dtype=np.int64)
    old = sigs.filter(pa.array(keys < 1_000_000))
    new = sigs.filter(pa.array(keys >= 1_000_000))
    idx = str(tmp_path / "bidx")
    banded_index_build(rd.from_arrow(old).repartition(3), idx, id_col="clip_key")
    out = banded_probe_pairs(idx, new, id_col="clip_key", max_hamming=3)
    got = set(
        zip(
            np.asarray(out.column("id_a"), dtype=np.int64).tolist(),
            np.asarray(out.column("id_b"), dtype=np.int64).tolist(),
        )
    )
    # probe pairs touching a copy == the full planted golden (expansion may
    # also surface base×base pairs; none qualify at hamming ≤ 3 here)
    got_new = {(a, b) for a, b in got if a >= 1_000_000 or b >= 1_000_000}
    assert got_new == expected
    # hammings agree with direct signature recomputation
    sig_of = dict(
        zip(keys.tolist(), np.asarray(sigs.column("simhash"), dtype=np.int64).tolist())
    )
    from schemasaurus_ray.functions.dedup import hamming64 as h64

    for a, b, d in zip(
        np.asarray(out.column("id_a"), dtype=np.int64).tolist(),
        np.asarray(out.column("id_b"), dtype=np.int64).tolist(),
        np.asarray(out.column("hamming"), dtype=np.int64).tolist(),
    ):
        assert d == int(
            h64(
                np.array([sig_of[a]], dtype=np.int64).view(np.uint64),
                np.array([sig_of[b]], dtype=np.int64).view(np.uint64),
            )[0]
        )
    # io pruning: a single-clip drop touches ≤ 4 band keys → few buckets
    stats: dict = {}
    banded_probe_pairs(idx, new.slice(0, 1), id_col="clip_key", io_stats=stats)
    assert 0 < stats["files_read"] < stats["files_total"]


# ---------------------------------------------------------- audio normalizer
def test_trim_gain_kernel():
    from schemasaurus_ray.audio import pcm_trim_gain

    x = synth_samples(1, 8000, 400)
    pad = np.zeros(800, np.int16)
    blobs = pa.array(
        [
            wav_encode(np.concatenate([pad, x, pad]), 8000),
            wav_encode(np.zeros(1000, np.int16), 8000),  # silent
            b"junk",  # invalid
            wav_encode(x, 8000),  # nothing to trim
        ],
        pa.binary(),
    )
    r = pcm_trim_gain(blobs)
    assert r["valid"].tolist() == [True, True, False, True]
    assert r["silent"].tolist() == [False, True, False, False]
    assert r["trim_start"][0] == 800 and r["trim_len"][0] == len(x)
    assert r["trim_start"][3] == 0 and r["trim_len"][3] == len(x)
    # gain brings trimmed RMS to the 0.1 target exactly (pre-quantization)
    np.testing.assert_allclose(r["gain"][0] * r["rms"][0], 0.1, rtol=1e-12)
    assert r["gain"][1] == 0.0


def test_normalize_stage_invariants():
    from schemasaurus_ray.functions.multimodal import AudioNormalizeStage

    x = synth_samples(2, 16000, 500)
    pad = np.zeros(1600, np.int16)
    padded = wav_encode(np.concatenate([pad, x, pad]), 16000)
    silent = wav_encode(np.zeros(500, np.int16), 16000)
    batch = pa.table(
        {
            "clip_id": pa.array(["a", "b", "c", "d"], pa.string()),
            "bytes": pa.array([padded, silent, b"junk", wav_encode(x, 16000)], pa.binary()),
        }
    )
    stage = AudioNormalizeStage(target_rms=0.1)
    out = stage(batch)
    act = out.column("action").to_pylist()
    assert act == ["normalized", "silent", "invalid", "normalized"]
    # silent/invalid payloads pass through untouched
    assert out.column("bytes")[1].as_py() == silent
    assert out.column("bytes")[2].as_py() == b"junk"
    # normalized payload: silence trimmed, RMS == target (within int16 quantization)
    y, sr = wav_decode(out.column("bytes")[0].as_py())
    assert len(y) == len(x)
    rms = float(np.sqrt(np.mean((y.astype(np.float64) / 32767.0) ** 2)))
    assert abs(rms - 0.1) < 1e-3
    assert out.column("dur_ms")[0].as_py() == round(len(x) * 1000 / sr)
    # near-idempotence: a second pass applies gain ~= 1
    out2 = stage(out.select(["clip_id", "bytes"]))
    g2 = out2.column("gain_bp").to_pylist()[0]
    assert abs(g2 - 10000) <= 100  # within 1 % of unit gain


# ---------------------------------------------------------------- VAD segments


def _expected_segments(i: int) -> list[tuple[int, int]]:
    """Expected (start_ms, end_ms) per make_burst_clips construction."""
    if i % 17 == 0 or i % 19 == 0:
        return []
    k = 1 + i % 3
    burst = 240 + 20 * (i % 5)
    return [(120 + t * (burst + 400), 120 + t * (burst + 400) + burst) for t in range(k)]


def test_vad_segments_golden_burst_fixture():
    from schemasaurus_ray.audio import pcm_vad_segments
    from schemasaurus_ray.sources.fixtures import make_burst_clips

    n = 256
    clips = make_burst_clips(n)
    info = pcm_vad_segments(clips.column("bytes"))
    sr = clips.column("sr_hz").to_numpy()
    got: dict[int, list[tuple[int, int]]] = {i: [] for i in range(n)}
    for r, s, e in zip(info["row"], info["start"], info["end"]):
        got[int(r)].append((int(s * 1000 // sr[r]), int(e * 1000 // sr[r])))
    for i in range(n):
        assert got[i] == _expected_segments(i), i
        assert info["n_segments"][i] == len(_expected_segments(i)), i
        # i%17 (silence) takes precedence over i%19 (invalid) in the fixture
        assert info["valid"][i] == (i % 19 != 0 or i % 17 == 0), i


def test_vad_merge_and_minlen_semantics():
    from schemasaurus_ray.audio import pcm_vad_segments

    sr = 16000

    def clip(layout):
        parts = []
        for kind, ms in layout:
            nsmp = sr * ms // 1000
            if kind == "t":
                t = np.arange(nsmp) / sr
                parts.append((0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16))
            else:
                parts.append(np.zeros(nsmp, np.int16))
        return wav_encode(np.concatenate(parts), sr)

    col = pa.array(
        [
            clip([("s", 100), ("t", 300), ("s", 300), ("t", 400), ("s", 200)]),  # 2 segs
            clip([("t", 300), ("s", 100), ("t", 300)]),  # 100ms gap < 150 -> merged
            clip([("t", 100), ("s", 300), ("t", 50)]),  # both under 200ms -> dropped
            clip([("s", 500)]),  # silent
            b"notawav",  # invalid
        ],
        pa.binary(),
    )
    info = pcm_vad_segments(col)
    assert info["n_segments"].tolist() == [2, 1, 0, 0, 0]
    assert info["valid"].tolist() == [True, True, True, True, False]
    ms = [
        (int(s * 1000 // srr), int(e * 1000 // srr))
        for s, e, srr in zip(info["start"], info["end"], info["sr"])
    ]
    assert ms == [(100, 400), (700, 1100), (0, 700)]


def test_vad_chunked_and_unaligned_paths_agree():
    from schemasaurus_ray.audio import pcm_vad_segments
    from schemasaurus_ray.sources.fixtures import make_burst_clips

    clips = make_burst_clips(48)
    base = pcm_vad_segments(clips.column("bytes"))
    # tiny chunk forces many chunk rounds (largest clip ~2s @44.1k > 2048)
    small = pcm_vad_segments(clips.column("bytes"), chunk=2048)
    for key in ("row", "start", "end", "sr", "n_segments"):
        np.testing.assert_array_equal(base[key], small[key], err_msg=key)
    # odd-length first blob shifts every later data section to odd byte
    # offsets in the value buffer -> the gather (unaligned) path
    blobs = clips.column("bytes").to_pylist()
    col = pa.array([b"x" * 21, *blobs], pa.binary())
    un = pcm_vad_segments(col)
    assert not un["valid"][0]
    np.testing.assert_array_equal(un["row"] - 1, base["row"])
    np.testing.assert_array_equal(un["start"], base["start"])
    np.testing.assert_array_equal(un["end"], base["end"])
    np.testing.assert_array_equal(un["n_segments"][1:], base["n_segments"])


def test_segment_stage_bytes_roundtrip():
    from schemasaurus_ray.functions.multimodal import AudioSegmentStage
    from schemasaurus_ray.sources.fixtures import make_burst_clips

    clips = make_burst_clips(40)
    out = AudioSegmentStage()(clips)
    assert out.column_names == [
        "clip_id", "seg_no", "start_ms", "end_ms", "dur_ms", "sr_hz", "bytes",
    ]
    ids = clips.column("clip_id").to_pylist()
    by_id = {ids[i]: i for i in range(clips.num_rows)}
    seen: dict[str, int] = {}
    for r in range(out.num_rows):
        cid = out.column("clip_id")[r].as_py()
        i = by_id[cid]
        seg_no = out.column("seg_no")[r].as_py()
        assert seg_no == seen.get(cid, 0)
        seen[cid] = seg_no + 1
        s_ms = out.column("start_ms")[r].as_py()
        e_ms = out.column("end_ms")[r].as_py()
        assert (s_ms, e_ms) == _expected_segments(i)[seg_no]
        pcm, sr = wav_decode(clips.column("bytes")[i].as_py())
        seg_pcm, seg_sr = wav_decode(out.column("bytes")[r].as_py())
        assert seg_sr == sr
        np.testing.assert_array_equal(
            seg_pcm, pcm[s_ms * sr // 1000 : e_ms * sr // 1000]
        )
    assert sum(seen.values()) > 0


def test_segment_audio_clips_query(ray_session):
    from schemasaurus_ray.pipelines.queries import segment_audio_clips

    out = segment_audio_clips("/root/testdata/sf0.001")
    expected_total = sum(len(_expected_segments(i)) for i in range(512))
    assert out.num_rows == expected_total
    assert out.column_names == ["clip_id", "seg_no", "start_ms", "end_ms", "dur_ms", "sr_hz"]


def test_vad_segments_match_per_row_reference():
    """pcm_vad_segments (vectorized flat-chunk path) vs an independent
    per-clip pure-Python reference on random layouts, including clips
    shorter than one frame, bursts touching clip edges, and sub-threshold
    noise floors."""
    from schemasaurus_ray.audio import pcm_vad_segments

    frame_ms, thresh_db, min_sil, min_seg = 20, -35.0, 150, 200
    rng = np.random.default_rng(3)

    def ref_segments(blob):
        try:
            x, sr = wav_decode(blob)
        except ValueError:
            return None
        if len(x) == 0:
            return None
        fs = max(sr * frame_ms // 1000, 1)
        nf = -(-len(x) // fs)
        env = np.array(
            [np.abs(x[f * fs : min((f + 1) * fs, len(x))].astype(np.int64)).mean() for f in range(nf)]
        )
        thr = max(env.max() * 10 ** (thresh_db / 20.0), 1.0)
        active = env >= thr
        runs = []
        f = 0
        while f < nf:
            if active[f]:
                g = f
                while g + 1 < nf and active[g + 1]:
                    g += 1
                runs.append([f * fs, min((g + 1) * fs, len(x))])
                f = g + 1
            else:
                f += 1
        merged = []
        for r in runs:
            if merged and (r[0] - merged[-1][1]) * 1000 < min_sil * sr:
                merged[-1][1] = r[1]
            else:
                merged.append(r)
        return [(s, e) for s, e in merged if (e - s) * 1000 >= min_seg * sr]

    blobs = []
    for i in range(120):
        sr = int(rng.choice([8000, 16000, 22050, 44100]))
        n_samp = int(rng.integers(1, sr * 2))
        x = np.zeros(n_samp, dtype=np.int16)
        # random bursts with random amplitude; random noise floor
        for _ in range(int(rng.integers(0, 4))):
            a = int(rng.integers(0, n_samp))
            b = min(n_samp, a + int(rng.integers(1, sr)))
            amp = float(rng.uniform(0.05, 0.9))
            t = np.arange(b - a) / sr
            x[a:b] = (amp * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
        if rng.random() < 0.5:
            x = (x + rng.normal(0, rng.uniform(0, 200), size=n_samp)).clip(-32768, 32767).astype(np.int16)
        blobs.append(wav_encode(x, sr))
    col = pa.array(blobs, pa.binary())
    info = pcm_vad_segments(
        col, frame_ms=frame_ms, thresh_db=thresh_db,
        min_silence_ms=min_sil, min_segment_ms=min_seg,
    )
    got: dict[int, list[tuple[int, int]]] = {i: [] for i in range(len(blobs))}
    for r, s, e in zip(info["row"], info["start"], info["end"]):
        got[int(r)].append((int(s), int(e)))
    for i, blob in enumerate(blobs):
        expect = ref_segments(blob) or []
        assert got[i] == expect, (i, got[i], expect)


def test_augment_stage_invariants():
    from schemasaurus_ray.functions.multimodal import AudioAugmentStage

    x = synth_samples(3, 16000, 500)
    batch = pa.table(
        {
            "clip_id": pa.array(["a", "b"], pa.string()),
            "bytes": pa.array([wav_encode(x, 16000), b"junk"], pa.binary()),
        }
    )
    stage = AudioAugmentStage(variants=[(1.0, 0.0), (0.9, 0.0), (1.0, -6.0)])
    out = stage(batch)
    # invalid blob yields zero rows; valid clip yields one row per variant
    assert out.column("clip_id").to_pylist() == ["a", "a", "a"]
    by_v = {out.column("variant")[i].as_py(): i for i in range(out.num_rows)}
    # identity variant: bit-identical payload
    ident = out.column("bytes")[by_v["s1_g0"]].as_py()
    assert ident == wav_encode(x, 16000)
    # speed 0.9: duration scales by 1/0.9
    y, sr = wav_decode(out.column("bytes")[by_v["s0.9_g0"]].as_py())
    assert sr == 16000
    assert abs(len(y) - round(len(x) / 0.9)) <= 1
    assert out.column("dur_ms")[by_v["s0.9_g0"]].as_py() == round(len(y) * 1000 / sr)
    # gain -6 dB: RMS halves (within int16 quantization)
    g, _ = wav_decode(out.column("bytes")[by_v["s1_g-6"]].as_py())
    r0 = np.sqrt(np.mean(x.astype(np.float64) ** 2))
    r1 = np.sqrt(np.mean(g.astype(np.float64) ** 2))
    assert abs(r1 / r0 - 10 ** (-6 / 20)) < 0.01


def test_pcm_segment_hash_rows_bruteforce():
    """Segment hashes vs a per-clip numpy brute force: equal hash ⇔ equal
    int16 sequence on the non-overlapping grid; permuted/shifted content
    and tail remainders never collide; invalid blobs contribute nothing."""
    from schemasaurus_ray.functions.audio_fp import pcm_segment_hash_rows

    seg = 64
    rng = np.random.default_rng(3)
    jingle = rng.integers(-20000, 20000, 3 * seg).astype(np.int16)
    a = np.concatenate([jingle, rng.integers(-100, 100, 2 * seg + 17).astype(np.int16)])
    b = np.concatenate([jingle, rng.integers(-100, 100, seg).astype(np.int16)])
    # c contains the jingle OFF the segment grid (shifted by 5 samples):
    # the non-overlapping grid must NOT match it (documented semantics)
    c = np.concatenate([np.zeros(5, np.int16), jingle, np.zeros(seg, np.int16)])
    # d: a's second segment with two samples SWAPPED (same multiset of
    # values) — position mixing must keep it distinct
    d = a[seg : 2 * seg].copy()
    d[0], d[-1] = d[-1], d[0]
    blobs = [
        wav_encode(a, 16000),
        wav_encode(b, 16000),
        wav_encode(c, 16000),
        wav_encode(d, 16000),
        None,
        b"not a wav",
        wav_encode(np.zeros(seg - 1, np.int16), 8000),  # shorter than one segment
    ]
    keys = np.arange(len(blobs), dtype=np.int64) * 10
    col = pa.chunked_array([pa.array(blobs, pa.large_binary())])
    wh, ck = pcm_segment_hash_rows(col, keys, seg_samples=seg)

    # brute force: hash identity == segment-content identity
    segs = {}
    for i, x in enumerate([a, b, c, d]):
        for s in range(len(x) // seg):
            segs.setdefault(x[s * seg : (s + 1) * seg].tobytes(), []).append(keys[i])
    got_by_key = {}
    for h, k in zip(wh.tolist(), ck.tolist()):
        got_by_key.setdefault(k, []).append(h)
    # per-clip segment counts match the brute force
    expect_counts = {keys[i]: len(x) // seg for i, x in enumerate([a, b, c, d])}
    assert {k: len(v) for k, v in got_by_key.items()} == expect_counts
    # group hashes: equal contents (a/b share jingle segments) share hashes
    pairs = list(zip(wh.tolist(), ck.tolist()))
    # rebuild per (clip, seg_index) in order: emission order is clip order
    per_clip = {}
    for h, k in pairs:
        per_clip.setdefault(k, []).append(h)
    for s in range(3):  # the three jingle segments
        assert per_clip[0][s] == per_clip[10][s]
    # c's grid-shifted jingle and d's swapped segment match nothing of a
    assert not set(per_clip[20]) & set(per_clip[0])
    assert not set(per_clip[30]) & set(per_clip[0])
    # distinct contents ⇒ distinct hashes within the whole emission
    uniq_contents = len(segs)
    assert len(set(wh.tolist())) == uniq_contents


def test_audio_decontaminate_segments_planted_golden(ray_session):
    """Audio segment-level decontamination: the planted zdec_ copies of
    benchmark clips (well-formed ids ending '3') are the ONLY training
    clips sharing segments with the eval set, each reporting exactly
    floor(decodable_samples/1024) leaked segments — recomputed per clip
    from wav_decode (independent brute force). Benchmark clips themselves
    are never reported."""
    import glob as glob_
    import os
    import re

    import pyarrow.parquet as pq

    from schemasaurus_ray.pipelines.queries import (
        _audio_fixture,
        audio_decontaminate_segments_clips,
    )

    out = audio_decontaminate_segments_clips("unused-sfdir")
    got = dict(
        zip(out.column("clip_id").to_pylist(), out.column("n_leaked_segments").to_pylist())
    )
    fix = _audio_fixture()
    expect = {}
    for p in sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))):
        t = pq.read_table(p, columns=["clip_id", "bytes"])
        for cid, blob in zip(t.column("clip_id").to_pylist(), t.column("bytes").to_pylist()):
            cid = str(cid)
            if not (cid.endswith("3") and re.match(r"^clip-", cid)) or blob is None:
                continue
            try:
                x, _sr = wav_decode(blob)
            except Exception:
                continue
            n = len(x) // 1024
            if n > 0:
                expect["zdec_" + cid] = n
    assert got == expect
    assert len(expect) > 100  # ~1/10 of 2000 well-formed clips end in '3'
    assert not any(k.startswith("clip-") and k.endswith("3") for k in got)


def test_audio_repeated_segments_planted_golden(ray_session):
    """The planted whole-payload copies (ids ending '7' → zseg_ twin) are
    the ONLY cross-clip sharers in the fixture, and each pair reports
    exactly floor(decodable_samples/1024) shared segments on both sides —
    recomputed here per clip from wav_decode (independent brute force)."""
    import glob as glob_
    import os

    from schemasaurus_ray.pipelines.queries import (
        _audio_fixture,
        audio_repeated_segments_clips,
    )

    out = audio_repeated_segments_clips("unused-sfdir")
    got = dict(zip(out.column("clip_id").to_pylist(), out.column("n_dup_segments").to_pylist()))

    import pyarrow.parquet as pq

    fix = _audio_fixture()
    expect = {}
    for p in sorted(glob_.glob(os.path.join(fix, "clips", "*.parquet"))):
        t = pq.read_table(p, columns=["clip_id", "bytes"])
        for cid, blob in zip(t.column("clip_id").to_pylist(), t.column("bytes").to_pylist()):
            if not str(cid).endswith("7") or blob is None:
                continue
            try:
                x, _sr = wav_decode(blob)
            except Exception:
                continue
            n = len(x) // 1024
            if n > 0:
                expect[str(cid)] = n
                expect["zseg_" + str(cid)] = n
    assert got == expect
    assert len(expect) > 100  # the fixture plants ~200 pairs
