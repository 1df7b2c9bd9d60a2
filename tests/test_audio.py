"""WAV codec round-trip (vs stdlib wave), synthesis determinism, and the
per-row invariant vs reference data: decoded-PCM SNR ≥ 30 dB + transcript
equality (BASELINE.md 'per-row invariant')."""

import io
import wave

import numpy as np
import pyarrow as pa

from schemasaurus_ray.audio import (
    pcm_consistency,
    snr_db,
    synth_samples,
    wav_decode,
    wav_encode,
)
from schemasaurus_ray.sources.fixtures import make_clips, make_transcripts


def test_wav_roundtrip_matches_stdlib():
    samples = synth_samples(3, 16000, 250)
    blob = wav_encode(samples, 16000)
    # our decoder
    dec, sr = wav_decode(blob)
    assert sr == 16000
    assert np.array_equal(dec, samples)
    # stdlib wave agrees
    with wave.open(io.BytesIO(blob)) as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        raw = w.readframes(w.getnframes())
    assert np.array_equal(np.frombuffer(raw, dtype="<i2"), samples)


def test_synth_deterministic():
    a = synth_samples(7, 8000, 300)
    b = synth_samples(7, 8000, 300)
    assert np.array_equal(a, b)
    c = synth_samples(8, 8000, 300)
    assert not np.array_equal(a, c)


def test_snr():
    ref = synth_samples(1, 8000, 200)
    assert snr_db(ref, ref) == float("inf")
    noisy = ref + np.random.default_rng(0).integers(-50, 50, len(ref)).astype(np.int16)
    assert 30 < snr_db(noisy, ref) < 80
    assert snr_db(ref[:10], ref) == float("-inf")


def test_per_row_invariant_vs_reference():
    """Decoded PCM allclose (SNR>=30dB) + transcript equality for clean rows."""
    clips = make_clips(400, inject=False)
    tr = make_transcripts(clips)
    tr_map = dict(zip(tr.column("clip_id").to_pylist(), tr.column("transcript").to_pylist()))
    ids = clips.column("clip_id").to_pylist()
    blobs = clips.column("bytes").to_pylist()
    srs = clips.column("sr_hz").to_pylist()
    durs = clips.column("dur_ms").to_pylist()
    texts = clips.column("transcript").to_pylist()
    for i in range(0, 400, 37):
        dec, sr = wav_decode(blobs[i])
        assert sr == srs[i]
        ref = synth_samples(i, srs[i], durs[i])
        assert snr_db(dec, ref) >= 30
        if ids[i] in tr_map:
            assert tr_map[ids[i]] == texts[i]


def test_pcm_consistency_conform():
    clips = make_clips(2100, inject=True, with_audio=True)
    ok = pcm_consistency(clips.column("bytes"), clips)
    bad = np.nonzero(~ok)[0]
    # truncated rows at i % 2000 == 23
    assert set(bad) == {23, 2023}


def test_fixture_injection_counts():
    n = 2000
    clips = make_clips(n, inject=True, with_audio=False)
    t = clips.to_pydict()
    assert sum(1 for x in t["transcript"] if x is None) == len([i for i in range(n) if i % 500 == 7])
    assert t["codec"].count("mp3") == 2
    assert t["dur_ms"].count(0) == 2
    assert sum(1 for x in t["clip_id"] if x.startswith("CLIP_")) == 1
    # duplicate ids
    assert len(set(t["clip_id"])) == n - len([i for i in range(n) if i % 500 == 131])


def _loop_stats(blobs):
    """Reference per-row loop (the implementation pcm_segment_stats
    replaced) — ground truth for the vectorized parity test."""
    out = {k: [] for k in ("rms", "peak", "zcr", "measured_ms", "clip_ratio", "dc", "valid")}
    for blob in blobs:
        ok = False
        vals = dict.fromkeys(out, float("nan"))
        if blob is not None:
            try:
                pcm, sr = wav_decode(blob)
                if len(pcm) > 0:
                    ok = True
                    x = pcm.astype(np.float64) / 32768.0
                    vals["rms"] = float(np.sqrt(np.mean(x * x)))
                    vals["peak"] = float(np.abs(x).max())
                    vals["zcr"] = (
                        float(np.mean(np.abs(np.diff(np.signbit(pcm).astype(np.int8)))))
                        if len(pcm) > 1
                        else 0.0
                    )
                    vals["measured_ms"] = 1000.0 * len(pcm) / sr
                    vals["clip_ratio"] = float(np.mean(np.abs(pcm.astype(np.int64)) >= 32760))
                    vals["dc"] = float(np.mean(pcm.astype(np.float64))) / 32768.0
            except ValueError:
                pass
        vals["valid"] = ok
        for k, v in vals.items():
            out[k].append(v)
    return out


def _assert_stats_match(blobs):
    from schemasaurus_ray.audio import pcm_segment_stats

    got = pcm_segment_stats(pa.array(blobs, pa.binary()))
    ref = _loop_stats(blobs)
    assert got["valid"].tolist() == ref["valid"]
    for k in ("rms", "peak", "zcr", "measured_ms", "clip_ratio", "dc"):
        g, r = np.asarray(got[k]), np.asarray(ref[k], dtype=np.float64)
        m = ~np.isnan(r)
        assert (np.isnan(g) == ~m).all(), k
        assert np.allclose(g[m], r[m], rtol=1e-12, atol=1e-12), k


def test_pcm_segment_stats_parity():
    """Vectorized whole-batch stats ≡ per-row decode loop on fixture clips
    mixed with nulls, truncated and non-WAV blobs."""
    clips = make_clips(40, inject=False)
    blobs = clips.column("bytes").to_pylist()
    blobs[3] = None
    blobs[7] = blobs[7][:20]          # truncated header
    blobs[11] = b"not a wav at all"   # bad magic
    blobs[13] = blobs[13][:60]        # header ok, data section truncated
    _assert_stats_match(blobs)


def test_pcm_segment_stats_odd_alignment():
    """An odd-length garbage blob misaligns every later clip's data section
    in the Arrow value buffer — the gather fallback must produce identical
    stats (the zero-copy int16 view would be undefined there)."""
    clips = make_clips(6, inject=False)
    blobs = clips.column("bytes").to_pylist()
    blobs.insert(0, b"\x01\x02\x03")  # 3 bytes: every later offset is odd
    _assert_stats_match(blobs)


def test_pcm_segment_stats_edge_clips():
    """Single-sample clip (zcr=0), all-clipped clip, pure-DC clip."""
    one = wav_encode(np.array([1000], np.int16), 8000)
    clipped = wav_encode(np.full(100, 32767, np.int16), 8000)
    dc = wav_encode(np.full(50, 1600, np.int16), 16000)
    _assert_stats_match([one, clipped, dc])
    from schemasaurus_ray.audio import pcm_segment_stats

    st = pcm_segment_stats(pa.array([one, clipped, dc], pa.binary()))
    assert st["zcr"][0] == 0.0
    assert st["clip_ratio"][1] == 1.0
    assert abs(st["dc"][2] - 1600 / 32768) < 1e-12


def test_audio_quality_stage():
    from schemasaurus_ray.functions.multimodal import AudioQualityStage

    silent = wav_encode(np.zeros(400, np.int16), 8000)
    loud = wav_encode(np.full(400, 32767, np.int16), 8000)
    normal = wav_encode(synth_samples(1, 16000, 100), 16000)
    t = pa.table(
        {
            "clip_id": pa.array(["a", "b", "c", "d"], pa.string()),
            "bytes": pa.array([silent, loud, normal, None], pa.binary()),
        }
    )
    out = AudioQualityStage()(t)
    assert out.column("decodable").to_pylist() == [True, True, True, False]
    assert out.column("silence").to_pylist() == [True, False, False, False]
    assert out.column("clip_bp").to_pylist() == [0, 10000, 0, None]
    assert out.column("dc_bp").to_pylist()[0] == 0


def test_pcm_spectral_stats_golden_and_parity():
    """The batched-rFFT kernel recovers each fixture sine's frequency to one
    bin, matches a slow per-clip reference exactly, and NaNs invalid blobs."""
    from schemasaurus_ray.audio import pcm_spectral_stats, wav_decode

    blobs, freqs, srs = [], [], []
    for i in range(40):
        sr = [8000, 16000, 22050][i % 3]
        f = 200.0 + (i % 37) * 20.0
        blobs.append(wav_encode(synth_samples(i, sr, 600), sr))
        freqs.append(f)
        srs.append(sr)
    blobs += [None, b"not a wav", wav_encode(np.zeros(0, np.int16), 8000)]
    col = pa.chunked_array([pa.array(blobs, pa.binary())])
    res = pcm_spectral_stats(col)

    for i in range(40):
        assert abs(res["peak_hz"][i] - freqs[i]) <= srs[i] / 512 + 1e-9
    assert not res["valid"][40:].any()
    assert np.isnan(res["peak_hz"][40:]).all()
    assert np.isnan(res["centroid_hz"][40:]).all()
    # flatness separates tones from noise by an order of magnitude
    assert np.nanmax(res["flatness"][:40]) < 0.25

    frame, max_frames = 512, 8
    win = np.hanning(frame).astype(np.float32)
    bins = np.arange(frame // 2 + 1, dtype=np.float32)
    for i in (0, 7, 23, 39):
        x, sr = wav_decode(blobs[i])
        ns = len(x)
        nf = min(max(ns // frame, 1), max_frames)
        span = max(ns - frame, 0)
        pk, cs, rs = [], [], []
        for j in range(nf):
            st = (j * span) // max(nf - 1, 1)
            seg = x[st : st + frame].astype(np.float32)
            if len(seg) < frame:
                seg = np.pad(seg, (0, frame - len(seg)))
            p = np.abs(np.fft.rfft(seg * win)) ** 2
            tot = max(p.sum(), 1e-20)
            pk.append(float(np.argmax(p)))
            cs.append(float((p.astype(np.float32) @ bins) / tot))
            rs.append(float((np.cumsum(p) < 0.85 * tot).sum()))
        hz = sr / frame
        assert np.isclose(res["peak_hz"][i], np.mean(pk) * hz, rtol=1e-6)
        assert np.isclose(res["centroid_hz"][i], np.mean(cs) * hz, rtol=1e-3)
        assert np.isclose(res["rolloff_hz"][i], np.mean(rs) * hz, rtol=1e-6)


def test_audio_spectral_stage_nulls_and_schema():
    from schemasaurus_ray.functions.multimodal import AudioSpectralStage

    clips = make_clips(64, with_audio=True, inject=True)
    out = AudioSpectralStage()(clips)
    assert out.column_names == ["clip_id", "peak_hz", "centroid_hz", "rolloff_hz", "flatness_bp"]
    fb = [v for v in out.column("flatness_bp").to_pylist() if v is not None]
    assert fb and all(0 <= v <= 10000 for v in fb)
    assert max(fb) < 3000  # fixture clips are sine-dominated, not noise
    assert out.num_rows == 64
    # every decodable clip got a finite dominant frequency
    peaks = out.column("peak_hz")
    assert peaks.null_count < 64
    vals = [v for v in peaks.to_pylist() if v is not None]
    assert all(0 <= v <= 48000 for v in vals)


def test_speech_rate_clips_golden(ray_session):
    """Engine speech-rate violations ≡ an independent driver-side
    recomputation (single pyarrow join + the same thresholds) over the
    SAME fixture — the non-SQL second path the audio queries use."""
    import glob
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from schemasaurus_ray.pipelines import queries as q

    got = q.speech_rate_clips("unused")
    fix = q._audio_fixture()
    clips = pa.concat_tables(
        [
            pq.read_table(f, columns=["clip_id", "dur_ms"])
            for f in sorted(glob.glob(os.path.join(fix, "clips", "*.parquet")))
        ]
    )
    tr = pa.concat_tables(
        [
            pq.read_table(f, columns=["clip_id", "transcript"])
            for f in sorted(glob.glob(os.path.join(fix, "transcripts", "*.parquet")))
        ]
    )
    j = clips.join(tr, keys=["clip_id"], join_type="inner")
    toks = np.asarray(
        pc.count_substring_regex(j.column("transcript"), r"\S+")
        .combine_chunks()
        .cast(pa.int64())
        .fill_null(-1)
    )
    dur = np.asarray(j.column("dur_ms").combine_chunks().cast(pa.int64()))
    known = toks >= 0
    rate = (toks * 1_000_000) // np.maximum(dur, 1)
    undef = known & (dur <= 0)
    low = known & ~undef & (rate < 1500)
    high = known & ~undef & (rate > 8000)
    ids = np.asarray(j.column("clip_id").combine_chunks(), dtype=object)
    want = sorted(
        [(str(i), "speechRate.undefined", int(r)) for i, r in zip(ids[undef], rate[undef])]
        + [(str(i), "speechRate.low", int(r)) for i, r in zip(ids[low], rate[low])]
        + [(str(i), "speechRate.high", int(r)) for i, r in zip(ids[high], rate[high])]
    )
    got_rows = sorted(
        zip(
            got.column("clip_id").to_pylist(),
            got.column("code").to_pylist(),
            got.column("rate_milli").to_pylist(),
        )
    )
    assert got_rows == want
    assert len(want) > 0  # fixture injections guarantee violations


def test_audio_dedup_clips_exact_golden(ray_session):
    """Removed == EVERY non-min member of an identical-payload group: the
    planted 'zdup_' copies of clips ending in '7' plus any organic
    byte-identical originals, recomputed here by an INDEPENDENT exact
    byte-equality pass (dict of raw payloads — no hashing, no Ray), so the
    engine's content-hash groupby-min is pinned against brute force."""
    import glob
    import os

    import pyarrow.parquet as pq

    from schemasaurus_ray.pipelines.queries import _audio_fixture, audio_dedup_clips

    out = audio_dedup_clips("/root/testdata/sf0.001")
    removed = out.column("removed_id").to_pylist()
    fix = _audio_fixture()
    rows: list[tuple[str, bytes]] = []
    for p in sorted(glob.glob(os.path.join(fix, "clips", "*.parquet"))):
        t = pq.read_table(p, columns=["clip_id", "bytes"])
        rows.extend(zip(t.column("clip_id").to_pylist(), t.column("bytes").to_pylist()))
    # replicate the planting (zdup_ copy per id ending in '7'), then group
    # by RAW payload bytes and drop everything but the min id per group
    rows.extend((f"zdup_{cid}", b) for cid, b in list(rows) if cid and cid.endswith("7"))
    groups: dict[bytes, list[str]] = {}
    for cid, b in rows:
        groups.setdefault(b, []).append(cid)
    expected = sorted(
        cid for members in groups.values() if len(members) > 1
        for cid in members if cid != min(members)
    )
    assert removed == expected and len(removed) > 0
    # the planted set is fully recovered, and the fixture's one organic
    # byte-identical pair is too — the old survivor-set path missed it
    assert all(f"zdup_{cid}" in removed for cid, _ in rows if cid and cid.endswith("7") and not cid.startswith("zdup_"))


def test_audio_curate_clips_matches_independent_predicates(ray_session):
    """Curation golden via an INDEPENDENT implementation: stdlib wave
    decode for validity/rms/clipping, plain python for the spec window and
    payload-dup survivorship — must equal the engine's kept set exactly."""
    import glob
    import io
    import os
    import tempfile
    import wave

    import numpy as np
    import pyarrow.parquet as pq

    from schemasaurus_ray.pipelines.queries import _audio_fixture, audio_curate_clips

    kept = audio_curate_clips("/root/testdata/sf0.001").column("clip_id").to_pylist()
    fix = _audio_fixture()
    rows = []
    for p in sorted(glob.glob(os.path.join(fix, "clips", "*.parquet"))):
        rows.extend(pq.read_table(p).to_pylist())
    seen_payloads: dict = {}
    expected = []
    for r in sorted(rows, key=lambda r: r["clip_id"]):
        first = seen_payloads.setdefault(r["bytes"], r["clip_id"])
        if first != r["clip_id"]:
            continue  # payload dup loses to min id
        if r["sr_hz"] not in (8000, 16000, 22050, 44100):
            continue
        if not (0 < r["dur_ms"] <= 60000):
            continue
        try:
            with wave.open(io.BytesIO(r["bytes"])) as w:
                frames = w.readframes(w.getnframes())
            s = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
            if len(s) == 0:
                continue
            rms = float(np.sqrt(np.mean(s * s)))
            clip_ratio = float(np.mean(np.abs(s * 32768.0) >= 32760))
        except Exception:
            continue
        if rms < 1e-3 or clip_ratio > 0.05:
            continue
        expected.append(r["clip_id"])
    assert kept == expected
    assert 0 < len(kept) < len(rows)  # predicates actually removed rows


def test_pcm_logmel_golden_and_parity():
    """The batched log-mel kernel: dominant mel band covers each fixture
    sine's frequency; matches a slow per-clip reference exactly; invalid
    blobs get nf=0 and a null feature row at the stage level."""
    import numpy as np

    from schemasaurus_ray.audio import (
        mel_filterbank,
        pcm_logmel,
        synth_samples,
        wav_decode,
        wav_encode,
    )

    blobs, freqs, srs = [], [], []
    for i in range(30):
        sr = [8000, 16000, 22050][i % 3]
        f = 200.0 + (i % 37) * 20.0
        blobs.append(wav_encode(synth_samples(i, sr, 600), sr))
        freqs.append(f)
        srs.append(sr)
    blobs += [None, b"not a wav"]
    col = pa.chunked_array([pa.array(blobs, pa.binary())])
    frame, n_mels, max_frames = 512, 24, 8
    r = pcm_logmel(col, frame=frame, n_mels=n_mels, max_frames=max_frames)
    assert r["valid"][:30].all() and not r["valid"][30:].any()
    assert (r["nf"][30:] == 0).all()
    assert r["feat"].shape == (int(r["nf"].sum()), n_mels)

    # dominant mel band contains the sine frequency (by filterbank support)
    offs = np.concatenate([[0], np.cumsum(r["nf"])])
    for i in range(30):
        fb = mel_filterbank(srs[i], frame, n_mels)
        fbin = int(round(freqs[i] / (srs[i] / frame)))
        covering = set(np.nonzero(fb[:, fbin] > 0)[0].tolist())
        clip_feat = r["feat"][offs[i] : offs[i + 1]]
        assert int(np.argmax(clip_feat.mean(axis=0))) in covering

    # exact parity vs a per-clip reference
    win = np.hanning(frame).astype(np.float32)
    for i in (0, 11, 29):
        x, sr = wav_decode(blobs[i])
        ns = len(x)
        nf = min(max(ns // frame, 1), max_frames)
        span = max(ns - frame, 0)
        fb = mel_filterbank(sr, frame, n_mels)
        ref = []
        for j in range(nf):
            st = (j * span) // max(nf - 1, 1)
            seg = x[st : st + frame].astype(np.float32)
            if len(seg) < frame:
                seg = np.pad(seg, (0, frame - len(seg)))
            p = np.abs(np.fft.rfft(seg * win)).astype(np.float32) ** 2
            ref.append(np.log10(np.maximum(p @ fb.T, 1e-10)))
        ref = np.stack(ref)
        got = r["feat"][offs[i] : offs[i + 1]]
        assert np.allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_audio_logmel_stage_and_cmvn_partials():
    import numpy as np

    from schemasaurus_ray.audio import synth_samples, wav_encode
    from schemasaurus_ray.functions.multimodal import (
        AudioLogMelStage,
        logmel_moment_partials,
    )

    blobs = [wav_encode(synth_samples(i, 16000, 300), 16000) for i in range(5)]
    blobs.append(None)
    batch = pa.table(
        {
            "clip_id": pa.array([f"c{i}" for i in range(6)], pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
        }
    )
    stage = AudioLogMelStage(n_mels=24, max_frames=4)
    out = stage(batch)
    assert out.column_names == ["clip_id", "n_frames", "n_mels", "logmel"]
    assert out.column("logmel").null_count == 1
    nf = out.column("n_frames").to_pylist()
    assert nf[5] == 0 and all(v > 0 for v in nf[:5])
    lens = [len(x) if x is not None else 0 for x in out.column("logmel").to_pylist()]
    assert lens[:5] == [v * 24 for v in nf[:5]]
    parts = logmel_moment_partials(out, 24)
    assert parts.column("mel_bin").to_pylist() == list(range(24))
    assert parts.column("n").to_pylist() == [sum(nf)] * 24
    # moments match a direct computation over the same flat features
    flat = np.asarray(out.column("logmel").combine_chunks().flatten(), dtype=np.float64)
    mat = flat.reshape(-1, 24)
    assert np.allclose(np.asarray(parts.column("s1")), mat.sum(axis=0))
    assert np.allclose(np.asarray(parts.column("s2")), (mat * mat).sum(axis=0))


def test_pcm_pitch_stats_golden():
    """Autocorrelation f0 recovers each fixture sine within 4% wherever
    sr ≥ 8 kHz (octave guard + parabolic refinement + unbiased autocorr);
    invalid blobs are NaN; sr=3000 high-f0 clips (under 5 samples/period)
    are allowed to fail only toward a subharmonic (f/k)."""
    from schemasaurus_ray.audio import pcm_pitch_stats

    blobs, freqs, srs = [], [], []
    for i in range(60):
        sr = [8000, 16000, 44100, 3000][i % 4]
        f = 200.0 + (i % 37) * 20.0
        blobs.append(wav_encode(synth_samples(i, sr, 700), sr))
        freqs.append(f)
        srs.append(sr)
    blobs += [None, b"not a wav"]
    res = pcm_pitch_stats(pa.chunked_array([pa.array(blobs, pa.binary())]))
    for i in range(60):
        f0 = res["f0_hz"][i]
        assert res["valid"][i] and np.isfinite(f0), i
        assert res["voiced_ratio"][i] >= 0.75, i
        rel = abs(f0 - freqs[i]) / freqs[i]
        if srs[i] >= 8000:
            assert rel < 0.04, (i, srs[i], freqs[i], f0)
        else:
            # subharmonic escape only: f0 ≈ f/k for integer k
            k = freqs[i] / f0
            assert abs(k - round(k)) < 0.06, (i, freqs[i], f0)
    assert not res["valid"][60:].any()
    assert np.isnan(res["f0_hz"][60:]).all()


def test_audio_pitch_stage_schema_and_nulls():
    from schemasaurus_ray.functions.multimodal import AudioPitchStage

    clips = make_clips(64, with_audio=True, inject=True)
    out = AudioPitchStage()(clips)
    assert out.column_names == ["clip_id", "f0_mhz", "voiced_bp"]
    assert out.num_rows == 64
    vals = [v for v in out.column("f0_mhz").to_pylist() if v is not None]
    assert vals and all(50_000 <= v <= 1_100_000 for v in vals)  # 50–1100 Hz
    bps = [v for v in out.column("voiced_bp").to_pylist() if v is not None]
    assert all(0 <= v <= 10000 for v in bps)


def test_audio_corpus_inventory_golden(ray_session):
    """Engine inventory ≡ per-clip wav_decode recomputation over the same
    fixture shards (the non-SQL second path)."""
    import glob
    import os
    from collections import defaultdict

    import pyarrow.parquet as pq

    from schemasaurus_ray.audio import wav_decode
    from schemasaurus_ray.pipelines import queries as q

    got = q.audio_corpus_inventory("unused")
    fix = q._audio_fixture()
    exp = defaultdict(lambda: [0, 0, 0, 0])  # n, dec, samples, mismatch
    for p in glob.glob(os.path.join(fix, "clips", "*.parquet")):
        t = pq.read_table(p, columns=["bytes", "sr_hz", "dur_ms"])
        for blob, sr, dur in zip(
            t.column("bytes").to_pylist(),
            t.column("sr_hz").to_pylist(),
            t.column("dur_ms").to_pylist(),
        ):
            e = exp[int(sr)]
            e[0] += 1
            try:
                x, hsr = wav_decode(blob)
            except Exception:
                continue
            if len(x) == 0:  # engine's decodable = eff_len > 0 (≥1 sample)
                continue
            e[1] += 1
            e[2] += len(x)
            if abs(1000.0 * len(x) / hsr - dur) > 1.0:
                e[3] += 1
    rows = {
        int(r["sr_hz"]): [
            int(r["n_clips"]),
            int(r["n_decodable"]),
            int(r["total_samples"]),
            int(r["n_mismatch"]),
        ]
        for r in got.to_pylist()
    }
    assert rows == {k: list(v) for k, v in exp.items()}


def test_pcm_time_stretch_invariants():
    """Period-synchronized OLA: duration scales by 1/rate, the
    fundamental does NOT move (cross-validated by the independent pitch
    kernel), amplitude is preserved by coherent overlap."""
    from schemasaurus_ray.audio import pcm_pitch_stats, pcm_time_stretch

    for i, sr in ((5, 16000), (2, 44100), (10, 8000), (31, 22050)):
        x = synth_samples(i, sr, 700).astype(np.float64)
        f_exp = 200.0 + (i % 37) * 20.0
        for rate in (0.9, 1.1, 1.25):
            y = pcm_time_stretch(x, rate)
            assert abs(len(y) - round(len(x) / rate)) <= 1, (i, rate)
            blob = wav_encode(np.clip(np.rint(y), -32768, 32767).astype(np.int16), sr)
            st = pcm_pitch_stats(pa.array([blob], pa.binary()))
            assert abs(st["f0_hz"][0] - f_exp) / f_exp < 0.03, (i, sr, rate, st["f0_hz"][0])
            rms_ratio = np.sqrt((y**2).mean()) / np.sqrt((x**2).mean())
            assert 0.9 < rms_ratio < 1.1, (i, rate, rms_ratio)


def test_pcm_time_stretch_short_and_noise():
    from schemasaurus_ray.audio import pcm_time_stretch

    rng = np.random.default_rng(3)
    # unvoiced (noise) falls back to unsnapped grains and still stretches
    noise = rng.standard_normal(8000) * 1000
    y = pcm_time_stretch(noise, 1.25)
    assert abs(len(y) - 6400) <= 1
    # shorter than one frame: zero-padded copy at the target length
    y2 = pcm_time_stretch(noise[:300], 2.0)
    assert len(y2) == 512 and (y2[:150] == noise[:150]).all()


def test_audio_tempo_stage_fanout():
    from schemasaurus_ray.functions.multimodal import AudioTempoStage

    clips = make_clips(48, with_audio=True, inject=True)
    out = AudioTempoStage()(clips)
    assert out.column_names == ["clip_id", "rate_pct", "bytes", "sr_hz", "dur_ms"]
    # every decodable clip yields exactly len(rates) rows, invalid zero
    per = {}
    for cid in out.column("clip_id").to_pylist():
        per[cid] = per.get(cid, 0) + 1
    assert per and all(v == 2 for v in per.values())
    assert set(out.column("rate_pct").to_pylist()) == {90, 110}


def test_pcm_denoise_golden():
    """Identity when nothing is subtracted; on gated signal + noise the
    ON-region SNR improves and OFF-region noise power drops; the
    noise-floor estimate tracks the injected level within 10%."""
    from schemasaurus_ray.audio import pcm_denoise

    rng = np.random.default_rng(7)
    x = rng.standard_normal(4000) * 1000
    y, _ = pcm_denoise(x, beta=0.0, floor=1.0)
    assert np.abs(y - x).max() < 1e-9  # exact COLA reconstruction

    sr = 16000
    t = np.arange(sr) / sr
    gate = np.zeros(sr)
    gate[4000:9000] = 1.0
    clean = 8000 * np.sin(2 * np.pi * 300 * t) * gate
    noisy = clean + 1500 * rng.standard_normal(sr)
    den, nrms = pcm_denoise(noisy)

    def snr(a, sl):
        e = a[sl] - clean[sl]
        return 10 * np.log10((clean[sl] ** 2).mean() / (e**2).mean())

    on = slice(4500, 8500)
    off = slice(10000, 15000)
    assert snr(den, on) > snr(noisy, on) + 3.0
    assert (den[off] ** 2).mean() < 0.5 * (noisy[off] ** 2).mean()
    assert abs(nrms - 1500 / 32768) / (1500 / 32768) < 0.10
    # short clip: untouched
    y2, n2 = pcm_denoise(x[:600])
    assert np.array_equal(y2, x[:600]) and n2 == 0.0


def test_pcm_denoise_matches_independent_reimplementation():
    """The vectorized spectral-subtraction kernel (one batched rfft/irfft
    round, flat overlap-add) vs an INDEPENDENT per-frame reference built
    straight from the definition: python loop over frames, per-frame DFT,
    manual linear-interpolated quantile for the per-bin floor, per-sample
    overlap-add with coverage normalization, and the quiet-frame
    noise-floor estimate — output samples allclose and noise_rms equal
    (VERDICT r3 next-round #8: denoise pinned both ways)."""
    from schemasaurus_ray.audio import pcm_denoise

    def quantile_linear(sorted_vals, q):
        # classic linear interpolation: h = (n-1)q
        n = len(sorted_vals)
        h = (n - 1) * q
        lo = int(np.floor(h))
        hi = min(lo + 1, n - 1)
        return sorted_vals[lo] + (h - lo) * (sorted_vals[hi] - sorted_vals[lo])

    def reference(x, frame=512, noise_q=0.10, beta=1.5, floor=0.05):
        n = len(x)
        hop = frame // 2
        if n < 2 * frame:
            return x.astype(np.float64).copy(), 0.0
        nf = (n - frame) // hop + 1
        w = np.hanning(frame + 1)[:frame]  # periodic Hann == 0.5-0.5cos(2πk/N)
        frames, specs = [], []
        for f in range(nf):
            seg = x[f * hop : f * hop + frame] * w
            frames.append(seg)
            specs.append(np.fft.rfft(seg))
        mags = np.array([np.abs(s) for s in specs])
        noise = np.array(
            [quantile_linear(np.sort(mags[:, b]), noise_q) for b in range(mags.shape[1])]
        )
        out = np.zeros(n + frame)
        cov = np.zeros(n + frame)
        for f in range(nf):
            mag = mags[f]
            new_mag = np.maximum(mag - beta * noise, floor * mag)
            y = np.fft.irfft(specs[f] * (new_mag / np.maximum(mag, 1e-12)), n=frame)
            out[f * hop : f * hop + frame] += y
            cov[f * hop : f * hop + frame] += w
        res = np.empty(n)
        for i in range(n):
            res[i] = out[i] / cov[i] if cov[i] > 0.5 else x[i]
        frame_pow = np.sort(np.array([(fr**2).mean() for fr in frames]))
        nrms = float(np.sqrt(quantile_linear(frame_pow, 0.25) / (w**2).mean()) / 32768.0)
        # samples whose coverage sits EXACTLY on the 0.5 fallback threshold
        # are branch-unstable across float summation orders — exclude them
        stable = np.abs(cov[:n] - 0.5) > 1e-9
        return res, nrms, stable

    rng = np.random.default_rng(11)
    sr = 16000
    t = np.arange(6000) / sr
    for sig in (
        4000 * np.sin(2 * np.pi * 250 * t) + 800 * rng.standard_normal(len(t)),
        1200 * rng.standard_normal(5000),
        np.concatenate([np.zeros(2000), 9000 * np.sin(2 * np.pi * 440 * t[:3000])])
        + 500 * rng.standard_normal(5000),
    ):
        got, got_n = pcm_denoise(sig)
        want, want_n, stable = reference(sig)
        assert stable.sum() > 0.99 * len(sig)  # knife-edge samples are rare
        assert np.allclose(got[stable], want[stable], atol=1e-8), "denoised samples diverge"
        assert abs(got_n - want_n) < 1e-12


def test_audio_denoise_stage_schema():
    from schemasaurus_ray.functions.multimodal import AudioDenoiseStage

    clips = make_clips(32, with_audio=True, inject=True)
    out = AudioDenoiseStage()(clips)
    assert out.column_names == ["clip_id", "bytes", "noise_bp"]
    assert out.num_rows == 32
    vals = [v for v in out.column("noise_bp").to_pylist() if v is not None]
    # fixture clips are CONTINUOUS 0.5-amplitude sines (+0.1 noise): with
    # no pauses the quiet-frame floor IS the clip rms ≈ √(0.5²/2 + 0.1²)
    # ≈ 0.364 full scale — the documented stationary-signal caveat
    assert vals and all(v == 0 or 3000 <= v <= 4200 for v in vals)  # 0 = short-clip passthrough


def test_container_sniff_unit():
    """Vectorized magic detection over crafted payloads — every label
    branch plus null/short/unknown edges (no Ray needed)."""
    import numpy as np
    import pyarrow as pa

    from schemasaurus_ray.audio import container_sniff, wav_encode

    wav = wav_encode(np.zeros(64, np.float64), 8000)
    blobs = [
        wav,                                        # RIFF….WAVE
        b"fLaC" + b"\x00" * 16,                     # flac
        b"OggS" + b"\x00" * 16,                     # ogg (opus container)
        b"ID3\x04" + b"\x00" * 16,                  # mp3 (ID3 tag)
        b"\xff\xfb\x90\x00" + b"\x00" * 16,         # mp3 (MPEG sync)
        b"RIFF1234AVI " + b"\x00" * 8,              # RIFF but not WAVE
        b"short",                                   # too short
        None,                                       # null
        b"\x00" * 32,                               # unrecognized
    ]
    got = container_sniff(pa.array(blobs, pa.binary())).tolist()
    assert got == [
        "wav", "flac", "ogg", "mp3", "mp3", "unknown", "unknown", "unknown", "unknown",
    ]
    # chunked input takes the combine path
    ch = pa.chunked_array([pa.array(blobs[:4], pa.binary()), pa.array(blobs[4:], pa.binary())])
    assert container_sniff(ch).tolist() == got


def test_audio_codec_sniff_golden(ray_session):
    """audio_codec_sniff_clips vs an independent per-row startswith
    reimplementation over the same fixture shards: identical (codec,
    sniffed, n) counts, and the fixture's declared-label injections
    (flac/opus labels over WAV payloads, plus the 1/1000 'mp3' enum
    violation) all surface as mismatches."""
    import glob
    import os
    from collections import Counter

    import pyarrow.parquet as pq

    from schemasaurus_ray.pipelines.queries import _audio_fixture, audio_codec_sniff_clips

    out = audio_codec_sniff_clips("unused")
    got = {
        (r["codec"], r["sniffed"]): (r["n"], r["mismatch"]) for r in out.to_pylist()
    }

    want: Counter = Counter()
    for p in sorted(glob.glob(os.path.join(_audio_fixture(), "clips", "*.parquet"))):
        t = pq.read_table(p, columns=["codec", "bytes"])
        for codec, blob in zip(t.column("codec").to_pylist(), t.column("bytes").to_pylist()):
            if blob is None or len(blob) < 12:
                s = "unknown"
            elif blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
                s = "wav"
            elif blob[:4] == b"fLaC":
                s = "flac"
            elif blob[:4] == b"OggS":
                s = "ogg"
            elif blob[:3] == b"ID3" or (blob[0] == 0xFF and (blob[1] & 0xE0) == 0xE0):
                s = "mp3"
            else:
                s = "unknown"
            want[(codec, s)] += 1
    assert {k: v[0] for k, v in got.items()} == dict(want)
    # the fixture's payloads are all WAV: every non-wav declaration mismatches
    for (codec, sniffed), (n, mism) in got.items():
        assert mism == (not (codec == sniffed or (codec == "opus" and sniffed == "ogg")))
    assert got[("wav", "wav")][1] is False
    assert any(m for (_, m) in got.values())


def test_audio_reference_parity_golden(ray_session):
    """audio_reference_parity_clips vs an independent per-row recompute
    over the same fixture shards (decode + re-synthesize + SNR, and a
    pandas merge for transcript pairs): every count must agree, and the
    known injections must surface — dur=0 rows undecodable, the truncated
    payload and the duplicate-id rows failing SNR parity, null-transcript
    rows unequal."""
    import glob
    import os
    import re

    import pandas as pd
    import pyarrow.parquet as pq

    from schemasaurus_ray.audio import snr_db, synth_samples, wav_decode
    from schemasaurus_ray.pipelines.queries import (
        _audio_fixture,
        audio_reference_parity_clips,
    )

    got = audio_reference_parity_clips("unused").to_pylist()[0]

    fix = _audio_fixture()
    idx_re = re.compile(r"(\d+)")
    n = dec = snr_pass = 0
    clip_rows = []
    for p in sorted(glob.glob(os.path.join(fix, "clips", "*.parquet"))):
        t = pq.read_table(p, columns=["clip_id", "bytes", "sr_hz", "dur_ms", "transcript"])
        for r in t.to_pylist():
            n += 1
            clip_rows.append((r["clip_id"], r["transcript"]))
            if r["bytes"] is None:
                continue
            try:
                pcm, _ = wav_decode(r["bytes"])
            except ValueError:
                continue
            if len(pcm) == 0:
                continue
            dec += 1
            m = idx_re.search(r["clip_id"] or "")
            if m and snr_db(pcm, synth_samples(int(m.group(1)), r["sr_hz"], r["dur_ms"])) >= 30:
                snr_pass += 1
    side = pq.read_table(
        os.path.join(fix, "transcripts", "shard-00000.parquet"),
        columns=["clip_id", "transcript"],
    ).to_pandas()
    cl = pd.DataFrame(clip_rows, columns=["clip_id", "transcript_clip"])
    merged = cl.merge(side, on="clip_id", how="inner")
    pairs = len(merged)
    equal = int((merged["transcript_clip"] == merged["transcript"]).sum())

    assert got == {
        "n_clips": n,
        "n_decodable": dec,
        "n_snr_pass": snr_pass,
        "n_transcript_pairs": pairs,
        "n_transcript_equal": equal,
    }
    # the injections are visible: some clips undecodable (dur=0), some
    # decodable clips fail parity (truncation + id stomps), some joined
    # transcripts unequal (nulls + id stomps)
    assert dec < n and snr_pass < dec and equal < pairs
