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
