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
