"""WAV PCM16 codec + audio conform rules — stdlib-only (no soundfile/scipy
in this sandbox, SURVEY.md §7 hard part (f)).

The WAV container is written/parsed directly (44-byte canonical RIFF header,
PCM16 mono) — byte-identical to what stdlib ``wave`` produces, and decodable
by it (test_audio.py verifies the round-trip).

These functions back:
- fixture synthesis (sources/fixtures.py): deterministic sine+noise clips;
- the ``custom.pcm`` conform rule: bytes ↔ (sr_hz, dur_ms) consistency;
- the per-row invariant vs reference data: decoded-PCM SNR ≥ 30 dB +
  transcript equality (BASELINE.md).
"""

from __future__ import annotations

import struct

import numpy as np

_HEADER = struct.Struct("<4sI4s4sIHHIIHH4sI")
HEADER_SIZE = 44


def wav_encode(samples: np.ndarray, sr_hz: int) -> bytes:
    """PCM16 mono WAV blob (canonical 44-byte header + little-endian data)."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    header = _HEADER.pack(
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sr_hz, sr_hz * 2, 2, 16,
        b"data", len(data),
    )
    return header + data


def wav_decode(blob: bytes) -> tuple[np.ndarray, int]:
    """→ (int16 samples, sr_hz). Raises ValueError on malformed input."""
    if len(blob) < HEADER_SIZE or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    (_, _, _, _, _, audio_fmt, n_ch, sr_hz, _, _, bits, _, data_len) = _HEADER.unpack(
        blob[:HEADER_SIZE]
    )
    if audio_fmt != 1 or n_ch != 1 or bits != 16:
        raise ValueError("only PCM16 mono supported")
    data = blob[HEADER_SIZE : HEADER_SIZE + data_len]
    return np.frombuffer(data, dtype="<i2"), sr_hz


def synth_samples(i: int, sr_hz: int, dur_ms: int, seed: int = 42) -> np.ndarray:
    """Deterministic clip content (FIXTURES.md F1): 0.5·sin(2π·f_i·t) +
    0.1·noise(PCG64(seed+i)), f_i = 200 + (i % 37)·20 Hz, PCM16-quantized."""
    n = int(sr_hz * dur_ms / 1000)
    f = 200.0 + (i % 37) * 20.0
    t = np.arange(n, dtype=np.float64) / sr_hz
    rng = np.random.Generator(np.random.PCG64(seed + i))
    x = 0.5 * np.sin(2 * np.pi * f * t) + 0.1 * rng.standard_normal(n)
    return np.clip(x * 32767.0, -32768, 32767).astype(np.int16)


def snr_db(decoded: np.ndarray, reference: np.ndarray) -> float:
    """Signal-to-noise ratio of decoded vs reference PCM in dB."""
    if len(decoded) != len(reference):
        return float("-inf")
    ref = reference.astype(np.float64)
    err = decoded.astype(np.float64) - ref
    p_sig = float(np.mean(ref**2))
    p_err = float(np.mean(err**2))
    if p_err == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_err)


def pcm_consistency(bytes_col, batch, *_args) -> np.ndarray:
    """Vectorized-ish conform UDF (engine analogue of the reference's conform
    hook, v4validator.js:355-373, receiving the whole batch as ctx.parent):
    each blob must be a well-formed WAV whose sample count matches
    sr_hz·dur_ms/1000 and whose header sr matches the sr_hz column.

    Per-row decode is unavoidable for opaque binary payloads, but only the
    44-byte header is parsed — O(1) per row, no PCM materialization.
    """
    import pyarrow as pa

    sr = batch.column("sr_hz").to_numpy(zero_copy_only=False)
    dur = batch.column("dur_ms").to_numpy(zero_copy_only=False)
    blobs = bytes_col.combine_chunks() if isinstance(bytes_col, pa.ChunkedArray) else bytes_col
    n = len(blobs)
    ok = np.zeros(n, dtype=bool)
    for i in range(n):
        blob = blobs[i].as_py()
        if blob is None:
            ok[i] = True  # nulls handled by `required`, not conform
            continue
        try:
            if len(blob) < HEADER_SIZE:
                continue
            hdr = _HEADER.unpack(blob[:HEADER_SIZE])
            hdr_sr, data_len = hdr[7], hdr[12]
            expected = int(sr[i] * dur[i] / 1000) * 2
            ok[i] = hdr_sr == sr[i] and data_len == expected and len(blob) >= HEADER_SIZE + data_len
        except (struct.error, ValueError):
            ok[i] = False
    return ok
