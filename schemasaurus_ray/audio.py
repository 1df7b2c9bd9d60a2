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
    """Vectorized conform UDF (engine analogue of the reference's conform
    hook, v4validator.js:355-373, receiving the whole batch as ctx.parent):
    each blob must be a well-formed WAV whose sample count matches
    sr_hz·dur_ms/1000 and whose header sr matches the sr_hz column.

    Fully vectorized: the 44-byte headers are gathered straight from the
    Arrow binary buffers with numpy fancy indexing — no per-row Python, no
    blob copies, no PCM materialization.
    """
    import pyarrow as pa

    from .util import single_chunk

    sr = np.asarray(single_chunk(batch.column("sr_hz")).cast(pa.int64()).fill_null(0))
    dur = np.asarray(single_chunk(batch.column("dur_ms")).cast(pa.int64()).fill_null(0))
    # single_chunk: combine_chunks would memcpy the whole audio payload
    # (85 ms / 110 MB batch) just to read 44-byte headers
    arr = single_chunk(bytes_col)
    if arr.type == pa.null():
        arr = pa.array([], pa.binary())
    n = len(arr)
    if n == 0:
        return np.ones(0, dtype=bool)
    t = arr.type
    off_dtype = np.int64 if pa.types.is_large_binary(t) else np.int32
    null_mask = np.zeros(n, dtype=bool)
    if arr.null_count and arr.buffers()[0] is not None:
        bits = np.unpackbits(
            np.frombuffer(arr.buffers()[0], dtype=np.uint8), bitorder="little"
        )
        null_mask = ~bits[arr.offset : arr.offset + n].astype(bool)
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    starts = offsets[:-1]
    lengths = offsets[1:] - starts
    long_enough = lengths >= HEADER_SIZE
    if len(data) < HEADER_SIZE:
        out = np.zeros(n, dtype=bool)
        out[null_mask] = True
        return out
    safe = np.where(long_enough, starts, 0)
    safe = np.minimum(safe, len(data) - HEADER_SIZE)

    def u32(at: int) -> np.ndarray:
        return (
            data[safe + at].astype(np.int64)
            | (data[safe + at + 1].astype(np.int64) << 8)
            | (data[safe + at + 2].astype(np.int64) << 16)
            | (data[safe + at + 3].astype(np.int64) << 24)
        )

    riff = (data[safe] == 0x52) & (data[safe + 1] == 0x49) & (data[safe + 2] == 0x46) & (data[safe + 3] == 0x46)
    wave = (data[safe + 8] == 0x57) & (data[safe + 9] == 0x41) & (data[safe + 10] == 0x56) & (data[safe + 11] == 0x45)
    hdr_sr = u32(24)
    data_len = u32(40)
    expected = (sr * dur // 1000) * 2
    ok = (
        long_enough
        & riff
        & wave
        & (hdr_sr == sr)
        & (data_len == expected)
        & (lengths >= HEADER_SIZE + data_len)
    )
    ok[null_mask] = True  # nulls handled by `required`, not conform
    return ok
