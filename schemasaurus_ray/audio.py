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


def _binary_buffers(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(data uint8, starts, lengths, null_mask) for an Arrow binary array —
    raw zero-copy views of the value buffer and offsets."""
    import pyarrow as pa

    n = len(arr)
    if arr.type == pa.null():
        return (
            np.zeros(0, np.uint8),
            np.zeros(n, np.int64),
            np.zeros(n, np.int64),
            np.ones(n, dtype=bool),
        )
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    null_mask = np.zeros(n, dtype=bool)
    if arr.null_count and arr.buffers()[0] is not None:
        bits = np.unpackbits(np.frombuffer(arr.buffers()[0], dtype=np.uint8), bitorder="little")
        null_mask = ~bits[arr.offset : arr.offset + n].astype(bool)
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    return data, offsets[:-1], offsets[1:] - offsets[:-1], null_mask


def container_sniff(bytes_col) -> "np.ndarray":
    """Container-format sniff of an Arrow binary column from file magic —
    the declared-codec-vs-actual-payload audit (a `codec` METADATA column
    is an assertion; the first bytes of the payload are the fact). Fully
    vectorized over the flat value buffer (no per-row Python): RIFF….WAVE
    → 'wav', fLaC → 'flac', OggS → 'ogg' (the Opus container), ID3 / MPEG
    sync → 'mp3', too-short/null/unrecognized → 'unknown'. Returns a
    numpy object array of per-row labels (feed pa.array(...))."""
    import pyarrow as pa

    arr = bytes_col.combine_chunks() if isinstance(bytes_col, pa.ChunkedArray) else bytes_col
    data, starts, lengths, null_mask = _binary_buffers(arr)
    n = len(lengths)
    out = np.full(n, "unknown", dtype=object)
    ok = (lengths >= 12) & ~null_mask
    if len(data) >= 12 and ok.any():
        safe = np.minimum(np.where(ok, starts, 0), len(data) - 12)

        def b(at: int) -> np.ndarray:
            return data[safe + at]

        riff = (
            (b(0) == 0x52) & (b(1) == 0x49) & (b(2) == 0x46) & (b(3) == 0x46)
            & (b(8) == 0x57) & (b(9) == 0x41) & (b(10) == 0x56) & (b(11) == 0x45)
        )
        flac = (b(0) == 0x66) & (b(1) == 0x4C) & (b(2) == 0x61) & (b(3) == 0x43)
        ogg = (b(0) == 0x4F) & (b(1) == 0x67) & (b(2) == 0x67) & (b(3) == 0x53)
        mp3 = ((b(0) == 0x49) & (b(1) == 0x44) & (b(2) == 0x33)) | (
            (b(0) == 0xFF) & ((b(1) & 0xE0) == 0xE0)
        )
        out[ok & riff] = "wav"
        out[ok & flac] = "flac"
        out[ok & ogg] = "ogg"
        out[ok & mp3 & ~riff & ~flac & ~ogg] = "mp3"
    return out


def _pcm_layout(arr):
    """Vectorized WAV-header parse for a whole Arrow binary array: returns
    ``(data, starts, lengths, sr, eff_len, valid)`` or None when nothing in
    the batch can be laid out (no blob reaches HEADER_SIZE). ``eff_len`` is
    the decodable PCM byte count per blob with ``wav_decode``'s truncation
    semantics (short data section truncates, rounded down to whole
    samples); ``valid`` matches decodability (RIFF/WAVE magic, PCM16 mono,
    sr > 0, non-empty data)."""
    data, starts, lengths, null_mask = _binary_buffers(arr)
    long_enough = (lengths >= HEADER_SIZE) & ~null_mask
    if len(data) < HEADER_SIZE or not long_enough.any():
        return None
    safe = np.where(long_enough, starts, 0)
    safe = np.minimum(safe, len(data) - HEADER_SIZE)

    def u16(at: int) -> np.ndarray:
        return data[safe + at].astype(np.int64) | (data[safe + at + 1].astype(np.int64) << 8)

    def u32(at: int) -> np.ndarray:
        return u16(at) | (u16(at + 2) << 16)

    magic = (
        (data[safe] == 0x52) & (data[safe + 1] == 0x49)  # RI
        & (data[safe + 2] == 0x46) & (data[safe + 3] == 0x46)  # FF
        & (data[safe + 8] == 0x57) & (data[safe + 9] == 0x41)  # WA
        & (data[safe + 10] == 0x56) & (data[safe + 11] == 0x45)  # VE
    )
    fmt_ok = (u16(20) == 1) & (u16(22) == 1) & (u16(34) == 16)  # PCM16 mono
    data_len = u32(40)
    sr = u32(24)
    # wav_decode slices blob[44 : 44+data_len] — a short data section
    # truncates rather than failing, so clamp to the available bytes and
    # round down to whole samples (decode-parity, not the stricter
    # pcm_consistency contract)
    eff_len = np.minimum(data_len, np.maximum(lengths - HEADER_SIZE, 0)) & ~np.int64(1)
    valid = long_enough & magic & fmt_ok & (sr > 0) & (eff_len > 0)
    return data, starts, lengths, sr, eff_len, valid


def pcm_segment_stats(bytes_col) -> dict[str, np.ndarray]:
    """Whole-batch PCM16 feature extraction with NO per-row Python: headers
    are gathered straight from the Arrow binary buffers (like
    pcm_consistency) and per-clip stats computed with cumulative-sum /
    reduceat segment reductions over ONE flat int16 view of the payload.
    When every clip's data section is 2-byte aligned in the value buffer
    (the common case — WAV PCM16 blobs have even length) the view is
    zero-copy; otherwise one vectorized gather re-packs the payload.

    Returns float64 arrays (NaN where the blob is null/undecodable):
    ``rms`` / ``peak`` (normalized to ±1), ``zcr`` (mean sign-change rate,
    identical formula to the per-row loop it replaces), ``measured_ms``,
    ``clip_ratio`` (fraction of samples at |s| >= 32760, clipping detector),
    ``dc`` (normalized mean sample — DC-offset detector), and the bool
    ``valid`` mask. Decodability matches ``wav_decode``: RIFF/WAVE magic,
    PCM16 mono, in-bounds data section."""
    from .util import single_chunk

    arr = single_chunk(bytes_col)
    n = len(arr)
    nan = np.full(n, np.nan)
    out = {
        "rms": nan.copy(),
        "peak": nan.copy(),
        "zcr": nan.copy(),
        "measured_ms": nan.copy(),
        "clip_ratio": nan.copy(),
        "dc": nan.copy(),
        "valid": np.zeros(n, dtype=bool),
    }
    if n == 0:
        return out
    layout = _pcm_layout(arr)
    if layout is None:
        return out
    data, starts, lengths, sr, eff_len, valid = layout
    out["valid"] = valid
    if not valid.any():
        return out
    v = np.nonzero(valid)[0]
    seg_b = starts[v] + HEADER_SIZE  # byte offsets of PCM data
    seg_len_b = eff_len[v]
    aligned = bool((seg_b % 2 == 0).all())
    if aligned:
        x_all = data[: len(data) & ~1].view(np.int16)
        seg_s = seg_b // 2
        seg_e = (seg_b + seg_len_b) // 2
    else:  # misaligned payload (odd-length neighbor blob): gather per chunk
        x_all = None
        ends = np.cumsum(seg_len_b)
        seg_e = ends // 2
        seg_s = (ends - seg_len_b) // 2
    srv = sr[v]
    # Bounded-chunk processing: unchunked, the cumsum reductions allocate
    # GBs of fresh pages over a 100-clip-seconds batch, which this host's
    # page-fault pathology turns into minutes (BASELINE.md; measured 136 s
    # → ~2 s warm on a 2000-clip table after chunking, identical results).
    # The chunk is kept small and the kernels dtype-minimal (~35 bytes of
    # temporaries per sample) because a WORKER'S FIRST batch pays the
    # first-touch fault cost of the whole buffer set — at the degraded
    # ~20 MB/s fault windows this host hits, every 10 MB of cold footprint
    # is half a second of actor-pool cold start.
    chunk = 1_000_000
    k = 0
    m = len(v)
    while k < m:
        j = k + 1
        while j < m and seg_e[j] - seg_s[k] <= chunk:
            j += 1
        if aligned:
            lo = seg_s[k]
            x = x_all[lo : seg_e[j - 1]]
        else:
            lo = seg_s[k]
            ln_b = seg_len_b[k:j]
            total = int(ln_b.sum())
            e_rel = np.cumsum(ln_b)
            intra = np.arange(total) - np.repeat(e_rel - ln_b, ln_b)
            x = data[np.repeat(seg_b[k:j], ln_b) + intra].view(np.int16)
        ss = seg_s[k:j] - lo
        ee = seg_e[k:j] - lo
        _seg_stats_into(x, ss, ee, srv[k:j], out, v[k:j])
        k = j
    return out


def _seg_stats_into(x, ss, ee, sr, out, idx) -> None:
    """Segment-reduction kernels over one flat int16 chunk: dtype-minimal
    integer cumsums (sum |x| <= 32768·1M < 2^63; x² <= 32768² fits int32;
    per-chunk counts fit int32) + paired reduceat; results written into the
    output arrays at ``idx``."""
    ln = (ee - ss).astype(np.int64)  # all >= 1
    c1 = np.empty(len(x) + 1, dtype=np.int64)
    c1[0] = 0
    np.cumsum(x, dtype=np.int64, out=c1[1:])
    sums = (c1[ee] - c1[ss]).astype(np.float64)
    sq = np.square(x, dtype=np.int32)  # 32768² < 2^31
    c2 = np.empty(len(x) + 1, dtype=np.int64)
    c2[0] = 0
    np.cumsum(sq, dtype=np.int64, out=c2[1:])
    sqs = (c2[ee] - c2[ss]).astype(np.float64)
    out["rms"][idx] = np.sqrt(sqs / ln) / 32768.0
    out["dc"][idx] = sums / ln / 32768.0
    out["measured_ms"][idx] = 1000.0 * ln / sr
    ax = np.abs(x, dtype=np.int32)  # |-32768| overflows int16, not int32
    clip_cnt = np.empty(len(x) + 1, dtype=np.int32)
    clip_cnt[0] = 0
    np.cumsum(ax >= 32760, dtype=np.int32, out=clip_cnt[1:])
    out["clip_ratio"][idx] = (clip_cnt[ee] - clip_cnt[ss]) / ln
    # peak via paired reduceat [s0,e0,s1,e1,...] → even slots; indices must
    # stay < len(x) (segments are non-empty so s < e <= len)
    inds = np.empty(2 * len(ss), dtype=np.int64)
    inds[0::2] = ss
    inds[1::2] = np.minimum(ee, len(x) - 1)
    peaks = np.maximum.reduceat(ax, inds)[0::2]
    # a segment ending at len(x) loses its last sample to the index clamp
    tail = ee == len(x)
    if tail.any():
        peaks[tail] = np.maximum(peaks[tail], ax[-1])
    out["peak"][idx] = peaks / 32768.0
    # zcr: mean rate of sign changes between consecutive samples, matching
    # np.mean(np.abs(np.diff(np.signbit(x).astype(int8)))) from the old loop
    sb = np.signbit(x)
    ch = np.empty(len(x), dtype=np.int32)
    ch[0] = 0
    np.cumsum(sb[1:] != sb[:-1], dtype=np.int32, out=ch[1:])
    zc = ch[np.maximum(ee - 1, ss)] - ch[ss]
    with np.errstate(invalid="ignore"):
        out["zcr"][idx] = np.where(ln > 1, zc / np.maximum(ln - 1, 1), 0.0)


def pcm_spectral_stats(
    bytes_col, frame: int = 512, max_frames: int = 8
) -> dict[str, np.ndarray]:
    """Frame-based spectral features for a WHOLE batch of WAV blobs, no
    per-row Python: up to ``max_frames`` evenly-spaced Hann-windowed frames
    of ``frame`` samples per clip are gathered into ONE (n_frames, frame)
    float32 matrix per bounded chunk, run through ONE batched ``np.fft.rfft``,
    and aggregated per clip with ``reduceat`` means.

    Returns float64 arrays (NaN where the blob is null/undecodable):
    ``peak_hz`` (dominant rFFT bin → Hz — for the fixture's sine clips this
    recovers f_i to bin resolution sr/frame), ``centroid_hz`` (power-weighted
    mean frequency), ``rolloff_hz`` (85% cumulative-energy frequency), plus
    the ``valid`` mask. Samples are gathered straight from the Arrow value
    buffer with two byte gathers (alignment-agnostic — frames are bounded,
    so the gather cost is ~max_frames·frame·2 bytes per clip regardless of
    clip length). Chunked so the live float32 footprint stays ~16 MB
    (CLAUDE.md cold-footprint lesson: a worker's first batch pays
    first-touch faults on every large temporary)."""
    from .util import single_chunk

    arr = single_chunk(bytes_col)
    n = len(arr)
    nan = np.full(n, np.nan)
    out = {
        "peak_hz": nan.copy(),
        "centroid_hz": nan.copy(),
        "rolloff_hz": nan.copy(),
        "flatness": nan.copy(),
        "valid": np.zeros(n, dtype=bool),
    }
    if n == 0:
        return out
    layout = _pcm_layout(arr)
    if layout is None:
        return out
    data, starts, lengths, sr, eff_len, valid = layout
    out["valid"] = valid
    if not valid.any():
        return out
    v = np.nonzero(valid)[0]
    seg_b = starts[v] + HEADER_SIZE
    n_samp = eff_len[v] // 2
    srv = sr[v].astype(np.float64)
    nf = np.clip(n_samp // frame, 1, max_frames).astype(np.int64)

    window = np.hanning(frame).astype(np.float32)
    bins = np.arange(frame // 2 + 1, dtype=np.float32)

    # chunk clips so each gathered frame matrix stays small
    chunk_frames = 4096
    m = len(v)
    nf_cum = np.concatenate([[0], np.cumsum(nf)])
    k = 0
    while k < m:
        j = k + 1
        while j < m and nf_cum[j + 1] - nf_cum[k] <= chunk_frames:
            j += 1
        sl = slice(k, j)
        nf_c = nf[sl]
        total = int(nf_c.sum())
        # frame ordinal within clip: 0..nf_i-1
        off = np.cumsum(nf_c) - nf_c
        jj = np.arange(total, dtype=np.int64) - np.repeat(off, nf_c)
        ns_rep = np.repeat(n_samp[sl], nf_c)
        nf_rep = np.repeat(nf_c, nf_c)
        span = np.maximum(ns_rep - frame, 0)
        fstart = (jj * span) // np.maximum(nf_rep - 1, 1)
        sidx = fstart[:, None] + np.arange(frame, dtype=np.int64)[None, :]
        in_bounds = sidx < ns_rep[:, None]
        sidx = np.minimum(sidx, np.maximum(ns_rep[:, None] - 1, 0))
        b = np.repeat(seg_b[sl], nf_c)[:, None] + 2 * sidx
        x = (
            data[b].astype(np.int16) | (data[b + 1].astype(np.int16) << 8)
        ).astype(np.float32)
        x *= in_bounds  # zero-pad short clips
        x *= window
        p = np.abs(np.fft.rfft(x, axis=1)) ** 2  # (total, frame//2+1) f32
        ptot = p.sum(axis=1)
        safe_tot = np.maximum(ptot, 1e-20)
        peak_bin = np.argmax(p, axis=1).astype(np.float64)
        centroid_bin = (p @ bins) / safe_tot
        roll_bin = (np.cumsum(p, axis=1) < (0.85 * safe_tot)[:, None]).sum(axis=1)
        # spectral FLATNESS (Wiener entropy): geometric / arithmetic mean
        # of the power spectrum (DC excluded) — ~1 for white noise, →0 for
        # a tone; the classic speech/music-vs-noise discriminator
        pk = p[:, 1:].astype(np.float64) + 1e-20
        flat = np.exp(np.log(pk).mean(axis=1)) / pk.mean(axis=1)
        # per-clip frame means (frames of a clip are contiguous rows)
        red = off
        hz = np.repeat(srv[sl], nf_c) / frame  # Hz per bin, per frame row
        for name, per_frame in (
            ("peak_hz", peak_bin),
            ("centroid_hz", centroid_bin),
            ("rolloff_hz", roll_bin.astype(np.float64)),
        ):
            out[name][v[sl]] = np.add.reduceat(per_frame * hz, red) / nf_c
        out["flatness"][v[sl]] = np.add.reduceat(flat, red) / nf_c
        k = j
    return out


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


def pcm_trim_gain(bytes_col, trim_db: float = -40.0, target_rms: float = 0.1, chunk: int = 1_000_000):
    """Vectorized silence-trim + loudness analysis for a whole binary
    column: per clip, the first/last sample whose |amplitude| clears a
    gain-invariant threshold (``peak·10^(trim_db/20)``), and the gain that
    brings the TRIMMED region's RMS to ``target_rms`` (normalized ±1).

    No per-row Python: one |x| pass per bounded chunk; per-clip peaks via
    ``np.maximum.reduceat``; trim bounds via two ``searchsorted`` calls on
    the flat above-threshold index list; trimmed RMS from an x² cumsum
    gathered at the trim boundaries.

    Returns dict of per-clip arrays: ``trim_start``/``trim_len`` (samples,
    relative to the clip's own data section), ``gain`` (float64, 0 where
    silent), ``rms`` (trimmed-region RMS, ±1 scale), ``sr``, ``valid``
    (decodable), ``silent`` (valid but nothing above threshold)."""
    from .util import single_chunk

    arr = single_chunk(bytes_col)
    n = len(arr)
    out = {
        "trim_start": np.zeros(n, dtype=np.int64),
        "trim_len": np.zeros(n, dtype=np.int64),
        "gain": np.zeros(n, dtype=np.float64),
        "rms": np.zeros(n, dtype=np.float64),
        "sr": np.zeros(n, dtype=np.int64),
        "valid": np.zeros(n, dtype=bool),
        "silent": np.zeros(n, dtype=bool),
    }
    if n == 0:
        return out
    layout = _pcm_layout(arr)
    if layout is None:
        return out
    data, starts, lengths, sr, eff_len, vmask = layout
    out["valid"] = vmask
    out["sr"][vmask] = sr[vmask]
    if not vmask.any():
        return out
    v = np.nonzero(vmask)[0]
    seg_b = starts[v] + HEADER_SIZE
    seg_len_b = eff_len[v]
    aligned = bool((seg_b % 2 == 0).all())
    if aligned:
        x_all = data[: len(data) & ~1].view(np.int16)
        seg_s = seg_b // 2
        seg_e = (seg_b + seg_len_b) // 2
    else:
        x_all = None
        ends = np.cumsum(seg_len_b)
        seg_e = ends // 2
        seg_s = (ends - seg_len_b) // 2

    thr_scale = 10.0 ** (trim_db / 20.0)
    k = 0
    m = len(v)
    while k < m:
        j = k + 1
        while j < m and seg_e[j] - seg_s[k] <= chunk:
            j += 1
        lo = seg_s[k]
        if aligned:
            x = x_all[lo : seg_e[j - 1]]
        else:
            ln_b = seg_len_b[k:j]
            total = int(ln_b.sum())
            e_rel = np.cumsum(ln_b)
            intra = np.arange(total) - np.repeat(e_rel - ln_b, ln_b)
            x = data[np.repeat(seg_b[k:j], ln_b) + intra].view(np.int16)
        ss = seg_s[k:j] - lo
        ee = seg_e[k:j] - lo
        ln = ee - ss
        a = np.abs(x, dtype=np.int32)
        # the flat chunk contains inter-clip gaps (next clips' headers):
        # peak via paired reduceat [s0,e0,...] even slots (audio._seg_stats_into)
        inds = np.empty(2 * len(ss), dtype=np.int64)
        inds[0::2] = ss
        inds[1::2] = np.minimum(ee, len(x) - 1)
        peaks = np.maximum.reduceat(a, inds)[0::2]
        tail = ee == len(x)
        if tail.any():
            peaks[tail] = np.maximum(peaks[tail], a[-1])
        thr = np.maximum(peaks.astype(np.float64) * thr_scale, 1.0)
        # per-sample threshold with +inf over the gaps so they never match
        mc = len(ss)
        lens = np.empty(2 * mc + 1, dtype=np.int64)
        lens[0] = ss[0]
        lens[1::2] = ln
        lens[2::2] = np.concatenate([ss[1:] - ee[:-1], [len(x) - ee[-1]]])
        vals = np.full(2 * mc + 1, np.inf)
        vals[1::2] = thr
        above = a >= np.repeat(vals, lens)
        idxs = np.flatnonzero(above)
        first = np.searchsorted(idxs, ss, side="left")
        last = np.searchsorted(idxs, ee, side="left") - 1
        has = (first <= last) & (first < len(idxs))
        t_start = np.where(has, idxs[np.minimum(first, len(idxs) - 1)] - ss, 0)
        t_end = np.where(has, idxs[np.maximum(last, 0)] + 1 - ss, 0)
        t_len = t_end - t_start
        # trimmed-region RMS from an x^2 cumsum (int64: 32768^2 * 1M < 2^63)
        c2 = np.concatenate([[0], np.cumsum((a.astype(np.int64)) ** 2)])
        sq = c2[ss + t_end] - c2[ss + t_start]
        rms = np.sqrt(sq / np.maximum(t_len, 1)) / 32767.0
        sl = v[k:j]
        out["trim_start"][sl] = t_start
        out["trim_len"][sl] = t_len
        out["rms"][sl] = rms
        out["silent"][sl] = ~has
        with np.errstate(divide="ignore", invalid="ignore"):
            out["gain"][sl] = np.where(has & (rms > 0), target_rms / rms, 0.0)
        k = j
    return out


def pcm_vad_segments(
    bytes_col,
    frame_ms: int = 20,
    thresh_db: float = -35.0,
    min_silence_ms: int = 150,
    min_segment_ms: int = 200,
    chunk: int = 1_000_000,
) -> dict[str, np.ndarray]:
    """Energy-VAD utterance segmentation for a whole binary column — the
    flat_map analysis behind AudioSegmentStage (one clip row → N segment
    rows). Per clip: frame the PCM into ``frame_ms`` windows, mark a frame
    active when its mean |amplitude| clears the gain-invariant threshold
    ``peak_env·10^(thresh_db/20)``, merge active runs separated by less
    than ``min_silence_ms`` of silence, drop merged segments shorter than
    ``min_segment_ms``.

    No per-row Python anywhere: frame envelopes come from one |x| cumsum
    per bounded chunk gathered at vectorized frame boundaries; run starts/
    ends are boolean transitions on the flat frame array (clip boundaries
    force a break via the within-clip frame index); the silence-gap merge
    is a pure pairwise chain (gap lengths don't change as runs merge), so
    it is a cumsum of non-merge flags — no sequential loop.

    Returns per-SEGMENT flat arrays sorted by (row, start): ``row`` (batch
    index), ``start``/``end`` (sample offsets within the clip's own data
    section), ``sr``; plus per-ROW arrays ``valid`` and ``n_segments``.
    """
    from .util import single_chunk

    arr = single_chunk(bytes_col)
    n = len(arr)
    per_row_valid = np.zeros(n, dtype=bool)
    per_row_nseg = np.zeros(n, dtype=np.int64)

    def result(rows, starts_, ends_, srs):
        return {
            "row": rows,
            "start": starts_,
            "end": ends_,
            "sr": srs,
            "valid": per_row_valid,
            "n_segments": per_row_nseg,
        }

    e64 = np.zeros(0, dtype=np.int64)
    if n == 0:
        return result(e64, e64, e64, e64)
    layout = _pcm_layout(arr)
    if layout is None:
        return result(e64, e64, e64, e64)
    data, starts, lengths, sr_all, eff_len, vmask = layout
    per_row_valid[:] = vmask
    if not vmask.any():
        return result(e64, e64, e64, e64)
    v = np.nonzero(vmask)[0]
    seg_b = starts[v] + HEADER_SIZE
    seg_len_b = eff_len[v]
    sr_v = sr_all[v]
    aligned = bool((seg_b % 2 == 0).all())
    if aligned:
        x_all = data[: len(data) & ~1].view(np.int16)
        seg_s = seg_b // 2
        seg_e = (seg_b + seg_len_b) // 2
    else:
        x_all = None
        ends_b = np.cumsum(seg_len_b)
        seg_e = ends_b // 2
        seg_s = (ends_b - seg_len_b) // 2

    thr_scale = 10.0 ** (thresh_db / 20.0)
    out_row: list[np.ndarray] = []
    out_start: list[np.ndarray] = []
    out_end: list[np.ndarray] = []
    out_sr: list[np.ndarray] = []

    k = 0
    m = len(v)
    while k < m:
        j = k + 1
        while j < m and seg_e[j] - seg_s[k] <= chunk:
            j += 1
        lo = seg_s[k]
        if aligned:
            x = x_all[lo : seg_e[j - 1]]
        else:
            ln_b = seg_len_b[k:j]
            total_b = int(ln_b.sum())
            e_rel = np.cumsum(ln_b)
            intra = np.arange(total_b) - np.repeat(e_rel - ln_b, ln_b)
            x = data[np.repeat(seg_b[k:j], ln_b) + intra].view(np.int16)
        ss = seg_s[k:j] - lo
        ee = seg_e[k:j] - lo
        ln = ee - ss
        sr_c = sr_v[k:j]
        a = np.abs(x, dtype=np.int32)
        c = np.empty(len(a) + 1, dtype=np.int64)
        c[0] = 0
        np.cumsum(a, dtype=np.int64, out=c[1:])

        fs = np.maximum(sr_c.astype(np.int64) * frame_ms // 1000, 1)
        nf = -(-ln // fs)
        total_f = int(nf.sum())
        cum0 = np.cumsum(nf) - nf
        fclip = np.repeat(np.arange(j - k), nf)
        fidx = np.arange(total_f) - np.repeat(cum0, nf)
        fs_rep = np.repeat(fs, nf)
        fstart = np.repeat(ss, nf) + fidx * fs_rep
        fend = np.minimum(fstart + fs_rep, np.repeat(ee, nf))
        env = (c[fend] - c[fstart]) / (fend - fstart)
        peak = np.maximum.reduceat(env, cum0)
        thr = np.maximum(peak * thr_scale, 1.0)
        active = env >= np.repeat(thr, nf)

        prev_active = np.empty_like(active)
        prev_active[0] = False
        prev_active[1:] = active[:-1]
        next_active = np.empty_like(active)
        next_active[-1] = False
        next_active[:-1] = active[1:]
        is_first = fidx == 0
        is_last = fidx == np.repeat(nf, nf) - 1
        run_start = active & (is_first | ~prev_active)
        run_end = active & (is_last | ~next_active)
        rs = np.flatnonzero(run_start)
        re_ = np.flatnonzero(run_end)
        if len(rs) == 0:
            k = j
            continue
        clip_of_run = fclip[rs]
        sr_run = sr_c[clip_of_run]
        # merge run i,i+1 when same clip and the silence gap between them
        # is shorter than min_silence_ms (sample-exact comparison)
        gap_samples = fstart[rs[1:]] - fend[re_[:-1]]
        merge = (clip_of_run[1:] == clip_of_run[:-1]) & (
            gap_samples * 1000 < min_silence_ms * sr_run[:-1]
        )
        seg_id = np.empty(len(rs), dtype=np.int64)
        seg_id[0] = 0
        np.cumsum(~merge, out=seg_id[1:])
        firsts = np.flatnonzero(np.r_[True, seg_id[1:] != seg_id[:-1]])
        lasts = np.r_[firsts[1:] - 1, len(seg_id) - 1]
        clip_seg = clip_of_run[firsts]
        s_samp = fstart[rs[firsts]] - ss[clip_seg]
        e_samp = fend[re_[lasts]] - ss[clip_seg]
        keep = (e_samp - s_samp) * 1000 >= min_segment_ms * sr_c[clip_seg]
        clip_seg, s_samp, e_samp = clip_seg[keep], s_samp[keep], e_samp[keep]
        rows_g = v[k + clip_seg]
        out_row.append(rows_g)
        out_start.append(s_samp)
        out_end.append(e_samp)
        out_sr.append(sr_c[clip_seg].astype(np.int64))
        np.add.at(per_row_nseg, rows_g, 1)
        k = j

    if not out_row:
        return result(e64, e64, e64, e64)
    return result(
        np.concatenate(out_row),
        np.concatenate(out_start),
        np.concatenate(out_end),
        np.concatenate(out_sr),
    )



# ---------------------------------------------------------------------------
# log-mel filterbank features (ASR training featurization)
# ---------------------------------------------------------------------------

_MEL_FB_CACHE: dict = {}


def mel_filterbank(sr: int, frame: int, n_mels: int) -> np.ndarray:
    """(n_mels, frame//2+1) triangular HTK-mel filterbank for one sample
    rate — cached per (sr, frame, n_mels) (a worker sees only a handful of
    distinct sample rates)."""
    key = (int(sr), frame, n_mels)
    fb = _MEL_FB_CACHE.get(key)
    if fb is None:
        n_bins = frame // 2 + 1
        fhz = np.arange(n_bins, dtype=np.float64) * (sr / frame)
        mel_max = 2595.0 * np.log10(1.0 + (sr / 2) / 700.0)
        mels = np.linspace(0.0, mel_max, n_mels + 2)
        fpts = 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
        low, ctr, hi = fpts[:-2], fpts[1:-1], fpts[2:]
        up = (fhz[None, :] - low[:, None]) / np.maximum(ctr - low, 1e-9)[:, None]
        down = (hi[:, None] - fhz[None, :]) / np.maximum(hi - ctr, 1e-9)[:, None]
        fb = np.maximum(0.0, np.minimum(up, down)).astype(np.float32)
        _MEL_FB_CACHE[key] = fb
    return fb


def pcm_logmel(
    bytes_col, frame: int = 512, n_mels: int = 24, max_frames: int = 16
) -> dict:
    """Log-mel filterbank features for a WHOLE batch of WAV blobs — the
    standard ASR training featurization, batch-vectorized like
    :func:`pcm_spectral_stats` (same evenly-spaced Hann frame gather, ONE
    batched rFFT per bounded chunk, zero per-row Python). The mel
    projection is sample-rate-dependent, so power rows are grouped by the
    chunk's DISTINCT sample rates (a few values, never per-row) and each
    group does one (rows × bins) @ (bins × mels) matmul.

    Returns ``feat`` — float32 (total_frames, n_mels) log10 mel energies,
    frames of one clip contiguous — plus per-clip ``nf`` frame counts and
    the ``valid`` mask. Footprint stays bounded by the same 4096-frame
    chunking (CLAUDE.md cold-footprint rule)."""
    from .util import single_chunk

    arr = single_chunk(bytes_col)
    n = len(arr)
    out = {
        "feat": np.zeros((0, n_mels), dtype=np.float32),
        "nf": np.zeros(n, dtype=np.int64),
        "valid": np.zeros(n, dtype=bool),
    }
    if n == 0:
        return out
    layout = _pcm_layout(arr)
    if layout is None:
        return out
    data, starts, lengths, sr, eff_len, valid = layout
    out["valid"] = valid
    if not valid.any():
        return out
    v = np.nonzero(valid)[0]
    seg_b = starts[v] + HEADER_SIZE
    n_samp = eff_len[v] // 2
    srv = sr[v]
    nf = np.clip(n_samp // frame, 1, max_frames).astype(np.int64)
    out["nf"][v] = nf

    window = np.hanning(frame).astype(np.float32)
    feat = np.zeros((int(nf.sum()), n_mels), dtype=np.float32)

    chunk_frames = 4096
    m = len(v)
    nf_cum = np.concatenate([[0], np.cumsum(nf)])
    k = 0
    while k < m:
        j = k + 1
        while j < m and nf_cum[j + 1] - nf_cum[k] <= chunk_frames:
            j += 1
        sl = slice(k, j)
        nf_c = nf[sl]
        total = int(nf_c.sum())
        off = np.cumsum(nf_c) - nf_c
        jj = np.arange(total, dtype=np.int64) - np.repeat(off, nf_c)
        ns_rep = np.repeat(n_samp[sl], nf_c)
        nf_rep = np.repeat(nf_c, nf_c)
        span = np.maximum(ns_rep - frame, 0)
        fstart = (jj * span) // np.maximum(nf_rep - 1, 1)
        sidx = fstart[:, None] + np.arange(frame, dtype=np.int64)[None, :]
        in_bounds = sidx < ns_rep[:, None]
        sidx = np.minimum(sidx, np.maximum(ns_rep[:, None] - 1, 0))
        b = np.repeat(seg_b[sl], nf_c)[:, None] + 2 * sidx
        x = (
            data[b].astype(np.int16) | (data[b + 1].astype(np.int16) << 8)
        ).astype(np.float32)
        x *= in_bounds
        x *= window
        p = np.abs(np.fft.rfft(x, axis=1)).astype(np.float32) ** 2
        sr_rep = np.repeat(srv[sl], nf_c)
        base = int(nf_cum[k])
        for one_sr in np.unique(sr_rep):
            rows = np.nonzero(sr_rep == one_sr)[0]
            fb = mel_filterbank(int(one_sr), frame, n_mels)
            feat[base + rows] = np.log10(np.maximum(p[rows] @ fb.T, 1e-10))
        k = j
    out["feat"] = feat
    return out


def pcm_pitch_stats(
    bytes_col,
    frame: int = 1024,
    max_frames: int = 8,
    fmin: float = 80.0,
    fmax: float = 1000.0,
    voiced_thresh: float = 0.5,
) -> dict[str, np.ndarray]:
    """Fundamental-frequency (f0) estimation for a WHOLE batch of WAV
    blobs via short-time AUTOCORRELATION — the speech-curation signal
    behind "is this clip voiced speech / what pitch register" filters.

    Same zero-per-row-Python shape as :func:`pcm_spectral_stats`: up to
    ``max_frames`` evenly-spaced frames per clip gathered into ONE
    (frames, frame) float32 matrix per bounded chunk. Per chunk the
    autocorrelation of every frame comes from one batched
    rfft→|·|²→irfft round (zero-padded to 2·frame, so no circular wrap);
    the per-frame period is the argmax of r[lag]/r[0] over each clip's
    OWN lag band [sr/fmax, sr/fmin] (sr varies per clip), refined by
    parabolic interpolation for sub-sample precision — at sr=8 kHz and
    f0=920 Hz the integer lag grid alone is ~12% quantized; the parabola
    brings it under 1%.

    Returns per-clip float64 arrays: ``f0_hz`` (mean over voiced frames;
    NaN if no voiced frame or invalid blob), ``voiced_ratio`` (fraction
    of frames with normalized autocorr peak ≥ ``voiced_thresh``), and the
    ``valid`` mask. Chunked to keep the live float32 footprint tens of MB
    (CLAUDE.md cold-footprint rule)."""
    from .util import single_chunk

    arr = single_chunk(bytes_col)
    n = len(arr)
    out = {
        "f0_hz": np.full(n, np.nan),
        "voiced_ratio": np.full(n, np.nan),
        "valid": np.zeros(n, dtype=bool),
    }
    if n == 0:
        return out
    layout = _pcm_layout(arr)
    if layout is None:
        return out
    data, starts, lengths, sr, eff_len, valid = layout
    out["valid"] = valid
    if not valid.any():
        return out
    v = np.nonzero(valid)[0]
    seg_b = starts[v] + HEADER_SIZE
    n_samp = eff_len[v] // 2
    srv = sr[v].astype(np.float64)
    nf = np.clip(n_samp // frame, 1, max_frames).astype(np.int64)

    lags = np.arange(frame, dtype=np.float64)
    chunk_frames = 2048  # autocorr FFT is 2·frame wide — half the spectral chunk
    m = len(v)
    nf_cum = np.concatenate([[0], np.cumsum(nf)])
    k = 0
    while k < m:
        j = k + 1
        while j < m and nf_cum[j + 1] - nf_cum[k] <= chunk_frames:
            j += 1
        sl = slice(k, j)
        nf_c = nf[sl]
        total = int(nf_c.sum())
        off = np.cumsum(nf_c) - nf_c
        jj = np.arange(total, dtype=np.int64) - np.repeat(off, nf_c)
        ns_rep = np.repeat(n_samp[sl], nf_c)
        nf_rep = np.repeat(nf_c, nf_c)
        span = np.maximum(ns_rep - frame, 0)
        fstart = (jj * span) // np.maximum(nf_rep - 1, 1)
        sidx = fstart[:, None] + np.arange(frame, dtype=np.int64)[None, :]
        in_bounds = sidx < ns_rep[:, None]
        sidx = np.minimum(sidx, np.maximum(ns_rep[:, None] - 1, 0))
        b = np.repeat(seg_b[sl], nf_c)[:, None] + 2 * sidx
        x = (
            data[b].astype(np.int16) | (data[b + 1].astype(np.int16) << 8)
        ).astype(np.float32)
        x *= in_bounds
        x -= x.mean(axis=1, keepdims=True)  # kill DC so lag-0 ≠ offset²
        spec = np.fft.rfft(x, n=2 * frame, axis=1)
        r = np.fft.irfft(spec * np.conj(spec), axis=1)[:, :frame]  # (total, frame)
        # unbiased: raw FFT autocorr sums frame−lag products, so its
        # envelope decays linearly with lag and drags the parabolic peak
        # early (f0 biased high, ~2-3% at sr 44.1k); rescale by
        # frame/(frame−lag) before normalizing
        r *= frame / (frame - lags)
        r0 = np.maximum(r[:, 0:1], 1e-12)
        rn = r / r0  # normalized autocorr, rn[:,0] == 1
        # per-frame lag band from the clip's own sample rate
        sr_rep = np.repeat(srv[sl], nf_c)
        lag_lo = np.ceil(sr_rep / fmax)
        lag_hi = np.minimum(np.floor(sr_rep / fmin), frame - 2)
        band = (lags[None, :] >= lag_lo[:, None]) & (lags[None, :] <= lag_hi[:, None])
        rb = np.where(band, rn, -np.inf)
        # octave-error guard: the autocorr of a periodic signal peaks at
        # EVERY multiple of the period; the global argmax often lands on
        # 2·lag (= f0/2). Take the SMALLEST in-band local maximum within
        # 85% of the band max instead of the argmax itself.
        maxval = rb.max(axis=1)
        local = np.zeros_like(band)
        local[:, 1:-1] = (rn[:, 1:-1] >= rn[:, :-2]) & (rn[:, 1:-1] >= rn[:, 2:])
        cand = band & local & (rb >= (0.85 * maxval)[:, None])
        has_cand = cand.any(axis=1)
        lag = np.where(has_cand, np.argmax(cand, axis=1), np.argmax(rb, axis=1))
        peak = rn[rows := np.arange(total), lag]
        # parabolic refinement on (lag-1, lag, lag+1)
        lm = rn[rows, np.maximum(lag - 1, 0)]
        lp = rn[rows, np.minimum(lag + 1, frame - 1)]
        denom = lm - 2 * rn[rows, lag] + lp
        delta = np.where(np.abs(denom) > 1e-12, 0.5 * (lm - lp) / denom, 0.0)
        delta = np.clip(delta, -0.5, 0.5)
        lag_f = lag + delta
        voiced = (peak >= voiced_thresh) & (lag > 0) & np.isfinite(rb[rows, lag])
        f0 = np.where(voiced, sr_rep / np.maximum(lag_f, 1e-9), 0.0)
        nv = np.add.reduceat(voiced.astype(np.float64), off)
        f0_sum = np.add.reduceat(f0, off)
        out["f0_hz"][v[sl]] = np.where(nv > 0, f0_sum / np.maximum(nv, 1), np.nan)
        out["voiced_ratio"][v[sl]] = nv / nf_c
        k = j
    return out


def pcm_time_stretch(x: np.ndarray, rate: float, frame: int = 512) -> np.ndarray:
    """Pitch-PRESERVING tempo change of one PCM clip by period-
    SYNCHRONIZED overlap-add (SOLA): output duration ≈ len(x)/rate with
    spectral content (and the f0 the pitch kernel measures) unchanged —
    the complement of AudioAugmentStage's speed perturbation, which
    shifts pitch WITH tempo.

    Periodic-Hann frames at 50% output hop satisfy COLA exactly
    (w[k] + w[k+N/2] == 1). Each grain's input advance is snapped to the
    nearest multiple of the clip's fundamental period (estimated once per
    clip from the autocorrelation of the opening samples — one rfft), so
    overlapping grains are PHASE-COHERENT for periodic content: the sum
    is constructive and amplitude is preserved (plain incoherent OLA
    loses ~3 dB in every overlap). Unvoiced clips (weak autocorr peak)
    fall back to unsnapped grains, where incoherent overlap is the
    correct statistics anyway. Vectorized per clip: one frame gather +
    two non-overlapping ravel placements — no per-frame Python."""
    n = len(x)
    hop = frame // 2
    out_len = max(int(round(n / rate)), frame)
    if n < frame:
        pad = np.zeros(out_len, dtype=np.float64)
        pad[: min(n, out_len)] = x[: min(n, out_len)]
        return pad
    nf = (out_len - frame) // hop + 1
    # periodic Hann: exact constant-overlap-add at 50% hop
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame) / frame)

    # one-shot period estimate (same octave-guard shape as pcm_pitch_stats)
    head = x[: min(n, 4096)].astype(np.float64)
    head = head - head.mean()
    spec = np.fft.rfft(head, n=2 * len(head))
    r = np.fft.irfft(spec * np.conj(spec))[: len(head)]
    period = 0
    if r[0] > 1e-9 and len(head) > 64:
        rn = r / r[0]
        lo, hi = 16, min(len(head) // 2, 1024)
        local = np.zeros(len(rn), dtype=bool)
        local[1:-1] = (rn[1:-1] >= rn[:-2]) & (rn[1:-1] >= rn[2:])
        band = np.zeros(len(rn), dtype=bool)
        band[lo:hi] = True
        mx = rn[lo:hi].max() if hi > lo else 0.0
        cand = band & local & (rn >= 0.85 * mx)
        if mx >= 0.4 and cand.any():
            period = int(np.argmax(cand))

    i = np.arange(nf, dtype=np.float64)
    if period > 0:
        # snap each grain's deviation from natural continuation to a
        # period multiple: overlaps stay phase-coherent
        k = np.round(i * hop * (rate - 1.0) / period)
        in_pos = (i * hop + k * period).astype(np.int64)
    else:
        in_pos = (i * hop * rate).astype(np.int64)
    in_pos = np.clip(in_pos, 0, max(n - frame, 0))
    frames = x[in_pos[:, None] + np.arange(frame)[None, :]] * w
    out = np.zeros(out_len + frame, dtype=np.float64)
    even = frames[0::2]
    odd = frames[1::2]
    out[: even.shape[0] * frame] += even.ravel()
    out[hop : hop + odd.shape[0] * frame] += odd.ravel()
    # the first half-frame has only one tapered grain; grain 0 starts at
    # input 0, so the original opening is the exact reconstruction
    out[:hop] = x[:hop]
    return out[:out_len]


def pcm_denoise(
    x: np.ndarray,
    frame: int = 512,
    noise_q: float = 0.10,
    beta: float = 1.5,
    floor: float = 0.05,
) -> tuple[np.ndarray, float]:
    """SPECTRAL-SUBTRACTION denoise of one PCM clip — the audio-side
    quality REPAIR op (the analogue of text normalize/redact): estimate
    the per-bin noise floor as the ``noise_q`` quantile of the STFT
    magnitudes over time (quiet frames dominate low quantiles), subtract
    ``beta``× it from every frame's magnitude (clamped at ``floor``× the
    original — the standard musical-noise guard), resynthesize with the
    original phases by inverse rFFT + overlap-add. Analysis window is
    periodic Hann at 50% hop (COLA: Σ shifted w == 1), synthesis is
    rectangular, so unmodified spectra reconstruct exactly.

    Returns ``(denoised float64 samples — same length, noise_rms)`` where
    noise_rms is the estimated noise level in normalized units (a QA
    metadata signal). Vectorized per clip: one batched rfft/irfft round,
    no per-frame Python."""
    n = len(x)
    hop = frame // 2
    if n < 2 * frame:
        return x.astype(np.float64).copy(), 0.0
    nf = (n - frame) // hop + 1
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame) / frame)
    pos = np.arange(nf) * hop
    frames = x[pos[:, None] + np.arange(frame)[None, :]] * w
    spec = np.fft.rfft(frames, axis=1)
    mag = np.abs(spec)
    noise = np.quantile(mag, noise_q, axis=0)  # per-bin floor over time
    new_mag = np.maximum(mag - beta * noise[None, :], floor * mag)
    scale = new_mag / np.maximum(mag, 1e-12)
    y_frames = np.fft.irfft(spec * scale, n=frame, axis=1)
    out = np.zeros(n + frame, dtype=np.float64)
    even = y_frames[0::2]
    odd = y_frames[1::2]
    out[: even.shape[0] * frame] += even.ravel()
    out[hop : hop + odd.shape[0] * frame] += odd.ravel()
    # normalize by the actual window coverage (Σ of shifted Hanns == 1 in
    # the interior; < 1 over the first/last half-frames and past the frame
    # grid) — where coverage is weak, fall back to the original samples
    norm = np.zeros(n + frame, dtype=np.float64)
    wt = np.tile(w, even.shape[0])
    norm[: even.shape[0] * frame] += wt
    norm[hop : hop + odd.shape[0] * frame] += np.tile(w, odd.shape[0])
    good = norm[:n] > 0.5
    out_n = out[:n]
    out_n[good] /= norm[:n][good]
    out_n[~good] = x[~good]
    # noise rms in normalized int16 units: quiet frames dominate the low
    # quantiles of per-frame mean power; undo the analysis window's power
    # shaping (a windowed noise frame has mean power σ²·mean(w²)). For a
    # 512-sample frame the per-frame power concentrates, so q25 of the
    # frame powers ≈ the noise floor during pauses.
    frame_pow = (frames**2).mean(axis=1)
    noise_rms = float(
        np.sqrt(np.quantile(frame_pow, 0.25) / float((w**2).mean())) / 32768.0
    )
    return out_n, noise_rms
