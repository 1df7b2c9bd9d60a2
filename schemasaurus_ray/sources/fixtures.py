"""Deterministic synthetic audio clip + transcript tables (FIXTURES.md F1/F2).

Seed=42, numpy PCG64, no wall-clock, no external data. Violations are
injected at known modular row indices so golden counts are exact:

| condition (row i)   | violation                          | code               |
|---------------------|------------------------------------|--------------------|
| i % 500 == 7        | transcript = null                  | required           |
| i % 500 == 131      | duplicate clip_id (row i-1's id)   | unique             |
| i % 1000 == 11      | sr_hz = 3000 / 96001 (alternating) | enum (+min/max)    |
| i % 1000 == 13      | dur_ms = 0                         | minimum.exclusive  |
| i % 1000 == 17      | codec = "mp3"                      | enum               |
| i % 2000 == 19      | clip_id = "CLIP_<i>"               | pattern            |
| i % 2000 == 23      | truncated bytes (half samples)     | custom.pcm         |
| partition 0 rows    | sr 90% 44100, dur ×2               | drift (KS/PSI)     |

Transcript side table (F2): rows i % 500 == 77 dropped (orphan clip),
extra rows with unknown clip_id at i % 500 == 99 (orphan transcript).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..audio import synth_samples, wav_encode
from ..util import partition_ids

# Audio payloads are already codec-compressed in production (opus/flac) and
# the synthetic WAVs barely compress either (snappy: 110.35 -> 110.39 MB per
# shard, i.e. NEGATIVE savings) — but snappy-decoding them cost the dominant
# share of row-pass CPU at 32-way concurrency. Store clip shards uncompressed
# so reads are a near-zero-copy mmap off tmpfs/page cache.
CLIP_WRITE_OPTS = {"compression": "NONE", "use_dictionary": False}

WORDS = (
    "the quick brown fox jumps over lazy dog alpha beta gamma delta epsilon "
    "zeta eta theta iota kappa lam mu nu xi omicron pi rho sigma tau upsilon "
    "phi chi psi omega one two three four five six seven eight nine ten "
    "north south east west red green blue amber stone river cloud forest "
    "hill vale spark ember drift tide grain husk loom twine"
).split()
assert len(WORDS) == 64

SR_CHOICES = np.array([8000, 16000, 22050, 44100], dtype=np.int32)
SR_WEIGHTS = np.array([0.1, 0.6, 0.1, 0.2])
CODECS = np.array(["wav", "flac", "opus"], dtype=object)
CODEC_WEIGHTS = np.array([0.7, 0.2, 0.1])


def clip_ids(n: int) -> np.ndarray:
    return np.array([f"clip-{i:010d}" for i in range(n)], dtype=object)


def make_clips(
    n: int,
    *,
    seed: int = 42,
    dur_lo: int = 200,
    dur_hi: int = 2000,
    with_audio: bool = True,
    inject: bool = True,
    num_partitions: int = 16,
    drift_partition: int | None = 0,
    start: int = 0,
) -> pa.Table:
    """The F1 clip table. ``dur_hi`` is capped below FIXTURES' 30 s so test
    tables stay small; semantics don't depend on it. ``start`` offsets the
    global row index for shard-parallel generation (each shard draws from an
    independent PCG64 stream seeded by ``seed + start``)."""
    rng = np.random.default_rng(seed + start)
    ids = np.array([f"clip-{i:010d}" for i in range(start, start + n)], dtype=object)
    sr = rng.choice(SR_CHOICES, size=n, p=SR_WEIGHTS).astype(np.int32)
    dur = np.clip(rng.lognormal(7.3, 0.6, size=n), dur_lo, dur_hi).astype(np.int32)
    codec = rng.choice(CODECS, size=n, p=CODEC_WEIGHTS)
    transcript = np.array(
        [" ".join(rng.choice(WORDS, size=max(1, int(d / 400)))) for d in dur], dtype=object
    )

    pos = np.arange(n)
    gi = pos + start  # global row index drives injection conditions
    if inject:
        # drift partition first (so membership is computed on clean ids)
        if drift_partition is not None:
            pids = partition_ids(pa.array(ids, pa.string()), num_partitions)
            in_drift = pids == drift_partition
            flip = rng.random(n) < 0.9
            sr = np.where(in_drift & flip, np.int32(44100), sr)
            dur = np.where(in_drift, np.minimum(dur * 2, dur_hi * 2).astype(np.int32), dur)

        transcript[(gi % 500) == 7] = None
        dup = (gi % 500) == 131
        ids[dup] = ids[np.maximum(pos[dup] - 1, 0)]
        srv = (gi % 1000) == 11
        sr[srv & ((gi // 1000) % 2 == 0)] = 3000
        sr[srv & ((gi // 1000) % 2 == 1)] = 96001
        dur[(gi % 1000) == 13] = 0
        codec[(gi % 1000) == 17] = "mp3"
        ids[(gi % 2000) == 19] = np.array([f"CLIP_{j}" for j in gi[(gi % 2000) == 19]], dtype=object)

    blobs = None
    if with_audio:
        truncated = inject & ((gi % 2000) == 23)
        blob_list = []
        for j in range(n):
            samples = synth_samples(start + j, int(sr[j]), int(dur[j]), seed=seed)
            if inject and truncated[j]:
                samples = samples[: len(samples) // 2]
            blob_list.append(wav_encode(samples, int(sr[j])))
        blobs = pa.array(blob_list, pa.binary())

    cols = {
        "clip_id": pa.array(ids, pa.string()),
        "bytes": blobs if blobs is not None else pa.nulls(n, pa.binary()),
        "sr_hz": pa.array(sr, pa.int32()),
        "dur_ms": pa.array(dur, pa.int32()),
        "codec": pa.array(codec, pa.string()),
        "transcript": pa.array(transcript, pa.string()),
    }
    return pa.table(cols)


def make_transcripts(clips: pa.Table, seed: int = 42, start: int = 0) -> pa.Table:
    """F2 side table: (clip_id, transcript, lang) with known orphans."""
    rng = np.random.default_rng(seed + 1 + start)
    n = clips.num_rows
    i = np.arange(start, start + n)
    keep = (i % 500) != 77
    ids = np.asarray(clips.column("clip_id").combine_chunks(), dtype=object)[keep]
    texts = np.asarray(clips.column("transcript").combine_chunks(), dtype=object)[keep]
    langs = rng.choice(np.array(["en", "de", "fr"], dtype=object), size=keep.sum())
    extra_idx = i[(i % 500) == 99]
    extra_ids = np.array([f"ghost-{j:010d}" for j in extra_idx], dtype=object)
    extra_texts = np.array(["orphan transcript"] * len(extra_idx), dtype=object)
    extra_langs = np.array(["en"] * len(extra_idx), dtype=object)
    return pa.table(
        {
            "clip_id": pa.array(np.concatenate([ids, extra_ids]), pa.string()),
            "transcript": pa.array(np.concatenate([texts, extra_texts]), pa.string()),
            "lang": pa.array(np.concatenate([langs, extra_langs]), pa.string()),
        }
    )


def write_fixture(
    out_dir: str,
    n: int = 2000,
    *,
    seed: int = 42,
    shards: int = 4,
    with_audio: bool = True,
    inject: bool = True,
    num_partitions: int = 16,
) -> dict[str, str]:
    """Write clips + transcripts as sharded parquet (resumable layout — one
    file per shard). Returns {"clips": dir, "transcripts": dir}."""
    clips = make_clips(
        n, seed=seed, with_audio=with_audio, inject=inject, num_partitions=num_partitions
    )
    transcripts = make_transcripts(clips, seed=seed)
    clips_dir = os.path.join(out_dir, "clips")
    tr_dir = os.path.join(out_dir, "transcripts")
    os.makedirs(clips_dir, exist_ok=True)
    os.makedirs(tr_dir, exist_ok=True)
    per = (n + shards - 1) // shards
    for s in range(shards):
        part = clips.slice(s * per, per)
        if part.num_rows:
            pq.write_table(part, os.path.join(clips_dir, f"shard-{s:05d}.parquet"), **CLIP_WRITE_OPTS)
    pq.write_table(transcripts, os.path.join(tr_dir, "shard-00000.parquet"))
    return {"clips": clips_dir, "transcripts": tr_dir}


def write_fixture_parallel(
    out_dir: str,
    n: int,
    *,
    seed: int = 42,
    shards: int = 64,
    num_partitions: int = 16,
    with_audio: bool = True,
) -> dict[str, str]:
    """Bench-scale fixture: each shard generated by an independent Ray task
    (independent PCG64 stream per shard via ``start`` seeding). Idempotent —
    existing complete output is reused."""
    import ray

    clips_dir = os.path.join(out_dir, "clips")
    tr_dir = os.path.join(out_dir, "transcripts")
    # v2: clip shards uncompressed (CLIP_WRITE_OPTS) — the marker is
    # format-versioned so a stale snappy fixture from an older run is
    # regenerated instead of silently reused
    done_marker = os.path.join(out_dir, f".done-n{n}-s{shards}-v2")
    if os.path.exists(done_marker):
        return {"clips": clips_dir, "transcripts": tr_dir}
    os.makedirs(clips_dir, exist_ok=True)
    os.makedirs(tr_dir, exist_ok=True)

    per = (n + shards - 1) // shards

    @ray.remote(num_cpus=1)
    def gen_shard(s: int) -> int:
        start = s * per
        count = min(per, n - start)
        if count <= 0:
            return 0
        clips = make_clips(
            count, seed=seed, start=start, with_audio=with_audio, inject=True,
            num_partitions=num_partitions,
        )
        pq.write_table(clips, os.path.join(clips_dir, f"shard-{s:05d}.parquet"), **CLIP_WRITE_OPTS)
        tr = make_transcripts(clips, seed=seed, start=start)
        pq.write_table(tr, os.path.join(tr_dir, f"shard-{s:05d}.parquet"))
        return count

    total = sum(ray.get([gen_shard.remote(s) for s in range(shards)]))
    with open(done_marker, "w") as f:
        f.write(str(total))
    return {"clips": clips_dir, "transcripts": tr_dir}


def make_burst_clips(n: int = 512, seed: int = 42) -> pa.Table:
    """Deterministic utterance-burst clips for the VAD segmentation surface
    (FIXTURES.md F5). Clip i: sr = [8000, 16000, 44100][i%3]; 120 ms lead
    silence; k = 1 + i%3 tone bursts of (240 + 20·(i%5)) ms at
    f = 300 + (i%23)·40 Hz, separated by 400 ms silences; 80 ms tail
    silence. All durations are multiples of the 20 ms VAD frame and
    silences are exact zeros, so expected segment boundaries are EXACT:
    segment t of clip i spans [120 + t·(burst+400), …+burst] ms.

    Planted negatives: i%17==0 → all-silence clip (zero segments);
    i%19==0 → truncated non-WAV blob (invalid, zero segments)."""
    rng = np.random.default_rng(seed)  # only for byte noise in invalid blobs
    ids = clip_ids(n)
    srs = np.array([8000, 16000, 44100], dtype=np.int32)[np.arange(n) % 3]
    blob_list = []
    for i in range(n):
        sr = int(srs[i])
        if i % 17 == 0:
            blob_list.append(wav_encode(np.zeros(sr, dtype=np.int16), sr))
            continue
        if i % 19 == 0:
            blob_list.append(bytes(rng.integers(0, 256, size=20, dtype=np.uint8)))
            continue
        k = 1 + i % 3
        burst_ms = 240 + 20 * (i % 5)
        f = 300.0 + (i % 23) * 40.0
        parts = [np.zeros(sr * 120 // 1000, dtype=np.int16)]
        nb = sr * burst_ms // 1000
        t = np.arange(nb, dtype=np.float64) / sr
        tone = (0.5 * np.sin(2 * np.pi * f * t) * 32767).astype(np.int16)
        gap = np.zeros(sr * 400 // 1000, dtype=np.int16)
        for b in range(k):
            if b:
                parts.append(gap)
            parts.append(tone)
        parts.append(np.zeros(sr * 80 // 1000, dtype=np.int16))
        blob_list.append(wav_encode(np.concatenate(parts), sr))
    return pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blob_list, pa.binary()),
            "sr_hz": pa.array(srs, pa.int32()),
        }
    )
