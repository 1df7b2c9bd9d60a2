"""Drift vs a STORED snapshot: build the reference snapshot from clean data,
then validate a batch where exactly one shard's distribution shifted —
that partition (and only that partition) must fail on KS (sr_hz/dur_ms) and
PSI (codec)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from schemasaurus_ray.pipelines.validate import ValidationPipeline

SPEC = {
    "columns": {
        "clip_id": {"type": "string", "required": True},
        "sr_hz": {"type": "integer"},
        "dur_ms": {"type": "integer"},
        "codec": {"type": "string"},
    },
    "table": {
        "key": "clip_id",
        "stats": ["sr_hz"],
        "drift": {
            "numeric": ["sr_hz", "dur_ms"],
            "categorical": ["codec"],
            "ks_threshold": 0.15,
            "psi_threshold": 0.25,
        },
    },
}


def _shard(rng, n, start, drifted=False):
    if drifted:
        sr = rng.choice([44100, 16000], size=n, p=[0.95, 0.05]).astype(np.int32)
        dur = (rng.lognormal(7.3, 0.6, size=n) * 2).clip(200, 60000).astype(np.int32)
        codec = rng.choice(np.array(["opus", "wav"], dtype=object), size=n, p=[0.9, 0.1])
    else:
        sr = rng.choice([8000, 16000, 22050, 44100], size=n, p=[0.1, 0.6, 0.1, 0.2]).astype(np.int32)
        dur = rng.lognormal(7.3, 0.6, size=n).clip(200, 30000).astype(np.int32)
        codec = rng.choice(np.array(["wav", "flac", "opus"], dtype=object), size=n, p=[0.7, 0.2, 0.1])
    ids = [f"clip-{start + i:010d}" for i in range(n)]
    return pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            "sr_hz": pa.array(sr, pa.int32()),
            "dur_ms": pa.array(dur, pa.int32()),
            "codec": pa.array(codec, pa.string()),
        }
    )


@pytest.fixture(scope="module")
def dirs(tmp_path_factory, ray_session):
    rng = np.random.default_rng(11)
    clean = tmp_path_factory.mktemp("clean")
    mixed = tmp_path_factory.mktemp("mixed")
    for s in range(4):
        pq.write_table(_shard(rng, 3000, s * 3000), str(clean / f"s{s}.parquet"))
    for s in range(4):
        pq.write_table(
            _shard(rng, 3000, 100000 + s * 3000, drifted=(s == 2)),
            str(mixed / f"s{s}.parquet"),
        )
    return str(clean), str(mixed)


def test_drift_against_stored_snapshot(dirs, tmp_path_factory):
    clean_dir, mixed_dir = dirs
    # 1) reference run on clean data → snapshot written to out_dir
    out1 = str(tmp_path_factory.mktemp("drift_ref"))
    rep1 = ValidationPipeline(SPEC, out1).run(clean_dir, resume=False)
    assert rep1.valid  # clean data, self-snapshot → no drift
    with open(os.path.join(out1, "drift_snapshot.json")) as f:
        snapshot = json.load(f)

    # 2) validate the mixed batch AGAINST the stored snapshot
    out2 = str(tmp_path_factory.mktemp("drift_new"))
    rep2 = ValidationPipeline(SPEC, out2, snapshot=snapshot).run(mixed_dir, resume=False)

    drifted = {r["partition_id"] for r in rep2.drift if r["drifted"]}
    assert drifted == {2}, rep2.drift
    # all three drift dimensions fire on the shifted shard
    metrics_fired = {(r["column"], r["metric"]) for r in rep2.drift if r["drifted"]}
    assert metrics_fired == {("sr_hz", "ks"), ("dur_ms", "ks"), ("codec", "psi")}
    # verdicts: only partition 2 fails
    verdicts = dict(zip(rep2.partitions["partition_id"], rep2.partitions["verdict"]))
    assert verdicts[2] == "fail"
    assert all(v == "pass" for p, v in verdicts.items() if p != 2)
