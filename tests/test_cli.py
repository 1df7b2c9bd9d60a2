"""CLI driver (the `ray job submit` entry): validate + resume via main()."""

import json

import pytest

from schemasaurus_ray.cli import main
from schemasaurus_ray.sources.fixtures import write_fixture


@pytest.fixture(scope="module")
def fix(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("clifix"))
    return write_fixture(out, n=1000, shards=2, with_audio=False, inject=True)


def test_cli_validate_and_resume(fix, tmp_path_factory, capsys):
    out_dir = str(tmp_path_factory.mktemp("cliout"))
    rc = main([
        "validate", "--input", fix["clips"], "--out", out_dir,
        "--spec", "audio-meta", "--ref", f"transcripts={fix['transcripts']}",
    ])
    captured = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 3  # injected violations → validation failure exit code
    assert captured["valid"] is False
    assert captured["metrics"]["shards_validated_this_run"] == 2
    assert captured["metrics"]["duplicate_keys"] == 2
    assert captured["metrics"]["orphans"] == 2

    rc2 = main([
        "validate", "--input", fix["clips"], "--out", out_dir,
        "--spec", "audio-meta", "--ref", f"transcripts={fix['transcripts']}",
    ])
    captured2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc2 == 3
    assert captured2["metrics"]["shards_validated_this_run"] == 0  # resumed


def test_cli_snapshot(fix, tmp_path_factory, capsys):
    import os

    out_dir = str(tmp_path_factory.mktemp("clisnap"))
    rc = main(["snapshot", "--input", fix["clips"], "--out", out_dir, "--spec", "audio-meta"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(out["snapshot"])
    snap = json.load(open(out["snapshot"]))
    assert "numeric" in snap and "categorical" in snap


def test_cli_infer_then_validate(fix, tmp_path_factory, capsys):
    """Close the loop: `infer` a clean clip table → `validate` with the
    inferred spec → zero schema violations (referential/uniqueness checks
    come from the spec's table block, which inference doesn't add)."""
    import os

    spec_path = str(tmp_path_factory.mktemp("cliinfer") / "spec.json")
    rc = main([
        "infer", "--input", fix["clips"], "--out", spec_path,
        "--columns", "clip_id,sr_hz,dur_ms,codec",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    cols = out["spec"]["columns"]
    assert cols["sr_hz"]["type"] == "integer" and "minimum" in cols["sr_hz"]
    assert "enum" in cols["codec"]
    prof = {r["col_name"]: r for r in out["profile"]}
    assert prof["clip_id"]["n_distinct"] is None  # cap overflow on ids
    assert os.path.exists(spec_path)

    out_dir = str(tmp_path_factory.mktemp("cliinferval"))
    rc = main(["validate", "--input", fix["clips"], "--out", out_dir, "--spec", spec_path])
    captured = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # inferred bounds hold on the data they came from; the fixture's
    # injected violations target transcript/uniqueness rules not present
    # in an inferred column-only spec
    assert rc in (0, 3)
    assert captured["metrics"]["rows_total"] == 1000


def test_cli_infer_profile_snapshot_diff(fix, tmp_path_factory, capsys):
    """Spec-space drift is operational: --profile-out persists the merged
    profile; a later run --diff-snapshot's against it. Same table -> empty
    drift; a column subset -> presence rows."""
    d = tmp_path_factory.mktemp("clisnapdiff")
    prof_path = str(d / "profile.json")
    rc = main(["infer", "--input", fix["clips"], "--profile-out", prof_path,
               "--columns", "clip_id,sr_hz,codec"])
    assert rc == 0
    capsys.readouterr()
    rc = main(["infer", "--input", fix["clips"], "--diff-snapshot", prof_path,
               "--columns", "clip_id,sr_hz,codec"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["drift"] == []  # same table, same columns
    rc = main(["infer", "--input", fix["clips"], "--diff-snapshot", prof_path,
               "--columns", "clip_id,sr_hz"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    drift = {(r["col_name"], r["field"]): r for r in out["drift"]}
    assert drift[("codec", "presence")]["val_a_str"] == "present"
    assert drift[("codec", "presence")]["val_b_str"] is None


def test_cli_segment_and_resume(tmp_path_factory, ray_session, capsys):
    """segment: one output file per input shard, exact golden segment
    total from the burst fixture, second run skips every shard, and
    segment payloads decode to the exact source slice."""
    import glob
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from schemasaurus_ray.audio import wav_decode
    from schemasaurus_ray.sources.fixtures import make_burst_clips

    src = str(tmp_path_factory.mktemp("segsrc"))
    out_dir = str(tmp_path_factory.mktemp("segout"))
    clips = make_burst_clips(96)
    for s in range(3):
        pq.write_table(clips.slice(s * 32, 32), os.path.join(src, f"shard-{s}.parquet"))

    def n_expected(i):
        return 0 if (i % 17 == 0 or i % 19 == 0) else 1 + i % 3

    rc = main(["segment", "--input", src, "--out", out_dir])
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert got["shards"] == 3 and got["shards_skipped"] == 0
    assert got["segments"] == sum(n_expected(i) for i in range(96))

    rc2 = main(["segment", "--input", src, "--out", out_dir])
    got2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc2 == 0
    assert got2["shards_skipped"] == 3
    assert got2["segments"] == got["segments"]

    files = sorted(glob.glob(os.path.join(out_dir, "segments-*.parquet")))
    assert len(files) == 3
    seg = pq.read_table(files[0])
    ids = clips.column("clip_id").to_pylist()
    by_id = {ids[i]: i for i in range(96)}
    r = 0  # first segment row: payload decodes to the exact source slice
    cid = seg.column("clip_id")[r].as_py()
    s_ms, e_ms = seg.column("start_ms")[r].as_py(), seg.column("end_ms")[r].as_py()
    pcm, sr = wav_decode(clips.column("bytes")[by_id[cid]].as_py())
    spcm, ssr = wav_decode(seg.column("bytes")[r].as_py())
    assert ssr == sr
    np.testing.assert_array_equal(spcm, pcm[s_ms * sr // 1000 : e_ms * sr // 1000])


def test_cli_normalize_and_resume(tmp_path_factory, ray_session, capsys):
    """normalize: spec-driven coercion/defaults/extra-column removal over
    mixed parquet+jsonl shards, resumable per-shard output."""
    import glob
    import json as _json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path_factory.mktemp("normsrc"))
    out_dir = str(tmp_path_factory.mktemp("normout"))
    spec_file = os.path.join(src, "spec.json")
    spec = {
        "columns": {
            "id": {"type": "integer", "required": True},
            "score": {"type": "number", "default": 0.5},
            "name": {"type": "string"},
        },
        "table": {"key": "id"},
    }
    with open(spec_file, "w") as f:
        _json.dump(spec, f)
    t = pa.table(
        {
            "id": pa.array(["1", "2", "3"], pa.string()),  # coerced to int
            "score": pa.array([None, 2.0, None], pa.float64()),  # default fill
            "name": pa.array(["a", "b", "c"], pa.string()),
            "extra": pa.array([9, 9, 9], pa.int64()),  # removed
        }
    )
    pq.write_table(t.slice(0, 2), os.path.join(src, "s0.parquet"))
    with open(os.path.join(src, "s1.jsonl"), "w") as f:
        f.write('{"id": "4", "score": null, "name": "d", "extra": 1}\n')

    rc = main(["normalize", "--input", src, "--out", out_dir, "--spec", spec_file])
    got = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and got["shards"] == 2 and got["rows"] == 3
    files = sorted(glob.glob(os.path.join(out_dir, "normalized-*.parquet")))
    merged = pa.concat_tables([pq.read_table(f) for f in files]).sort_by("id")
    assert merged.column_names == ["id", "score", "name"]
    assert merged.column("id").to_pylist() == [1, 2, 4]
    assert merged.column("score").to_pylist() == [0.5, 2.0, 0.5]

    rc2 = main(["normalize", "--input", src, "--out", out_dir, "--spec", spec_file])
    got2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc2 == 0 and got2["shards_skipped"] == 2 and got2["rows"] == 3
