"""End-to-end: synthetic audio table with injected violations at known
positions → golden verdicts/violations; resume test (SURVEY.md §5 items 3+5)."""

import json
import os

import pyarrow.parquet as pq
import pytest

from schemasaurus_ray.pipelines.validate import ValidationPipeline
from schemasaurus_ray.sources.fixtures import write_fixture
from schemasaurus_ray.specs import AUDIO_CLIP_SPEC

N = 4000


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("audio_fixture"))
    dirs = write_fixture(out, n=N, shards=8, with_audio=True, inject=True)
    return dirs


def expected_counts(n=N):
    i = range(n)
    return {
        "required_transcript": sum(1 for j in i if j % 500 == 7),
        "dup_ids": sum(1 for j in i if j % 500 == 131),
        "sr_enum": sum(1 for j in i if j % 1000 == 11),
        "dur_zero": sum(1 for j in i if j % 1000 == 13),
        "codec_mp3": sum(1 for j in i if j % 1000 == 17),
        "pattern": sum(1 for j in i if j % 2000 == 19),
        "pcm": sum(1 for j in i if j % 2000 == 23),
    }


@pytest.fixture(scope="module")
def report(fixture_dirs, tmp_path_factory, ray_session):
    import ray.data as rd

    out_dir = str(tmp_path_factory.mktemp("val_out"))
    pipe = ValidationPipeline(AUDIO_CLIP_SPEC, out_dir)
    rep = pipe.run(
        fixture_dirs["clips"],
        ref_datasets={"transcripts": rd.read_parquet(fixture_dirs["transcripts"])},
        resume=False,
    )
    return rep, out_dir


def load_violations(out_dir):
    import glob

    tables = []
    for f in glob.glob(os.path.join(out_dir, "violations", "**", "*.parquet"), recursive=True):
        tables.append(pq.read_table(f))
    import pyarrow as pa

    rows = []
    for t in tables:
        for r in t.to_pylist():
            rows.append(r)
    return rows


def test_golden_violation_counts(report):
    rep, out_dir = report
    exp = expected_counts()
    viols = load_violations(out_dir)
    by_code = {}
    for v in viols:
        key = (v["column"], v["code"])
        by_code[key] = by_code.get(key, 0) + 1

    assert by_code[("transcript", "required")] == exp["required_transcript"]
    assert by_code[("codec", "enum")] == exp["codec_mp3"]
    assert by_code[("dur_ms", "minimum.exclusive")] == exp["dur_zero"]
    assert by_code[("clip_id", "pattern")] == exp["pattern"]
    assert by_code[("bytes", "custom.pcm")] == exp["pcm"]
    # sr violations: enum always fires; min/max fire for 3000/96001
    assert by_code[("sr_hz", "enum")] == exp["sr_enum"]
    assert by_code.get(("sr_hz", "minimum"), 0) + by_code.get(("sr_hz", "maximum"), 0) == exp["sr_enum"]
    # duplicates: each duplicated key occurs 2x → 2 rows per dup key... the
    # unique rule reports KEYS with count>1
    assert by_code[("clip_id", "unique")] == exp["dup_ids"]


def test_referential_orphans(report):
    rep, _ = report
    # orphan clips: transcript rows dropped at i%500==77 → those clip_ids
    # have no transcript row
    exp_orphans = sum(1 for j in range(N) if j % 500 == 77)
    assert rep.metrics["orphans"] == exp_orphans


def test_partition_verdicts(report):
    rep, _ = report
    assert len(rep.partitions) == 8
    assert (rep.partitions["rows"].sum()) == N
    # every shard contains injected violations at N=4000/8 shards
    assert (rep.partitions["verdict"] == "fail").all()
    assert not rep.valid


def test_stats(report):
    rep, _ = report
    stats = {r["column"]: r for r in rep.stats.to_pylist()}
    assert stats["sr_hz"]["count"] == N
    assert stats["transcript"]["nulls"] == expected_counts()["required_transcript"]
    assert stats["sr_hz"]["min"] == 3000.0
    assert stats["sr_hz"]["max"] == 96001.0
    # clip_id distinct ≈ N - dups (HLL within 3%)
    approx = stats["clip_id"]["approx_distinct"]
    true = N - expected_counts()["dup_ids"]
    assert abs(approx - true) / true < 0.05


def test_drift_detected(report):
    rep, _ = report
    # partition 0 of the fixture's HASH partitioning is drifted, but pipeline
    # partitions are input shards; the drifted rows spread across shards.
    # With no stored snapshot the pipeline self-snapshots: drift records must
    # exist and KS/PSI values be finite.
    assert len(rep.drift) > 0
    assert all(r["value"] == r["value"] for r in rep.drift)  # not NaN


def test_manifest_lineage(report):
    rep, out_dir = report
    with open(rep.manifest_path) as f:
        manifest = json.load(f)
    assert manifest["rule_hash"] == rep.metrics["rule_hash"]
    assert len(manifest["partitions"]) == 8
    for pid, rec in manifest["partitions"].items():
        assert rec["path"].endswith(".parquet")
        assert rec["row_pass_done"] is True


def test_resume_skips_completed(fixture_dirs, report, ray_session):
    import ray.data as rd

    rep, out_dir = report
    pipe = ValidationPipeline(AUDIO_CLIP_SPEC, out_dir)
    rep2 = pipe.run(
        fixture_dirs["clips"],
        ref_datasets={"transcripts": rd.read_parquet(fixture_dirs["transcripts"])},
        resume=True,
    )
    assert rep2.metrics["shards_validated_this_run"] == 0
    assert rep2.metrics["rows_validated_this_run"] == 0
    # verdicts identical to the full run
    assert rep2.partitions["rows"].sum() == N
    assert (rep2.partitions["verdict"] == rep.partitions["verdict"]).all()
    # global checks still re-ran
    assert rep2.metrics["duplicate_keys"] == rep.metrics["duplicate_keys"]
    assert rep2.metrics["orphans"] == rep.metrics["orphans"]


def test_partial_resume(fixture_dirs, tmp_path_factory, ray_session):
    """Fresh out_dir: validate only 3 shards (simulated interrupt), then
    resume over all 8 — completed shards are skipped, final manifest covers
    all 8 with the same totals as a clean full run."""
    import glob

    import ray.data as rd

    out_dir = str(tmp_path_factory.mktemp("val_partial"))
    all_shards = sorted(glob.glob(os.path.join(fixture_dirs["clips"], "*.parquet")))

    pipe = ValidationPipeline(AUDIO_CLIP_SPEC, out_dir)
    rep1 = pipe.run(all_shards[:3], resume=True)
    assert rep1.metrics["shards_validated_this_run"] == 3

    pipe2 = ValidationPipeline(AUDIO_CLIP_SPEC, out_dir)
    rep2 = pipe2.run(fixture_dirs["clips"], resume=True)
    assert rep2.metrics["shards_validated_this_run"] == 5
    assert rep2.partitions["rows"].sum() == N


def test_spec_change_invalidates_resume(fixture_dirs, tmp_path_factory, ray_session):
    """A changed rule pack (different rule_hash) must re-validate everything —
    stale per-partition results from another spec are never reused."""
    import copy

    out_dir = str(tmp_path_factory.mktemp("val_specchange"))
    spec1 = copy.deepcopy(AUDIO_CLIP_SPEC)
    pipe1 = ValidationPipeline(spec1, out_dir)
    rep1 = pipe1.run(fixture_dirs["clips"], resume=True)
    assert rep1.metrics["shards_validated_this_run"] == 8

    spec2 = copy.deepcopy(AUDIO_CLIP_SPEC)
    spec2["columns"]["dur_ms"]["maximum"] = 50000  # different rule pack
    pipe2 = ValidationPipeline(spec2, out_dir)
    rep2 = pipe2.run(fixture_dirs["clips"], resume=True)
    assert rep2.metrics["shards_validated_this_run"] == 8  # full re-run
    assert rep2.metrics["rule_hash"] != rep1.metrics["rule_hash"]


def test_key_checks_run_from_partials_not_input(fixture_dirs, tmp_path_factory, ray_session):
    """One-scan property: after a full run, the fused uniqueness/referential
    checks on resume read ONLY the persisted per-shard key pre-aggs —
    proven by poisoning every clip shard's clip_id column between runs and
    asserting identical duplicate/orphan metrics."""
    import glob
    import shutil

    import pyarrow as pa
    import ray.data as rd

    work = tmp_path_factory.mktemp("onescan")
    clips_dir = str(work / "clips")
    shutil.copytree(fixture_dirs["clips"], clips_dir)
    out_dir = str(work / "out")

    pipe = ValidationPipeline(AUDIO_CLIP_SPEC, out_dir)
    rep1 = pipe.run(
        clips_dir, ref_datasets={"transcripts": rd.read_parquet(fixture_dirs["transcripts"])}
    )
    assert rep1.metrics["duplicate_keys"] > 0 and rep1.metrics["orphans"] > 0

    for f in sorted(glob.glob(os.path.join(clips_dir, "*.parquet"))):
        t = pq.read_table(f)
        poisoned = t.set_column(
            t.column_names.index("clip_id"),
            "clip_id",
            pa.array(["POISON"] * t.num_rows, pa.string()),
        )
        pq.write_table(poisoned, f)

    rep2 = ValidationPipeline(AUDIO_CLIP_SPEC, out_dir).run(
        clips_dir,
        ref_datasets={"transcripts": rd.read_parquet(fixture_dirs["transcripts"])},
        resume=True,
    )
    assert rep2.metrics["shards_validated_this_run"] == 0
    assert rep2.metrics["duplicate_keys"] == rep1.metrics["duplicate_keys"]
    assert rep2.metrics["orphans"] == rep1.metrics["orphans"]


def test_composite_key_checks_run_from_partials(tmp_path_factory, ray_session):
    """One-scan invariant for MULTI-COLUMN unique rules (VERDICT r2 #10):
    the row pass persists a composite (codec, transcript) pre-agg and the
    uniqueness shuffle must run entirely from it — proven by poisoning
    every key column on disk between runs and asserting identical metrics."""
    import copy
    import glob

    import pyarrow as pa

    from schemasaurus_ray.specs import AUDIO_CLIP_SPEC_NO_BYTES

    spec = copy.deepcopy(AUDIO_CLIP_SPEC_NO_BYTES)
    spec["table"] = dict(spec["table"], unique=["clip_id", ["codec", "transcript"]], references=[])

    d = tmp_path_factory.mktemp("composite_in")
    rows = [
        # one clip_id duplicate (rows 0/1), one (codec, transcript) duplicate
        # across shards (rows 2 and 4)
        ("clip-0000000001", 16000, 500, "wav", "alpha"),
        ("clip-0000000001", 16000, 500, "flac", "beta"),
        ("clip-0000000002", 16000, 500, "opus", "gamma"),
    ], [
        ("clip-0000000003", 16000, 500, "wav", "delta"),
        ("clip-0000000004", 16000, 500, "opus", "gamma"),
    ]
    for s, shard_rows in enumerate(rows):
        t = pa.table(
            {
                "clip_id": pa.array([r[0] for r in shard_rows], pa.string()),
                "sr_hz": pa.array([r[1] for r in shard_rows], pa.int32()),
                "dur_ms": pa.array([r[2] for r in shard_rows], pa.int32()),
                "codec": pa.array([r[3] for r in shard_rows], pa.string()),
                "transcript": pa.array([r[4] for r in shard_rows], pa.string()),
            }
        )
        pq.write_table(t, str(d / f"shard-{s:05d}.parquet"))

    out = str(tmp_path_factory.mktemp("composite_out"))
    rep1 = ValidationPipeline(spec, out).run(str(d), resume=False)
    assert rep1.metrics["duplicate_keys"] == 2  # clip_id dup + composite dup

    # composite partials exist under the '+'-joined name
    assert glob.glob(os.path.join(out, "partials", "keys_codec+transcript_p*.parquet"))

    for f in sorted(glob.glob(os.path.join(str(d), "*.parquet"))):
        t = pq.read_table(f)
        for col in ("clip_id", "codec", "transcript"):
            t = t.set_column(
                t.column_names.index(col), col, pa.array(["POISON"] * t.num_rows, pa.string())
            )
        pq.write_table(t, f)

    rep2 = ValidationPipeline(spec, out).run(str(d), resume=True)
    assert rep2.metrics["shards_validated_this_run"] == 0
    assert rep2.metrics["duplicate_keys"] == rep1.metrics["duplicate_keys"]


def test_unfused_referential_runs_from_partials(tmp_path_factory, ray_session):
    """One-scan invariant for a referential rule WITHOUT a matching unique
    rule (no fusion): the anti-join's left side must load the row pass's
    persisted pre-aggs instead of re-reading the input."""
    import copy
    import glob

    import pyarrow as pa
    import ray.data as rd

    from schemasaurus_ray.specs import AUDIO_CLIP_SPEC_NO_BYTES

    spec = copy.deepcopy(AUDIO_CLIP_SPEC_NO_BYTES)
    spec["table"] = dict(
        spec["table"],
        unique=[],
        references=[{"column": "clip_id", "table": "transcripts", "key": "clip_id"}],
    )

    d = tmp_path_factory.mktemp("unfused_in")
    t = pa.table(
        {
            "clip_id": pa.array([f"clip-{i:010d}" for i in range(6)], pa.string()),
            "sr_hz": pa.array([16000] * 6, pa.int32()),
            "dur_ms": pa.array([500] * 6, pa.int32()),
            "codec": pa.array(["wav"] * 6, pa.string()),
            "transcript": pa.array(["t"] * 6, pa.string()),
        }
    )
    pq.write_table(t, str(d / "shard-00000.parquet"))
    tr = pa.table({"clip_id": pa.array([f"clip-{i:010d}" for i in range(4)], pa.string())})
    trd = tmp_path_factory.mktemp("unfused_tr")
    pq.write_table(tr, str(trd / "t.parquet"))

    out = str(tmp_path_factory.mktemp("unfused_out"))
    rep1 = ValidationPipeline(spec, out).run(
        str(d), ref_datasets={"transcripts": rd.read_parquet(str(trd))}, resume=False
    )
    assert rep1.metrics["orphans"] == 2  # clips 4 and 5 have no transcript

    for f in sorted(glob.glob(os.path.join(str(d), "*.parquet"))):
        p = pq.read_table(f)
        p = p.set_column(
            p.column_names.index("clip_id"),
            "clip_id",
            pa.array(["POISON"] * p.num_rows, pa.string()),
        )
        pq.write_table(p, f)

    rep2 = ValidationPipeline(spec, out).run(
        str(d), ref_datasets={"transcripts": rd.read_parquet(str(trd))}, resume=True
    )
    assert rep2.metrics["shards_validated_this_run"] == 0
    assert rep2.metrics["orphans"] == 2


def test_global_violations_fail_validity(tmp_path_factory, ray_session):
    """Clean rows but a duplicated key → report.valid must be False even
    though every partition's bad_rows is 0 (code-review finding #1)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("dupsonly")
    t = pa.table({
        "clip_id": pa.array(["clip-0000000001", "clip-0000000001", "clip-0000000002"], pa.string()),
        "sr_hz": pa.array([16000, 16000, 16000], pa.int32()),
        "dur_ms": pa.array([500, 500, 500], pa.int32()),
        "codec": pa.array(["wav", "wav", "wav"], pa.string()),
        "transcript": pa.array(["a", "b", "c"], pa.string()),
    })
    pq.write_table(t, str(d / "x.parquet"))
    from schemasaurus_ray.specs import AUDIO_CLIP_SPEC_NO_BYTES

    out = str(tmp_path_factory.mktemp("dupsout"))
    rep = ValidationPipeline(AUDIO_CLIP_SPEC_NO_BYTES, out).run(str(d), resume=False)
    assert rep.metrics["row_violations"] == 0
    assert rep.metrics["duplicate_keys"] == 1
    assert (rep.partitions["bad_rows"] == 0).all()
    # the duplicated key is attributed back to its shard's verdict
    assert rep.partitions["bad_keys"].sum() >= 1
    assert (rep.partitions["verdict"] == "fail").any()
    assert rep.valid is False


def test_row_violations_streamed_by_tasks(report):
    """Per-row violation rows are written by the map tasks into
    violations/p*/part-r-<hash>.parquet during the pass — the driver only
    sees count rows. Re-running must not duplicate rows (idempotent
    content-hashed names + stale-file cleanup)."""
    import glob

    rep, out_dir = report
    task_files = glob.glob(os.path.join(out_dir, "violations", "p*", "part-r-*.parquet"))
    assert task_files, "no task-side violation files written"
    n_rows = sum(pq.read_table(f).num_rows for f in task_files)
    assert n_rows == rep.metrics["row_violations"] > 0


def test_key_violations_land_in_partition_dirs(report):
    """pid-attributed unique/reference violation rows are sunk into their
    source partition's directory (part-global.parquet), not a global bucket."""
    import glob

    rep, out_dir = report
    per_part = glob.glob(os.path.join(out_dir, "violations", "p*", "part-global.parquet"))
    assert per_part, "no per-partition key-violation files written"
    rows = []
    for f in per_part:
        rows.extend(pq.read_table(f).to_pylist())
    codes = {r["code"] for r in rows}
    assert codes == {"unique", "reference"}
    exp = expected_counts()
    assert sum(1 for r in rows if r["code"] == "unique") == exp["dup_ids"]
    # orphan rows: one per (key, source shard); fixture orphans are one-shard
    assert sum(1 for r in rows if r["code"] == "reference") == sum(
        1 for j in range(N) if j % 500 == 77
    )
    # nothing left in the unattributed global bucket for the fused rules
    assert not os.path.exists(os.path.join(out_dir, "violations", "global", "part-0.parquet"))


def test_sub_block_batches_keep_sink_rows_exact(tmp_path_factory, ray_session):
    """batch_size smaller than a block (ADVICE r2 high): every sliced batch
    must get a DISTINCT sink chunk id, or sibling batches overwrite each
    other's violation/key-partial files. One 2000-row shard, every row
    violating, batch_size=250 → 8 batches; on-disk violation rows must equal
    the metric, and duplicate-key counts (from persisted partials on resume)
    must stay exact."""
    import glob

    import pyarrow as pa

    from schemasaurus_ray.specs import AUDIO_CLIP_SPEC_NO_BYTES

    d = tmp_path_factory.mktemp("subblock")
    n = 2000
    t = pa.table({
        "clip_id": pa.array([f"clip-{i // 2:010d}" for i in range(n)], pa.string()),  # all dup pairs
        "sr_hz": pa.array([999] * n, pa.int32()),  # enum violation on every row
        "dur_ms": pa.array([500] * n, pa.int32()),
        "codec": pa.array(["wav"] * n, pa.string()),
        "transcript": pa.array(["ok"] * n, pa.string()),
    })
    pq.write_table(t, str(d / "x.parquet"))
    out = str(tmp_path_factory.mktemp("subblock_out"))
    rep = ValidationPipeline(AUDIO_CLIP_SPEC_NO_BYTES, out, batch_size=250).run(str(d), resume=False)
    task_files = glob.glob(os.path.join(out, "violations", "p*", "part-r-*.parquet"))
    on_disk = sum(pq.read_table(f).num_rows for f in task_files)
    # sr enum + sr minimum both miss 999? enum fires; 999 < 8000 minimum also
    # fires — whatever the per-row count, disk must equal the metric exactly
    assert on_disk == rep.metrics["row_violations"] >= n
    assert rep.metrics["duplicate_keys"] == n // 2
    # resume re-runs key checks from the persisted per-batch partials only
    rep2 = ValidationPipeline(AUDIO_CLIP_SPEC_NO_BYTES, out, batch_size=250).run(str(d), resume=True)
    assert rep2.metrics["shards_validated_this_run"] == 0
    assert rep2.metrics["duplicate_keys"] == n // 2


def test_many_shards_key_checks_exact(tmp_path_factory, ray_session):
    """40 shards (pids 0..39): pid 3 vs 31 etc. exercise the partial-file
    pid-prefix namespace; duplicate/orphan counts must be exact."""
    import pyarrow as pa

    from schemasaurus_ray.specs import AUDIO_CLIP_SPEC_NO_BYTES

    d = tmp_path_factory.mktemp("manyshards")
    n_shards, per = 40, 50
    dup_ids = {f"clip-{7:010d}", f"clip-{1207:010d}"}  # planted cross-shard dups
    for s in range(n_shards):
        ids = [f"clip-{s * per + i:010d}" for i in range(per)]
        if s == 20:
            ids[0] = f"clip-{7:010d}"  # dup of shard 0's row 7
        if s == 35:
            ids[1] = f"clip-{1207:010d}"  # dup of shard 24's row 7
        t = pa.table({
            "clip_id": pa.array(ids, pa.string()),
            "sr_hz": pa.array([16000] * per, pa.int32()),
            "dur_ms": pa.array([500] * per, pa.int32()),
            "codec": pa.array(["wav"] * per, pa.string()),
            "transcript": pa.array(["ok"] * per, pa.string()),
        })
        pq.write_table(t, str(d / f"s{s:03d}.parquet"))
    out = str(tmp_path_factory.mktemp("manyshards_out"))
    rep = ValidationPipeline(AUDIO_CLIP_SPEC_NO_BYTES, out).run(str(d), resume=True)
    assert rep.metrics["duplicate_keys"] == len(dup_ids)
    # resume re-run: key checks now load 40 shards' partials — still exact
    rep2 = ValidationPipeline(AUDIO_CLIP_SPEC_NO_BYTES, out).run(str(d), resume=True)
    assert rep2.metrics["shards_validated_this_run"] == 0
    assert rep2.metrics["duplicate_keys"] == len(dup_ids)


def test_quantile_constraints_in_pipeline(tmp_path_factory, ray_session):
    """Table-level percentile constraints ride the stats t-digests: a
    satisfiable p99 bound passes, an impossible p50 bound fails the run
    with a global quantile.maximum violation row — and the verdict
    survives resume (t-digest partials reload from disk)."""
    import json
    import os

    import pyarrow.parquet as pq

    from schemasaurus_ray.pipelines.validate import ValidationPipeline
    from schemasaurus_ray.sources.fixtures import write_fixture
    from schemasaurus_ray.specs import AUDIO_CLIP_SPEC_NO_BYTES

    fix = write_fixture(
        str(tmp_path_factory.mktemp("qcfix")), n=1000, shards=2, with_audio=False, inject=False
    )
    spec = json.loads(json.dumps(AUDIO_CLIP_SPEC_NO_BYTES))  # deep copy
    spec["table"]["quantile_checks"] = [
        {"column": "dur_ms", "q": 0.99, "maximum": 100000},   # holds
        {"column": "dur_ms", "q": 0.5, "maximum": 1},         # impossible
        {"column": "sr_hz", "q": 0.5, "minimum": 1},          # holds
    ]
    out_dir = str(tmp_path_factory.mktemp("qcout"))
    report = ValidationPipeline(spec, out_dir).run(fix["clips"])
    assert report.metrics["quantile_violations"] == 1
    assert report.valid is False
    gv = pq.read_table(os.path.join(out_dir, "violations", "global", "part-0.parquet"))
    codes = set(gv.column("code").to_pylist())
    assert "quantile.maximum" in codes
    manifest = json.load(open(report.manifest_path))
    assert sum(q["breached"] for q in manifest["quantiles"]) == 1
    # resume: no shards re-validated, verdict identical from reloaded partials
    report2 = ValidationPipeline(spec, out_dir).run(fix["clips"])
    assert report2.metrics["shards_validated_this_run"] == 0
    assert report2.metrics["quantile_violations"] == 1
    assert report2.valid is False


def test_jsonl_shards_match_parquet_pipeline(ray_session, tmp_path_factory):
    """SOURCE PARITY end-to-end: the SAME clip metadata validated from
    parquet shards and from JSONL shards yields identical metrics and
    violation multisets; the JSONL run resumes like the parquet one."""
    import glob
    import json as _json
    import os

    import pyarrow.parquet as pq

    from schemasaurus_ray.pipelines.validate import ValidationPipeline
    from schemasaurus_ray.sources.fixtures import write_fixture
    from schemasaurus_ray.specs import AUDIO_CLIP_SPEC_NO_BYTES

    base = str(tmp_path_factory.mktemp("jsonl_e2e"))
    dirs = write_fixture(os.path.join(base, "fix"), n=1500, shards=3,
                         with_audio=False, inject=True)
    jl_dir = os.path.join(base, "clips_jsonl")
    os.makedirs(jl_dir)
    cols = None
    for p in sorted(glob.glob(os.path.join(dirs["clips"], "*.parquet"))):
        t = pq.read_table(p).drop_columns(["bytes"])
        cols = t.column_names
        stem = os.path.splitext(os.path.basename(p))[0]
        with open(os.path.join(jl_dir, f"{stem}.jsonl"), "w") as f:
            for vals in zip(*(t.column(c).to_pylist() for c in cols)):
                f.write(_json.dumps(dict(zip(cols, vals))) + "\n")

    def run(src, out):
        pipe = ValidationPipeline(AUDIO_CLIP_SPEC_NO_BYTES, out)
        import ray.data as rd

        return pipe.run(src, ref_datasets={"transcripts": rd.read_parquet(dirs["transcripts"])})

    rep_pq = run(dirs["clips"], os.path.join(base, "out_pq"))
    rep_jl = run(jl_dir, os.path.join(base, "out_jl"))
    for k in ("rows_total", "duplicate_keys", "orphans", "row_violations"):
        if k in rep_pq.metrics:
            assert rep_jl.metrics[k] == rep_pq.metrics[k], k

    def violation_multiset(out):
        files = glob.glob(os.path.join(out, "violations", "p*", "part-*.parquet"))
        rows = []
        for f in files:
            t = pq.read_table(f)
            keep = [c for c in ("row_ref", "col", "code") if c in t.column_names]
            rows.extend(map(tuple, zip(*(t.column(c).to_pylist() for c in keep))))
        return sorted(rows)

    assert violation_multiset(os.path.join(base, "out_jl")) == violation_multiset(
        os.path.join(base, "out_pq")
    )
    # resume: second jsonl run validates nothing new
    rep2 = run(jl_dir, os.path.join(base, "out_jl"))
    assert rep2.metrics["shards_validated_this_run"] == 0


def test_csv_shards_match_parquet_pipeline(ray_session, tmp_path_factory):
    """SOURCE PARITY end-to-end #2: the SAME clip metadata validated from
    parquet shards and from CSV shards yields identical metrics and
    violation multisets (null-vs-empty fidelity via arrow csv quoting);
    the CSV run resumes like the parquet one."""
    import glob
    import os

    import pyarrow.csv as pcsv
    import pyarrow.parquet as pq

    from schemasaurus_ray.pipelines.validate import ValidationPipeline
    from schemasaurus_ray.sources.fixtures import write_fixture
    from schemasaurus_ray.specs import AUDIO_CLIP_SPEC_NO_BYTES

    base = str(tmp_path_factory.mktemp("csv_e2e"))
    dirs = write_fixture(os.path.join(base, "fix"), n=1500, shards=3,
                         with_audio=False, inject=True)
    csv_dir = os.path.join(base, "clips_csv")
    os.makedirs(csv_dir)
    for p in sorted(glob.glob(os.path.join(dirs["clips"], "*.parquet"))):
        t = pq.read_table(p).drop_columns(["bytes"])
        stem = os.path.splitext(os.path.basename(p))[0]
        pcsv.write_csv(t, os.path.join(csv_dir, f"{stem}.csv"))

    def run(src, out):
        pipe = ValidationPipeline(AUDIO_CLIP_SPEC_NO_BYTES, out)
        import ray.data as rd

        return pipe.run(src, ref_datasets={"transcripts": rd.read_parquet(dirs["transcripts"])})

    rep_pq = run(dirs["clips"], os.path.join(base, "out_pq"))
    rep_csv = run(csv_dir, os.path.join(base, "out_csv"))
    for k in ("rows_total", "duplicate_keys", "orphans", "row_violations"):
        if k in rep_pq.metrics:
            assert rep_csv.metrics[k] == rep_pq.metrics[k], k

    def violation_multiset(out):
        files = glob.glob(os.path.join(out, "violations", "p*", "part-*.parquet"))
        rows = []
        for f in files:
            t = pq.read_table(f)
            keep = [c for c in ("row_ref", "col", "code") if c in t.column_names]
            rows.extend(map(tuple, zip(*(t.column(c).to_pylist() for c in keep))))
        return sorted(rows)

    assert violation_multiset(os.path.join(base, "out_csv")) == violation_multiset(
        os.path.join(base, "out_pq")
    )
    rep2 = run(csv_dir, os.path.join(base, "out_csv"))
    assert rep2.metrics["shards_validated_this_run"] == 0


def test_quarantine_and_resume_repair(tmp_path, ray_session):
    """on_error='skip': a corrupt shard quarantines (run completes, report
    invalid, shard NOT marked done); after repairing the file, resume
    validates ONLY the repaired shard and the report goes clean."""
    import shutil

    fix = str(tmp_path / "fx")
    dirs = write_fixture(fix, n=1000, shards=4, with_audio=True, inject=False)
    shard_files = sorted(
        os.path.join(dirs["clips"], f) for f in os.listdir(dirs["clips"]) if f.endswith(".parquet")
    )
    victim = shard_files[1]
    backup = victim + ".bak"
    shutil.copy(victim, backup)
    with open(victim, "wb") as f:
        f.write(b"PAR1 corrupted beyond recognition")

    out_dir = str(tmp_path / "out")
    pipe = ValidationPipeline(AUDIO_CLIP_SPEC, out_dir, on_error="skip")
    rep = pipe.run(dirs["clips"], ref_datasets={"transcripts": dirs["transcripts"]})
    assert rep.metrics["quarantined_shards"] == [victim]
    assert not rep.valid  # unread rows can never be declared valid
    assert rep.metrics["rows_total"] == 750  # 3 of 4 shards
    manifest = json.load(open(rep.manifest_path))
    done_paths = {r["path"] for r in manifest["partitions"].values() if r.get("row_pass_done")}
    assert victim not in done_paths

    os.replace(backup, victim)  # repair
    rep2 = ValidationPipeline(AUDIO_CLIP_SPEC, out_dir, on_error="skip").run(
        dirs["clips"], ref_datasets={"transcripts": dirs["transcripts"]}
    )
    assert rep2.metrics["shards_validated_this_run"] == 1  # only the repaired one
    assert rep2.metrics["rows_total"] == 1000
    # the reader cleared the stale record once the shard read fine
    assert rep2.metrics["quarantined_shards"] == []

    # repaired-resume ≡ never-corrupted: a control run on pristine input
    # must produce identical verdict-relevant metrics
    ctrl = ValidationPipeline(AUDIO_CLIP_SPEC, str(tmp_path / "ctrl")).run(
        dirs["clips"], ref_datasets={"transcripts": dirs["transcripts"]}
    )
    for k in ("rows_total", "row_violations", "duplicate_keys", "orphans",
              "quantile_violations"):
        assert rep2.metrics[k] == ctrl.metrics[k], k
    assert rep2.valid == ctrl.valid
    assert sorted(rep2.partitions["verdict"]) == sorted(ctrl.partitions["verdict"])
