"""CLI driver — the ``ray job submit`` entry point (north_rule: "runs are
submitted with ray job submit to fixed-size multi-node clusters").

Usage (local or as a Ray job):

    python -m schemasaurus_ray.cli validate --input /data/clips \
        --out /data/val_out --spec audio \
        [--ref transcripts=/data/transcripts] [--snapshot snap.json] \
        [--no-resume] [--num-cpus 32]

    python -m schemasaurus_ray.cli snapshot --input /data/clips \
        --out /data/val_out --spec audio       # write drift_snapshot.json

On a cluster: ``ray job submit --working-dir . -- python -m
schemasaurus_ray.cli validate ...`` — the script only calls ``ray.init()``
when no session exists (the job server provides one).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    from .util import apply_malloc_tuning

    if not ray.is_initialized():
        apply_malloc_tuning()  # before ray.init so workers inherit it
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
            kwargs["address"] = "local"
        ray.init(**kwargs)


def _load_spec(name_or_path: str) -> dict:
    if name_or_path == "audio":
        from .specs import AUDIO_CLIP_SPEC

        return AUDIO_CLIP_SPEC
    if name_or_path == "audio-meta":
        from .specs import AUDIO_CLIP_SPEC_NO_BYTES

        return AUDIO_CLIP_SPEC_NO_BYTES
    with open(name_or_path) as f:
        return json.load(f)


def _cmd_infer(args) -> int:
    """infer: one streaming pass → suggested spec (stages/infer.py), the
    inverse of validate — close the loop with
    ``validate --spec <out.json>``."""
    import glob
    import json as _json
    import os

    import pyarrow as pa

    from .sources.io import read_parquet_tasks
    from .stages.infer import (
        batch_infer_partial,
        merge_infer_partials,
        profile_to_spec,
        profile_to_table,
    )

    paths = (
        sorted(glob.glob(os.path.join(args.input, "*.parquet")))
        if os.path.isdir(args.input)
        else [args.input]
    )
    cols = args.columns.split(",") if args.columns else None
    ds = read_parquet_tasks(paths, columns=cols)

    def part(batch: pa.Table) -> pa.Table:
        recs = batch_infer_partial(batch, columns=cols)
        return pa.table({"payload": pa.array([_json.dumps(recs)], pa.string())})

    partials: list[dict] = []
    for b in ds.map_batches(part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for rec in b.column("payload").to_pylist():
            partials.extend(_json.loads(rec))
    prof = merge_infer_partials(partials)
    spec = profile_to_spec(prof)
    if args.out:
        with open(args.out, "w") as f:
            _json.dump(spec, f, indent=2, sort_keys=True)
    if args.profile_out:
        from .stages.infer import profile_to_json

        with open(args.profile_out, "w") as f:
            f.write(profile_to_json(prof))
    result = {"spec": spec, "profile": profile_to_table(prof).to_pylist()}
    if args.diff_snapshot:
        from .stages.infer import profile_from_json, spec_diff_profiles

        with open(args.diff_snapshot) as f:
            old = profile_from_json(f.read())
        # diff orientation: a = snapshot (then), b = current table (now)
        result["drift"] = spec_diff_profiles(old, prof).to_pylist()
    print(_json.dumps(result, sort_keys=True))
    return 0


def _cmd_segment(args) -> int:
    """segment: VAD utterance splitting over clip shards → partitioned
    parquet, one output file per input shard (idempotent names + atomic
    rename, so a re-run skips finished shards — the same resumable-sink
    contract as the validation pipeline's violation stream)."""
    import glob
    import json as _json
    import os

    import ray

    paths = (
        sorted(glob.glob(os.path.join(args.input, "*.parquet")))
        if os.path.isdir(args.input)
        else [args.input]
    )
    os.makedirs(args.out, exist_ok=True)
    opts = dict(
        frame_ms=args.frame_ms,
        thresh_db=args.thresh_db,
        min_silence_ms=args.min_silence_ms,
        min_segment_ms=args.min_segment_ms,
        emit_bytes=not args.no_bytes,
    )
    out_dir = args.out

    @ray.remote
    def seg_shard(path: str) -> dict:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from schemasaurus_ray.functions.multimodal import AudioSegmentStage

        stem = os.path.splitext(os.path.basename(path))[0]
        out_name = os.path.join(out_dir, f"segments-{stem}.parquet")
        if os.path.exists(out_name):
            return {
                "shard": stem,
                "skipped": True,
                "segments": pq.read_metadata(out_name).num_rows,
            }
        stage = AudioSegmentStage(**opts)
        parts = []
        pf = pq.ParquetFile(path)
        for rb in pf.iter_batches(batch_size=256, columns=["clip_id", "bytes"]):
            parts.append(stage(pa.Table.from_batches([rb])))
        out = pa.concat_tables(parts) if parts else stage(
            pa.table({"clip_id": pa.array([], pa.string()), "bytes": pa.array([], pa.binary())})
        )
        tmp = f"{out_name}.tmp.{os.getpid()}"
        pq.write_table(out, tmp)
        os.replace(tmp, out_name)
        return {"shard": stem, "skipped": False, "segments": out.num_rows}

    results = ray.get([seg_shard.remote(p) for p in paths])
    summary = {
        "shards": len(results),
        "shards_skipped": sum(r["skipped"] for r in results),
        "segments": sum(r["segments"] for r in results),
        "out": out_dir,
    }
    print(_json.dumps(summary, sort_keys=True))
    return 0


def _cmd_normalize(args) -> int:
    """normalize: the reference's second entry point (newNormalizer) as a
    production path — spec-driven defaults / type coercion / extra-column
    removal over shards → partitioned parquet, one output per input shard
    (idempotent names + atomic rename; re-run skips finished shards)."""
    import glob
    import json as _json
    import os

    import ray

    spec = _load_spec(args.spec)
    paths = (
        sorted(glob.glob(os.path.join(args.input, "*.parquet")))
        + sorted(glob.glob(os.path.join(args.input, "*.jsonl")))
        if os.path.isdir(args.input)
        else [args.input]
    )
    os.makedirs(args.out, exist_ok=True)
    out_dir, keep_extra = args.out, args.keep_extra

    @ray.remote
    def norm_shard(path: str) -> dict:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from schemasaurus_ray.stages.normalize import NormalizeStage

        stem = os.path.splitext(os.path.basename(path))[0]
        out_name = os.path.join(out_dir, f"normalized-{stem}.parquet")
        if os.path.exists(out_name):
            return {"shard": stem, "skipped": True, "rows": pq.read_metadata(out_name).num_rows}
        stage = NormalizeStage(spec, keep_extra=keep_extra)
        if path.endswith(".jsonl"):
            import pyarrow.json as pj

            tbl = pj.read_json(path)
            parts = [stage(tbl)]
        else:
            parts = [
                stage(pa.Table.from_batches([rb]))
                for rb in pq.ParquetFile(path).iter_batches(batch_size=8192)
            ]
        out = pa.concat_tables(parts)
        tmp = f"{out_name}.tmp.{os.getpid()}"
        pq.write_table(out, tmp)
        os.replace(tmp, out_name)
        return {"shard": stem, "skipped": False, "rows": out.num_rows}

    results = ray.get([norm_shard.remote(p) for p in paths])
    print(
        _json.dumps(
            {
                "shards": len(results),
                "shards_skipped": sum(r["skipped"] for r in results),
                "rows": sum(r["rows"] for r in results),
                "out": out_dir,
            },
            sort_keys=True,
        )
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="schemasaurus_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    for cmd in ("validate", "snapshot"):
        p = sub.add_parser(cmd)
        p.add_argument("--input", required=True, help="directory of parquet/lance shards")
        p.add_argument("--out", required=True, help="output/checkpoint directory")
        p.add_argument("--spec", default="audio", help="'audio', 'audio-meta', or a JSON spec file")
        p.add_argument("--ref", action="append", default=[], metavar="NAME=PATH",
                       help="referenced table for referential rules")
        p.add_argument("--snapshot", default=None, help="drift snapshot JSON file")
        p.add_argument("--no-resume", action="store_true")
        p.add_argument("--num-cpus", type=int, default=None)
        p.add_argument("--batch-size", type=int, default=None)
        p.add_argument("--on-error", choices=["raise", "skip"], default="raise",
                       help="skip: quarantine unreadable shards instead of failing the run")

    p = sub.add_parser("infer", help="profile a table into a suggested validation spec")
    p.add_argument("--input", required=True, help="parquet file or directory of shards")
    p.add_argument("--out", default=None, help="write the suggested spec JSON here")
    p.add_argument("--columns", default=None, help="comma-separated column subset")
    p.add_argument("--profile-out", default=None,
                   help="persist the merged profile JSON (spec-space snapshot)")
    p.add_argument("--diff-snapshot", default=None,
                   help="earlier --profile-out file: print the spec-space drift rows")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("segment", help="VAD utterance split of clip shards into segment parquet")
    p.add_argument("--input", required=True, help="parquet file or directory of clip shards")
    p.add_argument("--out", required=True, help="output directory (one file per input shard)")
    p.add_argument("--frame-ms", type=int, default=20)
    p.add_argument("--thresh-db", type=float, default=-35.0)
    p.add_argument("--min-silence-ms", type=int, default=150)
    p.add_argument("--min-segment-ms", type=int, default=200)
    p.add_argument("--no-bytes", action="store_true", help="emit segment metadata only")
    p.add_argument("--num-cpus", type=int, default=None)

    p = sub.add_parser("normalize", help="spec-driven normalization of shards to parquet")
    p.add_argument("--input", required=True, help="parquet/jsonl file or directory of shards")
    p.add_argument("--out", required=True, help="output directory (one file per input shard)")
    p.add_argument("--spec", required=True, help="'audio', 'audio-meta', or a JSON spec file")
    p.add_argument("--keep-extra", action="store_true",
                   help="keep columns not in the spec (default: removed, reference semantics)")
    p.add_argument("--num-cpus", type=int, default=None)

    args = parser.parse_args(argv)
    _ensure_ray(args.num_cpus)

    if args.cmd == "infer":
        return _cmd_infer(args)
    if args.cmd == "segment":
        return _cmd_segment(args)
    if args.cmd == "normalize":
        return _cmd_normalize(args)

    from .pipelines.validate import ValidationPipeline

    spec = _load_spec(args.spec)
    refs = {}
    for item in args.ref:
        name, _, path = item.partition("=")
        refs[name] = path
    snapshot = None
    if args.snapshot:
        with open(args.snapshot) as f:
            snapshot = json.load(f)

    pipe = ValidationPipeline(
        spec, args.out, snapshot=snapshot, batch_size=args.batch_size,
        on_error=getattr(args, "on_error", "raise"),
    )
    report = pipe.run(args.input, ref_datasets=refs or None, resume=not args.no_resume)

    if args.cmd == "snapshot":
        print(json.dumps({"snapshot": f"{args.out}/drift_snapshot.json", "rows": report.metrics["rows_total"]}))
        return 0

    summary = {
        "valid": report.valid,
        "metrics": report.metrics,
        "partitions": {
            str(r["partition_id"]): r["verdict"] for _, r in report.partitions.iterrows()
        },
    }
    print(json.dumps(summary, default=str))
    return 0 if report.valid else 3  # 3 = validation failures (not a crash)


if __name__ == "__main__":
    sys.exit(main())
