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

    args = parser.parse_args(argv)
    _ensure_ray(args.num_cpus)

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

    pipe = ValidationPipeline(spec, args.out, snapshot=snapshot, batch_size=args.batch_size)
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
