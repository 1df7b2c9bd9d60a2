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
