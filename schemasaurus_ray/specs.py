"""Canonical specs: the flagship audio clip table (BASELINE.json input_hint)
and specs for the driver's TPC-H-ish test tables (FIXTURES.md F4)."""

from __future__ import annotations

from .audio import pcm_consistency

# Flagship: Lance/Parquet table (clip_id, bytes, sr_hz, dur_ms, codec,
# transcript) — rules per FIXTURES.md F1.
AUDIO_CLIP_SPEC: dict = {
    "columns": {
        "clip_id": {"type": "string", "required": True, "pattern": "^clip-[0-9]{10}$"},
        "bytes": {"type": "binary", "required": True, "conform": {"pcm": True}},
        "sr_hz": {
            "type": "integer",
            "required": True,
            "enum": [8000, 16000, 22050, 44100],
            "minimum": 4000,
            "maximum": 96000,
        },
        "dur_ms": {
            "type": "integer",
            "required": True,
            "minimum": 0,
            "exclusiveMinimum": True,
            "maximum": 60000,
        },
        "codec": {"type": "string", "required": True, "enum": ["wav", "flac", "opus"]},
        "transcript": {"type": "string", "required": True, "minLength": 1},
    },
    "table": {
        "key": "clip_id",
        "unique": ["clip_id"],
        "references": [{"column": "clip_id", "table": "transcripts", "key": "clip_id"}],
        "stats": ["clip_id", "sr_hz", "dur_ms", "codec", "transcript"],
        "drift": {
            "numeric": ["sr_hz", "dur_ms"],
            "categorical": ["codec"],
            "ks_threshold": 0.15,
            "psi_threshold": 0.25,
        },
        # table-level percentile SLO (spec.QuantileCheck, merged t-digest):
        # the tail of clip durations must stay under the spec maximum
        "quantile_checks": [{"column": "dur_ms", "q": 0.99, "maximum": 60000}],
        # cross-column CHECK (spec.CheckRule → plan.compile_expr): transcript
        # speaking-rate sanity — chars/sec ≤ 80 wherever duration is positive
        # (dur_ms ≤ 0 rows already fire minimum.exclusive; the `or` arm keeps
        # this check three-valued-quiet there, SQL CHECK semantics)
        "checks": [
            {
                "name": "transcript_rate",
                "expr": [
                    "or",
                    ["<=", ["*", ["len", ["col", "transcript"]], 1000], ["*", ["col", "dur_ms"], 80]],
                    ["<=", ["col", "dur_ms"], 0],
                ],
                "message": "transcript implies > 80 chars/sec speaking rate",
            }
        ],
    },
    "options": {"custom": {"pcm": pcm_consistency}},
}

# Same spec minus the audio-bytes conform rule (for fixtures without blobs).
AUDIO_CLIP_SPEC_NO_BYTES: dict = {
    "columns": {k: v for k, v in AUDIO_CLIP_SPEC["columns"].items() if k != "bytes"},
    "table": AUDIO_CLIP_SPEC["table"],
}

# Intentionally strict lineitem spec: bounds chosen so real TPC-H rows violate
# them — exercises every rule class with non-empty output (oracle-checkable).
LINEITEM_STRICT_SPEC: dict = {
    "columns": {
        "l_orderkey": {"type": "integer", "required": True, "minimum": 1},
        "l_linenumber": {"type": "integer", "minimum": 1, "maximum": 7},
        "l_quantity": {"type": "number", "required": True, "minimum": 5, "maximum": 45},
        "l_discount": {"type": "number", "minimum": 0, "maximum": 0.05},
        "l_returnflag": {"type": "string", "enum": ["A", "N"]},
        "l_linestatus": {"type": "string", "enum": ["O", "F"]},
    },
    "table": {"key": "l_orderkey"},
}
