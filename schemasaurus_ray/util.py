"""Shared vectorized helpers: stable hashing + partition assignment.

Partitioning is CONTENT-based (hash of the row key), not block-based, so
partition ids are stable across re-reads and resumable runs (SURVEY.md §4
"Partitioning / sharding"). Hashes are implemented with numpy (splitmix64)
— stable across processes and Python hash seeds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def apply_malloc_tuning() -> None:
    """Glibc page-reuse tuning for allocation-heavy Ray workers — call in the
    SESSION OWNER (bench.py / CLI / test fixture) BEFORE ``ray.init`` so
    workers inherit it; library code never touches the environment on import.

    This host's dominant perf pathology is the kernel page-fault/zeroing
    path: glibc serves every allocation above MMAP_THRESHOLD (128 KB
    default) with a fresh ``mmap`` whose pages are zero-filled on first
    touch, and every corresponding ``free`` unmaps them — so each per-batch
    numpy temporary pays full page-zeroing cost. Raising both thresholds
    makes the heap retain and REUSE those pages across batches (measured on
    this VM: 64 MB alloc+touch median 8.1 ms → 0.4 ms; the 16M-row
    metadata-profile validation pipeline 5.27 s → 4.21 s at 32 CPUs, with
    the alloc host-probe going 57 GB/s → effectively unbounded). Worst case
    each long-lived worker retains its high-water heap, which is exactly the
    behavior a long-running cluster job wants. ``setdefault`` so operators
    can override per-deployment.
    """
    import os

    for key in ("MALLOC_MMAP_THRESHOLD_", "MALLOC_TRIM_THRESHOLD_"):
        os.environ.setdefault(key, str(1 << 30))
    # polars sizes its rayon pool from HOST cores at import: without a cap,
    # every worker of a 32-worker session spawns 32 threads (1024 runnable
    # threads at full fan-out), and an 8-CPU session silently borrows the
    # other 24 host cores — inflating the low leg of the N-vs-4N scaling
    # protocol. One thread per worker matches the 1-CPU Ray task contract
    # (same reason workers run OMP_NUM_THREADS=1).
    os.environ.setdefault("POLARS_MAX_THREADS", "1")


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 — public-domain mixing
    function (Steele et al., 'Fast splittable pseudorandom number
    generators')."""
    with np.errstate(over="ignore"):
        z = (x + _GOLDEN).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _polars_hash(col: pa.Array, seed: int) -> np.ndarray | None:
    """String/binary hash via polars (Rust-vectorized ahash): ~70x faster
    than the numpy polyhash on this box, where fresh-page allocation runs
    at ~20 MB/s under host memory ballooning — the polyhash's 5 byte-sized
    temporaries dominated its runtime. Deterministic for a fixed polars
    wheel across processes (verified), which is all the engine needs: no
    hash value is ever persisted across runs. Returns None if polars is
    unavailable (numpy fallback below)."""
    try:
        import polars as pl
    except ImportError:  # pragma: no cover - polars is in the baked env
        return None
    s = pl.from_arrow(col)
    return s.hash(seed=seed & 0xFFFFFFFFFFFFFFFF).to_numpy().astype(np.uint64, copy=False)


def single_chunk(col: "pa.ChunkedArray | pa.Array") -> pa.Array:
    """ChunkedArray → Array WITHOUT copying when already one chunk.
    ``combine_chunks()`` memcpys even a single-chunk column (measured 85 ms
    per 110 MB binary batch — the audio row pass paid it several times per
    batch); ``chunk(0)`` is a refcount bump. Genuine multi-chunk columns
    still concatenate."""
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 1:
            return col.chunk(0)
        if col.num_chunks == 0:
            return pa.array([], col.type)
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):  # pyarrow version differences
            return col.chunk(0)
    return col


def hash_column(col: pa.ChunkedArray | pa.Array, seed: int = 0) -> np.ndarray:
    """Stable uint64 hash of an Arrow column, vectorized.

    ints → splitmix64; strings/binary → polars ahash (numpy FNV-1a
    polyhash fallback). Deterministic within one environment; never
    persisted across runs.
    """
    col = single_chunk(col)
    t = col.type
    if pa.types.is_integer(t) or pa.types.is_timestamp(t) or pa.types.is_boolean(t):
        # null-free int64 (the common key-column case) is a zero-copy view;
        # the old unconditional cast+fill_null+astype chain made 3 copies
        # per batch — measurable at 32 CPUs where the host memory bus, not
        # CPU, is the scaling ceiling (VERDICT r2 #2)
        if col.null_count == 0 and pa.types.is_int64(t):
            vals = np.asarray(col).view(np.uint64)
        elif col.null_count == 0:
            vals = np.asarray(col.cast(pa.int64())).view(np.uint64)
        else:
            vals = np.asarray(col.cast(pa.int64()).fill_null(-1)).view(np.uint64)
        return splitmix64(vals + np.uint64(seed))
    if pa.types.is_floating(t):
        if col.null_count == 0 and pa.types.is_float64(t):
            vals = np.asarray(col).view(np.uint64)
        else:
            vals = np.asarray(col.fill_null(np.nan), dtype=np.float64).view(np.uint64)
        return splitmix64(vals + np.uint64(seed))
    # strings / binary: vectorized polyhash over the flat byte buffer
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        h = _polars_hash(col, seed)
        if h is not None:
            return h
        col = col.cast(pa.large_binary())
    else:
        raise TypeError(f"hash_column: unsupported Arrow type {t}")
    arr = col.fill_null(b"")
    if len(arr) == 0:
        return np.zeros(0, dtype=np.uint64)
    buf = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8).astype(np.uint64)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    # polynomial rolling hash per row: h = sum(byte * p^i) via segmented cumsum
    n_bytes = offsets[-1] - offsets[0]
    if n_bytes == 0:
        return splitmix64(np.full(len(arr), np.uint64(seed)))
    b = buf[offsets[0] : offsets[-1]]
    # position within row
    starts = (offsets - offsets[0]).astype(np.int64)
    row_of_byte = np.repeat(np.arange(len(arr)), np.diff(starts))
    pos = np.arange(len(b), dtype=np.int64) - starts[row_of_byte]
    with np.errstate(over="ignore"):
        p = np.uint64(1099511628211)  # FNV prime as polynomial base
        # p^pos mod 2^64 via exponentiation on the fly: precompute powers up to max len
        max_len = int(np.diff(starts).max()) if len(starts) > 1 else len(b)
        powers = np.empty(max_len + 1, dtype=np.uint64)
        powers[0] = np.uint64(1)
        for i in range(1, max_len + 1):
            powers[i] = powers[i - 1] * p
        contrib = (b + np.uint64(1)) * powers[pos]
        sums = np.zeros(len(arr), dtype=np.uint64)
        np.add.at(sums, row_of_byte, contrib)
    lengths = np.diff(starts).astype(np.uint64)
    return splitmix64(sums ^ splitmix64(lengths + np.uint64(seed)))


def partition_ids(col: pa.ChunkedArray | pa.Array, num_partitions: int, seed: int = 0) -> np.ndarray:
    """partition_id = mixed-hash(key) % P, as int32."""
    h = hash_column(col, seed)
    return (h % np.uint64(num_partitions)).astype(np.int32)


def stringify_column(col: pa.ChunkedArray, indices: np.ndarray) -> pa.Array:
    """Offending values as strings for the violation sink; binary columns are
    summarized as their byte length (never ship audio payloads into the
    violations table — SURVEY.md §7 hard part (d)). Take BEFORE any chunk
    combine: combine_chunks here copied the full column (110 MB of audio
    bytes per batch) to render a handful of violating rows."""
    taken = single_chunk(col.take(pa.array(indices, pa.int64())))
    t = taken.type
    try:
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return pc.cast(pc.binary_length(taken), pa.string())
        if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_struct(t):
            return pa.array([str(v) for v in taken.to_pylist()], pa.string())
        return taken.cast(pa.string())
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return pa.array([None] * len(indices), pa.string())


# Per-worker-process cache of constructed batch stages. Cheap-state stages
# (seed arrays, stopword sets, compiled regexes) run as STATELESS TASKS with
# the instance cached per worker instead of an actor pool: tasks use every
# free CPU and skip the actor spawn cost, which measured 1-2 s x pool size
# and anti-scales short jobs (same rationale as pipelines/validate.py's
# _STAGE_CACHE; actor pools remain right for heavy state like model weights).
_STAGE_FN_CACHE: dict = {}


def cached_stage(cls, **kwargs):
    """Return a plain function for ``map_batches`` that lazily constructs
    ``cls(**kwargs)`` once per worker process and reuses it per batch.
    kwargs must be hashable."""
    key = (cls.__module__, cls.__qualname__, tuple(sorted(kwargs.items())))

    def fn(batch):
        stage = _STAGE_FN_CACHE.get(key)
        if stage is None:
            stage = cls(**kwargs)
            _STAGE_FN_CACHE[key] = stage
        return stage(batch)

    return fn


def sorted_lookup(sorted_keys: np.ndarray, queries: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized membership probe against a SORTED key array:
    (clipped positions, found mask). Factors the searchsorted→clip→compare
    pattern (and its empty-table edge) that was hand-rolled at every
    broadcast-lookup site (VERDICT r3 #5's vectorized-lookup rule).

    ``pos`` is only meaningful where ``found`` is True: when ``sorted_keys``
    is empty every position is 0 and indexing ANY parallel array of the same
    (zero) length with it crashes — mask by ``found`` before gathering
    (``np.where(found, parallel[pos], default)`` is NOT safe on empty
    tables; select first: ``out = default; out[found] = parallel[pos[found]]``)."""
    pos = np.searchsorted(sorted_keys, queries)
    if len(sorted_keys) == 0:
        return np.zeros(len(queries), dtype=np.int64), np.zeros(len(queries), dtype=bool)
    pos = np.minimum(pos, len(sorted_keys) - 1)
    return pos, sorted_keys[pos] == queries


def split_cols_by_key_hash(
    cols: "dict[str, np.ndarray]", key: str, num_buckets: int
) -> list:
    """Range-split parallel numpy columns into ``num_buckets`` Arrow tables
    by ``splitmix64(cols[key]) %% num_buckets`` — the map-side bucket
    splitter of every raw shuffle (was hand-rolled, with its empty-array
    and argsort edges, at each map site). Column dtypes pass through
    ``pa.array``'s numpy inference (int64 stays int64, int8 stays int8)."""
    import pyarrow as pa

    b = (splitmix64(cols[key].view(np.uint64)) % np.uint64(num_buckets)).astype(np.int64)
    order = np.argsort(b, kind="stable")
    bs = b[order]
    sorted_cols = {c: a[order] for c, a in cols.items()}
    bounds = np.searchsorted(bs, np.arange(num_buckets + 1))
    return [
        pa.table(
            {c: pa.array(a[bounds[x] : bounds[x + 1]]) for c, a in sorted_cols.items()}
        )
        for x in range(num_buckets)
    ]


def arrow_block_refs(ds) -> list:
    """Block object refs of a Dataset, WITHOUT the schema probe
    ``Dataset.to_arrow_refs`` makes: ray 2.49 calls
    ``self.schema(fetch_if_missing=True)`` after consuming the bundles,
    which RE-EXECUTES the whole plan with limit=1 (measured: 15 duplicate
    read+repartition+signature runs per bench; one such concurrent
    re-execution raced a raylet ``task_manager.cc`` check-failure on this
    host). Every engine stage emits pyarrow blocks, so to_arrow_refs'
    zero-copy branch — plain block refs — is always the result anyway."""
    return [r for bundle in ds.iter_internal_ref_bundles() for r in bundle.block_refs]


# ------------------------------------------------------- index filesystem API
# The persisted-index layer (IVF / LSH / banded) takes pyarrow.fs-resolvable
# URIs so build and probe work when they land on DIFFERENT nodes (VERDICT r4
# #2: os.path+glob assumed one shared local /tmp). A bare path keeps meaning
# the local filesystem; "file://", "s3://" etc. resolve through pyarrow.


def resolve_fs(uri: str):
    """(pyarrow.fs.FileSystem, filesystem-local path) for a plain local path
    or any ``pyarrow.fs``-resolvable URI. FileSystem objects pickle, so the
    resolved pair may be shipped into Ray tasks directly."""
    from pyarrow import fs as pafs

    uri = str(uri)
    if "://" in uri:
        return pafs.FileSystem.from_uri(uri)
    return pafs.LocalFileSystem(), uri


def fs_read_json(fs, path: str):
    """Parsed JSON at ``path`` on ``fs``, or None when the file is absent
    (the idempotent-marker probe of the index builders)."""
    import json

    from pyarrow import fs as pafs

    if fs.get_file_info(path).type == pafs.FileType.NotFound:
        return None
    with fs.open_input_stream(path) as fh:
        return json.loads(fh.read().decode())


def fs_write_json(fs, path: str, obj) -> None:
    import json

    fs.create_dir(path.rsplit("/", 1)[0], recursive=True)
    with fs.open_output_stream(path) as fh:
        fh.write(json.dumps(obj).encode())


def fs_list_parquet(fs, dirs: "list[str]") -> "list[tuple[str, int]]":
    """Sorted (path, size) of the parquet files directly under each listed
    directory — the bucket-pruned probe listing, through the filesystem API
    instead of glob (missing dirs are empty, not errors)."""
    from pyarrow import fs as pafs

    out = []
    for d in dirs:
        infos = fs.get_file_info(pafs.FileSelector(d, recursive=False, allow_not_found=True))
        out.extend(
            (i.path, i.size)
            for i in infos
            if i.type == pafs.FileType.File and i.path.endswith(".parquet")
        )
    return sorted(out)


def fs_list_bucket_dirs(fs, base: str) -> "list[str]":
    """Every ``bucket=*`` child directory of ``base`` (the io_stats
    denominator listing)."""
    from pyarrow import fs as pafs

    infos = fs.get_file_info(pafs.FileSelector(base, recursive=False, allow_not_found=True))
    return sorted(
        i.path
        for i in infos
        if i.type == pafs.FileType.Directory and i.base_name.startswith("bucket=")
    )


# ---------------------------------------------------------------- batch MD5
# Vectorized MD5 over an Arrow string/binary column — one numpy pass per
# 64-byte block ROUND, not per row (the last Python row loops in the hot
# paths were hashlib calls in fingerprint/sampling). Bit-exact with
# hashlib.md5/DuckDB md5() (oracle-checked).
import math as _math

_MD5_K = np.array(
    [int(_math.floor(abs(_math.sin(i + 1)) * 2**32)) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
_MD5_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_MD5_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16)]
    + [(3 * i + 5) % 16 for i in range(16)]
    + [(7 * i) % 16 for i in range(16)],
    dtype=np.int64,
)
_HEX = np.frombuffer(b"0123456789abcdef", dtype="S1")


def _rotl32(x: np.ndarray, s: int) -> np.ndarray:
    return (x << np.uint32(s)) | (x >> np.uint32(32 - s))


def md5_digests(col: pa.ChunkedArray | pa.Array, pass_budget: int = 64 << 20) -> np.ndarray:
    """(n, 16) uint8 MD5 digests of a string/binary column (nulls → the
    digest of b'', callers mask separately).

    The padded working buffer is (rows, max_blocks*64); hashing full
    document text with one outlier-long row would inflate it to
    n×max_doc_len (ADVICE r2: a 100 MB doc in a 4096-row batch ≈ 400 GB).
    Rows are therefore processed in length classes: sorted by block count
    and greedily grouped so each pass's buffer stays ≤ ``pass_budget``
    (singleton outliers get their own pass bounded by their own length) —
    peak allocation is max(pass_budget, longest row), not n×max_len."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.cast(pa.large_binary()).fill_null(b"")
    n = len(arr)
    if n == 0:
        return np.zeros((0, 16), dtype=np.uint8)
    buf = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    starts = (offsets - offsets[0]).astype(np.int64)
    lengths = np.diff(starts)
    data = buf[offsets[0] : offsets[-1]]
    # padded length: msg + 0x80 + zeros to 56 mod 64 + 8-byte bit length
    n_blocks = ((lengths + 8) // 64 + 1).astype(np.int64)
    max_blocks = int(n_blocks.max()) if n else 1
    if n * max_blocks * 64 <= pass_budget:
        return _md5_core(data, lengths)
    out = np.empty((n, 16), dtype=np.uint8)
    order = np.argsort(n_blocks, kind="stable")
    i = 0
    while i < n:
        j = i + 1
        while j < n and (j - i + 1) * int(n_blocks[order[j]]) * 64 <= pass_budget:
            j += 1
        idx = order[i:j]
        sub_len = lengths[idx]
        total = int(sub_len.sum())
        if total:
            row = np.repeat(np.arange(len(idx)), sub_len)
            sub_starts = np.zeros(len(idx) + 1, dtype=np.int64)
            np.cumsum(sub_len, out=sub_starts[1:])
            pos = np.arange(total, dtype=np.int64) - sub_starts[:-1][row]
            sub_data = data[starts[idx][row] + pos]
        else:
            sub_data = data[:0]
        out[idx] = _md5_core(sub_data, sub_len)
        i = j
    return out


def _md5_core(data: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """MD5 of n contiguously-packed rows (``data`` = their concatenated
    bytes, ``lengths`` per row) → (n, 16) uint8. One numpy pass per 64-byte
    block round; bit-exact with hashlib.md5/DuckDB md5()."""
    n = len(lengths)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    n_blocks = ((lengths + 8) // 64 + 1).astype(np.int64)
    max_blocks = int(n_blocks.max()) if n else 1
    padded = np.zeros((n, max_blocks * 64), dtype=np.uint8)
    # scatter message bytes: row_of_byte/pos built once (tiny for key-ish cols)
    if len(data):
        row_of_byte = np.repeat(np.arange(n), lengths)
        pos = np.arange(len(data), dtype=np.int64) - starts[:-1][row_of_byte]
        padded[row_of_byte, pos] = data
    padded[np.arange(n), lengths] = 0x80
    bitlen = (lengths.astype(np.uint64) * np.uint64(8))
    for j in range(8):
        padded[np.arange(n), n_blocks * 64 - 8 + j] = ((bitlen >> np.uint64(8 * j)) & np.uint64(0xFF)).astype(np.uint8)
    words = padded.reshape(n, max_blocks, 16, 4)
    m = (
        words[..., 0].astype(np.uint32)
        | (words[..., 1].astype(np.uint32) << np.uint32(8))
        | (words[..., 2].astype(np.uint32) << np.uint32(16))
        | (words[..., 3].astype(np.uint32) << np.uint32(24))
    )  # (n, max_blocks, 16) little-endian words
    a0 = np.full(n, 0x67452301, dtype=np.uint32)
    b0 = np.full(n, 0xEFCDAB89, dtype=np.uint32)
    c0 = np.full(n, 0x98BADCFE, dtype=np.uint32)
    d0 = np.full(n, 0x10325476, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for blk in range(max_blocks):
            active = n_blocks > blk  # rows whose message spans this block
            if not active.any():
                break
            a, b, c, d = a0[active].copy(), b0[active].copy(), c0[active].copy(), d0[active].copy()
            mw = m[active, blk]  # (na, 16)
            for i in range(64):
                if i < 16:
                    f = (b & c) | (~b & d)
                elif i < 32:
                    f = (d & b) | (~d & c)
                elif i < 48:
                    f = b ^ c ^ d
                else:
                    f = c ^ (b | ~d)
                f = f + a + _MD5_K[i] + mw[:, _MD5_G[i]]
                a, d, c = d, c, b
                b = b + _rotl32(f, int(_MD5_S[i]))
                # note: b here uses the PRE-rotation b via the f sum chain
            a0[active] += a
            b0[active] += b
            c0[active] += c
            d0[active] += d
    out = np.empty((n, 16), dtype=np.uint8)
    for j, reg in enumerate((a0, b0, c0, d0)):
        for k in range(4):
            out[:, 4 * j + k] = ((reg >> np.uint32(8 * k)) & np.uint32(0xFF)).astype(np.uint8)
    return out


def md5_hex(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Lowercase hex MD5 per row (null → null), fully vectorized."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    dig = md5_digests(col)
    n = len(dig)
    if n == 0:
        return pa.array([], pa.string())
    chars = np.empty((n, 32), dtype="S1")
    chars[:, 0::2] = _HEX[dig >> 4]
    chars[:, 1::2] = _HEX[dig & 0x0F]
    hexes = chars.view("S32").ravel().astype("U32")
    mask = np.asarray(pc.is_null(col))
    return pa.array(np.where(mask, None, hexes).tolist(), pa.string())


# ------------------------------------------------------------ argmax packing
# Distributed argmax/argmin as a plain keyed MAX: pack (score, id) into one
# int64 rank so max(rank) selects the highest score with ties broken by the
# SMALLEST id (SQL `row_number() OVER (ORDER BY score DESC, id ASC) = 1`).
# Any mergeable-max shuffle (stages/shuffle.agg_keys_shuffled, Dataset
# groupby Max) then carries a single 8-byte value per key instead of the row.
_RANK_ID_BITS = 40
_RANK_ID_CAP = (1 << _RANK_ID_BITS) - 1  # ids must fit 40 bits (~1.1e12 rows)


def pack_argmax_rank(score: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """int64 rank = score·2^40 + (2^40-1-id). Requires 0 ≤ id < 2^40 and
    0 ≤ score < 2^23 (score·2^40 must stay under 2^63)."""
    score = np.asarray(score, dtype=np.int64)
    ids = np.asarray(ids, dtype=np.int64)
    if len(ids) and (ids.min() < 0 or ids.max() > _RANK_ID_CAP):
        raise ValueError("ids out of 40-bit range for argmax packing")
    if len(score) and (score.min() < 0 or score.max() >= (1 << 23)):
        raise ValueError("scores out of 23-bit range for argmax packing")
    return (score << _RANK_ID_BITS) | (_RANK_ID_CAP - ids)


def unpack_argmax_rank(rank: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`pack_argmax_rank` → (score, id)."""
    rank = np.asarray(rank, dtype=np.int64)
    return rank >> _RANK_ID_BITS, _RANK_ID_CAP - (rank & _RANK_ID_CAP)
