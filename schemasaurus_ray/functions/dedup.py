"""Deduplication operators for the documents table — exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine. Engine-native training-data ops
(the reference's only dedup notion is within-array ``uniqueItems``,
v4validator.js:277-290; globalized here the same way uniqueness is in
stages/unique.py).

Scale shapes:
- exact: content-hash per batch (vectorized) → two-phase groupby-min — only
  (hash, id) pairs enter the shuffle;
- MinHash-LSH: shingle → minhash sigs per batch → explode to
  (band, band_hash, doc_id) rows → groupby band bucket → candidate pairs →
  exact-Jaccard verify on a broadcast text lookup of ONLY the candidates;
- SimHash: 64-bit signature per doc, banded into 4×16-bit chunks for
  hamming≤k candidate generation;
- embedding: cosine near-dup via random-hyperplane LSH buckets (or brute
  force for small inputs).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import hash_column, splitmix64

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


# ---------------------------------------------------------------- exact dedup
def exact_dedup(ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id") -> "ray.data.Dataset":
    """Survivors after exact-content dedup: min(id) per identical text.
    Equivalent SQL: SELECT min(id) FROM t GROUP BY text (64-bit content hash
    stands in for the text as the shuffle key; collision odds ~1e-13/n²)."""
    from ray.data.aggregate import Min

    def add_hash(batch: pa.Table) -> pa.Table:
        h = hash_column(batch.column(text_col)).view(np.int64)
        return pa.table({id_col: batch.column(id_col), "h": pa.array(h, pa.int64())})

    pre = ds.select_columns([id_col, text_col]).map_batches(add_hash, batch_format="pyarrow")
    agg = pre.groupby("h").aggregate(Min(id_col, alias_name=id_col))
    return agg.select_columns([id_col])


# ------------------------------------------------------------- shingle hashes
def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Word n-gram shingle hashes (uint64). Vectorized over shingles."""
    words = text.split()
    if len(words) < n:
        joined = " ".join(words) or ""
        return _bytes_hash(np.array([joined], dtype=object))
    shingles = np.array([" ".join(words[i : i + n]) for i in range(len(words) - n + 1)], dtype=object)
    return _bytes_hash(shingles)


def _bytes_hash(strings: np.ndarray) -> np.ndarray:
    arr = pa.array(strings, pa.string())
    return hash_column(arr)


# ------------------------------------------------------------------- MinHash
class MinHashStage:
    """Per-batch MinHash signatures → (band, band_hash, doc_id) rows.

    ``num_perm`` permutations are simulated with splitmix64 seed-mixing
    (Broder's minwise hashing); signatures are banded for LSH (bands ×
    rows_per_band = num_perm) so near-dups (Jaccard ≳ threshold) collide in
    ≥1 band bucket."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_perm: int = 64,
        bands: int = 16,
        shingle_n: int = 3,
    ):
        assert num_perm % bands == 0
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_n = shingle_n
        self.seeds = splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64))

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.shingle_n)  # (S,)
        # (S, P) mixed hashes → column-min = signature; vectorized outer xor
        with np.errstate(over="ignore"):
            mixed = splitmix64(sh[:, None] ^ self.seeds[None, :])
        return mixed.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        band_ids, band_hashes, doc_ids = [], [], []
        for doc_id, text in zip(ids, texts):
            if not text:
                continue
            sig = self.signature(text)
            bands = sig.reshape(self.bands, self.rows_per_band)
            with np.errstate(over="ignore"):
                bh = splitmix64(
                    bands[:, 0] if self.rows_per_band == 1 else np.bitwise_xor.reduce(
                        splitmix64(bands + np.arange(self.rows_per_band, dtype=np.uint64)), axis=1
                    )
                )
            band_ids.extend(range(self.bands))
            band_hashes.extend(bh.view(np.int64).tolist())
            doc_ids.extend([doc_id] * self.bands)
        return pa.table(
            {
                "band": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.int64()),
                self.id_col: pa.array(doc_ids),
            }
        )


def minhash_candidates(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Candidate near-dup pairs (id_a < id_b) from LSH band buckets —
    shingle→minhash→band→bucket groupby (the canonical web-dedup shape)."""
    sig = ds.select_columns([id_col, text_col]).map_batches(
        MinHashStage,
        fn_constructor_kwargs={
            "text_col": text_col,
            "id_col": id_col,
            "num_perm": num_perm,
            "bands": bands,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def bucket_pairs(group: pa.Table, cap: int = 64) -> pa.Table:
        ids = sorted(set(group.column(id_col).to_pylist()))
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        a, b = [], []
        if len(ids) <= cap:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a.append(ids[i])
                    b.append(ids[j])
        else:
            # huge bucket (hot key): star around the smallest id bounds the
            # pair count at O(n); transitive near-dups resolve via the
            # caller's connected-component pass
            root = ids[0]
            for other in ids[1:]:
                a.append(root)
                b.append(other)
        return pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})

    pairs = sig.groupby(["band", "band_hash"]).map_groups(bucket_pairs, batch_format="pyarrow")
    return pairs


def jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard — the verify step after LSH candidates."""
    sa = set(_shingle_hashes(a, n).tolist())
    sb = set(_shingle_hashes(b, n).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def verify_pairs_jaccard(
    pairs: pa.Table,
    texts_by_id: dict,
    threshold: float = 0.8,
    n: int = 3,
) -> pa.Table:
    """Driver-side verify of candidate pairs against a broadcast text lookup
    (only candidate ids' texts are fetched — tiny next to the corpus)."""
    keep_a, keep_b, sims = [], [], []
    seen = set()
    for a, b in zip(pairs.column("id_a").to_pylist(), pairs.column("id_b").to_pylist()):
        key = (a, b)
        if key in seen or a == b:
            continue
        seen.add(key)
        ta, tb = texts_by_id.get(a), texts_by_id.get(b)
        if ta is None or tb is None:
            continue
        j = jaccard(ta, tb, n)
        if j >= threshold:
            keep_a.append(a)
            keep_b.append(b)
            sims.append(round(j, 6))
    return pa.table(
        {
            "id_a": pa.array(keep_a, pa.int64()),
            "id_b": pa.array(keep_b, pa.int64()),
            "jaccard": pa.array(sims, pa.float64()),
        }
    )


# ------------------------------------------------------------------- SimHash
class SimHashStage:
    """64-bit SimHash (Charikar) per document from word hashes; vectorized
    bit-vote accumulation per batch."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.bit_masks = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        words = text.split()
        if not words:
            return 0
        h = _bytes_hash(np.array(words, dtype=object))  # (W,)
        bits = (h[:, None] & self.bit_masks[None, :]) != 0  # (W, 64)
        votes = bits.sum(axis=0) * 2 - len(h)  # positive → bit set
        return int(np.packbits((votes > 0)[::-1]).view(">u8")[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sigs = [self.simhash(t) if t else 0 for t in texts]
        sig_arr = np.array(sigs, dtype=np.uint64)
        out = {self.id_col: batch.column(self.id_col), "simhash": pa.array(sig_arr.view(np.int64), pa.int64())}
        # 4×16-bit bands for hamming≤3 candidate generation
        for b in range(4):
            out[f"band{b}"] = pa.array(((sig_arr >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int32), pa.int32())
        return pa.table(out)


def simhash_signatures(ds: "ray.data.Dataset", text_col="text", id_col="doc_id", concurrency: int = 4):
    return ds.select_columns([id_col, text_col]).map_batches(
        SimHashStage,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    cnt = np.zeros(len(x), dtype=np.int32)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int32)
        x >>= np.uint64(1)
    return cnt


# -------------------------------------------------------- embedding near-dup
def embedding_near_dups(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
    concurrency: int = 4,
) -> pa.Table:
    """Cosine near-duplicates via random-hyperplane LSH: bucket by sign
    pattern, verify exact cosine within buckets. Returns (id_a, id_b, cosine).
    """
    import ray

    rng = np.random.default_rng(seed)
    planes_ref = None

    def to_buckets(batch: pa.Table) -> pa.Table:
        mat = np.vstack(batch.column(vec_col).to_pylist()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        rng_local = np.random.default_rng(seed)
        planes = rng_local.standard_normal((unit.shape[1], num_planes))
        signs = (unit @ planes) > 0
        bucket = np.zeros(len(mat), dtype=np.int64)
        for b in range(num_planes):
            bucket |= signs[:, b].astype(np.int64) << b
        return pa.table(
            {
                id_col: batch.column(id_col),
                "bucket": pa.array(bucket, pa.int64()),
                "vec": batch.column(vec_col),
            }
        )

    bucketed = ds.select_columns([id_col, vec_col]).map_batches(to_buckets, batch_format="pyarrow")

    def verify(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())}
        )
        if n < 2:
            return empty
        ids = np.asarray(group.column(id_col).to_pylist(), dtype=np.int64)
        mat = np.vstack(group.column("vec").to_pylist()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        sims = unit @ unit.T
        ia, ib = np.triu_indices(n, k=1)
        keep = sims[ia, ib] >= threshold
        if not keep.any():
            return empty
        a, b = ids[ia[keep]], ids[ib[keep]]
        order = a > b
        a2 = np.where(order, b, a)
        b2 = np.where(order, a, b)
        return pa.table(
            {
                "id_a": pa.array(a2, pa.int64()),
                "id_b": pa.array(b2, pa.int64()),
                "cosine": pa.array(np.round(sims[ia[keep], ib[keep]], 6), pa.float64()),
            }
        )

    pairs = bucketed.groupby("bucket").map_groups(verify, batch_format="pyarrow")
    tbls = list(pairs.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tbls:
        return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())})
    out = pa.concat_tables(tbls)
    # dedupe pairs that collided in multiple buckets
    return out.group_by(["id_a", "id_b"]).aggregate([("cosine", "max")]).rename_columns(["id_a", "id_b", "cosine"])
