"""Similarity search over an embedding column (list<float>).

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  ``ray.put`` ONCE (broadcast), each batch does one float64 matmul against
  it and emits only its local top-k per query; the driver reduces the tiny
  per-batch candidate sets. Output is exact (per-batch top-k ∪ reduce ≡
  global top-k).
- :func:`ivf_topk` — IVF scale path: coarse k-means centroids (trained on a
  driver-side sample), rows bucketed by nearest centroid, queries probe only
  ``nprobe`` nearest buckets. Approximate; same output schema.
"""

from __future__ import annotations

import heapq
from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def _as_matrix(col: pa.ChunkedArray) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix without per-row Python:
    flatten the list buffer and reshape (fixed dimension assumed)."""
    import pyarrow.compute as pc

    flat = np.asarray(pc.list_flatten(col), dtype=np.float64)
    n = len(col)
    if n == 0:
        return np.zeros((0, 0))
    d = len(flat) // n
    return flat.reshape(n, d)


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def brute_force_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: list,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k → (query_id, vec_id, score) sorted by
    (query_id, -score, vec_id)."""
    import ray

    q_unit = _unit(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q_unit)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        mat = _unit(_as_matrix(batch.column(vec_col)))
        ids = np.asarray(batch.column(id_col).combine_chunks(), dtype=np.int64)
        sims = q @ mat.T  # (Q, n)
        kk = min(k, sims.shape[1])
        # per-query local top-k (argpartition = O(n))
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        out_q, out_id, out_s = [], [], []
        for qi in range(q.shape[0]):
            cols = part[qi]
            out_q.extend([qi] * len(cols))
            out_id.extend(ids[cols].tolist())
            out_s.extend(sims[qi, cols].tolist())
        return pa.table(
            {
                "qi": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    candidates = ds.select_columns([id_col, vec_col]).map_batches(local_topk, batch_format="pyarrow")
    # reduce: tiny (batches × Q × k rows) → driver heap per query
    heaps: dict[int, list] = {i: [] for i in range(len(query_ids))}
    for batch in candidates.iter_batches(batch_format="pyarrow", batch_size=None):
        for qi, vid, s in zip(
            batch.column("qi").to_pylist(),
            batch.column(id_col).to_pylist(),
            batch.column("score").to_pylist(),
        ):
            h = heaps[qi]
            # tie-break: prefer smaller vec_id on equal score (deterministic)
            item = (s, -vid)
            if len(h) < k:
                heapq.heappush(h, item)
            elif item > h[0]:
                heapq.heapreplace(h, item)
    rows_q, rows_id, rows_s = [], [], []
    for qi in range(len(query_ids)):
        ranked = sorted(heaps[qi], key=lambda x: (-x[0], x[1]))
        for s, nvid in ranked:
            rows_q.append(query_ids[qi])
            rows_id.append(-nvid)
            rows_s.append(round(s, 6))
    return pa.table(
        {
            "query_id": pa.array(rows_q, pa.int64()),
            id_col: pa.array(rows_id, pa.int64()),
            "score": pa.array(rows_s, pa.float64()),
        }
    )


def _kmeans(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = len(sample)
    cent = sample[rng.choice(n, size=min(n_clusters, n), replace=False)]
    for _ in range(iters):
        d = sample @ cent.T
        assign = d.argmax(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    cent[c] = v / norm
    return cent


def ivf_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: list,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_size: int = 4096,
    seed: int = 42,
) -> pa.Table:
    """IVF approximate top-k: train coarse centroids on a sample, score only
    rows whose nearest centroid is among each query's ``nprobe`` probes."""
    import ray

    # DETERMINISTIC and UNBIASED sample: select by id HASH (uniform over
    # the id space — an id % mod pick followed by an id-sorted slice
    # systematically dropped the upper id range, which under-covers
    # recent data on id-correlated corpora), order by the same hash, keep
    # the first sample_size. random_sample + take() depended on block
    # scheduling order, which made the trained centroids differ run to run.
    from ..util import hash_column

    mod = max(1, ds.count() // sample_size)

    def pick(batch: pa.Table) -> pa.Table:
        h = hash_column(batch.column(id_col).combine_chunks(), seed=7)
        keep = (h % np.uint64(mod)) == 0
        t = batch.select([id_col, vec_col]).filter(pa.array(keep))
        return t.append_column("h", pa.array(h[keep].view(np.int64), pa.int64()))

    sample_tbl = pa.concat_tables(
        ray.get(ds.map_batches(pick, batch_format="pyarrow").to_arrow_refs())
    ).sort_by([("h", "ascending"), (id_col, "ascending")])
    sample_tbl = sample_tbl.slice(0, sample_size)
    cent = _kmeans(
        _unit(_as_matrix(sample_tbl.column(vec_col))), n_clusters, seed=seed
    )
    q_unit = _unit(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(q_unit @ cent.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    probe_sets = [set(p.tolist()) for p in probes]
    cent_ref = ray.put(cent)
    q_ref = ray.put(q_unit)
    probes_ref = ray.put(probe_sets)

    def local_topk(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        q = ray.get(q_ref)
        psets = ray.get(probes_ref)
        mat = _unit(_as_matrix(batch.column(vec_col)))
        ids = np.asarray(batch.column(id_col).combine_chunks(), dtype=np.int64)
        assign = (mat @ c.T).argmax(axis=1)
        out_q, out_id, out_s = [], [], []
        for qi in range(q.shape[0]):
            mask = np.isin(assign, list(psets[qi]))
            if not mask.any():
                continue
            sub = mat[mask]
            sub_ids = ids[mask]
            sims = q[qi] @ sub.T
            kk = min(k, len(sims))
            part = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(sub_ids[part].tolist())
            out_s.extend(sims[part].tolist())
        return pa.table(
            {
                "qi": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    candidates = ds.select_columns([id_col, vec_col]).map_batches(local_topk, batch_format="pyarrow")
    heaps: dict[int, list] = {i: [] for i in range(len(query_ids))}
    for batch in candidates.iter_batches(batch_format="pyarrow", batch_size=None):
        for qi, vid, s in zip(
            batch.column("qi").to_pylist(),
            batch.column(id_col).to_pylist(),
            batch.column("score").to_pylist(),
        ):
            h = heaps[qi]
            item = (s, -vid)
            if len(h) < k:
                heapq.heappush(h, item)
            elif item > h[0]:
                heapq.heapreplace(h, item)
    rows_q, rows_id, rows_s = [], [], []
    for qi in range(len(query_ids)):
        for s, nvid in sorted(heaps[qi], key=lambda x: (-x[0], x[1])):
            rows_q.append(query_ids[qi])
            rows_id.append(-nvid)
            rows_s.append(round(s, 6))
    return pa.table(
        {
            "query_id": pa.array(rows_q, pa.int64()),
            id_col: pa.array(rows_id, pa.int64()),
            "score": pa.array(rows_s, pa.float64()),
        }
    )
