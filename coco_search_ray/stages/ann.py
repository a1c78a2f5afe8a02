"""Similarity search over an embedding column.

- brute_force_topk: exact cosine top-k — per-batch numpy matmul against a
  broadcast query matrix, per-batch local top-k, tiny global merge. The
  distributed generalization of the reference's vector retrieval
  (``ORDER BY embedding <=> q LIMIT k``, search/hybrid.py:248-269; score
  = cosine similarity, higher better).
- ivf_topk: IVF-style scale path — k-means centroids (numpy Lloyd on a
  sample, driver-side), partition probing: score only vectors whose
  nearest centroid is among the query's nprobe closest.

Both return (query_id, vec_id, cos_sim rounded to 4) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.concurrency import auto_pool
from ..functions.numeric import round_half_away, vec_matrix
from ..functions.broadcast import localize


def _normalize(vecs: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(vecs, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return vecs / n


def _local_topk_tiesafe(sims_row: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the per-batch top-k with the GLOBAL tiebreak (score
    desc, id asc): every candidate whose score ties the k-th boundary is
    considered before truncating, so a smaller-id candidate the final
    merge would keep is never dropped at the batch level (exact ties are
    real with hash-embeddings of duplicate texts)."""
    n = sims_row.shape[0]
    kk = min(k, n)
    if kk == n:
        cand = np.arange(n)
    else:
        boundary = np.partition(sims_row, n - kk)[n - kk]  # k-th largest
        cand = np.nonzero(sims_row >= boundary)[0]
    order = np.lexsort((ids[cand], -sims_row[cand]))
    return cand[order[:kk]]


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact top-k for each query row (cosine). Streaming: every batch
    emits its local top-k per query; the driver merges the tiny partials."""
    q = _normalize(queries.astype(np.float64))
    q_ref = ray.put(q)

    class _Score:
        def __init__(self):
            self.q = localize(ray.get(q_ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            vecs = _normalize(vec_matrix(batch[vec_col]))
            sims = self.q @ vecs.T  # (nq, batch)
            o_q, o_id, o_s = [], [], []
            for qi in range(sims.shape[0]):
                idx = _local_topk_tiesafe(sims[qi], ids, k)
                for c in idx:
                    o_q.append(qi)
                    o_id.append(int(ids[c]))
                    o_s.append(float(sims[qi, c]))
            return pa.table(
                {
                    "query_id": pa.array(o_q, pa.int32()),
                    id_col: pa.array(o_id, pa.int64()),
                    "cos_sim": pa.array(o_s, pa.float64()),
                }
            )

    partials = ds.map_batches(_Score, batch_format="pyarrow", concurrency=auto_pool()).to_pandas()
    out_rows = []
    for qi, g in partials.groupby("query_id"):
        # ranks on the RAW float64 sims (the DuckDB oracle orders by the
        # raw cosine too, so both engines share any last-ulp BLAS
        # sensitivity at a 4-dp tie boundary; the gate embeddings sit
        # well clear of such ties — same margin argument as the pinned
        # semdedup rounding-boundary test)
        g = g.sort_values(["cos_sim", id_col], ascending=[False, True]).head(k)
        out_rows.append(g)
    merged = pd.concat(out_rows) if out_rows else partials
    merged["cos_sim"] = round_half_away(merged["cos_sim"].to_numpy(), 4)
    return pa.Table.from_pandas(merged.reset_index(drop=True), preserve_index=False)


def kmeans_centroids(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 5) -> np.ndarray:
    """Plain Lloyd's k-means on a (normalized) sample — driver-side, tiny."""
    rng = np.random.RandomState(seed)
    x = _normalize(sample.astype(np.float64))
    cent = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_size: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """IVF-bucketed approximate top-k: only vectors in the query's nprobe
    nearest centroid partitions are scored. Recall < 1 by construction.

    The k-means sample is HASH-ORDERED, not a layout prefix: ds.limit()
    returns whatever blocks arrive first, so centroids — and therefore
    every IVF result — would change with repartitioning, file order and
    task completion order (no unseeded/order-dependent logic, CLAUDE.md).
    Instead each block emits its sample_size smallest rows by
    stable_hash64(id) (a uniform deterministic pseudo-order) and the
    driver keeps the global smallest — invariant to execution shape,
    bounded at sample_size rows per block."""
    from ..functions.hashing import stable_hash64

    def block_sample(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col].to_pylist(), dtype=np.int64)
        h = np.fromiter(
            (stable_hash64(str(i)) for i in ids), dtype=np.uint64, count=len(ids)
        )
        keep = np.lexsort((ids, h))[:sample_size]
        return pa.table(
            {"_h": pa.array(h[keep]), id_col: b[id_col].take(pa.array(keep)),
             vec_col: b[vec_col].take(pa.array(keep))}
        )

    sdf = (
        ds.map_batches(block_sample, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["_h", id_col], kind="mergesort")
        .head(sample_size)
    )
    sample = np.array(sdf[vec_col].tolist(), dtype=np.float64)
    cent = kmeans_centroids(sample, n_clusters)
    q = _normalize(queries.astype(np.float64))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    cent_ref = ray.put(cent)
    probe_ref = ray.put(probe)
    q_ref = ray.put(q)

    class _Score:
        def __init__(self):
            self.cent = localize(ray.get(cent_ref))
            self.probe = localize(ray.get(probe_ref))
            self.q = localize(ray.get(q_ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            vecs = _normalize(vec_matrix(batch[vec_col]))
            assign = np.argmax(vecs @ self.cent.T, axis=1)  # (batch,)
            sims = self.q @ vecs.T
            o_q, o_id, o_s = [], [], []
            for qi in range(sims.shape[0]):
                mask = np.isin(assign, self.probe[qi])
                if not mask.any():
                    continue
                cand = np.nonzero(mask)[0]
                sel = cand[_local_topk_tiesafe(sims[qi, cand], ids[cand], k)]
                for c in sel:
                    o_q.append(qi)
                    o_id.append(int(ids[c]))
                    o_s.append(float(sims[qi, c]))
            return pa.table(
                {
                    "query_id": pa.array(o_q, pa.int32()),
                    id_col: pa.array(o_id, pa.int64()),
                    "cos_sim": pa.array(o_s, pa.float64()),
                }
            )

    partials = ds.map_batches(_Score, batch_format="pyarrow", concurrency=auto_pool()).to_pandas()
    out_rows = []
    for qi, g in partials.groupby("query_id"):
        g = g.sort_values(["cos_sim", id_col], ascending=[False, True]).head(k)
        out_rows.append(g)
    merged = pd.concat(out_rows) if out_rows else partials
    merged["cos_sim"] = round_half_away(merged["cos_sim"].to_numpy(), 4)
    return pa.Table.from_pandas(merged.reset_index(drop=True), preserve_index=False)
