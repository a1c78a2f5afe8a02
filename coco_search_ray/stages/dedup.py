"""Deduplication suite over a documents table — the operations a
large-scale training-data pipeline needs, each expressed Ray-Data-first:

- exact dedup:       content-hash column (vectorized map) -> groupby(hash)
                     -> min id + copy count. Hash-partition + per-group
                     keep-first, the reference's dedup shape
                     (deps/extractor.py:181-203).
- MinHash + LSH:     shingle -> signature -> (band, band_hash) explosion
                     -> groupby bucket -> candidate pairs -> exact Jaccard
                     verify -> connected components -> survivors.
- SimHash:           64-bit fingerprint; candidate pairs share one of 4
                     16-bit sub-bands (Hamming <= 3 guarantee), verified
                     by full Hamming distance.
- n-gram Jaccard:    word-3-gram verification kernel (used standalone or
                     as the verify step of LSH).
- embedding cosine:  near-dup pairs over an embedding column; brute-force
                     per-batch matmul against a broadcast matrix at test
                     scale, sign-LSH bucketed variant as the scale path.

Pair emission convention: (a, b) with a < b, deduped, sorted — fully
deterministic under parallel block arrival.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..functions.hashing import (
    MinHasher,
    char_shingles,
    content_sha256,
    hamming64,
    jaccard,
    word_ngrams,
)
from .canonicalize import union_find


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_text_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    h = [content_sha256(t or "") for t in batch[text_col].to_pylist()]
    return batch.append_column("text_hash", pa.array(h, pa.string()))


def exact_dedup_groups(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """One row per distinct text: (doc_id = min id, n_copies)."""
    hashed = ds.map_batches(
        lambda b: add_text_hash(b, text_col), batch_format="pyarrow"
    ).select_columns(["text_hash", id_col])
    return (
        hashed.groupby("text_hash")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_copies"))
        .select_columns([id_col, "n_copies"])
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_LSH_NUM_PERM = 128
_LSH_NUM_BANDS = 32
_NEARDUP_JACCARD = 0.6


def _minhash_band_explode(
    batch: pa.Table, text_col: str, id_col: str, hasher: MinHasher, shingle_k: int
) -> pa.Table:
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    o_id, o_band, o_hash = [], [], []
    for i, t in zip(ids, texts):
        sig = hasher.signature(char_shingles(t or "", k=shingle_k))
        for band, bh in hasher.band_keys(sig):
            o_id.append(i)
            o_band.append(band)
            o_hash.append(bh)
    return pa.table(
        {
            id_col: pa.array(o_id, pa.int64()),
            "band_id": pa.array(o_band, pa.int32()),
            "band_hash": pa.array(np.array(o_hash, dtype=np.uint64)),
        }
    )


class _MinhashExplode:
    """Actor: the permutation tables are built once per worker."""

    def __init__(self, text_col: str, id_col: str, shingle_k: int):
        self.hasher = MinHasher(num_perm=_LSH_NUM_PERM, num_bands=_LSH_NUM_BANDS)
        self.text_col, self.id_col, self.shingle_k = text_col, id_col, shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _minhash_band_explode(batch, self.text_col, self.id_col, self.hasher, self.shingle_k)


def _pairs_within_band(df: pd.DataFrame, id_col: str, hash_col: str, max_bucket: int) -> pd.DataFrame:
    """All same-bucket pairs within one coarse group, bucketed by
    ``hash_col``. One Ray group per BAND (a few dozen groups), not per
    bucket (millions of tiny groups — per-group overhead would dominate);
    inside, pair emission is numpy over the sorted bucket runs — one
    output frame per band, never one per bucket (a DataFrame per bucket
    costs ~0.25 ms x 100k buckets)."""
    empty = pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    if df.empty:
        return empty
    d = df[[hash_col, id_col]].drop_duplicates().sort_values([hash_col, id_col], kind="mergesort")
    hashes = d[hash_col].to_numpy()
    ids = d[id_col].to_numpy()
    # run boundaries of equal hash values (sorted)
    boundary = np.nonzero(hashes[1:] != hashes[:-1])[0] + 1
    starts = np.concatenate(([0], boundary))
    ends = np.concatenate((boundary, [len(hashes)]))
    a_out: list[np.ndarray] = []
    b_out: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        n = e - s
        if n < 2 or n > max_bucket:
            continue
        i, j = np.triu_indices(n, k=1)
        run = ids[s:e]
        a_out.append(run[i])
        b_out.append(run[j])
    if not a_out:
        return empty
    return pd.DataFrame({"a": np.concatenate(a_out), "b": np.concatenate(b_out)})


def distinct_pairs(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """Dedup (a, b) pairs proposed by multiple bands — native aggregate
    (no per-group python)."""
    return pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n_bands")).select_columns(["a", "b"])


def minhash_candidate_pairs(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id", shingle_k: int = 5
) -> ray.data.Dataset:
    """LSH blocking: Dataset of candidate (a, b) pairs (unverified; may
    contain duplicates when several bands agree — see note below)."""
    bands = ds.map_batches(
        _MinhashExplode,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col, "shingle_k": shingle_k},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return bands.groupby("band_id").map_groups(
        lambda df: _pairs_within_band(df, id_col, "band_hash", 256), batch_format="pandas"
    )
    # NOTE: pairs proposed by several bands appear multiple times; callers
    # dedupe (drop_duplicates on the small verified output, or
    # distinct_pairs() for a distributed distinct) — verification is
    # idempotent per pair, so a mid-pipeline distinct would only add an
    # extra all-to-all shuffle.


def verify_pairs_jaccard(
    pairs: ray.data.Dataset,
    docs: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = _NEARDUP_JACCARD,
    use_ngrams: bool = False,
    shingle_k: int = 5,
) -> ray.data.Dataset:
    """Exact-verify candidate pairs against broadcast doc texts.
    At 100 TB the verify side would re-join texts by id range; here the
    doc table is the broadcast small side."""
    texts_ref = ray.put(dict(zip(docs[id_col].to_pylist(), docs[text_col].to_pylist())))

    class _Verify:
        def __init__(self):
            texts = ray.get(texts_ref)
            if use_ngrams:
                self.sets = {i: word_ngrams(t or "", n=3) for i, t in texts.items()}
            else:
                self.sets = {i: char_shingles(t or "", k=shingle_k) for i, t in texts.items()}

        def __call__(self, batch: pa.Table) -> pa.Table:
            o_a, o_b, o_j = [], [], []
            for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
                j = jaccard(self.sets[a], self.sets[b])
                if j >= threshold:
                    o_a.append(a)
                    o_b.append(b)
                    o_j.append(round(j, 6))
            return pa.table(
                {
                    "a": pa.array(o_a, pa.int64()),
                    "b": pa.array(o_b, pa.int64()),
                    "jaccard_sim": pa.array(o_j, pa.float64()),
                }
            )

    return pairs.map_batches(_Verify, batch_format="pyarrow", concurrency=(1, 8))


def neardup_survivors(
    ds: ray.data.Dataset,
    docs: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = _NEARDUP_JACCARD,
) -> pa.Table:
    """Full near-dup dedup: LSH -> verify -> connected components -> keep
    min id per component. Returns a small table (survivor ids + group
    size); the component step runs on the driver over verified pairs only
    (provably small candidate set)."""
    pairs = (
        verify_pairs_jaccard(
            minhash_candidate_pairs(ds, text_col, id_col), docs, text_col, id_col, threshold
        )
        .to_pandas()
        .drop_duplicates(subset=["a", "b"])
    )
    all_ids = [str(i) for i in docs[id_col].to_pylist()]
    mapping = union_find(
        sorted(all_ids), sorted((str(a), str(b)) for a, b in zip(pairs["a"], pairs["b"]))
    )
    groups: dict[str, int] = {}
    for _id, canon in mapping.items():
        groups[canon] = groups.get(canon, 0) + 1
    out = sorted((int(c), n) for c, n in groups.items())
    return pa.table(
        {
            id_col: pa.array([a for a, _ in out], pa.int64()),
            "group_size": pa.array([n for _, n in out], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def simhash_candidate_pairs(
    simhashed: ray.data.Dataset, id_col: str = "doc_id", max_hamming: int = 3
) -> ray.data.Dataset:
    """Candidates = docs sharing one of 4 16-bit sub-bands of the 64-bit
    SimHash (any pair at Hamming <= 3 must agree on >= 1 band), verified by
    full Hamming distance."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        hashes = batch["simhash"].to_pylist()
        o_id, o_band, o_key, o_sim = [], [], [], []
        for i, h in zip(ids, hashes):
            for band in range(4):
                o_id.append(i)
                o_band.append(band)
                o_key.append((h >> (band * 16)) & 0xFFFF)
                o_sim.append(h)
        return pa.table(
            {
                id_col: pa.array(o_id, pa.int64()),
                "band_id": pa.array(o_band, pa.int32()),
                "band_key": pa.array(o_key, pa.int32()),
                "simhash": pa.array(np.array(o_sim, dtype=np.uint64)),
            }
        )

    def band_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """One output frame per BAND; buckets are sorted runs, pairs and
        Hamming distances accumulated in plain lists (buckets with <2
        members — the vast majority — never allocate anything)."""
        d = df[["band_key", id_col, "simhash"]].drop_duplicates(
            subset=["band_key", id_col]
        ).sort_values(["band_key", id_col], kind="mergesort")
        keys = d["band_key"].to_numpy()
        ids = d[id_col].to_numpy()
        hashes = [int(x) for x in d["simhash"].tolist()]
        boundary = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate(([0], boundary)) if len(keys) else np.array([], dtype=int)
        ends = np.concatenate((boundary, [len(keys)])) if len(keys) else np.array([], dtype=int)
        o_a: list[int] = []
        o_b: list[int] = []
        o_h: list[int] = []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2 or n > 256:
                continue
            for i in range(s, e):
                for j in range(i + 1, e):
                    h = hamming64(hashes[i], hashes[j])
                    if h <= max_hamming:
                        o_a.append(int(ids[i]))
                        o_b.append(int(ids[j]))
                        o_h.append(h)
        return pd.DataFrame(
            {
                "a": pd.Series(o_a, dtype="int64"),
                "b": pd.Series(o_b, dtype="int64"),
                "hamming": pd.Series(o_h, dtype="int64"),
            }
        )

    # duplicates across bands carry identical hamming values; callers
    # drop_duplicates on (a, b) (small output) instead of paying a second
    # all-to-all aggregate here
    return (
        simhashed.map_batches(explode, batch_format="pyarrow")
        .groupby("band_id")
        .map_groups(band_pairs, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    ds: ray.data.Dataset,
    all_vecs: np.ndarray,
    all_ids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Brute-force cosine near-dup pairs: each batch matmuls against the
    broadcast full matrix (fine up to ~10^5 vectors / worker heap; beyond
    that use embedding_neardup_pairs_lsh)."""
    all_vecs = all_vecs.astype(np.float64)
    norms = np.linalg.norm(all_vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat_ref = ray.put(all_vecs / norms)
    ids_ref = ray.put(all_ids.astype(np.int64))

    class _Pairs:
        def __init__(self):
            self.mat = ray.get(mat_ref)
            self.ids = ray.get(ids_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
            n = np.linalg.norm(vecs, axis=1, keepdims=True)
            n[n == 0] = 1.0
            vecs = vecs / n
            sims = vecs @ self.mat.T  # (batch, all)
            o_a, o_b, o_s = [], [], []
            for r in range(sims.shape[0]):
                hits = np.nonzero(sims[r] >= threshold)[0]
                for c in hits:
                    a, b = int(bids[r]), int(self.ids[c])
                    if a < b:  # each unordered pair emitted once (by its a-side batch)
                        o_a.append(a)
                        o_b.append(b)
                        v = float(sims[r, c]); o_s.append(np.floor(abs(v) * 1e4 + 0.5) / 1e4 * (1 if v >= 0 else -1))
            return pa.table(
                {
                    "a": pa.array(o_a, pa.int64()),
                    "b": pa.array(o_b, pa.int64()),
                    "cos_sim": pa.array(o_s, pa.float64()),
                }
            )

    return ds.map_batches(_Pairs, batch_format="pyarrow", concurrency=(1, 8))


def embedding_neardup_pairs_lsh(
    ds: ray.data.Dataset,
    dim: int,
    threshold: float = 0.95,
    num_planes: int = 16,
    num_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> ray.data.Dataset:
    """Scale path: random-hyperplane sign-LSH bucketing -> per-bucket exact
    cosine. Recall < 1 by construction (LSH); num_tables trades recall for
    shuffle volume."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(num_tables, num_planes, dim)).astype(np.float32)
    planes_ref = ray.put(planes)

    class _Bucket:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float32)
            n = np.linalg.norm(vecs, axis=1, keepdims=True)
            n[n == 0] = 1.0
            vecs = vecs / n
            o_id, o_t, o_k, o_v = [], [], [], []
            pow2 = 1 << np.arange(self.planes.shape[1], dtype=np.int64)
            for t in range(self.planes.shape[0]):
                signs = (vecs @ self.planes[t].T) > 0  # (n, planes)
                keys = (signs.astype(np.int64) * pow2).sum(axis=1)
                o_id.extend(ids.tolist())
                o_t.extend([t] * len(ids))
                o_k.extend(keys.tolist())
                o_v.extend(vecs.tolist())
            return pa.table(
                {
                    id_col: pa.array(o_id, pa.int64()),
                    "table_id": pa.array(o_t, pa.int32()),
                    "bucket": pa.array(o_k, pa.int64()),
                    "nvec": pa.array(o_v, pa.list_(pa.float32())),
                }
            )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows = df.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = rows[id_col].to_numpy()
        if len(ids) < 2 or len(ids) > 512:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype="int64"),
                    "b": pd.Series(dtype="int64"),
                    "cos_sim": pd.Series(dtype="float64"),
                }
            )
        vecs = np.array(rows["nvec"].tolist(), dtype=np.float32)
        sims = vecs @ vecs.T
        o_a, o_b, o_s = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    o_a.append(int(ids[i]))
                    o_b.append(int(ids[j]))
                    o_s.append(round(float(sims[i, j]), 4))
        return pd.DataFrame(
            {
                "a": pd.Series(o_a, dtype="int64"),
                "b": pd.Series(o_b, dtype="int64"),
                "cos_sim": pd.Series(o_s, dtype="float64"),
            }
        )

    def table_pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = [bucket_pairs(g) for _k, g in df.groupby("bucket", sort=True)]
        return pd.concat(outs, ignore_index=True) if outs else bucket_pairs(df.iloc[0:0])

    # duplicate pairs across tables carry identical cos_sim; callers
    # drop_duplicates on (a, b)
    return (
        ds.map_batches(_Bucket, batch_format="pyarrow", concurrency=(1, 8))
        .groupby("table_id")
        .map_groups(table_pairs, batch_format="pandas")
    )
