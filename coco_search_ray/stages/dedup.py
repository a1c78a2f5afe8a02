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
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..functions.broadcast import deref_cached, localize
from ..functions.concurrency import auto_pool
from ..functions.hashing import (
    MinHasher,
    char_shingle_hashes,
    content_sha256,
    jaccard_u64,
    popcount64,
    word_ngram_hashes,
)
from ..functions.numeric import round_half_away, vec_matrix
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


# permutation tables cached per worker PROCESS (stateless map function,
# not an actor pool: task stages fuse with the upstream read; an actor
# pool would break fusion and force a plasma hop — CLAUDE.md perf lesson)
_HASHER_CACHE: dict[tuple[int, int], MinHasher] = {}


def _get_hasher(num_perm: int, num_bands: int) -> MinHasher:
    h = _HASHER_CACHE.get((num_perm, num_bands))
    if h is None:
        h = MinHasher(num_perm=num_perm, num_bands=num_bands)
        _HASHER_CACHE[(num_perm, num_bands)] = h
    return h


def minhash_band_explode(
    batch: pa.Table, text_col: str, id_col: str, shingle_k: int
) -> pa.Table:
    """Fully batched: per-doc shingle hashes via one vectorized rolling
    pass each, ONE (docs x perms) signature matrix per batch
    (minhash_signatures / reduceat), band keys as one FNV fold — no
    per-doc Python in the hot path."""
    hasher = _get_hasher(_LSH_NUM_PERM, _LSH_NUM_BANDS)
    ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
    texts = batch[text_col].to_pylist()
    hash_arrays = [char_shingle_hashes(t or "", k=shingle_k) for t in texts]
    sigs = hasher.signatures_batch(hash_arrays)
    bh = hasher.band_hashes(sigs)  # (n, num_bands)
    n, nb = bh.shape
    return pa.table(
        {
            id_col: pa.array(np.repeat(ids, nb)),
            "band_id": pa.array(np.tile(np.arange(nb, dtype=np.int32), n)),
            "band_hash": pa.array(bh.ravel()),
        }
    )


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
    contain duplicates when several bands agree — see note below).
    ``batch_size`` bounds the per-task signature matrix so the explode
    parallelizes even when the input arrives as one big block."""
    bands = ds.map_batches(
        lambda b: minhash_band_explode(b, text_col, id_col, shingle_k),
        batch_format="pyarrow",
        batch_size=1024,
    )
    return bands.groupby("band_id").map_groups(
        lambda df: _pairs_within_band(df, id_col, "band_hash", 256), batch_format="pandas"
    )
    # NOTE: pairs proposed by several bands appear multiple times; callers
    # dedupe (drop_duplicates on the small verified output, or
    # distinct_pairs() for a distributed distinct) — verification is
    # idempotent per pair, so a mid-pipeline distinct would only add an
    # extra all-to-all shuffle.


# above this many candidate pairs the pair-touched-doc gather stops being
# "small" and verification switches to the streaming shuffle-join plan
_VERIFY_JOIN_THRESHOLD = 2_000_000


def _pair_hash_fn(use_ngrams: bool, shingle_k: int):
    if use_ngrams:
        return lambda t: word_ngram_hashes(t or "", n=3)
    return lambda t: char_shingle_hashes(t or "", k=shingle_k)


def _verify_against_sets(sets_ref, threshold: float):
    """Batch verifier over (a, b) rows given a broadcast id -> hash-array
    dict (only PAIR-TOUCHED docs — never the corpus)."""

    def _verify(batch: pa.Table) -> pa.Table:
        sets: dict[int, np.ndarray] = deref_cached(sets_ref)
        o_a, o_b, o_j = [], [], []
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            # a pair naming an id with no doc row cannot verify — skip,
            # matching the join path's inner-join semantics (empty-set
            # placeholders would emit jaccard 1.0 for two MISSING docs,
            # a result the size-triggered escalation never produces)
            if a not in sets or b not in sets:
                continue
            j = jaccard_u64(sets[a], sets[b])
            if j >= threshold:
                o_a.append(a)
                o_b.append(b)
                o_j.append(round_half_away(j, 6))
        return pa.table(
            {
                "a": pa.array(o_a, pa.int64()),
                "b": pa.array(o_b, pa.int64()),
                "jaccard_sim": pa.array(o_j, pa.float64()),
            }
        )

    return _verify


def verify_pairs_jaccard(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset | pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = _NEARDUP_JACCARD,
    use_ngrams: bool = False,
    shingle_k: int = 5,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Exact-verify candidate pairs without ever broadcasting the corpus:
    driver/heap state stays O(pairs), never O(docs).

    Default plan (pairs provably small after LSH banding + bucket caps):
    semi-join GATHER — broadcast the pair-touched id set, filter the docs
    stream to those ids, compute their shingle-hash arrays distributed,
    broadcast that small dict, verify pairs in parallel. Above
    _VERIFY_JOIN_THRESHOLD pairs it switches automatically to the fully
    streaming plan: two hash joins re-attaching texts by id (a-side then
    b-side), Jaccard per joined row. Both verify with the vectorized
    hash-set kernels (distinct uint64 shingle hashes, np.intersect1d)."""
    if isinstance(docs, pa.Table):
        docs = ray.data.from_arrow(docs.select([id_col, text_col]))
    else:
        docs = docs.select_columns([id_col, text_col])
    hash_fn = _pair_hash_fn(use_ngrams, shingle_k)
    pairs = pairs.select_columns(["a", "b"]).materialize()
    if pairs.count() > _VERIFY_JOIN_THRESHOLD:
        return _verify_via_join(pairs, docs, text_col, id_col, threshold, hash_fn, num_partitions)

    pdf = pairs.to_pandas().drop_duplicates(subset=["a", "b"])  # O(pairs)
    if pdf.empty:
        return ray.data.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "jaccard_sim": pa.array([], pa.float64())})
        )
    touched = np.unique(pdf[["a", "b"]].to_numpy().ravel())
    touched_ref = ray.put(pa.array(touched, pa.int64()))

    def gather(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[id_col], value_set=deref_cached(touched_ref))
        hit = batch.filter(mask)
        hs = [hash_fn(t) for t in hit[text_col].to_pylist()]
        return pa.table(
            {
                id_col: hit[id_col],
                "_h": pa.array([h.tolist() for h in hs], pa.list_(pa.uint64())),
            }
        )

    small = docs.map_batches(gather, batch_format="pyarrow").to_pandas()  # O(touched)
    sets: dict[int, np.ndarray] = {}
    for i, h in zip(small[id_col], small["_h"]):
        arr = np.asarray(h, dtype=np.uint64)
        k = int(i)
        prev = sets.get(k)
        # duplicate doc ids (malformed but must not be nondeterministic):
        # keep the lexicographically-smallest hash set, not whichever
        # block arrived first
        if prev is None or arr.tobytes() < prev.tobytes():
            sets[k] = arr
    sets_ref = ray.put(sets)
    n_blocks = max(1, min(len(pdf) // 4096 + 1, auto_pool()[1]))
    pair_blocks = ray.data.from_pandas(np.array_split(pdf.reset_index(drop=True), n_blocks))
    return pair_blocks.map_batches(_verify_against_sets(sets_ref, threshold), batch_format="pyarrow")


def _verify_via_join(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    text_col: str,
    id_col: str,
    threshold: float,
    hash_fn,
    num_partitions: int,
) -> ray.data.Dataset:
    """Streaming fallback for giant pair sets: re-join texts by id.

    Candidate pairs proposed by SEVERAL agreeing bands arrive duplicated;
    the small path drop_duplicates them on the driver, so this path must
    dedupe too (or callers counting verified pairs would get different
    answers the day the corpus crosses the size switch). One coarse-
    bucket shuffle on hash(a): all copies of (a, b) share a, the inner
    pandas dedupe is exact — never one Ray group per pair."""
    from ..functions.bucketing import add_key_bucket

    def _dedupe(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["a", "b"]).drop(columns=["_bucket"])

    pairs = (
        pairs.map_batches(
            lambda b: add_key_bucket(b, "a", max(64, num_partitions)),
            batch_format="pyarrow",
        )
        .groupby("_bucket")
        .map_groups(_dedupe, batch_format="pandas")
    )
    docs_a = docs.rename_columns({id_col: "a", text_col: "_text_a"})
    docs_b = docs.rename_columns({id_col: "b", text_col: "_text_b"})
    joined = pairs.join(
        docs_a, join_type="inner", num_partitions=num_partitions, on=("a",)
    ).join(docs_b, join_type="inner", num_partitions=num_partitions, on=("b",))

    def _verify(batch: pa.Table) -> pa.Table:
        memo: dict[int, np.ndarray] = {}

        def hashes(i: int, t: str) -> np.ndarray:
            h = memo.get(i)
            if h is None:
                h = hash_fn(t)
                memo[i] = h
            return h

        o_a, o_b, o_j = [], [], []
        for a, b, ta, tb in zip(
            batch["a"].to_pylist(),
            batch["b"].to_pylist(),
            batch["_text_a"].to_pylist(),
            batch["_text_b"].to_pylist(),
        ):
            j = jaccard_u64(hashes(a, ta), hashes(b, tb))
            if j >= threshold:
                o_a.append(a)
                o_b.append(b)
                o_j.append(round_half_away(j, 6))
        return pa.table(
            {
                "a": pa.array(o_a, pa.int64()),
                "b": pa.array(o_b, pa.int64()),
                "jaccard_sim": pa.array(o_j, pa.float64()),
            }
        )

    return joined.map_batches(_verify, batch_format="pyarrow")


def neardup_survivors(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = _NEARDUP_JACCARD,
) -> ray.data.Dataset:
    """Full near-dup dedup: LSH -> verify (text re-join) -> connected
    components over PAIR-TOUCHED ids only -> keep min id per component.

    No O(corpus) driver state: union-find runs on the ids that appear in
    a verified pair (provably small — pairs require agreeing LSH bands
    AND Jaccard >= threshold), the id->canonical dict for that small set
    is broadcast. Returns the STREAMING Dataset of survivor rows
    (doc_id = component min id, group_size) — one row per surviving doc;
    sorting/collection belongs to the caller (gate queries sort at
    sf-test scale; a 100 TB run writes it straight to parquet)."""
    verified = (
        verify_pairs_jaccard(minhash_candidate_pairs(ds, text_col, id_col), ds, text_col, id_col, threshold)
        .to_pandas()
        .drop_duplicates(subset=["a", "b"])
    )
    touched = sorted({int(x) for x in verified["a"]} | {int(x) for x in verified["b"]})
    mapping = union_find(
        touched, sorted((int(a), int(b)) for a, b in zip(verified["a"], verified["b"]))
    )
    # group sizes are fully determined by the mapping (untouched docs are
    # singletons of size 1), so NO distributed groupby is needed: one
    # stateless map over the doc-id stream with two tiny broadcast dicts —
    # drop merged-away ids, annotate component roots with their size.
    merged_ids = pa.array(
        sorted(i for i, c in mapping.items() if i != c), pa.int64()
    )
    comp_size: dict[int, int] = {}
    for i, c in mapping.items():
        comp_size[c] = comp_size.get(c, 0) + 1
    roots = np.array(sorted(comp_size), dtype=np.int64)
    root_sizes = np.array([comp_size[r] for r in roots], dtype=np.int64)
    state_ref = ray.put((merged_ids, roots, root_sizes))

    def survivors(batch: pa.Table) -> pa.Table:
        m_ids, rts, rsz = deref_cached(state_ref)
        kept = batch.filter(
            pc.invert(pc.is_in(batch[id_col], value_set=m_ids))
        )
        ids = kept[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sizes = np.ones(len(ids), dtype=np.int64)
        if len(rts):
            pos = np.searchsorted(rts, ids)
            pos_c = np.minimum(pos, len(rts) - 1)
            hit = rts[pos_c] == ids
            sizes[hit] = rsz[pos_c[hit]]
        return pa.table({id_col: pa.array(ids), "group_size": pa.array(sizes)})

    return ds.select_columns([id_col]).map_batches(survivors, batch_format="pyarrow")


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
        """Vectorized 4-band explosion (np.repeat/tile — the MinHash
        twin's shape; no per-row Python)."""
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        hashes = np.asarray(batch["simhash"].to_pylist(), dtype=np.uint64)
        n = len(ids)
        shifts = (np.arange(4, dtype=np.uint64) * np.uint64(16))[None, :]
        keys = ((hashes[:, None] >> shifts) & np.uint64(0xFFFF)).astype(np.int32)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, 4)),
                "band_id": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                "band_key": pa.array(keys.ravel()),
                "simhash": pa.array(np.repeat(hashes, 4)),
            }
        )

    def band_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """One output frame per BAND; buckets are sorted runs. Per eligible
        run (2..256 members), Hamming comes from ONE popcount over the
        (run x run) uint64 XOR matrix — no per-pair Python."""
        # sort BEFORE the keep-first dedupe, with simhash as the total
        # tiebreak: a duplicate id carrying two different simhashes (the
        # very shape a dedup stage must tolerate) would otherwise keep
        # whichever row the shuffle delivered first — block-arrival-
        # dependent output (CLAUDE.md: every sort needs a total tiebreak)
        d = df[["band_key", id_col, "simhash"]].sort_values(
            ["band_key", id_col, "simhash"], kind="mergesort"
        ).drop_duplicates(subset=["band_key", id_col])
        keys = d["band_key"].to_numpy()
        ids = d[id_col].to_numpy()
        hashes = d["simhash"].to_numpy(dtype=np.uint64)
        boundary = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate(([0], boundary)) if len(keys) else np.array([], dtype=int)
        ends = np.concatenate((boundary, [len(keys)])) if len(keys) else np.array([], dtype=int)
        a_out: list[np.ndarray] = []
        b_out: list[np.ndarray] = []
        h_out: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2 or n > 256:
                continue
            run_h = hashes[s:e]
            ham = popcount64(run_h[:, None] ^ run_h[None, :])
            i, j = np.nonzero(np.triu(ham <= max_hamming, k=1))
            if len(i):
                run_ids = ids[s:e]
                a_out.append(run_ids[i])
                b_out.append(run_ids[j])
                h_out.append(ham[i, j])
        if not a_out:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype="int64"),
                    "b": pd.Series(dtype="int64"),
                    "hamming": pd.Series(dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "a": np.concatenate(a_out).astype(np.int64),
                "b": np.concatenate(b_out).astype(np.int64),
                "hamming": np.concatenate(h_out).astype(np.int64),
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
            self.mat = localize(ray.get(mat_ref))
            self.ids = localize(ray.get(ids_ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            vecs = vec_matrix(batch[vec_col])
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

    return ds.map_batches(_Pairs, batch_format="pyarrow", concurrency=auto_pool())


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
            self.planes = localize(ray.get(planes_ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            # normalize in float64, SHIP float32 (half the shuffle bytes;
            # storage truncation costs ~1e-7 in a cosine — far below the
            # 4-dp output rounding). The per-bucket matmul upcasts back
            # to f64: f32 ACCUMULATION over many dims (~dim * 2^-24)
            # exceeds the 4-dp half-ulp and flipped near-threshold pairs
            # vs the brute path (round-5 review)
            v64 = vec_matrix(batch[vec_col])
            n = np.linalg.norm(v64, axis=1, keepdims=True)
            n[n == 0] = 1.0
            vecs = (v64 / n).astype(np.float32)
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
        # duplicate ids (malformed input): pick the row with the smallest
        # vector bytes, not whichever block arrived first — the key check
        # is cheap and the tiebreak map only runs on actual duplicates
        if df[id_col].duplicated().any():
            df = df.assign(_vk=df["nvec"].map(lambda v: np.asarray(v, np.float32).tobytes()))
            df = df.sort_values([id_col, "_vk"], kind="mergesort").drop(columns=["_vk"])
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
        vecs = np.array(rows["nvec"].tolist(), dtype=np.float64)
        sims = vecs @ vecs.T
        o_a, o_b, o_s = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    o_a.append(int(ids[i]))
                    o_b.append(int(ids[j]))
                    o_s.append(round_half_away(float(sims[i, j]), 4))
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
        ds.map_batches(_Bucket, batch_format="pyarrow", concurrency=auto_pool())
        .groupby("table_id")
        .map_groups(table_pairs, batch_format="pandas")
    )


# above this many vectors the brute-force broadcast matrix stops fitting
# a worker heap comfortably (10^5 x 768 float64 = ~0.6 GB) and the
# operator switches to the sign-LSH bucketed plan — the same autoswitch
# discipline as IVF (>20k docs), the distributed linkmap (>2M surfaces)
# and the verify join (>2M pairs)
_EMB_BRUTE_MAX = 100_000


def embedding_neardup(
    ds: ray.data.Dataset,
    dim: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    brute_max: int = _EMB_BRUTE_MAX,
    num_planes: int = 16,
    num_tables: int = 8,
    seed: int = 11,
) -> ray.data.Dataset:
    """Size-triggered embedding near-dup: exact brute-force cosine below
    ``brute_max`` vectors (recall 1.0 — the broadcast matrix is small),
    sign-LSH bucketing above it (recall < 1 by construction; num_tables
    trades recall for shuffle volume). Callers drop_duplicates on (a, b):
    the LSH branch may propose a pair from several tables.
    """
    ds = ds.select_columns([id_col, vec_col]).materialize()
    if ds.count() <= brute_max:
        t = pa.concat_tables(
            ray.get(r) for r in ds.to_arrow_refs()
        ).combine_chunks()
        # float64: an f32 gather would truncate the broadcast matrix and
        # make the autoswitch path differ from a direct
        # embedding_neardup_pairs call with the caller's f64 vectors
        # (the brute_max doc math already budgets float64)
        vecs = vec_matrix(t[vec_col])
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        return embedding_neardup_pairs(ds, vecs, ids, threshold, id_col, vec_col)
    return embedding_neardup_pairs_lsh(
        ds, dim, threshold, num_planes, num_tables, id_col, vec_col, seed
    )


# Within-cluster cosine dedup is row-BLOCKED: the working similarity
# matrix is at most (block x chunk) float64 = 512*2048*8 = 8 MB, the
# same cache-sized-chunk discipline as linker_core.link_many (CLAUDE.md).
# A 31k-row cluster (10^9 vectors at n_clusters ~ sqrt(n)) would
# otherwise build an ~8 GB n x n matrix inside one map_groups worker.
_SEMDEDUP_BLOCK_ROWS = 512
_SEMDEDUP_CHUNK_ROWS = 2048


def semantic_dedup(
    ds: ray.data.Dataset,
    sample_vecs: np.ndarray,
    threshold: float = 0.9,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 5,
    block_rows: int = _SEMDEDUP_BLOCK_ROWS,
    chunk_rows: int = _SEMDEDUP_CHUNK_ROWS,
) -> tuple[ray.data.Dataset, np.ndarray]:
    """SemDeDup-shaped semantic deduplication: k-means clusters on a
    bounded driver-side sample, centroids broadcast ONCE, per-batch
    vectorized argmax assignment, then WITHIN-cluster cosine dedup —
    a row is dropped iff a LOWER-id row in the same cluster has
    cosine >= threshold (keep-first, deterministic). All-pairs work is
    confined to single clusters (~n/k rows each), never the corpus;
    one groupby(cluster) is the only shuffle — the structure that
    holds at 10^9 vectors with n_clusters ~ sqrt(n).

    Cross-engine float discipline: cosines are ROUNDED to 6 decimals
    before every argmax / threshold compare (ties then break toward
    the LOWER cluster id), so an independent re-derivation from the
    returned centroids (e.g. DuckDB list_cosine_similarity) lands on
    identical assignments and drops. Boundary caveat: we compute
    normalize-then-dot while DuckDB computes dot/(|a||b|); the two op
    orders can differ in the last ulp, so a cosine landing EXACTLY on
    a 1e-6 rounding boundary could in principle flip across engines.
    No gate vector sits near a boundary — PINNED by
    tests/test_dedup_ann.py::test_semdedup_gate_cosines_off_rounding_boundary
    (min margin ~3.6e-11 cosine units vs a dim*eps drift bound of
    ~2.8e-14); for adversarial data, export the per-row rounded
    similarities instead of re-deriving.

    Returns (Dataset[cluster, vec_id, dropped], centroids)."""
    from .ann import kmeans_centroids

    cents = kmeans_centroids(sample_vecs, n_clusters, seed=seed)
    cents_ref = ray.put(cents)

    def assign(b: pa.Table) -> pa.Table:
        c = deref_cached(cents_ref, localize_arrays=True)
        x = vec_matrix(b[vec_col])
        n = np.linalg.norm(x, axis=1, keepdims=True)
        n[n == 0] = 1.0
        # half-AWAY rounding to mirror DuckDB's round() (np.round is
        # banker's half-to-even; CLAUDE.md rounding rule)
        cos = round_half_away((x / n) @ c.T, 6)
        return pa.table(
            {
                "cluster": pa.array(np.argmax(cos, axis=1).astype(np.int32)),
                id_col: b[id_col],
                vec_col: b[vec_col],
            }
        )

    def dedup_cluster(df: pd.DataFrame) -> pd.DataFrame:
        # duplicate ids (malformed input): order their rows by vector
        # bytes so the keep-first outcome never depends on block arrival
        if df[id_col].duplicated().any():
            df = df.assign(_vk=df[vec_col].map(lambda v: np.asarray(v, np.float64).tobytes()))
            df = df.sort_values([id_col, "_vk"], kind="mergesort").drop(columns=["_vk"])
            df = df.reset_index(drop=True)
        else:
            df = df.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        x = np.array(df[vec_col].to_list(), dtype=np.float64)
        n = np.linalg.norm(x, axis=1, keepdims=True)
        n[n == 0] = 1.0
        xn = x / n
        m = len(xn)
        # row-blocked keep-first: dropped[j] iff ANY i<j has cos>=thr
        # (earlier rows count whether or not they were themselves
        # dropped — identical to the full triu(any) formulation).
        # Drops only look BACKWARD, so blocking preserves semantics
        # exactly while bounding the working matrix to block x chunk.
        dropped = np.zeros(m, dtype=bool)
        for b0 in range(0, m, block_rows):
            b1 = min(b0 + block_rows, m)
            blk = xn[b0:b1]
            hit = np.zeros(b1 - b0, dtype=bool)
            for c0 in range(0, b0, chunk_rows):  # vs all earlier rows
                c1 = min(c0 + chunk_rows, b0)
                cos = round_half_away(xn[c0:c1] @ blk.T, 6)
                hit |= (cos >= threshold).any(axis=0)
            cos = round_half_away(blk @ blk.T, 6)  # within-block i<j
            hit |= np.triu(cos >= threshold, k=1).any(axis=0)
            dropped[b0:b1] = hit
        return pd.DataFrame(
            {
                "cluster": df["cluster"].astype("int32"),
                id_col: df[id_col],
                "dropped": dropped,
            }
        )

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(dedup_cluster, batch_format="pandas")
    )
    return out, cents
