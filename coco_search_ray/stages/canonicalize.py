"""M3 — canonicalization: MinHash-blocked near-duplicate entity merging
via union-find, then a broadcast canonical-id rewrite.

The reference's closest mechanism is the global re-resolution pass over
all edges after any change (deps/extractor.py:387-395: new files may
resolve previously-external modules, so resolution is recomputed
globally). Our canonicalization is the generalization: entities whose
surface-form sets are near-duplicates (Jaccard >= threshold) collapse to
one canonical id = min(entity_id) in the connected component.

Scale shape (SURVEY.md §7.4):
  stateless map: entity -> MinHash signature -> (band_id, band_hash) keys
  shuffle:       groupby (band_id, band_hash) proposes candidate pairs
  verify:        exact Jaccard on the two surface sets (broadcast dict)
  union-find:    on the driver over the VERIFIED pair list only — the
                 candidate set is provably small (pairs require agreeing
                 LSH bands AND Jaccard >= threshold; buckets are capped at
                 MAX_BUCKET, oversized buckets are dropped with a counter
                 — the salting/skip guard for hot keys).

Both a Ray Data path (propose_pairs_ray) and a single-process path
(propose_pairs_local) are provided; they produce identical pair sets and
the oracle uses the local one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import MinHasher, jaccard

# True near-dup siblings (shared aliases + pluralized canonical) land at
# token-set Jaccard ~0.33-0.55; entities sharing a single generic word land
# ~0.17. 0.3 separates the two populations.
JACCARD_THRESHOLD = 0.3
MAX_BUCKET = 64  # pairs explode quadratically; a bucket this hot is a stop word, skip it


def entity_surface_set(row: dict) -> set[str]:
    """Similarity domain: the lowercased ENRICHED token set over all surface
    forms (canonical + aliases). Token-level comparison (same splitter as
    retrieval, functions/tokenize.py) makes 'Account Payment' /
    'Account Payments' + shared aliases near-duplicates while keeping
    entities that merely share one generic word apart."""
    from ..functions.tokenize import enrich_text_tokens

    surfaces = [row["canonical_name"]] + list(row.get("aliases") or [])
    toks: set[str] = set()
    for s in surfaces:
        toks.update(t.lower() for t in enrich_text_tokens(s))
    return toks


def _band_rows(rows: list[dict], hasher: MinHasher) -> pa.Table:
    eids: list[str] = []
    bands: list[int] = []
    bhashes: list[int] = []
    for row in rows:
        sig = hasher.signature(entity_surface_set(row))
        for band, bh in hasher.band_keys(sig):
            eids.append(row["entity_id"])
            bands.append(band)
            bhashes.append(bh)
    return pa.table(
        {
            "entity_id": pa.array(eids, pa.string()),
            "band_id": pa.array(bands, pa.int32()),
            "band_hash": pa.array(np.array(bhashes, dtype=np.uint64)),
        }
    )


def _pairs_from_bucket(eids: list[str], max_bucket: int = MAX_BUCKET) -> set[tuple[str, str]]:
    if len(eids) > max_bucket:
        return set()
    uniq = sorted(set(eids))
    return {(a, b) for i, a in enumerate(uniq) for b in uniq[i + 1 :]}


def propose_pairs_local(
    rows: list[dict], threshold: float = JACCARD_THRESHOLD, max_bucket: int = MAX_BUCKET
) -> list[tuple[str, str]]:
    hasher = MinHasher(num_perm=64, num_bands=32)
    table = _band_rows(rows, hasher)
    buckets: dict[tuple[int, int], list[str]] = {}
    for eid, band, bh in zip(
        table["entity_id"].to_pylist(), table["band_id"].to_pylist(), table["band_hash"].to_pylist()
    ):
        buckets.setdefault((band, bh), []).append(eid)
    cands: set[tuple[str, str]] = set()
    for eids in buckets.values():
        cands |= _pairs_from_bucket(eids, max_bucket)
    surf = {r["entity_id"]: entity_surface_set(r) for r in rows}
    # empty-set guard: token-less entities all share the all-MAX MinHash
    # sentinel signature AND jaccard(empty, empty) == 1.0, so without it
    # every such entity would merge into one canonical id (round-5
    # review) — an empty surface set carries no merge evidence
    return sorted(
        p
        for p in cands
        if surf[p[0]] and surf[p[1]] and jaccard(surf[p[0]], surf[p[1]]) >= threshold
    )


def propose_pairs_ray(
    rows: list[dict], threshold: float = JACCARD_THRESHOLD, max_bucket: int = MAX_BUCKET
) -> list[tuple[str, str]]:
    """Distributed blocking: explode band keys, groupby bucket, emit pairs,
    verify Jaccard. The catalog fits a Dataset of (entity_id, band, hash)
    rows; the surface sets are broadcast for verification."""
    import ray
    import ray.data
    import pandas as pd

    from ..functions.broadcast import deref_cached

    hasher = MinHasher(num_perm=64, num_bands=32)
    band_table = _band_rows(rows, hasher)
    surf_ref = ray.put({r["entity_id"]: entity_surface_set(r) for r in rows})

    def band_buckets(df: pd.DataFrame) -> pd.DataFrame:
        # ONE Ray group per BAND (32 groups), the bucket split is an
        # inner pandas groupby — never one Ray group per near-unique
        # (band_id, band_hash) key (CLAUDE.md: millions of tiny groups)
        out_a: list[str] = []
        out_b: list[str] = []
        for _bh, g in df.groupby("band_hash", sort=True):
            for a, b in sorted(_pairs_from_bucket(g["entity_id"].tolist(), max_bucket)):
                out_a.append(a)
                out_b.append(b)
        return pd.DataFrame({"a": out_a, "b": out_b})

    def verify(batch: pa.Table) -> pa.Table:
        # worker-cached deref: a plain ray.get would re-deserialize the
        # whole entity -> surface-set dict per batch (round-5 review)
        surf = deref_cached(surf_ref)
        keep_a, keep_b = [], []
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            # empty-set guard — see propose_pairs_local
            if surf[a] and surf[b] and jaccard(surf[a], surf[b]) >= threshold:
                keep_a.append(a)
                keep_b.append(b)
        return pa.table({"a": pa.array(keep_a, pa.string()), "b": pa.array(keep_b, pa.string())})

    ds = ray.data.from_arrow(band_table)
    pairs_ds = (
        ds.groupby("band_id")
        .map_groups(band_buckets, batch_format="pandas")
        .map_batches(verify, batch_format="pyarrow")
    )
    out = pairs_ds.to_pandas()
    if out.empty:  # a zero-pair catalog yields a column-less empty frame
        return []
    return sorted(set(zip(out["a"], out["b"])))


def union_find(ids: list[str], pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Canonical mapping: id -> min(id) of its connected component."""
    parent = {i: i for i in ids}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {i: find(i) for i in ids}


_RAY_CANON_THRESHOLD = 20_000


def canonical_mapping(
    rows: list[dict],
    use_ray: bool | None = None,
    threshold: float = JACCARD_THRESHOLD,
    max_bucket: int = MAX_BUCKET,
) -> dict[str, str]:
    """``use_ray=None`` auto-selects: small catalogs stay single-process
    (the Ray path's shuffle fixed cost dominates below ~20k entities);
    large ones run the distributed blocking. Both paths produce identical
    pair sets (pytest-checked). ``threshold``/``max_bucket`` are the
    config surface (canonicalization section)."""
    if use_ray is None:
        use_ray = len(rows) >= _RAY_CANON_THRESHOLD
    pairs = (
        propose_pairs_ray(rows, threshold, max_bucket)
        if use_ray
        else propose_pairs_local(rows, threshold, max_bucket)
    )
    return union_find([r["entity_id"] for r in rows], pairs)
