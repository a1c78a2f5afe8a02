"""Entity-linking core: an in-memory hybrid index over the entity catalog.

This is the broadcast "small side" of the linking stage. The catalog
(~10^3..10^6 entities, the dimension table) is turned into an
``EntityIndex`` ONCE per linker actor (stages/link.py builds it in
``__init__`` from a ``ray.put`` handle); the 10^12-turn mention stream is
then linked against it batch by batch with no shuffle — the same shape as
the reference's resolver module index (a dict built once over all files,
then probed per edge; reference: deps/extractor.py:94-98,
deps/resolver.py:109-160).

Retrieval per mention reproduces the reference's hybrid core:
  dense top-k (cosine over embeddings; pgvector's ``1 - cosine_distance``
  scoring, reference hybrid.py:252) + keyword top-k (tf-idf over the
  'simple'-config token stream, standing in for ts_rank) fused via
  RRF(k=60) with the keyword tiebreak, then canonical boost x2.

Acceptance rule (documented deviation, shared with the oracle): a link is
accepted only when it has keyword evidence (match_type keyword/both) or a
near-exact dense match (cosine >= 0.99). With hash-embeddings the dense
channel is an exact-match detector plus deterministic noise; requiring
corroboration keeps not-in-catalog mentions unlinked instead of linking
them to rank-1 noise. A real encoder swaps in behind stages/encode.py
without touching this logic.
"""

from __future__ import annotations

from dataclasses import dataclass
import functools
import math

import numpy as np

from .hashing import EMBED_DIM, hash_embeddings
from .rrf import apply_canonical_boost, prefetch_limit, rrf_fuse
from .tokenize import enrich_text_tokens, normalize_query_tokens

DENSE_EXACT_THRESHOLD = 0.99
DEFAULT_LIMIT = 5

# Above this many candidate docs the dense channel switches from exact
# brute-force to IVF cluster probing — the reference's vector index is
# ivfflat (approximate) too (chunks table DDL, indexer/flow.py:80-83).
# Exact-match detection survives probing: an identical surface form has
# an identical embedding, hence the same nearest centroid.
IVF_THRESHOLD = 20_000
IVF_NPROBE = 8


@dataclass
class LinkResult:
    entity_id: str
    surface: str
    fused_score: float
    match_type: str


class EntityIndex:
    """Hybrid (dense + keyword) index over catalog surface forms.

    One candidate document per (entity_id, surface_form): the canonical
    name plus every alias. Embeddings are L2-normalized hash-embeddings of
    the surface form; keyword postings are built from the enriched token
    stream of ``surface + description`` (document side enriched, query
    side natural — the reference's asymmetric tokenization,
    docs/retrieval.md:70-75).
    """

    def __init__(
        self,
        catalog_rows: list[dict],
        dim: int = EMBED_DIM,
        rrf_k: int | None = None,
        boost: float | None = None,
        prefetch_cap: int | None = None,
    ):
        # the retrieval constants (reference hybrid.py:29-37) are the
        # config surface (linking section); None = reference defaults
        from .rrf import CANONICAL_BOOST, MAX_PREFETCH, RRF_K

        self.rrf_k = RRF_K if rrf_k is None else rrf_k
        self.boost = CANONICAL_BOOST if boost is None else boost
        self.prefetch_cap = MAX_PREFETCH if prefetch_cap is None else prefetch_cap
        keys: list[str] = []
        entity_ids: list[str] = []
        surfaces: list[str] = []
        is_canonical: list[bool] = []
        doc_token_lists: list[list[str]] = []

        for row in catalog_rows:
            eid = row["entity_id"]
            # the KG mention stream encodes qualified values as
            # '<root_entity_id>.<tail>' and assembly re-splits at the
            # FIRST dot (pipelines/kg.py) — a dotted entity_id would
            # silently shift that split and diverge from the oracle's
            # verbatim id. Fail fast instead (round-5 review finding).
            if "." in eid or "|" in eid:
                raise ValueError(
                    f"catalog entity_id {eid!r} contains '.' or '|': "
                    "dotted ids break the qualified-mention "
                    "'<root_id>.<tail>' encoding and pipes break the "
                    "'<eid>|<surface>' candidate key; use ids free of both"
                )
            desc = row.get("description", "") or ""
            forms = [(row["canonical_name"], True)]
            forms += [(a, False) for a in (row.get("aliases") or [])]
            seen_surface: set[str] = set()
            for surface, canon in forms:
                if surface in seen_surface:
                    continue
                seen_surface.add(surface)
                keys.append(f"{eid}|{surface}")
                entity_ids.append(eid)
                surfaces.append(surface)
                is_canonical.append(canon)
                toks = [t.lower() for t in enrich_text_tokens(surface + " " + desc)]
                doc_token_lists.append(toks)

        self.keys = keys
        self.entity_ids = entity_ids
        self.surfaces = surfaces
        self.is_canonical = dict(zip(keys, is_canonical))
        self.n_docs = len(keys)
        # lexicographic rank of each key — lets batched top-k ordering use
        # integer lexsort instead of per-mention Python sorts on strings
        _order = np.argsort(np.array(keys)) if keys else np.empty(0, dtype=np.int64)
        self.key_rank = np.empty(len(keys), dtype=np.int64)
        self.key_rank[_order] = np.arange(len(keys))

        # score in the 32-dim digest base space when the tiled hash
        # embedding permits (dim % 32 == 0): identical cosines, 24x fewer
        # matmul flops at 768 — the linker's dense channel was matmul-bound
        from .hashing import digest_embeddings

        # functools.partial, not a lambda: the index must survive stdlib
        # pickling (broadcast.localize round-trips it on every worker)
        self._embed = (
            digest_embeddings
            if dim % 32 == 0
            else functools.partial(hash_embeddings, dim=dim)
        )
        emb = self._embed(surfaces)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        self.emb = (emb / norms).astype(np.float32)

        # IVF partitioning for large catalogs: k ~ sqrt(n) centroids from
        # a k-means on a sample; per-cluster member index lists
        self.ivf_centroids: np.ndarray | None = None
        self.ivf_members: list[np.ndarray] | None = None
        if self.n_docs >= IVF_THRESHOLD:
            from ..stages.ann import kmeans_centroids

            k = max(16, int(np.sqrt(self.n_docs)))
            rng = np.random.RandomState(13)
            sample_idx = rng.choice(self.n_docs, size=min(self.n_docs, 20_000), replace=False)
            self.ivf_centroids = kmeans_centroids(
                self.emb[sample_idx].astype(np.float64), k
            ).astype(np.float32)
            assign = np.argmax(self.emb @ self.ivf_centroids.T, axis=1)
            self.ivf_members = [
                np.nonzero(assign == c)[0] for c in range(len(self.ivf_centroids))
            ]

        # inverted postings: token -> (doc_idx array, tf array)
        postings: dict[str, dict[int, int]] = {}
        self.doc_len = np.zeros(self.n_docs, dtype=np.float32)
        for i, toks in enumerate(doc_token_lists):
            self.doc_len[i] = max(1.0, math.sqrt(len(toks)))
            for t in toks:
                postings.setdefault(t, {}).setdefault(i, 0)
                postings[t][i] += 1
        self.postings = {
            t: (
                np.fromiter(d.keys(), dtype=np.int64, count=len(d)),
                np.fromiter(d.values(), dtype=np.float32, count=len(d)),
            )
            for t, d in postings.items()
        }
        self.idf = {
            t: math.log(1.0 + self.n_docs / len(idxs[0])) for t, idxs in self.postings.items()
        }

    # ------------------------------------------------------------------

    def _probe_candidates(self, qvec: np.ndarray) -> np.ndarray | None:
        """IVF mode: doc indices in the query's nprobe nearest clusters;
        None = exact mode (score all docs)."""
        if self.ivf_centroids is None:
            return None
        order = np.argsort(-(self.ivf_centroids @ qvec))[:IVF_NPROBE]
        members = [self.ivf_members[c] for c in order]
        return np.concatenate(members) if members else np.empty(0, dtype=np.int64)

    def _dense_ranked(self, qvec: np.ndarray, prefetch: int) -> list[tuple[str, float]]:
        if self.n_docs == 0:
            return []
        cand = self._probe_candidates(qvec)
        if cand is None:
            scores = self.emb @ qvec
            pool = np.arange(self.n_docs)
        else:
            if len(cand) == 0:
                return []
            scores = self.emb[cand] @ qvec
            pool = cand
        k = min(prefetch, len(pool))
        idx = np.argpartition(-scores, k - 1)[:k]
        # deterministic order: score desc, key asc
        order = sorted(idx.tolist(), key=lambda i: (-float(scores[i]), self.keys[pool[i]]))
        return [(self.keys[pool[i]], float(scores[i])) for i in order]

    def _keyword_ranked(self, query: str, prefetch: int) -> list[tuple[str, float]]:
        idxs, scores = self._keyword_topk(query, prefetch)
        return [(self.keys[i], float(s)) for i, s in zip(idxs.tolist(), scores.tolist())]

    def _keyword_topk(self, query: str, prefetch: int) -> tuple[np.ndarray, np.ndarray]:
        """tf-idf keyword channel as (doc_idx, score) arrays, ordered
        score desc / key asc. float32 accumulation over a REUSED buffer
        (touched-entries-only reset + divide) — bit-identical scores to
        the original per-mention ``np.zeros(n_docs)`` accumulation, but
        O(postings touched) instead of O(n_docs) per mention."""
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        qtoks = [t.lower() for t in normalize_query_tokens(query)]
        if not qtoks:
            return empty
        acc = getattr(self, "_kw_acc", None)
        if acc is None:
            acc = self._kw_acc = np.zeros(self.n_docs, dtype=np.float32)
        touched: list[np.ndarray] = []
        # sorted: Python set iteration order varies with PYTHONHASHSEED
        # across worker processes, and the float32 += accumulation is
        # non-associative — an unsorted walk could flip a last-ulp
        # keyword-rank tie between workers (round-5 review)
        for t in sorted(set(qtoks)):
            p = self.postings.get(t)
            if p is None:
                continue
            idxs, tfs = p
            acc[idxs] += np.float32(self.idf[t]) * np.minimum(tfs, 4.0)
            touched.append(idxs)
        if not touched:
            return empty
        tu = np.unique(np.concatenate(touched)) if len(touched) > 1 else touched[0]
        sc = acc[tu] / self.doc_len[tu]
        acc[tu] = 0.0
        k = min(prefetch, len(tu))
        if len(tu) > k:
            part = np.argpartition(-sc, k - 1)[:k]
            tu, sc = tu[part], sc[part]
        order = np.lexsort((self.key_rank[tu], -sc.astype(np.float64)))[:prefetch]
        return tu[order], sc[order].astype(np.float64)

    # ------------------------------------------------------------------

    def link(self, mention: str, limit: int = DEFAULT_LIMIT) -> LinkResult | None:
        """Hybrid-link one mention surface form; None when unlinkable."""
        return self.link_many([mention], limit)[0]

    def channel_lists(
        self, query: str, limit: int = 10, hybrid: bool = True
    ) -> tuple[list[tuple[str, float]], list[tuple[str, float]]]:
        """The two prefetch-capped PRE-FUSION ranked lists ``search``
        fuses — exported so an oracle can independently re-derive the
        RRF + boost + tiebreak math from the raw channels."""
        prefetch = prefetch_limit(limit, self.prefetch_cap)
        qvec = self._embed([query])[0]
        qn = np.linalg.norm(qvec)
        if qn > 0:
            qvec = qvec / qn
        dense = self._dense_ranked(qvec, prefetch)
        keyword = self._keyword_ranked(query, prefetch) if hybrid else []
        return dense, keyword

    def search(self, query: str, limit: int = 10, hybrid: bool = True) -> list[dict]:
        """Ranked retrieval (the reference's search UX): returns the top
        ``limit`` fused candidates with scores/match_type instead of an
        accept-or-None link decision. ``hybrid=False`` is the
        semantic-only path (no keyword channel; the canonical boost still
        applies — reference hybrid.py:577-596 boosts the vector-only path
        too)."""
        dense, keyword = self.channel_lists(query, limit, hybrid)
        fused = apply_canonical_boost(
            rrf_fuse(dense, keyword, k=self.rrf_k), self.is_canonical, multiplier=self.boost
        )
        out = []
        for c in fused[:limit]:
            eid, surface = c.key.split("|", 1)
            out.append(
                {
                    "entity_id": eid,
                    "surface": surface,
                    "score": c.fused_score,
                    "match_type": c.match_type,
                    "vector_score": c.vector_score,
                    "keyword_score": c.keyword_score,
                    "is_canonical": self.is_canonical.get(c.key, False),
                }
            )
        return out

    def link_many(self, mentions: list[str], limit: int = DEFAULT_LIMIT) -> list[LinkResult | None]:
        """Batch linking: ONE (n_mentions x dim) @ (dim x n_docs) matmul for
        the dense channel, per-mention keyword top-k over a reused buffer,
        then RRF fusion + canonical boost + the acceptance rule fully
        vectorized across the chunk (rank math is exact in float64, so the
        batched fusion is bitwise-identical to per-mention ``rrf_fuse`` —
        pytest pins decisions + scores against the ``search()`` path).
        Results are identical to link() per mention."""
        if not mentions:
            return []
        # the CONFIGURED cap, like search()/channel_lists(): the default
        # cap here silently gave the link path a different candidate
        # pool than the search path on a non-default prefetch_cap
        prefetch = prefetch_limit(limit, self.prefetch_cap)
        out: list[LinkResult | None] = []
        # chunk so the (chunk x n_docs) float64 score matrix stays a few
        # MB: every linker on the node hammers its own matrix through
        # argpartition/take passes, and cache-resident chunks are ~16x
        # faster than L3-blowing ones at 32-way parallelism (measured
        # 6.8 s -> 0.43 s per 2.2k mentions on the bench catalog)
        # the floor only guards tiny catalogs (where 2M//n_docs would be
        # huge anyway); for large n_docs the quotient RULES so the matrix
        # never exceeds ~2M elements — a fixed 256 floor rebuilt a 20 MB
        # matrix for catalogs just under the IVF threshold (round-5
        # review; CLAUDE.md cache-sizing lesson)
        chunk = max(64, min(len(mentions), 2_000_000 // max(1, self.n_docs)))
        if self.ivf_centroids is not None:
            # IVF mode (large catalogs): per-mention cluster probing; the
            # fused decision still runs through the batched kernel below
            for lo in range(0, len(mentions), chunk):
                out.extend(self._link_chunk_ivf(mentions[lo : lo + chunk], prefetch, limit))
            return out
        for lo in range(0, len(mentions), chunk):
            batch = mentions[lo : lo + chunk]
            qmat = self._embed(batch)
            norms = np.linalg.norm(qmat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            qmat = qmat / norms
            k = min(prefetch, self.n_docs)
            n = len(batch)
            if k > 0:
                # dense channel for the WHOLE chunk in three numpy calls:
                # batched top-k, then one flat lexsort on
                # (row, -score, key_rank) — identical order to the
                # per-mention (-score, key) Python sort
                neg_scores = -(qmat @ self.emb.T)
                # per-row argpartition: numpy's axis-1 partition is ~6x
                # slower than a row loop at k=10
                top_idx = np.empty((n, k), dtype=np.int64)
                for r in range(n):
                    top_idx[r] = np.argpartition(neg_scores[r], k - 1)[:k]
                top_sc = -np.take_along_axis(neg_scores, top_idx, axis=1)
                rowid = np.repeat(np.arange(n), k)
                order = np.lexsort((self.key_rank[top_idx.ravel()], -top_sc.ravel(), rowid))
                drow = rowid  # already sorted by row (stable lexsort)
                didx = top_idx.ravel()[order]
                dsc = top_sc.ravel()[order].astype(np.float64)
                drank = np.tile(np.arange(1, k + 1, dtype=np.int64), n)
            else:
                drow = didx = drank = np.empty(0, dtype=np.int64)
                dsc = np.empty(0, dtype=np.float64)
            krow_l, kidx_l, ksc_l, krank_l = [], [], [], []
            for r, mention in enumerate(batch):
                kidx, ksc = self._keyword_topk(mention, prefetch)
                if len(kidx):
                    krow_l.append(np.full(len(kidx), r, dtype=np.int64))
                    kidx_l.append(kidx)
                    ksc_l.append(ksc)
                    krank_l.append(np.arange(1, len(kidx) + 1, dtype=np.int64))
            if krow_l:
                krow = np.concatenate(krow_l)
                kidx = np.concatenate(kidx_l)
                ksc = np.concatenate(ksc_l)
                krank = np.concatenate(krank_l)
            else:
                krow = kidx = krank = np.empty(0, dtype=np.int64)
                ksc = np.empty(0, dtype=np.float64)
            out.extend(
                self._fuse_accept(
                    n, drow, didx, drank, dsc, krow, kidx, krank, ksc, limit
                )
            )
        return out

    def _link_chunk_ivf(
        self, batch: list[str], prefetch: int, limit: int
    ) -> list[LinkResult | None]:
        qmat = self._embed(batch)
        norms = np.linalg.norm(qmat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        qmat = qmat / norms
        drow_l, didx_l, dsc_l, drank_l = [], [], [], []
        krow_l, kidx_l, ksc_l, krank_l = [], [], [], []
        key_to_idx = getattr(self, "_key_to_idx", None)
        if key_to_idx is None:
            key_to_idx = self._key_to_idx = {key: i for i, key in enumerate(self.keys)}
        for r, mention in enumerate(batch):
            dense = self._dense_ranked(qmat[r], prefetch)
            if dense:
                drow_l.append(np.full(len(dense), r, dtype=np.int64))
                didx_l.append(np.array([key_to_idx[key] for key, _ in dense], dtype=np.int64))
                dsc_l.append(np.array([s for _, s in dense], dtype=np.float64))
                drank_l.append(np.arange(1, len(dense) + 1, dtype=np.int64))
            kidx, ksc = self._keyword_topk(mention, prefetch)
            if len(kidx):
                krow_l.append(np.full(len(kidx), r, dtype=np.int64))
                kidx_l.append(kidx)
                ksc_l.append(ksc)
                krank_l.append(np.arange(1, len(kidx) + 1, dtype=np.int64))

        def _cat(lst, dtype):
            return np.concatenate(lst) if lst else np.empty(0, dtype=dtype)

        return self._fuse_accept(
            len(batch),
            _cat(drow_l, np.int64), _cat(didx_l, np.int64),
            _cat(drank_l, np.int64), _cat(dsc_l, np.float64),
            _cat(krow_l, np.int64), _cat(kidx_l, np.int64),
            _cat(krank_l, np.int64), _cat(ksc_l, np.float64),
            limit,
        )

    def _fuse_accept(
        self,
        n: int,
        drow: np.ndarray, didx: np.ndarray, drank: np.ndarray, dsc: np.ndarray,
        krow: np.ndarray, kidx: np.ndarray, krank: np.ndarray, ksc: np.ndarray,
        limit: int,
    ) -> list[LinkResult | None]:
        """Vectorized RRF fuse + canonical boost + acceptance over COO
        candidate arrays (row = mention ordinal in the chunk, idx = doc).
        Implements exactly: fused = sum over channels of 1/(rrf_k + rank);
        boost x self.boost on canonical docs; order per row by
        (-fused, keyword-present, key asc); accept the FIRST of the top
        ``limit`` with keyword evidence or vector_score >= 0.99."""
        rows = np.concatenate([drow, krow])
        idxs = np.concatenate([didx, kidx])
        vr = np.concatenate([drank, np.zeros(len(krow), dtype=np.int64)])
        kr = np.concatenate([np.zeros(len(drow), dtype=np.int64), krank])
        vs = np.concatenate([dsc, np.full(len(krow), -np.inf)])
        ks = np.concatenate([np.full(len(drow), np.nan), ksc])
        if len(rows) == 0:
            return [None] * n
        # merge (row, idx) pairs present in both channels: stable lexsort
        # puts the dense entry first (dense was concatenated first)
        morder = np.lexsort((np.arange(len(rows)), idxs, rows))
        rows, idxs = rows[morder], idxs[morder]
        vr, kr, vs, ks = vr[morder], kr[morder], vs[morder], ks[morder]
        dup = np.zeros(len(rows), dtype=bool)
        dup[1:] = (rows[1:] == rows[:-1]) & (idxs[1:] == idxs[:-1])
        di = np.nonzero(dup)[0]
        if len(di):
            # second of the pair is the keyword entry; fold into the first
            kr[di - 1] = kr[di]
            ks[di - 1] = ks[di]
            keep = ~dup
            rows, idxs = rows[keep], idxs[keep]
            vr, kr, vs, ks = vr[keep], kr[keep], vs[keep], ks[keep]
        fused = np.where(vr > 0, 1.0 / (self.rrf_k + vr), 0.0) + np.where(
            kr > 0, 1.0 / (self.rrf_k + kr), 0.0
        )
        canon = getattr(self, "_canon_arr", None)
        if canon is None:
            canon = self._canon_arr = np.array(
                [self.is_canonical.get(key, False) for key in self.keys], dtype=bool
            )
        fused = np.where(canon[idxs], fused * self.boost, fused)
        kw_absent = (kr == 0).astype(np.int8)
        sidx = np.lexsort((self.key_rank[idxs], kw_absent, -fused, rows))
        srows = rows[sidx]
        starts = np.flatnonzero(np.r_[True, srows[1:] != srows[:-1]])
        counts = np.diff(np.r_[starts, len(sidx)])
        pos = np.arange(len(sidx)) - np.repeat(starts, counts)
        ok = (pos < limit) & ((kr[sidx] > 0) | (vs[sidx] >= DENSE_EXACT_THRESHOLD))
        out: list[LinkResult | None] = [None] * n
        if ok.any():
            oki = np.nonzero(ok)[0]
            first_rows, first_at = np.unique(srows[oki], return_index=True)
            for row, at in zip(first_rows.tolist(), oki[first_at].tolist()):
                j = sidx[at]
                eid, surface = self.keys[idxs[j]].split("|", 1)
                mt = (
                    "both"
                    if vr[j] > 0 and kr[j] > 0
                    else ("keyword" if kr[j] > 0 else "semantic")
                )
                out[row] = LinkResult(eid, surface, float(fused[j]), mt)
        return out
