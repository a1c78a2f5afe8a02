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

        self._embed = (
            digest_embeddings if dim % 32 == 0 else (lambda ts: hash_embeddings(ts, dim))
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
        qtoks = [t.lower() for t in normalize_query_tokens(query)]
        if not qtoks:
            return []
        acc = np.zeros(self.n_docs, dtype=np.float32)
        hit = False
        for t in set(qtoks):
            p = self.postings.get(t)
            if p is None:
                continue
            hit = True
            idxs, tfs = p
            acc[idxs] += np.float32(self.idf[t]) * np.minimum(tfs, 4.0)
        if not hit:
            return []
        acc = acc / self.doc_len
        nz = np.nonzero(acc)[0]
        k = min(prefetch, len(nz))
        top = nz[np.argpartition(-acc[nz], k - 1)[:k]] if len(nz) > k else nz
        order = sorted(top.tolist(), key=lambda i: (-float(acc[i]), self.keys[i]))
        return [(self.keys[i], float(acc[i])) for i in order[:prefetch]]

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
        the dense channel (BLAS instead of n matvecs — this is what makes
        actor-memo warmup cheap), then per-mention keyword scoring + RRF.
        Results are identical to link() per mention."""
        if not mentions:
            return []
        prefetch = prefetch_limit(limit)
        out: list[LinkResult | None] = []
        # chunk so the score matrix stays < ~100 MB (exact mode)
        chunk = max(1, min(len(mentions), max(256, 25_000_000 // max(1, self.n_docs))))
        ivf = self.ivf_centroids is not None
        for lo in range(0, len(mentions), chunk):
            batch = mentions[lo : lo + chunk]
            qmat = self._embed(batch)
            norms = np.linalg.norm(qmat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            qmat = qmat / norms
            k = min(prefetch, self.n_docs)
            if not ivf and k > 0:
                # dense channel for the WHOLE chunk in three numpy calls:
                # batched top-k, then one flat lexsort on
                # (row, -score, key_rank) — identical order to the
                # per-mention (-score, key) Python sort
                neg_scores = -(qmat @ self.emb.T)
                # per-row argpartition: numpy's axis-1 partition is ~6x
                # slower than a row loop at k=10
                top_idx = np.empty((len(batch), k), dtype=np.int64)
                for r in range(len(batch)):
                    top_idx[r] = np.argpartition(neg_scores[r], k - 1)[:k]
                top_sc = -np.take_along_axis(neg_scores, top_idx, axis=1)
                rowid = np.repeat(np.arange(len(batch)), k)
                order = np.lexsort((self.key_rank[top_idx.ravel()], -top_sc.ravel(), rowid))
                top_idx_s = top_idx.ravel()[order].reshape(len(batch), k)
                top_sc_s = top_sc.ravel()[order].reshape(len(batch), k)
            for r, mention in enumerate(batch):
                if ivf:
                    dense = self._dense_ranked(qmat[r], prefetch)
                elif k > 0:
                    dense = [
                        (self.keys[i], float(s))
                        for i, s in zip(top_idx_s[r].tolist(), top_sc_s[r].tolist())
                    ]
                else:
                    dense = []
                keyword = self._keyword_ranked(mention, prefetch)
                fused = apply_canonical_boost(
                    rrf_fuse(dense, keyword, k=self.rrf_k), self.is_canonical, multiplier=self.boost
                )
                res: LinkResult | None = None
                for c in fused[:limit]:
                    dense_exact = (
                        c.vector_score is not None and c.vector_score >= DENSE_EXACT_THRESHOLD
                    )
                    if c.match_type in ("keyword", "both") or dense_exact:
                        eid, surface = c.key.split("|", 1)
                        res = LinkResult(eid, surface, c.fused_score, c.match_type)
                        break
                out.append(res)
        return out
