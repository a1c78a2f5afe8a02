"""Session query cache with the reference's exact semantics
(search/cache.py:121-374):

- L1: exact hit keyed by SHA-256 of (normalized query, params);
- L2: semantic hit — cosine similarity between the query embedding and a
  cached entry's embedding >= 0.92 (SEMANTIC_THRESHOLD, cache.py:34 —
  the docs say 0.95 but the code wins, per SURVEY §2.3), scanning at
  most the 50 most recent entries (SCAN_WINDOW, cache.py:31-32);
- TTL 24h; max 500 entries with oldest-first eviction; per-index
  (here: per-catalog-key) invalidation.

Interactive-session optimization only — the batch KG pipeline dedupes
repeated queries with two-phase unique linking instead.
"""

from __future__ import annotations

import hashlib
import time
from dataclasses import dataclass, field

import numpy as np

SEMANTIC_THRESHOLD = 0.92
TTL_SECONDS = 24 * 3600
MAX_ENTRIES = 500
SCAN_WINDOW = 50


@dataclass
class CacheEntry:
    results: object
    embedding: np.ndarray | None
    timestamp: float
    index_name: str


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


@dataclass
class QueryCache:
    _entries: dict[str, CacheEntry] = field(default_factory=dict)

    @staticmethod
    def _key(query: str, index_name: str, params: str = "") -> str:
        return hashlib.sha256(f"{index_name}\x1f{query}\x1f{params}".encode()).hexdigest()

    def get_exact(self, query: str, index_name: str, params: str = "", now: float | None = None):
        now = time.time() if now is None else now
        e = self._entries.get(self._key(query, index_name, params))
        if e is None or now - e.timestamp > TTL_SECONDS:
            return None
        return e.results

    def get_semantic(
        self, embedding: np.ndarray, index_name: str, now: float | None = None
    ):
        """Scan the SCAN_WINDOW most recent same-index entries for a
        cosine >= SEMANTIC_THRESHOLD hit."""
        now = time.time() if now is None else now
        recent = sorted(self._entries.values(), key=lambda e: -e.timestamp)[:SCAN_WINDOW]
        for e in recent:
            if e.index_name != index_name or e.embedding is None:
                continue
            if now - e.timestamp > TTL_SECONDS:
                continue
            if cosine_similarity(embedding, e.embedding) >= SEMANTIC_THRESHOLD:
                return e.results
        return None

    def put(
        self,
        query: str,
        index_name: str,
        results,
        embedding: np.ndarray | None = None,
        params: str = "",
        now: float | None = None,
    ) -> None:
        now = time.time() if now is None else now
        self._entries[self._key(query, index_name, params)] = CacheEntry(
            results, embedding, now, index_name
        )
        if len(self._entries) > MAX_ENTRIES:
            # evict oldest beyond MAX_ENTRIES (cache.py:329-342)
            by_age = sorted(self._entries.items(), key=lambda kv: kv[1].timestamp)
            for k, _ in by_age[: len(self._entries) - MAX_ENTRIES]:
                del self._entries[k]

    def invalidate_index(self, index_name: str) -> None:
        """Per-index invalidation on reindex (cache.py:296-327)."""
        self._entries = {
            k: e for k, e in self._entries.items() if e.index_name != index_name
        }

    def __len__(self) -> int:
        return len(self._entries)
