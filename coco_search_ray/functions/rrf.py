"""Reciprocal Rank Fusion + canonical boost — the ranking core.

Reimplements the reference's fusion semantics exactly (constants and
ordering rules define which candidate wins a link, hence triple P/R):

- RRF score = sum over lists of 1/(k + rank), ranks 1-based, k=60
  (reference: src/cocosearch/search/hybrid.py:29,306-416),
- match_type in {semantic, keyword, both},
- sort by fused score desc with KEYWORD TIEBREAK (a result that has a
  keyword score wins ties; hybrid.py:409-414),
- post-fusion canonical boost x2.0 (the reference boosts
  definition-bearing chunks, hybrid.py:33,419-481; our analog boosts
  catalog-canonical surface forms over aliases), re-sorted with the same
  tiebreak,
- candidate prefetch cap min(2*limit, 100) per backend
  (hybrid.py:37,556-557) is enforced by the caller.

One deliberate strengthening vs the reference: ties beyond the keyword
tiebreak are broken by candidate key ascending, so output is fully
deterministic under parallel, unordered block arrival (the reference
iterates a set and is run-order dependent; determinism under parallelism
is a hard requirement here — SURVEY.md §7.5).
"""

from __future__ import annotations

from dataclasses import dataclass

RRF_K = 60
CANONICAL_BOOST = 2.0
MAX_PREFETCH = 100


@dataclass
class FusedCandidate:
    key: str            # candidate identity, e.g. "entity_id|surface"
    fused_score: float
    match_type: str     # "semantic" | "keyword" | "both"
    vector_score: float | None
    keyword_score: float | None


def _sort_key(c: FusedCandidate):
    # fused desc, keyword-present desc, key asc (full determinism)
    return (-c.fused_score, 0 if c.keyword_score is not None else 1, c.key)


def rrf_fuse(
    vector_ranked: list[tuple[str, float]],
    keyword_ranked: list[tuple[str, float]],
    k: int = RRF_K,
) -> list[FusedCandidate]:
    """Fuse two ranked lists of (key, raw_score) into RRF-scored candidates.

    Both input lists must already be rank-ordered (best first) and
    prefetch-capped by the caller.
    """
    v_by_key = {key: (rank, score) for rank, (key, score) in enumerate(vector_ranked, start=1)}
    k_by_key = {key: (rank, score) for rank, (key, score) in enumerate(keyword_ranked, start=1)}

    fused: list[FusedCandidate] = []
    seen: set[str] = set()
    # iterate vector order then keyword order: deterministic key universe
    for key, _ in list(vector_ranked) + list(keyword_ranked):
        if key in seen:
            continue
        seen.add(key)
        score = 0.0
        vscore = kscore = None
        mt = ""
        if key in v_by_key:
            r, s = v_by_key[key]
            score += 1.0 / (k + r)
            vscore = s
            mt = "semantic"
        if key in k_by_key:
            r, s = k_by_key[key]
            score += 1.0 / (k + r)
            kscore = s
            mt = "both" if mt == "semantic" else "keyword"
        fused.append(FusedCandidate(key, score, mt, vscore, kscore))

    fused.sort(key=_sort_key)
    return fused


def apply_canonical_boost(
    fused: list[FusedCandidate],
    is_canonical: dict[str, bool],
    multiplier: float = CANONICAL_BOOST,
) -> list[FusedCandidate]:
    """Multiply fused scores of canonical candidates by ``multiplier`` and
    re-sort with the same tiebreak (post-fusion, preserving the rank-based
    algorithm semantics)."""
    out = [
        FusedCandidate(
            c.key,
            c.fused_score * multiplier if is_canonical.get(c.key, False) else c.fused_score,
            c.match_type,
            c.vector_score,
            c.keyword_score,
        )
        for c in fused
    ]
    out.sort(key=_sort_key)
    return out


def prefetch_limit(limit: int, cap: int = MAX_PREFETCH) -> int:
    """Dynamic per-backend candidate prefetch: min(2*limit, cap)."""
    return min(2 * limit, cap)
