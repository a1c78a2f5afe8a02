"""Interactive-shaped search over entity catalogs — the reference's
search lifecycle (search/query.py:250-571, search/multi.py:27-204)
re-expressed as library calls over EntityIndex:

- mode selection: hybrid iff forced or the query contains an
  identifier-shaped word (reference query_analyzer.py:17-85; plain
  English -> semantic-only);
- min_score threshold applied post-fusion (reference
  query.py:417-421);
- multi-catalog search: per-catalog prefetch of 2x limit, results
  tagged with the catalog name, merged by score desc (keyword tiebreak,
  then name/entity for determinism), truncated to limit; per-catalog
  failures tolerated (reference multi.py:154-204).

The per-process EntityIndex cache plays the role of the reference's
session state (DB pool + query cache); a batch pipeline that needs bulk
retrieval uses pipelines/kg.py linking instead.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.linker_core import EntityIndex
from ..functions.tokenize import has_identifier_pattern

# id-keyed cache that PINS the table: an id() key alone is only valid
# while the object is alive — a freed catalog's address can be reused by
# a different table, silently serving the WRONG index (round-5 review,
# reproduced). Holding (catalog, idx) keeps the id stable; the identity
# check makes the contract explicit.
_INDEX_CACHE: dict[int, tuple[pa.Table, EntityIndex]] = {}


def _index_for(catalog: pa.Table) -> EntityIndex:
    key = id(catalog)
    hit = _INDEX_CACHE.get(key)
    if hit is not None and hit[0] is catalog:
        return hit[1]
    if len(_INDEX_CACHE) > 8:
        _INDEX_CACHE.clear()
    idx = EntityIndex(catalog.to_pylist())
    _INDEX_CACHE[key] = (catalog, idx)
    return idx


def search_catalog(
    catalog: pa.Table,
    query: str,
    limit: int = 10,
    min_score: float = 0.0,
    force_hybrid: bool = False,
) -> pd.DataFrame:
    """Single-catalog ranked search with reference mode selection."""
    hybrid = force_hybrid or has_identifier_pattern(query)
    rows = _index_for(catalog).search(query, limit=limit, hybrid=hybrid)
    df = pd.DataFrame(
        rows,
        columns=[
            "entity_id", "surface", "score", "match_type",
            "vector_score", "keyword_score", "is_canonical",
        ],
    )
    return df[df["score"] >= min_score].reset_index(drop=True)


def multi_search(
    catalogs: dict[str, pa.Table],
    query: str,
    limit: int = 10,
    min_score: float = 0.0,
    force_hybrid: bool = False,
) -> pd.DataFrame:
    """Fan out over catalogs, tag, merge by score, truncate. Per-catalog
    prefetch = 2x limit (reference multi.py per-index limit), partial
    failures tolerated."""
    parts = []
    for name in sorted(catalogs):
        try:
            part = search_catalog(
                catalogs[name], query, limit=2 * limit, min_score=min_score,
                force_hybrid=force_hybrid,
            )
        except Exception:  # noqa: BLE001 — reference tolerates per-index failure
            continue
        part = part.copy()
        part.insert(0, "catalog", name)
        parts.append(part)
    if not parts:
        return pd.DataFrame(
            columns=[
                "catalog", "entity_id", "surface", "score", "match_type",
                "vector_score", "keyword_score", "is_canonical",
            ]
        )
    merged = pd.concat(parts, ignore_index=True)
    merged["_kw"] = merged["keyword_score"].notna()
    merged = merged.sort_values(
        ["score", "_kw", "catalog", "entity_id"],
        ascending=[False, False, True, True],
        kind="mergesort",
    ).drop(columns="_kw")
    return merged.head(limit).reset_index(drop=True)
