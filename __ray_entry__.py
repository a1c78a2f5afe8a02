"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ray.init()/ray.shutdown().

- entry(): flagship KG pipeline (transcripts -> triples) on the smoke
  tier derived from /root/testdata/sf0.001 sizing.
- queries(): one entry per implemented operator family (SURVEY.md §2 +
  the training-data operations suite); each takes sf_dir. 60 entries.
- oracle_sql(): DuckDB oracles for the 54 checkable queries — pure SQL
  re-derivations where expressible, parquet-export-backed re-derivations
  (simhash, fingerprints, triples, embeddings) where the intermediate is
  not SQL-derivable; the 6 rows-only queries each document why in their
  docstrings (pipelines/queries.py header lists them).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline; returns a ray.data.Dataset of (subj, pred, obj,
    conv_id, turn_idx) triples."""
    from coco_search_ray.pipelines.queries import kg_triples

    return kg_triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from coco_search_ray.pipelines.queries import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from coco_search_ray.pipelines.queries import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
