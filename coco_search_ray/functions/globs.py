"""Glob -> SQL LIKE pattern conversion with escape-then-convert ordering
(reference semantics: search/filters.py:11-51 — existing ``%``/``_`` in
the user pattern are escaped BEFORE ``*``/``?`` are converted, so a glob
``a_*`` matches a literal underscore). Case-insensitive matching (the
reference uses ILIKE).

Escape contract (cross-engine seam): the emitted ``\%``/``\_`` escapes
rely on backslash being the LIKE escape character. Arrow ``match_like``
and Postgres (the reference engine) both default to backslash; DuckDB
LIKE has NO default escape char and reads ``\`` as a literal — every
DuckDB replay of this operator must therefore say ``ILIKE ... ESCAPE
'\'`` (Q_GLOB_FILTER_SQL does; lockstep-fuzzed in test_properties).
Backslashes already in the user glob pass through unchanged, exactly
like the reference, and so act as escapes downstream; a glob ENDING in
a lone backslash produces a dangling escape (Postgres and DuckDB raise,
Arrow treats it as a literal) — callers own that edge, as in the
reference."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def glob_to_like(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch in ("%", "_"):
            out.append("\\" + ch)
        elif ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        else:
            out.append(ch)
    return "".join(out)


def filter_glob(batch: pa.Table, col: str, glob: str) -> pa.Table:
    """Vectorized case-insensitive glob filter (ILIKE semantics)."""
    like = glob_to_like(glob)
    mask = pc.match_like(batch[col], like, ignore_case=True)
    return batch.filter(pc.fill_null(mask, False))
