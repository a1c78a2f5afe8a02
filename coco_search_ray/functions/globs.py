"""Glob -> SQL LIKE pattern conversion with escape-then-convert ordering
(reference semantics: search/filters.py:11-51 — existing ``%``/``_`` in
the user pattern are escaped BEFORE ``*``/``?`` are converted, so a glob
``a_*`` matches a literal underscore). Case-insensitive matching (the
reference uses ILIKE)."""

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
