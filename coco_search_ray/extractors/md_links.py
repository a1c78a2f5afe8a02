"""Literal family: markdown link targets and wiki-style references —
``[label](path/doc.md)`` and ``[[ref]]``. The transcript analog of the
reference's markdown dependency extractor (deps/extractors/markdown.py
— its largest per-language surface: inline links and reference
definitions become document-reference edges, while EXTERNAL http(s)
links are handled separately). Surfaces attach to the turn's first
linked entity as (entity, references_doc, target).

Two single-capture rules so the DuckDB oracle replays them 1:1 with
regexp_extract_all(..., 1); http(s) targets are excluded on BOTH sides
(they belong to the urls family / links_to predicate):

  1. inline link:   [label](target)   -> target  (non-http only)
  2. wiki ref:      [[ref]]           -> ref
"""

from __future__ import annotations

import re

NAME = "md_links"
KIND = "literal"
PRED = "references_doc"

_RULES = [
    re.compile(r"\[[^\]\n]{1,80}\]\(([^()\[\] \t\r\n]{1,200})\)"),
    re.compile(r"\[\[([^\[\]\n]{1,80})\]\]"),
]
_HTTP = re.compile(r"^https?://")

QUICK = r"\]\(|\[\["


def maybe(text: str) -> bool:
    return "](" in text or "[[" in text


def extract(text: str) -> list[str]:
    """Targets in first-occurrence order (match start, ties by rule
    order), deduped keep-first; http(s) targets excluded."""
    hits: list[tuple[int, int, str]] = []
    for ri, rx in enumerate(_RULES):
        for m in rx.finditer(text):
            hits.append((m.start(), ri, m.group(1)))
    hits.sort()
    out: list[str] = []
    seen: set[str] = set()
    for _pos, _ri, s in hits:
        if s in seen or _HTTP.match(s):
            continue
        seen.add(s)
        out.append(s)
    return out
