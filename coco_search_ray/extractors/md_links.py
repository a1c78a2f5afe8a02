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

  1. inline link:   [label](target)   -> target, validated/cleaned per
     the reference's _validate_link_path (markdown.py:308-326):
     mailto: and pure-#anchor targets skipped, #fragment stripped
     (empty-after-strip skipped), non-http only
  2. wiki ref:      [[ref]]           -> ref (verbatim; wiki refs are
     this repo's transcript addition, no URL semantics)
"""

from __future__ import annotations

import re

NAME = "md_links"
KIND = "literal"
PRED = "references_doc"

_RULES = [
    re.compile(r"\[[^\]\n]{1,80}\]\(([^()\[\] \t\r\n]{1,200})\)", re.ASCII),
    re.compile(r"\[\[([^\[\]\n]{1,80})\]\]", re.ASCII),
]
_HTTP = re.compile(r"^https?://", re.ASCII)

QUICK = r"\]\(|\[\["


def maybe(text: str) -> bool:
    return "](" in text or "[[" in text


def clean_target(s: str) -> str | None:
    """The reference's link-destination validation
    (markdown.py:308-326 _validate_link_path): skip external (http),
    mailto and pure-anchor targets; strip the #fragment; None if
    nothing is left. Shared with md_refs (reference links resolve to
    the same destination kind)."""
    if _HTTP.match(s) or s.startswith("mailto:") or s.startswith("#"):
        return None
    s = s.split("#", 1)[0]
    return s or None


def extract(text: str) -> list[str]:
    """Targets in first-occurrence order (match start, ties by rule
    order), deduped keep-first AFTER cleaning; http(s) excluded from
    both rules."""
    hits: list[tuple[int, int, str]] = []
    for ri, rx in enumerate(_RULES):
        for m in rx.finditer(text):
            hits.append((m.start(), ri, m.group(1)))
    hits.sort()
    out: list[str] = []
    seen: set[str] = set()
    for _pos, ri, s in hits:
        if ri == 0:
            cleaned = clean_target(s)
            if cleaned is None:
                continue
            s = cleaned
        elif _HTTP.match(s):
            continue
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out
