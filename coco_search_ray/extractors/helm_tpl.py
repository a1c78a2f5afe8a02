"""Literal family: Helm named-template references in turn text — the
transcript analog of the reference's Helm extractor's template pass
(deps/extractors/helm.py:24-25,114-144: ``{{ include "name" . }}`` and
``{{ template "name" }}`` each emit a REFERENCE edge to the named
template). Surfaces attach to the turn's first linked entity as
(entity, uses_helm_template, name).

Two statement shapes mirroring the reference's two regexes
(_INCLUDE_RE / _TEMPLATE_RE), each ONE regex with ONE capture so the
DuckDB oracle replays them 1:1 with regexp_extract_all(..., 1):

  1. ``{{ include "chart.fullname" . }}``   (also ``{{-`` trim form)
  2. ``{{ template "chart.labels" . }}``

All character classes are explicit ASCII so Python re, RE2 (the Arrow
candidate mask) and DuckDB agree.
"""

from __future__ import annotations

import re

NAME = "helm_tpl"
KIND = "literal"
PRED = "uses_helm_template"

_RULES = [
    re.compile(r"\{\{-?[ \t]*include[ \t]+\"([^\"\n]+)\"", re.ASCII),
    re.compile(r"\{\{-?[ \t]*template[ \t]+\"([^\"\n]+)\"", re.ASCII),
]

QUICK = r"\{\{-?[ \t]*(?:include|template)[ \t]"


def maybe(text: str) -> bool:
    return "{{" in text


def extract(text: str) -> list[str]:
    """Template names in first-occurrence order (by match start, ties
    by rule order), deduped keep-first."""
    hits: list[tuple[int, int, str]] = []
    for ri, rx in enumerate(_RULES):
        for m in rx.finditer(text):
            hits.append((m.start(), ri, m.group(1)))
    hits.sort()
    out: list[str] = []
    seen: set[str] = set()
    for _pos, _ri, s in hits:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out
