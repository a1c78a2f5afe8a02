"""Literal family: container-image references in turn text — the
transcript analog of the reference's infra extractors that pull
``image:`` keys out of compose / CI yaml (deps/extractors/
docker_compose.py:43-58, gitlab_ci.py image handling, helm.py /
argocd.py image lists) and ``FROM`` lines out of Dockerfiles.
Surfaces attach to the turn's first linked entity as
(entity, uses_image, image_ref).

Two statement shapes, each ONE regex with ONE capture so the DuckDB
oracle replays them 1:1 with regexp_extract_all(..., 1):

  1. ``image: repo/name:tag`` (yaml key; optional quotes not consumed)
  2. ``FROM repo/name:tag`` (Dockerfile; uppercase FROM only — the
     lowercase ``from`` belongs to the imports family's python rule)

An image ref must carry a ``:tag`` or contain a ``/`` path segment —
a bare single word after ``image:`` is indistinguishable from prose.
All character classes are explicit ASCII so Python re, RE2 (the Arrow
candidate mask) and DuckDB agree; the tag-first alternation order
matters and is identical on both sides (leftmost-first semantics in
both Python re and RE2).
"""

from __future__ import annotations

import re

NAME = "images"
KIND = "literal"
PRED = "uses_image"

_SEG = r"[a-z0-9]+(?:[._-][a-z0-9]+)*"
# tagged ref (any path depth) first, else an untagged ref with >=1 slash
_REF = (
    _SEG + r"(?:/" + _SEG + r")*:[A-Za-z0-9_][A-Za-z0-9._-]*"
    r"|" + _SEG + r"(?:/" + _SEG + r")+"
)
_RULES = [
    re.compile(r"\bimage:[ \t]*(" + _REF + r")", re.ASCII),
    re.compile(r"\bFROM[ \t]+(" + _REF + r")", re.ASCII),
]

QUICK = r"image:|FROM[ \t]"


def maybe(text: str) -> bool:
    return "image:" in text or "FROM" in text


def extract(text: str) -> list[str]:
    """Image refs in first-occurrence order (by match start, ties by
    rule order), deduped keep-first."""
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
