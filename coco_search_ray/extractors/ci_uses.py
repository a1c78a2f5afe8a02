"""Literal family: CI action / reusable-workflow references in turn
text — the transcript analog of the reference's GitHub Actions
extractor (deps/extractors/github_actions.py:21-23 external
``owner/repo[/path]@version`` refs, :117-124 local ``./path`` workflow
refs; gitlab_ci.py ``include:`` is the same reference shape). Surfaces
attach to the turn's first linked entity as
(entity, uses_action, ref).

Two statement shapes, each ONE regex with ONE capture so the DuckDB
oracle replays them 1:1 with regexp_extract_all(..., 1):

  1. ``uses: owner/repo@version`` (also owner/repo/path@version);
     the owner's first char excludes ``.`` so a local ref never
     half-matches this rule
  2. ``uses: ./path/to/workflow.yml`` (local, resolvable to a file)

All character classes are explicit ASCII so Python re, RE2 (the Arrow
candidate mask) and DuckDB agree.
"""

from __future__ import annotations

import re

NAME = "ci_uses"
KIND = "literal"
PRED = "uses_action"

_OWNER = r"[A-Za-z0-9_][A-Za-z0-9_.-]*"
_RULES = [
    re.compile(
        r"\buses:[ \t]*['\"]?(" + _OWNER + r"(?:/[A-Za-z0-9_.-]+)+@[A-Za-z0-9._/-]+)", re.ASCII
    ),
    re.compile(r"\buses:[ \t]*['\"]?(\./[A-Za-z0-9._/-]+)", re.ASCII),
]

QUICK = r"uses:"


def maybe(text: str) -> bool:
    return "uses:" in text


def extract(text: str) -> list[str]:
    """Action refs in first-occurrence order (by match start, ties by
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
