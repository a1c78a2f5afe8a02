"""Literal family: GitLab CI config-inclusion references in turn text —
the transcript analog of the reference's GitLab CI extractor's include
resolution (deps/extractors/gitlab_ci.py:67-176: plain ``include:
path.yml`` strings, ``local:`` include items, ``template:`` catalog
includes; the repo-local/remote targets are the edges a user indexing
infra repos gets). Surfaces attach to the turn's first linked entity as
(entity, includes_config, path).

Three statement shapes, each ONE regex with ONE capture so the DuckDB
oracle replays them 1:1 with regexp_extract_all(..., 1):

  1. ``include: ci/base.yml``        (string include -> local file)
  2. ``local: /templates/x.yml``     (include-item local form; leading
                                      '/' kept verbatim like the
                                      reference's metadata.ref)
  3. ``template: Auto-DevOps.gitlab-ci.yml``  (catalog template)

All character classes are explicit ASCII so Python re, RE2 (the Arrow
candidate mask) and DuckDB agree.
"""

from __future__ import annotations

import re

NAME = "gitlab_ci"
KIND = "literal"
PRED = "includes_config"

_YML = r"[A-Za-z0-9_][A-Za-z0-9_./-]*\.ya?ml"
_RULES = [
    (re.compile(r"\binclude:[ \t]*['\"]?(" + _YML + r")", re.ASCII), "include:"),
    (re.compile(r"\blocal:[ \t]*['\"]?(/?" + _YML + r")", re.ASCII), "local:"),
    (re.compile(r"\btemplate:[ \t]*['\"]?(" + _YML + r")", re.ASCII), "template:"),
]

QUICK = r"(?:include|local|template):"


def maybe(text: str) -> bool:
    return "include:" in text or "local:" in text or "template:" in text


def extract(text: str) -> list[str]:
    """Config paths in first-occurrence order (by match start, ties by
    rule order), deduped keep-first."""
    hits: list[tuple[int, int, str]] = []
    for ri, (rx, gate) in enumerate(_RULES):
        if gate not in text:
            continue
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
