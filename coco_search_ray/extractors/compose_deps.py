"""Literal family: docker-compose service-dependency references — the
transcript analog of the reference's compose extractor
(deps/extractors/docker_compose.py:61-113: ``depends_on:`` list AND
dict forms emit REFERENCE edges to the depended-on service,
``extends.service`` emits a service-inheritance edge; its third kind,
``image:``, is this repo's sibling ``images`` family). A user pasting
compose YAML into a conversation gets the same service edges here:
surfaces attach to the turn's first linked entity as
(entity, depends_on_svc, service).

Three statement shapes, each a two-level or single-capture regex the
DuckDB oracle replays 1:1 (the reference parses YAML; the regexes
cover the canonical block layouts a transcript carries):

  1. list form        ``depends_on:`` + ``- svc`` lines (block then
                      items — the md_frontmatter two-level shape)
  2. dict form        ``depends_on:`` + ``svc:`` key lines, each
                      immediately followed by a ``condition:`` line
                      (the long form; requiring the condition line is
                      what keeps a later SERVICE-level bare key — same
                      regex shape at lower indent — out of the block
                      without RE2-unsupported indent backreferences)
  3. extends          ``extends:`` + optional ``file:`` line +
                      ``service: parent`` (the reference's dict form;
                      gitlab-style same-line ``extends: .tpl`` is the
                      sibling ci_extends family and cannot match here)

All character classes are explicit ASCII so Python re, RE2 (the Arrow
candidate mask) and DuckDB agree.
"""

from __future__ import annotations

import re

NAME = "compose_deps"
KIND = "literal"
PRED = "depends_on_svc"

_SVC = r"[A-Za-z0-9._-]+"

_LIST_BLOCK = re.compile(r"\bdepends_on:[ \t]*\n((?:[ \t]+-[ \t]+[^\n]+\n?)+)", re.ASCII)
_LIST_ITEM = re.compile(r"-[ \t]+['\"]?(" + _SVC + r")", re.ASCII)
_DICT_BLOCK = re.compile(
    r"\bdepends_on:[ \t]*\n((?:[ \t]+" + _SVC + r":[ \t]*\n[ \t]+condition:[^\n]+\n?)+)", re.ASCII
)
_DICT_ITEM = re.compile(r"(" + _SVC + r"):[ \t]*\n", re.ASCII)
_EXTENDS = re.compile(
    r"\bextends:[ \t]*\n(?:[ \t]+file:[^\n]*\n)?[ \t]+service:[ \t]*['\"]?(" + _SVC + r")", re.ASCII
)

QUICK = r"depends_on:|extends:"


def maybe(text: str) -> bool:
    return "depends_on:" in text or ("extends:" in text and "service:" in text)


def extract(text: str) -> list[str]:
    """Depended-on / extended service names in document order (match
    start within the turn, ties by rule order), deduped keep-first."""
    hits: list[tuple[int, int, str]] = []
    if "depends_on:" in text:
        for bm in _LIST_BLOCK.finditer(text):
            off = bm.start(1)
            for im in _LIST_ITEM.finditer(bm.group(1)):
                hits.append((off + im.start(), 0, im.group(1)))
        for bm in _DICT_BLOCK.finditer(text):
            off = bm.start(1)
            for im in _DICT_ITEM.finditer(bm.group(1)):
                hits.append((off + im.start(), 1, im.group(1)))
    if "extends:" in text and "service:" in text:
        for m in _EXTENDS.finditer(text):
            hits.append((m.start(), 2, m.group(1)))
    hits.sort()
    out: list[str] = []
    seen: set[str] = set()
    for _pos, _ri, s in hits:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out
