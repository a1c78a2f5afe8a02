"""Literal family: unix-style file paths. Reference analog: file
references in the markdown / docker-compose / helm extractors
(deps/extractors/markdown.py, docker_compose.py — path mentions become
dependency edges). Surfaces attach to the turn's first linked entity as
(entity, references_path, path).

Rule: two or more /-separated segments starting at a slash, ending in a
segment with an extension-like dot (so prose fractions and URLs don't
match; URLs are claimed by the urls family and never start at '/')."""

from __future__ import annotations

import re

NAME = "file_paths"
KIND = "literal"
PRED = "references_path"
# explicit whitespace class: RE2 \s is [\t\n\f\r ] but Python
# re.ASCII \s also includes \v, so a \v-preceded path would hit in
# Python while the RE2 candidate mask (and the DuckDB replay) missed
# it — unsound mask, dropped triple (round-5 review). One class, three
# engines.
QUICK = r"(?:^|[ \t\n\r\f('\"`])/(?:[A-Za-z0-9._-]+/)+[A-Za-z0-9_-]+\.[A-Za-z0-9]{1,8}"

_RE = re.compile(r"(?:^|[ \t\n\r\f('\"`])(/(?:[A-Za-z0-9._-]+/)+[A-Za-z0-9_-]+\.[A-Za-z0-9]{1,8})", re.ASCII)


def maybe(text: str) -> bool:
    return "/" in text


def extract(text: str) -> list[str]:
    out: list[str] = []
    seen: set[str] = set()
    for m in _RE.finditer(text):
        p = m.group(1)
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out
