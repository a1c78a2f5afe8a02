"""Literal family: frontmatter ``depends:`` declarations — the
authoritative dependency surface of the reference's markdown extractor
(deps/extractors/markdown.py:188-235 _extract_frontmatter: the YAML
``depends:`` list becomes doc_frontmatter reference edges, entries
stripped, empties dropped, trailing-``/`` entries flagged as
directories). Surfaces attach to the turn's first linked entity as
(entity, depends_on, path).

Two-level regex replay (block then items) so the DuckDB oracle mirrors
it with flatten(list_transform(regexp_extract_all(block), ...)):

  block:  a line-anchored ``depends:`` header followed by one or more
          ``- item`` list lines
  items:  ``- path`` with the capture trimmed BY THE REGEX (the
          separator eats leading whitespace, the final char must be
          non-whitespace) so neither engine needs a trim call

Dedupe keep-first in document order across blocks.
"""

from __future__ import annotations

import re

NAME = "md_frontmatter"
KIND = "literal"
PRED = "depends_on"

_BLOCK = re.compile(r"^depends:[ \t]*\n((?:[ \t]+-[ \t]+[^\n]+\n?)+)", re.MULTILINE | re.ASCII)
_ITEM = re.compile(r"-[ \t]+([^\n]*[^ \t\r\n])", re.ASCII)

QUICK = r"depends:"


def maybe(text: str) -> bool:
    return "depends:" in text


def extract(text: str) -> list[str]:
    """depends-list entries in document order, deduped keep-first."""
    out: list[str] = []
    seen: set[str] = set()
    for bm in _BLOCK.finditer(text):
        for im in _ITEM.finditer(bm.group(1)):
            s = im.group(1)
            if s not in seen:
                seen.add(s)
                out.append(s)
    return out
