"""Literal family: quoted phrases — double-quoted or backtick spans.

Reference analog: the markdown extractor's inline-code / quoted-span
handling (deps/extractors/markdown.py). Surfaces attach to the turn's
first linked entity as (entity, quotes, phrase).
"""

from __future__ import annotations

import re

NAME = "quoted_phrases"
KIND = "literal"
PRED = "quotes"
QUICK = r'"[^"\n]{2,60}"|`[^`\n]{1,60}`'

_RE = re.compile(QUICK, re.ASCII)


def maybe(text: str) -> bool:
    """Cheap substring precheck — the regex only runs on rows that pass."""
    return '"' in text or "`" in text


def extract(text: str) -> list[str]:
    out: list[str] = []
    seen: set[str] = set()
    for m in _RE.finditer(text):
        surface = m.group(0)[1:-1]  # strip the delimiters
        if surface not in seen:
            seen.add(surface)
            out.append(surface)
    return out
