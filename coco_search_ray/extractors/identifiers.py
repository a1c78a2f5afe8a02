"""Entity family: identifier-shaped tokens + capitalized bigrams.

The original rule family (functions/mentions.py) — snake_case, camelCase
(>=6, starts lower), PascalCase (>=8), "Cap Cap" bigrams; the same
word-shape tests the reference uses to route queries into hybrid mode
(search/query_analyzer.py:17-85).
"""

from __future__ import annotations

from ..functions.mentions import _QUICK_RE, detect_mentions

NAME = "identifiers"
KIND = "entity"
PRED = None
QUICK = _QUICK_RE.pattern


def extract(text: str) -> list[str]:
    return detect_mentions(text)
