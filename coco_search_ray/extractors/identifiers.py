"""Entity family: identifier-shaped tokens + capitalized bigrams.

The original rule family (functions/mentions.py) — snake_case, camelCase
(>=6, starts lower), PascalCase (>=8), "Cap Cap" bigrams; the same
word-shape tests the reference uses to route queries into hybrid mode
(search/query_analyzer.py:17-85).
"""

from __future__ import annotations

from ..functions.mentions import _QUICK_RE, detect_mentions, detect_mentions_batch

NAME = "identifiers"
KIND = "entity"
PRED = None
QUICK = _QUICK_RE.pattern

# optional duck-typed BATCH surface: (texts) -> (counts, flat surfaces),
# byte-identical to mapping extract() over the texts (pytest-pinned);
# extract_mention_rows uses it when the plan has exactly this one entity
# family — the whole batch classifies words in one vectorized pass
BATCH = detect_mentions_batch


def extract(text: str) -> list[str]:
    return detect_mentions(text)
