"""Example USER extractor family — drop-in module for the registry's
extension surface (load via ``kg.extractor_dirs: [examples/extractors]``
in a pipeline config, or ``extractors.load_directory``).

Extracts JIRA-style ticket references (``ABC-123``) as a literal family:
each surface attaches to the turn's first linked entity as
``(entity, references_ticket, ABC-123)``.
"""

from __future__ import annotations

import re

NAME = "tickets"
KIND = "literal"
PRED = "references_ticket"
# explicit ASCII classes: Python re, RE2 (the Arrow candidate mask) and
# a DuckDB replay agree byte-for-byte
QUICK = r"\b[A-Z]{2,8}-[0-9]{1,6}\b"

_RE = re.compile(QUICK)


def maybe(text: str) -> bool:
    return "-" in text


def extract(text: str) -> list[str]:
    out: list[str] = []
    seen: set[str] = set()
    for m in _RE.finditer(text):
        s = m.group(0)
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out
