"""Literal family: URLs. Reference analog: link extraction in the
markdown / gitlab_ci extractors (deps/extractors/markdown.py:409,
gitlab_ci.py:423 — references to external resources become edges).
Surfaces attach to the turn's first linked entity as
(entity, links_to, url).
"""

from __future__ import annotations

import re

NAME = "urls"
KIND = "literal"
PRED = "links_to"
QUICK = r"https?://"

# explicit whitespace class: the DuckDB replay's RE2 [^\s...] lets a URL
# run THROUGH a vertical tab (RE2 \s = [ \t\n\r\f]); Python re.ASCII \s
# would stop at it (round-5 lockstep-fuzz finding). One class, both
# engines.
_RE = re.compile(r"https?://[^ \t\n\r\f\"'<>\)\]]+", re.ASCII)


def maybe(text: str) -> bool:
    """Cheap substring precheck — the regex only runs on rows that pass."""
    return "http" in text


def extract(text: str) -> list[str]:
    out: list[str] = []
    seen: set[str] = set()
    for m in _RE.finditer(text):
        u = m.group(0)
        if u not in seen:
            seen.add(u)
            out.append(u)
    return out
