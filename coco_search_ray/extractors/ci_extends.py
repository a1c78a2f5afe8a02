"""Literal family: GitLab CI ``extends:`` template-inheritance
references in turn text — the transcript analog of the reference's
extends-chain extraction (deps/extractors/gitlab_ci.py:177-206: each
``extends: .template`` emits a REFERENCE edge to the hidden template
job). Surfaces attach to the turn's first linked entity as
(entity, extends_template, name).

One statement shape, ONE regex with ONE capture so the DuckDB oracle
replays it 1:1 with regexp_extract_all(..., 1):

  ``extends: .hidden-template``  (hidden-job templates start with '.',
  the GitLab convention — a bare ``extends: word`` is indistinguishable
  from prose)

All character classes are explicit ASCII so Python re, RE2 (the Arrow
candidate mask) and DuckDB agree.
"""

from __future__ import annotations

import re

NAME = "ci_extends"
KIND = "literal"
PRED = "extends_template"

_RULE = re.compile(r"\bextends:[ \t]*['\"]?(\.[A-Za-z0-9_-]+)", re.ASCII)

QUICK = r"extends:"


def maybe(text: str) -> bool:
    return "extends:" in text


def extract(text: str) -> list[str]:
    """Template names in first-occurrence order, deduped keep-first."""
    out: list[str] = []
    seen: set[str] = set()
    for m in _RULE.finditer(text):
        s = m.group(1)
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out
