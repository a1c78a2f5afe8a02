"""Literal family: email addresses. Reference analog: contact/owner
references in config-file extractors (deps/extractors/gitlab_ci.py,
argocd.py — metadata references become typed edges). Surfaces attach to
the turn's first linked entity as (entity, mentions_email, addr)."""

from __future__ import annotations

import re

NAME = "emails"
KIND = "literal"
PRED = "mentions_email"
QUICK = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

_RE = re.compile(QUICK, re.ASCII)


def maybe(text: str) -> bool:
    return "@" in text


def extract(text: str) -> list[str]:
    out: list[str] = []
    seen: set[str] = set()
    for m in _RE.finditer(text):
        a = m.group(0)
        if a not in seen:
            seen.add(a)
            out.append(a)
    return out
