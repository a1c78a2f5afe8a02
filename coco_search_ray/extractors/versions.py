"""Literal family: semver-style version strings (v1.2.3 / 2.0.1-rc1).
Reference analog: dependency version pins extracted by the config-file
extractors (deps/extractors/helm.py, docker_compose.py — image/chart
version references become edge metadata). Surfaces attach to the turn's
first linked entity as (entity, mentions_version, version)."""

from __future__ import annotations

import re

NAME = "versions"
KIND = "literal"
PRED = "mentions_version"
QUICK = r"\bv?[0-9]+\.[0-9]+\.[0-9]+(?:-[0-9A-Za-z.]+)?\b"

_RE = re.compile(QUICK, re.ASCII)


def maybe(text: str) -> bool:
    return "." in text


def extract(text: str) -> list[str]:
    out: list[str] = []
    seen: set[str] = set()
    for m in _RE.finditer(text):
        v = m.group(0)
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out
