"""Literal family: ArgoCD application-source references in turn text —
the transcript analog of the reference's ArgoCD extractor
(deps/extractors/argocd.py:24-262: Application/ApplicationSet/AppProject
manifests yield ``source_repo`` (spec.source.repoURL, AppSet generator
repoURL, AppProject sourceRepos), ``source_chart`` (spec.source.chart),
``source_path`` (spec.source.path) and ``project`` reference edges, all
``DepType.REFERENCE`` with ``metadata.kind`` distinguishing them). A user
pasting Application YAML into a conversation gets the same edges here:
surfaces attach to the turn's first linked entity as
(entity, argo_ref, target).

Four statement shapes, each ONE regex with ONE capture so the DuckDB
oracle replays them 1:1 with regexp_extract_all(..., 1). The reference's
per-kind metadata is recovered downstream by surface shape (``://`` or
``git@`` -> repo, contains ``/`` -> path, bare word -> chart/project
name) — see q_argocd_sources.

  1. ``repoURL: https://git.example.com/org/repo.git``  (source_repo /
     generator_repo; git@host:org/repo SSH shorthand also accepted)
  2. ``chart: nginx-ingress``                           (source_chart)
  3. ``path: apps/guestbook``                           (source_path)
  4. ``project: platform``                              (project ref;
     the reference skips the implicit default the same way a bare
     manifest omits it — we extract whatever is stated)

All character classes are explicit ASCII so Python re, RE2 (the Arrow
candidate mask) and DuckDB agree.
"""

from __future__ import annotations

import re

NAME = "argocd"
KIND = "literal"
PRED = "argo_ref"

_REPO = r"[A-Za-z][A-Za-z0-9+.-]*://[A-Za-z0-9._~:/@-]+|git@[A-Za-z0-9._-]+:[A-Za-z0-9._/-]+"
_WORD = r"[A-Za-z0-9][A-Za-z0-9._-]*"
_PATH = r"[A-Za-z0-9._-]+(?:/[A-Za-z0-9._-]+)*"

_RULES = [
    (re.compile(r"\brepoURL:[ \t]*['\"]?(" + _REPO + r")", re.ASCII), "repoURL:"),
    (re.compile(r"\bchart:[ \t]*['\"]?(" + _WORD + r")", re.ASCII), "chart:"),
    (re.compile(r"\bpath:[ \t]*['\"]?(" + _PATH + r")", re.ASCII), "path:"),
    (re.compile(r"\bproject:[ \t]*['\"]?(" + _WORD + r")", re.ASCII), "project:"),
]

QUICK = r"(?:repoURL|chart|path|project):"


def maybe(text: str) -> bool:
    return (
        "repoURL:" in text
        or "chart:" in text
        or "path:" in text
        or "project:" in text
    )


def extract(text: str) -> list[str]:
    """ArgoCD reference targets in first-occurrence order (by match
    start, ties by rule order), deduped keep-first."""
    hits: list[tuple[int, int, str]] = []
    for ri, (rx, gate) in enumerate(_RULES):
        if gate not in text:
            continue
        for m in rx.finditer(text):
            hits.append((m.start(), ri, m.group(1)))
    hits.sort()
    out: list[str] = []
    seen: set[str] = set()
    for _pos, _ri, s in hits:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out
