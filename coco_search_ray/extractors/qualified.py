"""Qualified-name family: dotted member paths whose ROOT segment is
identifier-shaped — ``payment_service.process_refund``,
``PaymentGateway.handler.init``. The structured analog of the
reference's tree-sitter symbol extraction, which emits QUALIFIED names
(``Class.method``, Go receiver methods) rather than flat tokens
(reference indexer/symbols.py:216-291).

KIND="qualified": extraction keeps the full dotted surface; LINKING
resolves the root segment against the entity catalog (same hybrid
linker as entity mentions) and rewrites the row's value to
``<entity_id>.<member_path>``; ASSEMBLY then splits on the first dot —
the root entity joins the turn's entity graph (mentions / uses_tool /
replies_to) and each row additionally emits the hierarchy triple
``(root_entity, has_member, member_path)``. Unlinked roots drop, like
unlinked entity mentions.

The root-shape gate reuses the SAME word-shape rules as the identifier
entity family (functions/mentions._is_identifier_mention), so prose
("logs.before"), URL hosts ("svc.example") and email domains never
qualify.
"""

from __future__ import annotations

import re

from ..functions.mentions import _is_identifier_mention

NAME = "qualified_names"
KIND = "qualified"
PRED = "has_member"

# no \b anchors: pure character classes keep RE2 (the vectorized Arrow
# candidate mask AND the DuckDB oracle replay) byte-equivalent to
# Python re; the root-shape gate rejects sub-token matches anyway
_PATTERN = r"[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)+"

# QUICK is deliberately TIGHTER than the match pattern: a root that
# passes the identifier-shape gate necessarily contains '_' (snake), a
# lower->UPPER transition (camel) or UC-lc-UC (pascal) somewhere before
# the first dot — so a sound candidate row must contain one of those
# shapes followed by word chars and '.letter'. This keeps URL hosts
# ("svc.example") and email domains from even reaching extract().
QUICK = r"(?:_|[a-z][A-Z]|[A-Z][a-z]+[A-Z])[A-Za-z0-9_]*\.[A-Za-z_]"

_RE = re.compile(_PATTERN, re.ASCII)


def maybe(text: str) -> bool:
    return "." in text


# root -> passes-shape, process-memoized (roots draw from a bounded
# vocabulary; same policy as the mentions word-class cache)
_ROOT_CACHE: dict[str, bool] = {}
_ROOT_CACHE_MAX = 500_000


def _root_ok(root: str) -> bool:
    ok = _ROOT_CACHE.get(root)
    if ok is None:
        ok = _is_identifier_mention(root)
        if len(_ROOT_CACHE) >= _ROOT_CACHE_MAX:
            _ROOT_CACHE.clear()
        _ROOT_CACHE[root] = ok
    return ok


def extract(text: str) -> list[str]:
    """Dotted surfaces whose root passes the identifier-shape test, in
    first-occurrence order, deduped keep-first."""
    out: list[str] = []
    seen: set[str] = set()
    # findall: the pattern's only group is non-capturing, so matches come
    # back as full surface strings in one C-level pass (finditer paid a
    # Match object + .group() call per hit in the hot path)
    for s in _RE.findall(text):
        if s in seen:
            continue
        seen.add(s)
        if _root_ok(s.split(".", 1)[0]):
            out.append(s)
    return out
