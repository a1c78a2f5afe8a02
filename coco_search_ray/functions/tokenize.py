"""Code-aware tokenization with reference-parity semantics.

Reimplements (from scratch, matching observable behavior) the reference's
identifier-splitting tokenizer used for keyword search:

- camelCase / PascalCase / snake_case / kebab-case splitting with the
  ORIGINAL identifier always preserved as a token
  (reference: src/cocosearch/indexer/tsvector.py:17-50),
- document-side enrichment: identifiers split + raw lowercased words
  appended (tsvector.py:90-120),
- query-side normalization with the same splitter so index-time and
  query-time tokenization agree (query_analyzer.py:88-144),
- identifier-pattern detection used to decide hybrid vs semantic-only
  mode (query_analyzer.py:17-85).

These functions are pure and deterministic; they run inside vectorized
``map_batches`` bodies (applied per unique string, not per row — surface
forms repeat heavily) and inside the single-process oracle.
"""

from __future__ import annotations

import re

_CAMEL_RE = re.compile(r"[A-Z]?[a-z]+|[A-Z]+(?=[A-Z][a-z]|\d|\W|$)|\d+")
_SNAKE_KEBAB_RE = re.compile(r"[_-]")
_IDENT_RE = re.compile(r"\b[a-zA-Z_][a-zA-Z0-9_]*\b")
_WORD_RE = re.compile(r"\b\w+\b")
_QWORD_RE = re.compile(r"[a-zA-Z0-9_]+")
_LC_UC_RE = re.compile(r"[a-z][A-Z]")
_PASCAL_RE = re.compile(r"[A-Z][a-z]+[A-Z]")
_SNAKE_WORD_RE = re.compile(r"[a-zA-Z0-9]+_[a-zA-Z0-9]+")


def split_code_identifier(identifier: str) -> list[str]:
    """Split an identifier into tokens; the original is always kept first.

    ``getUserById -> [getUserById, get, User, By, Id]``
    ``get_user_by_id -> [get_user_by_id, get, user, by, id]``
    """
    tokens = [identifier]
    camel = _CAMEL_RE.findall(identifier)
    if len(camel) > 1:
        tokens.extend(camel)
    if "_" in identifier or "-" in identifier:
        parts = [p for p in _SNAKE_KEBAB_RE.split(identifier) if p]
        if len(parts) > 1:
            tokens.extend(parts)
    return tokens


def enrich_text_tokens(content: str) -> list[str]:
    """Document-side token stream: split identifiers (len>=2) + raw
    lowercased words. Mirrors the reference's tsvector input construction
    (identifiers enriched, naturals appended)."""
    out: list[str] = []
    for ident in _IDENT_RE.findall(content):
        if len(ident) >= 2:
            out.extend(split_code_identifier(ident))
    out.extend(_WORD_RE.findall(content.lower()))
    return out


def _should_split(identifier: str) -> bool:
    if len(identifier) <= 1:
        return False
    if identifier.isupper():  # pure acronym
        return False
    return (
        "_" in identifier
        or "-" in identifier
        or _LC_UC_RE.search(identifier) is not None
        or _PASCAL_RE.search(identifier) is not None
    )


def normalize_query_tokens(query: str) -> list[str]:
    """Query-side normalization: expand identifier-looking words with the
    same splitter, keep everything else verbatim. Asymmetric with the
    document side on purpose (documents fully enriched, queries natural)."""
    out: list[str] = []
    last = 0
    for m in _IDENT_RE.finditer(query):
        if m.start() > last:
            pre = query[last : m.start()].strip()
            if pre:
                out.append(pre)
        ident = m.group()
        last = m.end()
        if _should_split(ident):
            out.extend(split_code_identifier(ident))
        else:
            out.append(ident)
    if last < len(query):
        suf = query[last:].strip()
        if suf:
            out.append(suf)
    return out


def has_identifier_pattern(query: str) -> bool:
    """True when the query contains a code-identifier-shaped word:
    snake_case (any length), camelCase (starts lowercase, >=6 chars),
    PascalCase (UC-lc-UC, >=8 chars). Proper nouns like PyPi/GitHub stay
    False."""
    for m in _QWORD_RE.finditer(query):
        w = m.group()
        if _SNAKE_WORD_RE.search(w):
            return True
        if len(w) >= 6 and w[0].islower() and _LC_UC_RE.search(w):
            return True
        if len(w) >= 8 and _PASCAL_RE.search(w):
            return True
    return False


def keyword_tokens_for_match(tokens: list[str]) -> list[str]:
    """Lowercase token multiset used for keyword scoring ('simple' text
    search config semantics: no stemming, case-folded)."""
    return [t.lower() for t in tokens]
