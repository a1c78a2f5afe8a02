"""Deterministic rule-based mention detection over turn text.

The transcript analog of the reference's per-language extraction stage
(a record -> list-of-candidates explosion; reference shape:
deps/extractors/python.py:42-213 — per-record parse emitting typed
candidates). Rules are deliberately simple and closed-form so the
single-process oracle reproduces them exactly:

1. identifier-shaped single tokens: snake_case (any length), camelCase
   (starts lowercase, >=6 chars), PascalCase (UC-lc-UC, >=8 chars) —
   the same word-shape tests the reference uses to route a query into
   hybrid mode (query_analyzer.py:17-85);
2. Capitalized-word bigrams ("Payment Service") — the shape of catalog
   canonical names.

Output preserves text order; duplicates of the same surface form within a
turn are kept-first (position of first occurrence).
"""

from __future__ import annotations

import re

_WORD_RE = re.compile(r"[A-Za-z0-9_]+")
_CAP_WORD_RE = re.compile(r"^[A-Z][a-z]+$")
_LC_UC_RE = re.compile(r"[a-z][A-Z]")
_PASCAL_RE = re.compile(r"[A-Z][a-z]+[A-Z]")
_SNAKE_WORD_RE = re.compile(r"[a-zA-Z0-9]+_[a-zA-Z0-9]+")


def _is_identifier_mention(word: str) -> bool:
    if _SNAKE_WORD_RE.search(word):
        return True
    if len(word) >= 6 and word[0].islower() and _LC_UC_RE.search(word):
        return True
    if len(word) >= 8 and _PASCAL_RE.search(word):
        return True
    return False


# word -> (is_capitalized, is_identifier). Real text draws words from a
# bounded vocabulary, so classification memoizes extremely well (regexes
# run once per distinct word per worker process, not once per occurrence).
_WORD_CLASS_CACHE: dict[str, tuple[bool, bool]] = {}
_WORD_CLASS_CACHE_MAX = 1_000_000


def _classify(word: str) -> tuple[bool, bool]:
    c = _WORD_CLASS_CACHE.get(word)
    if c is None:
        c = (_CAP_WORD_RE.match(word) is not None, _is_identifier_mention(word))
        if len(_WORD_CLASS_CACHE) >= _WORD_CLASS_CACHE_MAX:
            _WORD_CLASS_CACHE.clear()
        _WORD_CLASS_CACHE[word] = c
    return c


# one C-level scan that returns False only when NO mention shape can occur:
# snake needs '_', camel needs a lc->UC transition, Pascal needs UC-lc-UC,
# a bigram needs "Cap Cap". Texts failing this skip the python word loop.
_QUICK_RE = re.compile(r"_|[a-z][A-Z]|[A-Z][a-z]+[A-Z]|[A-Z][a-z]+[^A-Za-z0-9_]+[A-Z][a-z]")


def detect_mentions(text: str) -> list[str]:
    """Return candidate mention surface forms in first-occurrence order.
    Ordering uses the word INDEX (words are non-overlapping and
    position-ordered, so index order == byte-position order) — findall is
    much cheaper than materializing match objects for offsets.

    Single pass over the word list (this runs once per turn at 10^7+
    turns per block of work): at index i, a "Cap Cap" bigram starting at
    i is emitted, and an identifier-class word is emitted unless it
    participates in ANY bigram (capitalized with a capitalized
    neighbor). A bigram at i and an identifier at i are mutually
    exclusive, so index order needs no sort."""
    if not _QUICK_RE.search(text):
        return []
    words = _WORD_RE.findall(text)
    n = len(words)
    classes = [_classify(w) for w in words]
    out: list[str] = []
    seen: set[str] = set()
    for i in range(n):
        cap_i, ident_i = classes[i]
        cap_next = i + 1 < n and classes[i + 1][0]
        if cap_i and cap_next:
            surface = f"{words[i]} {words[i + 1]}"
            if surface not in seen:
                seen.add(surface)
                out.append(surface)
        in_bigram = cap_i and (cap_next or (i > 0 and classes[i - 1][0]))
        if ident_i and not in_bigram:
            w = words[i]
            if w not in seen:
                seen.add(w)
                out.append(w)
    return out
