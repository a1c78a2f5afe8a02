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
from itertools import chain

import numpy as np
import pandas as pd

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


# word -> int class bits (bit0 = capitalized, bit1 = identifier) for the
# BATCH kernel; same memoization policy as _WORD_CLASS_CACHE
_WORD_CLASS_INT_CACHE: dict[str, int] = {}
_EMPTY_WORDS: list[str] = []


def detect_mentions_batch(
    texts: list[str], quick_mask: np.ndarray | None = None
) -> tuple[np.ndarray, list[str]]:
    """Vectorized twin of :func:`detect_mentions` over a whole batch —
    pytest-pinned byte-identical per-turn output (the per-turn function is
    the readable spec; this is the hot path, ~3x faster).

    Shape: per-turn findall (regex stays per turn — bigrams must not span
    turns), then ONE pd.factorize over the batch's word stream, each
    DISTINCT word classified once (process-memoized), and the emit
    decision (bigram start / identifier not in a bigram) as numpy masks
    with turn boundaries handled by first/last-word masks. Python touches
    only the EMITTED indices (~1-2 per turn), never every word.

    ``quick_mask`` (optional bool array, one per text) is a precomputed
    QUICK-gate — the caller evaluated ``_QUICK_RE`` for the whole column
    in one vectorized Arrow pass (the pattern is pure ASCII character
    classes, so RE2 and Python ``re`` agree exactly); without it the gate
    runs per text here.

    Returns (counts per text, flat surfaces in per-turn first-occurrence
    order)."""
    n_texts = len(texts)
    counts = np.zeros(n_texts, dtype=np.int64)
    wlists: list[list[str]] = []
    nwords = np.zeros(n_texts, dtype=np.int64)
    if quick_mask is None:
        for i, t in enumerate(texts):
            w = _WORD_RE.findall(t) if (t and _QUICK_RE.search(t)) else _EMPTY_WORDS
            wlists.append(w)
            nwords[i] = len(w)
    else:
        wlists = [_EMPTY_WORDS] * n_texts
        for i in np.nonzero(quick_mask)[0]:
            t = texts[i]
            if t:
                w = _WORD_RE.findall(t)
                wlists[i] = w
                nwords[i] = len(w)
    total = int(nwords.sum())
    if not total:
        return counts, []
    words = np.fromiter(chain.from_iterable(wlists), dtype=object, count=total)
    codes, uniques = pd.factorize(words, sort=False)
    ucls = np.empty(len(uniques), dtype=np.int8)
    get = _WORD_CLASS_INT_CACHE.get
    for k, w in enumerate(uniques):
        c = get(w)
        if c is None:
            cap, ident = _classify(w)
            c = (1 if cap else 0) | (2 if ident else 0)
            if len(_WORD_CLASS_INT_CACHE) >= _WORD_CLASS_CACHE_MAX:
                _WORD_CLASS_INT_CACHE.clear()
            _WORD_CLASS_INT_CACHE[w] = c
        ucls[k] = c
    cls = ucls[codes]
    cap = (cls & 1).astype(bool)
    ident = (cls & 2).astype(bool)
    ends = np.cumsum(nwords)
    starts = ends - nwords
    nz = nwords > 0
    last_word = np.zeros(total, dtype=bool)
    last_word[ends[nz] - 1] = True
    first_word = np.zeros(total, dtype=bool)
    first_word[starts[nz]] = True
    cap_next = np.empty(total, dtype=bool)
    cap_next[:-1] = cap[1:]
    cap_next[-1] = False
    cap_next &= ~last_word  # a turn's last word has no next word
    cap_prev = np.empty(total, dtype=bool)
    cap_prev[1:] = cap[:-1]
    cap_prev[0] = False
    cap_prev &= ~first_word
    bigram = cap & cap_next
    in_bigram = cap & (cap_next | cap_prev)
    emit = bigram | (ident & ~in_bigram)
    emit_idx = np.nonzero(emit)[0]
    if not len(emit_idx):
        return counts, []
    turn_of = np.searchsorted(ends, emit_idx, side="right")
    # per-turn surface build + keep-first dedupe over EMITTED indices only
    surfaces: list[str] = []
    boundary = np.nonzero(turn_of[1:] != turn_of[:-1])[0] + 1
    run_starts = np.concatenate(([0], boundary))
    run_ends = np.concatenate((boundary, [len(emit_idx)]))
    wl = words  # local alias
    for s, e in zip(run_starts, run_ends):
        turn = turn_of[s]
        seen: set[str] = set()
        c = 0
        for k in range(s, e):
            i = emit_idx[k]
            surface = f"{wl[i]} {wl[i + 1]}" if bigram[i] else wl[i]
            if surface not in seen:
                seen.add(surface)
                surfaces.append(surface)
                c += 1
        counts[turn] = c
    return counts, surfaces
