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

import numpy as np

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


def detect_mentions_batch(
    texts, quick_mask: np.ndarray | None = None
) -> tuple[np.ndarray, list[str]]:
    """Vectorized twin of :func:`detect_mentions` over a whole batch —
    pytest-pinned byte-identical per-turn output (the per-turn function is
    the readable spec; this is the hot path).

    ``texts`` is a pyarrow string Array/ChunkedArray (zero-copy from the
    batch) or a plain list. The whole word pipeline is Arrow C kernels:
    quick-gated rows -> split_pattern_regex on the NON-word complement
    (== findall of the word class, and a pure-ASCII class so RE2 and
    Python ``re`` agree exactly) -> list_flatten -> dictionary_encode.
    Each DISTINCT word is classified once (process-memoized); the emit
    decision (bigram start / identifier not in a bigram) is numpy masks
    with turn boundaries handled by first/last-word masks. Python touches
    only the DISTINCT words and the EMITTED indices (~1-2 per turn),
    never every word occurrence.

    ``quick_mask`` (optional bool array, one per text) is a precomputed
    QUICK-gate from the caller's own Arrow pass; without it the gate runs
    here.

    Returns (counts per text, flat surfaces in per-turn first-occurrence
    order)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    empty = pa.array([], pa.string())

    col = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(
        texts, pa.string()
    )
    n_texts = len(col)
    counts = np.zeros(n_texts, dtype=np.int64)
    if not n_texts:
        return counts, empty
    if quick_mask is None:
        quick_mask = pc.fill_null(
            pc.match_substring_regex(col, _QUICK_RE.pattern), False
        ).to_numpy(zero_copy_only=False)
    sel = np.nonzero(quick_mask)[0]
    if not len(sel):
        return counts, empty
    sub = pc.take(col, pa.array(sel))
    if isinstance(sub, pa.ChunkedArray):
        sub = sub.combine_chunks()
    # per-row word counts + the flat word stream, all C: the complement
    # split yields exactly the [A-Za-z0-9_]+ runs (plus empty strings at
    # text edges, filtered out; order within and across rows preserved).
    # Word counts come from the SPLIT result (list lengths minus the
    # filtered edge-empties, via one bincount) — a separate
    # count_substring_regex pass re-scanned every byte for ~35% of the
    # kernel's time
    split = pc.split_pattern_regex(sub, "[^A-Za-z0-9_]+")
    lens = pc.list_value_length(split).to_numpy().astype(np.int64)
    flat0 = pc.list_flatten(split)
    nonempty = pc.not_equal(flat0, "")
    flat = flat0.filter(nonempty)
    rowid = np.repeat(np.arange(len(sub), dtype=np.int64), lens)
    nwords = np.bincount(
        rowid[nonempty.to_numpy(zero_copy_only=False)], minlength=len(sub)
    ).astype(np.int64)
    total = int(nwords.sum())
    if not total:
        return counts, empty
    denc = pc.dictionary_encode(flat)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = denc.indices.to_numpy()
    uniques = denc.dictionary.to_pylist()
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
        return counts, empty
    turn_of = np.searchsorted(ends, emit_idx, side="right")
    # keep-first per-turn dedupe, fully vectorized: a surface is
    # identified by (first-word code, next-word code + 1 if bigram else
    # 0) — two ints, never the string. codes are int64-combined when the
    # range allows (always, for realistic dictionaries), else a 2-column
    # pandas dedupe.
    import pandas as pd

    ecodes = codes[emit_idx]
    enext = np.where(
        bigram[emit_idx],
        codes[np.minimum(emit_idx + 1, total - 1)] + 1,
        0,
    )
    d1 = len(uniques) + 1
    key = ecodes.astype(np.int64) * d1 + enext
    span = (turn_of.astype(np.int64).max() + 1) if len(turn_of) else 1
    if span < 2**62 // (d1 * d1):
        dup = pd.Series(turn_of.astype(np.int64) * (d1 * d1) + key).duplicated().to_numpy()
    else:  # pathological dictionary size: exact 2-column dedupe
        dup = pd.DataFrame({"t": turn_of, "k": key}).duplicated().to_numpy()
    kept = ~dup
    counts_sel = np.bincount(turn_of[kept], minlength=len(sel))
    counts[sel] = counts_sel
    # surface strings built by Arrow gathers over the SMALL dictionary:
    # word1 (all), word1+" "+word2 for bigram rows
    kcodes = ecodes[kept]
    knext_idx = np.minimum(emit_idx[kept] + 1, total - 1)
    kbig = bigram[emit_idx[kept]]
    w1 = pc.take(denc.dictionary, pa.array(kcodes))
    joined = pc.binary_join_element_wise(
        w1, pc.take(denc.dictionary, pa.array(codes[knext_idx])), " "
    )
    surfaces = pc.if_else(pa.array(kbig), joined, w1)
    return counts, surfaces
