"""Text-analysis kernels for large-scale training-data pipelines:
language ID (n-gram/stopword heuristic), quality scoring, token counting.

All pure + deterministic; applied inside vectorized ``map_batches`` stages
(stages/textops.py). SQL-oracle notes: token_count and the quality ratios
are defined so DuckDB can reproduce them with regexp functions (the
correctness gate compares value hashes).
"""

from __future__ import annotations

import re

# re.ASCII pins \w to [0-9A-Za-z_] — DuckDB's RE2 \w is ASCII-only, so
# both sides of every token-domain oracle share the same alphabet even if
# documents gain accented/CJK text (ADVICE r02)
_TOKEN_RE = re.compile(r"\w+", re.ASCII)
# explicit whitespace class: the gate oracle's RE2 [^\w\s] treats \v as
# punctuation (RE2 \s = [ \t\n\r\f]); Python re.ASCII \s would not
# (round-5 lockstep-fuzz finding). One explicit class, both engines.
_PUNCT_RE = re.compile(r"[^\w \t\n\r\f]", re.ASCII)
_BPEISH_RE = re.compile(r"\w+|[^\w \t\n\r\f]", re.ASCII)

# tiny per-language stopword lists for the heuristic language-ID
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is it you that was for on are with as i his they be at".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist im dem nicht ein".split()),
    "fr": frozenset("le de la et les des en un du une que est pour qui dans par".split()),
    "es": frozenset("de la que el en y a los se del las un por con no una su".split()),
}
_EN_STOPWORDS = _LANG_STOPWORDS["en"]


def token_count(text: str) -> int:
    """Whitespace/word-boundary token count (``\\w+`` matches)."""
    return len(_TOKEN_RE.findall(text))


def bpe_ish_token_count(text: str) -> int:
    """BPE-ish proxy count: word tokens + punctuation marks."""
    return len(_BPEISH_RE.findall(text))


def quality_features(text: str) -> dict[str, float]:
    """Cheap quality signals: length, punctuation ratio, stopword ratio,
    mean word length, uppercase ratio."""
    n_chars = len(text)
    words = _TOKEN_RE.findall(text)
    n_words = len(words)
    n_punct = len(_PUNCT_RE.findall(text))
    n_upper = sum(1 for c in text if c.isupper())
    n_stop = sum(1 for w in words if w.lower() in _EN_STOPWORDS)
    return {
        "n_chars": float(n_chars),
        "n_words": float(n_words),
        "punct_ratio": n_punct / n_chars if n_chars else 0.0,
        "stopword_ratio": n_stop / n_words if n_words else 0.0,
        "mean_word_len": (sum(len(w) for w in words) / n_words) if n_words else 0.0,
        "upper_ratio": n_upper / n_chars if n_chars else 0.0,
    }


def detect_language(text: str) -> str:
    """Heuristic language ID: score per-language stopword hit-rate over the
    first 200 word tokens; 'und' (undetermined) when no language reaches
    2 hits. Deterministic; ties broken by language code ascending."""
    words = [w.lower() for w in _TOKEN_RE.findall(text)[:200]]
    if not words:
        return "und"
    best_lang = "und"
    best_hits = 1  # need >= 2 hits to claim a language
    for lang in sorted(_LANG_STOPWORDS):
        hits = sum(1 for w in words if w in _LANG_STOPWORDS[lang])
        if hits > best_hits:
            best_hits = hits
            best_lang = lang
    return best_lang
