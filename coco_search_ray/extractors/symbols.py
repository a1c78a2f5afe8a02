"""Literal family: per-language symbol DEFINITIONS in turn text — the
transcript analog of the reference's tree-sitter symbol extraction
surface (indexer/symbols.py:216-291 emits function/class/method symbols
per language, including Go receiver methods qualified as Type.Name).
Surfaces attach to the turn's first linked entity as
(entity, defines_symbol, name).

Seven statement rules across four language syntaxes. Every rule is ONE
regex; all but the Go-receiver rule have ONE capture so the DuckDB
oracle replays them with regexp_extract_all(..., 1). The receiver rule
captures (type, method) and both sides compose the qualified surface
``Type.Name`` — the pipeline via f-string, the oracle via
list_transform + regexp_replace with the same anchored pattern:

  1. ``def name(``            (python function)
  2. ``class Name:`` / ``(``/ ``{``  (python / JS / Java class — the
     trailing delimiter keeps prose "the class size" out)
  3. ``function name(``       (JS)
  4. ``func name(``           (Go function; the receiver form never
     matches — '(' follows ``func `` immediately there)
  5. ``func (r *Type) Name(`` (Go method -> ``Type.Name``)
  6. ``fn name(`` / ``fn name<``     (rust)
  7. ``struct Name {``        (rust / Go / C)

All character classes are explicit ASCII so Python re, RE2 (the Arrow
candidate mask) and DuckDB agree; no lookaround, no backreferences.
"""

from __future__ import annotations

import re

NAME = "symbols"
KIND = "literal"
PRED = "defines_symbol"

_ID = r"[A-Za-z_][A-Za-z0-9_]*"
_RECV = r"\bfunc[ \t]+\(" + _ID + r"[ \t]+\*?(" + _ID + r")\)[ \t]+(" + _ID + r")\("
_RULES: list[tuple[re.Pattern, bool, str]] = [
    # (compiled rule, is_receiver, substring gate) — receiver composes
    # group1.group2; the gate is a sound necessary condition (a rule
    # match always contains its keyword) so extract() can skip the
    # regex scan on rows whose QUICK hit came from another keyword
    (re.compile(r"\bdef[ \t]+(" + _ID + r")\(", re.ASCII), False, "def"),
    (re.compile(r"\bclass[ \t]+(" + _ID + r")[ \t]*[:({]", re.ASCII), False, "class"),
    (re.compile(r"\bfunction[ \t]+(" + _ID + r")\(", re.ASCII), False, "function"),
    (re.compile(r"\bfunc[ \t]+(" + _ID + r")\(", re.ASCII), False, "func"),
    (re.compile(_RECV, re.ASCII), True, "func"),
    (re.compile(r"\bfn[ \t]+(" + _ID + r")[(<]", re.ASCII), False, "fn"),
    (re.compile(r"\bstruct[ \t]+(" + _ID + r")[ \t]*\{", re.ASCII), False, "struct"),
]

QUICK = r"\b(?:def|class|function|func|fn|struct)[ \t]"


def maybe(text: str) -> bool:
    """Sound precheck: the rules accept [ \\t] after the keyword, so the
    gate must too — a space-only check dropped tab-separated
    definitions on the scalar/sentinel dispatch path while the batch
    mask and the oracle emitted them (round-5 review)."""
    return (
        "def " in text
        or "def\t" in text
        or "class " in text
        or "class\t" in text
        or "func" in text  # covers "func ", "func\t" and "function"
        or "fn " in text
        or "fn\t" in text
        or "struct " in text
        or "struct\t" in text
    )


def extract(text: str) -> list[str]:
    """Defined-symbol surfaces in first-occurrence order (by match
    start, ties by rule order), deduped keep-first; Go receiver methods
    surface as ``Type.Name``."""
    hits: list[tuple[int, int, str]] = []
    for ri, (rx, is_recv, gate) in enumerate(_RULES):
        if gate not in text:
            continue
        for m in rx.finditer(text):
            s = f"{m.group(1)}.{m.group(2)}" if is_recv else m.group(1)
            hits.append((m.start(), ri, s))
    hits.sort()
    out: list[str] = []
    seen: set[str] = set()
    for _pos, _ri, s in hits:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out
