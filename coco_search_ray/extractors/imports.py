"""Literal family: module-import statements in code snippets inside
turn text — the transcript analog of the reference's per-language
dependency extractors (deps/extractors/python.py:42-213 for
from/import/aliased forms; javascript.py for require()/ES import).
Surfaces attach to the turn's first linked entity as
(entity, imports_module, module_path).

Four statement shapes, each ONE regex with ONE capture so the DuckDB
oracle replays them 1:1 with regexp_extract_all(..., 1):

  1. ``from pkg.mod import ...`` / ``from .rel.mod import ...``
     -> pkg.mod / .rel.mod (relative dots kept — they ARE the path)
  2. ``import pkg.mod`` (DOTTED only — a bare ``import word`` is
     indistinguishable from prose like "the import process")
  3. ``require('mod')``                 -> mod
  4. ``import ... from 'mod'`` (ES)     -> mod
  5. ``import mod as alias`` at a STATEMENT START (text start, newline
     or ';') — the ``as`` keyword disambiguates an UNdotted module from
     prose, and the anchor keeps the rule from firing on the ``import
     y as z`` tail of a from-import (reference python.py aliased
     imports handle that via the parser; regex needs the anchor)

All character classes are explicit ASCII (no bare ``\\w``) so Python
re, RE2 (the Arrow candidate mask) and DuckDB agree; ``\\b`` before
``import`` is boundary-compatible in the sound direction (RE2's ASCII
word set is a subset of Python's, so every Python match is inside the
RE2 candidate mask).
"""

from __future__ import annotations

import re

NAME = "imports"
KIND = "literal"
PRED = "imports_module"

_MOD = r"[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z0-9_]+)*"
_WS = r"[ \t\r\n]"  # explicit ASCII whitespace: identical in re/RE2/DuckDB
# (rule, substring gate): the gate is a sound necessary condition (a
# rule match always contains its keyword) so extract() can skip regex
# scans on rows whose QUICK hit came from another statement shape
_RULES = [
    (re.compile(r"\bfrom" + _WS + r"+((?:\.{1,3})?" + _MOD + r")" + _WS + r"+import" + _WS, re.ASCII), "from"),
    (re.compile(r"\bimport" + _WS + r"+([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z0-9_]+)+)", re.ASCII), "import"),
    (re.compile(r"require\(" + _WS + r"*['\"]([^'\"]+)['\"]" + _WS + r"*\)", re.ASCII), "require("),
    (
        re.compile(
            r"\bimport" + _WS + r"+[A-Za-z0-9_{}, *\t\r\n]+" + _WS
            + r"*from" + _WS + r"+['\"]([^'\"]+)['\"]", re.ASCII
        ),
        "from",
    ),
    # anchored to a statement start (text start / newline / ';'):
    # 'from x import y as z' must NOT fire this rule for y — the
    # from-clause puts the 'import' mid-statement, never at a start.
    # RE2 has no lookbehind, so the anchor is the lockstep-able form.
    (
        re.compile(
            r"(?:^|[\r\n;])[ \t]*import" + _WS + r"+(" + _MOD + r")" + _WS + r"+as" + _WS, re.ASCII
        ),
        "as",
    ),
]

QUICK = r"(?:from|import)[ \t\r\n]|require\("


def maybe(text: str) -> bool:
    return "import" in text or "require(" in text


def extract(text: str) -> list[str]:
    """Module paths in first-occurrence order (by match start, ties by
    rule order), deduped keep-first."""
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
