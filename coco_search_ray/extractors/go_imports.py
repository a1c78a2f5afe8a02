"""Literal family: Go import declarations — the transcript analog of
the reference's Go dependency extractor (deps/extractors/go.py:36-110:
tree-sitter import_declaration / import_spec walk emitting one edge per
imported package, covering single ``import "fmt"``, grouped
``import ("fmt"; "os")``, aliased ``import f "fmt"`` and blank
``import _ "database/sql"`` forms). Surfaces attach to the turn's
first linked entity as (entity, imports_module, package_path) — the
same PRED as the python/JS ``imports`` family, mirroring the
reference's single DepType for all import edges.

Two statement shapes, each a single- or two-level-capture regex the
DuckDB oracle replays 1:1 (the reference parses with tree-sitter; the
regexes cover the canonical layouts a transcript carries):

  1. single form   ``import "pkg"`` with an optional alias token —
                   named ``f``, blank ``_`` or dot ``.`` — between the
                   keyword and the quoted path
  2. grouped form  ``import ( ... )`` block (body captured up to the
                   first ``)``; Go paths cannot contain one), items
                   anchored at a line start OR after ``;`` (the
                   one-line ``import ("fmt"; "os")`` form) so a
                   ``// "quoted"`` comment line inside the block does
                   not emit a phantom package

All character classes are explicit ASCII so Python re, RE2 (the Arrow
candidate mask) and DuckDB agree; ``(?m)^`` anchors identically in all
three engines (match start-of-string or after newline).
"""

from __future__ import annotations

import re

NAME = "go_imports"
KIND = "literal"
PRED = "imports_module"

# alias token: named ident, blank `_`, or dot-import `.` (first char
# covers all three; Go identifiers are ASCII in the canonical layouts)
_ALIAS = r"[A-Za-z_.][A-Za-z0-9_]*"

_SINGLE = re.compile(r"\bimport[ \t]+(?:" + _ALIAS + r"[ \t]+)?\"([^\"\n]+)\"", re.ASCII)
_BLOCK = re.compile(r"\bimport[ \t]*\(([^)]*)\)", re.ASCII)
_ITEM = re.compile(r"(?m)(?:^|;)[ \t]*(?:" + _ALIAS + r"[ \t]+)?\"([^\"\n]+)\"", re.ASCII)

QUICK = r"\bimport[ \t(]"


def maybe(text: str) -> bool:
    """Cheap substring precheck — both rules need the keyword AND a
    double-quoted path."""
    return "import" in text and '"' in text


def extract(text: str) -> list[str]:
    """Imported package paths in document order (match start within the
    turn, ties by rule order), deduped keep-first."""
    hits: list[tuple[int, int, str]] = []
    for m in _SINGLE.finditer(text):
        hits.append((m.start(), 0, m.group(1)))
    for bm in _BLOCK.finditer(text):
        off = bm.start(1)
        for im in _ITEM.finditer(bm.group(1)):
            hits.append((off + im.start(), 1, im.group(1)))
    hits.sort()
    out: list[str] = []
    seen: set[str] = set()
    for _pos, _ri, s in hits:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out
