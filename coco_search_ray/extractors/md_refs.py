"""Literal family: reference-style markdown links, resolved through the
turn's own definition table — the second half of the reference's
markdown extractor (deps/extractors/markdown.py:268-326 resolves link
destinations and validates/strips non-local targets; the tree-sitter
inline grammar it drives recognises full/collapsed reference links and
reference-style images against ``[ref]: url`` link_reference_definitions
in the same document). The sibling ``md_links`` family covers the
inline-link / wiki-ref half.

Two passes over ONE turn (extract stays a pure function of text):

  pass 1 — definitions: line-anchored ``[ref]: target`` rows build a
           keep-first, case-folded ref -> target table (markdown
           reference labels are case-insensitive);
  pass 2 — usages, in match order:
             ``[label][ref]``   full reference link (also matches the
                                ``![alt][ref]`` image form — the ``!``
                                is just the preceding character)
             ``[ref][]``        collapsed reference link
           each resolves through the table; unresolved refs emit
           nothing, and the resolved target goes through md_links'
           clean_target (the reference's _validate_link_path,
           markdown.py:308-326): http(s)/mailto:/pure-anchor targets
           skipped, #fragments stripped.

The emitted surface is the RESOLVED target (the reference's
metadata.module for doc_link edges), deduped keep-first. The DuckDB
oracle replays both passes with two regexp_extract_all captures zipped
by index plus a per-turn ref join — see Q_MD_REFERENCE_LINKS_SQL.
"""

from __future__ import annotations

import re

NAME = "md_refs"
KIND = "literal"
PRED = "references_doc"

from ..functions.hashing import _ASCII_LOWER
from .md_links import clean_target

_DEF = re.compile(
    r"^[ \t]*\[([^\]\n]{1,80})\]:[ \t]*([^ \t\r\n]{1,200})", re.MULTILINE | re.ASCII
)
_USE_FULL = re.compile(r"\[([^\]\n]{1,80})\]\[([^\]\n]{1,80})\]", re.ASCII)
_USE_COLLAPSED = re.compile(r"\[([^\]\n]{1,80})\]\[\]", re.ASCII)

QUICK = r"\]\["


def maybe(text: str) -> bool:
    return "][" in text


def extract(text: str) -> list[str]:
    """Resolved reference-link targets in usage order, cleaned per
    clean_target, deduped keep-first; unresolved refs excluded."""
    defs: dict[str, str] = {}
    for m in _DEF.finditer(text):
        # explicit ASCII case-fold (one table, three engines): Python
        # str.lower() and DuckDB lower() disagree on 'İ' (round-5)
        key = m.group(1).translate(_ASCII_LOWER)
        if key not in defs:
            defs[key] = m.group(2)
    if not defs:
        return []
    hits: list[tuple[int, int, str]] = []
    for ri, (rx, grp) in enumerate(((_USE_FULL, 2), (_USE_COLLAPSED, 1))):
        for m in rx.finditer(text):
            hits.append((m.start(), ri, m.group(grp).translate(_ASCII_LOWER)))
    hits.sort()
    out: list[str] = []
    seen: set[str] = set()
    for _pos, _ri, ref in hits:
        target = defs.get(ref)
        if target is None:
            continue
        target = clean_target(target)
        if target is None or target in seen:
            continue
        seen.add(target)
        out.append(target)
    return out
