"""Literal family: path-like references in inline code spans and in
comment lines — the remaining two surfaces of the reference's markdown
extractor (deps/extractors/markdown.py:328-361 _extract_code_spans +
_looks_like_path; :367-409 _extract_from_code_block scanning comment
lines inside fenced blocks with _CODE_BLOCK_PATH_RE + the known-extension
check). Surfaces attach to the turn's first linked entity as
(entity, references_code, path).

Two rules, both DuckDB-replayable (see the mcp CTE in
KG_LITERAL_MENTIONS_SQL):

  1. code span ```src/cli.py``` -> the span text if it "looks like a
     path": <=200 chars (regex cap), no code/CLI characters
     ``()=+{}[];|><``, no leading ``-`` (flag), no spaces, and either
     contains ``/`` or carries a known file extension — the reference's
     _looks_like_path heuristic verbatim.
  2. comment-line paths: lines starting ``#`` / ``//`` / ``--`` (the
     reference scans these inside fenced code blocks; a transcript turn
     IS the block) yield every ``dir/.../name`` hit of the path regex,
     accepted when the last segment has no dot or the extension is
     known.

Dedupe keep-first across both rules in document order (span position /
line-then-match order).
"""

from __future__ import annotations

import re

from ..functions.hashing import _ASCII_LOWER

NAME = "md_code_paths"
KIND = "literal"
PRED = "references_code"

# the reference's _PATH_EXTENSIONS set (markdown.py:34-86) — common
# source/config extensions; both engines consult the identical list
PATH_EXTENSIONS = frozenset(
    "py js jsx ts tsx go rs java rb scala sh bash zsh yaml yml json toml "
    "cfg ini md mdx txt html css scss sql graphql tf hcl dockerfile "
    "makefile c cpp h hpp swift kt lua r pl ex exs erl hs vue svelte "
    "astro prisma proto".split()
)

_SPAN = re.compile(r"`([^`\n]{1,200})`", re.ASCII)
_BAD_CHARS = re.compile(r"[()=+{}\[\];|<> ]", re.ASCII)
_COMMENT_LINE = re.compile(r"^[ \t]*(?:#|//|--)([^\n]*)", re.MULTILINE | re.ASCII)
# explicit ASCII version of the reference's (?:[\w.~-]+/)+[\w.-]+
_PATH = re.compile(r"(?:[A-Za-z0-9_.~-]+/)+[A-Za-z0-9_.-]+", re.ASCII)
_LAST_DOT = re.compile(r"\.[^/]*$", re.ASCII)

QUICK = r"`|#|//|--"


def maybe(text: str) -> bool:
    return "`" in text or "#" in text or "//" in text or "--" in text


def _ext_ok(p: str) -> bool:
    """Known-extension gate when the last segment carries a dot
    (markdown.py:388-391)."""
    if not _LAST_DOT.search(p):
        return True
    # explicit ASCII lower — matches the oracles' translate() and the
    # Arrow kernel's ascii_lower; see hashing._ASCII_LOWER (round-5)
    return p.rsplit(".", 1)[-1].translate(_ASCII_LOWER) in PATH_EXTENSIONS


def _looks_like_path(s: str) -> bool:
    """markdown.py:104-137 _looks_like_path (length is enforced by the
    span regex cap)."""
    if _BAD_CHARS.search(s) or s.startswith("-"):
        return False
    if "/" in s:
        return True
    if "." in s:
        return s.rsplit(".", 1)[-1].translate(_ASCII_LOWER) in PATH_EXTENSIONS
    return False


def extract(text: str) -> list[str]:
    """Path refs in document order (span position / comment line then
    match order), deduped keep-first across both rules."""
    hits: list[tuple[int, int, str]] = []
    if "`" in text:
        for m in _SPAN.finditer(text):
            s = m.group(1)
            if _looks_like_path(s):
                hits.append((m.start(), 0, s))
    for lm in _COMMENT_LINE.finditer(text):
        body = lm.group(1)
        off = lm.start(1)
        for pm in _PATH.finditer(body):
            p = pm.group(0)
            if _ext_ok(p):
                hits.append((off + pm.start(), 1, p))
    hits.sort()
    out: list[str] = []
    seen: set[str] = set()
    for _pos, _ri, s in hits:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out
