"""Parser-grade symbol extraction for ALL FIFTEEN of the reference's
query languages — python, javascript, typescript, go, rust, java, c,
c++, ruby, php, bash, dockerfile, hcl/terraform, scala, css — the
reference's tree-sitter symbol
surface (indexer/symbols.py:355-483 + queries/*.scm for each language)
re-implemented as comment/string-aware scanners (tree-sitter itself is
not installable in this environment; the scanners reproduce the .scm
capture semantics and are pinned by the reference's own golden tests,
ported in tests/test_symbols.py).

Capture semantics mirrored from the .scm files:
  python     — every class_definition ('class') and function_definition
               ('function') at ANY depth; methods keep type 'function'
               but get a Class.name qualified name (container chain =
               enclosing classes only, intervening functions ignored —
               reference _build_qualified_name walks class ancestors).
  javascript — function declarations (incl. async), class declarations,
               method definitions inside class bodies ('method',
               qualified Class.name), and const/let arrow functions
               ('function').
  go         — func declarations ('function'), receiver methods
               ('method', qualified Type.Name), type X struct ('class'),
               type X interface ('interface').
  rust       — top-level fn ('function'), fn inside impl blocks
               ('method', qualified by the first type identifier after
               ``impl`` — the reference's container-name scan picks the
               same token), struct/enum ('class'), trait ('interface').

Signatures follow reference _build_signature: python = text through the
def/class colon (multiline signatures included); brace languages = text
up to the opening '{' (first line when there is no body); 200-char cap.

extract_symbol_metadata(text, language) returns the FIRST symbol in
source order (or None fields) — the reference returns symbols[0] per
chunk. extract_symbols returns the full ordered list.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_SIG_CAP = 200  # reference truncates signatures at 200 chars

# reference LANGUAGE_MAP subset for the supported scanners; typescript
# extends the javascript scanner with interfaces + type aliases
LANGUAGE_MAP = {
    "py": "python",
    "python": "python",
    "js": "javascript",
    "jsx": "javascript",
    "javascript": "javascript",
    "ts": "typescript",
    "tsx": "typescript",
    "typescript": "typescript",
    "go": "go",
    "golang": "go",
    "rs": "rust",
    "rust": "rust",
    "java": "java",
    "c": "c",
    "h": "c",
    "rb": "ruby",
    "ruby": "ruby",
    "sh": "bash",
    "bash": "bash",
    "zsh": "bash",
    "cpp": "cpp",
    "cxx": "cpp",
    "cc": "cpp",
    "hpp": "cpp",
    "php": "php",
    "dockerfile": "dockerfile",
    "hcl": "hcl",
    "tf": "hcl",
    "terraform": "hcl",
    "scala": "scala",
    "sc": "scala",
    "css": "css",
    "scss": "css",
}


@dataclass
class SymbolMetadata:
    symbol_type: str | None
    symbol_name: str | None
    symbol_signature: str | None


def _cap(sig: str) -> str:
    sig = sig.strip()
    return sig[: _SIG_CAP - 3] + "..." if len(sig) > _SIG_CAP else sig


# ---------------------------------------------------------------------------
# code mask: True where text[i] is code (not string literal / comment)
# ---------------------------------------------------------------------------


# rust/scala char literal (also go runes, c/java chars): 'x', '\n',
# '\u{1F600}', 'A' — anything longer is a lifetime / prose
# apostrophe, never a string
_CHAR_LIT = re.compile(r"'(?:\\(?:u\{[0-9a-fA-F]{1,6}\}|u[0-9a-fA-F]{4}|.)|[^\\'\n])'")


def _scan_mask(
    text: str,
    line_comment: str | None,
    hash_comment: bool = False,
    block_comment: bool | None = None,
    squote: str = "string",
    multiline_squote: bool = False,
) -> list[bool]:
    """``squote`` picks how a single quote is read: "string" (a real
    delimiter — js/ts/php/bash/css), "char" (char/rune literal only —
    rust/scala/go/java/c/cpp, where ' is otherwise a lifetime marker or
    prose apostrophe), "none" (never a delimiter — hcl). An unterminated
    '-string is bounded at the NEWLINE and rewound to plain text: one
    apostrophe in prose ("Here's my function:") must not mask the rest
    of a mixed prose+code turn. In bash and php single-quoted strings
    DO legally span lines; ``multiline_squote`` lets the canonical
    assignment shape (opener directly preceded by ``=``, a closing
    quote existing later) scan across newlines so string content never
    emits phantom symbols — prose contractions are never
    ``=``-preceded, so the rewind still protects mixed turns."""
    if block_comment is None:
        block_comment = bool(line_comment)
    n = len(text)
    mask = [True] * n
    i = 0
    while i < n:
        c = text[i]
        if c == "'" and squote != "string":
            if squote == "char":
                m = _CHAR_LIT.match(text, i)
                if m:
                    for k in range(i, m.end()):
                        mask[k] = False
                    i = m.end()
                    continue
            i += 1
            continue
        if c in "'\"`":
            q = c
            # canonical multi-line '-string: VAR='...' (bash/php) — the
            # ``=``-preceded opener with a later closer spans newlines
            span_nl = (
                q == "'"
                and multiline_squote
                and i > 0
                and text[i - 1] == "="
                and text.find("'", i + 1) != -1
            )
            j = i + 1
            closed = False
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text[j] == q:
                    closed = True
                    break
                if q == "'" and text[j] == "\n" and not span_nl:
                    break
                j += 1
            if q == "'" and not closed:
                i += 1  # prose apostrophe, not a string opener
                continue
            stop = j + 1 if closed else n
            for k in range(i, min(stop, n)):
                mask[k] = False
            i = stop
            continue
        if hash_comment and c == "#":
            while i < n and text[i] != "\n":
                mask[i] = False
                i += 1
            continue
        if line_comment and text.startswith(line_comment, i):
            while i < n and text[i] != "\n":
                mask[i] = False
                i += 1
            continue
        if block_comment and text.startswith("/*", i):
            end = text.find("*/", i + 2)
            end = n if end == -1 else end + 2
            for j in range(i, end):
                mask[j] = False
            i = end
            continue
        i += 1
    return mask


def _brace_depth(text: str, mask: list[bool]) -> list[int]:
    """depth[i] = number of unclosed masked '{' strictly before i's
    enclosing context (the '{' itself reads at its outer depth)."""
    depth = [0] * (len(text) + 1)
    d = 0
    for i, c in enumerate(text):
        depth[i] = d
        if mask[i]:
            if c == "{":
                d += 1
            elif c == "}":
                d = max(0, d - 1)
    depth[len(text)] = d
    return depth


def _sig_to_brace(text: str, mask: list[bool], start: int) -> str:
    """Brace-language signature: text from start up to the first masked
    '{' (first line when no body follows)."""
    for i in range(start, len(text)):
        if mask[i] and text[i] == "{":
            return _cap(text[start:i])
    nl = text.find("\n", start)
    return _cap(text[start:] if nl == -1 else text[start:nl])


def _body_end(text: str, mask: list[bool], depth: list[int], open_i: int) -> int:
    """Index of the '}' closing the body whose '{' sits at open_i (end
    of text when unterminated). A closing '}' reads at the INNER depth
    (depth[] is the state before the char), so the match is at
    depth[open_i] + 1."""
    d = depth[open_i] + 1
    for j in range(open_i + 1, len(text)):
        if mask[j] and text[j] == "}" and depth[j] == d:
            return j
    return len(text)


_ID = r"[A-Za-z_][A-Za-z0-9_]*"


# ---------------------------------------------------------------------------
# python
# ---------------------------------------------------------------------------

_PY_DEF = re.compile(r"^([ \t]*)(async[ \t]+)?def[ \t]+(" + _ID + r")[ \t]*\(", re.M)
_PY_CLASS = re.compile(r"^([ \t]*)class[ \t]+(" + _ID + r")[ \t]*[:(\n]", re.M)


def _py_sig_end(text: str, start: int) -> int:
    """Index just past the ':' ending a def/class header starting at
    ``start`` (parens balanced across lines, ':' at paren depth 0)."""
    d = 0
    i = start
    n = len(text)
    while i < n:
        c = text[i]
        if c in "([{":
            d += 1
        elif c in ")]}":
            d -= 1
        elif c == ":" and d <= 0:
            return i + 1
        elif c in "'\"":
            q = c
            i += 1
            while i < n and text[i] != q:
                i += 2 if text[i] == "\\" else 1
        elif c == "#":
            while i < n and text[i] != "\n":
                i += 1
            continue
        i += 1
    return n


def _py_mask(text: str) -> list[bool]:
    """Python code mask: hash comments, single/double one-line strings
    (a quote unterminated at the newline is rewound to plain text —
    python strings cannot span lines, and prose apostrophes must not
    mask what follows), and triple-quoted strings (which CAN span
    lines; unterminated masks to end — error recovery matching
    tree-sitter's string node). Prefixes (f/r/b) need no handling: the
    quote chars themselves drive the scan, and a backslash prevents
    the next quote from closing even in raw strings (CPython
    tokenizer behavior)."""
    n = len(text)
    mask = [True] * n
    i = 0
    while i < n:
        c = text[i]
        if c == "#":
            while i < n and text[i] != "\n":
                mask[i] = False
                i += 1
            continue
        if c in "'\"":
            if text.startswith(c * 3, i):
                q = c * 3
                j = i + 3
                stop = n
                while j < n:
                    if text[j] == "\\":
                        j += 2
                        continue
                    if text.startswith(q, j):
                        stop = j + 3
                        break
                    j += 1
                for k in range(i, min(stop, n)):
                    mask[k] = False
                i = stop
                continue
            j = i + 1
            closed = False
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text[j] == c:
                    closed = True
                    break
                if text[j] == "\n":
                    break
                j += 1
            if not closed:
                i += 1  # prose apostrophe / stray quote
                continue
            for k in range(i, min(j + 1, n)):
                mask[k] = False
            i = j + 1
            continue
        i += 1
    return mask


def _extract_python(text: str) -> list[dict]:
    mask = _py_mask(text)
    hits: list[tuple[int, int, str, str, str]] = []  # (pos, indent, kind, name, sig)
    for m in _PY_CLASS.finditer(text):
        start = m.start() + len(m.group(1))
        if not mask[start]:  # class keyword inside a string/comment
            continue
        sig = text[start : _py_sig_end(text, start)]
        hits.append((start, len(m.group(1).expandtabs()), "class", m.group(2), sig))
    for m in _PY_DEF.finditer(text):
        start = m.start() + len(m.group(1))
        if not mask[start]:  # def keyword inside a string/comment
            continue
        sig = text[start : _py_sig_end(text, start)]
        hits.append((start, len(m.group(1).expandtabs()), "function", m.group(3), sig))
    hits.sort()
    out: list[dict] = []
    stack: list[tuple[int, str, str]] = []  # (indent, kind, name)
    for pos, indent, kind, name, sig in hits:
        while stack and stack[-1][0] >= indent:
            stack.pop()
        classes = [n for _i, k, n in stack if k == "class"]
        qual = ".".join(classes + [name]) if classes else name
        out.append(
            {
                "symbol_type": kind,
                "symbol_name": qual,
                "symbol_signature": _cap(sig),
                "_pos": pos,
            }
        )
        stack.append((indent, kind, name))
    return out


# ---------------------------------------------------------------------------
# javascript / typescript
# ---------------------------------------------------------------------------

_JS_FUNC = re.compile(r"\b((?:async[ \t]+)?function[ \t*]+(" + _ID + r")[ \t]*\()")
_JS_CLASS = re.compile(r"\bclass[ \t]+(" + _ID + r")")
_JS_ARROW = re.compile(
    r"\b((?:const|let)[ \t]+(" + _ID + r")[ \t]*=[ \t]*"
    r"(?:async[ \t]*)?(?:\([^()]*\)|" + _ID + r")[ \t]*=>)"
)
_JS_METHOD = re.compile(
    r"(?:^|[{};\n])[ \t]*((?:static[ \t]+)?(?:async[ \t]+)?(?:get[ \t]+|set[ \t]+)?"
    r"(" + _ID + r")[ \t]*\()"
)
_JS_KEYWORDS = {"if", "for", "while", "switch", "catch", "return", "function", "new", "typeof", "await", "constructor"}


def _extract_javascript(
    text: str, mask: list[bool] | None = None, depth: list[int] | None = None
) -> list[dict]:
    mask = _scan_mask(text, "//") if mask is None else mask
    depth = _brace_depth(text, mask) if depth is None else depth
    out: list[dict] = []
    classes: list[tuple[int, int, int, str]] = []  # (body_start, body_end, body_depth, name)
    for m in _JS_CLASS.finditer(text):
        if not mask[m.start()]:
            continue
        name = m.group(1)
        out.append(
            {
                "symbol_type": "class",
                "symbol_name": name,
                "symbol_signature": _sig_to_brace(text, mask, m.start()),
                "_pos": m.start(),
            }
        )
        for i in range(m.end(), len(text)):
            if mask[i] and text[i] == "{":
                classes.append((i, _body_end(text, mask, depth, i), depth[i] + 1, name))
                break
    for m in _JS_FUNC.finditer(text):
        if not mask[m.start(1)]:
            continue
        out.append(
            {
                "symbol_type": "function",
                "symbol_name": m.group(2),
                "symbol_signature": _sig_to_brace(text, mask, m.start(1)),
                "_pos": m.start(1),
            }
        )
    for m in _JS_ARROW.finditer(text):
        if not mask[m.start(1)]:
            continue
        out.append(
            {
                "symbol_type": "function",
                "symbol_name": m.group(2),
                "symbol_signature": _sig_to_brace(text, mask, m.start(1)),
                "_pos": m.start(1),
            }
        )
    for m in _JS_METHOD.finditer(text):
        p = m.start(1)
        name = m.group(2)
        if not mask[p] or name in _JS_KEYWORDS:
            continue
        owner = None
        for body_start, body_end, body_depth, cname in classes:
            # the match must sit INSIDE the class body — a later brace
            # block at the same depth (object literal, if-block) is not
            # a method of an already-closed class
            if body_start < p < body_end and depth[p] == body_depth:
                owner = cname
        if owner is None:
            continue
        out.append(
            {
                "symbol_type": "method",
                "symbol_name": f"{owner}.{name}",
                "symbol_signature": _sig_to_brace(text, mask, p),
                "_pos": p,
            }
        )
    out.sort(key=lambda s: s["_pos"])
    return out


# ---------------------------------------------------------------------------
# go
# ---------------------------------------------------------------------------

_GO_METHOD = re.compile(
    r"\bfunc[ \t]+\([ \t]*" + _ID + r"[ \t]+\*?[ \t]*(" + _ID + r")[ \t]*\)"
    r"[ \t]+(" + _ID + r")[ \t]*\("
)
_GO_FUNC = re.compile(r"\bfunc[ \t]+(" + _ID + r")[ \t]*\(")
_GO_TYPE = re.compile(r"\btype[ \t]+(" + _ID + r")[ \t]+(struct|interface)\b")


def _extract_go(text: str) -> list[dict]:
    mask = _scan_mask(text, "//", squote="char")
    out: list[dict] = []
    for m in _GO_METHOD.finditer(text):
        if mask[m.start()]:
            out.append(
                {
                    "symbol_type": "method",
                    "symbol_name": f"{m.group(1)}.{m.group(2)}",
                    "symbol_signature": _sig_to_brace(text, mask, m.start()),
                    "_pos": m.start(),
                }
            )
    for m in _GO_FUNC.finditer(text):
        if mask[m.start()]:
            out.append(
                {
                    "symbol_type": "function",
                    "symbol_name": m.group(1),
                    "symbol_signature": _sig_to_brace(text, mask, m.start()),
                    "_pos": m.start(),
                }
            )
    for m in _GO_TYPE.finditer(text):
        if mask[m.start()]:
            out.append(
                {
                    "symbol_type": "class" if m.group(2) == "struct" else "interface",
                    "symbol_name": m.group(1),
                    "symbol_signature": _sig_to_brace(text, mask, m.start()),
                    "_pos": m.start(),
                }
            )
    out.sort(key=lambda s: s["_pos"])
    return out


# ---------------------------------------------------------------------------
# rust
# ---------------------------------------------------------------------------

_RS_VIS = r"(?:pub(?:\([a-z ]*\))?[ \t]+)?"
_RS_FN = re.compile(
    r"\b(" + _RS_VIS + r"(?:async[ \t]+)?(?:unsafe[ \t]+)?(?:const[ \t]+)?"
    r"fn[ \t]+(" + _ID + r"))[ \t]*[(<]"
)
_RS_IMPL = re.compile(r"\bimpl\b(?:[ \t]*<[^>]*>)?[ \t]+(" + _ID + r")")
_RS_STRUCT = re.compile(r"\b(" + _RS_VIS + r"struct[ \t]+(" + _ID + r"))")
_RS_ENUM = re.compile(r"\b(" + _RS_VIS + r"enum[ \t]+(" + _ID + r"))")
_RS_TRAIT = re.compile(r"\b(" + _RS_VIS + r"trait[ \t]+(" + _ID + r"))")


def _extract_rust(text: str) -> list[dict]:
    mask = _scan_mask(text, "//", squote="char")
    depth = _brace_depth(text, mask)
    out: list[dict] = []
    impls: list[tuple[int, int, int, str]] = []  # (body_start, body_end, body_depth, name)
    for m in _RS_IMPL.finditer(text):
        if not mask[m.start()]:
            continue
        for i in range(m.end(), len(text)):
            if mask[i] and text[i] == "{":
                impls.append((i, _body_end(text, mask, depth, i), depth[i] + 1, m.group(1)))
                break
    for m in _RS_FN.finditer(text):
        p = m.start(1)
        if not mask[p]:
            continue
        owner = None
        for body_start, body_end, body_depth, iname in impls:
            if body_start < p < body_end and depth[p] == body_depth:
                owner = iname
        if owner is not None:
            out.append(
                {
                    "symbol_type": "method",
                    "symbol_name": f"{owner}.{m.group(2)}",
                    "symbol_signature": _sig_to_brace(text, mask, p),
                    "_pos": p,
                }
            )
        elif depth[p] == 0:
            # top-level only (source_file children in the .scm); fn
            # inside trait bodies / nested fns are not captured
            out.append(
                {
                    "symbol_type": "function",
                    "symbol_name": m.group(2),
                    "symbol_signature": _sig_to_brace(text, mask, p),
                    "_pos": p,
                }
            )
    for rx, stype in ((_RS_STRUCT, "class"), (_RS_ENUM, "class"), (_RS_TRAIT, "interface")):
        for m in rx.finditer(text):
            if mask[m.start(1)]:
                out.append(
                    {
                        "symbol_type": stype,
                        "symbol_name": m.group(2),
                        "symbol_signature": _sig_to_brace(text, mask, m.start(1)),
                        "_pos": m.start(1),
                    }
                )
    out.sort(key=lambda s: s["_pos"])
    return out


# ---------------------------------------------------------------------------
# java
# ---------------------------------------------------------------------------

_JAVA_TYPE = re.compile(r"\b(class|interface|enum)[ \t]+(" + _ID + r")")
_JAVA_MEMBER = re.compile(r"\b(" + _ID + r")[ \t]*\(")
_JAVA_KEYWORDS = {"if", "for", "while", "switch", "catch", "return", "new", "super", "this", "throw", "synchronized"}


def _extract_java(text: str) -> list[dict]:
    mask = _scan_mask(text, "//", squote="char")
    depth = _brace_depth(text, mask)
    out: list[dict] = []
    bodies: list[tuple[int, int, str]] = []  # (body_start, body_depth, name)
    for m in _JAVA_TYPE.finditer(text):
        if not mask[m.start()]:
            continue
        kw, name = m.group(1), m.group(2)
        stype = {"class": "class", "interface": "interface", "enum": "class"}[kw]
        out.append(
            {
                "symbol_type": stype,
                "symbol_name": name,
                "symbol_signature": _sig_to_brace(text, mask, m.start()),
                "_pos": m.start(),
            }
        )
        for i in range(m.end(), len(text)):
            if mask[i] and text[i] == "{":
                bodies.append((i, _body_end(text, mask, depth, i), depth[i] + 1, name))
                break
    for m in _JAVA_MEMBER.finditer(text):
        p = m.start(1)
        name = m.group(1)
        if not mask[p] or name in _JAVA_KEYWORDS:
            continue
        owner = None
        for body_start, body_end, body_depth, cname in bodies:
            if body_start < p < body_end and depth[p] == body_depth:
                owner = cname
        if owner is None:
            continue
        # a METHOD's parameter list is followed by a body '{' (abstract
        # declarations end in ';'); find the matching close paren first
        d = 0
        j = p
        while j < len(text):
            if mask[j]:
                if text[j] == "(":
                    d += 1
                elif text[j] == ")":
                    d -= 1
                    if d == 0:
                        break
            j += 1
        k = j + 1
        is_method = False
        while k < len(text):
            if mask[k] and text[k] == "{":
                is_method = True
                break
            if mask[k] and text[k] == ";":
                break
            k += 1
        if not is_method:
            continue
        # require a preceding token (modifier / return type) or the
        # constructor form (name == enclosing type) so calls don't match
        before = text[:p].rstrip()
        if not (before.endswith(tuple("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_>]")) or name == owner):
            continue
        # signature from the line start of the declaration
        ls = text.rfind("\n", 0, p) + 1
        out.append(
            {
                "symbol_type": "method",
                "symbol_name": f"{owner}.{name}",
                "symbol_signature": _sig_to_brace(text, mask, ls),
                "_pos": p,
            }
        )
    out.sort(key=lambda s: s["_pos"])
    return out


# ---------------------------------------------------------------------------
# c
# ---------------------------------------------------------------------------

_C_FUNC = re.compile(r"\b(" + _ID + r")[ \t]*\(")
_C_STRUCT = re.compile(r"\bstruct[ \t]+(" + _ID + r")[ \t\r\n]*\{")
_C_ENUM = re.compile(r"\benum[ \t]+(?:(?:class|struct)[ \t]+)?(" + _ID + r")")
_C_TYPEDEF = re.compile(r"\btypedef\b[^;{}]*?(" + _ID + r")[ \t]*;")
_C_KEYWORDS = {"if", "for", "while", "switch", "return", "sizeof", "defined"}


def _extract_c(text: str, mask: list[bool] | None = None, depth: list[int] | None = None) -> list[dict]:
    mask = _scan_mask(text, "//", squote="char") if mask is None else mask
    depth = _brace_depth(text, mask) if depth is None else depth
    out: list[dict] = []
    for m in _C_FUNC.finditer(text):
        p = m.start(1)
        name = m.group(1)
        if not mask[p] or name in _C_KEYWORDS or depth[p] != 0:
            continue
        before = text[:p].rstrip()
        # function DEFINITION: a return type token (word or '*') precedes
        # and a body '{' follows the parameter list (declarations end ';')
        if not before or not (before[-1].isalnum() or before[-1] in "_*"):
            continue
        if before.endswith(("struct", "enum", "union", "typedef", "return")):
            continue
        d = 0
        j = p
        while j < len(text):
            if mask[j]:
                if text[j] == "(":
                    d += 1
                elif text[j] == ")":
                    d -= 1
                    if d == 0:
                        break
            j += 1
        k = j + 1
        has_body = False
        while k < len(text):
            if mask[k] and text[k] == "{":
                has_body = True
                break
            if mask[k] and text[k] == ";":
                break
            k += 1
        if not has_body:
            continue
        ls = text.rfind("\n", 0, p) + 1
        out.append(
            {
                "symbol_type": "function",
                "symbol_name": name,
                "symbol_signature": _sig_to_brace(text, mask, ls),
                "_pos": p,
            }
        )
    for m in _C_STRUCT.finditer(text):
        if mask[m.start()]:
            out.append(
                {
                    "symbol_type": "class",  # struct -> class (reference map)
                    "symbol_name": m.group(1),
                    "symbol_signature": _sig_to_brace(text, mask, m.start()),
                    "_pos": m.start(),
                }
            )
    for m in _C_ENUM.finditer(text):
        if mask[m.start()] and not text[: m.start()].rstrip().endswith("typedef"):
            out.append(
                {
                    "symbol_type": "class",  # enum -> class
                    "symbol_name": m.group(1),
                    "symbol_signature": _sig_to_brace(text, mask, m.start()),
                    "_pos": m.start(),
                }
            )
    for m in _C_TYPEDEF.finditer(text):
        if mask[m.start()]:
            out.append(
                {
                    "symbol_type": "interface",  # type -> interface
                    "symbol_name": m.group(1),
                    # reference: type_definition node text INCLUDES the ';'
                    "symbol_signature": _cap(text[m.start() : m.end()]),
                    "_pos": m.start(),
                }
            )
    out.sort(key=lambda s: s["_pos"])
    return out


# ---------------------------------------------------------------------------
# ruby (indentation-scoped like python; end-delimited bodies)
# ---------------------------------------------------------------------------

_RB_CLASS = re.compile(r"^([ \t]*)(class|module)[ \t]+([A-Z][A-Za-z0-9_]*)", re.M)
_RB_DEF = re.compile(r"^([ \t]*)def[ \t]+(self\.)?(" + _ID + r"[?!=]?)", re.M)


def _extract_ruby(text: str) -> list[dict]:
    hits: list[tuple[int, int, str, str]] = []  # (pos, indent, kind, name)
    for m in _RB_CLASS.finditer(text):
        hits.append((m.start() + len(m.group(1)), len(m.group(1).expandtabs()), m.group(2), m.group(3)))
    for m in _RB_DEF.finditer(text):
        hits.append((m.start() + len(m.group(1)), len(m.group(1).expandtabs()), "def", m.group(3)))
    hits.sort()
    out: list[dict] = []
    stack: list[tuple[int, str, str]] = []
    for pos, indent, kind, name in hits:
        while stack and stack[-1][0] >= indent:
            stack.pop()
        nl = text.find("\n", pos)
        sig = _cap(text[pos:] if nl == -1 else text[pos:nl])
        if kind in ("class", "module"):
            out.append(
                {
                    # module -> class per the reference type map
                    "symbol_type": "class",
                    "symbol_name": name,
                    "symbol_signature": sig,
                    "_pos": pos,
                }
            )
        else:
            owners = [n for _i, k, n in stack if k in ("class", "module")]
            qual = ".".join(owners + [name]) if owners else name
            out.append(
                {
                    "symbol_type": "method",
                    "symbol_name": qual,
                    "symbol_signature": sig,
                    "_pos": pos,
                }
            )
        stack.append((indent, kind, name))
    return out


# ---------------------------------------------------------------------------
# bash (POSIX name(), ksh function name, hybrid function name())
# ---------------------------------------------------------------------------

_SH_NAME = r"[A-Za-z_][A-Za-z0-9_-]*"
_SH_POSIX = re.compile(
    r"(?:^|[\r\n;])[ \t]*(" + _SH_NAME + r")[ \t]*\(\)[ \t\r\n]*\{"
)
_SH_KSH = re.compile(
    r"\bfunction[ \t]+(" + _SH_NAME + r")[ \t]*(?:\(\))?[ \t\r\n]*\{"
)


def _extract_bash(text: str) -> list[dict]:
    mask = _scan_mask(text, None, hash_comment=True, multiline_squote=True)
    out: list[dict] = []
    seen_pos: set[int] = set()
    for rx in (_SH_KSH, _SH_POSIX):
        for m in rx.finditer(text):
            p = m.start(1)
            if not mask[p] or p in seen_pos:
                continue
            seen_pos.add(p)
            start = m.start() if rx is _SH_KSH else p
            brace = text.index("{", p)
            out.append(
                {
                    "symbol_type": "function",
                    "symbol_name": m.group(1),
                    "symbol_signature": _cap(text[start:brace]),
                    "_pos": p,
                }
            )
    out.sort(key=lambda s: s["_pos"])
    return out


# ---------------------------------------------------------------------------
# c++ (reuses the C function machinery; adds classes, namespaces,
# Class::method qualified definitions, template declarations)
# ---------------------------------------------------------------------------

_CPP_CLASS = re.compile(r"\bclass[ \t]+(" + _ID + r")")
# a namespace DEFINITION has a braced body ('using namespace std;' and
# other references never do)
_CPP_NS = re.compile(r"\bnamespace[ \t]+(" + _ID + r")[ \t\r\n]*\{")
_CPP_METHOD = re.compile(r"\b(" + _ID + r")::(" + _ID + r")[ \t]*\(")


def _extract_cpp(text: str) -> list[dict]:
    # ONE mask/depth pass shared with the delegated C scanner (these
    # run per transcript turn inside map_batches)
    mask = _scan_mask(text, "//", squote="char")
    depth = _brace_depth(text, mask)
    out = _extract_c(text, mask, depth)  # functions / structs / enums / typedefs
    for m in _CPP_CLASS.finditer(text):
        if mask[m.start()]:
            out.append(
                {
                    "symbol_type": "class",
                    "symbol_name": m.group(1),
                    "symbol_signature": _sig_to_brace(text, mask, m.start()),
                    "_pos": m.start(),
                }
            )
    for m in _CPP_NS.finditer(text):
        if mask[m.start()]:
            out.append(
                {
                    "symbol_type": "class",  # namespace -> class (type map)
                    "symbol_name": m.group(1),
                    "symbol_signature": _sig_to_brace(text, mask, m.start()),
                    "_pos": m.start(),
                }
            )
    for m in _CPP_METHOD.finditer(text):
        p = m.start()
        if not mask[p]:
            continue
        # definitions start a statement: a '(' or '=' earlier on the
        # line means this is a CALL position (if (std::isnan(x)) {,
        # auto t = std::thread([]{...})), not a method definition
        ls_ = text.rfind("\n", 0, p) + 1
        if "(" in text[ls_:p] or "=" in text[ls_:p]:
            continue
        # out-of-class definition Type::name(...) { ... } — the captured
        # NAME is the bare method name (reference: the name identifier of
        # the qualified_identifier; no class container at file scope)
        k = text.find("{", m.end())
        semi = text.find(";", m.end())
        if k == -1 or (semi != -1 and semi < k):
            continue
        ls = text.rfind("\n", 0, p) + 1
        out.append(
            {
                "symbol_type": "method",
                "symbol_name": m.group(2),
                "symbol_signature": _sig_to_brace(text, mask, ls),
                "_pos": p,
            }
        )
    out.sort(key=lambda s: s["_pos"])
    return out


# ---------------------------------------------------------------------------
# php
# ---------------------------------------------------------------------------

_PHP_TYPE = re.compile(r"\b(class|interface|trait)[ \t]+(" + _ID + r")")
_PHP_FUNC = re.compile(r"\bfunction[ \t]+(" + _ID + r")[ \t]*\(")


def _extract_php(text: str) -> list[dict]:
    mask = _scan_mask(text, "//", hash_comment=True, multiline_squote=True)
    depth = _brace_depth(text, mask)
    out: list[dict] = []
    bodies: list[tuple[int, int, str]] = []
    for m in _PHP_TYPE.finditer(text):
        if not mask[m.start()]:
            continue
        kw, name = m.group(1), m.group(2)
        stype = {"class": "class", "interface": "interface", "trait": "interface"}[kw]
        out.append(
            {
                "symbol_type": stype,
                "symbol_name": name,
                "symbol_signature": _sig_to_brace(text, mask, m.start()),
                "_pos": m.start(),
            }
        )
        for i in range(m.end(), len(text)):
            if mask[i] and text[i] == "{":
                bodies.append((i, _body_end(text, mask, depth, i), depth[i] + 1, name))
                break
    for m in _PHP_FUNC.finditer(text):
        p = m.start()
        if not mask[p]:
            continue
        owner = None
        for body_start, body_end, body_depth, cname in bodies:
            if body_start < p < body_end and depth[p] == body_depth:
                owner = cname
        if owner is not None:
            # strip visibility modifiers out of the signature start
            ls = text.rfind("\n", 0, p) + 1
            out.append(
                {
                    "symbol_type": "method",
                    "symbol_name": f"{owner}.{m.group(1)}",
                    "symbol_signature": _sig_to_brace(text, mask, ls),
                    "_pos": p,
                }
            )
        else:
            out.append(
                {
                    "symbol_type": "function",
                    "symbol_name": m.group(1),
                    "symbol_signature": _sig_to_brace(text, mask, p),
                    "_pos": p,
                }
            )
    out.sort(key=lambda s: s["_pos"])
    return out


# ---------------------------------------------------------------------------
# dockerfile (build stages FROM ... AS, build args)
# ---------------------------------------------------------------------------

_DOCKER_FROM = re.compile(
    r"^[ \t]*from[ \t]+\S+(?:[ \t]+\S+)*?[ \t]+as[ \t]+(" + _ID + r")",
    re.M | re.I,
)
_DOCKER_ARG = re.compile(r"^[ \t]*arg[ \t]+([A-Za-z_][A-Za-z0-9_]*)", re.M | re.I)


def _extract_dockerfile(text: str) -> list[dict]:
    out: list[dict] = []
    for m in _DOCKER_FROM.finditer(text):
        nl = text.find("\n", m.start())
        out.append(
            {
                "symbol_type": "class",  # build stage -> class
                "symbol_name": m.group(1),
                "symbol_signature": _cap(text[m.start() : nl if nl != -1 else len(text)]),
                "_pos": m.start(1),
            }
        )
    for m in _DOCKER_ARG.finditer(text):
        nl = text.find("\n", m.start())
        out.append(
            {
                "symbol_type": "function",  # 'variable' -> default map
                "symbol_name": m.group(1),
                "symbol_signature": _cap(text[m.start() : nl if nl != -1 else len(text)]),
                "_pos": m.start(1),
            }
        )
    out.sort(key=lambda s: s["_pos"])
    return out


# ---------------------------------------------------------------------------
# hcl / terraform (top-level blocks; name = labels joined '.', falling
# back to the block identifier — reference _build_qualified_name labels)
# ---------------------------------------------------------------------------

_HCL_BLOCK = re.compile(
    r"(?:^|[\r\n])[ \t]*(" + _ID + r")"
    r"(?:[ \t]+\"([^\"\n]*)\")?(?:[ \t]+\"([^\"\n]*)\")?[ \t]*\{"
)


def _extract_hcl(text: str) -> list[dict]:
    mask = _scan_mask(text, None, hash_comment=True, squote="none")
    depth = _brace_depth(text, mask)
    out: list[dict] = []
    for m in _HCL_BLOCK.finditer(text):
        p = m.start(1)
        # TOP-LEVEL blocks only (the .scm shape): ingress/lifecycle/...
        # blocks nested inside a resource are attributes, not symbols
        if not mask[p] or depth[p] != 0:
            continue
        labels = [g for g in (m.group(2), m.group(3)) if g is not None]
        out.append(
            {
                "symbol_type": "class",  # block -> class (type map)
                "symbol_name": ".".join(labels) if labels else m.group(1),
                "symbol_signature": _sig_to_brace(text, mask, p),
                "_pos": p,
            }
        )
    out.sort(key=lambda s: s["_pos"])
    return out


# ---------------------------------------------------------------------------
# scala
# ---------------------------------------------------------------------------

_SCALA_MODS = r"(?:(?:case|abstract|sealed|final|implicit|private|protected)[ \t]+)*"
_SCALA_TYPE = re.compile(r"\b" + _SCALA_MODS + r"(class|trait|object)[ \t]+(" + _ID + r")")
_SCALA_DEF = re.compile(r"\bdef[ \t]+(" + _ID + r")")
_SCALA_ALIAS = re.compile(r"\btype[ \t]+(" + _ID + r")[ \t]*=")


def _extract_scala(text: str) -> list[dict]:
    mask = _scan_mask(text, "//", squote="char")
    depth = _brace_depth(text, mask)
    out: list[dict] = []
    bodies: list[tuple[int, int, str]] = []
    for m in _SCALA_TYPE.finditer(text):
        if not mask[m.start()]:
            continue
        kw, name = m.group(1), m.group(2)
        out.append(
            {
                "symbol_type": "interface" if kw == "trait" else "class",
                "symbol_name": name,
                "symbol_signature": _sig_to_brace(text, mask, m.start()),
                "_pos": m.start(),
            }
        )
        for i in range(m.end(), len(text)):
            if not mask[i]:
                continue
            if text[i] == "{":
                bodies.append((i, _body_end(text, mask, depth, i), depth[i] + 1, name))
                break
            if text[i] == "\n":
                # header continuation: a following line starting with
                # extends / with / '{' / ')' is still the same
                # definition (multiline extends clause); anything else
                # ends a braceless definition (case object / case class)
                rest = text[i + 1 :].lstrip(" \t")
                if rest.startswith(("extends", "with", "{", ")")):
                    continue
                break
    for m in _SCALA_DEF.finditer(text):
        p = m.start()
        if not mask[p]:
            continue
        owner = None
        for body_start, body_end, body_depth, cname in bodies:
            if body_start < p < body_end and depth[p] == body_depth:
                owner = cname
        if owner is not None:
            out.append(
                {
                    "symbol_type": "method",
                    "symbol_name": f"{owner}.{m.group(1)}",
                    "symbol_signature": _sig_to_brace(text, mask, p),
                    "_pos": p,
                }
            )
        elif depth[p] == 0:
            # top-level function (compilation_unit child in the .scm);
            # defs nested inside method bodies are not captured
            out.append(
                {
                    "symbol_type": "function",
                    "symbol_name": m.group(1),
                    "symbol_signature": _sig_to_brace(text, mask, p),
                    "_pos": p,
                }
            )
    for m in _SCALA_ALIAS.finditer(text):
        if mask[m.start()]:
            out.append(
                {
                    "symbol_type": "interface",  # type -> interface
                    "symbol_name": m.group(1),
                    "symbol_signature": _sig_to_brace(text, mask, m.start()),
                    "_pos": m.start(),
                }
            )
    out.sort(key=lambda s: s["_pos"])
    return out


# ---------------------------------------------------------------------------
# typescript = javascript + interface declarations + type aliases
# ---------------------------------------------------------------------------

_TS_IFACE = re.compile(r"\binterface[ \t]+(" + _ID + r")")
_TS_ALIAS = re.compile(r"\btype[ \t]+(" + _ID + r")[ \t]*=")


def _extract_typescript(text: str) -> list[dict]:
    mask = _scan_mask(text, "//")
    out = _extract_javascript(text, mask, _brace_depth(text, mask))
    for m in _TS_IFACE.finditer(text):
        if mask[m.start()]:
            out.append(
                {
                    "symbol_type": "interface",
                    "symbol_name": m.group(1),
                    "symbol_signature": _sig_to_brace(text, mask, m.start()),
                    "_pos": m.start(),
                }
            )
    for m in _TS_ALIAS.finditer(text):
        if mask[m.start()]:
            # object aliases cut at '{'; simple aliases keep the whole
            # statement (node text incl. the ';' — reference golden)
            out.append(
                {
                    "symbol_type": "interface",  # type -> interface
                    "symbol_name": m.group(1),
                    "symbol_signature": _sig_to_brace(text, mask, m.start()),
                    "_pos": m.start(),
                }
            )
    out.sort(key=lambda s: s["_pos"])
    return out


# ---------------------------------------------------------------------------
# css (rule-set selectors, @keyframes, @media)
# ---------------------------------------------------------------------------

_CSS_NAME = r"[A-Za-z_-][A-Za-z0-9_-]*"
# explicit whitespace class (repo convention: RE2 \s = [ \t\n\r\f], no
# \v — keeps every scanner aligned with the RE2/DuckDB-facing kernels)
_CSS_CLASS = re.compile(r"(?:^|[ \t\n\r\f,{}/])\.(" + _CSS_NAME + r")[^{;]*\{")
_CSS_ID = re.compile(r"(?:^|[ \t\n\r\f,{}/])#(" + _CSS_NAME + r")[^{;]*\{")
_CSS_TAG = re.compile(r"(?:^|[\n,}])[ \t]*(" + _CSS_NAME + r")[ \t]*\{")
_CSS_KEYFRAMES = re.compile(r"@keyframes[ \t]+(" + _CSS_NAME + r")")
_CSS_MEDIA = re.compile(r"@media[ \t]*(\([^)\n]*\))")


def _extract_css(text: str) -> list[dict]:
    mask = _scan_mask(text, None, block_comment=True)
    out: list[dict] = []
    seen: set[int] = set()
    for rx, stype, pos_grp in (
        (_CSS_KEYFRAMES, "function", 0),
        (_CSS_MEDIA, "class", 0),
        (_CSS_CLASS, "class", 1),
        (_CSS_ID, "class", 1),
        (_CSS_TAG, "class", 1),
    ):
        for m in rx.finditer(text):
            p = m.start(pos_grp) if pos_grp else m.start()
            if not mask[min(p, len(text) - 1)] or p in seen:
                continue
            seen.add(p)
            ls = text.rfind("\n", 0, p) + 1
            out.append(
                {
                    "symbol_type": stype,
                    "symbol_name": m.group(1),
                    "symbol_signature": _sig_to_brace(text, mask, ls if pos_grp else p),
                    "_pos": p,
                }
            )
    out.sort(key=lambda s: s["_pos"])
    return out


_SCANNERS = {
    "python": _extract_python,
    "javascript": _extract_javascript,
    "go": _extract_go,
    "rust": _extract_rust,
    "java": _extract_java,
    "c": _extract_c,
    "ruby": _extract_ruby,
    "bash": _extract_bash,
    "cpp": _extract_cpp,
    "php": _extract_php,
    "dockerfile": _extract_dockerfile,
    "typescript": _extract_typescript,
    "css": _extract_css,
    "hcl": _extract_hcl,
    "scala": _extract_scala,
}


def extract_symbols(text: str, language: str) -> list[dict]:
    """All symbols in source order: dicts with symbol_type, symbol_name,
    symbol_signature (reference _extract_symbols_with_query shape)."""
    lang = LANGUAGE_MAP.get(language)
    if lang is None or not text:
        return []
    try:
        syms = _SCANNERS[lang](text)
    except Exception:
        return []  # reference returns NULL fields on parse failure
    return [{k: v for k, v in s.items() if k != "_pos"} for s in syms]


def extract_symbol_metadata(text: str, language: str) -> SymbolMetadata:
    """First symbol in the chunk (reference extract_symbol_metadata:
    symbols[0]), or None fields for no symbols / unsupported language."""
    syms = extract_symbols(text, language)
    if syms:
        return SymbolMetadata(**syms[0])
    return SymbolMetadata(None, None, None)


# deterministic language hint for free text (transcript turns have no
# file extension): first matching keyword wins — our own addition, the
# reference always knows the language from the indexed file
_LANG_HINTS = (
    (re.compile(r"(?:^|\n)[ \t]*(?:async[ \t]+)?def[ \t]|\bdef[ \t]+[A-Za-z_]\w*\("), "py"),
    (re.compile(r"\bfunc[ \t]+\(|\bfunc[ \t]+[A-Za-z_]\w*\(|\btype[ \t]+\w+[ \t]+(?:struct|interface)\b"), "go"),
    (re.compile(r"\bfn[ \t]+[A-Za-z_]\w*[(<]|\bimpl\b|\btrait[ \t]"), "rs"),
    (re.compile(r"\bfunction[ \t]+[A-Za-z_]|\b(?:const|let)[ \t]+\w+[ \t]*=.*=>|\bclass[ \t]+\w+[ \t]*\{"), "js"),
    (re.compile(r"\bclass[ \t]+\w+[ \t]*[:(]"), "py"),
)


def guess_language(text: str) -> str | None:
    for rx, lang in _LANG_HINTS:
        if rx.search(text):
            return lang
    return None


def symbol_metadata_batch(batch, text_col: str = "text", lang_col: str | None = None):
    """map_batches stage: append symbol_type / symbol_name /
    symbol_signature columns (first symbol per row, reference
    extract_symbol_metadata shape). Stateless, regexes module-compiled
    once per process; language from ``lang_col`` when given else
    guess_language."""
    import pyarrow as pa

    texts = batch[text_col].to_pylist()
    langs = batch[lang_col].to_pylist() if lang_col else [None] * len(texts)
    types: list[str | None] = []
    names: list[str | None] = []
    sigs: list[str | None] = []
    for t, lg in zip(texts, langs):
        t = t or ""
        meta = extract_symbol_metadata(t, lg or guess_language(t) or "")
        types.append(meta.symbol_type)
        names.append(meta.symbol_name)
        sigs.append(meta.symbol_signature)
    return batch.append_column("symbol_type", pa.array(types, pa.string())) \
        .append_column("symbol_name", pa.array(names, pa.string())) \
        .append_column("symbol_signature", pa.array(sigs, pa.string()))
