"""Qualified family: HCL/Terraform-style block declarations —
``resource "service_gateway" "primary" {`` / ``data "ledger_store"
"snapshot" {`` — composed to the dotted address ``type.name`` the way
Terraform itself addresses blocks.

Reference analog: the HCL handler's block_type/labels hierarchy
(handlers/hcl.py:59-120) and the terraform deps extractor's
resource-address resolution (deps/extractors/terraform.py) — a block
declaration is a STRUCTURED mention whose first label (the type) is the
linkable identity and whose second label is the member under it.

KIND="qualified": the composed ``type.name`` surface rides the same
machinery as ``Class.method`` — linking resolves the TYPE against the
entity catalog (Terraform types are snake_case, i.e. identifier-shaped),
assembly emits ``(type_entity, declares_resource, name)`` and the type
joins the turn's entity graph. Unlinked types drop like unlinked entity
mentions.

All character classes are explicit ASCII so Python re, RE2 (the Arrow
candidate mask) and the DuckDB oracle replay agree byte-for-byte.
"""

from __future__ import annotations

import re

from ..functions.mentions import _is_identifier_mention

NAME = "hcl_blocks"
KIND = "qualified"
PRED = "declares_resource"

_TYPE = r"[A-Za-z_][A-Za-z0-9_]*"
_LABEL = r"[A-Za-z_][A-Za-z0-9_-]*"
# (rule, substring gate): a match always contains its keyword, so
# extract() skips the regex scan on rows whose QUICK hit came from the
# other block kind
_RULES = [
    (re.compile(r"\bresource[ \t]+\"(" + _TYPE + r")\"[ \t]+\"(" + _LABEL + r")\"", re.ASCII), "resource"),
    (re.compile(r"\bdata[ \t]+\"(" + _TYPE + r")\"[ \t]+\"(" + _LABEL + r")\"", re.ASCII), "data"),
]

QUICK = r"(?:resource|data)[ \t]+\""


def maybe(text: str) -> bool:
    return "resource" in text or "data" in text


# type -> passes-shape, process-memoized (types draw from a bounded
# vocabulary; same policy as the qualified_names root cache)
_TYPE_CACHE: dict[str, bool] = {}
_TYPE_CACHE_MAX = 500_000


def _type_ok(t: str) -> bool:
    ok = _TYPE_CACHE.get(t)
    if ok is None:
        ok = _is_identifier_mention(t)
        if len(_TYPE_CACHE) >= _TYPE_CACHE_MAX:
            _TYPE_CACHE.clear()
        _TYPE_CACHE[t] = ok
    return ok


def extract(text: str) -> list[str]:
    """``type.name`` block addresses in first-occurrence order (by match
    start, ties by rule order), deduped keep-first; only
    identifier-shaped types survive (the linkable half)."""
    hits: list[tuple[int, int, str]] = []
    for ri, (rx, gate) in enumerate(_RULES):
        if gate not in text:
            continue
        for m in rx.finditer(text):
            if _type_ok(m.group(1)):
                hits.append((m.start(), ri, f"{m.group(1)}.{m.group(2)}"))
    hits.sort()
    out: list[str] = []
    seen: set[str] = set()
    for _pos, _ri, s in hits:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out
