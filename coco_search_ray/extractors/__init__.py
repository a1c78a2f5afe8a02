"""Extractor registry — duck-typed, autodiscovered mention/relation
families (the reference's handler/extractor registry shape:
handlers/__init__.py:45-224 scans modules at import, validates a
duck-typed protocol, fails fast on conflicts; deps/registry.py ditto).

A family module exposes:
  NAME:  str             unique registry key
  KIND:  "entity" | "literal"
         entity  -> surfaces go through hybrid linking + canonical
                    rewrite and become triple SUBJECTS/OBJECTS
         literal -> surfaces stay verbatim and attach to the turn's
                    FIRST linked entity as (entity, PRED, surface)
  PRED:  str | None      triple predicate for literal families
  QUICK: str             RE2-compatible regex fragment; a row whose text
                         matches NO family's QUICK is dropped by one
                         vectorized Arrow scan before any Python runs
  extract(text) -> list[str]   surfaces in first-occurrence order,
                               deduped keep-first

Adding a family = dropping a module in this package; nothing else to
edit (the extraction stage, linking mask, assembly and oracle iterate
the registry).
"""

from __future__ import annotations

import importlib
import pkgutil
from types import ModuleType

REGISTRY: dict[str, ModuleType] = {}


def _validate(mod: ModuleType) -> None:
    for attr in ("NAME", "KIND", "QUICK", "extract"):
        if not hasattr(mod, attr):
            raise TypeError(f"extractor module {mod.__name__} missing {attr}")
    if mod.KIND not in ("entity", "literal"):
        raise TypeError(f"extractor {mod.NAME}: KIND must be entity|literal")
    if mod.KIND == "literal" and not getattr(mod, "PRED", None):
        raise TypeError(f"literal extractor {mod.NAME} needs PRED")


def _discover() -> None:
    for info in pkgutil.iter_modules(__path__):
        if info.name.startswith("_"):
            continue
        mod = importlib.import_module(f"{__name__}.{info.name}")
        _validate(mod)
        if mod.NAME in REGISTRY:
            raise ValueError(
                f"duplicate extractor NAME {mod.NAME!r}: "
                f"{REGISTRY[mod.NAME].__name__} vs {mod.__name__}"
            )
        REGISTRY[mod.NAME] = mod


_discover()


def entity_families() -> list[ModuleType]:
    """Deterministic order: sorted by NAME."""
    return [m for _n, m in sorted(REGISTRY.items()) if m.KIND == "entity"]


def literal_families() -> list[ModuleType]:
    return [m for _n, m in sorted(REGISTRY.items()) if m.KIND == "literal"]


def combined_quick_pattern() -> str:
    """Union of every family's QUICK fragment (the Arrow prefilter)."""
    return "|".join(f"(?:{m.QUICK})" for _n, m in sorted(REGISTRY.items()))
