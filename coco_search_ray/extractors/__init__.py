"""Extractor registry — duck-typed, autodiscovered mention/relation
families (the reference's handler/extractor registry shape:
handlers/__init__.py:45-224 scans modules at import, validates a
duck-typed protocol, fails fast on conflicts; deps/registry.py ditto).

A family module exposes:
  NAME:  str             unique registry key
  KIND:  "entity" | "literal" | "qualified"
         entity    -> surfaces go through hybrid linking + canonical
                      rewrite and become triple SUBJECTS/OBJECTS
         literal   -> surfaces stay verbatim and attach to the turn's
                      FIRST linked entity as (entity, PRED, surface)
         qualified -> dotted surfaces (root.member.path); the ROOT
                      segment links like an entity mention and joins
                      the turn's entity graph, and each surface also
                      emits the hierarchy triple (root_entity, PRED,
                      member_path) — the reference's Class.method
                      qualified-symbol shape (indexer/symbols.py)
  PRED:  str | None      triple predicate for literal/qualified families
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
import re
from types import ModuleType

REGISTRY: dict[str, ModuleType] = {}
REGISTRY_VERSION = 0  # bumped on every registration; snapshot holders
# (the extraction stage) compare it to refresh cheaply per batch


def _validate(mod: ModuleType) -> None:
    for attr in ("NAME", "KIND", "QUICK", "extract"):
        if not hasattr(mod, attr):
            raise TypeError(f"extractor module {mod.__name__} missing {attr}")
    if mod.KIND not in ("entity", "literal", "qualified"):
        raise TypeError(f"extractor {mod.NAME}: KIND must be entity|literal|qualified")
    if mod.KIND in ("literal", "qualified") and not getattr(mod, "PRED", None):
        raise TypeError(f"{mod.KIND} extractor {mod.NAME} needs PRED")
    # PRED is interpolated into SQL literals (the kg_triples oracle
    # predmap) and into parquet predicate columns — fail fast on
    # anything outside the identifier charset (a quote would break or
    # silently remap the VALUES list; extractor_dirs is a USER surface)
    pred = getattr(mod, "PRED", None)
    if pred is not None and not re.fullmatch(r"[a-z][a-z0-9_]*", pred):
        raise TypeError(
            f"extractor {mod.NAME}: PRED {pred!r} must match [a-z][a-z0-9_]*"
        )


def _register(mod: ModuleType, origin: str) -> None:
    global REGISTRY_VERSION
    _validate(mod)
    if mod.NAME in REGISTRY:
        raise ValueError(
            f"duplicate extractor NAME {mod.NAME!r}: "
            f"{REGISTRY[mod.NAME].__name__} vs {origin}"
        )
    REGISTRY[mod.NAME] = mod
    REGISTRY_VERSION += 1


def _discover() -> None:
    for info in pkgutil.iter_modules(__path__):
        if info.name.startswith("_"):
            continue
        mod = importlib.import_module(f"{__name__}.{info.name}")
        _register(mod, mod.__name__)


_discover()


def load_directory(path: str) -> list[str]:
    """Load user extractor modules from a directory — the reference's
    override-resolution surface (tree-sitter .scm files resolve
    project > user > built-in, symbols.py:113-144; handler templates are
    drop-in modules). Every *.py file is imported, validated against the
    same duck-typed protocol, and registered (fail-fast on NAME
    conflicts with built-ins or each other). Returns the loaded NAMEs.

    Snapshot holders (the extraction stage) refresh on REGISTRY_VERSION,
    so families loaded in a process are picked up on the next batch;
    Ray WORKER processes load them via build_kg(extractor_dirs=[...])
    (ensure_directories runs once per worker inside the map function).
    """
    import importlib.util
    import os

    loaded: list[str] = []
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".py") or fname.startswith("_"):
            continue
        spec = importlib.util.spec_from_file_location(
            f"coco_search_ray_ext_{fname[:-3]}", os.path.join(path, fname)
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _register(mod, fname)
        loaded.append(mod.NAME)
    return loaded


_LOADED_DIRS: set[str] = set()


def ensure_directories(dirs) -> None:
    """Idempotent per-process form of load_directory (safe to call from
    every map task; a directory loads once per worker process)."""
    import os

    for d in dirs or []:
        d = os.path.abspath(d)
        if d not in _LOADED_DIRS:
            load_directory(d)
            _LOADED_DIRS.add(d)


def entity_families() -> list[ModuleType]:
    """Deterministic order: sorted by NAME."""
    return [m for _n, m in sorted(REGISTRY.items()) if m.KIND == "entity"]


def literal_families() -> list[ModuleType]:
    return [m for _n, m in sorted(REGISTRY.items()) if m.KIND == "literal"]


def qualified_families() -> list[ModuleType]:
    return [m for _n, m in sorted(REGISTRY.items()) if m.KIND == "qualified"]


def combined_quick_pattern() -> str:
    """Union of every family's QUICK fragment (the Arrow prefilter)."""
    return "|".join(f"(?:{m.QUICK})" for _n, m in sorted(REGISTRY.items()))
