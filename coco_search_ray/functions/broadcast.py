"""Worker-side cached dereference of broadcast objects.

ray.get with a per-worker-process deserialization cache: a plain function
task re-derefs per call otherwise; caching keeps lookup stages STATELESS
so Ray can FUSE them with neighboring task stages — an actor pool would
break fusion and force a plasma round-trip (CLAUDE.md perf lesson).
"""

from __future__ import annotations

import ray

_deref_cache: dict[str, object] = {}
_CACHE_MAX = 4  # a stage may legitimately hold a few broadcast objects;
# a single slot would make two refs evict each other every batch


def deref_cached(ref) -> object:
    key = ref.hex()
    obj = _deref_cache.get(key)
    if obj is None:
        obj = ray.get(ref)
        if len(_deref_cache) >= _CACHE_MAX:
            _deref_cache.clear()
        _deref_cache[key] = obj
    return obj
