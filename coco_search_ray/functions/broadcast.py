"""Worker-side cached dereference of broadcast objects.

ray.get with a per-worker-process deserialization cache: a plain function
task re-derefs per call otherwise; caching keeps lookup stages STATELESS
so Ray can FUSE them with neighboring task stages — an actor pool would
break fusion and force a plasma round-trip (CLAUDE.md perf lesson).
"""

from __future__ import annotations

import pickle

import ray

_deref_cache: dict[tuple[str, bool], object] = {}
_CACHE_MAX = 4  # a stage may legitimately hold a few broadcast objects;
# a single slot would make two refs evict each other every batch


def localize(obj: object) -> object:
    """Deep-copy broadcast state out of plasma into the process heap.

    ray.get deserializes numpy arrays ZERO-COPY as read-only views onto
    the object store's shared-memory mmap. That is the right default for
    data flowing block-to-block, but for hot per-batch kernels that
    hammer the same broadcast arrays from every worker simultaneously
    the shared pages contend: measured 8x slower (2.81 s vs 0.33 s
    median) for the linker's digest matmuls at 32-way parallelism on
    this host. One pickle round-trip per worker per broadcast object
    moves the arrays into private memory; only worth it for
    numpy-bearing state reused across many batches (indexes, score
    matrices, rank vectors), never for one-shot payloads.
    """
    try:
        return pickle.loads(pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL))
    except Exception:
        # state holding a non-stdlib-picklable member (closure, local
        # class): cloudpickle handles it; still one round-trip off plasma
        from ray import cloudpickle

        return cloudpickle.loads(cloudpickle.dumps(obj))


def deref_cached(ref, localize_arrays: bool = False) -> object:
    key = (ref.hex(), localize_arrays)
    obj = _deref_cache.get(key)
    if obj is None:
        obj = ray.get(ref)
        if localize_arrays:
            obj = localize(obj)
        if len(_deref_cache) >= _CACHE_MAX:
            _deref_cache.clear()
        _deref_cache[key] = obj
    return obj
