"""Chunking goldens, query cache semantics, glob conversion."""

import numpy as np
import pyarrow as pa

from coco_search_ray.functions.globs import filter_glob, glob_to_like
from coco_search_ray.functions.query_cache import (
    MAX_ENTRIES,
    QueryCache,
    SCAN_WINDOW,
    TTL_SECONDS,
)
from coco_search_ray.stages.chunking import chunk_documents, split_text


# ---- chunking ----


def test_split_short_text_single_chunk():
    c = split_text("tiny", chunk_size=100)
    assert len(c) == 1 and (c[0].start, c[0].end) == (0, 4)


def test_split_offsets_reconstruct_text():
    text = "para one is here.\n\npara two follows. sentence more words\nline three again"
    for ch in split_text(text, chunk_size=30, chunk_overlap=10):
        assert text[ch.start : ch.end] == ch.text


def test_split_respects_chunk_size_at_boundaries():
    text = " ".join(f"word{i}" for i in range(100))
    chunks = split_text(text, chunk_size=50, chunk_overlap=10)
    assert all(len(c.text) <= 50 for c in chunks)
    # full coverage: last chunk reaches the end, first starts at 0
    assert chunks[0].start == 0 and chunks[-1].end == len(text)


def test_split_overlap_lookback():
    text = " ".join(f"w{i:03d}" for i in range(200))
    chunks = split_text(text, chunk_size=100, chunk_overlap=40)
    for a, b in zip(chunks, chunks[1:]):
        assert b.start < a.end  # consecutive chunks overlap
        assert a.end - b.start <= 40 + 10  # ~overlap bytes (span-aligned)


def test_split_unbreakable_run_hard_slices():
    text = "x" * 2500
    chunks = split_text(text, chunk_size=1000)
    assert [c.start for c in chunks] == [0, 1000, 2000]


def test_chunk_documents_explosion():
    t = pa.table({"doc_id": [1, 2], "text": ["short", " ".join(["w"] * 400)]})
    out = chunk_documents(t, chunk_size=100, chunk_overlap=20)
    df = out.to_pandas()
    assert (df[df["doc_id"] == 1]["chunk_ord"] == 0).all()
    assert len(df[df["doc_id"] == 2]) > 3


# ---- query cache ----


def test_cache_l1_exact_and_ttl():
    c = QueryCache()
    c.put("q", "idx", results=[1, 2], now=1000.0)
    assert c.get_exact("q", "idx", now=1000.0 + TTL_SECONDS - 1) == [1, 2]
    assert c.get_exact("q", "idx", now=1000.0 + TTL_SECONDS + 1) is None
    assert c.get_exact("other", "idx", now=1001.0) is None


def test_cache_l2_semantic_threshold():
    c = QueryCache()
    v = np.ones(768)
    c.put("q", "idx", results="hit", embedding=v, now=1000.0)
    near = v.copy()
    near[:50] = 0.5  # still cosine > 0.92
    assert c.get_semantic(near, "idx", now=1001.0) == "hit"
    assert c.get_semantic(-v, "idx", now=1001.0) is None
    assert c.get_semantic(near, "other_idx", now=1001.0) is None


def test_cache_scan_window_limits_semantic_scan():
    c = QueryCache()
    v = np.ones(768)
    c.put("old", "idx", results="old", embedding=v, now=0.0)
    for i in range(SCAN_WINDOW):
        c.put(f"q{i}", "idx", results=i, embedding=-v, now=float(i + 1))
    # the matching entry is now outside the 50-most-recent window
    assert c.get_semantic(v, "idx", now=float(SCAN_WINDOW + 1)) is None


def test_cache_eviction_and_invalidation():
    c = QueryCache()
    for i in range(MAX_ENTRIES + 20):
        c.put(f"q{i}", "idx", results=i, now=float(i))
    assert len(c) == MAX_ENTRIES
    assert c.get_exact("q0", "idx", now=600.0) is None  # oldest evicted
    c.put("other", "idx2", results="x", now=1e6)
    c.invalidate_index("idx")
    assert len(c) == 1


# ---- globs ----


def test_glob_to_like_escape_then_convert():
    assert glob_to_like("a*b?c") == "a%b_c"
    assert glob_to_like("100%_done*") == "100\\%\\_done%"


def test_filter_glob_case_insensitive():
    t = pa.table({"name": ["Customer#1", "customer#2", "Supplier#1", None]})
    out = filter_glob(t, "name", "customer*")
    assert out["name"].to_pylist() == ["Customer#1", "customer#2"]
