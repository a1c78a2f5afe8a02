"""Recursive text chunking: text -> overlapping chunks at semantic
boundaries. The reference's RecursiveSplitter semantics (call site
indexer/flow.py:189-194; defaults chunk_size=1000 / chunk_overlap=300,
config/schema.py:46-47): split at the coarsest separator that keeps
pieces under chunk_size, recurse into oversized pieces with finer
separators, then re-pack adjacent pieces greedily with ``overlap`` bytes
of lookback. Chunk identity = (id, start, end) byte offsets into the
ORIGINAL text (the reference stores offsets, not copies — INT4RANGE
location, flow.py:77).

Expressed as a 1->N row explosion in map_batches (same shape as mention
extraction).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

DEFAULT_CHUNK_SIZE = 1000
DEFAULT_OVERLAP = 300

# coarse -> fine boundary preference (paragraph, line, sentence, word)
DEFAULT_SEPARATORS = ["\n\n", "\n", ". ", " "]


@dataclass
class Chunk:
    start: int
    end: int
    text: str


def _split_spans(text: str, start: int, seps: list[str], chunk_size: int) -> list[tuple[int, int]]:
    """Recursive splitting into spans <= chunk_size (best effort; an
    unbreakable run longer than chunk_size is hard-sliced)."""
    n = len(text)
    if n <= chunk_size:
        return [(start, start + n)]
    if not seps:
        return [(start + i, start + min(i + chunk_size, n)) for i in range(0, n, chunk_size)]
    sep, rest = seps[0], seps[1:]
    parts = text.split(sep)
    if len(parts) == 1:
        return _split_spans(text, start, rest, chunk_size)
    spans: list[tuple[int, int]] = []
    pos = 0
    for i, p in enumerate(parts):
        seg_start = pos
        seg_end = pos + len(p)
        if i < len(parts) - 1:
            seg_end += len(sep)  # separator stays with the left piece
        if seg_end > seg_start:
            spans.extend(_split_spans(text[seg_start:seg_end], start + seg_start, rest, chunk_size))
        pos = seg_end
    return spans


def split_text(
    text: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_OVERLAP,
    separators: list[str] | None = None,
) -> list[Chunk]:
    """Deterministic chunking with overlap: pack boundary spans greedily up
    to chunk_size; each next chunk starts ``chunk_overlap`` bytes before
    the previous chunk's end (clamped to a span boundary)."""
    if not text:
        return []
    spans = _split_spans(text, 0, separators or DEFAULT_SEPARATORS, chunk_size)
    chunks: list[Chunk] = []
    i = 0
    while i < len(spans):
        start = spans[i][0]
        j = i
        end = spans[i][1]
        while j + 1 < len(spans) and spans[j + 1][1] - start <= chunk_size:
            j += 1
            end = spans[j][1]
        chunks.append(Chunk(start, end, text[start:end]))
        if j + 1 >= len(spans):
            break
        # overlap: restart at the latest span starting before end - overlap
        target = max(start + 1, end - chunk_overlap)
        nxt = j + 1
        for k in range(i + 1, j + 1):
            if spans[k][0] >= target:
                nxt = k
                break
        i = max(nxt, i + 1)
    return chunks


def chunk_documents_fixed(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 200,
    step: int = 140,
) -> pa.Table:
    """Fixed-stride windowed chunking (the sliding-window twin of the
    recursive splitter): chunk i covers [i*step, min(i*step + window,
    len)). Fully closed-form, so a SQL oracle can re-derive every chunk
    row including its text (substr) — unlike the separator-driven
    recursive splitter. 1->N explosion, same output shape."""
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    o_id, o_ord, o_start, o_end, o_text = [], [], [], [], []
    for i, t in zip(ids, texts):
        t = t or ""
        for ci, start in enumerate(range(0, len(t), step)):
            end = min(start + window, len(t))
            o_id.append(i)
            o_ord.append(ci)
            o_start.append(start)
            o_end.append(end)
            o_text.append(t[start:end])
    return pa.table(
        {
            id_col: pa.array(o_id, batch[id_col].type),
            "chunk_ord": pa.array(o_ord, pa.int32()),
            "start": pa.array(o_start, pa.int64()),
            "end": pa.array(o_end, pa.int64()),
            "chunk_text": pa.array(o_text, pa.string()),
        }
    )


def chunk_documents(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_OVERLAP,
) -> pa.Table:
    """1->N explosion: one row per chunk with byte offsets."""
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    o_id, o_ord, o_start, o_end, o_text = [], [], [], [], []
    for i, t in zip(ids, texts):
        for ci, ch in enumerate(split_text(t or "", chunk_size, chunk_overlap)):
            o_id.append(i)
            o_ord.append(ci)
            o_start.append(ch.start)
            o_end.append(ch.end)
            o_text.append(ch.text)
    return pa.table(
        {
            id_col: pa.array(o_id, batch[id_col].type),
            "chunk_ord": pa.array(o_ord, pa.int32()),
            "start": pa.array(o_start, pa.int64()),
            "end": pa.array(o_end, pa.int64()),
            "chunk_text": pa.array(o_text, pa.string()),
        }
    )
