"""M1 — mention extraction: stateless 1->N row explosion in map_batches.

Each turn emits zero or more mention rows (conv_id, turn_idx, role, tool,
mention, mention_ord). The explosion shape mirrors the reference's
per-record dependency extraction (one file -> list of typed edges;
deps/extractors/python.py:42-213) expressed as an Arrow-in/Arrow-out
batch transform: output tables are assembled column-wise, never Python
row dicts.

Turns with no mentions emit nothing: the replies_to adjacency rule only
consults turns that DO carry entities (first(t) joined to first(t-1)), so
entity-less turns are irrelevant to triple assembly — dropping them
halves the mention-row volume through the rest of the pipeline. Per-turn
QA metrics run on the normalized-turns dataset directly (pipelines/
stats.py), not on mention rows. ``emit_sentinels=True`` restores a
(mention null, mention_ord -1) row per empty turn for consumers that
want a row per turn.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.mentions import _QUICK_RE, detect_mentions

# Arrow/RE2 form of functions.mentions._QUICK_RE: rows that can't contain
# any mention shape are dropped with ONE C-level vectorized scan before the
# python explosion loop ever sees them.
_QUICK_PATTERN = _QUICK_RE.pattern


def extract_mention_rows(batch: pa.Table, emit_sentinels: bool = False) -> pa.Table:
    if emit_sentinels:
        return _extract_with_sentinels(batch)
    if batch.num_rows:
        mask = pc.match_substring_regex(batch["text"], _QUICK_PATTERN)
        batch = batch.filter(pc.fill_null(mask, False))

    texts = batch["text"].to_pylist()
    counts = np.empty(len(texts), dtype=np.int64)
    all_mentions: list[str] = []
    for r, text in enumerate(texts):
        m = detect_mentions(text) if text else []
        counts[r] = len(m)
        all_mentions.extend(m)

    # repeat-index gather: the passthrough columns never leave Arrow
    idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    total = int(counts.sum())
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    ords = (np.arange(total, dtype=np.int64) - starts).astype(np.int32)

    idx_arr = pa.array(idx)
    return pa.table(
        {
            "conv_id": pc.take(batch["conv_id"], idx_arr),
            "turn_idx": pc.take(batch["turn_idx"], idx_arr),
            "role": pc.take(batch["role"], idx_arr),
            "tool": pc.take(batch["tool"], idx_arr),
            "mention": pa.array(all_mentions, pa.string()),
            "mention_ord": pa.array(ords, pa.int32()),
        }
    )


def _extract_with_sentinels(batch: pa.Table) -> pa.Table:
    conv_ids = batch["conv_id"].to_pylist()
    turn_idxs = batch["turn_idx"].to_pylist()
    roles = batch["role"].to_pylist()
    tools = batch["tool"].to_pylist()
    texts = batch["text"].to_pylist()

    o_conv: list[str] = []
    o_turn: list[int] = []
    o_role: list[str] = []
    o_tool: list[str] = []
    o_mention: list[str | None] = []
    o_ord: list[int] = []

    for conv, turn, role, tool, text in zip(conv_ids, turn_idxs, roles, tools, texts):
        mentions = detect_mentions(text) if text else []
        if not mentions:
            o_conv.append(conv)
            o_turn.append(turn)
            o_role.append(role)
            o_tool.append(tool)
            o_mention.append(None)
            o_ord.append(-1)
            continue
        for i, m in enumerate(mentions):
            o_conv.append(conv)
            o_turn.append(turn)
            o_role.append(role)
            o_tool.append(tool)
            o_mention.append(m)
            o_ord.append(i)

    return pa.table(
        {
            "conv_id": pa.array(o_conv, pa.string()),
            "turn_idx": pa.array(o_turn, pa.int32()),
            "role": pa.array(o_role, pa.string()),
            "tool": pa.array(o_tool, pa.string()),
            "mention": pa.array(o_mention, pa.string()),
            "mention_ord": pa.array(o_ord, pa.int32()),
        }
    )
