"""M1 — mention extraction: stateless 1->N row explosion in map_batches,
driven by the extractor REGISTRY (coco_search_ray/extractors).

Each turn emits zero or more mention rows (conv_id, turn_idx, role,
tool, mention, mention_ord, kind). ``kind`` routes the row downstream:
"entity" rows go through hybrid linking and become triple subjects /
objects; literal rows (kind = the family's PRED, e.g. "quotes",
"links_to") keep their surface verbatim and are attached to the turn's
first linked entity at assembly. The explosion shape mirrors the
reference's per-record dependency extraction (one file -> list of typed
edges; deps/extractors/python.py:42-213) with the family dispatch of
its handler registry (handlers/__init__.py:45-224), expressed as an
Arrow-in/Arrow-out batch transform.

Turns matching NO family's QUICK fragment are dropped by ONE C-level
vectorized regex scan before the Python explosion loop ever sees them.
Turns with no mentions emit nothing (the replies_to adjacency rule only
consults entity-bearing turns); ``emit_sentinels=True`` restores a
(mention null, mention_ord -1) row per empty turn.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..extractors import combined_quick_pattern, entity_families, literal_families

_QUICK_PATTERN = combined_quick_pattern()


def _turn_mentions(text: str) -> tuple[list[str], list[str]]:
    """(surfaces, kinds) for one turn: entity families first (their order
    defines entity rank at assembly), then literal families; dedupe
    keep-first within each family's kind."""
    surfaces: list[str] = []
    kinds: list[str] = []
    seen_entity: set[str] = set()
    for fam in entity_families():
        for m in fam.extract(text):
            if m not in seen_entity:
                seen_entity.add(m)
                surfaces.append(m)
                kinds.append("entity")
    for fam in literal_families():
        for m in fam.extract(text):
            surfaces.append(m)
            kinds.append(fam.PRED)
    return surfaces, kinds


def extract_mention_rows(batch: pa.Table, emit_sentinels: bool = False) -> pa.Table:
    if emit_sentinels:
        return _extract_with_sentinels(batch)
    if batch.num_rows:
        mask = pc.match_substring_regex(batch["text"], _QUICK_PATTERN)
        batch = batch.filter(pc.fill_null(mask, False))

    texts = batch["text"].to_pylist()
    counts = np.empty(len(texts), dtype=np.int64)
    all_mentions: list[str] = []
    all_kinds: list[str] = []
    for r, text in enumerate(texts):
        if text:
            m, k = _turn_mentions(text)
        else:
            m, k = [], []
        counts[r] = len(m)
        all_mentions.extend(m)
        all_kinds.extend(k)

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
            "kind": pa.array(all_kinds, pa.string()),
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
    o_kind: list[str] = []

    for conv, turn, role, tool, text in zip(conv_ids, turn_idxs, roles, tools, texts):
        mentions, kinds = _turn_mentions(text) if text else ([], [])
        if not mentions:
            o_conv.append(conv)
            o_turn.append(turn)
            o_role.append(role)
            o_tool.append(tool)
            o_mention.append(None)
            o_ord.append(-1)
            o_kind.append("")
            continue
        for i, (m, k) in enumerate(zip(mentions, kinds)):
            o_conv.append(conv)
            o_turn.append(turn)
            o_role.append(role)
            o_tool.append(tool)
            o_mention.append(m)
            o_ord.append(i)
            o_kind.append(k)

    return pa.table(
        {
            "conv_id": pa.array(o_conv, pa.string()),
            "turn_idx": pa.array(o_turn, pa.int32()),
            "role": pa.array(o_role, pa.string()),
            "tool": pa.array(o_tool, pa.string()),
            "mention": pa.array(o_mention, pa.string()),
            "mention_ord": pa.array(o_ord, pa.int32()),
            "kind": pa.array(o_kind, pa.string()),
        }
    )
