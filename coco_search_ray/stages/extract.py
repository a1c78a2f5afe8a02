"""M1 — mention extraction: stateless 1->N row explosion in map_batches.

Each turn emits zero or more mention rows (conv_id, turn_idx, role, tool,
mention, mention_ord). The explosion shape mirrors the reference's
per-record dependency extraction (one file -> list of typed edges;
deps/extractors/python.py:42-213) expressed as an Arrow-in/Arrow-out
batch transform: output tables are assembled column-wise, never Python
row dicts.

Turns with no mentions still emit ONE sentinel row (mention null,
mention_ord -1) so downstream per-conversation assembly sees every turn
(needed for replies_to adjacency and per-turn QA metrics) without a
second pass over the input.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.mentions import detect_mentions


def extract_mention_rows(batch: pa.Table) -> pa.Table:
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
