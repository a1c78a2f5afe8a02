"""M1 — mention extraction: stateless 1->N row explosion in map_batches,
driven by the extractor REGISTRY (coco_search_ray/extractors).

Each turn emits zero or more mention rows (conv_id, turn_idx, role,
tool, mention, mention_ord, kind_code). ``kind_code`` routes the row
downstream: 0 = entity (goes through hybrid linking and becomes a triple
subject/object), >0 = literal family index (surface stays verbatim and
attaches to the turn's first linked entity under the family's PRED at
assembly). The code is an int8 — never a per-row string — because the
mention stream is the widest dataset in the pipeline and every extra
string column is paid 30M+ times in the pandas assembly conversion.

The explosion shape mirrors the reference's per-record dependency
extraction (one file -> list of typed edges; deps/extractors/
python.py:42-213) with the family dispatch of its handler registry
(handlers/__init__.py:45-224), expressed as an Arrow-in/Arrow-out batch
transform. Turns matching NO family's QUICK fragment are dropped by ONE
C-level vectorized regex scan; each literal family additionally gets a
cheap per-row substring precheck (``maybe``) so its regex only runs on
rows that can match.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..extractors import combined_quick_pattern, entity_families, literal_families

_QUICK_PATTERN = combined_quick_pattern()

# registry SNAPSHOT at import: the per-turn loop must never re-sort the
# registry (it runs 10^7+ times per block of work)
_ENTITY_FAMS = entity_families()
_ENTITY_EXTRACTS = [m.extract for m in _ENTITY_FAMS]
_LITERAL_FAMS = literal_families()
LITERAL_PREDS: list[str] = [m.PRED for m in _LITERAL_FAMS]
# kind_code: 0 = entity, i+1 = LITERAL_PREDS[i], -1 = sentinel row
KIND_ENTITY = 0


def kind_code_to_pred(code: int) -> str:
    """Inverse of the kind_code encoding (for stats / literal queries)."""
    return "entity" if code == KIND_ENTITY else LITERAL_PREDS[code - 1]


_LITERAL_STEPS = [
    (np.int8(i + 1), m.extract, getattr(m, "maybe", None)) for i, m in enumerate(_LITERAL_FAMS)
]


_K0 = np.int8(KIND_ENTITY)


def _turn_mentions(text: str) -> tuple[list[str], list[np.int8]]:
    """(surfaces, kind codes) for one turn: entity families first (their
    order defines entity rank at assembly), then literal families."""
    if len(_ENTITY_EXTRACTS) == 1:
        surfaces = list(_ENTITY_EXTRACTS[0](text))
    else:
        surfaces = []
        seen: set[str] = set()
        for ex in _ENTITY_EXTRACTS:
            for m in ex(text):
                if m not in seen:
                    seen.add(m)
                    surfaces.append(m)
    kinds = [_K0] * len(surfaces)
    for code, extract, maybe in _LITERAL_STEPS:
        if maybe is not None and not maybe(text):
            continue
        for m in extract(text):
            surfaces.append(m)
            kinds.append(code)
    return surfaces, kinds


def extract_mention_rows(
    batch: pa.Table, emit_sentinels: bool = False, include_role: bool = True
) -> pa.Table:
    if emit_sentinels:
        return _extract_with_sentinels(batch)
    if batch.num_rows:
        mask = pc.match_substring_regex(batch["text"], _QUICK_PATTERN)
        batch = batch.filter(pc.fill_null(mask, False))

    texts = batch["text"].to_pylist()
    n_rows = len(texts)
    counts = np.empty(n_rows, dtype=np.int64)
    all_mentions: list[str] = []
    # literal appendix: the common row has NO literal mentions, so the
    # hot loop stays the single-family entity path; literal rows are
    # collected separately and appended as extra output rows (row order
    # is irrelevant — semantics live in (turn_idx, mention_ord))
    lit_row: list[int] = []
    lit_code: list[int] = []
    lit_surface: list[str] = []
    lit_ord: list[int] = []
    single_entity = len(_ENTITY_EXTRACTS) == 1
    ent_extract = _ENTITY_EXTRACTS[0]
    for r, text in enumerate(texts):
        if not text:
            counts[r] = 0
            continue
        if single_entity:
            m = ent_extract(text)
        else:
            m = []
            seen: set[str] = set()
            for ex in _ENTITY_EXTRACTS:
                for s in ex(text):
                    if s not in seen:
                        seen.add(s)
                        m.append(s)
        counts[r] = len(m)
        all_mentions.extend(m)
        nxt = len(m)
        for code, extract, maybe in _LITERAL_STEPS:
            if maybe is not None and not maybe(text):
                continue
            for s in extract(text):
                lit_row.append(r)
                lit_code.append(int(code))
                lit_surface.append(s)
                lit_ord.append(nxt)
                nxt += 1

    # entity part: repeat-index gather (passthrough columns never leave Arrow)
    idx = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    total = int(counts.sum())
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    ords = (np.arange(total, dtype=np.int64) - starts).astype(np.int32)
    kind_codes = np.zeros(total, dtype=np.int8)
    mentions = all_mentions

    if lit_row:  # append the (rare) literal rows
        idx = np.concatenate([idx, np.asarray(lit_row, dtype=np.int64)])
        ords = np.concatenate([ords, np.asarray(lit_ord, dtype=np.int32)])
        kind_codes = np.concatenate([kind_codes, np.asarray(lit_code, dtype=np.int8)])
        mentions = all_mentions + lit_surface

    idx_arr = pa.array(idx)
    cols = {
        "conv_id": pc.take(batch["conv_id"], idx_arr),
        "turn_idx": pc.take(batch["turn_idx"], idx_arr),
    }
    if include_role:
        cols["role"] = pc.take(batch["role"], idx_arr)
    cols.update(
        {
            "tool": pc.take(batch["tool"], idx_arr),
            "mention": pa.array(mentions, pa.string()),
            "mention_ord": pa.array(ords),
            "kind_code": pa.array(kind_codes),
        }
    )
    return pa.table(cols)


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
    o_kind: list[int] = []

    for conv, turn, role, tool, text in zip(conv_ids, turn_idxs, roles, tools, texts):
        mentions, kinds = _turn_mentions(text) if text else ([], [])
        if not mentions:
            o_conv.append(conv)
            o_turn.append(turn)
            o_role.append(role)
            o_tool.append(tool)
            o_mention.append(None)
            o_ord.append(-1)
            o_kind.append(-1)
            continue
        for i, (m, k) in enumerate(zip(mentions, kinds)):
            o_conv.append(conv)
            o_turn.append(turn)
            o_role.append(role)
            o_tool.append(tool)
            o_mention.append(m)
            o_ord.append(i)
            o_kind.append(int(k))

    return pa.table(
        {
            "conv_id": pa.array(o_conv, pa.string()),
            "turn_idx": pa.array(o_turn, pa.int32()),
            "role": pa.array(o_role, pa.string()),
            "tool": pa.array(o_tool, pa.string()),
            "mention": pa.array(o_mention, pa.string()),
            "mention_ord": pa.array(o_ord, pa.int32()),
            "kind_code": pa.array(o_kind, pa.int8()),
        }
    )
