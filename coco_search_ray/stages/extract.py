"""M1 — mention extraction: stateless 1->N row explosion in map_batches,
driven by the extractor REGISTRY (coco_search_ray/extractors).

Each turn emits zero or more mention rows (conv_id, turn_idx, role,
tool, mention, mention_ord, kind_code). ``kind_code`` routes the row
downstream: 0 = entity (goes through hybrid linking and becomes a triple
subject/object), >0 = literal family index (surface stays verbatim and
attaches to the turn's first linked entity under the family's PRED at
assembly), <= -2 = qualified family (the dotted surface's ROOT segment
links like an entity; assembly emits the hierarchy triple and the root
joins the turn's entity graph). The code is an int8 — never a per-row string — because the
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

from .. import extractors
from ..extractors import entity_families, literal_families, qualified_families

# kind_code: 0 = entity, i+1 = the i-th literal family OF THE PLAN,
# -2-i = the i-th QUALIFIED family of the plan (dotted root.member
# surfaces: the root links like an entity, the tail stays structural),
# -1 = sentinel row. The PLAN (which families, in which order) is
# captured ONCE in the driver (family_plan()) and shipped through task
# closures — codes are positional in the plan, NEVER per-worker registry
# state: a worker that loaded an extra external family in an earlier
# pipeline of the same process must not shift another pipeline's codes,
# and a worker missing an external family simply contributes no rows of
# that code (its other codes stay aligned).
KIND_ENTITY = 0
KIND_QUALIFIED_BASE = -2  # code for qualified family i is -2 - i


def family_plan() -> tuple[
    tuple[str, ...], tuple[tuple[str, str], ...], tuple[tuple[str, str], ...]
]:
    """(entity family names, ((literal name, pred), ...), ((qualified
    name, pred), ...)) from the CURRENT process registry — capture this
    in the driver and pass it to extract_mention_rows / assembly so
    every worker agrees."""
    return (
        tuple(m.NAME for m in entity_families()),
        tuple((m.NAME, m.PRED) for m in literal_families()),
        tuple((m.NAME, m.PRED) for m in qualified_families()),
    )


class _Snapshot:
    __slots__ = (
        "quick",
        "entity_quick",
        "entity_extracts",
        "entity_batch",
        "literal_steps",
        "literal_preds",
        "qualified_steps",
        "qualified_preds",
    )

    def __init__(self, entity_names, literal_specs, qualified_specs=()):
        reg = extractors.REGISTRY
        ent = [reg[n] for n in entity_names if n in reg]
        other = [
            reg[n]
            for n, _p in tuple(qualified_specs) + tuple(literal_specs)
            if n in reg
        ]
        self.quick = "|".join(f"(?:{m.QUICK})" for m in ent + other)
        self.entity_quick = "|".join(f"(?:{m.QUICK})" for m in ent)
        self.entity_extracts = [m.extract for m in ent]
        # batch fast path only when the plan has exactly ONE entity family
        # and it ships a BATCH kernel (cross-family dedupe needs the
        # per-turn order interleaving, which the flat batch API can't see)
        self.entity_batch = getattr(ent[0], "BATCH", None) if len(ent) == 1 else None
        # (code, extract, maybe, QUICK) — QUICK doubles as a per-family
        # vectorized candidate mask on the batch fast path: it is already
        # the contract that QUICK is a sound necessary condition under RE2
        # (the union row filter above relies on exactly that), so a row
        # failing the family's QUICK can be skipped without calling extract
        self.literal_steps = [
            (np.int8(i + 1), reg[n].extract, getattr(reg[n], "maybe", None), reg[n].QUICK)
            for i, (n, _p) in enumerate(literal_specs)
            if n in reg
        ]
        self.literal_preds = [p for _n, p in literal_specs]
        # qualified families ride the same appendix mechanism as literals
        # but with NEGATIVE plan-positional codes (-2 - i) and a linking
        # stage that resolves the surface's ROOT segment
        self.qualified_steps = [
            (
                np.int8(KIND_QUALIFIED_BASE - i),
                reg[n].extract,
                getattr(reg[n], "maybe", None),
                reg[n].QUICK,
            )
            for i, (n, _p) in enumerate(qualified_specs)
            if n in reg
        ]
        self.qualified_preds = [p for _n, p in qualified_specs]


_SNAPSHOTS: dict[tuple, _Snapshot] = {}


def _get_snapshot(entity_names=None, literal_specs=None, qualified_specs=None) -> _Snapshot:
    if entity_names is None or literal_specs is None:
        entity_names, literal_specs, qualified_specs = family_plan()
    if qualified_specs is None:
        qualified_specs = ()
    key = (entity_names, literal_specs, tuple(qualified_specs), extractors.REGISTRY_VERSION)
    snap = _SNAPSHOTS.get(key)
    if snap is None:
        if len(_SNAPSHOTS) > 64:
            _SNAPSHOTS.clear()
        snap = _Snapshot(entity_names, literal_specs, qualified_specs)
        _SNAPSHOTS[key] = snap
    return snap


def kind_code_to_pred(code: int, literal_specs=None, qualified_specs=None) -> str:
    """Inverse of the kind_code encoding (for stats / literal queries).

    Codes are PLAN-positional (see module docstring): callers that hold
    a driver-captured plan must pass BOTH spec lists — decoding a
    qualified code via this worker's registry snapshot would
    misattribute the pred when the worker has extra directory-loaded
    families (the asymmetric literal-only override was a loaded trap,
    round-5 review)."""
    if code == KIND_ENTITY:
        return "entity"
    if code <= KIND_QUALIFIED_BASE:
        qpreds = (
            [p for _n, p in qualified_specs]
            if qualified_specs is not None
            else _get_snapshot().qualified_preds
        )
        return qpreds[KIND_QUALIFIED_BASE - code]
    preds = (
        [p for _n, p in literal_specs]
        if literal_specs is not None
        else _get_snapshot().literal_preds
    )
    return preds[code - 1]


_K0 = np.int8(KIND_ENTITY)


def _turn_mentions(text: str, snap: _Snapshot | None = None) -> tuple[list[str], list[np.int8]]:
    """(surfaces, kind codes) for one turn: entity families first (their
    order defines entity rank at assembly), then qualified families,
    then literal families."""
    if snap is None:
        snap = _get_snapshot()
    ents = snap.entity_extracts
    if len(ents) == 1:
        surfaces = list(ents[0](text))
    else:
        surfaces = []
        seen: set[str] = set()
        for ex in ents:
            for m in ex(text):
                if m not in seen:
                    seen.add(m)
                    surfaces.append(m)
    kinds = [_K0] * len(surfaces)
    for code, extract, maybe, _quick in snap.qualified_steps + snap.literal_steps:
        if maybe is not None and not maybe(text):
            continue
        for m in extract(text):
            surfaces.append(m)
            kinds.append(code)
    return surfaces, kinds


def extract_mention_rows(
    batch: pa.Table,
    emit_sentinels: bool = False,
    include_role: bool = True,
    entity_names: tuple[str, ...] | None = None,
    literal_specs: tuple[tuple[str, str], ...] | None = None,
    qualified_specs: tuple[tuple[str, str], ...] | None = None,
) -> pa.Table:
    snap = _get_snapshot(entity_names, literal_specs, qualified_specs)
    if emit_sentinels:
        return _extract_with_sentinels(batch, snap)
    use_batch_kernel = snap.entity_batch is not None
    ent_mask = None
    app_masks: list[np.ndarray] = []  # qualified first, then literal
    app_steps = snap.qualified_steps + snap.literal_steps
    if batch.num_rows:
        if use_batch_kernel:
            # ONE vectorized RE2 pass per family instead of one union
            # pass + per-row Python prechecks: the per-family masks both
            # drive the union row filter AND tell each family exactly
            # which rows to extract from (QUICK patterns are pure-ASCII,
            # RE2==Python re — the same soundness contract the union
            # filter has always relied on)
            text_col = batch["text"]
            ent_mask_a = pc.fill_null(
                pc.match_substring_regex(text_col, snap.entity_quick), False
            )
            app_masks_a = [
                pc.fill_null(pc.match_substring_regex(text_col, q), False)
                for _c, _e, _m, q in app_steps
            ]
            union = ent_mask_a
            for m in app_masks_a:
                union = pc.or_(union, m)
            keep = np.nonzero(union.to_numpy(zero_copy_only=False))[0]
            batch = batch.take(pa.array(keep))
            ent_mask = ent_mask_a.to_numpy(zero_copy_only=False)[keep]
            app_masks = [m.to_numpy(zero_copy_only=False)[keep] for m in app_masks_a]
        else:
            mask = pc.match_substring_regex(batch["text"], snap.quick)
            batch = batch.filter(pc.fill_null(mask, False))

    n_rows = batch.num_rows
    if use_batch_kernel and app_masks:
        # Python strings are materialized ONLY for rows some literal /
        # qualified family will actually extract from (the union of the
        # family masks, ~40% of kept rows) — the entity kernel reads the
        # Arrow column directly and never needs them
        app_any = app_masks[0].copy()
        for m in app_masks[1:]:
            np.logical_or(app_any, m, out=app_any)
        need = np.nonzero(app_any)[0]
        sub = pc.take(batch["text"], pa.array(need)).to_pylist()
        texts: dict[int, str] = dict(zip(need.tolist(), sub))
    else:
        texts = batch["text"].to_pylist()
    # literal appendix: the common row has NO literal mentions, so the
    # hot loop stays the single-family entity path; literal rows are
    # collected separately and appended as extra output rows (row order
    # is irrelevant — semantics live in (turn_idx, mention_ord))
    lit_row: list[int] = []
    lit_code: list[int] = []
    lit_surface: list[str] = []
    lit_ord: list[int] = []
    ent_extracts = snap.entity_extracts
    if use_batch_kernel:
        # vectorized whole-batch entity detection (identical output to the
        # per-turn loop below — pytest-pinned); qualified + literal
        # families run per FAMILY over only that family's mask-selected
        # candidate rows. mention_ord stays correct under the family-outer
        # loop because families execute in plan order and nxt_arr carries
        # each row's running ordinal (semantics live in (turn_idx,
        # mention_ord), not in output row order).
        counts, all_mentions = snap.entity_batch(batch["text"], ent_mask)
        nxt_arr = counts.copy()
        lit_rows_parts: list[np.ndarray] = []
        lit_code_parts: list[np.ndarray] = []
        lit_ord_parts: list[np.ndarray] = []
        for (code, extract, _maybe, _q), fmask in zip(app_steps, app_masks):
            rows = np.nonzero(fmask)[0]
            if not len(rows):
                continue
            res = [extract(texts[r]) for r in rows]
            ns = np.fromiter(map(len, res), dtype=np.int64, count=len(res))
            nz = ns > 0
            if not nz.any():
                continue
            rows_nz, ns_nz = rows[nz], ns[nz]
            tot = int(ns_nz.sum())
            # per-row running ordinal, fully vectorized: this family's
            # surfaces slot in after the row's current count
            fstarts = np.cumsum(ns_nz) - ns_nz
            within = np.arange(tot, dtype=np.int64) - np.repeat(fstarts, ns_nz)
            lit_rows_parts.append(np.repeat(rows_nz, ns_nz))
            lit_ord_parts.append(np.repeat(nxt_arr[rows_nz], ns_nz) + within)
            lit_code_parts.append(np.full(tot, code, dtype=np.int8))
            for x in res:
                lit_surface.extend(x)
            nxt_arr[rows_nz] += ns_nz
        if lit_rows_parts:
            lit_row = np.concatenate(lit_rows_parts)
            lit_ord = np.concatenate(lit_ord_parts)
            lit_code = np.concatenate(lit_code_parts)
    else:
        counts = np.empty(n_rows, dtype=np.int64)
        all_mentions = []
        single_entity = len(ent_extracts) == 1
        ent_extract = ent_extracts[0] if ent_extracts else None
        for r, text in enumerate(texts):
            if not text:
                counts[r] = 0
                continue
            if single_entity:
                m = ent_extract(text)
            else:
                # 0 families (literal-only plan) or 2+ (cross-family dedupe)
                m = []
                seen: set[str] = set()
                for ex in ent_extracts:
                    for s in ex(text):
                        if s not in seen:
                            seen.add(s)
                            m.append(s)
            counts[r] = len(m)
            all_mentions.extend(m)
            nxt = len(m)
            for code, extract, maybe, _q in app_steps:
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
    # the batch kernel returns entity surfaces as an ARROW array (never
    # materialized as Python strings); the scalar fallback as a list
    ment_is_arrow = isinstance(all_mentions, (pa.Array, pa.ChunkedArray))

    if len(lit_row):  # append the (rare) qualified/literal rows
        idx = np.concatenate([idx, np.asarray(lit_row, dtype=np.int64)])
        ords = np.concatenate([ords, np.asarray(lit_ord, dtype=np.int32)])
        kind_codes = np.concatenate([kind_codes, np.asarray(lit_code, dtype=np.int8)])
        lit_arr = pa.array(lit_surface, pa.string())
        if ment_is_arrow:
            ent_arr = (
                all_mentions.combine_chunks()
                if isinstance(all_mentions, pa.ChunkedArray)
                else all_mentions
            )
            mention_col = pa.concat_arrays([ent_arr, lit_arr])
        else:
            mention_col = pa.array(all_mentions + lit_surface, pa.string())
    else:
        mention_col = all_mentions if ment_is_arrow else pa.array(all_mentions, pa.string())

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
            "mention": mention_col,
            "mention_ord": pa.array(ords),
            "kind_code": pa.array(kind_codes),
        }
    )
    return pa.table(cols)


def _extract_with_sentinels(batch: pa.Table, snap: _Snapshot | None = None) -> pa.Table:
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
        mentions, kinds = _turn_mentions(text, snap) if text else ([], [])
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
