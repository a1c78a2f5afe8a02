"""Single-process oracle: the KG pipeline's semantics with zero
distribution — a plain loop over turns in (conv_id, turn_idx) order.

Shares the PURE kernels (tokenizer, hash embeddings, EntityIndex /
RRF, mention rules, canonical mapping) with the Ray pipeline, so the
parity test (triple P/R >= 0.95, FIXTURES.md F5.2) compares EXECUTION —
sharding, shuffle, actor batching, unordered block arrival — not math.
This mirrors the reference's own test strategy: deterministic mock
embeddings + golden assertions (reference tests/mocks/ollama.py,
tests/unit/test_hybrid_search.py).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..extractors import entity_families, literal_families, qualified_families
from ..functions.linker_core import EntityIndex, LinkResult
from ..stages.canonicalize import canonical_mapping
from ..sources.synth import load_catalog, transcript_files

_VALID_ROLES = {"user", "assistant", "tool", "system"}


def _normalize_tool(tool: str | None) -> str:
    """Mirror stages/normalize.py EXACTLY by routing through the same
    Arrow kernels (now the explicit ASCII trim set + ascii_lower the
    pipeline uses): Python str.lower()/strip() use full Unicode case
    mapping ('İ'.lower() -> 'i' + combining dot) and Unicode whitespace
    — a Python reimplementation would diverge from the pipeline (and
    from the SQL, which replays the same explicit set) on such tools."""
    if tool is None:
        return ""
    t = pc.ascii_lower(pc.utf8_trim(pa.scalar(tool), characters=" \t\n\r\f\v")).as_py()
    return "" if t == "none" else t


def oracle_triples(data_dir: str) -> pd.DataFrame:
    """Compute the golden triple table for a synthetic-transcript dir."""
    catalog = load_catalog(data_dir)
    index = EntityIndex(catalog.to_pylist())
    mapping = canonical_mapping(catalog.to_pylist())

    turns = (
        pa.concat_tables([pq.read_table(f) for f in transcript_files(data_dir)])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
    )
    # identical drop rule to stages/normalize.normalize_turns: rows
    # with no conv key or a null/negative turn index are unattributable
    turns = turns[
        turns["conv_id"].notna()
        & turns["turn_idx"].notna()
        & (turns["turn_idx"] >= 0)
    ]

    memo: dict[str, LinkResult | None] = {}

    def link(m: str) -> LinkResult | None:
        if m not in memo:
            memo[m] = index.link(m)
        return memo[m]

    rows: list[tuple[str, str, str, str, int]] = []
    for conv_id, g in turns.groupby("conv_id", sort=True):
        prev_turn = None
        prev_first = None
        for _, r in g.iterrows():
            turn = int(r["turn_idx"])
            tool = _normalize_tool(r["tool"])
            text = r["text"] or ""
            ents: list[str] = []
            for fam in entity_families():
                for m in fam.extract(text):
                    res = link(m)
                    if res is not None:
                        canon = mapping.get(res.entity_id, res.entity_id)
                        if canon not in ents:
                            ents.append(canon)
            # qualified families: the dotted surface's ROOT links like an
            # entity (joining the turn's entity list AFTER plain entity
            # mentions — plan order) and each linked surface emits the
            # hierarchy triple (root, PRED, member_tail)
            qual_triples: list[tuple[str, str, str]] = []
            for fam in qualified_families():
                for m in fam.extract(text):
                    root, tail = m.split(".", 1)
                    res = link(root)
                    if res is not None:
                        canon = mapping.get(res.entity_id, res.entity_id)
                        if canon not in ents:
                            ents.append(canon)
                        qual_triples.append((canon, fam.PRED, tail))
            if ents:
                for i in range(len(ents)):
                    for j in range(i + 1, len(ents)):
                        if ents[i] != ents[j]:
                            rows.append((ents[i], "mentions", ents[j], conv_id, turn))
                    if tool:
                        rows.append((ents[i], "uses_tool", tool, conv_id, turn))
                if prev_turn is not None and turn - prev_turn == 1 and prev_first is not None:
                    rows.append((ents[0], "replies_to", prev_first, conv_id, turn))
                # literal families attach to the turn's first entity
                for fam in literal_families():
                    for surface in fam.extract(text):
                        rows.append((ents[0], fam.PRED, surface, conv_id, turn))
                for s, p, o in qual_triples:
                    rows.append((s, p, o, conv_id, turn))
                prev_turn, prev_first = turn, ents[0]
            else:
                prev_turn, prev_first = turn, None

    df = pd.DataFrame(rows, columns=["subj", "pred", "obj", "conv_id", "turn_idx"])
    df = df.drop_duplicates(keep="first")
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def precision_recall(pipeline: pd.DataFrame, oracle: pd.DataFrame) -> tuple[float, float]:
    key = ["subj", "pred", "obj", "conv_id", "turn_idx"]
    p_set = set(map(tuple, pipeline[key].itertuples(index=False)))
    o_set = set(map(tuple, oracle[key].itertuples(index=False)))
    if not p_set and not o_set:
        return 1.0, 1.0
    inter = len(p_set & o_set)
    precision = inter / len(p_set) if p_set else 0.0
    recall = inter / len(o_set) if o_set else 0.0
    return precision, recall
