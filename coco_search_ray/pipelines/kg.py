"""The flagship pipeline: transcripts -> (subj, pred, obj) triples.

Stages (all Ray Data; SURVEY.md §7.2 M0-M3):

  read_parquet(transcript shards)                    [streaming source]
  -> normalize_turns            map_batches, Arrow   [stateless]
  -> extract_mention_rows       map_batches, 1->N    [stateless]
  -> LinkerActor                map_batches actor pool, catalog broadcast
  -> canonical rewrite          map_batches, broadcast dict
  -> groupby(conv_id).map_groups(assemble)           [the ONE shuffle]
  == Dataset[subj, pred, obj, conv_id, turn_idx]

Triple semantics (deterministic, closed predicate set; shared with the
oracle — oracle/kg_oracle.py implements the same rules single-process):

  * per turn, linked mentions resolve to canonical entity ids, deduped
    keep-first in mention order;
  * ``mentions``  — (e_i, mentions, e_j) for every ordered pair i<j of
    distinct canonical entities in one turn;
  * ``uses_tool`` — (e, uses_tool, tool) for every entity in a turn whose
    normalized tool is non-empty;
  * ``replies_to`` — (first entity of turn t, replies_to, first entity of
    turn t-1) for ADJACENT turns (turn_idx delta == 1) within one
    conversation that both carry entities — this is the rule that forces
    the stable-turn-ordering invariant;
  * exact dedup on (subj, pred, obj, conv_id, turn_idx) — conversation-
    local by construction, so it runs inside the same map_groups with no
    extra shuffle (reference dedup-key shape: deps/extractor.py:181-203).

Scale notes: the only all-to-all exchange is the groupby(conv_id), and it
moves (ids + short mention strings) — the turn TEXT never enters the
shuffle (SURVEY.md §7.5: keep wide text out of shuffles). Conversation
skew (Zipf head) is bounded: a conversation's mention rows fit one group;
a 100k-turn conv is ~MBs. The linking stage is a broadcast join with
per-actor memoization; catalog ships once per actor via ray.put.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..sources.synth import load_catalog, transcript_files
from ..stages.canonicalize import canonical_mapping
from ..stages.extract import extract_mention_rows
from ..stages.link import LinkerActor
from ..stages.normalize import normalize_turns

TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
    ]
)


def _auto_concurrency() -> int:
    # leave headroom for the read / explode / groupby stages so the actor
    # pool never reserves every CPU (starvation stalls the stream)
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(1, min(16, cpus // 2))


def assemble_triples_group(df: pd.DataFrame) -> pd.DataFrame:
    """Per-conversation triple assembly over linked mention rows.
    Input: one conversation's rows (conv_id, turn_idx, mention_ord,
    entity_id, tool). Deterministic: sorts by (turn_idx, mention_ord)."""
    df = df.sort_values(["turn_idx", "mention_ord"], kind="mergesort")
    conv_id = df["conv_id"].iloc[0]

    subj: list[str] = []
    pred: list[str] = []
    obj: list[str] = []
    t_idx: list[int] = []

    def emit(s: str, p: str, o: str, t: int) -> None:
        subj.append(s)
        pred.append(p)
        obj.append(o)
        t_idx.append(t)

    prev_turn = None
    prev_first = None
    for turn, g in df.groupby("turn_idx", sort=True):
        ents: list[str] = []
        for e in g["entity_id"]:
            if e is not None and not pd.isna(e) and e not in ents:
                ents.append(e)
        tool = ""
        for t in g["tool"]:
            if t:
                tool = t
                break
        turn = int(turn)
        if ents:
            for i in range(len(ents)):
                for j in range(i + 1, len(ents)):
                    if ents[i] != ents[j]:
                        emit(ents[i], "mentions", ents[j], turn)
                if tool:
                    emit(ents[i], "uses_tool", tool, turn)
            if prev_turn is not None and turn - prev_turn == 1 and prev_first is not None:
                emit(ents[0], "replies_to", prev_first, turn)
            prev_turn, prev_first = turn, ents[0]
        else:
            prev_turn, prev_first = turn, None

    out = pd.DataFrame(
        {"subj": subj, "pred": pred, "obj": obj, "conv_id": conv_id, "turn_idx": t_idx}
    )
    # exact dedup on the full tuple key — conversation-local, keep-first
    out = out.drop_duplicates(subset=["subj", "pred", "obj", "turn_idx"], keep="first")
    out["turn_idx"] = out["turn_idx"].astype("int32")
    return out


def link_stage(
    mention_ds: ray.data.Dataset,
    catalog: pa.Table,
    mapping: dict[str, str],
    concurrency: int | None = None,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Broadcast-join linking: catalog + canonical mapping ship once via
    ray.put; one actor pool links AND canonicalizes (stages/link.py)."""
    catalog_ref = ray.put(catalog.to_pylist())
    mapping_ref = ray.put(mapping)
    conc = concurrency or _auto_concurrency()
    return mention_ds.map_batches(
        LinkerActor,
        fn_constructor_kwargs={"catalog_ref": catalog_ref, "mapping_ref": mapping_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=conc,
        num_cpus=1,
    )


def build_kg(
    paths: list[str] | str,
    catalog: pa.Table,
    mapping: dict[str, str] | None = None,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """transcript parquet paths + catalog -> streaming Dataset of triples."""
    if mapping is None:
        mapping = canonical_mapping(catalog.to_pylist())
    ds = ray.data.read_parquet(paths)
    ds = ds.map_batches(normalize_turns, batch_format="pyarrow")
    ds = ds.map_batches(extract_mention_rows, batch_format="pyarrow")
    ds = ds.select_columns(["conv_id", "turn_idx", "tool", "mention", "mention_ord"])
    ds = link_stage(ds, catalog, mapping, concurrency=concurrency)
    ds = ds.select_columns(["conv_id", "turn_idx", "mention_ord", "entity_id", "tool"])
    triples = ds.groupby("conv_id").map_groups(assemble_triples_group, batch_format="pandas")
    return triples


def build_kg_from_dir(data_dir: str, concurrency: int | None = None) -> ray.data.Dataset:
    catalog = load_catalog(data_dir)
    return build_kg(transcript_files(data_dir), catalog, concurrency=concurrency)


def normalized_turns_ds(data_dir: str) -> ray.data.Dataset:
    """M0 slice: read -> normalize (used by the ordering-invariant test)."""
    ds = ray.data.read_parquet(transcript_files(data_dir))
    return ds.map_batches(normalize_turns, batch_format="pyarrow")
