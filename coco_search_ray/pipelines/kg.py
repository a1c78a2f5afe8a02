"""The flagship pipeline: transcripts -> (subj, pred, obj) triples.

Stages (all Ray Data; SURVEY.md §7.2 M0-M3):

  read_parquet(transcript shards)                    [streaming source]
  -> normalize_turns            map_batches, Arrow   [stateless]
  -> extract_mention_rows       map_batches, 1->N    [stateless]
  -> linking, one of:
       two-phase (default): per-block unique -> global unique -> parallel
         link tasks over DISTINCT mentions -> broadcast dict lookup
         (canonical rewrite folded into the dict)
       actor pool: LinkerActor map_batches, catalog broadcast, per-actor
         memo (streaming, no barrier)
  -> assembly, one of:
       conv-disjoint shards: per-block pandas groupby (NO shuffle)
       general: groupby(conv_id).map_groups      [the ONE shuffle]
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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count as _RayCount

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


def _normalize_assembly_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Accept both assembly schemas: the pipeline's single-value form
    (val + kind_code) and the legacy explicit form (entity_id [+ kind]).
    Normalized columns: entity_id (null on literal rows; the ROOT id on
    qualified rows), surface (the literal object; the member tail on
    qualified rows), kind_code (0 = entity, <= -2 = qualified)."""
    if "val" in df.columns:
        is_ent = df["kind_code"] == 0
        is_q = df["kind_code"] <= -2
        entity_id = df["val"].where(is_ent)
        surface = df["val"].copy()
        if is_q.any():
            # qualified val is "<root_entity_id>.<member_tail>" (or null
            # when unlinked): split once on the first dot
            sp = df.loc[is_q, "val"].str.split(".", n=1, expand=True)
            if 1 not in sp.columns:
                sp[1] = None
            entity_id.loc[is_q] = sp[0]
            surface.loc[is_q] = sp[1]
        return df.assign(entity_id=entity_id, surface=surface)
    if "kind_code" not in df.columns:
        df = df.assign(kind_code=0)
    return df.assign(surface=df.get("mention", df["entity_id"]))


def _literal_preds(literal_preds: list[str] | None) -> list[str]:
    """Default pred decoding from the CURRENT process plan (explicit
    lists come from the driver's captured plan via build_kg closures)."""
    if literal_preds is not None:
        return literal_preds
    from ..stages.extract import _get_snapshot

    return _get_snapshot().literal_preds


def _qualified_preds_list(qualified_preds: list[str] | None) -> list[str]:
    if qualified_preds is not None:
        return qualified_preds
    from ..stages.extract import _get_snapshot

    return _get_snapshot().qualified_preds


def assemble_triples_group(
    df: pd.DataFrame,
    literal_preds: list[str] | None = None,
    qualified_preds: list[str] | None = None,
) -> pd.DataFrame:
    """Per-conversation triple assembly over linked mention rows.
    Input: one conversation's rows (conv_id, turn_idx, mention_ord,
    val/entity_id, kind_code, tool). Deterministic: sorts by
    (turn_idx, mention_ord)."""
    preds = _literal_preds(literal_preds)
    qpreds = _qualified_preds_list(qualified_preds)
    df = _normalize_assembly_frame(df)
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
        # entity rows AND qualified roots populate the turn's entity
        # list, in mention_ord order (qualified ordinals follow entity
        # ordinals by plan construction), deduped keep-first
        ge = g[(g["kind_code"] == 0) | (g["kind_code"] <= -2)]
        ents: list[str] = []
        for e in ge["entity_id"]:
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
            # literal families: surface attaches verbatim to the turn's
            # FIRST entity under the family's predicate
            for _, lr in g[(g["kind_code"] > 0) & g["surface"].notna()].iterrows():
                emit(ents[0], preds[int(lr["kind_code"]) - 1], lr["surface"], turn)
            # qualified families: hierarchy triple (root entity, PRED,
            # member tail) per linked dotted surface
            for _, qr in g[
                (g["kind_code"] <= -2) & g["entity_id"].notna() & g["surface"].notna()
            ].iterrows():
                emit(qr["entity_id"], qpreds[-2 - int(qr["kind_code"])], qr["surface"], turn)
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
    batch_size: int | None = 8192,
    link_params: dict | None = None,
) -> ray.data.Dataset:
    """Broadcast-join linking: the PREBUILT EntityIndex + canonical
    mapping ship once via ray.put; one actor pool links AND canonicalizes
    (stages/link.py)."""
    from ..functions.linker_core import EntityIndex

    index_ref = ray.put(EntityIndex(catalog.to_pylist(), **(link_params or {})))
    mapping_ref = ray.put(mapping)
    conc = concurrency or _auto_concurrency()
    return mention_ds.map_batches(
        LinkerActor,
        fn_constructor_kwargs={"index_ref": index_ref, "mapping_ref": mapping_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=conc,
        num_cpus=1,
    )


@ray.remote
def _link_chunk(index, mapping: dict[str, str], chunk: list[str]) -> dict:
    """Link one chunk of unique mentions (raw Ray task: this is the
    driver-coordinated small-side computation, not a per-record
    transform). The PREBUILT EntityIndex ships by object ref — built once
    on the driver, O(catalog) build cost paid once instead of once per
    task/worker."""
    from ..functions.broadcast import localize

    # plasma-backed (zero-copy, read-only) index arrays contend across
    # parallel tasks — one pickle round-trip into private memory is ~10 ms
    # and buys ~8x kernel speed (functions/broadcast.localize)
    index = localize(index)
    out = {}
    for mention, res in zip(chunk, index.link_many(chunk)):
        out[mention] = mapping.get(res.entity_id, res.entity_id) if res else None
    return out


_K_QUAL = pa.scalar(-2, pa.int8())  # kind_code <= -2 -> qualified family row


def _qualified_root(mention_col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """ROOT segment (text before the first '.') of dotted qualified
    surfaces — the linkable half; the tail stays structural."""
    parts = pc.split_pattern(mention_col, pattern=".", max_splits=1)
    return pc.list_element(parts, 0)


def _add_link_key(b: pa.Table) -> pa.Table:
    """Join-key column for the distributed linkmap branch: qualified
    rows key on their ROOT segment, everything else on the mention."""
    if "kind_code" not in b.schema.names:
        return b.append_column("_link_key", b["mention"])
    is_q = pc.less_equal(b["kind_code"], _K_QUAL)
    key = pc.if_else(is_q, _qualified_root(b["mention"]), b["mention"])
    return b.append_column("_link_key", key)


def _one_chunk(col) -> pa.Array:
    """ChunkedArray -> single Array (no-op for plain Arrays)."""
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 1:
            return col.chunk(0)
        col = col.combine_chunks()
        return col.chunk(0) if isinstance(col, pa.ChunkedArray) and col.num_chunks else (
            col if isinstance(col, pa.Array) else pa.array([], col.type.value_type if pa.types.is_dictionary(col.type) else col.type)
        )
    return col


def _dict_compress(b: pa.Table) -> pa.Table:
    """Dictionary-encode the repeating string columns of the mention
    stream before it is MATERIALIZED: conv_id / tool / mention repeat
    enormously (70k distinct mentions per ~500k-row block at bench
    tier), so the plasma copy shrinks ~3x and every downstream consumer
    gets the per-block uniques for free (lookup probes the DICTIONARY,
    not the rows)."""
    cols, names = [], []
    for name in b.schema.names:
        col = b[name]
        if name in ("conv_id", "tool", "mention") and not pa.types.is_dictionary(
            b.schema.field(name).type
        ):
            col = pc.dictionary_encode(col)
        names.append(name)
        cols.append(col)
    return pa.table(dict(zip(names, cols)))


def _dict_decode(b: pa.Table) -> pa.Table:
    """Inverse of _dict_compress (the distributed-linkmap branch joins /
    repartitions on plain string columns)."""
    for i, f in enumerate(b.schema):
        if pa.types.is_dictionary(f.type):
            b = b.set_column(i, f.name, pc.cast(b[f.name], f.type.value_type))
    return b


def _block_unique(b: pa.Table) -> pa.Table:
    # ENTITY surfaces link as-is; QUALIFIED surfaces contribute their
    # ROOT segment; literal families (quotes, urls, ...) stay verbatim
    # and never enter the linkmap
    if "mention" in b.schema.names and pa.types.is_dictionary(
        b.schema.field("mention").type
    ):
        i = b.schema.get_field_index("mention")
        b = b.set_column(i, "mention", pc.cast(b["mention"], pa.string()))
    if "kind_code" in b.schema.names:
        ent = b.filter(pc.equal(b["kind_code"], pa.scalar(0, pa.int8())))["mention"]
        qual = b.filter(pc.less_equal(b["kind_code"], _K_QUAL))["mention"]
        arrs = [pc.unique(ent).drop_null()]
        if len(qual):
            arrs.append(pc.unique(_qualified_root(qual)).drop_null())
        merged = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrs])
        return pa.table({"mention": pc.unique(merged)})
    return pa.table({"mention": pc.unique(b["mention"]).drop_null()})


def unique_mention_linkmap(
    mention_ds: ray.data.Dataset,
    catalog: pa.Table,
    mapping: dict[str, str],
    parallelism: int | None = None,
    uniq_blocks: "pd.DataFrame | None" = None,
    link_params: dict | None = None,
) -> dict[str, str | None]:
    """Two-phase linking, phase 1 (broadcast branch): the global
    mention -> canonical-entity dict.

    Mentions repeat enormously (surface forms are drawn from a bounded
    vocabulary), so instead of every linker actor re-resolving the same
    strings (per-actor warmup = O(uniques x catalog) EACH), we:
      per-block unique (pre-aggregation inside map_batches)
      -> tiny global unique (the shuffle moves only distinct short strings)
      -> parallel Ray tasks hybrid-link each unique mention ONCE
      -> broadcast the dict.
    Above _DISTINCT_BROADCAST_MAX distinct surfaces build_kg switches
    AUTOMATICALLY to the distributed branch (linkmap_dataset + a
    partitioned map-side join) — same two-phase shape, no driver union."""
    if uniq_blocks is None:
        uniq_blocks = mention_ds.map_batches(_block_unique, batch_format="pyarrow").to_pandas()
    uniq = sorted(set(uniq_blocks["mention"]))
    # fan-out scales with the WORK (~0.2 ms of hybrid-link CPU per unique
    # surface): small unique sets stay narrow so they reuse warm workers,
    # large ones spread across the cluster. This phase is a BARRIER with
    # no competing stages, so it may use every CPU — _auto_concurrency's
    # half-CPU actor-pool cap serialized it 2x for no reason
    cpus = int(ray.cluster_resources().get("CPU", 4))
    par = parallelism or max(2, min(cpus, -(-len(uniq) // 1500)))
    from ..functions.linker_core import EntityIndex

    index_ref = ray.put(EntityIndex(catalog.to_pylist(), **(link_params or {})))
    mapping_ref = ray.put(mapping)
    chunk_size = max(64, -(-len(uniq) // par))
    futures = [
        _link_chunk.remote(index_ref, mapping_ref, uniq[lo : lo + chunk_size])
        for lo in range(0, len(uniq), chunk_size)
    ]
    linkmap: dict[str, str | None] = {}
    for part in ray.get(futures):
        linkmap.update(part)
    return linkmap


# above this many DISTINCT surface forms the linkmap outgrows a broadcast
# dict and the two-phase path switches to the distributed branch
_DISTINCT_BROADCAST_MAX = 2_000_000

# above this much INPUT (transcript parquet bytes, driver-side stat) the
# two-phase branch stops PINNING the mention stream in the object store
# (it is consumed twice: unique pass + lookup pass) and instead streams
# extraction ONCE into parquet files, then runs both passes from disk —
# the stream is ~tens of TB of plasma spill per job at 10^12 turns, and
# the files double as the relink-resume artifact. Same size-trigger
# discipline as _DISTINCT_BROADCAST_MAX; override via env for tests.
_STREAM_PIN_MAX_INPUT_BYTES = 16 << 30  # 16 GiB


def _stream_pin_max_input_bytes() -> int:
    import os

    return int(
        os.environ.get("KG_STREAM_PIN_MAX_INPUT_BYTES", _STREAM_PIN_MAX_INPUT_BYTES)
    )


def _paths_bytes(paths: list[str]) -> int | None:
    """Total size of the input files, resolved through ``pyarrow.fs`` so
    the spill auto-trigger is STORAGE-AGNOSTIC: a real 100 TB job reads
    from object storage (s3:// / gs:// / hdfs://), and an ``os.stat``
    sizer would silently return None there and leave auto-spill OFF —
    reverting to pinning tens of TB in plasma exactly where spilling
    matters most. Returns None only when a path's filesystem cannot be
    resolved or listed at all (auto-spill then stays off — explicit
    opt-in via ``spill_stream=True`` still works)."""
    import os

    from pyarrow import fs as pafs

    total = 0
    for p in paths:
        try:
            filesystem, rel = pafs.FileSystem.from_uri(p)
        except Exception:  # noqa: BLE001 — bare/relative local path
            filesystem, rel = pafs.LocalFileSystem(), os.path.abspath(str(p))
        try:
            info = filesystem.get_file_info(rel)
            if info.type == pafs.FileType.Directory:
                infos = filesystem.get_file_info(pafs.FileSelector(rel, recursive=True))
                total += sum(i.size or 0 for i in infos if i.is_file)
            elif info.type == pafs.FileType.File:
                total += info.size or 0
            else:  # NotFound / Unknown
                return None
        except Exception:  # noqa: BLE001 — unreachable store: stay off
            return None
    return total


def _strip_file_scheme(paths: list[str]) -> list[str]:
    """ray.data.read_parquet resolves the filesystem from the FIRST
    element of a path list but does not strip the scheme from the rest,
    so a LIST of file:// URIs fails normalize_path (a single string
    works). file:// is the local filesystem by definition — strip it up
    front with real URI parsing — percent-DECODE '%20' etc. (pathlib's
    as_uri() encodes spaces) and drop an empty/localhost authority (a
    naive prefix slice would leave literal escapes and turn the host
    into a relative path segment); real remote schemes (s3:// etc.)
    pass through untouched."""
    from urllib.parse import unquote, urlparse

    out: list[str] = []
    for p in paths:
        if isinstance(p, str) and p.startswith("file://"):
            u = urlparse(p)
            if u.netloc in ("", "localhost"):
                p = unquote(u.path)
        out.append(p)
    return out


def linkmap_dataset(
    uniq_ds: ray.data.Dataset,
    catalog: pa.Table,
    mapping: dict[str, str],
    link_params: dict | None = None,
) -> ray.data.Dataset:
    """Two-phase linking, phase 1 (distributed branch): a Dataset of
    (mention, entity_id) built by linking each globally-distinct mention
    once in parallel — the prebuilt EntityIndex ships by ref, stateless
    tasks keep the stage fusable."""
    from ..functions.linker_core import EntityIndex

    # ONE broadcast object for both pieces of state: two separate refs
    # through the bounded worker deref cache would evict each other every
    # batch and re-deserialize the EntityIndex per call
    state_ref = ray.put((EntityIndex(catalog.to_pylist(), **(link_params or {})), mapping))

    def link_batch(b: pa.Table) -> pa.Table:
        idx, mp = _deref_once(state_ref, localize_arrays=True)
        mentions = b["mention"].to_pylist()
        ents = [
            (mp.get(r.entity_id, r.entity_id) if r else None)
            for r in idx.link_many(mentions)
        ]
        return pa.table({"mention": b["mention"], "entity_id": pa.array(ents, pa.string())})

    return uniq_ds.map_batches(link_batch, batch_format="pyarrow")


# shared worker-side broadcast cache (functions/broadcast.py); the alias
# keeps the long-standing kg._deref_once import path working
from ..functions.broadcast import deref_cached as _deref_once


def _narrow_assembly_table(b: pa.Table, val: pa.Array | pa.ChunkedArray) -> pa.Table:
    return pa.table(
        {
            "conv_id": b["conv_id"],
            "turn_idx": b["turn_idx"],
            "mention_ord": b["mention_ord"],
            "tool": b["tool"],
            "kind_code": b["kind_code"],
            "val": val,
        }
    )


def _qualified_val(qb: pa.Table, ents: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Composed value for qualified rows: ``<root_entity_id>.<tail>``
    (null when the root did not link — the row then drops at assembly
    exactly like an unlinked entity mention). Relies on canonical entity
    ids never containing '.' (assembly splits on the FIRST dot)."""
    parts = pc.split_pattern(qb["mention"], pattern=".", max_splits=1)
    tail = pc.list_element(parts, 1)  # qualified surfaces always contain '.'
    return pc.binary_join_element_wise(ents, tail, ".")  # null ent -> null


def _to_assembly_schema(b: pa.Table) -> pa.Table:
    """Collapse a linked mention batch (mention + entity_id + kind_code)
    to the narrow assembly schema: ONE value column (entity id for entity
    rows, verbatim surface for literal rows — a literal surface that
    collides with an entity surface must NOT pick up its entity_id —
    and <root_entity>.<tail> for qualified rows, whose entity_id column
    already holds the linked ROOT id). Qualified rows are processed as a
    filtered subset and re-appended — output row order differs from
    input, which is fine: assembly semantics live in (conv_id, turn_idx,
    mention_ord)."""
    is_q = pc.less_equal(b["kind_code"], _K_QUAL)
    has_q = bool(b.num_rows) and pc.any(is_q).as_py()
    base = b.filter(pc.invert(is_q)) if has_q else b
    is_ent = pc.equal(base["kind_code"], pa.scalar(0, pa.int8()))
    out = _narrow_assembly_table(base, pc.if_else(is_ent, base["entity_id"], base["mention"]))
    if has_q:
        qb = b.filter(is_q)
        out = pa.concat_tables([out, _narrow_assembly_table(qb, _qualified_val(qb, qb["entity_id"]))])
    return out


def apply_linkmap(
    mention_ds: ray.data.Dataset, linkmap: dict[str, str | None], batch_size: int | None
) -> ray.data.Dataset:
    """Two-phase linking, phase 2: broadcast lookup per mention row,
    fully vectorized — the dict ships as two parallel Arrow arrays and
    the probe is ``index_in`` + ``take`` (C kernels; unlinkable mentions
    come back null both via missing key and via null value). A stateless
    task (not an actor pool) so it fuses with the downstream assembly
    stage — no intermediate object-store hop."""
    keys = pa.array(sorted(linkmap), pa.string())
    values = pa.array([linkmap[k] for k in keys.to_pylist()], pa.string())
    table_ref = ray.put((keys, values))

    def lookup(batch: pa.Table) -> pa.Table:
        k, v = _deref_once(table_ref)
        if (
            "kind_code" in batch.schema.names
            and batch.num_rows
            and pa.types.is_dictionary(batch.schema.field("mention").type)
            # null mention rows (persisted emit_sentinels=True streams)
            # have NULL dictionary indices, which the fast path's
            # to_numpy->int64 cast would turn into INT64_MIN garbage
            # slots — the general path below is index_in-null-safe
            and _one_chunk(batch["mention"]).indices.null_count == 0
        ):
            # dictionary fast path (the _dict_compress-ed stream): every
            # string operation runs once per DISTINCT mention (the
            # block's dictionary), rows are pure integer indexing. The
            # output val column is itself a dictionary whose values are
            # [linked(U) | U | composed(qualified Us)] and whose index
            # encodes (slot, code) — assemble_conv_local_fast re-encodes
            # it, so duplicate/null dictionary VALUES are fine.
            mcol = _one_chunk(batch["mention"])
            U = mcol.dictionary
            u = len(U)
            codes = mcol.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            kind = _one_chunk(batch["kind_code"]).to_numpy(zero_copy_only=False)
            linked = pc.take(v, pc.index_in(U, value_set=k))
            arrs = [linked, U]
            qrows = kind <= -2
            if qrows.any():
                qcodes = np.unique(codes[qrows])
                qU = pc.take(U, pa.array(qcodes))
                parts = pc.split_pattern(qU, pattern=".", max_splits=1)
                roots = pc.list_element(parts, 0)
                tails = pc.list_element(parts, 1)  # qualified surfaces always contain '.'
                qlinked = pc.take(v, pc.index_in(roots, value_set=k))
                arrs.append(pc.binary_join_element_wise(qlinked, tails, "."))
                qmap = np.zeros(u, dtype=np.int64)
                qmap[qcodes] = np.arange(len(qcodes), dtype=np.int64)
                qslot = 2 * u + qmap[codes]
            else:
                qslot = 0
            # qualified arm matches qrows EXACTLY (kind <= -2); kind -1
            # is unused by construction, but routing it into qslot would
            # silently compose garbage — treat it as a literal row like
            # the plain path below, and the parity stays a non-event
            slot = np.where(
                kind == 0, codes, np.where(kind <= -2, qslot, u + codes)
            )
            D = pa.concat_arrays([_one_chunk(a) for a in arrs])
            val = pa.DictionaryArray.from_arrays(pa.array(slot, pa.int64()), D)
            return pa.table(
                {
                    "conv_id": batch["conv_id"],
                    "turn_idx": batch["turn_idx"],
                    "mention_ord": batch["mention_ord"],
                    "tool": batch["tool"],
                    "kind_code": batch["kind_code"],
                    "val": val,
                }
            )
        if any(pa.types.is_dictionary(f.type) for f in batch.schema):
            batch = _dict_decode(batch)  # empty/odd blocks: plain path
        if "kind_code" in batch.schema.names:
            # ONE value column for assembly: linked entity id for entity
            # rows, the verbatim surface for literal rows, and
            # <root_entity>.<tail> for qualified rows (root probed
            # against the same linkmap; subset-filter + concat — row
            # order is irrelevant to assembly)
            is_q = pc.less_equal(batch["kind_code"], _K_QUAL)
            has_q = bool(batch.num_rows) and pc.any(is_q).as_py()
            base = batch.filter(pc.invert(is_q)) if has_q else batch
            ents = pc.take(v, pc.index_in(base["mention"], value_set=k))
            is_ent = pc.equal(base["kind_code"], pa.scalar(0, pa.int8()))
            out = _narrow_assembly_table(base, pc.if_else(is_ent, ents, base["mention"]))
            if has_q:
                qb = batch.filter(is_q)
                qents = pc.take(v, pc.index_in(_qualified_root(qb["mention"]), value_set=k))
                out = pa.concat_tables([out, _narrow_assembly_table(qb, _qualified_val(qb, qents))])
            return out
        pos = pc.index_in(batch["mention"], value_set=k)
        return batch.append_column("entity_id", pc.take(v, pos))

    return mention_ds.map_batches(lookup, batch_format="pyarrow", batch_size=batch_size)


_EMPTY_TRIPLES = {
    "subj": pd.Series(dtype="object"),
    "pred": pd.Series(dtype="object"),
    "obj": pd.Series(dtype="object"),
    "conv_id": pd.Series(dtype="object"),
    "turn_idx": pd.Series(dtype="int32"),
}


def assemble_conv_local(
    df: pd.DataFrame,
    literal_preds: list[str] | None = None,
    qualified_preds: list[str] | None = None,
) -> pd.DataFrame:
    """Vectorized triple assembly over a conv-complete batch (pandas
    merges, no per-conversation python loop). Semantically identical to
    assemble_triples_group applied per conversation (pytest cross-checked
    — that loop is the readable spec, this is the hot path). ONLY correct
    when every conversation's rows are fully contained in the batch (the
    conv-disjoint-shards layout)."""
    if df.empty:
        return pd.DataFrame(_EMPTY_TRIPLES)
    df = _normalize_assembly_frame(df)
    # ALL grouping/joining below runs on one fused int64 key
    # _tk = conv_code * T + turn_idx (T > max turn + 1, so turn+1
    # arithmetic never crosses a conversation boundary): int merges and
    # int sorts instead of string-keyed ones — the string conv_id is
    # decoded back only on the final output rows
    conv_codes, conv_uniq = pd.factorize(df["conv_id"])
    turn = df["turn_idx"].to_numpy()
    T = int(turn.max()) + 2
    df = df.assign(_tk=conv_codes.astype(np.int64) * T + turn)
    df = df.sort_values(["_tk", "mention_ord"], kind="mergesort")
    # entity rows AND qualified roots join the turn's entity graph
    ent_rows = df[(df["kind_code"] == 0) | (df["kind_code"] <= -2)]

    # linked entities per turn, deduped keep-first in mention order
    ent = ent_rows.dropna(subset=["entity_id"]).drop_duplicates(
        subset=["_tk", "entity_id"], keep="first"
    )[["_tk", "entity_id", "tool"]].copy()
    if ent.empty:
        return pd.DataFrame(_EMPTY_TRIPLES)
    ent["rank"] = ent.groupby("_tk", sort=False).cumcount()

    # mentions: ordered pairs (rank_i < rank_j) within a turn
    p = ent.merge(ent, on="_tk", suffixes=("_i", "_j"))
    p = p[(p["rank_i"] < p["rank_j"]) & (p["entity_id_i"] != p["entity_id_j"])]
    mentions = pd.DataFrame(
        {
            "subj": p["entity_id_i"],
            "pred": "mentions",
            "obj": p["entity_id_j"],
            "_tk": p["_tk"],
        }
    )

    # uses_tool: every entity of a turn with a non-empty tool (the tool
    # column is constant across one turn's mention rows)
    ut = ent[ent["tool"] != ""]
    uses = pd.DataFrame(
        {
            "subj": ut["entity_id"],
            "pred": "uses_tool",
            "obj": ut["tool"],
            "_tk": ut["_tk"],
        }
    )

    # replies_to: first entity of turn t -> first entity of turn t-1, both
    # turns entity-bearing and adjacent (tk+1 == same conv, next turn)
    first = ent[ent["rank"] == 0][["_tk", "entity_id"]]
    prev = first.rename(columns={"entity_id": "entity_id_prev"}).copy()
    prev["_tk"] = prev["_tk"] + 1
    rt = first.merge(prev, on="_tk")
    replies = pd.DataFrame(
        {
            "subj": rt["entity_id"],
            "pred": "replies_to",
            "obj": rt["entity_id_prev"],
            "_tk": rt["_tk"],
        }
    )

    # literal families: (first entity of the turn, family PRED, surface) —
    # one vectorized merge against the rank-0 entities, no Python loop
    parts = [mentions, uses, replies]
    lit = df[(df["kind_code"] > 0) & df["surface"].notna()]
    if not lit.empty:
        pred_map = {i + 1: p for i, p in enumerate(_literal_preds(literal_preds))}
        lt = lit.merge(first.rename(columns={"entity_id": "_subj"}), on="_tk")
        parts.append(
            pd.DataFrame(
                {
                    "subj": lt["_subj"],
                    "pred": lt["kind_code"].map(pred_map),
                    "obj": lt["surface"],
                    "_tk": lt["_tk"],
                }
            )
        )

    # qualified families: hierarchy triples (root entity, PRED, member
    # tail) — no merge needed, the root IS the subject
    q = df[(df["kind_code"] <= -2) & df["entity_id"].notna() & df["surface"].notna()]
    if not q.empty:
        qpred_map = {
            -2 - i: p for i, p in enumerate(_qualified_preds_list(qualified_preds))
        }
        parts.append(
            pd.DataFrame(
                {
                    "subj": q["entity_id"],
                    "pred": q["kind_code"].map(qpred_map),
                    "obj": q["surface"],
                    "_tk": q["_tk"],
                }
            )
        )

    out = pd.concat(parts, ignore_index=True)
    out = out.drop_duplicates(subset=["subj", "pred", "obj", "_tk"], keep="first")
    tk = out.pop("_tk").to_numpy()
    out["conv_id"] = np.asarray(conv_uniq)[tk // T]
    out["turn_idx"] = (tk % T).astype("int32")
    return out.reset_index(drop=True)


def _assemble_conv_local_arrow(
    df: pd.DataFrame,
    literal_preds: list[str] | None = None,
    qualified_preds: list[str] | None = None,
) -> pa.Table:
    """Arrow wrapper with the explicit TRIPLE_SCHEMA so empty outputs keep
    their schema (a Dataset whose every block is an empty pandas frame
    loses column information)."""
    out = assemble_conv_local(df, literal_preds, qualified_preds)
    return pa.Table.from_pandas(out, schema=TRIPLE_SCHEMA, preserve_index=False)


def _assemble_group_arrow(df: pd.DataFrame) -> pa.Table:
    out = assemble_triples_group(df)
    return pa.Table.from_pandas(out, schema=TRIPLE_SCHEMA, preserve_index=False)


def _first_occurrence_sorted(keys: list[np.ndarray]) -> np.ndarray:
    """Ascending positions of the FIRST occurrence of each distinct key
    tuple (keep-first dedup that preserves original row order). ``keys``
    are equal-length int arrays, least-significant first (np.lexsort
    convention)."""
    n = len(keys[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    pos = np.arange(n, dtype=np.int64)
    order = np.lexsort([pos] + keys)  # stable: ties resolve to lowest pos
    changed = np.zeros(len(order), dtype=bool)
    for k in keys:
        ks = k[order]
        np.logical_or(changed[1:], ks[1:] != ks[:-1], out=changed[1:])
    changed[0] = True
    # runs are contiguous after the sort and each run's first element has
    # the smallest original position (pos was the final tiebreak)
    return np.sort(order[np.flatnonzero(changed)])


def assemble_conv_local_fast(
    batch: pa.Table,
    literal_preds: list[str] | None = None,
    qualified_preds: list[str] | None = None,
) -> pa.Table:
    """Arrow/numpy twin of ``assemble_conv_local``: every merge, dedup
    and rank runs on int codes (dictionary indices); strings are touched
    only in the per-block dictionaries (O(distinct), not O(rows)) and in
    the final C-kernel ``pc.take`` decode. Output rows and row ORDER are
    identical to the pandas kernel (pytest-pinned) at ~3x less CPU and a
    fraction of the memory traffic — the pandas kernel dragged object
    strings through every take/merge, which thrashes at 32-way
    parallelism. Requires the narrow (val + kind_code) assembly schema;
    pandas-schema callers go through assemble_conv_local."""
    if batch.num_rows == 0:
        return TRIPLE_SCHEMA.empty_table()
    b = batch.combine_chunks()

    def _codes(col) -> tuple[np.ndarray, pa.Array]:
        """(int64 codes with -1 for null, unique non-null values).

        Accepts plain string columns AND the pre-dictionary-encoded
        stream (whose dictionaries may hold duplicate or null VALUES —
        the lookup stage's composed val dictionary does): those are
        re-encoded on the small dictionary and the row indices remapped,
        so code equality always means string equality."""
        col = _one_chunk(col)
        if pa.types.is_dictionary(col.type):
            small = col.dictionary
            idx = pc.fill_null(col.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)
            enc = pc.dictionary_encode(small)
            cmap = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)
            codes = np.where(idx >= 0, cmap[np.maximum(idx, 0)], -1)
            return codes, enc.dictionary
        d = pc.dictionary_encode(col)
        codes = pc.fill_null(d.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        return codes, d.dictionary

    ccode, conv_uniq = _codes(b["conv_id"])  # never -1: conv_id non-null
    vcode, vals_u = _codes(b["val"])
    u = len(vals_u)
    if u == 0:
        return TRIPLE_SCHEMA.empty_table()  # every value null -> no entities
    tcode, tools_u = _codes(b["tool"])
    # sentinel must be a code NO row can carry: null tool decodes to -1,
    # and the pandas spec (tool != '') KEEPS null-tool rows as null-obj
    # triples — -1 here would silently drop them when '' is absent
    tool_empty = -2
    for i, t in enumerate(tools_u.to_pylist()):
        if t == "":
            tool_empty = i
            break

    kind = b["kind_code"].to_numpy(zero_copy_only=False).astype(np.int64)
    turn = b["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    ords = b["mention_ord"].to_numpy(zero_copy_only=False).astype(np.int64)
    T = int(turn.max()) + 2
    tk = ccode * T + turn

    # per-UNIQUE-val split of qualified "<root>.<tail>" values (canonical
    # entity ids never contain '.'): strings handled once per distinct
    # value, not once per row
    us = pd.Series(np.asarray(vals_u.to_pandas(), dtype=object))
    sp = us.str.split(".", n=1, expand=True)
    if 1 not in sp.columns:
        sp[1] = None
    root_u = sp[0].to_numpy(dtype=object)
    tail_u = sp[1].to_numpy(dtype=object)
    # entity-code space: val-as-entity (kind 0 rows) union root-as-entity
    # (qualified rows)
    e_all, ents_u = pd.factorize(np.concatenate([us.to_numpy(dtype=object), root_u]))
    e_of_val, e_of_root = e_all[:u], e_all[u:]
    tail_valid = tail_u != None  # noqa: E711  (object-array null test)

    order = np.lexsort((ords, tk))
    tk_s, kind_s, vcode_s, tcode_s = tk[order], kind[order], vcode[order], tcode[order]

    # --- entity rows: kind 0 (ecode = val) and kind <= -2 (ecode = root)
    is_entrow = ((kind_s == 0) | (kind_s <= -2)) & (vcode_s >= 0)
    ent_idx = np.flatnonzero(is_entrow)
    ent_tk = tk_s[ent_idx]
    ek = kind_s[ent_idx]
    ev = vcode_s[ent_idx]
    ecode = np.where(ek == 0, e_of_val[ev], e_of_root[ev])
    n_ents = len(ents_u)
    # keep-first dedup on (tk, ecode) — rows already in (tk, ord) order
    _, fidx = np.unique(ent_tk * n_ents + ecode, return_index=True)
    fidx = np.sort(fidx)
    ent_tk, ecode, etool = ent_tk[fidx], ecode[fidx], tcode_s[ent_idx][fidx]
    if len(ent_tk) == 0:
        return TRIPLE_SCHEMA.empty_table()

    # group boundaries per turn (ent_tk ascending)
    gstart = np.flatnonzero(np.r_[True, ent_tk[1:] != ent_tk[:-1]])
    gsize = np.diff(np.r_[gstart, len(ent_tk)])
    gpos = np.arange(len(ent_tk)) - np.repeat(gstart, gsize)  # rank in turn

    # --- mentions: ordered pairs (i < j) within a turn, e_i != e_j
    rem = (np.repeat(gsize, gsize) - gpos - 1).astype(np.int64)
    tot = int(rem.sum())
    if tot:
        starts = np.cumsum(rem) - rem
        ii = np.repeat(np.arange(len(ent_tk)), rem)
        jj = np.arange(tot) - starts[ii] + ii + 1
        keep = ecode[ii] != ecode[jj]
        m_tk, m_s, m_o = ent_tk[ii][keep], ecode[ii][keep], ecode[jj][keep]
    else:
        m_tk = m_s = m_o = np.empty(0, dtype=np.int64)

    # --- uses_tool
    um = etool != tool_empty
    u_tk, u_s, u_o = ent_tk[um], ecode[um], etool[um]

    # --- replies_to: first entity of turn t -> first entity of turn t-1
    f_tk = ent_tk[gstart]
    f_e = ecode[gstart]
    prev_pos = np.searchsorted(f_tk, f_tk - 1)
    has_prev = (prev_pos < len(f_tk)) & (f_tk[np.minimum(prev_pos, len(f_tk) - 1)] == f_tk - 1)
    r_tk, r_s, r_o = f_tk[has_prev], f_e[has_prev], f_e[prev_pos[has_prev]]

    # --- literal families: (first entity of the turn, family PRED, surface)
    lit_mask = (kind_s > 0) & (vcode_s >= 0)
    l_idx = np.flatnonzero(lit_mask)
    l_tk = tk_s[l_idx]
    lpos = np.searchsorted(f_tk, l_tk)
    l_has = (lpos < len(f_tk)) & (f_tk[np.minimum(lpos, len(f_tk) - 1)] == l_tk)
    l_idx, l_tk, lpos = l_idx[l_has], l_tk[l_has], lpos[l_has]
    l_s = f_e[lpos]
    l_o = vcode_s[l_idx]  # obj in val space
    l_k = kind_s[l_idx]

    # --- qualified hierarchy: (root entity, PRED, member tail)
    q_mask = (kind_s <= -2) & (vcode_s >= 0)
    q_idx = np.flatnonzero(q_mask)
    q_v = vcode_s[q_idx]
    qt = tail_valid[q_v]
    q_idx, q_v = q_idx[qt], q_v[qt]
    q_tk = tk_s[q_idx]
    q_s = e_of_root[q_v]
    q_o = q_v  # obj in val space (decoded via tail_u)
    q_k = kind_s[q_idx]

    # --- predicate code space: 0=mentions 1=uses_tool 2=replies_to,
    # 3.. literal families, then qualified families
    lits = _literal_preds(literal_preds)
    quals = _qualified_preds_list(qualified_preds)
    pred_strings = ["mentions", "uses_tool", "replies_to"] + list(lits) + list(quals)
    l_p = l_k + 2  # kind 1.. -> 3..
    q_p = (-2 - q_k) + 3 + len(lits)

    all_tk = np.concatenate([m_tk, u_tk, r_tk, l_tk, q_tk])
    all_p = np.concatenate(
        [
            np.zeros(len(m_tk), dtype=np.int64),
            np.ones(len(u_tk), dtype=np.int64),
            np.full(len(r_tk), 2, dtype=np.int64),
            l_p,
            q_p,
        ]
    )
    all_s = np.concatenate([m_s, u_s, r_s, l_s, q_s])
    all_o = np.concatenate([m_o, u_o, r_o, l_o, q_o])
    # keep-first dedup on (subj, pred, obj, tk): obj codes live in the
    # pred's own space (entity / tool / val), so (pred, obj-code)
    # equality == (pred, obj-string) equality
    keep = _first_occurrence_sorted([all_o, all_s, all_p, all_tk])
    all_tk, all_p, all_s, all_o = all_tk[keep], all_p[keep], all_s[keep], all_o[keep]

    # --- decode via C-kernel takes on the small dictionaries
    subj = pc.take(pa.array(ents_u, pa.string()), pa.array(all_s))
    pred = pc.take(pa.array(pred_strings, pa.string()), pa.array(all_p))
    # obj: entity space for mentions/replies, tool space for uses_tool,
    # val space for literals, tail space for qualified
    obj_np = np.empty(len(all_o), dtype=object)
    ents_np = np.asarray(ents_u, dtype=object)
    esp = (all_p == 0) | (all_p == 2)
    obj_np[esp] = ents_np[all_o[esp]]
    tsp = all_p == 1
    if tsp.any():
        tools_np = np.asarray(tools_u.to_pandas(), dtype=object)
        tcodes = all_o[tsp]
        tvals = np.empty(len(tcodes), dtype=object)
        tm = tcodes >= 0
        tvals[tm] = tools_np[tcodes[tm]]
        tvals[~tm] = None  # null tool: pandas spec emits a null-obj row
        obj_np[tsp] = tvals
    lsp = (all_p >= 3) & (all_p < 3 + len(lits))
    if lsp.any():
        vals_np = us.to_numpy(dtype=object)
        obj_np[lsp] = vals_np[all_o[lsp]]
    qsp = all_p >= 3 + len(lits)
    if qsp.any():
        obj_np[qsp] = tail_u[all_o[qsp]]
    return pa.table(
        {
            "subj": subj,
            "pred": pred,
            "obj": pa.array(obj_np, pa.string()),
            "conv_id": pc.take(conv_uniq, pa.array(all_tk // T)),
            "turn_idx": pa.array((all_tk % T).astype(np.int32), pa.int32()),
        },
        schema=TRIPLE_SCHEMA,
    )


# floor for the general-path assembly shuffle; the effective count scales
# with cluster CPUs via auto_buckets() (a constant 64 would hand each
# map_groups task 1/64th of all conversations regardless of cluster size)
ASSEMBLY_BUCKETS = 64


def _assembly_buckets() -> int:
    from ..functions.concurrency import auto_buckets

    return auto_buckets(floor=ASSEMBLY_BUCKETS)


def _add_conv_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Coarse deterministic shuffle key on conv_id (shared helper)."""
    from ..functions.bucketing import add_key_bucket

    return add_key_bucket(batch, "conv_id", num_buckets, out_col="_conv_bucket")


def build_kg(
    paths: list[str] | str,
    catalog: pa.Table,
    mapping: dict[str, str] | None = None,
    concurrency: int | None = None,
    conv_local_shards: bool = False,
    two_phase: bool = True,
    distributed_linkmap: bool | None = None,
    extractor_dirs: list[str] | None = None,
    link_params: dict | None = None,
    spill_stream: bool | None = None,
    stream_spill_dir: str | None = None,
) -> ray.data.Dataset:
    """transcript parquet paths + catalog -> streaming Dataset of triples.

    ``two_phase=True`` (default) links each DISTINCT mention once
    globally (per-block unique -> tiny global unique -> parallel link
    tasks -> broadcast dict lookup) instead of running a linker actor
    pool where every actor pays the unique-mention warmup; identical
    output (pytest cross-checked), ~10x less link compute when surface
    forms repeat. ``two_phase=False`` keeps the streaming actor-pool
    linker (no global barrier — the right shape when the mention stream
    is unbounded or uniques don't fit a broadcast).

    ``conv_local_shards=True`` is the scale fast path: when the input
    files are partitioned by conversation (a conv never spans files — the
    layout a 100 TB ingest should produce, and what sources/synth.py
    generates), the per-conversation assembly needs NO shuffle at all:
    blocks are kept file-aligned (override_num_blocks=n_files,
    batch_size=None end-to-end so batches == blocks and a conversation is
    never split), and assembly runs per block with an inner pandas
    groupby. The general path pays one all-to-all groupby(conv_id)
    instead; both produce identical triples (pytest-checked).

    ``spill_stream`` (None = auto above _STREAM_PIN_MAX_INPUT_BYTES of
    local input) swaps the two-phase branch's object-store pin of the
    mention stream for a one-pass parquet spill to ``stream_spill_dir``
    (default: a fresh /tmp dir; at cluster scale pass shared storage —
    the files are the same schema run_resumable persists for relink
    resume). Unique and lookup passes then stream from the files;
    nothing holds the full stream in memory. Identical triples either
    branch (pytest-pinned)."""
    if mapping is None:
        mapping = canonical_mapping(catalog.to_pylist())
    if isinstance(paths, str):
        paths = [paths]
    paths = _strip_file_scheme(paths)
    # prune at the read: the KG build consumes conv_id/turn_idx/text/tool
    # only — role and ts never reach a triple, so they never leave storage
    _KG_COLS = ["conv_id", "turn_idx", "text", "tool"]
    if conv_local_shards:
        ds = ray.data.read_parquet(paths, columns=_KG_COLS, override_num_blocks=len(paths))
        bs = None
    else:
        ds = ray.data.read_parquet(paths, columns=_KG_COLS)
        bs = 8192
    # external extractor families (registry override surface): load dirs
    # in the driver, CAPTURE the family plan (names + preds, ordered),
    # and ship plan + dirs through every registry-touching closure —
    # extraction and assembly (pred decoding). kind codes are positional
    # in the captured plan, so every worker agrees regardless of what
    # other families its process happens to have registered.
    from ..stages.extract import family_plan

    dirs = list(extractor_dirs or [])
    if dirs:
        from ..extractors import ensure_directories

        ensure_directories(dirs)
    ent_names, lit_specs, qual_specs = family_plan()
    lit_preds = [p for _n, p in lit_specs]
    qual_preds = [p for _n, p in qual_specs]

    def _ensure_dirs():
        if dirs:
            from ..extractors import ensure_directories as _ed

            _ed(dirs)

    def _extract(b: pa.Table) -> pa.Table:
        _ensure_dirs()
        return extract_mention_rows(
            b,
            include_role=False,
            entity_names=ent_names,
            literal_specs=lit_specs,
            qualified_specs=qual_specs,
        )

    def _assemble(b: pa.Table) -> pa.Table:
        return assemble_conv_local_fast(
            b, literal_preds=lit_preds, qualified_preds=qual_preds
        )

    def _assemble_group(df: pd.DataFrame) -> pa.Table:
        # map_groups hands pandas frames; the fast kernel is Arrow-native
        return assemble_conv_local_fast(
            pa.Table.from_pandas(df, preserve_index=False),
            literal_preds=lit_preds,
            qualified_preds=qual_preds,
        )

    ds = ds.map_batches(
        lambda b: normalize_turns(b, with_uid=False), batch_format="pyarrow", batch_size=bs
    )
    ds = ds.map_batches(_extract, batch_format="pyarrow", batch_size=bs)
    if two_phase:
        # The mention stream is consumed twice (unique pass + lookup
        # pass). SIZE-TRIGGERED storage choice for that reuse:
        #   small input  -> pin the dictionary-compressed stream in the
        #                   object store (~3x smaller than raw; zero I/O)
        #   large input  -> stream extraction ONCE into parquet files and
        #                   run both passes from disk — pinning would hold
        #                   the whole stream (TBs at 10^12 turns) in
        #                   plasma/spill for the length of the job
        if spill_stream is None:
            in_bytes = _paths_bytes(paths)
            spill_stream = (
                in_bytes is not None and in_bytes > _stream_pin_max_input_bytes()
            )
        stream_files: list[str] | None = None
        if spill_stream:
            import os
            import tempfile

            sdir = stream_spill_dir or tempfile.mkdtemp(prefix="kg_mention_stream_")
            os.makedirs(sdir, exist_ok=True)
            stale = [f for f in os.listdir(sdir) if f.endswith(".parquet")]
            if stale:
                # silently mixing a previous run's shards into the
                # stream would duplicate every conversation (and its
                # triples); for REPLAY over persisted streams use
                # build_kg_from_mention_stream instead
                raise FileExistsError(
                    f"stream_spill_dir {sdir!r} already holds "
                    f"{len(stale)} parquet file(s); pass a fresh dir"
                )
            # one file per block: blocks are conv-complete (file-aligned
            # on the conv-local path; irrelevant on the general path), so
            # the re-read below keeps conversations whole per block
            ds.write_parquet(sdir)
            stream_files = sorted(
                os.path.join(sdir, f)
                for f in os.listdir(sdir)
                if f.endswith(".parquet")
            )

            def _stream_ds(compress: bool = True) -> ray.data.Dataset:
                d = ray.data.read_parquet(
                    stream_files, override_num_blocks=len(stream_files)
                )
                if compress:
                    d = d.map_batches(
                        _dict_compress, batch_format="pyarrow", batch_size=None
                    )
                return d

            ds = _stream_ds()
        else:
            ds = ds.map_batches(_dict_compress, batch_format="pyarrow", batch_size=bs)
            ds = ds.materialize()
        # SIZE-TRIGGERED branch selection (not a code edit): the per-block
        # unique pass runs once; its row count upper-bounds the distinct
        # surface count. Small -> driver union + broadcast dict lookup
        # (no shuffle). Large -> distributed distinct + partitioned
        # map-side join (no driver/broadcast state).
        uniq_blocks_ds = ds.map_batches(_block_unique, batch_format="pyarrow").materialize()
        # The raw per-block-unique row count is SUM(block uniques) — an
        # upper bound on the global distinct count that overestimates by
        # ~the block count when surfaces repeat across blocks (at 384
        # input files a ~100k-distinct vocabulary summed to 27M rows and
        # wrongly escalated to the distributed branch). Collapse
        # cross-block duplicates with a SHUFFLE-FREE fan-in tree
        # (repartition concatenates adjacent blocks; per-block unique
        # again) before deciding; genuinely high-cardinality streams
        # barely shrink and escalate after one round.
        uniq_count = uniq_blocks_ds.count()
        while uniq_count > _DISTINCT_BROADCAST_MAX:
            target = max(1, uniq_blocks_ds.num_blocks() // 16)
            reduced = uniq_blocks_ds.repartition(target).map_batches(
                _block_unique, batch_format="pyarrow"
            ).materialize()
            rcount = reduced.count()
            shrunk = rcount < uniq_count * 0.75
            uniq_blocks_ds, uniq_count = reduced, rcount
            if not shrunk:
                break  # real cardinality, not block-count inflation
        use_distributed = (
            distributed_linkmap
            if distributed_linkmap is not None
            else uniq_count > _DISTINCT_BROADCAST_MAX
        )
        if use_distributed:
            # the link-key hash join below REPARTITIONS blocks by key —
            # conversation locality is destroyed, so assembly must take
            # the shuffled general path even for conv-disjoint inputs
            conv_local_shards = False
            # the join/repartition path works on plain string columns
            ds = ds.map_batches(_dict_decode, batch_format="pyarrow")
            uniq_ds = uniq_blocks_ds.groupby("mention").aggregate(
                _RayCount(alias_name="_n")
            ).select_columns(["mention"])
            lm_ds = linkmap_dataset(uniq_ds, catalog, mapping, link_params=link_params)
            # join key: the mention itself, except qualified rows join on
            # their ROOT segment (the linkable half of root.member)
            lm_ds = lm_ds.map_batches(
                lambda b: b.rename_columns(["_link_key", "entity_id"]),
                batch_format="pyarrow",
            )
            ds = ds.map_batches(_add_link_key, batch_format="pyarrow")
            ds = ds.join(
                lm_ds,
                join_type="left_outer",
                num_partitions=max(8, _auto_concurrency()),
                on=("_link_key",),
            )

            ds = ds.map_batches(_to_assembly_schema, batch_format="pyarrow")
        else:
            linkmap = unique_mention_linkmap(
                ds, catalog, mapping, parallelism=concurrency,
                uniq_blocks=uniq_blocks_ds.to_pandas(), link_params=link_params,
            )
            # batch == block here regardless of bs: a SLICED batch keeps
            # the whole block's dictionary, so the per-DISTINCT lookup
            # work would repeat once per slice (68x per block at
            # bs=8192 — measured as a 10x wall blowup on the general
            # path); the vectorized lookup has no reason to sub-batch
            ds = apply_linkmap(ds, linkmap, batch_size=None)
    else:
        ds = link_stage(
            ds, catalog, mapping, concurrency=concurrency, batch_size=bs, link_params=link_params
        )
        ds = ds.map_batches(_to_assembly_schema, batch_format="pyarrow")
    if conv_local_shards:
        return ds.map_batches(_assemble, batch_format="pyarrow", batch_size=None)
    # general path (input NOT partitioned by conversation): ONE all-to-all
    # shuffle on the COARSE key hash(conv_id) % ASSEMBLY_BUCKETS — never a
    # Ray group per conversation (millions of tiny groups at scale;
    # CLAUDE.md perf lesson) — then the vectorized multi-conversation
    # kernel per bucket. A bucket holds complete conversations by
    # construction, which is all assemble_conv_local requires.
    nb = _assembly_buckets()
    ds = ds.map_batches(
        # the shuffle + map_groups round-trips through pandas, which
        # rejects the compressed stream's null-valued dictionaries
        # (Categorical categories cannot be null) — decode first
        lambda b: _add_conv_bucket(_dict_decode(b), nb),
        batch_format="pyarrow",
        batch_size=bs,
    )
    return ds.groupby("_conv_bucket").map_groups(_assemble_group, batch_format="pandas")


def build_kg_from_dir(
    data_dir: str,
    concurrency: int | None = None,
    conv_local_shards: bool = True,
    **kwargs,
) -> ray.data.Dataset:
    """The synth generator guarantees conv-disjoint files, so the
    no-shuffle fast path is the default here.

    Input contract (violations diverge loudly or are documented, never
    silently): (1) files are CONVERSATION-DISJOINT — a conv spanning
    two files under conv_local_shards=True loses its cross-file
    replies_to edge and cross-file dedup; pass conv_local_shards=False
    for arbitrary file layouts (the one-shuffle general plan). (2)
    (conv_id, turn_idx) uniquely identifies a turn — duplicate
    turn_idx rows are merged per-turn by assembly and the SQL oracle
    but iterated per-row by the single-process oracle, so the parity
    gates only hold under uniqueness. (3) conv_id non-null and
    turn_idx >= 0 — normalize_turns and the oracle DROP violating
    rows identically (they are unattributable)."""
    catalog = load_catalog(data_dir)
    return build_kg(
        transcript_files(data_dir),
        catalog,
        concurrency=concurrency,
        conv_local_shards=conv_local_shards,
        **kwargs,
    )


def extract_mentions_ds(
    paths: list[str] | str, extractor_dirs: list[str] | None = None
) -> ray.data.Dataset:
    """The EXTRACTION half of build_kg alone: transcripts -> the narrow
    per-turn mention stream (conv_id, turn_idx, tool, mention,
    mention_ord, kind_code), block-aligned to the input files so
    conv-disjoint inputs stay conv-disjoint per output file. Persisting
    this stream is what makes catalog-only changes cheap to replay
    (reference semantics: keep clean files' extractions, re-RESOLVE all
    edges — deps/extractor.py:339-428, esp. 387-395)."""
    if isinstance(paths, str):
        paths = [paths]
    from ..stages.extract import family_plan

    dirs = list(extractor_dirs or [])
    if dirs:
        from ..extractors import ensure_directories

        ensure_directories(dirs)
    ent_names, lit_specs, qual_specs = family_plan()

    def _extract(b: pa.Table) -> pa.Table:
        if dirs:
            from ..extractors import ensure_directories as _ed

            _ed(dirs)
        return extract_mention_rows(
            b,
            include_role=False,
            entity_names=ent_names,
            literal_specs=lit_specs,
            qualified_specs=qual_specs,
        )

    paths = _strip_file_scheme(list(paths))
    ds = ray.data.read_parquet(paths, override_num_blocks=len(paths))
    ds = ds.map_batches(
        lambda b: normalize_turns(b, with_uid=False), batch_format="pyarrow", batch_size=None
    )
    return ds.map_batches(_extract, batch_format="pyarrow", batch_size=None)


def build_kg_from_mention_stream(
    mention_paths: list[str],
    catalog: pa.Table,
    mapping: dict[str, str] | None = None,
    concurrency: int | None = None,
    link_params: dict | None = None,
) -> ray.data.Dataset:
    """The LINK + ASSEMBLY half of build_kg over a PERSISTED mention
    stream (written by extract_mentions_ds): two-phase broadcast linking
    then the zero-shuffle conv-local assembly. Requires the stream files
    to be conversation-complete (one extraction output file per
    conv-disjoint input file — the layout extract_mentions_ds produces).
    This is the catalog-change replay path: extraction is NOT re-run."""
    if mapping is None:
        mapping = canonical_mapping(catalog.to_pylist())
    from ..stages.extract import family_plan

    _ents, lit_specs, qual_specs = family_plan()
    lit_preds = [p for _n, p in lit_specs]
    qual_preds = [p for _n, p in qual_specs]

    def _assemble(b: pa.Table) -> pa.Table:
        return assemble_conv_local_fast(
            b, literal_preds=lit_preds, qualified_preds=qual_preds
        )

    mention_paths = _strip_file_scheme(list(mention_paths))
    ds = ray.data.read_parquet(mention_paths, override_num_blocks=len(mention_paths))
    # same dictionary compression as the cold path (fused with the read)
    # so replay gets the per-unique lookup + int-code assembly too
    ds = ds.map_batches(_dict_compress, batch_format="pyarrow", batch_size=None)
    # consumed twice (unique pass + lookup pass): pin in the object store
    # only while the stream is small; above the threshold each pass just
    # re-reads the files it already lives in (same size-trigger
    # discipline as build_kg's spill branch)
    stream_bytes = _paths_bytes(list(mention_paths))
    if stream_bytes is None or stream_bytes <= _stream_pin_max_input_bytes():
        ds = ds.materialize()
    uniq_blocks = ds.map_batches(_block_unique, batch_format="pyarrow").to_pandas()
    linkmap = unique_mention_linkmap(
        ds, catalog, mapping, parallelism=concurrency,
        uniq_blocks=uniq_blocks, link_params=link_params,
    )
    ds = apply_linkmap(ds, linkmap, batch_size=None)
    return ds.map_batches(_assemble, batch_format="pyarrow", batch_size=None)


def normalized_turns_ds(data_dir: str) -> ray.data.Dataset:
    """M0 slice: read -> normalize (used by the ordering-invariant test)."""
    ds = ray.data.read_parquet(transcript_files(data_dir))
    return ds.map_batches(normalize_turns, batch_format="pyarrow")


CONTEXT_MAX_CHARS = 400  # bounded provenance (the reference caps expanded
# context at 50 lines x 200 chars; search/context_expander.py:28-29)
CONTEXT_MAX_WINDOW = 8  # hard cap on the +-k turn window (a triple's
# expanded context is <= (2k+1) x CONTEXT_MAX_CHARS chars by construction)


def triples_with_context(
    triples: ray.data.Dataset, data_dir: str, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Provenance re-attachment: join each triple back to its source turn
    text — the reference's context-expansion analog (expand a result to
    its enclosing source block, search/context_expander.py), done as a
    distributed hash join on (conv_id, turn_idx). The design keeps text
    OUT of every upstream shuffle and re-joins it once at the end
    (SURVEY.md §7.5.5); text is truncated to CONTEXT_MAX_CHARS."""
    import pyarrow.compute as pc

    if num_partitions is None:
        num_partitions = max(16, _auto_concurrency())
    turns = normalized_turns_ds(data_dir).select_columns(["conv_id", "turn_idx", "text"])

    def truncate(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.schema.get_field_index("text"),
            "text",
            pc.utf8_slice_codeunits(b["text"], 0, CONTEXT_MAX_CHARS),
        )

    turns = turns.map_batches(truncate, batch_format="pyarrow")
    return triples.join(
        turns,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("conv_id", "turn_idx"),
    )


def triples_with_window_context(
    triples: ray.data.Dataset,
    data_dir: str,
    window: int = 1,
    num_partitions: int | None = None,
    max_chars: int = CONTEXT_MAX_CHARS,
) -> ray.data.Dataset:
    """Context expansion to a +-``window``-turn range: the reference
    expands a hit to its enclosing block with hard caps
    (search/context_expander.py:165-, caps at 28-29); the transcript
    analog expands a triple to the surrounding turns of its conversation.

    Expressed as a JOIN AGAINST TURN RANGES, never per-row Python: each
    triple explodes into 2k+1 probe rows (ctx_off in [-k..k], ctx turn =
    turn_idx + ctx_off — one vectorized Arrow pass), which hash-join the
    truncated turn table on (conv_id, turn). Output: one row per (triple,
    offset) with ctx_text (null when the conversation has no such turn).
    Caps: window <= CONTEXT_MAX_WINDOW (raises otherwise), per-turn text
    <= max_chars, so a triple's total context <= (2k+1) * max_chars."""
    if window < 0 or window > CONTEXT_MAX_WINDOW:
        raise ValueError(f"window must be in [0, {CONTEXT_MAX_WINDOW}], got {window}")
    if num_partitions is None:
        num_partitions = max(16, _auto_concurrency())

    offs = list(range(-window, window + 1))

    def explode(b: pa.Table) -> pa.Table:
        n = b.num_rows
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), len(offs)))
        out = pa.table(
            {
                "subj": pc.take(b["subj"], idx),
                "pred": pc.take(b["pred"], idx),
                "obj": pc.take(b["obj"], idx),
                "conv_id": pc.take(b["conv_id"], idx),
                "turn_idx": pc.take(b["turn_idx"], idx),
            }
        )
        off_col = pa.array(np.tile(np.array(offs, dtype=np.int32), n))
        ctx_turn = pc.add(pc.cast(out["turn_idx"], pa.int32()), off_col)
        return out.append_column("ctx_off", off_col).append_column("ctx_turn", ctx_turn)

    turns = normalized_turns_ds(data_dir).select_columns(["conv_id", "turn_idx", "text"])

    def truncate(b: pa.Table) -> pa.Table:
        t = pc.utf8_slice_codeunits(b["text"], 0, max_chars)
        return pa.table(
            {"conv_id": b["conv_id"], "ctx_turn": pc.cast(b["turn_idx"], pa.int32()), "ctx_text": t}
        )

    ctx_turns = turns.map_batches(truncate, batch_format="pyarrow")
    return triples.map_batches(explode, batch_format="pyarrow").join(
        ctx_turns,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("conv_id", "ctx_turn"),
    )
