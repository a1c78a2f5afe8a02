"""M4 — materialization: partitioned Parquet triple tables with
per-shard lineage manifests and checkpoint/resume.

Shards are the conv-disjoint input files (the generator partitions
conversations across files, so every stage of the per-shard pipeline —
including the groupby(conv_id) assembly and the tuple-key dedup — is
shard-local and shards are embarrassingly parallel; this is the layout a
100 TB run would use: process shard groups independently, skip finished
ones on restart). The global pieces (catalog index, canonical mapping)
are computed ONCE and broadcast to every shard run.

Write protocol per shard (SURVEY.md §7.5.4): stream write_parquet into a
temp dir -> atomic rename -> manifest (manifest implies data). Row counts
for the manifest come from the written Parquet footers, not a second
execution of the pipeline.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq

from ..sources.synth import load_catalog, transcript_files
from ..stages.canonicalize import canonical_mapping
from ..state.manifest import (
    commit_shard,
    input_fingerprint,
    list_manifests,
    shard_is_done,
    shard_output_dir,
)
from .kg import build_kg


def _dir_row_count(d: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, f)).num_rows
    return total


def run_resumable(
    data_dir: str,
    out_dir: str,
    concurrency: int | None = None,
    fail_after_shards: int | None = None,
    subj_buckets: int | None = None,
    kg_kwargs: dict | None = None,
    group_size: int = 1,
    canon_params: dict | None = None,
    keep_mentions: bool = True,
) -> dict:
    """Build the triple table for ``data_dir`` under ``out_dir``; skips
    shards already committed with a matching input fingerprint.
    ``fail_after_shards`` injects a crash after N shard commits (used by
    the resume test). Returns run stats.

    ``keep_mentions`` (default on) persists each shard's extracted
    mention stream under ``out_dir/_mentions/shard=<id>`` so that a
    CATALOG-ONLY change (globals_hash mismatch with matching input +
    extraction fingerprints) replays just link + assembly from the saved
    stream instead of re-running the expensive extraction half — the
    reference's resume split: extractions of clean files are kept, all
    edges re-RESOLVED (deps/extractor.py:339-428, esp. 387-395). Stats
    report such shards under ``shards_relinked``.

    ``group_size``: input files per pipeline run / manifest. 1 = finest
    checkpoint granularity (one manifest per file). At small shard sizes
    the per-shard FIXED cost (pipeline setup, unique pass, linkmap,
    barriers) dominates — grouping amortizes it G-fold at the price of
    G-file resume granularity. Measured on the 128-file / 30M-turn
    bench tier at 32 cpus: G=1 ~4.8 s/shard (~620 s total), G=16 56 s
    total, one streaming non-resumable build 23 s; noop rerun 0.6 s.
    Changing G renames the shard ids, which invalidates all manifests —
    pick it once per output dir."""
    os.makedirs(out_dir, exist_ok=True)
    # fingerprint the catalog BEFORE loading it, and re-check after: a
    # catalog swapped in between (atomic regeneration landing mid-start)
    # would otherwise stamp every shard with the NEW bytes' globals_hash
    # while the linkmap was built from the OLD bytes — and the next run
    # on the new catalog would then skip every stale shard forever
    catalog_path = os.path.join(data_dir, "catalog.parquet")
    catalog_fp = input_fingerprint(catalog_path)
    catalog = load_catalog(data_dir)
    if input_fingerprint(catalog_path) != catalog_fp:
        raise RuntimeError(
            f"{catalog_path} changed while starting the run — rerun"
        )
    cp = canon_params or {}
    mapping = canonical_mapping(catalog.to_pylist(), **cp)

    # run-global fingerprint: catalog bytes + the canonicalization/link
    # parameters that shape EVERY shard's linkmap. Any change here must
    # rebuild all shards — the reference's global re-resolution semantics
    # (new catalog entries can resolve previously-unlinkable mentions,
    # deps/extractor.py:387-395).
    import hashlib
    import json

    from ..stages.canonicalize import JACCARD_THRESHOLD, MAX_BUCKET

    jt = cp.get("threshold", JACCARD_THRESHOLD)
    mb = cp.get("max_bucket", MAX_BUCKET)
    lp = (kg_kwargs or {}).get("link_params") or {}
    globals_hash = hashlib.sha256(
        f"{catalog_fp}|jt={jt}|mb={mb}|link={sorted(lp.items())}"
        f"|encoder=hash-sha256|dim=768".encode()
    ).hexdigest()

    # index-metadata registry + model-mismatch guard (reference shape:
    # management/metadata.py + flow.py:299-315 — warn when an index built
    # with a different embedding model is being updated)
    meta_path = os.path.join(out_dir, "_index_meta.json")
    meta = {
        "encoder": "hash-sha256",
        "dim": 768,
        "data_dir": data_dir,
        "globals_hash": globals_hash,
        "schema_version": TRIPLE_SCHEMA_VERSION,
    }
    meta_stale = True
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            old = json.load(f)
        if (old.get("encoder"), old.get("dim")) != (meta["encoder"], meta["dim"]):
            print(
                f"WARNING: index at {out_dir} was built with "
                f"{old.get('encoder')}/{old.get('dim')}; now using "
                f"{meta['encoder']}/{meta['dim']} — results will mix models"
            )
        meta_stale = old != meta
    # the (atomic, tmp+rename) rewrite happens AFTER the shard loop —
    # manifest-last ordering: writing the new schema_version up front
    # would make detect_output_features report a version no shard has
    # been rebuilt to yet if the run crashes mid-way (ADVICE r02 was the
    # stale-behind direction; round-5 review found the ahead-of-data
    # inversion). Any drift (e.g. a schema bump without a globals
    # change) is still rewritten, just last.

    # extraction fingerprint: the captured family plan + the stream
    # schema version — a saved mention stream is replayable only when
    # extraction semantics are unchanged. Directory-loaded extractor
    # families (a USER surface) must register BEFORE the plan is
    # captured, or the hash would cover only the base registry while
    # the streams carry the extra families' mentions (round-5 review)
    from ..extractors import ensure_directories
    from ..stages.extract import family_plan

    ensure_directories((kg_kwargs or {}).get("extractor_dirs"))
    plan = family_plan()
    extract_hash = hashlib.sha256(
        f"{plan}|mention_stream=v{MENTION_STREAM_VERSION}".encode()
    ).hexdigest()

    files = transcript_files(data_dir)
    gs = max(1, group_size)
    if gs == 1:
        shards = [(f"{i:04d}", [p]) for i, p in enumerate(files)]
    else:
        shards = [
            (f"g{gi:04d}", files[lo : lo + gs])
            for gi, lo in enumerate(range(0, len(files), gs))
        ]

    def _input_hash(paths: list[str]) -> str:
        if len(paths) == 1:
            return input_fingerprint(paths[0])
        return hashlib.sha256(
            "|".join(input_fingerprint(p) for p in paths).encode()
        ).hexdigest()

    def _mentions_dir(sid: str) -> str:
        return os.path.join(out_dir, "_mentions", f"shard={sid}")

    def _stream_meta(sid: str) -> dict:
        p = os.path.join(_mentions_dir(sid), "_stream_meta.json")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def _can_relink(sid: str, input_hash: str) -> bool:
        """input + extraction unchanged, only the run-globals moved, and
        the saved stream is on disk AND its own recorded fingerprints
        match — the manifest alone can't vouch for the stream bytes
        (the stream promotes before the manifest commits, so a crash
        mid-shard can leave a stream from a DIFFERENT input; the
        in-stream meta is written inside the temp dir and promoted
        atomically WITH the stream)."""
        from ..state.manifest import read_manifest

        m = read_manifest(out_dir, sid)
        sm = _stream_meta(sid)
        return bool(
            m
            and m.get("status") == "done"
            and m.get("input_hash") == input_hash
            and m.get("extract_hash") == extract_hash
            and sm.get("input_hash") == input_hash
            and sm.get("extract_hash") == extract_hash
        )

    todo: list[tuple[str, list, str, bool]] = []  # (sid, paths, fp, relink)
    for sid, paths in shards:
        fp = _input_hash(paths)
        if shard_is_done(out_dir, sid, fp, globals_hash, extract_hash):
            continue
        todo.append((sid, paths, fp, keep_mentions and _can_relink(sid, fp)))

    # deletion semantics (reference flow.py:450-461: rows of files removed
    # from the input are dropped): committed shards with no matching input
    # shard are removed, output + manifest + saved mention stream together
    valid_ids = {sid for sid, _ in shards}
    deleted = 0
    for m in list_manifests(out_dir):
        sid = m.get("shard")
        if sid not in valid_ids:
            shutil.rmtree(shard_output_dir(out_dir, sid), ignore_errors=True)
            shutil.rmtree(_mentions_dir(sid), ignore_errors=True)
            os.remove(os.path.join(out_dir, "_manifests", f"{sid}.json"))
            deleted += 1

    def _stream_files(d: str) -> list[str]:
        return sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )

    # stale temp/aside dirs from crashed runs (this run's temps get a
    # unique suffix below, so anything matching now is garbage)
    for name in os.listdir(out_dir):
        if name.startswith(("_tmp_shard_", "_tmp_mentions_", "_old_shard_")):
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)

    # unique per-process temp suffix: two concurrent runs on the same
    # out_dir (operator double-resume) must never write into each
    # other's temp dirs — a deterministic name lets run B rmtree and
    # overwrite run A's fully-written temp mid-commit
    import uuid

    run_tag = f"{os.getpid()}_{uuid.uuid4().hex[:8]}"

    done = 0
    relinked = 0
    for shard_id, paths, fp, relink in todo:
        if fail_after_shards is not None and done >= fail_after_shards:
            raise RuntimeError(f"injected failure after {done} shards")
        tmp = os.path.join(out_dir, f"_tmp_shard_{shard_id}_{run_tag}")
        shutil.rmtree(tmp, ignore_errors=True)
        # config kwargs override the defaults, but a None config value
        # (unset) must not clobber an explicitly-passed argument
        overrides = {k: v for k, v in (kg_kwargs or {}).items() if v is not None}
        kw = {"concurrency": concurrency, "conv_local_shards": True, **overrides}
        if relink:
            # catalog-only change: replay link + assembly from the saved
            # stream; extraction (the expensive half) is NOT re-run. An
            # EMPTY saved stream (zero-mention shard) has no files to
            # read — emit the empty table directly like the build path
            from .kg import build_kg_from_mention_stream

            sf = _stream_files(_mentions_dir(shard_id))
            if sf:
                triples = build_kg_from_mention_stream(
                    sf,
                    catalog,
                    mapping,
                    concurrency=concurrency,
                    link_params=overrides.get("link_params"),
                )
            else:
                import ray.data

                from .kg import TRIPLE_SCHEMA

                triples = ray.data.from_arrow(TRIPLE_SCHEMA.empty_table())
            relinked += 1
        elif keep_mentions:
            # split build: extraction streams to the persisted mention
            # dir once, link + assembly read it back — extraction runs
            # exactly once either way
            from .kg import build_kg_from_mention_stream, extract_mentions_ds

            mtmp = os.path.join(out_dir, f"_tmp_mentions_{shard_id}_{run_tag}")
            shutil.rmtree(mtmp, ignore_errors=True)
            extract_mentions_ds(
                paths, extractor_dirs=overrides.get("extractor_dirs")
            ).write_parquet(mtmp)
            # a zero-mention shard writes NO files and (on this Ray)
            # creates no directory at all — materialize it so the
            # promote below cannot FileNotFoundError
            os.makedirs(mtmp, exist_ok=True)
            # the stream's own fingerprints, promoted atomically WITH
            # the stream (see _can_relink): the manifest commits later,
            # so only this sidecar can vouch for the stream bytes
            with open(os.path.join(mtmp, "_stream_meta.json"), "w") as f:
                json.dump({"input_hash": fp, "extract_hash": extract_hash}, f)
            mdir = _mentions_dir(shard_id)
            os.makedirs(os.path.dirname(mdir), exist_ok=True)
            shutil.rmtree(mdir, ignore_errors=True)
            os.replace(mtmp, mdir)
            sf = _stream_files(mdir)
            if sf:
                triples = build_kg_from_mention_stream(
                    sf, catalog, mapping,
                    concurrency=concurrency,
                    link_params=overrides.get("link_params"),
                )
            else:  # no mentions at all in this shard
                import pyarrow as pa
                import ray.data

                from .kg import TRIPLE_SCHEMA

                triples = ray.data.from_arrow(TRIPLE_SCHEMA.empty_table())
        else:
            triples = build_kg(paths, catalog, mapping, **kw)
        if subj_buckets:
            # secondary layout: partition each shard's output by
            # hash(subj) % B (uniform by construction — SURVEY.md §7.4) so
            # per-entity consumers prune at the directory level
            import pyarrow as pa
            import pyarrow.compute as pc

            from ..functions.hashing import stable_hash64

            nb = subj_buckets

            def add_bucket(b: pa.Table) -> pa.Table:
                vals = [stable_hash64(s) % nb for s in b["subj"].to_pylist()]
                return b.append_column("subj_bucket", pa.array(vals, pa.int32()))

            triples.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
                tmp, partition_cols=["subj_bucket"]
            )
        else:
            triples.write_parquet(tmp)
        n_triples = _dir_row_count(tmp)
        stats = {
            "input_paths": paths,
            "triples": n_triples,
            "globals_hash": globals_hash,
            # ALWAYS recorded (not only with keep_mentions): shard_is_done
            # compares it so that adding an extractor family invalidates
            # committed shards — they lack the new family's triples
            "extract_hash": extract_hash,
            "relinked": relink,
        }
        commit_shard(out_dir, shard_id, fp, tmp, stats)
        done += 1

    # index-meta last (atomic tmp+rename, manifest-last ordering): only
    # now do the committed shards actually reflect meta's schema_version
    if meta_stale:
        tmp_meta = meta_path + ".tmp"
        with open(tmp_meta, "w") as f:
            json.dump(meta, f)
        os.replace(tmp_meta, meta_path)

    return {
        "shards_total": len(shards),
        "shards_processed": len(todo) if fail_after_shards is None else done,
        "shards_skipped": len(shards) - len(todo),
        "shards_relinked": relinked,
        "shards_deleted": deleted,
        "out_dir": out_dir,
    }


# schema history of the triple table (for feature detection on existing
# output — the reference's check_symbol_columns_exist / column feature
# detection shape, search/db.py:118-170, indexer/schema_migration.py):
#   v1: subj, pred, obj, conv_id, turn_idx    (r01 layout)
#   v2: same columns; pred domain extended with literal-family predicates
TRIPLE_SCHEMA_VERSION = 2

# version of the PERSISTED per-shard mention stream (conv_id, turn_idx,
# tool, mention, mention_ord, kind_code); part of extract_hash — bump on
# any change to the stream schema or kind-code encoding so stale streams
# are never replayed
MENTION_STREAM_VERSION = 1
TRIPLE_COLUMNS = ["subj", "pred", "obj", "conv_id", "turn_idx"]


def _committed_files(out_dir: str) -> list[str]:
    files = []
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("shard="):
            for root, _dirs, names in os.walk(os.path.join(out_dir, d)):
                files.extend(
                    os.path.join(root, n) for n in sorted(names) if n.endswith(".parquet")
                )
    return files


def detect_output_features(out_dir: str) -> dict:
    """Feature-detect an existing triple table before consuming it:
    the UNION of columns across shard files (parquet footers only),
    which expected columns are missing entirely (older layout), which
    are present only in some shards (mixed-version table), and the
    writer's recorded schema version. Consumers use this instead of
    assuming the current layout — reading an index written by an older
    version is DEFINED behavior (missing columns null-filled by
    read_triples), not an undefined crash."""
    import json

    files = _committed_files(out_dir)
    if not files:
        return {"columns": [], "missing": TRIPLE_COLUMNS, "partial": [],
                "extra": [], "schema_version": None, "n_files": 0}
    fields: dict[str, object] = {}
    presence: dict[str, int] = {}
    for f in files:
        sch = pq.read_schema(f)
        for field in sch:
            fields.setdefault(field.name, field)
            presence[field.name] = presence.get(field.name, 0) + 1
    cols = list(fields)
    meta_path = os.path.join(out_dir, "_index_meta.json")
    version = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            version = json.load(f).get("schema_version")
    return {
        "columns": cols,
        "missing": [c for c in TRIPLE_COLUMNS if c not in fields],
        "partial": [c for c, n in presence.items() if n < len(files)],
        "extra": [c for c in cols if c not in TRIPLE_COLUMNS and c != "subj_bucket"],
        "schema_version": version,
        "n_files": len(files),
        "_fields": fields,
    }


def read_triples(out_dir: str):
    """All committed triples as a streaming Dataset. Schema-tolerant
    (the read-side migration — reference schema_migration /
    check_symbol_columns_exist semantics): the read uses the UNION
    schema across shards, so a column absent from some shards (written
    by an older version) is null-filled there, and a column absent
    everywhere is appended as nulls — every consumer sees the current
    TRIPLE_COLUMNS."""
    import pyarrow as pa
    import ray.data

    files = _committed_files(out_dir)
    feats = detect_output_features(out_dir)
    fields = feats.pop("_fields")
    union_schema = pa.schema([fields[c] for c in fields])
    ds = ray.data.read_parquet(files, schema=union_schema)
    missing = feats["missing"]
    if missing:

        def add_missing(b: pa.Table) -> pa.Table:
            for c in missing:
                typ = pa.int32() if c == "turn_idx" else pa.string()
                b = b.append_column(c, pa.nulls(b.num_rows, typ))
            return b

        ds = ds.map_batches(add_missing, batch_format="pyarrow")
    return ds
