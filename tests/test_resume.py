"""Checkpoint/resume: kill after k shards, re-run, output equals a clean
run; already-committed shards are skipped (FIXTURES.md F5.4)."""

import os

import pandas as pd
import pytest


KEY = ["subj", "pred", "obj", "conv_id", "turn_idx"]


def _read_all(out_dir):
    from coco_search_ray.pipelines.materialize import read_triples

    df = read_triples(out_dir).to_pandas()
    return df[KEY].sort_values(KEY, kind="mergesort").reset_index(drop=True)


def test_resume_after_injected_failure(ray_session, smoke_dir, tmp_path):
    from coco_search_ray.pipelines.materialize import run_resumable
    from coco_search_ray.state.manifest import list_manifests

    clean_dir = str(tmp_path / "clean")
    crash_dir = str(tmp_path / "crash")

    stats = run_resumable(smoke_dir, clean_dir, concurrency=2)
    assert stats["shards_processed"] == stats["shards_total"] == 4

    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(smoke_dir, crash_dir, concurrency=2, fail_after_shards=2)
    assert len(list_manifests(crash_dir)) == 2

    stats2 = run_resumable(smoke_dir, crash_dir, concurrency=2)
    assert stats2["shards_skipped"] == 2
    assert stats2["shards_processed"] == 2

    pd.testing.assert_frame_equal(_read_all(crash_dir), _read_all(clean_dir))


def test_noop_rerun_skips_everything(ray_session, smoke_dir, tmp_path):
    from coco_search_ray.pipelines.materialize import run_resumable

    out = str(tmp_path / "out")
    run_resumable(smoke_dir, out, concurrency=2)
    stats = run_resumable(smoke_dir, out, concurrency=2)
    assert stats["shards_processed"] == 0
    assert stats["shards_skipped"] == stats["shards_total"]


def test_deleted_input_shard_removes_output(ray_session, smoke_dir, tmp_path):
    """Reference deletion semantics: input files that disappear get their
    output rows dropped on the next run (flow.py:450-461 shape)."""
    import os
    import shutil

    from coco_search_ray.pipelines.materialize import run_resumable
    from coco_search_ray.state.manifest import list_manifests

    data = str(tmp_path / "data")
    shutil.copytree(smoke_dir, data)
    out = str(tmp_path / "out")
    run_resumable(data, out)
    assert len(list_manifests(out)) == 4

    os.remove(os.path.join(data, "transcripts-0003.parquet"))
    stats = run_resumable(data, out)
    assert stats["shards_deleted"] == 1
    assert len(list_manifests(out)) == 3
    assert not os.path.isdir(os.path.join(out, "shard=0003"))


def test_schema_feature_detection_and_tolerant_read(ray_session, smoke_dir, tmp_path):
    """Reading an OLDER triple-table layout is defined: feature detection
    reports the missing column, read_triples null-fills it."""
    import os

    import pyarrow.parquet as pq

    from coco_search_ray.pipelines.materialize import (
        detect_output_features,
        read_triples,
        run_resumable,
    )

    out = str(tmp_path / "out")
    run_resumable(smoke_dir, out)
    feats = detect_output_features(out)
    assert feats["missing"] == [] and feats["schema_version"] == 2

    # simulate a MIXED-version table: strip conv_id from one shard's files
    shard0 = os.path.join(out, "shard=0000")
    for name in os.listdir(shard0):
        if name.endswith(".parquet"):
            p = os.path.join(shard0, name)
            t = pq.read_table(p).drop_columns(["conv_id"])
            pq.write_table(t, p)
    feats = detect_output_features(out)
    assert "conv_id" in feats["partial"] and feats["missing"] == []
    df = read_triples(out).to_pandas()
    assert df["conv_id"].isna().any()  # the stripped shard, null-filled
    assert df["conv_id"].notna().any()  # the intact shards keep values
    assert set(df.columns) >= {"subj", "pred", "obj", "conv_id", "turn_idx"}

    # simulate a uniformly OLDER table: strip conv_id everywhere
    for d in os.listdir(out):
        if d.startswith("shard="):
            for name in os.listdir(os.path.join(out, d)):
                if name.endswith(".parquet"):
                    p = os.path.join(out, d, name)
                    t = pq.read_table(p)
                    if "conv_id" in t.schema.names:
                        pq.write_table(t.drop_columns(["conv_id"]), p)
    feats = detect_output_features(out)
    assert feats["missing"] == ["conv_id"]
    df = read_triples(out).to_pandas()
    assert df["conv_id"].isna().all()
    assert set(df.columns) >= {"subj", "pred", "obj", "conv_id", "turn_idx"}


def test_catalog_change_invalidates_all_shards(ray_session, smoke_dir, tmp_path):
    """Catalog-aware resume (VERDICT r01 #2): a re-run with a CHANGED
    catalog (new entities/aliases -> different linkmap + canonical
    mapping) must rebuild every shard; an unchanged catalog skips all."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from coco_search_ray.pipelines.materialize import run_resumable

    data = str(tmp_path / "data")
    shutil.copytree(smoke_dir, data)
    out = str(tmp_path / "out")
    s0 = run_resumable(data, out)
    assert s0["shards_processed"] == 4

    # unchanged catalog -> all skipped
    s1 = run_resumable(data, out)
    assert (s1["shards_processed"], s1["shards_skipped"]) == (0, 4)

    # mutate the catalog: add one entity (same file size is NOT relied on;
    # the fingerprint covers content)
    cat_path = os.path.join(data, "catalog.parquet")
    cat = pq.read_table(cat_path)
    extra = pa.table(
        {
            "entity_id": pa.array(["E999999"], pa.string()),
            "canonical_name": pa.array(["Brand New"], pa.string()),
            "aliases": pa.array([["brand_new"]], pa.list_(pa.string())),
            "entity_type": pa.array(["concept"], pa.string()),
            "description": pa.array(["Brand New is a concept"], pa.string()),
        }
    )
    pq.write_table(pa.concat_tables([cat, extra.cast(cat.schema)]), cat_path)

    s2 = run_resumable(data, out)
    assert (s2["shards_processed"], s2["shards_skipped"]) == (4, 0)
    # ... and as a catalog-ONLY change it replays from the saved mention
    # stream (extraction skipped) rather than rebuilding from scratch
    assert s2["shards_relinked"] == 4

    # and stable again afterwards
    s3 = run_resumable(data, out)
    assert (s3["shards_processed"], s3["shards_skipped"]) == (0, 4)


def test_catalog_change_relinks_without_reextracting(ray_session, smoke_dir, tmp_path):
    """Cheap catalog-change resume (VERDICT r02 #6, reference
    deps/extractor.py:387-395 — keep clean files' extractions, re-resolve
    all edges): a globals_hash mismatch with unchanged inputs replays
    link + assembly from the persisted per-shard mention stream. Proof
    that extraction did not re-run: every mention-stream file is
    byte-identical (mtime + fingerprint) across the rebuild. Output must
    equal a cold build on the mutated catalog exactly."""
    import glob
    import os
    import shutil

    import pandas as pd
    import pyarrow.parquet as pq

    from coco_search_ray.pipelines.materialize import read_triples, run_resumable
    from coco_search_ray.state.manifest import input_fingerprint

    data = str(tmp_path / "data")
    shutil.copytree(smoke_dir, data)
    out = str(tmp_path / "out")
    run_resumable(data, out)
    mfiles = sorted(glob.glob(f"{out}/_mentions/shard=*/*.parquet"))
    assert mfiles, "mention stream not persisted"
    before = {f: (os.path.getmtime(f), input_fingerprint(f)) for f in mfiles}

    # catalog-only mutation: drop entities -> different linkmap everywhere
    cat_path = os.path.join(data, "catalog.parquet")
    cat = pq.read_table(cat_path)
    pq.write_table(cat.slice(0, cat.num_rows - 40), cat_path)

    s = run_resumable(data, out)
    assert s["shards_processed"] == s["shards_relinked"] == 4
    after = {
        f: (os.path.getmtime(f), input_fingerprint(f))
        for f in sorted(glob.glob(f"{out}/_mentions/shard=*/*.parquet"))
    }
    assert before == after  # extraction half did NOT re-run

    cold = str(tmp_path / "cold")
    run_resumable(data, cold)
    key = ["subj", "pred", "obj", "conv_id", "turn_idx"]
    a = read_triples(out).to_pandas()[key].sort_values(key).reset_index(drop=True)
    b = read_triples(cold).to_pandas()[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_subj_bucket_partitioned_output(ray_session, smoke_dir, tmp_path):
    """Optional output layout: hash(subj) % B directory partitioning."""
    import os

    from coco_search_ray.pipelines.materialize import read_triples, run_resumable

    out = str(tmp_path / "out")
    run_resumable(smoke_dir, out, subj_buckets=4)
    shard0 = os.path.join(out, "shard=0000")
    buckets = sorted(d for d in os.listdir(shard0) if d.startswith("subj_bucket="))
    assert len(buckets) == 4
    df = read_triples(out).to_pandas()
    assert len(df) > 100
    assert {"subj", "pred", "obj", "conv_id", "turn_idx"} <= set(df.columns)


def test_shard_groups_resume_and_equivalence(ray_session, smoke_dir, tmp_path):
    """group_size > 1: G-file groups build in one pipeline each, crash/
    resume works at group granularity, and the triple set is byte-equal
    to the per-file layout."""
    import pandas as pd
    import pytest

    from coco_search_ray.pipelines.materialize import read_triples, run_resumable

    fine = str(tmp_path / "fine")
    run_resumable(smoke_dir, fine)  # 4 files, 4 manifests

    grouped = str(tmp_path / "grouped")
    with pytest.raises(RuntimeError):
        run_resumable(smoke_dir, grouped, group_size=2, fail_after_shards=1)
    s = run_resumable(smoke_dir, grouped, group_size=2)
    assert s["shards_total"] == 2
    assert (s["shards_processed"], s["shards_skipped"]) == (1, 1)  # crash kept group 0

    key = ["subj", "pred", "obj", "conv_id", "turn_idx"]
    a = read_triples(fine).to_pandas()[key].sort_values(key, kind="mergesort").reset_index(drop=True)
    b = read_triples(grouped).to_pandas()[key].sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_crash_consistency_guards(ray_session, smoke_dir, tmp_path):
    """Round-5 resume-review findings, pinned: (a) a done manifest whose
    data dir is GONE (the commit crash window) is not 'done' — the shard
    rebuilds; (b) an extraction-semantics change (extract_hash drift)
    invalidates committed shards; (c) interior same-size rewrites of a
    >128 KiB file change the input fingerprint; (d) the saved mention
    stream carries its own fingerprints and a mismatching stream denies
    the relink fast path; (e) _index_meta.json writes are atomic and
    land AFTER the shard loop."""
    import json
    import shutil

    from coco_search_ray.pipelines.materialize import run_resumable
    from coco_search_ray.state.manifest import input_fingerprint, shard_output_dir

    out = str(tmp_path / "kg")
    run_resumable(smoke_dir, out, concurrency=2)

    # (a) vanished data dir behind a done manifest -> rebuilt, not skipped
    victim = shard_output_dir(out, "0000")
    shutil.rmtree(victim)
    stats = run_resumable(smoke_dir, out, concurrency=2)
    assert stats["shards_processed"] == 1
    assert os.path.isdir(victim)

    # (b) extract_hash mismatch (simulating a new extractor family /
    # stream-version bump) invalidates the shard
    mpath = os.path.join(out, "_manifests", "0000.json")
    m = json.load(open(mpath))
    m["extract_hash"] = "stale"
    json.dump(m, open(mpath, "w"))
    stats = run_resumable(smoke_dir, out, concurrency=2)
    assert stats["shards_processed"] == 1

    # (c) interior rewrite of a >128 KiB file flips the fingerprint
    big = tmp_path / "big.bin"
    big.write_bytes(b"a" * 300_000)
    fp1 = input_fingerprint(str(big))
    data = bytearray(big.read_bytes())
    data[150_000] ^= 0xFF  # same size, middle byte flipped
    big.write_bytes(bytes(data))
    assert input_fingerprint(str(big)) != fp1

    # (d) a tampered stream sidecar denies the relink fast path: corrupt
    # it, change the catalog (globals move), expect a FULL rebuild
    # (shards_relinked == 0) instead of replaying the suspect stream
    sm = os.path.join(out, "_mentions", "shard=0000", "_stream_meta.json")
    assert os.path.exists(sm)
    json.dump({"input_hash": "bogus", "extract_hash": "bogus"}, open(sm, "w"))
    data_dir = str(tmp_path / "data")
    shutil.copytree(smoke_dir, data_dir)
    out2 = str(tmp_path / "kg2")
    run_resumable(data_dir, out2, concurrency=2)
    sm2 = os.path.join(out2, "_mentions", "shard=0000", "_stream_meta.json")
    json.dump({"input_hash": "bogus", "extract_hash": "bogus"}, open(sm2, "w"))
    import pyarrow.parquet as pq_

    cat = pq_.read_table(os.path.join(data_dir, "catalog.parquet"))
    pq_.write_table(cat.slice(0, cat.num_rows - 1), os.path.join(data_dir, "catalog.parquet"))
    stats = run_resumable(data_dir, out2, concurrency=2)
    assert stats["shards_processed"] == stats["shards_total"]
    assert stats["shards_relinked"] == stats["shards_total"] - 1  # 0000 rebuilt fully

    # (e) meta is valid JSON and intact after all of the above
    meta = json.load(open(os.path.join(out2, "_index_meta.json")))
    assert meta["schema_version"] is not None
