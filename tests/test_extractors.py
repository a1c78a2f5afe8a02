"""Extractor registry (duck-typed autodiscovery, reference
handlers/__init__.py:45-224 shape) + the literal families end to end."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_registry_discovery_and_order():
    from coco_search_ray import extractors

    assert set(extractors.REGISTRY) >= {"identifiers", "quoted_phrases", "urls"}
    assert [m.KIND for m in extractors.entity_families()] == ["entity"]
    lits = extractors.literal_families()
    assert [m.NAME for m in lits] == sorted(m.NAME for m in lits)
    assert extractors.combined_quick_pattern()


def test_registry_fail_fast_on_bad_module():
    import types

    import pytest

    from coco_search_ray import extractors

    bad = types.ModuleType("bad")
    bad.NAME = "bad"
    bad.KIND = "nonsense"
    bad.QUICK = "x"
    bad.extract = lambda t: []
    with pytest.raises(TypeError):
        extractors._validate(bad)


def test_quoted_and_url_extract():
    from coco_search_ray.extractors import quoted, urls

    t = 'run "payment flow step" then `retry_loop` and "payment flow step" again'
    assert quoted.extract(t) == ["payment flow step", "retry_loop"]
    t2 = "see https://svc.example/billing and https://svc.example/billing plus http://a.b/c."
    got = urls.extract(t2)
    assert got[0] == "https://svc.example/billing"
    assert len(got) == 2


def test_literal_triples_end_to_end(ray_session, smoke_dir, tmp_path):
    """A turn with an entity mention + quoted phrase + URL emits
    (entity, quotes, phrase) and (entity, links_to, url); a literal-only
    turn (no entity) emits nothing."""
    from coco_search_ray.pipelines.kg import build_kg
    from coco_search_ray.sources.synth import load_catalog

    catalog = load_catalog(smoke_dir)
    surface = catalog.column("canonical_name")[0].as_py()
    rows = {
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": [0, 1, 0],
        "role": ["user", "assistant", "user"],
        "text": [
            f'{surface} runs "the daily job" via https://svc.example/run',
            "plain follow-up text with nothing",
            'only "a quoted thing" here, no entity',
        ],
        "tool": ["", "search", ""],
        "ts": [0, 1, 2],
    }
    t = pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "role": pa.array(rows["role"], pa.string()),
            "text": pa.array(rows["text"], pa.string()),
            "tool": pa.array(rows["tool"], pa.string()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
        }
    )
    p = str(tmp_path / "lit.parquet")
    pq.write_table(t, p)
    for conv_local in (True, False):
        df = build_kg([p], catalog, conv_local_shards=conv_local).to_pandas()
        preds = set(zip(df["pred"], df["obj"]))
        assert ("quotes", "the daily job") in preds
        assert ("links_to", "https://svc.example/run") in preds
        assert ("quotes", "a quoted thing") not in preds  # no entity in c2
