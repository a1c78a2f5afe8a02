"""Config-file surface: YAML + env substitution + fail-fast validation
(reference cocosearch.yaml shape, config/schema.py + env_substitution)."""

import pytest


def test_defaults_match_reference_constants(tmp_path):
    from coco_search_ray.config import load_config

    p = tmp_path / "empty.yaml"
    p.write_text("")
    cfg = load_config(str(p))
    assert cfg.linking.rrf_k == 60
    assert cfg.linking.definition_boost == 2.0
    assert cfg.linking.prefetch_cap == 100
    assert cfg.chunking.chunk_size == 1000 and cfg.chunking.chunk_overlap == 300
    assert cfg.encoder.dim == 768
    assert cfg.kg_kwargs()["conv_local_shards"] is True


def test_env_substitution(tmp_path):
    from coco_search_ray.config import load_config

    p = tmp_path / "c.yaml"
    p.write_text("data_dir: ${COCO_TEST_DATA}\nout_dir: ${COCO_UNSET:-/tmp/fallback}\n")
    cfg = load_config(str(p), env={"COCO_TEST_DATA": "/data/x"})
    assert cfg.data_dir == "/data/x"
    assert cfg.out_dir == "/tmp/fallback"
    p.write_text("data_dir: ${COCO_REALLY_UNSET}\n")
    with pytest.raises(KeyError):
        load_config(str(p), env={})


def test_unknown_key_fails_fast(tmp_path):
    from coco_search_ray.config import load_config

    p = tmp_path / "bad.yaml"
    p.write_text("chunking:\n  chunk_sise: 100\n")
    with pytest.raises(Exception):
        load_config(str(p))


def test_cli_build_with_config(ray_session, smoke_dir, tmp_path, capsys):
    import json

    from coco_search_ray.job import main

    cfgp = tmp_path / "p.yaml"
    out = tmp_path / "out"
    cfgp.write_text(
        f"data_dir: {smoke_dir}\nout_dir: {out}\nkg:\n  two_phase: true\n"
    )
    assert main(["build", "--config", str(cfgp)]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["shards_processed"] == 4


def test_config_params_are_applied(ray_session, smoke_dir, tmp_path):
    """Config sections must ACT, not just validate: linking constants
    reach the EntityIndex, canonicalization threshold changes the
    mapping, chunking kwargs drive the chunker."""
    from coco_search_ray.config import load_config
    from coco_search_ray.functions.linker_core import EntityIndex
    from coco_search_ray.sources.synth import load_catalog
    from coco_search_ray.stages.canonicalize import canonical_mapping
    from coco_search_ray.stages.chunking import split_text

    p = tmp_path / "c.yaml"
    p.write_text(
        "linking:\n  rrf_k: 10\n  definition_boost: 3.0\n  prefetch_cap: 40\n"
        "canonicalization:\n  jaccard_threshold: 1.0\n"
        "chunking:\n  chunk_size: 50\n  chunk_overlap: 10\n"
    )
    cfg = load_config(str(p))

    catalog = load_catalog(smoke_dir)
    idx = EntityIndex(catalog.to_pylist(), **cfg.link_params())
    assert (idx.rrf_k, idx.boost, idx.prefetch_cap) == (10, 3.0, 40)

    # threshold = 1.0 -> only IDENTICAL surface-token sets merge, a
    # strict subset of the default 0.3-threshold merges
    rows = catalog.to_pylist()
    strict = canonical_mapping(rows, **cfg.canon_params())
    default = canonical_mapping(rows)
    n_strict = sum(1 for k, v in strict.items() if k != v)
    n_default = sum(1 for k, v in default.items() if k != v)
    assert n_strict < n_default

    chunks = split_text("x" * 200, **cfg.chunk_kwargs())
    assert all(c.end - c.start <= 50 for c in chunks)


def test_generate_config_inspects_and_roundtrips(tmp_path, smoke_dir):
    """generate_config (reference config/generator.py analog): writes a
    documented config reflecting a real inspection of the data dir,
    refuses to overwrite, and the output loads + validates."""
    import pytest

    from coco_search_ray.config import generate_config, load_config

    out = str(tmp_path / "coco.yaml")
    assert generate_config(smoke_dir, out) == out
    cfg = load_config(out)
    assert cfg.data_dir == smoke_dir
    assert cfg.kg.conv_local_shards is True  # synth shards ARE conv-disjoint
    assert cfg.linking.rrf_k == 60
    with pytest.raises(FileExistsError):
        generate_config(smoke_dir, out)


def test_generate_config_detects_conv_overlap(tmp_path):
    """A data dir whose shards SHARE conversations must generate
    conv_local_shards: false (the zero-shuffle fast path would emit
    partial-conversation triples there)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from coco_search_ray.config import generate_config, load_config

    d = tmp_path / "overlap"
    d.mkdir()
    t = pa.table(
        {
            "conv_id": ["c1", "c2"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": ["user", "user"],
            "text": ["a", "b"],
            "tool": ["", ""],
            "ts": pa.array([0, 0], pa.timestamp("us")),
        }
    )
    pq.write_table(t, str(d / "transcripts-000.parquet"))
    pq.write_table(t, str(d / "transcripts-001.parquet"))  # same convs
    out = str(tmp_path / "o.yaml")
    generate_config(str(d), out)
    assert load_config(out).kg.conv_local_shards is False


def test_generate_config_unverified_probe_is_safe(tmp_path):
    """When the disjointness probe window is exhausted (more shards than
    it reads), the generated config must fall back to the SAFE
    conv_local_shards: false rather than claiming verification."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from coco_search_ray import config as cfgmod
    from coco_search_ray.config import generate_config, load_config

    d = tmp_path / "many"
    d.mkdir()
    for i in range(6):  # disjoint, but beyond a 4-file probe window
        t = pa.table(
            {
                "conv_id": [f"c{i}"],
                "turn_idx": pa.array([0], pa.int32()),
                "role": ["user"],
                "text": ["x"],
                "tool": [""],
                "ts": pa.array([0], pa.timestamp("us")),
            }
        )
        pq.write_table(t, str(d / f"transcripts-{i:03d}.parquet"))
    info = cfgmod._inspect_data_dir(str(d), max_probe_files=4)
    assert info["conv_disjoint"] is None  # unverified, not True
    out = str(tmp_path / "m.yaml")
    orig = cfgmod._inspect_data_dir
    cfgmod._inspect_data_dir = lambda dd, max_probe_files=4: orig(dd, 4)
    try:
        generate_config(str(d), out)
    finally:
        cfgmod._inspect_data_dir = orig
    assert load_config(out).kg.conv_local_shards is False
