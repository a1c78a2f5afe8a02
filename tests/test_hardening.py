"""Edge-case hardening: nulls, empty/unicode text, tiny convs, empty
shards, streaming-vs-two-phase linker parity, salted aggregation."""

import pandas as pd
import pyarrow as pa
import pytest


def _turns_table(rows):
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array([1_700_000_000_000_000 + r[1] for r in rows], pa.timestamp("us")),
        }
    )


EDGE_ROWS = [
    ("c1", 0, "user", None, ""),                      # null text
    ("c1", 1, "WEIRD", "", None),                     # empty text, null tool, bad role
    ("c1", 2, "assistant", "ünïcödé Päyment Sérvice", "search"),  # unicode caps
    ("c1", 3, "tool", "plain words only here", "bash"),
    ("c2", 0, "user", "get_user_by_id solo turn", ""),  # single-turn conv
]


def test_normalize_handles_nulls_and_bad_roles():
    from coco_search_ray.stages.normalize import normalize_turns

    out = normalize_turns(_turns_table(EDGE_ROWS))
    assert out.num_rows == 5
    roles = out["role"].to_pylist()
    assert roles[1] == "other"  # bad role normalized, not dropped
    assert out["tool"].to_pylist()[1] == ""  # null tool -> empty


def test_normalize_trim_lower_lockstep_with_oracle_sql():
    """Role/tool normalization is an EXPLICIT contract: ASCII trim set
    (" \t\n\r\f\v") + 26-char ASCII lower — lockstep with the exact
    KG_NORMALIZED_TURNS_SQL expression on the shapes where the engines'
    built-ins disagree (tab/NBSP padding, 'İ', Ⱟ)."""
    import duckdb

    from coco_search_ray.stages.normalize import normalize_turns

    probes = ["Bash\t", " USER ", "user\xa0", "\nTOOL", "none", "NONE\x0b",
              "İstanbul", "Ⱟx", "", "api"]
    rows = [("c1", i, "user", "t", tool) for i, tool in enumerate(probes)]
    got = normalize_turns(_turns_table(rows))["tool"].to_pylist()
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT CASE WHEN t IS NULL THEN '' WHEN x = 'none' THEN ''"
            " ELSE x END FROM (SELECT ? AS t,"
            " translate(trim(?, ' ' || chr(9) || chr(10) || chr(13) ||"
            " chr(12) || chr(11)), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',"
            " 'abcdefghijklmnopqrstuvwxyz') AS x)",
            [tool, tool],
        ).fetchone()[0]
        for tool in probes
    ]
    con.close()
    assert got == want, (got, want)
    # the NBSP-padded tool is KEPT padded on both sides (explicit ASCII
    # set; DuckDB's default trim would have stripped it, Arrow's
    # utf8_trim_whitespace would have stripped the tab)
    assert got[2] == "user\xa0"


def test_extract_handles_nulls_and_unicode():
    from coco_search_ray.stages.extract import extract_mention_rows
    from coco_search_ray.stages.normalize import normalize_turns

    out = extract_mention_rows(normalize_turns(_turns_table(EDGE_ROWS)))
    df = out.to_pandas()
    # ASCII identifier shapes only (reference parity: its identifier
    # regexes are [a-zA-Z_]) — the accented "Päyment Sérvice" is NOT a
    # mention, and null/empty/plain rows contribute nothing; no crashes
    assert set(df["conv_id"]) == {"c2"}
    assert set(df["mention"]) == {"get_user_by_id"}


def test_build_kg_on_edge_rows(ray_session, tmp_path, smoke_dir):
    import pyarrow.parquet as pq
    from coco_search_ray.pipelines.kg import build_kg
    from coco_search_ray.sources.synth import load_catalog

    p = str(tmp_path / "edge.parquet")
    pq.write_table(_turns_table(EDGE_ROWS), p)
    catalog = load_catalog(smoke_dir)
    for conv_local in (True, False):
        ds = build_kg([p], catalog, conv_local_shards=conv_local)
        # the Dataset schema must hold even when the output is empty
        # (note: Ray's to_pandas() on an empty Dataset returns a frame
        # with no columns — the schema contract lives on the Dataset)
        assert ds.schema().names == ["subj", "pred", "obj", "conv_id", "turn_idx"]
        assert ds.count() == 0  # 1 mention, no tool -> no triples from edge rows


def test_general_assembly_matches_conv_local(ray_session, smoke_dir):
    """The general (non-conv-partitioned) path — coarse hash(conv_id)
    buckets + the vectorized multi-conv kernel — must emit exactly the
    no-shuffle conv-local path's triples (VERDICT r01 #4)."""
    from coco_search_ray.pipelines.kg import build_kg_from_dir

    key = ["subj", "pred", "obj", "conv_id", "turn_idx"]
    a = build_kg_from_dir(smoke_dir, conv_local_shards=True).to_pandas()
    b = build_kg_from_dir(smoke_dir, conv_local_shards=False).to_pandas()
    pd.testing.assert_frame_equal(
        a[key].sort_values(key, kind="mergesort").reset_index(drop=True),
        b[key].sort_values(key, kind="mergesort").reset_index(drop=True),
    )


def test_distributed_linkmap_matches_broadcast(ray_session, smoke_dir):
    """Forcing the distributed two-phase branch (distributed distinct +
    partitioned map-side join — the auto-selected path above
    _DISTINCT_BROADCAST_MAX surfaces) must produce identical triples to
    the broadcast-dict branch (VERDICT r01 #7)."""
    from coco_search_ray.pipelines.kg import build_kg
    from coco_search_ray.sources.synth import load_catalog, transcript_files

    catalog = load_catalog(smoke_dir)
    paths = transcript_files(smoke_dir)
    key = ["subj", "pred", "obj", "conv_id", "turn_idx"]
    a = build_kg(paths, catalog, distributed_linkmap=False).to_pandas()
    b = build_kg(paths, catalog, distributed_linkmap=True).to_pandas()
    # conv_local_shards=True + distributed linkmap: the mention join
    # destroys conversation locality, so build_kg must fall back to the
    # shuffled assembly internally (a silent-corruption regression test)
    c = build_kg(paths, catalog, distributed_linkmap=True, conv_local_shards=True).to_pandas()
    srt = lambda df: df[key].sort_values(key, kind="mergesort").reset_index(drop=True)  # noqa: E731
    pd.testing.assert_frame_equal(srt(a), srt(b))
    pd.testing.assert_frame_equal(srt(a), srt(c))


def test_streaming_actor_linker_matches_two_phase(ray_session, smoke_dir):
    from coco_search_ray.pipelines.kg import build_kg_from_dir

    key = ["subj", "pred", "obj", "conv_id", "turn_idx"]
    a = build_kg_from_dir(smoke_dir, two_phase=True).to_pandas()
    b = build_kg_from_dir(smoke_dir, two_phase=False, concurrency=2).to_pandas()
    pd.testing.assert_frame_equal(
        a[key].sort_values(key, kind="mergesort").reset_index(drop=True),
        b[key].sort_values(key, kind="mergesort").reset_index(drop=True),
    )


def test_salted_count_equals_plain_groupby(ray_session):
    import ray.data
    from ray.data.aggregate import Count
    from coco_search_ray.pipelines.stats import grouped_count_salted

    # heavy skew: one hot key
    keys = ["hot"] * 5000 + [f"k{i}" for i in range(50)] * 10
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys, pa.string())}))
    salted = grouped_count_salted(ds, "k", alias="n").to_pandas().sort_values("k")
    plain = ds.groupby("k").aggregate(Count(alias_name="n")).to_pandas().sort_values("k")
    pd.testing.assert_frame_equal(
        salted.reset_index(drop=True), plain.reset_index(drop=True), check_dtype=False
    )


def test_oracle_on_edge_rows(tmp_path, smoke_dir):
    """Oracle runs on arbitrary edge input without crashing."""
    import pyarrow.parquet as pq
    import shutil

    from coco_search_ray.oracle.kg_oracle import oracle_triples

    d = tmp_path / "edge_data"
    d.mkdir()
    shutil.copy(f"{smoke_dir}/catalog.parquet", d / "catalog.parquet")
    pq.write_table(_turns_table(EDGE_ROWS), str(d / "transcripts-0000.parquet"))
    out = oracle_triples(str(d))
    assert list(out.columns) == ["subj", "pred", "obj", "conv_id", "turn_idx"]


def test_cli_unknown_query_suggests_near_matches(capsys):
    """validate_query UX: a typo'd query name fails fast naming the
    closest registry entries (reference index-name validation shape)."""
    import pytest

    from coco_search_ray.job import main

    with pytest.raises(SystemExit):
        main(["query", "--name", "q_hcl_resurces", "--sf", "/nonexistent"])
    err = capsys.readouterr().err
    assert "q_hcl_resources" in err and "did you mean" in err


def test_broadcast_join_null_keys_never_match(ray_session):
    """SQL join semantics on NULL keys: pandas merge matches None AND
    NaN left keys against a None row in the broadcast index (measured),
    fabricating matches SQL would never produce. The broadcast side
    drops null keys, so inner joins drop null-keyed rows and left joins
    keep them with null right columns — exactly DuckDB."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from coco_search_ray.stages.joins import broadcast_join

    left = pa.table({"k": pa.array(["a", None, "b"]), "x": pa.array([1, 2, 3])})
    small = pa.table({"k": pa.array(["a", None]), "y": pa.array([10, 20])})
    con = duckdb.connect()
    con.register("left_t", left)
    con.register("small_t", small)
    for how in ("inner", "left"):
        got = (
            broadcast_join(ray.data.from_arrow(left), small, "k", "k", how=how)
            .to_pandas()
            .sort_values("x")
            .reset_index(drop=True)
        )
        want = con.execute(
            f"SELECT l.k, l.x, r.y FROM left_t l {how.upper()} JOIN small_t r ON l.k = r.k ORDER BY l.x"
        ).df()
        assert got["x"].tolist() == want["x"].tolist(), (how, got, want)
        assert got["y"].fillna(-1).tolist() == want["y"].fillna(-1).tolist(), how
    con.close()
