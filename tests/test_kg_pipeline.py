"""End-to-end KG pipeline tests: the FIXTURES.md F5 invariants.

1. per-turn text equality under stable ordering (M0),
2. triple P/R >= 0.95 vs the single-process oracle (expected: 1.0 — the
   pipeline and oracle share pure kernels, so any gap is a distribution
   bug),
3. exact-dedup invariant,
4. determinism across parallelism levels.
"""

import glob

import pandas as pd
import pyarrow.parquet as pq
import pytest


TRIPLE_KEY = ["subj", "pred", "obj", "conv_id", "turn_idx"]


@pytest.fixture(scope="module")
def oracle_df(smoke_dir):
    from coco_search_ray.oracle.kg_oracle import oracle_triples

    return oracle_triples(smoke_dir)


@pytest.fixture(scope="module")
def pipeline_df(ray_session, smoke_dir):
    from coco_search_ray.pipelines.kg import build_kg_from_dir

    return build_kg_from_dir(smoke_dir, concurrency=2).to_pandas()


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df[TRIPLE_KEY].sort_values(TRIPLE_KEY, kind="mergesort").reset_index(drop=True)


def test_text_equality_under_stable_ordering(ray_session, smoke_dir):
    from coco_search_ray.pipelines.kg import normalized_turns_ds

    got = normalized_turns_ds(smoke_dir).to_pandas()
    got = got.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)

    raw = pd.concat(
        [pq.read_table(f).to_pandas() for f in sorted(glob.glob(f"{smoke_dir}/transcripts-*.parquet"))]
    )
    raw = raw.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)

    assert len(got) == len(raw)
    assert got["text"].tolist() == raw["text"].tolist()
    assert got["conv_id"].tolist() == raw["conv_id"].tolist()


def test_triple_precision_recall(pipeline_df, oracle_df):
    from coco_search_ray.oracle.kg_oracle import precision_recall

    p, r = precision_recall(pipeline_df, oracle_df)
    assert p >= 0.95, f"precision {p}"
    assert r >= 0.95, f"recall {r}"


def test_window_context_caps_and_coverage(ray_session, smoke_dir):
    """+-k window expansion: hard window cap enforced, per-turn text cap
    enforced, offset-0 rows always find their source turn."""
    import pytest

    from coco_search_ray.pipelines.kg import (
        CONTEXT_MAX_CHARS,
        CONTEXT_MAX_WINDOW,
        build_kg_from_dir,
        triples_with_window_context,
    )

    triples = build_kg_from_dir(smoke_dir).materialize()
    with pytest.raises(ValueError):
        triples_with_window_context(triples, smoke_dir, window=CONTEXT_MAX_WINDOW + 1)
    out = triples_with_window_context(triples, smoke_dir, window=1).to_pandas()
    assert set(out["ctx_off"]) == {-1, 0, 1}
    assert out["ctx_text"].dropna().str.len().max() <= CONTEXT_MAX_CHARS
    at0 = out[out["ctx_off"] == 0]
    assert at0["ctx_text"].notna().all()  # every triple's own turn exists
    assert len(out) == 3 * triples.count()


def test_pipeline_nonempty_and_schema(pipeline_df):
    assert len(pipeline_df) > 100
    assert list(pipeline_df.columns) == TRIPLE_KEY
    assert set(pipeline_df["pred"].unique()) <= {"mentions", "uses_tool", "replies_to", "quotes", "links_to", "mentions_email", "references_path", "mentions_version", "has_member", "declares_resource", "imports_module", "references_doc", "uses_image", "uses_action", "defines_symbol", "includes_config", "extends_template", "uses_helm_template", "argo_ref", "references_code", "depends_on", "depends_on_svc"}


def test_exact_dedup_invariant(pipeline_df):
    assert not pipeline_df.duplicated(subset=TRIPLE_KEY).any()


def test_determinism_across_parallelism(ray_session, smoke_dir, pipeline_df):
    from coco_search_ray.pipelines.kg import build_kg_from_dir

    again = build_kg_from_dir(smoke_dir, concurrency=3).to_pandas()
    pd.testing.assert_frame_equal(_sorted(again), _sorted(pipeline_df))


def test_vectorized_assembly_matches_loop_spec(smoke_dir):
    """assemble_conv_local (vectorized hot path) == assemble_triples_group
    (readable per-conv spec) on real linked-mention frames."""
    import numpy as np
    import pandas as pd
    from coco_search_ray.pipelines.kg import assemble_conv_local, assemble_triples_group

    rng = np.random.RandomState(3)
    rows = []
    for conv in range(30):
        n_turns = rng.randint(1, 12)
        for turn in range(n_turns):
            tool = ["", "search", "bash"][rng.randint(3)]
            n_m = rng.randint(0, 4)
            if n_m == 0:
                rows.append((f"c{conv:03d}", turn, -1, None, tool))
            for k in range(n_m):
                ent = f"E{rng.randint(6):03d}" if rng.rand() > 0.2 else None
                rows.append((f"c{conv:03d}", turn, k, ent, tool))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "mention_ord", "entity_id", "tool"])
    df = df.sample(frac=1.0, random_state=7).reset_index(drop=True)  # shuffled arrival

    fast = assemble_conv_local(df.copy())
    slow = pd.concat(
        [assemble_triples_group(g) for _c, g in df.groupby("conv_id", sort=True)],
        ignore_index=True,
    )
    key = ["subj", "pred", "obj", "conv_id", "turn_idx"]
    fast = fast[key].sort_values(key, kind="mergesort").reset_index(drop=True)
    slow = slow[key].sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)


def test_vectorized_assembly_matches_spec_with_qualified_and_literals():
    """Same cross-check on VAL-form frames mixing entity (0), literal
    (>0) and qualified (<= -2) kind codes, including unlinked (null)
    entity and qualified rows."""
    import numpy as np
    import pandas as pd
    from coco_search_ray.pipelines.kg import assemble_conv_local, assemble_triples_group

    lit_preds = ["quotes", "links_to"]
    qual_preds = ["has_member"]
    rng = np.random.RandomState(11)
    members = ["run", "init.deep", "process_item"]
    rows = []
    for conv in range(25):
        for turn in range(rng.randint(1, 10)):
            tool = ["", "bash"][rng.randint(2)]
            ord_ = 0
            for _ in range(rng.randint(0, 3)):  # entity rows
                val = f"E{rng.randint(6):03d}" if rng.rand() > 0.2 else None
                rows.append((f"c{conv:03d}", turn, ord_, 0, val, tool)); ord_ += 1
            for _ in range(rng.randint(0, 2)):  # qualified rows
                if rng.rand() > 0.25:
                    val = f"E{rng.randint(6):03d}.{members[rng.randint(3)]}"
                else:
                    val = None  # unlinked root
                rows.append((f"c{conv:03d}", turn, ord_, -2, val, tool)); ord_ += 1
            for _ in range(rng.randint(0, 2)):  # literal rows
                rows.append(
                    (f"c{conv:03d}", turn, ord_, rng.randint(1, 3), f"lit{rng.randint(4)}", tool)
                ); ord_ += 1
            if ord_ == 0:  # sentinel shape: no mentions this turn
                rows.append((f"c{conv:03d}", turn, -1, -1, None, tool))
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "mention_ord", "kind_code", "val", "tool"]
    )
    df["kind_code"] = df["kind_code"].astype("int8")
    df = df.sample(frac=1.0, random_state=5).reset_index(drop=True)

    fast = assemble_conv_local(df.copy(), lit_preds, qual_preds)
    slow = pd.concat(
        [
            assemble_triples_group(g, lit_preds, qual_preds)
            for _c, g in df.groupby("conv_id", sort=True)
        ],
        ignore_index=True,
    )
    key = ["subj", "pred", "obj", "conv_id", "turn_idx"]
    fast = fast[key].sort_values(key, kind="mergesort").reset_index(drop=True)
    slow = slow[key].sort_values(key, kind="mergesort").reset_index(drop=True)
    assert (fast["pred"] == "has_member").any()
    pd.testing.assert_frame_equal(fast, slow)


def test_arrow_fast_assembly_row_identical_to_pandas_kernel():
    """assemble_conv_local_fast (Arrow/int-code hot path) must be
    row-for-row identical — rows AND row order — to assemble_conv_local
    (the pandas kernel it replaced in build_kg) on val-form frames with
    all three kind classes, unlinked rows, and duplicate qualified
    surfaces whose roots canonicalize to the same entity (the case that
    exercises the final keep-first dedup)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from coco_search_ray.pipelines.kg import (
        _assemble_conv_local_arrow,
        assemble_conv_local_fast,
    )

    lit_preds = ["quotes", "links_to"]
    qual_preds = ["has_member"]
    rng = np.random.RandomState(23)
    members = ["run", "init.deep", "close"]
    rows = []
    for conv in range(40):
        for turn in range(rng.randint(1, 9)):
            # None exercises the null-tool edge (pandas spec emits a
            # null-obj uses_tool row; the fast kernel must match)
            tool = ["", "bash", "search", None][rng.randint(4)]
            ord_ = 0
            for _ in range(rng.randint(0, 4)):
                val = f"E{rng.randint(5):03d}" if rng.rand() > 0.2 else None
                rows.append((f"c{conv:03d}", turn, ord_, 0, val, tool)); ord_ += 1
            for _ in range(rng.randint(0, 3)):  # duplicate-prone qualified
                val = (
                    f"E{rng.randint(3):03d}.{members[rng.randint(3)]}"
                    if rng.rand() > 0.25
                    else None
                )
                rows.append((f"c{conv:03d}", turn, ord_, -2, val, tool)); ord_ += 1
            for _ in range(rng.randint(0, 2)):
                rows.append(
                    (f"c{conv:03d}", turn, ord_, rng.randint(1, 3), f"lit{rng.randint(3)}", tool)
                ); ord_ += 1
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "mention_ord", "kind_code", "val", "tool"]
    )
    df["kind_code"] = df["kind_code"].astype("int8")
    df["turn_idx"] = df["turn_idx"].astype("int32")

    ref = _assemble_conv_local_arrow(df.copy(), lit_preds, qual_preds).to_pandas()
    fast = assemble_conv_local_fast(
        pa.Table.from_pandas(df, preserve_index=False), lit_preds, qual_preds
    ).to_pandas()
    assert (ref["pred"] == "has_member").any()
    pd.testing.assert_frame_equal(ref, fast)  # exact rows, exact order


def test_fast_assembly_null_tool_block_without_empty_string():
    """A block whose tool dictionary contains NO '' (only nulls and a
    real tool) must still emit null-obj uses_tool rows for the null-tool
    turns — the -1 null code must never collide with the kernel's
    empty-tool sentinel (round-3 ADVICE: tool_empty = -1 silently
    dropped them when '' was absent from the dictionary)."""
    import pandas as pd
    import pyarrow as pa
    from coco_search_ray.pipelines.kg import (
        _assemble_conv_local_arrow,
        assemble_conv_local_fast,
    )

    df = pd.DataFrame(
        {
            "conv_id": ["c0", "c0", "c0", "c0"],
            "turn_idx": pd.array([0, 0, 1, 2], dtype="int32"),
            "mention_ord": [0, 1, 0, 0],
            "kind_code": pd.array([0, 0, 0, 0], dtype="int8"),
            "val": ["E000", "E001", "E000", "E002"],
            "tool": [None, None, "bash", None],
        }
    )
    ref = _assemble_conv_local_arrow(df.copy(), [], []).to_pandas()
    fast = assemble_conv_local_fast(
        pa.Table.from_pandas(df, preserve_index=False), [], []
    ).to_pandas()
    # null-tool turns DO produce uses_tool rows (obj null), per the
    # pandas spec (tool != '')
    ut = fast[fast["pred"] == "uses_tool"]
    assert len(ut) == 4 and ut["obj"].isna().sum() == 3
    pd.testing.assert_frame_equal(ref, fast)


def test_import_as_rule_anchored_to_statement_start():
    """'from x import y as z' must NOT emit y via the aliased-import
    rule (round-3 ADVICE); a statement-start 'import mod as alias'
    still extracts."""
    from coco_search_ray.extractors import imports as imp

    assert imp.extract("from pkg.sub import thing as t") == ["pkg.sub"]
    assert imp.extract("import numpy as np") == ["numpy"]
    assert imp.extract("setup code\nimport numpy as np") == ["numpy"]
    assert imp.extract("x = 1; import numpy as np") == ["numpy"]
    # mid-prose aliased import is NOT a statement
    assert imp.extract("we then import numpy as np here") == []


def test_entity_index_odd_dim_localizes():
    """EntityIndex with dim % 32 != 0 must survive broadcast.localize
    (round-3 ADVICE: the lambda embed fallback broke stdlib pickling,
    crashing every link task under localize_arrays=True)."""
    from coco_search_ray.functions.broadcast import localize
    from coco_search_ray.functions.linker_core import EntityIndex

    rows = [
        {"entity_id": "E000", "canonical_name": "alpha", "description": "a"},
        {"entity_id": "E001", "canonical_name": "beta", "description": "b"},
    ]
    idx = localize(EntityIndex(rows, dim=100))
    res = idx.link("alpha")
    assert res is not None and res.entity_id == "E000"


def test_spill_stream_branch_identical_triples(ray_session, smoke_dir, tmp_path):
    """The file-backed two-phase branch (spill_stream=True: extraction
    streams to parquet once, unique + lookup passes re-read from disk,
    NOTHING pins the mention stream in the object store) must produce
    the exact triple set of the default pinned branch."""
    import pandas as pd
    from coco_search_ray.pipelines.kg import build_kg_from_dir

    sdir = str(tmp_path / "stream")
    pinned = build_kg_from_dir(smoke_dir, concurrency=2).to_pandas()
    spilled = build_kg_from_dir(
        smoke_dir, concurrency=2, spill_stream=True, stream_spill_dir=sdir
    ).to_pandas()
    import os

    files = [f for f in os.listdir(sdir) if f.endswith(".parquet")]
    assert files, "spill branch must write the stream to the spill dir"
    pd.testing.assert_frame_equal(_sorted(pinned), _sorted(spilled))


def test_index_health_report_sections(ray_session, smoke_dir):
    """kg_index_health: all four sections present, counts consistent
    with the triple table, shares sum to ~1 per section."""
    from coco_search_ray.pipelines.analyze import kg_index_health
    from coco_search_ray.pipelines.kg import build_kg_from_dir

    triples = build_kg_from_dir(smoke_dir).materialize()
    rep = kg_index_health(smoke_dir, triples)
    assert set(rep["section"]) == {"pred", "family", "link", "turns"}
    pred = rep[rep["section"] == "pred"]
    assert pred["n"].sum() == triples.count()
    for _s, g in rep.groupby("section"):
        assert abs(g["share"].sum() - 1.0) < 1e-4
    link = rep[rep["section"] == "link"].set_index("key")["n"]
    assert link["linked"] > 0
    turns = rep[rep["section"] == "turns"].set_index("key")["n"]
    assert turns["with_entities"] > 0 and turns.sum() > 0


def test_stream_pin_threshold_env_autoselects_spill(ray_session, smoke_dir, tmp_path, monkeypatch):
    """KG_STREAM_PIN_MAX_INPUT_BYTES=0 makes the AUTO branch spill (any
    local input is 'too big to pin') and the replay path skip its pin;
    triples identical to the default build either way."""
    import pandas as pd
    from coco_search_ray.pipelines import kg as kgmod
    from coco_search_ray.pipelines.kg import (
        build_kg_from_dir,
        build_kg_from_mention_stream,
        extract_mentions_ds,
    )
    from coco_search_ray.sources.synth import load_catalog, transcript_files

    base = build_kg_from_dir(smoke_dir, concurrency=2).to_pandas()
    monkeypatch.setenv("KG_STREAM_PIN_MAX_INPUT_BYTES", "0")
    assert kgmod._stream_pin_max_input_bytes() == 0
    auto = build_kg_from_dir(smoke_dir, concurrency=2).to_pandas()
    pd.testing.assert_frame_equal(_sorted(base), _sorted(auto))
    # replay path: persist the stream, rebuild without pinning
    mdir = str(tmp_path / "mentions")
    extract_mentions_ds(transcript_files(smoke_dir)).write_parquet(mdir)
    import os

    files = sorted(
        os.path.join(mdir, f) for f in os.listdir(mdir) if f.endswith(".parquet")
    )
    replay = build_kg_from_mention_stream(
        files, load_catalog(smoke_dir), concurrency=2
    ).to_pandas()
    pd.testing.assert_frame_equal(_sorted(base), _sorted(replay))


def test_spill_dir_refuses_stale_stream_files(ray_session, smoke_dir, tmp_path):
    """Reusing a spill dir that already holds a previous run's stream
    shards must fail loudly — mixing them in would duplicate every
    conversation's triples (round-4 self-review finding)."""
    import pytest

    from coco_search_ray.pipelines.kg import build_kg_from_dir

    sdir = str(tmp_path / "stream")
    build_kg_from_dir(smoke_dir, spill_stream=True, stream_spill_dir=sdir).count()
    with pytest.raises(FileExistsError):
        build_kg_from_dir(smoke_dir, spill_stream=True, stream_spill_dir=sdir)


def test_paths_bytes_storage_agnostic(smoke_dir):
    """_paths_bytes must size inputs through pyarrow.fs, not os.stat:
    a file:// URI (the simplest non-os.stat-able scheme) is sized
    exactly like the bare path, directories recurse, and an
    unresolvable scheme returns None (auto-spill stays off)."""
    import os

    from coco_search_ray.pipelines.kg import _paths_bytes
    from coco_search_ray.sources.synth import transcript_files

    files = transcript_files(smoke_dir)
    want = sum(os.path.getsize(f) for f in files)
    assert _paths_bytes(files) == want
    assert _paths_bytes([f"file://{f}" for f in files]) == want  # os.stat would fail
    assert _paths_bytes([f"file://{smoke_dir}"]) >= want  # dir recursion
    assert _paths_bytes(["definitely-not-a-scheme://bucket/key"]) is None
    assert _paths_bytes([str(smoke_dir) + "/no_such_file.parquet"]) is None


def test_auto_spill_triggers_on_non_stat_scheme(ray_session, smoke_dir, tmp_path, monkeypatch):
    """The AUTO spill trigger must escalate for inputs os.stat cannot
    see (remote object storage in production; file:// URIs here):
    with the pin threshold at 0 and file://-scheme inputs, the
    spill_stream=None build must take the file-backed branch and still
    produce the exact default triple set."""
    import os

    import pandas as pd

    from coco_search_ray.pipelines.kg import build_kg, build_kg_from_dir
    from coco_search_ray.sources.synth import load_catalog, transcript_files

    base = build_kg_from_dir(smoke_dir, concurrency=2).to_pandas()
    monkeypatch.setenv("KG_STREAM_PIN_MAX_INPUT_BYTES", "0")
    sdir = str(tmp_path / "stream")
    got = build_kg(
        [f"file://{f}" for f in transcript_files(smoke_dir)],
        load_catalog(smoke_dir),
        concurrency=2,
        stream_spill_dir=sdir,  # spill_stream stays None: AUTO decides
    ).to_pandas()
    files = [f for f in os.listdir(sdir) if f.endswith(".parquet")]
    assert files, "auto trigger must spill for a non-os.stat-able scheme"
    pd.testing.assert_frame_equal(_sorted(base), _sorted(got))


def test_strip_file_scheme_decodes_uris():
    """Round-5 review finding: pathlib as_uri() percent-encodes spaces
    and file:// may carry a localhost authority; a naive prefix slice
    left literal %20 (FileNotFound downstream) and turned the host into
    a relative path segment. Remote schemes pass through untouched."""
    from pathlib import Path

    from coco_search_ray.pipelines.kg import _strip_file_scheme

    assert _strip_file_scheme(
        [
            "file:///tmp/my%20dir/a.parquet",
            "file://localhost/a.parquet",
            "file:///plain/b.parquet",
            "s3://bucket/x",
            "/local/y",
            Path("/tmp/x y/z.parquet").as_uri(),
        ]
    ) == [
        "/tmp/my dir/a.parquet",
        "/a.parquet",
        "/plain/b.parquet",
        "s3://bucket/x",
        "/local/y",
        "/tmp/x y/z.parquet",
    ]


def test_input_contract_guards():
    """Round-5 flagship-review findings: (a) normalize_turns drops
    unattributable rows (null conv_id, null/negative turn_idx) — the
    fused conv*T+turn assembly key would misattribute or crash on them;
    (b) the oracle applies the identical drop; (c) a dotted catalog
    entity_id fails fast (it would silently shift the qualified
    '<root_id>.<tail>' split); (d) a PRED outside [a-z][a-z0-9_]* fails
    registry validation (it is interpolated into SQL literals);
    (e) the oracle's tool normalization matches Arrow's simple case
    mapping, not Python's full one."""
    import pyarrow as pa
    import pytest as _pytest

    from coco_search_ray.stages.normalize import normalize_turns

    batch = pa.table(
        {
            "conv_id": pa.array(["c1", None, "c2", "c3"], pa.string()),
            "turn_idx": pa.array([0, 1, -1, None], pa.int32()),
            "role": pa.array(["user"] * 4, pa.string()),
            "text": pa.array(["a", "b", "c", "d"], pa.string()),
            "tool": pa.array(["t"] * 4, pa.string()),
        }
    )
    out = normalize_turns(batch)
    assert out["conv_id"].to_pylist() == ["c1"]

    from coco_search_ray.functions.linker_core import EntityIndex

    with _pytest.raises(ValueError, match="contains '.'"):
        EntityIndex([{"entity_id": "svc.payments", "canonical_name": "X", "aliases": []}])

    import types

    from coco_search_ray.extractors import _validate

    bad = types.ModuleType("bad")
    bad.NAME, bad.KIND, bad.QUICK = "bad", "literal", "x"
    bad.PRED = "uses'tool"
    bad.extract = lambda t: []
    with _pytest.raises(TypeError, match="PRED"):
        _validate(bad)

    from coco_search_ray.oracle.kg_oracle import _normalize_tool

    # explicit ASCII-lower contract (round-5): 'İ' is untouched — NOT
    # Python's 'i̇' and NOT utf8proc's 'i'; ASCII trim set keeps NBSP
    assert _normalize_tool("İ") == "İ"
    assert _normalize_tool(" BASH\t") == "bash"
    assert _normalize_tool("x\xa0") == "x\xa0"
