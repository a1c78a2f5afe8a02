"""Dedup suite + similarity search on small crafted inputs with known
ground truth (the driver tables have no duplicates, so these fixtures
contain real ones)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_table():
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    texts = [
        base,                                    # 0
        base,                                    # 1 exact dup of 0
        base.replace("today", "tonight"),        # 2 near dup of 0
        "completely different content about database indexing and vector search",  # 3
        "completely different content about database indexing and vector searches",  # 4 near dup of 3
        "unrelated short text",                  # 5
    ]
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_exact_dedup(ray_session, docs_table):
    import ray.data
    from coco_search_ray.stages.dedup import exact_dedup_groups

    out = exact_dedup_groups(ray.data.from_arrow(docs_table)).to_pandas()
    assert len(out) == 5  # 6 docs, one exact-dup pair
    dup = out[out["n_copies"] == 2]
    assert dup["doc_id"].tolist() == [0]  # keep-first = min doc_id


def test_minhash_neardup_survivors(ray_session, docs_table):
    import ray.data
    from coco_search_ray.stages.dedup import neardup_survivors

    out = neardup_survivors(ray.data.from_arrow(docs_table), threshold=0.6).to_pandas()
    groups = dict(zip(out["doc_id"], out["group_size"]))
    assert groups[0] == 3  # 0,1,2 one component
    assert groups[3] == 2  # 3,4
    assert groups[5] == 1


def test_neardup_survivors_10x_vs_bruteforce(ray_session):
    """10x-doc-count check (VERDICT r01 #3): the distributed LSH -> verify
    (text re-join, no corpus broadcast) -> pair-touched-only components
    path must equal single-process brute force over all pairs."""
    import ray.data
    from coco_search_ray.functions.hashing import char_shingle_hashes, jaccard_u64
    from coco_search_ray.stages.canonicalize import union_find
    from coco_search_ray.stages.dedup import neardup_survivors

    rng = np.random.RandomState(9)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu".split()
    texts = []
    for i in range(60):
        base = " ".join(words[rng.randint(0, len(words))] for _ in range(30))
        texts.append(base)
        texts.append(base + " tail")  # near-dup sibling
    rng.shuffle(texts)
    ids = list(range(len(texts)))

    # brute-force truth
    hs = [char_shingle_hashes(t, 5) for t in texts]
    pairs = [
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if jaccard_u64(hs[i], hs[j]) >= 0.6
    ]
    touched = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    m = union_find(touched, sorted(pairs))
    sizes: dict[int, int] = {}
    for i, c in m.items():
        sizes[c] = sizes.get(c, 0) + 1
    expect = sorted((i, sizes.get(i, 1)) for i in ids if m.get(i, i) == i)

    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})
    out = neardup_survivors(ray.data.from_arrow(t).repartition(4), threshold=0.6).to_pandas()
    got = sorted(zip(out["doc_id"], out["group_size"]))
    assert got == expect


def test_simhash_pairs(ray_session, docs_table):
    import ray.data
    from coco_search_ray.stages.dedup import simhash_candidate_pairs
    from coco_search_ray.stages.textops import doc_simhash

    sh = ray.data.from_arrow(docs_table).map_batches(doc_simhash, batch_format="pyarrow")
    pairs = simhash_candidate_pairs(sh).to_pandas()
    got = set(zip(pairs["a"], pairs["b"]))
    assert (0, 1) in got  # exact dup -> hamming 0
    assert all(h <= 3 for h in pairs["hamming"])


def test_embedding_neardup_matches_numpy(ray_session):
    import ray.data
    from coco_search_ray.stages.dedup import embedding_neardup_pairs

    rng = np.random.RandomState(0)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    vecs[7] = vecs[3] + 0.01 * rng.normal(size=16).astype(np.float32)  # planted near-dup
    ids = np.arange(50, dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids), "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    out = embedding_neardup_pairs(ray.data.from_arrow(t), vecs, ids, threshold=0.95).to_pandas()
    assert (3, 7) in set(zip(out["a"], out["b"]))

    nv = vecs.astype(np.float64)
    nv = nv / np.linalg.norm(nv, axis=1, keepdims=True)
    sims = nv @ nv.T
    expected = {(i, j) for i in range(50) for j in range(i + 1, 50) if sims[i, j] >= 0.95}
    assert set(zip(out["a"], out["b"])) == expected


def test_brute_topk_matches_numpy(ray_session):
    import ray.data
    from coco_search_ray.stages.ann import brute_force_topk

    rng = np.random.RandomState(1)
    vecs = rng.normal(size=(200, 16))
    ids = np.arange(200, dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids), "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    q = vecs[:2]
    out = brute_force_topk(ray.data.from_arrow(t), q, k=5).to_pandas()

    nv = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    nv = nv / np.linalg.norm(nv, axis=1, keepdims=True)
    nq = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = nq @ nv.T
    for qi in range(2):
        expect = set(np.argsort(-sims[qi])[:5].tolist())
        got = set(out[out["query_id"] == qi]["vec_id"].tolist())
        assert got == expect
        assert out[out["query_id"] == qi].iloc[0]["vec_id"] == qi  # self is top hit


def test_ivf_topk_recall(ray_session):
    import ray.data
    from coco_search_ray.stages.ann import brute_force_topk, ivf_topk

    rng = np.random.RandomState(2)
    vecs = rng.normal(size=(500, 16))
    ids = np.arange(500, dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids), "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    q = vecs[:3]
    exact = brute_force_topk(ds, q, k=10).to_pandas()
    approx = ivf_topk(ds, q, k=10, n_clusters=8, nprobe=4).to_pandas()
    recalls = []
    for qi in range(3):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # nprobe=4 of 8 partitions


def test_sessionize(ray_session):
    import ray.data
    from coco_search_ray.stages.window import sessionize

    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 02:00",  # user 1: 2 sessions
         "2024-01-01 00:05"]                                          # user 2: 1 session
    )
    df = pd.DataFrame({"user_id": [1, 1, 1, 2], "ts": ts})
    out = sessionize(ray.data.from_pandas(df), gap_s=1800).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("session_start")
    assert len(u1) == 2
    assert u1["n_events"].tolist() == [2, 1]
    assert len(out[out["user_id"] == 2]) == 1


def test_tumbling_bucket_vectorized():
    import pandas as pd
    import pyarrow as pa
    from coco_search_ray.stages.window import add_tumbling_bucket

    ts = pd.to_datetime(["2024-01-01 00:59:59", "2024-01-01 01:00:00", "2024-01-01 02:30:00"])
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us")), "value": [1.0, 2.0, 3.0]})
    out = add_tumbling_bucket(t, size_s=3600)
    b = out["hour_bucket"].to_pylist()
    assert b[0] + 1 == b[1]  # boundary crossing
    assert b[2] == b[1] + 1  # 02:30 -> one bucket later than 01:00? (floor)


def test_asof_join_matches_pandas(ray_session):
    """Distributed as-of join (coarse key buckets + per-bucket
    merge_asof) == one global pandas merge_asof, across bucket
    boundaries, with strict inequality and int dtypes preserved."""
    import numpy as np
    import ray.data

    from coco_search_ray.stages.asof import asof_join

    rng = np.random.RandomState(7)
    n = 400
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 150, n),  # > num_buckets keys
            "ts": pd.to_datetime(rng.randint(0, 50_000, n), unit="s"),
            "row_id": np.arange(n),
            "v": rng.rand(n),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 150, 300),
            "ts": pd.to_datetime(rng.randint(0, 50_000, 300), unit="s"),
            "v": rng.rand(300),
        }
    ).drop_duplicates(subset=["k", "ts"])

    got = (
        asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            key_col="k",
            ts_col="ts",
            left_cols=["row_id", "v"],
            right_cols={"ts": "r_ts", "v": "r_v"},
            num_buckets=16,
        )
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(columns={"v": "r_v"}).assign(r_ts=lambda d: d["ts"]),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=False,
    ).sort_values("row_id").reset_index(drop=True)
    cols = ["row_id", "k", "ts", "v", "r_ts", "r_v"]
    # integer columns come back as NULLABLE Int64 uniformly across
    # buckets (round-5 review: a plain int64 cast produced float64 only
    # in buckets containing an unmatched left row — a bucket-composition-
    # dependent schema — and crashed on genuine nulls); values unchanged
    assert str(got["row_id"].dtype) in ("int64", "Int64")
    got["row_id"] = got["row_id"].astype("int64")
    pd.testing.assert_frame_equal(got[cols], exp[cols])


def test_embedding_neardup_autoswitch_branches_consistent(ray_session):
    """Size-triggered brute-force -> sign-LSH switch (VERDICT r02 #5):
    force BOTH branches on the same input; the LSH branch's pairs must be
    a subset of exact brute-force pairs (bucketing only ever loses
    recall, never invents a pair) and must keep the planted near-dups."""
    import ray.data
    from coco_search_ray.stages.dedup import embedding_neardup

    rng = np.random.RandomState(1)
    vecs = rng.normal(size=(80, 12)).astype(np.float32)
    vecs[10] = vecs[5] + 0.005 * rng.normal(size=12).astype(np.float32)
    vecs[40] = vecs[20] + 0.005 * rng.normal(size=12).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(80, dtype=np.int64)),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t)
    brute = embedding_neardup(ds, dim=12, threshold=0.95).to_pandas()
    lsh = (
        embedding_neardup(
            ds, dim=12, threshold=0.95, brute_max=10, num_planes=4, num_tables=16
        )
        .to_pandas()
        .drop_duplicates(subset=["a", "b"])
    )
    bp = set(zip(brute["a"], brute["b"]))
    lp = set(zip(lsh["a"], lsh["b"]))
    assert (5, 10) in bp and (20, 40) in bp
    assert lp <= bp
    assert (5, 10) in lp and (20, 40) in lp


def test_quota_sample_deterministic_and_composable(ray_session):
    """quota_sample: membership is a pure function of (id, rate) —
    rerun-identical, monotone in rate (raising a rate only ADDS docs),
    and composable with assign_splits (sampled docs keep their split)."""
    import pyarrow as pa
    import ray.data

    from coco_search_ray.stages.split import assign_splits, quota_sample

    t = pa.table(
        {
            "doc_id": list(range(400)),
            "lang": (["en", "de", "fr", "es"] * 100),
        }
    )
    ds = ray.data.from_arrow(t)
    a = quota_sample(ds, "doc_id", "lang", {"en": 0.5, "de": 0.25}).to_pandas()
    b = quota_sample(ds, "doc_id", "lang", {"en": 0.5, "de": 0.25}).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # deterministic
    assert set(a[a["lang"] == "es"]["doc_id"]) == set(range(3, 400, 4))  # rate 1.0 keeps all
    wider = quota_sample(ds, "doc_id", "lang", {"en": 0.8, "de": 0.25}).to_pandas()
    assert set(a[a["lang"] == "en"]["doc_id"]) <= set(wider[wider["lang"] == "en"]["doc_id"])
    # composable: the sampled subset's split labels equal the full
    # assignment's labels for the same ids
    full = assign_splits(ds, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    samp = assign_splits(
        quota_sample(ds, "doc_id", "lang", {"en": 0.5, "de": 0.25}),
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    ).to_pandas()
    merged = samp.merge(full, on="doc_id", suffixes=("_s", "_f"))
    assert (merged["split_s"] == merged["split_f"]).all()


def test_semantic_dedup_invariants(ray_session):
    """semantic_dedup: every vec assigned exactly once, a dropped vec
    always has a lower-id same-cluster neighbor above threshold, and
    exact duplicates are always deduped (keep-lowest-id)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from coco_search_ray.stages.dedup import semantic_dedup

    rng = np.random.RandomState(7)
    base = rng.randn(40, 16).astype(np.float64)
    vecs = list(base) + [base[3] * 2.0, base[11] * 0.5]  # exact dups (scaled)
    ids = list(range(40)) + [100, 101]
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float64())),
        }
    )
    flags, cents = semantic_dedup(
        ray.data.from_arrow(t), base, threshold=0.95, n_clusters=4
    )
    df = flags.to_pandas()
    assert sorted(df["vec_id"]) == sorted(ids)  # each vec exactly once
    # scaled copies are cosine-1.0 with their originals -> same cluster,
    # higher id dropped
    d = df.set_index("vec_id")
    assert bool(d.loc[100, "dropped"]) and bool(d.loc[101, "dropped"])
    assert not bool(d.loc[3, "dropped"]) and not bool(d.loc[11, "dropped"])
    assert len(cents) == 4


def test_semantic_dedup_blocked_matches_unchunked(ray_session):
    """One cluster >> block size: the row-blocked keep-first mask must be
    row-identical to the naive full n x n triu(any) computation (the
    pre-round-5 unchunked formulation)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from coco_search_ray.functions.numeric import round_half_away
    from coco_search_ray.stages.dedup import semantic_dedup

    rng = np.random.RandomState(17)
    n, dim = 600, 8  # low dim -> plenty of cosine>=0.9 pairs by chance
    x = rng.randn(n, dim)
    # salt in some exact scaled dups across block boundaries
    x[250] = x[3] * 1.7
    x[555] = x[40] * 0.2
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in x], pa.list_(pa.float64())),
        }
    )
    thr = 0.9
    flags, _ = semantic_dedup(
        ray.data.from_arrow(t),
        x[:50],
        threshold=thr,
        n_clusters=1,  # force ONE cluster of 600 rows
        block_rows=64,  # << cluster size: exercises both chunk loops
        chunk_rows=100,
    )
    got = flags.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert (got["cluster"] == 0).all()
    # reference: unchunked full-matrix keep-first
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    cos = round_half_away(xn @ xn.T, 6)
    want = np.triu(cos >= thr, k=1).any(axis=0)
    assert want.any() and not want.all()  # non-trivial case
    assert (got["dropped"].to_numpy() == want).all()


def test_semdedup_gate_cosines_off_rounding_boundary():
    """ADVICE r04 (low): the pipeline computes cosine normalize-then-dot
    while the DuckDB oracle computes dot/(|a||b|); the two op orders can
    differ in the last ulp, so a raw cosine landing EXACTLY on a 1e-6
    half-away rounding boundary could flip an assignment or drop across
    engines. The dedup.py docstring claims no gate vector sits on a
    boundary — PIN that claim: every decision cosine at the sf0.01 gate
    tier (all 500x8 assignment cosines + every within-cluster pair fed
    to the >=0.9 compare) must be at least 100x the worst-case
    cross-engine dot-product drift (dim * machine-eps, the classic
    summation error bound) from the nearest (k + 0.5) * 1e-6 boundary.
    Measured min margin is ~3.6e-11 cosine units vs a drift bound of
    ~2.8e-14 — three orders of headroom. Pure numpy replay of
    semantic_dedup's exact float ops (same sample, seed, argmax
    tiebreak); no Ray needed."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("driver test tables not present")
    from coco_search_ray.functions.numeric import round_half_away
    from coco_search_ray.stages.ann import kmeans_centroids

    t = pq.read_table(os.path.join(sf, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    order = pc.sort_indices(t["vec_id"])
    emb = np.array(pc.take(t["embedding"], order).to_pylist(), dtype=np.float64)
    sample = emb[:2000]
    cents = kmeans_centroids(sample, 8, seed=5)  # q_embedding_semdedup params

    def boundary_margin(raw: np.ndarray) -> float:
        # distance (in COSINE units) from the nearest half-away
        # rounding boundary (k + 0.5) * 1e-6
        frac = np.abs(raw) * 1e6
        return float(np.min(np.abs(frac - np.floor(frac) - 0.5))) * 1e-6

    # worst-case cross-engine dot-product drift: n-term summation in a
    # different order differs by at most ~dim * eps for unit vectors
    drift = emb.shape[1] * np.finfo(np.float64).eps

    n = np.linalg.norm(emb, axis=1, keepdims=True)
    n[n == 0] = 1.0
    xn = emb / n
    raw_assign = xn @ cents.T
    assert boundary_margin(raw_assign) > 100 * drift

    # assignment exactly as the pipeline: argmax of ROUNDED cosine
    # (np.argmax ties -> lowest index == lower cluster id)
    cluster = np.argmax(round_half_away(raw_assign, 6), axis=1)
    for c in range(len(cents)):
        grp = xn[cluster == c]
        if len(grp) < 2:
            continue
        raw_pairs = grp @ grp.T
        iu = np.triu_indices(len(grp), k=1)
        assert boundary_margin(raw_pairs[iu]) > 100 * drift, f"cluster {c}"


def test_distributed_divergence_fixes(ray_session):
    """Round-5 stage-review findings, pinned: (a) bloom_semi_join is
    exact for bool keys (Python str(True)='True' vs Arrow 'true' made
    the exact check false-negative); (b) asof_join keeps a uniform int64
    schema and survives a genuine null in an int right column (the
    plain-int64 cast crashed, and NaN-promotion made block schemas
    bucket-dependent); (c) ivf_topk results are invariant to
    repartitioning (the old limit() sample was an arrival-order
    prefix)."""
    import ray.data
    from coco_search_ray.stages.ann import ivf_topk
    from coco_search_ray.stages.asof import asof_join
    from coco_search_ray.stages.sketch import bloom_semi_join

    # (a) bool keys survive the exact confirmation
    t = pa.table({"flag": pa.array([True, False, True]), "x": pa.array([1, 2, 3])})
    out = bloom_semi_join(ray.data.from_arrow(t), "flag", [True]).to_pandas()
    assert sorted(out["x"]) == [1, 3]

    # (a2) the BLOOM sides share the exact check's Arrow stringification:
    # a float32 column probed with Python str() hashed the widened repr
    # ('0.10000000149011612') while the bloom held str(0.1)='0.1' — a
    # false NEGATIVE that dropped the row before the exact check ran
    tf = pa.table(
        {"v": pa.array([0.1, 0.5, 0.25], pa.float32()), "x": pa.array([1, 2, 3])}
    )
    out = bloom_semi_join(ray.data.from_arrow(tf), "v", [0.1, 0.25]).to_pandas()
    assert sorted(out["x"]) == [1, 3]

    # (b) nullable int right column: no crash, uniform int64 values
    left = pd.DataFrame({"k": ["a", "b"], "ts": pd.to_datetime([10, 20], unit="s"), "lv": [1, 2]})
    right = pa.table(
        {"k": pa.array(["a", "b"]),
         "ts": pa.array(pd.to_datetime([5, 15], unit="s"), pa.timestamp("us")),
         "rv": pa.array([7, None], pa.int64())}
    )
    got = asof_join(
        ray.data.from_pandas(left), ray.data.from_arrow(right),
        key_col="k", ts_col="ts", left_cols=["lv"], right_cols={"rv": "rv"},
        num_buckets=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert got["rv"].tolist()[0] == 7 and pd.isna(got["rv"].tolist()[1])

    # (c) ivf centroids/sample are layout-invariant
    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(400, 16))
    t = pa.table({
        "vec_id": pa.array(np.arange(400, dtype=np.int64)),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
    })
    q = vecs[:2]
    a = ivf_topk(ray.data.from_arrow(t), q, k=5, n_clusters=4, sample_size=100).to_pandas()
    b = ivf_topk(
        ray.data.from_arrow(t).repartition(13), q, k=5, n_clusters=4, sample_size=100
    ).to_pandas()
    key = ["query_id", "vec_id", "cos_sim"]
    pd.testing.assert_frame_equal(
        a[key].sort_values(key).reset_index(drop=True),
        b[key].sort_values(key).reset_index(drop=True),
    )
