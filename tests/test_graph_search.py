"""Graph traversal (BFS tree/impact) + search API tests."""

import pandas as pd
import pytest


@pytest.fixture()
def edges():
    # a -> b -> c -> a (cycle), b -> d, e -> f (disjoint), chain g..l deep
    rows = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"), ("e", "f"),
        ("g", "h"), ("h", "i"), ("i", "j"), ("j", "k"), ("k", "l"), ("l", "m"),
    ]
    return pd.DataFrame(rows, columns=["subj", "obj"])


def test_bfs_forward_cycle_and_depth(edges):
    from coco_search_ray.stages.graph import bfs_local

    out = bfs_local(edges, ["a"])
    got = dict(zip(out["node"], out["depth"]))
    assert got == {"a": 0, "b": 1, "c": 2, "d": 2}  # cycle back to a not re-visited

    deep = bfs_local(edges, ["g"], max_depth=5)
    assert dict(zip(deep["node"], deep["depth"]))["l"] == 5
    assert "m" not in set(deep["node"])  # depth cap


def test_bfs_reverse_impact(edges):
    from coco_search_ray.stages.graph import bfs_local

    out = bfs_local(edges, ["d"], reverse=True)
    got = dict(zip(out["node"], out["depth"]))
    assert got["b"] == 1 and got["a"] == 2 and got["c"] == 3


def test_bfs_batch_shared_visited(edges):
    from coco_search_ray.stages.graph import bfs_local

    out = bfs_local(edges, ["a", "b"])
    # b seeded as its own root -> expanded once, attributed to one root
    assert (out["node"] == "b").sum() == 1
    assert set(out["node"]) == {"a", "b", "c", "d"}


def test_bfs_distributed_matches_local(ray_session, edges):
    import ray.data
    from coco_search_ray.stages.graph import bfs_distributed, bfs_local

    eds = ray.data.from_pandas(edges)
    for reverse in (False, True):
        loc = bfs_local(edges, ["a", "e", "g"], reverse=reverse)
        dist = bfs_distributed(eds, ["a", "e", "g"], reverse=reverse)
        # root attribution of same-depth ties is implementation-defined;
        # (node, depth) sets must agree
        assert set(zip(loc["node"], loc["depth"])) == set(zip(dist["node"], dist["depth"]))


def test_search_exact_canonical_top1(smoke_catalog):
    from coco_search_ray.pipelines.search import search_catalog

    name = smoke_catalog.column("canonical_name")[0].as_py()
    eid = smoke_catalog.column("entity_id")[0].as_py()
    out = search_catalog(smoke_catalog, name, limit=5)
    assert out.iloc[0]["entity_id"] == eid


def test_search_mode_selection(smoke_catalog):
    from coco_search_ray.pipelines.search import search_catalog

    alias = smoke_catalog.column("aliases")[0][0].as_py()  # identifier-shaped
    hybrid = search_catalog(smoke_catalog, alias, limit=5)
    assert (hybrid["match_type"].isin(["keyword", "both"])).any()

    plain = search_catalog(smoke_catalog, "find the thing", limit=5)
    # plain English -> semantic-only: no keyword channel ran
    assert plain["keyword_score"].isna().all()


def test_multi_search_merge(smoke_catalog):
    from coco_search_ray.pipelines.search import multi_search
    from coco_search_ray.sources.synth import generate_catalog

    other = generate_catalog(40, seed=99)
    name = smoke_catalog.column("canonical_name")[0].as_py()
    out = multi_search({"main": smoke_catalog, "other": other}, name, limit=8)
    assert len(out) <= 8
    assert set(out["catalog"]) <= {"main", "other"}
    assert (out["score"].diff().fillna(0) <= 1e-12).all()  # sorted desc


def test_multi_search_tolerates_failures(smoke_catalog):
    from coco_search_ray.pipelines.search import multi_search

    out = multi_search({"main": smoke_catalog, "broken": None}, "Account Payment", limit=5)
    assert set(out["catalog"]) == {"main"}


def test_pagerank_matches_local_reference(ray_session):
    """Distributed fixed-iteration PageRank == a plain local computation
    on a small crafted graph (no dangling redistribution, d=0.85)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from coco_search_ray.stages.graph import pagerank

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
    t = pa.table(
        {
            "subj": pa.array([e[0] for e in edges]),
            "obj": pa.array([e[1] for e in edges]),
        }
    )
    got = pagerank(ray.data.from_arrow(t), iterations=3, damping=0.85)

    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    deg = {x: sum(1 for s, _ in edges if s == x) for x in nodes}
    r = {x: 1 / n for x in nodes}
    for _ in range(3):
        inc = {x: 0.0 for x in nodes}
        for s, d_ in edges:
            inc[d_] += r[s] / deg[s]
        r = {x: 0.15 / n + 0.85 * inc[x] for x in nodes}
    exp = pd.DataFrame({"entity": list(r), "rank": list(r.values())}).sort_values(
        ["rank", "entity"], ascending=[False, True]
    ).reset_index(drop=True)
    assert got["entity"].tolist() == exp["entity"].tolist()
    assert np.allclose(got["rank"], exp["rank"])
