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
        # FULL row parity including root attribution: both branches claim
        # a same-depth multi-parent node by the MINIMAL from-node (the
        # SQL oracle's rule), so (root, node, depth) must agree exactly
        assert sorted(map(tuple, loc.itertuples(index=False))) == sorted(
            map(tuple, dist.itertuples(index=False))
        )


def test_bfs_diamond_claim_rule_and_sparse_exhaustion(ray_session):
    """Two round-5 lockstep findings pinned:
    - a node first reached at the same depth from two roots is claimed
      by the MINIMAL from-node on BOTH branches (bfs_local expanded in
      discovery order before — here z was discovered first, so n went
      to R1 while the SQL/distributed min(from) rule says a -> R2);
    - a frontier that exhausts before max_depth (sparse graph) crashed
      bfs_distributed: to_pandas() of an all-empty round loses columns."""
    import pandas as pd
    import ray.data

    from coco_search_ray.stages.graph import bfs_distributed, bfs_local

    edges = pd.DataFrame(
        {"subj": ["R1", "R2", "z", "a"], "obj": ["z", "a", "n", "n"]}
    )
    loc = bfs_local(edges, ["R1", "R2"])
    dist = bfs_distributed(ray.data.from_pandas(edges), ["R1", "R2"])
    assert sorted(map(tuple, loc.itertuples(index=False))) == sorted(
        map(tuple, dist.itertuples(index=False))
    )
    n_claim = loc[loc["node"] == "n"]
    assert list(n_claim["root"]) == ["R2"] and list(n_claim["depth"]) == [2]
    # exhaustion at depth 2 << max_depth=5: must terminate, not KeyError


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


def _sql_rule_bfs(edge_pairs, roots, max_depth=5):
    """Pure replay of the _kg_bfs_sql unrolled-CTE rule: per level, a
    not-yet-seen node reached from the frontier is claimed by the root
    of the MINIMAL from-node (row_number OVER (PARTITION BY t ORDER BY
    s) = 1), depth = first-reach level."""
    out = {}
    cur = {}
    for r in sorted(set(roots)):
        out[r] = (r, 0)
        cur[r] = r
    for d in range(1, max_depth + 1):
        if not cur:
            break
        cand = {}
        for s, t in edge_pairs:
            if s in cur and t not in out:
                cand.setdefault(t, []).append(s)
        nxt = {}
        for t, ss in cand.items():
            root = cur[min(ss)]
            out[t] = (root, d)
            nxt[t] = root
        cur = nxt
    return sorted((root, node, depth) for node, (root, depth) in out.items())


import hypothesis.strategies as _st
from hypothesis import given as _given
from hypothesis import settings as _settings

_NODE = _st.sampled_from(list("abcdefgh"))


@_given(
    _st.lists(_st.tuples(_NODE, _NODE), max_size=24),
    _st.lists(_NODE, min_size=1, max_size=3),
    _st.booleans(),
)
@_settings(max_examples=300, deadline=None)
def test_bfs_local_lockstep_with_sql_rule(pairs, roots, reverse):
    """bfs_local == the SQL oracle's min-from claim rule on arbitrary
    small graphs (duplicate edges, self-loops, cycles, diamonds,
    unreachable roots, early exhaustion)."""
    import pandas as pd

    from coco_search_ray.stages.graph import bfs_local

    edges = pd.DataFrame(pairs, columns=["subj", "obj"]) if pairs else pd.DataFrame(
        {"subj": [], "obj": []}
    )
    got = sorted(map(tuple, bfs_local(edges, roots, reverse=reverse).itertuples(index=False)))
    eff = [(t, s) for s, t in pairs] if reverse else pairs
    want = _sql_rule_bfs(eff, roots)
    assert got == want, (pairs, roots, reverse, got, want)
