"""Graph traversal over the triple table — the reference's dependency
tree / impact queries re-expressed over (subj, pred, obj).

Reference semantics carried over (deps/query.py:179-421):
- forward BFS (get_dependency_tree): follow subj -> obj edges from a
  root, max_depth=5, cycle detection via a visited set;
- reverse BFS (get_impact): follow obj -> subj;
- batch variants seed ALL roots into one queue with a SHARED visited set
  (a node reached by any root is expanded once).

Execution: iterative frontier expansion. Each round is one semi-join of
the frontier against the edge table. Two paths:
- driver BFS over a broadcast adjacency dict (edges fit memory — the
  reference's case; trees are small);
- distributed rounds: frontier (small Dataset) semi-joined against the
  big edge Dataset via a broadcast frontier set inside map_batches —
  O(depth) passes, no all-to-all shuffle.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count

MAX_DEPTH = 5


def _adjacency(edges: pd.DataFrame, reverse: bool) -> dict[str, list[str]]:
    src, dst = ("obj", "subj") if reverse else ("subj", "obj")
    adj: dict[str, list[str]] = {}
    for s, d in zip(edges[src], edges[dst]):
        adj.setdefault(s, []).append(d)
    for v in adj.values():
        v.sort()
    return adj


def bfs_local(
    edges: pd.DataFrame,
    roots: list[str],
    max_depth: int = MAX_DEPTH,
    reverse: bool = False,
) -> pd.DataFrame:
    """Batch BFS with a shared visited set (reference deps/query.py:296-421
    batch shape). Returns (root, node, depth) rows; depth = first-reach
    level. Deterministic claim rule: each level expands frontier nodes in
    SORTED order, so a node first reached at depth d from several
    frontier nodes is claimed by the MINIMAL from-node — the same rule
    bfs_distributed's min(from) reduction and the SQL oracle's
    row_number() OVER (ORDER BY e.s) implement. (Expanding in discovery
    order instead diverged from both on diamond shapes where discovery
    order != node order — lockstep-fuzz finding.)"""
    adj = _adjacency(edges, reverse)
    out_root: list[str] = []
    out_node: list[str] = []
    out_depth: list[int] = []
    visited: set[str] = set()
    frontier: list[tuple[str, str]] = []  # (root, node)
    for r in sorted(set(roots)):
        if r not in visited:
            visited.add(r)
            frontier.append((r, r))
            out_root.append(r)
            out_node.append(r)
            out_depth.append(0)
    depth = 0
    while frontier and depth < max_depth:
        depth += 1
        nxt: list[tuple[str, str]] = []
        for root, node in sorted(frontier, key=lambda rn: rn[1]):
            for nb in adj.get(node, ()):  # sorted
                if nb not in visited:
                    visited.add(nb)
                    nxt.append((root, nb))
                    out_root.append(root)
                    out_node.append(nb)
                    out_depth.append(depth)
        frontier = nxt
    return pd.DataFrame({"root": out_root, "node": out_node, "depth": out_depth})


def pagerank(
    edge_ds: ray.data.Dataset,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "subj",
    dst: str = "obj",
) -> pd.DataFrame:
    """Fixed-iteration PageRank over an edge Dataset — the iterative-
    algorithm shape on Ray Data: the rank/out-degree vectors are SMALL
    (O(nodes)) and broadcast per iteration; each iteration is one pass
    over the BIG edge stream with per-block pre-aggregation (pandas
    groupby inside the batch) before the tiny groupby(dst) sum. No
    dangling-mass redistribution (nodes without outgoing edges leak
    mass) — defined identically in the SQL oracle.

    Returns (entity, rank) for all nodes, deterministic ordering by
    (rank desc, entity)."""
    import numpy as np
    from ray.data.aggregate import Sum

    edges = edge_ds.select_columns([src, dst]).materialize()
    deg = edges.groupby(src).aggregate(Count(alias_name="_d")).to_pandas()
    nodes = sorted(set(deg[src]) | set(edges.unique(dst)))
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"entity": [], "rank": []})
    out_deg = dict(zip(deg[src], deg["_d"]))
    ranks = {x: 1.0 / n for x in nodes}
    base = (1.0 - damping) / n

    for _ in range(iterations):
        state_ref = ray.put((ranks, out_deg))

        def contribs(b: pa.Table) -> pa.Table:
            from ..functions.broadcast import deref_cached

            r, d = deref_cached(state_ref)
            df = pd.DataFrame({"s": b[src].to_pylist(), "t": b[dst].to_pylist()})
            df["c"] = df["s"].map(r) / df["s"].map(d)
            # per-block pre-aggregation before the shuffle
            g = df.groupby("t", as_index=False)["c"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        partial = (
            edges.map_batches(contribs, batch_format="pyarrow")
            .groupby("t")
            .aggregate(Sum("c", alias_name="incoming"))
            .to_pandas()
        )
        incoming = dict(zip(partial["t"], partial["incoming"]))
        ranks = {x: base + damping * incoming.get(x, 0.0) for x in nodes}

    out = pd.DataFrame({"entity": list(ranks), "rank": list(ranks.values())})
    return out.sort_values(["rank", "entity"], ascending=[False, True]).reset_index(drop=True)


def bfs_distributed(
    edge_ds: ray.data.Dataset,
    roots: list[str],
    max_depth: int = MAX_DEPTH,
    reverse: bool = False,
) -> pd.DataFrame:
    """Depth-bounded frontier expansion against a LARGE edge Dataset: each
    round broadcasts the (small) frontier set and scans edges with a
    vectorized isin filter — no shuffle, O(depth) passes. Shared visited
    set lives on the driver (nodes reached are few; edges are the big
    side)."""
    import pyarrow.compute as pc

    src, dst = ("obj", "subj") if reverse else ("subj", "obj")
    visited: dict[str, tuple[str, int]] = {}  # node -> (root, depth)
    frontier: dict[str, str] = {}  # node -> root
    for r in sorted(set(roots)):
        visited.setdefault(r, (r, 0))
        frontier[r] = r

    from ..functions.broadcast import deref_cached

    edge_small = edge_ds.select_columns([src, dst])
    for depth in range(1, max_depth + 1):
        if not frontier:
            break
        # build the frontier VALUE SET once per round (not per block —
        # a per-block ray.get + sort + pa.array rebuild was repeated
        # driver-state reconstruction on the hot scan path), ship via
        # the worker-cached deref
        farr_ref = ray.put(pa.array(sorted(frontier)))

        def expand(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch[src], value_set=deref_cached(farr_ref))
            hit = batch.filter(mask)
            if hit.num_rows == 0:
                return pa.table(
                    {"from": pa.array([], pa.string()), "to": pa.array([], pa.string())}
                )
            # per-block reduction BEFORE the driver pull: the edge table
            # is per-occurrence (one row per mention — 44M+ at bench
            # tier) and the roots are top-degree by construction, so raw
            # hits are massively duplicated. min(from) per dst preserves
            # the claim semantics exactly (min of per-block mins == the
            # global min the sorted claim loop below picks).
            red = (
                pa.table({"from": hit[src], "to": hit[dst]})
                .group_by("to")
                .aggregate([("from", "min")])
            )
            return pa.table({"from": red["from_min"], "to": red["to"]})

        hits = edge_small.map_batches(expand, batch_format="pyarrow").to_pandas()
        nxt: dict[str, str] = {}
        if hits.empty:
            # a round with NO frontier-touching edges: to_pandas() of
            # all-empty blocks returns a column-less frame — indexing
            # hits["from"] crashed every sparse graph that exhausted
            # before max_depth (lockstep-fuzz finding)
            break
        for f, t in sorted(zip(hits["from"], hits["to"])):
            if t not in visited:
                root = frontier[f]
                visited[t] = (root, depth)
                nxt[t] = root
        frontier = nxt

    rows = sorted((root, node, depth) for node, (root, depth) in visited.items())
    return pd.DataFrame(rows, columns=["root", "node", "depth"])
