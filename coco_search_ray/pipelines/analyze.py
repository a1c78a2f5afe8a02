"""Index-health / coverage analysis over a built knowledge graph — the
batch analog of the reference's index-analysis reporting layer
(search/analyze.py: coverage analysis, per-language breakdowns, index
diagnostics; multi_analyze aggregates across indexes). A user runs this
after a build to understand index health: which predicates dominate,
what each extractor family yields, how much of the mention stream
actually links, and what fraction of turns contribute entities.

One tall (section, key, n, share) table so the whole report is a single
value-checkable query (kg_analyze) against a DuckDB re-derivation over
the exported stream/linkmap/triples.

Every metric is computed distributively:
  - per-pred counts: one tiny groupby over the triple stream;
  - family yield: per-block kind_code value_counts, summed by a small
    groupby (never a driver-side set);
  - link health: the broadcast linkmap classifies rows inside
    map_batches, per-block partial sums fold through ds.aggregate;
  - turn coverage: per-block unique (conv, turn) pairs of linked rows,
    distinct-counted by a pair groupby (pairs, not text, move).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ..functions.numeric import round_df_half_away


def _family_name_map() -> dict[int, str]:
    """kind_code -> family name from the captured plan (entity families
    share code 0; literal i -> i+1, qualified i -> -2-i)."""
    from ..stages.extract import family_plan

    _ents, lit_specs, qual_specs = family_plan()
    names = {0: "entity"}
    names.update({i + 1: n for i, (n, _p) in enumerate(lit_specs)})
    names.update({-2 - i: n for i, (n, _p) in enumerate(qual_specs)})
    return names


def kg_index_health(
    data_dir: str,
    triples: ray.data.Dataset,
    extractor_dirs: list[str] | None = None,
) -> pd.DataFrame:
    """(section, key, n, share) health report over a built triple table.

    Sections:
      pred    — triples per predicate; share of all triples
      family  — mention rows per extractor family; share of all rows
      link    — linked vs unlinked LINKABLE rows (entity surfaces +
                qualified roots); share of linkable rows
      turns   — turns with >= 1 linked entity vs without; share of turns

    ``extractor_dirs``: forward the SAME user extractor directories the
    build used — the report re-extracts the mention stream, and a worker
    that never loaded the directory would silently drop the external
    family's rows from the family/link sections (round-5 review).

    Scale limit (explicit, loud): the link section broadcasts the
    unique-surface linkmap, the same plan build_kg uses below its
    _DISTINCT_BROADCAST_MAX escalation. Above that many distinct
    linkable surfaces this report raises instead of silently
    materializing a multi-GB driver dict — run it against the persisted
    mention streams / distributed linkmap instead (run_resumable keeps
    the streams; pipelines/kg.py:1184 is the escalated plan)."""
    from ..sources.synth import load_catalog, transcript_files
    from ..stages.canonicalize import canonical_mapping
    from .kg import (
        _DISTINCT_BROADCAST_MAX,
        extract_mentions_ds,
        unique_mention_linkmap,
    )

    rows: list[tuple[str, str, int]] = []

    # --- pred section: one small groupby over the triple stream
    pred_df = (
        triples.groupby("pred").aggregate(Count(alias_name="n")).to_pandas()
    )
    for p, n in zip(pred_df["pred"], pred_df["n"]):
        rows.append(("pred", p, int(n)))

    # --- family section: per-block value_counts -> small Sum groupby
    # ONE extraction pass: the stream feeds three consumers below
    # (family counts, linkmap uniques, link classification) — without
    # the pin each would re-run extraction. At extreme scale run the
    # report over the PERSISTED mention-stream files instead
    # (run_resumable keeps them; same schema).
    stream = extract_mentions_ds(
        transcript_files(data_dir), extractor_dirs=extractor_dirs
    ).materialize()

    def _fam_counts(b: pa.Table) -> pa.Table:
        vc = b["kind_code"].value_counts()
        return pa.table(
            {
                "kind_code": pc.cast(vc.field("values"), pa.int32()),
                "_n": vc.field("counts"),
            }
        )

    fam_df = (
        stream.map_batches(_fam_counts, batch_format="pyarrow")
        .groupby("kind_code")
        .aggregate(Sum("_n", alias_name="n"))
        .to_pandas()
    )
    fam_names = _family_name_map()
    for k, n in zip(fam_df["kind_code"], fam_df["n"]):
        rows.append(("family", fam_names.get(int(k), f"kind_{int(k)}"), int(n)))

    # --- link section: broadcast linkmap classifies rows in map_batches.
    # Explicit scale guard (round-5 review): count distinct linkable
    # surfaces with kg's fan-in reduce FIRST — the broadcast plan's
    # driver dict is only safe below _DISTINCT_BROADCAST_MAX, and a
    # silent multi-GB driver union at exactly the index sizes a health
    # report matters for would be worse than a loud documented limit
    from .kg import _block_unique

    uniq_ds = stream.map_batches(_block_unique, batch_format="pyarrow").materialize()
    uniq_count = uniq_ds.count()
    if uniq_count > _DISTINCT_BROADCAST_MAX:
        reduced = (
            uniq_ds.repartition(max(1, uniq_ds.num_blocks() // 16))
            .map_batches(_block_unique, batch_format="pyarrow")
            .materialize()
        )
        uniq_ds, uniq_count = reduced, reduced.count()
    if uniq_count > _DISTINCT_BROADCAST_MAX:
        raise RuntimeError(
            f"kg_index_health: ~{uniq_count} distinct linkable surfaces "
            "exceed the broadcast-linkmap limit "
            f"({_DISTINCT_BROADCAST_MAX}); run the report over the "
            "persisted mention streams with the distributed linkmap "
            "(pipelines/kg.py escalated branch) instead"
        )
    catalog = load_catalog(data_dir)
    mapping = canonical_mapping(catalog.to_pylist())
    linkmap = unique_mention_linkmap(
        stream, catalog, mapping, uniq_blocks=uniq_ds.to_pandas()
    )
    keys = pa.array(sorted(linkmap), pa.string())
    vals = pa.array([linkmap[k] for k in keys.to_pylist()], pa.string())
    state_ref = ray.put((keys, vals))

    def _classify(b: pa.Table) -> pa.Table:
        """Per-block partial: one row per DISTINCT linked (conv, turn)
        pair, with the block's (linked, unlinked) row counts on the
        first row and zeros after — Sum folds the counts, a pair
        groupby distinct-counts the coverage, one pass each."""
        from ..functions.broadcast import deref_cached

        k, v = deref_cached(state_ref)
        kind = b["kind_code"].to_numpy(zero_copy_only=False)
        linkable = b.filter(pa.array((kind == 0) | (kind <= -2)))
        m = linkable["mention"].combine_chunks()
        is_qual = pa.array(
            linkable["kind_code"].to_numpy(zero_copy_only=False) <= -2
        )
        roots = pc.list_element(pc.split_pattern(m, pattern=".", max_splits=1), 0)
        probe = pc.if_else(is_qual, roots, m)
        linked_mask = pc.is_valid(pc.take(v, pc.index_in(probe, value_set=k)))
        n_linked = pc.sum(linked_mask).as_py() or 0
        n_total = linkable.num_rows
        pairs = (
            linkable.filter(linked_mask)
            .select(["conv_id", "turn_idx"])
            .group_by(["conv_id", "turn_idx"])
            .aggregate([])
        )
        npad = max(pairs.num_rows, 1)
        conv = pairs["conv_id"] if pairs.num_rows else pa.array([None], pa.string())
        turn = (
            pc.cast(pairs["turn_idx"], pa.int32())
            if pairs.num_rows
            else pa.array([None], pa.int32())
        )
        return pa.table(
            {
                "linked": pa.array([n_linked] + [0] * (npad - 1), pa.int64()),
                "unlinked": pa.array(
                    [n_total - n_linked] + [0] * (npad - 1), pa.int64()
                ),
                "conv_id": conv,
                "turn_idx": turn,
            }
        )

    # one classify pass; the tiny result (distinct linked pairs, narrow)
    # is pinned so the Sum fold and the coverage groupby don't re-run
    # extraction — at extreme scale run this over the PERSISTED mention
    # stream files (run_resumable keeps them) instead of the cold read
    classified = stream.map_batches(
        _classify, batch_format="pyarrow", batch_size=None
    ).materialize()
    agg = classified.aggregate(
        Sum("linked", alias_name="linked"), Sum("unlinked", alias_name="unlinked")
    )
    n_linked = int(agg["linked"] or 0)
    n_unlinked = int(agg["unlinked"] or 0)
    rows.append(("link", "linked", n_linked))
    rows.append(("link", "unlinked", n_unlinked))

    # --- turns section: distinct linked (conv, turn) pairs vs all turns
    n_cov = (
        classified.map_batches(
            lambda b: b.filter(pc.is_valid(b["conv_id"])), batch_format="pyarrow"
        )
        .groupby(["conv_id", "turn_idx"])
        .aggregate(Count(alias_name="_n"))
        .count()
    )
    n_turns = ray.data.read_parquet(transcript_files(data_dir)).count()
    rows.append(("turns", "with_entities", int(n_cov)))
    rows.append(("turns", "without_entities", int(n_turns - n_cov)))

    df = pd.DataFrame(rows, columns=["section", "key", "n"])
    totals = df.groupby("section")["n"].transform("sum").astype("float64")
    df["share"] = np.where(totals > 0, df["n"] / totals, 0.0)
    df = round_df_half_away(df, ["share"], 6)
    df["n"] = df["n"].astype("int64")
    return df.sort_values(["section", "key"], kind="mergesort").reset_index(drop=True)
