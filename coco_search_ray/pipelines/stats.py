"""M5 — grouped metrics over triples and per-turn QA statuses.

Reference analogs: get_dep_stats_detailed (COUNT(*), GROUP BY dep_type,
top-10 files by edge count; deps/query.py:158-176,424-473) and the
parse-status tracking pass (per-unit QA status + grouped summary;
indexer/parse_tracking.py:114-242).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Count

from ..functions.mentions import detect_mentions


def triples_by_pred(triples: ray.data.Dataset) -> ray.data.Dataset:
    """COUNT grouped by predicate (shape: GROUP BY dep_type)."""
    return triples.groupby("pred").aggregate(Count(alias_name="n_triples"))


def top_entities(triples: ray.data.Dataset, k: int = 10) -> ray.data.Dataset:
    """Top-k subjects by emitted-triple count (shape: top-10 source files).
    Pre-aggregation happens inside the groupby; result is tiny. The sort
    carries a total tiebreak (subj asc) so a count tie at the k-th
    boundary never makes the selection nondeterministic (kg_impact /
    kg_tree pick their BFS roots from this)."""
    return (
        triples.groupby("subj")
        .aggregate(Count(alias_name="n_triples"))
        .sort(["n_triples", "subj"], descending=[True, False])
        .limit(k)
    )


def top_objects(triples: ray.data.Dataset, k: int = 10) -> ray.data.Dataset:
    """Object-side top-k (the reference reports top-10 source AND target
    files, deps/query.py:424-473 — top_entities is the source side, this
    is the target side). Same total tiebreak discipline."""
    return (
        triples.groupby("obj")
        .aggregate(Count(alias_name="n_triples"))
        .sort(["n_triples", "obj"], descending=[True, False])
        .limit(k)
    )


def pred_detailed(triples: ray.data.Dataset) -> "pd.DataFrame":
    """Per-predicate detailed stats: total triples + distinct subject /
    object counts (get_dep_stats_detailed shape). Distinct counts use the
    shuffle-friendly two-level groupby (distinct pairs first, then
    count) — never a driver-side set."""
    import pandas as pd

    n = triples.groupby("pred").aggregate(Count(alias_name="n_triples")).to_pandas()
    ds_subj = (
        triples.groupby(["pred", "subj"]).aggregate(Count(alias_name="_n"))
        .groupby("pred").aggregate(Count(alias_name="n_subjects")).to_pandas()
    )
    ds_obj = (
        triples.groupby(["pred", "obj"]).aggregate(Count(alias_name="_n"))
        .groupby("pred").aggregate(Count(alias_name="n_objects")).to_pandas()
    )
    out = n.merge(ds_subj, on="pred").merge(ds_obj, on="pred")
    return out.astype({"n_triples": "int64", "n_subjects": "int64", "n_objects": "int64"})


def turn_qa_status(batch: pa.Table) -> pa.Table:
    """Per-turn QA status over normalized turns: ok_mentions / no_mentions
    / empty_text (shape: parse_status ok/partial/error/no_grammar).
    Vectorized via the whole-batch mention kernel (pytest-pinned
    identical to per-turn detect_mentions) — the per-row Python loop
    this replaces was the one hot-path row loop in the stats pipeline
    (round-5 review)."""
    import numpy as np

    from ..functions.mentions import detect_mentions_batch

    texts = batch["text"].to_pylist()
    counts, _flat = detect_mentions_batch(texts)
    counts = np.asarray(counts, dtype=np.int32)
    empty = np.array([not t for t in texts])
    status = np.where(
        empty, "empty_text", np.where(counts > 0, "ok_mentions", "no_mentions")
    )
    counts = np.where(empty, 0, counts)
    return pa.table(
        {
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "qa_status": pa.array(status.tolist(), pa.string()),
            "n_mentions": pa.array(counts, pa.int32()),
        }
    )


def qa_summary(turns: ray.data.Dataset) -> ray.data.Dataset:
    """Grouped QA counts over a normalized-turns Dataset."""
    return (
        turns.map_batches(turn_qa_status, batch_format="pyarrow")
        .groupby("qa_status")
        .aggregate(Count(alias_name="n_turns"))
    )


def parse_qa_detail(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Parse-status DETAIL per document/turn — the closed-form analog of
    the reference's error-position tree walk (parse_tracking.py:97-111:
    it records the line number of the first tree-sitter error node; we
    record the char position + line of the offending DELIMITER under a
    deterministic balance rule, checked in this order):

      empty_text            text is empty/null
      unbalanced_quote      odd number of '\"'  -> pos of the LAST quote
      unbalanced_backtick   odd number of backticks -> pos of the last
      unbalanced_paren      '(' count != ')' count -> pos of the last
                            '(' (too many opens) or the FIRST ')' (too
                            many closes)
      ok                    error_pos = -1, error_line = 0

    error_line = 1 + number of newlines before error_pos. Vectorized:
    Arrow counts classify every row; Python touches only flagged rows
    (rare in healthy corpora)."""
    import pyarrow.compute as pc

    col = batch[text_col]
    texts = None  # materialized lazily, only if some row is flagged
    n = batch.num_rows
    nq = pc.fill_null(pc.count_substring(col, '"'), 0).to_numpy().astype("int64")
    nb = pc.fill_null(pc.count_substring(col, "`"), 0).to_numpy().astype("int64")
    no = pc.fill_null(pc.count_substring(col, "("), 0).to_numpy().astype("int64")
    nc = pc.fill_null(pc.count_substring(col, ")"), 0).to_numpy().astype("int64")
    empty = pc.fill_null(pc.equal(pc.utf8_length(pc.fill_null(col, "")), 0), True)
    empty = empty.to_numpy(zero_copy_only=False)

    import numpy as np

    status = np.full(n, "ok", dtype=object)
    q_bad = (~empty) & (nq % 2 == 1)
    b_bad = (~empty) & ~q_bad & (nb % 2 == 1)
    p_bad = (~empty) & ~q_bad & ~b_bad & (no != nc)
    status[empty] = "empty_text"
    status[q_bad] = "unbalanced_quote"
    status[b_bad] = "unbalanced_backtick"
    status[p_bad] = "unbalanced_paren"

    error_pos = np.full(n, -1, dtype=np.int64)
    error_line = np.zeros(n, dtype=np.int64)
    flagged = np.nonzero(q_bad | b_bad | p_bad)[0]
    if len(flagged):
        texts = col.to_pylist()
        for i in flagged:
            t = texts[i]
            if q_bad[i]:
                pos = t.rfind('"')
            elif b_bad[i]:
                pos = t.rfind("`")
            elif no[i] > nc[i]:
                pos = t.rfind("(")
            else:
                pos = t.find(")")
            error_pos[i] = pos
            error_line[i] = t.count("\n", 0, pos) + 1

    cols = {name: batch[name] for name in batch.schema.names if name != text_col}
    cols["parse_status"] = pa.array(status, pa.string())
    cols["error_pos"] = pa.array(error_pos)
    cols["error_line"] = pa.array(error_line)
    return pa.table(cols)


def grouped_count_salted(
    ds: ray.data.Dataset, key: str, salt_buckets: int = 16, alias: str = "n"
) -> ray.data.Dataset:
    """Two-level skew-safe grouped count: pre-aggregate on (key, salt)
    where salt = hash(row) % S, then sum partials per key. A hot key's
    rows land in S different first-level groups instead of one — the
    explicit salting pattern for skewed keys (SURVEY.md §7.4; here the
    canonical head entities and the two dominant tools are the hot keys).
    Identical result to a plain groupby(key).count() (pytest-checked)."""
    import numpy as np
    from ray.data.aggregate import Sum

    def add_salt(b: pa.Table) -> pa.Table:
        n = b.num_rows
        salt = np.arange(n, dtype=np.int64) % salt_buckets
        return b.append_column("_salt", pa.array(salt))

    partial = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key, "_salt"])
        .aggregate(Count(alias_name="_partial"))
    )
    return partial.groupby(key).aggregate(Sum("_partial", alias_name=alias))
