"""As-of join — an operator Ray Data lacks (SURVEY custom-operator
track): for every LEFT row, attach the latest RIGHT row of the same key
with right.ts strictly before left.ts (backward as-of, strict).

Expression: union both sides into one stream with a side flag, ONE
shuffle on the coarse key bucket hash(key) % B (a key's rows land in one
bucket, both sides), then one pandas merge_asof per bucket over the
ts-sorted frames — never one Ray group per key, never a global sort.
DuckDB's native ASOF JOIN is the oracle for the registry query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.bucketing import add_key_bucket


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    left_cols: list[str],
    right_cols: dict[str, str],
    num_buckets: int | None = None,
    allow_exact: bool = False,
) -> ray.data.Dataset:
    """Backward as-of join.

    left_cols:  left columns carried to the output (beyond key/ts).
    right_cols: {right column -> output name} contributed by the matched
                right row (map the right ts_col to e.g. 'click_ts' to
                keep the matched timestamp). Nulls when no right row
                precedes the left row for that key.
    """
    if num_buckets is None:
        from ..functions.concurrency import auto_buckets

        num_buckets = auto_buckets()  # scales with cluster CPUs, floor 64
    out_names = list(right_cols.values())

    # each tagger nulls the OTHER side's columns with their true types
    # (a float64 placeholder would promote int columns through the union);
    # both schemas resolve once, driver-side, metadata only
    right_schema = right.schema()
    rtypes = dict(zip(right_schema.names, right_schema.types))
    left_schema = left.schema()
    ltypes = dict(zip(left_schema.names, left_schema.types))

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {key_col: b[key_col], ts_col: b[ts_col]}
        for c in left_cols:
            cols[c] = pa.nulls(b.num_rows, ltypes[c])
        for rc, name in right_cols.items():
            cols[name] = b[rc]
        t = pa.table(cols).append_column("_side", pa.array(np.ones(b.num_rows, np.int8)))
        return add_key_bucket(t, key_col, num_buckets)

    def tag_left_typed(b: pa.Table) -> pa.Table:
        cols = {key_col: b[key_col], ts_col: b[ts_col]}
        for c in left_cols:
            cols[c] = b[c]
        for rc, name in right_cols.items():
            cols[name] = pa.nulls(b.num_rows, rtypes[rc])
        t = pa.table(cols).append_column("_side", pa.array(np.zeros(b.num_rows, np.int8)))
        return add_key_bucket(t, key_col, num_buckets)

    lt = left.map_batches(tag_left_typed, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")
    both = lt.union(rt)

    # integer columns pick up nulls from the OTHER side's rows in the
    # union block, which pandas promotes to float64; cast back through
    # the NULLABLE Int64 dtype (plain int64 would (a) crash on a null in
    # the ORIGINAL data and (b) for right columns be re-promoted to
    # float64 only in buckets containing an unmatched left row — a
    # bucket-composition-dependent block schema that breaks the
    # cross-block concat; Int64 -> Arrow int64 uniformly)
    int_left = [c for c in left_cols if pa.types.is_integer(ltypes[c])]
    int_right = [n for rc, n in right_cols.items() if pa.types.is_integer(rtypes[rc])]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return asof_frame(
            df, key_col, ts_col, left_cols, out_names, int_left, int_right,
            allow_exact,
        )

    return both.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def asof_frame(
    df: pd.DataFrame,
    key_col: str,
    ts_col: str,
    left_cols: list[str],
    out_names: list[str],
    int_left: list[str],
    int_right: list[str],
    allow_exact: bool = False,
) -> pd.DataFrame:
    """Pure per-bucket as-of kernel over the tagged union frame
    (_side 0 = left, 1 = right; right contributions already renamed to
    ``out_names``). Module-level so the lockstep fuzz can drive the REAL
    kernel against DuckDB's native ASOF JOIN — an independent
    implementation, not a replay."""
    l = df[df["_side"] == 0][[key_col, ts_col] + left_cols].sort_values(
        ts_col, kind="mergesort"
    )
    for c in int_left:
        l[c] = l[c].astype("Int64")
    r = df[df["_side"] == 1][[key_col] + out_names].copy()
    for c in int_right:
        r[c] = r[c].astype("Int64")
    # the right frame's join axis is ITS ts (exported or not via
    # right_cols); reconstruct it for merge_asof ordering. Duplicate
    # (key, ts) right rows need a TOTAL order (every sort needs a
    # total tiebreak): sort by value columns too, keep the last — the
    # winner is then data-determined, never block-arrival-determined.
    r["_rts"] = df[df["_side"] == 1][ts_col].values
    r = r.sort_values(["_rts"] + out_names, kind="mergesort").drop_duplicates(
        subset=[key_col, "_rts"], keep="last"
    )
    out = pd.merge_asof(
        l.rename(columns={ts_col: "_lts"}).sort_values("_lts", kind="mergesort"),
        r,
        left_on="_lts",
        right_on="_rts",
        by=key_col,
        direction="backward",
        allow_exact_matches=allow_exact,
    )
    # merge_asof with an EMPTY left still emits correctly-typed right
    # columns (r carries the dtypes), so every bucket — including
    # left-free ones — produces the same block schema
    out = out.rename(columns={"_lts": ts_col}).drop(columns=["_rts"])
    return out
