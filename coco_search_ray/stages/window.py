"""Event-time windowing over an ordered, partitioned log (events table).

Ray Data has no event-time window primitive; the portable expression is:
- tumbling windows: derive a bucket column vectorized in Arrow
  (ts -> floor(epoch/size)) and groupby the bucket — SQL-oracle-friendly;
- session windows: groupby(key).map_groups with a gap rule over the
  ts-sorted group (ordering assumption: sessionization is per-key, groups
  are sorted inside the group function, so unordered block arrival is
  fine).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum


def add_tumbling_bucket(
    batch: pa.Table, ts_col: str = "ts", size_s: int = 3600, out_col: str = "hour_bucket"
) -> pa.Table:
    us = pc.cast(batch[ts_col], pa.int64())  # timestamp[us] -> microseconds
    bucket = pc.divide(us, pa.scalar(size_s * 1_000_000, pa.int64()))  # int floor-div
    return batch.append_column(out_col, pc.cast(bucket, pa.int64()))


def tumbling_agg(
    ds: ray.data.Dataset,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    size_s: int = 3600,
) -> ray.data.Dataset:
    """COUNT + SUM(value) per (bucket, key)."""
    with_bucket = ds.map_batches(
        lambda b: add_tumbling_bucket(b, ts_col, size_s), batch_format="pyarrow"
    )
    return with_bucket.groupby(["hour_bucket", key_col]).aggregate(
        Count(alias_name="n_events"), Sum(value_col, alias_name="sum_value")
    )


def session_frame(
    df: pd.DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> pd.DataFrame:
    """Pure per-bucket session kernel (module-level so the lockstep fuzz
    can drive the REAL kernel against a DuckDB window-function replay).
    Fully vectorized over the (key, ts)-sorted frame: a session break is
    a key change OR a strictly-over-gap step (matching the oracle's
    ``ts - lag(ts) > INTERVAL gap SECOND``), sessions are one cumsum,
    stats one pandas groupby."""
    df = df.sort_values([key_col, ts_col], kind="mergesort")
    new_key = df[key_col].ne(df[key_col].shift())
    gap = df[ts_col].diff().dt.total_seconds()
    sid = (new_key | (gap > gap_s)).cumsum()
    out = (
        df.assign(_sid=sid)
        .groupby("_sid", sort=True)
        .agg(
            # the key column keeps ITS name (hardcoding 'user_id'
            # mislabeled sessions for any other key_col)
            **{key_col: (key_col, "first")},
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
        )
        .reset_index(drop=True)
    )
    out["n_events"] = out["n_events"].astype("int64")
    return out


def sessionize(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Session windows per key: a new session starts when the gap to the
    previous event exceeds ``gap_s``. Output: one row per session with
    (user_id, session_start, session_end, n_events).

    Shuffle shape: ONE Ray group per coarse bucket (hash(key) %
    num_buckets) — never one group per key (millions of tiny groups at
    real user cardinality; the per-group overhead dominates — CLAUDE.md
    perf lesson). Inside a bucket the gap rule is fully vectorized over
    the (key, ts)-sorted frame: a session break is a key change OR an
    over-gap step, sessions are one cumsum, stats one pandas groupby."""
    from ..functions.bucketing import add_key_bucket
    from ..functions.concurrency import auto_buckets

    if num_buckets is None:
        num_buckets = auto_buckets()  # scales with cluster CPUs, floor 64

    def add_bucket(b: pa.Table) -> pa.Table:
        return add_key_bucket(b, key_col, num_buckets)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return session_frame(df, key_col=key_col, ts_col=ts_col, gap_s=gap_s)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
