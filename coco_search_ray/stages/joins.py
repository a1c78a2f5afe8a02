"""Join strategies.

- broadcast_join: the small dimension side ships ONCE via ``ray.put``
  and every task/actor merges per batch — no shuffle. This is the
  reference's resolver-dict shape (module index built once, probed per
  edge; deps/resolver.py:109-160) and the right plan whenever one side
  fits comfortably in a worker heap (catalogs, dimension tables).
- hash_join: both sides large -> Ray Data's hash-partitioned
  ``Dataset.join`` (all-to-all shuffle on the key). Use only when the
  small-side rule fails; pick num_partitions ~ cluster CPUs.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.concurrency import auto_pool


def broadcast_join(
    ds: ray.data.Dataset,
    small: pa.Table,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> ray.data.Dataset:
    """Map-side join of ``ds`` against a broadcast pyarrow Table."""
    small_ref = ray.put(small)

    class _Merge:
        def __init__(self):
            sm = ray.get(small_ref).to_pandas()
            # SQL join semantics: NULL keys never match. pandas merge
            # matches None AND NaN left keys against a None index row
            # (measured), so a null key on the broadcast side would
            # fabricate matches for every null-keyed batch row. Dropping
            # nulls here restores SQL for every `how`: inner then drops
            # null-keyed batch rows (no index hit), left keeps them with
            # null right columns.
            sm = sm[sm[right_key].notna()]
            self.small = sm.set_index(right_key, drop=(right_key != left_key))

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.merge(
                self.small, how=how, left_on=left_key, right_index=True, sort=False
            )
            return out

    return ds.map_batches(_Merge, batch_format="pandas", concurrency=auto_pool())


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    num_partitions: int | None = None,
    join_type: str = "inner",
) -> ray.data.Dataset:
    if num_partitions is None:
        # ~cluster CPUs / 2: enough join tasks to keep cores busy without
        # drowning a small exchange in per-partition fixed costs
        num_partitions = max(8, auto_pool()[1])
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on or on,),
    )
