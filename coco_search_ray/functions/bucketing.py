"""The coarse deterministic shuffle key used by every grouped stage
(sessionize, as-of join, general KG assembly): hash(key) % num_buckets,
int keys via abs-mod, string keys via stable_hash64 computed once per
DISTINCT value per batch (keys repeat heavily within a block). One
implementation — a bucketing change (negative keys, nulls, new key
types) must never need to be made in three places.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import stable_hash64


def add_key_bucket(
    batch: pa.Table, key_col: str, num_buckets: int, out_col: str = "_bucket"
) -> pa.Table:
    col = batch[key_col]
    if pa.types.is_dictionary(col.type):
        col = pc.cast(col, col.type.value_type)
    if pa.types.is_integer(col.type):
        ids = col.to_numpy(zero_copy_only=False)
        bucket = pa.array((np.abs(ids) % num_buckets).astype(np.int32))
    else:
        uniq = pc.unique(col)
        per_uniq = pa.array(
            [stable_hash64(str(u)) % num_buckets for u in uniq.to_pylist()], pa.int32()
        )
        bucket = pc.take(per_uniq, pc.index_in(col, value_set=uniq))
    return batch.append_column(out_col, bucket)
