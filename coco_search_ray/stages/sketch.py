"""Sketch-based wide aggregations as Ray stages.

- hll_count_distinct: approximate COUNT DISTINCT without shuffling keys:
  every block folds its values into 2^p one-byte registers (map_batches),
  the driver max-merges the tiny register arrays — fixed O(2^p) state
  end to end vs the exact path's full key shuffle. The scale answer for
  "how many distinct users/tokens/urls" over 10^12 rows.
- bloom_semi_join: membership prefilter + EXACT verification. The bloom
  bit array broadcasts in O(bits) instead of O(keys x bytes); false
  positives pass the cheap bit test and are eliminated by the exact
  isin on the (much smaller) surviving stream, so the RESULT is exact —
  only the pruning is approximate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.broadcast import deref_cached
from ..functions.sketches import (
    BloomFilter,
    bloom_from_values,
    hashes_of_strings,
    hll_add_hashes,
    hll_estimate,
    hll_make_registers,
    hll_merge,
)


def hll_count_distinct(ds: ray.data.Dataset, col: str, p: int = 12) -> float:
    """Approximate distinct count of ``col`` (relative error ~1.04/sqrt(2^p),
    ~1.6% at p=12)."""

    def block_registers(b: pa.Table) -> pa.Table:
        regs = hll_make_registers(p)
        vals = b[col].drop_null().to_pylist()
        hll_add_hashes(regs, hashes_of_strings(vals), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(block_registers, batch_format="pyarrow").take_all()
    merged = hll_make_registers(p)
    for row in parts:
        merged = hll_merge(merged, np.frombuffer(row["regs"], dtype=np.uint8))
    return hll_estimate(merged)


def bloom_semi_join(
    ds: ray.data.Dataset,
    key_col: str,
    keys: list,
    bits_per_key: int = 10,
) -> ray.data.Dataset:
    """Rows of ``ds`` whose key is in ``keys`` — bloom prefilter (compact
    broadcast) then exact isin verification on the survivors. Exact
    result; the bloom only bounds how many rows reach the exact check."""
    bf = bloom_from_values(keys, bits_per_key=bits_per_key)
    bf_ref = ray.put((bf.bits, bf.n_bits, bf.k))
    exact_ref = ray.put(pa.array(sorted({str(k) for k in keys}), pa.string()))

    def semi(b: pa.Table) -> pa.Table:
        bits, n_bits, k = deref_cached(bf_ref)
        f = BloomFilter.__new__(BloomFilter)
        f.bits, f.n_bits, f.k = bits, n_bits, k
        vals = [str(v) for v in b[key_col].to_pylist()]
        mask = f.contains_hashes(hashes_of_strings(vals))
        cand = b.filter(pa.array(mask))
        if cand.num_rows == 0:
            return cand
        # exact confirmation: false positives die here
        key_str = pc.cast(cand[key_col], pa.string())
        exact = pc.is_in(key_str, value_set=deref_cached(exact_ref))
        return cand.filter(exact)

    return ds.map_batches(semi, batch_format="pyarrow")
