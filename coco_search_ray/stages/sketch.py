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
from ray.data.aggregate import Sum

from ..functions.broadcast import deref_cached
from ..functions.sketches import (
    BloomFilter,
    bloom_from_values,
    cms_add_hashes,
    cms_make,
    cms_merge,
    cms_query_hashes,
    hashes_of_strings,
    hll_add_hashes,
    hll_estimate,
    hll_make_registers,
    hll_merge,
)


# fan-in width for sketch merges: the driver pulls at most this many
# pre-folded sketch rows regardless of input block count
_FANIN_BLOCKS = 16


def hll_count_distinct(ds: ray.data.Dataset, col: str, p: int = 12) -> float:
    """Approximate distinct count of ``col`` (relative error ~1.04/sqrt(2^p),
    ~1.6% at p=12)."""

    def block_registers(b: pa.Table) -> pa.Table:
        regs = hll_make_registers(p)
        vals = b[col].drop_null().to_pylist()
        hll_add_hashes(regs, hashes_of_strings(vals), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def fold_registers(b: pa.Table) -> pa.Table:
        regs = hll_make_registers(p)
        for buf in b["regs"].to_pylist():
            regs = hll_merge(regs, np.frombuffer(buf, dtype=np.uint8))
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    # fan-in reduce (repartition-coalesce + per-block fold, the kg.py
    # branch-decision trick): the driver pull is <= _FANIN_BLOCKS rows no
    # matter how many input blocks there are — a take_all of per-block
    # registers is O(blocks) driver state (~4 GB at 10^6 blocks at p=12).
    # Max-merge is associative+commutative, so the estimate is identical.
    parts = (
        ds.map_batches(block_registers, batch_format="pyarrow")
        .repartition(_FANIN_BLOCKS)
        .map_batches(fold_registers, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    merged = hll_make_registers(p)
    for row in parts:
        merged = hll_merge(merged, np.frombuffer(row["regs"], dtype=np.uint8))
    return hll_estimate(merged)


def cms_heavy_hitters(
    ds: ray.data.Dataset,
    col: str,
    phi: float,
    d: int = 4,
    w: int = 4096,
) -> ray.data.Dataset:
    """EXACT counts of every key with frequency >= ceil(phi * N),
    sketch-guided: the Count-Min prunes the long tail BEFORE the exact
    shuffle, so the groupby only ever moves partials of potential heavy
    hitters — the 100 TB answer to "top users/tokens/urls" where exact
    per-key state for the tail would dominate the exchange.

    Phase A folds each block's local value counts into a (d x w) CMS
    (O(d*w) fixed state per block, driver sum-merge — no key shuffle)
    and counts rows. Phase B re-reads the stream, drops keys whose CMS
    estimate is below T = ceil(phi*N) — sound, the CMS never
    underestimates, so no true heavy hitter is lost — and emits
    per-block (key, count) partials for the survivors only; a small
    exact groupby + HAVING finishes. Result is EXACT (collision
    survivors die at the final threshold), which is why the registry
    query is value-checked against plain SQL, unlike the HLL estimate.

    Choose w >= e/phi so the tail admitted by collisions stays a
    vanishing fraction (default 4096 covers phi >= ~0.0007).
    """

    def block_sketch(b: pa.Table) -> pa.Table:
        vc = b[col].drop_null().value_counts()
        vals = vc.field("values").to_pylist()
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        cms = cms_make(d, w)
        cms_add_hashes(cms, hashes_of_strings(vals), counts)
        return pa.table(
            {
                "cms": pa.array([cms.tobytes()], pa.binary()),
                "n_rows": pa.array([b.num_rows], pa.int64()),
            }
        )

    def fold_sketches(b: pa.Table) -> pa.Table:
        cms = cms_make(d, w)
        n = 0
        for buf, nr in zip(b["cms"].to_pylist(), b["n_rows"].to_pylist()):
            cms = cms_merge(cms, np.frombuffer(buf, dtype=np.int64).reshape(d, w))
            n += nr
        return pa.table(
            {
                "cms": pa.array([cms.tobytes()], pa.binary()),
                "n_rows": pa.array([n], pa.int64()),
            }
        )

    # same fan-in reduce as hll_count_distinct — a (d x w) int64 CMS is
    # ~128 KB per block, so an O(blocks) take_all is even worse here
    parts = (
        ds.map_batches(block_sketch, batch_format="pyarrow")
        .repartition(_FANIN_BLOCKS)
        .map_batches(fold_sketches, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    merged = cms_make(d, w)
    n_total = 0
    for row in parts:
        merged = cms_merge(merged, np.frombuffer(row["cms"], dtype=np.int64).reshape(d, w))
        n_total += row["n_rows"]
    threshold = int(np.ceil(phi * n_total))
    cms_ref = ray.put(merged)

    def survivors(b: pa.Table) -> pa.Table:
        cms = deref_cached(cms_ref)
        vc = b[col].drop_null().value_counts()
        vals = vc.field("values")
        counts = vc.field("counts")
        est = cms_query_hashes(cms, hashes_of_strings(vals.to_pylist()))
        keep = pa.array(est >= threshold)
        return pa.table({col: vals.filter(keep), "_partial": counts.filter(keep)})

    partials = ds.map_batches(survivors, batch_format="pyarrow")
    exact = partials.groupby(col).aggregate(Sum("_partial", alias_name="n_events"))
    return exact.filter(expr=f"n_events >= {threshold}")


def bloom_semi_join(
    ds: ray.data.Dataset,
    key_col: str,
    keys: list,
    bits_per_key: int = 10,
) -> ray.data.Dataset:
    """Rows of ``ds`` whose key is in ``keys`` — bloom prefilter (compact
    broadcast) then exact isin verification on the survivors. Exact
    result; the bloom only bounds how many rows reach the exact check."""
    # ALL FOUR sides — bloom build, bloom probe, exact set, exact probe —
    # must share ONE stringification (Arrow cast), not Python str():
    # str(True)='True' vs Arrow 'true', str(np.float32(0.1))='0.1' vs the
    # widened Python float, and timestamp formats differ. The exact check
    # was aligned in an earlier round-5 review; the bloom sides hashed
    # Python str() until this one — a mismatch there is a false NEGATIVE
    # that drops a genuinely-present key BEFORE the exact check can save
    # it, silently breaking the exact-result contract.
    keys_str = pc.cast(pa.array(keys), pa.string())
    bf = bloom_from_values(keys_str.to_pylist(), bits_per_key=bits_per_key)
    bf_ref = ray.put((bf.bits, bf.n_bits, bf.k))
    exact_ref = ray.put(pc.unique(keys_str))

    def semi(b: pa.Table) -> pa.Table:
        bits, n_bits, k = deref_cached(bf_ref)
        f = BloomFilter.__new__(BloomFilter)
        f.bits, f.n_bits, f.k = bits, n_bits, k
        vals = pc.cast(b[key_col], pa.string()).to_pylist()
        mask = f.contains_hashes(hashes_of_strings(vals))
        cand = b.filter(pa.array(mask))
        if cand.num_rows == 0:
            return cand
        # exact confirmation: false positives die here
        key_str = pc.cast(cand[key_col], pa.string())
        exact = pc.is_in(key_str, value_set=deref_cached(exact_ref))
        return cand.filter(exact)

    return ds.map_batches(semi, batch_format="pyarrow")
