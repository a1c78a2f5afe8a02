"""Mergeable sketches for wide aggregations — the 'novel sketch' custom
operators a 100 TB pipeline reaches for when exact state won't fit:

- HyperLogLog: approximate COUNT DISTINCT with O(2^p) fixed state per
  block; registers MERGE by elementwise max, so the distributed shape is
  map_batches (per-block registers) -> tiny reduce, no shuffle of keys.
- Bloom filter: approximate membership with false positives but NO false
  negatives; broadcast as a compact bit array for semi-join prefilters
  (the exact verification on the survivors keeps results exact).

Both are deterministic: hashing via sha1-based stable_hash64 — never
Python's salted hash().
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_make_registers(p: int = 12) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add_hashes(registers: np.ndarray, hashes: np.ndarray, p: int) -> None:
    """Fold a uint64 hash array into the registers, vectorized: bucket =
    top p bits, rank = leading-zero count of the remaining 64-p bits + 1
    (computed via bit-length), register = max."""
    if not len(hashes):
        return
    h = hashes.astype(np.uint64)
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining bits, left-aligned in 64
    # rank = leading zeros of `rest` + 1; all-zero rest -> max rank 64-p+1
    rank = np.full(len(h), np.uint8(64 - p + 1))
    nz = rest > 0
    if nz.any():
        # exact vectorized bit_length via 6-step binary search (no float
        # round-trips): leading zeros = 64 - bit_length
        x = rest[nz].copy()
        bl = np.zeros(len(x), dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            m = x >= (np.uint64(1) << np.uint64(shift))
            bl[m] += shift
            x = np.where(m, x >> np.uint64(shift), x)
        bl += 1  # bit_length of x > 0
        rank[nz] = (64 - bl + 1).astype(np.uint8)
    np.maximum.at(registers, bucket, rank)


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(registers: np.ndarray) -> float:
    """Standard HLL estimate with small/large-range corrections."""
    m = float(len(registers))
    inv = np.power(2.0, -registers.astype(np.float64))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / inv.sum()
    zeros = float((registers == 0).sum())
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)  # linear counting
    return float(e)


def hashes_of_strings(values: list) -> np.ndarray:
    """str-coercing wrapper over the shared hashing.stable_hash64_np."""
    from .hashing import stable_hash64_np

    return stable_hash64_np([str(v) for v in values])


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def cms_make(d: int = 4, w: int = 4096) -> np.ndarray:
    """(d x w) counter matrix; d independent rows via double hashing."""
    return np.zeros((d, w), dtype=np.int64)


def _cms_positions(hashes: np.ndarray, d: int, w: int) -> np.ndarray:
    """(d, n) column indices — row i uses h1 + i*h2 (same double-hashing
    scheme as the bloom filter; h2 forced odd for full period)."""
    h1 = hashes.astype(np.uint64)
    h2 = (h1 >> np.uint64(32)) | np.uint64(1)
    i = np.arange(d, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(w)).astype(np.int64)


def cms_add_hashes(cms: np.ndarray, hashes: np.ndarray, counts: np.ndarray | None = None) -> None:
    """Fold (hash, count) pairs into the sketch, vectorized per row."""
    if not len(hashes):
        return
    d, w = cms.shape
    pos = _cms_positions(hashes, d, w)
    c = np.ones(len(hashes), dtype=np.int64) if counts is None else counts.astype(np.int64)
    for i in range(d):
        np.add.at(cms[i], pos[i], c)


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Sketches over disjoint streams sum elementwise."""
    return a + b


def cms_query_hashes(cms: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point estimates: min over the d rows — NEVER below the true count
    (all collisions only add), at most true + eps*N with eps ~ e/w."""
    if not len(hashes):
        return np.zeros(0, dtype=np.int64)
    d, w = cms.shape
    pos = _cms_positions(hashes, d, w)
    est = cms[0][pos[0]]
    for i in range(1, d):
        est = np.minimum(est, cms[i][pos[i]])
    return est


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


class BloomFilter:
    """Fixed-size bit-array bloom filter; k derived index positions per
    key from ONE uint64 hash via the standard double-hashing scheme
    (h1 + i*h2). No false negatives; fp rate ~ (1 - e^{-kn/m})^k."""

    def __init__(self, n_bits: int, k: int = 5):
        self.n_bits = int(n_bits)
        self.k = k
        self.bits = np.zeros((self.n_bits + 63) // 64, dtype=np.uint64)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h1 = hashes.astype(np.uint64)
        h2 = (h1 >> np.uint64(32)) | np.uint64(1)  # odd -> full-period stride
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.n_bits)).astype(np.int64)

    def add_hashes(self, hashes: np.ndarray) -> None:
        pos = self._positions(hashes).ravel()
        np.bitwise_or.at(self.bits, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64))

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        pos = self._positions(hashes)
        word = self.bits[pos // 64]
        bit = (word >> (pos % 64).astype(np.uint64)) & np.uint64(1)
        return bit.all(axis=0).astype(bool)


def bloom_from_values(values: list, bits_per_key: int = 10, k: int = 5) -> BloomFilter:
    bf = BloomFilter(max(64, bits_per_key * max(1, len(values))), k)
    bf.add_hashes(hashes_of_strings(values))
    return bf
