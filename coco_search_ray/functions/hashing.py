"""Deterministic hashing kernels: hash-embeddings, MinHash, SimHash,
rolling fingerprints, content hashes.

The "encoder" used in tests and the parity path is the deterministic
SHA-256-derived 768-d embedding scheme the reference uses for its test
mocks (reference: tests/mocks/ollama.py:11-38) — same text always maps to
the same vector with values in [-1, 1], so dense retrieval is reproducible
bit-for-bit across the Ray pipeline and the oracle. A real encoder would
drop in behind the same EncoderActor interface (stages/encode.py).

Everything here is vectorized where it matters: embeddings are produced as
one (n, dim) float32 ndarray per batch, MinHash signatures as one (n, P)
uint64 ndarray.
"""

from __future__ import annotations

import hashlib

import numpy as np

EMBED_DIM = 768

_MERSENNE = (1 << 61) - 1
_MAX_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def hash_embedding(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic pseudo-embedding: SHA-256 digest bytes tiled to
    ``dim`` and scaled to [-1, 1] (float32)."""
    digest = np.frombuffer(hashlib.sha256(text.encode("utf-8")).digest(), dtype=np.uint8)
    reps = -(-dim // len(digest))
    tiled = np.tile(digest, reps)[:dim]
    return (tiled.astype(np.float32) / 255.0) * 2.0 - 1.0


def hash_embeddings(texts: list[str], dim: int = EMBED_DIM) -> np.ndarray:
    """Batch form of :func:`hash_embedding` → (n, dim) float32."""
    if not texts:
        return np.empty((0, dim), dtype=np.float32)
    digests = np.frombuffer(
        b"".join(hashlib.sha256(t.encode("utf-8")).digest() for t in texts),
        dtype=np.uint8,
    ).reshape(len(texts), 32)
    reps = -(-dim // 32)
    tiled = np.tile(digests, (1, reps))[:, :dim]
    return (tiled.astype(np.float32) / 255.0) * 2.0 - 1.0


def stable_hash64(s: str) -> int:
    """Deterministic 64-bit hash of a string (first 8 bytes of SHA-1).
    Python's builtin ``hash`` is salted per process — never use it for
    cross-worker partitioning keys."""
    return int.from_bytes(hashlib.sha1(s.encode("utf-8")).digest()[:8], "big")


def stable_hash64_np(strings) -> np.ndarray:
    """Vector-ish form of :func:`stable_hash64` → uint64 ndarray."""
    return np.array([stable_hash64(s) for s in strings], dtype=np.uint64)


def content_sha256(text: str) -> str:
    """Hex content hash (incremental-recompute checkpoint key; reference
    shape: indexer/flow.py:348-351)."""
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


# ---------------------------------------------------------------------------
# MinHash
# ---------------------------------------------------------------------------


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """MinHash over token/shingle sets. Construct once per actor (the
    permutation tables are state), call per set.

    signature(tokens) -> (num_perm,) uint64
    band_keys(sig)    -> list of (band_id, band_hash) for LSH blocking
    """

    def __init__(self, num_perm: int = 64, num_bands: int = 16, seed: int = 7):
        assert num_perm % num_bands == 0
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.rows_per_band = num_perm // num_bands
        self._a, self._b = _minhash_params(num_perm, seed)

    def signature(self, tokens: set[str] | list[str]) -> np.ndarray:
        if not tokens:
            return np.full(self.num_perm, _MAX_U64, dtype=np.uint64)
        hv = np.array([stable_hash64(t) for t in set(tokens)], dtype=np.uint64)
        # (num_perm, n) permuted values; min over the set per permutation
        permuted = (self._a[:, None] * hv[None, :] + self._b[:, None]) % np.uint64(_MERSENNE)
        return permuted.min(axis=1)

    def band_keys(self, sig: np.ndarray) -> list[tuple[int, int]]:
        out = []
        r = self.rows_per_band
        for band in range(self.num_bands):
            chunk = sig[band * r : (band + 1) * r]
            h = hashlib.sha1(chunk.tobytes()).digest()[:8]
            out.append((band, int.from_bytes(h, "big")))
        return out


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a | b)
    return inter / union if union else 0.0


def char_shingles(text: str, k: int = 5) -> set[str]:
    """Character k-shingles for near-dup detection (lowercased,
    whitespace-collapsed)."""
    t = " ".join(text.lower().split())
    if len(t) < k:
        return {t} if t else set()
    return {t[i : i + k] for i in range(len(t) - k + 1)}


def word_ngrams(text: str, n: int = 3) -> set[str]:
    words = text.lower().split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over a token multiset."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = stable_hash64(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# Rolling fingerprint (document fingerprinting / winnowing-lite)
# ---------------------------------------------------------------------------

_FP_BASE = 1_000_003
_FP_MOD = (1 << 61) - 1


def rolling_fingerprints(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Rabin-Karp rolling hashes of k-grams, winnowed: keep the min hash of
    every ``window`` consecutive k-gram hashes (deduped, order preserved)."""
    t = " ".join(text.lower().split())
    n = len(t)
    if n < k:
        return [stable_hash64(t)] if t else []
    pow_k = pow(_FP_BASE, k - 1, _FP_MOD)
    h = 0
    hashes = []
    for i, ch in enumerate(t):
        h = (h * _FP_BASE + ord(ch)) % _FP_MOD
        if i >= k - 1:
            hashes.append(h)
            h = (h - ord(t[i - k + 1]) * pow_k) % _FP_MOD
    out: list[int] = []
    seen: set[int] = set()
    for i in range(len(hashes) - window + 1) if len(hashes) >= window else [0]:
        w = hashes[i : i + window] if len(hashes) >= window else hashes
        m = min(w)
        if m not in seen:
            seen.add(m)
            out.append(m)
    return out
