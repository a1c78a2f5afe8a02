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
import re

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


def digest_embeddings(texts: list[str]) -> np.ndarray:
    """(n, 32) base form of :func:`hash_embeddings`: the raw sha256 digest
    bytes mapped to [-1, 1]. For dim % 32 == 0, ``hash_embeddings`` tiles
    this matrix dim/32 times verbatim — so cosine similarity over the
    tiled space equals cosine over this base space (the linker scores in
    base space: 24x fewer matmul flops at EMBED_DIM=768, same scores)."""
    if not texts:
        return np.empty((0, 32), dtype=np.float32)
    digests = np.frombuffer(
        b"".join(hashlib.sha256(t.encode("utf-8")).digest() for t in texts),
        dtype=np.uint8,
    ).reshape(len(texts), 32)
    return (digests.astype(np.float32) / 255.0) * 2.0 - 1.0


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

    def signatures_batch(self, hash_arrays: list[np.ndarray]) -> np.ndarray:
        """(n_docs, num_perm) signature matrix — see minhash_signatures."""
        return minhash_signatures(hash_arrays, self._a, self._b)

    def band_hashes(self, sigs: np.ndarray) -> np.ndarray:
        """(n_docs, num_bands) bucket keys — see band_hash_matrix."""
        return band_hash_matrix(sigs, self.num_bands)


_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """uint64 hashes of the DISTINCT char k-shingles — the vectorized
    MinHash input path. One polynomial rolling pass over the code-point
    array (k multiply-adds over the whole text, wrapping uint64
    arithmetic), then np.unique; no per-shingle Python/sha calls.
    Shingling domain matches :func:`char_shingles` (lowercased,
    whitespace-collapsed)."""
    t = _norm_ws(text)
    if not t:
        return np.empty(0, dtype=np.uint64)
    codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = len(codes)
    if n < k:
        h = _FNV_OFFSET
        for c in codes:
            h = (h ^ c) * _FNV_PRIME
        return np.array([h], dtype=np.uint64)
    h = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        h = h * _FNV_PRIME + codes[j : n - k + 1 + j]
    return np.unique(h)


def word_ngram_hashes(text: str, n: int = 3) -> np.ndarray:
    """uint64 hashes of distinct word n-grams (vectorized over the hashed
    word sequence — rolling combine of per-word hashes)."""
    words = _split_words(text)
    if not words:
        return np.empty(0, dtype=np.uint64)
    wh = np.fromiter((_token_hash(w) for w in words), dtype=np.uint64, count=len(words))
    if len(wh) < n:
        h = _FNV_OFFSET
        for x in wh:
            h = (h ^ x) * _FNV_PRIME
        return np.array([h], dtype=np.uint64)
    h = np.zeros(len(wh) - n + 1, dtype=np.uint64)
    for j in range(n):
        h = h * _FNV_PRIME + wh[j : len(wh) - n + 1 + j]
    return np.unique(h)


def minhash_signatures(
    hash_arrays: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Batched MinHash: (n_docs, num_perm) signature matrix from per-doc
    shingle-hash arrays. All docs' hashes concatenate into ONE array; each
    permutation chunk is one vectorized multiply-add and the per-doc mins
    come from np.minimum.reduceat at the doc boundaries (no per-doc
    Python). Empty docs get the all-MAX sentinel row."""
    num_perm = len(a)
    n = len(hash_arrays)
    out = np.full((n, num_perm), _MAX_U64, dtype=np.uint64)
    nonempty = [i for i, h in enumerate(hash_arrays) if len(h)]
    if not nonempty:
        return out
    hv = np.concatenate([hash_arrays[i] for i in nonempty])
    counts = np.array([len(hash_arrays[i]) for i in nonempty], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts[:-1])))
    # permutation family x -> a*x + b mod 2^64 with a ODD (a bijection):
    # wrapping multiply-add only — the % prime of the per-set path costs a
    # 64-bit division per element and dominated the whole LSH stage
    a_odd = a | np.uint64(1)
    res = np.empty((len(nonempty), num_perm), dtype=np.uint64)
    # chunk the permutation axis so the (chunk, total_hashes) intermediate
    # stays ~64 MB regardless of batch size
    chunk = max(1, int(8_000_000 // max(1, len(hv))))
    for lo in range(0, num_perm, chunk):
        hi = min(num_perm, lo + chunk)
        permuted = a_odd[lo:hi, None] * hv[None, :] + b[lo:hi, None]
        res[:, lo:hi] = np.minimum.reduceat(permuted, offsets, axis=1).T
    out[np.asarray(nonempty)] = res
    return out


def band_hash_matrix(sigs: np.ndarray, num_bands: int) -> np.ndarray:
    """(n_docs, num_bands) uint64 LSH bucket keys: FNV-1a fold of each
    band's signature rows — vectorized across all docs at once."""
    n, num_perm = sigs.shape
    r = num_perm // num_bands
    v = sigs.reshape(n, num_bands, r)
    h = np.full((n, num_bands), _FNV_OFFSET, dtype=np.uint64)
    for j in range(r):
        h = (h ^ v[:, :, j]) * _FNV_PRIME
    return h


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a | b)
    return inter / union if union else 0.0


def jaccard_u64(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard over two sorted-unique uint64 hash arrays (the vectorized
    twin of :func:`jaccard`; equal up to 2^-64 hash collisions)."""
    if not len(a) and not len(b):
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


# ASCII-whitespace + ASCII-lowercase normalization shared by every
# shingle/ngram domain: the DuckDB oracles replay it as
# trim(regexp_replace(translate(text, 'A..Z', 'a..z'), '\\s+', ' ',
# 'g'), ' ') under RE2 \\s = [ \t\n\r\f]. Every piece is EXPLICIT
# because the engines' built-ins all disagree at the edges: Python
# str.split() collapses Unicode whitespace (NBSP, U+2028...), Python
# re.ASCII \\s collapses \v where RE2 does not, and Python str.lower()
# diverges from DuckDB's utf8proc lower() on 44 codepoints (U+0130 'İ'
# -> 'i'+combining-dot vs 'i', plus 43 newer-Unicode letters DuckDB's
# table predates) — reachable on real Turkish text and silently
# changing shingle sets (round-5 review + lockstep-fuzz findings).
# One explicit class + one explicit 26-char table, both engines.
_ASCII_WS = re.compile(r"[ \t\n\r\f]+")
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def _norm_ws(text: str) -> str:
    return _ASCII_WS.sub(" ", text.translate(_ASCII_LOWER)).strip(" ")


def _split_words(text: str) -> list[str]:
    t = _norm_ws(text)
    return t.split(" ") if t else []


def char_shingles(text: str, k: int = 5) -> set[str]:
    """Character k-shingles for near-dup detection (lowercased,
    whitespace-collapsed)."""
    t = _norm_ws(text)
    if len(t) < k:
        return {t} if t else set()
    return {t[i : i + k] for i in range(len(t) - k + 1)}


def word_ngrams(text: str, n: int = 3) -> set[str]:
    words = _split_words(text)
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


# token -> 64-bit hash memo: vocabulary is bounded, so each distinct token
# pays its sha1 once per worker process instead of once per occurrence
_TOKEN_HASH_CACHE: dict[str, int] = {}
_TOKEN_HASH_CACHE_MAX = 1_000_000


def _token_hash(t: str) -> int:
    h = _TOKEN_HASH_CACHE.get(t)
    if h is None:
        h = stable_hash64(t)
        if len(_TOKEN_HASH_CACHE) >= _TOKEN_HASH_CACHE_MAX:
            _TOKEN_HASH_CACHE.clear()
        _TOKEN_HASH_CACHE[t] = h
    return h


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over a token multiset. One (n_tokens, 64) bit-unpack
    + column sum per document (no per-token numpy round-trips); token
    hashes are memoized across documents."""
    if not tokens:
        return 0
    hv = np.fromiter((_token_hash(t) for t in tokens), dtype=np.uint64, count=len(tokens))
    bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    set_bits = np.nonzero(acc > 0)[0].astype(np.uint64)
    return int((np.uint64(1) << set_bits).sum(dtype=np.uint64)) if len(set_bits) else 0


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# byte-value -> set-bit-count lookup (numpy 1.x has no bitwise_count)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized set-bit count over a uint64 array of any shape: view as
    bytes, table-lookup, sum per word. The kernel behind bucket-level
    SimHash Hamming matrices (hamming(a, b) = popcount64(a ^ b))."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    return _POP8[x.view(np.uint8)].reshape(*x.shape, 8).sum(axis=-1, dtype=np.int64)


# ---------------------------------------------------------------------------
# Rolling fingerprint (document fingerprinting / winnowing-lite)
# ---------------------------------------------------------------------------

_FP_BASE = 1_000_003
_FP_MOD = (1 << 61) - 1


def rolling_fingerprints(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Rabin-Karp rolling hashes of k-grams, winnowed: keep the min hash of
    every ``window`` consecutive k-gram hashes (deduped, order preserved)."""
    t = _norm_ws(text)
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
