import numpy as np

from coco_search_ray.functions.hashing import (
    MinHasher,
    char_shingles,
    hamming64,
    hash_embedding,
    hash_embeddings,
    jaccard,
    rolling_fingerprints,
    simhash64,
    stable_hash64,
    word_ngrams,
)


def test_hash_embedding_deterministic_range():
    a = hash_embedding("hello")
    b = hash_embedding("hello")
    c = hash_embedding("world")
    assert a.shape == (768,) and a.dtype == np.float32
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.min() >= -1.0 and a.max() <= 1.0


def test_batch_embeddings_match_scalar():
    batch = hash_embeddings(["x", "yy", "zzz"])
    for i, t in enumerate(["x", "yy", "zzz"]):
        assert np.array_equal(batch[i], hash_embedding(t))


def test_stable_hash_deterministic():
    v = stable_hash64("abc")
    assert isinstance(v, int) and 0 <= v < (1 << 64)
    assert v == stable_hash64("abc")
    assert v != stable_hash64("abd")


def test_minhash_similarity_monotone():
    mh = MinHasher(num_perm=128, num_bands=32)
    base = set("abcdefghij")
    near = set("abcdefghiX")
    far = set("qrstuvwxyz")
    sim_near = (mh.signature(base) == mh.signature(near)).mean()
    sim_far = (mh.signature(base) == mh.signature(far)).mean()
    assert sim_near > sim_far


def test_minhash_band_keys_shape():
    mh = MinHasher(num_perm=64, num_bands=16)
    keys = mh.band_keys(mh.signature({"a", "b"}))
    assert len(keys) == 16
    assert [b for b, _ in keys] == list(range(16))


def test_jaccard_and_shingles():
    assert jaccard(set("ab"), set("ab")) == 1.0
    assert jaccard(set(), set()) == 1.0
    assert jaccard(set("a"), set("b")) == 0.0
    assert "hello" in char_shingles("Hello world", k=5)
    assert "a b c" in word_ngrams("a b c d", n=3)


def test_simhash_close_for_similar_sets():
    a = simhash64(["alpha", "beta", "gamma", "delta", "epsilon"])
    b = simhash64(["alpha", "beta", "gamma", "delta", "zeta"])
    c = simhash64(["one", "two", "three", "four", "five"])
    assert hamming64(a, b) < hamming64(a, c)


def test_rolling_fingerprints_deterministic_and_shift_tolerant():
    f1 = rolling_fingerprints("the quick brown fox jumps over the lazy dog")
    f2 = rolling_fingerprints("PREFIX the quick brown fox jumps over the lazy dog")
    assert f1 == rolling_fingerprints("the quick brown fox jumps over the lazy dog")
    assert len(set(f1) & set(f2)) > 0
