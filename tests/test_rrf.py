"""RRF fusion math — mirrors the reference's own fusion test coverage
(double-match ranking, match_type, keyword tiebreak, k-sensitivity,
empty inputs; reference tests/unit/test_hybrid_search.py:18-191)."""

from coco_search_ray.functions.rrf import (
    apply_canonical_boost,
    prefetch_limit,
    rrf_fuse,
)


def test_double_match_ranks_highest():
    vec = [("a", 0.9), ("b", 0.8)]
    kw = [("b", 0.5), ("c", 0.4)]
    fused = rrf_fuse(vec, kw)
    assert fused[0].key == "b"
    assert fused[0].match_type == "both"
    assert abs(fused[0].fused_score - (1 / 62 + 1 / 61)) < 1e-12  # vec rank 2, kw rank 1


def test_match_types():
    fused = rrf_fuse([("a", 0.9)], [("c", 0.4)])
    types = {c.key: c.match_type for c in fused}
    assert types == {"a": "semantic", "c": "keyword"}


def test_keyword_tiebreak():
    # same ranks on both sides -> same score; keyword-bearing wins the tie
    fused = rrf_fuse([("v", 0.9)], [("k", 0.5)])
    assert fused[0].key == "k"
    assert fused[0].fused_score == fused[1].fused_score


def test_rank_positions_are_one_based():
    fused = rrf_fuse([("a", 0.9), ("b", 0.8)], [])
    assert abs(fused[0].fused_score - 1 / 61) < 1e-12
    assert abs(fused[1].fused_score - 1 / 62) < 1e-12


def test_k_sensitivity():
    hi = rrf_fuse([("a", 1.0)], [], k=10)[0].fused_score
    lo = rrf_fuse([("a", 1.0)], [], k=1000)[0].fused_score
    assert hi > lo


def test_empty_inputs():
    assert rrf_fuse([], []) == []


def test_canonical_boost_resorts():
    vec = [("alias", 0.95), ("canon", 0.90)]
    fused = rrf_fuse(vec, [])
    assert fused[0].key == "alias"
    boosted = apply_canonical_boost(fused, {"canon": True, "alias": False})
    assert boosted[0].key == "canon"
    assert abs(boosted[0].fused_score - 2.0 * (1 / 62)) < 1e-12


def test_prefetch_cap():
    assert prefetch_limit(5) == 10
    assert prefetch_limit(80) == 100


def test_deterministic_tiebreak_on_key():
    # identical score and keyword status -> key ascending
    fused = rrf_fuse([], [("z", 0.5), ("y", 0.5)])
    assert [c.key for c in fused] == ["z", "y"]  # rank order, not key order
    f2 = rrf_fuse([("b", 0.9)], [("a", 0.9)])
    assert f2[0].key == "a"  # tie -> keyword wins; here both distinct
