"""Property-based tests (hypothesis) for the pure kernels — invariants
that must hold on ARBITRARY input, beyond the example-based goldens."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from coco_search_ray.functions.hashing import MinHasher, hash_embedding, jaccard
from coco_search_ray.functions.rrf import rrf_fuse
from coco_search_ray.functions.tokenize import split_code_identifier
from coco_search_ray.stages.canonicalize import union_find
from coco_search_ray.stages.chunking import split_text

_ident = st.text(alphabet=string.ascii_letters + string.digits + "_-", min_size=1, max_size=30)
_text = st.text(
    alphabet=string.ascii_letters + string.digits + " _.\n", min_size=0, max_size=600
)


@given(_ident)
@settings(max_examples=200, deadline=None)
def test_split_identifier_invariants(ident):
    toks = split_code_identifier(ident)
    assert toks[0] == ident  # original always first
    assert all(isinstance(t, str) for t in toks)
    assert toks == split_code_identifier(ident)  # deterministic


@given(_text, st.integers(min_value=20, max_value=200), st.integers(min_value=0, max_value=50))
@settings(max_examples=150, deadline=None)
def test_chunking_invariants(text, size, overlap):
    chunks = split_text(text, chunk_size=size, chunk_overlap=min(overlap, size - 1))
    if not text:
        assert chunks == []
        return
    # offsets reconstruct text exactly
    for c in chunks:
        assert text[c.start : c.end] == c.text
    # full coverage, ordered starts
    assert chunks[0].start == 0
    assert chunks[-1].end == len(text)
    assert all(a.start < b.start for a, b in zip(chunks, chunks[1:]))
    # forward progress + no gaps between consecutive chunks
    for a, b in zip(chunks, chunks[1:]):
        assert b.start <= a.end  # contiguous or overlapping


@given(
    st.lists(st.tuples(st.text(min_size=1, max_size=8), st.floats(0, 1)), max_size=20),
    st.lists(st.tuples(st.text(min_size=1, max_size=8), st.floats(0, 1)), max_size=20),
)
@settings(max_examples=150, deadline=None)
def test_rrf_invariants(vec, kw):
    def dedup_keys(lst):
        seen, out = set(), []
        for k, s in lst:
            if k not in seen:
                seen.add(k)
                out.append((k, s))
        return out

    vec, kw = dedup_keys(vec), dedup_keys(kw)
    fused = rrf_fuse(vec, kw)
    keys = [c.key for c in fused]
    assert len(keys) == len(set(keys))  # unique keys
    assert set(keys) == {k for k, _ in vec} | {k for k, _ in kw}
    scores = [c.fused_score for c in fused]
    assert scores == sorted(scores, reverse=True)  # sorted desc
    assert all(s > 0 for s in scores)
    both = [c for c in fused if c.match_type == "both"]
    for c in both:
        assert c.vector_score is not None and c.keyword_score is not None


@given(
    st.lists(st.sampled_from([f"E{i}" for i in range(12)]), min_size=1, max_size=12, unique=True),
    st.lists(
        st.tuples(
            st.sampled_from([f"E{i}" for i in range(12)]),
            st.sampled_from([f"E{i}" for i in range(12)]),
        ),
        max_size=20,
    ),
)
@settings(max_examples=150, deadline=None)
def test_union_find_invariants(ids, pairs):
    universe = set(ids) | {x for p in pairs for x in p}
    mapping = union_find(sorted(universe), sorted(set(pairs)))
    for node, canon in mapping.items():
        assert mapping[canon] == canon  # idempotent projection
        assert canon <= node  # canonical = min of component
    for a, b in pairs:
        assert mapping[a] == mapping[b]  # connected -> same canonical


@given(st.text(max_size=100))
@settings(max_examples=100, deadline=None)
def test_hash_embedding_invariants(text):
    v = hash_embedding(text)
    assert v.shape == (768,)
    assert float(v.min()) >= -1.0 and float(v.max()) <= 1.0


@given(st.sets(st.text(min_size=1, max_size=6), max_size=40))
@settings(max_examples=100, deadline=None)
def test_minhash_identity(tokens):
    mh = MinHasher(num_perm=32, num_bands=8)
    assert (mh.signature(tokens) == mh.signature(set(tokens))).all()
    assert jaccard(tokens, tokens) == 1.0
