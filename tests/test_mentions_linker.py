from coco_search_ray.functions.linker_core import EntityIndex
from coco_search_ray.functions.mentions import detect_mentions
from coco_search_ray.sources.synth import generate_catalog


def test_detect_identifier_shapes():
    text = "then the Payment Service called get_user_by_id and paymentService quickly"
    m = detect_mentions(text)
    assert m == ["Payment Service", "get_user_by_id", "paymentService"]


def test_detect_order_and_dedup():
    m = detect_mentions("foo_bar again foo_bar then BazQux short caP")
    assert m[0] == "foo_bar"
    assert m.count("foo_bar") == 1


def test_detect_nothing_in_plain_text():
    assert detect_mentions("the cat sat on the mat") == []


def _index():
    return EntityIndex(generate_catalog(60).to_pylist())


def test_link_canonical_exact():
    cat = generate_catalog(60)
    idx = EntityIndex(cat.to_pylist())
    name = cat.column("canonical_name")[0].as_py()
    res = idx.link(name)
    assert res is not None
    assert res.entity_id == cat.column("entity_id")[0].as_py()
    assert res.match_type in ("both", "semantic", "keyword")


def test_link_alias_variants():
    cat = generate_catalog(60)
    idx = EntityIndex(cat.to_pylist())
    aliases = cat.column("aliases")[0].as_py()
    eid = cat.column("entity_id")[0].as_py()
    for alias in aliases:
        res = idx.link(alias)
        assert res is not None, alias
        assert res.entity_id == eid


def test_link_cross_form():
    """A snake_case mention should link to the entity even when queried via
    a form that is not stored verbatim, through split-token overlap."""
    cat = generate_catalog(60)
    idx = EntityIndex(cat.to_pylist())
    # canonical "Account Payment" -> query the snake form even if only some
    # alias forms are stored; token overlap carries it
    res = idx.link("account_payment")
    assert res is not None
    assert res.entity_id in ("E000000", "E000001")


def test_link_junk_returns_none():
    idx = _index()
    assert idx.link("zzqqwweerrtt") is None


def test_link_deterministic():
    cat = generate_catalog(60)
    a = EntityIndex(cat.to_pylist())
    b = EntityIndex(cat.to_pylist())
    for q in ["Account Payment", "account_payment", "accountPayment", "nonsense_token"]:
        ra, rb = a.link(q), b.link(q)
        assert (ra is None) == (rb is None)
        if ra:
            assert (ra.entity_id, ra.fused_score) == (rb.entity_id, rb.fused_score)


def test_ivf_mode_large_catalog():
    """Catalogs above IVF_THRESHOLD docs switch the dense channel to
    cluster probing; exact-surface queries still link correctly (identical
    embedding -> same nearest centroid -> probed)."""
    from coco_search_ray.functions import linker_core
    from coco_search_ray.sources.synth import generate_catalog

    old = linker_core.IVF_THRESHOLD
    linker_core.IVF_THRESHOLD = 100  # force IVF on a small catalog
    try:
        cat = generate_catalog(200)
        idx = linker_core.EntityIndex(cat.to_pylist())
        assert idx.ivf_centroids is not None
        names = cat.column("canonical_name").to_pylist()
        ids = cat.column("entity_id").to_pylist()
        for i in (0, 50, 150):
            r = idx.link(names[i])
            assert r is not None
            # duplicate canonical names resolve to the lexicographically
            # first matching entity; accept any entity bearing the name
            assert names[ids.index(r.entity_id)] == names[i]
    finally:
        linker_core.IVF_THRESHOLD = old


def _ref_decision(idx, mention):
    """Independent per-mention linking decision derived from the
    search() path (channel_lists + rrf_fuse + boost run per mention) —
    the comparator for link_many's batched fuse/accept kernel."""
    from coco_search_ray.functions.linker_core import DEFAULT_LIMIT, DENSE_EXACT_THRESHOLD

    for c in idx.search(mention, limit=DEFAULT_LIMIT, hybrid=True):
        if c["match_type"] in ("keyword", "both") or (
            c["vector_score"] is not None and c["vector_score"] >= DENSE_EXACT_THRESHOLD
        ):
            return (c["entity_id"], c["surface"], c["score"], c["match_type"])
    return None


def _mention_corpus(cat):
    mentions = cat.column("canonical_name").to_pylist()[:40]
    for aliases in cat.column("aliases").to_pylist()[:25]:
        mentions += aliases
    mentions += [
        "account_payment", "accountPayment", "nonsense_token", "zzqqwweerrtt",
        "get_user_by_id", "", "a", "Payment Service", "payment service",
    ]
    return mentions


def test_link_many_matches_per_mention_search():
    """Batched link_many (vectorized fuse + boost + accept) must make
    BYTE-identical decisions (entity, surface, fused score, match_type)
    to the per-mention search() path, exact mode."""
    cat = generate_catalog(120)
    idx = EntityIndex(cat.to_pylist())
    mentions = _mention_corpus(cat)
    fast = idx.link_many(mentions)
    for m, f in zip(mentions, fast):
        ref = _ref_decision(idx, m)
        got = (f.entity_id, f.surface, f.fused_score, f.match_type) if f else None
        assert got == ref, m


def test_link_many_matches_per_mention_search_ivf():
    """Same parity under IVF probing (large-catalog dense channel)."""
    from coco_search_ray.functions import linker_core

    old = linker_core.IVF_THRESHOLD
    linker_core.IVF_THRESHOLD = 100
    try:
        cat = generate_catalog(200)
        idx = linker_core.EntityIndex(cat.to_pylist())
        assert idx.ivf_centroids is not None
        mentions = _mention_corpus(cat)
        fast = idx.link_many(mentions)
        for m, f in zip(mentions, fast):
            ref = _ref_decision(idx, m)
            got = (f.entity_id, f.surface, f.fused_score, f.match_type) if f else None
            assert got == ref, m
    finally:
        linker_core.IVF_THRESHOLD = old


def test_pipe_entity_id_fails_fast():
    """A '|' in entity_id would silently truncate the '<eid>|<surface>'
    candidate key split (round-5 review) — fail fast like dotted ids."""
    import pytest as _pytest

    from coco_search_ray.functions.linker_core import EntityIndex

    with _pytest.raises(ValueError, match="'[.]' or '[|]'"):
        EntityIndex([{"entity_id": "svc|pay", "canonical_name": "X", "aliases": []}])
