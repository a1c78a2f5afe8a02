from coco_search_ray.sources.synth import generate_catalog
from coco_search_ray.stages.canonicalize import (
    canonical_mapping,
    propose_pairs_local,
    propose_pairs_ray,
    union_find,
)


def test_union_find_min_label():
    ids = ["E3", "E1", "E2", "E9"]
    mapping = union_find(ids, [("E3", "E1"), ("E2", "E3")])
    assert mapping["E1"] == "E1"
    assert mapping["E2"] == "E1"
    assert mapping["E3"] == "E1"
    assert mapping["E9"] == "E9"


def test_near_dup_siblings_merge():
    rows = generate_catalog(100).to_pylist()
    mapping = canonical_mapping(rows)
    # generator creates sibling near-dups at E000000/E000001, E000020/E000021, ...
    merged = [eid for eid, canon in mapping.items() if canon != eid]
    assert len(merged) >= 3
    assert mapping["E000001"] == "E000000"


def test_mapping_is_idempotent_projection():
    rows = generate_catalog(100).to_pylist()
    mapping = canonical_mapping(rows)
    for eid, canon in mapping.items():
        assert mapping[canon] == canon
        assert canon <= eid


def test_ray_pairs_match_local(ray_session):
    rows = generate_catalog(100).to_pylist()
    assert propose_pairs_ray(rows) == propose_pairs_local(rows)


def test_tokenless_entities_never_merge(ray_session):
    """Round-5 retrieval-core review: entities whose surface forms
    enrich to an EMPTY token set share the all-MAX MinHash sentinel and
    jaccard(empty, empty) == 1.0 — without the empty-set guard every
    such entity merged into one canonical id. Both paths guarded."""
    from coco_search_ray.stages.canonicalize import (
        canonical_mapping,
        propose_pairs_local,
        propose_pairs_ray,
    )

    rows = [
        {"entity_id": "E1", "canonical_name": "@#$%", "aliases": []},
        {"entity_id": "E2", "canonical_name": "!!!", "aliases": []},
        {"entity_id": "E3", "canonical_name": "Payment Service", "aliases": []},
    ]
    assert propose_pairs_local(rows) == []
    assert propose_pairs_ray(rows) == []
    m = canonical_mapping(rows)
    assert m == {"E1": "E1", "E2": "E2", "E3": "E3"}
