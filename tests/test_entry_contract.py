"""Driver-contract sanity: queries()/oracle_sql() wiring + entry()."""

import sys


def _entrymod():
    sys.path.insert(0, "/root/repo")
    import __ray_entry__

    return __ray_entry__


def test_oracle_keys_subset_of_queries():
    m = _entrymod()
    q = m.queries()
    o = m.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 25
    assert len(o) >= 13


def test_entry_returns_triples(ray_session):
    m = _entrymod()
    res = m.entry()
    names = set(res.schema().names)
    assert {"subj", "pred", "obj", "conv_id", "turn_idx"} == names
    assert res.count() > 0
