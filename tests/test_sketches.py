"""HyperLogLog + Bloom sketch operators: accuracy bounds, mergeability,
no-false-negative guarantee, and the exact-result semi-join."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def test_hll_accuracy_and_merge():
    from coco_search_ray.functions.sketches import (
        hashes_of_strings,
        hll_add_hashes,
        hll_estimate,
        hll_make_registers,
        hll_merge,
    )

    p = 12
    for true_n in (100, 5_000, 200_000):
        regs = hll_make_registers(p)
        vals = [f"user-{i}" for i in range(true_n)]
        # feed in chunks incl. duplicates — distinctness is the point
        for lo in range(0, true_n, 7_000):
            hll_add_hashes(regs, hashes_of_strings(vals[lo : lo + 7_000] + vals[:50]), p)
        est = hll_estimate(regs)
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)

    # mergeability: union of halves == whole (registers max-merge)
    a, b, whole = hll_make_registers(p), hll_make_registers(p), hll_make_registers(p)
    vals = [f"k{i}" for i in range(50_000)]
    hll_add_hashes(a, hashes_of_strings(vals[:30_000]), p)
    hll_add_hashes(b, hashes_of_strings(vals[20_000:]), p)  # overlap
    hll_add_hashes(whole, hashes_of_strings(vals), p)
    assert np.array_equal(hll_merge(a, b), whole)


def test_bloom_no_false_negatives():
    from coco_search_ray.functions.sketches import bloom_from_values, hashes_of_strings

    keys = [f"order-{i}" for i in range(10_000)]
    bf = bloom_from_values(keys)
    assert bf.contains_hashes(hashes_of_strings(keys)).all()  # NEVER a false negative
    probes = [f"other-{i}" for i in range(10_000)]
    fp = bf.contains_hashes(hashes_of_strings(probes)).mean()
    assert fp < 0.02  # ~1% at 10 bits/key, k=5


def test_hll_count_distinct_dataset(ray_session):
    import ray.data

    from coco_search_ray.stages.sketch import hll_count_distinct

    n, dups = 30_000, 3
    vals = [f"u{i % n}" for i in range(n * dups)]
    ds = ray.data.from_arrow(pa.table({"user": pa.array(vals)})).repartition(8)
    est = hll_count_distinct(ds, "user", p=12)
    assert abs(est - n) / n < 0.05


def test_bloom_semi_join_exact(ray_session):
    import ray.data

    from coco_search_ray.stages.sketch import bloom_semi_join

    rng = np.random.RandomState(3)
    ids = rng.randint(0, 5_000, 20_000)
    t = pa.table({"k": pa.array(ids, pa.int64()), "v": pa.array(rng.rand(len(ids)))})
    keys = sorted(set(rng.randint(0, 5_000, 300).tolist()))
    out = bloom_semi_join(ray.data.from_arrow(t).repartition(4), "k", keys).to_pandas()
    expect = t.to_pandas()
    expect = expect[expect["k"].isin(keys)]
    assert sorted(out["k"].tolist()) == sorted(expect["k"].tolist())  # EXACT
    assert len(out) == len(expect)


def test_split_assignment_deterministic_and_proportional(ray_session):
    from coco_search_ray.stages.split import assign_splits, split_bucket

    import ray.data

    ids = list(range(20_000))
    ds = ray.data.from_arrow(pa.table({"id": pa.array(ids, pa.int64())})).repartition(4)
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = assign_splits(ds, "id", fr).to_pandas()
    counts = out["split"].value_counts(normalize=True)
    for k, f in fr.items():
        assert abs(counts[k] - f) < 0.02
    # stable across runs and id-order
    again = assign_splits(ds.random_shuffle(seed=1), "id", fr).to_pandas()
    m1 = dict(zip(out["id"], out["split"]))
    m2 = dict(zip(again["id"], again["split"]))
    assert m1 == m2
    # bucket parity with the documented md5 rule
    import hashlib

    assert split_bucket(42) == int(hashlib.md5(b"42").hexdigest()[:12], 16)

    with pytest.raises(ValueError):
        assign_splits(ds, "id", {"a": 0.5, "b": 0.4})


def test_pack_bins_matches_sequential(ray_session):
    """Distributed prefix-sum packing == a plain sequential scan, across
    block boundaries (many blocks forced via repartition)."""
    import ray.data

    from coco_search_ray.stages.pack import pack_bins

    rng = np.random.RandomState(5)
    sizes = rng.randint(50, 900, 3_000)
    ids = np.arange(3_000, dtype=np.int64)
    t = pa.table({"id": pa.array(ids), "sz": pa.array(sizes, pa.int64())})
    out = (
        pack_bins(ray.data.from_arrow(t).random_shuffle(seed=2).repartition(7), "id", "sz", budget=4096)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    excl = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    expect = excl // 4096
    assert (out["bin"].to_numpy() == expect).all()
    # bins are contiguous runs over the id order
    assert (np.diff(out["bin"].to_numpy()) >= 0).all()


def test_cms_never_underestimates_and_merges():
    from coco_search_ray.functions.sketches import (
        cms_add_hashes,
        cms_make,
        cms_merge,
        cms_query_hashes,
        hashes_of_strings,
    )

    rng = np.random.default_rng(7)
    # zipf-ish stream: few heavy keys, long tail
    keys = [f"k{i}" for i in range(5_000)]
    freq = np.maximum(1, (10_000 / (np.arange(5_000) + 1)).astype(np.int64))
    cms = cms_make(d=4, w=4096)
    h = hashes_of_strings(keys)
    cms_add_hashes(cms, h, freq)
    est = cms_query_hashes(cms, h)
    assert (est >= freq).all()  # the one-sided guarantee
    # heavy keys are estimated near-exactly (eps*N slack)
    n_total = int(freq.sum())
    assert (est[:50] - freq[:50]).max() <= int(np.e / 4096 * n_total) + 1

    # merge over a disjoint split == one pass over the whole stream
    a, b = cms_make(), cms_make()
    cms_add_hashes(a, h[:2_500], freq[:2_500])
    cms_add_hashes(b, h[2_500:], freq[2_500:])
    assert np.array_equal(cms_merge(a, b), cms)
    # empty adds / queries are no-ops
    cms_add_hashes(a, hashes_of_strings([]))
    assert cms_query_hashes(a, hashes_of_strings([])).shape == (0,)


def test_cms_heavy_hitters_exact(ray_session):
    import ray.data

    from coco_search_ray.stages.sketch import cms_heavy_hitters

    # 20 heavy users (>=200 events each) over a 10k-user tail of singletons
    vals = [f"hot{i}" for i in range(20) for _ in range(200 + i)]
    vals += [f"cold{i}" for i in range(10_000)]
    n = len(vals)
    ds = ray.data.from_arrow(pa.table({"user": pa.array(vals)})).random_shuffle(seed=3).repartition(8)
    phi = 150 / n  # threshold 150: all hot survive, no cold does
    out = cms_heavy_hitters(ds, "user", phi=phi).to_pandas()
    got = dict(zip(out["user"], out["n_events"]))
    assert got == {f"hot{i}": 200 + i for i in range(20)}  # EXACT counts


@given(
    st.lists(
        st.one_of(
            st.text(max_size=20),
            st.integers(min_value=-(2**62), max_value=2**62),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=150, deadline=None)
def test_md5_buckets_lockstep_with_scalar_spec(ids):
    """The vectorized DuckDB bucket kernel == the documented scalar md5
    rule for every id (unicode strings and int64s): the engine's
    ::VARCHAR stringification must agree with Python str() on the id
    types the pipeline accepts."""
    from coco_search_ray.stages.split import md5_buckets, split_bucket

    if all(isinstance(v, int) for v in ids):
        arr = pa.array(ids, pa.int64())
    else:
        arr = pa.array([str(v) for v in ids], pa.string())
    got = md5_buckets(arr)
    want = np.array([float(split_bucket(v)) for v in arr.to_pylist()])
    assert np.array_equal(got, want), (ids, got, want)


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False).map(
            lambda v: round(v, 2)
        ),
        min_size=1,
        max_size=40,
    ),
    st.sampled_from([0.1, 0.5, 0.9, 0.99]),
)
@settings(max_examples=400, deadline=None)
def test_discrete_quantile_lockstep_with_duckdb(xs, q):
    """np.quantile(method='inverted_cdf') == DuckDB quantile_disc — the
    q_order_price_quantiles contract. Discrete quantiles select an
    ACTUAL data value, so equality is exact (no lerp): the interpolating
    pair (np linear / quantile_cont) was measured to disagree in the
    last ulp in ~20% of trials while the gate medians sit EXACTLY on
    .xx5 rounding boundaries (2-dp prices) — that contract was a latent
    hash flip and was replaced by this one."""
    import duckdb

    a = float(np.quantile(np.array(xs, dtype=np.float64), q, method="inverted_cdf"))
    b = duckdb.execute(
        "SELECT quantile_disc(x, ?) FROM (SELECT unnest(?) AS x)", [q, xs]
    ).fetchone()[0]
    assert a == b, (xs, q, a, b)
