"""Lockstep fuzz (hypothesis, duckdb in-process) for the event-window
and repetition kernels — the REAL module-level kernels vs exact DuckDB
replays of their gate-oracle SQL. The fixed gate data (synth events /
documents) never exercises pre-epoch timestamps, exact-gap boundaries,
or pathological word repetition; these fuzzers do.

Kernels covered (gate pairs in pipelines/queries.py):
- stages/window.add_tumbling_bucket <-> Q_EVENTS_TUMBLING_SQL's
  `epoch_us(ts) // N` (Arrow pc.divide truncates toward zero; DuckDB
  integer // must match on NEGATIVE pre-epoch buckets)
- stages/window.session_frame       <-> Q_EVENTS_SESSIONS_SQL's
  lag/interval gap rule (strict >, exact-1800s gaps, duplicate ts)
- pipelines/queries._repetition_metrics <-> Q_DOC_REPETITION_SQL's
  per-doc dup-word / top-bigram replay (the factorize+reduceat kernel
  vs the unnest+group SQL, including the flag-threshold comparisons)
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from coco_search_ray.pipelines.queries import (
    Q_DOC_REPETITION_SQL,
    _repetition_metrics,
)
from coco_search_ray.stages.window import add_tumbling_bucket, session_frame

# ONE in-process connection for all examples: connect() per example is
# the dominant cost at fuzz volume (register/unregister is cheap)
_CON = duckdb.connect()

# ------------------------------------------------------------- tumbling

_HOUR_US = 3_600_000_000
# boundary-heavy microsecond timestamps: exact bucket edges +/- 1 us,
# plus arbitrary offsets, on BOTH sides of the epoch (pre-epoch is where
# floor-vs-truncate integer division diverges)
_TS_US = st.one_of(
    st.builds(
        lambda k, d: k * _HOUR_US + d,
        st.integers(min_value=-4, max_value=4),
        st.sampled_from([-1, 0, 1]),
    ),
    st.integers(min_value=-4 * _HOUR_US, max_value=4 * _HOUR_US),
)


@given(st.lists(_TS_US, min_size=1, max_size=30))
@settings(max_examples=150, deadline=None)
def test_tumbling_bucket_lockstep_with_duckdb(ts_list):
    """hour_bucket from the REAL Arrow kernel == DuckDB's
    `epoch_us(ts) // 3600000000` row by row, pre-epoch included."""
    tbl = pa.table({"ts": pa.array(ts_list, pa.timestamp("us"))})
    got = add_tumbling_bucket(tbl)["hour_bucket"].to_pylist()
    _CON.register("tt", tbl)
    want = [
        r[0]
        for r in _CON.execute(
            "SELECT (epoch_us(ts) // 3600000000) FROM tt"
        ).fetchall()
    ]
    _CON.unregister("tt")
    assert got == want, (ts_list, got, want)


# ------------------------------------------------------------- sessions

_GAP_US = 1_800_000_000  # 30 min in us — the oracle's INTERVAL 1800 SECOND
# per-event timestamps drawn so consecutive sorted events land exactly
# AT the gap (no break: strict >), 1 us over (break), and duplicated
_SESS_TS = st.one_of(
    st.builds(
        lambda k, d: k * _GAP_US + d,
        st.integers(min_value=0, max_value=3),
        st.sampled_from([-1, 0, 1]),
    ),
    st.integers(min_value=0, max_value=3 * _GAP_US),
)
_EVENTS = st.lists(
    st.tuples(st.sampled_from(["u1", "u2"]), _SESS_TS), min_size=1, max_size=25
)

_SESSIONS_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 1800 SECOND OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM tt
), sess AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts) AS sid
  FROM marked
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM sess GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


@given(_EVENTS)
@settings(max_examples=120, deadline=None)
def test_session_frame_lockstep_with_duckdb(events):
    """Full session rows from the REAL per-bucket kernel == the oracle's
    lag/interval window replay (same strict-> gap rule), including
    duplicate timestamps and gaps exactly at/one-us-past 1800 s."""
    df = pd.DataFrame(
        {
            "user_id": [u for u, _ in events],
            "ts": pd.array(
                np.array([t for _, t in events], dtype="datetime64[us]")
            ),
        }
    )
    got = session_frame(df).sort_values(
        ["user_id", "session_start"], kind="mergesort"
    )
    got_rows = [
        (r.user_id, r.session_start.to_datetime64(), r.session_end.to_datetime64(), r.n_events)
        for r in got.itertuples()
    ]
    _CON.register("tt", pa.Table.from_pandas(df, preserve_index=False))
    want_rows = [
        (u, np.datetime64(s, "us"), np.datetime64(e, "us"), n)
        for u, s, e, n in _CON.execute(_SESSIONS_SQL).fetchall()
    ]
    _CON.unregister("tt")
    assert got_rows == want_rows, (events, got_rows, want_rows)


# ----------------------------------------------------------- repetition

# word-repetition-heavy docs: tiny vocab so duplicate words and repeated
# bigrams actually occur, separators mixing word-breaking punctuation
# with word-merging empty joins, plus empty/None texts
_REP_WORD = st.sampled_from(["a", "b", "aa", "b_1", "x9", "a"])
_REP_SEP = st.sampled_from([" ", "\n", ".", "-", ", ", ""])
_REP_TEXT = st.one_of(
    st.none(),
    st.just(""),
    st.builds(
        lambda ws, sep: sep.join(ws),
        st.lists(_REP_WORD, min_size=0, max_size=20),
        _REP_SEP,
    ),
)
_REP_DOCS = st.lists(
    st.tuples(_REP_TEXT, st.sampled_from(["en", "de"])), min_size=1, max_size=12
)


@given(_REP_DOCS)
@settings(max_examples=80, deadline=None)
def test_repetition_metrics_lockstep_with_duckdb(docs):
    """Per-language partials from the REAL factorize+reduceat kernel ==
    the gate SQL run verbatim over the same frame — integer sums are
    exact, and the dup/bigram flag thresholds use identical float op
    order on both sides."""
    df = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(len(docs))],
            "text": [t for t, _ in docs],
            "lang": [lg for _, lg in docs],
        }
    )
    got = (
        _repetition_metrics(df)
        .sort_values("lang")
        .reset_index(drop=True)
        .astype(
            {
                c: "int64"
                for c in (
                    "n_docs",
                    "n_flagged",
                    "sum_words",
                    "sum_uniq",
                    "sum_top_bigram",
                )
            }
        )
    )
    _CON.register("documents", pa.Table.from_pandas(df, preserve_index=False))
    want = _CON.execute(Q_DOC_REPETITION_SQL).fetchdf()
    _CON.unregister("documents")
    want = want.sort_values("lang").reset_index(drop=True)[got.columns]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ----------------------------------------------------------------- asof

# purchases/clicks over two users with boundary-heavy timestamps:
# exact-tie (purchase.ts == click.ts must NOT match: strict before),
# duplicate (user, ts) clicks (kernel keeps max-by-value; the oracle
# pre-dedupes with max(value)), and integer-valued floats so no
# rounding enters the comparison
_ASOF_TS = st.builds(
    lambda k, d: k * 1_000_000 + d,
    st.integers(min_value=0, max_value=5),
    st.sampled_from([-1, 0, 1]),
)
_PURCHASES = st.lists(
    st.tuples(st.sampled_from(["u1", "u2"]), _ASOF_TS, st.integers(0, 9)),
    min_size=0,
    max_size=12,
)
_CLICKS = st.lists(
    st.tuples(st.sampled_from(["u1", "u2"]), _ASOF_TS, st.integers(0, 9)),
    min_size=0,
    max_size=12,
)

_ASOF_SQL = """
WITH c AS (SELECT user_id, ts, max(value) AS value
           FROM clicks GROUP BY user_id, ts)
SELECT p.event_id, p.user_id, p.ts, p.value AS purchase_value,
       c.ts AS click_ts, c.value AS click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts > c.ts
ORDER BY p.event_id
"""


@given(_PURCHASES, _CLICKS)
@settings(max_examples=150, deadline=None)
def test_asof_frame_lockstep_with_duckdb(purchases, clicks):
    """The REAL per-bucket merge_asof kernel (strict-before, dup-(key,ts)
    right rows resolved to max value) == DuckDB's NATIVE ASOF LEFT JOIN
    with the oracle's max(value) pre-dedup — an independent
    implementation, not a SQL replay of the kernel."""
    from coco_search_ray.stages.asof import asof_frame

    lp = pd.DataFrame(
        {
            "user_id": [u for u, _, _ in purchases],
            "ts": pd.array(
                np.array([t for _, t, _ in purchases], dtype="datetime64[us]")
            ),
            "event_id": pd.array(range(len(purchases)), dtype="float64"),
            "purchase_value": [float(v) for _, _, v in purchases],
            "click_ts": pd.array(
                np.full(len(purchases), np.datetime64("NaT"), dtype="datetime64[us]")
            ),
            "click_value": np.full(len(purchases), np.nan),
            "_side": np.zeros(len(purchases), dtype=np.int8),
        }
    )
    rc = pd.DataFrame(
        {
            "user_id": [u for u, _, _ in clicks],
            "ts": pd.array(
                np.array([t for _, t, _ in clicks], dtype="datetime64[us]")
            ),
            "event_id": np.full(len(clicks), np.nan),
            "purchase_value": np.full(len(clicks), np.nan),
            "click_ts": pd.array(
                np.array([t for _, t, _ in clicks], dtype="datetime64[us]")
            ),
            "click_value": [float(v) for _, _, v in clicks],
            "_side": np.ones(len(clicks), dtype=np.int8),
        }
    )
    union = pd.concat([lp, rc], ignore_index=True)
    got = asof_frame(
        union,
        key_col="user_id",
        ts_col="ts",
        left_cols=["event_id", "purchase_value"],
        out_names=["click_ts", "click_value"],
        int_left=["event_id"],
        int_right=[],
    )
    got = (
        got.sort_values("event_id")
        .reset_index(drop=True)[
            ["event_id", "user_id", "ts", "purchase_value", "click_ts", "click_value"]
        ]
        .astype({"event_id": "int64"})
    )
    # explicit Arrow schemas: an EMPTY draw would otherwise type
    # user_id float64 and break the SQL join
    p = pa.table(
        {
            "event_id": pa.array(range(len(purchases)), pa.int64()),
            "user_id": pa.array([u for u, _, _ in purchases], pa.string()),
            "ts": pa.array([t for _, t, _ in purchases], pa.timestamp("us")),
            "value": pa.array([float(v) for _, _, v in purchases], pa.float64()),
        }
    )
    c = pa.table(
        {
            "user_id": pa.array([u for u, _, _ in clicks], pa.string()),
            "ts": pa.array([t for _, t, _ in clicks], pa.timestamp("us")),
            "value": pa.array([float(v) for _, _, v in clicks], pa.float64()),
        }
    )
    _CON.register("p", p)
    _CON.register("clicks", c)
    want = _CON.execute(_ASOF_SQL).fetchdf()
    _CON.unregister("p")
    _CON.unregister("clicks")
    want = want.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# -------------------------------------------------------- decontaminate

# the n-gram domain seam: Python str.lower() + re.ASCII split vs
# DuckDB's utf8proc lower() + RE2 split — non-ASCII uppercase letters
# whose lowercase IS ascii (Kelvin sign, İ, ﬁ ligature) are where the
# two engines could disagree about which [a-z0-9_] runs survive
_DECON_TEXT = st.text(
    alphabet="ab c1_ÉİKﬁ.,\t\n\x0b\xa0-", max_size=80
)


@given(_DECON_TEXT)
@settings(max_examples=200, deadline=None)
def test_doc_ngram_set_lockstep_with_duckdb(text):
    """The REAL decontamination n-gram kernel == the oracle SQL's
    per-doc n-gram list (same width constant, generated from it)."""
    from coco_search_ray.pipelines.queries import _DECON_N, _doc_ngram_set

    got = sorted(_doc_ngram_set(text))
    _CON.register("tt", pa.table({"text": pa.array([text], pa.string())}))
    want = _CON.execute(
        f"""
        WITH w AS (
          SELECT list_filter(string_split_regex(
                             translate(coalesce(text, ''),
                               'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                               'abcdefghijklmnopqrstuvwxyz'),
                             '[^a-z0-9_]+'), x -> x != '') AS ws
          FROM tt
        )
        SELECT list_sort(list_distinct(list_transform(
          range(1, greatest(len(ws) - {_DECON_N - 2}, 1)),
          i -> array_to_string(list_slice(ws, i, i + {_DECON_N - 1}), ' ')
        ))) FROM w
        """
    ).fetchone()[0]
    _CON.unregister("tt")
    assert got == want, (repr(text), got, want)


# --------------------------------------------------- exact-cents money

# 2dp money in plausible magnitudes, including negatives (balances) and
# exact .xx5-boundary-producing combinations; built as exact cent
# integers then /100 so every value is genuine 2-decimal fixed-point
_CENTS = st.integers(min_value=-10_000_000, max_value=10_000_000)
_DISC_E2 = st.integers(min_value=0, max_value=10)  # 0.00-0.10 like l_discount


@given(st.lists(_CENTS, min_size=1, max_size=50))
@settings(max_examples=120, deadline=None)
def test_cents_e2_sum_lockstep_with_duckdb(cents):
    """cents_i64 + e2_dollars == the SQL mirror
    `sum(CAST(round(x*100) AS BIGINT))::BIGINT / 100.0` — exact string
    equality (the gate hashes str(float64))."""
    from coco_search_ray.functions.numeric import cents_i64, e2_dollars

    vals = [c / 100.0 for c in cents]
    arr = pa.array(vals, pa.float64())
    got = e2_dollars([int(np.sum(cents_i64(arr).to_numpy()))])[0]
    _CON.register("_money", pa.table({"x": arr}))
    try:
        exp = _CON.execute(
            "SELECT sum(CAST(round(x*100) AS BIGINT))::BIGINT / 100.0 FROM _money"
        ).fetchone()[0]
    finally:
        _CON.unregister("_money")
    assert str(got) == str(float(exp))


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=10_000_000), _DISC_E2),
                min_size=1, max_size=50))
@settings(max_examples=120, deadline=None)
def test_cents_e4_revenue_lockstep_with_duckdb(rows):
    """price*(1-disc) summed as exact e4 integers + e4_round2_pos == the
    SQL mirror `((sum(p_e2*(100-d_e2))::BIGINT + 50) // 100) / 100.0` —
    including sums landing exactly on the .xx5 half boundary."""
    from coco_search_ray.functions.numeric import cents_i64, e4_round2_pos

    price = pa.array([p / 100.0 for p, _ in rows], pa.float64())
    disc = pa.array([d / 100.0 for _, d in rows], pa.float64())
    p_e2 = cents_i64(price).to_numpy()
    d_e2 = cents_i64(disc).to_numpy()
    got = e4_round2_pos([int(np.sum(p_e2 * (100 - d_e2)))])[0]
    _CON.register("_rev", pa.table({"p": price, "d": disc}))
    try:
        exp = _CON.execute(
            "SELECT ((sum(CAST(round(p*100) AS BIGINT) * (100 - CAST(round(d*100) AS BIGINT)))::BIGINT + 50) // 100) / 100.0 FROM _rev"
        ).fetchone()[0]
    finally:
        _CON.unregister("_rev")
    assert str(got) == str(float(exp))


@given(st.lists(_CENTS, min_size=1, max_size=50))
@settings(max_examples=120, deadline=None)
def test_cents_avg_lockstep_with_duckdb(cents):
    """(cent_sum / n) / 100.0 then half-away == the SQL mirror
    `round((sum(cents)::BIGINT / count(*)) / 100.0, 2)` — negatives
    included (balances), both engines divide identical integers."""
    from coco_search_ray.functions.numeric import cents_i64, round_half_away

    vals = [c / 100.0 for c in cents]
    arr = pa.array(vals, pa.float64())
    s = int(np.sum(cents_i64(arr).to_numpy()))
    got = round_half_away((s / len(vals)) / 100.0, 2)
    _CON.register("_bal", pa.table({"x": arr}))
    try:
        exp = _CON.execute(
            "SELECT round((sum(CAST(round(x*100) AS BIGINT))::BIGINT / count(*)) / 100.0, 2) FROM _bal"
        ).fetchone()[0]
    finally:
        _CON.unregister("_bal")
    assert str(float(got)) == str(float(exp))
