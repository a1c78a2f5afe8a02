"""Query registry: every operator family exposed as a named pipeline over
the driver's parquet tables, with a DuckDB oracle where SQL can express
the semantics (the driver's correctness gate compares row count + schema
+ order-insensitive value hash, so column NAMES and rounded values must
match the SQL exactly).

Conventions:
- every callable takes sf_dir and returns Dataset / DataFrame / Table;
- float aggregates are rounded to 2 decimals on BOTH sides (cosines to 4)
  so value hashes are stable across summation orders;
- queries with no SQL entry are checked rows-only by the driver; each
  documents why in its docstring. The full list and reasons:
    kg_triples           in-repo single-process oracle (P/R parity pytest);
                         every downstream stat/join over it IS SQL-checked
                         via the triple export
    q_ann_ivf            approximate by design (recall < 1); exact twin
                         q_ann_topk is green, recall pinned in tests
    q_embedding_neardup_lsh  approximate by design; exact twin
                         q_embedding_neardup is green
    q_doc_chunks         separator-driven recursive splitter + greedy
                         overlap repacking not SQL-expressible; golden
                         unit tests + green q_doc_chunks_fixed twin
    q_events_hll_users   HyperLogLog sketch — deterministic but not
                         SQL-reproducible; error bound pinned in tests,
                         exact twin q_events_distinct_users is green
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..sources.synth import ensure_tier, tier_for_sf_dir
from ..stages import ann, dedup, textops, window
from ..stages.joins import broadcast_join, hash_join


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _read(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(_t(sf_dir, name), columns=columns)


# ---------------------------------------------------------------------------
# Oracle exports: queries whose INTERMEDIATE product is not SQL-derivable
# from the driver views (simhash values, rolling fingerprints, KG triples)
# export that product to a deterministic parquet path as they run; their
# oracle SQL reads the export back and independently re-derives the
# DOWNSTREAM computation (pair extraction, components, grouped stats,
# joins). The exports make the non-SQL half visible to DuckDB; the SQL
# half is still an independent re-implementation. Paths are keyed by the
# sf basename and the SQL hardcodes sf0.01 — the driver's gate tier —
# so these oracles are only meaningful there (documented limitation).
# ---------------------------------------------------------------------------

_EXPORT_ROOT = "/tmp/coco_oracle_export"


def _export_table(sf_dir: str, name: str, table: pa.Table) -> None:
    d = os.path.join(_EXPORT_ROOT, os.path.basename(os.path.normpath(sf_dir)))
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{name}.parquet")
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


_EXP = f"{_EXPORT_ROOT}/sf0.01"  # the gate tier's export dir (SQL side)
_SYNTH_CORRECTNESS = "/tmp/coco_synth/correctness"  # sources/synth._TIER_ROOT default


from ..functions.numeric import cents_i64, e2_dollars, e4_round2_pos
from ..functions.numeric import round_df_half_away as _round_half_away
from ..functions.numeric import vec_matrix


def _round2(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    return _round_half_away(df, cols, 2)


# ---------------------------------------------------------------------------
# Relational core (TPC-H-ish): scan/filter/project, partial-agg groupby,
# broadcast + hash joins, sort/top-k, distinct
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """Grouped aggregate with column-pruned scan + vectorized derivation
    (the canonical map_batches -> groupby().aggregate() shape).

    Money sums run on the EXACT-CENTS contract (functions/numeric.py
    cents_i64/e2_dollars/e4_round2_pos): float sums flip .xx5 rounding
    boundaries between Ray's block order and DuckDB's scan order once
    groups are large enough (observed at sf0.1: sum_disc_price
    2697140231.63 vs .62 — the true e4 sum sits exactly on the half).
    sum_qty / avg_qty stay float: quantities are small integers, whose
    float sums are EXACT at any block order."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))

    def derive(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b["l_shipdate"], cutoff))
        price_e2 = cents_i64(b["l_extendedprice"])
        disc_e2 = cents_i64(b["l_discount"])
        # price*(1-disc) in exact hundredths-of-a-cent (e4) integers
        disc_price_e4 = pc.multiply(price_e2, pc.subtract(pa.scalar(100, pa.int64()), disc_e2))
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "l_quantity": b["l_quantity"],
                "base_e2": price_e2,
                "disc_e4": disc_price_e4,
            }
        )

    out = (
        ds.map_batches(derive, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("base_e2", alias_name="base_e2"),
            Sum("disc_e4", alias_name="disc_e4"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    out["sum_base_price"] = e2_dollars(out.pop("base_e2"))
    out["sum_disc_price"] = e4_round2_pos(out.pop("disc_e4"))
    out = _round2(out, ["sum_qty", "avg_qty"])
    return out[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
         "sum_disc_price", "avg_qty", "count_order"]
    ]


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                          AS sum_qty,
       -- exact-cents contract (numeric.cents_i64 mirrors CAST(round(x*100) AS BIGINT))
       sum(CAST(round(l_extendedprice*100) AS BIGINT))::BIGINT / 100.0 AS sum_base_price,
       ((sum(CAST(round(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(round(l_discount*100) AS BIGINT)))::BIGINT + 50) // 100) / 100.0
                                                          AS sum_disc_price,
       round(avg(l_quantity), 2)                          AS avg_qty,
       count(*)                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_segment(sf_dir: str) -> pd.DataFrame:
    """Broadcast join (customer is the small dimension side) + groupby.
    Revenue on the exact-cents contract (see q1_pricing_summary)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": b["o_custkey"], "price_e2": cents_i64(b["o_totalprice"])}
        )

    joined = broadcast_join(
        orders.map_batches(to_cents, batch_format="pyarrow"), customer, "o_custkey", "c_custkey"
    )
    out = (
        joined.groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("price_e2", alias_name="price_e2"))
        .to_pandas()
    )
    out["revenue"] = e2_dollars(out.pop("price_e2"))
    return out


Q_REVENUE_BY_SEGMENT_SQL = """
SELECT c_mktsegment, count(*) AS n_orders,
       sum(CAST(round(o_totalprice*100) AS BIGINT))::BIGINT / 100.0 AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_nation_customers(sf_dir: str) -> pd.DataFrame:
    """avg over money runs on exact cent sums (sum int64 cents, ONE
    division per group on identical integers both sides — float-sum
    accumulation order can flip the .xx5 half-away boundary)."""
    customer = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    nation = pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {"c_nationkey": b["c_nationkey"], "bal_e2": cents_i64(b["c_acctbal"])}
        )

    joined = broadcast_join(
        customer.map_batches(to_cents, batch_format="pyarrow"), nation, "c_nationkey", "n_nationkey"
    )
    out = (
        joined.groupby("n_name")
        .aggregate(Count(alias_name="n_customers"), Sum("bal_e2", alias_name="bal_e2"))
        .to_pandas()
    )
    # (cents / n) / 100.0: two correctly-rounded float ops on identical
    # integers -> bit-identical doubles on both engines, THEN half-away
    out["avg_acctbal"] = (
        out.pop("bal_e2").to_numpy(dtype=np.int64) / out["n_customers"].to_numpy(dtype=np.int64)
    ) / 100.0
    return _round2(out, ["avg_acctbal"])


Q_NATION_CUSTOMERS_SQL = """
SELECT n_name, count(*) AS n_customers,
       round((sum(CAST(round(c_acctbal*100) AS BIGINT))::BIGINT / count(*)) / 100.0, 2)
           AS avg_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_orders_by_priority(sf_dir: str) -> pd.DataFrame:
    """Hash join (both sides large): orders x lineitem, revenue by priority."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(b: pa.Table) -> pa.Table:
        # exact e4 (hundredths-of-a-cent) revenue — see q1_pricing_summary
        r = pc.multiply(
            cents_i64(b["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), cents_i64(b["l_discount"])),
        )
        return pa.table({"l_orderkey": b["l_orderkey"], "rev_e4": r})

    lineitem = lineitem.map_batches(rev, batch_format="pyarrow")
    joined = hash_join(orders, lineitem, on="o_orderkey", right_on="l_orderkey")
    out = (
        joined.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_items"), Sum("rev_e4", alias_name="rev_e4"))
        .to_pandas()
    )
    out["revenue"] = e4_round2_pos(out.pop("rev_e4"))
    return out


Q_ORDERS_BY_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS n_items,
       ((sum(CAST(round(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(round(l_discount*100) AS BIGINT)))::BIGINT + 50) // 100) / 100.0
           AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


def q_top_orders(sf_dir: str) -> pd.DataFrame:
    """Global top-k: sort desc with deterministic tiebreak + limit."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderstatus"])
    out = (
        ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10).to_pandas()
    )
    return _round2(out, ["o_totalprice"])


Q_TOP_ORDERS_SQL = """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderstatus
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_part_revenue_by_brand(sf_dir: str) -> pd.DataFrame:
    lineitem = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount", "l_quantity"])
    part = pq.read_table(_t(sf_dir, "part"), columns=["p_partkey", "p_brand"])

    def rev(b: pa.Table) -> pa.Table:
        # exact e4 revenue — see q1_pricing_summary
        r = pc.multiply(
            cents_i64(b["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), cents_i64(b["l_discount"])),
        )
        return pa.table({"l_partkey": b["l_partkey"], "rev_e4": r, "l_quantity": b["l_quantity"]})

    joined = broadcast_join(lineitem.map_batches(rev, batch_format="pyarrow"), part, "l_partkey", "p_partkey")
    out = (
        joined.groupby("p_brand")
        .aggregate(
            Count(alias_name="n_items"),
            Sum("rev_e4", alias_name="rev_e4"),
            Sum("l_quantity", alias_name="sum_qty"),
        )
        .to_pandas()
    )
    out["revenue"] = e4_round2_pos(out.pop("rev_e4"))
    out = _round2(out, ["sum_qty"])
    return out[["p_brand", "n_items", "revenue", "sum_qty"]]


Q_PART_REVENUE_SQL = """
SELECT p_brand, count(*) AS n_items,
       ((sum(CAST(round(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(round(l_discount*100) AS BIGINT)))::BIGINT + 50) // 100) / 100.0
           AS revenue,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q_distinct_priorities(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_orderpriority"])
    # NULL-safe: a null priority would make sorted() raise (None < str);
    # both sides drop nulls (oracle WHERE o_orderpriority IS NOT NULL)
    vals = sorted(v for v in ds.unique("o_orderpriority") if v is not None)
    return pd.DataFrame({"o_orderpriority": vals})


Q_DISTINCT_PRIORITIES_SQL = (
    "SELECT DISTINCT o_orderpriority FROM orders"
    " WHERE o_orderpriority IS NOT NULL"
)


def q_top_orders_per_segment(sf_dir: str) -> pd.DataFrame:
    """Top-3 orders per market segment (window-function shape: the
    distributed expression is groupby(segment) + per-group vectorized
    nlargest with a total tiebreak — segments are few and coarse, so one
    Ray group per segment is the right granularity here)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    customer = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    joined = broadcast_join(orders, customer, "o_custkey", "c_custkey")

    def top3(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(3)
        return d[["c_mktsegment", "o_orderkey", "o_totalprice"]]

    out = (
        joined.groupby("c_mktsegment")
        .map_groups(top3, batch_format="pandas")
        .to_pandas()
        .sort_values(["c_mktsegment", "o_totalprice", "o_orderkey"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    return _round2(out, ["o_totalprice"])


Q_TOP_ORDERS_PER_SEGMENT_SQL = """
WITH ranked AS (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (
             PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM ranked WHERE rn <= 3
"""


def q_order_price_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-group DISCRETE quantiles (median / p90) — both engines
    select an ACTUAL data value (numpy method='inverted_cdf' == DuckDB
    quantile_disc, 8000-trial lockstep-fuzzed), so the comparison is
    exact by construction. Interpolating quantiles (np.quantile linear
    vs quantile_cont) were abandoned: the two lerp formulas disagree in
    the last ulp ~20% of the time, and with 2-dp prices the gate medians
    land EXACTLY on .xx5 half-away boundaries (measured margin 0.0) —
    the hash match relied on bit-identical float ops."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def q(df: pd.DataFrame) -> pd.DataFrame:
        x = df["o_totalprice"].to_numpy(dtype=np.float64)
        # quantiles over non-null values only (DuckDB quantile_disc
        # skips NULLs; a None -> NaN would poison np.quantile), while
        # n_orders counts every row like count(*)
        xq = x[~np.isnan(x)]
        return pd.DataFrame(
            {
                "o_orderpriority": [df["o_orderpriority"].iloc[0]],
                "n_orders": [len(x)],
                "median_price": [
                    np.quantile(xq, 0.5, method="inverted_cdf") if len(xq) else np.nan
                ],
                "p90_price": [
                    np.quantile(xq, 0.9, method="inverted_cdf") if len(xq) else np.nan
                ],
            }
        )

    out = (
        ds.groupby("o_orderpriority")
        .map_groups(q, batch_format="pandas")
        .to_pandas()
        .astype({"n_orders": "int64"})
    )
    return _round2(out, ["median_price", "p90_price"])


Q_ORDER_PRICE_QUANTILES_SQL = """
SELECT o_orderpriority, count(*) AS n_orders,
       round(quantile_disc(o_totalprice, 0.5), 2) AS median_price,
       round(quantile_disc(o_totalprice, 0.9), 2) AS p90_price
FROM orders GROUP BY o_orderpriority
"""


def q_lineitem_bloom_semi_join(sf_dir: str) -> pd.DataFrame:
    """Bloom-prefiltered semi-join: lineitems of expensive orders. The
    bloom bit array broadcasts compactly and prunes; exact isin on the
    survivors makes the RESULT exact — hence a plain semi-join oracle.

    sum_price stays a float sum (not the exact-cents contract): groups
    are line-items-per-ORDER, bounded ~7 at any corpus size, so the
    accumulation error (~1e-10) can never reach the 0.005 half-away
    margin that 2dp-exact true sums guarantee."""
    from ..stages.sketch import bloom_semi_join

    orders = pq.read_table(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
    keys = orders.filter(pc.greater(orders["o_totalprice"], 400000.0))["o_orderkey"].to_pylist()
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    hits = bloom_semi_join(li, "l_orderkey", keys)
    out = (
        hits.groupby("l_orderkey")
        .aggregate(Count(alias_name="n_items"), Sum("l_extendedprice", alias_name="sum_price"))
        .to_pandas()
    )
    return _round2(out, ["sum_price"])


Q_LINEITEM_BLOOM_SEMI_JOIN_SQL = """
SELECT l_orderkey, count(*) AS n_items, round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)
GROUP BY l_orderkey
"""


def q_events_hll_users(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog distinct-user estimate per event_type (rows-only: the
    sketch is deterministic but not SQL-reproducible; its error bound is
    pinned by tests/test_sketches.py and the EXACT twin
    q_events_distinct_users is green)."""
    from ..functions.sketches import (
        hashes_of_strings,
        hll_add_hashes,
        hll_estimate,
        hll_make_registers,
        hll_merge,
    )

    P = 12
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def block_registers(b: pa.Table) -> pa.Table:
        # ONE pass: a register blob per (block, event_type) — registers
        # are max-mergeable, so the driver folds the tiny partials
        df = b.to_pandas()
        types, blobs = [], []
        for et, g in df.groupby("event_type", sort=True):
            regs = hll_make_registers(P)
            hll_add_hashes(regs, hashes_of_strings(g["user_id"].tolist()), P)
            types.append(et)
            blobs.append(regs.tobytes())
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "regs": pa.array(blobs, pa.binary())})

    merged: dict[str, np.ndarray] = {}
    for row in ds.map_batches(block_registers, batch_format="pyarrow").take_all():
        prev = merged.get(row["event_type"], hll_make_registers(P))
        merged[row["event_type"]] = hll_merge(prev, np.frombuffer(row["regs"], dtype=np.uint8))
    rows = [(et, int(round(hll_estimate(regs)))) for et, regs in sorted(merged.items())]
    return pd.DataFrame(rows, columns=["event_type", "n_users_hll"])


def q_events_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """Count-Min-guided heavy hitters: users with >= 0.75% of all events.
    The sketch prunes the long tail before the exact shuffle; because the
    CMS never underestimates and survivors are re-counted exactly, the
    RESULT is exact — hence a plain GROUP BY ... HAVING oracle."""
    from ..stages.sketch import cms_heavy_hitters

    ds = _read(sf_dir, "events", ["user_id"])
    out = cms_heavy_hitters(ds, "user_id", phi=0.0075).to_pandas()
    if out.empty and len(out.columns) == 0:
        # a zero-survivor run (10x the users -> nobody holds 0.75% of
        # events) comes back as a column-less empty frame (Ray empty
        # datasets lose their schema — the bfs_distributed lesson);
        # rebuild the typed empty so astype/hash see the contract schema
        out = pd.DataFrame(
            {"user_id": pd.Series([], dtype="int64"), "n_events": pd.Series([], dtype="int64")}
        )
    return out.astype({"user_id": "int64", "n_events": "int64"})


Q_EVENTS_HEAVY_HITTERS_SQL = """
-- NULL keys are excluded like the pipeline's drop_null sketch passes
-- (the threshold denominator still counts every row, as b.num_rows does)
SELECT user_id, count(*) AS n_events
FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id
HAVING count(*) >= CAST(ceil(0.0075 * (SELECT count(*) FROM events)) AS BIGINT)
"""


def q_supplier_balance(sf_dir: str) -> pd.DataFrame:
    """Balance sum on exact cents (negative balances are fine on the e2
    path: /100.0 needs no integer-division rounding); min/max stay float
    (no accumulation, order-independent)."""
    supplier = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    nation = pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])

    def to_cents(b: pa.Table) -> pa.Table:
        return b.append_column("bal_e2", cents_i64(b["s_acctbal"]))

    joined = broadcast_join(
        supplier.map_batches(to_cents, batch_format="pyarrow"), nation, "s_nationkey", "n_nationkey"
    )
    out = (
        joined.groupby("n_name")
        .aggregate(
            Count(alias_name="n_suppliers"),
            Sum("bal_e2", alias_name="bal_e2"),
            Min("s_acctbal", alias_name="min_acctbal"),
            Max("s_acctbal", alias_name="max_acctbal"),
        )
        .to_pandas()
    )
    out["total_acctbal"] = e2_dollars(out.pop("bal_e2"))
    out = _round2(out, ["min_acctbal", "max_acctbal"])
    return out[["n_name", "n_suppliers", "total_acctbal", "min_acctbal", "max_acctbal"]]


Q_SUPPLIER_BALANCE_SQL = """
SELECT n_name, count(*) AS n_suppliers,
       sum(CAST(round(s_acctbal*100) AS BIGINT))::BIGINT / 100.0 AS total_acctbal,
       round(min(s_acctbal), 2) AS min_acctbal,
       round(max(s_acctbal), 2) AS max_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Event-time windows
# ---------------------------------------------------------------------------


def q_events_tumbling(sf_dir: str) -> pd.DataFrame:
    """Event values are 2dp fixed-point -> sum as exact cents (convert
    BEFORE the generic tumbling stage; its Sum is dtype-agnostic)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return b.drop_columns(["value"]).append_column("value", cents_i64(b["value"]))

    out = window.tumbling_agg(
        ds.map_batches(to_cents, batch_format="pyarrow"), size_s=3600
    ).to_pandas()
    out["sum_value"] = e2_dollars(out.pop("sum_value"))
    return out


Q_EVENTS_TUMBLING_SQL = """
-- integer // truncates toward zero exactly like the pipeline's Arrow
-- pc.divide on int64 microseconds (floor() would diverge on pre-epoch
-- timestamps: -30min floors to bucket -1 but truncates to bucket 0)
SELECT (epoch_us(ts) // 3600000000) AS hour_bucket, event_type,
       count(*) AS n_events,
       sum(CAST(round(value*100) AS BIGINT))::BIGINT / 100.0 AS sum_value
FROM events GROUP BY 1, 2
"""


def q_events_user_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def flag(b: pa.Table) -> pa.Table:
        is_p = pc.cast(pc.equal(b["event_type"], pa.scalar("purchase")), pa.int64())
        return pa.table(
            {"user_id": b["user_id"], "val_e2": cents_i64(b["value"]), "is_purchase": is_p}
        )

    out = (
        ds.map_batches(flag, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("val_e2", alias_name="val_e2"),
            Sum("is_purchase", alias_name="n_purchases"),
        )
        .to_pandas()
    )
    out["sum_value"] = e2_dollars(out.pop("val_e2"))
    return out[["user_id", "n_events", "sum_value", "n_purchases"]]


Q_EVENTS_USER_STATS_SQL = """
SELECT user_id, count(*) AS n_events,
       sum(CAST(round(value*100) AS BIGINT))::BIGINT / 100.0 AS sum_value,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchases
FROM events GROUP BY user_id
"""


def q_events_sessions(sf_dir: str) -> pd.DataFrame:
    """Session windows (gap 30 min) — summary grouped per user so the
    result is SQL-comparable (DuckDB window functions express the gap
    rule)."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    sessions = window.sessionize(ds, gap_s=1800).to_pandas()
    out = (
        sessions.groupby("user_id", as_index=False)
        .agg(n_sessions=("n_events", "size"), max_session_events=("n_events", "max"))
        .astype({"n_sessions": "int64", "max_session_events": "int64"})
    )
    return out


Q_EVENTS_SESSIONS_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 1800 SECOND OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sess AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts) AS sid
  FROM marked
), per_session AS (
  SELECT user_id, sid, count(*) AS n_events FROM sess GROUP BY user_id, sid
)
SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events
FROM per_session GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Documents: text analysis + dedup family
# ---------------------------------------------------------------------------


def q_events_asof(sf_dir: str) -> pd.DataFrame:
    """As-of join (an operator Ray Data lacks): each purchase event
    attaches the user's latest STRICTLY-prior click. Coarse key buckets +
    per-bucket merge_asof; DuckDB's native ASOF JOIN is the oracle."""
    from ..stages.asof import asof_join

    left = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"]).filter(
        expr="event_type == 'purchase'"
    ).drop_columns(["event_type"])
    right = _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"]).filter(
        expr="event_type == 'click'"
    ).drop_columns(["event_type"])
    out = asof_join(
        left,
        right,
        key_col="user_id",
        ts_col="ts",
        left_cols=["event_id", "value"],
        right_cols={"ts": "click_ts", "value": "click_value"},
    ).to_pandas()
    out = out.rename(columns={"value": "purchase_value"})
    out = _round_half_away(out, ["purchase_value"], 2)
    # half-away rounding on a column with NaNs: round only the valid rows
    mask = out["click_value"].notna()
    out.loc[mask, "click_value"] = _round_half_away(
        out.loc[mask, ["click_value"]].copy(), ["click_value"], 2
    )["click_value"]
    return (
        out[["event_id", "user_id", "ts", "purchase_value", "click_ts", "click_value"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


Q_EVENTS_ASOF_SQL = """
WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
     -- pre-dedupe exact-ts ties to max(value): DuckDB ASOF picks an
     -- UNSPECIFIED row among equal (user_id, ts) clicks, the pipeline
     -- deterministically keeps max-by-value (stages/asof.py) — this makes
     -- the oracle deterministic under duplicate (key, ts) right rows
     c AS (SELECT user_id, ts, max(value) AS value FROM events
           WHERE event_type = 'click' GROUP BY user_id, ts)
SELECT p.event_id, p.user_id, p.ts, round(p.value, 2) AS purchase_value,
       c.ts AS click_ts, round(c.value, 2) AS click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts > c.ts
ORDER BY p.event_id
"""


def q_doc_splits(sf_dir: str) -> pd.DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by md5(doc_id)
    bucket — stable across runs/engines and uncorrelated with the id
    sequence. The oracle RECOMPUTES the md5 assignment in SQL (DuckDB
    ships the identical hash), so the check is fully independent."""
    from ..stages.split import assign_splits

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    tagged = assign_splits(ds, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    out = (
        tagged.groupby("split")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"))
        .to_pandas()
        .astype({"n_docs": "int64", "sum_chars": "int64"})
    )
    return out


Q_DOC_SPLITS_SQL = """
WITH b AS (
  SELECT doc_id, n_chars,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::UBIGINT AS bucket
  FROM documents
), s AS (
  SELECT n_chars, CASE
    WHEN bucket < 0.8 * power(16, 12) THEN 'train'
    WHEN bucket < 0.9 * power(16, 12) THEN 'val'
    ELSE 'test' END AS split
  FROM b
)
SELECT split, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM s GROUP BY split
"""


def q_doc_packing(sf_dir: str) -> pd.DataFrame:
    """Sequence packing into 2000-char bins over doc_id order (the
    concat-then-window pretraining step) via distributed prefix sums;
    the oracle recomputes the bin rule with a window cumsum."""
    from ..stages.pack import pack_bins

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    binned = pack_bins(ds, "doc_id", "n_chars", budget=2000)
    out = (
        binned.groupby("bin")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"))
        .to_pandas()
        .astype({"bin": "int64", "n_docs": "int64", "sum_chars": "int64"})
    )
    return out


Q_DOC_PACKING_SQL = """
WITH c AS (
  SELECT doc_id, n_chars,
         coalesce(sum(n_chars) OVER (
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS excl
  FROM documents
)
SELECT (excl // 2000)::BIGINT AS bin, count(*) AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars
FROM c GROUP BY 1
"""


def q_doc_unigram_lm(sf_dir: str) -> pd.DataFrame:
    """Corpus-trained unigram-LM quality scores (perplexity-filter
    shape): per-language mean document log-probability and mean
    per-token log-probability. The oracle retrains the same unigram
    model in SQL (token histogram + join) — fully independent.

    avg_logprob rounds at THREE decimals, not four: these are float
    means of float sums (not integerizable like money), so the contract
    is safe only when the unrounded value sits far from a rounding
    boundary relative to the cross-engine accumulation noise
    (~sqrt(n)*ulp(sum) ~ 5e-9 here). Measured at the gate tier:
    avg_logprob's 4dp margin was 5.07e-9 — a coin flip — while its 3dp
    margin is 8.4e-5 (~17,000 sigma); avg_logprob_per_token's 4dp margin
    is 9.3e-6, comfortably safe (margins pinned by
    tests/test_properties.py::test_float_average_boundary_margins)."""
    from ..stages.textops import unigram_logprob_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    scored = unigram_logprob_scores(ds)

    def derive(b: pa.Table) -> pa.Table:
        per_tok = pc.divide(b["logprob"], pc.cast(b["n_tokens"], pa.float64()))
        return pa.table({"lang": b["lang"], "logprob": b["logprob"], "per_tok": per_tok})

    out = (
        scored.map_batches(derive, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Mean("logprob", alias_name="avg_logprob"),
            Mean("per_tok", alias_name="avg_logprob_per_token"),
        )
        .to_pandas()
        .astype({"n_docs": "int64"})
    )
    out = _round_half_away(out, ["avg_logprob"], 3)
    return _round_half_away(out, ["avg_logprob_per_token"], 4)


Q_DOC_UNIGRAM_LM_SQL = r"""
WITH tok AS (
  SELECT doc_id, lang, unnest(list_transform(regexp_extract_all(text, '\w+'), x -> lower(x))) AS t
  FROM documents
), cnt AS (
  SELECT t, count(*) AS c FROM tok GROUP BY t
), tot AS (
  SELECT sum(c)::DOUBLE AS n FROM cnt
), doc AS (
  SELECT tok.doc_id, any_value(tok.lang) AS lang,
         sum(ln(cnt.c / tot.n)) AS lp, count(*) AS nt
  FROM tok JOIN cnt ON cnt.t = tok.t CROSS JOIN tot
  GROUP BY tok.doc_id
)
SELECT lang, count(*) AS n_docs,
       round(avg(lp), 3) AS avg_logprob,
       round(avg(lp / nt), 4) AS avg_logprob_per_token
FROM doc GROUP BY lang
"""


def q_doc_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    feats = ds.map_batches(textops.doc_features, batch_format="pyarrow")
    out = (
        feats.groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tokens", alias_name="sum_tokens"),
            Mean("n_chars", alias_name="avg_chars"),
        )
        .to_pandas()
    )
    return _round2(out, ["avg_chars"])


Q_DOC_STATS_SQL = """
SELECT lang, count(*) AS n_docs,
       -- coalesce: an all-NULL-text lang group must sum 0 like the
       -- pipeline's (t or ''), not NULL
       sum(array_length(regexp_extract_all(coalesce(text, ''), '\\w+')))::BIGINT AS sum_tokens,
       round(avg(n_chars), 2) AS avg_chars
FROM documents GROUP BY lang
"""


def q_doc_exact_dedup(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.exact_dedup_groups(ds).to_pandas()


Q_DOC_EXACT_DEDUP_SQL = """
-- coalesce mirrors the pipeline's content_sha256(t or ''): a NULL-text
-- doc and an empty-text doc are the SAME content group (bare GROUP BY
-- text would keep NULL a separate group)
SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY coalesce(text, '')
"""


def q_doc_langid(sf_dir: str) -> pd.DataFrame:
    """Heuristic language ID counts."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    feats = ds.map_batches(textops.doc_features, batch_format="pyarrow")
    return feats.groupby("lang_detected").aggregate(Count(alias_name="n_docs")).to_pandas()


# the stopword lists ARE the language-ID model (functions/text.py
# _LANG_STOPWORDS); the SQL replays the same decision rule: first 200
# lowercased word tokens, hits per language, winner = alphabetically
# first language reaching the strict max, >= 2 hits required else 'und'
Q_DOC_LANGID_SQL = r"""
WITH w AS (
  SELECT doc_id,
         -- coalesce: NULL text must classify 'und' like the pipeline's
         -- (t or ''), not fall through every NULL CASE arm to the ELSE
         list_transform(list_slice(regexp_extract_all(coalesce(text, ''), '\w+'), 1, 200), x -> lower(x)) AS words
  FROM documents
), h AS (
  SELECT doc_id, len(words) AS nw,
    len(list_filter(words, x -> x IN ('der','die','und','in','den','von','zu','das','mit','sich','des','auf','ist','im','dem','nicht','ein'))) AS de,
    len(list_filter(words, x -> x IN ('the','and','of','to','a','in','is','it','you','that','was','for','on','are','with','as','i','his','they','be','at'))) AS en,
    len(list_filter(words, x -> x IN ('de','la','que','el','en','y','a','los','se','del','las','un','por','con','no','una','su'))) AS es,
    len(list_filter(words, x -> x IN ('le','de','la','et','les','des','en','un','du','une','que','est','pour','qui','dans','par'))) AS fr
  FROM w
), lang AS (
  SELECT CASE
    WHEN nw = 0 OR greatest(de, en, es, fr) < 2 THEN 'und'
    WHEN de = greatest(de, en, es, fr) THEN 'de'
    WHEN en = greatest(de, en, es, fr) THEN 'en'
    WHEN es = greatest(de, en, es, fr) THEN 'es'
    ELSE 'fr'
  END AS lang_detected
  FROM h
)
SELECT lang_detected, count(*) AS n_docs FROM lang GROUP BY lang_detected
"""


def q_doc_quality(sf_dir: str) -> pd.DataFrame:
    """Per-language quality signal means."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    feats = ds.map_batches(textops.doc_features, batch_format="pyarrow")
    out = (
        feats.groupby("lang")
        .aggregate(
            Mean("punct_ratio", alias_name="avg_punct_ratio"),
            Mean("stopword_ratio", alias_name="avg_stopword_ratio"),
            Mean("mean_word_len", alias_name="avg_word_len"),
        )
        .to_pandas()
    )
    return _round_half_away(out, ["avg_punct_ratio", "avg_stopword_ratio", "avg_word_len"], 4)


Q_DOC_QUALITY_SQL = r"""
WITH f AS (
  SELECT lang, length(text) AS n_chars,
         regexp_extract_all(text, '\w+') AS words,
         len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
  FROM documents
), g AS (
  SELECT lang,
    CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars ELSE 0 END AS punct_ratio,
    CASE WHEN len(words) > 0 THEN len(list_filter(words, x -> lower(x) IN ('the','and','of','to','a','in','is','it','you','that','was','for','on','are','with','as','i','his','they','be','at')))::DOUBLE / len(words) ELSE 0 END AS stopword_ratio,
    CASE WHEN len(words) > 0 THEN list_sum(list_transform(words, x -> length(x)))::DOUBLE / len(words) ELSE 0 END AS mean_word_len
  FROM f
)
SELECT lang, round(avg(punct_ratio), 4) AS avg_punct_ratio,
       round(avg(stopword_ratio), 4) AS avg_stopword_ratio,
       round(avg(mean_word_len), 4) AS avg_word_len
FROM g GROUP BY lang
"""


def q_doc_minhash_neardup(sf_dir: str) -> pd.DataFrame:
    """MinHash-LSH near-dup survivors. The local documents table arrives
    as ONE parquet block; repartition so the signature stage parallelizes
    (a real corpus read has many blocks and skips this)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"]).repartition(16)
    # the operator streams survivor rows; sorting/collection is the gate
    # query's job (a 100 TB run writes the Dataset straight to parquet)
    out = dedup.neardup_survivors(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# INDEPENDENT brute-force oracle: all-pairs char-5-shingle Jaccard (the
# same shingling domain as functions/hashing.char_shingle_hashes:
# lowercased, whitespace-collapsed) via an unnest self-join intersection,
# then connected components by a recursive transitive closure — this
# checks LSH recall AND the union-find, not just the aggregation
Q_DOC_MINHASH_NEARDUP_SQL = r"""
WITH RECURSIVE d AS (
  -- explicit ASCII lower: Python str.lower() and DuckDB lower()
  -- disagree on 44 codepoints (U+0130 ...) — see hashing._norm_ws
  SELECT doc_id, trim(regexp_replace(translate(coalesce(text, ''), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\s+', ' ', 'g'), ' ') AS t FROM documents
), sh AS (
  -- empty-normalized docs (all-whitespace text) have NO shingles, like
  -- char_shingles' empty set — a bare comprehension yields [''] and
  -- would pair every pair of such docs at jaccard 1.0 (lockstep-fuzz
  -- finding; the 1 <= len < 5 short-doc case matches without a guard:
  -- substr(t, 1, 5) = t on both sides)
  SELECT doc_id,
    CASE WHEN t = '' THEN []
         ELSE list_distinct([substr(t, i, 5) for i in range(1, greatest(length(t) - 3, 2))])
    END AS s FROM d
), sizes AS (
  SELECT doc_id, len(s) AS l FROM sh
), ex AS (
  SELECT doc_id, unnest(s) AS g FROM sh
), inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n
  FROM ex x JOIN ex y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2
), e AS (
  SELECT a, b FROM inter
  JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
  WHERE n::DOUBLE / (sa.l + sb.l - n) >= 0.6
), sym AS (
  SELECT a AS x, b AS y FROM e UNION SELECT b AS x, a AS y FROM e
), reach(x, y) AS (
  SELECT x, y FROM sym
  UNION
  SELECT r.x, s.y FROM reach r JOIN sym s ON r.y = s.x
), lbl AS (
  SELECT dd.doc_id,
         least(dd.doc_id, coalesce((SELECT min(r.y) FROM reach r WHERE r.x = dd.doc_id), dd.doc_id)) AS label
  FROM documents dd
)
SELECT label AS doc_id, count(*) AS group_size FROM lbl GROUP BY label ORDER BY doc_id
"""


def q_doc_simhash_pairs(sf_dir: str) -> pd.DataFrame:
    """SimHash near-dup pairs at Hamming <= 3. The per-doc simhash column
    is exported so the oracle can brute-force ALL Hamming-<=3 pairs in
    SQL — checking the 4x16-bit band guarantee end to end."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    sh = ds.map_batches(textops.doc_simhash, batch_format="pyarrow").materialize()
    _export_table(sf_dir, "doc_simhash", pa.Table.from_pandas(sh.to_pandas(), preserve_index=False))
    out = dedup.simhash_candidate_pairs(sh).to_pandas()
    return out.drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)


# mirrors the pipeline's FULL candidate semantics including the hot-
# bucket guard: candidates must share an ELIGIBLE 16-bit band bucket
# (2..256 members — oversized buckets are mass-duplicate noise and are
# skipped on both sides), then brute-force Hamming <= 3
Q_DOC_SIMHASH_PAIRS_SQL = f"""
WITH s AS (SELECT doc_id, simhash FROM read_parquet('{_EXP}/doc_simhash.parquet')),
bands AS (SELECT unnest([0, 1, 2, 3]) AS band),
b AS (
  SELECT doc_id, simhash, band, (simhash >> (band * 16)) & 65535 AS key FROM s CROSS JOIN bands
), elig AS (
  SELECT band, key FROM b GROUP BY band, key HAVING count(*) BETWEEN 2 AND 256
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM b x JOIN b y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
  JOIN elig e ON e.band = x.band AND e.key = x.key
)
SELECT cand.a, cand.b, bit_count(xor(sa.simhash, sb.simhash))::BIGINT AS hamming
FROM cand JOIN s sa ON sa.doc_id = cand.a JOIN s sb ON sb.doc_id = cand.b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
ORDER BY cand.a, cand.b
"""


def q_doc_fingerprint_overlap(sf_dir: str) -> pd.DataFrame:
    """Docs sharing rolling-hash fingerprints: groupby(fingerprint) ->
    cross-doc pair counts. Copy-detection shape. The (doc_id,
    fingerprint) explosion is exported; the oracle re-derives bucket
    capping, pair extraction and the shared-count filter in SQL."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    fps = ds.map_batches(textops.doc_fingerprints, batch_format="pyarrow").materialize()
    _export_table(sf_dir, "doc_fingerprints", pa.Table.from_pandas(fps.to_pandas(), preserve_index=False))

    def add_bucket(b: pa.Table) -> pa.Table:
        # coarse shuffle key: a few hundred groups, inner pandas groupby per
        # fingerprint (per-fingerprint Ray groups would be millions of tiny
        # groups — per-group overhead dominates)
        return b.append_column(
            "fp_bucket", pc.cast(pc.bit_wise_and(b["fingerprint"], pa.scalar(255, pa.uint64())), pa.int32())
        )

    # numpy over the sorted fingerprint runs inside each coarse bucket
    # (one frame per GROUP — never a pandas groupby loop emitting a frame
    # per fingerprint); fingerprints shared by many docs are vocabulary-
    # level noise, not copied passages, so the run cap stays low (16)
    pairs = (
        fps.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("fp_bucket")
        .map_groups(
            lambda df: dedup._pairs_within_band(df, "doc_id", "fingerprint", 16),
            batch_format="pandas",
        )
    )

    # shared-count per pair: coarse hash(a)%16 buckets + ONE inner pandas
    # groupby per bucket — a native Ray aggregate here means tens of
    # thousands of tiny groups (the per-group overhead dominates; same
    # lesson as the band-pair kernels). A pair's rows share a bucket by
    # construction (keyed on a).
    def add_pair_bucket(b: pa.Table) -> pa.Table:
        import numpy as np

        a = b["a"].to_numpy(zero_copy_only=False)
        return b.append_column("_pb", pa.array((np.abs(a) % 16).astype(np.int32)))

    def count_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["a", "b"], as_index=False).size().rename(columns={"size": "n_shared"})
        return g[g["n_shared"] >= 5]

    out = (
        pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(count_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = out.astype({"a": "int64", "b": "int64", "n_shared": "int64"})
    return out.sort_values(["a", "b"]).reset_index(drop=True)


Q_DOC_FINGERPRINT_OVERLAP_SQL = f"""
WITH fp AS (
  SELECT DISTINCT doc_id, fingerprint FROM read_parquet('{_EXP}/doc_fingerprints.parquet')
), ok AS (
  SELECT fingerprint FROM fp GROUP BY fingerprint HAVING count(*) BETWEEN 2 AND 16
), p AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
  WHERE a.fingerprint IN (SELECT fingerprint FROM ok)
)
SELECT a, b, count(*) AS n_shared FROM p GROUP BY a, b HAVING count(*) >= 5
"""


def q_doc_ngram_jaccard(sf_dir: str) -> pd.DataFrame:
    """Word-3-gram Jaccard >= 0.5 pairs via LSH blocking."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"]).repartition(16)
    cands = dedup.minhash_candidate_pairs(ds, shingle_k=5)
    out = dedup.verify_pairs_jaccard(cands, ds, threshold=0.5, use_ngrams=True).to_pandas()
    return out.drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)


# independent brute-force word-3-gram Jaccard (unnest join intersection)
Q_DOC_NGRAM_JACCARD_SQL = r"""
WITH d AS (
  SELECT doc_id, string_split(trim(regexp_replace(translate(coalesce(text, ''), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\s+', ' ', 'g'), ' '), ' ') AS w FROM documents
), sh AS (
  -- short-doc convention mirrors word_ngram_hashes: 0 words -> empty
  -- set, 1-2 words -> ONE gram (the whole text; the kernel's fold-hash
  -- of all words) — a bare comprehension would yield [NULL] ->
  -- list_distinct [] and two identical 2-word docs would never pair
  SELECT doc_id,
    CASE WHEN len(w) = 1 AND w[1] = '' THEN []
         WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
         ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
    END AS s FROM d
), sizes AS (
  SELECT doc_id, len(s) AS l FROM sh
), ex AS (
  SELECT doc_id, unnest(s) AS g FROM sh
), inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n
  FROM ex x JOIN ex y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b, round(n::DOUBLE / (sa.l + sb.l - n), 6) AS jaccard_sim
FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
WHERE n::DOUBLE / (sa.l + sb.l - n) >= 0.5
ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# Embeddings: similarity search + near-dup
# ---------------------------------------------------------------------------


def _query_vecs(sf_dir: str, n: int = 3) -> np.ndarray:
    t = pq.read_table(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(n)
    return np.array(df["embedding"].tolist(), dtype=np.float64)


def q_ann_topk(sf_dir: str) -> pd.DataFrame:
    """Exact brute-force cosine top-10 for 3 fixed query vectors."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ann.brute_force_topk(ds, _query_vecs(sf_dir), k=10).to_pandas()
    return out.astype({"query_id": "int32", "vec_id": "int64"})


Q_ANN_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding FROM embeddings
  ORDER BY vec_id LIMIT 3
), scored AS (
  SELECT q.query_id::INTEGER AS query_id, e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS cos_sim,
         row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC, e.vec_id
         ) AS rn
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, cos_sim FROM scored WHERE rn <= 10
"""


def q_embedding_neardup(sf_dir: str) -> pd.DataFrame:
    """All cosine >= 0.4 pairs, brute-force (SQL-checkable self-join)."""
    t = pq.read_table(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    ds = ray.data.from_arrow(t)
    vecs = vec_matrix(t["embedding"], dtype=np.float32)
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    return dedup.embedding_neardup_pairs(ds, vecs, ids, threshold=0.4).to_pandas()


Q_EMBEDDING_NEARDUP_SQL = """
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
"""


def q_embedding_neardup_lsh(sf_dir: str) -> pd.DataFrame:
    """Sign-LSH bucketed near-dup (the scale path; recall < 1, rows-only)."""
    t = pq.read_table(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    dim = len(t["embedding"][0])
    ds = ray.data.from_arrow(t)
    out = dedup.embedding_neardup_pairs_lsh(
        ds, dim=dim, threshold=0.4, num_planes=4, num_tables=16
    ).to_pandas()
    return out.drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)


def q_ann_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF-bucketed approximate top-k (rows-only; recall measured in tests)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ann.ivf_topk(ds, _query_vecs(sf_dir), k=10).to_pandas()
    return out.astype({"query_id": "int32", "vec_id": "int64"})


# ---------------------------------------------------------------------------
# KG pipeline (synthetic transcripts; rows-only — semantics live in the
# in-repo oracle, tested by pytest)
# ---------------------------------------------------------------------------


_TRIPLES_CACHE: dict[str, object] = {}


def kg_triples(sf_dir: str):
    """Flagship pipeline output; materialized once per tier per process —
    several kg_* queries consume the same triples, and the driver runs
    them all in one session. VALUE-CHECKED via export-backed oracle:
    the non-SQL halves (mention detection, hybrid linking,
    canonicalization) are exported as the per-turn mention stream + the
    unique-surface linkmap (both computed through the PURE kernels, no
    Ray execution), and KG_TRIPLES_SQL independently re-derives the
    FULL triple set — entity dedup, mention pairs, uses_tool,
    replies_to adjacency, literal attachment, qualified hierarchy,
    exact dedup — in DuckDB over those exports. Any distribution bug in
    the Ray path (sharding, shuffle, dictionary fast paths, assembly
    kernels) therefore fails the hash compare."""
    from .kg import build_kg_from_dir

    tier = tier_for_sf_dir(sf_dir)
    ds = _TRIPLES_CACHE.get(tier)
    if ds is None:
        data_dir = ensure_tier(tier)
        ds = build_kg_from_dir(data_dir).materialize()
        if tier == "correctness":
            # make the triple table visible to the export-based kg_*
            # oracles (downstream stats/joins re-derived in SQL)
            _export_table(sf_dir, "kg_triples", pa.Table.from_pandas(ds.to_pandas(), preserve_index=False))
            _export_kg_stream_and_linkmap(sf_dir, data_dir)
        _TRIPLES_CACHE.clear()
        _TRIPLES_CACHE[tier] = ds
    return ds


def _export_kg_stream_and_linkmap(sf_dir: str, data_dir: str) -> None:
    """Export the two non-SQL intermediates the kg_triples oracle needs:
    the per-turn mention stream and the unique-surface linkmap. Both are
    produced by the PURE kernels directly (extract_mention_rows over the
    files in-driver is Ray Data too, but single-pass; linking via
    EntityIndex.link_many + canonical_mapping as in oracle/kg_oracle.py)
    so the SQL's re-derivation exercises the DISTRIBUTED execution."""
    from ..functions.linker_core import EntityIndex
    from ..sources.synth import load_catalog, transcript_files
    from ..stages.canonicalize import canonical_mapping
    from .kg import extract_mentions_ds

    stream = extract_mentions_ds(transcript_files(data_dir)).to_pandas()
    kind = stream["kind_code"].to_numpy()
    surf = stream["mention"].to_numpy()
    keys = sorted(
        set(surf[kind == 0])
        | {s.split(".", 1)[0] for s in surf[kind <= -2]}
    )
    catalog = load_catalog(data_dir)
    index = EntityIndex(catalog.to_pylist())
    mapping = canonical_mapping(catalog.to_pylist())
    ents = [
        (mapping.get(r.entity_id, r.entity_id) if r else None)
        for r in index.link_many(keys)
    ]
    _export_table(
        sf_dir, "kg_mention_stream", pa.Table.from_pandas(stream, preserve_index=False)
    )
    _export_table(
        sf_dir,
        "kg_linkmap",
        pa.table({"k": pa.array(keys, pa.string()), "ent": pa.array(ents, pa.string())}),
    )


def _kg_predmap_values() -> str:
    """(kind_code, pred) VALUES list for the kg_triples oracle, from the
    same registry plan the pipeline captures (literal family i -> code
    i+1, qualified family i -> code -2-i; stages/extract.py:45)."""
    from ..stages.extract import family_plan

    _ents, lit_specs, qual_specs = family_plan()
    pairs = [(i + 1, p) for i, (_n, p) in enumerate(lit_specs)]
    pairs += [(-2 - i, p) for i, (_n, p) in enumerate(qual_specs)]
    # the registry fail-fasts PREDs to [a-z][a-z0-9_]* already; the
    # quote-doubling is belt-and-braces for the SQL literal
    return ", ".join("({}, '{}')".format(k, p.replace("'", "''")) for k, p in pairs)


# Independent SQL re-derivation of the FULL triple set from the exported
# mention stream + linkmap: keep-first entity dedup per turn, ordered
# mention pairs, uses_tool on non-empty tool, replies_to on ADJACENT
# turns, literal attachment to the turn's first entity, qualified
# root.tail hierarchy, exact dedup on the whole row. Mirrors the rules in
# pipelines/kg.py assembly kernels (and reference deps/extractor.py
# dedup-key shape) without sharing any of their code.
KG_TRIPLES_SQL = f"""
WITH ms AS (
  SELECT * FROM read_parquet('{_EXP}/kg_mention_stream.parquet')
), lm AS (
  SELECT k, ent FROM read_parquet('{_EXP}/kg_linkmap.parquet')
), rl AS (
  SELECT m.conv_id, m.turn_idx, m.mention_ord, m.kind_code, m.mention, m.tool,
         CASE WHEN m.kind_code = 0 THEN l0.ent
              WHEN m.kind_code <= -2 THEN lr.ent END AS ent,
         CASE WHEN m.kind_code <= -2
              THEN substr(m.mention, strpos(m.mention, '.') + 1) END AS tail
  FROM ms m
  LEFT JOIN lm l0 ON m.kind_code = 0 AND l0.k = m.mention
  LEFT JOIN lm lr ON m.kind_code <= -2 AND lr.k = split_part(m.mention, '.', 1)
), ded AS (
  SELECT conv_id, turn_idx, ent, min(tool) AS tool, min(mention_ord) AS ord0
  FROM rl WHERE ent IS NOT NULL AND (kind_code = 0 OR kind_code <= -2)
  GROUP BY conv_id, turn_idx, ent
), rk AS (
  -- ent tiebreak: ord0 is unique per turn under the (conv_id, turn_idx)
  -- row-uniqueness input contract, but every sort gets a total order
  -- anyway (CLAUDE.md invariant)
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY ord0, ent) AS r
  FROM ded
), firsts AS (
  SELECT conv_id, turn_idx, ent FROM rk WHERE r = 1
), predmap AS (
  SELECT * FROM (VALUES {{predmap}}) AS t(kind, pred)
), pairs AS (
  SELECT a.ent AS subj, 'mentions' AS pred, b.ent AS obj, a.conv_id, a.turn_idx
  FROM rk a JOIN rk b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx AND a.r < b.r
), uses AS (
  -- mirror of the assembly spec (tool != ''): a NULL tool KEEPS the
  -- row with a null obj (unreachable post-normalize, but the kernels
  -- are pinned to it — the oracle must not diverge on that edge)
  SELECT ent AS subj, 'uses_tool' AS pred, tool AS obj, conv_id, turn_idx
  FROM rk WHERE tool IS NULL OR tool <> ''
), rep AS (
  SELECT f.ent AS subj, 'replies_to' AS pred, p.ent AS obj, f.conv_id, f.turn_idx
  FROM firsts f JOIN firsts p
    ON f.conv_id = p.conv_id AND p.turn_idx = f.turn_idx - 1
), lits AS (
  SELECT f.ent AS subj, pm.pred, rl.mention AS obj, rl.conv_id, rl.turn_idx
  FROM rl
  JOIN firsts f ON f.conv_id = rl.conv_id AND f.turn_idx = rl.turn_idx
  JOIN predmap pm ON pm.kind = rl.kind_code
  WHERE rl.kind_code > 0
), quals AS (
  SELECT rl.ent AS subj, pm.pred, rl.tail AS obj, rl.conv_id, rl.turn_idx
  FROM rl JOIN predmap pm ON pm.kind = rl.kind_code
  WHERE rl.kind_code <= -2 AND rl.ent IS NOT NULL
)
SELECT DISTINCT subj, pred, obj, conv_id, turn_idx FROM (
  SELECT * FROM pairs
  UNION ALL SELECT * FROM uses
  UNION ALL SELECT * FROM rep
  UNION ALL SELECT * FROM lits
  UNION ALL SELECT * FROM quals
)
""".replace("{predmap}", _kg_predmap_values())


def kg_triples_by_pred(sf_dir: str) -> pd.DataFrame:
    from .stats import triples_by_pred

    return triples_by_pred(kg_triples(sf_dir)).to_pandas()


KG_TRIPLES_BY_PRED_SQL = f"""
SELECT pred, count(*) AS n_triples
FROM read_parquet('{_EXP}/kg_triples.parquet') GROUP BY pred
"""


def kg_top_entities(sf_dir: str) -> pd.DataFrame:
    from .stats import top_entities

    return top_entities(kg_triples(sf_dir), k=10).to_pandas()


KG_TOP_ENTITIES_SQL = f"""
SELECT subj, count(*) AS n_triples
FROM read_parquet('{_EXP}/kg_triples.parquet')
GROUP BY subj ORDER BY n_triples DESC, subj LIMIT 10
"""


def kg_qa_summary(sf_dir: str) -> pd.DataFrame:
    from .kg import normalized_turns_ds
    from .stats import qa_summary

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    return qa_summary(normalized_turns_ds(data_dir)).to_pandas()


# replays the mention-EXISTENCE rule (functions/mentions.py) word-for-word
# in SQL lambdas: snake / camel(>=6, starts lower, lc->UC) / Pascal(>=8) /
# adjacent-capitalized bigram over the same [A-Za-z0-9_]+ word split
KG_QA_SUMMARY_SQL = f"""
WITH t AS (
  SELECT text, regexp_extract_all(coalesce(text, ''), '[A-Za-z0-9_]+') AS words
  FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet')
), f AS (
  SELECT CASE
    WHEN text IS NULL OR text = '' THEN 'empty_text'
    WHEN len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z0-9]+_[a-zA-Z0-9]+'))) > 0
      OR len(list_filter(words, w -> length(w) >= 6 AND regexp_matches(w, '^[a-z]') AND regexp_matches(w, '[a-z][A-Z]'))) > 0
      OR len(list_filter(words, w -> length(w) >= 8 AND regexp_matches(w, '[A-Z][a-z]+[A-Z]'))) > 0
      OR len(list_filter([i for i in range(1, greatest(len(words), 2))], i -> i < len(words) AND regexp_matches(words[i], '^[A-Z][a-z]+$') AND regexp_matches(words[i + 1], '^[A-Z][a-z]+$'))) > 0
    THEN 'ok_mentions' ELSE 'no_mentions' END AS qa_status
  FROM t
)
SELECT qa_status, count(*) AS n_turns FROM f GROUP BY qa_status
"""


def kg_analyze(sf_dir: str) -> pd.DataFrame:
    """Index-health report over the built KG (reference analog: the
    index-analysis layer, search/analyze.py coverage/diagnostics). One
    tall (section, key, n, share) table: per-pred triple counts, per-
    family mention yield, linked/unlinked rate over linkable surfaces,
    and turn coverage — every section re-derived independently in SQL
    over the same exports the kg_triples oracle uses."""
    from .analyze import kg_index_health

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    triples = kg_triples(sf_dir)  # cached; exports stream+linkmap at gate tier
    return kg_index_health(data_dir, triples)


def _kg_fammap_values() -> str:
    from .analyze import _family_name_map

    return ", ".join(f"({k}, '{n}')" for k, n in _family_name_map().items())


KG_ANALYZE_SQL = f"""
WITH tr AS (
  SELECT * FROM read_parquet('{_EXP}/kg_triples.parquet')
), ms AS (
  SELECT * FROM read_parquet('{_EXP}/kg_mention_stream.parquet')
), lm AS (
  SELECT k, ent FROM read_parquet('{_EXP}/kg_linkmap.parquet')
), fam AS (
  SELECT * FROM (VALUES {{fammap}}) AS t(kind, name)
), linkrows AS (
  SELECT m.conv_id, m.turn_idx,
         CASE WHEN l.ent IS NOT NULL THEN 1 ELSE 0 END AS is_linked
  FROM ms m
  LEFT JOIN lm l
    ON l.k = CASE WHEN m.kind_code <= -2
                  THEN split_part(m.mention, '.', 1) ELSE m.mention END
  WHERE m.kind_code = 0 OR m.kind_code <= -2
), base AS (
  SELECT 'pred' AS section, pred AS "key", count(*)::BIGINT AS n
  FROM tr GROUP BY pred
  UNION ALL
  SELECT 'family', f.name, count(*)::BIGINT
  FROM ms m JOIN fam f ON f.kind = m.kind_code GROUP BY f.name
  UNION ALL
  SELECT 'link', 'linked', coalesce(sum(is_linked), 0)::BIGINT FROM linkrows
  UNION ALL
  SELECT 'link', 'unlinked', coalesce(sum(1 - is_linked), 0)::BIGINT FROM linkrows
  UNION ALL
  SELECT 'turns', 'with_entities', count(*)::BIGINT FROM (
    SELECT DISTINCT conv_id, turn_idx FROM linkrows WHERE is_linked = 1
  )
  UNION ALL
  SELECT 'turns', 'without_entities',
         (SELECT count(*) FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet'))::BIGINT
         - (SELECT count(*) FROM (
              SELECT DISTINCT conv_id, turn_idx FROM linkrows WHERE is_linked = 1
            ))::BIGINT
)
SELECT section, "key", n,
       coalesce(round(n / nullif(sum(n) OVER (PARTITION BY section), 0), 6), 0.0) AS share
FROM base
""".replace("{fammap}", _kg_fammap_values())


def q_turn_symbols(sf_dir: str) -> pd.DataFrame:
    """Parser-grade symbol metadata over transcript turns (reference
    extract_symbol_metadata surface, indexer/symbols.py:423-483 — first
    symbol per chunk with type / qualified name / signature; scanner
    pinned by the reference's ported goldens in tests/test_symbols.py).
    Grouped by symbol_type with distinct-name counts; the per-turn
    metadata is exported and the SQL re-derives the grouping (export
    pattern: extraction is not SQL, the distributed grouping is)."""
    from ..sources.synth import transcript_files
    from ..stages.symbols import symbol_metadata_batch

    tier = tier_for_sf_dir(sf_dir)
    data_dir = ensure_tier(tier)
    ds = ray.data.read_parquet(
        transcript_files(data_dir), columns=["conv_id", "turn_idx", "text"]
    )
    ds = ds.map_batches(
        lambda b: symbol_metadata_batch(b, "text"), batch_format="pyarrow"
    )
    ds = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b["symbol_type"])).select(
            ["conv_id", "turn_idx", "symbol_type", "symbol_name"]
        ),
        batch_format="pyarrow",
    )
    # the filtered metadata is consumed three times (export + two
    # groupbys); pin the small result instead of re-running the
    # pure-Python scanner pass per consumption
    ds = ds.materialize()
    if tier == "correctness":
        _export_table(
            sf_dir,
            "turn_symbols",
            pa.Table.from_pandas(ds.to_pandas(), preserve_index=False),
        )
    from ray.data.aggregate import Count as _Count

    n = ds.groupby("symbol_type").aggregate(_Count(alias_name="n_rows")).to_pandas()
    names = (
        ds.groupby(["symbol_type", "symbol_name"]).aggregate(_Count(alias_name="_n"))
        .groupby("symbol_type").aggregate(_Count(alias_name="n_names")).to_pandas()
    )
    out = n.merge(names, on="symbol_type")
    out = out.astype({"n_rows": "int64", "n_names": "int64"})
    return out.sort_values("symbol_type", kind="mergesort").reset_index(drop=True)


Q_TURN_SYMBOLS_SQL = f"""
SELECT symbol_type, count(*)::BIGINT AS n_rows,
       count(DISTINCT symbol_name)::BIGINT AS n_names
FROM read_parquet('{_EXP}/turn_symbols.parquet')
GROUP BY symbol_type
"""


def kg_normalized_turns(sf_dir: str):
    """M0 slice over synthetic transcripts. The oracle replays the full
    normalization (role fold + whitelist, tool fold + none-collapse,
    turn_uid derivation) in SQL over the same deterministic synth files —
    full-table value-hash including every text byte."""
    from .kg import normalized_turns_ds

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    return normalized_turns_ds(data_dir)


KG_NORMALIZED_TURNS_SQL = f"""
SELECT conv_id, turn_idx,
       -- explicit ASCII trim set + 26-char translate: DuckDB's default
       -- trim strips Zs spaces (NBSP) but not tab/newline, and lower()
       -- lags Arrow on 43 newer-Unicode letters (round-5 finding)
       CASE WHEN translate(trim(role, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') IN ('user','assistant','tool','system')
            THEN translate(trim(role, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') ELSE 'other' END AS role,
       text,
       CASE WHEN tool IS NULL THEN ''
            WHEN translate(trim(tool, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') = 'none' THEN ''
            ELSE translate(trim(tool, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') END AS tool,
       ts,
       conv_id || '#' || turn_idx AS turn_uid
FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet')
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# name -> (callable, oracle_sql | None)
REGISTRY: dict[str, tuple] = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q_revenue_by_segment": (q_revenue_by_segment, Q_REVENUE_BY_SEGMENT_SQL),
    "q_nation_customers": (q_nation_customers, Q_NATION_CUSTOMERS_SQL),
    "q_orders_by_priority": (q_orders_by_priority, Q_ORDERS_BY_PRIORITY_SQL),
    "q_top_orders": (q_top_orders, Q_TOP_ORDERS_SQL),
    "q_part_revenue_by_brand": (q_part_revenue_by_brand, Q_PART_REVENUE_SQL),
    "q_distinct_priorities": (q_distinct_priorities, Q_DISTINCT_PRIORITIES_SQL),
    "q_supplier_balance": (q_supplier_balance, Q_SUPPLIER_BALANCE_SQL),
    "q_top_orders_per_segment": (q_top_orders_per_segment, Q_TOP_ORDERS_PER_SEGMENT_SQL),
    "q_lineitem_bloom_semi_join": (q_lineitem_bloom_semi_join, Q_LINEITEM_BLOOM_SEMI_JOIN_SQL),
    "q_events_hll_users": (q_events_hll_users, None),
    "q_events_heavy_hitters": (q_events_heavy_hitters, Q_EVENTS_HEAVY_HITTERS_SQL),
    "q_order_price_quantiles": (q_order_price_quantiles, Q_ORDER_PRICE_QUANTILES_SQL),
    "q_events_tumbling": (q_events_tumbling, Q_EVENTS_TUMBLING_SQL),
    "q_events_user_stats": (q_events_user_stats, Q_EVENTS_USER_STATS_SQL),
    "q_events_sessions": (q_events_sessions, Q_EVENTS_SESSIONS_SQL),
    "q_events_asof": (q_events_asof, Q_EVENTS_ASOF_SQL),
    "q_doc_stats": (q_doc_stats, Q_DOC_STATS_SQL),
    "q_doc_splits": (q_doc_splits, Q_DOC_SPLITS_SQL),
    "q_doc_packing": (q_doc_packing, Q_DOC_PACKING_SQL),
    "q_doc_unigram_lm": (q_doc_unigram_lm, Q_DOC_UNIGRAM_LM_SQL),
    "q_doc_exact_dedup": (q_doc_exact_dedup, Q_DOC_EXACT_DEDUP_SQL),
    "q_doc_langid": (q_doc_langid, Q_DOC_LANGID_SQL),
    "q_doc_quality": (q_doc_quality, Q_DOC_QUALITY_SQL),
    "q_doc_minhash_neardup": (q_doc_minhash_neardup, Q_DOC_MINHASH_NEARDUP_SQL),
    "q_doc_simhash_pairs": (q_doc_simhash_pairs, Q_DOC_SIMHASH_PAIRS_SQL),
    "q_doc_fingerprint_overlap": (q_doc_fingerprint_overlap, Q_DOC_FINGERPRINT_OVERLAP_SQL),
    "q_doc_ngram_jaccard": (q_doc_ngram_jaccard, Q_DOC_NGRAM_JACCARD_SQL),
    "q_ann_topk": (q_ann_topk, Q_ANN_TOPK_SQL),
    "q_ann_ivf": (q_ann_ivf, None),
    "q_embedding_neardup": (q_embedding_neardup, Q_EMBEDDING_NEARDUP_SQL),
    "q_embedding_neardup_lsh": (q_embedding_neardup_lsh, None),
    "kg_triples": (kg_triples, KG_TRIPLES_SQL),
    "kg_analyze": (kg_analyze, KG_ANALYZE_SQL),
    "q_turn_symbols": (q_turn_symbols, Q_TURN_SYMBOLS_SQL),
    "kg_triples_by_pred": (kg_triples_by_pred, KG_TRIPLES_BY_PRED_SQL),
    "kg_top_entities": (kg_top_entities, KG_TOP_ENTITIES_SQL),
    "kg_qa_summary": (kg_qa_summary, KG_QA_SUMMARY_SQL),
    "kg_normalized_turns": (kg_normalized_turns, KG_NORMALIZED_TURNS_SQL),
}


# ---------------------------------------------------------------------------
# Graph traversal, provenance join, search, encoder, multimodal (rows-only)
# ---------------------------------------------------------------------------


def kg_impact(sf_dir: str) -> pd.DataFrame:
    """Reverse BFS (impact) from the top-3 subjects over mention edges —
    the reference's get_impact/get_batch_impact shape (deps/query.py:
    246-421): depth<=5, shared visited set."""
    from ..stages.graph import bfs_distributed
    from .stats import top_entities

    triples = kg_triples(sf_dir)
    edges = triples.filter(expr="pred == 'mentions'").materialize()
    roots = top_entities(edges, k=3).to_pandas()["subj"].tolist()
    return bfs_distributed(edges, roots, max_depth=5, reverse=True)


def kg_tree(sf_dir: str) -> pd.DataFrame:
    """Forward BFS (dependency-tree shape) from the top-3 subjects."""
    from ..stages.graph import bfs_distributed
    from .stats import top_entities

    triples = kg_triples(sf_dir)
    edges = triples.filter(expr="pred == 'mentions'").materialize()
    roots = top_entities(edges, k=3).to_pandas()["subj"].tolist()
    return bfs_distributed(edges, roots, max_depth=5, reverse=False)


def kg_top_objects(sf_dir: str) -> pd.DataFrame:
    """Object-side top-10 (stats parity with get_dep_stats_detailed's
    top target files)."""
    from .stats import top_objects

    return top_objects(kg_triples(sf_dir), k=10).to_pandas()


KG_TOP_OBJECTS_SQL = f"""
SELECT obj, count(*) AS n_triples
FROM read_parquet('{_EXP}/kg_triples.parquet')
GROUP BY obj ORDER BY n_triples DESC, obj LIMIT 10
"""


def kg_pred_detailed(sf_dir: str) -> pd.DataFrame:
    """Per-pred detailed stats: totals + distinct subject/object counts."""
    from .stats import pred_detailed

    return pred_detailed(kg_triples(sf_dir))


KG_PRED_DETAILED_SQL = f"""
SELECT pred, count(*) AS n_triples,
       count(DISTINCT subj) AS n_subjects,
       count(DISTINCT obj) AS n_objects
FROM read_parquet('{_EXP}/kg_triples.parquet') GROUP BY pred
"""


def kg_context_window(sf_dir: str) -> pd.DataFrame:
    """+-1-turn window expansion coverage per (pred, offset): how many
    (triple, offset) probes found a turn (bounded join against turn
    ranges — the reference's capped context expansion re-expressed)."""
    from .kg import triples_with_window_context

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    joined = triples_with_window_context(kg_triples(sf_dir), data_dir, window=1)

    def flag(b: pa.Table) -> pa.Table:
        has = pc.cast(pc.is_valid(b["ctx_text"]), pa.int64())
        return pa.table({"pred": b["pred"], "ctx_off": b["ctx_off"], "has_text": has})

    out = (
        joined.map_batches(flag, batch_format="pyarrow")
        .groupby(["pred", "ctx_off"])
        .aggregate(Count(alias_name="n_rows"), Sum("has_text", alias_name="n_with_text"))
        .to_pandas()
    )
    return out.astype({"ctx_off": "int64", "n_rows": "int64", "n_with_text": "int64"})


KG_CONTEXT_WINDOW_SQL = f"""
WITH offs AS (SELECT unnest([-1, 0, 1]) AS ctx_off),
t AS (SELECT pred, conv_id, turn_idx FROM read_parquet('{_EXP}/kg_triples.parquet')),
x AS (SELECT t.pred, o.ctx_off, t.conv_id, t.turn_idx + o.ctx_off AS ct FROM t CROSS JOIN offs o)
SELECT x.pred, x.ctx_off, count(*) AS n_rows,
       sum(CASE WHEN u.text IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_with_text
FROM x LEFT JOIN read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet') u
  ON x.conv_id = u.conv_id AND x.ct = u.turn_idx
GROUP BY x.pred, x.ctx_off
"""


def kg_pagerank(sf_dir: str) -> pd.DataFrame:
    """Top-20 PageRank over the mentions graph (3 iterations, d=0.85):
    the iterative-algorithm shape — per-iteration broadcast of the small
    rank vector + one pre-aggregated pass over the edge stream. Oracle:
    the same three iterations unrolled as chained CTEs over the triple
    export."""
    from ..stages.graph import pagerank

    triples = kg_triples(sf_dir)
    edges = triples.filter(expr="pred == 'mentions'")
    out = pagerank(edges, iterations=3, damping=0.85)
    # round BEFORE the top-20 cut (both sides) so a mathematically tied
    # pair at the boundary cannot flip on last-bit summation order
    out = _round_half_away(out, ["rank"], 8)
    out = out.sort_values(["rank", "entity"], ascending=[False, True], kind="mergesort")
    return out.head(20).reset_index(drop=True)


def _pagerank_iter_sql(prev: str, cur: str) -> str:
    return f""", {cur} AS (
  SELECT n.x,
         0.15 / (SELECT count(*) FROM nodes) +
         0.85 * coalesce(sum({prev}.r / deg.d), 0) AS r
  FROM nodes n
  LEFT JOIN e ON e.obj = n.x
  LEFT JOIN {prev} ON {prev}.x = e.subj
  LEFT JOIN deg ON deg.subj = e.subj
  GROUP BY n.x
)"""


KG_PAGERANK_SQL = (
    f"""
WITH e AS (SELECT subj, obj FROM read_parquet('{_EXP}/kg_triples.parquet') WHERE pred = 'mentions'),
nodes AS (SELECT DISTINCT x FROM (SELECT subj AS x FROM e UNION SELECT obj AS x FROM e)),
deg AS (SELECT subj, count(*) AS d FROM e GROUP BY subj),
r0 AS (SELECT x, 1.0 / (SELECT count(*) FROM nodes) AS r FROM nodes)"""
    + _pagerank_iter_sql("r0", "r1")
    + _pagerank_iter_sql("r1", "r2")
    + _pagerank_iter_sql("r2", "r3")
    + """
SELECT x AS entity, round(r, 8) AS rank FROM r3
ORDER BY round(r, 8) DESC, x LIMIT 20
"""
)


def kg_pmi_pairs(sf_dir: str) -> pd.DataFrame:
    """Top-20 entity pairs by pointwise mutual information over the
    co-mention graph (min pair count 5): PMI = ln(N * c(a,b) /
    (c_subj(a) * c_obj(b))) — grouped counts + two broadcast marginal
    joins; ranks rounded BEFORE the cut on both sides (same tie
    discipline as kg_pagerank)."""
    triples = kg_triples(sf_dir)
    edges = triples.filter(expr="pred == 'mentions'").select_columns(["subj", "obj"])
    # pair counts stay a Dataset; the driver only ever sees the O(entity)
    # marginals and the count-thresholded qualifying pairs — never the
    # full catalog^2 pair table (VERDICT r02 "what's wrong" #3)
    pair = edges.groupby(["subj", "obj"]).aggregate(Count(alias_name="c_ab")).materialize()
    n_total = int(pair.sum("c_ab"))
    c_subj = pair.groupby("subj").aggregate(Sum("c_ab", alias_name="c_a")).to_pandas()
    c_obj = pair.groupby("obj").aggregate(Sum("c_ab", alias_name="c_b")).to_pandas()
    m = pair.filter(expr="c_ab >= 5").to_pandas()
    m = m.merge(c_subj, on="subj").merge(c_obj, on="obj")
    m["pmi"] = np.log(n_total * m["c_ab"] / (m["c_a"] * m["c_b"]))
    m = _round_half_away(m, ["pmi"], 6)
    m = m.sort_values(["pmi", "subj", "obj"], ascending=[False, True, True], kind="mergesort")
    out = m.head(20)[["subj", "obj", "c_ab", "pmi"]].reset_index(drop=True)
    return out.astype({"c_ab": "int64"})


KG_PMI_PAIRS_SQL = f"""
WITH e AS (SELECT subj, obj FROM read_parquet('{_EXP}/kg_triples.parquet') WHERE pred = 'mentions'),
pair AS (SELECT subj, obj, count(*) AS c_ab FROM e GROUP BY subj, obj),
tot AS (SELECT sum(c_ab)::DOUBLE AS n FROM pair),
ca AS (SELECT subj, sum(c_ab) AS c_a FROM pair GROUP BY subj),
cb AS (SELECT obj, sum(c_ab) AS c_b FROM pair GROUP BY obj),
p AS (
  SELECT pair.subj, pair.obj, pair.c_ab,
         round(ln(tot.n * pair.c_ab / (ca.c_a * cb.c_b)), 6) AS pmi
  FROM pair JOIN ca ON ca.subj = pair.subj JOIN cb ON cb.obj = pair.obj
  CROSS JOIN tot
  WHERE pair.c_ab >= 5
)
SELECT subj, obj, c_ab, pmi FROM p
ORDER BY pmi DESC, subj, obj LIMIT 20
"""


def kg_literal_mentions(sf_dir: str) -> pd.DataFrame:
    """Literal-family extraction coverage (extractor registry breadth):
    mentions per literal kind over the synth transcripts; the oracle
    replays each family's extraction regex + per-turn dedupe in SQL."""
    from ..stages.extract import extract_mention_rows, family_plan
    from .kg import normalized_turns_ds

    ent_names, lit_specs, qual_specs = family_plan()  # captured in the driver
    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    ds = normalized_turns_ds(data_dir).map_batches(
        lambda b: extract_mention_rows(
            b, entity_names=ent_names, literal_specs=lit_specs, qualified_specs=qual_specs
        ),
        batch_format="pyarrow",
    )
    lit = ds.filter(expr="kind_code > 0")
    out = lit.groupby("kind_code").aggregate(Count(alias_name="n_mentions")).to_pandas()
    preds = {i + 1: p for i, (_n, p) in enumerate(lit_specs)}
    out["kind"] = out["kind_code"].map(preds)
    # two families may share a pred (md_links + md_refs are both
    # references_doc, the reference's doc_link kind): report per PRED
    out = out.groupby("kind", as_index=False)["n_mentions"].sum()
    return out[["kind", "n_mentions"]].astype({"n_mentions": "int64"})


# the md_code_paths known-extension list, rendered once for every SQL
# replay site (both engines consult the identical frozenset)
from ..extractors.md_code_paths import PATH_EXTENSIONS as _MCP_EXTS

_MCP_EXT_IN = ", ".join(f"'{e}'" for e in sorted(_MCP_EXTS))


KG_LITERAL_MENTIONS_SQL = f"""
WITH t AS (
  SELECT coalesce(text, '') AS text FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet')
), q AS (
  -- ONE combined alternation scanned left-to-right (same non-overlapping
  -- consumption as the pipeline regex — interleaved/nested quote+backtick
  -- delimiters match identically; ADVICE r02), delimiters stripped after
  SELECT len(list_distinct(list_transform(
    regexp_extract_all(text, '"[^"\n]{{2,60}}"|`[^`\n]{{1,60}}`'),
    x -> x[2:-2]
  ))) AS n FROM t
), u AS (
  SELECT len(list_distinct(regexp_extract_all(text, 'https?://[^\\s"''<>\\)\\]]+'))) AS n FROM t
), e AS (
  SELECT len(list_distinct(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))) AS n FROM t
), p AS (
  SELECT len(list_distinct(regexp_extract_all(text,
    '(?:^|[\\s(''"`])(/(?:[A-Za-z0-9._-]+/)+[A-Za-z0-9_-]+\\.[A-Za-z0-9]{{1,8}})', 1))) AS n FROM t
), v AS (
  SELECT len(list_distinct(regexp_extract_all(text,
    '\\bv?[0-9]+\\.[0-9]+\\.[0-9]+(?:-[0-9A-Za-z.]+)?\\b'))) AS n FROM t
), i AS (
  -- imports family: four single-capture statement rules, per-turn
  -- dedupe ACROSS rules == one list_distinct over the concatenation
  -- (counting is order-insensitive, so cross-rule position interleaving
  -- does not matter here)
  SELECT len(list_distinct(
    regexp_extract_all(text, '\\bfrom[ \t\r\n]+((?:\\.{{1,3}})?[A-Za-z_][A-Za-z0-9_]*(?:\\.[A-Za-z0-9_]+)*)[ \t\r\n]+import[ \t\r\n]', 1)
    || regexp_extract_all(text, '\\bimport[ \t\r\n]+([A-Za-z_][A-Za-z0-9_]*(?:\\.[A-Za-z0-9_]+)+)', 1)
    || regexp_extract_all(text, 'require\\([ \t\r\n]*[''"]([^''"]+)[''"][ \t\r\n]*\\)', 1)
    || regexp_extract_all(text, '\\bimport[ \t\r\n]+[A-Za-z0-9_{{}}, *\t\r\n]+[ \t\r\n]*from[ \t\r\n]+[''"]([^''"]+)[''"]', 1)
    || regexp_extract_all(text, '(?:^|[\r\n;])[ \t]*import[ \t\r\n]+([A-Za-z_][A-Za-z0-9_]*(?:\\.[A-Za-z0-9_]+)*)[ \t\r\n]+as[ \t\r\n]', 1)
  )) AS n FROM t
), goi AS (
  -- go_imports family: single-form (optional alias) + grouped blocks
  -- with line-anchored items; per-FAMILY distinct (keep-first), summed
  -- with the imports family below (both emit imports_module — the
  -- md + mdref shared-pred shape)
  SELECT len(list_distinct(
    regexp_extract_all(text, '\\bimport[ \t]+(?:[A-Za-z_.][A-Za-z0-9_]*[ \t]+)?"([^"\n]+)"', 1)
    || flatten(list_transform(
         regexp_extract_all(text, '\\bimport[ \t]*\\(([^)]*)\\)', 1),
         b -> regexp_extract_all(b, '(?m)(?:^|;)[ \t]*(?:[A-Za-z_.][A-Za-z0-9_]*[ \t]+)?"([^"\n]+)"', 1)
       ))
  )) AS n FROM t
), md AS (
  -- md_links family: inline targets (validated/cleaned per the
  -- reference's _validate_link_path: http/mailto/pure-anchor skipped,
  -- #fragment stripped) + verbatim wiki refs, distinct per turn AFTER
  -- cleaning like extract()
  SELECT len(list_distinct(
    list_filter(list_transform(
      list_filter(
        regexp_extract_all(text, '\\[[^\\]\n]{{1,80}}\\]\\(([^()\\[\\] \t\r\n]{{1,200}})\\)', 1),
        x -> NOT regexp_matches(x, '^(https?://|mailto:|#)')),
      x -> regexp_replace(x, '#.*', '')), x -> x != '')
    || list_filter(
      regexp_extract_all(text, '\\[\\[([^\\[\\]\n]{{1,80}})\\]\\]', 1),
      x -> NOT regexp_matches(x, '^https?://'))
  )) AS n FROM t
), img AS (
  -- images family: yaml image: keys + Dockerfile FROM lines; the
  -- tag-first alternation order matches the pipeline (leftmost-first
  -- in both Python re and RE2); cross-rule dedupe == one list_distinct
  SELECT len(list_distinct(
    regexp_extract_all(text, '\\bimage:[ \t]*([a-z0-9]+(?:[._-][a-z0-9]+)*(?:/[a-z0-9]+(?:[._-][a-z0-9]+)*)*:[A-Za-z0-9_][A-Za-z0-9._-]*|[a-z0-9]+(?:[._-][a-z0-9]+)*(?:/[a-z0-9]+(?:[._-][a-z0-9]+)*)+)', 1)
    || regexp_extract_all(text, '\\bFROM[ \t]+([a-z0-9]+(?:[._-][a-z0-9]+)*(?:/[a-z0-9]+(?:[._-][a-z0-9]+)*)*:[A-Za-z0-9_][A-Za-z0-9._-]*|[a-z0-9]+(?:[._-][a-z0-9]+)*(?:/[a-z0-9]+(?:[._-][a-z0-9]+)*)+)', 1)
  )) AS n FROM t
), ci AS (
  -- ci_uses family: external owner/repo@version + local ./workflow refs
  SELECT len(list_distinct(
    regexp_extract_all(text, '\\buses:[ \t]*[''"]?([A-Za-z0-9_][A-Za-z0-9_.-]*(?:/[A-Za-z0-9_.-]+)+@[A-Za-z0-9._/-]+)', 1)
    || regexp_extract_all(text, '\\buses:[ \t]*[''"]?(\\./[A-Za-z0-9._/-]+)', 1)
  )) AS n FROM t
), gl AS (
  -- gitlab_ci family: include / local / template config refs
  SELECT len(list_distinct(
    regexp_extract_all(text, '\\binclude:[ \t]*[''"]?([A-Za-z0-9_][A-Za-z0-9_./-]*\\.ya?ml)', 1)
    || regexp_extract_all(text, '\\blocal:[ \t]*[''"]?(/?[A-Za-z0-9_][A-Za-z0-9_./-]*\\.ya?ml)', 1)
    || regexp_extract_all(text, '\\btemplate:[ \t]*[''"]?([A-Za-z0-9_][A-Za-z0-9_./-]*\\.ya?ml)', 1)
  )) AS n FROM t
), ex AS (
  -- ci_extends family: extends: .hidden-template inheritance refs
  SELECT len(list_distinct(
    regexp_extract_all(text, '\\bextends:[ \t]*[''"]?(\\.[A-Za-z0-9_-]+)', 1)
  )) AS n FROM t
), hm AS (
  -- helm_tpl family: {{{{ include/template "name" }}}} refs
  SELECT len(list_distinct(
    regexp_extract_all(text, '\\{{\\{{-?[ \t]*include[ \t]+"([^"\n]+)"', 1)
    || regexp_extract_all(text, '\\{{\\{{-?[ \t]*template[ \t]+"([^"\n]+)"', 1)
  )) AS n FROM t
), sym AS (
  -- symbols family: 7 per-language definition rules; the Go-receiver
  -- rule composes Type.Name via regexp_replace with backrefs (same
  -- anchored pattern both sides); cross-rule dedupe == one list_distinct
  SELECT len(list_distinct(
    regexp_extract_all(text, '\\bdef[ \t]+([A-Za-z_][A-Za-z0-9_]*)\\(', 1)
    || regexp_extract_all(text, '\\bclass[ \t]+([A-Za-z_][A-Za-z0-9_]*)[ \t]*[:({{]', 1)
    || regexp_extract_all(text, '\\bfunction[ \t]+([A-Za-z_][A-Za-z0-9_]*)\\(', 1)
    || regexp_extract_all(text, '\\bfunc[ \t]+([A-Za-z_][A-Za-z0-9_]*)\\(', 1)
    || list_transform(
         regexp_extract_all(text, '\\bfunc[ \t]+\\([A-Za-z_][A-Za-z0-9_]*[ \t]+\\*?[A-Za-z_][A-Za-z0-9_]*\\)[ \t]+[A-Za-z_][A-Za-z0-9_]*\\('),
         x -> regexp_replace(x, '^\\bfunc[ \t]+\\([A-Za-z_][A-Za-z0-9_]*[ \t]+\\*?([A-Za-z_][A-Za-z0-9_]*)\\)[ \t]+([A-Za-z_][A-Za-z0-9_]*)\\($', '\\1.\\2')
       )
    || regexp_extract_all(text, '\\bfn[ \t]+([A-Za-z_][A-Za-z0-9_]*)[(<]', 1)
    || regexp_extract_all(text, '\\bstruct[ \t]+([A-Za-z_][A-Za-z0-9_]*)[ \t]*\\{{', 1)
  )) AS n FROM t
), argo AS (
  -- argocd family: repoURL / chart / path / project refs
  SELECT len(list_distinct(
    regexp_extract_all(text, '\\brepoURL:[ \t]*[''"]?([A-Za-z][A-Za-z0-9+.-]*://[A-Za-z0-9._~:/@-]+|git@[A-Za-z0-9._-]+:[A-Za-z0-9._/-]+)', 1)
    || regexp_extract_all(text, '\\bchart:[ \t]*[''"]?([A-Za-z0-9][A-Za-z0-9._-]*)', 1)
    || regexp_extract_all(text, '\\bpath:[ \t]*[''"]?([A-Za-z0-9._-]+(?:/[A-Za-z0-9._-]+)*)', 1)
    || regexp_extract_all(text, '\\bproject:[ \t]*[''"]?([A-Za-z0-9][A-Za-z0-9._-]*)', 1)
  )) AS n FROM t
), mdref AS (
  -- md_refs family: reference-style links resolved through the turn's
  -- own line-anchored [ref]: target definitions (keep-first per
  -- case-folded ref == list_position on the lowered def list), http
  -- targets excluded like md_links
  SELECT len(list_distinct(list_filter(list_transform(list_filter(
    list_transform(
      regexp_extract_all(text, '\\[[^\\]\n]{{1,80}}\\]\\[([^\\]\n]{{1,80}})\\]', 1)
      || regexp_extract_all(text, '\\[([^\\]\n]{{1,80}})\\]\\[\\]', 1),
      r -> dtgts[list_position(drefs, translate(r, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'))]
    ), x -> x IS NOT NULL AND NOT regexp_matches(x, '^(https?://|mailto:|#)')),
    x -> regexp_replace(x, '#.*', '')), x -> x != ''
  ))) AS n
  FROM (
    SELECT text,
      list_transform(regexp_extract_all(text, '(?m)^[ \t]*\\[([^\\]\n]{{1,80}})\\]:[ \t]*([^ \t\r\n]{{1,200}})', 1), x -> translate(x, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS drefs,
      regexp_extract_all(text, '(?m)^[ \t]*\\[([^\\]\n]{{1,80}})\\]:[ \t]*([^ \t\r\n]{{1,200}})', 2) AS dtgts
    FROM t
  )
), mcp AS (
  -- md_code_paths family: code spans passing _looks_like_path + paths
  -- on #-, //- and ---comment lines passing the known-extension gate
  SELECT len(list_distinct(
    list_filter(
      regexp_extract_all(text, '`([^`\n]{{1,200}})`', 1),
      x -> NOT regexp_matches(x, '[()=+{{}}\\[\\];|<> ]') AND x NOT LIKE '-%'
           AND (contains(x, '/') OR (contains(x, '.')
                AND translate(regexp_extract(x, '\\.([^.]*)$', 1), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') IN ({_MCP_EXT_IN})))
    )
    || list_filter(
      flatten(list_transform(
        regexp_extract_all(text, '(?m)^[ \t]*(?:#|//|--)([^\n]*)', 1),
        l -> regexp_extract_all(l, '(?:[A-Za-z0-9_.~-]+/)+[A-Za-z0-9_.-]+')
      )),
      x -> NOT regexp_matches(x, '\\.[^/]*$')
           OR translate(regexp_extract(x, '\\.([^.]*)$', 1), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') IN ({_MCP_EXT_IN})
    )
  )) AS n FROM t
), mfm AS (
  -- md_frontmatter family: depends: blocks -> regex-stripped items
  SELECT len(list_distinct(flatten(list_transform(
    regexp_extract_all(text, '(?m)^depends:[ \t]*\n((?:[ \t]+-[ \t]+[^\n]+\n?)+)', 1),
    b -> regexp_extract_all(b, '-[ \t]+([^\n]*[^ \t\r\n])', 1)
  )))) AS n FROM t
), cd AS (
  -- compose_deps family: depends_on list + dict blocks -> service
  -- names, extends -> parent service; cross-rule dedupe == one
  -- list_distinct (counting is order-insensitive)
  SELECT len(list_distinct(
    flatten(list_transform(
      regexp_extract_all(text, '\\bdepends_on:[ \t]*\n((?:[ \t]+-[ \t]+[^\n]+\n?)+)', 1),
      b -> regexp_extract_all(b, '-[ \t]+[''"]?([A-Za-z0-9._-]+)', 1)
    ))
    || flatten(list_transform(
      regexp_extract_all(text, '\\bdepends_on:[ \t]*\n((?:[ \t]+[A-Za-z0-9._-]+:[ \t]*\n[ \t]+condition:[^\n]+\n?)+)', 1),
      b -> regexp_extract_all(b, '([A-Za-z0-9._-]+):[ \t]*\n', 1)
    ))
    || regexp_extract_all(text, '\\bextends:[ \t]*\n(?:[ \t]+file:[^\n]*\n)?[ \t]+service:[ \t]*[''"]?([A-Za-z0-9._-]+)', 1)
  )) AS n FROM t
)
SELECT 'defines_symbol' AS kind, sum(n)::BIGINT AS n_mentions FROM sym
UNION ALL SELECT 'argo_ref', sum(n)::BIGINT FROM argo
UNION ALL SELECT 'references_code', sum(n)::BIGINT FROM mcp
UNION ALL SELECT 'depends_on', sum(n)::BIGINT FROM mfm
UNION ALL SELECT 'depends_on_svc', sum(n)::BIGINT FROM cd
UNION ALL SELECT 'extends_template', sum(n)::BIGINT FROM ex
UNION ALL SELECT 'includes_config', sum(n)::BIGINT FROM gl
UNION ALL SELECT 'uses_helm_template', sum(n)::BIGINT FROM hm
UNION ALL SELECT 'imports_module', ((SELECT sum(n) FROM i) + (SELECT sum(n) FROM goi))::BIGINT
UNION ALL SELECT 'links_to', sum(n)::BIGINT FROM u
UNION ALL SELECT 'mentions_email', sum(n)::BIGINT FROM e
UNION ALL SELECT 'mentions_version', sum(n)::BIGINT FROM v
UNION ALL SELECT 'quotes', sum(n)::BIGINT FROM q
UNION ALL SELECT 'references_doc', ((SELECT sum(n) FROM md) + (SELECT sum(n) FROM mdref))::BIGINT
UNION ALL SELECT 'references_path', sum(n)::BIGINT FROM p
UNION ALL SELECT 'uses_action', sum(n)::BIGINT FROM ci
UNION ALL SELECT 'uses_image', sum(n)::BIGINT FROM img
"""


def kg_qualified_mentions(sf_dir: str) -> pd.DataFrame:
    """Qualified-name family coverage (the structured extraction depth
    the reference gets from tree-sitter qualified symbols,
    indexer/symbols.py:216-291): dotted root.member surfaces per member
    DEPTH, with distinct-surface counts. The oracle replays the regex,
    the root identifier-shape gate (snake / camel / pascal — the same
    rules as functions/mentions) and the per-turn keep-first dedupe in
    SQL over the same synth transcripts."""
    from ..stages.extract import extract_mention_rows, family_plan
    from .kg import normalized_turns_ds

    ent_names, lit_specs, qual_specs = family_plan()
    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    ds = normalized_turns_ds(data_dir).map_batches(
        lambda b: extract_mention_rows(
            b, entity_names=ent_names, literal_specs=lit_specs, qualified_specs=qual_specs
        ),
        batch_format="pyarrow",
    )

    def depths(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b["kind_code"], pa.scalar(-2, pa.int8())))
        return pa.table(
            {
                "mention": b["mention"],
                "depth": pc.count_substring(b["mention"], pattern="."),
            }
        )

    q = ds.map_batches(depths, batch_format="pyarrow")
    counts = q.groupby("depth").aggregate(Count(alias_name="n_mentions")).to_pandas()
    # distinct surfaces: per-block unique pre-aggregation, tiny driver
    # dedupe (dotted surfaces draw from the bounded catalog x member
    # vocabulary — output-sized, not corpus-sized)
    uniq = (
        q.map_batches(
            lambda b: pa.table(
                {
                    "mention": pc.unique(b["mention"]),
                    "depth": pc.count_substring(pc.unique(b["mention"]), pattern="."),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .drop_duplicates("mention")
        .groupby("depth", as_index=False)
        .agg(n_surfaces=("mention", "size"))
    )
    out = counts.merge(uniq, on="depth").sort_values("depth").reset_index(drop=True)
    out["depth"] = out["depth"].astype("int64")
    return out[["depth", "n_mentions", "n_surfaces"]].astype(
        {"n_mentions": "int64", "n_surfaces": "int64"}
    )


KG_QUALIFIED_MENTIONS_SQL = f"""
WITH t AS (
  SELECT coalesce(text, '') AS text FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet')
), m AS (
  -- qualified_names family: per-turn keep-first dedupe == list_distinct
  SELECT unnest(list_distinct(regexp_extract_all(text,
    '[A-Za-z_][A-Za-z0-9_]*(?:\\.[A-Za-z_][A-Za-z0-9_]*)+'))) AS s
  FROM t
  UNION ALL
  -- hcl_blocks family: resource/data block declarations composed to the
  -- type.name address (full-match extract + backref replace, the same
  -- two-group composition the extractor does); cross-rule dedupe ==
  -- one list_distinct over the concatenation; the type-shape gate is
  -- the shared root filter below (root == type for composed addresses)
  SELECT unnest(list_distinct(list_transform(
    regexp_extract_all(text, '\\bresource[ \\t]+"[A-Za-z_][A-Za-z0-9_]*"[ \\t]+"[A-Za-z_][A-Za-z0-9_-]*"')
    || regexp_extract_all(text, '\\bdata[ \\t]+"[A-Za-z_][A-Za-z0-9_]*"[ \\t]+"[A-Za-z_][A-Za-z0-9_-]*"'),
    x -> regexp_replace(x, '^(?:resource|data)[ \\t]+"([A-Za-z_][A-Za-z0-9_]*)"[ \\t]+"([A-Za-z_][A-Za-z0-9_-]*)"$', '\\1.\\2')
  ))) AS s
  FROM t
), q AS (
  SELECT s, split_part(s, '.', 1) AS root FROM m
), f AS (
  SELECT s FROM q
  WHERE regexp_matches(root, '[a-zA-Z0-9]+_[a-zA-Z0-9]+')
     OR (length(root) >= 6 AND regexp_matches(substr(root, 1, 1), '[a-z]')
         AND regexp_matches(root, '[a-z][A-Z]'))
     OR (length(root) >= 8 AND regexp_matches(root, '[A-Z][a-z]+[A-Z]'))
)
SELECT (length(s) - length(replace(s, '.', '')))::BIGINT AS depth,
       count(*)::BIGINT AS n_mentions,
       count(DISTINCT s)::BIGINT AS n_surfaces
FROM f GROUP BY depth ORDER BY depth
"""


def _kg_bfs_sql(reverse: bool, max_depth: int = 5) -> str:
    """Full batch-BFS oracle INCLUDING the claiming root: at each level a
    newly-reached node is claimed by the root of the MINIMAL from-node
    among edges reaching it (the pipeline iterates sorted (from, to)
    pairs — deterministic), unrolled as one CTE pair per level."""
    s, t = ("obj", "subj") if reverse else ("subj", "obj")
    sql = [
        f"""
WITH e AS (SELECT {s} AS s, {t} AS t FROM read_parquet('{_EXP}/kg_triples.parquet') WHERE pred = 'mentions'),
r AS (
  SELECT subj FROM (
    SELECT subj, count(*) AS n FROM read_parquet('{_EXP}/kg_triples.parquet')
    WHERE pred = 'mentions'
    GROUP BY subj ORDER BY n DESC, subj LIMIT 3
  )
),
l0 AS (SELECT subj AS node, subj AS root, 0 AS depth FROM r)"""
    ]
    seen = "SELECT node FROM l0"
    for d in range(1, max_depth + 1):
        sql.append(
            f""", c{d} AS (
  SELECT e.t AS node, l{d - 1}.root, e.s,
         row_number() OVER (PARTITION BY e.t ORDER BY e.s) AS rn
  FROM e JOIN l{d - 1} ON e.s = l{d - 1}.node
  WHERE e.t NOT IN ({seen})
), l{d} AS (SELECT node, root, {d} AS depth FROM c{d} WHERE rn = 1)"""
        )
        seen += f" UNION SELECT node FROM l{d}"
    union = " UNION ALL ".join(f"SELECT * FROM l{d}" for d in range(0, max_depth + 1))
    sql.append(f"\nSELECT root, node, depth FROM ({union}) ORDER BY root, node")
    return "".join(sql)


KG_TREE_SQL = _kg_bfs_sql(reverse=False)
KG_IMPACT_SQL = _kg_bfs_sql(reverse=True)


def _kg_reach(sf_dir: str, reverse: bool) -> pd.DataFrame:
    """Multi-source BFS reachability (node, depth = first-reach level =
    min distance from the root set): the SQL-checkable projection of the
    batch tree/impact traversal (kg_tree/kg_impact also carry the
    claiming root, which is expansion-order-dependent and stays
    rows-only)."""
    from ..stages.graph import bfs_distributed
    from .stats import top_entities

    triples = kg_triples(sf_dir)
    edges = triples.filter(expr="pred == 'mentions'").materialize()
    roots = top_entities(edges, k=3).to_pandas()["subj"].tolist()
    df = bfs_distributed(edges, roots, max_depth=5, reverse=reverse)
    out = df[["node", "depth"]].sort_values("node").reset_index(drop=True)
    return out.astype({"depth": "int64"})


def kg_reach_tree(sf_dir: str) -> pd.DataFrame:
    return _kg_reach(sf_dir, reverse=False)


def kg_reach_impact(sf_dir: str) -> pd.DataFrame:
    return _kg_reach(sf_dir, reverse=True)


def _kg_reach_sql(src: str, dst: str) -> str:
    return f"""
WITH RECURSIVE r AS (
  SELECT subj FROM (
    SELECT subj, count(*) AS n FROM read_parquet('{_EXP}/kg_triples.parquet')
    WHERE pred = 'mentions'
    GROUP BY subj ORDER BY n DESC, subj LIMIT 3
  )
), e AS (
  SELECT subj, obj FROM read_parquet('{_EXP}/kg_triples.parquet') WHERE pred = 'mentions'
), step(node, depth) AS (
  SELECT subj, 0 FROM r
  UNION
  SELECT e.{dst}, s.depth + 1 FROM step s JOIN e ON e.{src} = s.node WHERE s.depth < 5
)
SELECT node, min(depth)::BIGINT AS depth FROM step GROUP BY node
"""


KG_REACH_TREE_SQL = _kg_reach_sql("subj", "obj")
KG_REACH_IMPACT_SQL = _kg_reach_sql("obj", "subj")


def kg_context_coverage(sf_dir: str) -> pd.DataFrame:
    """Provenance re-join check: per pred, how many triples re-attached
    their source-turn text (should be all of them)."""
    from ..sources.synth import ensure_tier, tier_for_sf_dir
    from .kg import triples_with_context

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    joined = triples_with_context(kg_triples(sf_dir), data_dir)

    def flag(b: pa.Table) -> pa.Table:
        has = pc.cast(pc.is_valid(b["text"]), pa.int64())
        return pa.table({"pred": b["pred"], "has_text": has})

    out = (
        joined.map_batches(flag, batch_format="pyarrow")
        .groupby("pred")
        .aggregate(Count(alias_name="n_triples"), Sum("has_text", alias_name="n_with_text"))
        .to_pandas()
    )
    return out.astype({"n_triples": "int64", "n_with_text": "int64"})


KG_CONTEXT_COVERAGE_SQL = f"""
SELECT t.pred, count(*) AS n_triples,
       sum(CASE WHEN u.text IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_with_text
FROM read_parquet('{_EXP}/kg_triples.parquet') t
LEFT JOIN read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet') u
  ON t.conv_id = u.conv_id AND t.turn_idx = u.turn_idx
GROUP BY t.pred
"""


def q_hybrid_search(sf_dir: str) -> pd.DataFrame:
    """Reference search UX over the tier catalog: fixed query set, ranked
    results with mode selection (identifier-shaped -> hybrid). The two
    PRE-FUSION channel rank lists are exported so the oracle re-derives
    the RRF(k=60) score, x2 canonical boost, keyword tiebreak and top-5
    truncation in SQL — the fusion math is value-checked, the channels
    (hash-embedding cosine / tf-idf) stay pinned by unit tests."""
    from ..functions.tokenize import has_identifier_pattern
    from ..sources.synth import ensure_tier, load_catalog, tier_for_sf_dir
    from .search import _index_for, search_catalog

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    catalog = load_catalog(data_dir)
    surfaces = catalog.column("canonical_name").to_pylist()
    aliases = catalog.column("aliases").to_pylist()
    queries = [surfaces[0], aliases[0][0], surfaces[1].lower(), "nonexistent thing"]

    idx = _index_for(catalog)
    exp_rows = []
    for qi, q in enumerate(queries):
        dense, keyword = idx.channel_lists(q, limit=5, hybrid=has_identifier_pattern(q))
        for channel, ranked in (("dense", dense), ("keyword", keyword)):
            for rank, (key, _score) in enumerate(ranked, start=1):
                exp_rows.append((qi, channel, rank, key, bool(idx.is_canonical.get(key, False))))
    _export_table(
        sf_dir,
        "hybrid_channels",
        pa.table(
            {
                "query_id": pa.array([r[0] for r in exp_rows], pa.int64()),
                "channel": pa.array([r[1] for r in exp_rows], pa.string()),
                "rank": pa.array([r[2] for r in exp_rows], pa.int64()),
                "key": pa.array([r[3] for r in exp_rows], pa.string()),
                "is_canonical": pa.array([r[4] for r in exp_rows], pa.bool_()),
            }
        ),
    )

    parts = []
    for qi, q in enumerate(queries):
        res = search_catalog(catalog, q, limit=5)
        res.insert(0, "rank", range(1, len(res) + 1))
        res.insert(0, "query_id", qi)
        parts.append(res[["query_id", "rank", "entity_id", "match_type", "is_canonical"]])
    out = pd.concat(parts, ignore_index=True)
    return out.astype({"query_id": "int64", "rank": "int64"})


Q_HYBRID_SEARCH_SQL = f"""
WITH ch AS (SELECT * FROM read_parquet('{_EXP}/hybrid_channels.parquet')),
sc AS (
  SELECT query_id, key, bool_or(is_canonical) AS is_canonical,
         sum(1.0 / (60 + rank)) AS score,
         max(CASE WHEN channel = 'keyword' THEN 1 ELSE 0 END) AS has_kw,
         max(CASE WHEN channel = 'dense' THEN 1 ELSE 0 END) AS has_v
  FROM ch GROUP BY query_id, key
), boosted AS (
  SELECT query_id, key, is_canonical,
         CASE WHEN is_canonical THEN score * 2.0 ELSE score END AS fscore,
         CASE WHEN has_kw = 1 AND has_v = 1 THEN 'both'
              WHEN has_kw = 1 THEN 'keyword' ELSE 'semantic' END AS match_type,
         has_kw
  FROM sc
), ranked AS (
  SELECT query_id, key, match_type, is_canonical,
         row_number() OVER (
             PARTITION BY query_id ORDER BY fscore DESC, has_kw DESC, key
         ) AS rank
  FROM boosted
)
SELECT query_id, rank, split_part(key, '|', 1) AS entity_id, match_type, is_canonical
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""


def q_doc_encode(sf_dir: str) -> pd.DataFrame:
    """Actor-pool encoder over documents (hash-embedding test mode):
    per-lang count + mean L2 norm of the embedding column."""
    from ..stages.encode import encode_dataset

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    enc = encode_dataset(ds, text_col="text").materialize()
    exp = enc.select_columns(["doc_id", "lang", "embedding"]).to_pandas()
    exp["embedding"] = exp["embedding"].map(list)
    _export_table(sf_dir, "doc_embeddings", pa.Table.from_pandas(exp, preserve_index=False))

    def norms(b: pa.Table) -> pa.Table:
        import numpy as np

        vecs = np.asarray(b["embedding"].combine_chunks().flatten()).reshape(
            b.num_rows, -1
        )
        n = np.linalg.norm(vecs.astype(np.float64), axis=1)
        return pa.table({"lang": b["lang"], "norm": pa.array(n, pa.float64())})

    out = (
        enc.map_batches(norms, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Mean("norm", alias_name="mean_norm"))
        .to_pandas()
    )
    return _round_half_away(out, ["mean_norm"], 4)


# the encoder itself is a deterministic hash-embedding (not expressible in
# SQL; pinned by unit tests) — the export makes the vectors visible so the
# norm + grouped-mean math is independently re-derived in SQL
Q_DOC_ENCODE_SQL = f"""
WITH n AS (
  SELECT lang, sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x))) AS norm
  FROM read_parquet('{_EXP}/doc_embeddings.parquet')
)
SELECT lang, count(*) AS n_docs, round(avg(norm), 4) AS mean_norm FROM n GROUP BY lang
"""


def q_media_features(sf_dir: str) -> pd.DataFrame:
    """Multimodal decode + features over a MIXED-format media table:
    real containers (RIFF/PCM16 WAV, P6 PPM — decoded by the pure-python
    parsers in stages/multimodal.py) interleaved with the deterministic
    fake formats. Per media row: format and the scalar feature (RMS for
    audio, global value mean for image/video). Oracle: the query exports
    each payload's DECODED raw value stream; the SQL re-derives the
    feature independently (sqrt(avg(v*v)) / avg(v)) — the decode itself
    is pinned by unit tests against the stdlib ``wave`` reference and
    PPM round-trips."""
    import ray.data as _rd

    from ..stages.multimodal import generate_media_table, media_values

    n = {"smoke": 64, "correctness": 128, "bench": 256}[tier_for_sf_dir(sf_dir)]
    ds = _rd.from_arrow(generate_media_table(n, std_formats=True))
    t = media_values(ds).to_pandas().sort_values("media_id").reset_index(drop=True)
    _export_table(
        sf_dir,
        "media_values",
        pa.table(
            {
                "media_id": pa.array(t["media_id"], pa.int64()),
                "kind": pa.array(t["kind"], pa.string()),
                "fmt": pa.array(t["fmt"], pa.string()),
                "vals": pa.array(list(t["vals"]), pa.list_(pa.float64())),
            }
        ),
    )
    out = t[["media_id", "kind", "fmt", "feat"]].copy()
    return _round_half_away(out, ["feat"], 6)


Q_MEDIA_FEATURES_SQL = f"""
WITH v AS (
  SELECT media_id, kind, fmt, unnest(vals) AS val
  FROM read_parquet('{_EXP}/media_values.parquet')
)
SELECT media_id, kind, fmt,
       round(CASE WHEN kind = 'audio' THEN sqrt(avg(val * val)) ELSE avg(val) END, 6) AS feat
FROM v GROUP BY media_id, kind, fmt ORDER BY media_id
"""


def q_parse_qa_detail(sf_dir: str) -> pd.DataFrame:
    """Parse-status DETAIL (reference parse_tracking.py:97-111 records
    the error line of the first tree-sitter error node; our closed-form
    analog records the char position + line of the offending delimiter
    under an ordered balance rule). Runs over deterministic structured
    docs with injected delimiter errors; the query exports the docs and
    the oracle re-derives every status, position and line in SQL string
    functions."""
    import ray.data as _rd

    from ..sources.synth import generate_structured_docs
    from .stats import parse_qa_detail

    n = {"smoke": 120, "correctness": 240, "bench": 480}[tier_for_sf_dir(sf_dir)]
    t = generate_structured_docs(n)
    _export_table(sf_dir, "structured_docs", t)
    det = (
        _rd.from_arrow(t)
        .map_batches(parse_qa_detail, batch_format="pyarrow")
        .to_pandas()
    )
    out = (
        det.groupby("parse_status", as_index=False)
        .agg(
            n_docs=("doc_id", "size"),
            sum_error_pos=("error_pos", "sum"),
            sum_error_line=("error_line", "sum"),
        )
        .sort_values("parse_status")
        .reset_index(drop=True)
    )
    return out.astype(
        {"n_docs": "int64", "sum_error_pos": "int64", "sum_error_line": "int64"}
    )


Q_PARSE_QA_DETAIL_SQL = f"""
WITH d AS (
  SELECT doc_id, coalesce(text, '') AS text
  FROM read_parquet('{_EXP}/structured_docs.parquet')
), c AS (
  SELECT doc_id, text,
    length(text) - length(replace(text, '"', '')) AS nq,
    length(text) - length(replace(text, chr(96), '')) AS nb,
    length(text) - length(replace(text, '(', '')) AS no,
    length(text) - length(replace(text, ')', '')) AS nc
  FROM d
), s AS (
  SELECT *,
    CASE WHEN length(text) = 0 THEN 'empty_text'
         WHEN nq % 2 = 1 THEN 'unbalanced_quote'
         WHEN nb % 2 = 1 THEN 'unbalanced_backtick'
         WHEN no <> nc THEN 'unbalanced_paren'
         ELSE 'ok' END AS parse_status
  FROM c
), e AS (
  SELECT parse_status, text,
    CASE WHEN parse_status = 'unbalanced_quote' THEN length(text) - strpos(reverse(text), '"')
         WHEN parse_status = 'unbalanced_backtick' THEN length(text) - strpos(reverse(text), chr(96))
         WHEN parse_status = 'unbalanced_paren' AND no > nc THEN length(text) - strpos(reverse(text), '(')
         WHEN parse_status = 'unbalanced_paren' THEN strpos(text, ')') - 1
         ELSE -1 END AS error_pos
  FROM s
)
SELECT parse_status, count(*)::BIGINT AS n_docs,
       sum(error_pos)::BIGINT AS sum_error_pos,
       sum(CASE WHEN error_pos >= 0
                THEN length(substr(text, 1, error_pos))
                     - length(replace(substr(text, 1, error_pos), chr(10), '')) + 1
                ELSE 0 END)::BIGINT AS sum_error_line
FROM e GROUP BY parse_status ORDER BY parse_status
"""


def q_doc_block_hierarchy(sf_dir: str) -> pd.DataFrame:
    """Block/hierarchy metadata over structured docs (reference
    handler-emitted block_type/hierarchy chunk columns,
    handlers/hcl.py:59-120): per (block_type, enclosing-heading depth):
    line count + distinct enclosing headings. Oracle replays the line
    classifier (fence parity via a window sum, heading carry via
    last_value IGNORE NULLS) in SQL over the same exported docs."""
    import ray.data as _rd

    from ..sources.synth import generate_structured_docs
    from ..stages.blocks import doc_blocks

    n = {"smoke": 120, "correctness": 240, "bench": 480}[tier_for_sf_dir(sf_dir)]
    t = generate_structured_docs(n)
    _export_table(sf_dir, "structured_docs", t)
    blocks = _rd.from_arrow(t).map_batches(doc_blocks, batch_format="pyarrow")
    counts = (
        blocks.groupby(["block_type", "depth"])
        .aggregate(Count(alias_name="n_lines"))
        .to_pandas()
    )
    # distinct enclosing headings per group: per-block Arrow group_by
    # pre-aggregation (C), tiny driver dedupe (bounded by the heading
    # vocabulary, not the corpus)
    uniq = (
        blocks.map_batches(
            lambda b: b.select(["block_type", "depth", "heading"])
            .group_by(["block_type", "depth", "heading"])
            .aggregate([]),
            batch_format="pyarrow",
        )
        .to_pandas()
        .drop_duplicates()
        .groupby(["block_type", "depth"], as_index=False)
        .agg(n_headings=("heading", "size"))
    )
    out = (
        counts.merge(uniq, on=["block_type", "depth"])
        .sort_values(["block_type", "depth"])
        .reset_index(drop=True)
    )
    out["depth"] = out["depth"].astype("int64")
    return out.astype({"n_lines": "int64", "n_headings": "int64"})


Q_DOC_BLOCK_HIERARCHY_SQL = f"""
WITH d AS (
  SELECT doc_id, text FROM read_parquet('{_EXP}/structured_docs.parquet')
  WHERE text IS NOT NULL AND text <> ''
), l AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, chr(10)), 1) - 1 AS line_no,
         unnest(string_split(text, chr(10))) AS line
  FROM d
), f AS (
  SELECT doc_id, line_no, line,
         CASE WHEN line LIKE '```%' THEN 1 ELSE 0 END AS is_fence
  FROM l
), g AS (
  SELECT *,
         coalesce(sum(is_fence) OVER (
           PARTITION BY doc_id ORDER BY line_no
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS fences_before
  FROM f
), c AS (
  SELECT doc_id, line_no,
         CASE WHEN is_fence = 1 THEN 'fence'
              WHEN fences_before % 2 = 1 THEN 'code'
              WHEN line = '' THEN 'blank'
              WHEN regexp_matches(line, '^#{{1,6}} ') THEN 'heading'
              WHEN line LIKE '- %' THEN 'list_item'
              ELSE 'text' END AS block_type,
         CASE WHEN is_fence = 0 AND fences_before % 2 = 0 AND regexp_matches(line, '^#{{1,6}} ')
              THEN regexp_extract(line, '^(#{{1,6}}) (.*)$', 2) END AS h_title,
         CASE WHEN is_fence = 0 AND fences_before % 2 = 0 AND regexp_matches(line, '^#{{1,6}} ')
              THEN length(regexp_extract(line, '^(#{{1,6}}) (.*)$', 1)) END AS h_depth
  FROM g
), w AS (
  SELECT doc_id, line_no, block_type,
         coalesce(last_value(h_title IGNORE NULLS) OVER (
           PARTITION BY doc_id ORDER BY line_no
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), '') AS heading,
         coalesce(last_value(h_depth IGNORE NULLS) OVER (
           PARTITION BY doc_id ORDER BY line_no
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS depth
  FROM c
)
SELECT block_type, depth::BIGINT AS depth, count(*)::BIGINT AS n_lines,
       count(DISTINCT heading)::BIGINT AS n_headings
FROM w GROUP BY block_type, depth ORDER BY block_type, depth
"""


REGISTRY.update(
    {
        "kg_impact": (kg_impact, KG_IMPACT_SQL),
        "kg_tree": (kg_tree, KG_TREE_SQL),
        "kg_context_coverage": (kg_context_coverage, KG_CONTEXT_COVERAGE_SQL),
        "q_hybrid_search": (q_hybrid_search, Q_HYBRID_SEARCH_SQL),
        "q_doc_encode": (q_doc_encode, Q_DOC_ENCODE_SQL),
        "q_media_features": (q_media_features, Q_MEDIA_FEATURES_SQL),
        "q_parse_qa_detail": (q_parse_qa_detail, Q_PARSE_QA_DETAIL_SQL),
        "q_doc_block_hierarchy": (q_doc_block_hierarchy, Q_DOC_BLOCK_HIERARCHY_SQL),
    }
)


def q_glob_filter(sf_dir: str) -> pd.DataFrame:
    """Glob filter (glob -> LIKE with escape-then-convert ordering,
    reference filters.py:11-51) on customer names."""
    from ..functions.globs import filter_glob

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    out = (
        ds.map_batches(lambda b: filter_glob(b, "c_name", "Customer*1?"), batch_format="pyarrow")
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    return out


# ESCAPE '\' is load-bearing even though this pattern has no backslash:
# glob_to_like escapes literal %/_ as \%/\_, and Arrow match_like (like
# Postgres, the reference engine) treats backslash as the DEFAULT escape
# while DuckDB LIKE has NO default escape char — without the clause any
# glob containing a literal % or _ diverges pipeline-vs-oracle
# (lockstep-fuzzed in test_properties.test_glob_filter_matches_duckdb).
Q_GLOB_FILTER_SQL = r"""
SELECT c_custkey, c_name FROM customer WHERE c_name ILIKE 'Customer%1_' ESCAPE '\'
"""


def q_doc_chunks_fixed(sf_dir: str) -> pd.DataFrame:
    """Fixed-stride windowed chunking, FULL per-chunk verification: the
    oracle re-derives every (chunk_ord, start, end, chunk_text) row with
    range + substr."""
    from ..stages import chunking

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    chunks = ds.map_batches(
        lambda b: chunking.chunk_documents_fixed(b, window=200, step=140),
        batch_format="pyarrow",
    )
    out = chunks.to_pandas().sort_values(["doc_id", "chunk_ord"]).reset_index(drop=True)
    return out.astype({"chunk_ord": "int64"})


Q_DOC_CHUNKS_FIXED_SQL = """
WITH c AS (SELECT doc_id, text, length(text) AS L FROM documents),
x AS (SELECT doc_id, text, L, unnest([s for s in range(0, L, 140)]) AS start FROM c)
SELECT doc_id, (start // 140)::BIGINT AS chunk_ord, start, least(start + 200, L) AS "end",
       substr(text, start + 1, least(200, L - start)) AS chunk_text
FROM x ORDER BY doc_id, chunk_ord
"""


def q_doc_chunks(sf_dir: str) -> pd.DataFrame:
    """Recursive chunking (chunk_size=200/overlap=60 so the tier docs
    actually split): chunks per doc + offset bounds (rows-only: the
    separator-driven recursive splitter + greedy overlap re-packing is
    not SQL-expressible; golden unit tests pin the splitting semantics
    and q_doc_chunks_fixed green-checks the explosion shape end to
    end)."""
    from ..stages import chunking

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    chunks = ds.map_batches(
        lambda b: chunking.chunk_documents(b, chunk_size=200, chunk_overlap=60),
        batch_format="pyarrow",
    )
    out = (
        chunks.groupby("doc_id")
        .aggregate(
            Count(alias_name="n_chunks"),
            Min("start", alias_name="first_start"),
            Max("end", alias_name="last_end"),
        )
        .to_pandas()
    )
    return out.astype({"n_chunks": "int64", "first_start": "int64", "last_end": "int64"})


REGISTRY.update(
    {
        "q_glob_filter": (q_glob_filter, Q_GLOB_FILTER_SQL),
        "q_doc_chunks": (q_doc_chunks, None),
        "q_doc_chunks_fixed": (q_doc_chunks_fixed, Q_DOC_CHUNKS_FIXED_SQL),
        "kg_reach_tree": (kg_reach_tree, KG_REACH_TREE_SQL),
        "kg_literal_mentions": (kg_literal_mentions, KG_LITERAL_MENTIONS_SQL),
        "kg_qualified_mentions": (kg_qualified_mentions, KG_QUALIFIED_MENTIONS_SQL),
        "kg_pagerank": (kg_pagerank, KG_PAGERANK_SQL),
        "kg_pmi_pairs": (kg_pmi_pairs, KG_PMI_PAIRS_SQL),
        "kg_top_objects": (kg_top_objects, KG_TOP_OBJECTS_SQL),
        "kg_pred_detailed": (kg_pred_detailed, KG_PRED_DETAILED_SQL),
        "kg_context_window": (kg_context_window, KG_CONTEXT_WINDOW_SQL),
        "kg_reach_impact": (kg_reach_impact, KG_REACH_IMPACT_SQL),
    }
)


def q_lineitem_filter_scan(sf_dir: str) -> pd.DataFrame:
    """Column-pruned scan + vectorized filter + projection (no agg)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity", "l_discount"])

    def f(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater(b["l_quantity"], 45.0), pc.less(b["l_discount"], 0.02))
        return b.filter(m)

    out = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    return _round2(out, ["l_quantity", "l_discount"])


Q_LINEITEM_FILTER_SCAN_SQL = """
SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS l_quantity,
       round(l_discount, 2) AS l_discount
FROM lineitem WHERE l_quantity > 45.0 AND l_discount < 0.02
"""


def q_events_distinct_users(sf_dir: str) -> pd.DataFrame:
    """COUNT(DISTINCT) per event_type: two-level groupby (distinct pairs
    first, then count) — the shuffle-friendly expression."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    pairs = ds.groupby(["event_type", "user_id"]).aggregate(Count(alias_name="_n"))
    out = (
        pairs.groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
        .astype({"n_users": "int64"})
    )
    return out


Q_EVENTS_DISTINCT_USERS_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY event_type
"""


def q_orders_monthly(sf_dir: str) -> pd.DataFrame:
    """Timestamp truncation to month (vectorized Arrow) + grouped agg."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def month(b: pa.Table) -> pa.Table:
        y = pc.year(b["o_orderdate"])
        m = pc.month(b["o_orderdate"])
        ym = pc.add(pc.multiply(pc.cast(y, pa.int64()), pa.scalar(100, pa.int64())), pc.cast(m, pa.int64()))
        return pa.table({"year_month": ym, "price_e2": cents_i64(b["o_totalprice"])})

    out = (
        ds.map_batches(month, batch_format="pyarrow")
        .groupby("year_month")
        .aggregate(Count(alias_name="n_orders"), Sum("price_e2", alias_name="price_e2"))
        .to_pandas()
    )
    out["revenue"] = e2_dollars(out.pop("price_e2"))
    return out


Q_ORDERS_MONTHLY_SQL = """
SELECT (year(o_orderdate) * 100 + month(o_orderdate))::BIGINT AS year_month,
       count(*) AS n_orders,
       sum(CAST(round(o_totalprice*100) AS BIGINT))::BIGINT / 100.0 AS revenue
FROM orders GROUP BY 1
"""


def q_events_sliding(sf_dir: str) -> pd.DataFrame:
    """Sliding windows (1h window, 30min step): each event explodes into
    the two step-windows covering it, then grouped — the explode-then-
    group expression of overlapping windows."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def explode(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        step = pc.cast(pc.divide(us, pa.scalar(1_800_000_000, pa.int64())), pa.int64())
        step1 = pc.add(step, pa.scalar(1, pa.int64()))
        import pyarrow as _pa

        val_e2 = cents_i64(b["value"]).combine_chunks()
        return _pa.table(
            {
                "window_id": _pa.concat_arrays(
                    [pc.cast(step, pa.int64()).combine_chunks(), pc.cast(step1, pa.int64()).combine_chunks()]
                ),
                "val_e2": _pa.concat_arrays([val_e2, val_e2]),
            }
        )

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("window_id")
        .aggregate(Count(alias_name="n_events"), Sum("val_e2", alias_name="val_e2"))
        .to_pandas()
    )
    out["sum_value"] = e2_dollars(out.pop("val_e2"))
    return out


Q_EVENTS_SLIDING_SQL = """
WITH e AS (SELECT (epoch(ts) * 1000000)::BIGINT // 1800000000 AS s,
                  CAST(round(value*100) AS BIGINT) AS val_e2 FROM events),
x AS (SELECT s AS window_id, val_e2 FROM e UNION ALL SELECT s + 1 AS window_id, val_e2 FROM e)
SELECT window_id, count(*) AS n_events, sum(val_e2)::BIGINT / 100.0 AS sum_value
FROM x GROUP BY window_id
"""


def kg_top_tools_salted(sf_dir: str) -> pd.DataFrame:
    """Skew-safe grouped count over the HOT key (two tools dominate the
    distribution by construction): two-level salted aggregation."""
    from .stats import grouped_count_salted

    triples = kg_triples(sf_dir)
    tools = triples.filter(expr="pred == 'uses_tool'").select_columns(["obj"])
    out = grouped_count_salted(tools, "obj", alias="n_triples").to_pandas()
    return (
        out.rename(columns={"obj": "tool"})
        .sort_values(["n_triples", "tool"], ascending=[False, True])
        .reset_index(drop=True)
        .astype({"n_triples": "int64"})
    )


KG_TOP_TOOLS_SALTED_SQL = f"""
SELECT obj AS tool, count(*) AS n_triples
FROM read_parquet('{_EXP}/kg_triples.parquet')
WHERE pred = 'uses_tool' GROUP BY obj
"""


REGISTRY.update(
    {
        "q_lineitem_filter_scan": (q_lineitem_filter_scan, Q_LINEITEM_FILTER_SCAN_SQL),
        "q_events_distinct_users": (q_events_distinct_users, Q_EVENTS_DISTINCT_USERS_SQL),
        "q_orders_monthly": (q_orders_monthly, Q_ORDERS_MONTHLY_SQL),
        "q_events_sliding": (q_events_sliding, Q_EVENTS_SLIDING_SQL),
        "kg_top_tools_salted": (kg_top_tools_salted, KG_TOP_TOOLS_SALTED_SQL),
    }
)


def q_region_revenue(sf_dir: str) -> pd.DataFrame:
    """3-hop broadcast join chain: orders -> customer -> nation -> region,
    revenue per region (each dimension ships once via ray.put)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(_t(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": b["o_custkey"], "price_e2": cents_i64(b["o_totalprice"])}
        )

    j = broadcast_join(
        orders.map_batches(to_cents, batch_format="pyarrow"), customer, "o_custkey", "c_custkey"
    )
    j = broadcast_join(j, nation, "c_nationkey", "n_nationkey")
    j = broadcast_join(j, region, "n_regionkey", "r_regionkey")
    out = (
        j.groupby("r_name")
        .aggregate(Count(alias_name="n_orders"), Sum("price_e2", alias_name="price_e2"))
        .to_pandas()
    )
    out["revenue"] = e2_dollars(out.pop("price_e2"))
    return out


Q_REGION_REVENUE_SQL = """
SELECT r_name, count(*) AS n_orders,
       sum(CAST(round(o_totalprice*100) AS BIGINT))::BIGINT / 100.0 AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_orders_anti_join(sf_dir: str) -> pd.DataFrame:
    """Broadcast ANTI-join: orders whose customer is NOT in the BUILDING
    segment (the reference's read_edges_excluding / except-style filtered
    scan, deps/db.py:149-202 — key set broadcast, vectorized isin filter)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    customer = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    exclude = sorted(
        customer.filter(pc.equal(customer["c_mktsegment"], "BUILDING"))["c_custkey"].to_pylist()
    )
    exclude_ref = ray.put(pa.array(exclude, pa.int64()))

    def anti(b: pa.Table) -> pa.Table:
        from .kg import _deref_once

        mask = pc.invert(pc.is_in(b["o_custkey"], value_set=_deref_once(exclude_ref)))
        b = b.filter(mask)
        return pa.table(
            {"o_custkey": b["o_custkey"], "price_e2": cents_i64(b["o_totalprice"])}
        )

    out = (
        orders.map_batches(anti, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"), Sum("price_e2", alias_name="price_e2"))
        .to_pandas()
    )
    out["revenue"] = e2_dollars(out.pop("price_e2"))
    return out


Q_ORDERS_ANTI_JOIN_SQL = """
SELECT o_custkey, count(*) AS n_orders,
       sum(CAST(round(o_totalprice*100) AS BIGINT))::BIGINT / 100.0 AS revenue
FROM orders
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY o_custkey
"""


REGISTRY.update(
    {
        "q_region_revenue": (q_region_revenue, Q_REGION_REVENUE_SQL),
        "q_orders_anti_join": (q_orders_anti_join, Q_ORDERS_ANTI_JOIN_SQL),
    }
)


def q_ci_actions_parsed(sf_dir: str) -> pd.DataFrame:
    """Structured-metadata parse of CI action refs — the reference's
    _parse_action_ref split into owner/repo/version parts
    (deps/extractors/github_actions.py:21-40): extract uses_action
    surfaces from the synth transcripts (external rule only — local
    ./workflow refs carry no owner/version and parse to null), parse
    with ONE anchored RE2 regex (identical in Arrow and DuckDB), and
    aggregate ref counts + distinct versions per (owner, repo)."""
    from ..stages.extract import extract_mention_rows
    from .kg import normalized_turns_ds

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    ds = normalized_turns_ds(data_dir).map_batches(
        lambda b: extract_mention_rows(
            b, entity_names=(), literal_specs=(("ci_uses", "uses_action"),)
        ),
        batch_format="pyarrow",
    )

    def parse(b: pa.Table) -> pa.Table:
        parts = pc.extract_regex(
            b["mention"], r"^(?P<owner>[^/]+)/(?P<repo>[^/@]+)(?:/[^@]+)?@(?P<version>.+)$"
        )
        parts = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
        parts = parts.filter(pc.is_valid(parts))
        return pa.table(
            {
                "owner": pc.struct_field(parts, "owner"),
                "repo": pc.struct_field(parts, "repo"),
                "version": pc.struct_field(parts, "version"),
            }
        )

    parsed = ds.map_batches(parse, batch_format="pyarrow")
    n_refs = parsed.groupby(["owner", "repo"]).aggregate(Count(alias_name="n_refs")).to_pandas()
    triples = (
        parsed.groupby(["owner", "repo", "version"]).aggregate(Count(alias_name="_n")).to_pandas()
    )
    nv = triples.groupby(["owner", "repo"]).size().reset_index(name="n_versions")
    out = n_refs.merge(nv, on=["owner", "repo"])
    out = out.sort_values(
        ["n_refs", "owner", "repo"], ascending=[False, True, True], kind="mergesort"
    ).head(30).reset_index(drop=True)
    return out[["owner", "repo", "n_refs", "n_versions"]].astype(
        {"n_refs": "int64", "n_versions": "int64"}
    )


Q_CI_ACTIONS_PARSED_SQL = f"""
WITH t AS (
  SELECT coalesce(text, '') AS text FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet')
), refs AS (
  -- same external rule + per-turn keep-first dedupe as the pipeline
  -- (the local ./ rule's surfaces never collide with external ones)
  SELECT unnest(list_distinct(
    regexp_extract_all(text, '\\buses:[ \t]*[''"]?([A-Za-z0-9_][A-Za-z0-9_.-]*(?:/[A-Za-z0-9_.-]+)+@[A-Za-z0-9._/-]+)', 1)
  )) AS ref FROM t
), p AS (
  SELECT regexp_extract(ref, '^([^/]+)/([^/@]+)(?:/[^@]+)?@(.+)$', 1) AS owner,
         regexp_extract(ref, '^([^/]+)/([^/@]+)(?:/[^@]+)?@(.+)$', 2) AS repo,
         regexp_extract(ref, '^([^/]+)/([^/@]+)(?:/[^@]+)?@(.+)$', 3) AS version
  FROM refs
  WHERE regexp_matches(ref, '^([^/]+)/([^/@]+)(?:/[^@]+)?@(.+)$')
)
SELECT owner, repo, count(*)::BIGINT AS n_refs,
       count(DISTINCT version)::BIGINT AS n_versions
FROM p GROUP BY owner, repo
ORDER BY n_refs DESC, owner, repo LIMIT 30
"""


def q_image_tags(sf_dir: str) -> pd.DataFrame:
    """Container-image ref parse (the compose/helm image-ref repo:tag
    split, deps/extractors/docker_compose.py:43-58): extract uses_image
    surfaces from the synth transcripts, split the single possible
    ``:tag`` suffix (the name charset excludes ``:``), and count refs
    per (repo, tag); untagged refs keep tag = ''."""
    from ..stages.extract import extract_mention_rows
    from .kg import normalized_turns_ds

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    ds = normalized_turns_ds(data_dir).map_batches(
        lambda b: extract_mention_rows(
            b, entity_names=(), literal_specs=(("images", "uses_image"),)
        ),
        batch_format="pyarrow",
    )

    def parse(b: pd.DataFrame) -> pd.DataFrame:
        s = b["mention"].str.partition(":")
        return pd.DataFrame({"repo": s[0], "tag": s[2]})

    parsed = ds.map_batches(parse, batch_format="pandas")
    out = (
        parsed.groupby(["repo", "tag"]).aggregate(Count(alias_name="n_refs")).to_pandas()
    )
    out = out.sort_values(
        ["n_refs", "repo", "tag"], ascending=[False, True, True], kind="mergesort"
    ).head(30).reset_index(drop=True)
    return out[["repo", "tag", "n_refs"]].astype({"n_refs": "int64"})


Q_IMAGE_TAGS_SQL = f"""
WITH t AS (
  SELECT coalesce(text, '') AS text FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet')
), refs AS (
  SELECT unnest(list_distinct(
    regexp_extract_all(text, '\\bimage:[ \t]*([a-z0-9]+(?:[._-][a-z0-9]+)*(?:/[a-z0-9]+(?:[._-][a-z0-9]+)*)*:[A-Za-z0-9_][A-Za-z0-9._-]*|[a-z0-9]+(?:[._-][a-z0-9]+)*(?:/[a-z0-9]+(?:[._-][a-z0-9]+)*)+)', 1)
    || regexp_extract_all(text, '\\bFROM[ \t]+([a-z0-9]+(?:[._-][a-z0-9]+)*(?:/[a-z0-9]+(?:[._-][a-z0-9]+)*)*:[A-Za-z0-9_][A-Za-z0-9._-]*|[a-z0-9]+(?:[._-][a-z0-9]+)*(?:/[a-z0-9]+(?:[._-][a-z0-9]+)*)+)', 1)
  )) AS ref FROM t
), p AS (
  SELECT CASE WHEN strpos(ref, ':') > 0 THEN substr(ref, 1, strpos(ref, ':') - 1) ELSE ref END AS repo,
         CASE WHEN strpos(ref, ':') > 0 THEN substr(ref, strpos(ref, ':') + 1) ELSE '' END AS tag
  FROM refs
)
SELECT repo, tag, count(*)::BIGINT AS n_refs
FROM p GROUP BY repo, tag
ORDER BY n_refs DESC, repo, tag LIMIT 30
"""


REGISTRY.update(
    {
        "q_ci_actions_parsed": (q_ci_actions_parsed, Q_CI_ACTIONS_PARSED_SQL),
        "q_image_tags": (q_image_tags, Q_IMAGE_TAGS_SQL),
    }
)


# (rule kind labels, positional with extractors/symbols._RULES)
_SYMBOL_RULE_KINDS = (
    "py_def",
    "class_def",
    "js_function",
    "go_func",
    "go_method",
    "rust_fn",
    "struct_def",
)


def q_symbol_defs(sf_dir: str) -> pd.DataFrame:
    """Per-language symbol-definition inventory — the reference's
    tree-sitter symbol table rolled up by node kind (indexer/
    symbols.py:216-291 emits (symbol, kind) per language; Go receiver
    methods become Type.Name). Applies each of the symbols family's
    seven rules independently (per-turn per-rule dedupe, like the
    family's cross-rule keep-first but kind-attributed) and reports
    mention + distinct-symbol counts per definition kind."""
    from ..extractors.symbols import _RULES
    from .kg import normalized_turns_ds

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))

    def parse(b: pa.Table) -> pa.Table:
        texts = b["text"]
        kinds: list[str] = []
        syms: list[str] = []
        for (rx, is_recv, _gate), kind in zip(_RULES, _SYMBOL_RULE_KINDS):
            # one vectorized RE2 candidate mask per rule; Python finditer
            # only on the (rare) matching rows — the appendix-path shape
            mask = pc.fill_null(pc.match_substring_regex(texts, rx.pattern), False)
            cand = texts.filter(mask).to_pylist()
            for t in cand:
                seen: set[str] = set()
                for m in rx.finditer(t):
                    s = f"{m.group(1)}.{m.group(2)}" if is_recv else m.group(1)
                    if s not in seen:
                        seen.add(s)
                        kinds.append(kind)
                        syms.append(s)
        return pa.table(
            {"def_kind": pa.array(kinds, pa.string()), "symbol": pa.array(syms, pa.string())}
        )

    rows = normalized_turns_ds(data_dir).map_batches(parse, batch_format="pyarrow")
    pair = rows.groupby(["def_kind", "symbol"]).aggregate(Count(alias_name="n")).to_pandas()
    out = (
        pair.groupby("def_kind")
        .agg(n_mentions=("n", "sum"), n_symbols=("symbol", "size"))
        .reset_index()
        .sort_values("def_kind", kind="mergesort")
        .reset_index(drop=True)
    )
    return out.astype({"n_mentions": "int64", "n_symbols": "int64"})


Q_SYMBOL_DEFS_SQL = f"""
WITH t AS (
  SELECT coalesce(text, '') AS text FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet')
), r AS (
  SELECT 'py_def' AS def_kind, unnest(list_distinct(
    regexp_extract_all(text, '\\bdef[ \t]+([A-Za-z_][A-Za-z0-9_]*)\\(', 1))) AS symbol FROM t
  UNION ALL SELECT 'class_def', unnest(list_distinct(
    regexp_extract_all(text, '\\bclass[ \t]+([A-Za-z_][A-Za-z0-9_]*)[ \t]*[:({{]', 1))) FROM t
  UNION ALL SELECT 'js_function', unnest(list_distinct(
    regexp_extract_all(text, '\\bfunction[ \t]+([A-Za-z_][A-Za-z0-9_]*)\\(', 1))) FROM t
  UNION ALL SELECT 'go_func', unnest(list_distinct(
    regexp_extract_all(text, '\\bfunc[ \t]+([A-Za-z_][A-Za-z0-9_]*)\\(', 1))) FROM t
  UNION ALL SELECT 'go_method', unnest(list_distinct(list_transform(
    regexp_extract_all(text, '\\bfunc[ \t]+\\([A-Za-z_][A-Za-z0-9_]*[ \t]+\\*?[A-Za-z_][A-Za-z0-9_]*\\)[ \t]+[A-Za-z_][A-Za-z0-9_]*\\('),
    x -> regexp_replace(x, '^\\bfunc[ \t]+\\([A-Za-z_][A-Za-z0-9_]*[ \t]+\\*?([A-Za-z_][A-Za-z0-9_]*)\\)[ \t]+([A-Za-z_][A-Za-z0-9_]*)\\($', '\\1.\\2')
  ))) FROM t
  UNION ALL SELECT 'rust_fn', unnest(list_distinct(
    regexp_extract_all(text, '\\bfn[ \t]+([A-Za-z_][A-Za-z0-9_]*)[(<]', 1))) FROM t
  UNION ALL SELECT 'struct_def', unnest(list_distinct(
    regexp_extract_all(text, '\\bstruct[ \t]+([A-Za-z_][A-Za-z0-9_]*)[ \t]*\\{{', 1))) FROM t
)
SELECT def_kind, count(*)::BIGINT AS n_mentions,
       count(DISTINCT symbol)::BIGINT AS n_symbols
FROM r GROUP BY def_kind ORDER BY def_kind
"""


REGISTRY.update({"q_symbol_defs": (q_symbol_defs, Q_SYMBOL_DEFS_SQL)})


def q_hcl_resources(sf_dir: str) -> pd.DataFrame:
    """HCL block-declaration inventory — the reference's hcl handler
    block_type/labels hierarchy (handlers/hcl.py:59-120) and terraform
    deps extractor (deps/extractors/terraform.py) rolled up by block
    kind: mention + distinct-address counts for resource vs data blocks
    whose TYPE passes the identifier-shape (linkability) gate. Applies
    each of the hcl_blocks family's rules independently with per-turn
    per-rule dedupe (the kind-attributed twin of the family's
    cross-rule keep-first, same construction as q_symbol_defs)."""
    from ..extractors.hcl_blocks import _RULES, _type_ok
    from .kg import normalized_turns_ds

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))

    def parse(b: pa.Table) -> pa.Table:
        texts = b["text"]
        kinds: list[str] = []
        addrs: list[str] = []
        for (rx, _gate), kind in zip(_RULES, ("resource", "data")):
            mask = pc.fill_null(pc.match_substring_regex(texts, rx.pattern), False)
            cand = texts.filter(mask).to_pylist()
            for t in cand:
                seen: set[str] = set()
                for m in rx.finditer(t):
                    if not _type_ok(m.group(1)):
                        continue
                    s = f"{m.group(1)}.{m.group(2)}"
                    if s not in seen:
                        seen.add(s)
                        kinds.append(kind)
                        addrs.append(s)
        return pa.table(
            {"block_kind": pa.array(kinds, pa.string()), "address": pa.array(addrs, pa.string())}
        )

    rows = normalized_turns_ds(data_dir).map_batches(parse, batch_format="pyarrow")
    pair = rows.groupby(["block_kind", "address"]).aggregate(Count(alias_name="n")).to_pandas()
    out = (
        pair.groupby("block_kind")
        .agg(n_mentions=("n", "sum"), n_addresses=("address", "size"))
        .reset_index()
        .sort_values("block_kind", kind="mergesort")
        .reset_index(drop=True)
    )
    return out.astype({"n_mentions": "int64", "n_addresses": "int64"})


Q_HCL_RESOURCES_SQL = f"""
WITH t AS (
  SELECT coalesce(text, '') AS text FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet')
), r AS (
  SELECT 'resource' AS block_kind, unnest(list_distinct(list_transform(
    regexp_extract_all(text, '\\bresource[ \\t]+"[A-Za-z_][A-Za-z0-9_]*"[ \\t]+"[A-Za-z_][A-Za-z0-9_-]*"'),
    x -> regexp_replace(x, '^resource[ \\t]+"([A-Za-z_][A-Za-z0-9_]*)"[ \\t]+"([A-Za-z_][A-Za-z0-9_-]*)"$', '\\1.\\2')
  ))) AS address FROM t
  UNION ALL SELECT 'data', unnest(list_distinct(list_transform(
    regexp_extract_all(text, '\\bdata[ \\t]+"[A-Za-z_][A-Za-z0-9_]*"[ \\t]+"[A-Za-z_][A-Za-z0-9_-]*"'),
    x -> regexp_replace(x, '^data[ \\t]+"([A-Za-z_][A-Za-z0-9_]*)"[ \\t]+"([A-Za-z_][A-Za-z0-9_-]*)"$', '\\1.\\2')
  ))) FROM t
), g AS (
  -- identifier-shape gate on the TYPE (split on the FIRST dot; labels
  -- may contain '-') — same rules as the shared qualified root gate
  SELECT block_kind, address, split_part(address, '.', 1) AS root FROM r
), f AS (
  SELECT block_kind, address FROM g
  WHERE regexp_matches(root, '[a-zA-Z0-9]+_[a-zA-Z0-9]+')
     OR (length(root) >= 6 AND regexp_matches(substr(root, 1, 1), '[a-z]')
         AND regexp_matches(root, '[a-z][A-Z]'))
     OR (length(root) >= 8 AND regexp_matches(root, '[A-Z][a-z]+[A-Z]'))
)
SELECT block_kind, count(*)::BIGINT AS n_mentions,
       count(DISTINCT address)::BIGINT AS n_addresses
FROM f GROUP BY block_kind ORDER BY block_kind
"""


REGISTRY.update({"q_hcl_resources": (q_hcl_resources, Q_HCL_RESOURCES_SQL)})


# n-gram width: real decontamination uses 8-13; the synthetic corpus is
# a bounded-vocab word soup where 8-grams never collide (an all-zero,
# vacuous check), so the GATE runs the same math at width 3 — the SQL
# below is generated from this constant, so both sides move together
_DECON_N = 3
import re  # noqa: E402  (tail-of-module operator section)
_DECON_SPLIT = re.compile(r"[^a-z0-9_]+", re.ASCII)
# explicit ASCII lower (see functions/hashing._ASCII_LOWER): only
# U+0130 'İ' can otherwise leak an ASCII 'i' into the word stream
from ..functions.hashing import _ASCII_LOWER as _ASCII_LOWER_TABLE  # noqa: E402
_DECON_BENCH_SOURCE = "src0"  # the held-out "benchmark" slice


def _doc_ngram_set(text: str) -> set[str]:
    ws = [w for w in _DECON_SPLIT.split((text or "").translate(_ASCII_LOWER_TABLE)) if w]
    return {" ".join(ws[i : i + _DECON_N]) for i in range(len(ws) - _DECON_N + 1)}


def q_doc_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Training-data DECONTAMINATION: flag corpus documents sharing any
    8-gram with a held-out benchmark slice (source='src0') — the
    standard n-gram-overlap contamination rule used before pretraining.
    Shape at scale: the benchmark side is small by construction, so its
    distinct n-gram set is built with per-block pre-aggregation and
    broadcast ONCE (ray.put; a Bloom filter drops in for set membership
    when the benchmark outgrows a plain set — stages/sketch.py has the
    builder); the corpus side streams through one map_batches with a
    worker-cached deref. No shuffle anywhere."""
    from ..functions.broadcast import deref_cached

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    bench = ds.filter(expr=f"source == '{_DECON_BENCH_SOURCE}'")

    def block_ngrams(b: pa.Table) -> pa.Table:
        s: set[str] = set()
        for t in b["text"].to_pylist():
            s |= _doc_ngram_set(t)
        return pa.table({"ng": pa.array(sorted(s), pa.string())})

    bench_set = frozenset(
        bench.map_batches(block_ngrams, batch_format="pyarrow").to_pandas()["ng"]
    )
    set_ref = ray.put(bench_set)

    def flag(b: pa.Table) -> pa.Table:
        bs = deref_cached(set_ref)
        srcs = b["source"].to_pylist()
        hits = np.zeros(b.num_rows, dtype=np.int64)
        for i, t in enumerate(b["text"].to_pylist()):
            ngs = _doc_ngram_set(t)
            if ngs:
                hits[i] = len(ngs & bs)
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "contaminated": pa.array((hits > 0).astype(np.int64), pa.int64()),
                "n_hits": pa.array(hits, pa.int64()),
            }
        )

    corpus = ds.filter(expr=f"source != '{_DECON_BENCH_SOURCE}'")
    out = (
        corpus.map_batches(flag, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("contaminated", alias_name="n_contaminated_docs"),
            Sum("n_hits", alias_name="n_hits"),
        )
        .to_pandas()
        .sort_values("source", kind="mergesort")
        .reset_index(drop=True)
    )
    return out.astype(
        {"n_docs": "int64", "n_contaminated_docs": "int64", "n_hits": "int64"}
    )


Q_DOC_DECONTAMINATE_SQL = f"""
WITH w AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(translate(coalesce(text, ''), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[^a-z0-9_]+'), x -> x != '') AS ws
  FROM documents
), n AS (
  SELECT doc_id, source,
         list_distinct(list_transform(
           range(1, greatest(len(ws) - {_DECON_N - 2}, 1)),
           i -> array_to_string(list_slice(ws, i, i + {_DECON_N - 1}), ' ')
         )) AS ngl
  FROM w
), b2 AS (
  -- coalesce: zero src0 docs must yield an EMPTY benchmark set (0
  -- hits everywhere, like the pipeline's empty broadcast set), not a
  -- NULL that nulls every list_intersect
  SELECT coalesce(list_distinct(flatten(list(ngl))), []) AS bl FROM n WHERE source = 'src0'
)
SELECT n.source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN len(list_intersect(n.ngl, b2.bl)) > 0 THEN 1 ELSE 0 END)::BIGINT AS n_contaminated_docs,
       sum(len(list_intersect(n.ngl, b2.bl)))::BIGINT AS n_hits
FROM n, b2 WHERE n.source <> 'src0'
GROUP BY n.source ORDER BY n.source
"""


REGISTRY.update({"q_doc_decontaminate": (q_doc_decontaminate, Q_DOC_DECONTAMINATE_SQL)})


def q_events_props_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured column operator: project the integer field
    ``k`` out of the events table's JSON ``props`` column (DuckDB as
    the vectorized kernel inside map_batches — stages/jsonops.py; Arrow
    registers zero-copy, the projection runs vectorized C++) and
    aggregate per event_type. Kernel and oracle share DuckDB's
    json_extract semantics by construction."""
    from ..stages.jsonops import extract_json_field

    ds = _read(sf_dir, "events", ["event_type", "props"])
    ds = ds.map_batches(
        lambda b: extract_json_field(b, "props", "k", "k_val"),
        batch_format="pyarrow",
    )
    out = (
        ds.groupby("event_type")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("k_val", alias_name="sum_k"),
            Min("k_val", alias_name="min_k"),
            Max("k_val", alias_name="max_k"),
        )
        .to_pandas()
        .sort_values("event_type", kind="mergesort")
        .reset_index(drop=True)
    )
    return out.astype(
        {"n_events": "int64", "sum_k": "int64", "min_k": "int64", "max_k": "int64"}
    )


Q_EVENTS_PROPS_STATS_SQL = """
SELECT event_type, count(*) AS n_events,
       sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       min(json_extract(props, '$.k')::BIGINT)::BIGINT AS min_k,
       max(json_extract(props, '$.k')::BIGINT)::BIGINT AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


REGISTRY.update({"q_events_props_stats": (q_events_props_stats, Q_EVENTS_PROPS_STATS_SQL)})


# ---------------------------------------------------------------------------
# GitLab CI / Helm extraction families (reference deps/extractors/
# gitlab_ci.py include/local/template + extends chains, helm.py named
# templates) — parsed + aggregated, full SQL mirror (no export needed)
# ---------------------------------------------------------------------------


def q_gitlab_includes(sf_dir: str) -> pd.DataFrame:
    """GitLab CI include-resolution parse (reference gitlab_ci.py:67-176
    include/local/template forms): extract includes_config surfaces from
    the synth transcripts, split into (dir, file), and count refs +
    distinct files per directory."""
    from ..stages.extract import extract_mention_rows
    from .kg import normalized_turns_ds

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    ds = normalized_turns_ds(data_dir).map_batches(
        lambda b: extract_mention_rows(
            b, entity_names=(), literal_specs=(("gitlab_ci", "includes_config"),)
        ),
        batch_format="pyarrow",
    )

    def parse(b: pa.Table) -> pa.Table:
        parts = pc.extract_regex(b["mention"], r"^(?P<dir>(?:[^/]*/)*)(?P<file>[^/]+)$")
        parts = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
        parts = parts.filter(pc.is_valid(parts))
        return pa.table(
            {
                "dir": pc.struct_field(parts, "dir"),
                "file": pc.struct_field(parts, "file"),
            }
        )

    # consumed twice (refs + distinct groupby): pin the tiny parse result
    parsed = ds.map_batches(parse, batch_format="pyarrow").materialize()
    n = parsed.groupby("dir").aggregate(Count(alias_name="n_refs")).to_pandas()
    files = (
        parsed.groupby(["dir", "file"]).aggregate(Count(alias_name="_n")).to_pandas()
    )
    nf = files.groupby("dir").size().reset_index(name="n_files")
    out = n.merge(nf, on="dir")
    out = out.sort_values(
        ["n_refs", "dir"], ascending=[False, True], kind="mergesort"
    ).head(30).reset_index(drop=True)
    return out[["dir", "n_refs", "n_files"]].astype({"n_refs": "int64", "n_files": "int64"})


Q_GITLAB_INCLUDES_SQL = f"""
WITH t AS (
  SELECT coalesce(text, '') AS text FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet')
), refs AS (
  -- same three rules + per-turn keep-first dedupe as the pipeline
  SELECT unnest(list_distinct(
    regexp_extract_all(text, '\\binclude:[ \t]*[''"]?([A-Za-z0-9_][A-Za-z0-9_./-]*\\.ya?ml)', 1)
    || regexp_extract_all(text, '\\blocal:[ \t]*[''"]?(/?[A-Za-z0-9_][A-Za-z0-9_./-]*\\.ya?ml)', 1)
    || regexp_extract_all(text, '\\btemplate:[ \t]*[''"]?([A-Za-z0-9_][A-Za-z0-9_./-]*\\.ya?ml)', 1)
  )) AS ref FROM t
), p AS (
  SELECT regexp_extract(ref, '^((?:[^/]*/)*)([^/]+)$', 1) AS dir,
         regexp_extract(ref, '^((?:[^/]*/)*)([^/]+)$', 2) AS file
  FROM refs
)
SELECT dir, count(*)::BIGINT AS n_refs, count(DISTINCT file)::BIGINT AS n_files
FROM p GROUP BY dir
ORDER BY n_refs DESC, dir LIMIT 30
"""


def q_helm_templates(sf_dir: str) -> pd.DataFrame:
    """Helm named-template reference parse (reference helm.py:24-25
    _INCLUDE_RE/_TEMPLATE_RE over {{ include/template "name" }}):
    extract uses_helm_template surfaces, split chart prefix from the
    template path on the FIRST '.', count refs + distinct templates
    per chart."""
    from ..stages.extract import extract_mention_rows
    from .kg import normalized_turns_ds

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    ds = normalized_turns_ds(data_dir).map_batches(
        lambda b: extract_mention_rows(
            b, entity_names=(), literal_specs=(("helm_tpl", "uses_helm_template"),)
        ),
        batch_format="pyarrow",
    )

    def parse(b: pa.Table) -> pa.Table:
        parts = pc.extract_regex(b["mention"], r"^(?P<chart>[^.]+)\.(?P<tpl>.+)$")
        parts = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
        parts = parts.filter(pc.is_valid(parts))
        return pa.table(
            {
                "chart": pc.struct_field(parts, "chart"),
                "tpl": pc.struct_field(parts, "tpl"),
            }
        )

    # consumed twice (refs + distinct groupby): pin the tiny parse result
    parsed = ds.map_batches(parse, batch_format="pyarrow").materialize()
    n = parsed.groupby("chart").aggregate(Count(alias_name="n_refs")).to_pandas()
    tpls = (
        parsed.groupby(["chart", "tpl"]).aggregate(Count(alias_name="_n")).to_pandas()
    )
    nt = tpls.groupby("chart").size().reset_index(name="n_templates")
    out = n.merge(nt, on="chart")
    out = out.sort_values(
        ["n_refs", "chart"], ascending=[False, True], kind="mergesort"
    ).head(30).reset_index(drop=True)
    return out[["chart", "n_refs", "n_templates"]].astype(
        {"n_refs": "int64", "n_templates": "int64"}
    )


Q_HELM_TEMPLATES_SQL = f"""
WITH t AS (
  SELECT coalesce(text, '') AS text FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet')
), refs AS (
  -- include rule then template rule, per-turn keep-first dedupe
  SELECT unnest(list_distinct(
    regexp_extract_all(text, '\\{{\\{{-?[ \t]*include[ \t]+"([^"\n]+)"', 1)
    || regexp_extract_all(text, '\\{{\\{{-?[ \t]*template[ \t]+"([^"\n]+)"', 1)
  )) AS ref FROM t
), p AS (
  SELECT regexp_extract(ref, '^([^.]+)\\.(.+)$', 1) AS chart,
         regexp_extract(ref, '^([^.]+)\\.(.+)$', 2) AS tpl
  FROM refs
  WHERE regexp_matches(ref, '^([^.]+)\\.(.+)$')
)
SELECT chart, count(*)::BIGINT AS n_refs, count(DISTINCT tpl)::BIGINT AS n_templates
FROM p GROUP BY chart
ORDER BY n_refs DESC, chart LIMIT 30
"""


REGISTRY.update(
    {
        "q_gitlab_includes": (q_gitlab_includes, Q_GITLAB_INCLUDES_SQL),
        "q_helm_templates": (q_helm_templates, Q_HELM_TEMPLATES_SQL),
    }
)


# ---------------------------------------------------------------------------
# Training-data quality ops, round 4: intra-document repetition metrics
# (Gopher/RefinedWeb-style repetition filters) + PII scrubbing transform
# ---------------------------------------------------------------------------

# flag thresholds (strict >): duplicate-word fraction and top-bigram
# mass; shared constants so pipeline and oracle move together
_REP_DUP_FRAC = 0.55
_REP_BIGRAM_FRAC = 0.20


def _repetition_metrics(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch repetition partials (module-level so the lockstep fuzz
    can drive the REAL kernel against the oracle SQL's per-doc replay)."""
    words = df["text"].fillna("").str.findall(r"[A-Za-z0-9_]+")
    ex = df[["doc_id", "lang"]].copy()
    n_docs = len(df)
    nw = words.str.len().to_numpy(dtype=np.int64) if n_docs else np.zeros(0, np.int64)
    ex["n_words"] = nw
    # ONE factorize over the batch's flattened words; everything
    # below runs on int codes (the extraction ordinal trick) — no
    # per-row Python loop. Word identity == code identity, and the
    # old "w1 w2" string key == the (code1, code2) pair key because
    # words contain no spaces, so counts are bit-identical.
    allw = (
        np.concatenate(words.to_numpy())
        if n_docs and nw.sum()
        else np.zeros(0, dtype=object)
    )
    codes, uniques = pd.factorize(allw)
    codes = codes.astype(np.int64)
    K = np.int64(max(len(uniques), 1))
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), nw)
    # distinct words per doc: unique (doc, code) ordinals per doc
    upairs = np.unique(doc_idx * K + codes)
    ex["n_uniq"] = (
        np.bincount(upairs // K, minlength=n_docs).astype(np.int64)
        if len(upairs)
        else np.zeros(n_docs, np.int64)
    )
    # top bigram count per doc: consecutive code-pair ordinals,
    # pairs crossing doc boundaries masked out; sorted uniques give
    # per-doc runs for one maximum.reduceat
    topbg = np.zeros(n_docs, dtype=np.int64)
    if len(codes) >= 2:
        same = doc_idx[:-1] == doc_idx[1:]
        if same.any():
            # two-step ordinal: pair code first (< K^2 <= W^2, safe),
            # then doc*P + pair (< n_docs*W, safe) — the naive
            # doc*K^2 key can overflow int64 on huge batches
            pairs = codes[:-1][same] * K + codes[1:][same]
            pcodes, puniq = pd.factorize(pairs)
            P = np.int64(max(len(puniq), 1))
            keys = doc_idx[:-1][same] * P + pcodes.astype(np.int64)
            ukeys, counts = np.unique(keys, return_counts=True)
            docs = ukeys // P
            starts = np.flatnonzero(np.r_[True, docs[1:] != docs[:-1]])
            topbg[docs[starts]] = np.maximum.reduceat(counts, starts)
    ex["top_bigram"] = topbg
    dup_frac = np.where(
        ex["n_words"] > 0, 1.0 - ex["n_uniq"] / ex["n_words"], 0.0
    )
    bg_frac = np.where(
        ex["n_words"] >= 2, ex["top_bigram"] * 2.0 / ex["n_words"], 0.0
    )
    ex["flagged"] = (
        (dup_frac > _REP_DUP_FRAC) | (bg_frac > _REP_BIGRAM_FRAC)
    ).astype("int64")
    g = ex.groupby("lang", sort=True).agg(
        n_docs=("doc_id", "size"),
        n_flagged=("flagged", "sum"),
        sum_words=("n_words", "sum"),
        sum_uniq=("n_uniq", "sum"),
        sum_top_bigram=("top_bigram", "sum"),
    )
    return g.reset_index()


def q_doc_repetition(sf_dir: str) -> pd.DataFrame:
    """Per-language repetition report over documents: duplicate-word
    fraction (1 - distinct/total) and top-bigram mass (2 * occurrences
    of the most frequent bigram / words) per doc, flag counts above the
    thresholds, and INTEGER-EXACT corpus sums (sum_words / sum_uniq /
    sum_top_bigram) so the value hash never depends on float summation
    order. The repetition-filter shape large-scale corpus cleaning uses
    (Gopher-style); each doc is one row, so per-batch pandas computes
    complete docs and only the tiny per-lang partials shuffle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    parts = ds.map_batches(_repetition_metrics, batch_format="pandas").to_pandas()
    out = parts.groupby("lang", sort=True).sum().reset_index()
    return out.astype(
        {
            c: "int64"
            for c in ("n_docs", "n_flagged", "sum_words", "sum_uniq", "sum_top_bigram")
        }
    )


Q_DOC_REPETITION_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         regexp_extract_all(coalesce(text, ''), '[A-Za-z0-9_]+') AS words
  FROM documents
), w AS (
  SELECT doc_id, lang, len(words)::BIGINT AS n_words,
         len(list_distinct(words))::BIGINT AS n_uniq, words
  FROM d
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(words), 1)),
                               i -> words[i] || ' ' || words[i + 1])) AS bigram
  FROM d WHERE len(words) >= 2
), bgc AS (
  SELECT doc_id, max(c)::BIGINT AS top_bigram FROM (
    SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
  ) GROUP BY doc_id
), m AS (
  SELECT w.doc_id, w.lang, n_words, n_uniq,
         coalesce(bgc.top_bigram, 0) AS top_bigram,
         CASE WHEN n_words > 0 THEN 1.0 - n_uniq * 1.0 / n_words ELSE 0.0 END AS dup_frac,
         CASE WHEN n_words >= 2 THEN coalesce(bgc.top_bigram, 0) * 2.0 / n_words ELSE 0.0 END AS bg_frac
  FROM w LEFT JOIN bgc ON w.doc_id = bgc.doc_id
)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN dup_frac > {_REP_DUP_FRAC} OR bg_frac > {_REP_BIGRAM_FRAC}
                THEN 1 ELSE 0 END)::BIGINT AS n_flagged,
       sum(n_words)::BIGINT AS sum_words,
       sum(n_uniq)::BIGINT AS sum_uniq,
       sum(top_bigram)::BIGINT AS sum_top_bigram
FROM m GROUP BY lang ORDER BY lang
"""


# PII scrubbing: the redaction regexes are the urls/emails families'
# own patterns (extractors/urls.py, extractors/emails.py shapes) —
# URL first, then EMAIL, both sides in the same order
_PII_URL = r"https?://[^\s\"'<>\)\]]+"
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def q_pii_scrub(sf_dir: str):
    """PII-scrubbing transform over transcript turns: URLs then emails
    replaced with [URL] / [EMAIL] placeholders (RE2 kernels both sides:
    Arrow replace_substring_regex == DuckDB regexp_replace 'g'). Returns
    the FULL scrubbed table so the value hash checks the transform
    byte-for-byte, not just counts — the shape of corpus PII removal at
    scale (stateless map, no shuffle)."""
    from ..sources.synth import transcript_files

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(
        transcript_files(data_dir), columns=["conv_id", "turn_idx", "text"]
    )

    def scrub(b: pa.Table) -> pa.Table:
        t = pc.replace_substring_regex(
            b["text"], pattern=_PII_URL, replacement="[URL]"
        )
        t = pc.replace_substring_regex(t, pattern=_PII_EMAIL, replacement="[EMAIL]")
        return pa.table(
            {"conv_id": b["conv_id"], "turn_idx": b["turn_idx"], "text": t}
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


Q_PII_SCRUB_SQL = f"""
SELECT conv_id, turn_idx,
       regexp_replace(
         regexp_replace(text, '{_PII_URL.replace("'", "''")}', '[URL]', 'g'),
         '{_PII_EMAIL}', '[EMAIL]', 'g') AS text
FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet')
"""


REGISTRY.update(
    {
        "q_doc_repetition": (q_doc_repetition, Q_DOC_REPETITION_SQL),
        "q_pii_scrub": (q_pii_scrub, Q_PII_SCRUB_SQL),
    }
)


# domain-mixing rates for q_doc_quota_sample (shared pipeline/oracle)
_QUOTA_RATES = {"en": 0.5, "de": 0.25, "fr": 0.75}
_QUOTA_DEFAULT = 1.0


def q_doc_quota_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic per-language quota sampling (domain mixing for
    training corpora): keep doc iff md5-bucket(doc_id) < rate(lang) *
    16^12 (stages/split.quota_sample — the assign_splits hash rule, so
    the oracle RECOMPUTES membership in SQL instead of trusting an
    export). Per-language in/out counts + sampled char mass, all
    integer-exact."""
    from ..stages.split import quota_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    sampled = quota_sample(ds, "doc_id", "lang", _QUOTA_RATES, _QUOTA_DEFAULT)

    def _agg(d: ray.data.Dataset, n_col: str, chars_col: str) -> pd.DataFrame:
        from ray.data.aggregate import Count as _C, Sum as _S

        out = (
            d.groupby("lang")
            .aggregate(_C(alias_name=n_col), _S("n_chars", alias_name=chars_col))
            .to_pandas()
        )
        return out

    full = _agg(ds, "n_docs", "_chars_all").drop(columns=["_chars_all"])
    samp = _agg(sampled, "n_sampled", "sum_chars_sampled")
    out = full.merge(samp, on="lang", how="left")
    out["n_sampled"] = out["n_sampled"].fillna(0).astype("int64")
    out["sum_chars_sampled"] = out["sum_chars_sampled"].fillna(0).astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("lang", kind="mergesort").reset_index(drop=True)


_QUOTA_CASE = " ".join(
    f"WHEN lang = '{lang}' THEN {rate}" for lang, rate in _QUOTA_RATES.items()
)

Q_DOC_QUOTA_SAMPLE_SQL = f"""
WITH b AS (
  SELECT doc_id, lang, n_chars,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::UBIGINT AS bucket,
         CASE {_QUOTA_CASE} ELSE {_QUOTA_DEFAULT} END AS rate
  FROM documents
)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN bucket < rate * power(16, 12) THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
       coalesce(sum(CASE WHEN bucket < rate * power(16, 12) THEN n_chars END), 0)::BIGINT AS sum_chars_sampled
FROM b GROUP BY lang ORDER BY lang
"""


REGISTRY.update(
    {"q_doc_quota_sample": (q_doc_quota_sample, Q_DOC_QUOTA_SAMPLE_SQL)}
)


def q_embedding_semdedup(sf_dir: str) -> pd.DataFrame:
    """SemDeDup-style semantic dedup over the embeddings table: k-means
    clusters (driver sample, seeded) -> broadcast-centroid assignment ->
    within-cluster cosine keep-first dedup (stages/dedup.semantic_dedup).
    Exports the centroids; the oracle INDEPENDENTLY re-derives both the
    assignment (argmax of 6-decimal-rounded cosine, lower-cluster
    tiebreak) and the drops (lower-id neighbor with rounded cosine >=
    threshold) in SQL from raw embeddings + exported centroids. Output:
    per-cluster vec/drop counts + integer-exact dropped-id sum."""
    from ..stages.dedup import semantic_dedup

    t = pq.read_table(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    order = pc.sort_indices(t["vec_id"])
    sample = vec_matrix(pc.take(t["embedding"], order).slice(0, 2000))
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    flags, cents = semantic_dedup(ds, sample, threshold=0.9, n_clusters=8)
    if tier_for_sf_dir(sf_dir) == "correctness":
        _export_table(
            sf_dir,
            "semdedup_centroids",
            pa.table(
                {
                    "cluster": pa.array(range(len(cents)), pa.int32()),
                    "centroid": pa.array(
                        [list(map(float, c)) for c in cents],
                        pa.list_(pa.float64()),
                    ),
                }
            ),
        )
    df = flags.to_pandas()
    g = df.groupby("cluster", sort=True).agg(
        n_vecs=("vec_id", "size"),
        n_dropped=("dropped", "sum"),
        sum_dropped_ids=("vec_id", lambda s: int(s[df.loc[s.index, "dropped"]].sum())),
    )
    out = g.reset_index()
    return out.astype(
        {
            "cluster": "int32",
            "n_vecs": "int64",
            "n_dropped": "int64",
            "sum_dropped_ids": "int64",
        }
    )


Q_EMBEDDING_SEMDEDUP_SQL = f"""
WITH c AS (
  SELECT cluster, centroid FROM read_parquet('{_EXP}/semdedup_centroids.parquet')
), a AS (
  -- assignment: argmax of ROUNDED cosine, ties to the LOWER cluster id
  SELECT vec_id, embedding, cluster FROM (
    SELECT e.vec_id, e.embedding, c.cluster,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.centroid), 6) DESC,
                      c.cluster ASC
           ) AS rn
    FROM embeddings e CROSS JOIN c
  ) WHERE rn = 1
), d AS (
  SELECT a.cluster, a.vec_id,
         EXISTS (
           SELECT 1 FROM a b
           WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
             AND round(list_cosine_similarity(b.embedding::DOUBLE[], a.embedding::DOUBLE[]), 6) >= 0.9
         ) AS dropped
  FROM a
)
SELECT cluster, count(*)::BIGINT AS n_vecs,
       sum(CASE WHEN dropped THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
       coalesce(sum(CASE WHEN dropped THEN vec_id END), 0)::BIGINT AS sum_dropped_ids
FROM d GROUP BY cluster ORDER BY cluster
"""


REGISTRY.update(
    {"q_embedding_semdedup": (q_embedding_semdedup, Q_EMBEDDING_SEMDEDUP_SQL)}
)


# ---------------------------------------------------------------------------
# ArgoCD application-source refs + reference-style markdown links
# (reference deps/extractors/argocd.py:24-262 Application/AppSet/
# AppProject source edges; deps/extractors/markdown.py:268-326 reference
# link resolution) — parsed + aggregated, full SQL mirror
# ---------------------------------------------------------------------------


def q_argocd_sources(sf_dir: str) -> pd.DataFrame:
    """ArgoCD reference parse (reference argocd.py:115-159 repoURL/
    chart/path + :84-96 project edges): extract argo_ref surfaces from
    the synth transcripts, recover the reference's metadata.kind by
    surface shape (``://`` or ``git@`` -> repo, ``/`` -> path, bare
    word -> chart/project name), and count refs + distinct targets per
    kind."""
    from ..stages.extract import extract_mention_rows
    from .kg import normalized_turns_ds

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    ds = normalized_turns_ds(data_dir).map_batches(
        lambda b: extract_mention_rows(
            b, entity_names=(), literal_specs=(("argocd", "argo_ref"),)
        ),
        batch_format="pyarrow",
    )

    def classify(b: pa.Table) -> pa.Table:
        m = b["mention"]
        is_repo = pc.or_(
            pc.match_substring(m, "://"), pc.starts_with(m, "git@")
        )
        is_path = pc.match_substring(m, "/")
        kind = pc.if_else(
            is_repo, "repo", pc.if_else(is_path, "path", "name")
        )
        return pa.table({"kind": kind, "ref": m})

    # consumed twice (refs + distinct groupby): pin the tiny parse result
    parsed = ds.map_batches(classify, batch_format="pyarrow").materialize()
    n = parsed.groupby("kind").aggregate(Count(alias_name="n_refs")).to_pandas()
    tgts = (
        parsed.groupby(["kind", "ref"]).aggregate(Count(alias_name="_n")).to_pandas()
    )
    nt = tgts.groupby("kind").size().reset_index(name="n_targets")
    out = n.merge(nt, on="kind").sort_values("kind", kind="mergesort")
    return out[["kind", "n_refs", "n_targets"]].astype(
        {"n_refs": "int64", "n_targets": "int64"}
    ).reset_index(drop=True)


Q_ARGOCD_SOURCES_SQL = f"""
WITH t AS (
  SELECT coalesce(text, '') AS text FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet')
), refs AS (
  -- same four rules + per-turn keep-first dedupe as the pipeline
  SELECT unnest(list_distinct(
    regexp_extract_all(text, '\\brepoURL:[ \t]*[''"]?([A-Za-z][A-Za-z0-9+.-]*://[A-Za-z0-9._~:/@-]+|git@[A-Za-z0-9._-]+:[A-Za-z0-9._/-]+)', 1)
    || regexp_extract_all(text, '\\bchart:[ \t]*[''"]?([A-Za-z0-9][A-Za-z0-9._-]*)', 1)
    || regexp_extract_all(text, '\\bpath:[ \t]*[''"]?([A-Za-z0-9._-]+(?:/[A-Za-z0-9._-]+)*)', 1)
    || regexp_extract_all(text, '\\bproject:[ \t]*[''"]?([A-Za-z0-9][A-Za-z0-9._-]*)', 1)
  )) AS ref FROM t
), k AS (
  SELECT CASE WHEN ref LIKE '%://%' OR ref LIKE 'git@%' THEN 'repo'
              WHEN ref LIKE '%/%' THEN 'path'
              ELSE 'name' END AS kind, ref
  FROM refs
)
SELECT kind, count(*)::BIGINT AS n_refs, count(DISTINCT ref)::BIGINT AS n_targets
FROM k GROUP BY kind ORDER BY kind
"""


def q_md_reference_links(sf_dir: str) -> pd.DataFrame:
    """Reference-style markdown link resolution (reference
    markdown.py:268-326: full/collapsed reference links and reference
    images resolved through the document's ``[ref]: url`` definition
    table, non-local targets skipped): extract the RESOLVED targets via
    the md_refs family's two-pass extract, split into (dir, file), and
    count refs + distinct files per directory. The DuckDB oracle
    replays both passes: definitions via two zipped regexp_extract_all
    captures with keep-first-per-ref, usages joined per turn on the
    case-folded ref."""
    from ..stages.extract import extract_mention_rows
    from .kg import normalized_turns_ds

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    ds = normalized_turns_ds(data_dir).map_batches(
        lambda b: extract_mention_rows(
            b, entity_names=(), literal_specs=(("md_refs", "references_doc"),)
        ),
        batch_format="pyarrow",
    )

    def parse(b: pa.Table) -> pa.Table:
        parts = pc.extract_regex(b["mention"], r"^(?P<dir>(?:[^/]*/)*)(?P<file>[^/]+)$")
        parts = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
        parts = parts.filter(pc.is_valid(parts))
        return pa.table(
            {
                "dir": pc.struct_field(parts, "dir"),
                "file": pc.struct_field(parts, "file"),
            }
        )

    # consumed twice (refs + distinct groupby): pin the tiny parse result
    parsed = ds.map_batches(parse, batch_format="pyarrow").materialize()
    n = parsed.groupby("dir").aggregate(Count(alias_name="n_refs")).to_pandas()
    files = (
        parsed.groupby(["dir", "file"]).aggregate(Count(alias_name="_n")).to_pandas()
    )
    nf = files.groupby("dir").size().reset_index(name="n_files")
    out = n.merge(nf, on="dir")
    out = out.sort_values(
        ["n_refs", "dir"], ascending=[False, True], kind="mergesort"
    ).head(30).reset_index(drop=True)
    return out[["dir", "n_refs", "n_files"]].astype({"n_refs": "int64", "n_files": "int64"})


Q_MD_REFERENCE_LINKS_SQL = f"""
WITH t AS (
  SELECT row_number() OVER () AS rid, coalesce(text, '') AS text
  FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet')
), dl AS (
  SELECT rid,
    regexp_extract_all(text, '(?m)^[ \t]*\\[([^\\]\n]{{1,80}})\\]:[ \t]*([^ \t\r\n]{{1,200}})', 1) AS refs,
    regexp_extract_all(text, '(?m)^[ \t]*\\[([^\\]\n]{{1,80}})\\]:[ \t]*([^ \t\r\n]{{1,200}})', 2) AS tgts
  FROM t
), defs AS (
  -- keep-first per case-folded ref within a turn (extract()'s dict)
  SELECT rid, translate(refs[i], 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS ref, tgts[i] AS target
  FROM (SELECT rid, refs, tgts, unnest(generate_series(1, len(refs))) AS i FROM dl)
  QUALIFY row_number() OVER (PARTITION BY rid, translate(refs[i], 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') ORDER BY i) = 1
), uses AS (
  SELECT rid, translate(unnest(
      regexp_extract_all(text, '\\[[^\\]\n]{{1,80}}\\]\\[([^\\]\n]{{1,80}})\\]', 1)
      || regexp_extract_all(text, '\\[([^\\]\n]{{1,80}})\\]\\[\\]', 1)
  ), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS ref FROM t
), resolved AS (
  -- per-turn deduped resolved targets, cleaned per md_links.clean_target
  -- (http/mailto/pure-anchor skipped, #fragment stripped, empty dropped)
  SELECT DISTINCT u.rid, regexp_replace(d.target, '#.*', '') AS target
  FROM uses u JOIN defs d ON d.rid = u.rid AND d.ref = u.ref
  WHERE NOT regexp_matches(d.target, '^(https?://|mailto:|#)')
    AND regexp_replace(d.target, '#.*', '') != ''
), p AS (
  -- directory-only targets (trailing '/', no file segment) are DROPPED
  -- like the pipeline's extract_regex null filter — without the guard
  -- DuckDB's regexp_extract would return '' on no-match and count a
  -- phantom (dir='', file='') row the Arrow side never emits
  SELECT regexp_extract(target, '^((?:[^/]*/)*)([^/]+)$', 1) AS dir,
         regexp_extract(target, '^((?:[^/]*/)*)([^/]+)$', 2) AS file
  FROM resolved WHERE target NOT LIKE '%/'
)
SELECT dir, count(*)::BIGINT AS n_refs, count(DISTINCT file)::BIGINT AS n_files
FROM p GROUP BY dir
ORDER BY n_refs DESC, dir LIMIT 30
"""


REGISTRY.update(
    {
        "q_argocd_sources": (q_argocd_sources, Q_ARGOCD_SOURCES_SQL),
        "q_md_reference_links": (q_md_reference_links, Q_MD_REFERENCE_LINKS_SQL),
    }
)


def q_md_code_paths(sf_dir: str) -> pd.DataFrame:
    """Code-span / comment-line path extraction (reference
    markdown.py:328-361 _extract_code_spans + _looks_like_path and
    :367-409 code-block comment scanning): extract references_code
    surfaces, classify by extension (text after the last dot when the
    last segment carries one — '' for bare dir/name paths), and count
    refs + distinct paths per extension."""
    from ..stages.extract import extract_mention_rows
    from .kg import normalized_turns_ds

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    ds = normalized_turns_ds(data_dir).map_batches(
        lambda b: extract_mention_rows(
            b, entity_names=(), literal_specs=(("md_code_paths", "references_code"),)
        ),
        batch_format="pyarrow",
    )

    def parse(b: pa.Table) -> pa.Table:
        m = b["mention"]
        parts = pc.extract_regex(m, r"\.(?P<ext>[^./]*)$")
        parts = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
        # ascii_lower: Arrow utf8_lower and DuckDB lower() disagree on 43
        # newer-Unicode letters; the contract is explicit ASCII (round-5)
        ext = pc.ascii_lower(pc.fill_null(pc.struct_field(parts, "ext"), ""))
        return pa.table({"ext": ext, "ref": m})

    # consumed twice (refs + distinct groupby): pin the tiny parse result
    parsed = ds.map_batches(parse, batch_format="pyarrow").materialize()
    n = parsed.groupby("ext").aggregate(Count(alias_name="n_refs")).to_pandas()
    paths = (
        parsed.groupby(["ext", "ref"]).aggregate(Count(alias_name="_n")).to_pandas()
    )
    np_ = paths.groupby("ext").size().reset_index(name="n_paths")
    out = n.merge(np_, on="ext")
    out = out.sort_values(
        ["n_refs", "ext"], ascending=[False, True], kind="mergesort"
    ).head(30).reset_index(drop=True)
    return out[["ext", "n_refs", "n_paths"]].astype({"n_refs": "int64", "n_paths": "int64"})


Q_MD_CODE_PATHS_SQL = f"""
WITH t AS (
  SELECT coalesce(text, '') AS text FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet')
), refs AS (
  -- spans passing _looks_like_path + comment-line paths passing the
  -- known-extension gate, per-turn keep-first dedupe across rules
  SELECT unnest(list_distinct(
    list_filter(
      regexp_extract_all(text, '`([^`\n]{{1,200}})`', 1),
      x -> NOT regexp_matches(x, '[()=+{{}}\\[\\];|<> ]') AND x NOT LIKE '-%'
           AND (contains(x, '/') OR (contains(x, '.')
                AND translate(regexp_extract(x, '\\.([^.]*)$', 1), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') IN ({_MCP_EXT_IN})))
    )
    || list_filter(
      flatten(list_transform(
        regexp_extract_all(text, '(?m)^[ \t]*(?:#|//|--)([^\n]*)', 1),
        l -> regexp_extract_all(l, '(?:[A-Za-z0-9_.~-]+/)+[A-Za-z0-9_.-]+')
      )),
      x -> NOT regexp_matches(x, '\\.[^/]*$')
           OR translate(regexp_extract(x, '\\.([^.]*)$', 1), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') IN ({_MCP_EXT_IN})
    )
  )) AS ref FROM t
), p AS (
  SELECT translate(regexp_extract(ref, '\\.([^./]*)$', 1), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS ext, ref FROM refs
)
SELECT ext, count(*)::BIGINT AS n_refs, count(DISTINCT ref)::BIGINT AS n_paths
FROM p GROUP BY ext
ORDER BY n_refs DESC, ext LIMIT 30
"""


REGISTRY.update({"q_md_code_paths": (q_md_code_paths, Q_MD_CODE_PATHS_SQL)})


def q_md_frontmatter(sf_dir: str) -> pd.DataFrame:
    """Frontmatter depends-list extraction (reference markdown.py:
    188-235 _extract_frontmatter: stripped entries, empties dropped,
    trailing-/ entries are directory references): extract depends_on
    surfaces, split file vs directory targets (the reference's
    is_directory flag), count refs + distinct targets per class."""
    from ..stages.extract import extract_mention_rows
    from .kg import normalized_turns_ds

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    ds = normalized_turns_ds(data_dir).map_batches(
        lambda b: extract_mention_rows(
            b, entity_names=(), literal_specs=(("md_frontmatter", "depends_on"),)
        ),
        batch_format="pyarrow",
    )

    def parse(b: pa.Table) -> pa.Table:
        m = b["mention"]
        kind = pc.if_else(pc.ends_with(m, "/"), "directory", "file")
        return pa.table({"kind": kind, "ref": m})

    # consumed twice (refs + distinct groupby): pin the tiny parse result
    parsed = ds.map_batches(parse, batch_format="pyarrow").materialize()
    n = parsed.groupby("kind").aggregate(Count(alias_name="n_refs")).to_pandas()
    tgts = (
        parsed.groupby(["kind", "ref"]).aggregate(Count(alias_name="_n")).to_pandas()
    )
    nt = tgts.groupby("kind").size().reset_index(name="n_targets")
    out = n.merge(nt, on="kind").sort_values("kind", kind="mergesort")
    return out[["kind", "n_refs", "n_targets"]].astype(
        {"n_refs": "int64", "n_targets": "int64"}
    ).reset_index(drop=True)


Q_MD_FRONTMATTER_SQL = f"""
WITH t AS (
  SELECT coalesce(text, '') AS text FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet')
), refs AS (
  -- depends: blocks then items, per-turn keep-first dedupe; the item
  -- regex itself strips (separator eats leading ws, last char non-ws)
  SELECT unnest(list_distinct(flatten(list_transform(
    regexp_extract_all(text, '(?m)^depends:[ \t]*\n((?:[ \t]+-[ \t]+[^\n]+\n?)+)', 1),
    b -> regexp_extract_all(b, '-[ \t]+([^\n]*[^ \t\r\n])', 1)
  )))) AS ref FROM t
), p AS (
  SELECT CASE WHEN ref LIKE '%/' THEN 'directory' ELSE 'file' END AS kind, ref
  FROM refs
)
SELECT kind, count(*)::BIGINT AS n_refs, count(DISTINCT ref)::BIGINT AS n_targets
FROM p GROUP BY kind ORDER BY kind
"""


REGISTRY.update({"q_md_frontmatter": (q_md_frontmatter, Q_MD_FRONTMATTER_SQL)})


def q_compose_deps(sf_dir: str) -> pd.DataFrame:
    """Docker-compose service-dependency extraction (reference
    docker_compose.py:61-113: depends_on list + dict forms and
    extends.service each emit a REFERENCE edge to the named service):
    per-service reference counts (one per turn mentioning it — the
    per-turn keep-first dedupe), top 20 by count with a total
    tiebreak."""
    from ..stages.extract import extract_mention_rows
    from .kg import normalized_turns_ds

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    ds = normalized_turns_ds(data_dir).map_batches(
        lambda b: extract_mention_rows(
            b, entity_names=(), literal_specs=(("compose_deps", "depends_on_svc"),)
        ),
        batch_format="pyarrow",
    )
    out = (
        ds.groupby("mention")
        .aggregate(Count(alias_name="n_refs"))
        .to_pandas()
        .rename(columns={"mention": "svc"})
        .sort_values(["n_refs", "svc"], ascending=[False, True], kind="mergesort")
        .head(20)
        .reset_index(drop=True)
    )
    return out[["svc", "n_refs"]].astype({"n_refs": "int64"})


Q_COMPOSE_DEPS_SQL = f"""
WITH t AS (
  SELECT coalesce(text, '') AS text FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet')
), refs AS (
  -- depends_on list + dict blocks -> service names, extends -> parent
  -- service; per-turn keep-first dedupe across rules == list_distinct
  SELECT unnest(list_distinct(
    flatten(list_transform(
      regexp_extract_all(text, '\\bdepends_on:[ \t]*\n((?:[ \t]+-[ \t]+[^\n]+\n?)+)', 1),
      b -> regexp_extract_all(b, '-[ \t]+[''"]?([A-Za-z0-9._-]+)', 1)
    ))
    || flatten(list_transform(
      regexp_extract_all(text, '\\bdepends_on:[ \t]*\n((?:[ \t]+[A-Za-z0-9._-]+:[ \t]*\n[ \t]+condition:[^\n]+\n?)+)', 1),
      b -> regexp_extract_all(b, '([A-Za-z0-9._-]+):[ \t]*\n', 1)
    ))
    || regexp_extract_all(text, '\\bextends:[ \t]*\n(?:[ \t]+file:[^\n]*\n)?[ \t]+service:[ \t]*[''"]?([A-Za-z0-9._-]+)', 1)
  )) AS svc FROM t
)
SELECT svc, count(*)::BIGINT AS n_refs FROM refs
GROUP BY svc ORDER BY n_refs DESC, svc LIMIT 20
"""


REGISTRY.update({"q_compose_deps": (q_compose_deps, Q_COMPOSE_DEPS_SQL)})


def q_go_imports(sf_dir: str) -> pd.DataFrame:
    """Go import-declaration extraction (reference go.py:36-110:
    tree-sitter import_spec walk over single / grouped / aliased /
    blank forms, one edge per imported package): per-package reference
    counts (one per turn mentioning it — the per-turn keep-first
    dedupe), top 20 by count with a total tiebreak."""
    from ..stages.extract import extract_mention_rows
    from .kg import normalized_turns_ds

    data_dir = ensure_tier(tier_for_sf_dir(sf_dir))
    ds = normalized_turns_ds(data_dir).map_batches(
        lambda b: extract_mention_rows(
            b, entity_names=(), literal_specs=(("go_imports", "imports_module"),)
        ),
        batch_format="pyarrow",
    )
    out = (
        ds.groupby("mention")
        .aggregate(Count(alias_name="n_refs"))
        .to_pandas()
        .rename(columns={"mention": "package"})
        .sort_values(["n_refs", "package"], ascending=[False, True], kind="mergesort")
        .head(20)
        .reset_index(drop=True)
    )
    return out[["package", "n_refs"]].astype({"n_refs": "int64"})


Q_GO_IMPORTS_SQL = f"""
WITH t AS (
  SELECT coalesce(text, '') AS text FROM read_parquet('{_SYNTH_CORRECTNESS}/transcripts-*.parquet')
), refs AS (
  -- single form (optional named/_/. alias) + grouped import ( ... )
  -- blocks with LINE-anchored items (a // comment line inside the
  -- block emits nothing); per-turn keep-first dedupe across rules ==
  -- list_distinct (counting is order-insensitive)
  SELECT unnest(list_distinct(
    regexp_extract_all(text, '\\bimport[ \t]+(?:[A-Za-z_.][A-Za-z0-9_]*[ \t]+)?"([^"\n]+)"', 1)
    || flatten(list_transform(
         regexp_extract_all(text, '\\bimport[ \t]*\\(([^)]*)\\)', 1),
         b -> regexp_extract_all(b, '(?m)(?:^|;)[ \t]*(?:[A-Za-z_.][A-Za-z0-9_]*[ \t]+)?"([^"\n]+)"', 1)
       ))
  )) AS package FROM t
)
SELECT package, count(*)::BIGINT AS n_refs FROM refs
GROUP BY package ORDER BY n_refs DESC, package LIMIT 20
"""


REGISTRY.update({"q_go_imports": (q_go_imports, Q_GO_IMPORTS_SQL)})
