"""Extended relational surface (SURVEY.md §2.5): joins, windows, set ops,
JSON extraction, as-of join, sessionization — over the TPC-H-ish corpus.

Plan-quality notes (verified via .explain, see tests/test_plans.py):
- filters/projections reach the parquet scan (PushedFilters/ReadSchema);
- dimension joins (region/nation/customer, dedup'd orders) broadcast;
- q1-style aggregation is partial+final hash agg inside whole-stage codegen;
- top-k = TakeOrderedAndProject, never a global sort.

Cross-engine determinism follows the registry rules (decimal-exact sums,
single double division for averages, second-truncated epochs, unique
tiebreaks on every LIMIT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.asof_join import asof_join
from ..operators.funnel import funnel_levels, funnel_levels_exact
from ..operators.sessionize import session_stats
from ..sources.catalog import load_table
from .registry import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dsum(col, scale: str = "decimal(28,6)"):
    """Order-independent double sum: exact decimal accumulate, one cast out."""
    return F.sum(col.cast(scale)).cast("double")


# --- Q1: pricing summary (scan + 2-key hash agg, 8 aggregates) --------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / n).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / n).alias("avg_price"),
            (_dsum(F.col("l_discount")) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q3-style: top revenue orders for one market segment ---------------------


def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
        .agg(_dsum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q3_ORACLE = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01'
  AND l_shipdate > TIMESTAMP '1999-01-01'
GROUP BY 1, 2
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- Q5-style: revenue by nation within one region ---------------------------


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(revenue).alias("revenue"))
    )


_Q5_ORACLE = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# --- window ranking: top 3 orders per customer --------------------------------


def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank_in_customer", F.row_number().over(w))
        .filter(F.col("rank_in_customer") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_customer")
    )


_TOP3_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rank_in_customer
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_customer
  FROM orders
)
WHERE rank_in_customer <= 3
"""


# --- set operations ------------------------------------------------------------


def _heavy_users(events: DataFrame, event_type: str, min_count: int) -> DataFrame:
    return (
        events.filter(F.col("event_type") == event_type)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select("user_id")
    )


def heavy_click_and_view_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: users with >= 14 clicks AND >= 14 views."""
    events = _t(spark, sf_dir, "events")
    return _heavy_users(events, "click", 14).intersect(_heavy_users(events, "view", 14))


def heavy_click_no_heavy_purchase_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: users with >= 14 clicks but < 14 purchases.

    ``subtract`` is EXCEPT DISTINCT — the same set semantics as the SQL
    oracle even if either input ever carries duplicate rows (exceptAll
    would preserve multiplicity and drift from the oracle)."""
    events = _t(spark, sf_dir, "events")
    return _heavy_users(events, "click", 14).subtract(
        _heavy_users(events, "purchase", 14)
    )


_INTERSECT_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'click' GROUP BY user_id HAVING count(*) >= 14
INTERSECT
SELECT user_id FROM events WHERE event_type = 'view' GROUP BY user_id HAVING count(*) >= 14
"""

_EXCEPT_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'click' GROUP BY user_id HAVING count(*) >= 14
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase' GROUP BY user_id HAVING count(*) >= 14
"""


def heavy_click_or_purchase_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): users with >= 14 clicks OR >= 14 purchases."""
    events = _t(spark, sf_dir, "events")
    return _heavy_users(events, "click", 14).union(
        _heavy_users(events, "purchase", 14)
    ).distinct()


_UNION_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'click' GROUP BY user_id HAVING count(*) >= 14
UNION
SELECT user_id FROM events WHERE event_type = 'purchase' GROUP BY user_id HAVING count(*) >= 14
"""


# --- KMV sketch audience overlap (the uniqTheta analog) -------------------------


def segment_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap WITHOUT re-reading raw events: bottom-k KMV
    sketches (operators/kmv.py) of the heavy-clicker (>= 14 clicks) and
    heavy-viewer (>= 14 views) segments — the same segment definitions
    as the exact set-op trio above, which pays a full id-list shuffle
    on EVERY overlap question; the sketches answer union / intersection
    / Jaccard from two k-long states. The segments genuinely partially
    overlap, and k = 8 straddles the regimes across test SFs (sf0.001:
    clickers full / viewers exact — the MIXED theta clip; sf0.01: both
    full), so the estimator path ((k-1)·M/h_k, theta clipping) is what
    the hash gate verifies, not a degenerate branch. The oracle replays
    the identical sketch construction and estimator arithmetic
    relationally (window row_number + the same two IEEE double ops), so
    the estimates match bit-for-bit."""
    from ..operators.kmv import (
        kmv_difference_estimate,
        kmv_estimate,
        kmv_intersect_estimate,
        kmv_sketch,
        kmv_union_estimate,
    )

    k = 8
    events = _t(spark, sf_dir, "events")
    # both segments from ONE scan: per-(user, type) counts in a single
    # hash agg, thresholded — the union of two _heavy_users frames read
    # the events table twice for the same information
    segs = (
        events.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 14)
        .select(F.col("event_type").alias("seg"), "user_id")
    )
    sk = kmv_sketch(segs, ["seg"], "user_id", k=k)
    # fold the two one-row sketches side by side with a conditional agg —
    # no join node at all (a crossJoin of the two frames would plan as a
    # cartesian, tripping the global plan-hygiene sweep for a 1x1 join
    # Catalyst can't know is 1x1)
    # an EMPTY segment at a tiny SF yields no sketch row -> first() is
    # NULL and every estimator would degrade to NULL instead of 0;
    # coalesce to the empty sketch (what kmv_sketch of an empty set IS)
    # so empty segments estimate 0 like the operators do (r14 ADVICE)
    empty = F.array().cast("array<long>")
    pair = sk.groupBy().agg(
        F.coalesce(
            F.first(
                F.when(F.col("seg") == "click", F.col("sketch")),
                ignorenulls=True,
            ),
            empty,
        ).alias("a"),
        F.coalesce(
            F.first(
                F.when(F.col("seg") == "view", F.col("sketch")),
                ignorenulls=True,
            ),
            empty,
        ).alias("b"),
    )
    est_i = kmv_intersect_estimate(F.col("a"), F.col("b"), k=k)
    est_u = kmv_union_estimate(F.col("a"), F.col("b"), k=k)
    return pair.select(
        kmv_estimate(F.col("a"), k=k).alias("est_click_users"),
        kmv_estimate(F.col("b"), k=k).alias("est_view_users"),
        est_u.alias("est_union"),
        est_i.alias("est_intersect"),
        kmv_difference_estimate(F.col("a"), F.col("b"), k=k).alias(
            "est_click_only"
        ),
        (est_i / est_u).alias("est_jaccard"),
    )


_KMV_OVERLAP_ORACLE = """
WITH seg AS (
  SELECT 'click' AS event_type, user_id FROM events
  WHERE event_type = 'click' GROUP BY user_id HAVING count(*) >= 14
  UNION ALL
  SELECT 'view' AS event_type, user_id FROM events
  WHERE event_type = 'view' GROUP BY user_id HAVING count(*) >= 14
),
h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM seg
),
rk AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
),
sk AS (SELECT * FROM rk WHERE rn <= 8),
agg AS (
  SELECT event_type, count(*) AS n, max(CASE WHEN rn = 8 THEN h END) AS hk
  FROM sk GROUP BY event_type
),
est AS (
  SELECT event_type,
         CASE WHEN n < 8 THEN CAST(n AS DOUBLE)
              ELSE 7.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE) END AS e,
         CASE WHEN n < 8 THEN 1152921504606846976.0
              ELSE CAST(hk AS DOUBLE) END AS theta
  FROM agg
),
mg AS (
  SELECT h, row_number() OVER (ORDER BY h) AS rn
  FROM (SELECT DISTINCT h FROM sk)
),
magg AS (
  SELECT count(*) FILTER (rn <= 8) AS n,
         max(CASE WHEN rn = 8 THEN h END) AS hk
  FROM mg
),
mest AS (
  SELECT CASE WHEN n < 8 THEN CAST(n AS DOUBLE)
              ELSE 7.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE) END AS e
  FROM magg
),
thc AS (
  SELECT least(max(CASE WHEN event_type = 'click' THEN theta END),
               max(CASE WHEN event_type = 'view' THEN theta END)) AS theta_c
  FROM est
),
ret AS (
  SELECT s.event_type, s.h
  FROM sk s JOIN agg g USING (event_type)
  WHERE g.n < 8 OR s.rn <= 7
),
common AS (
  SELECT count(*) AS m
  FROM (SELECT h FROM ret WHERE event_type = 'click'
        INTERSECT
        SELECT h FROM ret WHERE event_type = 'view') x, thc
  WHERE CAST(x.h AS DOUBLE) < thc.theta_c
),
iest AS (
  SELECT CAST(m AS DOUBLE) * 1152921504606846976.0 / theta_c AS e
  FROM common, thc
),
aonly AS (
  SELECT count(*) AS m
  FROM (SELECT h FROM ret WHERE event_type = 'click'
        EXCEPT
        SELECT h FROM ret WHERE event_type = 'view') x, thc
  WHERE CAST(x.h AS DOUBLE) < thc.theta_c
),
dest AS (
  SELECT CAST(m AS DOUBLE) * 1152921504606846976.0 / theta_c AS e
  FROM aonly, thc
)
SELECT (SELECT e FROM est WHERE event_type = 'click') AS est_click_users,
       (SELECT e FROM est WHERE event_type = 'view') AS est_view_users,
       (SELECT e FROM mest) AS est_union,
       (SELECT e FROM iest) AS est_intersect,
       (SELECT e FROM dest) AS est_click_only,
       (SELECT e FROM iest) / (SELECT e FROM mest) AS est_jaccard
"""


def purchases_in_signup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join via the bucketed operator
    (operators/interval_join.py): each signup opens a 7-day activation
    window; purchases land in their user's windows through a
    (user_id, day-bucket) EQUI-join with the exact range check as a
    residual — never a nested-loop range join (pinned in test_plans:
    no BroadcastNestedLoopJoin, the join keys include the bucket).
    Output: per (user, window-start) the purchase count and
    decimal-exact value sum inside the window. Windows both-ends
    inclusive; window starts exported as second-truncated epochs per
    the registry's cross-engine rules."""
    from ..operators.interval_join import interval_join

    ev = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 7 DAYS")).alias("win_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    j = interval_join(
        purchases,
        signups,
        keys=["user_id"],
        point_ts="ts",
        start_ts="win_start",
        end_ts="win_end",
    )
    # group by the window-start COLUMN and truncate only for output,
    # matching the oracle's GROUP BY s.ws (r14 ADVICE: grouping by the
    # second-truncated epoch would merge two same-second sub-second
    # signups the oracle keeps apart)
    return (
        j.groupBy("user_id", "win_start")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            _dsum(F.col("value")).alias("purchase_value"),
        )
        .select(
            "user_id",
            F.floor(F.unix_timestamp("win_start")).cast("bigint").alias(
                "window_start"
            ),
            "n_purchases",
            "purchase_value",
        )
    )


_INTERVAL_JOIN_ORACLE = """
WITH s AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ws,
         CAST(ts AS TIMESTAMP) + INTERVAL 7 DAY AS we
  FROM events WHERE event_type = 'signup'
),
p AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'purchase'
)
SELECT s.user_id,
       CAST(floor(epoch(s.ws)) AS BIGINT) AS window_start,
       count(*) AS n_purchases,
       CAST(sum(CAST(p.value AS DECIMAL(28,6))) AS DOUBLE) AS purchase_value
FROM s JOIN p
  ON p.user_id = s.user_id AND p.ts >= s.ws AND p.ts <= s.we
GROUP BY s.user_id, s.ws
"""


def purchases_with_signup_window_left(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT-mode interval join (r14 verdict item 7): every purchase row
    with its containing 7-day signup window attached WHERE ONE EXISTS
    and null window columns otherwise — the retention-report shape,
    where purchases outside any activation window must stay visible
    (the inner query silently dropped them). One output row per
    qualifying (purchase, window) pair plus exactly one null-extended
    row per unmatched purchase (a point occupies ONE bucket, so the
    left join can't duplicate the miss). Same scalable plan as the
    inner mode: (user_id, day-bucket) equi-join, range residual, no
    nested loop."""
    from ..operators.interval_join import interval_join

    ev = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 7 DAYS")).alias("win_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    j = interval_join(
        purchases,
        signups,
        keys=["user_id"],
        point_ts="ts",
        start_ts="win_start",
        end_ts="win_end",
        how="left",
    )
    return j.select(
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("ts_epoch"),
        F.floor(F.unix_timestamp("win_start")).cast("bigint").alias(
            "window_start"
        ),
        "value",
    )


def purchases_outside_signup_window(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ANTI-mode interval join: per-user count and decimal-exact value
    sum of purchases that fall in NO 7-day signup activation window —
    the off-window-revenue / churn report, the complement of
    purchases_in_signup_window. Under the bucket scheme the anti-join
    is exact (each point occupies ONE bucket, so the (key, bucket)
    equi-anti-join sees every interval that could contain it); the
    oracle states the same thing declaratively as NOT EXISTS."""
    from ..operators.interval_join import interval_join

    ev = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 7 DAYS")).alias("win_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    j = interval_join(
        purchases,
        signups,
        keys=["user_id"],
        point_ts="ts",
        start_ts="win_start",
        end_ts="win_end",
        how="left_anti",
    )
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_outside"),
        _dsum(F.col("value")).alias("outside_value"),
    )


_INTERVAL_ANTI_ORACLE = """
WITH s AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ws,
         CAST(ts AS TIMESTAMP) + INTERVAL 7 DAY AS we
  FROM events WHERE event_type = 'signup'
),
p AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id,
       count(*) AS n_outside,
       CAST(sum(CAST(p.value AS DECIMAL(28,6))) AS DOUBLE) AS outside_value
FROM p
WHERE NOT EXISTS (
  SELECT 1 FROM s
  WHERE s.user_id = p.user_id AND p.ts >= s.ws AND p.ts <= s.we
)
GROUP BY p.user_id
"""


_INTERVAL_LEFT_ORACLE = """
WITH s AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ws,
         CAST(ts AS TIMESTAMP) + INTERVAL 7 DAY AS we
  FROM events WHERE event_type = 'signup'
),
p AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS ts_epoch,
       CAST(floor(epoch(s.ws)) AS BIGINT) AS window_start,
       p.value AS value
FROM p LEFT JOIN s
  ON p.user_id = s.user_id AND p.ts >= s.ws AND p.ts <= s.we
"""


def audience_todate_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct-audience series from MERGED daily sketches — the
    'distinct users to date' question every analytics engine answers
    with a sketch (ClickHouse: uniqState per day + uniqMerge over the
    range): ONE pass builds a bottom-k sketch per day; each day's
    to-date estimate folds the daily sketches so far (cumulative
    collect_list window + one flatten/distinct/sort/slice) — yesterday's
    raw events are never re-read. The running window operates on sketch
    METADATA (k longs per day, ~30 day rows) so the single-partition
    window is KB-scale at any corpus size. The oracle computes each
    day's bottom-k over the cumulative distinct hash set DIRECTLY, so
    the hash match proves merge closure across TIME partitions (the
    vocab query proves it across sources). k = 16 sits below the
    audience at sf >= 0.01: early days exercise the exact regime and
    later days the estimator, in one result."""
    from ..operators.kmv import kmv_estimate, kmv_sketch

    k = 16
    ev = _t(spark, sf_dir, "events").select(
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("day"),
        "user_id",
    )
    daily = kmv_sketch(ev, ["day"], "user_id", k=k)
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = F.slice(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("sketch").over(w)))
        ),
        1,
        k,
    )
    return daily.select(
        "day", kmv_estimate(merged, k=k).alias("est_users_todate")
    )


_AUDIENCE_TODATE_ORACLE = """
WITH ev AS (
  SELECT DISTINCT
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
),
days AS (SELECT DISTINCT day FROM ev),
cum AS (
  SELECT d.day, e.h FROM days d JOIN ev e ON e.day <= d.day
  GROUP BY d.day, e.h
),
rk AS (
  SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
  FROM cum
),
agg AS (
  SELECT day, count(*) FILTER (rn <= 16) AS n,
         max(CASE WHEN rn = 16 THEN h END) AS hk
  FROM rk GROUP BY day
)
SELECT day,
       CASE WHEN n < 16 THEN CAST(n AS DOUBLE)
            ELSE 15.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE) END
         AS est_users_todate
FROM agg
"""


def audience_sliding7_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING 7-day distinct-audience series from the same daily
    sketches as audience_todate_kmv — the moving-range uniqMerge every
    retention dashboard runs (ClickHouse: uniqMerge(state) over a
    7-day window): one pass builds a bottom-k sketch per day; each
    day's trailing-7 estimate folds ONLY that window's daily sketches
    (rowsBetween -6, current). Unlike the cumulative series, sketches
    here LEAVE the window as it slides — possible precisely because
    the fold re-merges the surviving days' states (bottom-k is
    merge-closed but not invertible, so a rolling-subtract design is
    impossible; re-merging 7 k-long arrays per day row is the correct
    and cheap shape). The oracle computes each day's bottom-k over the
    window's distinct hashes directly, so the hash gate proves merge
    closure on every 7-day slice."""
    from ..operators.kmv import kmv_estimate, kmv_sketch

    k = 16
    ev = _t(spark, sf_dir, "events").select(
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("day"),
        "user_id",
    )
    daily = kmv_sketch(ev, ["day"], "user_id", k=k)
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    merged = F.slice(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("sketch").over(w)))
        ),
        1,
        k,
    )
    return daily.select(
        "day", kmv_estimate(merged, k=k).alias("est_users_7d")
    )


# NOTE rowsBetween(-6, current) over day ROWS == a 7-DAY range here
# because the daily frame has one row per present day and the testdata
# event stream has no day gaps; a gapped deployment would use a range
# frame on the day value. The oracle joins on the day VALUE (d.day -
# e.day <= 6), so a gap would hash-mismatch loudly rather than silently
# diverge.
_AUDIENCE_SLIDING7_ORACLE = """
WITH ev AS (
  SELECT DISTINCT
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
),
days AS (SELECT DISTINCT day FROM ev),
win AS (
  SELECT d.day, e.h FROM days d
  JOIN ev e ON e.day <= d.day AND e.day >= d.day - 6
  GROUP BY d.day, e.h
),
rk AS (
  SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
  FROM win
),
agg AS (
  SELECT day, count(*) FILTER (rn <= 16) AS n,
         max(CASE WHEN rn = 16 THEN h END) AS hk
  FROM rk GROUP BY day
)
SELECT day,
       CASE WHEN n < 16 THEN CAST(n AS DOUBLE)
            ELSE 15.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE) END
         AS est_users_7d
FROM agg
"""


def zorder_key_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Morton/Z-order clustering key (sources/zorder.py — the
    multi-column generalization of the S7 sort-on-write skip index)
    computed over every event on the (user_id, epoch-day) grid and
    folded per event_type to integer-exact min/max/sum: the hash gate
    pins the exact bit-interleave semantics on all rows, every round —
    a single misplaced bit anywhere in the interleave shifts z_sum.
    This is the SAME expression append_zordered clusters layout
    rewrites by; the pruning effect of that layout (a predicate on any
    clustered dimension skips files) is pinned separately in pytest via
    parquet footer statistics, since a value oracle cannot see file
    layout. user_id is QUANTIZED onto the 16-bit grid (pmod 2^16) per
    zorder_key's contract — at scale factors where ids exceed 65535 the
    raw id's high bits would silently alias off the grid (r14 ADVICE);
    check=True additionally enforces the contract at runtime."""
    from ..sources.zorder import zorder_key

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.pmod(F.col("user_id"), F.lit(65536)).cast("long").alias("uq"),
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
    )
    z = zorder_key([F.col("uq"), F.col("day")], bits=16, check=True)
    return (
        ev.select("event_type", z.alias("z"))
        .groupBy("event_type")
        .agg(
            F.min("z").alias("z_min"),
            F.max("z").alias("z_max"),
            F.sum("z").alias("z_sum"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_ZORDER_ORACLE = """
WITH ev AS (
  SELECT event_type, user_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day
  FROM events
),
z AS (
  SELECT event_type,
         CAST(list_sum([((((user_id % 65536) >> b) & 1) << (2 * b))
                        + (((day >> b) & 1) << (2 * b + 1))
                        FOR b IN range(16)]) AS BIGINT) AS z
  FROM ev
)
SELECT event_type,
       min(z) AS z_min,
       max(z) AS z_max,
       CAST(sum(z) AS BIGINT) AS z_sum,
       count(*) AS n_events
FROM z GROUP BY event_type
"""


def _cms_top20(ev: DataFrame) -> DataFrame:
    """The exact top-20 probe harness shared by every CMS lane (the
    exact counts are the TEST HARNESS, not the production pattern: at
    scale the exact groupBy shuffles every distinct key while the
    sketch is 2048 counters and one map-side agg)."""
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(20)
    )


def heavy_user_counts_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation (operators/cms.py — the
    heavy-hitter partial next to the HLL / KMV / quantile states), TWO
    lanes in one registered query (r15 verdict item 3: the five
    near-duplicate cms lanes consolidated so registry rotation depth
    stays bounded — this absorbs the former heavy_user_counts_cms_merged):

    - lane 'direct': a 4 x 512 CMS built over every event's user_id,
      probed for the top-20 users by exact count;
    - lane 'merged': per-event-type PARTIAL sketches — the
      AggregatingMergeTree layout, one CMS per ingest stratum — folded
      through cms_merge (cellwise sums), answering the same probes.

    Output (lane, user_id, n_events, cms_est): the driver hash pins
    construction, the estimator, AND merge-losslessness every round —
    the oracle replays the md5-mod hashing / cell counting / min-fold
    bit-for-bit ONCE and expects both lanes to reproduce it, which
    holds only because counter merge is exact. cms_est >= n_events by
    construction (collisions only add). The per-type distinct collect
    is bounded (5 event types) and inherent to demonstrating the
    partial-per-stratum fold."""
    from ..operators.cms import cms_estimate, cms_merge, cms_sketch

    ev = _t(spark, sf_dir, "events")
    top = _cms_top20(ev)
    direct = cms_sketch(ev, "user_id", d=4, w=512)
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    merged = cms_merge(
        *[
            cms_sketch(
                ev.filter(F.col("event_type") == t), "user_id", d=4, w=512
            )
            for t in sorted(types)
        ]
    )
    return (
        cms_estimate(direct, top, "user_id", d=4, w=512)
        .select(F.lit("direct").alias("lane"), "*")
        .unionByName(
            cms_estimate(merged, top, "user_id", d=4, w=512).select(
                F.lit("merged").alias("lane"), "*"
            )
        )
    )


def _cms_oracle(where: str = "", lane: str | None = None) -> str:
    """The CMS replay, optionally restricted to a surviving-rows
    predicate (the retraction lane — both the sketch build and the
    exact top-20 harness see the filtered corpus) and optionally
    tagged with a ``lane`` label column (the consolidated multi-lane
    queries UNION ALL one replay per lane)."""
    w = f"WHERE {where}" if where else ""
    lane_col = f"'{lane}' AS lane, " if lane else ""
    return f"""
WITH r AS (SELECT CAST(unnest(range(4)) AS INT) AS row),
cells AS (
  SELECT r.row,
         CAST(('0x' || substr(md5(CAST(r.row AS VARCHAR) || ':'
                                  || CAST(e.user_id AS VARCHAR)), 1, 15))
              ::BIGINT % 512 AS INT) AS col
  FROM events e CROSS JOIN r {w.replace('user_id', 'e.user_id')}
),
cms AS (SELECT row, col, count(*) AS c FROM cells GROUP BY row, col),
top AS (
  SELECT user_id, count(*) AS n_events FROM events {w}
  GROUP BY user_id
  ORDER BY n_events DESC, user_id ASC LIMIT 20
),
probe AS (
  SELECT t.user_id, t.n_events, r.row,
         CAST(('0x' || substr(md5(CAST(r.row AS VARCHAR) || ':'
                                  || CAST(t.user_id AS VARCHAR)), 1, 15))
              ::BIGINT % 512 AS INT) AS col
  FROM top t CROSS JOIN r
)
SELECT {lane_col}p.user_id, p.n_events, min(coalesce(c.c, 0)) AS cms_est
FROM probe p LEFT JOIN cms c USING (row, col)
GROUP BY p.user_id, p.n_events
"""


# the consolidated two-lane query: ONE replay per lane — identical SQL
# modulo the label, which is the point (merge-losslessness means the
# merged lane must reproduce the direct lane's replay exactly)
_CMS_ORACLE = (
    f"SELECT * FROM ({_cms_oracle(lane='direct')}) "
    f"UNION ALL SELECT * FROM ({_cms_oracle(lane='merged')})"
)


def heavy_users_exact_via_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters through the sketch filter
    (operators/cms.cms_heavy_hitters): every user with >= 68 events and
    their exact counts. Candidates come from the dyadic-range walk over
    the hierarchical CMS (Cormode-Muthukrishnan §4.2) — a 1024-ary
    prefix-tree descent on the 60-bit user-hash domain that expands
    only classes whose count upper bound clears the threshold — so
    candidate discovery is SUB-UNIVERSE: no distinct() and no groupBy
    over the key universe anywhere before the verify pass (r15 verdict
    item 2; the previous shape probed distinct(user_id), a full-universe
    shuffle). The oracle is the plain HAVING count >= 68 — hash
    equality each round proves BOTH halves of the pattern: the walk
    lost no true heavy hitter (upper-bound contract: a prefix class
    containing a heavy hitter counts at least as much as the item) and
    the exact verify over candidate rows removed every false
    positive. w = 8192 keeps the walk in its discriminating regime
    (threshold > e*N/w) through sf0.1's ~100k events — at the default
    512 the error floor crosses 68 and the operator would honestly
    fall back to the plain exact plan."""
    from ..operators.cms import cms_heavy_hitters

    ev = _t(spark, sf_dir, "events")
    return cms_heavy_hitters(ev, "user_id", threshold=68, w=8192)


_CMS_HH_ORACLE = """
SELECT user_id, count(*) AS n
FROM events GROUP BY user_id HAVING count(*) >= 68
"""


def top_users_per_event_type_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT top-5 users per event_type through the SpaceSaving /
    Misra-Gries summary (operators/topk.py — the ClickHouse topK(N)
    aggregate analog, r16 verdict item 3): one map-only bounded-state
    partial pass (capacity 256 per partition per event_type, no shuffle
    of the user universe), a merge agg over the bounded summaries, and
    one exact verify pass over the candidate users; the per-group
    completeness guard deterministically falls back to the exact plan
    where the summary cannot promise the candidate set, so the output
    is the exact top-5 (count desc, user_id asc) regardless of physical
    partitioning — the property the plain-SQL row_number oracle checks.
    Complements heavy_users_exact_via_cms (absolute threshold) with the
    per-group rank-k shape. capacity=2048 keeps the summary
    discriminating through sf0.1 (~15k users/type per partition after
    pruning): at 256 the per-partition prunes accrue more err than the
    5th user's count and the guard would route every group to the
    exact fallback — correct but the plan the sketch exists to avoid.
    Summary state at 2048 is still partitions x 5 types x 2048 rows —
    bounded metadata."""
    from ..operators.topk import topk_exact_via_spacesaving

    ev = _t(spark, sf_dir, "events")
    return topk_exact_via_spacesaving(
        ev, ["event_type"], "user_id", k=5, capacity=2048
    )


def top_parts_per_returnflag_topkw(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT top-5 parts per l_returnflag by TOTAL SHIPPED QUANTITY —
    the ClickHouse topKWeighted analog through the same SpaceSaving
    summary (operators/topk.py weight_col mode): each row contributes
    l_quantity units of mass, every Misra-Gries invariant holds under
    weighted increments, and the exact verify pass sums weights, so
    the output is the exact weighted top-5 (weight desc, part asc)
    under any partitioning. Quantities are integer-valued in the
    corpus; the up-front long cast keeps both engines in exact integer
    arithmetic.

    On THIS corpus the guard usually routes to the exact fallback at
    larger SFs — TPC-H part quantities are deliberately uniform, so no
    weighted heavy hitters exist for the summary to hold and the exact
    per-group plan IS the optimal plan (the cms_heavy_hitters
    regime-check philosophy); the sketch-path win on skewed data is
    pinned in tests/test_operators.py. The output is the exact top-5
    either way — that invariance is what this row hash-gates."""
    from ..operators.topk import topk_exact_via_spacesaving

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return topk_exact_via_spacesaving(
        li, ["l_returnflag"], "l_partkey", k=5, capacity=256,
        weight_col="qty",
    )


_TOPKW_PARTS_ORACLE = """
SELECT l_returnflag, l_partkey, n, rk FROM (
  SELECT l_returnflag, l_partkey, n,
         CAST(row_number() OVER (
           PARTITION BY l_returnflag ORDER BY n DESC, l_partkey
         ) AS INT) AS rk
  FROM (
    SELECT l_returnflag, l_partkey,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS n
    FROM lineitem WHERE l_partkey IS NOT NULL
    GROUP BY l_returnflag, l_partkey
  )
) WHERE rk <= 5
"""


_TOPK_USERS_ORACLE = """
SELECT event_type, user_id, n, rk FROM (
  SELECT event_type, user_id, n,
         CAST(row_number() OVER (
           PARTITION BY event_type ORDER BY n DESC, user_id
         ) AS INT) AS rk
  FROM (
    SELECT event_type, user_id, count(*) AS n
    FROM events WHERE user_id IS NOT NULL
    GROUP BY event_type, user_id
  )
) WHERE rk <= 5
"""


# --- mergeable quantile sketches (the quantileState/-Merge analog) ----------

# one definition site for the domain the order-value sketches declare
# (operators/quantile_sketch.py: equi-width over [lo, hi), exact merge)
_QLO, _QHI, _QBINS = 0.0, 600_000.0, 240  # width 2500, covers o_totalprice


def order_value_quantiles_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-priority order-value quantiles from HISTOGRAM SKETCH state
    (operators/quantile_sketch.py — the ClickHouse quantileState shape):
    one row per o_orderpriority with the exact count and the sketch's
    interpolated p50/p90. No sort anywhere: construction is two
    map-side-combinable hash aggs and the estimators are expression
    walks over the 240-long state — the movement pattern that holds at
    any row count, vs exact percentile's per-group global sort. The
    oracle replays binning, rank arithmetic, and interpolation
    relationally, bit-for-bit."""
    from ..operators.quantile_sketch import (
        hist_count,
        hist_quantile,
        hist_sketch,
    )

    orders = _t(spark, sf_dir, "orders")
    sk = hist_sketch(
        orders, ["o_orderpriority"], "o_totalprice",
        lo=_QLO, hi=_QHI, bins=_QBINS,
    )
    q = lambda p: hist_quantile(
        F.col("sketch"), p, lo=_QLO, hi=_QHI, bins=_QBINS
    )
    return sk.select(
        "o_orderpriority",
        hist_count(F.col("sketch")).alias("n_orders"),
        q(0.5).alias("p50"),
        q(0.9).alias("p90"),
    )


def _qsketch_oracle_ctes(partition: str, where: str = "") -> str:
    """The sketch replay: clamp-binning, per-bin counts, cumulative
    walk — partitioned by ``partition`` (or a constant for the global
    sketch). ``where`` restricts the replayed corpus (the retraction
    lane's surviving-rows predicate)."""
    w = f"WHERE {where}" if where else ""
    return f"""
b AS (
  SELECT {partition} AS pk,
         least({_QBINS - 1}, greatest(0,
           CAST(floor((CAST(o_totalprice AS DOUBLE) - {_QLO!r}) / 2500.0)
                AS INT))) AS bin
  FROM orders {w}
),
h AS (SELECT pk, bin, count(*) AS c FROM b GROUP BY pk, bin),
n AS (SELECT pk, sum(c) AS n FROM h GROUP BY pk),
cum AS (
  SELECT pk, bin, c,
         sum(c) OVER (PARTITION BY pk ORDER BY bin) AS cum,
         sum(c) OVER (PARTITION BY pk ORDER BY bin) - c AS before
  FROM h
),
tgt AS (
  SELECT n.pk, q.q,
         least(greatest(CAST(floor(q.q * n.n) AS BIGINT) + 1, 1), n.n) AS r
  FROM n CROSS JOIN (SELECT unnest([0.5, 0.9, 0.99]) AS q) q
),
est AS (
  SELECT t.pk, t.q,
         (SELECT round({_QLO!r} + 2500.0 *
                       (CAST(c.bin AS DOUBLE)
                        + CAST(t.r - c.before AS DOUBLE)
                          / CAST(c.c AS DOUBLE)), 6)
          FROM cum c
          WHERE c.pk = t.pk AND c.cum >= t.r
          ORDER BY c.bin LIMIT 1) AS e
  FROM tgt t
)"""


_QSKETCH_PRIORITY_ORACLE = f"""
WITH {_qsketch_oracle_ctes("o_orderpriority")}
SELECT n.pk AS o_orderpriority,
       CAST(n.n AS BIGINT) AS n_orders,
       (SELECT e FROM est WHERE est.pk = n.pk AND q = 0.5) AS p50,
       (SELECT e FROM est WHERE est.pk = n.pk AND q = 0.9) AS p90
FROM n
"""


def order_value_quantiles_merged(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantiles from MERGED partial sketches — the quantileMerge half
    of the family, and the merge-losslessness PROOF: the per-priority
    partial sketches fold to one global state (elementwise sum, the
    AggregatingMergeTree algebra) and the estimates come off the merged
    state, while the ORACLE computes the histogram DIRECTLY over all
    orders with no partial stage — so the driver's hash equality holds
    only because partials merge exactly (the same proof shape as
    vocab_kmv_per_lang across sources and audience_todate_kmv across
    days). Yesterday's partials answer today's global p99 without
    re-reading raw rows."""
    from ..operators.quantile_sketch import (
        hist_count,
        hist_merge_agg,
        hist_quantile,
        hist_sketch,
    )

    orders = _t(spark, sf_dir, "orders")
    partials = hist_sketch(
        orders, ["o_orderpriority"], "o_totalprice",
        lo=_QLO, hi=_QHI, bins=_QBINS,
    )
    merged = partials.groupBy().agg(hist_merge_agg("sketch").alias("m"))
    q = lambda p: hist_quantile(
        F.col("m"), p, lo=_QLO, hi=_QHI, bins=_QBINS
    )
    return merged.select(
        hist_count(F.col("m")).alias("n_orders"),
        q(0.5).alias("p50"),
        q(0.9).alias("p90"),
        q(0.99).alias("p99"),
    )


def _qsketch_merged_oracle(where: str = "") -> str:
    return f"""
WITH {_qsketch_oracle_ctes("1", where)}
SELECT CAST(n.n AS BIGINT) AS n_orders,
       (SELECT e FROM est WHERE q = 0.5) AS p50,
       (SELECT e FROM est WHERE q = 0.9) AS p90,
       (SELECT e FROM est WHERE q = 0.99) AS p99
FROM n
"""


_QSKETCH_MERGED_ORACLE = _qsketch_merged_oracle()


def sequence_count_view_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The sequenceCount analog (operators/funnel.sequence_count): per
    user, the number of DISJOINT view -> purchase chains — "how many
    times did this user convert", each view consumable by one later
    purchase and vice versa. Computed via the min-cut closed form over
    two running sums (no per-user arrays — the funnel family's
    hyperactive-user-safe shape); the oracle states the identical
    window expression, so the hash gate pins the matching math on
    every user each round."""
    from ..operators.funnel import sequence_count

    return sequence_count(
        _t(spark, sf_dir, "events"), "view", "purchase"
    )


_SEQUENCE_COUNT_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events WHERE event_type IN ('view', 'purchase')
),
c AS (
  SELECT user_id,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ca,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cb,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id) AS btot
  FROM ev
)
SELECT user_id,
       CAST(least(min(ca + btot - cb), max(btot)) AS INT) AS n_chains
FROM c GROUP BY user_id
"""


def summing_daily_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SummingMergeTree lifecycle proof (sources/writers.py
    compact_summing/summing_serve — the additive-rollup engine next to
    Replacing S2 and Aggregating S3): batch 1 of (user, day, value)
    rows lands, the background merge FOLDS it (decimal-exact), batch 2
    appends UNFOLDED rows on top, and the serve aggregates across the
    mixed state — the oracle aggregates the raw events directly, so the
    hash gate proves merge + append + serve == one direct aggregation
    (the engine's whole contract: readers never depend on merge
    timing). Values are cast to decimal(28,6) at insert (the declared-
    Decimal-column CH table), keeping every fold exact."""
    from ..session import scratch_dir
    from ..sources.writers import compact_summing, summing_serve

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("day"),
        F.col("value").cast("decimal(28,6)").alias("value"),
        F.unix_timestamp("ts").alias("_ts"),
    )
    mid = ev.agg(F.expr("percentile_approx(_ts, 0.5)")).collect()[0][0]
    path = scratch_dir("summing")
    ev.filter(F.col("_ts") < mid).drop("_ts").write.mode("append").parquet(path)
    compact_summing(
        spark, path, key_cols=["user_id", "day"], sum_cols=["value"]
    )
    ev.filter(F.col("_ts") >= mid).drop("_ts").write.mode("append").parquet(path)
    return summing_serve(
        spark.read.parquet(path),
        key_cols=["user_id", "day"],
        sum_cols=["value"],
    ).withColumnRenamed("value", "total_value")


def distinct_users_upto_per_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The uniqUpTo(10) analog (operators/kmv.uniq_upto): per
    event_type, the exact distinct-user count while <= 10 and 11 for
    "more than 10" — bounded per-group state (11 hashes) regardless of
    audience size, the question segmentation thresholds actually ask
    ("are there more than N distinct?") answered without a full
    distinct count. Oracle: LEAST(count(DISTINCT user_id), 11) — the
    equality holds because a bottom-(N+1) sketch retains every item of
    a group at or under N (exactness below capacity) and saturates at
    N+1 above it."""
    from ..operators.kmv import uniq_upto

    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    return uniq_upto(ev, ["event_type"], "user_id", n=10)


_SUMMING_ORACLE = """
SELECT user_id,
       CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


def collapsing_view_click_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree lifecycle proof (sources/writers.py
    compact_collapsing/collapsing_serve): view events write +1 state
    rows and click events write -1 cancel rows per (user, day) — the
    impression-vs-dismissal ledger; batch 1 lands, the background merge
    collapses it (net sign per key, fully-cancelled keys REAPED from
    storage), batch 2 appends raw signed rows on top, and the serve
    nets across the mixed state. The oracle nets the raw events
    directly with HAVING != 0 — hash equality proves collapse + append
    + serve == the direct signed aggregation (sum(sign) is
    associative, the engine's contract)."""
    from ..session import scratch_dir
    from ..sources.writers import collapsing_serve, compact_collapsing

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    ).select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("day"),
        F.when(F.col("event_type") == "view", F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("sign"),
        F.unix_timestamp("ts").alias("_ts"),
    )
    mid = ev.agg(F.expr("percentile_approx(_ts, 0.5)")).collect()[0][0]
    path = scratch_dir("collapsing")
    ev.filter(F.col("_ts") < mid).drop("_ts").write.mode("append").parquet(path)
    compact_collapsing(spark, path, key_cols=["user_id", "day"])
    ev.filter(F.col("_ts") >= mid).drop("_ts").write.mode("append").parquet(path)
    return collapsing_serve(
        spark.read.parquet(path), key_cols=["user_id", "day"]
    ).withColumnRenamed("sign", "net_sign")


_COLLAPSING_ORACLE = """
SELECT user_id,
       CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE -1 END) AS BIGINT)
         AS net_sign
FROM events
WHERE event_type IN ('view', 'click')
GROUP BY 1, 2
HAVING sum(CASE WHEN event_type = 'view' THEN 1 ELSE -1 END) != 0
"""


def versioned_collapsing_pending_cancels(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VersionedCollapsingMergeTree lifecycle proof (r15 verdict item
    8 — the out-of-order case version keys EXIST for): cancels are
    delivered BEFORE their states, across a merge boundary. Per
    (user, version=day): a view day carries a +1 state row, a click
    day a -1 cancel row. Batch 1 writes EVERY cancel; the background
    merge then compacts — a correct versioned merge must KEEP the
    lone -1 rows as pending cancels (plain ClickHouse collapsing,
    where merge order matters, mishandles exactly this; here
    sum(sign) over (key, version) is commutative so delivery order
    cannot matter — sources/writers.py collapsing_serve's documented
    contract with the version column in key_cols). Batch 2 then
    delivers the states; the serve nets per (user, version):
    cancelled versions annihilate, view-only versions survive +1,
    still-pending cancels surface as -1. The oracle aggregates the
    signed distinct sets directly — hash equality proves
    cancel-first delivery + compaction + late states == the
    order-free signed aggregation."""
    from ..session import scratch_dir
    from ..sources.writers import collapsing_serve, compact_collapsing

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    ).select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("bigint").alias("version"),
        "event_type",
    )
    states = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", "version").distinct()
        .withColumn("sign", F.lit(1).cast("long"))
    )
    cancels = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "version").distinct()
        .withColumn("sign", F.lit(-1).cast("long"))
    )
    path = scratch_dir("versioned_collapsing")
    # batch 1: every cancel arrives FIRST, and the merge runs on a
    # store holding nothing but pending cancels
    cancels.write.mode("append").parquet(path)
    compact_collapsing(spark, path, key_cols=["user_id", "version"])
    # batch 2: the states the cancels were for (plus never-cancelled)
    states.write.mode("append").parquet(path)
    return collapsing_serve(
        spark.read.parquet(path), key_cols=["user_id", "version"]
    ).withColumnRenamed("sign", "net_sign")


_VERSIONED_COLLAPSING_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
           AS version,
         CASE WHEN event_type = 'view' THEN 1 ELSE -1 END AS sign
  FROM events
  WHERE event_type IN ('view', 'click')
)
SELECT user_id, version, CAST(sum(sign) AS BIGINT) AS net_sign
FROM d GROUP BY 1, 2 HAVING sum(sign) != 0
"""


_UNIQ_UPTO_ORACLE = """
SELECT event_type,
       CAST(least(count(DISTINCT user_id), 11) AS BIGINT) AS uniq_upto
FROM events GROUP BY event_type
"""


def user_event_type_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sumMap/minMap/maxMap aggregate family (operators/map_agg.
    agg_map — ClickHouse's map-valued per-category breakdown): one row
    per user carrying the per-event-type COUNT map and the per-type MAX
    event_id map, rendered as the canonical sorted "key:value,..."
    string (integer values only, so the in-engine rendering is exact
    cross-engine — the registry determinism rule). BOTH maps ride one
    shared (user, type) pass through agg_maps — one scan, two
    exchanges, no join (the two-call agg_map shape cost a scan + two
    exchanges + a broadcast join EACH; plan pinned in test_plans).
    State bounded by distinct event types per user (5), never row
    count."""
    from ..operators.map_agg import agg_maps

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id"
    )
    m = agg_maps(
        ev, ["user_id"], "event_type",
        {"_counts": ("event_id", "count"), "_maxes": ("event_id", "max")},
    )
    return m.select(
        "user_id",
        _render_kv(F.col("map_keys"), F.col("_counts")).alias("count_map"),
        _render_kv(F.col("map_keys"), F.col("_maxes")).alias("max_map"),
    )


def _render_kv(keys, vals):
    """The canonical sorted "key:value,..." map rendering shared by the
    batch query and the wave-state lifecycle lanes (integer values
    only, so the string is exact cross-engine)."""
    return F.concat_ws(
        ",",
        F.zip_with(
            keys, vals,
            lambda k, v: F.concat(k, F.lit(":"), v.cast("string")),
        ),
    )


def _map_agg_oracle(where: str = "", lane: str | None = None) -> str:
    """The user_event_type_maps replay, parameterized for the wave-state
    lifecycle lanes (corpus_stats_twins): optional row filter (the
    takedown lane's surviving corpus) and optional lane tag."""
    w = f"WHERE {where}" if where else ""
    lane_col = f"'{lane}' AS lane, " if lane else ""
    return f"""
WITH g AS (
  SELECT user_id, event_type,
         count(*) AS c, max(event_id) AS m
  FROM events {w} GROUP BY 1, 2
)
SELECT {lane_col}user_id,
       string_agg(event_type || ':' || CAST(c AS VARCHAR), ','
                  ORDER BY event_type) AS count_map,
       string_agg(event_type || ':' || CAST(m AS VARCHAR), ','
                  ORDER BY event_type) AS max_map
FROM g GROUP BY user_id
"""


_MAP_AGG_ORACLE = _map_agg_oracle()


def lineitem_price_quantiles_weighted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The quantilesExactWeighted analog: quantiles of
    l_extendedprice WEIGHTED by l_quantity — "the price below which
    half the purchased UNITS fall", not half the line items — from the
    same merge-closed histogram state (hist_sketch's weight_col: each
    row adds quantity units of mass to its price bin; everything
    downstream is weight-agnostic). Domain [0, 120k) x 240 bins
    (width 500) covers TPC-H extendedprice."""
    from ..operators.quantile_sketch import (
        hist_count,
        hist_quantile,
        hist_sketch,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        "l_extendedprice", F.col("l_quantity").cast("long").alias("_q")
    )
    sk = hist_sketch(
        li, [], "l_extendedprice", lo=0.0, hi=120_000.0, bins=240,
        weight_col="_q",
    )
    q = lambda p: hist_quantile(
        F.col("sketch"), p, lo=0.0, hi=120_000.0, bins=240
    )
    return sk.select(
        hist_count(F.col("sketch")).alias("total_units"),
        q(0.5).alias("p50"),
        q(0.9).alias("p90"),
        q(0.99).alias("p99"),
    )


_WEIGHTED_QUANTILES_ORACLE = """
WITH b AS (
  SELECT least(239, greatest(0,
           CAST(floor((CAST(l_extendedprice AS DOUBLE) - 0.0) / 500.0)
                AS INT))) AS bin,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
),
h AS (SELECT bin, sum(w) AS c FROM b GROUP BY bin),
n AS (SELECT sum(c) AS n FROM h),
cum AS (
  SELECT bin, c,
         sum(c) OVER (ORDER BY bin) AS cum,
         sum(c) OVER (ORDER BY bin) - c AS before
  FROM h
),
tgt AS (
  SELECT q.q, least(greatest(CAST(floor(q.q * n.n) AS BIGINT) + 1, 1), n.n) AS r
  FROM n CROSS JOIN (SELECT unnest([0.5, 0.9, 0.99]) AS q) q
),
est AS (
  SELECT t.q,
         (SELECT round(0.0 + 500.0 *
                       (CAST(c.bin AS DOUBLE)
                        + CAST(t.r - c.before AS DOUBLE)
                          / CAST(c.c AS DOUBLE)), 6)
          FROM cum c WHERE c.cum >= t.r ORDER BY c.bin LIMIT 1) AS e
  FROM tgt t
)
SELECT (SELECT CAST(n AS BIGINT) FROM n) AS total_units,
       (SELECT e FROM est WHERE q = 0.5) AS p50,
       (SELECT e FROM est WHERE q = 0.9) AS p90,
       (SELECT e FROM est WHERE q = 0.99) AS p99
"""


def lineitem_price_quantiles_autodomain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Auto-domain quantile sketch (operators/quantile_sketch.
    hist_auto_domain — r15 verdict item 5): l_extendedprice plus a
    synthetic 10-row spike at ~3M, far outside the [0, 120k) domain the
    fixed-domain siblings declare. With the declared domain the spike
    saturates into the top bin and p99/max-side estimates sit at the
    120k edge regardless of the spike's real position; the min/max
    pre-pass instead derives the domain from the data, so the sketch
    covers the spike and the interpolation reflects it. The oracle
    replays the pre-pass (min/max CTE), the derived bin width, and the
    interpolation bit-for-bit — lo/hi are emitted as columns so the
    domain derivation itself is hash-gated."""
    from ..operators.quantile_sketch import (
        hist_auto_domain,
        hist_count,
        hist_quantile,
        hist_sketch,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("v")
    )
    spike = spark.range(10).select(
        (F.lit(3_000_000.0) + F.col("id").cast("double")).alias("v")
    )
    df = li.unionByName(spike)
    lo, hi = hist_auto_domain(df, "v")
    bins = 240
    sk = hist_sketch(df, [], "v", lo=lo, hi=hi, bins=bins)
    q = lambda p: hist_quantile(F.col("sketch"), p, lo=lo, hi=hi, bins=bins)
    return sk.select(
        F.lit(lo).alias("dom_lo"),
        F.lit(hi).alias("dom_hi"),
        hist_count(F.col("sketch")).alias("n_rows"),
        q(0.5).alias("p50"),
        q(0.9).alias("p90"),
        q(0.99).alias("p99"),
    )


_AUTODOMAIN_QUANTILES_ORACLE = """
WITH src AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
  UNION ALL
  SELECT 3000000.0 + CAST(i AS DOUBLE) AS v
  FROM (SELECT unnest(range(10)) AS i)
),
dom AS (
  SELECT min(v) AS lo,
         CASE WHEN max(v) > min(v) THEN max(v) ELSE min(v) + 1.0 END AS hi
  FROM src
),
b AS (
  SELECT least(239, greatest(0,
           CAST(floor((s.v - d.lo) / ((d.hi - d.lo) / 240.0)) AS INT)))
           AS bin
  FROM src s CROSS JOIN dom d
),
h AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
n AS (SELECT sum(c) AS n FROM h),
cum AS (
  SELECT bin, c,
         sum(c) OVER (ORDER BY bin) AS cum,
         sum(c) OVER (ORDER BY bin) - c AS before
  FROM h
),
tgt AS (
  SELECT q.q, least(greatest(CAST(floor(q.q * n.n) AS BIGINT) + 1, 1), n.n) AS r
  FROM n CROSS JOIN (SELECT unnest([0.5, 0.9, 0.99]) AS q) q
),
est AS (
  SELECT t.q,
         (SELECT round(d.lo + ((d.hi - d.lo) / 240.0) *
                       (CAST(c.bin AS DOUBLE)
                        + CAST(t.r - c.before AS DOUBLE)
                          / CAST(c.c AS DOUBLE)), 6)
          FROM cum c CROSS JOIN dom d WHERE c.cum >= t.r
          ORDER BY c.bin LIMIT 1) AS e
  FROM tgt t
)
SELECT (SELECT lo FROM dom) AS dom_lo,
       (SELECT hi FROM dom) AS dom_hi,
       (SELECT CAST(n AS BIGINT) FROM n) AS n_rows,
       (SELECT e FROM est WHERE q = 0.5) AS p50,
       (SELECT e FROM est WHERE q = 0.9) AS p90,
       (SELECT e FROM est WHERE q = 0.99) AS p99
"""


def _log_edges_lineitem() -> list[float]:
    """One definition site for the log-bin edges BOTH the Spark query
    and its oracle use (the _BLOOM_PROBE_USERS interpolation rule):
    160 geometric bins over the deliberately huge [1, 2e8) domain —
    ~12.7% relative width per bin everywhere, no profiling needed.
    Computed once in Python; each engine receives repr-exact literals,
    so no transcendental function runs in either engine."""
    from ..operators.quantile_sketch import log_edges

    return log_edges(1.0, 2e8, 160)


def extendedprice_logbin_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Log-spaced-bin quantile sketch (operators/quantile_sketch.
    log_edges / hist_sketch_edges / hist_quantile_edges — the
    ClickHouse quantileTiming shape, r16 verdict item 6) on
    l_extendedprice plus a planted 1000x spike (10 rows at ~1e8):
    under the SAME huge declared domain [1, 2e8), the equi-width
    sketch's 1.25M-wide bins smear the ~36k median into the first bin
    (eq_p50 is interpolation noise at the 625k scale), while the log
    sketch keeps ~13% relative width at every magnitude, so log
    p50/p90/p99 track the data AND the spike without a domain
    pre-pass. Both estimators are emitted and hash-gated — the smear
    is part of the oracle, not a prose claim. Bit-portability: the
    edges are Python-computed literals (no ln/exp in either engine);
    binning is comparisons, interpolation is +-*/ and round(6)."""
    from ..operators.quantile_sketch import (
        hist_count,
        hist_quantile,
        hist_quantile_edges,
        hist_sketch,
        hist_sketch_edges,
    )

    edges = _log_edges_lineitem()
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("v")
    )
    spike = spark.range(10).select(
        (F.lit(100_000_000.0) + F.col("id").cast("double")).alias("v")
    )
    df = li.unionByName(spike)
    sk_log = hist_sketch_edges(df, [], "v", edges=edges)
    sk_eq = hist_sketch(df, [], "v", lo=1.0, hi=2e8, bins=160)
    ql = lambda p: hist_quantile_edges(F.col("sketch"), p, edges=edges)
    log_side = sk_log.select(
        hist_count(F.col("sketch")).alias("n_rows"),
        ql(0.5).alias("log_p50"),
        ql(0.9).alias("log_p90"),
        ql(0.99).alias("log_p99"),
    )
    eq_side = sk_eq.select(
        hist_quantile(F.col("sketch"), 0.5, lo=1.0, hi=2e8, bins=160).alias(
            "eq_p50"
        )
    )
    return log_side.crossJoin(eq_side)


def _logbin_quantiles_oracle() -> str:
    edges = _log_edges_lineitem()
    lits = ", ".join(repr(e) for e in edges)
    interior = ", ".join(repr(e) for e in edges[1:-1])
    w = (2e8 - 1.0) / 160
    return f"""
WITH src AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
  UNION ALL
  SELECT 100000000.0 + CAST(i AS DOUBLE) AS v
  FROM (SELECT unnest(range(10)) AS i)
),
earr AS (SELECT CAST([{lits}] AS DOUBLE[]) AS e),
lb AS (
  SELECT CAST(len(list_filter(CAST([{interior}] AS DOUBLE[]),
                              x -> x <= s.v)) AS INT) AS bin
  FROM src s
),
lh AS (SELECT bin, count(*) AS c FROM lb GROUP BY bin),
n AS (SELECT sum(c) AS n FROM lh),
lcum AS (
  SELECT bin, c, sum(c) OVER (ORDER BY bin) AS cum,
         sum(c) OVER (ORDER BY bin) - c AS before
  FROM lh
),
tgt AS (
  SELECT q.q, least(greatest(CAST(floor(q.q * n.n) AS BIGINT) + 1, 1), n.n) AS r
  FROM n CROSS JOIN (SELECT unnest([0.5, 0.9, 0.99]) AS q) q
),
lest AS (
  SELECT t.q,
         (SELECT round(e.e[c.bin + 1]
                       + (e.e[c.bin + 2] - e.e[c.bin + 1])
                         * (CAST(t.r - c.before AS DOUBLE)
                            / CAST(c.c AS DOUBLE)), 6)
          FROM lcum c CROSS JOIN earr e WHERE c.cum >= t.r
          ORDER BY c.bin LIMIT 1) AS e
  FROM tgt t
),
eb AS (
  SELECT least(159, greatest(0,
           CAST(floor((s.v - 1.0) / {w!r}) AS INT))) AS bin
  FROM src s
),
eh AS (SELECT bin, count(*) AS c FROM eb GROUP BY bin),
ecum AS (
  SELECT bin, c, sum(c) OVER (ORDER BY bin) AS cum,
         sum(c) OVER (ORDER BY bin) - c AS before
  FROM eh
),
etgt AS (
  SELECT least(greatest(CAST(floor(0.5 * n.n) AS BIGINT) + 1, 1), n.n) AS r
  FROM n
),
eest AS (
  SELECT (SELECT round(1.0 + {w!r} *
                       (CAST(c.bin AS DOUBLE)
                        + CAST(t.r - c.before AS DOUBLE)
                          / CAST(c.c AS DOUBLE)), 6)
          FROM ecum c WHERE c.cum >= t.r
          ORDER BY c.bin LIMIT 1) AS e
  FROM etgt t
)
SELECT (SELECT CAST(n AS BIGINT) FROM n) AS n_rows,
       (SELECT e FROM lest WHERE q = 0.5) AS log_p50,
       (SELECT e FROM lest WHERE q = 0.9) AS log_p90,
       (SELECT e FROM lest WHERE q = 0.99) AS log_p99,
       (SELECT e FROM eest) AS eq_p50
"""


def bloom_bits_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom skip index's bit-position semantics pinned on every
    row (the zorder_key_events pattern: a value oracle cannot see file
    layout, so the pruning effect is pinned in pytest via the sidecar
    while THIS query pins the exact hash-family arithmetic the index
    and its prober must agree on — one drifted bit anywhere shifts
    bit_sum): per event_type, integer-exact min/max/sum over all k=4
    bit positions of user_id on the m=8192-bit filter
    (sources/bloom_index.py `_bit_pos`, the md5-mod family shared with
    operators/cms.py)."""
    from ..sources.bloom_index import _bit_pos

    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    bits = ev.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("_j"),
        "user_id",
    ).select(
        "event_type",
        _bit_pos(F.col("user_id"), F.col("_j"), m=8192).alias("bit"),
    )
    return bits.groupBy("event_type").agg(
        F.min("bit").alias("bit_min"),
        F.max("bit").alias("bit_max"),
        F.sum("bit").cast("bigint").alias("bit_sum"),
        F.count(F.lit(1)).alias("n_bits"),
    )


_BLOOM_BITS_ORACLE = """
WITH b AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                                  || CAST(user_id AS VARCHAR)), 1, 15))
              ::BIGINT % 8192 AS INT) AS bit
  FROM events CROSS JOIN (SELECT CAST(unnest(range(4)) AS INT) AS j) r
)
SELECT event_type,
       min(bit) AS bit_min,
       max(bit) AS bit_max,
       CAST(sum(bit) AS BIGINT) AS bit_sum,
       count(*) AS n_bits
FROM b GROUP BY event_type
"""


_BLOOM_PROBE_USERS = [1, 2, 3, 5, 8]


def skipindex_pruned_scans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end Bloom-pruned scans, ALL THREE index modes in one
    lane-tagged registered query (r15 verdict item 4 + the item-3
    consolidation shape; reference anchor: the minmax skip-index DDL of
    /root/reference/src/1-naive.test.ts:25). Each lane writes a split
    copy, builds the sidecar, and answers its probe reading ONLY the
    files the index keeps, ordinary predicate on top; the oracle is
    the UNPRUNED filter per lane, so a hash match proves no mode ever
    drops a row. (The pruning EFFECT — fewer files read — is pinned in
    tests/test_plans.py, where the sidecar is visible; a value oracle
    cannot see file layout.)

    - lane 'point' (bloom_filter): events split by user range, five
      fixed user probes; key = user_id, n = the user's event count,
      checksum = sum(event_id);
    - lane 'token' (tokenbf_v1): documents hash-split, probed with the
      corpus's rarest token (fewest occurrences, lexicographic
      tiebreak — derived deterministically, replayed by the oracle);
      key = doc_id, n = the doc's token count;
    - lane 'ngram' (ngrambf_v1): char-3-gram sidecar probed with the
      rarest length>=4 token as a SUBSTRING — a file can contain the
      fragment only if every one of its 3-grams is present; key =
      doc_id, n = the doc's char count."""
    import os

    from ..operators.text import tokens
    from ..sources.bloom_index import compact_sidecar, index_files, pruned_paths
    from .segmentation_queries import _scratch_dir

    root = _scratch_dir("skipindex_pruned_scans")

    def read_pruned(keep: list[str], schema: str) -> DataFrame:
        # a fully-pruned probe legitimately keeps ZERO files;
        # spark.read.parquet(*[]) would raise instead of reading nothing
        if not keep:
            return spark.createDataFrame([], schema)
        return spark.read.parquet(*keep)

    ev_path = os.path.join(root, "ev")
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id"
    )
    ev.repartitionByRange(8, "user_id").write.parquet(ev_path)
    index_files(spark, ev_path, "user_id")
    ev_schema = "user_id bigint, event_type string, event_id bigint"
    parts = []
    for u in _BLOOM_PROBE_USERS:
        keep = pruned_paths(spark, ev_path, "user_id", u)
        parts.append(
            read_pruned(keep, ev_schema).filter(F.col("user_id") == u)
        )
    un = parts[0]
    for p in parts[1:]:
        un = un.unionAll(p)
    point = un.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").cast("bigint").alias("checksum"),
    ).select(
        F.lit("point").alias("lane"),
        F.col("user_id").cast("string").alias("key"),
        "n",
        "checksum",
    )

    docs_path = os.path.join(root, "docs")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # two-wave write + incremental index builds: the token sidecar ends
    # up with TWO files, so the 'token_compacted' lane exercises a real
    # compaction (2 -> 1) before its probe
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    docs.filter(F.col("doc_id") < mid).repartition(6, "doc_id").write.parquet(
        docs_path
    )
    index_files(spark, docs_path, "text", tokenized=True)
    docs.filter(F.col("doc_id") >= mid).repartition(2, "doc_id").write.mode(
        "append"
    ).parquet(docs_path)
    index_files(spark, docs_path, "text", tokenized=True)
    index_files(spark, docs_path, "text", ngram=3)
    # one explode + one count for BOTH rare probes (the vocab table is
    # tiny; caching it keeps the corpus tokenization to a single pass)
    stats = (
        docs.select(F.explode(tokens(F.col("text"))).alias("g"))
        .groupBy("g")
        .count()
        .cache()
    )
    try:
        rare_tok = (
            stats.orderBy(F.asc("count"), F.asc("g")).limit(1)
            .collect()[0]["g"]
        )
        rare_frag = (
            stats.filter(F.length("g") >= 4)
            .orderBy(F.asc("count"), F.asc("g")).limit(1)
            .collect()[0]["g"]
        )
        # the hasAllTokens conjunction probes the two most common
        # length>=5 tokens (deterministic: count desc, lexicographic) —
        # common tokens individually prune nothing, so only the AND
        # composition gives the index anything to work with
        and_toks = [
            r["g"]
            for r in stats.filter(F.length("g") >= 5)
            .orderBy(F.desc("count"), F.asc("g")).limit(2)
            .collect()
        ]
    finally:
        stats.unpersist()
    docs_schema = "doc_id bigint, text string"
    token = (
        read_pruned(
            pruned_paths(spark, docs_path, "text", rare_tok, tokenized=True),
            docs_schema,
        )
        .filter(F.array_contains(tokens(F.col("text")), rare_tok))
        .select(
            F.lit("token").alias("lane"),
            F.col("doc_id").cast("string").alias("key"),
            F.size(tokens(F.col("text"))).cast("bigint").alias("n"),
            F.col("doc_id").cast("bigint").alias("checksum"),
        )
    )
    ngram = (
        read_pruned(
            pruned_paths(spark, docs_path, "text", rare_frag, ngram=3),
            docs_schema,
        )
        .filter(F.col("text").contains(rare_frag))
        .select(
            F.lit("ngram").alias("lane"),
            F.col("doc_id").cast("string").alias("key"),
            F.length("text").cast("bigint").alias("n"),
            F.col("doc_id").cast("bigint").alias("checksum"),
        )
    )
    # lane 'token_and' (r16 verdict item 5): the hasToken(a) AND
    # hasToken(b) conjunction served by ONE sidecar pass — every
    # token's k bits must be set
    token_and = (
        read_pruned(
            pruned_paths(spark, docs_path, "text", and_toks, tokenized=True),
            docs_schema,
        )
        .filter(
            F.array_contains(tokens(F.col("text")), and_toks[0])
            & F.array_contains(tokens(F.col("text")), and_toks[1])
        )
        .select(
            F.lit("token_and").alias("lane"),
            F.col("doc_id").cast("string").alias("key"),
            F.size(tokens(F.col("text"))).cast("bigint").alias("n"),
            F.col("doc_id").cast("bigint").alias("checksum"),
        )
    )
    # lane 'token_compacted' (r16 verdict item 4): collapse the
    # two-file token sidecar to one and re-answer the rare-token probe
    # — identical rows prove compaction loses nothing, driver-checked
    compact_sidecar(spark, docs_path, "text", tokenized=True)
    token_compacted = (
        read_pruned(
            pruned_paths(spark, docs_path, "text", rare_tok, tokenized=True),
            docs_schema,
        )
        .filter(F.array_contains(tokens(F.col("text")), rare_tok))
        .select(
            F.lit("token_compacted").alias("lane"),
            F.col("doc_id").cast("string").alias("key"),
            F.size(tokens(F.col("text"))).cast("bigint").alias("n"),
            F.col("doc_id").cast("bigint").alias("checksum"),
        )
    )
    return (
        point.unionByName(token)
        .unionByName(ngram)
        .unionByName(token_and)
        .unionByName(token_compacted)
    )


# the probe-user set is interpolated from _BLOOM_PROBE_USERS below so
# the query and its oracle cannot drift apart
_SKIPINDEX_PRUNED_SCANS_ORACLE = """
WITH docs AS (
  SELECT doc_id, text,
         CASE WHEN regexp_replace(text,
                '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g') = ''
              THEN []::VARCHAR[]
              ELSE string_split_regex(
                     regexp_replace(text,
                       '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'),
                     '[ \\t\\n\\x0B\\f\\r]+')
         END AS t
  FROM documents
),
posting AS (SELECT doc_id, unnest(t) AS g FROM docs),
rare_tok AS (
  SELECT g FROM posting GROUP BY g ORDER BY count(*) ASC, g ASC LIMIT 1
),
rare_frag AS (
  SELECT g FROM posting WHERE length(g) >= 4
  GROUP BY g ORDER BY count(*) ASC, g ASC LIMIT 1
),
and_toks AS (
  SELECT g, row_number() OVER (ORDER BY count(*) DESC, g ASC) AS rn
  FROM posting WHERE length(g) >= 5
  GROUP BY g ORDER BY count(*) DESC, g ASC LIMIT 2
)
SELECT 'point' AS lane,
       CAST(user_id AS VARCHAR) AS key,
       count(*) AS n,
       CAST(sum(event_id) AS BIGINT) AS checksum
FROM events
WHERE user_id IN (__PROBE_USERS__)
GROUP BY user_id
UNION ALL
SELECT 'token', CAST(d.doc_id AS VARCHAR),
       CAST(len(d.t) AS BIGINT), CAST(d.doc_id AS BIGINT)
FROM docs d CROSS JOIN rare_tok r
WHERE list_contains(d.t, r.g)
UNION ALL
SELECT 'ngram', CAST(d.doc_id AS VARCHAR),
       CAST(length(d.text) AS BIGINT), CAST(d.doc_id AS BIGINT)
FROM docs d CROSS JOIN rare_frag r
WHERE contains(d.text, r.g)
UNION ALL
SELECT 'token_and', CAST(d.doc_id AS VARCHAR),
       CAST(len(d.t) AS BIGINT), CAST(d.doc_id AS BIGINT)
FROM docs d
WHERE list_contains(d.t, (SELECT g FROM and_toks WHERE rn = 1))
  AND list_contains(d.t, (SELECT g FROM and_toks WHERE rn = 2))
UNION ALL
SELECT 'token_compacted', CAST(d.doc_id AS VARCHAR),
       CAST(len(d.t) AS BIGINT), CAST(d.doc_id AS BIGINT)
FROM docs d CROSS JOIN rare_tok r
WHERE list_contains(d.t, r.g)
"""

_SKIPINDEX_PRUNED_SCANS_ORACLE = _SKIPINDEX_PRUNED_SCANS_ORACLE.replace(
    "__PROBE_USERS__", ", ".join(str(u) for u in _BLOOM_PROBE_USERS)
)


def vocab_kmv_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable partial sketches — the AggregatingMergeTree shape for
    distinct counting beyond HLL: per-(lang, source) bottom-128 KMV
    sketches of word 3-gram shingles fold per language with the sketch
    MERGE (bottom-k of a union == merge of bottom-k's), and the folded
    state yields the per-language distinct-vocabulary estimate. The
    oracle computes the bottom-128 over each language's hash set
    DIRECTLY — equality is only possible because the merge is lossless,
    so this query's hash check verifies the algebraic property itself
    on real data, per language, per round. Shingle semantics are the
    dedup family's (word_shingles: distinct 3-grams, whole-text
    singleton below 3 tokens, empty for empty docs)."""
    from ..operators.dedup import _spread, word_shingles_from_tokens
    from ..operators.kmv import kmv_estimate, kmv_merge_agg, kmv_sketch
    from ..operators.text import tokens

    k = 128
    docs = _t(spark, sf_dir, "documents")
    # spread to full parallelism and shingle from a projected token
    # COLUMN — shingling straight off the text re-runs the regexp
    # tokenizer per shingle in the interpreted HOF path (the
    # shingled_docs pattern; measured 6.9 -> 1.8 s at sf0.1)
    sh = (
        _spread(docs)
        .select("lang", "source", tokens(F.col("text")).alias("_t"))
        .select(
            "lang",
            "source",
            F.explode(word_shingles_from_tokens(F.col("_t"), 3)).alias("sh"),
        )
    )
    partials = kmv_sketch(sh, ["lang", "source"], "sh", k=k)
    merged = partials.groupBy("lang").agg(
        kmv_merge_agg("sketch", k=k).alias("sketch"),
        F.count(F.lit(1)).alias("n_partials"),
    )
    return merged.select(
        "lang",
        F.col("n_partials").cast("int").alias("n_partials"),
        kmv_estimate(F.col("sketch"), k=k).alias("est_distinct_shingles"),
    )


_KMV_VOCAB_ORACLE = """
WITH toks AS (
  SELECT lang, source,
         CASE WHEN regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g') = ''
              THEN []::VARCHAR[]
              ELSE string_split_regex(
                     regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+')
         END AS t
  FROM documents
),
sh AS (
  SELECT lang, source,
         unnest(CASE WHEN len(t) = 0 THEN []::VARCHAR[]
                     WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                     ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]
                END) AS s
  FROM toks
),
h AS (
  SELECT DISTINCT lang, source,
         ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
  FROM sh
),
np AS (
  SELECT lang, count(DISTINCT source) AS n_partials FROM h GROUP BY lang
),
rk AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
  FROM (SELECT DISTINCT lang, h FROM h)
),
agg AS (
  SELECT lang, count(*) FILTER (rn <= 128) AS n,
         max(CASE WHEN rn = 128 THEN h END) AS hk
  FROM rk GROUP BY lang
)
SELECT a.lang, CAST(np.n_partials AS INT) AS n_partials,
       CASE WHEN a.n < 128 THEN CAST(a.n AS DOUBLE)
            ELSE 127.0 * 1152921504606846976.0 / CAST(a.hk AS DOUBLE)
       END AS est_distinct_shingles
FROM agg a JOIN np USING (lang)
"""


# --- rollup / grouping sets ----------------------------------------------------


def revenue_rollup_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (nation, order year) revenue: per (nation, year), per nation,
    and grand total in one pass — Catalyst expands the grouping sets into a
    single shuffle (Expand + hash agg), no N-pass union."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate"))
        .rollup("n_name", "o_year")
        .agg(_dsum(F.col("o_totalprice")).alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


_ROLLUP_ORACLE = """
SELECT n_name, o_year,
       CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM (
  SELECT n_name, year(o_orderdate) AS o_year, o_totalprice
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
GROUP BY ROLLUP (n_name, o_year)
"""




def revenue_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (returnflag, linestatus): all four grouping sets — per pair,
    per flag, per status, grand total — in ONE Expand + hash-agg pass
    (same single-shuffle shape as the ROLLUP query; a 4-query UNION would
    scan the fact table four times). grouping_id disambiguates subtotal
    NULLs from (non-existent here) data NULLs, matching DuckDB's
    GROUPING() semantics bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            _dsum(revenue).alias("revenue"),
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id().cast("int").alias("gid"),
        )
    )


_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
       CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
       count(*) AS n_rows,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --- window frames: running revenue per nation ---------------------------------


def running_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative yearly revenue per nation: aggregate then a running-sum
    frame (ROWS UNBOUNDED PRECEDING..CURRENT). Decimal until the final cast
    so the cross-engine result is order-exact."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    yearly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("n_name", "o_year")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("rev"))
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy("o_year")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return yearly.select(
        "n_name",
        "o_year",
        F.col("rev").cast("double").alias("revenue"),
        F.sum("rev").over(w).cast("double").alias("running_revenue"),
    )


_RUNNING_ORACLE = """
WITH yearly AS (
  SELECT n_name, year(o_orderdate) AS o_year,
         sum(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, o_year, CAST(rev AS DOUBLE) AS revenue,
       CAST(sum(rev) OVER (PARTITION BY n_name ORDER BY o_year
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_revenue
FROM yearly
"""


# --- outer join: every customer with order stats --------------------------------


def customer_order_stats_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER: all customers, including the order-less, with counts and
    spend. The fact side shuffles on the join key once; count(o_orderkey)
    counts only matched rows, so customers without orders report 0."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(_dsum(F.col("o_totalprice")), F.lit(0.0)).alias("total_spend"),
        )
    )


_OUTER_ORACLE = """
SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders,
       coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 0.0) AS total_spend
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY 1, 2
"""


# --- EXISTS / NOT IN / scalar subqueries ---------------------------------------


def order_priority_with_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — EXISTS correlated subquery as a left-semi join:
    orders from 1997 with at least one lineitem shipped after the order
    date, counted per priority. The semi-join shuffles each side once on
    the key and keeps no payload from the inner side."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = li.join(
        orders, (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate)
    ).select("o_orderkey")
    return (
        orders.join(late, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_EXISTS_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


def brand_supplier_counts_excluding_negative(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 shape — NOT IN as a (broadcast) anti join: distinct
    suppliers per part brand via the lineitem link, excluding suppliers
    with negative account balance. The excluded-supplier set is tiny ->
    broadcast anti join, no shuffle of the fact side for the exclusion."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


_NOTIN_ORACLE = """
SELECT p_brand, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand
"""


def rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — scalar subquery + NOT EXISTS: customers whose
    balance beats the average positive balance and who have no orders,
    per market segment. The scalar aggregate is computed once (one-row
    broadcast), the no-orders test is an anti join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    # decimal-exact sum + one double division (registry determinism rule):
    # a distributed double F.avg is partition-order dependent in the last
    # ulp, which could flip customers sitting exactly at the threshold
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_avg")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast("double") > F.col("_avg"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            _dsum(F.col("c_acctbal")).alias("total_bal"),
        )
    )


_SCALAR_SUB_ORACLE = """
SELECT c_mktsegment, count(*) AS n_custs,
       CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_bal
FROM customer
WHERE CAST(c_acctbal AS DOUBLE) >
      (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / count(*)
       FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""




def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy earliest-chain event funnel view -> click -> purchase within
    7 days (see operators/funnel.py for the exact semantics contract and
    the windowFunnel comparison)."""
    return funnel_levels(
        _t(spark, sf_dir, "events"), ["view", "click", "purchase"], window="7 days"
    )


_FUNNEL_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
),
a AS (
  SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1
),
b AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM ev e JOIN a ON e.user_id = a.user_id AND e.ts > a.t1
  WHERE e.event_type = 'click' GROUP BY 1
),
c AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM ev e JOIN b ON e.user_id = b.user_id AND e.ts > b.t2
  WHERE e.event_type = 'purchase' GROUP BY 1
),
u AS (SELECT DISTINCT user_id FROM ev)
SELECT u.user_id,
       CAST(CASE
         WHEN c.t3 IS NOT NULL AND c.t3 <= a.t1 + INTERVAL 7 DAY THEN 3
         WHEN b.t2 IS NOT NULL AND b.t2 <= a.t1 + INTERVAL 7 DAY THEN 2
         WHEN a.t1 IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS funnel_level,
       CAST(floor(epoch(a.t1)) AS BIGINT) AS first_step_ts
FROM u LEFT JOIN a USING (user_id) LEFT JOIN b USING (user_id) LEFT JOIN c USING (user_id)
"""


def funnel_exact_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT maximal-chain funnel (windowFunnel 'strict_increase'
    semantics) over the same steps/window as the greedy query — the pair
    documents the greedy <= exact contract with live data. The oracle
    enumerates chains directly with self-joins (EXISTS-style), a
    genuinely different algorithm from the engine's dominant-start
    pruning + per-start greedy extension."""
    return funnel_levels_exact(
        _t(spark, sf_dir, "events"), ["view", "click", "purchase"], window="7 days"
    )


_FUNNEL_EXACT_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
),
u AS (SELECT DISTINCT user_id FROM ev),
l1 AS (SELECT DISTINCT user_id FROM ev WHERE event_type = 'view'),
l2 AS (
  SELECT DISTINCT a.user_id
  FROM ev a JOIN ev b ON a.user_id = b.user_id
  WHERE a.event_type = 'view' AND b.event_type = 'click'
    AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 7 DAY
),
l3 AS (
  SELECT DISTINCT a.user_id
  FROM ev a
  JOIN ev b ON a.user_id = b.user_id AND b.event_type = 'click'
           AND b.ts > a.ts
  JOIN ev c ON a.user_id = c.user_id AND c.event_type = 'purchase'
           AND c.ts > b.ts AND c.ts <= a.ts + INTERVAL 7 DAY
  WHERE a.event_type = 'view'
)
SELECT u.user_id,
       CAST(CASE WHEN u.user_id IN (SELECT user_id FROM l3) THEN 3
                 WHEN u.user_id IN (SELECT user_id FROM l2) THEN 2
                 WHEN u.user_id IN (SELECT user_id FROM l1) THEN 1
                 ELSE 0 END AS INTEGER) AS funnel_level
FROM u
"""


def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by the epoch-week of their
    first `signup` event; for each (cohort, week-offset) the count of
    cohort users active that week and the retention rate. Weeks are pure
    epoch buckets (floor(unix_ts / 604800)) — no calendar/locale
    semantics to diverge between engines.

    Plan shape: one min-agg for cohorts, one user-keyed join back to the
    event stream (AQE-sized), one (cohort, offset) hash agg with
    count_distinct, one broadcast-joined cohort-size agg. All integers
    plus a single int/int double division."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        # floor, not cast: cast truncates toward zero, so a pre-1970
        # timestamp would land one week later than the documented
        # floor(unix_ts / 604800) bucket (and than the DuckDB oracle)
        F.floor(F.unix_timestamp("ts") / 604800).cast("bigint").alias("_wk"),
    )
    cohorts = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("_wk").alias("cohort_week"))
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    active = (
        ev.join(cohorts, "user_id")
        .filter(F.col("_wk") >= F.col("cohort_week"))
        .groupBy("cohort_week", (F.col("_wk") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    return active.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        F.col("n_active").cast("int").alias("n_active"),
        F.col("cohort_size").cast("int").alias("cohort_size"),
        (F.col("n_active").cast("double") / F.col("cohort_size")).alias("retention_rate"),
    )


_COHORT_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 604800) AS BIGINT) AS wk
  FROM events
),
cohorts AS (
  SELECT user_id, min(wk) AS cohort_week FROM ev
  WHERE event_type = 'signup' GROUP BY 1
),
sizes AS (
  SELECT cohort_week, count(*) AS cohort_size FROM cohorts GROUP BY 1
),
active AS (
  SELECT c.cohort_week, e.wk - c.cohort_week AS week_offset,
         count(DISTINCT e.user_id) AS n_active
  FROM ev e JOIN cohorts c ON e.user_id = c.user_id AND e.wk >= c.cohort_week
  GROUP BY 1, 2
)
SELECT a.cohort_week, a.week_offset,
       CAST(a.n_active AS INTEGER) AS n_active,
       CAST(s.cohort_size AS INTEGER) AS cohort_size,
       CAST(a.n_active AS DOUBLE) / s.cohort_size AS retention_rate
FROM active a JOIN sizes s USING (cohort_week)
"""


# --- JSON extraction over events.props ----------------------------------------


def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract props.k (JSON int) and aggregate per event type.

    get_json_object is the Spark-native path; the value also matches a
    regexp extract, which is what the oracle uses (DuckDB JSON functions
    live in an extension we don't assume loaded)."""
    events = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        (F.sum(k).cast("double") / F.count(k)).alias("avg_k"),
    )


_JSON_ORACLE = """
SELECT event_type, count(*) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(sum(k) AS DOUBLE) / count(k) AS avg_k
FROM (
  SELECT event_type,
         CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
"""


# --- as-of join -----------------------------------------------------------------


def asof_latest_order_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click event: the user's most recent order at or before the
    click (events.user_id ~ orders.o_custkey). Right side deduplicated per
    (custkey, orderdate) so the as-of match is unique -> deterministic.

    Oracle: DuckDB's native ASOF LEFT JOIN.
    """
    events = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )
    joined = asof_join(
        events,
        orders,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
    )
    return joined.select("event_id", "user_id", "o_orderkey", "o_totalprice")


_ASOF_ORACLE = """
WITH o AS (
  SELECT o_custkey AS user_id, o_orderdate,
         max(o_orderkey) AS o_orderkey,
         arg_max(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY 1, 2
),
e AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'click'
)
SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
FROM e ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
"""


# --- sessionization ---------------------------------------------------------------


def session_stats_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization, 4h inactivity gap. event_id
    tie-breaks the window order so determinism no longer rests on the
    (user, ts)-uniqueness of the corpus (r5 verdict item 5)."""
    events = _t(spark, sf_dir, "events")
    return session_stats(events, gap_seconds=14400, tiebreak_col="event_id")


_SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(CAST(ts AS TIMESTAMP))
                  - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) > 14400000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM sessions GROUP BY 1, 2
)
SELECT user_id, count(*) AS n_sessions,
       max(n_events) AS max_session_events,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM per_session GROUP BY user_id
"""


def session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session-window operator (F.session_window), 4h gap —
    the built-in counterpart of the hand-rolled gaps-and-islands in
    operators/sessionize.py. One shuffle on (user, merged window); Spark
    merges overlapping per-event windows internally. Boundary semantics:
    an event exactly gap seconds after the previous CONTINUES the session
    (inclusive merge), matching the oracle's ``diff > gap`` split."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window(F.col("ts"), "4 hours").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


_SESSION_WINDOW_ORACLE = """
WITH flagged AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(CAST(ts AS TIMESTAMP))
                  - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) > 14400000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM sessions GROUP BY user_id, sid
"""


def events_per_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window (F.window, 1h): the batch face of the
    streaming windowed-aggregation operator. Compiles to a plain hash agg
    on the derived window struct — one shuffle."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


_TUMBLING_ORACLE = """
SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
       event_type, count(*) AS n_events
FROM events
GROUP BY 1, 2
"""


def events_sliding_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h window, 30m slide): every event lands in exactly
    two windows; Spark expands via the window generator then hash-aggs.
    The oracle expands the same two buckets per event explicitly."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


_SLIDING_ORACLE = """
WITH starts AS (
  SELECT unnest([
           time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
           time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
             - INTERVAL '30 minutes'
         ]) AS window_start
  FROM events
)
SELECT window_start, count(*) AS n_events
FROM starts GROUP BY window_start
"""


def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (F.percentile) per order status.
    Exact percentile sorts per group — fine at per-group scale; switch to
    approx_percentile (t-digest, mergeable, no sort) when groups are
    huge, at the cost of the cross-engine value oracle."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.percentile(F.col("o_totalprice").cast("double"), F.lit(0.5)).alias("p50"),
        F.percentile(F.col("o_totalprice").cast("double"), F.lit(0.95)).alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )


_PERCENTILE_ORACLE = """
SELECT o_orderstatus,
       quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS p50,
       quantile_cont(CAST(o_totalprice AS DOUBLE), 0.95) AS p95,
       count(*) AS n
FROM orders GROUP BY o_orderstatus
"""


def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event counts fanned into one column per event type.
    The value list is explicit, so Catalyst compiles straight to one hash
    agg with conditional counts — no second pass to discover keys, which
    is what an unlisted pivot costs at scale."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            F.coalesce("click", F.lit(0)).alias("n_click"),
            F.coalesce("view", F.lit(0)).alias("n_view"),
            F.coalesce("purchase", F.lit(0)).alias("n_purchase"),
        )
    )


_PIVOT_ORACLE = """
SELECT user_id,
       count(*) FILTER (event_type = 'click') AS n_click,
       count(*) FILTER (event_type = 'view') AS n_view,
       count(*) FILTER (event_type = 'purchase') AS n_purchase
FROM events GROUP BY user_id
"""


def small_quantity_revenue_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated scalar aggregate: per brand, the revenue
    sitting in lineitems whose quantity is below 20% of their part's average
    quantity (the 'small-order' slice a sourcing team would consolidate).

    Spark shape: the per-part average is a groupBy over lineitem joined
    back on l_partkey (Catalyst turns the correlated subquery into exactly
    this), the brand dimension is a broadcast. Averages are decimal-exact
    sum / count so the 0.2x threshold compare is bit-identical to the SQL
    oracle (a distributed double avg differs in the last ulp and could
    flip a boundary row)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_part = li.groupBy("l_partkey").agg(
        (_dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("_avg_qty")
    )
    return (
        li.join(per_part, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            _dsum(F.col("l_extendedprice")).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


_Q17_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS small_qty_revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN per_part USING (l_partkey)
JOIN part ON p_partkey = l_partkey
WHERE l_quantity < 0.2 * avg_qty
GROUP BY p_brand
"""


def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — min-per-group correlated lookup: for every part,
    the supplier offering the lowest observed unit price (extendedprice /
    quantity) across its lineitems, ties broken on the lower suppkey.

    Spark shape: one window rank over (part, unit price, suppkey) — a
    single shuffle on l_partkey — then broadcast joins to both dimensions.
    The unit price is one double division, bit-identical across engines."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    unit = li.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("unit_price"), F.asc("l_suppkey")
    )
    best = (
        unit.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round("unit_price", 6).alias("unit_price"),
        )
    )


_Q2_ORACLE = """
WITH ranked AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY l_extendedprice / l_quantity, l_suppkey) AS rk
  FROM lineitem WHERE l_quantity > 0
)
SELECT p_partkey, p_name, s_name, round(unit_price, 6) AS unit_price
FROM ranked
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE rk = 1
"""


QUERIES = [
    QuerySpec("q1_pricing_summary", q1_pricing_summary, _Q1_ORACLE, headline=True),
    QuerySpec(
        "small_quantity_revenue_by_brand",
        small_quantity_revenue_by_brand,
        _Q17_ORACLE,
    ),
    QuerySpec(
        "cheapest_supplier_per_part", cheapest_supplier_per_part, _Q2_ORACLE
    ),
    QuerySpec("q3_top_revenue_orders", q3_top_revenue_orders, _Q3_ORACLE, headline=True),
    QuerySpec("q5_nation_revenue", q5_nation_revenue, _Q5_ORACLE, headline=True),
    QuerySpec("top3_orders_per_customer", top3_orders_per_customer, _TOP3_ORACLE),
    QuerySpec("heavy_click_and_view_users", heavy_click_and_view_users, _INTERSECT_ORACLE),
    QuerySpec(
        "heavy_click_no_heavy_purchase_users",
        heavy_click_no_heavy_purchase_users,
        _EXCEPT_ORACLE,
    ),
    QuerySpec(
        "heavy_click_or_purchase_users", heavy_click_or_purchase_users, _UNION_ORACLE
    ),
    QuerySpec("segment_overlap_kmv", segment_overlap_kmv, _KMV_OVERLAP_ORACLE),
    QuerySpec("vocab_kmv_per_lang", vocab_kmv_per_lang, _KMV_VOCAB_ORACLE),
    QuerySpec("zorder_key_events", zorder_key_events, _ZORDER_ORACLE),
    QuerySpec("bloom_bits_events", bloom_bits_events, _BLOOM_BITS_ORACLE),
    QuerySpec(
        "skipindex_pruned_scans",
        skipindex_pruned_scans,
        _SKIPINDEX_PRUNED_SCANS_ORACLE,
    ),
    QuerySpec(
        "user_event_type_maps", user_event_type_maps, _MAP_AGG_ORACLE
    ),
    QuerySpec(
        "distinct_users_upto_per_type",
        distinct_users_upto_per_type,
        _UNIQ_UPTO_ORACLE,
    ),
    QuerySpec(
        "summing_daily_user_values", summing_daily_user_values, _SUMMING_ORACLE
    ),
    QuerySpec(
        "sequence_count_view_purchase",
        sequence_count_view_purchase,
        _SEQUENCE_COUNT_ORACLE,
    ),
    QuerySpec(
        "collapsing_view_click_net", collapsing_view_click_net, _COLLAPSING_ORACLE
    ),
    QuerySpec(
        "versioned_collapsing_pending_cancels",
        versioned_collapsing_pending_cancels,
        _VERSIONED_COLLAPSING_ORACLE,
    ),
    QuerySpec(
        "lineitem_price_quantiles_weighted",
        lineitem_price_quantiles_weighted,
        _WEIGHTED_QUANTILES_ORACLE,
    ),
    QuerySpec(
        "lineitem_price_quantiles_autodomain",
        lineitem_price_quantiles_autodomain,
        _AUTODOMAIN_QUANTILES_ORACLE,
    ),
    QuerySpec(
        "order_value_quantiles_by_priority",
        order_value_quantiles_by_priority,
        _QSKETCH_PRIORITY_ORACLE,
    ),
    QuerySpec(
        "order_value_quantiles_merged",
        order_value_quantiles_merged,
        _QSKETCH_MERGED_ORACLE,
    ),
    QuerySpec("heavy_user_counts_cms", heavy_user_counts_cms, _CMS_ORACLE),
    QuerySpec(
        "heavy_users_exact_via_cms", heavy_users_exact_via_cms, _CMS_HH_ORACLE
    ),
    QuerySpec(
        "top_users_per_event_type_topk",
        top_users_per_event_type_topk,
        _TOPK_USERS_ORACLE,
    ),
    QuerySpec(
        "extendedprice_logbin_quantiles",
        extendedprice_logbin_quantiles,
        _logbin_quantiles_oracle(),
    ),
    QuerySpec(
        "top_parts_per_returnflag_topkw",
        top_parts_per_returnflag_topkw,
        _TOPKW_PARTS_ORACLE,
    ),
    QuerySpec("audience_todate_kmv", audience_todate_kmv, _AUDIENCE_TODATE_ORACLE),
    QuerySpec(
        "audience_sliding7_kmv", audience_sliding7_kmv, _AUDIENCE_SLIDING7_ORACLE
    ),
    QuerySpec(
        "purchases_in_signup_window",
        purchases_in_signup_window,
        _INTERVAL_JOIN_ORACLE,
    ),
    QuerySpec(
        "purchases_with_signup_window_left",
        purchases_with_signup_window_left,
        _INTERVAL_LEFT_ORACLE,
    ),
    QuerySpec(
        "purchases_outside_signup_window",
        purchases_outside_signup_window,
        _INTERVAL_ANTI_ORACLE,
    ),
    QuerySpec(
        "revenue_rollup_nation_year", revenue_rollup_nation_year, _ROLLUP_ORACLE
    ),
    QuerySpec(
        "revenue_cube_flag_status", revenue_cube_flag_status, _CUBE_ORACLE
    ),
    QuerySpec(
        "running_revenue_per_nation", running_revenue_per_nation, _RUNNING_ORACLE
    ),
    QuerySpec(
        "customer_order_stats_outer", customer_order_stats_outer, _OUTER_ORACLE
    ),
    QuerySpec(
        "order_priority_with_late_ship",
        order_priority_with_late_ship,
        _EXISTS_ORACLE,
    ),
    QuerySpec(
        "brand_supplier_counts_excluding_negative",
        brand_supplier_counts_excluding_negative,
        _NOTIN_ORACLE,
    ),
    QuerySpec("rich_idle_customers", rich_idle_customers, _SCALAR_SUB_ORACLE),
    QuerySpec("json_props_stats", json_props_stats, _JSON_ORACLE),
    QuerySpec(
        "asof_latest_order_before_click",
        asof_latest_order_before_click,
        _ASOF_ORACLE,
        headline=True,
    ),
    QuerySpec("session_stats_per_user", session_stats_per_user, _SESSION_ORACLE, headline=True),
    QuerySpec("session_window_counts", session_window_counts, _SESSION_WINDOW_ORACLE),
    QuerySpec("events_per_hour", events_per_hour, _TUMBLING_ORACLE),
    QuerySpec("events_sliding_30m", events_sliding_30m, _SLIDING_ORACLE),
    QuerySpec("order_value_percentiles", order_value_percentiles, _PERCENTILE_ORACLE),
    QuerySpec("event_type_pivot", event_type_pivot, _PIVOT_ORACLE),
    QuerySpec("funnel_view_click_purchase", funnel_view_click_purchase, _FUNNEL_ORACLE, headline=True),
    QuerySpec("funnel_exact_view_click_purchase", funnel_exact_view_click_purchase, _FUNNEL_EXACT_ORACLE),
    QuerySpec("cohort_retention_weekly", cohort_retention_weekly, _COHORT_ORACLE, headline=True),
]
