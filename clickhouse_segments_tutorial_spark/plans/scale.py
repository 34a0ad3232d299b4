"""Scale-hardening queries: the skew-mitigation operators run against the
corpus, value-oracled against the UNSALTED SQL — proving the salted plans
are pure layout changes (same rows, same values, different shuffle shape).

The corpus itself is small and near-uniform; the skew these operators
exist for is synthesized in tests/test_skew.py (one key holding ~90% of
rows, where the salted plans spread the hot key across tasks). Here the
point is end-to-end equivalence on real tables under the driver's
hash-compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.skew import replicate_skew_join, salted_count_distinct
from ..sources.catalog import load_table
from .registry import QuerySpec


def _dsum(col, scale: str = "decimal(28,6)"):
    return F.sum(col.cast(scale)).cast("double")


def skewjoin_event_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events ⋈ customer on user_id with hot-key salting, rolled up per
    market segment. hot_keys is auto-detected from a content-hash sample
    (deterministic), and the result must equal the plain-join oracle
    row-for-row — salting is invisible in the output by construction."""
    events = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = replicate_skew_join(
        events, cust, "user_id", n_salts=4, salt_source="event_id"
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        _dsum(F.col("value")).alias("total_value"),
    )


_SKEWJOIN_ORACLE = """
SELECT c_mktsegment, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


def salted_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count(DISTINCT user_id) per event_type via the two-phase
    salt-bucketed plan — equals plain COUNT(DISTINCT) by the disjointness
    of hash buckets."""
    events = load_table(spark, sf_dir, "events")
    return salted_count_distinct(
        events, "event_type", "user_id", n_salts=16, alias="n_users"
    )


_SALTED_DISTINCT_ORACLE = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events
WHERE user_id IS NOT NULL
GROUP BY event_type
"""


QUERIES = [
    QuerySpec(
        "skewjoin_event_customer_revenue",
        skewjoin_event_customer_revenue,
        _SKEWJOIN_ORACLE,
    ),
    QuerySpec(
        "salted_distinct_users_per_type",
        salted_distinct_users_per_type,
        _SALTED_DISTINCT_ORACLE,
    ),
]
