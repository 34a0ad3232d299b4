"""Keyed point-in-interval (range) join — the temporal-join sibling of
operators/asof_join.py, without the range-predicate blowup.

Expressing ``p.key = i.key AND p.ts BETWEEN i.start AND i.end`` directly
gives Spark an equi-join on the key with the range as a residual — fine
until one key holds many intervals (every point under that key meets
every interval row before the filter), and catastrophic with no usable
equi key at all (BroadcastNestedLoopJoin). The scalable shape coarsens
time into buckets: each interval explodes into the buckets it spans
(linear in interval length — bounded when intervals are bounded, the
Flink interval-join contract), each point lands in exactly ONE bucket,
and the join becomes a plain (key, bucket) equi-join with the exact
range check as a post-filter. A point's single bucket means each
qualifying (point, interval) pair is emitted exactly once — no
post-dedup pass.

100-TB shape: one shuffle on (key, bucket) for each side; bucket
granularity trades explode factor against join selectivity (pick the
bucket near the typical interval length so intervals explode to O(1)
rows and a bucket only co-locates temporally-plausible pairs). Skewed
hot keys fall to the same salting mitigation as any equi-join
(operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    keys: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row of the same key whose
    [start_ts, end_ts] (both inclusive) contains point_ts. Column names
    other than ``keys`` must be disjoint between the two frames (the
    result carries both sides' columns). ``how`` is 'inner' or
    'left_semi' (points that fall in at least one window)."""
    p = points.withColumn(
        "_bkt",
        F.floor(F.unix_timestamp(F.col(point_ts)) / bucket_seconds).cast(
            "long"
        ),
    ).alias("p")
    i = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(
                    F.unix_timestamp(F.col(start_ts)) / bucket_seconds
                ).cast("long"),
                F.floor(
                    F.unix_timestamp(F.col(end_ts)) / bucket_seconds
                ).cast("long"),
            )
        ),
    ).alias("i")
    cond = F.col("p._bkt") == F.col("i._bkt")
    for k in keys:
        cond = cond & (F.col(f"p.{k}") == F.col(f"i.{k}"))
    cond = (
        cond
        & (F.col(f"p.{point_ts}") >= F.col(f"i.{start_ts}"))
        & (F.col(f"p.{point_ts}") <= F.col(f"i.{end_ts}"))
    )
    if how == "left_semi":
        return p.join(i, cond, "left_semi").drop("_bkt")
    joined = p.join(i, cond, how)
    keep = [F.col(f"p.{c}") for c in points.columns] + [
        F.col(f"i.{c}") for c in intervals.columns if c not in keys
    ]
    return joined.select(*keep)
