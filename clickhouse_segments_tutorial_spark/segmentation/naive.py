"""Variant 1 — naive full recompute (/root/reference/src/1-naive.test.ts).

Every run recomputes every user's exact event count from all history and
appends a new assignment version; serving resolves latest-wins:

    INSERT INTO segment_assignments
    SELECT user_id, count() >= 2 AS value
    FROM user_events WHERE event_name = 'BUTTON_CLICK' GROUP BY user_id
        (1-naive.test.ts:72-79)

    SELECT user_id, argMax(value, assigned_at) AS latest_value
    FROM segment_assignments GROUP BY user_id HAVING latest_value = true
        (1-naive.test.ts:81-93 with the boolean filter at :87)

Spark: one filter (pushed to the parquet scan) + one hash aggregate, then
``max_by`` for serving. Unscalable by design at 100 TB — full history scan
per run — which is exactly why variants 3/4 exist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .spec import EventLog, SegmentSpec
from ..operators.latest_wins import latest_value


def naive_assignments(
    events: DataFrame,
    spec: SegmentSpec,
    log: EventLog = EventLog(),
    assigned_at: Column | None = None,
) -> DataFrame:
    """Full recompute: (user_id, value, assigned_at). Exact count()."""
    return (
        spec.matching(events, log)
        .groupBy(F.col(log.user).alias("user_id"))
        .agg((F.count(F.lit(1)) >= spec.threshold).alias("value"))
        .withColumn(
            "assigned_at",
            # `or` would call Column.__bool__, which raises — test identity
            assigned_at if assigned_at is not None else F.current_timestamp(),
        )
    )


def serve_segment(assignments: DataFrame) -> DataFrame:
    """Latest-wins membership: users whose newest assignment is true."""
    return (
        assignments.groupBy("user_id")
        .agg(latest_value("value", "assigned_at").alias("latest_value"))
        .filter(F.col("latest_value"))
        .select("user_id")
    )


def serve_membership(assignments: DataFrame) -> DataFrame:
    """Latest assignment for every user (true and false rows)."""
    return assignments.groupBy("user_id").agg(
        latest_value("value", "assigned_at").alias("latest_value")
    )
