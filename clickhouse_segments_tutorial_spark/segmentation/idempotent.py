"""Variant 2 — idempotent ingest (/root/reference/src/2-idempotent.test.ts).

At-least-once delivery means duplicate message_ids land in the log
(2-idempotent.test.ts:72-78). The reference neutralizes them by counting
distinct message_ids instead of rows:

    SELECT user_id, uniq(message_id) >= 2 AS value ...   (:84-90)

``uniq`` is ClickHouse's approximate distinct. We expose both:
exact ``count_distinct`` (default — matches the oracle bit-for-bit) and
``approx_count_distinct`` (the scale path; same HLL family the state tables
use). At the reference's golden cardinalities (n <= 3) they agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .spec import EventLog, SegmentSpec


def idempotent_assignments(
    events: DataFrame,
    spec: SegmentSpec,
    log: EventLog = EventLog(),
    assigned_at: Column | None = None,
    *,
    exact: bool = True,
) -> DataFrame:
    """Dedup-by-message-id recompute: (user_id, value, assigned_at)."""
    distinct_count = (
        F.count_distinct(F.col(log.message))
        if exact
        else F.approx_count_distinct(log.message)
    )
    return (
        spec.matching(events, log)
        .groupBy(F.col(log.user).alias("user_id"))
        .agg((distinct_count >= spec.threshold).alias("value"))
        .withColumn(
            "assigned_at",
            # `or` would call Column.__bool__, which raises — test identity
            assigned_at if assigned_at is not None else F.current_timestamp(),
        )
    )
