"""Variant 4 — event-time vs processing-time
(/root/reference/src/4-eventTime.test.ts).

Differences from variant 3, all preserved here:

- The event log carries both ``event_time`` (when it happened — may be late
  or out of order) and ``processing_time`` (monotone ingest order); the
  incremental cursor filters on processing_time (4-eventTime.test.ts:138-140)
  so a late event can never be skipped, while analytics use event_time.
  In the ``EventLog`` mapping this is ``processing_time=...`` -> ``log.cursor``.
- The state table gains ``last_event_time AggregateFunction(max, DateTime)``
  (4-eventTime.test.ts:24-31). A max state is just the value itself —
  commutative, order-independent — so late arrivals merge correctly no
  matter which batch they land in (the reference's late-data guarantee).
- Assignments carry ``last_event_time`` and serving returns it as unix
  seconds (toUnixTimestamp(argMax(last_event_time, assigned_at)),
  4-eventTime.test.ts:171-179).

This is Structured Streaming's exact model (source offsets = processing
order, event-time aggregates on the data); streaming/stream_segment.py is
the readStream twin of this batch design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .micro_batch import MicroBatchSegmenter
from .spec import EventLog
from ..operators.hll_state import hll_merge_estimate
from ..operators.latest_wins import latest_value


EVENT_TIME_LOG = EventLog(
    user="user_id",
    event="event_name",
    message="message_id",
    time="event_time",
    processing_time="processing_time",
)


class EventTimeSegmenter(MicroBatchSegmenter):
    """Micro-batch cascade with an event-time max state."""

    # maxState(event_time) — the partial max per batch
    STATE_AGGS = {"last_event_time": lambda log: F.max(F.col(log.time))}

    def _merged_aggs(self) -> list:
        # uniqMerge(event_count) >= 2, maxMerge(last_event_time)
        return [
            (hll_merge_estimate("event_count") >= self.spec.threshold).alias("value"),
            F.max("last_event_time").alias("last_event_time"),
        ]

    def members_with_last_event_time(self) -> DataFrame:
        """Serve query of 4-eventTime.test.ts:171-179: user_id,
        unix-seconds last_event_time, latest_value=true rows only.

        Truncates to whole seconds like the golden assertion
        (4-eventTime.test.ts:191 zeroes milliseconds).
        """
        assignments = self.assignments()
        if assignments is None:
            raise RuntimeError("no batches processed yet")
        return (
            assignments.groupBy("user_id")
            .agg(
                F.unix_timestamp(
                    latest_value("last_event_time", "assigned_at")
                ).alias("last_event_time"),
                latest_value("value", "assigned_at").alias("latest_value"),
            )
            .filter(F.col("latest_value"))
        )
