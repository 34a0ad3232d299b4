"""Segment DSL: the engine's public API.

The reference hard-codes one segment — "users with >= 2 (distinct)
BUTTON_CLICK events" — inside SQL strings
(/root/reference/src/1-naive.test.ts:72-79). We lift it into a tiny spec that
compiles to DataFrame expressions, so the same cascade runs for any
(event filter, distinct key, threshold).

``EventLog`` maps spec-level column roles onto a concrete schema: the
reference fixtures use (user_id, event_name, message_id, timestamp) while the
driver corpus uses (user_id, event_type, event_id, ts); the operators are
identical either way.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class EventLog:
    """Column-role mapping for an append-only event table."""

    user: str = "user_id"
    event: str = "event_name"
    message: str = "message_id"
    time: str = "timestamp"           # event time (analytics)
    processing_time: str | None = None  # ingest cursor; None -> same as time

    @property
    def cursor(self) -> str:
        """Column the incremental lower-bound filter applies to. Variant 4
        switches this to processing_time so late event-time rows can't be
        skipped (/root/reference/src/4-eventTime.test.ts:138-140)."""
        return self.processing_time or self.time


# Driver-corpus mapping (FIXTURES.md §2): events(event_id, ts, user_id, event_type, ...)
CORPUS_EVENTS = EventLog(user="user_id", event="event_type", message="event_id", time="ts")


@dataclass(frozen=True)
class SegmentSpec:
    """"User is in the segment iff (distinct) count of matching events >= threshold."

    event_name=BUTTON_CLICK, threshold=2 reproduces the reference
    (/root/reference/src/1-naive.test.ts:74-77).
    """

    name: str
    event_name: str
    threshold: int = 2

    def event_filter(self, log: EventLog) -> Column:
        return F.col(log.event) == F.lit(self.event_name)

    def matching(self, events: DataFrame, log: EventLog) -> DataFrame:
        return events.filter(self.event_filter(log))
