"""Sessionization: gaps-and-islands over an event stream.

A session = maximal run of a user's events where consecutive gaps are
< ``gap``. Classic two-window formulation (lag -> new-session flag ->
running sum = session id): one shuffle on the user key, one within-
partition sort, no UDFs. Fully SQL-expressible, so the DuckDB oracle runs
the identical formulation.

Streaming twin: ``F.session_window(ts, gap)`` in Structured Streaming gives
the same grouping with watermark-driven state eviction
(streaming/stream_segment.py shows the pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def with_session_id(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Append a per-user ``session_id`` (0-based, in time order).

    ``tiebreak_col``: optional unique column appended to the window order,
    making the ordering unconditionally deterministic. Without it, ties on
    ts are ordered deterministically only if (user, ts) is unique — true
    for the test corpus (verified: no duplicate pairs at any SF), and the
    session ASSIGNMENT is tie-order-invariant anyway (tied rows have gap 0
    between them, so however they order, the same rows land in the same
    session) — the tie-break removes the assumption, not a measured bug.
    """
    order = [F.col(ts_col)] if tiebreak_col is None else [
        F.col(ts_col), F.col(tiebreak_col)
    ]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    # Microsecond-precision gap test (unix_timestamp floors to seconds,
    # which would split a true 1799.002s gap rated against gap=1800).
    # Split on STRICTLY greater — an event exactly `gap` after the
    # previous continues the session, matching F.session_window's
    # inclusive-boundary merge (verified empirically; tested in
    # test_sessionize_agrees_with_native_session_window).
    gap_micros = gap_seconds * 1_000_000
    is_new = F.when(
        prev.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev) > gap_micros),
        1,
    ).otherwise(0)
    return events.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1
    ).drop("_new")


def session_stats(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-user session summary: session count, max events per session."""
    with_ids = with_session_id(
        events,
        user_col=user_col,
        ts_col=ts_col,
        gap_seconds=gap_seconds,
        tiebreak_col=tiebreak_col,
    )
    per_session = with_ids.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )
    return per_session.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").alias("n_events"),
    )
