"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 (plus the
§2.5 extended/LLM surface); ``oracle_sql()`` gives the DuckDB-checkable
equivalent for each SQL-expressible one. See
``clickhouse_segments_tutorial_spark/plans/`` for the implementations and
the cross-engine determinism rules.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickhouse_segments_tutorial_spark.plans import all_queries  # noqa: E402


def _pin_session_conf(spark: SparkSession) -> None:
    """The driver supplies its own SparkSession; pin the runtime confs the
    engine's cross-engine determinism depends on (session.py sets these for
    sessions WE build, but date_format/year over midnight-naive timestamps
    shift by a day under a non-UTC session timezone, breaking every
    date-bearing oracle)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # The driver corpus stores timestamps as parquet micros with
    # isAdjustedToUTC=false; Spark 4 infers those as TIMESTAMP_NTZ, which
    # watermarks and unix_micros reject. Read them as instants (UTC session
    # tz above makes the interpretation identical to DuckDB's naive reads).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the event-time segmentation
    cascade (reference variant 4) end-to-end — persisted HLL state, changelog,
    latest-wins serve with last_event_time."""
    from clickhouse_segments_tutorial_spark.plans.segmentation_queries import (
        segment_eventtime_members,
    )

    _pin_session_conf(spark)
    return segment_eventtime_members(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_session_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.spark) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
