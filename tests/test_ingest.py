"""JSONEachRow ingest path (S9): NDJSON lines -> typed DataFrame -> the
idempotent segmentation golden, end-to-end like the reference's EP1
(/root/reference/src/2-idempotent.test.ts:50-107).
"""

from __future__ import annotations

import pytest

from clickhouse_segments_tutorial_spark.schemas import USER_EVENTS_IDEMPOTENT
from clickhouse_segments_tutorial_spark.segmentation import (
    SegmentSpec,
    idempotent_assignments,
    serve_segment,
)
from clickhouse_segments_tutorial_spark.segmentation.spec import EventLog
from clickhouse_segments_tutorial_spark.sources.json_ingest import read_json_rows

LINES = [
    '{"user_id": "1", "event_name": "BUTTON_CLICK", "message_id": "m1", "timestamp": "2023-06-01T12:00:00Z"}',
    '{"user_id": "1", "event_name": "BUTTON_CLICK", "message_id": "m2", "timestamp": "2023-06-01T12:00:05Z"}',
    '{"user_id": "2", "event_name": "BUTTON_CLICK", "message_id": "m3", "timestamp": "2023-06-01T12:00:00Z"}',
    # duplicate delivery of m3 (2-idempotent.test.ts:72-78)
    '{"user_id": "2", "event_name": "BUTTON_CLICK", "message_id": "m3", "timestamp": "2023-06-01T12:00:00Z"}',
]

REFERENCE_LOG = EventLog(
    user="user_id", event="event_name", message="message_id", time="timestamp"
)


def test_jsoneachrow_to_golden_membership(spark):
    events = read_json_rows(spark, LINES, USER_EVENTS_IDEMPOTENT)
    # from_json relaxes nullability; names and types must match exactly
    assert [(f.name, f.dataType) for f in events.schema.fields] == [
        (f.name, f.dataType) for f in USER_EVENTS_IDEMPOTENT.fields
    ]
    assert events.count() == 4
    # timestamps parsed, not null
    assert events.filter("timestamp IS NULL").count() == 0

    spec = SegmentSpec(name="button_clickers", event_name="BUTTON_CLICK", threshold=2)
    members = serve_segment(
        idempotent_assignments(events, spec, REFERENCE_LOG)
    )
    assert sorted(r.user_id for r in members.collect()) == ["1"]


def test_failfast_on_malformed(spark):
    bad = LINES + ['{"user_id": 3']  # truncated JSON
    with pytest.raises(Exception):
        read_json_rows(spark, bad, USER_EVENTS_IDEMPOTENT).collect()


def test_load_table_reads_ntz_parquet_as_instants(spark, tmp_path):
    """Regression: the driver corpus stores micros-without-timezone parquet,
    which Spark 4 infers as TIMESTAMP_NTZ by default — a type watermarks and
    unix_micros reject (broke session_stats_per_user and the streaming
    cascade in rounds 3-4). load_table must deliver plain TimestampType
    with UTC-instant values regardless of the writing engine."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from clickhouse_segments_tutorial_spark.sources.catalog import load_table

    # micros, isAdjustedToUTC=false — exactly the driver corpus layout
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [dt.datetime(2024, 1, 1, 12, 0, 0), dt.datetime(2024, 1, 2, 0, 0, 0)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "events.parquet"))
    df = load_table(spark, str(tmp_path), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    # values are the stored micros as UTC instants (session tz is UTC)
    rows = df.select(F.unix_timestamp("ts").alias("s")).orderBy("s").collect()
    assert [r.s for r in rows] == [1704110400, 1704153600]
    # the two operations that broke: timestamp arithmetic + watermark typing
    df.select(F.unix_micros("ts")).collect()
    assert df.withWatermark("ts", "10 minutes").schema is not None
