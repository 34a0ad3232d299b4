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
