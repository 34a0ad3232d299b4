"""Golden e2e tests mirroring the reference's four jest suites
(SURVEY.md §5, FIXTURES.md §1): tiny hand-crafted fixtures, exact expected
segment membership. User "1" is in the segment, user "2" is not.
"""

from __future__ import annotations

import datetime as dt
import uuid

import pytest
from pyspark.sql import functions as F

from clickhouse_segments_tutorial_spark.schemas import (
    USER_EVENTS_EVENT_TIME,
    USER_EVENTS_IDEMPOTENT,
    USER_EVENTS_NAIVE,
)
from clickhouse_segments_tutorial_spark.segmentation import (
    EventTimeSegmenter,
    MicroBatchSegmenter,
    SegmentSpec,
    idempotent_assignments,
    naive_assignments,
    serve_segment,
)
from clickhouse_segments_tutorial_spark.segmentation.event_time import EVENT_TIME_LOG
from clickhouse_segments_tutorial_spark.segmentation.spec import EventLog

SPEC = SegmentSpec(name="button_clickers", event_name="BUTTON_CLICK", threshold=2)
UTC = dt.timezone.utc


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def members(df) -> list[str]:
    return sorted(r.user_id for r in df.collect())


# --- Variant 1: naive (/root/reference/src/1-naive.test.ts:49-95) ----------


def test_naive_golden(spark):
    rows = [
        ("1", "BUTTON_CLICK", ts("2023-01-01 00:00:00")),
        ("1", "BUTTON_CLICK", ts("2023-01-01 00:00:05")),
        ("2", "BUTTON_CLICK", ts("2023-01-01 00:00:00")),
    ]
    events = spark.createDataFrame(rows, USER_EVENTS_NAIVE)
    assignments = naive_assignments(events, SPEC)
    assert members(serve_segment(assignments)) == ["1"]


def test_naive_latest_wins_flip(spark):
    """A newer false assignment must evict a user (ReplacingMergeTree
    latest-wins semantics, /root/reference/src/1-naive.test.ts:21-28)."""
    rows = [
        ("1", True, ts("2023-01-01 00:00:00")),
        ("1", False, ts("2023-01-02 00:00:00")),
        ("2", False, ts("2023-01-01 00:00:00")),
        ("2", True, ts("2023-01-02 00:00:00")),
    ]
    assignments = spark.createDataFrame(rows, "user_id string, value boolean, assigned_at timestamp")
    assert members(serve_segment(assignments)) == ["2"]


# --- Variant 2: idempotent (/root/reference/src/2-idempotent.test.ts:50-107)


def test_idempotent_golden(spark):
    m1, m2, m3 = (str(uuid.uuid4()) for _ in range(3))
    rows = [
        ("1", "BUTTON_CLICK", m1, ts("2023-01-01 00:00:00")),
        ("1", "BUTTON_CLICK", m2, ts("2023-01-01 00:00:05")),
        ("2", "BUTTON_CLICK", m3, ts("2023-01-01 00:00:00")),
        # duplicate delivery of the same message (2-idempotent.test.ts:72-78):
        # must NOT flip user 2 over the threshold
        ("2", "BUTTON_CLICK", m3, ts("2023-01-01 00:00:00")),
    ]
    events = spark.createDataFrame(rows, USER_EVENTS_IDEMPOTENT)
    assignments = idempotent_assignments(events, SPEC)
    assert members(serve_segment(assignments)) == ["1"]
    # approximate path agrees at golden cardinality
    approx = idempotent_assignments(events, SPEC, exact=False)
    assert members(serve_segment(approx)) == ["1"]


# --- Variant 3: micro-batch (/root/reference/src/3-microBatch.test.ts:90-171)


def test_micro_batch_golden(spark, tmp_path):
    now = dt.datetime(2023, 6, 1, 12, 0, 0)
    two_min_ago = now - dt.timedelta(minutes=2)
    one_min_ago = now - dt.timedelta(minutes=1)
    m1, m2, m3 = (str(uuid.uuid4()) for _ in range(3))
    rows = [
        ("1", "BUTTON_CLICK", m1, two_min_ago),
        ("1", "BUTTON_CLICK", m2, one_min_ago),
        ("2", "BUTTON_CLICK", m3, two_min_ago),
    ]
    events = spark.createDataFrame(rows, "user_id string, event_name string, message_id string, timestamp timestamp")
    seg = MicroBatchSegmenter(spark, str(tmp_path / "mb"), SPEC)
    seg.process_batch(events, lower_bound=two_min_ago, now=now)
    assert members(seg.members()) == ["1"]


def test_micro_batch_incremental_across_batches(spark, tmp_path):
    """State accumulates across batches: user 2 crosses the threshold only
    after a second batch delivers a second distinct message."""
    t0 = dt.datetime(2023, 6, 1, 12, 0, 0)
    t1 = t0 + dt.timedelta(minutes=5)
    seg = MicroBatchSegmenter(spark, str(tmp_path / "mb2"), SPEC)

    batch1 = spark.createDataFrame(
        [
            ("1", "BUTTON_CLICK", "m1", t0),
            ("1", "BUTTON_CLICK", "m2", t0),
            ("2", "BUTTON_CLICK", "m3", t0),
        ],
        "user_id string, event_name string, message_id string, timestamp timestamp",
    )
    seg.process_batch(batch1, lower_bound=t0, now=t0)
    assert members(seg.members()) == ["1"]

    # second batch: only new events are scanned (cursor = t1)
    batch2 = spark.createDataFrame(
        [
            ("2", "BUTTON_CLICK", "m4", t1),
            # duplicate of m3 redelivered late — must not double-count
            ("2", "BUTTON_CLICK", "m3", t1),
        ],
        "user_id string, event_name string, message_id string, timestamp timestamp",
    )
    seg.process_batch(batch2, lower_bound=t1, now=t1)
    assert members(seg.members()) == ["1", "2"]

    # compaction preserves the answer
    seg.compact_states()
    assert members(seg.members()) == ["1", "2"]

    # ReplacingMergeTree background-merge analog: compacting the versioned
    # assignments table keeps exactly one (latest) row per user and the
    # same served membership
    from clickhouse_segments_tutorial_spark.sources.writers import (
        apply_retention,
        compact_latest_wins,
    )

    before = spark.read.parquet(seg.assignments_path).count()
    compact_latest_wins(
        spark, seg.assignments_path, key="user_id", order_by="assigned_at"
    )
    after = spark.read.parquet(seg.assignments_path)
    assert after.count() == 2 < before
    assert members(seg.members()) == ["1", "2"]

    # TTL analog: dropping every changelog day-partition must not break the
    # next batch (the emptied-directory read path), and serving still works
    dropped = apply_retention(
        seg.changelog_path, keep_days=0, now=t1 + dt.timedelta(days=2)
    )
    assert dropped >= 1
    t2 = t1 + dt.timedelta(days=2)
    batch3 = spark.createDataFrame(
        [("1", "BUTTON_CLICK", "m9", t2)],
        "user_id string, event_name string, message_id string, timestamp timestamp",
    )
    seg.process_batch(batch3, lower_bound=t2, now=t2)
    assert members(seg.members()) == ["1", "2"]


def test_bucketed_cascade_matches_path_cascade(spark, tmp_path):
    """The bucketed-table cascade must serve identical membership to the
    path-based one, with a shuffle-free (no Exchange) latest-wins serve
    and finalize merge."""
    import datetime as dt

    from clickhouse_segments_tutorial_spark.segmentation import (
        BucketedMicroBatchSegmenter,
        MicroBatchSegmenter,
        SegmentSpec,
    )
    from clickhouse_segments_tutorial_spark.segmentation.spec import CORPUS_EVENTS
    from clickhouse_segments_tutorial_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    spec = SegmentSpec(name="hc", event_name="click", threshold=13)
    mid_row = events.select(
        F.percentile(F.unix_timestamp("ts"), F.lit(0.5)).alias("m")
    ).collect()[0]
    mid = dt.datetime.fromtimestamp(mid_row.m, dt.timezone.utc).replace(tzinfo=None)
    t0 = dt.datetime(2000, 1, 1)

    bseg = BucketedMicroBatchSegmenter(
        spark, str(tmp_path / "b"), spec, CORPUS_EVENTS,
        namespace="t_bucketed", buckets=8,
    )
    bseg.drop_tables()
    pseg = MicroBatchSegmenter(spark, str(tmp_path / "p"), spec, CORPUS_EVENTS)
    try:
        for seg in (bseg, pseg):
            seg.process_batch(
                events.filter(F.col("ts") < F.lit(mid)), lower_bound=t0, now=t0
            )
            seg.process_batch(
                events.filter(F.col("ts") >= F.lit(mid)), lower_bound=mid, now=mid
            )
        got_b = sorted(r.user_id for r in bseg.members().collect())
        got_p = sorted(r.user_id for r in pseg.members().collect())
        assert got_b == got_p and len(got_b) > 0

        members_plan = bseg.members()
        plan = members_plan._sc._jvm.PythonSQLUtils.explainString(
            members_plan._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan  # latest-wins agg reads bucketed layout

        # compaction keeps layout + answer
        bseg.compact_states()
        assert sorted(r.user_id for r in bseg.members().collect()) == got_p
    finally:
        bseg.drop_tables()


# --- Variant 4: event time (/root/reference/src/4-eventTime.test.ts:89-193)


def test_event_time_golden(spark, tmp_path):
    now = dt.datetime(2023, 6, 1, 12, 0, 0)
    one_min_ago = now - dt.timedelta(minutes=1)
    one_min_thirty_ago = now - dt.timedelta(seconds=30)  # -1min +30s
    two_min_ago = now - dt.timedelta(minutes=2)
    two_min_thirty_ago = now - dt.timedelta(seconds=90)  # -2min +30s

    rows = [
        # event_time leads processing_time by 30s (4-eventTime.test.ts:92-98)
        ("1", "BUTTON_CLICK", "m1", two_min_thirty_ago, two_min_ago),
        ("1", "BUTTON_CLICK", "m2", one_min_thirty_ago, one_min_ago),
        ("2", "BUTTON_CLICK", "m3", two_min_thirty_ago, two_min_ago),
    ]
    events = spark.createDataFrame(rows, USER_EVENTS_EVENT_TIME)
    seg = EventTimeSegmenter(spark, str(tmp_path / "et"), SPEC, log=EVENT_TIME_LOG)
    # cursor on processing_time
    seg.process_batch(events, lower_bound=two_min_ago, now=now)

    got = {
        r.user_id: (r.latest_value, r.last_event_time)
        for r in seg.members_with_last_event_time().collect()
    }
    expected_unix = int(one_min_thirty_ago.replace(tzinfo=UTC).timestamp())
    assert got == {"1": (True, expected_unix)}


def test_event_time_late_arrival(spark, tmp_path):
    """A late event (event_time far before its processing_time) still counts
    and last_event_time reflects event time, not arrival order."""
    t0 = dt.datetime(2023, 6, 1, 12, 0, 0)
    t1 = t0 + dt.timedelta(minutes=5)
    log = EVENT_TIME_LOG
    seg = EventTimeSegmenter(spark, str(tmp_path / "etl"), SPEC, log=log)

    schema = "user_id string, event_name string, message_id string, event_time timestamp, processing_time timestamp"
    batch1 = spark.createDataFrame(
        [("1", "BUTTON_CLICK", "m1", t0 + dt.timedelta(seconds=50), t0)], schema
    )
    seg.process_batch(batch1, lower_bound=t0, now=t0)
    assert members(seg.members()) == []

    # m2 happened BEFORE m1 (event_time) but arrives in batch 2
    batch2 = spark.createDataFrame(
        [("1", "BUTTON_CLICK", "m2", t0 - dt.timedelta(minutes=10), t1)], schema
    )
    seg.process_batch(batch2, lower_bound=t1, now=t1)
    got = {r.user_id: r.last_event_time for r in seg.members_with_last_event_time().collect()}
    # max event_time is still m1's, despite m2 arriving later
    expected = int((t0 + dt.timedelta(seconds=50)).replace(tzinfo=UTC).timestamp())
    assert got == {"1": expected}


# --- crash recovery: interrupted rewrite_table swap -------------------------


def test_rewrite_crash_recovery(spark, tmp_path):
    """A crash between rewrite_table's two renames leaves the data only
    under '<path>.rewrite.old'. recover_rewrite must restore it, and the
    segmenter's table reader must heal rather than treat the interrupted
    swap as an empty table (which would silently rebuild state from
    nothing and serve wrong memberships)."""
    import os

    from clickhouse_segments_tutorial_spark.sources.writers import (
        recover_rewrite,
        rewrite_table,
    )

    seg = MicroBatchSegmenter(spark, str(tmp_path), SPEC)
    df = spark.createDataFrame(
        [("1", 1), ("2", 2)], "user_id string, n long"
    )
    df.write.parquet(seg.states_path)

    # simulate the crash window: live dir renamed away, swap never finished
    os.rename(seg.states_path, seg.states_path + ".rewrite.old")
    assert seg.states() is not None  # _read heals via recover_rewrite
    assert seg.states().count() == 2

    # recover_rewrite is also a no-op when the live table exists
    assert recover_rewrite(seg.states_path) is False

    # and rewrite_table itself heals a prior interrupted swap on entry
    os.rename(seg.states_path, seg.states_path + ".rewrite.old")
    rewrite_table(
        spark,
        spark.createDataFrame([("3", 3)], "user_id string, n long"),
        seg.states_path,
        cluster_by=["user_id"],
    )
    assert [r.user_id for r in seg.states().collect()] == ["3"]
    assert not os.path.exists(seg.states_path + ".rewrite.old")


def test_except_set_op_is_distinct_safe(spark):
    """The EXCEPT query uses subtract (EXCEPT DISTINCT): duplicate input
    rows must not leak multiplicity into the result the way exceptAll
    would, keeping the implementation pinned to the SQL oracle's set
    semantics even if an upstream ever emits duplicates."""
    a = spark.createDataFrame([("u1",), ("u1",), ("u2",)], "user_id string")
    b = spark.createDataFrame([("u2",), ("u2",)], "user_id string")
    got = [r.user_id for r in a.subtract(b).collect()]
    assert got == ["u1"]  # one row despite the duplicated input


def test_changelog_retention_ages_out_without_breaking_finalize(spark, tmp_path):
    """The changelog TTL (reference: TTL toStartOfDay(computed_at) + 100
    day, 3-microBatch.test.ts:38): partitions older than the retention
    window must be dropped on the batch cadence, and finalization of later
    batches must stay correct (finalize only reads partitions >= the
    current batch day, so the drop can never lose an assignment)."""
    import os

    from clickhouse_segments_tutorial_spark.sources.writers import PARTITION_COL

    seg = MicroBatchSegmenter(
        spark, str(tmp_path), SPEC, changelog_retention_days=10
    )
    t1 = ts("2023-01-01 00:00:00")
    t2 = ts("2023-02-01 00:00:00")  # 31 days later: batch-1 partition expired
    b1 = spark.createDataFrame(
        [
            ("1", "BUTTON_CLICK", "m1", t1),
            ("2", "BUTTON_CLICK", "m2", t1),
        ],
        USER_EVENTS_IDEMPOTENT,
    )
    seg.process_batch(b1, lower_bound=t1, now=t1)
    day1_parts = {
        p for p in os.listdir(seg.changelog_path) if p.startswith(PARTITION_COL)
    }
    assert f"{PARTITION_COL}=20230101" in day1_parts

    b2 = spark.createDataFrame(
        [("1", "BUTTON_CLICK", "m3", t2)], USER_EVENTS_IDEMPOTENT
    )
    seg.process_batch(b2, lower_bound=t2, now=t2)
    parts = {
        p for p in os.listdir(seg.changelog_path) if p.startswith(PARTITION_COL)
    }
    # batch-1 day dropped by the TTL, batch-2 day present
    assert f"{PARTITION_COL}=20230101" not in parts
    assert f"{PARTITION_COL}=20230201" in parts
    # finalization of batch 2 still happened: user 1 crossed the threshold
    # via the merged state (m1 from batch 1 + m3 from batch 2)
    assert members(seg.members()) == ["1"]


def test_changelog_retention_disabled_keeps_partitions(spark, tmp_path):
    import os

    from clickhouse_segments_tutorial_spark.sources.writers import PARTITION_COL

    seg = MicroBatchSegmenter(
        spark, str(tmp_path), SPEC, changelog_retention_days=None
    )
    t1 = ts("2023-01-01 00:00:00")
    t2 = ts("2023-02-01 00:00:00")
    b1 = spark.createDataFrame(
        [("1", "BUTTON_CLICK", "m1", t1)], USER_EVENTS_IDEMPOTENT
    )
    seg.process_batch(b1, lower_bound=t1, now=t1)
    b2 = spark.createDataFrame(
        [("1", "BUTTON_CLICK", "m2", t2)], USER_EVENTS_IDEMPOTENT
    )
    seg.process_batch(b2, lower_bound=t2, now=t2)
    parts = {
        p for p in os.listdir(seg.changelog_path) if p.startswith(PARTITION_COL)
    }
    assert {f"{PARTITION_COL}=20230101", f"{PARTITION_COL}=20230201"} <= parts


def test_named_database_cascade_lifecycle(spark, tmp_path):
    """S1/S12 literally: the reference creates a per-run DATABASE and all
    tables live inside it (jestGlobalSetup.ts:11-13, dropped at teardown).
    Here: CREATE DATABASE -> ingest events as a catalog table in it ->
    run the bucketed cascade bound to the database -> membership matches
    the exact recompute -> DROP DATABASE CASCADE removes every table."""
    from clickhouse_segments_tutorial_spark.segmentation import (
        BucketedMicroBatchSegmenter,
    )
    from clickhouse_segments_tutorial_spark.sources import SegmentDatabase

    t0 = ts("2023-01-01 00:00:00")
    rows = [
        ("1", "BUTTON_CLICK", "m1", t0),
        ("1", "BUTTON_CLICK", "m2", t0 + dt.timedelta(seconds=5)),
        ("2", "BUTTON_CLICK", "m3", t0),
    ]
    events = spark.createDataFrame(rows, USER_EVENTS_IDEMPOTENT)

    with SegmentDatabase(spark, "seg_run_test") as db:
        # S1: named table in the database (MergeTree CREATE TABLE analog)
        events.write.mode("overwrite").saveAsTable(db.qualify("user_events"))
        cat_events = spark.table(db.qualify("user_events"))

        seg = BucketedMicroBatchSegmenter(
            spark, str(tmp_path), SPEC,
            namespace="heavy", buckets=4, database=db.name,
        )
        seg.process_batch(cat_events, lower_bound=t0, now=t0)
        assert members(seg.members()) == ["1"]
        # compaction must keep the database-qualified rename path working
        seg.compact_states()
        assert members(seg.members()) == ["1"]
        assert set(db.tables()) >= {
            "user_events", "heavy_user_states", "heavy_segment_assignments",
        }
    # teardown dropped the namespace and everything in it
    assert not spark.catalog.databaseExists("seg_run_test")


def test_database_name_validation(spark, tmp_path):
    from clickhouse_segments_tutorial_spark.segmentation import (
        BucketedMicroBatchSegmenter,
    )
    from clickhouse_segments_tutorial_spark.sources import SegmentDatabase

    with pytest.raises(ValueError, match="identifier"):
        SegmentDatabase(spark, "bad-name; drop")
    with pytest.raises(ValueError, match="identifier"):
        BucketedMicroBatchSegmenter(
            spark, str(tmp_path), SPEC, namespace="ok", database="no;pe"
        )


def test_finalize_pending_matches_inserted_block_fast_path(spark, tmp_path):
    """process_batch finalizes with its in-memory inserted block; the
    changelog-driven finalize_pending over the same cursor must produce the
    identical served membership (the equivalence the fast path relies on),
    and re-finalizing is idempotent on the serve result."""
    seg = MicroBatchSegmenter(spark, str(tmp_path), SPEC)
    t0 = ts("2023-01-01 00:00:00")
    batch = spark.createDataFrame(
        [
            ("1", "BUTTON_CLICK", "m1", t0),
            ("1", "BUTTON_CLICK", "m2", t0),
            ("2", "BUTTON_CLICK", "m3", t0),
        ],
        "user_id string, event_name string, message_id string, timestamp timestamp",
    )
    seg.process_batch(batch, lower_bound=t0, now=t0)
    served_fast = members(seg.members())
    assert served_fast == ["1"]
    # replay the decoupled cadence over the changelog the batch wrote
    seg.finalize_pending(changed_since=t0, assigned_at=t0 + dt.timedelta(seconds=1))
    assert members(seg.members()) == served_fast


def test_cascade_split_point_is_semantics_neutral(spark, sf_smoke, monkeypatch):
    """The _median_ts batch split is a HARNESS choice, not semantics
    (r14 verdict item 5 swapped exact F.percentile for the sketch-based
    percentile_approx there): the micro-batch cascade must serve the
    same membership as the exact one-shot recompute for ANY split point
    inside the event range — pinned here by running the registered
    cascade at the approx-median, an early split, and a late split, and
    comparing all three against segment_idempotent_members."""
    from clickhouse_segments_tutorial_spark.plans import (
        segmentation_queries as sq,
    )

    exact = members(sq.segment_idempotent_members(spark, sf_smoke))
    assert members(sq.segment_microbatch_members(spark, sf_smoke)) == exact

    events = sq._events(spark, sf_smoke)
    for q in (0.25, 0.75):
        row = events.select(
            F.percentile_approx(F.unix_timestamp("ts"), F.lit(q)).alias("m")
        ).collect()[0]
        split = dt.datetime.fromtimestamp(row.m, UTC).replace(tzinfo=None)
        monkeypatch.setattr(sq, "_median_ts", lambda _df, s=split: s)
        assert members(sq.segment_microbatch_members(spark, sf_smoke)) == exact


def test_summing_and_collapsing_merge_contracts(spark, tmp_path):
    """SummingMergeTree / CollapsingMergeTree analogs (sources/writers):
    the serve view is IDENTICAL before/after any compaction (readers
    never depend on merge timing); summing compaction physically
    shrinks storage and refuses non-key non-sum columns (the CH
    arbitrary-survivor nondeterminism); collapsing compaction REAPS
    fully-cancelled keys from storage while the serve view still nets
    raw appends on top."""
    from pyspark.sql import functions as F

    from clickhouse_segments_tutorial_spark.sources.writers import (
        collapsing_serve,
        compact_collapsing,
        compact_summing,
        summing_serve,
    )

    # --- summing ---
    spath = str(tmp_path / "sum")
    rows1 = [(1, 10.5), (1, 2.25), (2, 1.0)]
    rows2 = [(1, 0.25), (3, 7.0)]
    spark.createDataFrame(rows1, "k long, v double").select(
        "k", F.col("v").cast("decimal(28,6)").alias("v")
    ).write.mode("append").parquet(spath)
    serve = lambda: sorted(
        (r.k, float(r.v))
        for r in summing_serve(
            spark.read.parquet(spath), key_cols=["k"], sum_cols=["v"]
        ).collect()
    )
    before = serve()
    compact_summing(spark, spath, key_cols=["k"], sum_cols=["v"])
    assert serve() == before  # merge is invisible to the reader
    assert spark.read.parquet(spath).count() == 2  # storage folded
    spark.createDataFrame(rows2, "k long, v double").select(
        "k", F.col("v").cast("decimal(28,6)").alias("v")
    ).write.mode("append").parquet(spath)
    assert serve() == [(1, 13.0), (2, 1.0), (3, 7.0)]

    bad = str(tmp_path / "sumbad")
    spark.createDataFrame([(1, 1.0, "x")], "k long, v double, note string")\
        .write.parquet(bad)
    with pytest.raises(ValueError, match="arbitrary value"):
        compact_summing(spark, bad, key_cols=["k"], sum_cols=["v"])

    # --- collapsing ---
    cpath = str(tmp_path / "col")
    signed1 = [(1, 1), (1, -1), (2, 1), (2, 1)]  # key 1 fully cancels
    spark.createDataFrame(signed1, "k long, sign long").write.mode(
        "append"
    ).parquet(cpath)
    cserve = lambda: sorted(
        (r.k, r.sign)
        for r in collapsing_serve(
            spark.read.parquet(cpath), key_cols=["k"]
        ).collect()
    )
    assert cserve() == [(2, 2)]
    compact_collapsing(spark, cpath, key_cols=["k"])
    assert cserve() == [(2, 2)]
    assert spark.read.parquet(cpath).count() == 1  # cancelled key reaped
    # a late cancel arrives raw on top of the folded state
    spark.createDataFrame([(2, -1), (3, 1)], "k long, sign long").write.mode(
        "append"
    ).parquet(cpath)
    assert cserve() == [(2, 1), (3, 1)]


def test_versioned_collapsing_out_of_order_cancels(spark, tmp_path):
    """VersionedCollapsingMergeTree = collapsing with the version in
    the key (sources/writers.collapsing_serve docstring): a cancel
    arriving BEFORE its state row (out-of-order delivery) still
    annihilates exactly its own version, across any compaction
    boundary — sum(sign) per (key, version) is commutative, so arrival
    order can never matter here, unlike CH's merge-order-sensitive
    plain collapsing."""
    from clickhouse_segments_tutorial_spark.sources.writers import (
        collapsing_serve,
        compact_collapsing,
    )

    path = str(tmp_path / "vcol")
    # batch 1: the CANCEL of (k=1, v=1) arrives before its state row;
    # state (k=1, v=2) and (k=2, v=1) also land
    b1 = [(1, 1, -1), (1, 2, 1), (2, 1, 1)]
    spark.createDataFrame(b1, "k long, ver long, sign long").write.mode(
        "append"
    ).parquet(path)
    serve = lambda: sorted(
        (r.k, r.ver, r.sign)
        for r in collapsing_serve(
            spark.read.parquet(path), key_cols=["k", "ver"]
        ).collect()
    )
    # the early cancel is visible as a dangling -1 until its state lands
    assert serve() == [(1, 1, -1), (1, 2, 1), (2, 1, 1)]
    compact_collapsing(spark, path, key_cols=["k", "ver"])
    assert serve() == [(1, 1, -1), (1, 2, 1), (2, 1, 1)]
    # batch 2: the late state row for (1, 1) annihilates the held cancel
    spark.createDataFrame([(1, 1, 1)], "k long, ver long, sign long").write.mode(
        "append"
    ).parquet(path)
    assert serve() == [(1, 2, 1), (2, 1, 1)]
    compact_collapsing(spark, path, key_cols=["k", "ver"])
    assert serve() == [(1, 2, 1), (2, 1, 1)]
    assert spark.read.parquet(path).count() == 2  # cancelled pair reaped
