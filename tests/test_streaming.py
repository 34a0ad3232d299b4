"""Streaming twin e2e: the golden micro-batch scenario driven through
Structured Streaming with checkpointed incremental runs (SURVEY.md §2.4).
"""

from __future__ import annotations

import datetime as dt
import os

from clickhouse_segments_tutorial_spark.schemas import (
    EVENTS,
    USER_EVENTS_EVENT_TIME,
    USER_EVENTS_IDEMPOTENT,
)
from clickhouse_segments_tutorial_spark.segmentation import SegmentSpec
from clickhouse_segments_tutorial_spark.segmentation.event_time import (
    EVENT_TIME_LOG,
    EventTimeSegmenter,
)
from clickhouse_segments_tutorial_spark.segmentation.spec import CORPUS_EVENTS
from clickhouse_segments_tutorial_spark.streaming import (
    ExactStreamingSegmenter,
    HllCascadeStreamingSegmenter,
    StreamingSegmenter,
)

SPEC = SegmentSpec(name="button_clickers", event_name="BUTTON_CLICK", threshold=2)


def members(df) -> list[str]:
    return sorted(r.user_id for r in df.collect())


def test_streaming_incremental_golden(spark, tmp_path):
    t0 = dt.datetime(2023, 6, 1, 12, 0, 0)
    seg = StreamingSegmenter(
        spark, str(tmp_path), SPEC, schema=USER_EVENTS_IDEMPOTENT
    )

    batch1 = spark.createDataFrame(
        [
            ("1", "BUTTON_CLICK", "m1", t0),
            ("1", "BUTTON_CLICK", "m2", t0 + dt.timedelta(seconds=5)),
            ("2", "BUTTON_CLICK", "m3", t0),
            # duplicate delivery (2-idempotent.test.ts:72-78): must not count
            ("2", "BUTTON_CLICK", "m3", t0),
            ("3", "OTHER_EVENT", "m4", t0),
        ],
        USER_EVENTS_IDEMPOTENT,
    )
    batch1.write.mode("append").parquet(os.path.join(str(tmp_path), "events_in"))
    seg.run_available_now()
    assert members(seg.members()) == ["1"]

    # second ingest: user 2 crosses the threshold; state persisted via
    # checkpoint so only the new file is processed
    batch2 = spark.createDataFrame(
        [("2", "BUTTON_CLICK", "m5", t0 + dt.timedelta(minutes=1))],
        USER_EVENTS_IDEMPOTENT,
    )
    batch2.write.mode("append").parquet(os.path.join(str(tmp_path), "events_in"))
    seg.run_available_now()
    assert members(seg.members()) == ["1", "2"]


def test_exact_stateful_with_long_ids(spark, tmp_path):
    """Schema-generic stateful state: corpus-typed events (long user_id,
    long event_id) must flow through applyInPandasWithState unchanged."""
    t0 = dt.datetime(2024, 1, 1)
    spec = SegmentSpec(name="clickers", event_name="click", threshold=2)
    seg = ExactStreamingSegmenter(
        spark, str(tmp_path), spec, CORPUS_EVENTS, schema=EVENTS
    )
    rows = [
        (1, t0, 10, "click", 0.0, "{}"),
        (2, t0, 10, "click", 0.0, "{}"),
        (3, t0, 20, "click", 0.0, "{}"),
        (3, t0, 20, "click", 0.0, "{}"),  # duplicate event_id
    ]
    spark.createDataFrame(rows, EVENTS).write.mode("append").parquet(
        os.path.join(str(tmp_path), "events_in")
    )
    seg.run_available_now()
    assert sorted(r.user_id for r in seg.members().collect()) == [10]


def test_late_event_within_watermark_counts(spark, tmp_path):
    """Variant-4 twin (4-eventTime.test.ts:92-127): an event arriving in a
    LATER micro-batch with an EARLIER event time (out-of-order within the
    watermark) still counts toward membership, and last_event_time tracks
    the event-time max, not arrival order."""
    t0 = dt.datetime(2023, 6, 1, 12, 0, 0)
    seg = ExactStreamingSegmenter(
        spark, str(tmp_path), SPEC, schema=USER_EVENTS_IDEMPOTENT,
        watermark="10 minutes",
    )
    batch1 = spark.createDataFrame(
        [("1", "BUTTON_CLICK", "m1", t0)], USER_EVENTS_IDEMPOTENT
    )
    batch1.write.mode("append").parquet(os.path.join(str(tmp_path), "events_in"))
    seg.run_available_now()
    assert members(seg.members()) == []

    # arrives later, happened 30s EARLIER
    late = spark.createDataFrame(
        [("1", "BUTTON_CLICK", "m2", t0 - dt.timedelta(seconds=30))],
        USER_EVENTS_IDEMPOTENT,
    )
    late.write.mode("append").parquet(os.path.join(str(tmp_path), "events_in"))
    seg.run_available_now()
    assert members(seg.members()) == ["1"]  # late event counted

    assignments = spark.read.parquet(seg.assignments_path)
    latest = (
        assignments.orderBy("version", ascending=False).limit(1).collect()[0]
    )
    assert latest.last_event_time == t0  # event-time max, not arrival order


def test_exact_stateful_null_message_ids(spark, tmp_path):
    """Null ids in a long-typed column arrive as NaN in pandas — they must
    not count as distinct ids nor corrupt the bigint state (and a real id
    seen with and without nulls in the column must dedup as one)."""
    t0 = dt.datetime(2024, 1, 1)
    spec = SegmentSpec(name="clickers", event_name="click", threshold=2)
    seg = ExactStreamingSegmenter(
        spark, str(tmp_path), spec, CORPUS_EVENTS, schema=EVENTS
    )
    rows = [
        (1, t0, 10, "click", 0.0, "{}"),
        (None, t0, 10, "click", 0.0, "{}"),  # null id: not distinct
    ]
    spark.createDataFrame(rows, EVENTS).write.mode("append").parquet(
        os.path.join(str(tmp_path), "events_in")
    )
    seg.run_available_now()
    assert members(seg.members()) == []  # 1 real id < threshold

    # same id again in a float-typed batch (has a null) must not re-count
    rows2 = [
        (1, t0 + dt.timedelta(minutes=1), 10, "click", 0.0, "{}"),
        (None, t0 + dt.timedelta(minutes=1), 10, "click", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 10, "click", 0.0, "{}"),
    ]
    spark.createDataFrame(rows2, EVENTS).write.mode("append").parquet(
        os.path.join(str(tmp_path), "events_in")
    )
    seg.run_available_now()
    assert members(seg.members()) == [10]  # ids {1, 2}


def test_dropduplicates_within_watermark(spark, tmp_path):
    """T2 streaming-native dedup: a message_id re-delivered in a later
    micro-batch (watermark still open) is dropped at ingest, so the plain
    count stays exact."""
    t0 = dt.datetime(2023, 6, 1, 12, 0, 0)
    seg = StreamingSegmenter(
        spark,
        str(tmp_path),
        SPEC,
        schema=USER_EVENTS_IDEMPOTENT,
        watermark="1 hour",
        drop_duplicates=True,
    )
    batch1 = spark.createDataFrame(
        [
            ("1", "BUTTON_CLICK", "m1", t0),
            ("2", "BUTTON_CLICK", "m3", t0),
        ],
        USER_EVENTS_IDEMPOTENT,
    )
    batch1.write.mode("append").parquet(os.path.join(str(tmp_path), "events_in"))
    seg.run_available_now()
    assert members(seg.members()) == []

    # m3 again (cross-batch duplicate) + genuinely new m2 for user 1
    batch2 = spark.createDataFrame(
        [
            ("2", "BUTTON_CLICK", "m3", t0 + dt.timedelta(minutes=1)),
            ("1", "BUTTON_CLICK", "m2", t0 + dt.timedelta(minutes=1)),
        ],
        USER_EVENTS_IDEMPOTENT,
    )
    batch2.write.mode("append").parquet(os.path.join(str(tmp_path), "events_in"))
    seg.run_available_now()
    assert members(seg.members()) == ["1"]


def test_hll_cascade_streaming_matches_batch_golden(spark, tmp_path):
    """Variant-4 streaming twin over PERSISTED MERGEABLE SKETCH STATE: the
    foreachBatch cascade must reproduce the batch EventTimeSegmenter's
    golden on the same event sequence — including the late out-of-order
    arrival of 4-eventTime.test.ts:92-127 — and serve last_event_time as
    the event-time max in unix seconds."""
    t0 = dt.datetime(2023, 6, 1, 12, 0, 0)
    seg = HllCascadeStreamingSegmenter(
        spark,
        str(tmp_path / "stream"),
        SPEC,
        schema=USER_EVENTS_IDEMPOTENT,
        compact_every=2,
    )
    b1 = [
        ("1", "BUTTON_CLICK", "m1", t0),
        ("2", "BUTTON_CLICK", "m3", t0),
    ]
    spark.createDataFrame(b1, USER_EVENTS_IDEMPOTENT).write.mode("append").parquet(
        seg.events_dir
    )
    seg.run_available_now()
    assert members(seg.members()) == []  # both below threshold 2

    # arrives in a LATER micro-batch, happened 30s EARLIER: must still
    # count, and last_event_time must stay t0 (event-time max, not arrival)
    b2 = [("1", "BUTTON_CLICK", "m2", t0 - dt.timedelta(seconds=30))]
    spark.createDataFrame(b2, USER_EVENTS_IDEMPOTENT).write.mode("append").parquet(
        seg.events_dir
    )
    seg.run_available_now()
    assert members(seg.members()) == ["1"]
    served = {
        r.user_id: r.last_event_time
        for r in seg.members_with_last_event_time().collect()
    }
    # session tz is pinned UTC, so unix seconds are t0-as-UTC
    assert served == {"1": int(t0.replace(tzinfo=dt.timezone.utc).timestamp())}

    # the batch cascade on the same sequence must agree exactly
    bseg = EventTimeSegmenter(
        spark, str(tmp_path / "batch"), SPEC, EVENT_TIME_LOG
    )
    pt1, pt2 = t0, t0 + dt.timedelta(seconds=60)
    all_rows = spark.createDataFrame(
        [
            ("1", "BUTTON_CLICK", "m1", t0, pt1),
            ("2", "BUTTON_CLICK", "m3", t0, pt1),
            ("1", "BUTTON_CLICK", "m2", t0 - dt.timedelta(seconds=30), pt2),
        ],
        USER_EVENTS_EVENT_TIME,
    )
    bseg.process_batch(
        all_rows.filter(all_rows.processing_time <= pt1), lower_bound=t0, now=pt1
    )
    bseg.process_batch(
        all_rows.filter(all_rows.processing_time > pt1), lower_bound=pt2, now=pt2
    )
    batch_served = {
        r.user_id: r.last_event_time
        for r in bseg.members_with_last_event_time().collect()
    }
    assert served == batch_served

    # compact_every=2 ran after batch id 1: sketch state collapsed to one
    # merged row per user, assignments to one latest row per user
    assert spark.read.parquet(seg.states_path).count() == 2
    assert spark.read.parquet(seg.assignments_path).count() == 2


def test_streaming_compaction_bounds_assignments(spark, tmp_path):
    """compact_every wires compact_latest_wins into the streaming sink: the
    versioned assignments table must collapse to one row per user on the
    cadence, with serving unchanged (N batches -> compact -> same members)."""
    t0 = dt.datetime(2023, 6, 1, 12, 0, 0)
    seg = StreamingSegmenter(
        spark,
        str(tmp_path),
        SPEC,
        schema=USER_EVENTS_IDEMPOTENT,
        compact_every=2,
    )
    batches = [
        [("1", "BUTTON_CLICK", "m1", t0)],
        [("1", "BUTTON_CLICK", "m2", t0 + dt.timedelta(minutes=1))],
        [("2", "BUTTON_CLICK", "m3", t0 + dt.timedelta(minutes=2))],
        [("2", "BUTTON_CLICK", "m4", t0 + dt.timedelta(minutes=3))],
    ]
    expected = [[], ["1"], ["1"], ["1", "2"]]
    for rows, want in zip(batches, expected):
        spark.createDataFrame(rows, USER_EVENTS_IDEMPOTENT).write.mode(
            "append"
        ).parquet(seg.events_dir)
        seg.run_available_now()
        assert members(seg.members()) == want
    # without compaction: 4 update rows; with the id-1 and id-3 compactions
    # the table holds exactly the latest row per user
    assert spark.read.parquet(seg.assignments_path).count() == 2


def test_exact_stateful_streaming_golden(spark, tmp_path):
    """applyInPandasWithState twin: exact distinct state across batches,
    including a message_id re-delivered in a LATER batch — the case the
    within-batch distinct count cannot see and HLL only handles
    approximately."""
    t0 = dt.datetime(2023, 6, 1, 12, 0, 0)
    seg = ExactStreamingSegmenter(
        spark, str(tmp_path), SPEC, schema=USER_EVENTS_IDEMPOTENT
    )

    batch1 = spark.createDataFrame(
        [
            ("1", "BUTTON_CLICK", "m1", t0),
            ("1", "BUTTON_CLICK", "m2", t0 + dt.timedelta(seconds=5)),
            ("2", "BUTTON_CLICK", "m3", t0),
            ("3", "OTHER_EVENT", "m4", t0),
        ],
        USER_EVENTS_IDEMPOTENT,
    )
    batch1.write.mode("append").parquet(os.path.join(str(tmp_path), "events_in"))
    seg.run_available_now()
    assert members(seg.members()) == ["1"]

    # m3 re-delivered across the batch boundary: must NOT push user 2 over
    # the threshold; a genuinely new m5 must.
    batch2 = spark.createDataFrame(
        [
            ("2", "BUTTON_CLICK", "m3", t0 + dt.timedelta(minutes=1)),
        ],
        USER_EVENTS_IDEMPOTENT,
    )
    batch2.write.mode("append").parquet(os.path.join(str(tmp_path), "events_in"))
    seg.run_available_now()
    assert members(seg.members()) == ["1"]

    batch3 = spark.createDataFrame(
        [("2", "BUTTON_CLICK", "m5", t0 + dt.timedelta(minutes=2))],
        USER_EVENTS_IDEMPOTENT,
    )
    batch3.write.mode("append").parquet(os.path.join(str(tmp_path), "events_in"))
    seg.run_available_now()
    assert members(seg.members()) == ["1", "2"]


def test_transform_with_state_matches_exact(spark, tmp_path):
    """The transformWithStateInPandas twin (typed ListState/ValueState in
    RocksDB) must serve the same membership as the applyInPandasWithState
    segmenter across two incremental ingests, including duplicate ids and
    the event-time max. Skips when protobuf (required by the
    transformWithState state-server protocol) is absent; the guard error
    is still asserted."""
    import pytest

    from clickhouse_segments_tutorial_spark.streaming.stateful import (
        TransformWithStateSegmenter,
    )

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        seg = TransformWithStateSegmenter(
            spark, str(tmp_path), SPEC, schema=USER_EVENTS_IDEMPOTENT
        )
        with pytest.raises(RuntimeError, match="protobuf"):
            seg.run_available_now()
        pytest.skip("protobuf not installed: transformWithState runner unavailable")

    t0 = dt.datetime(2023, 6, 1, 12, 0, 0)
    seg = TransformWithStateSegmenter(
        spark, str(tmp_path), SPEC, schema=USER_EVENTS_IDEMPOTENT
    )
    batch1 = spark.createDataFrame(
        [
            ("1", "BUTTON_CLICK", "m1", t0),
            ("1", "BUTTON_CLICK", "m2", t0 + dt.timedelta(seconds=5)),
            ("2", "BUTTON_CLICK", "m3", t0),
            ("2", "BUTTON_CLICK", "m3", t0),  # duplicate delivery
        ],
        USER_EVENTS_IDEMPOTENT,
    )
    batch1.write.mode("append").parquet(os.path.join(str(tmp_path), "events_in"))
    seg.run_available_now()
    assert members(seg.members()) == ["1"]

    batch2 = spark.createDataFrame(
        [("2", "BUTTON_CLICK", "m5", t0 + dt.timedelta(minutes=1))],
        USER_EVENTS_IDEMPOTENT,
    )
    batch2.write.mode("append").parquet(os.path.join(str(tmp_path), "events_in"))
    seg.run_available_now()
    assert members(seg.members()) == ["1", "2"]

    latest = (
        spark.read.parquet(seg.assignments_path)
        .orderBy("version", ascending=False)
        .limit(1)
        .collect()[0]
    )
    assert latest.last_event_time == t0 + dt.timedelta(minutes=1)
    # provider conf restored for co-resident streams
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass", "unset")
        == "unset"
    )


def test_streaming_dedup_accepts_first_occurrence_only(spark, tmp_path):
    """Continuous-ingestion exact dedup: duplicates within a wave, across
    waves, and across checkpointed runs are all rejected; every distinct
    text survives exactly once and the accepted set equals the batch
    exact-dedup fingerprint set."""
    from clickhouse_segments_tutorial_spark.streaming import StreamingDeduper

    dd = StreamingDeduper(
        spark, str(tmp_path / "dedup"), schema="doc_id long, text string"
    )
    wave1 = [(1, "alpha"), (2, "beta"), (3, "alpha")]  # in-wave duplicate
    spark.createDataFrame(wave1, "doc_id long, text string").write.mode(
        "append"
    ).parquet(dd.docs_dir)
    dd.run_available_now()
    got1 = {r.text for r in dd.accepted().collect()}
    assert got1 == {"alpha", "beta"}

    # wave 2: re-delivers 'alpha' (cross-run duplicate), adds 'gamma'
    wave2 = [(4, "alpha"), (5, "gamma"), (6, "beta")]
    spark.createDataFrame(wave2, "doc_id long, text string").write.mode(
        "append"
    ).parquet(dd.docs_dir)
    dd.run_available_now()
    rows = dd.accepted().collect()
    assert {r.text for r in rows} == {"alpha", "beta", "gamma"}
    assert len(rows) == 3  # one survivor per distinct text, ever
    # the accepted ids are drawn from the first wave that carried the text
    by_text = {r.text: r.doc_id for r in rows}
    assert by_text["alpha"] in (1, 3) and by_text["gamma"] == 5


def test_streaming_dedup_watermark_bounded_variant(spark, tmp_path):
    """The bounded-state mode (dropDuplicatesWithinWatermark on the
    fingerprint): a re-delivery inside the watermark horizon is dropped;
    state is keyed by fingerprint + event time, not unbounded history."""
    import datetime as dt

    from clickhouse_segments_tutorial_spark.streaming import StreamingDeduper

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "doc_id long, text string, ts timestamp"
    dd = StreamingDeduper(
        spark,
        str(tmp_path / "wm"),
        schema=schema,
        time_col="ts",
        watermark="1 hour",
    )
    wave = [
        (1, "alpha", t0),
        (2, "alpha", t0 + dt.timedelta(minutes=5)),  # in-horizon re-delivery
        (3, "beta", t0),
    ]
    spark.createDataFrame(wave, schema).write.mode("append").parquet(dd.docs_dir)
    dd.run_available_now()
    got = {r.text for r in dd.accepted().collect()}
    assert got == {"alpha", "beta"}
    assert dd.accepted().count() == 2

    # constructor contract: watermark and time_col must travel together
    import pytest

    with pytest.raises(ValueError):
        StreamingDeduper(spark, str(tmp_path / "bad"), schema=schema, watermark="1 hour")


def test_streaming_dedup_rocksdb_state_store(spark, tmp_path):
    """The 10B-doc state story must not be config fiction (r6 verdict
    item 6): run the ingest gate with the RocksDB state-store provider —
    the store the docstring names for ~1 TB fingerprint state — across a
    RESTART (new StreamingDeduper instance over the same checkpoint), and
    prove (a) cross-run dedup state survived in RocksDB and (b) RocksDB
    was actually engaged (its checkpoint layout, not the HDFS store's
    .delta files)."""
    import glob

    from clickhouse_segments_tutorial_spark.streaming import StreamingDeduper

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocksdb)
    try:
        workdir = str(tmp_path / "rocks")
        schema = "doc_id long, text string"
        dd = StreamingDeduper(spark, workdir, schema=schema)
        spark.createDataFrame(
            [(1, "alpha"), (2, "beta")], schema
        ).write.mode("append").parquet(dd.docs_dir)
        dd.run_available_now()
        assert {r.text for r in dd.accepted().collect()} == {"alpha", "beta"}

        # 'restart': a fresh instance over the same workdir — state must
        # come back from the RocksDB checkpoint, not driver memory
        dd2 = StreamingDeduper(spark, workdir, schema=schema)
        spark.createDataFrame(
            [(3, "alpha"), (4, "gamma")], schema  # cross-restart duplicate
        ).write.mode("append").parquet(dd2.docs_dir)
        dd2.run_available_now()
        rows = dd2.accepted().collect()
        assert {r.text for r in rows} == {"alpha", "beta", "gamma"}
        assert len(rows) == 3  # the restarted run still dropped 'alpha'
        assert {r.doc_id for r in rows} == {1, 2, 4}

        # RocksDB's checkpoint layout: snapshot .zip / .changelog files
        # under state/, and none of the HDFS-store .delta files
        state_files = glob.glob(f"{dd.checkpoint}/state/**/*", recursive=True)
        assert any(
            f.endswith(".zip") or f.endswith(".changelog") for f in state_files
        ), state_files
        assert not any(f.endswith(".delta") for f in state_files), [
            f for f in state_files if f.endswith(".delta")
        ]
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)


def test_streaming_ingest_feeds_corpus_pipeline(spark, tmp_path):
    """The continuous-ingest -> corpus-build handoff: documents arrive
    through the streaming dedup gate in two waves; the accepted table
    (append-only parquet) then feeds the batch corpus pipeline directly.
    This is the composition a production deployment actually runs — the
    gate bounds what the expensive batch stages ever see, and the
    pipeline must accept the gate's output schema as-is."""
    from clickhouse_segments_tutorial_spark.plans.pipeline import corpus_pipeline
    from clickhouse_segments_tutorial_spark.streaming import StreamingDeduper

    schema = "doc_id long, text string, lang string"
    dd = StreamingDeduper(spark, str(tmp_path / "gate"), schema=schema)
    wave1 = [
        (1, "the quick brown fox jumps over the lazy dog again and again", "en"),
        (2, "the quick brown fox jumps over the lazy dog again and again", "en"),
        (3, "pack my box with five dozen liquor jugs for the annual party", "en"),
    ]
    spark.createDataFrame(wave1, schema).write.mode("append").parquet(dd.docs_dir)
    dd.run_available_now()
    wave2 = [
        (4, "pack my box with five dozen liquor jugs for the annual party", "en"),
        (5, "a completely different document about training data pipelines", "en"),
    ]
    spark.createDataFrame(wave2, schema).write.mode("append").parquet(dd.docs_dir)
    dd.run_available_now()

    accepted = dd.accepted()
    assert accepted.count() == 3  # gate dropped 2 and 4 before batch work

    packed = corpus_pipeline(accepted, mix_weights={"en": 1.0})
    rows = packed.collect()
    assert len(rows) > 0
    assert set(packed.columns) == {
        "doc_id", "epoch", "chunk_idx", "n_chunk_tokens", "shard", "seq_id"
    }
    # every surviving chunk traces back to a gate-accepted doc
    accepted_ids = {r.doc_id for r in accepted.collect()}
    assert {r.doc_id for r in rows} <= accepted_ids


# --- ContinuousWaveGate: processingTime trigger + wave-id watermarking ---------


def _cont_gate(spark, workdir, **kw):
    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalNoveltyScorer,
    )
    from clickhouse_segments_tutorial_spark.streaming.stream_curation import (
        ContinuousWaveGate,
    )

    schema = spark.createDataFrame(
        [], "doc_id long, text string, _wave long"
    ).schema
    return ContinuousWaveGate(
        spark,
        workdir,
        schema=schema,
        ingestor=IncrementalNoveltyScorer(spark, f"{workdir}/state"),
        **kw,
    )


def _write_wave(spark, gate, rows, wid, order_ts):
    """One wave file stamped with `_wave` and a CONTROLLED mtime —
    the file source processes oldest-first, so order_ts IS the
    out-of-order arrival sequence the test scripts."""
    import pyspark.sql.functions as F

    before = set(os.listdir(gate.in_dir))
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .withColumn("_wave", F.lit(wid).cast("long"))
        .coalesce(1)
        .write.mode("append")
        .parquet(gate.in_dir)
    )
    for f in set(os.listdir(gate.in_dir)) - before:
        if f.endswith(".parquet") and not f.startswith((".", "_")):
            os.utime(os.path.join(gate.in_dir, f), (order_ts, order_ts))


def _wave_rows(lo, hi):
    return [
        (i, f"w{i % 7} w{(i + 1) % 5} w{i % 3} common common")
        for i in range(lo, hi)
    ]


def test_continuous_gate_reorders_early_and_quarantines_late(spark, tmp_path):
    """The continuous-trigger contract, end to end: waves ARRIVE out of
    order (1, 3, 2, duplicate-2) under a processingTime trigger; the
    gate buffers the early wave, admits strictly in order once the gap
    fills, quarantines the late duplicate — and the union of admitted
    outputs equals the BATCH novelty operator over the full corpus,
    i.e. out-of-order delivery + the gate restores the ascending wave
    contract exactly."""
    import time

    from clickhouse_segments_tutorial_spark.operators.corpus_stats import (
        ngram_novelty,
    )

    gate = _cont_gate(spark, str(tmp_path / "g1"), lateness_batches=10)
    gate.reset_state()
    t0 = time.time() - 100
    _write_wave(spark, gate, _wave_rows(0, 12), 1, t0)
    _write_wave(spark, gate, _wave_rows(22, 30), 3, t0 + 5)
    _write_wave(spark, gate, _wave_rows(12, 22), 2, t0 + 10)
    _write_wave(spark, gate, _wave_rows(12, 22), 2, t0 + 15)  # late duplicate
    try:
        gate.run_until_drained(timeout_s=180)
        docs = spark.createDataFrame(
            _wave_rows(0, 30), "doc_id long, text string"
        )
        a = sorted(map(tuple, ngram_novelty(docs, n=3).collect()))
        b = sorted(map(tuple, gate.results().collect()))
        assert a == b
        # all three waves admitted (results pinned under wave-stable ids)
        got = sorted(
            d for d in os.listdir(gate.results_dir) if d.startswith("batch_")
        )
        assert got == ["batch_0", "batch_1", "batch_2"]
        assert gate.quarantined() == [
            {"wave": 2, "reason": "late-or-duplicate", "n_rows": 10}
        ]
    finally:
        gate.ingestor.drop_state()


def test_continuous_gate_watermark_expires_lost_gap(spark, tmp_path):
    """Watermark expiry: wave 2 never arrives; after `lateness_batches`
    further batches land beyond the gap, the gate declares it lost
    (audit row), advances the cursor, and drains the buffer — and a
    straggler wave 2 arriving AFTER expiry is late by rule, quarantined,
    never ingested. Admitted output equals the batch operator over the
    waves that were actually admitted (1, 3, 4 — still ascending)."""
    import time

    from clickhouse_segments_tutorial_spark.operators.corpus_stats import (
        ngram_novelty,
    )

    gate = _cont_gate(spark, str(tmp_path / "g2"), lateness_batches=2)
    gate.reset_state()
    t0 = time.time() - 100
    _write_wave(spark, gate, _wave_rows(0, 10), 1, t0)
    _write_wave(spark, gate, _wave_rows(20, 28), 3, t0 + 5)
    _write_wave(spark, gate, _wave_rows(28, 36), 4, t0 + 10)
    _write_wave(spark, gate, _wave_rows(10, 20), 2, t0 + 15)  # post-expiry straggler
    try:
        gate.run_until_drained(timeout_s=180)
        admitted = spark.createDataFrame(
            _wave_rows(0, 10) + _wave_rows(20, 36), "doc_id long, text string"
        )
        a = sorted(map(tuple, ngram_novelty(admitted, n=3).collect()))
        b = sorted(map(tuple, gate.results().collect()))
        assert a == b
        got = sorted(
            d for d in os.listdir(gate.results_dir) if d.startswith("batch_")
        )
        assert got == ["batch_0", "batch_2", "batch_3"]  # no batch_1: wave 2 lost
        assert gate.quarantined() == [
            {"wave": 2, "reason": "gap-expired", "n_rows": 0},
            {"wave": 2, "reason": "late-or-duplicate", "n_rows": 10},
        ]
    finally:
        gate.ingestor.drop_state()


def test_continuous_gate_stranded_buffer_raises_and_manual_expiry(spark, tmp_path):
    """End-of-stream strandedness (r12 review finding 5): waves 1 and 3
    arrive and the producer stops — the gap cannot expire because no
    further batches land, so run_until_drained must REFUSE to report a
    clean drain; expire_stalled_gaps() then declares the gap lost
    (audit row) and flushes the buffered wave."""
    import pytest as _pytest

    from clickhouse_segments_tutorial_spark.operators.corpus_stats import (
        ngram_novelty,
    )
    import time

    gate = _cont_gate(spark, str(tmp_path / "g3"), lateness_batches=5)
    gate.reset_state()
    t0 = time.time() - 100
    _write_wave(spark, gate, _wave_rows(0, 8), 1, t0)
    _write_wave(spark, gate, _wave_rows(16, 24), 3, t0 + 5)
    try:
        with _pytest.raises(RuntimeError, match="stranded"):
            gate.run_until_drained(timeout_s=180)
        assert gate._buffered_waves() == [3]
        gate.expire_stalled_gaps()
        assert gate._buffered_waves() == []
        admitted = spark.createDataFrame(
            _wave_rows(0, 8) + _wave_rows(16, 24), "doc_id long, text string"
        )
        a = sorted(map(tuple, ngram_novelty(admitted, n=3).collect()))
        b = sorted(map(tuple, gate.results().collect()))
        assert a == b
        assert gate.quarantined() == [
            {"wave": 2, "reason": "gap-expired", "n_rows": 0}
        ]
    finally:
        gate.ingestor.drop_state()


def test_continuous_gate_rate_source_unordered_arrival(spark, tmp_path):
    """The gate fed from a GENUINELY unordered streaming source (r12
    verdict item 4): eight waves arrive via Spark's rate source under a
    shuffled permutation — no monotone file naming anywhere — with
    multiple wave arrivals sharing micro-batches (concurrent arrival,
    rowsPerSecond=20 against a 500ms trigger). The gate must restore
    the strictly ascending admission order: the union of admitted
    outputs equals the BATCH novelty operator over the full corpus
    (the batch oracle, which by construction saw the waves in wave
    order), results are pinned under wave-stable ids, every wave is
    admitted exactly once, and nothing is quarantined."""
    from clickhouse_segments_tutorial_spark.operators.corpus_stats import (
        ngram_novelty,
    )

    # arrival schedule: event i delivers wave PERM[i] — a fixed shuffle
    # with both early jumps (4 before 1) and late fills
    PERM = [4, 2, 1, 6, 3, 5, 8, 7]
    gate = _cont_gate(
        spark, str(tmp_path / "g5"), max_ahead=8, lateness_batches=10
    )
    gate.reset_state()

    def data_of_wave(wid):
        return spark.createDataFrame(
            _wave_rows(10 * (wid - 1), 10 * wid), "doc_id long, text string"
        )

    try:
        gate.run_rate_source(
            lambda v: PERM[v], data_of_wave, len(PERM), timeout_s=180
        )
        docs = spark.createDataFrame(
            _wave_rows(0, 10 * len(PERM)), "doc_id long, text string"
        )
        a = sorted(map(tuple, ngram_novelty(docs, n=3).collect()))
        b = sorted(map(tuple, gate.results().collect()))
        assert a == b
        got = sorted(
            d for d in os.listdir(gate.results_dir) if d.startswith("batch_")
        )
        assert got == [f"batch_{i}" for i in range(len(PERM))]
        assert gate.quarantined() == []
        assert gate._buffered_waves() == []
    finally:
        gate.ingestor.drop_state()


def test_continuous_gate_rate_source_restart_completes(spark, tmp_path):
    """Restart-safety of the rate-source driver's stop condition (r13
    review finding): a re-run on the SAME checkpoint sees none of the
    already-committed events in its sink — a this-run event counter
    could never reach n_events and would raise TimeoutError on a
    healthy, fully-ingested stream. The high-water condition (the
    monotone rate value) completes cleanly, and the redelivered state
    is untouched: same results, same audit surface."""
    from clickhouse_segments_tutorial_spark.operators.corpus_stats import (
        ngram_novelty,
    )

    PERM = [2, 1, 4, 3]
    gate = _cont_gate(
        spark, str(tmp_path / "g6"), max_ahead=8, lateness_batches=10
    )
    gate.reset_state()

    def data_of_wave(wid):
        return spark.createDataFrame(
            _wave_rows(10 * (wid - 1), 10 * wid), "doc_id long, text string"
        )

    try:
        gate.run_rate_source(
            lambda v: PERM[v], data_of_wave, len(PERM), timeout_s=180
        )
        before = sorted(map(tuple, gate.results().collect()))
        # the restart: same workdir, same checkpoint — committed batches
        # are skipped, so the sink ingests nothing new
        gate.run_rate_source(
            lambda v: PERM[v], data_of_wave, len(PERM), timeout_s=180
        )
        after = sorted(map(tuple, gate.results().collect()))
        assert before == after
        docs = spark.createDataFrame(
            _wave_rows(0, 10 * len(PERM)), "doc_id long, text string"
        )
        want = sorted(map(tuple, ngram_novelty(docs, n=3).collect()))
        assert after == want
        assert gate.quarantined() == []
    finally:
        gate.ingestor.drop_state()


def test_continuous_gate_full_buffer_still_expires_gap(spark, tmp_path):
    """The deadlock fix (r12 review finding 1) composed with buffer-full
    RE-ADMISSION (r12 ADVICE item 1): with max_ahead smaller than
    lateness_batches, buffer-full quarantined waves still count toward
    gap expiry — otherwise the counter can never reach the threshold and
    the gate stalls forever. Waves 2..5 land while wave 1 is lost
    (buffer holds 2 of them, 2 overflow into buffer-full quarantine);
    the 4th arrival crosses lateness_batches=4, wave 1 expires, the
    buffered prefix drains — and the overflowed waves 4 and 5, whose
    rows never left disk, are re-admitted the moment each becomes the
    next in-order wave instead of staying silently excluded behind a
    clean drain. Only the genuinely lost wave leaves an audit row."""
    import time

    gate = _cont_gate(
        spark, str(tmp_path / "g4"), max_ahead=2, lateness_batches=4
    )
    gate.reset_state()
    t0 = time.time() - 100
    for i, wid in enumerate((2, 3, 4, 5)):  # wave 1 never arrives
        _write_wave(
            spark, gate, _wave_rows(10 * wid, 10 * wid + 5), wid, t0 + 5 * i
        )
    try:
        gate.run_until_drained(timeout_s=180)
        # waves 2 and 3 were buffered and drained after the expiry; 4
        # and 5 overflowed the 2-wave buffer into quarantine and were
        # re-admitted in order during the same drain
        got = sorted(
            d for d in os.listdir(gate.results_dir) if d.startswith("batch_")
        )
        assert got == ["batch_1", "batch_2", "batch_3", "batch_4"]
        reasons = [(a["wave"], a["reason"]) for a in gate.quarantined()]
        assert reasons == [(1, "gap-expired")]
        # the admitted union equals the batch operator over waves 2..5
        from clickhouse_segments_tutorial_spark.operators.corpus_stats import (
            ngram_novelty,
        )

        admitted = spark.createDataFrame(
            [r for wid in (2, 3, 4, 5) for r in _wave_rows(10 * wid, 10 * wid + 5)],
            "doc_id long, text string",
        )
        a = sorted(map(tuple, ngram_novelty(admitted, n=3).collect()))
        b = sorted(map(tuple, gate.results().collect()))
        assert a == b
    finally:
        gate.ingestor.drop_state()
