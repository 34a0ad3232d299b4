"""Structured Streaming twin of the micro-batch segmentation cascade.

The reference's variant 3/4 machinery maps 1:1 onto Structured Streaming
(SURVEY.md §2.4):

| reference                                   | here                             |
|---------------------------------------------|----------------------------------|
| processing-time lower_bound cursor          | source offsets + checkpoint      |
| AggregatingMergeTree uniqState/uniqMerge    | stateful groupBy aggregation     |
|   (persisted HLL partial state)             |   (state store, approx_count_distinct) |
| MV changelog of changed users per insert    | update-mode rows per micro-batch |
| ReplacingMergeTree + argMax serving         | foreachBatch append + max_by     |
| TTL / late-data bounds                      | withWatermark on event time      |

Duplicate message_ids are neutralized exactly as the reference does it —
by counting *distinct* message ids (uniq ≈ approx_count_distinct) rather
than rows (/root/reference/src/2-idempotent.test.ts:87), so at-least-once
delivery needs no separate dedup operator in the stream.

Scale: the state store holds one HLL register set + one max per user —
the same O(users) footprint as the reference's state table; watermarking
bounds how long late events can mutate state. Each micro-batch shuffles
only new events (partial aggregates map-side), and the foreachBatch sink
appends only updated users — the changelog semantics, for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..segmentation.spec import EventLog, SegmentSpec
from ..operators.latest_wins import latest_value


class StreamingSegmenter:
    """File-source streaming cascade over a workdir.

    ``events_dir`` is the append-only ingest directory (parquet files appear
    over time, e.g. from an upstream writer); each ``run_available_now``
    drains whatever arrived since the checkpoint — exactly the reference's
    "run the micro-batch job for the new window" loop, with offsets managed
    by Spark instead of a hand-carried lower_bound.

    Watermark caveat: events arriving more than ``watermark`` behind the
    event-time high-water mark are dropped from the aggregation state.
    For historical backfills set ``watermark`` to at least the maximum
    event-time disorder in the replayed data (or replay in event-time
    order); the default 10 minutes is a live-ingest setting.
    """

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        spec: SegmentSpec,
        log: EventLog = EventLog(),
        *,
        schema,
        watermark: str = "10 minutes",
        drop_duplicates: bool = False,
    ):
        self.spark = spark
        self.spec = spec
        self.log = log
        self.schema = schema
        self.watermark = watermark
        self.drop_duplicates = drop_duplicates
        self.events_dir = os.path.join(workdir, "events_in")
        self.checkpoint = os.path.join(workdir, "checkpoint")
        self.assignments_path = os.path.join(workdir, "segment_assignments")
        os.makedirs(self.events_dir, exist_ok=True)

    def _filtered(self) -> DataFrame:
        """Shared ingest head: file source -> segment filter -> watermark ->
        optional dedup-at-ingest. Both aggregation strategies build on this."""
        log = self.log
        events = (
            self.spark.readStream.schema(self.schema).parquet(self.events_dir)
        )
        filtered = events.filter(self.spec.event_filter(log)).withWatermark(
            log.time, self.watermark
        )
        if self.drop_duplicates:
            # T2's streaming-native idempotence: per-key dedup state evicted
            # once the watermark passes — a re-delivered message_id within
            # the watermark window is dropped at ingest, so the aggregate
            # can be a plain count. The default path instead neutralizes
            # duplicates the way the reference does, by counting distinct
            # ids (2-idempotent.test.ts:87).
            filtered = filtered.dropDuplicatesWithinWatermark([log.message])
        return filtered

    def _stream(self) -> DataFrame:
        log = self.log
        return (
            self._filtered().groupBy(F.col(log.user).alias("user_id"))
            .agg(
                (
                    F.count(F.lit(1))
                    if self.drop_duplicates
                    else F.approx_count_distinct(log.message)
                ).alias("n_distinct"),
                F.max(log.time).alias("last_event_time"),
            )
        )

    def _sink_select(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        """Projection of one update-mode batch into assignment versions.
        Subclasses whose stream already emits ``value`` override this."""
        return batch_df.select(
            "user_id",
            (F.col("n_distinct") >= self.spec.threshold).alias("value"),
            "last_event_time",
            F.lit(batch_id).alias("version"),
        )

    def run_available_now(self) -> None:
        """Drain all new source files through one checkpointed run."""
        out_path = self.assignments_path

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            # update-mode batch = exactly the users whose state changed
            # (the reference's changelog, 3-microBatch.test.ts:50-56);
            # append versioned assignments, reader resolves latest-wins.
            self._sink_select(batch_df, batch_id).write.mode("append").parquet(
                out_path
            )

        q = (
            self._stream()
            .writeStream.outputMode("update")
            .option("checkpointLocation", self.checkpoint)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def members(self) -> DataFrame:
        if not os.path.exists(self.assignments_path):
            raise RuntimeError("no batches processed yet")
        assignments = self.spark.read.parquet(self.assignments_path)
        return (
            assignments.groupBy("user_id")
            .agg(latest_value("value", "version").alias("latest_value"))
            .filter(F.col("latest_value"))
            .select("user_id")
        )
