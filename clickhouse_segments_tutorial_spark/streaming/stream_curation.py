"""Streaming ingest-gate twins for the wave-state curation operators —
the third leg of the batch / incremental / streaming triangle that the
per-source quota already has (plans/curation.py module docstring).

One generic gate: a Structured Streaming file source drained by
``foreachBatch``, each micro-batch handed to a wave-state incremental
operator (``IncrementalNoveltyScorer`` / ``IncrementalSemanticDeduper``)
— the hll_cascade.py pattern, where the stream is just the ingest head
(checkpointed offsets = the processed-wave cursor) and ALL state lives
in the operator's bucketed catalog tables. Nothing is recomputed across
batches: per batch the operator does O(wave + co-located state lookups)
work, exactly its incremental contract.

Wave contract (inherited from the incremental operators): batches must
arrive in ascending id order across batches. A file source provides
this with ordered wave files + ``maxFilesPerTrigger=1`` (each file
becomes its own micro-batch, processed in discovery order) — the same
production note as the quota gate's ordering contract (README).

Crash/restart story:
- stream offsets: checkpointed — a restarted gate (same workdir) skips
  already-processed files;
- operator state: the bucketed catalog tables persist across gate
  objects;
- batch RESULTS are written to ``results/batch_<id>`` with overwrite —
  batch ids are stable across restarts, so a replayed batch overwrites
  its own output instead of duplicating rows.

Replay idempotence is the INGESTOR's property, not the gate's — a batch
can replay after a crash between the sink and the checkpoint commit.
The gate hands ingestors that accept it the restart-stable ``wave_id``
(its batch id), which is what each one keys its replay story on:
- IncrementalNoveltyScorer / IncrementalSemanticDeduper: replay-safe by
  construction — re-appended state rows are exact duplicates their
  min()/distinct reads collapse; wave_id only stabilizes the
  wave-result path.
- IncrementalCorpusCurator: replay-safe via WAVE-TAGGED state (the r10
  self-review finding 2 fix): its left_anti-consumed dedup state would
  otherwise drop a replayed wave's documents against its own partial
  appends, so state rows carry the appending wave id and every lookup
  excludes the current wave's rows; the wave's curated output
  overwrites its own subdirectory.
- IncrementalCorpusBuilder: NOT replay-safe (its mixture/packing
  counters are plain appends a replay would double-count) — batch and
  incremental use only; documented on its ingest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class StreamingWaveGate:
    """File-source ingest gate driving a wave-state incremental operator.

    ``ingestor`` must expose ``ingest(df) -> DataFrame`` (one wave in,
    that wave's output rows back) and ``reset()`` (drop persisted state)
    — the IncrementalNoveltyScorer / IncrementalSemanticDeduper
    protocol. Its state workdir should live UNDER ``workdir`` so the
    registered queries' scratch wipe clears stream and state together.
    """

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        *,
        schema,
        ingestor,
        select_cols: list[str] | None = None,
        compact_every: int | None = None,
    ):
        """``compact_every``: run the ingestor's ``compact()`` after every
        N batches (when it has one) — the measured cadence from
        BASELINE.md r10: bucketed state accumulates one file per bucket
        per wave, and at 16 waves uncompacted state scans ran ~+39% on
        the late waves; folding every ~4 waves kept per-wave wall flat.
        Compaction is result-identical (tested on every stateful class),
        so the cadence is purely an IO/latency knob. A batch REPLAYED
        after a crash can skip its compaction (batch ids replay but the
        modulo re-fires — harmless: compact is idempotent on compacted
        state). A crash DURING compact's non-atomic table overwrite is
        healed on the next state read: every stateful class restores the
        missing table from its pinned pre-compact copy
        (_heal_from_compact_pin; r10 second-review finding 3)."""
        self.spark = spark
        self.schema = schema
        self.ingestor = ingestor
        self.select_cols = select_cols
        self.compact_every = compact_every
        self.in_dir = os.path.join(workdir, "stream_in")
        self.checkpoint = os.path.join(workdir, "checkpoint")
        self.results_dir = os.path.join(workdir, "results")
        import inspect

        self._pass_wave_id = "wave_id" in inspect.signature(
            ingestor.ingest
        ).parameters
        os.makedirs(self.in_dir, exist_ok=True)

    def reset_state(self) -> None:
        """Drop the operator's persisted catalog state. The registered
        queries call this once up front when their scratch helper REUSES
        a workdir across invocations: the wipe clears the directory
        (stream files + checkpoint) but cannot see the warehouse tables
        (the IncrementalNoveltyScorer.reset story). Ingestors built on a
        fresh unique workdir per call (IncrementalCorpusCurator via
        session.scratch_dir) have nothing to reset and may omit the
        method."""
        reset = getattr(self.ingestor, "reset", None)
        if reset is not None:
            reset()

    def run_available_now(self) -> None:
        def sink(batch_df: DataFrame, batch_id: int) -> None:
            if self.select_cols:
                batch_df = batch_df.select(*self.select_cols)
            # hand the restart-stable batch id to ingestors that key their
            # state/replay isolation on it (the curator's wave tags; the
            # scorers use it for stable wave-result paths). batch ids are
            # 0-based but wave ids are 1-based — 0 is the universal
            # "no completed wave" sentinel in the resume probes, so a
            # completed wave 0 would be indistinguishable from an empty
            # workdir and break default-numbering re-attach (r10 ADVICE
            # item 3)
            if self._pass_wave_id:
                out = self.ingestor.ingest(batch_df, wave_id=batch_id + 1)
            else:
                out = self.ingestor.ingest(batch_df)
            # overwrite keyed by the (restart-stable) batch id: replays
            # rewrite their own output, never duplicate it
            out.write.mode("overwrite").parquet(
                os.path.join(self.results_dir, f"batch_{batch_id}")
            )
            compact = getattr(self.ingestor, "compact", None)
            if (
                self.compact_every
                and compact is not None
                and (batch_id + 1) % self.compact_every == 0
            ):
                compact()

        q = (
            self.spark.readStream.schema(self.schema)
            # one file per micro-batch: the wave contract requires batch
            # boundaries to respect ascending-id file boundaries
            .option("maxFilesPerTrigger", 1)
            .parquet(self.in_dir)
            .writeStream.outputMode("append")
            .option("checkpointLocation", self.checkpoint)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def results(self) -> DataFrame:
        """Union of all COMMITTED batches' outputs (lazy readers).

        A crash between Spark's task-commit and job-commit leaves a
        partial ``batch_*`` directory without ``_SUCCESS``; re-running
        the gate overwrites it, but a direct results() read must not
        surface the partial rows, mirroring the pin-validity rule in
        the state heal (r10 ADVICE item 2)."""
        if not os.path.isdir(self.results_dir):
            raise RuntimeError("no batches processed yet")
        parts = sorted(
            os.path.join(self.results_dir, d)
            for d in os.listdir(self.results_dir)
            if d.startswith("batch_")
            and os.path.exists(os.path.join(self.results_dir, d, "_SUCCESS"))
        )
        if not parts:
            raise RuntimeError("no batches processed yet")
        return self.spark.read.parquet(*parts)
