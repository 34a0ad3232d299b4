"""Micro-batch segmentation over BUCKETED state/assignment tables.

The path-based :class:`MicroBatchSegmenter` shuffles twice per batch on
user_id (state groupBy, finalize merge) and once per serve (latest-wins
groupBy). Bucketing both hot tables on user_id moves that cost to write
time, once: every subsequent finalize merge and latest-wins serve reads
co-located sorted buckets and runs with NO Exchange in the plan
(asserted in tests/test_plans.py).

This is the Spark analog of what the reference gets from
`ORDER BY (user_id, ...)` MergeTree clustering
(/root/reference/src/1-naive.test.ts:19, 3-microBatch.test.ts:21): the
physical layout *is* the partitioning, so per-key operations are local.

The changelog stays a day-partitioned path table — its access pattern is
partition pruning by day, not per-key lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .micro_batch import MicroBatchSegmenter
from .spec import EventLog, SegmentSpec
from ..sources.bucketed import write_bucketed


class BucketedMicroBatchSegmenter(MicroBatchSegmenter):
    """MicroBatchSegmenter with states/assignments as bucketed catalog
    tables. ``namespace`` prefixes the table names (one cascade per
    namespace); all tables share ``buckets`` so joins co-locate."""

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        spec: SegmentSpec,
        log: EventLog = EventLog(),
        *,
        namespace: str,
        buckets: int = 32,
        database: str | None = None,
    ):
        import re

        ident = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
        if not ident.fullmatch(namespace):
            # interpolated into DDL below — fail at construction, not at
            # maintenance time
            raise ValueError(f"namespace must be a SQL identifier: {namespace!r}")
        if database is not None and not ident.fullmatch(database):
            raise ValueError(f"database must be a SQL identifier: {database!r}")
        super().__init__(spark, workdir, spec, log)
        self.buckets = buckets
        # optional named-database binding (sources/database.SegmentDatabase
        # — the reference's per-run database, jestGlobalSetup.ts:11-13);
        # unqualified names land in the session's current database
        prefix = f"{database}." if database else ""
        self.states_table = f"{prefix}{namespace}_user_states"
        self.assignments_table = f"{prefix}{namespace}_segment_assignments"

    # -- storage hooks ---------------------------------------------------------

    def _append_states(self, df: DataFrame) -> None:
        write_bucketed(
            df,
            self.states_table,
            key="user_id",
            buckets=self.buckets,
            mode="append",
        )

    def _append_assignments(self, df: DataFrame) -> None:
        write_bucketed(
            df,
            self.assignments_table,
            key="user_id",
            buckets=self.buckets,
            mode="append",
        )

    def _table(self, name: str) -> DataFrame | None:
        if not self.spark.catalog.tableExists(name):
            return None
        return self.spark.table(name)

    def states(self) -> DataFrame | None:
        table = self._table(self.states_table)
        if table is None and self.spark.catalog.tableExists(
            f"{self.states_table}_old"
        ):
            # a compaction crashed between its two renames; the data is
            # intact under _old — refuse to run as if history were empty
            raise RuntimeError(
                f"{self.states_table} missing but {self.states_table}_old "
                "exists: recover by renaming _old back (interrupted "
                "compaction)"
            )
        return table

    def assignments(self) -> DataFrame | None:
        return self._table(self.assignments_table)

    # -- maintenance -----------------------------------------------------------

    def compact_states(self) -> None:
        """Collapse each user's state rows into one merged row (shared
        merge semantics via ``_merged_states``), keeping the bucketed
        layout. Rewrites through scratch-table RENAMES, never a DROP of
        live data: a crash at any point leaves the history recoverable —
        either the original is still live, or it survives under ``_old``
        and :meth:`states` refuses to run until it is renamed back."""
        states = self.states()
        if states is None:
            return
        merged = self._merged_states(states)
        tmp = f"{self.states_table}_compact_tmp"
        old = f"{self.states_table}_old"
        self.spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        write_bucketed(
            merged, tmp, key="user_id", buckets=self.buckets, mode="overwrite"
        )
        self.spark.sql(f"ALTER TABLE {self.states_table} RENAME TO {old}")
        self.spark.sql(f"ALTER TABLE {tmp} RENAME TO {self.states_table}")
        self.spark.sql(f"DROP TABLE {old}")

    def drop_tables(self) -> None:
        """Test/teardown helper: remove this namespace's catalog tables."""
        for t in (self.states_table, self.assignments_table):
            self.spark.sql(f"DROP TABLE IF EXISTS {t}")
