"""Named-database lifecycle — the reference's per-run database model.

The reference creates a dedicated database per test run and drops it at
teardown (/root/reference/src/jestGlobalSetup.ts:11-13,
jestGlobalTeardown.ts:11-13: ``CREATE DATABASE IF NOT EXISTS <name>`` /
``DROP DATABASE``), and every table lives inside it. This is the Spark
catalog analog: ``CREATE DATABASE`` backed by the warehouse dir,
``saveAsTable`` under the namespace, ``DROP DATABASE ... CASCADE`` at the
end — completing S1/S12 literally (named tables in a namespaced catalog,
not just bare parquet paths).

Scale note: the catalog is metadata only — table data is still partitioned
/ bucketed parquet under the warehouse; nothing about the physical layout
or the query plans changes, which is exactly why the engine treats
catalog-vs-path as a storage BINDING, not a different engine mode.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


class SegmentDatabase:
    """One run's namespace of catalog tables.

    Usable as a context manager mirroring setup/teardown::

        with SegmentDatabase(spark, "seg_run_1") as db:
            seg = BucketedMicroBatchSegmenter(..., namespace="heavy",
                                              database=db.name)
            ...
        # DROP DATABASE seg_run_1 CASCADE ran on exit
    """

    def __init__(self, spark: SparkSession, name: str):
        if not _IDENT.fullmatch(name):
            # interpolated into DDL — fail at construction
            raise ValueError(f"database name must be a SQL identifier: {name!r}")
        self.spark = spark
        self.name = name

    def create(self, location: str | None = None) -> "SegmentDatabase":
        """``location`` pins the database's storage root (tables created in
        it land under this path instead of the session warehouse dir) —
        lets a caller keep catalog-table data in scratch space when the
        warehouse points somewhere it should not write (ignored by the
        engine if the database already exists)."""
        loc = ""
        if location is not None:
            if "'" in location:
                raise ValueError(f"location must not contain quotes: {location!r}")
            loc = f" LOCATION '{location}'"
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {self.name}{loc}")
        return self

    def drop(self) -> None:
        self.spark.sql(f"DROP DATABASE IF EXISTS {self.name} CASCADE")

    def qualify(self, table: str) -> str:
        return f"{self.name}.{table}"

    def tables(self) -> list[str]:
        return [t.name for t in self.spark.catalog.listTables(self.name)]

    def __enter__(self) -> "SegmentDatabase":
        return self.create()

    def __exit__(self, *exc) -> None:
        self.drop()
