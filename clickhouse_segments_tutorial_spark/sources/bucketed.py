"""Bucketed tables: co-located storage that removes the per-query shuffle.

ClickHouse gets cheap per-user reads from its `ORDER BY (user_id, ...)`
clustered primary key (/root/reference/src/1-naive.test.ts:19). At Spark
scale the analogous physical design is a BUCKETED table: rows hashed into
a fixed number of buckets on the key at write time, one sorted file per
bucket. Any later groupBy/join/semi-join on that key reads the bucketing
metadata and skips its Exchange entirely — the shuffle is paid once at
write, then amortized over every query.

This is the scale path for the hot keys of this engine:
- events bucketed by user_id -> per-user aggregation with no shuffle;
- assignments bucketed by user_id -> latest-wins serve with no shuffle;
- state bucketed by user_id -> finalize semi-join co-located on both sides.

Bucketed tables must live in the session catalog (saveAsTable), not bare
paths — the bucketing spec is catalog metadata. tests/test_plans.py
asserts the Exchange actually disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed (and sorted) on ``key``.

    ``buckets`` should be sized so one bucket of the largest table fits an
    executor's memory comfortably (at 100 TB: thousands of buckets); all
    tables that join on ``key`` must use the SAME bucket count for the
    co-located join to kick in.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucketing metadata rides along automatically."""
    return spark.table(table)
