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
    key: str | tuple[str, ...],
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
    align: bool = False,
) -> None:
    """Write ``df`` as a parquet table bucketed (and sorted) on ``key``
    (a column name or tuple of names for composite keys).

    ``buckets`` should be sized so one bucket of the largest table fits an
    executor's memory comfortably (at 100 TB: thousands of buckets); all
    tables that join on ``key`` must use the SAME bucket count for the
    co-located join to kick in.

    ``align=True`` pre-shuffles rows so each task holds exactly one
    bucket's rows (``repartition(buckets, *key)`` uses the same
    pmod(murmur3) expression as the bucket-id assignment), so every write
    emits at most ONE file per bucket instead of up-to tasks×buckets —
    essential for tables that receive many small appends (micro-batch
    state), irrelevant for one-shot writes.
    """
    keys = (key,) if isinstance(key, str) else tuple(key)
    if align:
        df = df.repartition(buckets, *keys)
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucketing metadata rides along automatically."""
    return spark.table(table)
