"""JSONEachRow-style ingest.

The reference ingests rows as NDJSON against a declared table schema
(INSERT ... FORMAT JSONEachRow, /root/reference/src/1-naive.test.ts:49-69).
Spark equivalent: parse JSON lines with an explicit StructType — schema
errors surface as nulls (permissive) or failures (FAILFAST), never silent
inference.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


def read_json_rows(
    spark: SparkSession,
    lines: Iterable[str],
    schema: T.StructType,
    *,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Parse an iterable of JSON-object strings into a typed DataFrame.

    Timestamps accept ISO-8601 (the reference's client sends
    ``toISOString()`` values); Spark's JSON reader parses those natively.
    """
    raw = spark.createDataFrame([(ln,) for ln in lines], "json string")
    parsed = raw.select(
        F.from_json("json", schema, {"mode": mode}).alias("row")
    ).select("row.*")
    return parsed


def rows_to_df(spark: SparkSession, rows: list[dict], schema: T.StructType) -> DataFrame:
    """Direct row-object ingest (the in-process analog of JSONEachRow)."""
    return spark.createDataFrame(rows, schema)
