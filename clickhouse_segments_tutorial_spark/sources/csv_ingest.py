"""CSV-format ingest against a declared schema.

The reference's ingest surface is format-pluggable (INSERT ... FORMAT
JSONEachRow is the variant its tests exercise, 1-naive.test.ts:49-69;
ClickHouse accepts CSV through the same INSERT path). Spark equivalent:
parse CSV lines with an explicit StructType via ``from_csv`` — like
json_ingest, schema errors surface as nulls (PERMISSIVE) or failures
(FAILFAST), never silent inference. Quoted fields (embedded commas,
quotes doubled) follow RFC-4180 via Spark's uniVocity parser, so JSON
payload columns (events.props) survive the round-trip byte-for-byte.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


def _ddl(schema: T.StructType | str) -> str:
    if isinstance(schema, str):
        return schema
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)


def parse_csv_lines(
    lines_df: DataFrame,
    schema: T.StructType | str,
    *,
    col: str = "csv",
    mode: str = "FAILFAST",
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Parse a DataFrame column of CSV lines (no header) into typed rows —
    the distributed path (an expression, never a driver collect)."""
    opts = {"mode": mode, **(options or {})}
    return lines_df.select(
        F.from_csv(col, _ddl(schema), opts).alias("row")
    ).select("row.*")


def read_csv_rows(
    spark: SparkSession,
    lines: Iterable[str],
    schema: T.StructType | str,
    *,
    mode: str = "FAILFAST",
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Parse an iterable of CSV lines (no header) into a typed DataFrame
    (driver-side convenience over :func:`parse_csv_lines`)."""
    raw = spark.createDataFrame([(ln,) for ln in lines], "csv string")
    return parse_csv_lines(raw, schema, mode=mode, options=options)


def csv_line(df: DataFrame) -> DataFrame:
    """Serialize every row to one CSV line (the write half of the
    round-trip; column order is the DataFrame's)."""
    return df.select(
        F.to_csv(F.struct(*[F.col(c) for c in df.columns])).alias("csv")
    )
