"""Table catalog over the parquet corpus.

The reference reads/writes named ClickHouse tables inside a per-run database
(/root/reference/src/jestGlobalSetup.ts:11-13). Here a ``Catalog`` binds a
scale-factor directory of parquet files to lazily-loaded DataFrames and
(optionally) temp views so the same queries run via DataFrame API or SQL.

Scans stay columnar + pushdown-friendly: ``spark.read.parquet`` with the
explicit schema from :mod:`..schemas` lets Catalyst prune columns and push
predicates into the parquet reader (check for ``PushedFilters`` in
``.explain``) — the Spark analog of ClickHouse primary-key range pruning
(SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..schemas import CORPUS_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table. Schema comes from the parquet footer (already
    explicit, written by the driver); ``schemas.CORPUS_TABLES`` declares the
    logical schema we normalize to.

    Nanosecond-precision parquet timestamps (events.ts is TIMESTAMP(NANOS))
    are illegal for Spark's vectorized reader by default; we read them as
    raw int64 nanos (legacy.parquet.nanosAsLong) and convert with exact
    integer division to microsecond TimestampType — same value DuckDB sees
    truncated to us.
    """
    if name not in CORPUS_TABLES:
        raise KeyError(f"unknown corpus table {name!r}")
    # NOTE: session-global side effect, deliberate — the flag must be live
    # whenever a catalog table's lazy scan executes, so it cannot be scoped
    # to this call. All engine paths read TIMESTAMP(NANOS) parquet through
    # this function (which converts exactly); other nanos readers in the
    # same session will see raw int64 longs instead of an unsupported-type
    # error. div 1000 truncates toward zero == floor for the corpus's
    # non-negative epochs (pre-1970 nanos would need floor-div).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Micros-without-timezone parquet (the current driver corpus) would
    # otherwise infer as TIMESTAMP_NTZ under Spark 4 defaults — a type that
    # watermarks, unix_micros and timestamp arithmetic reject. Read as
    # instants; with the UTC session timezone the values match DuckDB's
    # naive interpretation exactly.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    declared = CORPUS_TABLES[name]
    for field in declared.fields:
        actual = df.schema[field.name].dataType if field.name in df.columns else None
        if isinstance(field.dataType, T.TimestampType) and isinstance(actual, T.LongType):
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"`{field.name}` div 1000")),
            )
        elif isinstance(field.dataType, T.TimestampType) and isinstance(
            actual, T.TimestampNTZType
        ):
            # Defensive: a scan planned before the conf above was set (or an
            # externally-built session) can still surface NTZ; under the UTC
            # session timezone this cast is value-preserving.
            df = df.withColumn(field.name, F.col(field.name).cast(T.TimestampType()))
    return df


class Catalog:
    """Lazy view of one scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = load_table(self.spark, self.sf_dir, name)
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in CORPUS_TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self, names: list[str] | None = None) -> None:
        """Register temp views so ``spark.sql`` can reference tables by name
        — mirrors the reference's named-table model."""
        for name in (names if names is not None else CORPUS_TABLES):
            self.table(name).createOrReplaceTempView(name)
