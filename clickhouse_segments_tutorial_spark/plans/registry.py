"""Query registry: every operator surfaced through __spark_entry__.

Each :class:`QuerySpec` pairs the Spark implementation with (when the
semantics are SQL-expressible) a DuckDB oracle computing the identical
result. Column names and value expressions are written to be *bit-identical*
across engines:

- double sums: per-row scalar math in double (deterministic, same IEEE ops
  both engines) -> CAST to decimal (exact, order-independent sum) -> cast
  back to double. Never a raw SUM(double), whose value depends on
  partitioning/order.
- averages: exact decimal sum cast to double, then ONE double division by
  the count.
- timestamps: compared/emitted after truncation to whole seconds
  (unix_timestamp vs floor(epoch(...))) or as formatted strings; events.ts
  is CAST to microseconds in oracles because Spark reads the ns parquet
  column truncated to us.
- ordering for LIMIT queries always carries a unique tiebreak column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB SQL over the pre-registered views
    headline: bool = False  # included in bench.py's timed set


def all_queries() -> dict[str, QuerySpec]:
    from . import llm, relational, scale, segmentation_queries

    out: dict[str, QuerySpec] = {}
    for mod in (segmentation_queries, relational, llm, scale):
        for spec in mod.QUERIES:
            if spec.name in out:
                raise ValueError(f"duplicate query name {spec.name}")
            out[spec.name] = spec
    return out
