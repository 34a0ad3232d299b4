"""Last-writer-wins resolution over an append-only versioned table.

The reference stores segment assignments in a ReplacingMergeTree and resolves
the latest row per user at read time with ``argMax(value, assigned_at)``
(/root/reference/src/1-naive.test.ts:85, 2-idempotent.test.ts:97). Spark's
exact equivalent is ``max_by`` — a single hash aggregate, no window/sort.

Scale note: ``max_by`` per key is one shuffle on the key with map-side
partial aggregation (Catalyst always splits partial/final), which beats the
``row_number() over (partition by ... order by ...)`` formulation — the
window version must sort every partition; ``max_by`` keeps one running row
per key. At 100 TB of assignment history the difference is a full sort vs a
streaming fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def latest_value(value_col: str, order_col: str) -> Column:
    """argMax(value, order) — value at the max of ``order_col``."""
    return F.max_by(value_col, order_col)


def latest_by_key(
    df: DataFrame,
    key: str | list[str],
    order_col: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Resolve the latest version of each key.

    With ``value_cols`` given, returns key + argMax of each value column
    (what the reference's serve query does). Otherwise returns the full
    latest row via ``max_by(struct(*), order)``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if value_cols is None:
        return (
            df.groupBy(*keys)
            .agg(F.max_by(F.struct(*[c for c in df.columns if c not in keys]), F.col(order_col)).alias("_row"))
            .select(*keys, "_row.*")
        )
    aggs = [F.max_by(c, F.col(order_col)).alias(c) for c in value_cols]
    return df.groupBy(*keys).agg(*aggs)
