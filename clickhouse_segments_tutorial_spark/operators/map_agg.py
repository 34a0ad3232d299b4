"""Map-valued aggregates — the ClickHouse ``sumMap`` / ``minMap`` /
``maxMap`` family (reference analog: the segment cascades aggregate
per-user scalars, /root/reference/src/1-naive.test.ts:72-95; these are
the same per-key aggregation with a MAP-shaped result, the idiom CH
users reach for when one row must carry a whole per-category breakdown
— per-type counters, per-slot histograms, per-currency totals).

ClickHouse's contract: ``sumMap(keys, vals)`` over a group returns two
parallel arrays — the SORTED union of all keys, and per key the sum of
its values across every row in the group. The Spark-first shape is the
inverse of CH's array-encoded input: explode the per-row entries once,
run one ordinary (group, key) hash agg — map-side combinable, state
bounded by the number of DISTINCT keys per group, never the row count —
and rebuild the sorted parallel arrays with ``sort_array`` over structs
(key-major order, so the output is deterministic under any
partitioning). No window, no UDF, no driver-side anything.

100-TB shape: one shuffle on (group, key) — the same exchange the
scalar aggregation would need; the array rebuild is a second hash agg
over <= n_keys rows per group (metadata, not data). Skewed groups
shard exactly like any hash agg (AQE / salting apply unchanged)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def agg_map(
    df: DataFrame,
    group_cols: list[str],
    key_col: str | Column,
    value_col: str | Column,
    agg: str = "sum",
    *,
    keys_name: str = "map_keys",
    vals_name: str = "map_vals",
) -> DataFrame:
    """One row per group with the sorted key array and the per-key
    aggregated value array — ``agg`` in {'sum', 'min', 'max', 'count'}
    (the sumMap / minMap / maxMap / countMap family). NULL keys are
    dropped (CH's map functions never emit a null key); NULL values
    participate per the inner aggregate's own NULL rule. Sums
    accumulate exactly as whatever type the caller passes (cast to
    decimal upstream for cross-engine determinism, the registry
    rule)."""
    aggs = {
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "count": lambda c: F.count(c).cast("long"),
    }
    if agg not in aggs:
        raise ValueError(f"agg={agg!r}: supported {sorted(aggs)}")
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    per_key = (
        df.select(*group_cols, k.alias("_k"), v.alias("_v"))
        .filter(F.col("_k").isNotNull())
        .groupBy(*group_cols, "_k")
        .agg(aggs[agg](F.col("_v")).alias("_a"))
    )
    pairs = F.sort_array(
        F.collect_list(F.struct(F.col("_k"), F.col("_a")))
    )
    return per_key.groupBy(*group_cols).agg(
        F.transform(pairs, lambda p: p["_k"]).alias(keys_name),
        F.transform(pairs, lambda p: p["_a"]).alias(vals_name),
    )
