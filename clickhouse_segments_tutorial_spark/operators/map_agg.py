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
    return agg_maps(
        df, group_cols, key_col, {vals_name: (value_col, agg)},
        keys_name=keys_name,
    )


def agg_maps(
    df: DataFrame,
    group_cols: list[str],
    key_col: str | Column,
    specs: dict[str, tuple[str | Column, str]],
    *,
    keys_name: str = "map_keys",
) -> DataFrame:
    """Several map aggregates over the SAME key in one shared pass —
    ``specs`` maps each output array name to (value_col, agg). One
    scan, one (group, key) exchange, one array rebuild, however many
    maps ride along (sumMap + maxMap + countMap over one breakdown key
    is the common CH dashboard shape; computing them as separate
    agg_map calls costs a scan + two exchanges + a join EACH — the
    .explain audit that motivated this variant). Output: group_cols,
    the shared sorted key array, and one value array per spec, all
    key-aligned."""
    aggs = {
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "count": lambda c: F.count(c).cast("long"),
    }
    if not specs:
        raise ValueError("specs must name at least one map aggregate")
    # up-front reserved-name validation (the cms_estimate contract — a
    # collision would otherwise surface as an opaque ambiguous-reference
    # AnalysisException deep in the agg)
    reserved = {"_k"} | {f"_v_{n}" for n in specs} | {f"_a_{n}" for n in specs}
    for g in group_cols:
        if g in reserved or g == keys_name or g in specs:
            raise ValueError(
                f"group column {g!r} collides with an agg_maps internal "
                f"or output name ({sorted(reserved)}, keys_name, spec names)"
            )
    for name, (_, agg) in specs.items():
        if agg not in aggs:
            raise ValueError(f"agg={agg!r} (for {name!r}): supported {sorted(aggs)}")
        if name == keys_name:
            raise ValueError(f"spec name {name!r} collides with keys_name")
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    vals = [
        (name, (F.col(v) if isinstance(v, str) else v), agg)
        for name, (v, agg) in specs.items()
    ]
    per_key = (
        df.select(
            *group_cols,
            k.alias("_k"),
            *[v.alias(f"_v_{name}") for name, v, _ in vals],
        )
        .filter(F.col("_k").isNotNull())
        .groupBy(*group_cols, "_k")
        .agg(
            *[
                aggs[agg](F.col(f"_v_{name}")).alias(f"_a_{name}")
                for name, _, agg in vals
            ]
        )
    )
    # keys are unique per group after the agg, so the struct sort is
    # purely key-major — deterministic under any partitioning
    pairs = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("_k"), *[F.col(f"_a_{name}") for name, _, _ in vals]
            )
        )
    )
    def _pick(n):
        # closure factory, NOT a default-arg lambda: pyspark derives the
        # higher-order-function arity from the Python signature, so a
        # second defaulted parameter would be bound to the array index
        return lambda p: p[f"_a_{n}"]

    return per_key.groupBy(*group_cols).agg(
        F.transform(pairs, lambda p: p["_k"]).alias(keys_name),
        *[F.transform(pairs, _pick(name)).alias(name) for name, _, _ in vals],
    )
