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


class IncrementalMapAgg:
    """Wave-state twin of :func:`agg_maps` on the shared wave chassis
    (operators/wave_counts.WaveCountState — the IncrementalCms /
    IncrementalQuantileHist shape, r16 verdict item 7): per-wave
    (group, key) partials fold associatively, so the rebuilt maps equal
    the batch aggregation over the concatenation of every ingested wave
    under ANY disjoint split.

    State rows: key "<group>:<map_key>" -> (cnt long, mx long), one row
    per distinct (group, key) per wave — bounded by the breakdown
    cardinality, never the row count. Merge: cnt = sum of deltas,
    mx = max over waves.

    Takedown contract: COUNT (and sum) map state is exactly invertible
    — :meth:`retract` appends negative cnt deltas. MIN/MAX map state is
    NOT invertible under PARTIAL retraction (a max cannot be
    un-maxed); the supported takedown is whole-group erasure (the
    GDPR user-delete case): when every row of a group is retracted its
    merged cnt reaches 0 and the group drops entirely, so the stale mx
    never surfaces. Retract waves therefore append NULL mx (max()
    ignores them on merge). Callers needing exact maxes after a
    partial delete rebuild — the same rebuild-on-delete boundary the
    bottom-k KMV documents."""

    def __init__(self, spark, workdir: str, *, state_buckets: int = 8):
        from .wave_counts import WaveCountState

        self.spark = spark
        self._st = WaveCountState(
            spark,
            workdir,
            name="mapaggstate",
            key_col="key",
            key_type="string",
            value_cols=["cnt", "mx"],
            state_buckets=state_buckets,
        )

    def reset(self) -> None:
        self._st.reset()

    def compact(self, wave: int = 0) -> None:
        self._st.compact(wave)

    def drop_state(self) -> None:
        self._st.drop()

    def ingest(self, df: DataFrame, *, wave_id: int | None = None) -> DataFrame:
        return self._fold(df, wave_id=wave_id, sign=1)

    def retract(self, df: DataFrame, *, wave_id: int | None = None) -> DataFrame:
        """Negative count deltas for previously-ingested rows (caller
        owns the only-retract-ingested contract; see the class doc for
        the whole-group-only max semantics)."""
        return self._fold(df, wave_id=wave_id, sign=-1)

    def _fold(self, df: DataFrame, *, wave_id, sign: int):
        wave = self._st.resolve_wave(wave_id)
        delta = (
            df.filter(
                F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
            )
            .groupBy("user_id", "event_type")
            .agg(
                F.count(F.lit(1)).alias("_c"),
                F.max("event_id").alias("_m"),
            )
            .select(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit(":"),
                    F.col("event_type"),
                ).alias("key"),
                (F.col("_c") * F.lit(sign)).cast("long").alias("cnt"),
                (
                    F.col("_m").cast("long")
                    if sign > 0
                    else F.lit(None).cast("long")
                ).alias("mx"),
            )
            .persist()
        )
        try:
            audit = delta.groupBy().agg(
                F.lit(wave).alias("wave"), F.sum("cnt").alias("n_increments")
            )
            pinned = self._st.pin_audit(audit, wave)
            self._st.append(delta, wave)
        finally:
            delta.unpersist()
        return pinned

    def merged(self) -> DataFrame:
        """The rebuilt (user_id, event_type, c, m) rows — identical to
        the batch (group, key) aggregation over ingested-minus-retracted
        rows (m under the whole-group takedown contract)."""
        s = self._st.read()
        return (
            s.groupBy("key")
            .agg(
                F.sum("cnt").cast("long").alias("c"),
                F.max("mx").cast("long").alias("m"),
            )
            .filter(F.col("c") > 0)
            .select(
                F.split_part(F.col("key"), F.lit(":"), F.lit(1))
                .cast("long")
                .alias("user_id"),
                F.split_part(F.col("key"), F.lit(":"), F.lit(2))
                .alias("event_type"),
                "c",
                "m",
            )
        )
