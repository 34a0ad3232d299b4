"""Mergeable fixed-bin quantile sketches — the ClickHouse
``quantileState`` / ``quantileMerge`` AggregatingMergeTree family
re-expressed with Spark built-ins (reference analog: the segment
cascades persist uniqState/maxState partials and finalize with -Merge,
/root/reference/src/3-microBatch.test.ts:14-70; this is the same
partial-state shape for ORDER STATISTICS, completing the sketch set
next to HLL (operators/hll_state.py) and bottom-k KMV
(operators/kmv.py)).

The state is an equi-width histogram over a declared [lo, hi) domain:
``bins`` long counters, bin = clamp(floor((v - lo) / width)). That
choice is deliberate against fancier summaries (t-digest, KLL):

- **merge is EXACT and associative** — elementwise vector addition, so
  partial sketches per shard/day/source fold to precisely the sketch
  of the whole (t-digest merges are order-dependent; this one is the
  AggregatingMergeTree algebra, closed under merge);
- **engine-portable determinism** — binning is one subtract / divide /
  floor / clamp and the quantile estimate one interpolation, all fixed
  IEEE double ops, so a SQL oracle replays every estimate bit-for-bit
  (the repo's value-oracle contract; a t-digest cannot be replayed
  relationally);
- the cost is a declared domain and equi-width (not equi-depth) error
  — width/2-scale, the honest trade for exact mergeability, documented
  at the call site that picks [lo, hi, bins].

Quantile rule (the classic histogram interpolation): with n total
counts, target rank r = clamp(floor(q*n) + 1, 1, n); find the first
bin b whose cumulative count reaches r; estimate
``lo + width * (b + (r - cum_before_b) / count_b)`` — linear within
the bin, exact at bin boundaries, rounded to 6 decimals for the
cross-engine hash gate.

100-TB shape: construction is two map-side-combinable hash aggs
((keys, bin) counts, then keys with a <= bins-entry map fold) — no
window, no sort, per-group state bounded at ``bins`` longs regardless
of row count. Merging partials is a groupBy fold over <= n_partials
arrays of ``bins`` longs (sketch METADATA, not data). Every estimator
below is a pure Column expression over the array state, so merged
sketches answer p50/p99 questions without re-reading raw rows."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _width(lo: float, hi: float, bins: int) -> float:
    if not (hi > lo) or bins < 1:
        raise ValueError("need hi > lo and bins >= 1")
    return (hi - lo) / bins


def hist_bin(value: Column, *, lo: float, hi: float, bins: int) -> Column:
    """The sketch's bin index for a value: clamp(floor((v - lo)/width))
    into [0, bins) — out-of-domain values land in the edge bins (their
    mass is counted, their position saturates; callers that need exact
    tails widen the domain)."""
    w = _width(lo, hi, bins)
    raw = F.floor((value.cast("double") - F.lit(float(lo))) / F.lit(w))
    return F.least(
        F.lit(bins - 1), F.greatest(F.lit(0), raw.cast("int"))
    ).cast("int")


def hist_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    *,
    lo: float,
    hi: float,
    bins: int,
    weight_col: str | None = None,
) -> DataFrame:
    """One row per key group with ``sketch`` = the bins-length count
    array (array<long>, dense — absent bins are 0). Two hash aggs,
    both with map-side partial aggregation; the second folds <= bins
    (bin, count) entries per group through a map, so no per-group state
    ever exceeds the sketch size.

    ``weight_col`` (integer weights) gives the quantilesExactWeighted
    analog: each row contributes weight units of mass to its bin, so
    estimates answer "the p-th quantile of value, weighted by w"
    (price weighted by quantity, length weighted by tokens) from the
    same merge-closed state — everything downstream (merge, estimate,
    the wave trainers) is weight-agnostic because the state is still
    just counts."""
    binned = df.select(
        *[F.col(c) for c in key_cols],
        hist_bin(F.col(value_col), lo=lo, hi=hi, bins=bins).alias("_b"),
        (
            F.col(weight_col).cast("long")
            if weight_col is not None
            else F.lit(1).cast("long")
        ).alias("_w"),
    )
    counts = binned.groupBy(*[F.col(c) for c in key_cols], F.col("_b")).agg(
        F.sum("_w").alias("_c")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(bins - 1)),
        lambda i: F.coalesce(
            F.element_at(
                F.map_from_entries(
                    F.collect_list(F.struct(F.col("_b"), F.col("_c")))
                ),
                i,
            ),
            F.lit(0).cast("long"),
        ),
    )
    return counts.groupBy(*[F.col(c) for c in key_cols]).agg(
        dense.alias("sketch")
    )


def hist_auto_domain(
    df: DataFrame, value_col: str
) -> tuple[float, float]:
    """Two-pass mode for columns with UNKNOWN or heavy-tailed range
    (r15 verdict item 5): the declared-domain contract silently
    saturates out-of-domain mass into the edge bins, which MOVES
    quantile estimates when a spike lands outside the guessed [lo, hi)
    — easy to misuse on a column nobody profiled. This pre-pass is one
    map-side-combinable min/max agg (two scalars to the driver, no
    shuffle wider than the agg), and the returned domain contains every
    value, so no edge-bin saturation is possible in the sketch pass.
    Degenerate all-equal columns widen to [lo, lo + 1) so the width
    stays positive (everything lands in bin 0 — the only honest
    answer). Raises on an empty/all-null column: there is no domain.

    The cost is the second scan — the price of not declaring a domain;
    callers that know the range keep the one-pass path. Values are
    handled as doubles end-to-end so a SQL oracle replays the domain
    and every downstream bin edge bit-for-bit."""
    import math

    row = df.agg(
        F.min(F.col(value_col).cast("double")).alias("_lo"),
        F.max(F.col(value_col).cast("double")).alias("_hi"),
    ).first()
    lo, hi = row["_lo"], row["_hi"]
    if lo is None:
        raise ValueError(
            f"hist_auto_domain: {value_col} has no non-null values"
        )
    if math.isnan(lo) or math.isnan(hi) or math.isinf(lo) or math.isinf(hi):
        # Spark's max() sorts NaN greatest, so one NaN row would set
        # hi=NaN; `not hi > lo` then silently collapsed the domain to
        # [lo, lo+1) and saturated every real value into the top bin —
        # the exact failure mode this pre-pass exists to prevent.
        # Non-finite bounds have no bin width; make the caller decide.
        raise ValueError(
            f"hist_auto_domain: {value_col} has non-finite values "
            f"(min={lo}, max={hi}) — filter NaN/Inf before sketching"
        )
    if not hi > lo:
        hi = lo + 1.0
    return float(lo), float(hi)


def log_edges(lo: float, hi: float, bins: int) -> list[float]:
    """Geometric (log-spaced) bin EDGES over [lo, hi) — the ClickHouse
    ``quantileTiming`` shape for heavy-tailed positive columns (r16
    verdict item 6): equi-width bins spend almost their whole budget on
    the tail's empty span (a 1000x spike stretches the domain so p50
    lands inside one giant bin and smears), while log bins keep
    RELATIVE error flat — every bin spans the same multiplicative
    factor.

    Returns ``bins + 1`` edges computed ONCE driver-side in Python.
    That is the portability trick: no transcendental function ever runs
    inside either engine — Spark and the SQL oracle both receive the
    same repr-exact double literals (Python float repr round-trips, so
    parsing reproduces identical IEEE bits), and binning/interpolation
    below use only comparisons and +-*/, which are IEEE-exact. Requires
    0 < lo < hi."""
    import math

    if not (0 < lo < hi) or bins < 1:
        raise ValueError("log_edges needs 0 < lo < hi and bins >= 1")
    lw = (math.log(hi) - math.log(lo)) / bins
    edges = [float(lo * math.exp(i * lw)) for i in range(bins + 1)]
    edges[0], edges[-1] = float(lo), float(hi)
    return edges


def hist_bin_edges(value: Column, *, edges: list[float]) -> Column:
    """Bin index under explicit EDGES: the count of interior edges <=
    value, which lands in [0, len(edges) - 2] with the same saturation
    contract as :func:`hist_bin` (below-domain mass in bin 0, above-
    domain in the last bin) — pure comparisons over a literal array,
    bit-portable to SQL."""
    if len(edges) < 2:
        raise ValueError("need at least 2 edges")
    interior = F.array(*[F.lit(float(e)) for e in edges[1:-1]])
    v = value.cast("double")
    return F.aggregate(
        interior,
        F.lit(0).cast("int"),
        lambda a, e: a + F.when(v >= e, 1).otherwise(0).cast("int"),
    )


def hist_sketch_edges(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    *,
    edges: list[float],
    weight_col: str | None = None,
) -> DataFrame:
    """:func:`hist_sketch` under explicit (e.g. log-spaced) edges: the
    identical two-hash-agg construction and dense array state — only
    the binning rule changes, so merge/count/estimator machinery and
    the wave trainers stay edge-agnostic (the state is still just a
    count vector)."""
    bins = len(edges) - 1
    binned = df.select(
        *[F.col(c) for c in key_cols],
        hist_bin_edges(F.col(value_col), edges=edges).alias("_b"),
        (
            F.col(weight_col).cast("long")
            if weight_col is not None
            else F.lit(1).cast("long")
        ).alias("_w"),
    )
    counts = binned.groupBy(*[F.col(c) for c in key_cols], F.col("_b")).agg(
        F.sum("_w").alias("_c")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(bins - 1)),
        lambda i: F.coalesce(
            F.element_at(
                F.map_from_entries(
                    F.collect_list(F.struct(F.col("_b"), F.col("_c")))
                ),
                i,
            ),
            F.lit(0).cast("long"),
        ),
    )
    return counts.groupBy(*[F.col(c) for c in key_cols]).agg(
        dense.alias("sketch")
    )


def hist_quantile_edges(
    sketch: Column, q: Column | float, *, edges: list[float]
) -> Column:
    """:func:`hist_quantile` under explicit edges: the same rank walk,
    but the estimate interpolates linearly BETWEEN the located bin's
    own edges — ``e_b + (e_{b+1} - e_b) * frac`` — so log-spaced bins
    give flat relative error without either engine computing a log:
    the edges arrive as literals (see :func:`log_edges`)."""
    bins = len(edges) - 1
    qc = F.lit(float(q)) if not isinstance(q, Column) else q
    n = hist_count(sketch)
    r = F.least(
        F.greatest(
            F.floor(qc * n.cast("double")).cast("long") + 1,
            F.lit(1).cast("long"),
        ),
        n,
    )
    pairs = F.zip_with(
        sketch,
        F.sequence(F.lit(0), F.lit(bins - 1)),
        lambda c, i: F.struct(c.cast("long").alias("c"), i.alias("i")),
    )
    acc0 = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.lit(-1).cast("int").alias("bin"),
        F.lit(0).cast("long").alias("before"),
        F.lit(0).cast("long").alias("cnt"),
    )

    def step(acc, p):
        hit = (acc["bin"] < 0) & (acc["cum"] + p["c"] >= r) & (p["c"] > 0)
        return F.struct(
            (acc["cum"] + p["c"]).alias("cum"),
            F.when(hit, p["i"]).otherwise(acc["bin"]).alias("bin"),
            F.when(hit, acc["cum"]).otherwise(acc["before"]).alias("before"),
            F.when(hit, p["c"]).otherwise(acc["cnt"]).alias("cnt"),
        )

    walk = F.aggregate(pairs, acc0, step)
    frac = (r - walk["before"]).cast("double") / walk["cnt"].cast("double")
    earr = F.array(*[F.lit(float(e)) for e in edges])
    e_lo = F.element_at(earr, walk["bin"] + 1)
    e_hi = F.element_at(earr, walk["bin"] + 2)
    est = e_lo + (e_hi - e_lo) * frac
    return F.when(n > 0, F.round(est, 6))


def hist_merge(a: Column, b: Column) -> Column:
    """Merge two sketches: elementwise sum. Exact and associative —
    the sketch of a union IS the sum of the sketches."""
    return F.zip_with(a, b, lambda x, y: x + y)


def hist_merge_agg(sketch_col: str | Column) -> Column:
    """Aggregate form for groupBy folds over partial sketches:
    collect_list gathers <= n_partials arrays (bounded state — sketch
    metadata, not data), then one elementwise fold. Order-insensitive
    because vector addition commutes, so collect_list's
    nondeterministic ordering is harmless."""
    c = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    lst = F.collect_list(c)
    zeros = F.transform(
        F.element_at(lst, 1), lambda x: F.lit(0).cast("long")
    )
    return F.aggregate(lst, zeros, lambda acc, s: hist_merge(acc, s))


def hist_count(sketch: Column) -> Column:
    """Total count in the sketch (exact — every row lands in a bin)."""
    return F.aggregate(
        sketch, F.lit(0).cast("long"), lambda a, x: a + x
    )


def hist_quantile(
    sketch: Column, q: Column | float, *, lo: float, hi: float, bins: int
) -> Column:
    """The module-docstring interpolation as one expression walk over
    the array state: rank r = clamp(floor(q*n)+1, 1, n), locate the
    first bin whose cumulative reaches r, interpolate linearly inside
    it, round(6) for the cross-engine gate. NULL on an empty sketch
    (no rows — there is no quantile to estimate)."""
    w = _width(lo, hi, bins)
    qc = F.lit(float(q)) if not isinstance(q, Column) else q
    n = hist_count(sketch)
    r = F.least(
        F.greatest(
            F.floor(qc * n.cast("double")).cast("long") + 1, F.lit(1).cast("long")
        ),
        n,
    )
    pairs = F.zip_with(
        sketch,
        F.sequence(F.lit(0), F.lit(bins - 1)),
        lambda c, i: F.struct(c.cast("long").alias("c"), i.alias("i")),
    )
    acc0 = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.lit(-1).cast("int").alias("bin"),
        F.lit(0).cast("long").alias("before"),
        F.lit(0).cast("long").alias("cnt"),
    )

    def step(acc, p):
        hit = (acc["bin"] < 0) & (acc["cum"] + p["c"] >= r) & (p["c"] > 0)
        return F.struct(
            (acc["cum"] + p["c"]).alias("cum"),
            F.when(hit, p["i"]).otherwise(acc["bin"]).alias("bin"),
            F.when(hit, acc["cum"]).otherwise(acc["before"]).alias("before"),
            F.when(hit, p["c"]).otherwise(acc["cnt"]).alias("cnt"),
        )

    walk = F.aggregate(pairs, acc0, step)
    frac = (r - walk["before"]).cast("double") / walk["cnt"].cast("double")
    est = F.lit(float(lo)) + F.lit(w) * (
        walk["bin"].cast("double") + frac
    )
    return F.when(walk["bin"] >= 0, F.round(est, 6))


class IncrementalQuantileHist:
    """Wave-state twin of the quantile-sketch queries on the shared
    wave chassis (operators/wave_counts.WaveCountState) — the same
    nightly-refresh pattern as the TF-IDF / bigram / KMV trainers
    (plans/corpus_stats_twins.py): histogram counts are ASSOCIATIVE
    integers, so per-wave (group, bin) deltas sum to exactly the batch
    histogram under ANY disjoint wave split, and the rebuilt estimates
    are bit-identical to the batch query's — the twins share its
    DuckDB oracle. State rows: key "<group>:<bin zero-padded>" -> c
    (the group key never contains ':' for the declared callers —
    asserted at ingest; zero-padding keeps a crash-replayed wave's
    rows byte-identical so the chassis's max-collapse absorbs them).
    State size: <= n_groups x bins longs per wave — KB-scale metadata
    regardless of row count. Retraction note: counts are invertible
    (negative deltas would subtract exactly), unlike the bottom-k
    sketch next door."""

    def __init__(
        self,
        spark,
        workdir: str,
        *,
        group_col: str,
        value_col: str,
        lo: float,
        hi: float,
        bins: int,
        state_buckets: int = 8,
    ):
        from .wave_counts import WaveCountState

        self.spark = spark
        self.group_col, self.value_col = group_col, value_col
        self.lo, self.hi, self.bins = lo, hi, bins
        self._st = WaveCountState(
            spark,
            workdir,
            name="qhist",
            key_col="key",
            key_type="string",
            value_cols=["c"],
            state_buckets=state_buckets,
        )

    def reset(self) -> None:
        self._st.reset()

    def compact(self, wave: int = 0) -> None:
        self._st.compact(wave)

    def ingest(self, df: DataFrame, *, wave_id: int | None = None) -> DataFrame:
        """Fold one wave's (group, bin) counts into state; returns the
        pinned audit row (wave, n_rows)."""
        return self._fold(df, wave_id=wave_id, sign=1)

    def retract(self, df: DataFrame, *, wave_id: int | None = None) -> DataFrame:
        """The TAKEDOWN lane: fold one wave of NEGATIVE (group, bin)
        deltas for rows previously ingested — count state is exactly
        invertible (unlike the bottom-k sketch next door, whose
        takedown path is reset + re-ingest), so after the retraction
        the rebuilt sketch equals the batch sketch over the surviving
        rows, bit-for-bit. Caller contract: retract only rows that
        were ingested (over-retraction would drive cells negative;
        score() would then see phantom negative mass — the same
        caller-owns-idempotency contract as every delta lane)."""
        return self._fold(df, wave_id=wave_id, sign=-1)

    def _fold(
        self, df: DataFrame, *, wave_id: int | None, sign: int
    ) -> DataFrame:
        wave = self._st.resolve_wave(wave_id)
        ok = F.assert_true(
            ~F.col(self.group_col).cast("string").contains(":"),
            F.lit(
                f"IncrementalQuantileHist: {self.group_col} value contains "
                "the ':' key separator"
            ),
        )
        delta = (
            df.select(
                F.when(ok.isNull(), F.col(self.group_col).cast("string")).alias(
                    "_g"
                ),
                hist_bin(
                    F.col(self.value_col), lo=self.lo, hi=self.hi,
                    bins=self.bins,
                ).alias("_b"),
            )
            .groupBy("_g", "_b")
            .agg((F.count(F.lit(1)) * F.lit(sign)).cast("long").alias("c"))
            .select(
                F.concat(
                    F.col("_g"),
                    F.lit(":"),
                    F.lpad(F.col("_b").cast("string"), 4, "0"),
                ).alias("key"),
                "c",
            )
            .persist()
        )
        try:
            audit = delta.groupBy().agg(
                F.lit(wave).alias("wave"),
                F.sum("c").alias("n_rows"),
            )
            pinned = self._st.pin_audit(audit, wave)
            self._st.append(delta, wave)
        finally:
            delta.unpersist()
        return pinned

    def sketches(self) -> DataFrame:
        """One row per group with the dense rebuilt sketch — identical
        to hist_sketch over the concatenation of every wave."""
        s = self._st.read()
        counts = (
            s.groupBy("key")
            .agg(F.sum("c").alias("_c"))
            .select(
                F.split_part(F.col("key"), F.lit(":"), F.lit(1)).alias(
                    self.group_col
                ),
                F.split_part(F.col("key"), F.lit(":"), F.lit(2))
                .cast("int")
                .alias("_b"),
                "_c",
            )
        )
        dense = F.transform(
            F.sequence(F.lit(0), F.lit(self.bins - 1)),
            lambda i: F.coalesce(
                F.element_at(
                    F.map_from_entries(
                        F.collect_list(F.struct(F.col("_b"), F.col("_c")))
                    ),
                    i,
                ),
                F.lit(0).cast("long"),
            ),
        )
        return counts.groupBy(self.group_col).agg(dense.alias("sketch"))

    def score(self, df: DataFrame | None = None) -> DataFrame:
        """(n_orders, p50, p90, p99) off the MERGED rebuilt partials —
        the batch order_value_quantiles_merged shape (df accepted and
        ignored: the trainer-protocol signature the wave gate
        expects)."""
        merged = self.sketches().groupBy().agg(
            hist_merge_agg("sketch").alias("m")
        )
        q = lambda p: hist_quantile(
            F.col("m"), p, lo=self.lo, hi=self.hi, bins=self.bins
        )
        return merged.select(
            hist_count(F.col("m")).alias("n_orders"),
            q(0.5).alias("p50"),
            q(0.9).alias("p90"),
            q(0.99).alias("p99"),
        )
