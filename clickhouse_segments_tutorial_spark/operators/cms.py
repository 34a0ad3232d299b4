"""Count-min sketch — mergeable FREQUENCY estimation, the third leg of
the sketch family next to distinct counting (HLL operators/hll_state.py,
bottom-k KMV operators/kmv.py) and order statistics
(operators/quantile_sketch.py). Reference analog: the segment cascades
threshold per-user event COUNTS (/root/reference/src/1-naive.test.ts:
72-95); a CMS answers "how often did X occur" from fixed-size state
when the key universe is too large to count exactly — the
heavy-hitter / topK-style partial the same engines persist in
AggregatingMergeTree tables (Cormode & Muthukrishnan 2005, "An
improved data stream summary: the count-min sketch").

State: ``d`` hash rows x ``w`` counters, held RELATIONALLY as sparse
(row, col, c) long rows — at the defaults that is <= 2048 rows of
metadata, and the sparse frame is the Spark-native shape: construction
is one map-side-combinable hash agg, merge is union + re-agg
(counters are associative sums — the AggregatingMergeTree algebra),
and point estimates are a broadcast join + min, all spill-safe at any
input size. No driver-side arrays, no UDFs.

Estimator: est(x) = min_i counter[i][h_i(x)] — an UPPER bound on the
true count, always (every occurrence of x increments all d of its
counters; collisions only ADD). Error: overcount <= e/w * N with
probability 1 - e^-d over the hash draw — w trades memory for
precision, d failure probability. The hash is the repo's engine-
portable 60-bit md5 (dedup.md5_hash60) over "<row>:<item>", reduced
mod w, so a SQL oracle replays construction and estimates
bit-for-bit; the ':' separator cannot alias because the row prefix is
a bare integer.

100-TB shape: the input pass is one groupBy over (row, col) — d
output rows per input row map-side, collapsing to d*w counters; no
shuffle grows with the key universe (the exact-count alternative
shuffles every distinct key). Probing P items touches P*d counter
rows through a broadcast of the d*w-row sketch."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import md5_hash60


def cms_col(item: Column, row: int | Column, *, w: int) -> Column:
    """Counter column index of ``item`` in hash row ``row``:
    md5_hash60("<row>:<item>") mod w — non-negative, engine-portable."""
    r = F.lit(row) if not isinstance(row, Column) else row
    return F.pmod(
        md5_hash60(
            F.concat(r.cast("string"), F.lit(":"), item.cast("string"))
        ),
        F.lit(w),
    ).cast("int")


def cms_sketch(
    df: DataFrame, item_col: str, *, d: int = 4, w: int = 512
) -> DataFrame:
    """Build the sketch over every row of ``df`` (multiset semantics —
    duplicates count): sparse (row, col, c) counters, absent cells 0.
    One explode into the d hash rows, one hash agg."""
    if d < 1 or w < 1:
        raise ValueError("need d >= 1 hash rows and w >= 1 counters")
    rows = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row"),
        F.col(item_col).alias("_it"),
    ).select("row", cms_col(F.col("_it"), F.col("row"), w=w).alias("col"))
    return rows.groupBy("row", "col").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge partial sketches built with the SAME (d, w): union +
    re-sum. Exact and associative — the sketch of a union of multisets
    IS the cellwise sum (caller owns parameter agreement; mismatched w
    would silently mix hash spaces)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(
        F.sum("c").cast("long").alias("c")
    )


class IncrementalCms:
    """Wave-state twin of the CMS on the shared wave chassis
    (operators/wave_counts.WaveCountState) — counters are associative
    integers, so per-wave cell deltas sum to exactly the batch sketch
    under ANY disjoint wave split, and retraction (negative deltas) is
    an exact inverse, same as the quantile-histogram trainer
    (operators/quantile_sketch.IncrementalQuantileHist). State rows:
    key "<row>:<col>" -> c, <= d*w rows per wave — KB-scale metadata."""

    def __init__(
        self, spark, workdir: str, *, d: int = 4, w: int = 512,
        state_buckets: int = 4,
    ):
        from .wave_counts import WaveCountState

        self.spark, self.d, self.w = spark, d, w
        self._st = WaveCountState(
            spark,
            workdir,
            name="cmsstate",
            key_col="key",
            key_type="string",
            value_cols=["c"],
            state_buckets=state_buckets,
        )

    def reset(self) -> None:
        self._st.reset()

    def compact(self, wave: int = 0) -> None:
        self._st.compact(wave)

    def ingest(self, df: DataFrame, *, wave_id: int | None = None,
               item_col: str = "user_id") -> DataFrame:
        return self._fold(df, wave_id=wave_id, item_col=item_col, sign=1)

    def retract(self, df: DataFrame, *, wave_id: int | None = None,
                item_col: str = "user_id") -> DataFrame:
        """Takedown lane: negative cell deltas for rows previously
        ingested (caller owns the only-retract-ingested contract, as
        in every delta lane)."""
        return self._fold(df, wave_id=wave_id, item_col=item_col, sign=-1)

    def _fold(self, df: DataFrame, *, wave_id, item_col: str, sign: int):
        wave = self._st.resolve_wave(wave_id)
        delta = (
            cms_sketch(df, item_col, d=self.d, w=self.w)
            .select(
                F.concat(
                    F.lpad(F.col("row").cast("string"), 2, "0"),
                    F.lit(":"),
                    F.lpad(F.col("col").cast("string"), 6, "0"),
                ).alias("key"),
                (F.col("c") * F.lit(sign)).cast("long").alias("c"),
            )
            .persist()
        )
        try:
            audit = delta.groupBy().agg(
                F.lit(wave).alias("wave"), F.sum("c").alias("n_increments")
            )
            pinned = self._st.pin_audit(audit, wave)
            self._st.append(delta, wave)
        finally:
            delta.unpersist()
        return pinned

    def sketch(self) -> DataFrame:
        """The rebuilt (row, col, c) counter table — identical to
        cms_sketch over the concatenation of every ingested wave minus
        retractions. Zero cells are dropped (the sparse contract)."""
        s = self._st.read()
        return (
            s.groupBy("key")
            .agg(F.sum("c").cast("long").alias("c"))
            .filter(F.col("c") != 0)
            .select(
                F.split_part(F.col("key"), F.lit(":"), F.lit(1))
                .cast("int")
                .alias("row"),
                F.split_part(F.col("key"), F.lit(":"), F.lit(2))
                .cast("int")
                .alias("col"),
                "c",
            )
        )

    def score(self, df: DataFrame, *, item_col: str = "user_id") -> DataFrame:
        """Top-20 exact heavy items of ``df`` probed against the
        rebuilt counters — the registered queries' shape (the exact
        counts are the harness; the sketch is the product)."""
        top = (
            df.groupBy(item_col)
            .agg(F.count(F.lit(1)).alias("n_events"))
            .orderBy(F.desc("n_events"), F.asc(item_col))
            .limit(20)
        )
        return cms_estimate(self.sketch(), top, item_col, d=self.d, w=self.w)


def cms_heavy_hitters(
    df: DataFrame,
    item_col: str,
    *,
    threshold: int,
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """EXACT heavy hitters through the sketch: every item occurring
    >= ``threshold`` times, with its exact count — correct BECAUSE the
    CMS estimate is an upper bound (an item's estimate can only
    overcount, so the candidate set {est >= threshold} provably
    contains every true heavy hitter; the exact verify pass then
    removes the false positives). The classic two-phase pattern:

    1. one sketch pass (bounded d*w state, no shuffle grows with the
       key universe) + one per-key probe of the distinct items;
    2. the exact count runs ONLY over candidate rows (broadcast
       semi-join — candidates are heavy-hitter-scale, a tiny fraction
       of the key universe at any real threshold), so the full-universe
       groupBy an exact-only plan would shuffle never happens.

    Returns (item, n bigint) for the true heavy hitters."""
    sketch = cms_sketch(df, item_col, d=d, w=w)
    cand = cms_estimate(
        sketch, df.select(item_col).distinct(), item_col, d=d, w=w
    ).filter(F.col("cms_est") >= threshold)
    return (
        df.join(F.broadcast(cand.select(item_col)), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    *,
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """Point estimates for every row of ``items``: ``items`` columns
    plus ``cms_est`` = min over the d hash rows of the matching
    counter (absent counter = 0 — the item was never seen in that
    row). The sketch side is broadcast (d*w counter rows by
    construction); the min folds per input row, so cost is linear in
    the probe set."""
    probes = items.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row"),
    ).withColumn("col", cms_col(F.col(item_col), F.col("row"), w=w))
    joined = probes.join(F.broadcast(sketch), ["row", "col"], "left")
    return (
        joined.groupBy(*items.columns)
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0).cast("long"))).alias(
                "cms_est"
            )
        )
    )
