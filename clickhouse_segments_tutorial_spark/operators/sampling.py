"""Deterministic content-hash sampling for training-data pipelines.

`df.sample()` is seeded per-partition RNG: the kept set changes whenever
the partitioning does (repartition, AQE, a new file split), which makes
pipeline runs irreproducible and train/test splits leak across reruns.
These operators instead key every decision on a CONTENT hash of a stable
id column: a row's fate depends only on its key, so

- reruns, repartitions, and engine changes keep the identical sample;
- the same key always lands in the same split (no train/test leakage
  when the corpus is re-ingested or incrementally extended);
- the decision is a pure JVM expression on the scan — no shuffle, no RNG
  state, fully pushdown-friendly;
- an oracle can re-derive the exact kept set in any engine with md5.

Mechanics: the first 8 hex chars of md5(key) are a uniform draw from
[0, 16^8); comparing that FIXED-LENGTH LOWERCASE hex string
lexicographically against a threshold literal is identical to comparing
the numbers — no hex-to-int conversion, so the predicate is one md5 +
one string compare in every engine (DuckDB included, which has no native
hex-to-bigint cast).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_BUCKETS = 1 << 32  # 8 hex chars


def _threshold_hex(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        # 'g' sorts after every hex char, so every 8-hex-char draw compares
        # < 'g': fraction 1.0 keeps ALL rows. (Clamping to 'ffffffff' with a
        # strict < would silently drop a key whose draw is exactly
        # 0xffffffff — a 2^-32 hole at full fraction.)
        return "g"
    return format(int(fraction * _BUCKETS), "08x")


def hash_draw(key: str | Column) -> Column:
    """The row's uniform draw: first 8 md5 hex chars of the key (as a
    string — see module docstring for why it is never converted)."""
    col = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(col.cast("string")), 1, 8)


def hash_sample(df: DataFrame, fraction: float, key_col: str) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, decided per key."""
    return df.filter(hash_draw(key_col) < _threshold_hex(fraction))


def stratified_sample(
    df: DataFrame, fractions: dict[str, float], strata_col: str, key_col: str
) -> DataFrame:
    """Per-stratum deterministic sampling (the `sampleBy` analog).

    Strata absent from ``fractions`` are dropped (fraction 0), matching
    `DataFrame.sampleBy`. The per-stratum threshold is folded into one
    CASE expression — still a pure scan-side predicate."""
    thresh = None
    for stratum, fraction in fractions.items():
        lit = F.lit(_threshold_hex(fraction))
        thresh = (
            F.when(F.col(strata_col) == stratum, lit)
            if thresh is None
            else thresh.when(F.col(strata_col) == stratum, lit)
        )
    if thresh is None:
        raise ValueError("fractions must name at least one stratum")
    return df.filter(hash_draw(key_col) < thresh.otherwise(F.lit("00000000")))


def train_test_split(
    df: DataFrame, test_fraction: float, key_col: str, split_col: str = "split"
) -> DataFrame:
    """Add a deterministic 'train'/'test' split column keyed on content.

    The same key lands in the same split on every run and on every engine
    — re-ingesting or extending the corpus can never leak a held-out
    document into training."""
    return df.withColumn(
        split_col,
        F.when(
            hash_draw(key_col) < _threshold_hex(test_fraction), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def mix_corpus(
    df: DataFrame,
    weights: dict[str, float],
    *,
    strata_col: str,
    key_col: str,
    total_rows: int | None = None,
    max_rate: float = 20.0,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic corpus mixture: resample strata (domains, languages,
    sources) to TARGET proportions, up- or down-sampling each stratum as
    needed — the Pile/LLaMA-style data-mixing step of a training pipeline.

    A stratum with target share above its natural share is UPSAMPLED by
    repetition: each row appears floor(rate) times (full epochs, stamped
    0..k in ``epoch_col``) plus one more with probability frac(rate),
    decided by the content-hash draw of (key, stratum) — so the output is
    partitioning-invariant and engine-reproducible like every sampler in
    this module. Strata absent from ``weights`` are dropped.

    Scale shape: ONE tiny aggregation (stratum counts, collected — #strata
    rows) to derive per-stratum rates, then a map-only
    sequence+explode over the scan. No corpus shuffle; the output is
    ~``total_rows`` rows (expectation, per-stratum deviation O(sqrt n)).

    ``max_rate`` guards pathological upsampling (a 1e-6-share stratum
    asked to be 50% of the mix would replicate rows millions of times).
    """
    if not weights:
        raise ValueError("weights must name at least one stratum")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("weights must be non-negative and sum > 0")
    counts = {
        r["_s"]: r["_n"]
        for r in df.groupBy(F.col(strata_col).alias("_s"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    }
    total = total_rows if total_rows is not None else sum(
        counts.get(s, 0) for s in weights
    )
    wsum = sum(weights.values())
    rate_expr = None
    for stratum, w in weights.items():
        n_s = counts.get(stratum, 0)
        if n_s == 0:
            continue
        rate = (total * w / wsum) / n_s
        if rate > max_rate:
            raise ValueError(
                f"stratum {stratum!r} needs rate {rate:.1f}x (> max_rate "
                f"{max_rate}); its natural share is too small for the "
                f"requested mix — raise max_rate only if the repetition "
                f"is intended"
            )
        lit = F.lit(float(rate))
        rate_expr = (
            F.when(F.col(strata_col) == stratum, lit)
            if rate_expr is None
            else rate_expr.when(F.col(strata_col) == stratum, lit)
        )
    if rate_expr is None:
        raise ValueError("no stratum in weights exists in the data")
    rate = rate_expr.otherwise(F.lit(0.0))
    n_full = F.floor(rate).cast("int")
    # fractional epoch: drawn on (key, stratum) so the SAME key reused
    # across strata draws independently, and frac-kept rows are a
    # deterministic subset — identical across engines and partitionings
    frac = rate - F.floor(rate)
    frac_hex = F.lpad(
        F.lower(F.hex(F.floor(frac * F.lit(float(1 << 32))).cast("long"))), 8, "0"
    )
    extra = F.when(
        hash_draw(F.concat_ws(":", F.col(key_col).cast("string"), F.col(strata_col)))
        < frac_hex,
        1,
    ).otherwise(0)
    n_copies = n_full + extra
    return (
        df.withColumn("_nc", n_copies)
        .filter(F.col("_nc") >= 1)
        .withColumn(epoch_col, F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)))
        .drop("_nc")
    )


def quota_by_group(
    df: DataFrame,
    *,
    group_col: str,
    order_col: str,
    weight_col: str | Column,
    budget: float,
) -> DataFrame:
    """Per-group weighted quota cap: keep each group's prefix (in
    ``order_col`` order) while the running total of ``weight_col`` stays
    within ``budget`` (inclusive — the row that lands exactly on the
    budget is kept; the first row that would exceed it, and everything
    after, is dropped).

    ``weight_col`` MUST be non-negative: the cum_weight <= budget filter
    implements the prefix semantics only for monotone running totals — a
    negative weight would re-admit rows after a violation (r9 ADVICE).
    The streaming twin (streaming/stream_quota.py) shares this contract;
    token/byte counts, the intended weights, satisfy it by construction.

    The per-domain token-budget sampler of a web-corpus mixture (cap any
    one domain's contribution so head domains can't dominate the mix) —
    the quota analog of rate-based mix_corpus.

    Scale (100 TB): one running-sum window PARTITIONED BY the group — no
    global window, so parallelism is #groups and per-task state is one
    accumulator. Domains are numerous and individually small relative to
    the corpus; a pathological mega-group serializes only its own
    partition (same caveat as any per-entity ordered scan), which is
    exactly the skew AQE's post-shuffle coalescing leaves alone — cap
    upstream with a coarse filter if one group is a large fraction of
    the input. Appends ``cum_weight`` (the inclusive running total) for
    downstream audit."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    cum = F.sum(wcol).over(w)
    return df.withColumn("cum_weight", cum).filter(F.col("cum_weight") <= budget)


def deterministic_shuffle(
    df: DataFrame,
    *,
    key_cols: list[str],
    n_buckets: int = 64,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global training-order shuffle WITHOUT a global sort:
    every row draws a pseudo-random md5 key from (salt, key_cols), lands
    in ``bucket`` = first-32-hash-bits mod n_buckets, and gets a dense
    ``pos`` (1-based) within its bucket ordered by (draw, key_cols).
    Reading buckets 0..n-1, each in pos order, visits the corpus in a
    reproducible pseudo-random permutation — the standard sharded-shuffle
    a training dataloader wants (shard = bucket file, shuffled within).

    Scale (100 TB): the only shuffle is the hash repartition implied by
    the per-bucket window — parallelism n_buckets, each task sorting
    corpus/n_buckets rows locally (the draw is uniform so buckets
    balance). A global row_number would instead serialize the corpus
    through one partition.

    ``n_buckets`` IS the parallelism contract (r9 verdict): it caps
    concurrent tasks AND sets the per-task sort to corpus/n_buckets
    rows, so it must GROW with the corpus — size it with
    :func:`shuffle_buckets_for` (rows/target_rows_per_bucket) rather
    than pinning a constant. NOTE the output coupling: ``pos`` is a
    rank WITHIN its bucket, so changing n_buckets changes (bucket, pos)
    for every row — a downstream consumer (or value oracle) is bound to
    one bucket count per corpus snapshot. Measured at sf0.1: 64 vs 1024
    buckets within noise on wall (BASELINE.md r10 row), confirming the
    flat scaling exponent holds as buckets scale with data.
    Partitioning-invariant and engine-portable: md5 draw, no rand().
    """
    draw = F.md5(
        F.concat_ws(":", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])
    )
    bucket = F.pmod(
        F.conv(F.substring(draw, 1, 8), 16, 10).cast("long"), F.lit(n_buckets)
    ).cast("int")
    from pyspark.sql import Window

    w = Window.partitionBy("bucket").orderBy("draw", *key_cols)
    return (
        df.withColumn("draw", draw)
        .withColumn("bucket", bucket)
        .withColumn("pos", F.row_number().over(w))
    )


def shuffle_buckets_for(
    n_rows: int, *, target_rows_per_bucket: int = 4_000_000, minimum: int = 64
) -> int:
    """Bucket count for :func:`deterministic_shuffle`, scaled with the
    corpus: ceil(n_rows / target_rows_per_bucket) rounded up to a power
    of two (stable bucket boundaries under doubling), floored at
    ``minimum``. The default target keeps a bucket's (draw, keys) sort
    comfortably in one executor's memory at ~100-byte rows (~400 MB);
    a 1e11-chunk corpus gets 32768 buckets. Remember pos is per-bucket:
    re-deriving with a grown corpus yields a NEW permutation keyspace
    (see deterministic_shuffle's coupling note)."""
    if n_rows < 0:
        raise ValueError("n_rows must be >= 0")
    need = max(minimum, -(-n_rows // target_rows_per_bucket))
    return 1 << (need - 1).bit_length()


def temperature_weights(
    df: DataFrame,
    *,
    strata_col: str,
    alpha: float = 0.5,
    quantum: int = 10**9,
    weight_col: str | None = None,
) -> dict[str, int]:
    """Temperature-based mixture weights: target share of stratum l
    proportional to (natural share)^alpha — the multilingual rebalancing
    rule of XLM-R / mT5 (alpha < 1 flattens the distribution, upsampling
    low-resource languages without letting them dominate). Feed the
    result straight to :func:`mix_corpus`.

    Weights are INTEGER-quantized (floor(share^alpha * quantum + 0.5)) so
    the weight sum — and therefore every derived rate — is exact integer
    math with one final correctly-rounded division, identical in any
    engine: a float wsum would depend on summation order and an ulp
    difference flips hash-draw boundaries. At alpha=0.5 the power is
    computed with sqrt (IEEE-exact in every libm, hence oracle-portable);
    other alphas go through pow, whose last-ulp behavior is
    libm-specific — fine for production, but a SQL value-oracle should
    pin alpha=0.5. One bounded collect (#strata rows), same as
    mix_corpus's count collection.

    Oracle-portability bound on ``quantum``: downstream rate math forms
    the exact integer product total*weight before its one rounded
    division (mix_corpus), but a SQL oracle computing the same product
    in DOUBLE rounds it once it exceeds 2^53 — with quantum=1e9 that is
    ~9e6 rows (r9 ADVICE). Value-oracle comparisons beyond that corpus
    size need either a smaller quantum or an exact wide-integer product
    on the oracle side; production runs are unaffected (a 1-ulp rate
    difference moves at most one hash-draw boundary).

    The share numerator is ``count(*)`` by default; pass ``weight_col``
    to budget in a measured per-row unit instead — e.g. learned-subword
    token counts, where ``sum(weight_col)`` replaces the row count (the
    BPE mixture twin). This keeps the quantization formula at its ONE
    definition site whatever the budget unit."""
    import math

    n_expr = (
        F.count(F.lit(1))
        if weight_col is None
        else F.coalesce(F.sum(weight_col), F.lit(0)).cast("long")
    )
    counts = {
        r["_s"]: int(r["_n"])
        for r in df.groupBy(F.col(strata_col).alias("_s"))
        .agg(n_expr.alias("_n"))
        .collect()
    }
    total = sum(counts.values())
    if total == 0:
        raise ValueError("empty input")

    def q(n: int) -> int:
        share = n / total
        val = math.sqrt(share) if alpha == 0.5 else share**alpha
        return int(math.floor(val * quantum + 0.5))

    return {s: q(n) for s, n in counts.items()}
