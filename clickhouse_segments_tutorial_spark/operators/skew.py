"""Skew mitigation: hot-key detection, salted replicate joins, and
salt-partitioned distinct counts.

At 100 TB the failure mode of a shuffle join or distinct aggregation is
never the average key — it's the one user/domain/document id holding 1%
of the corpus, which lands every one of its rows in a single reduce task
(straggler at best, executor OOM at worst). Spark's own mitigations cover
part of the space:

- map-side partial aggregation makes algebraic aggs (sum/count/min/max)
  skew-proof already — no salting needed there;
- AQE skew-join splits oversized SORT-MERGE partitions at runtime
  (enabled in session.py), but it cannot split a key that must feed a
  single build-side hash bucket, and it never helps count(DISTINCT x)
  where the distinct VALUES of one key have to meet in one task.

These operators cover the remainder, with the classic salting plays:

- :func:`sampled_hot_keys` — find the keys worth special-casing from a
  deterministic content-hash sample (never a full count over 100 TB).
- :func:`replicate_skew_join` — split each hot key's big-side rows across
  ``n_salts`` sub-keys and replicate the small side's matching rows once
  per salt: the hot key's join work spreads over ``n_salts`` tasks while
  cold keys pay nothing (salt 0, one replica). Result set is provably
  identical to the plain join — every big-side row still meets exactly
  one copy of each matching small-side row.
- :func:`salted_count_distinct` — two-phase exact distinct count:
  partition each key's VALUE space into ``n_salts`` disjoint hash buckets
  (bucket counts are disjoint, so they SUM exactly), count within
  (key, bucket), then sum per key. The hot key's distinct set is built by
  ``n_salts`` tasks instead of one.

The reference never needs these (ClickHouse tutorial scale), but any
100 TB deployment of the same queries does; SURVEY.md §2.5 scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .sampling import hash_draw


def sampled_hot_keys(
    df: DataFrame,
    key_col: str,
    *,
    sample_fraction: float = 0.01,
    min_share: float = 0.001,
    max_keys: int = 1000,
) -> list:
    """Keys whose sampled row share exceeds ``min_share``, heaviest first.

    Uses :func:`~.sampling.hash_draw` content-hash sampling (deterministic
    across reruns/repartitions — `df.sample`'s per-partition RNG is not),
    so the detected hot set is stable run to run. A key with true share s
    appears in a fraction-f sample ~s*f*N times; with the default 1%
    sample over 1e10 rows a 0.1%-share key still yields ~1e5 sampled rows,
    so detection is reliable exactly for the keys large enough to matter.
    Returns at most ``max_keys`` key VALUES (a driver-side list — bounded
    by construction, this is metadata not data).
    """
    if not 0.0 < sample_fraction <= 1.0:
        raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
    sample = df if sample_fraction >= 1.0 else df.filter(
        hash_draw(F.col(key_col)) < format(int(sample_fraction * (1 << 32)), "08x")
    )
    counts = sample.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
    total = counts.agg(F.sum("_n").alias("_t")).first()["_t"]
    if not total:
        return []
    hot = (
        counts.filter(F.col("_n") >= F.lit(min_share * total))
        .orderBy(F.col("_n").desc(), F.col(key_col))
        .limit(max_keys)
        .collect()
    )
    return [r[key_col] for r in hot]


def _salt_expr(key: Column, hot: list, n_salts: int, source: Column) -> Column:
    """Big-side salt: spread hot keys over [0, n_salts), cold keys -> 0."""
    return F.when(
        key.isin(hot), F.pmod(F.xxhash64(source), F.lit(n_salts)).cast("int")
    ).otherwise(F.lit(0))


def replicate_skew_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    *,
    how: str = "inner",
    n_salts: int = 8,
    hot_keys: list | None = None,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Join ``big`` (skewed side) to ``small`` with hot-key salting.

    ``big``'s hot-key rows get a deterministic salt in [0, n_salts);
    ``small``'s hot-key rows are replicated once per salt (cold keys once,
    salt 0); the join runs on (keys..., salt). Each big row matches
    exactly one replica of each matching small row, so the output is
    row-for-row the plain join — only the shuffle layout changes: the hot
    key occupies ``n_salts`` reduce tasks instead of one, and the extra
    shuffle volume is ``(n_salts - 1) x |small's hot rows|``, which is
    tiny by the premise that ``small`` is the dimension side.

    ``how`` may be ``inner`` or ``left`` (left rows keep their single
    salt, so unmatched rows surface exactly once). ``right``/``full``
    would surface one unmatched row PER REPLICA and are rejected.

    ``salt_source`` picks the column(s) hashed into the salt (default:
    the first join key itself is wrong — constant per key! — so the
    default hashes ALL of ``big``'s non-key columns, giving near-uniform
    spread; pass an id column explicitly when you have one).

    ``hot_keys`` defaults to :func:`sampled_hot_keys` on the big side.
    When the list comes back empty the plain join is returned untouched —
    zero overhead on unskewed data.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(
            f"replicate_skew_join supports how='inner'|'left', got {how!r}: "
            "right/full would emit one unmatched row per salt replica"
        )
    if n_salts < 2:
        raise ValueError(f"n_salts must be >= 2, got {n_salts}")
    if hot_keys is None:
        hot_keys = sampled_hot_keys(big, keys[0])
    if not hot_keys:
        return big.join(small, keys, how)

    if salt_source is None:
        non_key = [c for c in big.columns if c not in keys]
        source = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in non_key]) \
            if non_key else F.lit("")
    else:
        source = F.col(salt_source) if isinstance(salt_source, str) else salt_source

    key0 = F.col(keys[0])
    salted_big = big.withColumn("_salt", _salt_expr(key0, hot_keys, n_salts, source))
    salted_small = small.withColumn(
        "_salt",
        F.explode(
            F.when(
                F.col(keys[0]).isin(hot_keys),
                F.sequence(F.lit(0), F.lit(n_salts - 1)),
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    return salted_big.join(salted_small, [*keys, "_salt"], how).drop("_salt")


def salted_count_distinct(
    df: DataFrame,
    group_cols: str | list[str],
    value_col: str,
    *,
    n_salts: int = 16,
    alias: str = "n_distinct",
) -> DataFrame:
    """Exact count(DISTINCT value) per group, skew-spread over ``n_salts``.

    Phase 1 groups by (group_cols..., pmod(xxhash64(value), n_salts)) and
    counts distinct values WITHIN each bucket — correct to combine because
    hash-bucketing partitions the value space disjointly. Phase 2 sums the
    bucket counts per group (algebraic, map-side combinable, skew-proof).
    A group holding half the table is now assembled by ``n_salts`` reduce
    tasks; the single-task distinct set Spark's two-phase distinct planner
    builds for plain count_distinct never materializes.

    NULL values follow count(DISTINCT) semantics: not counted.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    bucket = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)).alias("_vbucket")
    per_bucket = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*groups, bucket)
        .agg(F.count_distinct(F.col(value_col)).alias("_bucket_distinct"))
    )
    return per_bucket.groupBy(*groups).agg(
        F.sum("_bucket_distinct").alias(alias)
    )
