"""As-of join: for each left row, the most recent right row (by time) with
the same key at or before the left row's time.

Spark has no native ASOF JOIN (DuckDB does — it is our oracle). A naive
range join (``l.key = r.key AND r.t <= l.t`` + argmax) explodes to
O(|matches|) intermediate rows. This implementation uses the union trick:

    union both sides tagged -> window last(right_payload, ignoreNulls)
    over (partition by key order by (t, side)) -> keep left rows

One shuffle on the key, one within-partition sort, zero row blowup —
the standard distributed as-of pattern. Right rows sort before left rows
at equal timestamps, so the match is inclusive (t_right <= t_left),
matching DuckDB's ``ASOF JOIN ... ON l.t >= r.t``.

Scale note: the window is partitioned by key, so skew = one hot key's
history in one task; salt by coarse time bucket if a key's history exceeds
a partition. For repeated probes against a slowly-changing right side,
pre-bucket both tables on the key to skip the shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Return left columns + matched right columns (null when no match).

    ``right_cols`` defaults to all right columns except the key and time.
    ``how='inner'`` drops unmatched left rows.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_time)]
    clashes = set(right_cols) & set(left.columns)
    if clashes:
        raise ValueError(
            f"right_cols {sorted(clashes)} collide with left columns; "
            "rename or project them on the right side first"
        )
    for internal in ("_t", "_side", "_payload", "_match"):
        if internal in left.columns or internal in right.columns:
            raise ValueError(f"column name {internal!r} is reserved by asof_join")
    # if both sides call their time column the same thing, suffix the
    # matched right time so the output has no duplicate names
    out_time = right_time if right_time not in left.columns else f"{right_time}_right"

    payload = F.struct(*[F.col(c) for c in right_cols + [right_time]])

    l_tagged = left.withColumn("_t", F.col(left_time)).withColumn(
        "_side", F.lit(1)
    ).withColumn("_payload", F.lit(None).cast(right.select(payload).schema[0].dataType))
    r_tagged = (
        # a NULL right time can never be "at or before" anything — without
        # this filter it would sort nulls-first and spuriously match every
        # left row (DuckDB ASOF never matches NULL times). NULL right KEYS
        # are dropped too: Window.partitionBy groups NULL keys from both
        # sides into one partition, so a NULL-key left row would otherwise
        # pick up a NULL-key right payload — SQL equality joins never
        # match NULL = NULL, so those left rows must stay unmatched.
        right.filter(F.col(right_time).isNotNull() & F.col(on).isNotNull())
        .select(on, F.col(right_time).alias("_t"), payload.alias("_payload"))
        .withColumn("_side", F.lit(0))
    )
    # align schemas for unionByName
    for c in left.columns:
        if c not in (on,):
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    unioned = l_tagged.unionByName(r_tagged.select(l_tagged.columns))
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    out = matched.select(
        *left.columns,
        *[F.col("_match")[c].alias(c) for c in right_cols],
        F.col("_match")[right_time].alias(out_time),
    )
    if how == "inner":
        out = out.filter(F.col(out_time).isNotNull())
    return out
