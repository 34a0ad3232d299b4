"""Event funnel levels — the ClickHouse `windowFunnel` shape re-expressed
relationally (the reference's engine family popularized this operator for
exactly the segmentation workloads the reference demonstrates; the
reference repo itself stops at per-user distinct counts).

Semantics (documented precisely because they are the contract):
*greedy earliest-chain*: t1 = the user's earliest step-1 event; t_i = the
earliest step-i event STRICTLY after t_{i-1}; the funnel level is the
deepest i whose t_i falls within `window` of t1 (level 1 needs no window
check; level 0 = user never performed step 1). This is deterministic and
joinable; ClickHouse's windowFunnel searches all chains for the maximal
level, so on corpora where step events repeat densely the greedy chain is
a lower bound of windowFunnel's answer.

Scale: one user-keyed hash aggregation per step (min() partial-aggregates
map-side) and one user-keyed join per step — no per-user event arrays are
ever collected, unlike sort-by-user + UDF funnel implementations, so a
single hyperactive user cannot blow a task. Timestamp math stays at
microsecond resolution in both engines (registry determinism rules).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def funnel_levels(
    events: DataFrame,
    steps: list[str],
    *,
    window: str = "7 days",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, funnel_level, first_step_ts) for every user with >=1 event.

    funnel_level in 0..len(steps); first_step_ts = unix seconds of t1
    (NULL when level 0).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("_type"),
        F.col(ts_col).alias("_ts"),
    )
    levels = [
        ev.filter(F.col("_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("_ts").alias("t1"))
    ]
    for i, step in enumerate(steps[1:], start=2):
        prev = levels[-1].select("user_id", f"t{i - 1}")
        levels.append(
            ev.filter(F.col("_type") == step)
            .join(prev, "user_id")
            .filter(F.col("_ts") > F.col(f"t{i - 1}"))
            .groupBy("user_id")
            .agg(F.min("_ts").alias(f"t{i}"))
        )
    users = ev.select("user_id").distinct()
    joined = reduce(
        lambda acc, lv: acc.join(
            lv.select("user_id", lv.columns[-1]), "user_id", "left"
        ),
        levels,
        users,
    )
    deadline = F.col("t1") + F.expr(f"INTERVAL {window}")
    # build the when-chain deepest-first so the first true branch wins
    expr = None
    for i in range(len(steps), 1, -1):
        cond = F.col(f"t{i}").isNotNull() & (F.col(f"t{i}") <= deadline)
        expr = (expr.when(cond, F.lit(i)) if expr is not None
                else F.when(cond, F.lit(i)))
    expr = expr.when(F.col("t1").isNotNull(), F.lit(1)).otherwise(F.lit(0))
    return joined.select(
        "user_id",
        expr.cast("int").alias("funnel_level"),
        F.unix_timestamp("t1").alias("first_step_ts"),
    )
