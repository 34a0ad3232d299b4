"""Z-order (Morton) clustering for multi-column scan pruning — the
multi-dimensional generalization of writers.append_clustered's
single-key sort-on-write (SURVEY §2.1 S7, the ClickHouse ORDER BY
analog; reference layout contract /root/reference/src/1-naive.test.ts:
13-19).

A single-column sort gives perfect row-group pruning on ITS column and
none on any other: a layout sorted by user_id answers a user-range
probe from a handful of files but a time-range probe from ALL of them.
Interleaving the bits of both keys (the Morton curve) makes file/row-
group min-max rectangles compact in EVERY clustered dimension at once,
so a predicate on any subset of the z columns prunes — the property
lakehouse engines expose as OPTIMIZE ... ZORDER BY, built here from
Spark primitives: a pure-expression bit interleave, one
repartitionByRange on the key, one sortWithinPartitions.

100-TB shape: this is the LAYOUT-REWRITE path, run at compaction
cadence (the MergeTree background-merge analog), not the hot ingest
path — repartitionByRange pays a sampling pass to get non-overlapping
z ranges across files, which is exactly what maximizes pruning; hot
appends keep using append_clustered (hash + sort, no sampling) and the
rewriter folds them in later. The z key itself is ~bits·n_cols shifts
and adds inside whole-stage codegen — no UDF, no extra job."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(
    cols: list[Column], *, bits: int = 16, check: bool = False
) -> Column:
    """Morton interleave of non-negative integer columns: bit ``b`` of
    column ``i`` lands at position ``b * n_cols + i``. CONTRACT: every
    value must already be quantized into [0, 2**bits) — the caller maps
    its domain (ids, epoch-days, bucketed doubles) onto the grid; values
    at or above 2**bits would alias because their high bits are simply
    not interleaved. ``check=True`` enforces the contract at runtime
    (r14 ADVICE: a value off the grid previously aliased SILENTLY —
    the clustering/pruning quality degraded with nothing flagging it):
    each row asserts every input fits the grid and the job fails
    loudly with the offending value otherwise — one codegen'd compare
    per column, no extra pass. Pure shifts/masks/adds — whole-stage
    codegen, and exactly replayable in any SQL engine with bit ops."""
    n = len(cols)
    terms = [
        F.shiftleft(
            F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)), b * n + i
        )
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    z = reduce(lambda a, t: a + t, terms)
    if not check:
        return z
    grid = 1 << bits
    ok = F.assert_true(
        reduce(
            lambda a, c: a & c,
            [(c.cast("long") >= 0) & (c.cast("long") < grid) for c in cols],
        ),
        F.concat(
            F.lit(f"zorder_key: value off the [0, {grid}) grid in ("),
            F.concat_ws(
                ", ", *[c.cast("long").cast("string") for c in cols]
            ),
            F.lit(") — quantize (pmod/bucket) inputs onto the grid"),
        ),
    )
    # ok is NULL whenever the assertion passes; the when() ties the
    # (row-failing) assertion into the returned expression exactly once
    return F.when(ok.isNull(), z)


def append_zordered(
    df: DataFrame,
    path: str,
    *,
    zorder_by: list[str],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write ``df`` clustered on the Morton curve of ``zorder_by``
    (integer columns pre-quantized to [0, 2**bits) — see zorder_key):
    range-partition on the z key (non-overlapping key ranges per file —
    the sampling pass is the price of maximal pruning, acceptable on
    the compaction path this writer exists for), sort within each
    partition, drop the helper key, write parquet. Row-group and file
    min/max stats on the ORIGINAL columns then prune predicates on any
    clustered dimension; no reader-side code changes."""
    z = zorder_key([F.col(c) for c in zorder_by], bits=bits)
    clustered = df.withColumn("_z", z)
    if num_files is not None:
        clustered = clustered.repartitionByRange(num_files, "_z")
    else:
        clustered = clustered.repartitionByRange("_z")
    (
        clustered.sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("append")
        .parquet(path)
    )


def files_overlapping(path: str, box: dict[str, tuple]) -> tuple[int, int]:
    """Pruning auditor: (n_files_overlapping, n_files_total) for a
    conjunctive range predicate ``{col: (lo, hi)}``, judged purely from
    parquet footer column statistics — the same min/max evidence the
    scan's file- and row-group-level filters use, so this measures what
    a reader would actually skip. Driver-side metadata walk (footers,
    not data); test/ops tooling, not a query operator."""
    import pyarrow.parquet as pq

    root = __import__("pathlib").Path(path)
    total = hit = 0
    for f in sorted(root.rglob("*.parquet")):
        meta = pq.ParquetFile(f).metadata
        total += 1
        overlaps = True
        for col, (lo, hi) in box.items():
            cmin = cmax = None
            for rg in range(meta.num_row_groups):
                for ci in range(meta.num_columns):
                    c = meta.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        cmin = s.min if cmin is None else min(cmin, s.min)
                        cmax = s.max if cmax is None else max(cmax, s.max)
            if cmin is not None and (cmax < lo or cmin > hi):
                overlaps = False
                break
        hit += int(overlaps)
    return hit, total
