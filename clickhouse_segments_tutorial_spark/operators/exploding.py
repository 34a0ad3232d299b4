"""Explode computed arrays without the InferFiltersFromGenerate tax.

A non-outer ``explode``/``posexplode`` makes the optimizer infer
``size(arr) > 0 AND isnotnull(arr)`` below the Generate so rows that
produce no output are skipped early (InferFiltersFromGenerate). When
``arr`` is a COMPUTED EXPRESSION (tokenize + higher-order shingle
builds, not a stored column), predicate pushdown then inlines the whole
expression into that Filter and pushes it below any repartition — the
corpus-sized array build is evaluated up to three times (size guard,
null guard, the Generate itself), serially on the unspread scan.
Measured on the sf0.1 eval-gram subtree: 37.5 s -> 0.95 s (~40x) just
by keeping the expression out of the inferred filter.

The fix: ``posexplode_outer`` (outer Generates get no inferred filter)
followed by a filter on the POSITION column. The only rows outer adds
over the non-outer form are the empty/NULL-array rows, and exactly
those have a NULL position — so dropping them reproduces plain
explode/posexplode semantics BIT-FOR-BIT, including arrays that contain
NULL elements (their positions are non-NULL and survive).

Use these only where the generator input is a live computed expression;
exploding a stored/persisted attribute doesn't duplicate anything and
the inferred filter there is a cheap row skip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_POS = "__xpl_pos"


def select_exploded(
    df: DataFrame, *cols: Column | str, arr: Column | str, alias: str
) -> DataFrame:
    """``df.select(*cols, F.explode(arr).alias(alias))`` without the
    inferred-filter re-evaluation of ``arr``."""
    out = df.select(*cols, F.posexplode_outer(arr).alias(_POS, alias))
    return out.filter(F.col(_POS).isNotNull()).drop(_POS)


def select_posexploded(
    df: DataFrame,
    *cols: Column | str,
    arr: Column | str,
    pos_alias: str,
    alias: str,
) -> DataFrame:
    """``df.select(*cols, F.posexplode(arr).alias(pos_alias, alias))``
    without the inferred-filter re-evaluation of ``arr``."""
    out = df.select(*cols, F.posexplode_outer(arr).alias(pos_alias, alias))
    return out.filter(F.col(pos_alias).isNotNull())
