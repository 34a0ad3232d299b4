"""Query registry: every operator surfaced through __spark_entry__.

Each :class:`QuerySpec` pairs the Spark implementation with (when the
semantics are SQL-expressible) a DuckDB oracle computing the identical
result. Column names and value expressions are written to be *bit-identical*
across engines:

- double sums: per-row scalar math in double (deterministic, same IEEE ops
  both engines) -> CAST to decimal (exact, order-independent sum) -> cast
  back to double. Never a raw SUM(double), whose value depends on
  partitioning/order.
- averages: exact decimal sum cast to double, then ONE double division by
  the count.
- timestamps: compared/emitted after truncation to whole seconds
  (unix_timestamp vs floor(epoch(...))) or as formatted strings; events.ts
  is CAST to microseconds in oracles because Spark reads the ns parquet
  column truncated to us.
- ordering for LIMIT queries always carries a unique tiebreak column.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB SQL over the pre-registered views
    headline: bool = False  # included in bench.py's timed set


# Queries whose implementing code changed in the CURRENT round. They pin
# to the FRONT of the rotation (ahead of even never-checked queries'
# peers) so the driver re-confirms them with a fresh hash row this round
# even if they were green in the immediately preceding round — otherwise
# an edit landing right after a query's driver check would ship with only
# the local pytest oracle until the rotation swings back (r8 VERDICT
# item 4). Update this set each round alongside the code edits; stale
# entries are harmless (a pinned-but-untouched query just gets re-checked
# early).
ROUND_TOUCHED: frozenset[str] = frozenset(
    {
        # r9: bucketed incremental state (plans/incremental.py)
        "corpus_curated_incremental",
        "corpus_packed_incremental",
        # r9: vectorized image decode (operators/multimodal.py)
        "multimodal_image_decode",
        # r9: new curation queries (plans/curation.py)
        "novelty_ngram_docs",
        "source_quota_docs",
        "source_quota_streaming",
        "shuffled_chunk_order",
        "semantic_dedup_keep",
        "temperature_mix_docs",
        "novelty_ngram_incremental",
        # r9: CCNet perplexity buckets (operators/corpus_stats.py)
        "ccnet_ppl_buckets_docs",
        # r9: incremental semantic dedup (plans/curation.py)
        "semantic_dedup_incremental",
        # r9: new ingest-format twins (sources/csv_ingest.py, ORC)
        "csv_roundtrip",
        "orc_roundtrip",
    }
)


def _last_green_round() -> dict[str, int]:
    """name -> latest round whose CORRECTNESS_r{N}.json has a green row
    (hash_match, or rows_match for the weaker rows-only checks).

    The correctness harness checks a fixed-size prefix of the registration
    order (50 rows in rounds 1-5), so with more registered queries than
    slots a static order leaves a permanent blind tail. Reading the
    recorded results back makes the order self-rotating: see all_queries().
    Missing/unreadable files degrade to {} (static order) — e.g. when the
    repo is checked out without the driver's round artifacts."""
    root = Path(__file__).resolve().parents[2]
    out: dict[str, int] = {}
    for p in root.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if isinstance(row, dict) and (
                row.get("hash_match") or (row.get("err") is None and row.get("rows_match"))
            ):
                out[name] = max(out.get(name, -1), rnd)
    return out


def all_queries() -> dict[str, QuerySpec]:
    """All registered queries: round-touched first, then
    least-recently-verified.

    Order = ascending (NOT round-touched, last green-checked round,
    registration index): queries edited this round (``ROUND_TOUCHED``)
    lead, then queries with no green CORRECTNESS row ever, then the ones
    whose last green row is oldest. The harness checks a prefix of this
    dict, so any query it skips this round was green last round and gets
    priority next round — over any two consecutive rounds every
    registered query receives a driver correctness row (the r5 verdict's
    60-into-50 window fix), and every query whose code changed gets a
    fresh row in the round of the change (the r8 verdict's pinning fix).
    Deterministic for a given set of recorded round files; falls back to
    (touched, registration order) when none exist."""
    from . import curation, incremental, llm, pipeline, relational, scale, segmentation_queries

    specs: list[QuerySpec] = []
    seen: set[str] = set()
    for mod in (segmentation_queries, relational, llm, scale, pipeline, incremental, curation):
        for spec in mod.QUERIES:
            if spec.name in seen:
                raise ValueError(f"duplicate query name {spec.name}")
            seen.add(spec.name)
            specs.append(spec)
    last_green = _last_green_round()
    order = sorted(
        range(len(specs)),
        key=lambda i: (
            specs[i].name not in ROUND_TOUCHED,
            last_green.get(specs[i].name, -1),
            i,
        ),
    )
    return {specs[i].name: specs[i] for i in order}
