"""PySpark-native analytics engine with the capabilities of
dittofeed/clickhouse-segments-tutorial.

The reference (see SURVEY.md) is a live user-segmentation dataflow on
ClickHouse: append-only event ingest -> incrementally maintained per-user
aggregate state -> boolean segment membership -> last-writer-wins serving.
This package re-expresses that dataflow — plus an extended relational and
LLM-data-pipeline surface — idiomatically on Spark SQL / DataFrame API /
Structured Streaming.

Layout:
    session        SparkSession factory tuned for local[N] and cluster use
    schemas        explicit StructType schemas (never inference in engine paths)
    sources/       table catalog over the parquet test corpus, JSON ingest
    segmentation/  the four reference variants (naive/idempotent/micro-batch/event-time)
    operators/     latest-wins, HLL state, as-of join, sessionize, dedup,
                   similarity, text analysis, multimodal plumbing
    plans/         relational query plans (TPC-H-style) used for oracle parity
    streaming/     Structured Streaming twin of the segmentation cascade
"""

__version__ = "0.1.0"
