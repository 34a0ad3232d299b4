"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (SURVEY.md §2.5).

The Spark-side machinery is real and tested: schema, batch shape,
partition-friendly mapInPandas pipelines, Arrow transfer. The codec step is
STUBBED — the image/audio libraries are not in this container — behind
``decode_stub`` (deterministic fake) and guarded imports, with the UDF
signatures exactly as a real decoder would need them.

Pattern notes for 100 TB of media:
- binary payloads travel in Arrow record batches; keep
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` low (payloads are MBs,
  not bytes) so a batch fits executor memory.
- decode/resize/frame-sample are mapInPandas (per-partition iterator) —
  no shuffle, back-pressure friendly, and the iterator form lets a real
  decoder reuse codec contexts across batches.
- metadata (width/height/duration/codec) lives in sibling typed columns so
  filters prune on parquet stats BEFORE touching payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_sample_rate", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, feature array<double>"
)

try:  # real decoders, absent in this container — plumbing still testable
    import PIL.Image  # type: ignore  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def decode_stub(payload: bytes) -> list[float]:
    """Deterministic fake 'decode + feature extract': 8 byte-histogram
    buckets normalized by length. A real implementation would decode the
    codec and pool pixel/sample values; the batch shape is identical."""
    if payload is None or len(payload) == 0:
        return [0.0] * 8
    buckets = [0] * 8
    for byte in payload:
        buckets[byte >> 5] += 1
    n = float(len(payload))
    return [b / n for b in buckets]


def real_decode(payload: bytes, kind: str) -> list[float]:
    """The genuine codec path — unavailable here by design."""
    raise NotImplementedError(
        "media codecs (PIL/libav) are not installed in this environment; "
        "use decode_stub for plumbing tests"
    )


def extract_features(media: DataFrame, *, use_stub: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Iterator-of-batches signature: a real decoder would hold codec state
    across batches. Arrow moves the binary column zero-copy.

    The decode function is defined INSIDE this closure so cloudpickle ships
    it by value — Spark Python workers must not need this package importable
    (the driver harness may run from any cwd).
    """
    if not use_stub and not HAVE_PIL:
        raise NotImplementedError(
            "media codecs (PIL/libav) are not installed in this environment"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode(payload) -> list[float]:
            # by-value copy of decode_stub (see module docstring)
            if payload is None or len(payload) == 0:
                return [0.0] * 8
            buckets = [0] * 8
            for byte in payload:
                buckets[byte >> 5] += 1
            n = float(len(payload))
            return [b / n for b in buckets]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                    "feature": pdf["payload"].map(decode),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque payloads so the media
    pipeline has real data to run against in tests/bench."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
        F.lit(None).cast("int").alias("meta_sample_rate"),
    )
