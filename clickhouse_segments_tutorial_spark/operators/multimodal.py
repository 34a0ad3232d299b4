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
    """The genuine codec path: decode the image and pool PIXEL intensities
    into the same 8-bucket normalized histogram shape as ``decode_stub``
    pools raw bytes (bucket = value >> 5) — so swapping the stub for the
    real decoder changes feature VALUES, never schema or batch shape.

    Guarded: raises NotImplementedError when PIL is absent (this
    container); tests/test_operators.py carries a golden-PNG test that
    skips cleanly in that case. Audio/video codecs (libav) stay stubbed.
    """
    if not HAVE_PIL:
        raise NotImplementedError(
            "media codecs (PIL/libav) are not installed in this environment; "
            "use decode_stub for plumbing tests"
        )
    if kind != "image":
        raise NotImplementedError(f"real decode implemented for images only, got {kind!r}")
    import io

    img = PIL.Image.open(io.BytesIO(payload)).convert("L")
    pixels = list(img.getdata())
    if not pixels:
        return [0.0] * 8
    buckets = [0] * 8
    for v in pixels:
        buckets[v >> 5] += 1
    n = float(len(pixels))
    return [b / n for b in buckets]


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
            # by-value copies of decode_stub / real_decode (see module
            # docstring: workers must not need this package importable)
            if payload is None or len(payload) == 0:
                return [0.0] * 8
            buckets = [0] * 8
            if use_stub:
                for byte in payload:
                    buckets[byte >> 5] += 1
                n = float(len(payload))
            else:
                import io

                import PIL.Image as _img

                values = list(
                    _img.open(io.BytesIO(payload)).convert("L").getdata()
                )
                if not values:
                    return [0.0] * 8
                for v in values:
                    buckets[v >> 5] += 1
                n = float(len(values))
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


def resize_media(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """mapInPandas resize: payload -> payload', meta dims updated.

    Stub codec: deterministic byte resampling to exactly width*height bytes
    (nearest-index pick — the shape a real thumbnailer produces: output
    size is fixed and independent of input size). Schema is MEDIA_SCHEMA
    in and out, so resize composes with extract_features / writes."""
    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = width * height

        def resample(payload):
            if payload is None or len(payload) == 0:
                return bytes(n_out)
            src = payload
            n_in = len(src)
            return bytes(src[(i * n_in) // n_out] for i in range(n_out))

        for pdf in batches:
            out = pdf.copy()
            out["payload"] = pdf["payload"].map(resample)
            out["meta_width"] = width
            out["meta_height"] = height
            yield out[[f.name for f in out_schema.fields]]

    return media.mapInPandas(run, schema=out_schema)


FRAME_SCHEMA = "media_id long, frame_idx int, payload binary"


def sample_frames(
    media: DataFrame, *, frame_bytes: int = 64, every_n: int = 4
) -> DataFrame:
    """mapInPandas frame sampling: one video payload -> several frame rows
    (a one-to-many batch transform, the shape a real demuxer produces).

    Stub codec: treat the payload as fixed-size 'frames' of ``frame_bytes``
    and keep every ``every_n``-th. Row-explosion happens inside the Arrow
    batch — no shuffle; downstream per-frame work (feature extraction)
    repartitions if frames per video are skewed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = max(1, len(payload) // frame_bytes)
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(
                        bytes(payload[fi * frame_bytes : (fi + 1) * frame_bytes])
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "payload": frames}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


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
