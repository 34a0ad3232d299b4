"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (SURVEY.md §2.5).

The Spark-side machinery is real and tested: schema, batch shape,
partition-friendly mapInPandas pipelines, Arrow transfer. The codec step
is REAL for images (PNG/PPM/PGM/BMP/baseline-JPEG — decode_image_py +
operators/jpeg.py), audio (RIFF/PCM WAV — decode_wav_py), and video
(YUV4MPEG2/Y4M raw planar streams — decode_y4m_py, ffmpeg's uncompressed
interchange format), all parsed dependency-free from the published
formats. The one remaining scope note is COMPRESSED video (H.264/VP9 via
libav), which stays behind ``decode_stub`` (deterministic fake) and
guarded imports, with the UDF signatures exactly as a real decoder would
need them.

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

# Module-level, not function-local: these run inside worker-side closures
# shipped by value, where a deferred relative import would re-require the
# package on the worker's sys.path (exactly what by-value shipping exists
# to avoid).
from .jpeg import decode_jpeg_luma, encode_jpeg_gray  # noqa: E402


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


def _luma(r: int, g: int, b: int) -> int:
    """ITU-R 601-2 luma, truncating integer math (PIL convert('L')'s
    formula), so the pure decoder and the PIL path agree bit-for-bit."""
    return (299 * r + 587 * g + 114 * b) // 1000


def _decode_png(payload: bytes) -> tuple[int, int, list[int]]:
    """8-bit greyscale/RGB PNG via stdlib zlib; all five scanline filters.

    Format per the public PNG spec (RFC 2083): IHDR dims/depth/color,
    concatenated IDAT zlib stream, per-scanline filter byte then samples.
    """
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, width, height, channels, idat = 8, 0, 0, 0, b""
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            width, height, depth, color = struct.unpack(">IIBB", data[:10])
            if depth != 8 or color not in (0, 2):
                raise ValueError(f"unsupported PNG depth/color {depth}/{color}")
            channels = 3 if color == 2 else 1
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = width * channels
    # Scanline unfiltering, vectorized per row with numpy (round-9: the
    # old per-byte Python loop — branch per byte, bytearray indexing — was
    # the decode throughput ceiling at media scale; see BASELINE.md
    # micro-bench). Filters none/sub/up are whole-row vector ops (sub is
    # a per-channel prefix sum: mod-256 distributes over addition, so one
    # int64 cumsum then %256 reconstructs the recurrence). Average and
    # Paeth depend on the just-reconstructed LEFT neighbor, an inherently
    # sequential recurrence — those rows run a tightened Python loop over
    # plain ints (specialized per filter, branch hoisted out; numpy
    # element ops would be slower at this granularity). The RGB->luma
    # fold is one whole-image vector op at the end.
    import numpy as np

    rowlen = stride + 1
    rows = np.frombuffer(raw, dtype=np.uint8, count=height * rowlen).reshape(
        height, rowlen
    )
    filts = rows[:, 0]
    data = rows[:, 1:].astype(np.int32)
    out = np.empty((height, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        filt = int(filts[y])
        line = data[y]
        if filt == 0:
            cur = line
        elif filt == 1:  # sub
            cur = (
                line.reshape(-1, channels).cumsum(axis=0, dtype=np.int64) % 256
            ).reshape(-1).astype(np.int32)
        elif filt == 2:  # up
            cur = (line + prev) & 0xFF
        elif filt == 3:  # average: left-neighbor recurrence
            # the left neighbor is the just-computed output `channels`
            # back — inherently sequential, so this (and Paeth) stays a
            # tight Python list loop, specialized per filter with the
            # branch hoisted out of the byte loop (measured fastest of
            # the indexed/zip/strided formulations)
            ln, pv = line.tolist(), prev.tolist()
            cur_l = [0] * stride
            for x in range(channels):
                cur_l[x] = (ln[x] + (pv[x] >> 1)) & 0xFF
            for x in range(channels, stride):
                cur_l[x] = (ln[x] + ((cur_l[x - channels] + pv[x]) >> 1)) & 0xFF
            cur = np.asarray(cur_l, dtype=np.int32)
        elif filt == 4:  # Paeth: left-neighbor recurrence
            ln, pv = line.tolist(), prev.tolist()
            cur_l = [0] * stride
            for x in range(channels):
                # a = c = 0 -> the Paeth predictor reduces to up
                cur_l[x] = (ln[x] + pv[x]) & 0xFF
            for x in range(channels, stride):
                a = cur_l[x - channels]
                b_ = pv[x]
                c = pv[x - channels]
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b_ if pb <= pc else c)
                cur_l[x] = (ln[x] + pred) & 0xFF
            cur = np.asarray(cur_l, dtype=np.int32)
        else:
            raise ValueError(f"bad PNG filter {filt}")
        out[y] = cur
        prev = cur
    if channels == 1:
        return width, height, out.reshape(-1).tolist()
    px = out.reshape(-1, 3)
    luma = (299 * px[:, 0] + 587 * px[:, 1] + 114 * px[:, 2]) // 1000
    return width, height, luma.tolist()


def _decode_pnm(payload: bytes) -> tuple[int, int, list[int]]:
    """Binary PPM (P6, RGB) / PGM (P5, grey), maxval 255."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM")
    # header: magic, width, height, maxval as whitespace-separated tokens
    # (comment lines starting '#' allowed), then a single whitespace byte
    # before the raster
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PNM maxval {maxval}")
    if magic == b"P5":
        return width, height, list(payload[pos : pos + width * height])
    import numpy as np

    px = np.frombuffer(
        payload, dtype=np.uint8, count=width * height * 3, offset=pos
    ).astype(np.int32).reshape(-1, 3)
    luma = (299 * px[:, 0] + 587 * px[:, 1] + 114 * px[:, 2]) // 1000
    return width, height, luma.tolist()


def _decode_bmp(payload: bytes) -> tuple[int, int, list[int]]:
    """Uncompressed 24-bit BI_RGB BMP (bottom-up or top-down rows,
    4-byte-aligned row stride, BGR byte order)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", payload[10:14])
    width, height_raw = struct.unpack("<ii", payload[18:26])
    bpp, compression = struct.unpack("<HI", payload[28:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP bpp/compression {bpp}/{compression}")
    height = abs(height_raw)
    stride = (width * 3 + 3) & ~3
    import numpy as np

    rows = np.frombuffer(
        payload, dtype=np.uint8, count=height * stride, offset=data_off
    ).reshape(height, stride)
    if height_raw > 0:  # bottom-up storage
        rows = rows[::-1]
    px = rows[:, : width * 3].astype(np.int32).reshape(-1, 3)
    # BGR byte order
    luma = (299 * px[:, 2] + 587 * px[:, 1] + 114 * px[:, 0]) // 1000
    return width, height, luma.tolist()


def decode_image_py(payload: bytes) -> tuple[int, int, list[int]]:
    """Dependency-free image decode: (width, height, 8-bit luma pixels in
    row-major order) for PNG (8-bit grey/RGB, stdlib zlib), binary
    PPM/PGM, uncompressed 24-bit BMP, and baseline-sequential JPEG
    (operators/jpeg.py, from the published T.81 spec) — public formats
    parsed exactly without codec libraries, so the real-decode path is
    exercised in CI rather than import-gated away. RGB converts with the
    same truncating ITU-R 601-2 luma as PIL convert('L'); JPEG returns
    the decoded Y plane, which IS that luma. Progressive JPEG falls
    through as NotImplementedError so the PIL lane (when installed)
    picks it up."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:2] in (b"P5", b"P6"):
        return _decode_pnm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:3] == b"\xff\xd8\xff":
        return decode_jpeg_luma(payload)
    raise NotImplementedError(
        "unsupported image format (PNG/PPM/PGM/BMP/baseline-JPEG decode "
        "without codec libraries; other formats need PIL)"
    )


def decode_wav_py(payload: bytes) -> tuple[int, int, list[int]]:
    """Dependency-free RIFF/WAVE PCM decode: (sample_rate, n_channels,
    interleaved samples) for 16-bit and 8-bit integer PCM — the audio
    sibling of decode_image_py, parsed exactly from the published RIFF
    container layout without codec libraries. A real chunk WALK, not a
    fixed-offset read: optional chunks (LIST/INFO, fact, cue) before
    ``data`` are skipped with word alignment, so files from editors that
    front-load metadata parse correctly (the synthetic corpus plants a
    LIST chunk on some ids to keep this path exercised in CI). 16-bit
    samples are signed little-endian (-32768..32767); 8-bit WAV is
    unsigned by spec and is recentred to signed and widened to the
    16-bit domain ((u - 128) * 256) so both widths share one amplitude
    contract downstream. Compressed/float formats fall through as
    NotImplementedError (the PIL-style escape-hatch lane — no audio lib
    exists in this container)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    fmt = None
    while pos + 8 <= end:
        cid, size = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_ch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            fmt = (audio_fmt, n_ch, rate, bits)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt chunk")
            audio_fmt, n_ch, rate, bits = fmt
            if audio_fmt != 1 or bits not in (8, 16):
                raise NotImplementedError(
                    f"only integer PCM 8/16-bit WAV decodes without codec "
                    f"libraries (fmt={audio_fmt}, bits={bits})"
                )
            import numpy as np

            if bits == 16:
                samples = np.frombuffer(
                    body, dtype="<i2", count=size // 2
                ).astype(np.int64)
            else:
                samples = (
                    np.frombuffer(body, dtype=np.uint8, count=size).astype(
                        np.int64
                    )
                    - 128
                ) * 256
            return rate, n_ch, samples.tolist()
        # chunks are word-aligned: odd sizes carry a pad byte
        pos += 8 + size + (size & 1)
    raise ValueError("WAV payload has no data chunk")


def decode_y4m_py(payload: bytes) -> tuple[int, int, str, list[bytes]]:
    """Dependency-free YUV4MPEG2 (Y4M) demux+decode: (width, height,
    chroma tag, list of raw planar frame payloads) — the video sibling
    of decode_image_py/decode_wav_py, parsed exactly from the published
    Y4M layout (the uncompressed interchange format ffmpeg/mjpegtools
    pipe between stages: one ASCII stream header, then FRAME-delimited
    raw planar YUV). A real TAG walk, not a fixed-offset read: the
    stream header's space-separated parameters (W/H/F/I/A/C plus
    vendor X tags) parse in any order with unknown tags skipped, and
    FRAME markers may carry their own space-prefixed parameters — the
    synthetic corpus plants both so the walk stays exercised in CI.

    Frame geometry comes from the CODEC, not metadata: 4:2:0 families
    (420jpeg/420mpeg2/420paldv — identical plane layout, differing only
    in chroma siting, which sums/stats don't see) carry
    w*h + 2*(w/2)*(h/2) bytes per frame, 4:2:2 w*h*2, 4:4:4 w*h*3,
    mono w*h. Truncated frames and missing FRAME markers are hard
    ValueErrors (a demuxer must never emit a short frame as data);
    other samplings (444alpha, 411) fall through as NotImplementedError
    — the PIL-style escape-hatch lane. COMPRESSED video (H.264/VP9)
    stays out of scope: that genuinely needs libav, which this
    container doesn't have."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("Y4M stream header has no terminator")
    width = height = 0
    chroma = "420jpeg"  # the spec's default when the C tag is absent
    for tag in payload[9:nl].split(b" "):
        if not tag:
            continue
        key, val = tag[:1], tag[1:]
        if key == b"W":
            width = int(val)
        elif key == b"H":
            height = int(val)
        elif key == b"C":
            chroma = val.decode("ascii")
        # F (rate) / I (interlace) / A (aspect) / X (vendor) carry no
        # layout information for the demux: skipped, never rejected.
    if width <= 0 or height <= 0:
        raise ValueError("Y4M stream header missing W/H tags")
    if chroma.startswith("420"):
        if width % 2 or height % 2:
            raise ValueError("4:2:0 Y4M requires even dimensions")
        frame_size = width * height + 2 * ((width // 2) * (height // 2))
    elif chroma.startswith("422"):
        if width % 2:
            raise ValueError("4:2:2 Y4M requires even width")
        frame_size = width * height * 2
    elif chroma == "444":
        frame_size = width * height * 3
    elif chroma == "mono":
        frame_size = width * height
    else:
        raise NotImplementedError(
            f"Y4M chroma sampling C{chroma} not supported by the "
            "dependency-free demuxer (420*/422/444/mono decode exactly)"
        )
    frames: list[bytes] = []
    pos, end = nl + 1, len(payload)
    while pos < end:
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        fnl = payload.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("FRAME header has no terminator")
        params = payload[pos + 5 : fnl]
        if params and not params.startswith(b" "):
            raise ValueError("FRAME parameters must be space-prefixed")
        body = payload[fnl + 1 : fnl + 1 + frame_size]
        if len(body) != frame_size:
            raise ValueError(
                f"truncated Y4M frame {len(frames)}: got {len(body)} of "
                f"{frame_size} bytes"
            )
        frames.append(bytes(body))
        pos = fnl + 1 + frame_size
    return width, height, chroma, frames


def real_decode(payload: bytes, kind: str) -> list[float]:
    """The genuine codec path: decode the payload and pool intensities
    into the same 8-bucket normalized histogram shape as ``decode_stub``
    pools raw bytes — so swapping the stub for the real decoder changes
    feature VALUES, never schema or batch shape. Images pool 8-bit luma
    (bucket = value >> 5); audio pools 16-bit-domain sample amplitude
    recentred to unsigned (bucket = (s + 32768) >> 13 — decode_wav_py
    already widens 8-bit samples), the same 8-way equal-width rule.

    Decode order: the dependency-free parsers (PNG/PPM/PGM/BMP/baseline
    JPEG for images, RIFF/PCM WAV for audio, Y4M raw planar YUV for
    video — deterministic everywhere, including this container), then
    PIL for other image formats when installed. NotImplementedError only
    for payloads neither path can read (e.g. progressive JPEG without
    PIL, compressed audio). COMPRESSED video (libav) stays stubbed — the
    one remaining scope note; video here pools the decoded Y (luma)
    planes across every frame with the image bucket rule, so the
    histogram is the time-average of the per-frame luma histograms."""
    if kind == "video":
        w, h, _, frames = decode_y4m_py(payload)
        if not frames:
            return [0.0] * 8
        buckets = [0] * 8
        y_size = w * h
        for frame in frames:
            for v in frame[:y_size]:
                buckets[v >> 5] += 1
        n = float(y_size * len(frames))
        return [b / n for b in buckets]
    if kind == "audio":
        _, _, samples = decode_wav_py(payload)
        if not samples:
            return [0.0] * 8
        buckets = [0] * 8
        for s in samples:
            buckets[(max(-32768, min(32767, s)) + 32768) >> 13] += 1
        n = float(len(samples))
        return [b / n for b in buckets]
    if kind != "image":
        raise NotImplementedError(
            f"real decode implemented for image, audio, and video, "
            f"got {kind!r}"
        )
    try:
        _, _, pixels = decode_image_py(payload)
    except NotImplementedError:
        if not HAVE_PIL:
            raise NotImplementedError(
                "format not supported by the built-in decoder and PIL is "
                "not installed in this environment"
            ) from None
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


_by_value_registered = False


def _ship_module_by_value() -> None:
    """Register this module with pyspark's vendored cloudpickle so UDF
    closures that call the module-level decoders (decode_image_py /
    real_decode — too large to inline per closure) are pickled BY VALUE:
    Spark Python workers must not need this package importable (the
    driver harness may run from any cwd). The stub paths stay
    self-contained closures and never need this."""
    global _by_value_registered
    if _by_value_registered:
        return
    import sys

    from pyspark import cloudpickle

    from . import jpeg as _jpeg_mod

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    # decode_image_py dispatches JPEG payloads to operators/jpeg.py, so
    # that module must travel by value too for the same worker-side
    # independence.
    cloudpickle.register_pickle_by_value(_jpeg_mod)
    _by_value_registered = True


def extract_features(media: DataFrame, *, use_stub: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Iterator-of-batches signature: a real decoder would hold codec state
    across batches. Arrow moves the binary column zero-copy.

    The stub decode is defined INSIDE the closure so cloudpickle ships it
    by value; the real path calls the module-level ``real_decode`` (the
    built-in PNG/PNM/BMP parser, PIL fallback) with the module registered
    for by-value pickling — same worker-side independence either way.
    """
    if not use_stub:
        _ship_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode(payload, kind) -> list[float]:
            if payload is None or len(payload) == 0:
                return [0.0] * 8
            if not use_stub:
                # dispatch on the ROW's kind: audio payloads take the
                # WAV lane (r14 review finding — a hard-coded 'image'
                # made the real audio decoder unreachable from here)
                return real_decode(bytes(payload), str(kind))
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
                    "feature": [
                        decode(p, k)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
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


def resize_image_py(payload: bytes, *, width: int, height: int) -> bytes:
    """REAL image resize: decode through the dependency-free codec
    (decode_image_py — so every supported container resizes), nearest-
    neighbor sample the LUMA grid (the thumbnail shape an embedding
    pipeline feeds a vision encoder: fixed output dims, grayscale), and
    re-encode as binary PGM (P5) so the output is itself a decodable
    payload — resize composes with image_decode_stats / extract_features
    downstream. Byte-exact and engine-replayable: output pixel (i, j)
    is source pixel ((j*src_h)//height, (i*src_w)//width), pure integer
    index math over the deterministic decoded luma."""
    w, h, px = decode_image_py(payload)
    out = bytearray()
    for j in range(height):
        row_off = ((j * h) // height) * w
        for i in range(width):
            out.append(px[row_off + (i * w) // width])
    return b"P5\n%d %d\n255\n" % (width, height) + bytes(out)


def resize_images(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """mapInPandas REAL resize (the stub resize_media's genuine sibling):
    decode -> nearest-neighbor luma -> P5 re-encode per payload, meta
    dims updated. MEDIA_SCHEMA in and out; per-partition iterator, no
    shuffle — resize runs at scan speed."""
    _ship_module_by_value()
    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = pdf["payload"].map(
                lambda p: resize_image_py(bytes(p), width=width, height=height)
            )
            out["meta_width"] = width
            out["meta_height"] = height
            yield out[[f.name for f in out_schema.fields]]

    return media.mapInPandas(run, schema=out_schema)


def synthesize_ppm(doc_id: int) -> bytes:
    """Deterministic binary P6 PPM for a doc id: dims 8..16 x 8..14, RGB
    raster from a modular byte sequence. Every byte is a pure integer
    function of (doc_id, position), so a SQL oracle can regenerate the
    exact pixel stream the decoder must produce — making the REAL decode
    path value-checkable end-to-end without binary fixtures."""
    w = 8 + (doc_id % 9)
    h = 8 + ((doc_id * 3) % 7)
    raster = bytes(
        (doc_id * 2654435761 + i * 40503) % 256 for i in range(w * h * 3)
    )
    return b"P6\n%d %d\n255\n" % (w, h) + raster


def synthesize_jpeg_gray(doc_id: int) -> bytes:
    """Deterministic baseline JPEG for a doc id, built for EXACT value
    oracling of the full codec: the source image is piecewise-constant on
    the 8x8 block grid (1..3 blocks wide, 1..2 high; each block's gray a
    pure integer function of (doc_id, block index)), so every block is
    DC-only and the quality-95 round-trip reconstructs bit-exactly (DC
    quant step 2 divides the 8*delta DC coefficient evenly; all AC
    coefficients are zero). A SQL oracle regenerates the block constants
    with modular arithmetic — any defect anywhere in the Huffman coder,
    bitstream framing, zigzag, quantization, or IDCT hash-mismatches."""
    import numpy as np  # absolute import: resolvable on any worker

    bw = 1 + (doc_id % 3)
    bh = 1 + ((doc_id // 3) % 2)
    img = np.zeros((8 * bh, 8 * bw), dtype=np.int64)
    for b in range(bw * bh):
        by, bx = divmod(b, bw)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
            doc_id * 2654435761 + b * 40503
        ) % 256
    return encode_jpeg_gray(img, quality=95)


def synthetic_jpeg_corpus(documents: DataFrame) -> DataFrame:
    """One synthetic baseline JPEG per document row (MEDIA_SCHEMA frame),
    the JPEG sibling of ``synthetic_image_corpus`` — same worker-side
    mapInPandas synthesis, dims recoverable only from the SOF0 header."""
    _ship_module_by_value()
    ids = documents.select(F.col("doc_id").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "payload": pdf["media_id"].map(
                        lambda i: synthesize_jpeg_gray(int(i))
                    ),
                    "meta_width": pd.Series([None] * len(pdf), dtype="object"),
                    "meta_height": pd.Series([None] * len(pdf), dtype="object"),
                    "meta_sample_rate": pd.Series([None] * len(pdf), dtype="object"),
                }
            )

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


def synthetic_image_corpus(documents: DataFrame) -> DataFrame:
    """One synthetic P6 PPM per document row, as a MEDIA_SCHEMA frame.

    Payload synthesis runs worker-side in mapInPandas (binary columns
    through Arrow — the write half of the plumbing the decode half reads
    back); meta dims are left NULL so decode must recover them from the
    codec header, not the metadata."""
    _ship_module_by_value()
    ids = documents.select(F.col("doc_id").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "payload": pdf["media_id"].map(lambda i: synthesize_ppm(int(i))),
                    "meta_width": pd.Series([None] * len(pdf), dtype="object"),
                    "meta_height": pd.Series([None] * len(pdf), dtype="object"),
                    "meta_sample_rate": pd.Series([None] * len(pdf), dtype="object"),
                }
            )

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


def synthesize_wav(doc_id: int) -> bytes:
    """Deterministic RIFF/WAVE 16-bit PCM for a doc id: 1–2 channels,
    one of three sample rates, 50–149 frames, every interleaved sample a
    pure integer function of (doc_id, position) — so a SQL oracle
    regenerates the exact sample stream the decoder must produce
    (RIFF/PCM is byte-exact; the full hash oracle the image lane has).
    Ids with doc_id % 4 == 1 get a LIST metadata chunk BEFORE data, so
    the decoder's chunk walk (not a fixed-offset read) stays exercised
    in CI."""
    import struct

    import numpy as np  # absolute import: resolvable on any worker

    n_ch = 1 + (doc_id % 2)
    rate = 8000 + 4000 * (doc_id % 3)
    n_frames = 50 + ((doc_id * 7) % 100)
    n = n_frames * n_ch
    idx = np.arange(n, dtype=np.int64)
    samples = ((doc_id * 2654435761 + idx * 48271) % 65536 - 32768).astype(
        "<i2"
    )
    data = samples.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16
    )
    chunks = [b"fmt " + struct.pack("<I", len(fmt)) + fmt]
    if doc_id % 4 == 1:
        info = b"INFOICMT" + struct.pack("<I", 5) + b"synth" + b"\x00"
        chunks.append(b"LIST" + struct.pack("<I", len(info)) + info)
    chunks.append(b"data" + struct.pack("<I", len(data)) + data)
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthetic_audio_corpus(documents: DataFrame) -> DataFrame:
    """One synthetic PCM WAV per document row (MEDIA_SCHEMA frame) — the
    audio sibling of synthetic_image_corpus: worker-side mapInPandas
    synthesis, binary payloads through Arrow, meta_sample_rate left NULL
    so decode must recover it from the fmt chunk, not the metadata."""
    _ship_module_by_value()
    ids = documents.select(F.col("doc_id").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "audio",
                    "payload": pdf["media_id"].map(
                        lambda i: synthesize_wav(int(i))
                    ),
                    "meta_width": pd.Series([None] * len(pdf), dtype="object"),
                    "meta_height": pd.Series([None] * len(pdf), dtype="object"),
                    "meta_sample_rate": pd.Series(
                        [None] * len(pdf), dtype="object"
                    ),
                }
            )

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


def synthesize_y4m(doc_id: int) -> bytes:
    """Deterministic YUV4MPEG2 stream for a doc id: even dims 8..16 x
    8..14 (4:2:0 requires both even), 3–7 frames, every planar byte
    (Y, then Cb, then Cr) a pure integer function of (doc_id, frame,
    position) — so a SQL oracle regenerates the exact plane stream the
    demuxer must produce (raw Y4M is byte-exact; the full hash oracle
    the image and audio lanes have). Ids with doc_id % 4 == 1 carry a
    vendor X tag in the stream header and ids with doc_id % 3 == 2
    carry FRAME parameters, so the decoder's tag WALK (not a
    fixed-offset read) stays exercised in CI."""
    import numpy as np  # absolute import: resolvable on any worker

    w = 8 + 2 * (doc_id % 5)
    h = 8 + 2 * ((doc_id * 3) % 4)
    n_frames = 3 + (doc_id % 5)
    frame_size = w * h + 2 * ((w // 2) * (h // 2))
    header = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg" % (w, h)
    if doc_id % 4 == 1:
        header += b" XSYNTH"  # vendor tag: the parser must skip, not choke
    marker = b"FRAME Xq\n" if doc_id % 3 == 2 else b"FRAME\n"
    idx = np.arange(frame_size, dtype=np.int64)
    parts = [header + b"\n"]
    for f in range(n_frames):
        parts.append(marker)
        parts.append(
            ((doc_id * 2654435761 + f * 69069 + idx * 40503) % 256)
            .astype(np.uint8)
            .tobytes()
        )
    return b"".join(parts)


def synthetic_video_corpus(documents: DataFrame) -> DataFrame:
    """One synthetic Y4M stream per document row (MEDIA_SCHEMA frame) —
    the video sibling of synthetic_image_corpus/synthetic_audio_corpus:
    worker-side mapInPandas synthesis, binary payloads through Arrow,
    meta dims left NULL so decode must recover geometry from the stream
    header, not the metadata."""
    _ship_module_by_value()
    ids = documents.select(F.col("doc_id").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "video",
                    "payload": pdf["media_id"].map(
                        lambda i: synthesize_y4m(int(i))
                    ),
                    "meta_width": pd.Series([None] * len(pdf), dtype="object"),
                    "meta_height": pd.Series([None] * len(pdf), dtype="object"),
                    "meta_sample_rate": pd.Series(
                        [None] * len(pdf), dtype="object"
                    ),
                }
            )

    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


VIDEO_STATS_SCHEMA = (
    "media_id long, frame_idx int, width int, height int, n_frames int, "
    "sum_luma long, n_dark int, n_bright int, sum_cb long, sum_cr long, "
    "mean_luma double"
)


def video_decode_stats(media: DataFrame, *, every_n: int = 2) -> DataFrame:
    """REAL video demux+decode per payload, one row per SAMPLED frame —
    the sample_frames one-to-many shape with a real demuxer in place of
    the fixed-size stub: parse the Y4M container (decode_y4m_py — tag
    walk, geometry from the codec not the metadata), keep every
    ``every_n``-th frame (the frame-sampling op a training pipeline
    actually runs: decoding every frame of 100 TB of video to embed 1/N
    of them is wasted decode), split the planar payload into Y/Cb/Cr,
    and aggregate integer-exact per-frame stats: sum_luma / n_dark
    (luma < 64) / n_bright (luma >= 192) over the Y plane, sum_cb /
    sum_cr over the chroma planes (pinning the plane OFFSETS — a
    de-interleave bug mismatches chroma sums even when luma survives),
    plus mean_luma as the one double division, emitted UNROUNDED (the
    image lane's half-case rationale). Row explosion happens inside the
    Arrow batch — mapInPandas per-partition iterator, no shuffle; demux
    runs at scan speed and skipped frames are never materialized as
    rows."""
    _ship_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, _, frames = decode_y4m_py(bytes(payload))
                y_size = w * h
                for fi in range(0, len(frames), every_n):
                    fr = np.frombuffer(frames[fi], dtype=np.uint8).astype(
                        np.int64
                    )
                    # two equal chroma planes follow Y in every planar
                    # layout the demuxer admits (mono: zero-length)
                    c_size = (len(fr) - y_size) // 2
                    y = fr[:y_size]
                    cb = fr[y_size : y_size + c_size]
                    cr = fr[y_size + c_size :]
                    s = int(y.sum())
                    rows.append(
                        (
                            mid,
                            fi,
                            w,
                            h,
                            len(frames),
                            s,
                            int((y < 64).sum()),
                            int((y >= 192).sum()),
                            int(cb.sum()),
                            int(cr.sum()),
                            float(s) / y_size,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "width", "height", "n_frames",
                    "sum_luma", "n_dark", "n_bright", "sum_cb", "sum_cr",
                    "mean_luma",
                ],
            )

    return media.mapInPandas(run, schema=VIDEO_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_frames int, "
    "sum_abs long, peak int, n_loud int, mean_abs double"
)


def audio_decode_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode per payload (the image_decode_stats contract
    applied to the audio lane): parse the RIFF container via the
    dependency-free decoder (decode_wav_py — chunk walk, fmt parse,
    little-endian PCM), recover rate/channels/frames from the CODEC not
    the metadata, and aggregate integer-exact sample stats: sum_abs /
    peak (max |s|) / n_loud (|s| >= 16384, the top-half amplitude), plus
    mean_abs as the one double division, emitted UNROUNDED (two exact
    integers through one IEEE division — the image lane's half-case
    rationale). mapInPandas per-partition iterator, no shuffle — decode
    runs at scan speed."""
    _ship_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, n_ch, samples = decode_wav_py(bytes(payload))
                s = np.asarray(samples, dtype=np.int64)
                a = np.abs(s)
                rows.append(
                    (
                        mid,
                        rate,
                        n_ch,
                        len(s) // n_ch,
                        int(a.sum()),
                        int(a.max()) if len(a) else 0,
                        int((a >= 16384).sum()),
                        float(a.sum()) / len(a) if len(a) else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_channels", "n_frames",
                    "sum_abs", "peak", "n_loud", "mean_abs",
                ],
            )

    return media.mapInPandas(run, schema=AUDIO_STATS_SCHEMA)


IMAGE_STATS_SCHEMA = (
    "media_id long, width int, height int, n_pixels int, sum_luma long, "
    "n_dark int, n_bright int, mean_luma double"
)


def image_decode_stats(media: DataFrame) -> DataFrame:
    """REAL image decode per payload: parse the codec (PNG/PPM/PGM/BMP via
    the dependency-free decoder — deterministic in every environment,
    deliberately NOT PIL even when present, so results never depend on
    what is installed), recover dims from the header, and aggregate pixel
    stats: integer-exact sum_luma / n_dark (luma < 64) / n_bright
    (luma >= 192), plus mean_luma as the one double division — emitted
    UNROUNDED: dividing two exact integers is one deterministic IEEE op
    in every engine, whereas round-to-6 hits half-case divergence
    (Python rounds half-even, DuckDB half-up; 16205/128 = ...5625 is a
    real corpus case). mapInPandas per-partition iterator, no shuffle —
    decode runs at scan speed."""
    _ship_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, pixels = decode_image_py(bytes(payload))
                px = np.asarray(pixels, dtype=np.int64)
                s = int(px.sum())
                rows.append(
                    (
                        mid,
                        w,
                        h,
                        len(pixels),
                        s,
                        int((px < 64).sum()),
                        int((px >= 192).sum()),
                        float(s) / len(pixels) if pixels else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_pixels", "sum_luma",
                    "n_dark", "n_bright", "mean_luma",
                ],
            )

    return media.mapInPandas(run, schema=IMAGE_STATS_SCHEMA)


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
