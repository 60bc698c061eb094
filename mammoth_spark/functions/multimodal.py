"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The pattern a 100 TB multimodal corpus needs: media travels as a
``binary`` column with a typed metadata struct beside it; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so each task streams record batches (bounded
memory) instead of materializing whole partitions.

The actual codecs (PIL/libav/etc.) are NOT in this container, so the
decode kernels are stubs: ``decode_image``/``decode_audio`` raise
NotImplementedError unless the caller passes a codec, and
``fake_feature_extractor`` is the deterministic stand-in used by tests —
the Spark-side plumbing (schemas, batch iteration, partitioning) is real
and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


class DecodedImage:
    """Lightweight decoded-image record returned by the stdlib PNG
    fallback (PIL returns its own Image object on the PIL path)."""

    __slots__ = ("width", "height", "mode", "pixels")

    def __init__(self, width: int, height: int, mode: str, pixels: bytes):
        self.width, self.height, self.mode, self.pixels = width, height, mode, pixels

    @property
    def size(self) -> tuple[int, int]:
        return (self.width, self.height)


def decode_image(content: bytes) -> object:
    """Image decode: PIL when the environment provides it; else the
    pure-stdlib PNG codec (functions/png.py — zlib + full filter set)
    for PNG payloads; else the disclosed NotImplementedError (this
    container ships no codecs for JPEG/WebP/...). The distributed
    plumbing (binaryFile ingest, Arrow batching, mapInPandas
    signatures) is real and tested either way — with genuine compressed
    pixels on the PNG path."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:
        from .png import PNG_SIG, png_decode  # noqa: PLC0415

        if content[:8] == PNG_SIG:
            w, h, mode, pixels = png_decode(content)
            return DecodedImage(w, h, mode, pixels)
        raise NotImplementedError(
            "no codec for this image format in this environment "
            "(PNG decodes via the stdlib codec; install pillow for others)"
        ) from exc
    import io

    return Image.open(io.BytesIO(content))


def decode_audio(content: bytes) -> object:
    """Audio decode behind an import-try: uses soundfile when available,
    else raises the disclosed NotImplementedError (no audio codecs in
    this container). Same real-plumbing / stub-kernel split as
    decode_image."""
    try:
        import soundfile  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "audio codec not available in this environment (install soundfile)"
        ) from exc
    import io

    return soundfile.read(io.BytesIO(content))


def fake_feature_extractor(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: md5-seeded floats.
    Lets the full distributed path run (and be asserted on) without codecs."""
    h = hashlib.md5(content).digest()
    return [((h[i % 16] / 255.0) * 2 - 1) for i in range(dim)]


def extract_features(
    media: DataFrame,
    extractor: Callable[[bytes], list[float]] = fake_feature_extractor,
    batch_size_hint: int = 512,
) -> DataFrame:
    """mapInPandas feature extraction over binary content.

    Arrow streams record batches through the Python worker; memory per
    task is one batch of binaries, never a whole partition — the shape
    that survives 100 MB videos. Repartition upstream to balance media
    sizes if a source is skewed (a handful of giant files per partition)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "content_hash": content.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "feature": content.map(
                        lambda b: extractor(b) if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("orig_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_hash", T.StringType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def fake_resize_kernel(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode->resize->re-encode: output bytes
    are the input digest cycled to the size a (width x height) thumbnail
    would plausibly occupy (capped by the original size — resizing down
    never grows the payload). Real pipelines plug PIL/turbojpeg via the
    ``kernel`` parameter of resize_images; this double keeps the
    distributed path runnable and byte-deterministic without codecs."""
    n = min(len(content), (width * height) // 64)
    digest = hashlib.md5(content).digest()
    return (digest * (n // 16 + 1))[:n]


def resize_images(
    media: DataFrame,
    width: int = 224,
    height: int = 224,
    kernel: Callable[[bytes, int, int], bytes] = fake_resize_kernel,
) -> DataFrame:
    """Batch image resize as Arrow-streamed ``mapInPandas``.

    Only ``media_type == 'image'`` rows are resized; the filter runs
    JVM-side BEFORE the Python stage so audio/video bytes never cross the
    Arrow boundary. Memory per task is one record batch of binaries —
    the shape that survives wide scans of 100 TB image corpora. The
    metadata columns (orig_hash, dims, n_bytes) are deterministic
    functions of the input, so the stage is oracle-checkable even though
    the re-encoded payload itself is opaque."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            resized = content.map(
                lambda b: kernel(b, width, height) if b is not None else None
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "orig_hash": content.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "width": width,
                    "height": height,
                    "n_bytes": resized.map(lambda b: len(b) if b is not None else 0),
                    "content": resized,
                }
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(run, RESIZED_SCHEMA)


def fake_frame_kernel(content: bytes, frame_idx: int) -> bytes:
    """Deterministic stand-in for a video frame grab: md5 over the
    payload plus the frame index. Real pipelines plug libav here."""
    return hashlib.md5(content + b":" + str(frame_idx).encode()).digest()


def sample_frames(
    media: DataFrame,
    fps: float = 1.0,
    max_frames: int = 5,
    kernel: Callable[[bytes, int], bytes] = fake_frame_kernel,
) -> DataFrame:
    """Uniform frame sampling from video rows: one OUTPUT row per sampled
    frame (``mapInPandas`` is an N:M mapping, so the explode happens
    inside the Python stage without a separate join).

    Frame count per video is ``clamp(duration_ms * fps / 1000, 1,
    max_frames)`` and frame i sits at ``floor(i * duration_ms / n)`` ms —
    both pure functions of the metadata, so count and timestamps are
    oracle-checkable; the grabbed frame bytes come from the kernel.
    Frame explosion multiplies rows, not payload bytes: each output
    frame is a decoded thumbnail, not a copy of the source video."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "frame_ts_ms": [],
                "frame_hash": [],
                "frame": [],
            }
            for mid, content, duration_ms in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                if content is None or duration_ms is None:
                    continue
                n = max(1, min(max_frames, int(duration_ms * fps / 1000)))
                for i in range(n):
                    frame = kernel(content, i)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * int(duration_ms) // n)
                    out["frame_hash"].append(
                        hashlib.md5(content + b":" + str(i).encode()).hexdigest()
                    )
                    out["frame"].append(frame)
            yield pd.DataFrame(out)

    videos = media.filter(F.col("media_type") == "video").select(
        "media_id", "content", F.col("meta.duration_ms").alias("duration_ms")
    )
    return videos.mapInPandas(run, FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-expression metadata stats (no Python): per media_type byte
    totals and dimension aggregates — the cheap pre-pass that plans the
    expensive decode stage (e.g., partition count by total bytes)."""
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length(F.col("content"))).alias("total_bytes"),
        F.max(F.length(F.col("content"))).alias("max_bytes"),
        F.avg(F.col("meta.width")).alias("avg_width"),
        F.avg(F.col("meta.height")).alias("avg_height"),
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: build a deterministic media table from the ``documents``
    fixture (text bytes as the binary payload) so the multimodal path has
    a driver-checkable input without real media files."""
    text_bytes = F.encode(F.col("text"), "utf-8")
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        text_bytes.alias("content"),
        F.struct(
            F.concat(F.lit("application/x-"), mt).alias("mime"),
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
    )
