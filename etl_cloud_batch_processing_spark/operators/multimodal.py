"""NS5 — multimodal (image/audio/video) column support.

Convention (SURVEY.md §2.12 NS5): a modality column is an opaque
``binary`` payload plus a typed metadata struct
``struct<uri string, mime string, n_bytes bigint>``.  All Spark-side
plumbing — schema, partition-friendly layout, Arrow-batched UDF
signatures — is real and tested; only the *decode* step is stubbed,
because no image/audio codec libraries exist in this environment:

* :func:`decode_image` raises ``NotImplementedError`` (the clearly-marked
  integration point for a real ``PIL``/``cv2`` decode);
* :func:`fake_decode_features` is the deterministic stand-in used by
  tests and the registered query — byte-level statistics any engine can
  reproduce, flowing through the exact ``mapInPandas`` batch path a real
  decoder would use.

At 100 TB: payloads stay in executor memory one Arrow batch at a time
(``maxRecordsPerBatch`` bounds peak usage); feature extraction is
embarrassingly parallel; metadata-only queries never touch payload bytes
thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_cloud_batch_processing_spark.plans.registry import query, table

if TYPE_CHECKING:
    import pandas as pd

MEDIA_META = StructType([
    StructField("uri", StringType()),
    StructField("mime", StringType()),
    StructField("n_bytes", LongType()),
])

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("meta", MEDIA_META),
    StructField("content", BinaryType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("byte_mean", DoubleType()),
    StructField("byte_min", LongType()),
    StructField("byte_max", LongType()),
    StructField("histogram4", ArrayType(LongType())),
])


def attach_media(docs: DataFrame, mime: str = "text/plain") -> DataFrame:
    """Wrap a text corpus in the media convention: UTF-8 payload bytes +
    metadata struct.  Stands in for an ingest that reads real media
    files (``spark.read.format("binaryFile")`` produces the same shape:
    path/length metadata + content bytes)."""
    content = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.struct(
            F.concat(F.lit("corpus://documents/"), F.col("doc_id"))
             .alias("uri"),
            F.lit(mime).alias("mime"),
            F.length(content).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
        content.alias("content"),
    )


def decode_image(content: bytes):  # pragma: no cover - by design
    """Real image decode — requires PIL/cv2, absent in this container.
    STUB (SURVEY.md §2.12): replace the body with e.g.
    ``PIL.Image.open(io.BytesIO(content))`` in a real deployment."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "environment; use fake_decode_features for the plumbing path")


def resize_image(content: bytes, width: int,
                 height: int) -> bytes:  # pragma: no cover - by design
    """Real image resize — decode → resample → re-encode, requires an
    image library.  STUB: a deployment wraps this in the same
    ``mapInPandas`` batch shape as :func:`make_fake_decoder` (binary in,
    binary out, schema ``media_id bigint, content binary``)."""
    raise NotImplementedError(
        "image resizing requires an image library not present in this "
        "environment; the mapInPandas plumbing it plugs into is "
        "extract_features/make_frame_sampler")


def make_fake_decoder():
    """Deterministic stand-in decoder with the exact shape of a real
    one: consumes Arrow batches of (media_id, content), emits per-item
    byte statistics + a fixed-size feature vector (here a 4-bin byte
    histogram; a real decoder would emit pixels/frames/spectrograms).

    Built as a closure so cloudpickle ships it by value — Python workers
    need no import path to this package (the driver harness runs from an
    arbitrary cwd).
    """
    columns = [f.name for f in FEATURE_SCHEMA]

    def fake_decode_features(batches: "Iterator[pd.DataFrame]",
                             ) -> "Iterator[pd.DataFrame]":
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                b = np.frombuffer(bytes(content), dtype=np.uint8)
                hist = np.bincount(b >> 6, minlength=4)
                out.append((int(media_id), int(b.size), float(b.mean()),
                            int(b.min()), int(b.max()),
                            [int(x) for x in hist]))
            yield pd.DataFrame(out, columns=columns)

    return fake_decode_features


def extract_features(media: DataFrame,
                     parallelism: int | None = None) -> DataFrame:
    """The mapInPandas decode pass: payload bytes → features, one Arrow
    batch at a time, driver never sees a payload.

    Decode is Python-bound, so parallelism = concurrent Python workers;
    a single-file source would otherwise run one worker.  Repartition to
    the cluster's core count before the UDF (cheap round-robin of
    payload bytes vs. serial decode; at 100 TB the source is many files
    and this becomes a no-op)."""
    if parallelism is None:
        parallelism = media.sparkSession.sparkContext.defaultParallelism
    return (media.select("media_id", "content")
            .repartition(parallelism)
            .mapInPandas(make_fake_decoder(), schema=FEATURE_SCHEMA))


@query(
    "multimodal_manifest",
    oracle="""
    SELECT doc_id AS media_id,
           'corpus://documents/' || CAST(doc_id AS VARCHAR) AS uri,
           'text/plain' AS mime,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media manifest over the binary convention: metadata projection +
    payload checksum.  Metadata fields come from the struct column (at
    scale: parquet reads prune the payload column entirely); the md5
    proves the binary payload round-trips byte-identically."""
    media = attach_media(table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        F.col("meta.uri").alias("uri"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


@query("multimodal_byte_features")  # rows-only: exercises the Arrow/
def multimodal_byte_features(spark: SparkSession,                 # pandas
                             sf_dir: str) -> DataFrame:           # path
    """Feature extraction through the real mapInPandas decode path with
    the deterministic fake decoder.  The histogram is exploded to scalar
    columns so downstream joins/filters stay columnar."""
    media = attach_media(table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select(
        "media_id", "n_bytes",
        F.round("byte_mean", 6).alias("byte_mean"),
        "byte_min", "byte_max",
        F.element_at("histogram4", 1).alias("h0"),
        F.element_at("histogram4", 2).alias("h1"),
        F.element_at("histogram4", 3).alias("h2"),
        F.element_at("histogram4", 4).alias("h3"),
    )


# --------------------------------------------------------------------------
# Frame sampling (video-style): every k-th fixed-size frame of a payload.
# --------------------------------------------------------------------------

FRAME_BYTES = 64
FRAME_STRIDE = 4

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("frame_md5", StringType()),
])


def sample_frames(content: bytes) -> list[tuple[int, bytes]]:
    """Frame sampler over an opaque payload: fixed FRAME_BYTES frames,
    every FRAME_STRIDE-th kept.  For real video this is where a
    keyframe/GOP-aware demuxer plugs in (same (idx, bytes) contract);
    the byte-slicing stand-in keeps the contract testable without
    codec libraries."""
    n_frames = (len(content) + FRAME_BYTES - 1) // FRAME_BYTES
    return [(i, content[i * FRAME_BYTES:(i + 1) * FRAME_BYTES])
            for i in range(0, n_frames, FRAME_STRIDE)]


def make_frame_sampler():
    """mapInPandas generator: one payload row → one row per sampled
    frame (a fan-out UDF — mapInPandas allows output cardinality ≠
    input cardinality, which scalar pandas_udfs don't)."""

    def sampler(batches: "Iterator[pd.DataFrame]",
                ) -> "Iterator[pd.DataFrame]":
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                for idx, frame in sample_frames(bytes(content)):
                    out.append((int(media_id), idx,
                                hashlib.md5(frame).hexdigest()))
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SCHEMA])

    return sampler


@query(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id AS media_id, i AS frame_idx,
           md5(substring(text, i * {FRAME_BYTES} + 1, {FRAME_BYTES}))
               AS frame_md5
    FROM documents,
         UNNEST(range(0, CAST(ceil(length(text) / {FRAME_BYTES}.0)
                              AS BIGINT), {FRAME_STRIDE})) AS t(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through mapInPandas with fan-out: payload → md5
    per sampled frame.  Oracle-checkable because the fixture payloads
    are ASCII (byte slice ≡ char slice); a real video path swaps only
    the sampler body.  At 100 TB the pass is embarrassingly parallel
    and emits fixed-width rows regardless of payload size."""
    media = attach_media(table(spark, sf_dir, "documents"))
    par = spark.sparkContext.defaultParallelism
    return (media.select("media_id", "content")
            .repartition(par)
            .mapInPandas(make_frame_sampler(), schema=FRAME_SCHEMA))
