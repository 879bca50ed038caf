"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow batches.

The container has no image/audio libraries, so the actual decoders are
STUBS (clearly marked): ``decode_image_meta`` computes deterministic fake
dimensions from the payload bytes, and ``decode_image_real`` raises
NotImplementedError unless PIL is importable.  Everything Spark-side --
schema, binary handling, mapInPandas batch shape, partition sizing -- is
real and tested; swapping in a real decoder touches one function.

At 100 TB scale the pattern is: keep payloads in their own column/file
group (parquet column pruning means metadata queries never read them),
process with mapInPandas so each task streams Arrow batches, and size
``spark.sql.files.maxPartitionBytes`` so a batch of payloads fits executor
memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table from a text corpus: payload =
    UTF-8 bytes of the text (stands in for image bytes)."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def fake_dims(n_bytes: Column) -> Column:
    """Deterministic stand-in for decoded image dimensions."""
    return F.struct(
        (n_bytes % 64 + 16).cast("long").alias("width"),
        (n_bytes % 48 + 12).cast("long").alias("height"),
        F.lit(3).cast("long").alias("channels"),
    )


def decode_image_meta(df: DataFrame) -> DataFrame:
    """STUB decoder, Arrow-batched: derives (width, height, channels) from
    payload length.  Replace the body of ``_decode`` with PIL/imageio for
    real decoding -- the mapInPandas plumbing stays identical."""

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("width", T.LongType(), True),
            T.StructField("height", T.LongType(), True),
            T.StructField("channels", T.LongType(), True),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sizes = pdf["payload"].map(lambda b: len(b) if b is not None else 0)
            pdf["width"] = (sizes % 64 + 16).astype("int64")
            pdf["height"] = (sizes % 48 + 12).astype("int64")
            pdf["channels"] = 3
            yield pdf

    return df.mapInPandas(_decode, schema=schema)


def decode_image_real(df: DataFrame) -> DataFrame:
    """Real decoder -- requires an image library not present in this
    container."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires PIL/Pillow; this container ships none. "
            "Use decode_image_meta (deterministic stub) instead."
        ) from e
    raise NotImplementedError("wire PIL.Image.open over payload bytes here")


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling stub: emits (media_id, frame_idx) rows for
    every_n-th fake frame; frame count derived from payload size."""
    n_frames = (F.col("n_bytes") / 1000 + 1).cast("int")
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
