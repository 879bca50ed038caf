"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow batches.

Image and audio are REAL end-to-end with stdlib only: ``attach_payload``
synthesizes fully valid minimal PNG files (signature, IHDR, zlib IDAT,
CRC-32 per chunk) and PCM WAV files (RIFF/WAVE with a walked fmt chunk),
and ``decode_media_meta`` parses the headers back with ``struct.unpack``
-- no PIL/imageio needed.  The driver oracle closes the loop: the decoded
width/height/channels/sample-rate must equal the closed-form generation
parameters recomputed in SQL, so a malformed byte stream or a wrong
decoder offset fails the round trip.

Video remains an opaque STUB (no stdlib container format): payload bytes
are deterministic, metadata columns are NULL, and ``frame_sample`` derives
fake frame counts from payload size.  ``decode_pixels_real`` stays gated
behind PIL for actual raster decoding.

At 100 TB scale the pattern is: keep payloads in their own column/file
group (parquet column pruning means metadata queries never read them),
process with mapInPandas so each task streams Arrow batches, and size
``spark.sql.files.maxPartitionBytes`` so a batch of payloads fits executor
memory.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
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

_MIME = {"image": "image/png", "audio": "audio/wav", "video": "application/octet-stream"}

# PNG color type -> samples per pixel (PNG spec, 11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def make_png(width: int, height: int, pixel_byte: int = 0) -> bytes:
    """A fully valid 8-bit RGB PNG: signature + IHDR + zlib IDAT (filter
    byte 0 per scanline) + IEND, every chunk CRC'd."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = (b"\x00" + bytes([pixel_byte % 256]) * (width * 3)) * height
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def make_wav(sample_rate: int, channels: int, n_frames: int, bits: int = 16) -> bytes:
    """A valid PCM WAV file of silence (RIFF/WAVE + fmt + data chunks)."""
    block_align = channels * bits // 8
    data = b"\x00" * (n_frames * block_align)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


# closed-form generation parameters (the oracle recomputes these in SQL
# from the documents table -- decode(generate(params)) == params is the
# round-trip proof)
def _image_dims(n_text: int) -> tuple[int, int]:
    return n_text % 64 + 16, n_text % 48 + 12


def _audio_params(n_text: int, media_id: int) -> tuple[int, int, int]:
    return 8000 + (n_text % 8) * 1000, 1 + media_id % 2, n_text % 32 + 1


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table from a text corpus: REAL minimal PNG
    (doc_id%3==0) / PCM WAV (==1) payloads whose header parameters are
    closed-form functions of (utf-8 byte length, id); video (==2) stays an
    opaque deterministic byte string."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                mid = int(mid)
                raw = (text or "").encode("utf-8")
                n_text = len(raw)
                kind = ("image", "audio", "video")[mid % 3]
                if kind == "image":
                    w, h = _image_dims(n_text)
                    payload = make_png(w, h, pixel_byte=mid)
                elif kind == "audio":
                    rate, ch, frames = _audio_params(n_text, mid)
                    payload = make_wav(rate, ch, frames)
                else:
                    payload = raw
                out_rows.append(
                    (mid, kind, payload, _MIME[kind], len(payload))
                )
            yield pd.DataFrame(
                out_rows, columns=["media_id", "kind", "payload", "mime", "n_bytes"]
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).mapInPandas(_gen, schema=MEDIA_SCHEMA)


_META_FIELDS = [
    T.StructField("width", T.LongType(), True),
    T.StructField("height", T.LongType(), True),
    T.StructField("channels", T.LongType(), True),
    T.StructField("sample_rate", T.LongType(), True),
    T.StructField("bits_per_sample", T.LongType(), True),
]


def parse_png_header(b: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) from a PNG byte stream, validating the
    signature and the IHDR CRC; None if not a well-formed PNG header."""
    if len(b) < 33 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    (ihdr_len,) = struct.unpack(">I", b[8:12])
    if ihdr_len != 13:
        return None
    (crc,) = struct.unpack(">I", b[29:33])
    if zlib.crc32(b[12:29]) & 0xFFFFFFFF != crc:
        return None
    width, height = struct.unpack(">II", b[16:24])
    color_type = b[25]
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None:
        return None
    return width, height, channels


def parse_wav_header(b: bytes) -> tuple[int, int, int] | None:
    """(sample_rate, channels, bits_per_sample) from a RIFF/WAVE stream,
    walking chunks to the fmt chunk; None if malformed."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    off = 12
    while off + 8 <= len(b):
        tag = b[off : off + 4]
        (size,) = struct.unpack("<I", b[off + 4 : off + 8])
        if tag == b"fmt " and off + 8 + 16 <= len(b):
            _fmt, channels, rate, _bps, _align, bits = struct.unpack(
                "<HHIIHH", b[off + 8 : off + 24]
            )
            return rate, channels, bits
        off += 8 + size + (size & 1)  # chunks are word-aligned
    return None


def decode_media_meta(df: DataFrame) -> DataFrame:
    """REAL stdlib header decode, Arrow-batched via mapInPandas: PNG ->
    (width, height, channels), WAV -> (sample_rate, channels,
    bits_per_sample); video / unparseable payloads -> NULL metadata.
    The Spark-side shape (column pruning keeps payload out of metadata-only
    plans; one Arrow batch per task) is the 100 TB pattern."""
    schema = T.StructType(list(df.schema.fields) + _META_FIELDS)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {f.name: [] for f in _META_FIELDS}
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                w = h = ch = rate = bits = None
                png = parse_png_header(b)
                if png is not None:
                    w, h, ch = png
                else:
                    wav = parse_wav_header(b)
                    if wav is not None:
                        rate, ch, bits = wav
                for name, v in zip(
                    ("width", "height", "channels", "sample_rate", "bits_per_sample"),
                    (w, h, ch, rate, bits),
                ):
                    cols[name].append(v)
            for name, vals in cols.items():
                pdf[name] = pd.array(vals, dtype="Int64")
            yield pdf

    return df.mapInPandas(_decode, schema=schema)


# back-compat alias (round-1/2 name; the decoder is no longer a stub)
decode_image_meta = decode_media_meta


def decode_pixels_real(df: DataFrame) -> DataFrame:
    """Full raster decode -- requires an image library not present in this
    container.  Header metadata needs no library: use decode_media_meta."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "pixel decoding requires PIL/Pillow; this container ships none. "
            "decode_media_meta parses PNG/WAV headers with stdlib only."
        ) from e
    raise NotImplementedError("wire PIL.Image.open over payload bytes here")


# back-compat alias
decode_image_real = decode_pixels_real


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
