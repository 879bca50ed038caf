"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow batches.

All three kinds are REAL end-to-end with stdlib only: ``attach_payload``
synthesizes fully valid minimal PNG files (signature, IHDR, zlib IDAT,
CRC-32 per chunk), PCM WAV files (RIFF/WAVE with a walked fmt chunk), and
animated GIF89a files as the video stand-in (logical screen descriptor,
NETSCAPE loop extension, N real LZW-coded frames, trailer), and
``decode_media_meta`` parses them back with ``struct.unpack`` -- no
PIL/imageio needed.  The GIF parser WALKS the block structure
(sub-block chains skipped), so frame counting cannot be fooled by 0x2C
bytes inside data.  The driver oracle closes the loop: decoded
width/height/channels/sample-rate/frame-count must equal the closed-form
generation parameters recomputed in SQL, so a malformed byte stream or a
wrong decoder offset fails the round trip.  ``frame_sample`` explodes the
REAL decoded frame count.  Only raster-pixel decoding
(``decode_pixels_real``) stays gated behind PIL.

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

_MIME = {"image": "image/png", "audio": "audio/wav", "video": "image/gif"}

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


# one 1x1 2-color GIF frame: image descriptor (left/top 0, 1x1, no local
# color table) + LZW data (min code size 2; codes clear(4), pixel(0),
# eoi(5) pack LSB-first into 0x44 0x01)
_GIF_FRAME = (
    b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + b"\x00"
    + b"\x02" + b"\x02\x44\x01" + b"\x00"
)


def make_gif(width: int, height: int, n_frames: int) -> bytes:
    """A valid animated GIF89a: logical screen descriptor with a 2-entry
    global color table, NETSCAPE looping extension, ``n_frames`` frames
    (each a graphics-control extension + a real 1x1 LZW-coded image --
    decoders render frames smaller than the screen), trailer."""
    lsd = struct.pack("<HH", width, height) + b"\x80\x00\x00"  # GCT, 2 entries
    gct = b"\x00\x00\x00\xff\xff\xff"
    netscape = b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    gce = b"\x21\xf9\x04\x00\x02\x00\x00\x00"  # 2cs delay per frame
    return (
        b"GIF89a" + lsd + gct + netscape
        + (gce + _GIF_FRAME) * n_frames
        + b"\x3b"
    )


def _video_params(n_text: int) -> tuple[int, int, int]:
    return n_text % 32 + 8, n_text % 24 + 6, n_text % 12 + 2


def attach_payload(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    on_null_id: str = "error",
) -> DataFrame:
    """Deterministic media table from a text corpus: REAL minimal PNG
    (doc_id%3==0) / PCM WAV (==1) / animated GIF (==2, the video stand-in
    -- a frame-structured container stdlib can both write and walk)
    payloads whose header parameters are closed-form functions of
    (utf-8 byte length, id).

    Media identity requires an id (inside the Arrow batch a null long
    arrives as NaN and int() would abort the task), so NULL-id rows
    cannot produce media.  ``on_null_id`` makes the loss OBSERVABLE
    instead of silent: ``"error"`` (default) fails the task with the
    per-batch null count in the message; ``"drop"`` opts into dropping
    them (the caller has decided null ids are expected).  NULL/NaN text
    generates an empty payload body."""
    if on_null_id not in ("error", "drop"):
        raise ValueError(f"on_null_id must be 'error' or 'drop', got {on_null_id!r}")

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = pdf[id_col].isna()
            if mask.any():
                if on_null_id == "error":
                    raise ValueError(
                        f"attach_payload: {int(mask.sum())} row(s) with NULL "
                        f"{id_col!r} in batch; media identity requires an id "
                        f"(pass on_null_id='drop' to drop them)"
                    )
                pdf = pdf[~mask]
            out_rows = []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                mid = int(mid)
                raw = (text if isinstance(text, str) else "").encode("utf-8")
                n_text = len(raw)
                kind = ("image", "audio", "video")[mid % 3]
                if kind == "image":
                    w, h = _image_dims(n_text)
                    payload = make_png(w, h, pixel_byte=mid)
                elif kind == "audio":
                    rate, ch, frames = _audio_params(n_text, mid)
                    payload = make_wav(rate, ch, frames)
                else:
                    w, h, frames = _video_params(n_text)
                    payload = make_gif(w, h, frames)
                out_rows.append(
                    (mid, kind, payload, _MIME[kind], len(payload))
                )
            yield pd.DataFrame(
                out_rows, columns=["media_id", "kind", "payload", "mime", "n_bytes"]
            )

    return (
        df.select(F.col(id_col).cast("long").alias(id_col), F.col(text_col))
        .mapInPandas(_gen, schema=MEDIA_SCHEMA)
    )


_META_FIELDS = [
    T.StructField("width", T.LongType(), True),
    T.StructField("height", T.LongType(), True),
    T.StructField("channels", T.LongType(), True),
    T.StructField("sample_rate", T.LongType(), True),
    T.StructField("bits_per_sample", T.LongType(), True),
    T.StructField("n_frames", T.LongType(), True),
]


def parse_gif_meta(b: bytes) -> tuple[int, int, int] | None:
    """(screen_width, screen_height, n_frames) from a GIF87a/89a stream by
    WALKING the block structure (extensions' sub-block chains are skipped,
    so an 0x2C byte inside data is never miscounted as a frame); None if
    malformed or truncated."""
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    width, height = struct.unpack("<HH", b[6:10])
    packed = b[10]
    off = 13
    if packed & 0x80:  # global color table: 3 * 2^(size+1) bytes
        off += 3 * (2 << (packed & 0x07))
    frames = 0

    def _skip_subblocks(o: int) -> int | None:
        while True:
            if o >= len(b):
                return None
            n = b[o]
            o += 1
            if n == 0:
                return o
            o += n

    while off < len(b):
        introducer = b[off]
        if introducer == 0x3B:  # trailer
            return width, height, frames
        if introducer == 0x21:  # extension: label byte + sub-blocks
            off = _skip_subblocks(off + 2)  # type: ignore[assignment]
            if off is None:
                return None
        elif introducer == 0x2C:  # image descriptor
            if off + 10 > len(b):
                return None
            ipacked = b[off + 9]
            off += 10
            if ipacked & 0x80:  # local color table
                off += 3 * (2 << (ipacked & 0x07))
            off += 1  # LZW minimum code size
            off = _skip_subblocks(off)  # type: ignore[assignment]
            if off is None:
                return None
            frames += 1
        else:
            return None
    return None  # ran off the end without a trailer


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
    bits_per_sample), GIF -> (width, height, n_frames -- counted by
    walking the block structure, not byte-scanning); unparseable payloads
    -> NULL metadata.  The Spark-side shape (column pruning keeps payload
    out of metadata-only plans; one Arrow batch per task) is the 100 TB
    pattern."""
    schema = T.StructType(list(df.schema.fields) + _META_FIELDS)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {f.name: [] for f in _META_FIELDS}
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                w = h = ch = rate = bits = frames = None
                png = parse_png_header(b)
                if png is not None:
                    w, h, ch = png
                else:
                    wav = parse_wav_header(b)
                    if wav is not None:
                        rate, ch, bits = wav
                    else:
                        gif = parse_gif_meta(b)
                        if gif is not None:
                            w, h, frames = gif
                for name, v in zip(
                    ("width", "height", "channels", "sample_rate",
                     "bits_per_sample", "n_frames"),
                    (w, h, ch, rate, bits, frames),
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


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Every ``every_n``-th frame of each video as (media_id, frame_idx)
    rows.  Accepts either a decoded frame (``n_frames`` column present,
    the REAL count parsed from the container) or a raw media frame (falls
    back to decoding inline)."""
    if "n_frames" not in df.columns:
        df = decode_media_meta(df)
    # >= 1, not isNotNull: a structurally valid zero-frame GIF (header +
    # trailer, no image descriptors) decodes to n_frames=0, and
    # sequence(0, -1, step) throws -- it must yield no rows instead
    return df.filter(
        (F.col("kind") == "video") & (F.col("n_frames") >= 1)
    ).select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), (F.col("n_frames") - 1).cast("int"), F.lit(every_n))
        ).alias("frame_idx"),
    )


def make_png_gradient(
    width: int, height: int, seed: int, level: int = 6
) -> bytes:
    """A valid 8-bit RGB PNG whose PIXEL CONTENT is a closed-form gradient
    of (seed, x, y) -- unlike ``make_png``'s flat fill, every pixel is
    individually determined, so a perceptual hash over it is non-trivial
    AND a SQL oracle can recompute it from the parameters without touching
    the bytes.  ``level`` picks the zlib effort: level-1 and level-9
    encodings of the same parameters are DIFFERENT BYTE STREAMS carrying
    identical pixels -- the re-encode case byte-level dedup is blind to."""
    rows = []
    for y in range(height):
        line = bytearray(b"\x00")  # filter type 0
        for x in range(width):
            line.append((seed + 3 * x + 7 * y) % 256)
            line.append((2 * seed + 5 * x + y) % 256)
            line.append((3 * seed + x + 11 * y) % 256)
        rows.append(bytes(line))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows), level))
        + _png_chunk(b"IEND", b"")
    )


def attach_gradient_images(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level_col: str | None = None,
    seed_mod: int = 17,
) -> DataFrame:
    """(media_id, payload, width, height, seed): one gradient PNG per row,
    dims from the text's utf-8 byte length (``_image_dims``), seed =
    id % ``seed_mod``.  ``level_col`` (optional int column) picks the
    zlib effort per row -- re-attaching the same logical image at a
    different level plants a byte-distinct pixel-identical re-encode."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            levels = pdf[level_col] if level_col else [6] * len(pdf)
            for mid, text, level in zip(pdf[id_col], pdf[text_col], levels):
                mid = int(mid)
                raw = (text if isinstance(text, str) else "").encode("utf-8")
                w, h = _image_dims(len(raw))
                seed = mid % seed_mod
                out.append(
                    (mid, make_png_gradient(w, h, seed, int(level)), w, h, seed)
                )
            yield pd.DataFrame(
                out, columns=["media_id", "payload", "width", "height", "seed"]
            )

    cols = [F.col(id_col).cast("long").alias(id_col), F.col(text_col)]
    if level_col:
        cols.append(F.col(level_col))
    return df.select(*cols).mapInPandas(
        _gen,
        schema=(
            "media_id long, payload binary, width long, height long, seed long"
        ),
    )


def _decode_png_rgb8_filter0(b: bytes) -> "np.ndarray":
    """Raster decode for the subset our encoders emit: 8-bit RGB, filter
    type 0 on every scanline -- stdlib zlib only.  General PNGs (other
    filters, palettes, interlace) are the documented PIL-gated extension
    point (``decode_pixels_real``); this decoder RAISES on them rather
    than guessing."""
    import numpy as np

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG stream")
    o, w, h, idat = 8, None, None, b""
    while o + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[o : o + 4])
        tag = b[o + 4 : o + 8]
        body = b[o + 8 : o + 8 + ln]
        if tag == b"IHDR":
            w, hh, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
            h = hh
            if (depth, ctype, interlace) != (8, 2, 0):
                raise NotImplementedError(
                    "only 8-bit RGB non-interlaced PNGs are decoded here; "
                    "palette/alpha/interlace need PIL (decode_pixels_real)"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        o += 12 + ln
    raw = zlib.decompress(idat)
    stride = 1 + w * 3
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    if (arr[:, 0] != 0).any():
        raise NotImplementedError(
            "non-zero PNG filter type; full defiltering needs PIL "
            "(decode_pixels_real)"
        )
    return arr[:, 1:].reshape(h, w, 3)


def image_ahash(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual average-hash over REAL pixel decodes: gray = r+g+b per
    pixel, 8x8 average-pool (pixel x belongs to cell x*8//w -- the exact
    rule the oracle mirrors), bit_k = cell mean >= global mean evaluated
    in INTEGER cross-multiplied form (cell_sum * total_cnt >= total_sum *
    cell_cnt -- no float mean, no engine drift), packed row-major
    (k = cell_y*8 + cell_x) into two 32-bit halves (ahash_hi, ahash_lo)
    so no signed-64 overflow anywhere.

    Byte-level dedup cannot pair a level-1 and a level-9 encode of the
    same photo; the aHash is identical by construction.  Images smaller
    than 8x8 on either axis raise (upsampling policy belongs to the
    caller).  Arrow-batched numpy throughout -- decode + pool are the
    unavoidable Python, everything after is DataFrame ops."""
    import numpy as np

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                px = _decode_png_rgb8_filter0(bytes(payload))
                h, w = px.shape[0], px.shape[1]
                if w < 8 or h < 8:
                    raise ValueError(f"image {mid}: {w}x{h} below 8x8 pool")
                gray = px.astype(np.int64).sum(axis=2)
                cx = (np.arange(w) * 8) // w
                cy = (np.arange(h) * 8) // h
                k = (cy[:, None] * 8 + cx[None, :]).ravel()
                sums = np.zeros(64, dtype=np.int64)
                cnts = np.zeros(64, dtype=np.int64)
                np.add.at(sums, k, gray.ravel())
                np.add.at(cnts, k, 1)
                total_sum, total_cnt = int(gray.sum()), w * h
                bits = (sums * total_cnt) >= (total_sum * cnts)
                lo = int(sum(1 << i for i in range(32) if bits[i]))
                hi = int(sum(1 << (i - 32) for i in range(32, 64) if bits[i]))
                out.append((int(mid), w, h, hi, lo))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "ahash_hi", "ahash_lo"]
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(payload_col)
    ).mapInPandas(
        _hash,
        schema="media_id long, width long, height long, ahash_hi long, ahash_lo long",
    )


def image_ahash_groups(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Re-encode dedup table: images grouped by exact perceptual hash --
    (ahash_hi, ahash_lo, n_images, min_id).  n_images > 1 = visually
    identical content under byte-distinct encodings (or true repeats);
    the pixel-level twin of md5-payload exact dedup.  Only (id, two
    longs) shuffle; payloads never leave the decode stage."""
    return (
        image_ahash(df, id_col, payload_col)
        .groupBy("ahash_hi", "ahash_lo")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.min(id_col).alias("min_id"),
        )
    )


def make_wav_tone(
    sample_rate: int, n_frames: int, seed: int, pad_list: bool = False
) -> bytes:
    """A valid mono 16-bit PCM WAV whose SAMPLES are the closed form
    ``((seed+1)*(i+7)*(i+13)) % 65536 - 32768`` -- per-sample content a
    SQL oracle can recompute, unlike ``make_wav``'s silence.
    ``pad_list=True`` inserts a LIST/INFO chunk between fmt and data:
    byte-DISTINCT container, identical PCM -- the tag-edited re-upload
    byte-level dedup cannot pair."""
    samples = bytearray()
    for i in range(n_frames):
        v = ((seed + 1) * (i + 7) * (i + 13)) % 65536 - 32768
        samples += struct.pack("<h", v)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if pad_list:
        info = b"INFOICMT" + struct.pack("<I", 12) + b"re-encoded \x00"
        body += b"LIST" + struct.pack("<I", len(info)) + info
    body += b"data" + struct.pack("<I", len(samples)) + bytes(samples)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _wav_pcm16(b: bytes) -> tuple[int, "np.ndarray"]:
    """(sample_rate, int64 sample array) from a mono 16-bit PCM WAV,
    walking chunks (LIST/INFO padding skipped like any other chunk).
    Raises on non-PCM / non-16-bit / multi-channel -- the scope our
    encoder emits; resampling/stereo-mix belong to a real audio lib."""
    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    off, rate, data = 12, None, None
    while off + 8 <= len(b):
        tag = b[off : off + 4]
        (size,) = struct.unpack("<I", b[off + 4 : off + 8])
        if tag == b"fmt ":
            fmt_code, ch, rate, _, _, bits = struct.unpack(
                "<HHIIHH", b[off + 8 : off + 24]
            )
            if (fmt_code, ch, bits) != (1, 1, 16):
                raise NotImplementedError(
                    "only mono 16-bit PCM is fingerprinted here; other "
                    "shapes need an audio library"
                )
        elif tag == b"data":
            data = b[off + 8 : off + 8 + size]
        off += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, np.frombuffer(data, dtype="<i2").astype(np.int64)


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_bands: int = 8,
) -> DataFrame:
    """Container-robust audio identity: decode the REAL PCM, split into
    ``n_bands`` equal time bands (sample i -> band i*n_bands//n, the
    same index rule as the image pool so the oracle mirrors it), sum
    |sample| per band as exact integers, fingerprint = md5 of the
    '-'-joined band sums.  Two files with identical PCM under different
    container metadata (LIST/INFO tags, re-muxing) share the
    fingerprint while their md5(payload) differ.  Arrow-batched numpy;
    only (id, rate, n, 32-byte fp) leave the decode stage."""
    import hashlib

    import numpy as np

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                rate, s = _wav_pcm16(bytes(payload))
                n = len(s)
                if n < n_bands:
                    raise ValueError(f"clip {mid}: {n} samples < {n_bands} bands")
                band = (np.arange(n) * n_bands) // n
                sums = np.zeros(n_bands, dtype=np.int64)
                np.add.at(sums, band, np.abs(s))
                fp = hashlib.md5(
                    "-".join(str(int(x)) for x in sums).encode()
                ).hexdigest()
                out.append((int(mid), rate, n, fp))
            yield pd.DataFrame(
                out, columns=["media_id", "sample_rate", "n_samples", "fingerprint"]
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(payload_col)
    ).mapInPandas(
        _fp,
        schema="media_id long, sample_rate long, n_samples long, fingerprint string",
    )


def audio_fingerprint_groups(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Re-upload dedup table for audio: clips grouped by PCM fingerprint
    -- (fingerprint, n_clips, min_id); the audio twin of
    ``image_ahash_groups``."""
    return (
        audio_fingerprint(df, id_col, payload_col)
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clips"),
            F.min(id_col).alias("min_id"),
        )
    )


def attach_tone_clips(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pad_col: str | None = None,
    seed_mod: int = 23,
) -> DataFrame:
    """(media_id, payload): one tone WAV per row -- n_samples from the
    text's utf-8 byte length (% 256 + 64), rate 8000, seed =
    id % ``seed_mod``; ``pad_col`` (optional bool column) inserts the
    LIST/INFO padding chunk, planting a byte-distinct PCM-identical
    re-upload."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            pads = pdf[pad_col] if pad_col else [False] * len(pdf)
            for mid, text, pad in zip(pdf[id_col], pdf[text_col], pads):
                mid = int(mid)
                raw = (text if isinstance(text, str) else "").encode("utf-8")
                n = len(raw) % 256 + 64
                out.append(
                    (mid, make_wav_tone(8000, n, mid % seed_mod, pad_list=bool(pad)))
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    cols = [F.col(id_col).cast("long").alias(id_col), F.col(text_col)]
    if pad_col:
        cols.append(F.col(pad_col))
    return df.select(*cols).mapInPandas(
        _gen, schema="media_id long, payload binary"
    )
