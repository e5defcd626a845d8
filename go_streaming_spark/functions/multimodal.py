"""Multimodal (image/audio/video) column support.

Design: media payloads are opaque ``BINARY`` columns + a typed metadata
struct; heavy per-item work (decode / feature-extract / resize / frame
sample) runs as Arrow-batched ``mapInPandas`` so each Python worker touches
a partition-sized batch, never a row at a time.

Two decode tiers:

* **Container/header decode is REAL**: :func:`parse_media_header` reads
  PNG / JPEG / GIF / BMP / WAV bytes directly (format sniff, dimensions,
  bit depth, audio duration) with no external libraries, and
  :func:`decode_media_meta` runs it Arrow-batched over a binary column.
* **Content decode is REAL for every container this module can decode
  without an external codec**: BMP pixel bytes and WAV PCM (pure byte
  arithmetic), PNG (stdlib ``zlib`` inflate + full scanline defilter),
  GIF (pure-Python LZW) — see :func:`content_stats`.  Only the
  feature-vector tier over codec-bound formats (JPEG DCT) is stubbed:
  the Spark-side plumbing — schema, partitioning, UDF signature, batch
  shape — is real and tested; ``decoder=`` accepts a real implementation
  when Pillow / torchaudio / ffmpeg are available.

Scale notes: binary payloads make rows wide — keep
``spark.sql.files.maxPartitionBytes`` small enough that a partition of
payloads fits executor memory, and project metadata-only when the pipeline
stage doesn't need bytes (the schema split below makes Parquet column
pruning do this for free).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_streaming_spark.functions.util import spread

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_media(
    df: DataFrame,
    payload_col: str,
    media_type: str = "image",
    fmt: str = "bin",
) -> DataFrame:
    """Wrap a binary column into the engine's media convention:
    ``media BINARY`` + ``media_meta STRUCT`` (sizes filled from the payload,
    dimensions left NULL until a real decode)."""
    payload = F.col(payload_col).cast("binary")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.length(payload).cast("long").alias("n_bytes"),
    )
    return df.withColumn("media", payload).withColumn("media_meta", meta)


def parse_media_header(payload: bytes) -> dict:
    """REAL byte-level container decode — no external libraries.

    Sniffs the format from magic bytes and reads the header fields the
    container actually stores:

    * **PNG**  — IHDR chunk: width/height (big-endian u32), bit depth.
    * **JPEG** — marker walk (skipping APPn/COM/DQT... by their stored
      lengths, tolerating restart markers) to the first SOF frame header:
      sample precision, height, width.
    * **GIF**  — 87a/89a logical screen descriptor: width/height (LE u16),
      bit depth from the color-resolution bits.
    * **BMP**  — BITMAPINFOHEADER: width/height (LE i32), bit count.
    * **WAV**  — RIFF chunk walk: ``fmt `` (channels, sample rate, byte
      rate, bits per sample) + ``data`` size → duration_ms =
      data_bytes * 1000 // byte_rate.
    * **AVI**  — RIFF ``LIST hdrl`` → ``avih`` main header: width/height,
      duration_ms = µs-per-frame × total frames // 1000 (the video
      modality's container tier).

    Returns ``{media_type, format, width, height, bit_depth, duration_ms}``
    with ``format=None`` (all fields None) for unrecognized or truncated
    payloads — malformed bytes must degrade to NULL metadata, not raise,
    because one bad blob in a 100 TB scan must not kill the stage.
    """
    none = {
        "media_type": None, "format": None, "width": None,
        "height": None, "bit_depth": None, "duration_ms": None,
    }
    p = payload or b""
    try:
        if p.startswith(b"\x89PNG\r\n\x1a\n"):
            if len(p) >= 26 and p[12:16] == b"IHDR":
                return {
                    "media_type": "image", "format": "png",
                    "width": int.from_bytes(p[16:20], "big"),
                    "height": int.from_bytes(p[20:24], "big"),
                    "bit_depth": p[24], "duration_ms": None,
                }
            return none
        if p[:2] == b"\xff\xd8":  # JPEG SOI
            i = 2
            while i + 4 <= len(p):
                if p[i] != 0xFF:
                    break
                marker = p[i + 1]
                if marker == 0xFF:      # fill byte
                    i += 1
                    continue
                if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                    i += 2              # standalone marker, no length
                    continue
                seglen = int.from_bytes(p[i + 2:i + 4], "big")
                if seglen < 2:
                    break
                # SOF0..SOF15 excluding DHT/JPG/DAC pseudo-markers
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    if i + 9 <= len(p):
                        return {
                            "media_type": "image", "format": "jpeg",
                            "width": int.from_bytes(p[i + 7:i + 9], "big"),
                            "height": int.from_bytes(p[i + 5:i + 7], "big"),
                            "bit_depth": p[i + 4], "duration_ms": None,
                        }
                    return none
                i += 2 + seglen
            return none
        if p[:6] in (b"GIF87a", b"GIF89a"):
            if len(p) >= 11:
                packed = p[10]
                return {
                    "media_type": "image", "format": "gif",
                    "width": int.from_bytes(p[6:8], "little"),
                    "height": int.from_bytes(p[8:10], "little"),
                    "bit_depth": ((packed >> 4) & 0x07) + 1,
                    "duration_ms": None,
                }
            return none
        if p[:2] == b"BM" and len(p) >= 30:
            return {
                "media_type": "image", "format": "bmp",
                "width": int.from_bytes(p[18:22], "little", signed=True),
                "height": abs(int.from_bytes(p[22:26], "little", signed=True)),
                "bit_depth": int.from_bytes(p[28:30], "little"),
                "duration_ms": None,
            }
        if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
            # LIST hdrl → avih: µs/frame, total frames, ..., width, height
            i = 12
            while i + 8 <= len(p):
                cid = p[i:i + 4]
                csize = int.from_bytes(p[i + 4:i + 8], "little")
                if cid == b"LIST" and p[i + 8:i + 12] == b"hdrl":
                    j = i + 12
                    if p[j:j + 4] == b"avih" and j + 48 <= len(p):
                        uspf = int.from_bytes(p[j + 8:j + 12], "little")
                        frames = int.from_bytes(p[j + 24:j + 28], "little")
                        return {
                            "media_type": "video", "format": "avi",
                            "width": int.from_bytes(p[j + 40:j + 44], "little"),
                            "height": int.from_bytes(p[j + 44:j + 48], "little"),
                            "bit_depth": None,
                            "duration_ms": (
                                uspf * frames // 1000 if uspf else None
                            ),
                        }
                    return none
                i += 8 + csize + (csize & 1)
            return none
        if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            i, bits, byte_rate, data_size = 12, None, None, None
            while i + 8 <= len(p):
                cid = p[i:i + 4]
                csize = int.from_bytes(p[i + 4:i + 8], "little")
                if cid == b"fmt " and i + 24 <= len(p):
                    byte_rate = int.from_bytes(p[i + 16:i + 20], "little")
                    bits = int.from_bytes(p[i + 22:i + 24], "little")
                elif cid == b"data":
                    data_size = csize
                i += 8 + csize + (csize & 1)  # chunks are word-aligned
            if byte_rate:
                return {
                    "media_type": "audio", "format": "wav",
                    "width": None, "height": None, "bit_depth": bits,
                    "duration_ms": (
                        data_size * 1000 // byte_rate
                        if data_size is not None else None
                    ),
                }
            return none
    except (IndexError, ValueError):
        return none
    return none


DECODED_META_SCHEMA = (
    "id long, media_type string, format string, width int, height int,"
    " bit_depth int, duration_ms long, n_bytes long"
)


def decode_media_meta(
    df: DataFrame, id_col: str, media_col: str = "media"
) -> DataFrame:
    """Arrow-batched REAL header decode over a binary media column: one flat
    row of container metadata per item (``DECODED_META_SCHEMA``).

    ``mapInPandas`` over a two-column projection — at 100 TB the narrow
    select means Parquet reads only (id, payload), and each Python worker
    parses a partition-sized batch of headers (a few hundred bytes each
    touched, not the full payload)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        # local def: cloudpickle ships the parser by value (executor
        # workers can't be assumed to have this package importable)
        parse = parse_media_header

        for pdf in batches:
            metas = [
                parse(bytes(b) if b is not None else b"")
                for b in pdf["_media"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["_id"],
                    "media_type": [m["media_type"] for m in metas],
                    "format": [m["format"] for m in metas],
                    "width": pd.array(
                        [m["width"] for m in metas], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m["height"] for m in metas], dtype="Int32"
                    ),
                    "bit_depth": pd.array(
                        [m["bit_depth"] for m in metas], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [m["duration_ms"] for m in metas], dtype="Int64"
                    ),
                    "n_bytes": [
                        len(b) if b is not None else 0 for b in pdf["_media"]
                    ],
                }
            )

    narrow = spread(df).select(
        F.col(id_col).alias("_id"), F.col(media_col).cast("binary").alias("_media")
    )
    return narrow.mapInPandas(run, DECODED_META_SCHEMA)


def decode_media(
    df: DataFrame, id_col: str, media_col: str = "media"
) -> DataFrame:
    """Refresh the ``media_meta`` struct from a REAL header parse: joins the
    decoded fields back onto the media rows by id (broadcast-free — both
    sides share the id key) and rebuilds the convention struct with
    dimensions/duration filled where the container provided them."""
    decoded = decode_media_meta(df, id_col, media_col)
    keep = df.drop("media_meta")
    out = keep.join(decoded.withColumnRenamed("id", "__mid"),
                    F.col(id_col) == F.col("__mid"), "left")
    meta = F.struct(
        F.col("media_type"),
        F.col("format"),
        F.col("width"),
        F.col("height"),
        F.col("duration_ms"),
        F.col("n_bytes"),
    )
    return out.withColumn("media_meta", meta).drop(
        "__mid", "media_type", "format", "width", "height", "bit_depth",
        "duration_ms", "n_bytes"
    )


def _be_hex(col, nbytes: int):
    """Big-endian fixed-width hex of a non-negative integral column."""
    return F.lpad(F.hex(col.cast("long")), 2 * nbytes, "0")


def _le_hex(col, nbytes: int):
    """Little-endian fixed-width hex: byte-reverse the big-endian form."""
    be = _be_hex(col, nbytes)
    return F.concat(
        *[F.substring(be, 2 * i - 1, 2) for i in range(nbytes, 0, -1)]
    )


def synthesize_payloads(
    df: DataFrame, id_col: str, body_col: str
) -> DataFrame:
    """Deterministic multimodal test-payload generator: wraps each row's
    ``body_col`` text bytes in a REAL container header — PNG (id%3==0),
    JPEG (id%3==1) or WAV (id%3==2) — with dimensions / sample rates
    derived from the id.  Entirely JVM-side (hex concat + ``unhex``), so
    the generator adds no Python cost; it exists to exercise
    :func:`parse_media_header` against structurally-valid bytes in
    environments with no media fixtures.

    Field formulas (mirrored by the gate oracle): width = 16 + id % 317,
    height = 16 + id % 211, bit depth 8 (images); channels = 1 + id % 2,
    sample rate = 8000 + (id % 5) * 2000, 16-bit samples, data size =
    byte length of the body (audio).
    """
    _id = F.col(id_col)
    body = F.encode(F.col(body_col), "UTF-8")
    body_hex = F.hex(body)
    blen = F.length(body)
    w = (F.lit(16) + _id % 317).cast("long")
    h = (F.lit(16) + _id % 211).cast("long")

    png = F.concat(
        F.lit("89504E470D0A1A0A"),           # signature
        F.lit("0000000D49484452"),           # IHDR length + type
        _be_hex(w, 4), _be_hex(h, 4),
        F.lit("08"),                         # bit depth
        F.lit("02000000"),                   # truecolor, deflate, none, none
        F.lit("DEADBEEF"),                   # CRC (not validated by parsers)
        body_hex,
    )
    jpeg = F.concat(
        F.lit("FFD8"),                                       # SOI
        F.lit("FFE000104A46494600010100000048004800"),       # APP0 (16B)
        F.lit("FFC0001108"),                                 # SOF0, len 17, prec 8
        _be_hex(h, 2), _be_hex(w, 2),                        # height, width
        F.lit("03011100021101031101"),                       # 3 components
        body_hex,
    )
    wav = _wav_payload_hex(_id, body_hex, blen)
    payload = (
        F.when(_id % 3 == 0, png).when(_id % 3 == 1, jpeg).otherwise(wav)
    )
    return df.withColumn("media", F.unhex(payload))


def _wav_payload_hex(_id, body_hex, blen):
    """Hex of a real RIFF/WAVE container whose ``data`` chunk is the body
    bytes verbatim (= the PCM stream: raw 16-bit LE samples)."""
    channels = (F.lit(1) + _id % 2).cast("long")
    rate = (F.lit(8000) + (_id % 5) * 2000).cast("long")
    byte_rate = rate * channels * 2
    return F.concat(
        F.lit("52494646"), _le_hex(F.lit(36) + blen, 4),     # RIFF, size
        F.lit("57415645"),                                   # WAVE
        F.lit("666D7420"), F.lit("10000000"), F.lit("0100"), # fmt , 16, PCM
        _le_hex(channels, 2), _le_hex(rate, 4),
        _le_hex(byte_rate, 4), _le_hex(channels * 2, 2),     # block align
        F.lit("1000"),                                       # 16 bits/sample
        F.lit("64617461"), _le_hex(blen, 4),                 # data, size
        body_hex,
    )


def synthesize_payloads_raw(
    df: DataFrame, id_col: str, body_col: str
) -> DataFrame:
    """Deterministic UNCOMPRESSED multimodal payloads — the containers whose
    *content* (not just header) is decodable with pure byte arithmetic:

    * **BMP** (id%2==0): 24-bit, width 8 (stride 24 = already 4-byte
      aligned, no row padding), height ``2 + id % 7``; the pixel array is
      the body's UTF-8 bytes cycled to fill ``height*24`` bytes (empty
      bodies cycle a single 0x00).
    * **WAV** (id%2==1): the same real RIFF container as
      :func:`synthesize_payloads` — the ``data`` chunk IS the body bytes,
      i.e. ``len(body)//2`` raw 16-bit LE PCM samples.

    Entirely JVM-side (hex concat + ``unhex``).  Companion of
    :func:`content_stats`, which decodes the pixel/PCM content back out —
    REAL content decode, no codec libraries needed (unlike PNG/JPEG, whose
    compressed payloads keep the stub path).
    """
    _id = F.col(id_col)
    body = F.encode(F.coalesce(F.col(body_col), F.lit("")), "UTF-8")
    body_hex = F.hex(body)
    blen = F.length(body)

    h = (F.lit(2) + _id % 7).cast("long")
    needed = h * 24                                          # pixel bytes
    padded = F.when(F.length(body_hex) > 0, body_hex).otherwise(F.lit("00"))
    hlen = F.length(padded)
    reps = F.floor((needed * 2 + hlen - 1) / hlen).cast("int")
    pixel_hex = F.substr(
        F.repeat(padded, reps), F.lit(1), (needed * 2).cast("int")
    )
    bmp = F.concat(
        F.lit("424D"), _le_hex(F.lit(54) + needed, 4),       # BM, file size
        F.lit("00000000"), F.lit("36000000"),                # reserved, offset 54
        F.lit("28000000"),                                   # BITMAPINFOHEADER
        F.lit("08000000"), _le_hex(h, 4),                    # width 8, height
        F.lit("0100"), F.lit("1800"),                        # planes, 24 bpp
        F.lit("00000000"), _le_hex(needed, 4),               # BI_RGB, image size
        F.lit("00000000"), F.lit("00000000"),                # x/y pixels-per-m
        F.lit("00000000"), F.lit("00000000"),                # colors used/important
        pixel_hex,
    )
    wav = _wav_payload_hex(_id, body_hex, blen)
    payload = F.when(_id % 2 == 0, bmp).otherwise(wav)
    return df.withColumn("media", F.unhex(payload))


def bmp_pixel_bytes(p: bytes) -> bytes | None:
    """REAL BMP content decode: the raw pixel array (BGR byte stream,
    stride-padded rows included) per the BITMAPINFOHEADER geometry.
    ``None`` for non-BMP / truncated-header payloads."""
    if p[:2] != b"BM" or len(p) < 54:
        return None
    offset = int.from_bytes(p[10:14], "little")
    width = int.from_bytes(p[18:22], "little", signed=True)
    height = abs(int.from_bytes(p[22:26], "little", signed=True))
    bpp = int.from_bytes(p[28:30], "little")
    if width <= 0 or bpp == 0 or offset > len(p):
        return None
    stride = ((bpp * width + 31) // 32) * 4
    return p[offset:offset + stride * height]


def wav_pcm_samples(p: bytes) -> list[int] | None:
    """REAL WAV content decode: the ``data`` chunk as signed 16-bit LE PCM
    samples (trailing odd byte dropped).  ``None`` for non-WAV payloads or
    containers without a ``data`` chunk."""
    if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    i, data = 12, None
    while i + 8 <= len(p):
        cid = p[i:i + 4]
        csize = int.from_bytes(p[i + 4:i + 8], "little")
        if cid == b"data":
            data = p[i + 8:i + 8 + csize]
        i += 8 + csize + (csize & 1)
    if data is None:
        return None
    return [
        int.from_bytes(data[2 * k:2 * k + 2], "little", signed=True)
        for k in range(len(data) // 2)
    ]


CONTENT_STATS_SCHEMA = (
    "id long, format string, n_units long, mean_val double, rms double,"
    " min_val long, max_val long"
)


def content_stats(
    df: DataFrame, id_col: str, media_col: str = "media"
) -> DataFrame:
    """REAL content statistics over uncompressed media payloads — the
    pixel/sample tier of the two-tier decode (module docstring), with no
    codec libraries: BMP pixel bytes → luminance-ish byte stats, WAV PCM →
    amplitude stats.  Units are pixel channel bytes (BMP, 0..255) or
    signed 16-bit samples (WAV); ``mean_val``/``rms`` are exact integer
    sums divided once, so engines agree bitwise.  PNG and GIF decode for
    REAL too (:func:`png_pixel_bytes` — stdlib deflate + defilter, units
    are channel bytes; :func:`gif_pixel_bytes` — pure-Python LZW, units
    are palette indices).  Only JPEG (DCT — genuinely needs a codec)
    yields ``format`` from the header sniff with NULL stats; any bad or
    undecodable blob likewise degrades to NULL, never kills the stage.

    Arrow-batched ``mapInPandas`` over an (id, payload) projection, same
    plumbing contract as :func:`extract_features`.
    """

    def run(batches: Iterator) -> Iterator:
        import math

        import pandas as pd

        # local refs: cloudpickle ships the decoders by value
        sniff, bmp_px, wav_pcm = parse_media_header, bmp_pixel_bytes, wav_pcm_samples
        png_px, gif_px = png_pixel_bytes, gif_pixel_bytes

        def stats_row(b) -> tuple:
            p = bytes(b) if b is not None else b""
            fmt = sniff(p)["format"]
            units: list[int] | None = None
            if fmt == "bmp":
                raw = bmp_px(p)
                units = list(raw) if raw is not None else None
            elif fmt == "png":
                raw = png_px(p)
                units = list(raw) if raw is not None else None
            elif fmt == "gif":
                raw = gif_px(p)
                units = list(raw) if raw is not None else None
            elif fmt == "wav":
                units = wav_pcm(p)
            if not units:
                return (fmt, 0 if units is not None else None,
                        None, None, None, None)
            n = len(units)
            s = sum(units)
            sq = sum(v * v for v in units)
            return (fmt, n, s / n, math.sqrt(sq / n), min(units), max(units))

        for pdf in batches:
            rows = [stats_row(b) for b in pdf["_media"]]
            yield pd.DataFrame(
                {
                    "id": pdf["_id"],
                    "format": [r[0] for r in rows],
                    "n_units": pd.array([r[1] for r in rows], dtype="Int64"),
                    "mean_val": [r[2] for r in rows],
                    "rms": [r[3] for r in rows],
                    "min_val": pd.array([r[4] for r in rows], dtype="Int64"),
                    "max_val": pd.array([r[5] for r in rows], dtype="Int64"),
                }
            )

    narrow = spread(df).select(
        F.col(id_col).alias("_id"), F.col(media_col).cast("binary").alias("_media")
    )
    return narrow.mapInPandas(run, CONTENT_STATS_SCHEMA)


FEATURE_SCHEMA = "id long, n_bytes long, feature array<double>"


def extract_features(
    df: DataFrame,
    id_col: str,
    media_col: str = "media",
    decoder: Callable[[bytes], list[float]] | None = None,
    batch_label: str = "media_features",
) -> DataFrame:
    """Arrow-batched feature extraction over binary media.

    ``mapInPandas``: one Python worker per partition, pandas batches in/out —
    the UDF cost amortizes over the batch, and the output schema is fixed so
    downstream stays columnar.  The default decoder is the deterministic
    stub (see module docstring).

    The default decode is (re)defined locally so cloudpickle ships it BY
    VALUE — executor Python workers cannot be assumed to have this package
    on their import path.  Callers passing ``decoder=`` must pass something
    picklable-by-value too (a lambda/local def, or ship the module with
    ``spark.sparkContext.addPyFile``).
    """
    if decoder is None:
        def decoder(payload: bytes) -> list[float]:
            import hashlib

            dig = hashlib.md5(payload or b"").digest()
            return [b / 255.0 for b in dig[:8]]
    decode = decoder

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "id": pdf["_id"],
                    "n_bytes": pdf["_media"].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf["_media"].map(lambda b: decode(bytes(b) if b is not None else b"")),
                }
            )
            yield out

    narrow = spread(df).select(
        F.col(id_col).alias("_id"), F.col(media_col).cast("binary").alias("_media")
    )
    return narrow.mapInPandas(run, FEATURE_SCHEMA)


def transform_media(
    df: DataFrame,
    id_col: str,
    media_col: str = "media",
    transform: Callable[[bytes], bytes] | None = None,
    out_format: str = "bin",
) -> DataFrame:
    """Binary→binary media transform (resize / transcode / crop) as
    Arrow-batched ``mapInPandas`` — same plumbing contract as
    :func:`extract_features` but media-in, media-out, so transforms chain.

    The default transform is a deterministic STUB (truncate-and-tag — no
    image libs in this container); swap in e.g. a Pillow resize when
    available.  Output keeps the media convention: ``media`` + refreshed
    ``media_meta`` sizes.
    """
    if transform is None:
        def transform(payload: bytes) -> bytes:
            # STUB resize: deterministic content-preserving marker + first
            # half of the payload — REPLACE with a real decoder+resizer
            return b"resized:" + payload[: max(len(payload) // 2, 1)]
    tf = transform
    fmt = out_format

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out_bytes = pdf["_media"].map(
                lambda b: tf(bytes(b) if b is not None else b"")
            )
            yield pd.DataFrame({"id": pdf["_id"], "media": out_bytes})

    narrow = spread(df).select(
        F.col(id_col).alias("_id"), F.col(media_col).cast("binary").alias("_media")
    )
    out = narrow.mapInPandas(run, "id long, media binary")
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.length("media").cast("long").alias("n_bytes"),
    )
    return out.withColumn("media_meta", meta)


def frame_sample_plan(
    df: DataFrame, id_col: str, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (video, frame_ts).

    The frame timestamps come from metadata (duration), so the expensive
    decode fans out AFTER the explode — each (video, ts) pair can land on a
    different executor, which is what makes per-frame work scale.  The
    actual frame decode plugs into :func:`extract_features` on the exploded
    rows (stubbed here, like all decodes).
    """
    n_frames = F.greatest(
        (F.col("media_meta.duration_ms") / every_ms).cast("long"), F.lit(1)
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
            )
        ).alias("frame_ts_ms"),
    )


def _png_paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_pixel_bytes(p: bytes) -> bytes | None:
    """REAL PNG content decode with the standard library only: chunk walk →
    IDAT concatenation → ``zlib`` inflate → scanline DEfiltering (all five
    PNG filter types: None/Sub/Up/Average/Paeth, spec §9) → raw pixel
    bytes.  PNG's "compression" is deflate, which Python ships — so unlike
    JPEG (DCT) this tier needs no external codec.  ``None`` for non-PNG,
    truncated, or undecodable payloads; only 8-bit greyscale/RGB/RGBA
    (color types 0/2/6, no interlace) are supported — others return
    ``None`` rather than a wrong answer.
    """
    import zlib

    if p[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    i, idat, meta = 8, b"", None
    while i + 8 <= len(p):
        clen = int.from_bytes(p[i:i + 4], "big")
        ctype = p[i + 4:i + 8]
        data = p[i + 8:i + 8 + clen]
        if len(data) < clen:
            return None
        if ctype == b"IHDR" and clen >= 13:
            meta = (
                int.from_bytes(data[0:4], "big"),   # width
                int.from_bytes(data[4:8], "big"),   # height
                data[8],                            # bit depth
                data[9],                            # color type
                data[12],                           # interlace
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + clen  # len + type + data + crc
    if meta is None or not idat:
        return None
    w, h, depth, color, interlace = meta
    if depth != 8 or interlace != 0 or color not in (0, 2, 6):
        return None
    bpp = {0: 1, 2: 3, 6: 4}[color]
    stride = w * bpp
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    if len(raw) < h * (stride + 1):
        return None
    out = bytearray()
    prior = bytes(stride)
    pos = 0
    for _ in range(h):
        f = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if f == 1:      # Sub
            for k in range(bpp, stride):
                line[k] = (line[k] + line[k - bpp]) & 0xFF
        elif f == 2:    # Up
            for k in range(stride):
                line[k] = (line[k] + prior[k]) & 0xFF
        elif f == 3:    # Average
            for k in range(stride):
                a = line[k - bpp] if k >= bpp else 0
                line[k] = (line[k] + ((a + prior[k]) >> 1)) & 0xFF
        elif f == 4:    # Paeth
            for k in range(stride):
                a = line[k - bpp] if k >= bpp else 0
                c = prior[k - bpp] if k >= bpp else 0
                line[k] = (line[k] + _png_paeth(a, prior[k], c)) & 0xFF
        elif f != 0:
            return None
        out += line
        prior = bytes(line)
    return bytes(out)


def png_encode(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal REAL PNG encoder (stdlib only): 8-bit RGB, one IDAT, real
    CRCs, scanline r filtered with type ``r % 5`` — every decoder filter
    branch gets exercised by round-tripping what this writes.  ``pixels``
    must be ``height*width*3`` bytes."""
    import struct
    import zlib

    bpp, stride = 3, width * 3
    assert len(pixels) == height * stride
    flt = bytearray()
    prior = bytes(stride)
    for r in range(height):
        line = pixels[r * stride:(r + 1) * stride]
        f = r % 5
        flt.append(f)
        for k in range(stride):
            a = line[k - bpp] if k >= bpp else 0
            b = prior[k]
            c = prior[k - bpp] if k >= bpp else 0
            if f == 0:
                v = line[k]
            elif f == 1:
                v = (line[k] - a) & 0xFF
            elif f == 2:
                v = (line[k] - b) & 0xFF
            elif f == 3:
                v = (line[k] - ((a + b) >> 1)) & 0xFF
            else:
                v = (line[k] - _png_paeth(a, b, c)) & 0xFF
            flt.append(v)
        prior = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(flt)))
        + chunk(b"IEND", b"")
    )


def synthesize_payloads_png(
    df: DataFrame, id_col: str, body_col: str
) -> DataFrame:
    """Deterministic REAL PNG payloads: width 8, height ``2 + id % 7``,
    RGB; the pixel array is the body's UTF-8 bytes cycled to
    ``height*24`` (exactly the BMP formula of
    :func:`synthesize_payloads_raw`, so the content-stats oracle is the
    same cycled-body arithmetic), deflate-compressed with real CRCs and a
    different PNG filter per scanline.  Runs as an Arrow-batched
    ``mapInPandas`` (the encoder needs ``zlib``)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        enc = png_encode

        def build(_id, body) -> bytes:
            h = 2 + int(_id) % 7
            src = (body or "").encode("utf-8") or b"\x00"
            need = h * 24
            reps = (need + len(src) - 1) // len(src)
            return enc((src * reps)[:need], 8, h)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["_id"],
                    "media": [build(i, b) for i, b in zip(pdf["_id"], pdf["_body"])],
                }
            )

    narrow = spread(df).select(
        F.col(id_col).alias("_id"), F.col(body_col).cast("string").alias("_body")
    )
    return narrow.mapInPandas(run, "id long, media binary")


def _gif_lzw_encode(data: bytes, mcs: int = 8) -> bytes:
    """GIF-variant LZW compression (little-endian bit packing, growing
    code width, CLEAR/EOI codes) — the encoder half used by
    :func:`gif_encode`; real compression, so round trips exercise the
    decoder's dictionary growth and width increases."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(1 << mcs)}
    next_code, width = eoi + 1, mcs + 1
    emit(clear, width)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(1 << mcs)}
            next_code, width = eoi + 1, mcs + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, mcs: int) -> bytes | None:
    """GIF-variant LZW decompression (general: dictionary growth, width
    increases, KwKwK case, CLEAR resets).  ``None`` on any malformed
    stream — never raises."""
    if not 2 <= mcs <= 8:
        return None
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    base = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    out = bytearray()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = mcs + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if code < len(table) and code not in (clear, eoi):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                return None
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return None  # ran out of bytes before EOI


def gif_pixel_bytes(p: bytes) -> bytes | None:
    """REAL GIF content decode, pure Python: logical-screen parse →
    extension skip → first image descriptor → LZW decompression of the
    pixel data → palette INDICES (one byte per pixel — the
    palette-independent content; map through the color table for RGB).
    ``None`` for non-GIF, interlaced, truncated, or undecodable payloads.
    """
    if p[:6] not in (b"GIF87a", b"GIF89a") or len(p) < 13:
        return None
    flags = p[10]
    i = 13
    if flags & 0x80:  # global color table
        i += 3 * (2 << (flags & 0x07))
    while i < len(p):
        intro = p[i]
        if intro == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(p) and p[i] != 0:
                i += 1 + p[i]
            i += 1
        elif intro == 0x2C:  # image descriptor
            if i + 10 > len(p):
                return None
            w = int.from_bytes(p[i + 5:i + 7], "little")
            h = int.from_bytes(p[i + 7:i + 9], "little")
            iflags = p[i + 9]
            if iflags & 0x40:  # interlaced — out of scope
                return None
            i += 10
            if iflags & 0x80:  # local color table
                i += 3 * (2 << (iflags & 0x07))
            if i >= len(p):
                return None
            mcs = p[i]
            i += 1
            data = bytearray()
            while i < len(p) and p[i] != 0:
                n = p[i]
                data += p[i + 1:i + 1 + n]
                i += 1 + n
            pixels = _gif_lzw_decode(bytes(data), mcs)
            if pixels is None or len(pixels) != w * h:
                return None
            return pixels
        elif intro == 0x3B:  # trailer before any image
            return None
        else:
            return None
    return None


def gif_encode(indices: bytes, width: int, height: int) -> bytes:
    """Minimal REAL GIF89a encoder (stdlib only): 256-entry grayscale
    global color table (palette[i] = (i,i,i)), one image, real LZW
    compression.  ``indices`` must be ``width*height`` bytes."""
    import struct

    assert len(indices) == width * height
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | 0x07, 0, 0])            # GCT present, 256 entries
    for i in range(256):
        out += bytes([i, i, i])                   # grayscale palette
    out += b"\x2C" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    out.append(8)                                 # LZW min code size
    stream = _gif_lzw_encode(indices, 8)
    for k in range(0, len(stream), 255):
        block = stream[k:k + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3B"
    return bytes(out)


def synthesize_payloads_gif(
    df: DataFrame, id_col: str, body_col: str
) -> DataFrame:
    """Deterministic REAL GIF payloads: 8×(2+id%7), grayscale palette,
    pixel indices = the body's UTF-8 bytes cycled to ``height*8`` (one
    byte per pixel) — LZW-compressed for real, so
    :func:`content_stats`'s decode is a genuine decompression, while the
    oracle recomputes the stats from the cycle formula without one."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        enc = gif_encode

        def build(_id, body) -> bytes:
            h = 2 + int(_id) % 7
            src = (body or "").encode("utf-8") or b"\x00"
            need = h * 8
            reps = (need + len(src) - 1) // len(src)
            return enc((src * reps)[:need], 8, h)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["_id"],
                    "media": [build(i, b) for i, b in zip(pdf["_id"], pdf["_body"])],
                }
            )

    narrow = spread(df).select(
        F.col(id_col).alias("_id"), F.col(body_col).cast("string").alias("_body")
    )
    return narrow.mapInPandas(run, "id long, media binary")
