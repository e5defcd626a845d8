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
* **Content decode is REAL for every supported container**: BMP pixel
  bytes and WAV PCM (pure byte arithmetic), PNG (stdlib ``zlib`` inflate
  + full scanline defilter), GIF (pure-Python LZW), and baseline
  grayscale JPEG (pure-Python Huffman + dequant + IDCT) — see
  :func:`content_stats`.  The pluggable feature-extraction tier
  (:func:`extract_features` ``decoder=``) still accepts Pillow /
  torchaudio / ffmpeg implementations for formats beyond these (chroma
  JPEG, MP4, ...) — its default remains a deterministic stub.

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
        if len(p) >= 12 and p[4:8] == b"ftyp":
            # MP4 / ISO BMFF: walk top-level boxes to moov, then mvhd
            # (duration/timescale) and the first trak's tkhd (16.16-fixed
            # width/height at v0 offsets 76/80 within the box payload)
            def boxes(buf, start, end):
                i = start
                while i + 8 <= end:
                    size = int.from_bytes(buf[i:i + 4], "big")
                    btype = buf[i + 4:i + 8]
                    if size == 1 or size < 8 or i + size > end:
                        return  # 64-bit largesize / malformed: stop
                    yield btype, i + 8, i + size
                    i += size

            dur_ms = width = height = None
            for btype, s, e in boxes(p, 0, len(p)):
                if btype != b"moov":
                    continue
                for ctype, cs, ce in boxes(p, s, e):
                    if ctype == b"mvhd" and ce - cs >= 20 and p[cs] == 0:
                        scale = int.from_bytes(p[cs + 12:cs + 16], "big")
                        dur = int.from_bytes(p[cs + 16:cs + 20], "big")
                        if scale:
                            dur_ms = dur * 1000 // scale
                    elif ctype == b"trak" and width is None:
                        for t, ts_, te in boxes(p, cs, ce):
                            if t == b"tkhd" and te - ts_ >= 84 and p[ts_] == 0:
                                width = int.from_bytes(p[ts_ + 76:ts_ + 80], "big") >> 16
                                height = int.from_bytes(p[ts_ + 80:ts_ + 84], "big") >> 16
                break
            if dur_ms is None and width is None:
                return none
            return {
                "media_type": "video", "format": "mp4",
                "width": width, "height": height, "bit_depth": None,
                "duration_ms": dur_ms,
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


def synthesize_payloads_avi(df: DataFrame, id_col: str, body_col: str) -> DataFrame:
    """Deterministic UNCOMPRESSED AVI payloads — the video tier's content
    companion to :func:`synthesize_payloads_raw` (same spirit as the
    reference's operators doing real work on event content,
    /root/reference/examples/processing/customOperator/main.go:17-38).

    Each doc becomes a real RIFF 'AVI ' container: LIST hdrl (avih main
    header + LIST strl with a 'vids'/'DIB ' strh and a BITMAPINFOHEADER
    strf) followed by LIST movi holding ``1 + id % 3`` uncompressed
    '00db' RGB24 frames, width 8 × height ``2 + id % 7`` (stride 24, no
    row padding).  The frame pixel stream is the body's UTF-8 bytes
    cycled CONTIGUOUSLY across all frames (empty bodies cycle 0x00) — so
    an oracle recomputes every content statistic from the formula alone.
    Entirely JVM-side (hex concat + ``unhex``), like the BMP/WAV path.
    """
    _id = F.col(id_col)
    body = F.encode(F.coalesce(F.col(body_col), F.lit("")), "UTF-8")
    body_hex = F.hex(body)

    h = (F.lit(2) + _id % 7).cast("long")
    frame_bytes = h * 24                                      # 8 px × RGB24
    n_frames = (F.lit(1) + _id % 3).cast("long")
    needed = n_frames * frame_bytes
    padded = F.when(F.length(body_hex) > 0, body_hex).otherwise(F.lit("00"))
    hlen = F.length(padded)
    reps = F.floor((needed * 2 + hlen - 1) / hlen).cast("int")
    pixel_hex = F.substr(
        F.repeat(padded, reps), F.lit(1), (needed * 2).cast("int")
    )

    zero4 = F.lit("00000000")
    avih = F.concat(
        F.lit("61766968"), _le_hex(F.lit(56), 4),             # 'avih', cksize
        _le_hex(F.lit(40000), 4),                             # µs/frame (25 fps)
        zero4, zero4, zero4,                                  # maxbytes/padding/flags
        _le_hex(n_frames, 4), zero4,                          # total, initial frames
        _le_hex(F.lit(1), 4), _le_hex(frame_bytes, 4),        # streams, sugg. buffer
        _le_hex(F.lit(8), 4), _le_hex(h, 4),                  # width, height
        zero4, zero4, zero4, zero4,                           # reserved[4]
    )
    strh = F.concat(
        F.lit("73747268"), _le_hex(F.lit(56), 4),             # 'strh', cksize
        F.lit("76696473"), F.lit("44494220"),                 # 'vids', 'DIB '
        zero4, zero4, zero4,                                  # flags/prio+lang/initial
        _le_hex(F.lit(1), 4), _le_hex(F.lit(25), 4),          # scale, rate (25 fps)
        zero4, _le_hex(n_frames, 4),                          # start, length
        _le_hex(frame_bytes, 4), zero4, zero4,                # sugg. buffer/quality/samplesize
        F.lit("0000"), F.lit("0000"),                         # rcFrame left, top
        _le_hex(F.lit(8), 2), _le_hex(h, 2),                  # rcFrame right, bottom
    )
    strf = F.concat(
        F.lit("73747266"), _le_hex(F.lit(40), 4),             # 'strf', cksize
        F.lit("28000000"), F.lit("08000000"), _le_hex(h, 4),  # bi: 40, width 8, height
        F.lit("0100"), F.lit("1800"),                         # planes, 24 bpp
        zero4, _le_hex(frame_bytes, 4),                       # BI_RGB, image size
        zero4, zero4, zero4, zero4,                           # ppm + palette fields
    )
    strl = F.concat(
        F.lit("4C495354"), _le_hex(F.lit(4 + 64 + 48), 4), F.lit("7374726C"),
        strh, strf,
    )
    hdrl = F.concat(
        F.lit("4C495354"), _le_hex(F.lit(4 + 64 + 124), 4), F.lit("6864726C"),
        avih, strl,
    )

    def frame(f: int):
        data = F.substr(
            pixel_hex,
            (frame_bytes * 2 * f + 1).cast("int"),
            (frame_bytes * 2).cast("int"),
        )
        chunk = F.concat(F.lit("30306462"), _le_hex(frame_bytes, 4), data)
        return F.when(n_frames > f, chunk).otherwise(F.lit(""))

    movi_children = n_frames * (8 + frame_bytes)              # 24h even: no pad bytes
    movi = F.concat(
        F.lit("4C495354"), _le_hex(movi_children + 4, 4), F.lit("6D6F7669"),
        frame(0), frame(1), frame(2),
    )
    riff = F.concat(
        F.lit("52494646"),
        _le_hex(F.lit(4 + 200 + 12) + movi_children, 4),      # 'AVI ' + hdrl + movi
        F.lit("41564920"),
        hdrl, movi,
    )
    return df.withColumn("media", F.unhex(riff))


def avi_frame_bytes(p: bytes) -> bytes | None:
    """REAL AVI content decode: the concatenated pixel bytes of every
    uncompressed DIB frame ('..db' chunks) in the ``movi`` list, via the
    RIFF chunk walk.  Compressed ('..dc') frames are skipped; ``None``
    for non-AVI payloads or containers without a ``movi`` list."""
    if p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        return None
    out = bytearray()
    found = False
    i = 12
    while i + 8 <= len(p):
        cid = p[i:i + 4]
        csize = int.from_bytes(p[i + 4:i + 8], "little")
        if cid == b"LIST" and p[i + 8:i + 12] == b"movi":
            found = True
            j, end = i + 12, min(i + 8 + csize, len(p))
            while j + 8 <= end:
                fsize = int.from_bytes(p[j + 4:j + 8], "little")
                if p[j + 2:j + 4] == b"db":
                    out += p[j + 8:j + 8 + fsize]
                j += 8 + fsize + (fsize & 1)
        i += 8 + csize + (csize & 1)
    return bytes(out) if found else None


def synthesize_payloads_mp4(df: DataFrame, id_col: str, body_col: str) -> DataFrame:
    """Deterministic UNCOMPRESSED MP4 payloads — the ISO-BMFF twin of
    :func:`synthesize_payloads_avi` (same spirit as the reference's
    operators doing real work on event content,
    /root/reference/examples/processing/customOperator/main.go:17-38).

    Each doc becomes a real ISO base-media file: ``ftyp`` +
    ``moov`` (mvhd; trak → tkhd → mdia → mdhd → minf → stbl with a
    'raw ' stsd entry and REAL stsz/stsc/stco sample tables) + ``mdat``
    holding ``1 + id % 4`` uncompressed RGB24 frames of width 8 ×
    height ``2 + id % 6`` (stride 24, no padding) in one chunk.  The
    frame pixel stream is the body's UTF-8 bytes cycled CONTIGUOUSLY
    across all frames (empty bodies cycle 0x00) — an oracle recomputes
    every content statistic from the formula alone.  All box sizes are
    fixed by construction (sample geometry lives in the tables, not the
    layout), so the whole container is JVM-side hex concat + ``unhex``.
    """
    _id = F.col(id_col)
    body = F.encode(F.coalesce(F.col(body_col), F.lit("")), "UTF-8")
    body_hex = F.hex(body)

    h = (F.lit(2) + _id % 6).cast("long")
    frame_bytes = h * 24                                      # 8 px × RGB24
    n_frames = (F.lit(1) + _id % 4).cast("long")
    needed = n_frames * frame_bytes
    dur = n_frames * 40                                       # ms @ 25 fps, timescale 1000
    padded = F.when(F.length(body_hex) > 0, body_hex).otherwise(F.lit("00"))
    hlen = F.length(padded)
    reps = F.floor((needed * 2 + hlen - 1) / hlen).cast("int")
    pixel_hex = F.substr(
        F.repeat(padded, reps), F.lit(1), (needed * 2).cast("int")
    )

    z4 = F.lit("00000000")
    unity = F.lit("00010000" + "00000000" * 3 + "00010000" + "00000000" * 3
                  + "40000000")                               # 3×3 16.16 matrix
    ftyp = F.lit("00000010" "66747970" "69736F6D" "00000000")
    mvhd = F.concat(
        F.lit("0000006C" "6D766864"), z4, z4, z4,             # v0, ctime, mtime
        F.lit("000003E8"), _be_hex(dur, 4),                   # timescale 1000, duration
        F.lit("00010000"), F.lit("01000000"),                 # rate 1.0, volume+reserved
        z4, z4,                                               # reserved2
        unity, F.lit("00000000" * 6), F.lit("00000002"),      # matrix, predefined, next id
    )
    tkhd = F.concat(
        F.lit("0000005C" "746B6864"), F.lit("00000007"),      # v0 flags=enabled
        z4, z4, F.lit("00000001"), z4, _be_hex(dur, 4),       # times, track 1, duration
        z4, z4,                                               # reserved
        F.lit("0000" "0000" "0000" "0000"),                   # layer/alt/volume/reserved
        unity,
        F.lit("00080000"), F.concat(_be_hex(h, 2), F.lit("0000")),  # 16.16 w=8, h
    )
    mdhd = F.concat(
        F.lit("00000020" "6D646864"), z4, z4, z4,
        F.lit("000003E8"), _be_hex(dur, 4), F.lit("55C4" "0000"),   # scale, dur, 'und'
    )
    stsd = F.concat(
        F.lit("00000066" "73747364"), z4, F.lit("00000001"),  # one entry:
        F.lit("00000056" "72617720"), F.lit("000000000000" "0001"),  # 'raw ', dref 1
        F.lit("00000000" * 4),                                # predefined
        F.lit("0008"), _be_hex(h, 2),                         # width 8, height
        F.lit("00480000" "00480000"), z4, F.lit("0001"),      # 72 dpi, frame_count 1
        F.lit("00" * 32), F.lit("0018" "FFFF"),               # compressor, depth 24
    )
    stsz = F.concat(
        F.lit("00000014" "7374737A"), z4,
        _be_hex(frame_bytes, 4), _be_hex(n_frames, 4),        # uniform size, count
    )
    stsc = F.concat(
        F.lit("0000001C" "73747363"), z4, F.lit("00000001"),
        F.lit("00000001"), _be_hex(n_frames, 4), F.lit("00000001"),
    )
    stco = F.lit("00000014" "7374636F" "00000000" "00000001"
                 "000001D2")                                  # 1 chunk at offset 466
    stbl = F.concat(F.lit("000000B2" "7374626C"), stsd, stsz, stsc, stco)
    minf = F.concat(F.lit("000000BA" "6D696E66"), stbl)
    mdia = F.concat(F.lit("000000E2" "6D646961"), mdhd, minf)
    trak = F.concat(F.lit("00000146" "7472616B"), tkhd, mdia)
    moov = F.concat(F.lit("000001BA" "6D6F6F76"), mvhd, trak)
    mdat = F.concat(_be_hex(needed + 8, 4), F.lit("6D646174"), pixel_hex)
    return df.withColumn("media", F.unhex(F.concat(ftyp, moov, mdat)))


def mp4_sample_bytes(p: bytes) -> bytes | None:
    """REAL MP4 content decode: the concatenated sample bytes of every
    trak, via the ISO-BMFF sample tables — walk
    moov → trak → mdia → minf → stbl, then stsz (uniform or per-sample
    sizes), stsc (sample-to-chunk runs) and stco (absolute chunk
    offsets) locate each sample inside ``mdat``.  ``None`` for non-MP4
    payloads or files without a usable sample table."""
    if len(p) < 12 or p[4:8] != b"ftyp":
        return None

    def boxes(start: int, end: int):
        i = start
        while i + 8 <= end:
            size = int.from_bytes(p[i:i + 4], "big")
            btype = p[i + 4:i + 8]
            if size == 1 or size < 8 or i + size > end:
                return  # 64-bit largesize / malformed: stop
            yield btype, i + 8, i + size
            i += size

    def find(btype: bytes, span):
        if span is None:
            return None
        for t, s, e in boxes(*span):
            if t == btype:
                return s, e
        return None

    moov = find(b"moov", (0, len(p)))
    if moov is None:
        return None
    out = bytearray()
    found = False
    for t, ts, te in boxes(*moov):
        if t != b"trak":
            continue
        stbl = find(b"stbl", find(b"minf", find(b"mdia", (ts, te))))
        stsz = find(b"stsz", stbl)
        stco = find(b"stco", stbl)
        if stsz is None or stco is None or stsz[1] - stsz[0] < 12:
            continue
        s = stsz[0]
        uniform = int.from_bytes(p[s + 4:s + 8], "big")
        n_samples = int.from_bytes(p[s + 8:s + 12], "big")
        if uniform:
            sizes = [uniform] * n_samples
        elif stsz[1] - s >= 12 + 4 * n_samples:
            sizes = [
                int.from_bytes(p[s + 12 + 4 * k:s + 16 + 4 * k], "big")
                for k in range(n_samples)
            ]
        else:
            continue
        s = stco[0]
        n_chunks = int.from_bytes(p[s + 4:s + 8], "big")
        if stco[1] - s < 8 + 4 * n_chunks:
            continue
        offsets = [
            int.from_bytes(p[s + 8 + 4 * k:s + 12 + 4 * k], "big")
            for k in range(n_chunks)
        ]
        runs = [(1, n_samples)]                # stsc absent: one chunk holds all
        stsc = find(b"stsc", stbl)
        if stsc is not None:
            s = stsc[0]
            n_runs = int.from_bytes(p[s + 4:s + 8], "big")
            if stsc[1] - s >= 8 + 12 * n_runs:
                runs = [
                    (
                        int.from_bytes(p[s + 8 + 12 * k:s + 12 + 12 * k], "big"),
                        int.from_bytes(p[s + 12 + 12 * k:s + 16 + 12 * k], "big"),
                    )
                    for k in range(n_runs)
                ]
        found = True
        si = 0
        for ci, off in enumerate(offsets):
            spc = 0
            for first_chunk, n_per in runs:     # last run starting at/before ci+1 wins
                if first_chunk <= ci + 1:
                    spc = n_per
            pos = off
            for _ in range(spc):
                if si >= len(sizes) or pos + sizes[si] > len(p):
                    break
                out += p[pos:pos + sizes[si]]
                pos += sizes[si]
                si += 1
    return bytes(out) if found else None


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


def bmp_encode(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal 24-bit BITMAPINFOHEADER BMP around a raw BGR pixel array
    (caller supplies stride-padded rows — stride = 4-byte-aligned
    3*width)."""
    stride = ((24 * width + 31) // 32) * 4
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} pixel bytes, got {len(pixels)}")
    return (
        b"BM" + (54 + len(pixels)).to_bytes(4, "little")
        + b"\x00" * 4 + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + width.to_bytes(4, "little") + height.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + b"\x00" * 4 + len(pixels).to_bytes(4, "little")
        + b"\x00" * 16
        + pixels
    )


def bmp_thumbnail(p: bytes, factor: int = 2) -> bytes:
    """REAL image resize, no codec libraries: nearest-neighbor downscale
    of a 24-bit uncompressed BMP by ``factor`` — keep every ``factor``-th
    stored row and every ``factor``-th pixel, re-encode as a real BMP
    (:func:`bmp_encode`).  Rows are sampled in STORED order (BMP stores
    bottom-up; uniform sampling is orientation-agnostic).  Payloads that
    aren't decodable 24-bpp BMPs pass through unchanged — a transform
    chain must not destroy media it doesn't understand.
    """
    if p[:2] != b"BM" or len(p) < 54:
        return p
    width = int.from_bytes(p[18:22], "little", signed=True)
    height = abs(int.from_bytes(p[22:26], "little", signed=True))
    bpp = int.from_bytes(p[28:30], "little")
    raw = bmp_pixel_bytes(p)
    if raw is None or bpp != 24 or width <= 0 or height <= 0:
        return p
    in_stride = ((24 * width + 31) // 32) * 4
    if len(raw) < in_stride * height:
        return p
    out_w = (width + factor - 1) // factor
    out_h = (height + factor - 1) // factor
    out_stride = ((24 * out_w + 31) // 32) * 4
    rows = []
    for y2 in range(out_h):
        row = bytearray()
        base = (y2 * factor) * in_stride
        for x2 in range(out_w):
            o = base + (x2 * factor) * 3
            row += raw[o:o + 3]
        row += b"\x00" * (out_stride - len(row))
        rows.append(bytes(row))
    return bmp_encode(b"".join(rows), out_w, out_h)


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


def wav_downsample(p: bytes, factor: int = 2) -> bytes:
    """REAL audio resample, no codec libraries: decimate a PCM WAV by
    ``factor`` (keep every ``factor``-th FRAME — one full channel group of
    16-bit samples — of the data chunk, so multichannel interleave
    survives) and re-encode a real RIFF/WAVE container with the sample
    rate divided to preserve duration.  Non-WAV payloads pass through
    unchanged."""
    if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return p
    i = 12
    fmt_chunk = data = None
    while i + 8 <= len(p):
        cid = p[i:i + 4]
        csize = int.from_bytes(p[i + 4:i + 8], "little")
        if cid == b"fmt ":
            fmt_chunk = bytearray(p[i + 8:i + 8 + csize])
        elif cid == b"data":
            data = p[i + 8:i + 8 + csize]
        i += 8 + csize + (csize & 1)
    if fmt_chunk is None or data is None or len(fmt_chunk) < 16:
        return p
    rate = int.from_bytes(fmt_chunk[4:8], "little")
    channels = int.from_bytes(fmt_chunk[2:4], "little") or 1
    frame_bytes = 2 * channels
    kept = b"".join(
        data[frame_bytes * f:frame_bytes * (f + 1)]
        for f in range(0, len(data) // frame_bytes, factor)
    )
    new_rate = max(rate // factor, 1)
    fmt_chunk[4:8] = new_rate.to_bytes(4, "little")
    fmt_chunk[8:12] = (new_rate * channels * 2).to_bytes(4, "little")
    body = (
        b"WAVE"
        + b"fmt " + len(fmt_chunk).to_bytes(4, "little") + bytes(fmt_chunk)
        + b"data" + len(kept).to_bytes(4, "little") + kept
        + (b"\x00" if len(kept) & 1 else b"")
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


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
    sums divided once, so engines agree bitwise.  PNG, GIF and baseline
    JPEG decode for REAL too (:func:`png_pixel_bytes` — stdlib deflate +
    defilter; :func:`gif_pixel_bytes` — pure-Python LZW;
    :func:`jpeg_pixel_bytes` — Huffman + dequant + IDCT).  Any bad or
    out-of-scope blob (progressive JPEG, 16-bit PNG, interlaced GIF)
    degrades to NULL stats, never kills the stage.

    Arrow-batched ``mapInPandas`` over an (id, payload) projection, same
    plumbing contract as :func:`extract_features`.
    """

    def run(batches: Iterator) -> Iterator:
        import math

        import numpy as np
        import pandas as pd

        # local refs: cloudpickle ships the decoders by value
        sniff, bmp_px, wav_pcm = parse_media_header, bmp_pixel_bytes, wav_pcm_samples
        png_px, gif_px, jpg_px = png_pixel_bytes, gif_pixel_bytes, jpeg_pixel_bytes
        avi_px, mp4_px = avi_frame_bytes, mp4_sample_bytes
        BYTE_DECODERS = {
            "bmp": bmp_px, "png": png_px, "gif": gif_px,
            "jpeg": jpg_px, "avi": avi_px, "mp4": mp4_px,
        }

        def stats_row(b) -> tuple:
            p = bytes(b) if b is not None else b""
            fmt = sniff(p)["format"]
            # the moments run over the RAW byte/sample buffer as numpy
            # int64 reductions — a Python list() + sum() loop here is a
            # per-UNIT interpreter walk, the slow tier at real media
            # sizes.  Sums are exact in int64 (uint8² ≤ 65025, int16² ≤
            # 2³⁰ per unit), so mean/rms stay the same one-division
            # floats the scalar loop produced.
            byte_dec = BYTE_DECODERS.get(fmt)
            if byte_dec is not None:
                raw = byte_dec(p)
                if raw is None:
                    return (fmt, None, None, None, None, None)
                arr = np.frombuffer(raw, dtype=np.uint8)
            elif fmt == "wav":
                units = wav_pcm(p)
                if units is None:
                    return (fmt, None, None, None, None, None)
                arr = np.asarray(units, dtype=np.int64)
            else:
                return (fmt, None, None, None, None, None)
            n = int(arr.size)
            if n == 0:
                return (fmt, 0, None, None, None, None)
            a64 = arr.astype(np.int64, copy=False)
            s = int(a64.sum())
            sq = int(np.dot(a64, a64))
            return (fmt, n, s / n, math.sqrt(sq / n),
                    int(arr.min()), int(arr.max()))

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


# --------------------------------------------------------------------------
# Baseline JPEG (grayscale, single component) — pure Python, stdlib only.
#
# The DC coefficient is handled ALGEBRAICALLY on both sides
# (F(0,0) = Σ(f-128)/8 exactly — /8 is a binary-exponent shift, so the
# float value is exact; the IDCT adds F(0,0)/8 back the same way), while
# the 63 AC terms go through the cosine accumulation.  Fixed-point
# libjpeg makes the same move for different reasons; here it means a
# flat 8×8 block round-trips with NO floating-point noise, which is what
# lets the synthesis gate query have a closed-form bit-exact oracle even
# though the codec itself is a real lossy DCT pipeline.
# --------------------------------------------------------------------------

_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
# Annex-K-style luminance Huffman tables (BITS, HUFFVAL).  Both sides
# derive canonical codes from the DHT payload, so the codec is
# self-consistent for any valid table carried in the file.
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_JPEG_QTABLE = [16] * 64  # flat; q[0]=16 (divisible by 8) keeps the
# DC-only reconstruction on exact half-integers — see the gate oracle


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: value → (code, length)."""
    out, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lookup(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value, for bit-serial decoding."""
    return {
        (length, code): v
        for v, (code, length) in _huff_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def jpeg_encode_gray(pixels: bytes, width: int, height: int) -> bytes:
    """REAL baseline JPEG encoder (SOF0, grayscale): float DCT (DC
    algebraic), flat-16 quantization, canonical Huffman, byte stuffing.
    ``width``/``height`` must be multiples of 8 (no partial-block
    padding logic); ``pixels`` is row-major grayscale."""
    import math
    import struct

    assert width % 8 == 0 and height % 8 == 0
    assert len(pixels) == width * height
    cos = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)]
    c = [1 / math.sqrt(2)] + [1.0] * 7
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _BitWriter()
    prev_dc = 0
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            block = [
                pixels[(by + y) * width + bx + x] - 128
                for y in range(8)
                for x in range(8)
            ]
            # DC algebraically exact; AC via cosine accumulation
            coef = [0.0] * 64
            coef[0] = sum(block) / 8.0
            for u, v in ((u, v) for u in range(8) for v in range(8)):
                if u == 0 and v == 0:
                    continue
                s = 0.0
                for y in range(8):
                    cv = cos[u][y]
                    row = block[y * 8:y * 8 + 8]
                    for x in range(8):
                        s += row[x] * cv * cos[v][x]
                coef[u * 8 + v] = 0.25 * c[u] * c[v] * s
            q = [
                int(math.floor(coef[_JPEG_ZIGZAG[k]] / _JPEG_QTABLE[k] + 0.5))
                for k in range(64)
            ]
            diff = q[0] - prev_dc
            prev_dc = q[0]
            t = _category(diff)
            w.put(*dc_codes[t])
            if t:
                bits = diff if diff >= 0 else diff + (1 << t) - 1
                w.put(bits & ((1 << t) - 1), t)
            run = 0
            last_nz = max((k for k in range(1, 64) if q[k]), default=0)
            for k in range(1, last_nz + 1):
                if q[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    w.put(*ac_codes[0xF0])
                    run -= 16
                s = _category(q[k])
                w.put(*ac_codes[(run << 4) | s])
                bits = q[k] if q[k] >= 0 else q[k] + (1 << s) - 1
                w.put(bits & ((1 << s) - 1), s)
                run = 0
            if last_nz < 63:
                w.put(*ac_codes[0x00])  # EOB
    entropy = w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    dqt = seg(0xDB, bytes([0]) + bytes(_JPEG_QTABLE))
    sof = seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)) + seg(
        0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9"


class _BitReader:
    """Entropy-segment bit reader with JPEG byte-unstuffing; raises
    ``ValueError`` at end of data (callers convert to None)."""

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.i >= len(self.d):
                raise ValueError("eos")
            b = self.d[self.i]
            self.i += 1
            if b == 0xFF:
                if self.i < len(self.d) and self.d[self.i] == 0x00:
                    self.i += 1  # stuffed 0xFF
                else:
                    raise ValueError("marker in entropy data")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.bit()
            length += 1
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("bad huffman code")


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_pixel_bytes(p: bytes) -> bytes | None:
    """REAL baseline JPEG decoder (grayscale, single scan): segment walk,
    DQT/DHT parsed FROM THE FILE (canonical Huffman rebuild), entropy
    decode with byte-unstuffing, dequantization, IDCT (DC algebraic + AC
    cosine accumulation), clamp.  ``None`` for anything but a decodable
    single-component baseline JPEG — progressive, chroma, restart
    markers, and truncation all degrade to ``None``, never raise.
    """
    import math

    if p[:2] != b"\xff\xd8":
        return None
    qt: list[int] | None = None
    dc_tbl = ac_tbl = None
    w = h = None
    i = 2
    try:
        while i + 4 <= len(p):
            if p[i] != 0xFF:
                return None
            marker = p[i + 1]
            if marker == 0xD9:
                return None  # EOI before SOS
            seglen = int.from_bytes(p[i + 2:i + 4], "big")
            seg = p[i + 4:i + 2 + seglen]
            if marker == 0xDB:
                j = 0
                while j < len(seg):
                    pq, tq = seg[j] >> 4, seg[j] & 15
                    if pq != 0:
                        return None  # 16-bit table unsupported
                    if tq == 0:
                        qt = list(seg[j + 1:j + 65])
                    j += 65
            elif marker == 0xC4:
                j = 0
                while j + 17 <= len(seg):
                    tc, th = seg[j] >> 4, seg[j] & 15
                    bits = list(seg[j + 1:j + 17])
                    n = sum(bits)
                    vals = list(seg[j + 17:j + 17 + n])
                    if th == 0:
                        if tc == 0:
                            dc_tbl = _huff_lookup(bits, vals)
                        else:
                            ac_tbl = _huff_lookup(bits, vals)
                    j += 17 + n
            elif marker == 0xC0:
                if seg[5] != 1:
                    return None  # one component (grayscale) only
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
            elif 0xC1 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return None  # progressive/extended: out of scope
            elif marker == 0xDA:
                i += 2 + seglen
                break
            i += 2 + seglen
        else:
            return None
        if None in (qt, dc_tbl, ac_tbl, w, h) or len(qt) != 64:
            return None
        if w % 8 or h % 8 or w == 0 or h == 0 or w * h > 1 << 24:
            return None
        import numpy as np

        rd = _BitReader(p[i:])
        cos = np.array(
            [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
             for u in range(8)]
        )
        c = [1 / math.sqrt(2)] + [1.0] * 7
        img = np.empty((h, w), dtype=np.uint8)
        prev_dc = 0
        for by in range(0, h, 8):
            for bx in range(0, w, 8):
                zz = [0] * 64
                t = rd.huff(dc_tbl)
                diff = _extend(rd.bits(t), t) if t else 0
                prev_dc += diff
                zz[0] = prev_dc
                k = 1
                while k < 64:
                    rs = rd.huff(ac_tbl)
                    if rs == 0x00:
                        break
                    if rs == 0xF0:
                        k += 16
                        continue
                    k += rs >> 4
                    s = rs & 15
                    if s == 0 or k > 63:
                        return None
                    zz[k] = _extend(rd.bits(s), s)
                    k += 1
                coef = [0.0] * 64
                for k in range(64):
                    coef[_JPEG_ZIGZAG[k]] = zz[k] * qt[k]
                dc_part = coef[0] / 8.0  # exact: binary shift
                # IDCT, vectorized per AC coefficient: each nonzero uv
                # contributes the rank-1 outer product
                # (f·cos[u]) ⊗ cos[v] with f = c[u]·c[v]·coef[uv].  The
                # accumulation order over uv and the multiply
                # association ((f·cos_uy)·cos_vx) are IDENTICAL to the
                # scalar triple loop this replaces, so the IEEE result —
                # and every decoded byte — is bit-for-bit unchanged; the
                # 64 pixel ops per term just run in C instead of the
                # interpreter (the 100 TB tier cost: real photos carry
                # dozens of AC terms per block).
                acc = np.zeros((8, 8))
                for uv in range(1, 64):
                    if coef[uv]:
                        u, v = uv >> 3, uv & 7
                        f = c[u] * c[v] * coef[uv]
                        acc += np.multiply.outer(f * cos[u], cos[v])
                vals = np.floor(dc_part + 0.25 * acc + 128.5)
                img[by:by + 8, bx:bx + 8] = np.clip(vals, 0, 255).astype(
                    np.uint8
                )
        return img.tobytes()
    except (ValueError, IndexError):
        return None


def synthesize_payloads_jpeg(
    df: DataFrame, id_col: str, body_col: str
) -> DataFrame:
    """Deterministic REAL JPEG payloads: 8×(8·(2+id%7)) grayscale where
    every 8×8 block is FLAT at the next cycled body byte.  Flat blocks
    put all the signal in the DC coefficient, which both codec halves
    handle with exact arithmetic — so although the codec is a genuine
    lossy DCT pipeline, these payloads decode to a closed-form value the
    gate oracle recomputes exactly: with q00=16,
    ``decoded(L) = clamp(2·floor((L-128)/2 + 1/2) + 128)``."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        enc = jpeg_encode_gray

        def build(_id, body) -> bytes:
            nblocks = 2 + int(_id) % 7
            src = (body or "").encode("utf-8") or b"\x00"
            levels = [(src * ((nblocks + len(src) - 1) // len(src) + 1))[k] for k in range(nblocks)]
            px = bytearray()
            for lv in levels:
                px += bytes([lv]) * 64
            return enc(bytes(px), 8, 8 * nblocks)

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
