"""Multimodal (image/audio/video) column support.

Design: media payloads are opaque ``BINARY`` columns + a typed metadata
struct; heavy per-item work (decode / feature-extract / resize / frame
sample) runs as Arrow-batched ``mapInPandas`` so each Python worker touches
a partition-sized batch, never a row at a time.  The decode step itself is
STUBBED in this environment (no image/audio libs in the container): the
Spark-side plumbing — schema, partitioning, UDF signature, batch shape — is
real and tested; ``decoder=`` accepts a real implementation when Pillow /
torchaudio / ffmpeg are available.

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


FEATURE_SCHEMA = "id long, n_bytes long, feature array<double>"


def _stub_decoder(payload: bytes) -> list[float]:
    """Deterministic fake feature vector derived from the payload digest.

    Stands in for a real decode→embed step; REPLACE with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` + a vision encoder when the
    libs exist.  Deterministic so tests and oracles can assert on it.
    """
    import hashlib

    dig = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in dig[:8]]


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
