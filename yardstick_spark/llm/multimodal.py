"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed via Arrow-batched `mapInPandas`.

The decode step is STUBBED (no image/audio libraries in this
environment): `decode_image` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake decoder (derived from
the byte content) exercises the full Spark plumbing — schema contract,
Arrow batch shapes, partition-parallel execution — which IS real and
tested.

At 100 TB the shape matters: mapInPandas streams Arrow record batches
per partition (bounded memory via spark.sql.execution.arrow
.maxRecordsPerBatch), decode is embarrassingly parallel, and the
metadata struct column lets downstream filters prune without touching
the binary payload (Parquet column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),   # image | audio | video
    StructField("payload", BinaryType()),
    StructField("meta_format", StringType()),
    StructField("meta_width", IntegerType()),
    StructField("meta_height", IntegerType()),
    StructField("meta_duration_ms", IntegerType()),
])

DECODED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("features", ArrayType(DoubleType())),
])


def attach_media_column(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Build a media table from the documents fixture: the text bytes act
    as the opaque binary payload (deterministic stand-in for image
    bytes), with plausible typed metadata derived from content length."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.expr(f"element_at(array('image','audio','video'), "
               f"CAST({id_col} % 3 + 1 AS INT))").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("raw").alias("meta_format"),
        F.expr(f"CAST(length({text_col}) % 640 + 1 AS INT)").alias("meta_width"),
        F.expr(f"CAST(length({text_col}) % 480 + 1 AS INT)").alias("meta_height"),
        F.expr(f"CAST(length({text_col}) * 10 AS INT)").alias("meta_duration_ms"),
    )


def decode_media(media: DataFrame, n_features: int = 8,
                 fake: bool = True) -> DataFrame:
    """Decode/feature-extract each payload via mapInPandas.

    fake=False is the production signature and raises
    NotImplementedError (decoder libraries not available here);
    fake=True runs a deterministic byte-level feature extractor through
    the identical Arrow plumbing.
    """
    if not fake:
        raise NotImplementedError(
            "real image/audio decode requires pillow/librosa/av; "
            "not available in this environment — use fake=True"
        )

    def decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload or b"", dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * n_features)
                    continue
                # deterministic fake "embedding": mean byte value per
                # n_features equal-width chunks, scaled to [0, 1]
                chunks = np.array_split(arr.astype(np.float64), n_features)
                feats.append([
                    round(float(c.mean()) / 255.0, 6) if c.size else 0.0
                    for c in chunks
                ])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(lambda b: len(b or b"")),
                "features": feats,
            })

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (the actual frame decode is the stubbed step).  Pure SQL
    explode — the row-multiplication pattern a real sampler would use."""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta_duration_ms"),
                           F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
