"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed via Arrow-batched `mapInPandas`.

Two decode paths share the identical Arrow plumbing:

- `fake=True`: a deterministic byte-level featureizer — the stand-in
  for container formats this environment has no libraries for
  (JPEG/MP3/MP4 need pillow/librosa/av).
- `fake=False`: REAL decoders, pure numpy/stdlib, for formats whose
  containers are simple enough to parse by hand: binary PPM (P6)
  images and 16-bit PCM WAV (RIFF) audio.  Header parse, payload
  extraction and normalization are genuine; `synth_media` builds
  round-trippable payloads from the documents fixture so the whole
  write->decode->featurize path is oracle-checked end to end.

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


REAL_DECODED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # ppm | wav
    StructField("width", IntegerType()),        # images only
    StructField("height", IntegerType()),
    StructField("n_samples", LongType()),       # pixels*3 or pcm samples
    StructField("mean_val", DoubleType()),      # mean normalized sample
    StructField("features", ArrayType(DoubleType())),
])


def write_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6): 'P6\\n<w> <h>\\n255\\n' + raw RGB triplets."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb payload must be width*height*3 bytes")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def parse_ppm(payload: bytes):
    """-> (width, height, uint8 ndarray of RGB samples).  Supports the
    common single-whitespace P6 layout (no comment lines)."""
    import re as _re

    import numpy as np

    m = _re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if not m:
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                        offset=m.end())
    return w, h, arr


def write_wav(samples, sample_rate: int = 16000) -> bytes:
    """Mono 16-bit PCM WAV (RIFF/WAVE with fmt + data chunks)."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(payload: bytes):
    """-> int16 ndarray of PCM samples; walks RIFF chunks, validates the
    fmt chunk (PCM, mono, 16-bit)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off, data = 12, None
    while off + 8 <= len(payload):
        cid = payload[off:off + 4]
        sz = struct.unpack("<I", payload[off + 4:off + 8])[0]
        chunk = payload[off + 8:off + 8 + sz]
        if cid == b"fmt ":
            audio_fmt, channels, _, _, _, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError("only mono 16-bit PCM supported")
        elif cid == b"data":
            data = np.frombuffer(chunk, dtype="<i2")
        off += 8 + sz + (sz & 1)  # chunks are word-aligned
    if data is None:
        raise ValueError("no data chunk")
    return data


def synth_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Round-trippable media payloads derived from doc ids alone: even
    ids become solid-color PPM images, odd ids constant-sample WAV
    audio.  Every decoded property is an analytic function of the id,
    so a SQL oracle can verify the full encode->decode path without
    parsing binaries itself."""

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads, kinds = [], []
            for i in pdf[id_col].astype("int64"):
                if i % 2 == 0:
                    w, h, v = int(i % 13 + 3), int(i % 7 + 2), int(i % 251)
                    payloads.append(write_ppm(w, h, bytes([v]) * (w * h * 3)))
                    kinds.append("image")
                else:
                    n, s = int(i % 50 + 10), int(i % 1000 - 500)
                    payloads.append(
                        write_wav(np.full(n, s, dtype=np.int16))
                    )
                    kinds.append("audio")
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "media_type": kinds,
                "payload": payloads,
            })

    from .dedup import _spread  # single-file corpora: one split = one core

    return _spread(docs.select(id_col)).mapInPandas(
        gen,
        schema="media_id BIGINT, media_type STRING, payload BINARY",
    )


def synth_gradient_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """PPM payloads with a per-pixel gradient, v(x, y) = (x + y*w + id)
    % 251 on all three channels — unlike `synth_media`'s solid colors,
    resampling a gradient moves the mean, so a SQL oracle can verify
    the actual nearest-neighbor index math of `resize_media`, not just
    the plumbing."""

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf[id_col].astype("int64"):
                w, h = int(i % 13 + 3), int(i % 7 + 2)
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)
                v = ((x[None, :] + y[:, None] * w + int(i)) % 251
                     ).astype(np.uint8)
                rgb = np.repeat(v[:, :, None], 3, axis=2).tobytes()
                rows.append((int(i), "image", write_ppm(w, h, rgb)))
            yield pd.DataFrame(
                rows, columns=["media_id", "media_type", "payload"])

    from .dedup import _spread

    return _spread(docs.select(id_col)).mapInPandas(
        gen, schema="media_id BIGINT, media_type STRING, payload BINARY",
    )


def resize_media(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of PPM image payloads to (out_w, out_h):
    source row/col for output pixel (x2, y2) is (floor(y2*h/out_h),
    floor(x2*w/out_w)) — the standard NN index map.  Non-PPM payloads
    pass through unchanged (width/height NULL).

    Output rows are (media_id, media_type, payload, width, height) with
    the payload re-encoded as PPM, so the result composes with
    `decode_media(fake=False)` and any downstream media operator.
    Arrow-batched mapInPandas, embarrassingly parallel per partition —
    the same shape a library-backed (pillow) resize would use at scale.
    """

    def rz(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                    pdf["media_id"], pdf["media_type"], pdf["payload"]):
                b = bytes(payload or b"")
                if b[:2] == b"P6":
                    w, h, arr = parse_ppm(b)
                    img = arr.reshape(h, w, 3)
                    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
                    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
                    out = img[ys[:, None], xs[None, :], :]
                    rows.append((mid, mtype,
                                 write_ppm(out_w, out_h, out.tobytes()),
                                 out_w, out_h))
                else:
                    rows.append((mid, mtype, b, None, None))
            yield pd.DataFrame(rows, columns=[
                "media_id", "media_type", "payload", "width", "height"])

    return media.mapInPandas(
        rz,
        schema=("media_id BIGINT, media_type STRING, payload BINARY, "
                "width INT, height INT"),
    )


def decode_media(media: DataFrame, n_features: int = 8,
                 fake: bool = True) -> DataFrame:
    """Decode/feature-extract each payload via mapInPandas.

    fake=True: deterministic byte-level featureizer (stand-in for
    library-backed container formats), schema DECODED_SCHEMA.
    fake=False: real PPM/WAV decoders (see parse_ppm/parse_wav), schema
    REAL_DECODED_SCHEMA; unsupported payloads raise ValueError.
    Both stream Arrow batches partition-parallel.
    """
    if not fake:

        def decode_real(batches: Iterator) -> Iterator:
            import numpy as np
            import pandas as pd

            for pdf in batches:
                rows = []
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    b = bytes(payload or b"")
                    if b[:2] == b"P6":
                        w, h, arr = parse_ppm(b)
                        norm = arr.astype(np.float64) / 255.0
                        kind, width, height = "ppm", w, h
                    elif b[:4] == b"RIFF":
                        pcm = parse_wav(b)
                        norm = np.abs(pcm.astype(np.float64) / 32768.0)
                        kind, width, height = "wav", None, None
                    else:
                        raise ValueError(
                            "unsupported payload (PPM P6 or PCM WAV only); "
                            "use fake=True for opaque formats"
                        )
                    chunks = np.array_split(norm, n_features)
                    rows.append((
                        mid, kind, width, height, int(norm.size),
                        float(norm.mean()) if norm.size else 0.0,
                        [float(c.mean()) if c.size else 0.0 for c in chunks],
                    ))
                yield pd.DataFrame(
                    rows, columns=[f.name for f in REAL_DECODED_SCHEMA]
                )

        return media.mapInPandas(decode_real, schema=REAL_DECODED_SCHEMA)

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
