"""Multimodal (image/audio/video) column plumbing.

Media is carried as opaque ``binary`` columns with a typed metadata struct —
the standard large-scale layout (payload bytes stay columnar in parquet;
metadata prunes without touching blobs). Decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages: the
Spark-side contract (schemas, batching, partition-preserving execution) is
real and tested; the actual codec calls are STUBBED because image/audio
libraries are not available in this container — each stub raises
``NotImplementedError`` unless the deterministic fake implementation is
requested, which derives features purely from the bytes so results are
reproducible and oracle-checkable (e.g. ``octet_length``-style features).

Scale notes: ``mapInPandas`` streams Arrow batches through one Python worker
per core with no shuffle; blob columns should be pruned before any wide
transform (select the binary column only inside the decode stage).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_bytes", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", FloatType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_media_meta(
    df: DataFrame, content_col: str, media_format: str
) -> DataFrame:
    """Wrap a raw binary column with the typed metadata struct."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_format).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.octet_length(F.col(content_col)).cast("long").alias("n_bytes"),
        ),
    )


def _require_codec(name: str):
    raise NotImplementedError(
        f"Real {name} decoding requires a codec library (PIL/ffmpeg/soundfile) "
        "that is not available in this environment. Pass fake=True for the "
        "deterministic byte-derived implementation."
    )


def extract_features(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    content_col: str = "content",
    n_features: int = 8,
    fake: bool = True,
) -> DataFrame:
    """Feature-extract each blob via Arrow-batched ``mapInPandas``.

    The fake implementation derives features purely from the bytes
    (length, mean byte value, and per-stripe byte means), so the output is
    deterministic and the scalar columns are SQL-oracle-checkable
    (``octet_length`` etc.). The real implementation is a stub.
    """
    if not fake:
        _require_codec("media")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                arr = np.frombuffer(blob or b"", dtype=np.uint8)
                n = int(arr.size)
                mean = float(arr.mean()) if n else 0.0
                stripes = np.array_split(arr, n_features) if n else []
                feats = [float(s.mean()) if s.size else 0.0 for s in stripes]
                feats += [0.0] * (n_features - len(feats))
                out_rows.append((int(mid), n, mean, feats))
            yield pd.DataFrame(
                out_rows, columns=["media_id", "n_bytes", "byte_mean", "features"]
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(
        gen, schema=FEATURE_SCHEMA
    )


def decode_image(df: DataFrame, **kwargs) -> DataFrame:
    """STUB: real image decode (PIL) is unavailable in this container."""
    if not kwargs.get("fake", False):
        _require_codec("image")
    return extract_features(df, fake=True, **{k: v for k, v in kwargs.items() if k != "fake"})


def sample_frames(df: DataFrame, *, every_n_bytes: int = 1024, fake: bool = True,
                  id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Frame-sample a video-like blob: one output row per sampled offset.

    Fake implementation emits (media_id, frame_index, offset, frame_byte) per
    ``every_n_bytes`` — exercising the 1→N mapInPandas row-expansion shape a
    real frame sampler has.
    """
    if not fake:
        _require_codec("video")

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_index", IntegerType()),
            StructField("offset", LongType()),
            StructField("frame_byte", IntegerType()),
        ]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                blob = blob or b""
                for i, off in enumerate(range(0, len(blob), every_n_bytes)):
                    rows.append((int(mid), i, off, blob[off]))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "offset", "frame_byte"]
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(gen, schema=schema)
