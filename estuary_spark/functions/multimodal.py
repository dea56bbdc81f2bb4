"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas functions
over ``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are
STUBBED (deterministic fake features / NotImplementedError for real
codecs) — but the Spark-side plumbing is real and tested: schema, batch
iteration shape, partition-preserving mapInPandas, and the metadata
model. Swapping a stub for e.g. PIL/librosa is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),      # opaque bytes
        T.StructField("width", T.IntegerType()),       # typed metadata
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    mimes = F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4"))
    df = (
        spark.range(n)
        .withColumn("media_id", F.col("id"))
        .withColumn("_k", (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"))
        .withColumn("kind", F.element_at(kinds, F.col("_k")))
        .withColumn("mime", F.element_at(mimes, F.col("_k")))
        .withColumn(
            "payload",
            F.encode(F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{seed}"))), "utf-8"),
        )
        .withColumn("width", F.when(F.col("kind") == "image", (F.pmod(F.col("id"), F.lit(4)) * 256 + 256).cast("int")))
        .withColumn("height", F.when(F.col("kind") == "image", (F.pmod(F.col("id"), F.lit(3)) * 256 + 256).cast("int")))
        .withColumn("duration_ms", F.when(F.col("kind") != "image", (F.pmod(F.col("id"), F.lit(60)) * 1000).cast("int")))
    )
    return df.select([f.name for f in MEDIA_SCHEMA.fields])


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decode+embed kernel."""
    if payload is None:
        return [0.0] * dim
    acc, out = 2166136261, []
    for i, byte in enumerate(payload):
        acc = (acc ^ byte) * 16777619 % (1 << 32)
        if i % max(1, len(payload) // dim) == 0 and len(out) < dim:
            out.append((acc % 1000) / 1000.0)
    while len(out) < dim:
        out.append(0.0)
    return out


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires a codec library not in this container."""
    raise NotImplementedError("image decode requires PIL/opencv; stubbed in this environment")


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``mapInPandas`` streams Arrow record batches; each batch is processed
    as vectorized pandas — the correct shape for costly per-item decode at
    scale (one Python worker per partition, batch-at-a-time transfer).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int32"),
                    "feature": pdf["payload"].map(lambda b: _fake_feature(b, dim)),
                }
            )

    return df.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Plan video frame sampling: one row per (media_id, frame_ts) —
    the explode is JVM-side; the (stubbed) frame decode would run in a
    follow-up mapInPandas over byte ranges."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))),
        )
        .select("media_id", "frame_ts")
    )
