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
        # kind derived via plain int64 arithmetic (NOT xxhash64) so a SQL
        # oracle reproduces the synthesis exactly; 2654435761 is Knuth's
        # multiplicative-hash constant, 251/3 spread the ids across kinds
        .withColumn(
            "_k",
            (F.pmod(F.pmod(F.col("id") * F.lit(2654435761) + F.lit(seed), F.lit(251)), F.lit(3)) + 1).cast("int"),
        )
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


def _batch_features(payloads, dim: int):
    """Batch-VECTORIZED deterministic stand-in for a real decode+embed
    kernel: all payload bytes of the Arrow batch are concatenated into one
    numpy buffer and every per-item reduction runs as C-loop numpy ops
    (bincount-by-item-id), never per-element Python. THIS is the shape a
    real kernel must keep (decode batched into one contiguous buffer /
    tensor, reduce with vectorized ops) — a per-row ``Series.map(lambda)``
    would be row-at-a-time Python inside the Arrow batch, the exact
    anti-pattern the north rule bans.

    Returns (n_bytes int32 array, feature float32 matrix [n, dim]).
    """
    import numpy as np

    vals = [b if b is not None else b"" for b in payloads]
    n = len(vals)
    lengths = np.fromiter((len(b) for b in vals), dtype=np.int64, count=n)
    buf = np.frombuffer(b"".join(vals), dtype=np.uint8).astype(np.int64)
    # item id of every byte + byte position within its item
    ids = np.repeat(np.arange(n, dtype=np.int64), lengths)
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1])) if n else np.zeros(0, dtype=np.int64)
    pos = np.arange(buf.size, dtype=np.int64) - np.repeat(starts, lengths)
    feats = np.zeros((n, dim), dtype=np.float64)
    for j in range(dim):
        # per-dim position weights (public mix constants); zero-length
        # payloads fall out naturally as all-zero features via bincount
        w = (pos * ((2 * j + 1) * 40503) + (j + 1) * 2654435761) % 251 + 1
        sums = np.bincount(ids, weights=buf * w, minlength=n)
        feats[:, j] = (sums % 1000) / 1000.0
    return lengths.astype("int32"), feats.astype("float32")


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires a codec library not in this container.

    Contract for the real kernel (see ``_batch_features``): decode the
    whole Arrow batch into one contiguous tensor and keep every reduction
    vectorized — never per-row Python over the batch.
    """
    raise NotImplementedError("image decode requires PIL/opencv; stubbed in this environment")


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``mapInPandas`` streams Arrow record batches; each batch is processed
    by a batch-vectorized numpy kernel (``_batch_features``) — the correct
    shape for costly per-item decode at scale: one Python worker per
    partition, Arrow batch-at-a-time transfer, C-loop math inside.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, feats = _batch_features(pdf["payload"], dim)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "feature": list(feats),
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
