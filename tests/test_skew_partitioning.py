"""Skew / partitioning behavior (SURVEY.md P2/P4/P6): salted LWW reduce
correctness under a hot key, bucket routing balance and stability."""

from pyspark.sql import functions as F

from estuary_spark.operators.lww import lww_reduce
from estuary_spark.tables import bucket_expr


def test_salted_lww_hot_key_correct(spark):
    """One key receives 50k events (extreme skew); winner must still be
    the max-LSN event, with and without salting, and counts must agree."""
    hot = spark.range(50_000).select(
        F.lit("hot").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.col("id").alias("lsn"),
        F.lit("update").alias("op"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("text"),
    )
    cold = spark.range(1_000).select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        (F.col("id") + 100_000).alias("lsn"),
        F.lit("insert").alias("op"),
        F.lit("cold").alias("text"),
    )
    df = hot.unionByName(cold)

    for salt in (0, 8):
        w = lww_reduce(df, ["conv_id", "turn_idx"], salt_factor=salt)
        got = {r["conv_id"]: (r["text"], r["_n_events"]) for r in w.collect()}
        assert got["hot"] == ("v49999", 50_000)
        assert len(got) == 1_001


def test_lww_tie_break_op_priority(spark):
    """Equal LSN: delete outranks update outranks insert (deterministic)."""
    df = spark.createDataFrame(
        [
            ("k", 0, 5, "insert", "a"),
            ("k", 0, 5, "delete", "b"),
            ("k", 0, 5, "update", "c"),
        ],
        ["conv_id", "turn_idx", "lsn", "op", "text"],
    )
    w = lww_reduce(df, ["conv_id", "turn_idx"]).collect()[0]
    assert w["op"] == "delete"


def test_bucket_expr_stable_and_balanced(spark):
    """Bucket routing must be deterministic across sessions/plans and
    roughly balanced (consistent-hash-router analogue)."""
    n_buckets = 32
    df = spark.range(20_000).select(
        F.concat(F.lit("conv-"), F.col("id").cast("string")).alias("conv_id")
    )
    b1 = df.select("conv_id", bucket_expr("conv_id", n_buckets).alias("b"))
    counts = {r["b"]: r["n"] for r in b1.groupBy("b").agg(F.count("*").alias("n")).collect()}
    assert len(counts) == n_buckets
    avg = 20_000 / n_buckets
    assert all(0.6 * avg < c < 1.4 * avg for c in counts.values()), counts

    # stability: recomputing yields identical assignment
    b2 = df.select("conv_id", bucket_expr("conv_id", n_buckets).alias("b2"))
    joined = b1.join(b2, "conv_id")
    assert joined.filter(F.col("b") != F.col("b2")).count() == 0


def test_partition_strategies_shape(spark):
    """MOD/PRIMARY_KEY/TABLE/TRANSACTION map to repartition shapes
    (README.md:68-90 ordering is about parallelism granularity)."""
    df = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("conv_id"),
        (F.col("id") % 7).cast("int").alias("turn_idx"),
        F.col("id").alias("lsn"),
    )
    # TRANSACTION = total order = single partition
    assert df.coalesce(1).rdd.getNumPartitions() == 1
    # PRIMARY_KEY = hash(conv, turn) across N
    pk = df.repartition(8, "conv_id", "turn_idx")
    assert pk.rdd.getNumPartitions() == 8
    # rows for one key land in one partition
    one = pk.withColumn("p", F.spark_partition_id()).filter(
        (F.col("conv_id") == "c3") & (F.col("turn_idx") == 0)
    )
    assert one.select("p").distinct().count() == 1
