"""Kafka delivery semantics through the in-process broker fake
(VERDICT r3 #8): the engine-owned ordering contract — PK-only message
keys => one partition per key => per-key LSN order across sequentially
published change-feed frames — asserted END-TO-END from LakeTable
commits through read_changes + changes_kafka_frame into partition logs,
with tombstone compaction converging to the table's live state."""

import json
import os

from pyspark.sql import functions as F, types as T

from estuary_spark.sources.kafka_fake import FakeKafkaBroker, default_partition, murmur2
from estuary_spark.sources.kafka_sink import changes_kafka_frame
from estuary_spark.tables import BUCKET_COL, DELETED_COL, LSN_COL, LakeTable, bucket_expr

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def _delta(spark, t, rows, lo, hi, batch_id):
    df = (
        spark.createDataFrame(rows, ["conv_id", "turn_idx", "text", LSN_COL, DELETED_COL])
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
        .withColumn(BUCKET_COL, bucket_expr("conv_id", 4))
    )
    t.commit_delta(spark, df, applied_range=(lo, hi), batch_id=batch_id)


def test_murmur2_partitioner_properties():
    # deterministic, 32-bit, spreads keys; same key -> same partition
    assert murmur2(b"") == murmur2(b"")
    vals = {murmur2(f"k{i}".encode()) for i in range(200)}
    assert len(vals) > 190  # no degenerate collapse
    assert all(0 <= v <= 0xFFFFFFFF for v in vals)
    parts = {default_partition(f"c{i}@0".encode(), 8) for i in range(100)}
    assert parts == set(range(8))  # all partitions reachable
    for k in (b"c1@0", b"c2@3", b"hot@0"):
        assert default_partition(k, 8) == default_partition(k, 8)


def test_same_pk_one_partition_lsn_order_end_to_end(spark, tmpdir_path):
    """Three commit windows -> three feed frames published in order: every
    PK's messages land in ONE partition with strictly increasing LSN, and
    the compacted view equals the table's live state."""
    root = os.path.join(tmpdir_path, "t")
    t = LakeTable.create(root, SCHEMA, n_buckets=4, key_cols=["conv_id", "turn_idx"])
    _delta(spark, t, [(f"c{i}", 0, f"v1-{i}", 10 + i, False) for i in range(20)], 10, 29, 0)
    _delta(
        spark,
        t,
        [(f"c{i}", 0, f"v2-{i}", 40 + i, False) for i in range(10)]
        + [("c3", 0, None, 55, True)],  # delete c3
        40,
        59,
        1,
    )
    _delta(spark, t, [(f"c{i}", 0, f"v3-{i}", 70 + i, False) for i in range(5, 15)], 70, 89, 2)

    broker = FakeKafkaBroker(num_partitions=8)
    for lo, hi in ((10, 29), (40, 59), (70, 89)):
        frame = changes_kafka_frame(
            t.read_changes(spark, lo, end_lsn=hi).orderBy("_change_lsn"),
            task_id="task-1",
        )
        broker.publish_frame(frame)

    msgs = broker.messages()
    # 20 + 10 + 10 NET changes (window 2 folds c3's v2 upsert + delete
    # into one delete — the feed is net-per-key per window)
    assert len(msgs) == 40
    # (a) same PK -> exactly one partition
    pk_parts: dict[str, set[int]] = {}
    for m in msgs:
        pk_parts.setdefault(m.key, set()).add(m.partition)
    assert all(len(ps) == 1 for ps in pk_parts.values())
    # and the partition is the Kafka default-partitioner assignment
    for k, ps in pk_parts.items():
        assert ps == {default_partition(k.encode(), 8)}

    # (b) per-PK LSN strictly increasing IN EACH PARTITION LOG (offset
    # order = delivery order a consumer observes)
    for p, log in broker.partitions.items():
        seen: dict[str, int] = {}
        assert [m.offset for m in log] == list(range(len(log)))
        for m in log:
            lsn = (
                json.loads(m.value)["lsn"]
                if m.value is not None
                else json.loads(m.headers["lineage"])["syncTaskSequence"]
            )
            assert seen.get(m.key, -1) < lsn
            seen[m.key] = lsn

    # (c) tombstone: c3's delete is NULL-valued with the key kept
    c3 = [m for m in msgs if m.key == "c3@0"]
    assert c3[-1].value is None and len(c3) == 2

    # (d) lineage header carries attribution without parsing the payload
    lin = json.loads(msgs[0].headers["lineage"])
    assert lin["syncTaskId"] == "task-1" and "msgUuid" in lin

    # (e) log compaction converges to the table's live state
    live = {
        f"{r['conv_id']}@{r['turn_idx']}": r["text"] for r in t.read(spark).collect()
    }
    compacted = {k: json.loads(m.value)["text"] for k, m in broker.compacted().items()}
    assert compacted == live


def test_explicit_partition_column_respected(spark, tmpdir_path):
    root = os.path.join(tmpdir_path, "t")
    t = LakeTable.create(root, SCHEMA, n_buckets=4, key_cols=["conv_id", "turn_idx"])
    _delta(spark, t, [(f"c{i}", 0, f"v{i}", i, False) for i in range(12)], 0, 11, 0)
    frame = changes_kafka_frame(
        t.read_changes(spark, 0), task_id="task-1", num_partitions=3
    )
    broker = FakeKafkaBroker(num_partitions=3)
    broker.publish_frame(frame)
    # partition column (xxhash-based pinning) wins over the default
    # partitioner, and every message carried one
    for p, log in broker.partitions.items():
        for m in log:
            assert m.partition == p
    assert sum(len(v) for v in broker.partitions.values()) == 12
