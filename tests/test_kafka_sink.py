"""Kafka sink surface (S5): key/value construction with BaseDataJsonKey
lineage fields — unit-tested without a broker (the sandbox has none), the
same way the reference's key bean is testable independent of transport
(bean/key/BaseDataJsonKey.java:10-123 in /root/reference)."""

import json

from estuary_spark.sources.kafka_sink import kafka_key_value


def test_kafka_key_value_fields(spark):
    rows = [
        (7, "insert", "c1", 0, "hello"),
        (9, "delete", "c2", 3, None),
    ]
    df = spark.createDataFrame(rows, ["lsn", "op", "conv_id", "turn_idx", "text"])
    out = kafka_key_value(df, task_id="task-42", db_name="transcripts_db").collect()
    assert [r.__fields__ for r in out] == [["key", "value"]] * 2

    by_lsn = {}
    for r in out:
        k = json.loads(r["key"])
        v = json.loads(r["value"])
        by_lsn[k["syncTaskSequence"]] = (k, v)

    k7, v7 = by_lsn[7]
    assert k7["pkString"] == "c1@0"
    assert k7["appName"] == "estuary-spark"
    assert k7["syncTaskId"] == "task-42"
    assert k7["dbName"] == "transcripts_db"
    assert k7["tableName"] == "transcripts"
    assert k7["eventType"] == "insert"
    assert len(k7["msgUuid"]) == 32  # md5 hex, deterministic
    assert v7["text"] == "hello" and v7["lsn"] == 7

    k9, v9 = by_lsn[9]
    assert k9["pkString"] == "c2@3"
    assert k9["eventType"] == "delete"
    assert "text" not in v9 or v9.get("text") is None  # to_json drops nulls


def test_kafka_key_deterministic_across_runs(spark):
    """Replays must produce byte-identical messages (msgUuid is content-
    derived, not random — downstream dedup contract)."""
    df = spark.createDataFrame([(1, "insert", "c", 0, "t")], ["lsn", "op", "conv_id", "turn_idx", "text"])
    a = kafka_key_value(df, task_id="t1").collect()[0]
    b = kafka_key_value(df, task_id="t1").collect()[0]
    assert a["key"] == b["key"] and a["value"] == b["value"]


def test_kafka_table_col_routing(spark):
    """Multi-table streams put the per-event table name into the key."""
    df = spark.createDataFrame(
        [(1, "insert", "db1.conv_a", "c", 0)], ["lsn", "op", "src_table", "conv_id", "turn_idx"]
    )
    out = kafka_key_value(df, task_id="t", table_col="src_table").collect()[0]
    assert json.loads(out["key"])["tableName"] == "db1.conv_a"
