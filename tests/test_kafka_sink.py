"""Kafka sink surface (S5): key/value/headers construction with
BaseDataJsonKey lineage fields — unit-tested without a broker (the sandbox
has none), the same way the reference's key bean is testable independent
of transport (bean/key/BaseDataJsonKey.java:10-123 in /root/reference)."""

import json

from estuary_spark.sources.kafka_sink import kafka_key_value


def _lineage(row) -> dict:
    headers = {h["key"]: bytes(h["value"]) for h in row["headers"]}
    return json.loads(headers["lineage"])


def test_kafka_key_value_fields(spark):
    rows = [
        (7, "insert", "c1", 0, "hello"),
        (9, "delete", "c2", 3, None),
    ]
    df = spark.createDataFrame(rows, ["lsn", "op", "conv_id", "turn_idx", "text"])
    out = kafka_key_value(df, task_id="task-42", db_name="transcripts_db").collect()
    assert [r.__fields__ for r in out] == [["key", "value", "headers"]] * 2

    by_lsn = {}
    for r in out:
        k = _lineage(r)
        v = json.loads(r["value"])
        by_lsn[k["syncTaskSequence"]] = (r["key"], k, v)

    pk7, k7, v7 = by_lsn[7]
    assert pk7 == "c1@0"  # the message key is the PK string, nothing else
    assert k7["appName"] == "estuary-spark"
    assert k7["syncTaskId"] == "task-42"
    assert k7["dbName"] == "transcripts_db"
    assert k7["tableName"] == "transcripts"
    assert k7["eventType"] == "insert"
    assert len(k7["msgUuid"]) == 32  # md5 hex, deterministic
    assert v7["text"] == "hello" and v7["lsn"] == 7

    pk9, k9, v9 = by_lsn[9]
    assert pk9 == "c2@3"
    assert k9["eventType"] == "delete"
    assert "text" not in v9 or v9.get("text") is None  # to_json drops nulls


def test_kafka_per_pk_partition_stability(spark):
    """Same-PK messages must keep per-partition order: the message key is
    the PK alone (stable across that key's events — the default
    partitioner then pins the partition), and the explicit ``partition``
    column maps every event of a PK to one partition."""
    rows = [
        (1, "insert", "c1", 0, "a"),
        (2, "update", "c1", 0, "b"),
        (3, "update", "c1", 0, "c"),
        (4, "insert", "c2", 9, "d"),
    ]
    df = spark.createDataFrame(rows, ["lsn", "op", "conv_id", "turn_idx", "text"])
    out = kafka_key_value(df, task_id="t", num_partitions=12).collect()
    assert [r.__fields__ for r in out] == [["key", "value", "headers", "partition"]] * 4

    by_pk: dict = {}
    for r in out:
        by_pk.setdefault(r["key"], set()).add(r["partition"])
    # all three c1@0 events: one key byte-string, one partition
    assert len(by_pk["c1@0"]) == 1
    assert len(by_pk["c2@9"]) == 1
    assert all(0 <= p < 12 for ps in by_pk.values() for p in ps)
    # per-message fields (LSN) live in headers, not in the key
    assert {_lineage(r)["syncTaskSequence"] for r in out} == {1, 2, 3, 4}


def test_kafka_key_deterministic_across_runs(spark):
    """Replays must produce byte-identical messages (msgUuid is content-
    derived, not random — downstream dedup contract)."""
    df = spark.createDataFrame([(1, "insert", "c", 0, "t")], ["lsn", "op", "conv_id", "turn_idx", "text"])
    a = kafka_key_value(df, task_id="t1").collect()[0]
    b = kafka_key_value(df, task_id="t1").collect()[0]
    assert a["key"] == b["key"] and a["value"] == b["value"] and a["headers"] == b["headers"]


def test_kafka_table_col_routing(spark):
    """Multi-table streams put the per-event table name into the lineage."""
    df = spark.createDataFrame(
        [(1, "insert", "db1.conv_a", "c", 0)], ["lsn", "op", "src_table", "conv_id", "turn_idx"]
    )
    out = kafka_key_value(df, task_id="t", table_col="src_table").collect()[0]
    assert _lineage(out)["tableName"] == "db1.conv_a"


def test_changes_feed_to_kafka_tombstones(spark, tmpdir_path):
    """changes_kafka_frame: a real table's change feed becomes keyed Kafka
    messages — deletes as log-compaction tombstones (NULL value, key
    kept), upserts carrying the payload, lineage header LSN = the change
    LSN — so a compacted topic converges to the table's live state."""
    import os

    from estuary_spark.config import SyncConfig
    from estuary_spark.generator import LogSpec, write_log
    from estuary_spark.runner import run_sync
    from estuary_spark.sources.kafka_sink import changes_kafka_frame
    from estuary_spark.tables import LakeTable

    log_dir = os.path.join(tmpdir_path, "log")
    write_log(spark, LogSpec(n_convs=30, max_turns=6, seed=67), log_dir)
    cfg = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=8,
        write_mode="mor",
    )
    run_sync(spark, cfg, events_per_batch=400)
    feed = LakeTable(cfg.target_table_dir).read_changes(spark, 0)
    msgs = changes_kafka_frame(feed, task_id="feed-1").collect()
    assert msgs

    feed_rows = {
        (r["conv_id"], r["turn_idx"]): r for r in feed.collect()
    }
    assert any(r["_change_type"] == "delete" for r in feed_rows.values())
    by_key = {r["key"]: r for r in msgs}
    for (conv, turn), fr in feed_rows.items():
        m = by_key[f"{conv}@{turn}"]
        lin = _lineage(m)
        assert lin["syncTaskSequence"] == fr["_change_lsn"]
        assert lin["eventType"] == fr["_change_type"]
        if fr["_change_type"] == "delete":
            assert m["value"] is None  # tombstone
        else:
            assert json.loads(m["value"])["text"] == fr["text"]
