"""Maintenance ops: tombstone purge semantics and vacuum safety.

estuary analogue: the position recorder's oldest saved generation is the
low-watermark below which no in-flight events remain
(``core/lifecycle/prototype/SourceDataPositionRecorder.scala:37-44`` in
/root/reference) — tombstones older than it are garbage; newer ones must
survive so a late lower-LSN event cannot resurrect a deleted key."""

import os

from pyspark.sql import functions as F

from estuary_spark.config import SyncConfig
from estuary_spark.maintenance import purge_tombstones
from estuary_spark.runner import read_final_state, run_sync
from estuary_spark.tables import DELETED_COL, LSN_COL, LakeTable


def _mk_table(spark, tmpdir_path, rows):
    df = spark.createDataFrame(rows, ["lsn", "op", "conv_id", "turn_idx", "text"])
    log_dir = os.path.join(tmpdir_path, "log")
    df.repartitionByRange(2, "lsn").write.parquet(log_dir)
    cfg = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=4,
        envelope_cols=("lsn", "op"),
    )
    run_sync(spark, cfg, events_per_batch=100)
    return cfg, LakeTable(cfg.target_table_dir)


def test_purge_drops_old_keeps_recent_tombstones(spark, tmpdir_path):
    rows = [
        (1, "insert", "a", 0, "x"),
        (2, "delete", "a", 0, None),    # old tombstone, below watermark
        (10, "insert", "b", 0, "y"),
        (11, "delete", "b", 0, None),   # recent tombstone, above watermark
        (12, "insert", "c", 0, "z"),    # live row
    ]
    cfg, t = _mk_table(spark, tmpdir_path, rows)

    purged = purge_tombstones(spark, t, watermark_lsn=5)
    assert purged == 1

    full = t.read(spark, include_tombstones=True)
    stones = {r["conv_id"] for r in full.filter(F.col(DELETED_COL)).collect()}
    assert stones == {"b"}                      # old one gone, recent kept
    live = {r["conv_id"] for r in read_final_state(spark, cfg).collect()}
    assert live == {"c"}

    # idempotent: second purge at the same watermark is a no-op (no commit)
    v = t.current_version()
    assert purge_tombstones(spark, t, watermark_lsn=5) == 0
    assert t.current_version() == v


def test_vacuum_removes_only_dead_files(spark, tmpdir_path):
    rows = [(i, "insert", f"c{i}", 0, f"t{i}") for i in range(20)] + [
        (100 + i, "update", f"c{i}", 0, f"u{i}") for i in range(20)
    ]
    cfg, t = _mk_table(spark, tmpdir_path, rows)
    # several commits happened (multi-batch) -> superseded files exist
    before = {tuple(r) for r in read_final_state(spark, cfg).select("conv_id", "text").collect()}
    removed = t.vacuum(grace_seconds=0)
    assert removed > 0
    after = {tuple(r) for r in read_final_state(spark, cfg).select("conv_id", "text").collect()}
    assert after == before                      # current snapshot intact
    assert t.vacuum(grace_seconds=0) == 0       # second vacuum: nothing left


def test_expire_snapshots_keeps_last_n_readable(spark, tmpdir_path):
    """expire_snapshots(keep=N) is the Iceberg-parity middle ground:
    history older than N snapshots is dropped (manifests + files only
    they reference), the kept window stays time-travelable, and a final
    vacuum of the rest is still safe."""
    rows = [(i, "insert", f"c{i}", 0, f"t{i}") for i in range(20)] + [
        (100 + i, "update", f"c{i}", 0, f"u{i}") for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["lsn", "op", "conv_id", "turn_idx", "text"])
    log_dir = os.path.join(tmpdir_path, "log")
    df.repartitionByRange(4, "lsn").write.parquet(log_dir)
    cfg = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=4,
        envelope_cols=("lsn", "op"),
    )
    run_sync(spark, cfg, events_per_batch=7)  # small batches => many snapshots
    t = LakeTable(cfg.target_table_dir)

    vs = t.versions()
    assert len(vs) > 3
    keep = 2
    kept_expected = vs[-keep:]
    snap_states = {
        v: {tuple(r) for r in t.read(spark, version=v).select("conv_id", "text").collect()}
        for v in kept_expected
    }

    res = t.expire_snapshots(keep=keep, grace_seconds=0)
    assert res["snapshots_removed"] == len(vs) - keep
    assert t.versions() == kept_expected
    # every kept snapshot is still fully readable, bit-identical
    for v in kept_expected:
        assert {
            tuple(r) for r in t.read(spark, version=v).select("conv_id", "text").collect()
        } == snap_states[v]
    # expiring again is a no-op; vacuum afterwards only touches files the
    # CURRENT snapshot doesn't reference (older kept snapshots may lose
    # files — that is vacuum's documented contract, not expire's)
    assert t.expire_snapshots(keep=keep, grace_seconds=0) == {
        "snapshots_removed": 0,
        "files_removed": 0,
        "shard_files_removed": 0,
    }
    cur = {tuple(r) for r in t.read(spark).select("conv_id", "text").collect()}
    t.vacuum(grace_seconds=0)
    assert {tuple(r) for r in t.read(spark).select("conv_id", "text").collect()} == cur


def test_kafka_source_decode_shape(spark):
    """KafkaLogSource decode (S2 analogue): kafka-shaped binary values ->
    typed change events via JVM-side from_json; malformed JSON -> nulls,
    never an exception (a poison message must not kill the stream)."""
    import json

    from pyspark.sql import types as T

    from estuary_spark.sources.log_source import KafkaLogSource

    schema = T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
        ]
    )
    src = KafkaLogSource("unused:9092", "topic", schema)
    good = json.dumps(
        {"lsn": 7, "op": "insert", "conv_id": "c1", "turn_idx": 2, "text": "hi"}
    ).encode()
    raw = spark.createDataFrame([(good,), (b"not-json{",)], ["value"])
    rows = src._decode(raw).collect()
    assert rows[0]["lsn"] == 7 and rows[0]["turn_idx"] == 2 and rows[0]["text"] == "hi"
    assert rows[1]["lsn"] is None  # poison message decodes to nulls
