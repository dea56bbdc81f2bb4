"""MongoDB-oplog-shaped source (reference S6: ``MongoSourceBean.scala`` +
``OplogKey.java`` declare an oplog source the reference never wires up;
here ``OplogLogSource`` is a working LogSource): ts-(sec,inc) -> monotone
LSN, i/u/d -> typed ops, noops dropped, deletes keyed from o2, and the
whole thing syncs through the unmodified apply core — batch, multi-table
routing via ns, and streaming."""

import json
import os

from pyspark.sql import functions as F, types as T

from estuary_spark.config import SyncConfig
from estuary_spark.runner import read_final_state, run_sync
from estuary_spark.sources.log_source import OplogLogSource

VALUE_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)

RAW_COLS = ["ts_sec", "ts_inc", "op", "ns", "o", "o2"]


def _oplog_rows():
    def o(d):
        return json.dumps(d)

    return [
        # (ts_sec, ts_inc, op, ns, o, o2)
        (100, 1, "i", "db1.conv", o({"_id": "c1", "turn_idx": 0, "text": "v1"}), None),
        (100, 2, "i", "db1.conv", o({"_id": "c2", "turn_idx": 0, "text": "w1"}), None),
        (100, 3, "n", "db1.conv", None, None),  # heartbeat noop: dropped
        (101, 1, "u", "db1.conv", o({"_id": "c1", "turn_idx": 0, "text": "v2"}),
         o({"_id": "c1"})),
        # delete: the document rides only in o2 (the update selector)
        (102, 1, "d", "db1.conv", o({"turn_idx": 0}), o({"_id": "c2"})),
        (103, 1, "i", "db1.conv", o({"_id": "c3", "turn_idx": 1, "text": "x1"}), None),
    ]


def _write_oplog(spark, tmpdir_path):
    log_dir = os.path.join(tmpdir_path, "oplog")
    spark.createDataFrame(_oplog_rows(), RAW_COLS).coalesce(1).write.parquet(log_dir)
    return log_dir


def test_oplog_decode(spark, tmpdir_path):
    log_dir = _write_oplog(spark, tmpdir_path)
    src = OplogLogSource(log_dir, VALUE_SCHEMA)
    got = {
        (r["lsn"], r["op"], r["ns"], r["_id"], r["text"])
        for r in src.read_batch(spark).collect()
    }
    assert (100 << 20 | 1, "insert", "db1.conv", "c1", "v1") in got
    assert (101 << 20 | 1, "update", "db1.conv", "c1", "v2") in got
    # delete keyed from o2, noop dropped
    assert (102 << 20 | 1, "delete", "db1.conv", "c2", None) in got
    assert len(got) == 5  # 6 entries minus the noop
    # LSN range pushdown applies post-decode
    assert src.read_batch(spark, start_lsn=101 << 20).count() == 3


def test_oplog_sync_end_to_end(spark, tmpdir_path):
    """The oplog source drops into run_sync unchanged: LWW fold by the
    document key converges to the collection's live state (c2 deleted,
    c1 at its last update)."""
    log_dir = _write_oplog(spark, tmpdir_path)
    cfg = SyncConfig(
        source_log_dir=log_dir,  # unused by the injected source, but required
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=4,
        key_cols=("_id", "turn_idx"),
        envelope_cols=("lsn", "op", "ns"),
    )
    run_sync(
        spark, cfg, events_per_batch=2,
        source=OplogLogSource(log_dir, VALUE_SCHEMA),
    )
    got = {
        (r["_id"], r["turn_idx"], r["text"])
        for r in read_final_state(spark, cfg).collect()
    }
    assert got == {("c1", 0, "v2"), ("c3", 1, "x1")}


def test_oplog_streaming(spark, tmpdir_path):
    """The same oplog directory tailed through the streaming front-end
    converges to the identical state (file batches, wins==0 replay)."""
    from estuary_spark.streaming import run_sync_streaming

    log_dir = _write_oplog(spark, tmpdir_path)
    cfg = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=4,
        key_cols=("_id", "turn_idx"),
        envelope_cols=("lsn", "op", "ns"),
    )
    run_sync_streaming(
        spark, cfg, os.path.join(tmpdir_path, "ck"),
        source=OplogLogSource(log_dir, VALUE_SCHEMA),
    )
    got = {
        (r["_id"], r["text"]) for r in read_final_state(spark, cfg).collect()
    }
    assert got == {("c1", "v2"), ("c3", "x1")}
