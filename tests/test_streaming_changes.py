"""Streaming CDC-out (streaming/changes.stream_changes): the table's MoR
delta commits tailed as a file stream — full drain equals the batch
catch-up feed after a per-key fold, restarts with a checkpoint deliver
only new commits, and compaction rewrites never re-enter the stream."""

import os

from pyspark.sql import functions as F

from estuary_spark.apply import apply_batch
from estuary_spark.config import SyncConfig
from estuary_spark.generator import LogSpec, read_log, write_log
from estuary_spark.maintenance import compact
from estuary_spark.runner import run_sync
from estuary_spark.streaming.changes import stream_changes
from estuary_spark.tables import LakeTable


def _drain(spark, table_root, ckpt, rows_out):
    q = (
        stream_changes(spark, table_root, max_files_per_trigger=4)
        .writeStream.foreachBatch(lambda df, _bid: rows_out.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _fold_net(rows):
    best = {}
    for r in rows:
        k = (r["conv_id"], r["turn_idx"])
        if k not in best or r["_change_lsn"] > best[k]["_change_lsn"]:
            best[k] = r
    return {
        k: (r["text"], r["_change_lsn"], r["_change_type"]) for k, r in best.items()
    }


def test_stream_equals_batch_feed_and_resumes(spark, tmpdir_path):
    log_dir = os.path.join(tmpdir_path, "log")
    write_log(spark, LogSpec(n_convs=40, max_turns=8, seed=59), log_dir)
    cfg = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=8,
        write_mode="mor",
        compact_every=0,
    )
    run_sync(spark, cfg, events_per_batch=500)
    t = LakeTable(cfg.target_table_dir)

    ckpt = os.path.join(tmpdir_path, "ckpt")
    rows: list = []
    _drain(spark, cfg.target_table_dir, ckpt, rows)
    assert rows, "stream drained nothing"
    assert any(r["_change_type"] == "delete" for r in rows)

    # full drain, folded per key == the batch catch-up feed
    want = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["_change_lsn"], r["_change_type"])
        for r in t.read_changes(spark, 0).collect()
    }
    assert _fold_net(rows) == want

    # a compaction dereferences deltas but must not re-deliver anything,
    # and a NEW delta commit after it is picked up from the checkpoint
    compact(spark, t, max_files_per_bucket=10**9, max_delta_files_per_bucket=0)
    hi = int(read_log(spark, log_dir).agg(F.max("lsn")).first()[0])
    extra = spark.createDataFrame(
        [(hi + 1, "update", "conv-0", 0, "post-stream edit"),
         (hi + 2, "delete", "conv-1", 1, None)],
        read_log(spark, log_dir).select("lsn", "op", "conv_id", "turn_idx", "text").schema,
    )
    apply_batch(spark, t, extra, cfg, 999, offset_range=(hi + 1, hi + 2))

    new_rows: list = []
    _drain(spark, cfg.target_table_dir, ckpt, new_rows)
    got = {(r["conv_id"], r["turn_idx"]): (r["text"], r["_change_type"]) for r in new_rows}
    assert got == {
        ("conv-0", 0): ("post-stream edit", "upsert"),
        ("conv-1", 1): (None, "delete"),
    }
