"""Heartbeat listener (S7/M1 analogue) and timestamp start-position
resolution (C2 analogue)."""

import os

from pyspark.sql import functions as F

from estuary_spark.config import SyncConfig
from estuary_spark.generator import LogSpec, read_log, write_log
from estuary_spark.monitor import HeartbeatListener, stall_report
from estuary_spark.runner import read_final_state, run_sync
from estuary_spark.streaming import run_sync_streaming


def test_start_ts_skips_history(spark, tmpdir_path):
    spec = LogSpec(n_convs=20, max_turns=6, seed=43)
    log_dir = os.path.join(tmpdir_path, "log")
    write_log(spark, spec, log_dir)
    log = read_log(spark, log_dir)

    # pick the event-time median as the start point
    [mid_ts] = log.select(F.unix_timestamp("ts").alias("e")).stat.approxQuantile("e", [0.5], 0.01)
    mid = log.filter(F.col("ts") >= F.timestamp_seconds(F.lit(mid_ts))).agg(
        F.min("lsn")
    ).collect()[0][0]

    cfg = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=4,
        start_ts=str(
            log.select(F.date_format(F.timestamp_seconds(F.lit(mid_ts)), "yyyy-MM-dd HH:mm:ss"))
            .first()[0]
        ),
    )
    run_sync(spark, cfg, events_per_batch=10_000)

    final = read_final_state(spark, cfg)
    # nothing before the resolved start LSN was applied
    assert final.agg(F.min("_lsn")).collect()[0][0] >= mid
    assert final.count() > 0


def test_heartbeat_listener_records_progress(spark, tmpdir_path):
    spec = LogSpec(n_convs=15, max_turns=5, seed=47)
    log_dir = os.path.join(tmpdir_path, "log")
    write_log(spark, spec, log_dir, n_files=4)

    hb_dir = os.path.join(tmpdir_path, "heartbeats")
    hb = HeartbeatListener(hb_dir).attach(spark)
    try:
        cfg = SyncConfig(
            source_log_dir=log_dir,
            target_table_dir=os.path.join(tmpdir_path, "t"),
            n_buckets=4,
        )
        run_sync_streaming(spark, cfg, os.path.join(tmpdir_path, "ckpt"), max_files_per_trigger=2)
    finally:
        hb.detach(spark)

    report = stall_report(spark, hb_dir, stale_after_s=3600)
    assert len(report) == 1
    assert report[0]["total_rows"] > 0
    assert not report[0]["stalled"]
