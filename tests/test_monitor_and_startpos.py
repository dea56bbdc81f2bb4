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


def test_transform_chain_in_pipeline(spark, tmpdir_path):
    """Per-event transforms (T1-T4) run inside apply_batch before the LWW
    reduce: whitespace normalization + PII redaction reach the table."""
    rows = [
        (1, "insert", "c1", 0, "  hello   world  "),
        (2, "update", "c1", 0, " mail  me: bob@example.com  now "),
        (3, "insert", "c2", 1, "clean text"),
    ]
    df = spark.createDataFrame(rows, ["lsn", "op", "conv_id", "turn_idx", "text"])
    log_dir = os.path.join(tmpdir_path, "log")
    df.repartitionByRange(2, "lsn").write.parquet(log_dir)

    cfg = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=2,
        envelope_cols=("lsn", "op"),
        transforms=("normalize_whitespace", "redact_pii"),
    )
    run_sync(spark, cfg, events_per_batch=10)
    out = {(r["conv_id"], r["turn_idx"]): r["text"] for r in read_final_state(spark, cfg).collect()}
    assert out[("c1", 0)] == "mail me: <email> now"
    assert out[("c2", 1)] == "clean text"
