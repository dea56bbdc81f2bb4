"""Heartbeat listener (S7/M1 analogue), timestamp start-position
resolution, and retention-floor validation of resumed positions (C2
analogue — the reference re-validates a checkpointed binlog position
against the files still on the server, LogPositionHandler.scala:195-205
in /root/reference)."""

import os

import pytest
from pyspark.sql import functions as F

from estuary_spark.checkpoint import LogRetentionError
from estuary_spark.config import SyncConfig
from estuary_spark.generator import LogSpec, read_log, write_log
from estuary_spark.monitor import HeartbeatListener, stall_report
from estuary_spark.runner import read_final_state, run_sync
from estuary_spark.sources.log_source import ParquetLogSource, log_retention_floor, purge_log
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


def _setup_stale_checkpoint(spark, tmpdir_path):
    """Sync part of the log with a checkpoint, then purge log files past
    the checkpointed position — the 'binlog vacuumed under a stopped
    task' scenario."""
    spec = LogSpec(n_convs=20, max_turns=6, seed=51)
    log_dir = os.path.join(tmpdir_path, "log")
    write_log(spark, spec, log_dir, n_files=8)
    log = read_log(spark, log_dir)
    q25, q50 = (int(q) for q in log.stat.approxQuantile("lsn", [0.25, 0.5], 0.001))

    cfg = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, "t"),
        checkpoint_path=os.path.join(tmpdir_path, "ckpt.json"),
        n_buckets=4,
        stop_at_lsn=q25,
    )
    run_sync(spark, cfg, events_per_batch=10_000)

    purge_log(log_dir, below_lsn=q50)
    assert log_retention_floor(log_dir) == q50
    assert q25 + 1 < q50  # the checkpointed resume point is below the floor
    return cfg, q50


def test_stale_checkpoint_below_retention_floor_fails(spark, tmpdir_path):
    cfg, _floor = _setup_stale_checkpoint(spark, tmpdir_path)
    cfg.stop_at_lsn = None
    with pytest.raises(LogRetentionError) as ei:
        run_sync(spark, cfg, events_per_batch=10_000)
    assert ei.value.start < ei.value.floor


def test_retention_gap_reset_resumes_from_floor(spark, tmpdir_path):
    cfg, floor = _setup_stale_checkpoint(spark, tmpdir_path)
    cfg.stop_at_lsn = None
    cfg.on_retention_gap = "reset"
    summary = run_sync(spark, cfg, events_per_batch=10_000)
    # the gap [checkpoint, floor) is deliberately skipped; everything
    # retained from the floor onward is applied
    assert summary.last_lsn is not None and summary.last_lsn >= floor
    assert read_final_state(spark, cfg).count() > 0


def test_runner_accepts_custom_log_source(spark, tmpdir_path):
    """The runner seam (S1): any LogSource drops in — the apply core
    never reads the log directory itself."""

    class CountingSource(ParquetLogSource):
        batch_reads = 0

        def read_batch(self, spark, start_lsn=None, end_lsn=None):
            CountingSource.batch_reads += 1
            return super().read_batch(spark, start_lsn, end_lsn)

    spec = LogSpec(n_convs=10, max_turns=4, seed=52)
    log_dir = os.path.join(tmpdir_path, "log")
    write_log(spark, spec, log_dir)

    cfg = SyncConfig(
        source_log_dir="/nonexistent-ignored",  # the source, not cfg, names the log
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=4,
    )
    summary = run_sync(spark, cfg, events_per_batch=10_000, source=CountingSource(log_dir))
    assert CountingSource.batch_reads >= 1
    assert summary.rows_upserted > 0
    n_keys = read_log(spark, log_dir).groupBy("conv_id", "turn_idx").count().count()
    final = read_final_state(spark, cfg)  # tombstones folded: <= distinct keys
    assert 0 < final.count() <= n_keys


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
