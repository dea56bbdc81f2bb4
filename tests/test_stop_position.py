"""Stop-position bounds (C6): stop_at_lsn and the new stop_at_ts
(snapshot-at-timestamp, SnapshotStateMachine.scala:62-228 analogue —
the timestamp resolves once to a positional LSN bound)."""

import os

from pyspark.sql import functions as F

from estuary_spark.config import SyncConfig
from estuary_spark.generator import LogSpec, expected_final_state, read_log, write_log
from estuary_spark.runner import read_final_state, run_sync


def _state(df):
    return {tuple(r) for r in df.select(*sorted(df.columns)).collect()}


def test_stop_at_ts_matches_truncated_fold(spark, tmpdir_path):
    spec = LogSpec(n_convs=40, max_turns=8, seed=37)
    log_dir = os.path.join(tmpdir_path, "log")
    write_log(spark, spec, log_dir)
    log = read_log(spark, log_dir)

    # choose a mid-log timestamp; resolve the expected positional bound the
    # same way the engine defines it: max lsn with ts <= stop_ts
    stop_ts = "2024-01-05 00:00:00"
    expected_stop = (
        log.filter(F.col("ts") <= F.to_timestamp(F.lit(stop_ts)))
        .agg(F.max("lsn"))
        .collect()[0][0]
    )
    assert expected_stop is not None

    cfg = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=4,
        stop_at_ts=stop_ts,
    )
    s = run_sync(spark, cfg, events_per_batch=500)
    assert s.last_lsn == expected_stop

    truncated = log.filter(F.col("lsn") <= expected_stop)
    assert _state(read_final_state(spark, cfg)) == _state(expected_final_state(truncated))

    # resuming WITHOUT the stop bound catches up to the full log
    cfg_full = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=cfg.target_table_dir,
        n_buckets=4,
    )
    run_sync(spark, cfg_full, events_per_batch=500)
    assert _state(read_final_state(spark, cfg_full)) == _state(expected_final_state(log))


def test_stop_at_ts_before_log_applies_nothing(spark, tmpdir_path):
    spec = LogSpec(n_convs=10, max_turns=4, seed=41)
    log_dir = os.path.join(tmpdir_path, "log")
    write_log(spark, spec, log_dir)
    cfg = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=2,
        stop_at_ts="1999-01-01 00:00:00",
    )
    s = run_sync(spark, cfg, events_per_batch=500)
    assert s.batches_run == 0 and s.last_lsn is None
