"""Structured Streaming wrapper: availableNow drain converges to the fold;
a second run (or a restart with the same checkpoint) is a no-op."""

import os

from estuary_spark.config import SyncConfig
from estuary_spark.generator import LogSpec, expected_final_state, read_log, write_log
from estuary_spark.runner import read_final_state
from estuary_spark.streaming import run_sync_streaming
from estuary_spark.tables import LakeTable


def _state_set(df):
    cols = sorted(df.columns)
    return {tuple(r) for r in df.select(*cols).collect()}


def test_streaming_availablenow_converges(spark, tmpdir_path):
    spec = LogSpec(n_convs=30, max_turns=6, seed=37)
    log_dir = os.path.join(tmpdir_path, "log")
    write_log(spark, spec, log_dir, n_files=6)

    cfg = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, "table"),
        lineage_dir=os.path.join(tmpdir_path, "lineage"),
        n_buckets=8,
    )
    ckpt = os.path.join(tmpdir_path, "stream-ckpt")
    stats = run_sync_streaming(spark, cfg, ckpt, max_files_per_trigger=2)
    assert stats["batches"] >= 3  # 6 files / 2 per trigger
    assert stats["upserted"] > 0

    expected = _state_set(expected_final_state(read_log(spark, log_dir)))
    assert _state_set(read_final_state(spark, cfg)) == expected

    # second drain: no new files -> no work; and a fresh checkpoint replay
    # of the same files must be skipped by the applied-range guard
    v = LakeTable(cfg.target_table_dir).current_version()
    run_sync_streaming(spark, cfg, os.path.join(tmpdir_path, "stream-ckpt2"), max_files_per_trigger=2)
    assert LakeTable(cfg.target_table_dir).current_version() == v
    assert _state_set(read_final_state(spark, cfg)) == expected


def test_streaming_mor_with_auto_compaction(spark, tmpdir_path):
    """MoR through the streaming front-end: foreachBatch delta commits,
    runner-equivalent auto-compaction between batches, fold converges."""
    spec = LogSpec(n_convs=30, max_turns=6, seed=41)
    log_dir = os.path.join(tmpdir_path, "log")
    write_log(spark, spec, log_dir, n_files=6)

    cfg = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, "table"),
        n_buckets=8,
        write_mode="mor",
        compact_every=2,
    )
    ckpt = os.path.join(tmpdir_path, "stream-ckpt")
    stats = run_sync_streaming(spark, cfg, ckpt, max_files_per_trigger=2)
    assert stats["batches"] >= 3

    t = LakeTable(cfg.target_table_dir)
    dcounts = t.manifest().get("delta_files", {})
    assert all(len(v) < 2 for v in dcounts.values())  # compaction kept chains short

    expected = _state_set(expected_final_state(read_log(spark, log_dir)))
    assert _state_set(read_final_state(spark, cfg)) == expected
