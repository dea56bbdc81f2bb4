"""End-to-end slice: synthetic CDC log -> incremental merge-apply ->
final table state equals the declarative LWW fold (the invariant from
BASELINE.json: per-turn text equality under stable (conv_id, turn_idx,
LSN) ordering)."""

import os

from pyspark.sql import functions as F

from estuary_spark.config import SyncConfig
from estuary_spark.generator import LogSpec, expected_final_state, read_log, write_log
from estuary_spark.runner import read_final_state, run_sync
from estuary_spark.tables import LakeTable


def _assert_same(df_a, df_b, key_cols=("conv_id", "turn_idx")):
    a = {tuple(r) for r in df_a.select(*sorted(df_a.columns)).collect()}
    b = {tuple(r) for r in df_b.select(*sorted(df_b.columns)).collect()}
    only_a = list(a - b)[:5]
    only_b = list(b - a)[:5]
    assert a == b, f"mismatch: {len(a - b)} only in engine {only_a}, {len(b - a)} only in fold {only_b}"


def test_end_to_end_fold_equivalence(spark, tmpdir_path):
    spec = LogSpec(n_convs=60, max_turns=10, seed=7)
    log_dir = os.path.join(tmpdir_path, "log")
    write_log(spark, spec, log_dir)

    cfg = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, "table"),
        lineage_dir=os.path.join(tmpdir_path, "lineage"),
        checkpoint_path=os.path.join(tmpdir_path, "ckpt.json"),
        n_buckets=8,
    )
    summary = run_sync(spark, cfg, events_per_batch=500)
    assert summary.batches_run >= 2
    assert summary.rows_upserted > 0

    log_df = read_log(spark, log_dir)
    expected = expected_final_state(log_df)
    got = read_final_state(spark, cfg)
    assert sorted(got.columns) == sorted(expected.columns)
    _assert_same(got, expected)


def test_offset_ranges_contiguous_exactly_once(spark, tmpdir_path):
    spec = LogSpec(n_convs=20, max_turns=6, seed=11)
    log_dir = os.path.join(tmpdir_path, "log")
    write_log(spark, spec, log_dir)

    cfg = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, "table"),
        n_buckets=4,
    )
    run_sync(spark, cfg, events_per_batch=300)
    t = LakeTable(cfg.target_table_dir)
    ranges = t.applied_ranges()
    # merged into a single contiguous range -> non-overlapping coverage
    assert len(ranges) == 1, ranges

    # replaying the whole log again must be a pure no-op (recommit skip)
    v_before = t.current_version()
    s2 = run_sync(spark, SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=cfg.target_table_dir,
        n_buckets=4,
        start_lsn=0,
    ), events_per_batch=300)
    # no new snapshot written by replay
    assert LakeTable(cfg.target_table_dir).current_version() == v_before
    assert s2.batches_run == 0 or s2.rows_upserted == 0
