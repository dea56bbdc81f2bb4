"""Replay-equivalence golden tests (SURVEY.md §5.1): the same log applied
(a) in one pass, (b) restarted mid-way from the checkpoint, (c) with
overlapping/duplicated offset ranges must converge to the identical final
state — the estuary idempotent-replay design (C4+T2) re-verified on the
Spark engine."""

import os

from pyspark.sql import functions as F

from estuary_spark.config import SyncConfig
from estuary_spark.generator import LogSpec, expected_final_state, read_log, write_log
from estuary_spark.runner import read_final_state, run_sync
from estuary_spark.tables import LakeTable


def _state_set(df):
    cols = sorted(df.columns)
    return {tuple(r) for r in df.select(*cols).collect()}


def _mk_cfg(tmpdir_path, name, log_dir, **kw):
    return SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, f"table-{name}"),
        checkpoint_path=os.path.join(tmpdir_path, f"ckpt-{name}.json"),
        n_buckets=8,
        **kw,
    )


def test_restart_from_every_checkpoint(spark, tmpdir_path):
    spec = LogSpec(n_convs=30, max_turns=8, seed=13)
    log_dir = os.path.join(tmpdir_path, "log")
    write_log(spark, spec, log_dir)
    expected = _state_set(expected_final_state(read_log(spark, log_dir)))

    # one-pass reference run
    cfg_a = _mk_cfg(tmpdir_path, "onepass", log_dir)
    run_sync(spark, cfg_a, events_per_batch=400)
    assert _state_set(read_final_state(spark, cfg_a)) == expected

    # interrupted runs: stop after k batches, then resume from checkpoint
    for k in (1, 2, 3):
        cfg = _mk_cfg(tmpdir_path, f"restart{k}", log_dir)
        s1 = run_sync(spark, cfg, events_per_batch=400, max_batches=k)
        assert s1.batches_run <= k
        s2 = run_sync(spark, cfg, events_per_batch=400)  # resume
        got = _state_set(read_final_state(spark, cfg))
        assert got == expected, f"restart after {k} batches diverged"


def test_overlapping_range_replay_converges(spark, tmpdir_path):
    """Simulate estuary's delayed-offset replay window: after a full run,
    force a re-run from an older LSN — committed ranges must be skipped and
    the state unchanged (byte-identical snapshot version)."""
    spec = LogSpec(n_convs=25, max_turns=6, seed=17)
    log_dir = os.path.join(tmpdir_path, "log")
    write_log(spark, spec, log_dir)

    cfg = _mk_cfg(tmpdir_path, "overlap", log_dir)
    run_sync(spark, cfg, events_per_batch=350)
    t = LakeTable(cfg.target_table_dir)
    v = t.current_version()
    expected = _state_set(read_final_state(spark, cfg))

    # replay from the middle of the log (stale checkpoint simulation)
    mid = t.applied_ranges()[0][1] // 2
    cfg_replay = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=cfg.target_table_dir,
        n_buckets=8,
        start_lsn=mid,
    )
    run_sync(spark, cfg_replay, events_per_batch=350)
    assert LakeTable(cfg.target_table_dir).current_version() == v
    assert _state_set(read_final_state(spark, cfg)) == expected


def test_partial_overlap_reapplies_only_new_tail(spark, tmpdir_path):
    """A batch range that extends past the applied watermark re-applies;
    LWW + LSN guard keep it idempotent even though old events recur."""
    spec = LogSpec(n_convs=25, max_turns=6, seed=19, dup_pct=0)
    log_dir = os.path.join(tmpdir_path, "log")
    write_log(spark, spec, log_dir)
    log_df = read_log(spark, log_dir)
    max_lsn = log_df.agg(F.max("lsn")).collect()[0][0]
    expected = _state_set(expected_final_state(log_df))

    cfg = _mk_cfg(tmpdir_path, "partial", log_dir)
    # first pass applies only a prefix of the log
    s1 = run_sync(spark, cfg, events_per_batch=300, max_batches=2)
    assert s1.batches_run == 2
    # second pass: one giant batch over the WHOLE log — its range is only
    # partially inside the applied watermark, so it re-applies everything;
    # the LSN guard + LWW make the overlap idempotent
    cfg2 = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=cfg.target_table_dir,
        n_buckets=8,
        start_lsn=0,
    )
    s2 = run_sync(spark, cfg2, events_per_batch=10**9)
    assert s2.batches_run == 1
    got = _state_set(read_final_state(spark, cfg))
    assert got == expected
