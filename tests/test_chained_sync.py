"""Chained table -> table sync: ``TableChangesLogSource`` feeds one
LakeTable's change feed through the unmodified apply core into a replica
table (estuary's multi-hop MySQL -> Kafka -> MySQL topology,
kafka source beans + sinker chain in /root/reference, minus the broker).

The replica inherits every engine guarantee — exactly-once replay via
checkpoint + applied ranges, LWW idempotence, additive schema evolution,
retention-floor validation against the upstream's tombstone-purge
watermark — because the feed rows ARE ordinary change events.
"""

import os

import pytest
from pyspark.sql import functions as F

from estuary_spark.checkpoint import LogRetentionError
from estuary_spark.config import SyncConfig
from estuary_spark.generator import LogSpec, expected_final_state, read_log, write_log
from estuary_spark.maintenance import purge_tombstones
from estuary_spark.runner import run_sync
from estuary_spark.sources.log_source import TableChangesLogSource
from estuary_spark.tables import LakeTable


def _cfgs(tmpdir_path, **replica_kw):
    up = SyncConfig(
        source_log_dir=os.path.join(tmpdir_path, "log"),
        target_table_dir=os.path.join(tmpdir_path, "up"),
        n_buckets=8, write_mode="mor", compact_every=0,
    )
    rep = SyncConfig(
        source_log_dir=up.target_table_dir,  # informational; source object rules
        target_table_dir=os.path.join(tmpdir_path, "rep"),
        checkpoint_path=os.path.join(tmpdir_path, "rep_ckpt.json"),
        n_buckets=4,  # replica may bucket differently
        write_mode="mor", compact_every=0, **replica_kw,
    )
    return up, rep


def _state(spark, root):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in LakeTable(root).read(spark).select("conv_id", "turn_idx", "text").collect()
    }


def test_chained_sync_converges_incrementally(spark, tmpdir_path):
    up, rep = _cfgs(tmpdir_path)
    write_log(spark, LogSpec(n_convs=40, max_turns=8, seed=71, delete_pct=20), up.source_log_dir)
    log = read_log(spark, up.source_log_dir)
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    cut = (int(lo) + int(hi)) // 2
    src = TableChangesLogSource(up.target_table_dir)

    # phase 1: upstream to midpoint, then replicate
    run_sync(spark, SyncConfig(**{**up.__dict__, "stop_at_lsn": cut}), events_per_batch=400)
    s1 = run_sync(spark, rep, events_per_batch=400, source=src)
    assert s1.batches_run > 0
    assert _state(spark, rep.target_table_dir) == _state(spark, up.target_table_dir)

    # idle catch-up: nothing new upstream -> no replica commits
    v_before = LakeTable(rep.target_table_dir).manifest()["version"]
    run_sync(spark, rep, events_per_batch=400, source=src)
    assert LakeTable(rep.target_table_dir).manifest()["version"] == v_before

    # phase 2: finish upstream, incremental catch-up lands on the pure fold
    run_sync(spark, up, events_per_batch=400)
    s2 = run_sync(spark, rep, events_per_batch=400, source=src)
    assert s2.batches_run > 0
    exp = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in expected_final_state(log).collect()
    }
    assert _state(spark, rep.target_table_dir) == exp

    # replay: wiping the checkpoint and re-running is a no-op state-wise
    os.remove(rep.checkpoint_path)
    run_sync(spark, rep, events_per_batch=400, source=src)
    assert _state(spark, rep.target_table_dir) == exp


def test_chained_sync_schema_evolution(spark, tmpdir_path):
    """Additive upstream evolution (new tool_args/latency_ms columns)
    propagates through the feed into the replica's schema."""
    up, rep = _cfgs(tmpdir_path)
    write_log(spark, LogSpec(n_convs=30, max_turns=6, seed=72), up.source_log_dir, evolve=True)
    run_sync(spark, up, events_per_batch=500)
    run_sync(spark, rep, events_per_batch=500, source=TableChangesLogSource(up.target_table_dir))

    up_cols = set(LakeTable(up.target_table_dir).schema.names)
    rep_cols = set(LakeTable(rep.target_table_dir).schema.names)
    assert "tool_args" in rep_cols and "latency_ms" in rep_cols
    assert up_cols == rep_cols
    got = LakeTable(rep.target_table_dir).read(spark)
    exp = LakeTable(up.target_table_dir).read(spark)
    cols = sorted(c for c in rep_cols if not c.startswith("_") or c == "_lsn")
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, exp.select(*cols).collect())
    )


def test_chained_sync_retention_floor(spark, tmpdir_path):
    """A replica checkpoint below the upstream's tombstone-purge watermark
    fails with LogRetentionError (deletes in the gap are unobservable);
    on_retention_gap='reset' resumes deliberately from the floor."""
    up, rep = _cfgs(tmpdir_path)
    write_log(spark, LogSpec(n_convs=30, max_turns=6, seed=73, delete_pct=30), up.source_log_dir)
    log = read_log(spark, up.source_log_dir)
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    cut = (int(lo) + int(hi)) // 2
    src = TableChangesLogSource(up.target_table_dir)

    run_sync(spark, SyncConfig(**{**up.__dict__, "stop_at_lsn": cut}), events_per_batch=400)
    run_sync(spark, rep, events_per_batch=400, source=src)
    r1 = _state(spark, rep.target_table_dir)

    run_sync(spark, up, events_per_batch=400)
    purge_tombstones(spark, LakeTable(up.target_table_dir), int(hi) + 1)
    assert src.min_available_lsn() == int(hi) + 1

    # the replica's checkpoint (~cut) is below the watermark: fail loudly
    with pytest.raises(LogRetentionError):
        run_sync(spark, rep, events_per_batch=400, source=src)
    # 'reset' = estuary's deliberate earliest-available fallback: resume
    # from the floor, SKIPPING the unobservable gap (not silently, not by
    # crashing). The gap's changes are lost by explicit choice — the
    # replica keeps its pre-gap state and the checkpoint lands at the
    # floor, so future upstream commits (lsn >= floor) propagate normally.
    run_sync(
        spark,
        SyncConfig(**{**rep.__dict__, "on_retention_gap": "reset"}),
        events_per_batch=400,
        source=src,
    )
    assert _state(spark, rep.target_table_dir) == r1


def test_chained_sync_streaming(spark, tmpdir_path):
    """The --streaming --from-table path: the replica tails the upstream's
    delta commits as a file stream (stream_changes) through foreachBatch
    apply. Two incremental drains (availableNow) land on the pure fold;
    the stream checkpoint makes the second drain pick up only the new
    delta files."""
    from estuary_spark.streaming import run_sync_streaming

    up, rep = _cfgs(tmpdir_path)
    rep = SyncConfig(**{**rep.__dict__, "checkpoint_path": None})
    ckpt = os.path.join(tmpdir_path, "rep-stream-ckpt")
    write_log(spark, LogSpec(n_convs=40, max_turns=8, seed=74, delete_pct=20), up.source_log_dir)
    log = read_log(spark, up.source_log_dir)
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    cut = (int(lo) + int(hi)) // 2
    src = TableChangesLogSource(up.target_table_dir)

    run_sync(spark, SyncConfig(**{**up.__dict__, "stop_at_lsn": cut}), events_per_batch=400)
    s1 = run_sync_streaming(spark, rep, ckpt, source=src)
    assert s1["batches"] > 0
    assert _state(spark, rep.target_table_dir) == _state(spark, up.target_table_dir)

    run_sync(spark, up, events_per_batch=400)
    s2 = run_sync_streaming(spark, rep, ckpt, source=src)
    assert s2["batches"] > 0 and s2["upserted"] + s2["deleted"] > 0
    exp = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in expected_final_state(log).collect()
    }
    assert _state(spark, rep.target_table_dir) == exp
