"""spark-submit entrypoints (K2 analogue, estuary's Spark2MysqlSyncJob /
sink-task CLIs): drive jobs/changes_job.py and jobs/maintenance_job.py
in-process (monkeypatched argv; getOrCreate reuses the test session) and
check the consumer contract end-to-end — two catch-up drains through the
CLI, replayed onto a consumer state, equal the table's final state; the
consumer checkpoint advances and an empty drain holds position.
"""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

from estuary_spark.config import SyncConfig
from estuary_spark.generator import LogSpec, expected_final_state, read_log, write_log
from estuary_spark.runner import run_sync
from estuary_spark.tables import LakeTable

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))


def _run_job(monkeypatch, module, argv):
    monkeypatch.setattr(sys, "argv", [module.__name__] + argv)
    module.main()


def test_changes_job_incremental_drains(spark, tmpdir_path, monkeypatch, capsys):
    import changes_job

    log_dir = os.path.join(tmpdir_path, "log")
    table_dir = os.path.join(tmpdir_path, "t")
    out_dir = os.path.join(tmpdir_path, "feed")
    ckpt = os.path.join(tmpdir_path, "consumer.json")
    write_log(spark, LogSpec(n_convs=40, max_turns=8, seed=91), log_dir)
    log = read_log(spark, log_dir)
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    cut = (int(lo) + int(hi)) // 2

    cfg = lambda **kw: SyncConfig(  # noqa: E731
        source_log_dir=log_dir, target_table_dir=table_dir, n_buckets=8,
        write_mode="mor", compact_every=0, **kw,
    )

    # phase 1: sync to the midpoint, drain the feed through the CLI
    run_sync(spark, cfg(stop_at_lsn=cut), events_per_batch=400)
    _run_job(monkeypatch, changes_job,
             ["--table", table_dir, "--consumer-checkpoint", ckpt, "--output", out_dir])
    rep1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep1["start_lsn"] == 0 and rep1["rows"] > 0

    # empty drain: no new commits -> position holds, no rows appended
    _run_job(monkeypatch, changes_job,
             ["--table", table_dir, "--consumer-checkpoint", ckpt, "--output", out_dir])
    rep_empty = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep_empty["rows"] == 0
    assert rep_empty["next_start_lsn"] == rep1["next_start_lsn"]

    # phase 2: sync the rest, drain again from the stored position
    run_sync(spark, cfg(), events_per_batch=400)
    _run_job(monkeypatch, changes_job,
             ["--table", table_dir, "--consumer-checkpoint", ckpt, "--output", out_dir])
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["start_lsn"] == rep1["next_start_lsn"] and rep2["rows"] > 0

    # replay the drained feed (in _change_lsn order) onto an empty state:
    # must land exactly on the table's live state == the pure LWW fold
    feed = spark.read.parquet(out_dir)
    state = {}
    for r in feed.orderBy("_change_lsn").collect():
        k = (r["conv_id"], r["turn_idx"])
        if r["_change_type"] == "delete":
            state.pop(k, None)
        else:
            state[k] = r["text"]
    exp = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in expected_final_state(log).collect()
    }
    assert state == exp


def test_changes_job_retention_floor(spark, tmpdir_path, monkeypatch, capsys):
    """A consumer position below the tombstone-purge watermark fails loudly
    through the CLI unless --allow-incomplete (the binlog-retention
    contract, LogPositionHandler.scala:195-205 analogue)."""
    import changes_job

    from estuary_spark.maintenance import purge_tombstones
    from estuary_spark.tables import FeedRetentionError

    log_dir = os.path.join(tmpdir_path, "log")
    table_dir = os.path.join(tmpdir_path, "t")
    write_log(spark, LogSpec(n_convs=30, max_turns=6, seed=92, delete_pct=30), log_dir)
    cfg = SyncConfig(source_log_dir=log_dir, target_table_dir=table_dir,
                     n_buckets=8, write_mode="mor", compact_every=0)
    run_sync(spark, cfg, events_per_batch=400)
    t = LakeTable(table_dir)
    hi = read_log(spark, log_dir).agg(F.max("lsn")).first()[0]
    purge_tombstones(spark, t, int(hi) + 1)

    with pytest.raises(FeedRetentionError):
        _run_job(monkeypatch, changes_job, ["--table", table_dir, "--since-lsn", "0"])
    _run_job(monkeypatch, changes_job,
             ["--table", table_dir, "--since-lsn", "0", "--allow-incomplete"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] >= 0


def test_maintenance_job(spark, tmpdir_path, monkeypatch, capsys):
    import maintenance_job

    log_dir = os.path.join(tmpdir_path, "log")
    table_dir = os.path.join(tmpdir_path, "t")
    write_log(spark, LogSpec(n_convs=40, max_turns=8, seed=93), log_dir)
    cfg = SyncConfig(source_log_dir=log_dir, target_table_dir=table_dir,
                     n_buckets=8, write_mode="mor", compact_every=0)
    run_sync(spark, cfg, events_per_batch=300)  # several delta commits, no compaction

    _run_job(monkeypatch, maintenance_job,
             ["--table", table_dir, "--compact", "--expire-snapshots", "2", "--vacuum"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])[table_dir]
    assert rep["compacted_buckets"] > 0
    assert rep["vacuumed_files"] >= 0

    # table still equals the pure fold after the full maintenance pass
    exp = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in expected_final_state(read_log(spark, log_dir)).collect()
    }
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in LakeTable(table_dir).read(spark).collect()
    }
    assert got == exp


def test_changes_job_multi(spark, tmpdir_path, monkeypatch, capsys):
    """--multi: one CLI drain over every destination table of a routed
    multi-table sync, rows tagged _dst_table, position advances."""
    import changes_job

    from tests.test_multi_table import _mk_cfg, _write_log
    from estuary_spark.multi import run_sync_multi

    _write_log(spark, tmpdir_path)
    cfg = _mk_cfg(tmpdir_path)
    run_sync_multi(spark, cfg, events_per_batch=100)

    out_dir = os.path.join(tmpdir_path, "feed")
    ckpt = os.path.join(tmpdir_path, "consumer.json")
    _run_job(monkeypatch, changes_job,
             ["--table", cfg.target_table_dir, "--multi",
              "--consumer-checkpoint", ckpt, "--output", out_dir])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] > 0

    feed = spark.read.parquet(out_dir)
    assert "_dst_table" in feed.columns
    assert feed.select("_dst_table").distinct().count() >= 2
    # second drain from the stored position: nothing new
    _run_job(monkeypatch, changes_job,
             ["--table", cfg.target_table_dir, "--multi",
              "--consumer-checkpoint", ckpt])
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["rows"] == 0 and rep2["start_lsn"] == rep["next_start_lsn"]
