"""Behavior tests for the round-4 verdict/advice fixes: salted LWW
op-rank tie-break parity, autosalt detector cost, GC grace windows,
rename crash-window recovery, DDL table-filter enforcement, and
lineage-compaction concurrency safety."""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from estuary_spark.config import SyncConfig
from estuary_spark.lineage import compact_lineage
from estuary_spark.multi import _ddl_table_allowed, _rename_table, run_sync_multi
from estuary_spark.operators.lww import choose_salt_factor, lww_reduce
from estuary_spark.runner import read_final_state, run_sync
from estuary_spark.tables import LakeTable


# ---------------------------------------------------------------- LWW P6


def test_salted_tie_break_matches_unsalted(spark):
    """VERDICT r4: an equal-LSN delete+insert flood for one key must
    resolve identically salted and unsalted — the phase-two ``max_by``
    carries the delete>update>insert rank, so winners cannot depend on
    which salt sub-group a row landed in."""
    # one hot key: 4k inserts and 4k deletes ALL at the same LSN, plus a
    # lower-LSN update that must lose either way
    hot = spark.range(8_000).select(
        F.lit("hot").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit(100).alias("lsn"),
        F.when(F.col("id") % 2 == 0, "insert").otherwise("delete").alias("op"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("text"),
    )
    low = spark.createDataFrame(
        [("hot", 0, 50, "update", "older")],
        ["conv_id", "turn_idx", "lsn", "op", "text"],
    )
    df = hot.unionByName(low)
    for salt in (2, 8):
        w0 = lww_reduce(df, ["conv_id", "turn_idx"], salt_factor=0).collect()
        ws = lww_reduce(df, ["conv_id", "turn_idx"], salt_factor=salt).collect()
        assert len(w0) == len(ws) == 1
        # op rank must pick delete over the equal-LSN inserts, both paths
        assert w0[0]["op"] == "delete"
        assert ws[0]["op"] == "delete"
        assert ws[0]["lsn"] == w0[0]["lsn"] == 100
        assert ws[0]["_n_events"] == w0[0]["_n_events"] == 8_001


def test_autosalt_detector_is_one_action(spark, monkeypatch):
    """VERDICT r4 #6: with the planner's n_hint, the autosalt detector
    runs exactly ONE action (the sampled per-key count whose sum doubles
    as the row-count estimate) — no separate ``count()`` job."""
    df = spark.range(50_000).select(
        F.concat(F.lit("c"), (F.col("id") % 100).cast("string")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.col("id").alias("lsn"),
    )
    cls = type(df)  # the concrete (classic) DataFrame class
    actions = {"count": 0, "first": 0}
    real_count, real_first = cls.count, cls.first
    monkeypatch.setattr(
        cls, "count", lambda s: (actions.__setitem__("count", actions["count"] + 1), real_count(s))[1]
    )
    monkeypatch.setattr(
        cls, "first", lambda s: (actions.__setitem__("first", actions["first"] + 1), real_first(s))[1]
    )
    salt = choose_salt_factor(
        df, ["conv_id", "turn_idx"], flood_threshold=1_000_000, n_hint=50_000
    )
    assert salt == 0  # uniform batch: no extra shuffle engaged
    assert actions == {"count": 0, "first": 1}  # one action, no count job


def test_autosalt_skipped_below_span_threshold(spark, tmpdir_path, monkeypatch):
    """A batch whose LSN span is at or under the flood threshold cannot
    contain a flood — apply_batch must skip the detector entirely
    (zero extra jobs on the uniform-small common case)."""
    import estuary_spark.operators.lww as lww_mod

    calls = {"n": 0}
    real = lww_mod.choose_salt_factor

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(lww_mod, "choose_salt_factor", counting)
    rows = [(i, "insert", f"c{i}", 0, f"t{i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["lsn", "op", "conv_id", "turn_idx", "text"])
    log_dir = os.path.join(tmpdir_path, "log")
    df.write.parquet(log_dir)
    cfg = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=2,
        envelope_cols=("lsn", "op"),
        salt_factor=-1,
        autosalt_threshold=500_000,  # span 0..9 << threshold
    )
    run_sync(spark, cfg, events_per_batch=100)
    assert calls["n"] == 0
    got = {r["conv_id"] for r in read_final_state(spark, cfg).collect()}
    assert got == {f"c{i}" for i in range(10)}


# ------------------------------------------------------------- GC grace


def _sync_twice(spark, tmpdir_path):
    rows = [(i, "insert", f"c{i}", 0, f"t{i}") for i in range(20)] + [
        (100 + i, "update", f"c{i}", 0, f"u{i}") for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["lsn", "op", "conv_id", "turn_idx", "text"])
    log_dir = os.path.join(tmpdir_path, "log")
    df.repartitionByRange(2, "lsn").write.parquet(log_dir)
    cfg = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=4,
        envelope_cols=("lsn", "op"),
    )
    run_sync(spark, cfg, events_per_batch=50)  # 2+ commits -> dead files
    return cfg, LakeTable(cfg.target_table_dir)


def test_vacuum_grace_protects_young_files(spark, tmpdir_path):
    """ADVICE r4: a concurrent writer publishes data/shard files BEFORE
    its snapshot, so vacuum/expire must skip files younger than the grace
    window — only a grace of 0 (quiesced table) collects them."""
    cfg, t = _sync_twice(spark, tmpdir_path)
    before = {tuple(r) for r in read_final_state(spark, cfg).select("conv_id", "text").collect()}
    # everything just written is young: a graced vacuum removes NOTHING
    assert t.vacuum(grace_seconds=3600) == 0
    assert t.expire_snapshots(keep=1, grace_seconds=3600)["shard_files_removed"] == 0
    # quiesced (grace 0): the superseded files go
    assert t.vacuum(grace_seconds=0) > 0
    after = {tuple(r) for r in read_final_state(spark, cfg).select("conv_id", "text").collect()}
    assert after == before


def test_vacuum_grace_simulates_inflight_commit(spark, tmpdir_path):
    """A young unreferenced file (an in-flight commit's pre-published
    data) survives a graced vacuum even when old orphans are collected."""
    cfg, t = _sync_twice(spark, tmpdir_path)
    # age every existing file past the grace window
    for dirpath, _d, files in os.walk(cfg.target_table_dir):
        for fn in files:
            p = os.path.join(dirpath, fn)
            os.utime(p, (time.time() - 7200, time.time() - 7200))
    # plant a young unreferenced file = an in-flight commit's data
    inflight = os.path.join(cfg.target_table_dir, "data", "inflight-commit.parquet")
    os.makedirs(os.path.dirname(inflight), exist_ok=True)
    with open(inflight, "wb") as f:
        f.write(b"not yet referenced")
    removed = t.vacuum(grace_seconds=600)
    assert removed > 0                      # old superseded files collected
    assert os.path.exists(inflight)         # in-flight data survives
    assert t.vacuum(grace_seconds=0) >= 1   # quiesced: now it goes
    assert not os.path.exists(inflight)


# ---------------------------------------------------- rename crash window


def _multi_cfg(tmpdir_path, **kw):
    base = dict(
        source_log_dir=os.path.join(tmpdir_path, "log"),
        target_table_dir=os.path.join(tmpdir_path, "tables"),
        n_buckets=2,
        envelope_cols=("lsn", "op"),
        table_col="src_table",
    )
    base.update(kw)
    return SyncConfig(**base)


def _seed_multi(spark, tmpdir_path, table="db1.a"):
    rows = [
        (1, "insert", table, "c1", 0, "a1"),
        (2, "insert", table, "c2", 0, "a2"),
    ]
    df = spark.createDataFrame(
        rows, ["lsn", "op", "src_table", "conv_id", "turn_idx", "text"]
    )
    df.write.parquet(os.path.join(tmpdir_path, "log"))
    cfg = _multi_cfg(tmpdir_path)
    run_sync_multi(spark, cfg, events_per_batch=10)
    return cfg


def test_rename_crash_window_fences_old_name(spark, tmpdir_path):
    """ADVICE r4: driver died after the directory move but before the
    old-name tombstone landed. Replaying the rename must still create the
    fence, so straggler events under the old name cannot resurrect
    pre-rename state."""
    cfg = _seed_multi(spark, tmpdir_path)
    old_dir = os.path.join(cfg.target_table_dir, "db1.a")
    new_dir = os.path.join(cfg.target_table_dir, "db1.b")
    shutil.move(old_dir, new_dir)  # the crash: move happened, tombstone did not
    assert not LakeTable(old_dir).exists()

    _rename_table(cfg, {}, "db1.a", "db1.b", at=10)  # the replay
    t_old = LakeTable(old_dir)
    assert t_old.exists()
    props = t_old.properties()
    assert int(props["dropped_at_lsn"]) == 10
    assert props["renamed_to"] == "db1.b"
    assert int(props["table_ops_lsn"]) >= 10
    assert t_old.read(spark).count() == 0          # tombstone is empty
    assert LakeTable(new_dir).read(spark).count() == 2  # data followed the move


def test_rename_refences_unfenced_recreated_old_name(spark, tmpdir_path):
    """If straggler events recreated the old name UNFENCED after the
    move, re-lowering the rename truncates and fences it again."""
    cfg = _seed_multi(spark, tmpdir_path)
    old_dir = os.path.join(cfg.target_table_dir, "db1.a")
    new_dir = os.path.join(cfg.target_table_dir, "db1.b")
    _rename_table(cfg, {}, "db1.a", "db1.b", at=10)
    # straggler resurrection: wipe the fence by recreating the old table
    shutil.rmtree(old_dir)
    shutil.copytree(new_dir, old_dir)  # unfenced clone full of rows
    t_old = LakeTable(old_dir)
    assert "dropped_at_lsn" not in t_old.properties()

    _rename_table(cfg, {}, "db1.a", "db1.b", at=10)  # replayed rename
    t_old = LakeTable(old_dir)
    assert int(t_old.properties()["dropped_at_lsn"]) == 10
    assert t_old.read(spark).count() == 0


# ----------------------------------------------------- DDL table filter


def test_ddl_respects_table_filter(spark, tmpdir_path):
    """ADVICE r4: a DDL statement naming a table outside this sync's
    whitelist must be dropped — no fence, no destination directory."""
    rows = [
        (1, "insert", "db1.a", "c1", 0, "a1"),
        (2, "ddl", "db2.audit", None, None, "TRUNCATE TABLE db2.audit"),
        (3, "ddl", "db1.x", None, None, "DROP TABLE db1.secret_bl"),
        (4, "insert", "db1.a", "c2", 0, "a2"),
    ]
    df = spark.createDataFrame(
        rows, ["lsn", "op", "src_table", "conv_id", "turn_idx", "text"]
    )
    df.write.parquet(os.path.join(tmpdir_path, "log"))
    cfg = _multi_cfg(
        tmpdir_path,
        table_filter=r"^db1\.",
        table_blacklist=r"secret",
        ddl_sql_col="text",
    )
    run_sync_multi(spark, cfg, events_per_batch=10)
    dsts = set(os.listdir(cfg.target_table_dir))
    assert dsts == {"db1.a"}  # neither db2.audit nor db1.secret_bl created
    assert _ddl_table_allowed(cfg, "db1.a")
    assert not _ddl_table_allowed(cfg, "db2.audit")
    assert not _ddl_table_allowed(cfg, "db1.secret_bl")


# -------------------------------------------------- lineage compaction


def _write_lineage_files(dirpath, n):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dirpath, exist_ok=True)
    for i in range(n):
        pq.write_table(
            pa.table({"batch_id": [i], "rows_upserted": [i * 10]}),
            os.path.join(dirpath, f"batch-{i}.parquet"),
        )


def test_compact_lineage_lock_excludes_rival(tmpdir_path):
    """ADVICE r4: a held lock makes a rival compactor a no-op skip, and a
    stale (crashed) lock is reclaimed."""
    d = os.path.join(tmpdir_path, "lineage")
    _write_lineage_files(d, 4)
    lock = os.path.join(d, ".compact.lock")
    with open(lock, "w"):
        pass
    res = compact_lineage(d)
    assert res.get("skipped") == "locked"
    assert len([f for f in os.listdir(d) if f.endswith(".parquet")]) == 4

    # stale lock (crashed compactor): reclaimed, compaction proceeds
    os.utime(lock, (time.time() - 7200, time.time() - 7200))
    res = compact_lineage(d)
    assert res["files_before"] == 4 and res["files_after"] == 1
    assert not os.path.exists(lock)


def test_compact_lineage_tolerates_vanished_source(tmpdir_path, monkeypatch):
    """A source file deleted mid-run (racing manual cleanup) is tolerated,
    not fatal; surviving rows are preserved."""
    import pyarrow.parquet as pq

    d = os.path.join(tmpdir_path, "lineage")
    _write_lineage_files(d, 3)
    real_read = pq.read_table
    state = {"zapped": False}

    def racing_read(path, *a, **kw):
        if not state["zapped"] and path.endswith("batch-1.parquet"):
            state["zapped"] = True
            os.remove(path)
            raise FileNotFoundError(path)
        return real_read(path, *a, **kw)

    monkeypatch.setattr(pq, "read_table", racing_read)
    res = compact_lineage(d)
    assert res["files_after"] == 1
    assert res["rows"] == 2  # the two surviving sources' rows


# ----------------------------------------------- partition strategy (P1)


def test_partition_strategy_is_wired(spark):
    """VERDICT r4: the P1 knob must be an execution contract, not a
    silent no-op. TABLE/TRANSACTION fold through ONE LSN-sorted
    partition; MOD/PRIMARY_KEY keep the fully-parallel plan."""
    from estuary_spark.apply import order_for_strategy
    from estuary_spark.config import (
        PARTITION_MOD,
        PARTITION_PRIMARY_KEY,
        PARTITION_TABLE,
        PARTITION_TRANSACTION,
        SyncConfig,
    )

    df = spark.range(10_000).select(
        F.concat(F.lit("c"), (F.col("id") % 64).cast("string")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        (10_000 - F.col("id")).alias("lsn"),  # deliberately reverse order
    ).repartition(8)

    def mk(strategy):
        return SyncConfig(
            source_log_dir="/nonexistent", target_table_dir="/nonexistent",
            partition_strategy=strategy,
        )

    for s in (PARTITION_MOD, PARTITION_PRIMARY_KEY):
        assert order_for_strategy(df, mk(s)) is df  # untouched: full parallel

    for s in (PARTITION_TABLE, PARTITION_TRANSACTION):
        ordered = order_for_strategy(df, mk(s))
        assert ordered.rdd.getNumPartitions() == 1
        lsns = [r["lsn"] for r in ordered.select("lsn").collect()]
        assert lsns == sorted(lsns)  # total LSN order within the partition


def test_transaction_strategy_serializes_fanout():
    """TRANSACTION = one global total order: the multi-table fan-out must
    run serially; every other level stays concurrent."""
    from estuary_spark.config import (
        PARTITION_MOD,
        PARTITION_PRIMARY_KEY,
        PARTITION_TABLE,
        PARTITION_TRANSACTION,
        SyncConfig,
    )
    from estuary_spark.multi import _fanout_workers

    def mk(strategy):
        return SyncConfig(
            source_log_dir="x", target_table_dir="y",
            partition_strategy=strategy, multi_apply_parallelism=8,
        )

    assert _fanout_workers(mk(PARTITION_TRANSACTION), 16) == 1
    assert _fanout_workers(mk(PARTITION_TABLE), 16) == 8      # tables parallel
    assert _fanout_workers(mk(PARTITION_MOD), 16) == 8
    assert _fanout_workers(mk(PARTITION_PRIMARY_KEY), 4) == 4


def test_all_strategies_same_final_state(spark, tmpdir_path):
    """The ladder trades parallelism, never correctness: every strategy
    folds the same log to the identical final state."""
    from estuary_spark.config import (
        PARTITION_MOD,
        PARTITION_PRIMARY_KEY,
        PARTITION_TABLE,
        PARTITION_TRANSACTION,
    )

    rows = [
        (1, "insert", "db1.a", "c1", 0, "v1"),
        (2, "insert", "db1.b", "k1", 0, "w1"),
        (3, "update", "db1.a", "c1", 0, "v2"),
        (4, "delete", "db1.b", "k1", 0, None),
        (5, "insert", "db1.b", "k2", 0, "w2"),
        (6, "update", "db1.a", "c1", 0, "v3"),
    ]
    df = spark.createDataFrame(
        rows, ["lsn", "op", "src_table", "conv_id", "turn_idx", "text"]
    )
    df.write.parquet(os.path.join(tmpdir_path, "log"))

    from estuary_spark.multi import read_final_state_multi

    states = {}
    for s in (PARTITION_MOD, PARTITION_PRIMARY_KEY, PARTITION_TABLE, PARTITION_TRANSACTION):
        tgt = os.path.join(tmpdir_path, f"tables-{s}")
        cfg = _multi_cfg(tmpdir_path, partition_strategy=s)
        cfg = __import__("dataclasses").replace(cfg, target_table_dir=tgt)
        run_sync_multi(spark, cfg, events_per_batch=2)
        states[s] = {
            (r["_dst_table"], r["conv_id"], r["turn_idx"], r["text"])
            for r in read_final_state_multi(spark, cfg).collect()
        }
    expect = {("db1.a", "c1", 0, "v3"), ("db1.b", "k2", 0, "w2")}
    assert all(v == expect for v in states.values()), states
