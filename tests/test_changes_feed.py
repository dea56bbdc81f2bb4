"""CDC-out change feed (``LakeTable.read_changes``): net-changes
correctness incl. deletes, incremental-consumer equivalence (state + feed
= next state), bounded-window historical reads, and the per-commit LSN
range bookkeeping that prunes old commits driver-side.

The feed is the Delta-CDF / Iceberg-incremental-scan analogue of the
surface estuary serves downstream via its Kafka topic
(``kafka/KafkaSinkFunc.scala`` in /root/reference) — here the lake table
itself is the feed source.
"""

import os

from pyspark.sql import functions as F

from estuary_spark.config import SyncConfig
from estuary_spark.generator import LogSpec, read_log, write_log
from estuary_spark.maintenance import compact
from estuary_spark.runner import run_sync
from estuary_spark.tables import LakeTable


def _mk_cfg(tmpdir_path, **kw):
    return SyncConfig(
        source_log_dir=os.path.join(tmpdir_path, "log"),
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=8,
        **kw,
    )


def _expected_changes(log_df, start, end=None):
    """Reference statement of the feed: per key, the winner among events
    with lsn <= end; emitted iff its lsn >= start; delete -> 'delete'."""
    ev = log_df if end is None else log_df.filter(F.col("lsn") <= end)
    value_cols = [
        c for c in ev.columns if c not in ("lsn", "op", "commit_ts", "txn_id", "schema_ver")
    ]
    payload = [c for c in value_cols if c not in ("conv_id", "turn_idx")]
    w = (
        ev.groupBy("conv_id", "turn_idx")
        .agg(F.max_by(F.struct(*payload, "op", "lsn"), F.col("lsn")).alias("w"))
        .select("conv_id", "turn_idx", "w.*")
        .filter(F.col("lsn") >= start)
    )
    return {
        (r["conv_id"], r["turn_idx"]): (
            r["text"],
            r["lsn"],
            "delete" if r["op"] == "delete" else "upsert",
        )
        for r in w.collect()
    }


def _got_changes(df):
    return {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["_change_lsn"], r["_change_type"])
        for r in df.collect()
    }


def _run_mor(spark, tmpdir_path, spec, **cfg_kw):
    write_log(spark, LogSpec(**spec), os.path.join(tmpdir_path, "log"))
    cfg = _mk_cfg(tmpdir_path, write_mode="mor", **cfg_kw)
    run_sync(spark, cfg, events_per_batch=400)
    return cfg, read_log(spark, cfg.source_log_dir)


def test_changes_feed_net_semantics(spark, tmpdir_path):
    """Catch-up from the log midpoint: one row per changed key, latest
    payload, winning LSN, delete emitted as 'delete' — across delta files
    AND a mid-run compaction (tombstones survive compaction)."""
    cfg, log = _run_mor(
        spark, tmpdir_path, dict(n_convs=50, max_turns=8, seed=31), compact_every=3
    )
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    cut = (int(lo) + int(hi)) // 2

    got = _got_changes(LakeTable(cfg.target_table_dir).read_changes(spark, start_lsn=cut))
    exp = _expected_changes(log, cut)
    assert got == exp
    assert any(v[2] == "delete" for v in got.values()), "log produced no deletes to verify"


def test_changes_feed_incremental_consumer(spark, tmpdir_path):
    """Completeness: a consumer holding the state as of `cut` who applies
    the feed (upserts overwrite, deletes remove) lands exactly on the
    table's current state — nothing missed, nothing extra."""
    cfg, log = _run_mor(
        spark, tmpdir_path, dict(n_convs=40, max_turns=8, seed=37), compact_every=0
    )
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    cut = (int(lo) + int(hi)) // 2

    t = LakeTable(cfg.target_table_dir)
    # consumer state as of cut (exclusive): winners among events < cut
    state = {
        k: v for k, v in _expected_changes(log, 0, end=cut - 1).items() if v[2] != "delete"
    }
    for k, (text, lsn, typ) in _got_changes(t.read_changes(spark, start_lsn=cut)).items():
        if typ == "delete":
            state.pop(k, None)
        else:
            state[k] = (text, lsn, "upsert")

    current = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["_lsn"], "upsert")
        for r in t.read(spark).collect()
    }
    assert state == current


def test_changes_feed_bounded_window(spark, tmpdir_path):
    """end_lsn bound on an uncompacted table: the feed reproduces the
    state-as-of-end for every key changed in [start, end]. History is
    retained at BATCH granularity (a batch's intermediate versions are
    pre-folded by LWW before commit), so end is exact at a commit
    boundary — taken here from the manifest's per-commit ranges."""
    cfg, log = _run_mor(
        spark, tmpdir_path, dict(n_convs=40, max_turns=8, seed=41), compact_every=0
    )
    t = LakeTable(cfg.target_table_dir)
    ranges = t.manifest()["properties"]["commit_lsn_ranges"]
    his = sorted(r[1] for d, r in ranges.items() if "delta-" in d)
    end = his[len(his) // 2]  # a mid-run batch boundary

    got = _got_changes(t.read_changes(spark, start_lsn=0, end_lsn=end))
    assert got == _expected_changes(log, 0, end=end)


def test_changes_feed_prunes_old_commits(spark, tmpdir_path):
    """Driver-side pruning: a catch-up read over the tail of the log must
    not open delta files from commits entirely below start_lsn (checked
    via the scan's inputFiles), and per-delta-commit manifest ranges are
    exactly the applied batch ranges."""
    cfg, log = _run_mor(
        spark, tmpdir_path, dict(n_convs=50, max_turns=8, seed=43), compact_every=0
    )
    t = LakeTable(cfg.target_table_dir)
    ranges = t.manifest()["properties"]["commit_lsn_ranges"]
    deltas = {d: r for d, r in ranges.items() if "delta-" in d}
    assert len(deltas) >= 3, "need several delta commits to make pruning observable"
    # every delta commit's recorded range is one of the applied batch ranges
    hi = int(log.agg(F.max("lsn")).first()[0])
    cut = max(r[0] for r in deltas.values())  # start of the newest batch

    feed = t.read_changes(spark, start_lsn=cut)
    opened = set(feed.inputFiles())
    for d, r in deltas.items():
        files_of_d = {f for f in opened if d in f}
        if r[1] < cut:
            assert not files_of_d, f"commit {d} (range {r}) below start was opened"
    # pruning never costs correctness
    assert _got_changes(feed) == _expected_changes(log, cut)
    assert hi >= cut


def test_apply_changes_operator(spark, tmpdir_path):
    """operators.changes.apply_changes: state snapshotted at a commit
    boundary + the net feed since it = the table's current state —
    upserts replace, deletes remove, untouched keys pass through."""
    from estuary_spark.operators.changes import apply_changes

    cfg, log = _run_mor(
        spark, tmpdir_path, dict(n_convs=40, max_turns=8, seed=53), compact_every=0
    )
    t = LakeTable(cfg.target_table_dir)
    his = sorted(
        r[1]
        for d, r in t.manifest()["properties"]["commit_lsn_ranges"].items()
        if "delta-" in d
    )
    boundary = his[len(his) // 2]

    state0 = t.read_changes(spark, 0, end_lsn=boundary).filter(
        F.col("_change_type") == "upsert"
    )
    feed = t.read_changes(spark, boundary + 1)
    assert feed.filter(F.col("_change_type") == "delete").count() > 0
    state1 = apply_changes(state0, feed, ["conv_id", "turn_idx"], broadcast_feed=True)

    got = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["_change_lsn"])
        for r in state1.collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["_lsn"])
        for r in t.read(spark).collect()
    }
    assert got == want


def test_commit_range_bookkeeping_compaction(spark, tmpdir_path):
    """Compaction rewrites history into new base files: its commit range
    is the conservative [0, max applied hi], and range entries for
    dropped delta dirs leave the map (O(live commits), not O(history))."""
    cfg, log = _run_mor(
        spark, tmpdir_path, dict(n_convs=30, max_turns=6, seed=47), compact_every=0
    )
    t = LakeTable(cfg.target_table_dir)
    before = t.manifest()["properties"]["commit_lsn_ranges"]
    assert any("delta-" in d for d in before)

    compact(spark, t, max_files_per_bucket=10**9, max_delta_files_per_bucket=0)
    after = t.manifest()["properties"]["commit_lsn_ranges"]
    assert not any("delta-" in d for d in after), "dead delta dirs kept in range map"
    hi = int(log.agg(F.max("lsn")).first()[0])
    assert [0, hi] in list(after.values())

    # a post-compaction catch-up beyond the table head reads nothing
    assert t.read_changes(spark, start_lsn=hi + 1).count() == 0


def test_feed_retention_guard(spark, tmpdir_path):
    """read_changes below the tombstone-purge watermark raises
    FeedRetentionError (deletes are physically gone — a silent feed would
    miss them); allow_incomplete opts into upserts-only semantics; the
    watermark records monotonically even on a purge that removes nothing."""
    import pytest

    from estuary_spark.maintenance import compact, purge_tombstones
    from estuary_spark.tables import FeedRetentionError

    cfg, log = _run_mor(
        spark, tmpdir_path, dict(n_convs=30, max_turns=6, seed=71), compact_every=0
    )
    t = LakeTable(cfg.target_table_dir)
    hi = int(log.agg(F.max("lsn")).first()[0])
    compact(spark, t, max_files_per_bucket=10**9, max_delta_files_per_bucket=0)
    purge_tombstones(spark, t, watermark_lsn=hi + 1)
    assert t.properties()["tombstone_purge"]["watermark_lsn"] == hi + 1

    with pytest.raises(FeedRetentionError, match="tombstone-purge"):
        t.read_changes(spark, 0)
    # upserts-only escape hatch: same keys as the tombstone-free state
    got = _got_changes(t.read_changes(spark, 0, allow_incomplete=True))
    exp = {k: v for k, v in _expected_changes(log, 0).items() if v[2] != "delete"}
    assert got == exp
    # at/after the floor the guard does not fire
    t.read_changes(spark, hi + 1).count()

    # a lower watermark never regresses the floor
    purge_tombstones(spark, t, watermark_lsn=5)
    assert t.properties()["tombstone_purge"]["watermark_lsn"] == hi + 1


def test_read_changes_multi(spark, tmpdir_path):
    """Multi-table feed: per-destination net changes union under one
    global LSN position, tagged _dst_table, rename map respected."""
    from estuary_spark.multi import read_changes_multi, run_sync_multi

    cols = ["lsn", "op", "src_table", "conv_id", "turn_idx", "text"]
    rows = [
        (1, "insert", "db1.conv_a", "c1", 0, "a-v1"),
        (2, "insert", "db1.conv_b", "c1", 0, "b-v1"),
        (3, "update", "db1.conv_a", "c1", 0, "a-v2"),
        (4, "insert", "db1.conv_a", "c2", 1, "a2-v1"),
        (5, "delete", "db1.conv_b", "c1", 0, None),
    ]
    spark.createDataFrame(rows, cols).repartitionByRange(2, "lsn").write.parquet(
        os.path.join(tmpdir_path, "log")
    )
    cfg = SyncConfig(
        source_log_dir=os.path.join(tmpdir_path, "log"),
        target_table_dir=os.path.join(tmpdir_path, "tables"),
        n_buckets=2,
        envelope_cols=("lsn", "op"),
        table_col="src_table",
        table_renames={"db1.conv_b": "conv_b_renamed"},
        write_mode="mor",
    )
    run_sync_multi(spark, cfg, events_per_batch=2)

    got = {
        (r["_dst_table"], r["conv_id"], r["turn_idx"]): (r["text"], r["_change_type"])
        for r in read_changes_multi(spark, cfg, start_lsn=3).collect()
    }
    assert got == {
        ("db1.conv_a", "c1", 0): ("a-v2", "upsert"),
        ("db1.conv_a", "c2", 1): ("a2-v1", "upsert"),
        ("conv_b_renamed", "c1", 0): (None, "delete"),
    }


def test_changes_feed_across_schema_evolution(spark, tmpdir_path):
    """A feed spanning an additive schema evolution: pre-evolution commits
    read the new column as NULL (explicit-schema scan), post-evolution
    changes carry it — one feed, one schema, no consumer-side branching."""
    from estuary_spark.generator import LogSpec, write_log

    log_dir = os.path.join(tmpdir_path, "log")
    spec = LogSpec(n_convs=30, max_turns=6, seed=79, evolve_frac=0.5)
    write_log(spark, spec, log_dir, evolve=True)
    cfg = _mk_cfg(tmpdir_path, write_mode="mor", envelope_cols=("lsn", "op", "schema_ver"))
    run_sync(spark, cfg, events_per_batch=300)
    t = LakeTable(cfg.target_table_dir)

    feed = t.read_changes(spark, 0)
    cols = set(feed.columns)
    assert "model_meta" in cols or any(c not in ("conv_id", "turn_idx", "text",
        "role", "tool", "ts", "_change_lsn", "_change_type") for c in cols), cols

    # equivalence against the reference fold over the full log (evolved
    # column included; unionByName pads the pre-evolution events)
    log = read_log(spark, log_dir)
    extra = [c for c in feed.columns if c not in ("_change_lsn", "_change_type")]
    got = {
        tuple(r[c] for c in ("conv_id", "turn_idx")): (
            tuple(r[c] for c in extra),
            r["_change_type"],
        )
        for r in feed.collect()
    }
    value_cols = [c for c in extra if c not in ("conv_id", "turn_idx")]
    w = (
        log.groupBy("conv_id", "turn_idx")
        .agg(F.max_by(F.struct(*value_cols, "op"), F.col("lsn")).alias("w"))
        .select("conv_id", "turn_idx", "w.*")
    )
    exp = {
        (r["conv_id"], r["turn_idx"]): (
            tuple(r[c] for c in extra),
            "delete" if r["op"] == "delete" else "upsert",
        )
        for r in w.collect()
    }
    assert got == exp
