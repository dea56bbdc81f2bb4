"""The metadata-storage seam (``fileio.FileIO``): every manifest
read/publish, directory listing, and file deletion a LakeTable performs
flows through the injected FileIO — so swapping the local-FS impl for an
object-store conditional-put impl touches no table logic — and the
publish primitive enforces put-if-absent (the commit-race guard)."""

import os

import pytest
from pyspark.sql import functions as F

from estuary_spark.apply import apply_batch
from estuary_spark.config import SyncConfig
from estuary_spark.fileio import LocalFileIO
from estuary_spark.maintenance import compact
from estuary_spark.tables import LakeTable


class AuditingFileIO(LocalFileIO):
    def __init__(self):
        self.calls = []

    def _rec(self, op, path):
        self.calls.append((op, path))

    def list_dir(self, path):
        self._rec("list_dir", path)
        return super().list_dir(path)

    def read_text(self, path):
        self._rec("read_text", path)
        return super().read_text(path)

    def publish_text(self, path, data):
        self._rec("publish_text", path)
        return super().publish_text(path, data)

    def makedirs(self, path):
        self._rec("makedirs", path)
        return super().makedirs(path)

    def exists(self, path):
        self._rec("exists", path)
        return super().exists(path)

    def delete(self, path):
        self._rec("delete", path)
        return super().delete(path)

    def walk_files(self, path):
        self._rec("walk_files", path)
        return super().walk_files(path)


def _log_df(spark, n=200, convs=10):
    return spark.range(n).select(
        F.col("id").alias("lsn"),
        F.lit("insert").alias("op"),
        F.concat(F.lit("c"), (F.col("id") % convs).cast("string")).alias("conv_id"),
        (F.col("id") / convs).cast("int").alias("turn_idx"),
        F.md5(F.col("id").cast("string")).alias("text"),
    )


def test_metadata_ops_flow_through_io(spark, tmpdir_path):
    io = AuditingFileIO()
    log = _log_df(spark)
    cfg = SyncConfig(
        source_log_dir="unused",
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=4,
        envelope_cols=("lsn", "op"),
        write_mode="mor",
        compact_every=0,
    )
    from estuary_spark.runner import user_schema_of_log

    t = LakeTable.create(
        cfg.target_table_dir, user_schema_of_log(log, cfg), n_buckets=4,
        key_cols=["conv_id", "turn_idx"], io=io,
    )
    apply_batch(spark, t, log, cfg, 0, offset_range=(0, 199))
    compact(spark, t, max_files_per_bucket=10**9, max_delta_files_per_bucket=0)
    t.expire_snapshots(keep=1)
    t.vacuum()

    ops = {op for op, _ in io.calls}
    assert {"makedirs", "publish_text", "read_text", "list_dir", "delete", "walk_files"} <= ops
    # one snapshot publish per version ever written: v0 create, v1 delta,
    # v2 compaction — plus one rewritten inventory SHARD per data commit
    # (4 buckets <= shard_buckets -> a single shard covers the table)
    publishes = [p for op, p in io.calls if op == "publish_text"]
    snaps = [p for p in publishes if f"{os.sep}shards{os.sep}" not in p]
    shards = [p for p in publishes if f"{os.sep}shards{os.sep}" in p]
    assert len(snaps) == 3
    assert len(shards) == 2
    # state still correct through the seam
    assert t.read(spark).count() == log.select("conv_id", "turn_idx").distinct().count()


def test_publish_is_put_if_absent(spark, tmpdir_path):
    io = AuditingFileIO()
    log = _log_df(spark, n=50, convs=5)
    from estuary_spark.runner import user_schema_of_log

    cfg = SyncConfig(
        source_log_dir="unused",
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=2,
        envelope_cols=("lsn", "op"),
    )
    t = LakeTable.create(
        cfg.target_table_dir, user_schema_of_log(log, cfg), n_buckets=2,
        key_cols=["conv_id", "turn_idx"], io=io,
    )
    # a second writer publishing the same version loses deterministically;
    # the raw primitive surfaces FileExistsError — the commit layer above
    # (_publish_with_rebase) turns it into rebase-and-retry, see
    # test_concurrent_commit.py
    with pytest.raises(FileExistsError):
        t._write_manifest(t.manifest() | {"version": 0})


def test_default_io_unchanged_behavior(spark, tmpdir_path):
    """No io argument -> LocalFileIO; existing tables open identically."""
    log = _log_df(spark, n=80, convs=8)
    from estuary_spark.runner import user_schema_of_log

    cfg = SyncConfig(
        source_log_dir="unused",
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=4,
        envelope_cols=("lsn", "op"),
    )
    t = LakeTable.create(
        cfg.target_table_dir, user_schema_of_log(log, cfg), n_buckets=4,
        key_cols=["conv_id", "turn_idx"],
    )
    apply_batch(spark, t, log, cfg, 0, offset_range=(0, 79))
    reopened = LakeTable(cfg.target_table_dir)
    assert isinstance(reopened.io, LocalFileIO)
    assert reopened.read(spark).count() == t.read(spark).count()
