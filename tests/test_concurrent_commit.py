"""Optimistic concurrency on the snapshot commit (Iceberg-model):
append-only commits (MoR delta, metadata-only, schema evolution) REBASE
onto a concurrently-published snapshot and succeed; copy-on-write
rewrites whose replaced buckets moved underneath them fail with a typed
CommitConflictError instead of silently discarding the rival's data.

estuary never needs this (each sync task owns its MySQL target
exclusively); N Spark writers sharing one lake table do. The race is
injected deterministically through the FileIO seam: a wrapper fires a
rival commit immediately before the victim's first put-if-absent
publish, forcing the publish to lose.
"""

import os

from pyspark.sql import functions as F, types as T

import pytest

from estuary_spark.fileio import LocalFileIO
from estuary_spark.tables import (
    BUCKET_COL,
    DELETED_COL,
    LSN_COL,
    CommitConflictError,
    LakeTable,
    bucket_expr,
)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


class RacingIO(LocalFileIO):
    """Fires ``rival`` right before the wrapped table's first manifest
    publish, so that publish deterministically loses the put-if-absent
    race."""

    def __init__(self):
        self.rival = None
        self.fired = False

    def publish_text(self, path: str, data: str) -> None:
        if self.rival is not None and not self.fired and "_manifests" in path:
            self.fired = True
            self.rival()
        super().publish_text(path, data)


def _mk_table(tmpdir_path, io=None, n_buckets=4):
    root = os.path.join(tmpdir_path, "t")
    if not LakeTable(root).exists():
        LakeTable.create(root, SCHEMA, n_buckets, ["conv_id", "turn_idx"])
    return LakeTable(root, io=io) if io else LakeTable(root)


def _batch(spark, lsns, text, n_buckets=4, key_prefix="c"):
    rows = [(f"{key_prefix}{i % 7}", i % 5, f"{text}-{lsn}", lsn) for i, lsn in enumerate(lsns)]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text", LSN_COL])
    return (
        df.withColumn("turn_idx", F.col("turn_idx").cast("int"))
        .withColumn(DELETED_COL, F.lit(False))
        .withColumn(BUCKET_COL, bucket_expr("conv_id", n_buckets))
    )


def test_delta_delta_race_rebases(spark, tmpdir_path):
    io = RacingIO()
    victim = _mk_table(tmpdir_path, io=io)
    rival_t = _mk_table(tmpdir_path)
    io.rival = lambda: rival_t.commit_delta(
        spark,
        _batch(spark, range(100, 110), "rival", key_prefix="r"),
        applied_range=(100, 109),
        batch_id=1,
    )

    v = victim.commit_delta(
        spark,
        _batch(spark, range(0, 10), "victim", key_prefix="v"),
        applied_range=(0, 9),
        batch_id=0,
    )
    assert io.fired
    assert v == 2  # rival took v1; victim rebased onto it

    t = _mk_table(tmpdir_path)
    m = t.manifest()
    assert m["version"] == 2
    # both writers' rows are live and the ranges fused
    texts = {r["text"] for r in t.read(spark).collect()}
    assert any(x.startswith("rival-") for x in texts)
    assert any(x.startswith("victim-") for x in texts)
    assert t.is_range_applied(0, 9) and t.is_range_applied(100, 109)
    # per-commit range map carries BOTH delta commits
    rng = m["properties"]["commit_lsn_ranges"]
    assert sorted(v for v in rng.values()) == [[0, 9], [100, 109]]


def test_cow_conflict_on_touched_bucket(spark, tmpdir_path):
    """A COW rewrite computed from a stale snapshot must NOT publish if a
    rival appended to one of its replaced buckets in the meantime."""
    io = RacingIO()
    victim = _mk_table(tmpdir_path, io=io)
    rival_t = _mk_table(tmpdir_path)
    base = _batch(spark, range(0, 20), "base")
    rival_t.commit_delta(spark, base, applied_range=(0, 19), batch_id=0)
    buckets = sorted(r["b"] for r in base.select(F.col(BUCKET_COL).alias("b")).distinct().collect())

    io.rival = lambda: rival_t.commit_delta(
        spark, _batch(spark, range(50, 60), "rival"), applied_range=(50, 59), batch_id=1
    )
    with pytest.raises(CommitConflictError, match="changed concurrently"):
        victim.commit(
            spark,
            rival_t.read(spark, include_tombstones=True),
            replaced_buckets=buckets,
            applied_range=None,
            batch_id=None,
        )
    # the rival's commit survives untouched
    t = _mk_table(tmpdir_path)
    assert any(r["text"].startswith("rival-") for r in t.read(spark).collect())


def test_cow_rebases_over_unrelated_commit(spark, tmpdir_path):
    """A rival commit that does NOT touch the replaced buckets (metadata
    position record) is no conflict: the rewrite rebases and publishes."""
    io = RacingIO()
    victim = _mk_table(tmpdir_path, io=io)
    rival_t = _mk_table(tmpdir_path)
    base = _batch(spark, range(0, 20), "base")
    rival_t.commit_delta(spark, base, applied_range=(0, 19), batch_id=0)
    buckets = sorted(r["b"] for r in base.select(F.col(BUCKET_COL).alias("b")).distinct().collect())

    io.rival = lambda: rival_t.commit_metadata(applied_range=(500, 500), batch_id=9)
    folded = rival_t.read(spark, include_tombstones=True)
    v = victim.commit(
        spark, folded, replaced_buckets=buckets, applied_range=None, batch_id=None
    )
    assert io.fired and v == 3  # base delta=1, rival meta=2, rebased COW=3
    t = _mk_table(tmpdir_path)
    assert t.is_range_applied(500, 500)  # rival's metadata survived the rebase
    assert all(not fl for fl in t.manifest().get("delta_files", {}).values())
    assert t.read(spark).count() == folded.count()


def test_evolution_race_keeps_both_columns(spark, tmpdir_path):
    io = RacingIO()
    victim = _mk_table(tmpdir_path, io=io)
    rival_t = _mk_table(tmpdir_path)
    io.rival = lambda: rival_t.evolve_schema(
        T.StructType([T.StructField("rival_col", T.StringType())])
    )
    victim.evolve_schema(T.StructType([T.StructField("victim_col", T.LongType())]))
    names = set(_mk_table(tmpdir_path).schema.names)
    assert {"rival_col", "victim_col"} <= names
