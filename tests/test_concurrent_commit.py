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


def test_publish_true_interleaving(tmpdir_path):
    """The FileIO put-if-absent primitive under a REAL interleaving: N
    threads pass any pre-check simultaneously and race the final publish —
    exactly one may win (link(2) EEXIST), the rest must see
    FileExistsError, and the winner's bytes must be intact (an
    os.rename-based publish silently lets the last writer overwrite)."""
    import threading

    io = LocalFileIO()
    path = os.path.join(tmpdir_path, "v1.json")
    n = 16
    barrier = threading.Barrier(n)
    results: list[str | None] = [None] * n

    def attempt(i: int) -> None:
        barrier.wait()  # all threads reach the publish together
        try:
            io.publish_text(path, f"writer-{i}")
            results[i] = "won"
        except FileExistsError:
            results[i] = "lost"

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results.count("won") == 1
    winner = results.index("won")
    assert io.read_text(path) == f"writer-{winner}"
    # no tmp litter left behind
    assert [f for f in os.listdir(tmpdir_path) if f.startswith(".tmp-")] == []


def test_cow_conflict_detected_when_winning_publish(spark, tmpdir_path):
    """base_version threading: a rival delta commit lands BETWEEN the
    rewrite's read and its commit (no publish race at all — the victim
    publishes first and would 'win'). Without validating against the
    snapshot the rewrite was computed from, the rival's files would be
    silently dropped; with base_version it is a typed conflict."""
    t = _mk_table(tmpdir_path)
    base = _batch(spark, range(0, 20), "base")
    t.commit_delta(spark, base, applied_range=(0, 19), batch_id=0)
    buckets = sorted(
        r["b"] for r in base.select(F.col(BUCKET_COL).alias("b")).distinct().collect()
    )

    # the rewrite reads (and pins) the snapshot here ...
    base_v = t.current_version()
    folded = t.read(spark, include_tombstones=True, version=base_v)

    # ... then a rival delta commit lands before the rewrite commits
    t.commit_delta(
        spark, _batch(spark, range(50, 60), "rival"), applied_range=(50, 59), batch_id=1
    )

    with pytest.raises(CommitConflictError, match="changed concurrently"):
        t.commit(
            spark,
            folded,
            replaced_buckets=buckets,
            applied_range=None,
            batch_id=None,
            base_version=base_v,
        )
    # the rival's rows survive
    assert any(r["text"].startswith("rival-") for r in t.read(spark).collect())


def test_direct_commit_feed_not_pruned(spark, tmpdir_path):
    """A table populated via direct commit() calls with no applied-range
    bookkeeping must keep its change feed conservative: the commit gets NO
    lsn-range entry (readers scan it), not a wrong [0, 0] that
    read_changes(start_lsn>=1) would prune away driver-side."""
    t = _mk_table(tmpdir_path)
    df = _batch(spark, range(100, 110), "direct")
    t.commit(
        spark,
        df,
        replaced_buckets=sorted(
            r["b"] for r in df.select(F.col(BUCKET_COL).alias("b")).distinct().collect()
        ),
        applied_range=None,
        batch_id=None,
    )
    assert t.manifest()["properties"]["commit_lsn_ranges"] == {}
    got = t.read_changes(spark, start_lsn=100).collect()
    assert len(got) == 10 and all(r["_change_type"] == "upsert" for r in got)


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


def test_true_concurrent_delta_writers(spark, tmpdir_path):
    """REAL concurrency (no injected race): N driver threads each publish
    several MoR delta commits against one table through the actual
    filesystem. Every commit must land (rebase absorbs lost publish
    races), every writer's rows must be live, and the applied ranges must
    all be recorded."""
    import threading

    t = _mk_table(tmpdir_path)
    n_writers, per_writer = 4, 3
    errors: list[Exception] = []
    barrier = threading.Barrier(n_writers)

    def writer(w: int) -> None:
        try:
            barrier.wait()
            tw = _mk_table(tmpdir_path)  # own LakeTable handle (own cache)
            for i in range(per_writer):
                base = 1000 * w + 100 * i
                tw.commit_delta(
                    spark,
                    _batch(spark, range(base, base + 10), f"w{w}", key_prefix=f"w{w}-"),
                    applied_range=(base, base + 9),
                    batch_id=w * 100 + i,
                )
        except Exception as e:  # pragma: no cover - surfaced via assert
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []

    t = _mk_table(tmpdir_path)
    assert t.current_version() == n_writers * per_writer  # every commit landed
    for w in range(n_writers):
        for i in range(per_writer):
            base = 1000 * w + 100 * i
            assert t.is_range_applied(base, base + 9)
    texts = {r["text"] for r in t.read(spark).collect()}
    for w in range(n_writers):
        assert any(x.startswith(f"w{w}-") for x in texts)


def test_rebase_preserves_other_shards(spark, tmpdir_path):
    """Sharded manifests under a publish race: victim and rival touch
    DIFFERENT inventory shards; the victim's rebase must keep the rival's
    rewritten shard pointer while writing its own — no shard content may
    be lost or resurrected."""
    import os as _os

    from pyspark.sql import types as T

    from estuary_spark.tables import LakeTable as LT

    root = _os.path.join(tmpdir_path, "sharded")
    LT.create(
        root,
        T.StructType(
            [
                T.StructField("conv_id", T.StringType()),
                T.StructField("turn_idx", T.IntegerType()),
                T.StructField("text", T.StringType()),
            ]
        ),
        n_buckets=128,
        key_cols=["conv_id", "turn_idx"],
        shard_buckets=16,  # 8 shards
    )

    def fake_delta(table, idx, buckets, lo, hi):
        m0 = table.manifest()
        rel = _os.path.join("data", f"delta-{m0['version'] + 1:010d}-r{idx}")
        nb = {str(b): [_os.path.join(rel, f"_bp={b}", "p.parquet")] for b in buckets}
        return table._commit_delta_meta(
            m0, rel, nb, (lo, hi), idx, T.StructType.fromJson(m0["schema"]), None
        )

    io = RacingIO()
    victim = LT(root, io=io)
    rival = LT(root)
    io.rival = lambda: fake_delta(rival, 1, [100, 110], 100, 109)  # shard 6
    fake_delta(victim, 0, [0, 17], 0, 9)  # shards 0 and 1
    assert io.fired

    t = LT(root)
    raw = t._raw_manifest()
    assert set(raw["shards"]) == {"0", "1", "6"}
    m = t.manifest()
    assert {int(b) for b in m["delta_files"]} == {0, 17, 100, 110}
    assert t.is_range_applied(0, 9) and t.is_range_applied(100, 109)
