"""Online bucket-count change (``maintenance.rebucket``): one atomic
snapshot swaps data layout and ``n_buckets`` together, state is
preserved exactly (tombstones included), pruned reads work against the
new modulus, and a sync continued AFTER the rebucket applies with the
new bucket ids — the grow-100x story a fixed-bucket table can't tell.
"""

import os

from pyspark.sql import functions as F

from estuary_spark.config import SyncConfig
from estuary_spark.generator import LogSpec, expected_final_state, read_log, write_log
from estuary_spark.maintenance import rebucket
from estuary_spark.runner import run_sync
from estuary_spark.tables import BUCKET_COL, LakeTable, bucket_expr


def _fold(spark, log):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in expected_final_state(log).collect()
    }


def _state(spark, root):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in LakeTable(root).read(spark).select("conv_id", "turn_idx", "text").collect()
    }


def test_rebucket_preserves_state_and_continues_sync(spark, tmpdir_path):
    log_dir = os.path.join(tmpdir_path, "log")
    root = os.path.join(tmpdir_path, "t")
    write_log(spark, LogSpec(n_convs=40, max_turns=8, seed=81, delete_pct=20), log_dir)
    log = read_log(spark, log_dir)
    lo, hi = log.agg(F.min("lsn"), F.max("lsn")).first()
    cut = (int(lo) + int(hi)) // 2
    cfg = SyncConfig(
        source_log_dir=log_dir, target_table_dir=root, n_buckets=8,
        write_mode="mor", compact_every=0,
        checkpoint_path=os.path.join(tmpdir_path, "ck.json"),
    )

    # phase 1 at 8 buckets, then grow to 32 mid-life
    run_sync(spark, SyncConfig(**{**cfg.__dict__, "stop_at_lsn": cut}), events_per_batch=400)
    t = LakeTable(root)
    before = _state(spark, root)
    rebucket(spark, t, 32)

    m = t.manifest()
    assert m["n_buckets"] == 32
    assert all(not fl for fl in m.get("delta_files", {}).values())  # deltas folded in
    assert _state(spark, root) == before

    # every row's stored bucket id matches the new modulus, and a pruned
    # read returns exactly that bucket's rows
    bad = (
        t.read(spark)
        .filter(F.col(BUCKET_COL) != bucket_expr("conv_id", 32))
        .count()
    )
    assert bad == 0
    some_b = int(t.read(spark).select(BUCKET_COL).first()[0])
    pruned = t.read(spark, buckets=[some_b])
    assert pruned.filter(F.col(BUCKET_COL) != some_b).count() == 0
    assert pruned.count() == t.read(spark).filter(F.col(BUCKET_COL) == some_b).count()

    # phase 2: the continued sync picks the new modulus up from the
    # manifest and the final state still equals the pure fold
    run_sync(spark, cfg, events_per_batch=400)
    assert _state(spark, root) == _fold(spark, log)
    assert LakeTable(root).manifest()["n_buckets"] == 32
