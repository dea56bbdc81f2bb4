"""Additive schema evolution (FIXTURES.md §3 / SURVEY.md D1-D5): events
past the evolve threshold carry extra nullable columns; the engine must
ALTER the target between micro-batches (DDL-barrier analogue) and
pre-evolution rows must read as NULL."""

import os

from pyspark.sql import functions as F

from estuary_spark.config import SyncConfig
from estuary_spark.generator import LogSpec, expected_final_state, read_log, write_log
from estuary_spark.runner import read_final_state, run_sync
from estuary_spark.tables import LakeTable


def test_additive_evolution_mid_stream(spark, tmpdir_path):
    spec = LogSpec(n_convs=40, max_turns=8, seed=23, evolve_frac=0.5)
    log_dir = os.path.join(tmpdir_path, "log")
    info = write_log(spark, spec, log_dir, evolve=True)
    split = info["split_lsn"]
    phase1, phase2 = info["phase_dirs"]

    table_dir = os.path.join(tmpdir_path, "table")
    # phase 1 arrives first: table created with the base schema
    cfg1 = SyncConfig(source_log_dir=phase1, target_table_dir=table_dir, n_buckets=8)
    run_sync(spark, cfg1, events_per_batch=400)
    assert "latency_ms" not in [f.name for f in LakeTable(table_dir).schema.fields]

    # phase 2 arrives with wider schema: engine must reconcile (ALTER) at
    # batch start, then merge
    cfg = SyncConfig(source_log_dir=phase2, target_table_dir=table_dir, n_buckets=8)
    run_sync(spark, cfg, events_per_batch=400)

    got = read_final_state(spark, cfg)
    assert "tool_args" in got.columns and "latency_ms" in got.columns

    # rows whose winning event predates the evolution have NULL new cols
    pre = got.filter(F.col("_lsn") < split)
    assert pre.filter(F.col("latency_ms").isNotNull()).count() == 0
    post = got.filter(F.col("_lsn") >= split)
    assert post.filter(F.col("latency_ms").isNotNull()).count() == post.count()

    # full fold equivalence including evolved columns
    expected = expected_final_state(read_log(spark, log_dir))
    cols = sorted(expected.columns)
    a = {tuple(r) for r in got.select(*cols).collect()}
    b = {tuple(r) for r in expected.select(*cols).collect()}
    assert a == b


def test_evolution_is_metadata_only_commit(spark, tmpdir_path):
    """evolve_schema must not rewrite data files."""
    from pyspark.sql import types as T

    root = os.path.join(tmpdir_path, "t")
    schema = T.StructType([T.StructField("conv_id", T.StringType()), T.StructField("turn_idx", T.IntegerType()), T.StructField("text", T.StringType())])
    t = LakeTable.create(root, schema, n_buckets=4, key_cols=["conv_id", "turn_idx"])
    m0 = t.manifest()
    t.evolve_schema(T.StructType([T.StructField("extra", T.StringType())]))
    m1 = t.manifest()
    assert m1["files"] == m0["files"]
    assert "extra" in [f["name"] for f in m1["schema"]["fields"]]


def test_type_change_raises_typed_error(spark, tmpdir_path):
    """Non-additive change (column type modified) must surface a typed
    error at the DDL barrier, not an opaque parquet read failure
    (MysqlTableSchemaHolder.scala:61-78 analogue)."""
    import pytest

    from estuary_spark.apply import SchemaTypeChangeError, apply_batch
    from estuary_spark.runner import open_or_create_table

    cols = ["lsn", "op", "conv_id", "turn_idx", "text"]
    cfg = SyncConfig(
        source_log_dir=os.path.join(tmpdir_path, "log"),
        target_table_dir=os.path.join(tmpdir_path, "t"),
        n_buckets=2,
        envelope_cols=("lsn", "op"),
    )
    b1 = spark.createDataFrame([(1, "insert", "c1", 0, "hello")], cols)
    table = open_or_create_table(spark, cfg, b1)
    apply_batch(spark, table, b1, cfg, 0, offset_range=(1, 1))

    # text arrives as BIGINT now — a modify-column DDL
    b2 = spark.createDataFrame([(2, "update", "c1", 0, 12345)], cols)
    with pytest.raises(SchemaTypeChangeError, match="text: table=string batch=bigint"):
        apply_batch(spark, table, b2, cfg, 1, offset_range=(2, 2))

    # on_type_change="cast" coerces instead
    from dataclasses import replace

    r = apply_batch(spark, table, b2, replace(cfg, on_type_change="cast"), 1, offset_range=(2, 2))
    assert not r.skipped
    rows = {(x["conv_id"], x["text"]) for x in table.read(spark).collect()}
    assert rows == {("c1", "12345")}


def test_evolution_disabled_raises(spark, tmpdir_path):
    import pytest

    spec = LogSpec(n_convs=10, max_turns=4, seed=29, evolve_frac=0.5)
    log_dir = os.path.join(tmpdir_path, "log")
    info = write_log(spark, spec, log_dir, evolve=True)
    phase1, phase2 = info["phase_dirs"]
    table_dir = os.path.join(tmpdir_path, "table")
    run_sync(spark, SyncConfig(source_log_dir=phase1, target_table_dir=table_dir, n_buckets=4), events_per_batch=10**9)
    cfg = SyncConfig(
        source_log_dir=phase2,
        target_table_dir=table_dir,
        n_buckets=4,
        allow_schema_evolution=False,
    )
    with pytest.raises(ValueError, match="schema evolution disabled"):
        run_sync(spark, cfg, events_per_batch=10**9)
