"""Multi-table sync: one change log carrying many source tables, routed to
per-table LakeTables with regex filtering and SDA-style renaming.

The reference syncs many MySQL tables per task: every binlog event is keyed
by ``$db@$tb`` (``mysql/lifecycle/package.scala:100`` in /root/reference),
task configs whitelist/blacklist tables by regex
(``MysqlSourceManagerImp.scala:117-120`` — ``filterPattern`` /
``filterBlackPattern``, SURVEY.md F2), and the SDA variant renames source
tables to destination names
(``CanalEntry2RowDataInfoMappingFormat4Sda.scala:37-44``, SURVEY.md T4).

Spark re-expression:

* the route is a narrow projection (``rlike`` filters + a literal-map
  rename) — no shuffle, fully pushed into the scan stage;
* each destination table is an independent ``LakeTable`` under
  ``target_table_dir/<dst>`` with its own schema, buckets, applied-range
  bookkeeping, and exactly-once guarantees (apply_batch is unchanged);
* one micro-batch fans out to the tables present in it; the routed batch
  is persisted once so the per-table applies share a single source scan.

Scale notes (100 TB): the fan-out loop is per *table*, not per row — at
T tables a batch costs T apply jobs over one cached scan; tables absent
from a batch cost nothing. Hot tables can be given their own task (the
reference's model) by running several configs with disjoint filters.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, functions as F

from estuary_spark.apply import apply_batch
from estuary_spark.checkpoint import (
    load_checkpoint,
    resolve_start_lsn,
    resolve_stop_lsn,
    save_checkpoint,
)
from estuary_spark.config import SyncConfig
from estuary_spark.lineage import append_lineage
from estuary_spark.runner import open_or_create_table, plan_batches
from estuary_spark.sources.log_source import LogSource, ParquetLogSource
from estuary_spark.tables import BUCKET_COL, LakeTable

DST_COL = "_dst_table"

# Table-level structured DDL ops carried in the change log (the analogue
# of estuary's drop/truncate DDL handling, MysqlTableSchemaHolder.scala:
# 35-101 in /root/reference — there parsed from SQL by ANTLR, here typed
# events like every other op, per SURVEY.md §7.5's structured-DDL design).
OP_TRUNCATE = "truncate"
OP_DROP_TABLE = "drop_table"
TABLE_OPS = (OP_TRUNCATE, OP_DROP_TABLE)


def _apply_table_ops(batch: DataFrame, cfg: SyncConfig, tables: dict) -> DataFrame:
    """Execute the batch's table-level ops and return the batch with op
    events and superseded row events removed.

    Semantics: the LATEST table-level op per destination wins; row events
    at or below its LSN are superseded (they describe pre-truncate/drop
    state). ``truncate`` commits an empty snapshot keeping applied-range
    bookkeeping + an op watermark (replay-safe); ``drop_table`` is a
    LOGICAL drop — the same empty snapshot plus a ``dropped_at_lsn``
    marker, so the ``table_ops_lsn`` fence survives and a pre-drop
    straggler event arriving in a later micro-batch (the streaming
    front-end delivers file batches in modification-time order, not LSN
    order) cannot resurrect stale state. Physical removal is deferred to
    ``maintenance.purge_dropped_tables`` (which also clears the marker if
    post-drop events recreated the table). Driver cost is O(#tables with
    ops); the row-event filter is a literal predicate pushed into the scan.
    """
    ops = (
        batch.filter(F.col(cfg.op_col).isin(*TABLE_OPS))
        .groupBy(DST_COL)
        .agg(
            F.max_by(F.col(cfg.op_col), F.col(cfg.lsn_col)).alias("op"),
            F.max(cfg.lsn_col).alias("at"),
        )
        .collect()
    )
    if not ops:
        return batch

    for r in ops:
        dst, at = r[DST_COL], int(r["at"])
        tdir = os.path.join(cfg.target_table_dir, dst)
        t = LakeTable(tdir)
        if not t.exists():
            continue  # op before any row event created the table
        if int(t.properties().get("table_ops_lsn", -1)) >= at:
            continue  # replayed batch: op already executed
        if r["op"] == OP_DROP_TABLE:
            t.truncate(at_lsn=at, extra_properties={"dropped_at_lsn": at})
        else:
            t.truncate(at_lsn=at)
    cond = None
    for r in ops:
        this = (F.col(DST_COL) == r[DST_COL]) & (F.col(cfg.lsn_col) <= int(r["at"]))
        cond = this if cond is None else cond | this
    return batch.filter(~cond)


def route_tables(df: DataFrame, cfg: SyncConfig) -> DataFrame:
    """Apply the F2 regex whitelist/blacklist and the T4 rename map.

    Returns the filtered DataFrame with a ``_dst_table`` column naming the
    destination table. Pure narrow ops — Catalyst pushes the rlike filters
    into the scan.
    """
    if not cfg.table_col:
        raise ValueError("route_tables requires cfg.table_col (multi-table mode)")
    c = F.col(cfg.table_col)
    if cfg.table_filter:
        df = df.filter(c.rlike(cfg.table_filter))
    if cfg.table_blacklist:
        df = df.filter(~c.rlike(cfg.table_blacklist))
    if cfg.table_renames:
        mapping = F.create_map(
            *[F.lit(x) for kv in sorted(cfg.table_renames.items()) for x in kv]
        )
        # try_element_at: NULL (not an ANSI error) for unmapped tables
        dst = F.coalesce(F.try_element_at(mapping, c), c)
    else:
        dst = c
    return df.withColumn(DST_COL, dst)


def _apply_fanout(
    spark: SparkSession,
    batch: DataFrame,
    cfg: SyncConfig,
    tables: dict,
    batch_id: int,
    offset_range,
    check_applied_range: bool = True,
) -> list:
    """Fan one routed micro-batch out to its destination tables, applying
    up to ``cfg.multi_apply_parallelism`` tables CONCURRENTLY (driver
    thread pool). Returns ``[(dst, sub_cfg, BatchResult), ...]``.

    Why concurrency is safe here: destinations are disjoint LakeTables
    (per-table snapshots, applied ranges, schema), commits are optimistic
    put-if-absent (tables.py), and the shared input is one persisted
    DataFrame that each task only filters. Why it matters at the
    reference's shape: estuary runs its 23 per-table batcher->sinker
    pipelines concurrently (``Mysql2MysqlTaskInfoManager.scala:178`` in
    /root/reference); a serial loop pays T x the fixed per-apply driver
    planning cost (~1.5 s/batch, BENCH/NOTES.md) even when executors are
    idle — wall should be ~max(table) not sum(tables). Each worker tags
    its jobs with a scheduler-pool property so a FAIR-scheduled session
    (``spark.scheduler.mode=FAIR``) shares executors evenly; under the
    default FIFO scheduler the jobs still interleave whenever the head
    job leaves cores idle (always true for the driver-side planning
    phase). Table creation and table-level ops stay in the caller's
    thread — only per-table applies run concurrently.
    """
    dsts = sorted(r[0] for r in batch.select(DST_COL).distinct().collect())
    for dst in dsts:
        if dst not in tables:
            scfg = _sub_cfg(cfg, dst)
            sub = batch.filter(F.col(DST_COL) == dst).drop(DST_COL, cfg.table_col)
            tables[dst] = open_or_create_table(spark, scfg, sub)

    def one(dst: str):
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", "multi-apply")
        scfg = _sub_cfg(cfg, dst)
        sub = batch.filter(F.col(DST_COL) == dst).drop(DST_COL, cfg.table_col)
        # fence late pre-truncate/pre-drop events arriving in later
        # batches: a truncated key must not be resurrected by a straggler
        # below the op watermark (literal predicate, pushed into the scan)
        fence = int(tables[dst].properties().get("table_ops_lsn", -1))
        if fence >= 0:
            sub = sub.filter(F.col(cfg.lsn_col) > fence)
        res = apply_batch(
            spark,
            tables[dst],
            sub,
            scfg,
            batch_id,
            offset_range=offset_range,
            check_applied_range=check_applied_range,
        )
        if scfg.lineage_dir and res.lineage:
            append_lineage(spark, scfg.lineage_dir, res.lineage)
        return dst, scfg, res

    workers = max(1, min(int(cfg.multi_apply_parallelism), len(dsts) or 1))
    if workers == 1 or len(dsts) <= 1:
        return [one(d) for d in dsts]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=workers, thread_name_prefix="multi-apply") as ex:
        return [f.result() for f in [ex.submit(one, d) for d in dsts]]


def _sub_cfg(cfg: SyncConfig, dst: str) -> SyncConfig:
    """Per-destination-table view of the task config: the source-table and
    routing columns join the envelope so they never enter the target
    schema; checkpointing stays global (the multi runner owns it)."""
    from dataclasses import replace

    return replace(
        cfg,
        target_table_dir=os.path.join(cfg.target_table_dir, dst),
        lineage_dir=os.path.join(cfg.lineage_dir, dst) if cfg.lineage_dir else None,
        checkpoint_path=None,
        envelope_cols=tuple(dict.fromkeys([*cfg.envelope_cols, cfg.table_col, DST_COL])),
        table_col=None,
        table_filter=None,
        table_blacklist=None,
        table_renames={},
    )


def run_sync_multi(
    spark: SparkSession,
    cfg: SyncConfig,
    events_per_batch: int = 50_000,
    max_batches: int | None = None,
    source: LogSource | None = None,
) -> dict:
    """Run a multi-table sync task to the end of the log.

    Batches are planned globally over the (filtered) log's LSN space, so
    one batch = one contiguous offset range across all tables — the
    reference's transaction-boundary dispatch per task. Within a batch the
    routed events fan out to each destination table's own atomic
    merge-apply; per-table applied-range bookkeeping keeps replay
    exactly-once per table.

    Returns {"tables": {dst: {"batches_run": n, "rows_upserted": n,
    "rows_deleted": n}}, "batches": n, "last_lsn": lsn}.
    """
    source = source or ParquetLogSource(cfg.source_log_dir, lsn_col=cfg.lsn_col)
    log_df = route_tables(source.read_batch(spark), cfg)

    st = load_checkpoint(cfg.checkpoint_path) if cfg.checkpoint_path else None
    # same C2 ladder as the single-table runner (explicit -> checkpoint ->
    # start_ts -> 0), minus table applied-ranges: those are per-destination
    # here and the global plan can't resume from any single table's ranges
    start = resolve_start_lsn(
        cfg.start_lsn,
        cfg.checkpoint_path,
        table=None,
        start_ts=cfg.start_ts,
        log_df=log_df,
        lsn_col=cfg.lsn_col,
        min_available_lsn=source.min_available_lsn(),
        on_retention_gap=cfg.on_retention_gap,
    )
    batch_id = int(st["next_batch_id"]) if st else 0

    stop = resolve_stop_lsn(cfg.stop_at_lsn, cfg.stop_at_ts, log_df, lsn_col=cfg.lsn_col)
    ranges = plan_batches(log_df, start, stop, events_per_batch, cfg.lsn_col)
    if max_batches is not None:
        ranges = ranges[:max_batches]

    per_table: dict[str, dict] = {}
    tables: dict[str, LakeTable] = {}
    last_lsn = None
    n_batches = 0

    for lo, hi in ranges:
        raw = log_df.filter(F.col(cfg.lsn_col).between(lo, hi)).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        # table-level ops first (truncate/drop, driver O(#tables with ops));
        # the collect inside also materializes the batch cache the
        # per-table applies below reuse
        batch = _apply_table_ops(raw, cfg, tables)
        # concurrent per-table fan-out (see _apply_fanout)
        for dst, _scfg, res in _apply_fanout(
            spark, batch, cfg, tables, batch_id, offset_range=(lo, hi)
        ):
            stats = per_table.setdefault(
                dst, {"batches_run": 0, "rows_upserted": 0, "rows_deleted": 0}
            )
            if not res.skipped:
                stats["batches_run"] += 1
                stats["rows_upserted"] += sum(r["rows_upserted"] for r in res.lineage)
                stats["rows_deleted"] += sum(r["rows_deleted"] for r in res.lineage)
        raw.unpersist()
        last_lsn = hi
        batch_id += 1
        n_batches += 1
        if cfg.checkpoint_path:
            save_checkpoint(
                cfg.checkpoint_path, {"next_lsn": hi + 1, "next_batch_id": batch_id}
            )

    return {"tables": per_table, "batches": n_batches, "last_lsn": last_lsn}


def run_sync_streaming_multi(
    spark: SparkSession,
    cfg: SyncConfig,
    checkpoint_location: str,
    max_files_per_trigger: int = 2,
    available_now: bool = True,
    source: LogSource | None = None,
) -> dict:
    """Structured Streaming front-end for the multi-table task: one
    readStream over the log, each micro-batch routed and fanned out to the
    per-table LakeTables inside ``foreachBatch`` (the reference's natural
    shape — one binlog stream feeding many tables). File batches arrive in
    modification-time order, so exactly-once rests on each table's wins==0
    no-op detection (see streaming/runner.py), not range containment.
    """
    source = source or ParquetLogSource(cfg.source_log_dir, lsn_col=cfg.lsn_col)
    stream = source.read_stream(spark, max_files_per_trigger=max_files_per_trigger)

    tables: dict[str, LakeTable] = {}
    stats: dict = {"batches": 0, "tables": {}}

    def handle(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession
        raw = route_tables(batch_df, cfg).persist(StorageLevel.MEMORY_AND_DISK)
        routed = _apply_table_ops(raw, cfg, tables)
        stats["batches"] += 1
        # concurrent per-table fan-out (see _apply_fanout); file batches
        # carry no planned offset range, so replay safety rests on each
        # table's wins==0 no-op detection (check_applied_range=False)
        for dst, _scfg, res in _apply_fanout(
            sess, routed, cfg, tables, int(batch_id),
            offset_range=None, check_applied_range=False,
        ):
            t = stats["tables"].setdefault(dst, {"batches_run": 0, "rows_upserted": 0})
            if not res.skipped:
                t["batches_run"] += 1
                t["rows_upserted"] += sum(r["rows_upserted"] for r in res.lineage)
        raw.unpersist()

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("update")
    )
    q = writer.trigger(availableNow=True).start() if available_now else writer.start()
    q.awaitTermination()
    return stats


def read_final_state_multi(spark: SparkSession, cfg: SyncConfig) -> DataFrame:
    """Union of every destination table's final state, tagged with
    ``_dst_table`` (columns are unioned by name; tables missing a column
    read it as NULL)."""
    root = cfg.target_table_dir
    dsts = sorted(
        d
        for d in (os.listdir(root) if os.path.isdir(root) else [])
        if LakeTable(os.path.join(root, d)).exists()
    )
    if not dsts:
        raise FileNotFoundError(
            f"no destination tables under {root!r} — either no sync has run "
            "yet or the table filter/blacklist matched nothing"
        )
    out = None
    for dst in dsts:
        t = LakeTable(os.path.join(root, dst))
        df = t.read(spark).drop(BUCKET_COL).withColumn(DST_COL, F.lit(dst))
        out = df if out is None else out.unionByName(df, allowMissingColumns=True)
    return out


def read_changes_multi(
    spark: SparkSession,
    cfg: SyncConfig,
    start_lsn: int,
    end_lsn: int | None = None,
    **kw,
) -> DataFrame:
    """Net change feed across every destination table of a multi-table
    sync, tagged with ``_dst_table`` — one subscription surface for a
    consumer mirroring the whole routed set (estuary routes all tables of
    one task into one Kafka topic keyed ``$db@$tb@pk``,
    ``mysql/lifecycle/package.scala:100-131``; here the per-table feeds
    union by name, with the same per-commit LSN-range pruning each table
    provides). The global LSN order is shared — the multi-table runner
    plans batches over one log — so one ``start_lsn`` is a consistent
    position for every table."""
    root = cfg.target_table_dir
    dsts = sorted(
        d
        for d in (os.listdir(root) if os.path.isdir(root) else [])
        if LakeTable(os.path.join(root, d)).exists()
    )
    if not dsts:
        raise FileNotFoundError(
            f"no destination tables under {root!r} — either no sync has run "
            "yet or the table filter/blacklist matched nothing"
        )
    out = None
    for dst in dsts:
        ch = (
            LakeTable(os.path.join(root, dst))
            .read_changes(spark, start_lsn, end_lsn=end_lsn, **kw)
            .withColumn(DST_COL, F.lit(dst))
        )
        out = ch if out is None else out.unionByName(ch, allowMissingColumns=True)
    return out
