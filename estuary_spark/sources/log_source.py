"""Change-log sources (estuary S1/S2 analogue).

estuary speaks the MySQL replication protocol directly
(``MysqlConnection.dump`` — mysql/source/MysqlConnection.scala:353-363 in
/root/reference) and decodes binlog events to row images. On Spark the
source is whatever ordered table/stream carries the row-change events;
this module abstracts it so the apply core stays source-agnostic:

* ``ParquetLogSource`` — an ordered parquet/lake directory (the default;
  what the synthetic generator and tests produce). Batch reads prune by
  LSN range (parquet min/max row-group stats); streaming reads use the
  file stream source.
* ``KafkaLogSource`` — wire-in point for a Kafka CDC topic (Debezium/
  Canal-style JSON payloads): ``readStream.format("kafka")`` + from_json
  decode. Gated behind import so environments without the Kafka package
  still import cleanly.
"""

from __future__ import annotations

import json
import os
import uuid
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

# Retention floor marker maintained by purge_log at the log root — the
# analogue of "the earliest binlog file still on the server". Start-position
# resolution probes it (estuary re-validates a checkpointed position against
# `show binlog events` before resuming, LogPositionHandler.scala:195-205 in
# /root/reference); without it a stale checkpoint below the retention floor
# would silently skip purged events.
RETENTION_FILE = "_retention.json"


def log_retention_floor(log_dir: str) -> int:
    """Lowest LSN the log still guarantees to retain (0 = everything)."""
    p = os.path.join(log_dir, RETENTION_FILE)
    if not os.path.exists(p):
        return 0
    with open(p) as fh:
        return int(json.load(fh).get("min_lsn", 0))


def purge_log(log_dir: str, below_lsn: int, lsn_col: str = "lsn") -> int:
    """Log retention maintenance: delete log parquet files whose events all
    precede ``below_lsn`` (file-level, via parquet footer max stats — no
    data read), then advance the retention-floor marker. The binlog
    `purge binary logs` analogue. Returns the number of files removed."""
    import pyarrow.parquet as pq

    removed = 0
    for dirpath, _dirs, files in os.walk(log_dir):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            path = os.path.join(dirpath, fn)
            meta = pq.ParquetFile(path).metadata
            idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
            if lsn_col not in idx:
                continue
            mx = None
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx[lsn_col]).statistics
                if st is None or st.max is None:
                    mx = None
                    break
                mx = st.max if mx is None else max(mx, st.max)
            if mx is not None and mx < below_lsn:
                os.remove(path)
                removed += 1
    floor = max(log_retention_floor(log_dir), int(below_lsn))
    tmp = os.path.join(log_dir, f".tmp-retention-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump({"min_lsn": floor}, fh)
    os.rename(tmp, os.path.join(log_dir, RETENTION_FILE))
    return removed


class LogSource(ABC):
    @abstractmethod
    def read_batch(self, spark: SparkSession, start_lsn: int | None = None, end_lsn: int | None = None) -> DataFrame: ...

    @abstractmethod
    def read_stream(self, spark: SparkSession, max_files_per_trigger: int | None = None) -> DataFrame: ...

    def min_available_lsn(self) -> int:
        """Retention floor for start-position validation; 0 when the
        source exposes no retention information."""
        return 0


class ParquetLogSource(LogSource):
    def __init__(self, path: str, lsn_col: str = "lsn"):
        self.path = path
        self.lsn_col = lsn_col

    def read_batch(self, spark, start_lsn=None, end_lsn=None) -> DataFrame:
        df = (
            spark.read.option("mergeSchema", "true")
            .option("recursiveFileLookup", "true")
            .parquet(self.path)
        )
        # these filters reach the parquet scan (PushedFilters) and prune
        # row groups via min/max stats — the log is written lsn-ordered
        if start_lsn is not None:
            df = df.filter(F.col(self.lsn_col) >= start_lsn)
        if end_lsn is not None:
            df = df.filter(F.col(self.lsn_col) <= end_lsn)
        return df

    def read_stream(self, spark, max_files_per_trigger: int | None = None) -> DataFrame:
        static = self.read_batch(spark)
        reader = spark.readStream.schema(static.schema).option("recursiveFileLookup", "true")
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        return reader.parquet(self.path)

    def min_available_lsn(self) -> int:
        return log_retention_floor(self.path)


class KafkaLogSource(LogSource):
    """CDC topic -> typed change events. Requires the spark-sql-kafka
    package on the cluster; decode is JVM-side from_json (S2 analogue)."""

    def __init__(self, bootstrap: str, topic: str, value_schema: T.StructType, starting_offsets: str = "earliest"):
        self.bootstrap = bootstrap
        self.topic = topic
        self.value_schema = value_schema
        self.starting_offsets = starting_offsets

    def _decode(self, raw: DataFrame) -> DataFrame:
        return raw.select(
            F.from_json(F.col("value").cast("string"), self.value_schema).alias("e")
        ).select("e.*")

    def read_batch(self, spark, start_lsn=None, end_lsn=None) -> DataFrame:
        raw = (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("subscribe", self.topic)
            .load()
        )
        df = self._decode(raw)
        if start_lsn is not None:
            df = df.filter(F.col("lsn") >= start_lsn)
        if end_lsn is not None:
            df = df.filter(F.col("lsn") <= end_lsn)
        return df

    def read_stream(self, spark, max_files_per_trigger: int | None = None) -> DataFrame:
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("subscribe", self.topic)
            .option("startingOffsets", self.starting_offsets)
        )
        if max_files_per_trigger is not None:
            # the Kafka analogue of the file-count trigger bound
            reader = reader.option("maxOffsetsPerTrigger", str(max_files_per_trigger * 10_000))
        return self._decode(reader.load())


class TableChangesLogSource(LogSource):
    """Chained sync: an upstream LakeTable's change feed AS the change log.

    ``run_sync(cfg, source=TableChangesLogSource(upstream_root))``
    replicates one lake table into another through the unmodified apply
    core — the feed's net rows map to ordinary change events
    (``_change_lsn`` -> lsn, ``_change_type`` 'delete' -> a delete event,
    'upsert' -> an update), so the replica gets exactly-once replay,
    checkpointing, LWW idempotence, additive schema evolution, and MoR
    commits for free, and converges to the upstream's live state at the
    drained position. This is estuary's multi-hop topology (MySQL ->
    Kafka -> MySQL: the kafka source beans + sinker chain in
    /root/reference) without the intermediate broker: the upstream
    table's own commits are the durable log.

    Scale: the batch read is ``read_changes`` — driver-side commit-range
    pruning plus pushed LSN filters, O(changed data) per catch-up even on
    a 100 TB upstream. The streaming read tails the upstream's delta
    commits (``streaming.changes.stream_changes``) and therefore needs an
    upstream synced with ``write_mode='mor'`` (a COW upstream has no
    delta files; its batch feed still works).

    Retention: the upstream's tombstone-purge watermark is this log's
    retention floor — start-position resolution validates resumed
    checkpoints against it exactly as it does for a purged parquet log
    (estuary's binlog floor, LogPositionHandler.scala:195-205).
    """

    def __init__(self, table_root: str, lsn_col: str = "lsn"):
        self.table_root = table_root
        self.lsn_col = lsn_col

    def _as_events(self, feed: DataFrame) -> DataFrame:
        return (
            feed.withColumnRenamed("_change_lsn", self.lsn_col)
            .withColumn(
                "op",
                F.when(F.col("_change_type") == "delete", F.lit("delete")).otherwise(
                    F.lit("update")
                ),
            )
            .drop("_change_type")
        )

    def read_batch(self, spark, start_lsn=None, end_lsn=None) -> DataFrame:
        from estuary_spark.tables import LakeTable

        floor = self.min_available_lsn()
        start = floor if start_lsn is None else max(int(start_lsn), floor)
        feed = LakeTable(self.table_root).read_changes(
            spark, start_lsn=start, end_lsn=end_lsn
        )
        return self._as_events(feed)

    def read_stream(self, spark, max_files_per_trigger: int | None = None) -> DataFrame:
        from estuary_spark.streaming.changes import stream_changes

        feed = stream_changes(
            spark,
            self.table_root,
            max_files_per_trigger=max_files_per_trigger or 16,
        )
        return self._as_events(feed)

    def min_available_lsn(self) -> int:
        from estuary_spark.tables import LakeTable

        t = LakeTable(self.table_root)
        props = t.properties() if t.exists() else {}
        return int(props.get("tombstone_purge", {}).get("watermark_lsn", 0))


class OplogLogSource(LogSource):
    """MongoDB-oplog-shaped change log -> typed change events (the
    reference's bean-only Mongo surface: ``bean/resource/MongoSourceBean
    .scala`` + ``bean/key/OplogKey.java`` in /root/reference declare an
    oplog source that its pipelines never wire up; here the shim is a
    working LogSource so an oplog tail dropped to parquet/JSON-lines —
    what mongoexport / a Kafka Mongo connector lands — syncs through the
    unmodified apply core).

    Oplog entry shape (the ``OplogKey`` fields): ``ts`` a BSON Timestamp
    = (seconds, increment) pair, ``op`` one of ``i``/``u``/``d`` (``n``
    no-ops are dropped), ``ns`` = ``db.collection``, ``o`` the document
    (JSON text), ``o2`` the update selector carrying ``_id``. Expected
    physical columns: ``ts_sec int, ts_inc int, op string, ns string,
    o string, o2 string`` (a thin connector projection of the raw BSON).

    Mapping (all built-in column expressions — JVM-side, codegen):

    * LSN = ``ts_sec << 20 | ts_inc`` — the same monotone total order
      the oplog itself guarantees (increment disambiguates entries in
      one second; 20 bits = >1M entries/second headroom);
    * op i/u/d -> insert/update/delete; ``n`` (heartbeat/noop) dropped;
    * ``ns`` -> the multi-table routing column (``cfg.table_col``);
    * document fields are decoded from ``o`` with one ``from_json`` using
      the caller-declared value schema (the engine's schema-is-declared
      contract; per-batch reconciliation handles drift) and the key falls
      back to ``o2._id`` for deletes/updates whose ``o`` carries only a
      partial update document.
    """

    def __init__(self, path: str, value_schema: T.StructType, id_col: str = "_id"):
        self.path = path
        self.value_schema = value_schema
        self.id_col = id_col

    def _decode(self, raw: DataFrame) -> DataFrame:
        doc = F.from_json(F.col("o").cast("string"), self.value_schema)
        sel = F.from_json(
            F.col("o2").cast("string"),
            T.StructType([T.StructField(self.id_col, T.StringType())]),
        )
        cols = [
            (
                F.shiftleft(F.col("ts_sec").cast("long"), 20)
                .bitwiseOR(F.col("ts_inc").cast("long"))
                .alias("lsn")
            ),
            F.when(F.col("op") == "i", "insert")
            .when(F.col("op") == "u", "update")
            .when(F.col("op") == "d", "delete")
            .alias("op"),
            F.col("ns"),
        ]
        for f in self.value_schema.fields:
            c = doc[f.name]
            if f.name == self.id_col:
                # deletes / partial updates carry the key only in o2
                c = F.coalesce(doc[f.name].cast(f.dataType), sel[self.id_col].cast(f.dataType))
            cols.append(c.alias(f.name))
        return raw.select(*cols).filter(F.col("op").isNotNull())  # 'n' dropped

    def read_batch(self, spark, start_lsn=None, end_lsn=None) -> DataFrame:
        df = self._decode(
            spark.read.option("recursiveFileLookup", "true").parquet(self.path)
        )
        if start_lsn is not None:
            df = df.filter(F.col("lsn") >= start_lsn)
        if end_lsn is not None:
            df = df.filter(F.col("lsn") <= end_lsn)
        return df

    def read_stream(self, spark, max_files_per_trigger: int | None = None) -> DataFrame:
        raw_schema = T.StructType(
            [
                T.StructField("ts_sec", T.LongType()),
                T.StructField("ts_inc", T.LongType()),
                T.StructField("op", T.StringType()),
                T.StructField("ns", T.StringType()),
                T.StructField("o", T.StringType()),
                T.StructField("o2", T.StringType()),
            ]
        )
        reader = spark.readStream.schema(raw_schema).option("recursiveFileLookup", "true")
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        return self._decode(reader.parquet(self.path))

    def min_available_lsn(self) -> int:
        return log_retention_floor(self.path)
