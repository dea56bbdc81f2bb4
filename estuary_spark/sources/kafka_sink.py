"""Kafka sink with estuary-compatible lineage key fields (SURVEY.md S5).

The reference ships changed rows to Kafka with a JSON *key* carrying task
lineage — ``bean/key/BaseDataJsonKey.java:10-123`` in /root/reference:
appName, syncTaskId, syncTaskSequence, dbName, tableName, eventType,
msgUuid, msgSyncStartTime/msgSyncUsedTime — so downstream consumers can
attribute every message to its source task/table/offset without parsing
the payload.

Spark re-expression: the key and value are single ``to_json(struct(...))``
expressions (JVM-side, codegen — no Python), appended to any change-event
DataFrame; ``write_stream_kafka`` then uses Spark's built-in Kafka sink
(``writeStream.format("kafka")``), which provides at-least-once delivery
per micro-batch; exactly-once for downstream lake consumers still comes
from the LSN in the key (LWW merge is idempotent). Keying every message by
the PRIMARY KEY string (``db@tb@pk``, ``mysql/lifecycle/package.scala:
121-131``) keeps per-key order within a Kafka partition — the same
ordering contract the reference's PRIMARY_KEY partition strategy gives.

This sandbox has no broker, so the construction is unit-tested at the
DataFrame level and ``write_stream_kafka`` is exercised only up to plan
construction on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def kafka_message_key(
    df_cols: list[str],
    task_id: str,
    app_name: str = "estuary-spark",
    db_name: str = "default",
    table_col: str | None = None,
    table_name: str = "transcripts",
    lsn_col: str = "lsn",
    op_col: str = "op",
    ts_col: str | None = None,
) -> Column:
    """The BaseDataJsonKey-analogue lineage struct (pre-JSON).

    Field mapping to ``BaseDataJsonKey.java:36-117``: appName/syncTaskId
    verbatim; syncTaskSequence = LSN (the monotone per-task sequence);
    dbName/tableName from config or the event's table column; eventType =
    op; msgUuid = md5(task, lsn) (deterministic — the reference uses a
    random UUID, but a content-derived id keeps replays byte-identical and
    downstream dedup trivial); msgSyncStartTime = the event's commit
    timestamp in epoch micros (NULL when the source has none).
    """
    tbl = F.col(table_col) if table_col and table_col in df_cols else F.lit(table_name)
    start_ts = (
        (F.unix_timestamp(F.col(ts_col)) * 1_000_000).cast("long")
        if ts_col and ts_col in df_cols
        else F.lit(None).cast("long")
    )
    return F.struct(
        F.lit(app_name).alias("appName"),
        F.lit(task_id).alias("syncTaskId"),
        F.col(lsn_col).cast("long").alias("syncTaskSequence"),
        F.lit(db_name).alias("dbName"),
        tbl.alias("tableName"),
        F.col(op_col).alias("eventType"),
        F.md5(F.concat_ws(":", F.lit(task_id), F.col(lsn_col).cast("string"))).alias(
            "msgUuid"
        ),
        start_ts.alias("msgSyncStartTime"),
    )


def kafka_key_value(
    df: DataFrame,
    task_id: str,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    num_partitions: int | None = None,
    tombstone_deletes: bool = False,
    op_col: str = "op",
    **key_kwargs,
) -> DataFrame:
    """Project a change-event DataFrame to the Kafka sink's message columns.

    * ``key``     — the PK string (``db@tb@pk`` analogue) and NOTHING else:
      Kafka's default partitioner hashes the key bytes, so a key that is
      stable per PK is what actually keeps same-PK messages in one
      partition (and therefore in order). Per-message fields (LSN, uuid)
      must stay OUT of the key — that is the bug the reference solves with
      a custom ``JsonKeyPartitioner``, which Spark's built-in sink can't
      load.
    * ``value``   — the full event as JSON (envelope + payload);
    * ``headers`` — the BaseDataJsonKey-analogue lineage struct as one
      ``lineage`` header (JSON bytes), so consumers still get task/offset
      attribution without parsing the payload;
    * ``partition`` (only when ``num_partitions`` is given) — explicit
      ``hash(pk) % num_partitions``, for deployments that pin the mapping
      independent of the producer's partitioner (the reference's
      MultipleJsonKeyPartitionerJava shape).

    ``tombstone_deletes=True`` emits deletes as Kafka tombstones (NULL
    value, key kept) — the log-compaction convention, so a compacted
    topic converges to exactly the table's live state. Use for feeds
    destined to compacted topics; leave off when downstream wants the
    delete event's payload.
    """
    pk = F.concat_ws("@", *[F.col(c).cast("string") for c in key_cols])
    lineage = kafka_message_key(df.columns, task_id, **key_kwargs)
    value = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    if tombstone_deletes:
        value = F.when(F.col(op_col) == "delete", F.lit(None).cast("string")).otherwise(value)
    headers = F.array(
        F.struct(
            F.lit("lineage").alias("key"),
            F.to_json(lineage).cast("binary").alias("value"),
        )
    )
    cols = [pk.alias("key"), value.alias("value"), headers.alias("headers")]
    if num_partitions is not None:
        cols.append(
            F.pmod(F.xxhash64(pk), F.lit(num_partitions)).cast("int").alias("partition")
        )
    return df.select(*cols)


def changes_kafka_frame(
    feed_df: DataFrame,
    task_id: str,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    change_lsn_col: str = "_change_lsn",
    change_type_col: str = "_change_type",
    tombstone_deletes: bool = True,
    **kv_kwargs,
) -> DataFrame:
    """Adapt a change feed (``LakeTable.read_changes`` or
    ``streaming.changes.stream_changes``) to the Kafka message surface:
    the feed's change columns become the envelope's lsn/op, then the
    standard key/value/headers projection applies. Composed with
    ``write_stream_kafka`` this is the full estuary downstream pipeline —
    lake table -> change stream -> keyed Kafka topic
    (``kafka/KafkaSinkFunc.scala`` + ``BaseDataJsonKey`` in
    /root/reference) — with deletes as log-compaction tombstones by
    default, so a compacted topic converges to the table's live state.
    """
    ev = feed_df.withColumnRenamed(change_lsn_col, "lsn").withColumnRenamed(
        change_type_col, "op"
    )
    return kafka_key_value(
        ev, task_id, key_cols=key_cols, tombstone_deletes=tombstone_deletes, **kv_kwargs
    )


def write_stream_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
    task_id: str,
    trigger_processing_time: str | None = None,
    **kv_kwargs,
):
    """Start a streaming Kafka sink for a change-event stream.

    At-least-once per micro-batch (Spark's Kafka sink semantics). The
    message KEY is the PK string only (stable partitioning / per-key
    order); consumers deduplicate replays via the ``lineage`` HEADER's
    deterministic msgUuid + syncTaskSequence, or the ``lsn`` field in the
    JSON value envelope. Requires the spark-sql-kafka package on the
    cluster (not present in this sandbox — the construction above is
    what's unit-tested).
    """
    out = kafka_key_value(df, task_id, **kv_kwargs)
    writer = (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
    )
    if trigger_processing_time:
        writer = writer.trigger(processingTime=trigger_processing_time)
    return writer.start()
