"""Per-batch, per-partition lineage/metrics table (append-only parquet).

The Spark analogue of estuary's processing counters + Kafka lineage fields
(``core/lifecycle/worker/ProcessingCounter.scala:10-66``,
``bean/key/BaseDataJsonKey.java:36-117``: syncTaskId, syncTaskSequence,
eventType, msgSyncStartTime/EndTime, …). One row per (batch_id, bucket)
with the applied offset range, upsert/delete counts, and late /
out-of-order counts — the north rule's observability requirement.

Tests assert the FIXTURES.md §4 invariants: offset ranges of committed
batches are contiguous & non-overlapping; counts reconcile with the final
table state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, types as T

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("offset_start", T.LongType()),
        T.StructField("offset_end", T.LongType()),
        T.StructField("rows_upserted", T.LongType()),
        T.StructField("rows_deleted", T.LongType()),
        T.StructField("late_events", T.LongType()),
        T.StructField("out_of_order_events", T.LongType()),
        T.StructField("wall_ms", T.LongType()),
        T.StructField("committed_at", T.TimestampType()),
    ]
)


def append_lineage(spark: SparkSession, lineage_dir: str, rows: list[dict]) -> None:
    if not rows:
        return
    import datetime

    os.makedirs(lineage_dir, exist_ok=True)
    now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    recs = [
        {
            "batch_id": int(r["batch_id"]),
            "partition_id": int(r["partition_id"]),
            "offset_start": int(r["offset_start"]),
            "offset_end": int(r["offset_end"]),
            "rows_upserted": int(r["rows_upserted"]),
            "rows_deleted": int(r["rows_deleted"]),
            "late_events": int(r["late_events"]),
            "out_of_order_events": int(r["out_of_order_events"]),
            "wall_ms": int(r.get("wall_ms", 0)),
            "committed_at": now,
        }
        for r in rows
    ]
    spark.createDataFrame(recs, LINEAGE_SCHEMA).coalesce(1).write.mode("append").parquet(lineage_dir)


def read_lineage(spark: SparkSession, lineage_dir: str) -> DataFrame:
    return spark.read.schema(LINEAGE_SCHEMA).parquet(lineage_dir)
