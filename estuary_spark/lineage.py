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
    """Append one micro-batch's lineage rows.

    Lineage is a handful of driver-side rows per batch — written directly
    with pyarrow (a Spark write job would cost seconds of scheduling per
    micro-batch for ~n_buckets rows; measured 4s/batch on local[32])."""
    if not rows:
        return
    import datetime
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(lineage_dir, exist_ok=True)
    now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    cols = {
        "batch_id": pa.array([int(r["batch_id"]) for r in rows], pa.int64()),
        "partition_id": pa.array([int(r["partition_id"]) for r in rows], pa.int32()),
        "offset_start": pa.array([int(r["offset_start"]) for r in rows], pa.int64()),
        "offset_end": pa.array([int(r["offset_end"]) for r in rows], pa.int64()),
        "rows_upserted": pa.array([int(r["rows_upserted"]) for r in rows], pa.int64()),
        "rows_deleted": pa.array([int(r["rows_deleted"]) for r in rows], pa.int64()),
        "late_events": pa.array([int(r["late_events"]) for r in rows], pa.int64()),
        "out_of_order_events": pa.array([int(r["out_of_order_events"]) for r in rows], pa.int64()),
        "wall_ms": pa.array([int(r.get("wall_ms", 0)) for r in rows], pa.int64()),
        "committed_at": pa.array([now] * len(rows), pa.timestamp("us")),
    }
    path = os.path.join(lineage_dir, f"batch-{rows[0]['batch_id']:010d}-{uuid.uuid4().hex[:8]}.parquet")
    pq.write_table(pa.table(cols), path)


def read_lineage(spark: SparkSession, lineage_dir: str) -> DataFrame:
    return spark.read.schema(LINEAGE_SCHEMA).parquet(lineage_dir)
