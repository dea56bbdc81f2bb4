"""Streaming CDC-out: tail a LakeTable's delta commits as a Structured
Streaming source.

``LakeTable.read_changes`` is the batch catch-up surface; this module is
the continuous one — a downstream consumer (index, feature store,
another sync) subscribes to the table's MoR delta commit directories and
receives every committed change row as it lands, without polling
manifests or re-scanning base data. Estuary serves this role with its
Kafka sink (``kafka/KafkaSinkFunc.scala`` in /root/reference); here the
lake table's own delta files ARE the durable change log, so the stream
is just a file source over them — no second copy of the data, and the
log is exactly as durable as the table.

Semantics: each MoR delta commit contains the batch's LWW winners
(tombstones included), so the stream delivers NET per-batch changes with
``_change_lsn``/``_change_type`` exactly like ``read_changes``. File
batches arrive in listing order, not LSN order — consumers that need
cross-batch ordering fold by ``_change_lsn`` per key (``apply_changes``
does the equivalent replace-by-key, and LWW idempotence makes replays
harmless — the same guarantees the ingest side relies on, see
streaming/runner.py).

Retention contract: compaction only DEREFERENCES delta files (they stay
on disk and remain streamable); ``vacuum``/``expire_snapshots`` is what
physically deletes them — run those with a horizon longer than your
slowest consumer's lag, the same rule any CDC log imposes (estuary's
binlog retention floor, ``LogPositionHandler.scala:195-205``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from estuary_spark.tables import BUCKET_COL, DATA_DIR, DELETED_COL, LSN_COL, LakeTable


def stream_changes(
    spark: SparkSession,
    table_root: str,
    max_files_per_trigger: int = 16,
    change_lsn_col: str = "_change_lsn",
    change_type_col: str = "_change_type",
) -> DataFrame:
    """A streaming DataFrame of the table's change rows, one row per
    committed LWW winner, with the same ``_change_lsn``/``_change_type``
    columns as ``read_changes``. New delta commits are picked up as their
    files appear (the glob re-expands every trigger); Spark's streaming
    checkpoint tracks consumed files, so restarts resume where they left
    off. Use ``foreachBatch`` + ``operators.changes.apply_changes`` (or a
    per-key fold by ``_change_lsn``) on the consumer side.

    The explicit schema + ``recursiveFileLookup`` disables partition
    discovery over the ``_bp=N`` layout dirs (the bucket id is already a
    data column), and the glob restricts the listing to delta commits —
    base/compaction rewrites (``commit-*``) never enter the stream, so a
    compaction does not re-deliver already-streamed keys.
    """
    schema = LakeTable(table_root).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(os.path.join(table_root, DATA_DIR, "delta-*"))
    )
    return raw.select(
        *[c for c in schema.names if c not in (LSN_COL, DELETED_COL, BUCKET_COL)],
        F.col(LSN_COL).alias(change_lsn_col),
        F.when(F.coalesce(F.col(DELETED_COL), F.lit(False)), F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias(change_type_col),
    )
