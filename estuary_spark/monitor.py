"""Stream health monitoring — the estuary heartbeat/counter analogue.

estuary probes the source every 5 s with a ``detectingSql`` heartbeat and
escalates to a restart after repeated failures
(``mysql/lifecycle/reborn/listen/MysqlConnectionInOrderListener.scala:69-92``
in /root/reference), and ticks per-stage fetch/batch/sink counters every
100 ms (``core/lifecycle/worker/ProcessingCounter.scala:10-66``). On Spark
the equivalents are built in — ``StreamingQueryListener`` events and
``StreamingQueryProgress`` — so this module only persists them:

* ``HeartbeatListener`` appends one row per micro-batch progress event to
  a metrics parquet table (query id, batch id, timestamp, input rows,
  rows/sec, batch duration) — the coarse-grained heartbeat a monitoring
  system tails. Liveness = the stream keeps making progress; a dead
  source shows up as missing heartbeats, exactly like estuary's missed
  probe windows.
* ``stall_report`` summarizes the heartbeat table: last progress per
  query and whether it exceeds a staleness threshold (the restart-
  escalation decision estuary's listener takes is left to the operator /
  driver loop, which can stop+restart the query from its checkpoint).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import SparkSession


class HeartbeatListener:
    """A ``StreamingQueryListener`` that writes progress heartbeats to a
    directory of JSON lines (one file per event — atomic, append-only,
    readable as a Spark JSON table). Plain files rather than a Spark
    write: listener callbacks run on the driver's listener bus and must
    not launch jobs."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        # deferred import so the module also loads where streaming isn't used
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                outer._emit({"event": "started", "query_id": str(event.id), "ts": time.time()})

            def onQueryProgress(self, event):
                p = event.progress
                outer._emit(
                    {
                        "event": "progress",
                        "query_id": str(p.id),
                        "batch_id": p.batchId,
                        "ts": time.time(),
                        "num_input_rows": p.numInputRows,
                        "rows_per_sec": p.processedRowsPerSecond,
                        "duration_ms": (p.durationMs or {}).get("triggerExecution"),
                    }
                )

            def onQueryTerminated(self, event):
                outer._emit(
                    {
                        "event": "terminated",
                        "query_id": str(event.id),
                        "ts": time.time(),
                        "exception": event.exception,
                    }
                )

            def onQueryIdle(self, event):
                outer._emit({"event": "idle", "query_id": str(event.id), "ts": time.time()})

        self._listener = _L()

    def _emit(self, row: dict) -> None:
        tmp = os.path.join(self.out_dir, f".tmp-{uuid.uuid4().hex}")
        final = os.path.join(self.out_dir, f"hb-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            fh.write(json.dumps(row) + "\n")
        os.rename(tmp, final)

    def attach(self, spark: SparkSession) -> "HeartbeatListener":
        spark.streams.addListener(self._listener)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self._listener)


def read_heartbeats(spark: SparkSession, out_dir: str):
    return spark.read.json(os.path.join(out_dir, "hb-*.json"))


def stall_report(spark: SparkSession, out_dir: str, stale_after_s: float = 60.0) -> list[dict]:
    """Last progress per query + staleness flag (the estuary listener's
    restart-escalation signal, surfaced as data instead of an actor
    message)."""
    from pyspark.sql import functions as F

    hb = read_heartbeats(spark, out_dir)
    now = time.time()
    rows = (
        hb.filter(F.col("event") == "progress")
        .groupBy("query_id")
        .agg(
            F.max("ts").alias("last_progress_ts"),
            F.sum("num_input_rows").alias("total_rows"),
            F.max("batch_id").alias("last_batch_id"),
        )
        .collect()
    )
    return [
        {
            "query_id": r["query_id"],
            "last_batch_id": int(r["last_batch_id"]),
            "total_rows": int(r["total_rows"]),
            "seconds_since_progress": round(now - r["last_progress_ts"], 1),
            "stalled": (now - r["last_progress_ts"]) > stale_after_s,
        }
        for r in rows
    ]


def table_status(table_dir: str) -> dict:
    """One table's position/health document (shared by the status-file
    writer below and the HTTP status server, jobs/status_server.py):
    snapshot version, applied-position watermark, last_batch counters and
    per-phase costs (M3), delta-chain pressure, retention floors, and the
    logical-drop / rename markers. Pure metadata — raw-manifest reads
    only, no Spark session needed."""
    from estuary_spark.tables import LakeTable

    t = LakeTable(table_dir)
    if not t.exists():
        return {"exists": False}
    props = t.properties()
    ranges = props.get("applied_ranges", [])
    return {
        "exists": True,
        "version": t.current_version(),
        "applied_lsn_hi": max((r[1] for r in ranges), default=None),
        "applied_ranges": ranges,
        "last_batch": props.get("last_batch"),
        "delta_buckets": len(t.delta_buckets()),
        "tombstone_purge_watermark": props.get("tombstone_purge", {}).get("watermark_lsn"),
        "table_ops_lsn": props.get("table_ops_lsn"),
        "dropped_at_lsn": props.get("dropped_at_lsn"),
        "renamed_from": props.get("renamed_from"),
        "column_added_lsns": props.get("column_added_lsns"),
    }


def write_status_json(
    path: str,
    table_dirs: str | list[str],
    checkpoint_path: str | None = None,
) -> dict:
    """M4: dump the task's position + cost profile as one JSON document —
    the analogue of the profiling/position JSON estuary's status registry
    serves over REST (``core/lifecycle/SyncControllerMessages`` status
    queries + ``ProcessingCounter.scala:10-66`` counters in
    /root/reference; the REST transport itself is a declared non-goal,
    SURVEY.md §7.5 — the DOCUMENT is the parity surface, consumable by
    any external monitor tailing a file instead of an endpoint).

    Per table: current snapshot version, the applied-position watermark
    (max applied LSN), last_batch counters and per-phase costs (M3),
    delta-chain pressure (buckets with uncompacted deltas), and the
    retention floors. Plus the driver checkpoint, if any. The write is
    atomic (temp + rename), so a monitor never reads a torn document.
    """
    dirs = [table_dirs] if isinstance(table_dirs, str) else list(table_dirs)
    tables = {d: table_status(d) for d in dirs}
    doc = {"ts": time.time(), "tables": tables}
    if checkpoint_path and os.path.exists(checkpoint_path):
        with open(checkpoint_path) as fh:
            doc["checkpoint"] = json.load(fh)
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(doc, fh, indent=2)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, path)
    return doc
