"""Offset checkpointing for the batch-incremental driver.

estuary persists a ``LogPosition`` JSON to ZooKeeper every 60 s, several
save-generations delayed, and relies on idempotent ``replace into`` to
absorb the replay window (``core/offset/ZooKeeperLogPositionManager.scala:14-49``,
``SourceDataPositionRecorder.scala:13-92``). Here:

* the **table itself** is the authoritative record — every snapshot commit
  fuses the applied LSN range into its properties, so even if this
  checkpoint file is stale or deleted, replayed ranges are skipped;
* the JSON checkpoint is merely a fast-start hint (estuary's C2 start-
  position resolution: checkpoint -> user-supplied -> start of log).

The file is written atomically (tmp + rename) after each committed batch.
"""

from __future__ import annotations

import json
import os
import uuid

from estuary_spark.tables import LakeTable


def save_checkpoint(path: str, state: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, path)


def load_checkpoint(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def resolve_stop_lsn(
    cfg_stop: int | None,
    stop_ts: str | None,
    log_df=None,
    ts_col: str = "ts",
    lsn_col: str = "lsn",
) -> int | None:
    """Stop-position resolution (estuary C6: the snapshot task targets a
    timestamp and the state machine stops the stream at the corresponding
    binlog position, ``SnapshotStateMachine.scala:62-228``). An explicit
    stop LSN wins; otherwise a stop timestamp resolves to the highest LSN
    whose event time is <= the timestamp (one column-pruned max-aggregate,
    predicate pushed to the scan) — the timestamp->position mapping, after
    which the bound is positional exactly like the reference. Returns None
    when unbounded; -1 when the timestamp precedes the whole log (apply
    nothing)."""
    if cfg_stop is not None:
        return int(cfg_stop)
    if stop_ts is None:
        return None
    if log_df is None:
        raise ValueError("stop_ts resolution needs the log DataFrame")
    from pyspark.sql import functions as F

    try:
        row = log_df.agg(
            F.max(
                F.when(F.col(ts_col) <= F.to_timestamp(F.lit(stop_ts)), F.col(lsn_col))
            ).alias("hi")
        ).collect()[0]
    except Exception as e:  # unparseable timestamp surfaces as a JVM error
        raise ValueError(f"invalid stop_ts {stop_ts!r}: {e}") from None
    return int(row["hi"]) if row["hi"] is not None else -1


def resolve_start_lsn(
    cfg_start: int | None,
    checkpoint_path: str | None,
    table: LakeTable,
    start_ts: str | None = None,
    log_df=None,
    ts_col: str = "ts",
    lsn_col: str = "lsn",
) -> int:
    """Start-position resolution (estuary C2 analogue): an explicitly
    supplied start wins (forced replay is safe — committed ranges are
    skipped), then the checkpoint hint, then the table's own applied
    ranges, then a supplied start timestamp (estuary's binary-walk across
    binlog files, ``LogPositionHandler.findByStartTimeStamp`` — here one
    column-pruned min-aggregate with the ts predicate pushed to the
    parquet scan), then the start of the log."""
    if cfg_start is not None:
        return int(cfg_start)
    if checkpoint_path:
        st = load_checkpoint(checkpoint_path)
        if st is not None:
            return int(st["next_lsn"])
    if table.exists():
        ranges = table.applied_ranges()
        if ranges:
            return ranges[-1][1] + 1
    if start_ts is not None and log_df is not None:
        from pyspark.sql import functions as F

        try:
            row = log_df.agg(
                F.min(F.when(F.col(ts_col) >= F.to_timestamp(F.lit(start_ts)), F.col(lsn_col))).alias("lo"),
                F.max(lsn_col).alias("mx"),
            ).collect()[0]
        except Exception as e:  # unparseable timestamp surfaces as a JVM error
            raise ValueError(f"invalid start_ts {start_ts!r}: {e}") from None
        if row["lo"] is not None:
            return int(row["lo"])
        # timestamp past the end of the log: start at end-of-log, apply
        # nothing (estuary C2's `show master status` end-position fallback,
        # LogPositionHandler.findEndPosition:213-235)
        if row["mx"] is not None:
            return int(row["mx"]) + 1
    return 0
