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


class LogRetentionError(RuntimeError):
    """A RESUMED start position (checkpoint hint or the table's applied
    ranges) precedes the log's retention floor: events in
    [start, floor) were purged and can no longer be replayed — resuming
    would silently skip them. estuary C2 parity: the reference re-validates
    a checkpointed binlog position against the files still on the server
    before resuming (``mysql/utils/LogPositionHandler.scala:195-205`` in
    /root/reference) instead of trusting it blindly. Set
    ``SyncConfig.on_retention_gap="reset"`` to fall back to the floor
    deliberately (accepting the gap) instead of failing."""

    def __init__(self, start: int, floor: int):
        self.start = start
        self.floor = floor
        super().__init__(
            f"resumed start LSN {start} precedes the log retention floor {floor}: "
            f"events in [{start}, {floor}) were purged and cannot be replayed; "
            "set on_retention_gap='reset' to deliberately resume from the floor"
        )


def _check_retention(start: int, min_available_lsn: int, on_gap: str) -> int:
    if start >= min_available_lsn:
        return start
    if on_gap == "reset":
        return min_available_lsn
    raise LogRetentionError(start, min_available_lsn)


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
    table: LakeTable | None,
    start_ts: str | None = None,
    log_df=None,
    ts_col: str = "ts",
    lsn_col: str = "lsn",
    min_available_lsn: int = 0,
    on_retention_gap: str = "fail",
) -> int:
    """Start-position resolution (estuary C2 analogue): an explicitly
    supplied start wins (forced replay is safe — committed ranges are
    skipped), then the checkpoint hint, then the table's own applied
    ranges, then a supplied start timestamp (estuary's binary-walk across
    binlog files, ``LogPositionHandler.findByStartTimeStamp`` — here one
    column-pruned min-aggregate with the ts predicate pushed to the
    parquet scan), then the start of the log.

    RESUMED positions (checkpoint / applied ranges) are validated against
    the log's retention floor (``min_available_lsn``, from
    ``LogSource.min_available_lsn``): a resumed start below the floor
    means purged events would be silently skipped — raise
    ``LogRetentionError``, or fall back to the floor when
    ``on_retention_gap="reset"`` (estuary's deliberate fallback,
    ``LogPositionHandler.scala:195-205``). An EXPLICIT start is the
    operator forcing a position and is not second-guessed; the default
    start-of-log/timestamp paths can only see retained events."""
    if cfg_start is not None:
        return int(cfg_start)
    if checkpoint_path:
        st = load_checkpoint(checkpoint_path)
        if st is not None:
            return _check_retention(int(st["next_lsn"]), min_available_lsn, on_retention_gap)
    if table is not None and table.exists():
        ranges = table.applied_ranges()
        if ranges:
            return _check_retention(ranges[-1][1] + 1, min_available_lsn, on_retention_gap)
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
