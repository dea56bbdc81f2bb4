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


def resolve_start_lsn(cfg_start: int | None, checkpoint_path: str | None, table: LakeTable) -> int:
    """Start-position resolution (estuary C2 analogue): an explicitly
    supplied start wins (forced replay is safe — committed ranges are
    skipped), then the checkpoint hint, then the table's own applied
    ranges, then the start of the log."""
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
    return 0
