"""estuary_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of shouweikun/estuary
(an Akka-based MySQL-binlog -> MySQL/Kafka sync service) as an idiomatic
Spark program: Structured-Streaming / batch-incremental tailing of an
ordered change-event log, per-key last-writer-wins dedupe via window-
over-LSN, salted repartition for hot-key skew, and exactly-once MERGE
upserts onto bucketed lake tables with additive schema evolution and
per-partition lineage.

Reference mapping (see SURVEY.md for the full operator inventory):
  - fetcher/batcher/sinker actor pipeline -> micro-batch DataFrame plan
  - consistent-hash routing               -> hash shuffle (repartition)
  - per-key mailbox ordering              -> Window.partitionBy(key).orderBy(lsn)
  - ``replace into`` idempotent upsert    -> LSN-guarded MERGE (merge.py)
  - ZooKeeper offset recorder             -> offset ranges fused into the
                                             lake-table snapshot commit
"""

from estuary_spark.config import SyncConfig
from estuary_spark.session import get_spark
from estuary_spark.tables import LakeTable
from estuary_spark.runner import run_sync

__all__ = ["SyncConfig", "get_spark", "LakeTable", "run_sync"]
__version__ = "0.1.0"
