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

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


class LogSource(ABC):
    @abstractmethod
    def read_batch(self, spark: SparkSession, start_lsn: int | None = None, end_lsn: int | None = None) -> DataFrame: ...

    @abstractmethod
    def read_stream(self, spark: SparkSession) -> DataFrame: ...


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

    def read_stream(self, spark) -> DataFrame:
        static = self.read_batch(spark)
        return (
            spark.readStream.schema(static.schema)
            .option("recursiveFileLookup", "true")
            .parquet(self.path)
        )


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

    def read_stream(self, spark) -> DataFrame:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("subscribe", self.topic)
            .option("startingOffsets", self.starting_offsets)
            .load()
        )
        return self._decode(raw)
