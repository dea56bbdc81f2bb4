from estuary_spark.sources.log_source import LogSource, ParquetLogSource

__all__ = ["LogSource", "ParquetLogSource"]
