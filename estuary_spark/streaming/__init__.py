from estuary_spark.streaming.runner import run_sync_streaming

__all__ = ["run_sync_streaming"]
