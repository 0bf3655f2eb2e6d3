from no_jvm_wap_with_iceberg_spark.streaming.ingest import (
    stream_wap,
    windowed_event_counts,
)

__all__ = ["stream_wap", "windowed_event_counts"]
